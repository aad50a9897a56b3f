"""Positional postings + phrase / exclusion query language (search.py,
codec pos stream, analyze with_positions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from localsearchengine_spark.build import build_index
from localsearchengine_spark.config import BM25Config, BuildConfig
from localsearchengine_spark.operators.search import Index, parse_query
from localsearchengine_spark.sources.fixtures import write_transcripts_parquet


def test_parse_query():
    cfg = BM25Config()
    bare, phrases, excluded, prefixes, boosts = parse_query(
        '"Spark SQL engine" fast -slow "b c" eng*', cfg
    )
    assert bare == ["fast"]
    assert phrases == [(["spark", "sql", "engine"], 0), (["b", "c"], 0)]
    assert excluded == ["slow"]
    assert prefixes == ["eng"]
    assert boosts == {}


def test_parse_query_slop_and_boost():
    cfg = BM25Config()
    bare, phrases, excluded, prefixes, boosts = parse_query(
        '"spark engine"~2 fast^2.5 slow', cfg
    )
    assert phrases == [(["spark", "engine"], 2)]
    assert bare == ["fast", "slow"]
    assert boosts == {"fast": 2.5}


def test_parse_query_marker_boost_composition():
    """Boost suffixes compose with (and never invert) the other markers:
    '-slow^2' stays an exclusion, 'eng*^2' stays a prefix wildcard, and the
    last spelling of a bare term decides its boost."""
    cfg = BM25Config()
    bare, phrases, excluded, prefixes, boosts = parse_query(
        "-slow^2 eng*^2 fast^2 fast up up^3", cfg
    )
    assert excluded == ["slow"]
    assert prefixes == ["eng"]
    assert bare == ["fast", "up"]
    assert boosts == {"up": 3.0}  # 'fast^2 fast' resets; 'up up^3' boosts


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    rows = [
        "spark sql engine runs fast",          # 0: phrase "spark sql"
        "sql spark engine is slow",            # 1: both terms, wrong order
        "the spark sql optimizer",             # 2: phrase
        "spark and sql and spark sql",         # 3: phrase (at the end)
        "engine fast slow",                    # 4
        "spark sql spark sql spark sql",       # 5: repeated phrase
    ]
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i:03d}" for i in range(len(rows))],
            "turn_idx": np.zeros(len(rows), dtype=np.int32),
            "role": ["user"] * len(rows),
            "text": rows,
            "tool": [""] * len(rows),
            "ts": pd.Timestamp("2025-01-01"),
        }
    )
    src = str(tmp_path_factory.mktemp("phrase") / "src")
    import os

    os.makedirs(src)
    write_transcripts_parquet(pdf, src + "/t.parquet")
    idx = str(tmp_path_factory.mktemp("phrase") / "idx")
    build_index(
        spark, src, idx,
        BuildConfig(num_partitions=4, store_positions=True, block_size=4),
    )
    return Index(spark, idx)


def test_phrase_match(pos_index):
    hits = pos_index.search('"spark sql"', k=10)
    assert [d for d, _ in hits] and {d for d, _ in hits} == {0, 2, 3, 5}


def test_phrase_order_sensitive(pos_index):
    # doc 1 has both terms adjacent only as "sql spark"
    assert {d for d, _ in pos_index.search('"sql spark"', k=10)} == {1, 5}


def test_three_term_phrase(pos_index):
    assert {d for d, _ in pos_index.search('"spark sql engine"', k=10)} == {0}


def test_phrase_plus_bare_and_exclusion(pos_index):
    assert {d for d, _ in pos_index.search('"spark sql" fast', k=10)} == {0}
    assert {d for d, _ in pos_index.search('"spark sql" -optimizer', k=10)} == {0, 3, 5}
    assert pos_index.search('"spark sql" -spark', k=10) == []


def test_exclusion_only_with_bare_terms(pos_index):
    assert {d for d, _ in pos_index.search("engine -slow", k=10)} == {0}


def test_missing_phrase_term(pos_index):
    assert pos_index.search('"spark zzznope"', k=10) == []


def test_proximity_slop(pos_index):
    # doc 0 "spark sql engine ...": spark..engine gap 2; doc 1 adjacent-ish
    assert {d for d, _ in pos_index.search('"spark engine"', k=10)} == {1}
    assert {d for d, _ in pos_index.search('"spark engine"~1', k=10)} == {0, 1}
    # order stays mandatory under slop: doc 1 is "sql spark", never "spark sql"
    assert 1 not in {d for d, _ in pos_index.search('"spark sql"~3', k=10)}


def test_proximity_three_terms(pos_index):
    # doc 0 "spark sql engine runs fast": gaps spark→sql=1, sql→fast=3
    assert pos_index.search('"spark sql fast"~1', k=10) == []
    assert {d for d, _ in pos_index.search('"spark sql fast"~2', k=10)} == {0}


def test_proximity_scores_match_exact_phrase_scores(pos_index):
    """Slop widens the match set but scoring stays BM25 over the members."""
    sloppy = dict(pos_index.search('"spark engine"~1', k=10))
    plain = dict(pos_index.search(["engine", "spark"], k=10, mode="and"))
    for d, s in sloppy.items():
        assert abs(s - plain[d]) < 1e-12


def test_term_boost_scales_contribution(pos_index):
    """score("spark^2 sql") = score(spark AND sql) + 1×contrib(spark)."""
    boosted = dict(pos_index.search("spark^2 sql", k=10, mode="and"))
    plain = dict(pos_index.search(["spark", "sql"], k=10, mode="and"))
    spark_only = dict(pos_index.search(["spark"], k=10, mode="or"))
    assert set(boosted) == set(plain)  # boosts weight scores, not matching
    for d, s in boosted.items():
        assert abs(s - (plain[d] + spark_only[d])) < 1e-12


def test_term_boost_reorders(pos_index):
    """A big enough boost must be able to change the ranking."""
    plain = [d for d, _ in pos_index.search(["fast", "slow"], k=10, mode="or")]
    boosted = [d for d, _ in pos_index.search("fast slow^9", k=10, mode="or")]
    assert set(plain) == set(boosted)
    # docs 0 (fast) and 1 (slow) tie un-boosted (same df, same dl) and fall
    # back to doc_id order; boosting "slow" must put doc 1 ahead of doc 0
    assert plain.index(0) < plain.index(1) and boosted.index(1) < boosted.index(0)


def test_phrase_scores_are_bm25_over_members(pos_index):
    """Structured scoring must equal the AND path over the member terms for
    docs that pass the phrase filter (same contributions, same order)."""
    hits = dict(pos_index.search('"spark sql"', k=10))
    plain = dict(pos_index.search(["spark", "sql"], k=10, mode="and"))
    for d, s in hits.items():
        assert abs(s - plain[d]) < 1e-12


def test_phrase_on_nonpositional_index_raises(spark, built_index):
    idx_dir, _, _ = built_index
    with pytest.raises(ValueError, match="positions"):
        Index(spark, idx_dir).search('"the spark"', k=5)


def test_phrase_on_salted_positional_index(spark, tmp_path):
    """Positions must survive hot-term salting: the phrase path reads the
    pos stream through the multi-salt-row reassembly in fetch_postings."""
    from localsearchengine_spark.sources.fixtures import make_transcripts

    pdf = make_transcripts(2000)
    src = str(tmp_path / "src")
    import os

    os.makedirs(src)
    write_transcripts_parquet(pdf, src + "/t.parquet")
    idx = str(tmp_path / "idx")
    rep = build_index(
        spark, src, idx,
        BuildConfig(num_partitions=8, hot_df_threshold=150, store_positions=True),
    )
    assert rep.hot_terms > 0  # 'the'/'spark'... are salted
    ix = Index(spark, idx)
    # oracle: scan the fixture for adjacent "the spark"
    texts = pdf["text"].tolist()
    expected = set()
    for i, t in enumerate(texts):
        toks = t.split(" ")
        if any(a == "the" and b == "spark" for a, b in zip(toks, toks[1:])):
            expected.add(i)
    assert expected, "fixture must contain the phrase"
    got = {d for d, _ in ix.search('"the spark"', k=len(expected) + 10)}
    assert got == expected


def test_or_mode_structured_queries(pos_index):
    """or/wand mode: a doc matches ANY bare term or ANY complete phrase."""
    # "optimizer" only in doc 2; phrase "spark sql engine" only in doc 0
    got = {d for d, _ in pos_index.search('"spark sql engine" optimizer', k=10, mode="or")}
    assert got == {0, 2}
    assert {d for d, _ in pos_index.search('"spark sql engine" optimizer', k=10, mode="wand")} == {0, 2}
    # absent bare term contributes nothing in or-mode, empties and-mode
    assert {d for d, _ in pos_index.search("optimizer zzznope", k=10, mode="or")} == {2}
    assert pos_index.search("optimizer zzznope", k=10, mode="and") == []
    # exclusion applies after the union
    assert pos_index.search('"spark sql engine" optimizer -the', k=10, mode="or") == [
        h for h in pos_index.search('"spark sql engine" optimizer', k=10, mode="or") if h[0] != 2
    ]


def test_phrase_batch_matches_driver_local(spark, pos_index):
    """A20 phrase batch ≡ the driver-local structured path: same docs, same
    float64 scores (both sum contributions in sorted term order)."""
    from localsearchengine_spark.operators.batch_query import run_phrase_queries

    queries = [
        {"query_id": 0, "phrase": ["spark", "sql"], "k": 10},
        {"query_id": 1, "phrase": ["sql", "spark"], "k": 10},
        {"query_id": 2, "phrase": ["spark", "sql", "engine"], "k": 10},
        {"query_id": 3, "phrase": ["spark", "zzznope"], "k": 10},
    ]
    out = run_phrase_queries(spark, pos_index, queries).collect()
    by_q: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), float(r["score"]))
        )
    for qid, qstr in enumerate(
        ['"spark sql"', '"sql spark"', '"spark sql engine"', '"spark zzznope"']
    ):
        local = pos_index.search(qstr, k=10)
        assert by_q.get(qid, []) == [(d, s) for d, s in local], qstr
