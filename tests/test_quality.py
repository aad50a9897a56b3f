"""Edge-case semantics of plans/quality.py (tx08 / dd10 / tx10) that the
driver's documents fixture never exercises: sub-minimum-length docs, exact
count ties, and hand-computed PMI.  Parity with DuckDB at corpus scale is
covered by tests/test_partb_oracle.py; these pin the intended semantics."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from localsearchengine_spark.plans import quality as ql


def _write_docs(tmp_path, texts: list[str]) -> str:
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_tx08_single_token_and_tie_break(spark, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            "solo",            # 1 token: no 2-grams, frac 0, top share 1
            "b a b a",         # a/b tie at 2 → lexicographic top_tok 'a'
            "x x x y",         # 2-grams [x x, x x, x y]: dup frac 1/3
        ],
    )
    rows = {r["doc_id"]: r for r in ql.tx08(spark, sf).collect()}
    assert rows[0]["top_tok"] == "solo"
    assert rows[0]["top_tok_frac"] == 1.0
    assert rows[0]["dup_2gram_frac"] == 0.0
    assert rows[1]["top_tok"] == "a"  # count tie broken token-ascending
    assert rows[1]["top_tok_frac"] == 0.5
    assert rows[2]["top_tok"] == "x"
    assert rows[2]["top_tok_frac"] == 0.75
    assert rows[2]["dup_2gram_frac"] == pytest.approx(round(1 / 3, 6))


def test_dd10_short_docs_excluded_and_cross_doc_spans(spark, tmp_path):
    run = " ".join(f"w{i}" for i in range(ql._SPAN_W))  # one shared 8-gram
    sf = _write_docs(
        tmp_path,
        [
            "too short for any span",      # < 8 tokens: no output row
            run,                           # exactly 8 tokens: 1 span
            "lead in tokens " + run,       # shares the 8-gram with doc 1
            " ".join(f"u{i}" for i in range(10)),  # unique spans only
        ],
    )
    rows = {r["doc_id"]: r for r in ql.dd10(spark, sf).collect()}
    assert 0 not in rows  # fraction undefined below the span width
    assert rows[1]["n_spans"] == 1 and rows[1]["n_dup_spans"] == 1
    assert rows[1]["dup_span_frac"] == 1.0
    # doc 2: 4 spans (11 tokens), exactly one of them is the shared run
    assert rows[2]["n_spans"] == 4 and rows[2]["n_dup_spans"] == 1
    assert rows[3]["n_spans"] == 3 and rows[3]["n_dup_spans"] == 0


def test_tx10_pmi_hand_computed(spark, tmp_path):
    # "a b" x12 in one doc: unigrams a=12, b=12 (T=24); bigrams
    # "a b"=12, "b a"=11 (T2=23).  Only pairs with count >= _COLL_MIN
    # survive; ranked by integer count desc.
    sf = _write_docs(tmp_path, [" ".join(["a", "b"] * 12)])
    out = ql.tx10(spark, sf).collect()
    assert [(r["w1"], r["w2"], r["c_xy"]) for r in out] == [
        ("a", "b", 12),
        ("b", "a", 11),
    ]
    pmi_ab = math.log((12 / 23) / ((12 / 24) * (12 / 24)))
    assert out[0]["pmi"] == pytest.approx(round(pmi_ab, 6), abs=1e-9)


def test_dd10_hash_path_identical_to_string_path(spark):
    """The 64-bit gram-hash + string-verify path must be value-identical to
    the plain string-key path on the full sf0.01 corpus (the verify recount
    makes hash collisions additive-only, then filtered)."""
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    hashed = {r["doc_id"]: tuple(r) for r in ql.dd10(spark, sf, hash_grams=True).collect()}
    plain = {r["doc_id"]: tuple(r) for r in ql.dd10(spark, sf, hash_grams=False).collect()}
    assert hashed == plain


def test_dd10_verify_filters_hash_collisions(spark, tmp_path, monkeypatch):
    """Force a universal hash collision (constant hash) — stage 1 then flags
    every gram, but the string-verify recount keeps only true cross-doc
    duplicates, so the output is unchanged."""
    from pyspark.sql import functions as F

    run = " ".join(f"w{i}" for i in range(ql._SPAN_W))
    sf = _write_docs(
        tmp_path,
        [run, "lead in tokens " + run, " ".join(f"u{i}" for i in range(10))],
    )
    expected = {r["doc_id"]: tuple(r) for r in ql.dd10(spark, sf, hash_grams=False).collect()}
    monkeypatch.setattr(F, "xxhash64", lambda *cols: F.lit(7).cast("long"))
    got = {r["doc_id"]: tuple(r) for r in ql.dd10(spark, sf, hash_grams=True).collect()}
    assert got == expected


def test_dd11_hash_path_identical_to_string_path(spark):
    """The 64-bit line-hash + string-verify path (the at-scale shape — the
    distinct-doc shuffle carries xxhash64 keys, not line strings) must be
    value-identical to the plain string-key path on the full sf0.01 corpus."""
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    hashed = {r["doc_id"]: tuple(r) for r in ql.dd11(spark, sf, hash_lines=True).collect()}
    plain = {r["doc_id"]: tuple(r) for r in ql.dd11(spark, sf, hash_lines=False).collect()}
    assert hashed == plain


def test_dd11_verify_filters_hash_collisions(spark, tmp_path, monkeypatch):
    """Force a universal hash collision (constant hash) — stage 1 then flags
    every line-hash, but the string-verify recount keeps only lines truly in
    ≥ T distinct docs, so the output is unchanged."""
    from pyspark.sql import functions as F

    boiler, thresh = "nav bar", ql._DD11_T
    texts = [f"{boiler} body{i} text{i}" for i in range(thresh)]  # boiler in T docs
    texts += [f"solo{i} only{i}" for i in range(5)]               # below threshold
    sf = _write_docs(tmp_path, texts)
    expected = {r["doc_id"]: tuple(r) for r in ql.dd11(spark, sf, hash_lines=False).collect()}
    assert any(r[2] > 0 for r in expected.values())  # the planted boiler line fires
    monkeypatch.setattr(F, "xxhash64", lambda *cols: F.lit(7).cast("long"))
    got = {r["doc_id"]: tuple(r) for r in ql.dd11(spark, sf, hash_lines=True).collect()}
    assert got == expected
