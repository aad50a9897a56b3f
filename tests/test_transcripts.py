"""Multi-turn transcript operators (tr01/tr02): derivation shape and
window semantics pinned independently of the SQL oracle."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from localsearchengine_spark.plans.transcripts import (
    _CTX_TURNS,
    _TURNS_PER_CONV,
    derived_transcripts,
    tr01,
    tr02,
)
from tests.conftest import SF_DIR


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_derivation_is_multi_turn_and_text_preserving(spark):
    t = derived_transcripts(spark, SF_DIR).toPandas()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    # per-turn text equality under stable turn ordering (north-rule invariant)
    t = t.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    assert list(t["text"]) == list(docs["text"])
    # 5 turns per full conversation, dense turn_idx 0..4
    sizes = t.groupby("conv_id").size()
    assert (sizes <= _TURNS_PER_CONV).all() and (sizes.iloc[:-1] == _TURNS_PER_CONV).all()
    # roles: turn 3 is a tool turn with a tool name; others alternate
    by_turn = t.groupby("turn_idx")["role"].unique()
    assert list(by_turn[3]) == ["tool"]
    assert set(t.loc[t.role == "tool", "tool"]) == {"search"}
    assert set(t.loc[t.role != "tool", "tool"]) == {""}


def test_tr02_context_is_previous_turns_in_order(spark):
    """For one conversation, recompute contexts in pandas and compare the
    hashes tr02 emits."""
    t = derived_transcripts(spark, SF_DIR).toPandas()
    conv = t[t.conv_id == "conv000000003"].sort_values("turn_idx")
    texts = list(conv["text"])
    got = (
        tr02(spark, SF_DIR)
        .filter(F.col("conv_id") == "conv000000003")
        .toPandas()
        .sort_values("turn_idx")
    )
    for _, row in got.iterrows():
        i = int(row["turn_idx"])
        ctx = "\n".join(texts[max(0, i - _CTX_TURNS) : i])
        assert row["context_hash"] == _md5(ctx)
        assert row["response_hash"] == _md5(texts[i])
        assert int(row["n_context_turns"]) == min(i, _CTX_TURNS)
        assert int(row["context_chars"]) == len(ctx)
    # assistant turns only: in odd-numbered conversations the doc_id
    # parity puts them at turns 0, 2, 4 — turn 0 exercises the
    # empty-context frame (coalesced to '' on both engines)
    assert sorted(got["turn_idx"]) == [0, 2, 4]
    assert got.loc[got.turn_idx == 0, "context_hash"].iloc[0] == _md5("")


def test_tr01_rollup_matches_pandas(spark):
    t = derived_transcripts(spark, SF_DIR).toPandas()
    got = tr01(spark, SF_DIR).toPandas().set_index("conv_id").sort_index()
    grp = t.sort_values("turn_idx").groupby("conv_id")
    assert (got["n_turns"] == grp.size()).all()
    assert (got["first_role"] == grp["role"].first()).all()
    assert (got["last_role"] == grp["role"].last()).all()
    span = grp["ts"].max() - grp["ts"].min()
    assert (got["span_seconds"] == span.dt.total_seconds().astype(int)).all()
    conv_hash = grp["text"].apply(lambda s: _md5("\n".join(s)))
    assert (got["conv_text_hash"] == conv_hash).all()


def test_tr03_dedup_and_gates_bite(spark, tmp_path):
    """The driver corpus has no duplicate texts, so tr03's dedup stage
    passes everything through there; this fixture plants an identical
    assistant response in two conversations and a too-short response, and
    asserts the dedup keeps only the earliest (conv_id, turn_idx) and the
    quality gates drop the short/contextless rows."""
    import pandas as pd

    from localsearchengine_spark.plans.transcripts import tr03

    dup = "the same answer with plenty of tokens inside"
    texts = [f"filler text row {i} with several tokens" for i in range(20)]
    texts[1] = dup            # conv0 turn1  (assistant, has context)
    texts[11] = dup           # conv2 turn1  (assistant, has context) — dropped
    texts[7] = "too short"    # conv1 turn2 (doc 7 odd -> assistant)
    pdf = pd.DataFrame({"doc_id": range(20), "text": texts})
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf)
    pdf.to_parquet(os.path.join(sf, "documents.parquet"))
    got = tr03(spark, sf).toPandas().set_index(["conv_id", "turn_idx"])
    # the duplicate survives only at its earliest position
    assert ("conv000000000", 1) in got.index
    assert ("conv000000002", 1) not in got.index
    # the 2-token response fails the >=5-token gate
    assert ("conv000000001", 2) not in got.index
    # turn-0 assistant rows (odd convs) have no context -> gated out
    assert not [ix for ix in got.index if ix[1] == 0]
