"""A10 merge, A11 resume, and build determinism across parallelism."""

from __future__ import annotations

import os
import shutil

import pytest

from localsearchengine_spark.build import build_index, resume
from localsearchengine_spark.config import BuildConfig
from localsearchengine_spark.operators.merge import merge_indexes
from localsearchengine_spark.operators.search import Index
from localsearchengine_spark.sources.fixtures import (
    golden_queries,
    make_transcripts,
    write_transcripts_parquet,
)

CONF = BuildConfig(num_partitions=6, hot_df_threshold=300, block_size=64)


def _split_and_write(pdf, tmp, even_odd: bool):
    convs = sorted(pdf["conv_id"].unique())
    if even_odd:  # interleaved doc ranges → exercises the fallback path
        a_set = set(convs[::2])
    else:  # prefix split → contiguous ranges → ordered fast path
        a_set = set(convs[: len(convs) * 3 // 5])
    a = pdf[pdf["conv_id"].isin(a_set)].reset_index(drop=True)
    b = pdf[~pdf["conv_id"].isin(a_set)].reset_index(drop=True)
    pa_, pb_ = os.path.join(tmp, "a.parquet"), os.path.join(tmp, "b.parquet")
    write_transcripts_parquet(a, pa_)
    write_transcripts_parquet(b, pb_)
    return pa_, pb_, len(a), len(b)


def _query_all(index, queries):
    return {
        q["query_id"]: index.search(q["terms"], k=q["k"], mode="wand") for q in queries
    }


def test_merge_ordered_fast_path(spark, built_index, transcripts_small, tmp_path):
    """Prefix split ⇒ contiguous doc ranges ⇒ declarative merge; merged index
    must answer every golden query identically (bit-equal scores) to the
    single full build, because doc_ids line up with global conv order."""
    full_idx, _, pdf = built_index
    pa_, pb_, n_a, _ = _split_and_write(pdf, str(tmp_path), even_odd=False)
    ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(spark, pa_, ia, CONF)
    build_index(spark, pb_, ib, CONF, doc_id_base=n_a)
    out = str(tmp_path / "merged")
    meta = merge_indexes(spark, [ia, ib], out)
    assert meta["merge_path"] == "ordered"
    queries = golden_queries()[::4]
    got = _query_all(Index(spark, out), queries)
    exp = _query_all(Index(spark, full_idx), queries)
    assert got == exp


def test_merge_interleaved_fallback(spark, built_index, transcripts_small, tmp_path):
    """The decode→merge-sort→re-encode fallback must produce the same query
    results as the declarative ordered path on the same segments (forced via
    force_path), and duplicate doc_ids across segments must be rejected."""
    full_idx, _, pdf = built_index
    pa_, pb_, n_a, _ = _split_and_write(pdf, str(tmp_path), even_odd=False)
    ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(spark, pa_, ia, CONF)
    build_index(spark, pb_, ib, CONF, doc_id_base=n_a)
    fast = str(tmp_path / "fast")
    slow = str(tmp_path / "slow")
    assert merge_indexes(spark, [ia, ib], fast)["merge_path"] == "ordered"
    assert (
        merge_indexes(spark, [ia, ib], slow, force_path="interleaved")["merge_path"]
        == "interleaved"
    )
    queries = golden_queries()[::4]
    assert _query_all(Index(spark, slow), queries) == _query_all(
        Index(spark, fast), queries
    )
    # duplicate doc_id spaces must be rejected by the fallback's merge check
    with pytest.raises(Exception):
        merge_indexes(spark, [ia, ia], str(tmp_path / "bad"), force_path="interleaved")
        spark.read.parquet(os.path.join(str(tmp_path / "bad"), "postings")).collect()


def test_resume_after_partial_failure(spark, transcripts_small, tmp_path):
    path, _ = transcripts_small
    clean = str(tmp_path / "clean")
    build_index(spark, path, clean, CONF)
    hurt = str(tmp_path / "hurt")
    shutil.copytree(clean, hurt)
    for pid in (1, 4):
        os.remove(os.path.join(hurt, "postings", f"part-{pid:05d}.parquet"))
        os.remove(os.path.join(hurt, "manifest", f"postings-{pid:05d}.json"))
    rep = resume(spark, path, hurt)
    assert rep.partitions_built == 2 and rep.partitions_skipped == 4
    queries = golden_queries()[::6]
    assert _query_all(Index(spark, hurt), queries) == _query_all(
        Index(spark, clean), queries
    )
    # idempotence: resuming a finished build is a no-op
    rep2 = resume(spark, path, hurt)
    assert rep2.partitions_built == 0


def test_build_determinism_across_parallelism(spark, transcripts_small, tmp_path):
    """SURVEY.md §5 determinism row: different shuffle parallelism ⇒ same
    dictionary and bit-identical query results (the design-carried guarantee
    Spark itself does not give)."""
    path, _ = transcripts_small
    i4 = str(tmp_path / "p4")
    i13 = str(tmp_path / "p13")
    build_index(spark, path, i4, BuildConfig(num_partitions=4, hot_df_threshold=300, block_size=64))
    build_index(spark, path, i13, BuildConfig(num_partitions=13, hot_df_threshold=300, block_size=64))
    d4 = {
        r["term"]: (r["df"], r["cf"])
        for r in spark.read.parquet(os.path.join(i4, "dictionary")).collect()
    }
    d13 = {
        r["term"]: (r["df"], r["cf"])
        for r in spark.read.parquet(os.path.join(i13, "dictionary")).collect()
    }
    assert d4 == d13
    queries = golden_queries()[::4]
    assert _query_all(Index(spark, i4), queries) == _query_all(Index(spark, i13), queries)


def test_merge_positional_interleaved(spark, transcripts_small, tmp_path):
    """Interleaved (decode→merge-sort→re-encode) merge of POSITIONAL
    segments: the merged index must answer phrase queries identically to a
    single full positional build (the round-1 NotImplementedError path)."""
    path, pdf = transcripts_small
    pconf = BuildConfig(num_partitions=4, hot_df_threshold=300, block_size=64,
                        store_positions=True)
    full = str(tmp_path / "pfull")
    build_index(spark, path, full, pconf)
    pa_, pb_, n_a, _ = _split_and_write(pdf, str(tmp_path), even_odd=False)
    ia, ib = str(tmp_path / "pia"), str(tmp_path / "pib")
    build_index(spark, pa_, ia, pconf)
    build_index(spark, pb_, ib, pconf, doc_id_base=n_a)
    out = str(tmp_path / "pmerged")
    meta = merge_indexes(spark, [ia, ib], out, force_path="interleaved")
    assert meta["merge_path"] == "interleaved"
    mi, fi = Index(spark, out), Index(spark, full)
    for q in ('"the small batch"', '"fast scan"', '"join order" -dup', "spark"):
        assert mi.search(q, k=15, mode="wand") == fi.search(q, k=15, mode="wand"), q


def test_reorder_positions_scrambled():
    """The position gather must be correct under a genuinely out-of-order
    permutation (overlapping doc ranges across external segments)."""
    import numpy as np

    from localsearchengine_spark.operators.merge import reorder_positions

    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 5, size=50).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
    flat = np.arange(int(tfs.sum()), dtype=np.int64)
    order = rng.permutation(50)
    got = reorder_positions(flat, starts, tfs, order)
    exp = np.concatenate([flat[starts[i]: starts[i] + tfs[i]] for i in order])
    assert (got == exp).all()


def test_merge_pre_positions_segments(spark, transcripts_small, tmp_path):
    """Version shim: segments written without the blocks[].pos_bytes field
    (pre-positions layout) must merge cleanly, not fail analysis."""
    from pyspark.sql import functions as F

    path, pdf = transcripts_small
    pa_, pb_, n_a, _ = _split_and_write(pdf, str(tmp_path), even_odd=False)
    ia, ib = str(tmp_path / "via"), str(tmp_path / "vib")
    build_index(spark, pa_, ia, CONF)
    build_index(spark, pb_, ib, CONF, doc_id_base=n_a)
    # strip pos_bytes from one segment's postings, simulating an old index
    posts = spark.read.parquet(os.path.join(ia, "postings"))
    fields = [f for f in posts.schema["blocks"].dataType.elementType.fieldNames()
              if f != "pos_bytes"]
    stripped = posts.withColumn(
        "blocks",
        F.transform("blocks", lambda blk: F.struct(*[blk[f].alias(f) for f in fields])),
    )
    stripped.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "olddir"))
    import shutil as _sh
    _sh.rmtree(os.path.join(ia, "postings"))
    _sh.move(os.path.join(str(tmp_path), "olddir"), os.path.join(ia, "postings"))
    out = str(tmp_path / "vmerged")
    merge_indexes(spark, [ia, ib], out)
    queries = golden_queries()[::10]
    got = _query_all(Index(spark, out), queries)
    assert any(len(v) for v in got.values())
