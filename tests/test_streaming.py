"""Structured-Streaming incremental indexing (streaming/incremental.py)."""

from __future__ import annotations

import os

from localsearchengine_spark.operators.search import Index
from localsearchengine_spark.sources.fixtures import (
    golden_queries,
    make_transcripts,
    write_transcripts_parquet,
)
from localsearchengine_spark.streaming.incremental import IncrementalIndexer
from localsearchengine_spark.config import BuildConfig


def test_incremental_stream_equals_full_build(spark, built_index, tmp_path):
    full_idx, _, pdf = built_index
    stream_dir = str(tmp_path / "stream")
    os.makedirs(stream_dir)
    convs = sorted(pdf["conv_id"].unique())
    # 3 micro-batches of whole conversations, in conv order (append contract)
    cuts = [0, len(convs) // 3, 2 * len(convs) // 3, len(convs)]
    for i in range(3):
        part = pdf[pdf["conv_id"].isin(set(convs[cuts[i]:cuts[i + 1]]))]
        write_transcripts_parquet(
            part.reset_index(drop=True), os.path.join(stream_dir, f"b{i}.parquet")
        )
    live = str(tmp_path / "live_index")
    ix = IncrementalIndexer(
        spark, live, str(tmp_path / "work"),
        BuildConfig(num_partitions=6, hot_df_threshold=300, block_size=64),
    )
    q = ix.start(stream_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    queries = golden_queries()[::5]
    got = {
        qd["query_id"]: Index(spark, live).search(qd["terms"], k=qd["k"], mode="wand")
        for qd in queries
    }
    exp = {
        qd["query_id"]: Index(spark, full_idx).search(qd["terms"], k=qd["k"], mode="wand")
        for qd in queries
    }
    assert got == exp


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running an epoch already folded
    into the live index must be a no-op (epoch ledger in meta.json)."""
    import numpy as np
    import pandas as pd

    from localsearchengine_spark.config import BuildConfig
    from localsearchengine_spark.operators.search import Index
    from localsearchengine_spark.streaming.incremental import IncrementalIndexer
    from localsearchengine_spark.utils import read_json

    def batch_df(seed, n):
        from localsearchengine_spark.sources.fixtures import make_transcripts
        return spark.createDataFrame(make_transcripts(n, seed=seed))

    ix = IncrementalIndexer(
        spark, str(tmp_path / "live"), str(tmp_path / "work"),
        BuildConfig(num_partitions=4, hot_df_threshold=10**9),
    )
    ix.process_batch(batch_df(1, 300), epoch_id=0)
    ix.process_batch(batch_df(2, 200), epoch_id=1)
    meta1 = read_json(str(tmp_path / "live" / "meta.json"))
    hits1 = Index(spark, str(tmp_path / "live")).search("spark join", 10, "or")
    # replay epoch 1 (same data): must change nothing
    ix.process_batch(batch_df(2, 200), epoch_id=1)
    meta2 = read_json(str(tmp_path / "live" / "meta.json"))
    assert meta2["n_docs"] == meta1["n_docs"] == 500
    assert meta2["applied_epochs"] == meta1["applied_epochs"]
    assert Index(spark, str(tmp_path / "live")).search("spark join", 10, "or") == hits1


def test_interrupted_swap_recovers(spark, tmp_path):
    """Crash between the two swap renames: live dir gone, .old present —
    the next batch must restore the previous index, not install the new
    micro-batch as the whole corpus."""
    import os
    import shutil

    from localsearchengine_spark.config import BuildConfig
    from localsearchengine_spark.sources.fixtures import make_transcripts
    from localsearchengine_spark.streaming.incremental import IncrementalIndexer
    from localsearchengine_spark.utils import read_json

    live = str(tmp_path / "live")
    ix = IncrementalIndexer(
        spark, live, str(tmp_path / "work"),
        BuildConfig(num_partitions=4, hot_df_threshold=10**9),
    )
    ix.process_batch(spark.createDataFrame(make_transcripts(300, seed=1)), epoch_id=0)
    # simulate the crash window: live renamed away, replacement not yet in
    os.rename(live, live + ".old")
    ix.process_batch(spark.createDataFrame(make_transcripts(100, seed=3)), epoch_id=1)
    meta = read_json(os.path.join(live, "meta.json"))
    assert meta["n_docs"] == 400  # 300 recovered + 100 appended, not 100
