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
