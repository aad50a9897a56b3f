"""Helpers for the driver contract (__spark_entry__.py).

The driver's tables (TESTDATA.md) have a ``documents`` corpus; the engine's
native input shape is the transcripts table (BASELINE.json:15).  The adapter
below maps documents → single-turn transcripts so the flagship query runs the
*real* engine (build → compressed postings → BM25 top-k) end-to-end on
driver-provided data.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsearchengine_spark.build import build_index
from localsearchengine_spark.config import BuildConfig


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.format_string("doc%012d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("ts"),
    )


_INDEX_CACHE: dict[tuple[str, bool], str] = {}


def ensure_documents_index(
    spark: SparkSession, sf_dir: str, positions: bool = False
) -> str:
    """Build (once per process) an index over the sf_dir documents corpus.

    With documents mapped to conv_id "doc%012d" and turn_idx 0, the engine's
    dense deterministic doc_id equals the source ``doc_id`` — asserted here.
    ``positions=True`` builds a separate positional index (phrase queries).
    """
    key = (os.path.abspath(sf_dir), positions)
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    src = tempfile.mkdtemp(prefix="lse_corpus_")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rng = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if not (rng["lo"] == 0 and rng["hi"] == rng["n"] - 1):
        raise ValueError(
            "documents.doc_id must be dense 0..N-1 for engine docIDs to "
            f"equal source doc_ids (got min={rng['lo']}, max={rng['hi']}, n={rng['n']})"
        )
    documents_as_transcripts(spark, sf_dir).write.mode("overwrite").parquet(src)
    idx_dir = tempfile.mkdtemp(prefix="lse_index_")
    conf = BuildConfig(
        num_partitions=8, hot_df_threshold=2000, block_size=128,
        store_positions=positions,
    )
    build_index(spark, src, idx_dir, conf)
    _INDEX_CACHE[key] = idx_dir
    return idx_dir
