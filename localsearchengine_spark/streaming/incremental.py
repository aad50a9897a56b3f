"""Incremental indexing via Structured Streaming ``foreachBatch``.

The north rule (BASELINE.json:14) is a batch build + query engine, so this
is an *extension*: new transcript conversations arriving on a stream are
indexed as append segments and folded into the main index with the ordered
fast-path merge (A10).  Each micro-batch must contain whole conversations
(the deployment contract for the stream producer); its doc_id space starts
at the current corpus size, so segments stay disjoint + range-ordered and
the merge stays fully declarative.

Exactly-once: foreachBatch stages the batch to
``<work>/batch-{epoch}`` idempotently (overwrite by epoch id) and merge
replaces the live index dir atomically via rename, so replays of an epoch
converge to the same state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from localsearchengine_spark.build import build_index
from localsearchengine_spark.config import BuildConfig
from localsearchengine_spark.operators.merge import merge_indexes
from localsearchengine_spark.sources.io import TRANSCRIPTS_SCHEMA
from localsearchengine_spark.utils import read_json


class IncrementalIndexer:
    """foreachBatch sink that appends micro-batches to a live index."""

    def __init__(self, spark: SparkSession, index_dir: str, work_dir: str,
                 conf: BuildConfig | None = None):
        self.spark = spark
        self.index_dir = index_dir
        self.work_dir = work_dir
        self.conf = conf or BuildConfig()
        os.makedirs(work_dir, exist_ok=True)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        staged = os.path.join(self.work_dir, f"batch-{epoch_id}")
        batch_df.write.mode("overwrite").parquet(staged)

        base = 0
        have_main = os.path.exists(os.path.join(self.index_dir, "meta.json"))
        if have_main:
            base = int(read_json(os.path.join(self.index_dir, "meta.json"))["n_docs"]) \
                + int(read_json(os.path.join(self.index_dir, "meta.json")).get("doc_id_base", 0))
        seg_dir = os.path.join(self.work_dir, f"seg-{epoch_id}")
        if os.path.exists(seg_dir):
            shutil.rmtree(seg_dir)  # epoch replay: rebuild deterministically
        build_index(self.spark, staged, seg_dir, self.conf, doc_id_base=base)

        if not have_main:
            shutil.move(seg_dir, self.index_dir)
            return
        merged = os.path.join(self.work_dir, f"merged-{epoch_id}")
        if os.path.exists(merged):
            shutil.rmtree(merged)
        merge_indexes(self.spark, [self.index_dir, seg_dir], merged)
        old = self.index_dir + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(self.index_dir, old)
        os.rename(merged, self.index_dir)
        shutil.rmtree(old)
        shutil.rmtree(seg_dir)

    def start(self, stream_dir: str, checkpoint_dir: str):
        """readStream over a parquet drop directory → foreachBatch."""
        stream = (
            self.spark.readStream.schema(TRANSCRIPTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
