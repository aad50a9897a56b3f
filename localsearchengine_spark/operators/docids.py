"""A2 — stable turn ordering + deterministic dense docID assignment.

BASELINE.json:6: "documents keyed by conv_id+turn_idx under stable turn
ordering".  ``doc_id = conv_offset(conv_id) + turn_idx`` where conv_offset is
the number of turns in all conversations with a lexicographically smaller
conv_id.  This is invariant to partition layout and parallelism level —
unlike ``zipWithIndex``/``monotonically_increasing_id`` (SURVEY.md §7.4-1).

Scale path (10^12 turns ⇒ ~10^11 conversations — a single-partition global
window over conversations would NOT fly): a range-partitioned two-phase
prefix sum.

  1. ``convs = transcripts.groupBy(conv_id).agg(n_turns)``  (map-side combine)
  2. range-partition convs by conv_id, sort within partitions
  3. per-partition turn totals → driver (one row per partition) → exclusive
     prefix over partitions (partition order == conv_id order because range
     partitioning assigns contiguous key ranges to increasing partition ids)
  4. mapInPandas adds partition offset + local exclusive cumsum

The result depends only on the *sorted order* of conv_ids, never on where the
range boundaries land, so sampling nondeterminism in RangePartitioner cannot
change doc_ids.  The sorted convs frame is persisted between phase 3 and 4 so
both actions see the same physical partitioning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def conversation_offsets(transcripts: DataFrame, num_partitions: int = 0) -> DataFrame:
    """→ DataFrame(conv_id string, n_turns long, conv_offset long).

    Asserts the per-conversation ``turn_idx`` contiguity invariant that makes
    doc_ids dense (FIXTURES.md §2; prod gets this validation pass too).
    """
    spark = transcripts.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    convs = transcripts.groupBy("conv_id").agg(
        (F.max("turn_idx") + 1).alias("n_turns"),
        F.count(F.lit(1)).alias("_cnt"),
        F.count_distinct("turn_idx").alias("_dcnt"),
    )

    csorted = (
        convs.repartitionByRange(P, "conv_id")
        .sortWithinPartitions("conv_id")
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ONE action yields both the per-partition prefix sums and the turn_idx
    # contiguity/uniqueness validation (dense docIDs require 0..n-1 per conv)
    bad_cond = (F.col("_cnt") != F.col("n_turns")) | (
        F.col("_dcnt") != F.col("n_turns")
    )
    stats = csorted.groupBy("pid").agg(
        F.sum("n_turns").alias("s"),
        F.min(F.when(bad_cond, F.col("conv_id"))).alias("bad_conv"),
    ).collect()
    bad = sorted(r["bad_conv"] for r in stats if r["bad_conv"] is not None)
    if bad:
        raise ValueError(
            f"turn_idx not contiguous/unique for conv_id={bad[0]}; "
            "dense docID scheme requires 0..n-1 per conversation"
        )
    part_sums = {r["pid"]: r["s"] for r in stats}
    offsets = {}
    acc = 0
    for pid in sorted(part_sums):
        offsets[pid] = acc
        acc += int(part_sums[pid])

    def add_offsets(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running: dict[int, int] = {}
        for pdf in it:
            if pdf.empty:
                continue
            pid = int(pdf["pid"].iloc[0])
            start = running.get(pid, offsets[pid])
            cum = pdf["n_turns"].cumsum().shift(fill_value=0) + start
            running[pid] = int(start + pdf["n_turns"].sum())
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "n_turns": pdf["n_turns"],
                    "conv_offset": cum.astype("int64"),
                }
            )

    out = csorted.mapInPandas(
        add_offsets, schema="conv_id string, n_turns long, conv_offset long"
    )
    # materialization note: callers that need csorted released should
    # checkpoint/persist `out`; for build jobs the offsets frame is small
    # relative to turns and is consumed once into a join.
    return out


def assign_doc_ids(
    transcripts: DataFrame, num_partitions: int = 0, doc_id_base: int = 0
) -> DataFrame:
    """transcripts → transcripts + ``doc_id`` (dense, deterministic).

    ``doc_id_base`` offsets the whole id space — incremental batches appended
    to an existing index (streaming/incremental.py, merge.py) pass the
    current corpus size so doc_id spaces stay disjoint and range-ordered.

    The offsets⋈transcripts join is an equi-join on conv_id; AQE broadcasts
    it when the conversations side is small, and at 10^12-turn scale it is a
    plain shuffled equi-join co-partitioned with downstream per-conv work.
    """
    offs = conversation_offsets(transcripts, num_partitions).select(
        "conv_id", "conv_offset"
    )
    return transcripts.join(offs, "conv_id").withColumn(
        "doc_id",
        F.lit(int(doc_id_base)) + F.col("conv_offset") + F.col("turn_idx").cast("long"),
    ).drop("conv_offset")
