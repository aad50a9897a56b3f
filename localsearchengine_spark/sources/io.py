"""A1 — corpus scan + segment IO. The ONLY module that knows the table format.

Prod target is Iceberg ("over an Iceberg table of multi-turn transcripts",
BASELINE.json:6); this sandbox has no Iceberg jar and no network (SURVEY.md
§0, §7.4-4), so the local implementation is Parquet with identical schemas
behind the same call signatures.  Everything above this module sees plain
DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

_ICEBERG_AVAILABLE = False  # no Iceberg runtime jar in this sandbox


def scan_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Read the transcripts corpus.

    ``source`` is a path (Parquet, local) or ``iceberg:<catalog.table>`` in a
    prod environment with the Iceberg runtime on the classpath.  Column
    pruning and predicate pushdown are Catalyst's job — callers `.select()`
    only what they need and the scan prunes (SURVEY.md §4).
    """
    if source.startswith("iceberg:"):
        if not _ICEBERG_AVAILABLE:
            raise RuntimeError(
                "Iceberg runtime not on classpath in this sandbox; "
                "use a parquet path (prod: spark.read.format('iceberg'))"
            )
        return spark.read.format("iceberg").load(source[len("iceberg:"):])
    return spark.read.parquet(source)


def scan_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided test table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def input_snapshot_id(source: str) -> str:
    """Pin the input for resumable builds (A11).

    Prod: the Iceberg snapshot-id.  Local parquet: a digest of the sorted
    (path, size, mtime) listing — a resume against changed input aborts.
    """
    import hashlib

    h = hashlib.sha256()
    if source.startswith("iceberg:"):
        raise RuntimeError("Iceberg snapshot pinning unavailable in sandbox")
    if os.path.isdir(source):
        names = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(source)
            for f in fs
            if not f.startswith(("_", "."))
        )
    else:
        names = [source]
    for p in names:
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]
