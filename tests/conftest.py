from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
# Python workers must import the package too. Prod ships it via
# `spark-submit --py-files dist/engine.zip` (BASELINE.json:6); locally the
# worker processes inherit PYTHONPATH from the driver environment.
os.environ["PYTHONPATH"] = REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("localsearchengine-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_small(tmp_path_factory):
    """2,000-turn deterministic transcripts fixture (FIXTURES.md §2)."""
    from localsearchengine_spark.sources.fixtures import make_transcripts, write_transcripts_parquet

    pdf = make_transcripts(2000)
    p = tmp_path_factory.mktemp("data") / "transcripts_small.parquet"
    write_transcripts_parquet(pdf, str(p))
    return str(p), pdf


@pytest.fixture(scope="session")
def built_index(spark, transcripts_small, tmp_path_factory):
    """One shared small index build (hot threshold low → salting exercised)."""
    from localsearchengine_spark.build import build_index
    from localsearchengine_spark.config import BuildConfig

    path, pdf = transcripts_small
    idx = str(tmp_path_factory.mktemp("idx") / "index_small")
    conf = BuildConfig(num_partitions=8, hot_df_threshold=300, block_size=64)
    report = build_index(spark, path, idx, conf)
    return idx, report, pdf
