"""Deployment-path integration: the BASELINE.json:6 mandate is "runs via
spark-submit --py-files on multi-executor clusters".  This test executes
that exact path — package the engine into a zip, spark-submit the build
script with ONLY the zip on the Python path (repo stripped from
PYTHONPATH, cwd elsewhere), then open and query the produced index from
this process.  Catches packaging regressions (missing module, relative
import, data file assumption) that in-process tests cannot see.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_build(transcripts_small, tmp_path, spark):
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("spark-submit not on this host")

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py")],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    assert os.path.exists(zip_path)

    src, _ = transcripts_small
    idx = str(tmp_path / "submitted_index")
    env = dict(os.environ)
    # the zip must be the ONLY source of the package
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_build.py"),
            "--source", src,
            "--index-dir", idx,
            "--num-partitions", "4",
            "--hot-df-threshold", "300",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["n_docs"] == 2000

    # the produced index is a normal index: query it from this process
    from localsearchengine_spark.operators.search import Index

    index = Index(spark, idx)
    hits = index.search("spark join", k=5, mode="wand")
    assert len(hits) == 5
