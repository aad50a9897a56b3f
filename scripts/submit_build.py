#!/usr/bin/env python
"""spark-submit entry point for the index build (BASELINE.json:6: "runs via
spark-submit --py-files on multi-executor clusters").

Cluster usage:

    python scripts/package.py                      # → dist/localsearchengine_spark.zip
    spark-submit \
      --master yarn --deploy-mode cluster \
      --num-executors 250 --executor-cores 4 --executor-memory 16g \
      --py-files dist/localsearchengine_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.execution.arrow.pyspark.enabled=true \
      scripts/submit_build.py \
      --source iceberg:warehouse.transcripts \
      --index-dir hdfs:///indexes/transcripts-v1 \
      --num-partitions 4096 --hot-df-threshold 262144

Local smoke (same code path the driver benches):

    spark-submit --master 'local[8]' --py-files dist/localsearchengine_spark.zip \
      scripts/submit_build.py --source /tmp/transcripts.parquet --index-dir /tmp/idx

``resume`` semantics: re-running against an existing --index-dir with the
same pinned input snapshot rebuilds only pending partitions (A11); a changed
input aborts.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="parquet path or iceberg:<catalog.table>")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--num-partitions", type=int, default=0, help="0 → spark.sql.shuffle.partitions")
    ap.add_argument("--hot-df-threshold", type=int, default=50_000)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--resume", action="store_true", help="require an existing build to resume")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lse-index-build").getOrCreate()

    from localsearchengine_spark.build import build_index, resume
    from localsearchengine_spark.config import BM25Config, BuildConfig

    conf = BuildConfig(
        bm25=BM25Config(k1=args.k1, b=args.b),
        num_partitions=args.num_partitions,
        hot_df_threshold=args.hot_df_threshold,
        block_size=args.block_size,
    )
    if args.resume:
        report = resume(spark, args.source, args.index_dir)
    else:
        report = build_index(spark, args.source, args.index_dir, conf)
    print(json.dumps(report.__dict__, default=str))


if __name__ == "__main__":
    main()
