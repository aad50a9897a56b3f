"""Driver rows st01/st02 — Structured Streaming analytics (SURVEY.md §2
A27/A28, streaming/analytics.py).

The driver's events table is staged into a drop directory as ONE parquet
file, so the ``availableNow`` run is exactly one micro-batch and update-mode
emits exactly one row per key — making the streaming result directly
comparable to the batch SQL oracle (full value-hash).  The multi-batch
semantics the single-batch driver row cannot show — watermark late-row drop,
cumulative state across micro-batches — are pinned deterministically in
``tests/test_streaming_analytics.py``.

Timestamps cross the comparison as integer epoch microseconds
(``unix_micros`` / DuckDB ``epoch_us``; session TZ pinned UTC, parquet
timestamps naive UTC) — integer-exact, no format-string quirks.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from localsearchengine_spark.plans.relational import q
from localsearchengine_spark.streaming.analytics import (
    run_available_now,
    stateful_user_sessions,
    stream_events,
    windowed_event_aggregate,
)


def _stage_events(sf_dir: str) -> str:
    from localsearchengine_spark.plans.entry_helpers import _workdir

    drop = _workdir("lse_evdrop_")
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"), os.path.join(drop, "b0.parquet")
    )
    return drop


@q(
    "st01_stream_windowed_agg",
    """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
              event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1, 2""",
)
def st01(spark, sf_dir):
    agg = windowed_event_aggregate(
        stream_events(spark, _stage_events(sf_dir)), window="1 hour",
        watermark="1 hour",
    )
    tbl = run_available_now(agg, output_mode="update")
    # 1-hour tumbling windows are calendar-aligned, so window.start ≡
    # date_trunc('hour', ts) on the oracle side
    return spark.table(tbl).select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("sum_value", 2).alias("sum_value"),
    )


@q(
    "st02_stream_stateful_sessions",
    """SELECT user_id,
              CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 2) AS sum_value,
              epoch_us(max(ts)) AS last_ts_us
       FROM events GROUP BY user_id""",
)
def st02(spark, sf_dir):
    sess = stateful_user_sessions(stream_events(spark, _stage_events(sf_dir)))
    tbl = run_available_now(sess, output_mode="update")
    return spark.table(tbl).select(
        "user_id",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        "last_ts_us",
    )
