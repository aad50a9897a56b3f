"""Streaming analytics operators (Structured Streaming, beyond the batch mandate).

A27 — watermarked tumbling-window aggregation (driver row st01): readStream
over a parquet drop directory → ``withWatermark`` → ``window()`` groupBy →
memory sink.  Rows older than the watermark are dropped from the aggregation
and closed-window state is evicted — the Structured Streaming contract that
keeps windowed-agg state bounded (open windows only) on an unbounded stream,
which is what survives 10^12 turns.  Pure Catalyst: no Python in the plan.

A28 — custom stateful per-key operator (driver row st02):
``applyInPandasWithState`` accumulates per-user session statistics in
explicit bounded state (three scalars per user), emitting updated totals
each micro-batch.  The state kernel is Arrow-batched pandas (no per-row
Python), and state size is O(distinct keys), independent of event volume.

Both run with ``trigger(availableNow=True)`` so a finite drop directory
behaves as a terminating stream (tests / driver harness), while the same
code runs unbounded in production.  Multi-batch semantics (late-row drop,
cumulative state across micro-batches) are pinned deterministically in
``tests/test_streaming_analytics.py`` via per-file micro-batches with
strictly increasing mtimes (the FileStreamSource pickup order).
"""

from __future__ import annotations

import itertools

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# events table shape (TESTDATA.md)
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_MEM_SEQ = itertools.count()


def stream_events(
    spark: SparkSession, drop_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a parquet drop directory of events rows."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.parquet(drop_dir)


def windowed_event_aggregate(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window count/sum per event_type with a late-data watermark.

    State is kept only for windows whose end is newer than
    ``max(event time) - watermark``; later-arriving rows for evicted windows
    are dropped (never re-aggregated), so state stays bounded regardless of
    stream length.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )


def _epoch_us(ts: pd.Series) -> int:
    """Max of a pandas timestamp series as integer epoch microseconds,
    robust to ns/us storage and tz-aware frames."""
    if getattr(ts.dtype, "tz", None) is not None:
        ts = ts.dt.tz_localize(None)
    return int(ts.astype("datetime64[us]").astype("int64").max())


def stateful_user_sessions(events: DataFrame) -> DataFrame:
    """Per-user running session stats via ``applyInPandasWithState``.

    Emits one updated ``(user_id, n_events, sum_value, last_ts_us)`` row per
    key per micro-batch in which the key received data; the final emission
    per key equals the batch ``groupBy(user_id)`` aggregate (gated by the
    st02 oracle).
    """
    out_schema = "user_id long, n_events long, sum_value double, last_ts_us long"
    state_schema = "n long, s double, mts long"

    def fn(key, pdf_iter, state: GroupState):
        n, s, mts = state.get if state.exists else (0, 0.0, -(1 << 62))
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            s += float(pdf["value"].sum())
            mts = max(mts, _epoch_us(pdf["ts"]))
        state.update((n, s, mts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "last_ts_us": [mts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_available_now(
    df: DataFrame, *, output_mode: str = "update", name: str | None = None,
    timeout_s: int = 300,
) -> str:
    """Run a streaming DataFrame to completion over a finite source and
    return the memory-sink table name holding every emitted row."""
    name = name or f"lse_stream_{next(_MEM_SEQ)}"
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(f"stream {name} did not finish within {timeout_s}s")
    return name
