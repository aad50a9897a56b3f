"""Multi-batch Structured-Streaming semantics for streaming/analytics.py
(A27 watermarked windowed agg, A28 applyInPandasWithState sessions).

The driver rows st01/st02 gate single-batch ≡ batch-SQL equivalence; these
tests pin the semantics only a MULTI-batch arrival can show:

  * watermark late-row drop: a row older than the watermark must not
    re-open or mutate an already-closed window's aggregate;
  * cumulative state: applyInPandasWithState totals accumulate across
    micro-batches and the final emission equals the batch aggregate.

Determinism: one parquet file per micro-batch with strictly increasing
mtimes (FileStreamSource orders pending files by (timestamp, path)) and
maxFilesPerTrigger=1.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from localsearchengine_spark.streaming.analytics import (
    run_available_now,
    stateful_user_sessions,
    stream_events,
    windowed_event_aggregate,
)


def _write_batches(tmp_path, batches: list[pd.DataFrame]) -> str:
    """One file per micro-batch, mtimes pinned strictly increasing."""
    drop = str(tmp_path / "drops")
    os.makedirs(drop, exist_ok=True)
    now = time.time()
    for i, pdf in enumerate(batches):
        p = os.path.join(drop, f"b{i}.parquet")
        pdf.to_parquet(p, index=False)
        os.utime(p, (now + i, now + i))
    return drop


def _events(rows) -> pd.DataFrame:
    """rows: (event_id, ts_str, user_id, event_type, value)"""
    return pd.DataFrame(
        {
            "event_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "ts": pd.Series([pd.Timestamp(r[1]) for r in rows]).astype(
                "datetime64[us]"
            ),
            "user_id": pd.Series([r[2] for r in rows], dtype="int64"),
            "event_type": [r[3] for r in rows],
            "value": pd.Series([r[4] for r in rows], dtype="float64"),
            "props": ["{}" for _ in rows],
        }
    )


def test_watermark_drops_late_rows(spark, tmp_path):
    """b1 advances the watermark past hour-0's window end; b2's late hour-0
    row must be dropped — the window's aggregate stays at its b0 value."""
    b0 = _events(
        [
            (1, "2024-03-01 00:10:00", 1, "view", 1.0),
            (2, "2024-03-01 01:10:00", 1, "view", 2.0),
            (3, "2024-03-01 02:10:00", 1, "view", 4.0),
        ]
    )
    b1 = _events([(4, "2024-03-01 10:10:00", 1, "view", 8.0)])
    # late: hour-0 window [00:00, 01:00) closed once watermark hit 09:10
    b2 = _events([(5, "2024-03-01 00:20:00", 1, "view", 16.0)])
    drop = _write_batches(tmp_path, [b0, b1, b2])

    agg = windowed_event_aggregate(
        stream_events(spark, drop, max_files_per_trigger=1),
        window="1 hour", watermark="1 hour",
    )
    tbl = run_available_now(agg, output_mode="update", timeout_s=600)
    out = (
        spark.table(tbl)
        .selectExpr("w.start AS ws", "n_events", "sum_value")
        .toPandas()
    )
    hour0 = out[out["ws"] == pd.Timestamp("2024-03-01 00:00:00")]
    # exactly the one b0 emission; the late row neither re-emitted nor
    # inflated it
    assert len(hour0) == 1
    assert hour0["sum_value"].iloc[0] == 1.0
    assert hour0["n_events"].iloc[0] == 1
    # the on-time windows all present with their exact sums
    sums = out.groupby("ws")["sum_value"].last().to_dict()
    assert sums[pd.Timestamp("2024-03-01 01:00:00")] == 2.0
    assert sums[pd.Timestamp("2024-03-01 02:00:00")] == 4.0
    assert sums[pd.Timestamp("2024-03-01 10:00:00")] == 8.0
    assert 16.0 not in out["sum_value"].tolist()
    assert 17.0 not in out["sum_value"].tolist()


def test_on_time_rows_update_open_window(spark, tmp_path):
    """A second batch inside the watermark updates the same window: update
    mode re-emits the key with the merged aggregate."""
    b0 = _events([(1, "2024-03-01 00:10:00", 1, "view", 1.0)])
    b1 = _events([(2, "2024-03-01 00:20:00", 1, "view", 2.0)])
    drop = _write_batches(tmp_path, [b0, b1])
    agg = windowed_event_aggregate(
        stream_events(spark, drop, max_files_per_trigger=1),
        window="1 hour", watermark="1 hour",
    )
    tbl = run_available_now(agg, output_mode="update", timeout_s=600)
    out = (
        spark.table(tbl)
        .selectExpr("w.start AS ws", "n_events", "sum_value")
        .toPandas()
        .sort_values("n_events")
    )
    # two emissions of the same window: (1, 1.0) then (2, 3.0)
    assert out["n_events"].tolist() == [1, 2]
    assert out["sum_value"].tolist() == [1.0, 3.0]


def test_stateful_sessions_accumulate_across_batches(spark, tmp_path):
    b0 = _events(
        [
            (1, "2024-03-01 00:10:00", 7, "click", 1.0),
            (2, "2024-03-01 00:20:00", 7, "click", 2.0),
            (3, "2024-03-01 00:30:00", 8, "view", 4.0),
        ]
    )
    b1 = _events([(4, "2024-03-01 09:00:00", 7, "click", 8.0)])
    drop = _write_batches(tmp_path, [b0, b1])
    sess = stateful_user_sessions(stream_events(spark, drop, max_files_per_trigger=1))
    tbl = run_available_now(sess, output_mode="update", timeout_s=600)
    out = spark.table(tbl).toPandas()

    u7 = out[out["user_id"] == 7].sort_values("n_events")
    # partial after b0, cumulative after b1
    assert u7["n_events"].tolist() == [2, 3]
    assert u7["sum_value"].tolist() == [3.0, 11.0]
    assert u7["last_ts_us"].tolist() == [
        int(pd.Timestamp("2024-03-01 00:20:00").value // 1_000),
        int(pd.Timestamp("2024-03-01 09:00:00").value // 1_000),
    ]
    # user 8 only saw b0: exactly one emission, equal to its batch aggregate
    u8 = out[out["user_id"] == 8]
    assert len(u8) == 1
    assert u8["n_events"].iloc[0] == 1 and u8["sum_value"].iloc[0] == 4.0


def test_single_file_is_single_batch_per_key(spark, tmp_path):
    """The st01/st02 driver rows rely on one-file ⇒ one micro-batch ⇒ one
    update row per key; pin that contract."""
    b0 = _events(
        [
            (1, "2024-03-01 00:10:00", 1, "view", 1.0),
            (2, "2024-03-01 00:20:00", 1, "view", 2.0),
            (3, "2024-03-01 05:10:00", 2, "click", 4.0),
        ]
    )
    drop = _write_batches(tmp_path, [b0])
    sess = stateful_user_sessions(stream_events(spark, drop))
    tbl = run_available_now(sess, output_mode="update", timeout_s=600)
    out = spark.table(tbl).toPandas()
    assert len(out) == out["user_id"].nunique() == 2


def test_st03_multibatch_staging_and_final_state(spark):
    """The st03 driver row must (a) really run multiple micro-batches — the
    update-mode memory sink holds more emissions than distinct keys — and
    (b) reduce to final state equal to the batch aggregate over all drops."""
    from pyspark.sql import functions as F

    from localsearchengine_spark.plans import streaming_rows as sr

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    drop = sr._stage_events_multibatch(sf)
    files = sorted(os.listdir(drop))
    assert files == ["b0.parquet", "b1.parquet", "b2.parquet"]
    mtimes = [os.path.getmtime(os.path.join(drop, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3

    sess = stateful_user_sessions(
        stream_events(spark, drop, max_files_per_trigger=1)
    )
    tbl = run_available_now(sess, output_mode="update", timeout_s=600)
    emissions = spark.table(tbl)
    n_keys = emissions.select("user_id").distinct().count()
    assert emissions.count() > n_keys  # state accumulated across batches

    final = sr.st03(spark, sf)
    batch = (
        spark.read.parquet(os.path.join(sf, "events.parquet"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("last_ts_us"),
        )
    )
    got = {r["user_id"]: tuple(r) for r in final.collect()}
    exp = {r["user_id"]: tuple(r) for r in batch.collect()}
    assert got == exp


def test_interval_join_matches_across_batches_and_drops_late(spark, tmp_path):
    """A28e stream-stream interval join, the two multi-batch properties:

    1. cross-batch state: an A-side row buffered in batch 1 joins a B-side
       row that only arrives in batch 2;
    2. watermark EVICTION: once the watermark has passed a buffered row's
       timestamp + the join band, that row leaves the state store — a
       matching row arriving in a LATER batch finds nothing to join and the
       match is never emitted.  (The drop is asserted one full batch after
       the watermark advance: within the advancing batch itself, late-input
       filtering for inner joins is best-effort in Spark — the watermark
       update lags the batch that carried the advancing event times.)
    """
    from localsearchengine_spark.streaming.analytics import stream_events
    from localsearchengine_spark.plans.streaming_rows import interval_join_streams

    a_drop = _write_batches(
        tmp_path / "a",
        [
            _events([(1, "2024-01-01 10:00:00", 7, "click", 1.0)]),
            _events([(2, "2024-01-01 20:00:00", 8, "click", 1.0)]),  # advances wm
            _events([(3, "2024-01-01 20:00:01", 8, "click", 1.0)]),
            _events([(4, "2024-01-01 20:00:02", 8, "click", 1.0)]),
        ],
    )
    b_drop = _write_batches(
        tmp_path / "b",
        [
            _events([(101, "2024-01-01 20:00:00", 9, "purchase", 5.0)]),
            _events([(102, "2024-01-01 10:10:00", 7, "purchase", 5.0)]),  # on time
            _events([(103, "2024-01-01 20:00:03", 9, "purchase", 5.0)]),
            # would match event 1, but arrives two batches after both sides'
            # event time passed 20:00 → watermark 19:59 evicted event 1
            # (10:00 + 30 min band < 19:59) at the previous batch boundary
            _events([(104, "2024-01-01 10:05:00", 7, "purchase", 5.0)]),
        ],
    )
    joined = interval_join_streams(
        stream_events(spark, a_drop, max_files_per_trigger=1),
        stream_events(spark, b_drop, max_files_per_trigger=1),
        band_minutes=30,
        watermark="1 minute",
    )
    tbl = run_available_now(joined, output_mode="append")
    got = {
        (r["a_event_id"], r["b_event_id"])
        for r in spark.table(tbl).collect()
    }
    # batch SQL over the same rows would also pair (1, 104); the stream must
    # emit the cross-batch on-time match and miss the post-eviction one
    assert got == {(1, 102)}


def test_outer_join_needs_watermark_advance_to_flush_nulls(spark, tmp_path):
    """A28f left-outer stream-stream join: an unmatched left row emits its
    null-padded result only when the watermark passes its eviction point —
    a stream that merely ENDS never flushes it (no end-of-stream signal).
    Without an advancer batch the unmatched row is swallowed; with one
    advancer pair + one trigger batch it appears.  This pins exactly why
    st07's staging appends the two advancer batches."""
    from localsearchengine_spark.plans.streaming_rows import interval_join_streams
    from localsearchengine_spark.streaming.analytics import stream_events

    def _run(with_advancers: bool, sub: str):
        a_batches = [_events([(1, "2024-01-01 10:00:00", 7, "click", 1.0)])]
        b_batches = [_events([(101, "2024-01-01 10:01:00", 8, "purchase", 2.0)])]
        if with_advancers:
            for j, ts in enumerate(["2024-01-02 10:00:00", "2024-01-03 10:00:00"]):
                a_batches.append(_events([(1000 + j, ts, -1, "click", 0.0)]))
                b_batches.append(_events([(2000 + j, ts, -1, "purchase", 0.0)]))
        joined = interval_join_streams(
            stream_events(spark, _write_batches(tmp_path / f"a{sub}", a_batches),
                          max_files_per_trigger=1),
            stream_events(spark, _write_batches(tmp_path / f"b{sub}", b_batches),
                          max_files_per_trigger=1),
            band_minutes=30,
            watermark="1 minute",
            join_type="left_outer",
        )
        tbl = run_available_now(joined, output_mode="append")
        return {
            (r["a_event_id"], r["b_event_id"])
            for r in spark.table(tbl).filter("user_id >= 0").collect()
        }

    # event 1 (user 7) never matches event 101 (user 8): its outer row
    # exists only in the advancer run
    assert _run(False, "0") == set()
    assert _run(True, "1") == {(1, None)}


def test_session_window_merges_across_batches_and_needs_flush(spark, tmp_path):
    """A27b session_window streaming: (1) a session spanning two
    micro-batches merges into ONE window; (2) an inter-event gap EXACTLY
    equal to the 6h gap still MERGES (Spark's merge bound is inclusive —
    the st08 oracle's strict > operator); (3) append mode emits nothing until the
    watermark passes a session's close point — end-of-input alone flushes
    zero sessions, the advancer batch is what closes the books."""
    from pyspark.sql import functions as F

    def _run(batches, sub):
        drop = _write_batches(tmp_path / sub, batches)
        ev = stream_events(spark, drop, max_files_per_trigger=1)
        agg = (
            ev.withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        tbl = run_available_now(agg, output_mode="append")
        return {
            (r["user_id"], str(r["w"]["start"]), str(r["w"]["end"]), r["n"])
            for r in spark.table(tbl).filter("user_id >= 0").collect()
        }

    real = [
        _events([(1, "2024-01-01 10:00:00", 7, "click", 1.0),
                 (2, "2024-01-01 10:00:00", 8, "click", 1.0)]),
        _events([(3, "2024-01-01 12:00:00", 7, "click", 1.0),   # merges (2h < 6h)
                 (4, "2024-01-01 16:00:00", 8, "click", 1.0)]),  # exact 6h: merges
    ]
    # without advancers: append emits nothing — no session ever closes
    assert _run(real, "noflush") == set()
    adv = [
        _events([(100, "2024-03-01 10:00:00", -1, "click", 0.0)]),
        _events([(101, "2024-05-01 10:00:00", -1, "click", 0.0)]),
    ]
    got = _run(real + adv, "flush")
    assert got == {
        (7, "2024-01-01 10:00:00", "2024-01-01 18:00:00", 2),  # merged session
        (8, "2024-01-01 10:00:00", "2024-01-01 22:00:00", 2),  # exact-gap merge
    }
