"""Event-time streaming operators (§2.K extension): one definition for
batch and stream, watermarks bound state, applyInPandasWithState for
custom stateful logic."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark):
    rows = []
    # user 1: two sessions (40-min gap); user 2: one session
    for i, off_min in enumerate([0, 10, 20, 60, 70]):
        rows.append((i, T0 + dt.timedelta(minutes=off_min), 1, "click", 1.0))
    for i, off_min in enumerate([5, 15]):
        rows.append((10 + i, T0 + dt.timedelta(minutes=off_min), 2, "view", 2.0))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_hourly_counts_batch(spark):
    from bigartm_spark.streaming.events import hourly_event_counts

    out = {
        (r["hour_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in hourly_event_counts(_events(spark)).collect()
    }
    assert out[(T0, "click")] == (3, 3.0)  # minutes 0,10,20
    assert out[(T0 + dt.timedelta(hours=1), "click")] == (2, 2.0)  # 60,70
    assert out[(T0, "view")] == (2, 4.0)


def test_sessionize_batch_matches_gap_semantics(spark):
    from bigartm_spark.streaming.events import sessionize_events

    got = sorted(
        (r["user_id"], r["n_events"])
        for r in sessionize_events(_events(spark)).collect()
    )
    # user 1: [0,10,20] then [60,70] (40-min gap splits); user 2: [5,15]
    assert got == [(1, 2), (1, 3), (2, 2)]


def test_hourly_and_session_streaming(spark, tmp_path):
    """The same operators run as a real stream (file source, availableNow,
    complete mode) and agree with the batch result."""
    from bigartm_spark.streaming.events import (
        hourly_event_counts,
        sessionize_events,
    )

    src = str(tmp_path / "ev_src")
    _events(spark).write.parquet(src)
    schema = _events(spark).schema
    stream = spark.readStream.schema(schema).parquet(src)
    assert stream.isStreaming

    q1 = (
        hourly_event_counts(stream)
        .writeStream.format("memory")
        .queryName("hourly_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(60)
    batch = {
        (r["hour_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in hourly_event_counts(_events(spark)).collect()
    }
    streamed = {
        (r["hour_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("select * from hourly_mem").collect()
    }
    assert streamed == batch and len(streamed) > 0

    q2 = (
        sessionize_events(stream)
        .writeStream.format("memory")
        .queryName("sessions_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    got = sorted(
        (r["user_id"], r["n_events"])
        for r in spark.sql("select * from sessions_mem").collect()
    )
    assert got == [(1, 2), (1, 3), (2, 2)]


def test_running_user_counts_stateful_stream(spark, tmp_path):
    """applyInPandasWithState: per-user running totals with timeout."""
    from bigartm_spark.streaming.events import running_user_counts

    src = str(tmp_path / "ev_src2")
    _events(spark).write.parquet(src)
    schema = _events(spark).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        running_user_counts(stream)
        .writeStream.format("memory")
        .queryName("running_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select * from running_mem").collect()
    # last emitted row per user carries the final running totals
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[1] == (5, 5.0)
    assert final[2] == (2, 4.0)
