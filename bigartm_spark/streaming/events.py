"""§2.K beyond online EM: event-stream operators with event time.

The reference has no event-time machinery (processing-time micro-batches
only) — these are the extension a production event pipeline needs, built
on Structured Streaming primitives so one definition serves both batch
and streaming reads:

- hourly_event_counts: tumbling-window agg; on a stream, add a watermark
  so late rows are accepted up to the bound and state is dropped after.
- sessionize_events: gap-based session_window — the streaming-native
  form of the ev_sessionize lag query (same 30-min-gap semantics).
- running_user_counts: custom stateful operator via
  applyInPandasWithState (per-user running totals with idle timeout) —
  the extension point for stateful logic Spark's built-ins can't express.

All operators take the relation, not a path: feed spark.read.parquet for
batch or spark.readStream for streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigartm_spark.functions.timeutil import normalize_ts


def with_watermark_if_streaming(events: DataFrame, watermark: str) -> DataFrame:
    """Normalize ts (bigint-ns / timestamp_ntz / timestamp all become one
    TIMESTAMP instant — see functions/timeutil.py) and, on streaming
    relations only, attach the watermark; batch reads pass through so the
    same query text works in both modes."""
    events = normalize_ts(events)
    return (
        events.withWatermark("ts", watermark) if events.isStreaming else events
    )


def hourly_event_counts(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """(hour_start, event_type, n, total_value): tumbling 1-hour window.
    Streaming: append-mode capable once the watermark passes the window
    end; state for closed windows is dropped (bounded memory at any
    scale)."""
    ev = with_watermark_if_streaming(events, watermark)
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize_events(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """(user_id, session_start, session_end, n_events): gap-based
    sessions via session_window — the built-in replaces the batch
    lag-compare (ev_sessionize) with merge-on-overlap state that works
    on late/out-of-order streams."""
    ev = with_watermark_if_streaming(events, watermark)
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


_RUNNING_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_RUNNING_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_counts(
    events: DataFrame, idle_timeout_ms: int = 30 * 60 * 1000
) -> DataFrame:
    """Per-user running (n_events, total_value) as a custom stateful
    operator: applyInPandasWithState keeps one tiny state row per user,
    emits the running totals each micro-batch, and frees state after
    ``idle_timeout_ms`` with no events (ProcessingTimeTimeout) — the
    bounded-state shape for billions of keys. Streaming-only."""

    def update(key, pdfs, state):
        user_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        import pandas as pd

        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        _RUNNING_OUT,
        _RUNNING_STATE,
        "update",
        "ProcessingTimeTimeout",
    )
