"""Event-table queries: processing-time ordering, sessionization, JSON
props — the relational face of the online-EM machinery (§2.K: ordered
batch groups) plus generic time/window coverage over the events table.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigartm_spark.functions.timeutil import normalize_ts
from bigartm_spark.plans.driver_queries import _r6, register


def _events(spark, sf_dir):
    """events with ts normalized to a microsecond TIMESTAMP via
    normalize_ts — the parquet writer has shipped TIMESTAMP(NANOS)
    (bigint under nanosAsLong), tz-adjusted MICROS (timestamp), and
    naive MICROS (timestamp_ntz) across regenerations; all three land on
    the same instants DuckDB's epoch_us sees. Both confs are runtime SQL
    confs — set here so sessions we did not create (the driver's own)
    scan and render identically: UTC session TZ keeps date_trunc/year on
    the normalized TIMESTAMP on the same wall clock as the oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


@register(
    "ev_hourly_type_agg",
    """
SELECT event_type,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 6) AS total_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
""",
)
def ev_hourly_type_agg(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total_value"),
    )
    return _r6(out, "total_value")


@register(
    "ev_sessionize",
    """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) -
                   epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id))
                   > 1800000000 OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM o GROUP BY user_id
""",
)
def ev_sessionize(spark, sf_dir):
    """30-min-gap sessionization: the lag/threshold window shape (E8's
    change-point machinery on a real event stream)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # microsecond-precision gap compare on BOTH engines (epoch_us in the
    # oracle): a whole-second cast would misclassify sub-second straddles
    # of the 1800s boundary (e.g. a 1800.8s gap)
    new_session = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1_800_000_000),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("_ns", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("_ns").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "ev_session_windows",
    """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) -
                   epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id))
                   >= 1800000000 OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS ns
  FROM events
),
s AS (
  SELECT user_id, ts,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       MIN(epoch_us(ts)) AS session_start_us,
       MAX(epoch_us(ts)) + 1800000000 AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
""",
)
def ev_session_windows(spark, sf_dir):
    """Spark's session_window (the streaming-native gap sessionizer,
    streaming/events.py) vs a lag/cumsum reconstruction in the oracle.
    Session boundary is half-open: an event exactly gap after the last
    one starts a NEW session (>= in the oracle's gap test)."""
    from bigartm_spark.streaming.events import sessionize_events

    ev = _events(spark, sf_dir)
    out = sessionize_events(ev, gap="30 minutes")
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        F.col("n_events").cast("long").alias("n_events"),
    )


@register(
    "ev_json_props",
    """
SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
FROM events
""",
)
def ev_json_props(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@register(
    "ev_batch_groups",
    """
SELECT CAST((year(ts) * 400 + dayofyear(ts) - 1) // 2 AS BIGINT) AS group_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
""",
)
def ev_batch_groups(spark, sf_dir):
    """G6 update_after grouping: ordered two-day micro-batch groups (the
    offline replay of the online trainer's batch boundaries). Calendar
    arithmetic, no epoch/timezone semantics involved."""
    ev = _events(spark, sf_dir)
    gid = F.floor(
        (F.year("ts") * 400 + F.dayofyear("ts") - 1) / F.lit(2)
    ).alias("group_id")
    return ev.groupBy(gid).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
