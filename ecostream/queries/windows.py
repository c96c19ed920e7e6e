"""Windowed aggregation operators (SURVEY §2.3 A3-A5, §2.7 K3, §2.10 T2
batch form).

The reference keeps relative-lookback counters per (species, role) for
1/5/15/60-minute windows (consumer.py:32-44,86-110) — with the quirk
that the counters are never decremented (SURVEY T2).  We re-specify to
correct event-time windows: tumbling windows via ``F.window``, sliding
windows via (length, slide), and snapshot lookbacks parameterized on
max(ts) for determinism.

Window buckets are emitted as epoch-second BIGINTs (not timestamps) so
the value-hash comparison against DuckDB is type- and tz-proof; the
bucketing arithmetic (`floor(epoch/width)`) is identical half-open
`[start, end)` math on both engines — exactly what ``F.window``
computes internally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import load_table
from .registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- A3: tumbling-window 2-key counts (consumer.py:32-37,160-162) ----------


@query(
    "a3_tumbling_counts",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
           event_type, user_id % 4 AS role_bucket, count(*) AS cnt
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def a3_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count per (category, role-bucket) per 1-hour tumbling window — the
    reference's (species, role) window counters with correct event-time
    semantics.  Uses F.window (the streaming-compatible form) and
    projects the window start to epoch seconds."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
            (F.col("user_id") % 4).alias("role_bucket"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "role_bucket",
            "cnt",
        )
    )


# --- A3 sliding variant (counter windows 1/5/15/60 min, SURVEY T2) ----------


@query(
    "a3_sliding_counts",
    oracle="""
    SELECT window_start_s, event_type, count(*) AS cnt FROM (
        SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
               event_type
        FROM events
        UNION ALL
        SELECT CAST((floor(epoch(ts) / 3600) - 1) * 3600 AS BIGINT) AS window_start_s,
               event_type
        FROM events
    ) GROUP BY 1, 2
    """,
)
def a3_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (length 2h, slide 1h) per category: each event
    lands in exactly 2 windows.  F.window materializes the window
    assignment as a generator (no self-join); the DuckDB oracle models
    the same assignment as a 2-way UNION ALL of shifted starts."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "cnt",
        )
    )


# --- A4: trend counts under a relative lookback (consumer.py:47-48,163-166)


@query(
    "a4_trend_counts",
    oracle="""
    WITH now_ts AS (SELECT max(ts) AS mx FROM events)
    SELECT event_type, user_id % 4 AS role_bucket, count(*) AS cnt
    FROM events, now_ts
    WHERE ts >= mx - INTERVAL 72 HOURS
    GROUP BY 1, 2
    """,
)
def a4_trend_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event×species and species trend counters under a lookback window;
    'now' parameterized as max(ts) (SURVEY §5 rule 2)."""
    ev = _events(spark, sf_dir)
    mx = ev.agg(F.max("ts").alias("mx"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .where(F.col("ts") >= F.col("mx") - F.expr("INTERVAL 72 HOURS"))
        .groupBy("event_type", (F.col("user_id") % 4).alias("role_bucket"))
        .agg(F.count("*").alias("cnt"))
    )


# --- A5: distinct categories per window (consumer.py:190-198) ---------------


@query(
    "a5_distinct_per_window",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS window_start_s,
           count(DISTINCT event_type) AS n_types,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def a5_distinct_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct species present in a window buffer (the HLL feed) — exact
    distinct per 6-hour tumbling window.  countDistinct expands to a
    two-phase agg (partial distinct then final) — no driver-side sets."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.countDistinct("event_type").alias("n_types"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n_types",
            "n_users",
        )
    )


# --- K3: DGIM capability = conditional count over sliding window ------------


@query(
    "k3_conditional_windowed_count",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS window_start_s,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
           count(*) AS n_total
    FROM events GROUP BY 1
    """,
)
def k3_conditional_windowed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DGIM use-case (count 'predator attack' bits in a time window,
    dgim.py:44 / consultas.py:222-242) as an exact windowed conditional
    count — Spark needs no lossy bucket sketch for this; the windowed
    agg is exact, streaming-compatible, and constant-memory per window.
    'error' plays 'predator attack' (FIXTURES §C)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("n_errors"),
            F.count("*").alias("n_total"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n_errors",
            "n_total",
        )
    )


# --- session windows (T4 — free capability beyond the reference) ------------


@query(
    "t4_session_windows",
    oracle="""
    WITH flagged AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts_us,
               CAST(SUM(new_session) OVER (PARTITION BY user_id
                                           ORDER BY ts_us, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           max(ts_us) - min(ts_us) AS duration_us
    FROM sessions GROUP BY user_id, session_id
    """,
)
def t4_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute gap, expressed as the classic
    lag/cumsum window pattern (partitioned per user — scales: the only
    shuffle is hash(user_id)).  Equivalent to F.session_window but kept
    in plain window functions so the oracle is expressible; all time
    math in integer microseconds to avoid fractional-second drift."""
    from pyspark.sql import Window as W

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w2))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


# --- CAL1: calendar profile (hour-of-day / day-of-week seasonality) ----------


@query(
    "cal1_hourly_profile",
    oracle="""
    SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
           CAST(dayofweek(ts) AS BIGINT) AS day_of_week,
           event_type,
           count(*) AS cnt,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6)
               AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def cal1_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: counts and value by hour-of-day ×
    day-of-week × type — the calendar-bucketing shape behind traffic
    dashboards and anomaly baselines.  DuckDB's dayofweek (0=Sunday)
    differs from Spark's dayofweek (1=Sunday); Spark side subtracts 1
    to pin the same convention.  Single scan, one small shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.hour("ts").cast("long").alias("hour_of_day"),
            (F.dayofweek("ts") - 1).cast("long").alias("day_of_week"),
            "event_type",
        )
        .agg(
            F.count("*").alias("cnt"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .orderBy("hour_of_day", "day_of_week", "event_type")
    )
