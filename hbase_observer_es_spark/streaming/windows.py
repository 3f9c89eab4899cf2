"""Event-time windowed aggregation (streaming surface, SURVEY.md §2-C s_win_*).

These use the streaming window operators (F.window / F.session_window) — the exact
expressions you'd run under readStream with a watermark; Spark's incrementalization is
what changes, not the query. Executing them over the batch events table gives the
deterministic "final state" the DuckDB oracle can check; streaming/stateful.py runs
true readStream twins of the same shapes.

Reference tether: the reference's only notion of time is its 10 s flush timer
(/root/reference/src/main/java/langya/hbase/observer/util/ElasticsearchBulkOperator.java:30-31);
event-time windowing is part of the ES-delegated query surface (date_histogram) we own
natively (SURVEY.md §2-B).

Scale: windowed aggs shuffle on (window, key); watermarking bounds state; tumbling and
sliding windows are map-side assignable (no per-key sort), session windows merge within
key partitions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum, sql_dsum
from ..io import table


def s_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows per event_type (ES date_histogram analogue)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SQL_WIN_TUMBLING = f"""
SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start,
       time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS win_end,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum("value", "sum_value")}
FROM events
GROUP BY 1, 2, 3
"""


def s_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes — each event lands in 2 windows."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# Sliding window assignment in SQL: an event at t belongs to windows starting at
# time_bucket(5m, t) and time_bucket(5m, t) - 5m (10m width / 5m slide = 2 windows).
SQL_WIN_SLIDING = f"""
WITH assigned AS (
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start, event_type, value
    FROM events
    UNION ALL
    SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS win_start,
           event_type, value
    FROM events
)
SELECT win_start,
       win_start + INTERVAL '10 minutes' AS win_end,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum("value", "sum_value")}
FROM assigned
GROUP BY 1, 2, 3
"""


def s_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user, 30-minute inactivity gap — Spark's native
    session_window (merging interval state per key)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
            "sum_value",
        )
    )


# Batch-equivalent oracle via gap-islands: a new session starts when the gap from the
# previous event of the same user exceeds 30 minutes; session end = last event + gap
# (Spark session_window semantics).
SQL_WIN_SESSION = f"""
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
islands AS (
    SELECT user_id, ts, value,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess_id
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS sess_start,
       MAX(ts) + INTERVAL '30 minutes' AS sess_end,
       COUNT(*) AS n_events,
       {sql_dsum("value", "sum_value")}
FROM islands
GROUP BY user_id, sess_id
"""


QUERIES = {
    "s_win_tumbling": s_win_tumbling,
    "s_win_sliding": s_win_sliding,
    "s_win_session": s_win_session,
}

ORACLES = {
    "s_win_tumbling": SQL_WIN_TUMBLING,
    "s_win_sliding": SQL_WIN_SLIDING,
    "s_win_session": SQL_WIN_SESSION,
}
