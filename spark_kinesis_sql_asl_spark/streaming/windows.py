"""Time-window operators, batch-mode twins (SURVEY.md §2 rows B61-B63, B65).

Spark's window/session_window functions run identically in batch and
Structured Streaming [SPARK], which is what makes them oracle-able here; the
streaming execution (watermarks, state eviction, triggers) of the SAME
expressions is exercised by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS we,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_stream_tumbling(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return e.groupBy(w, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).select(
        F.col("window.start").alias("ws"),
        F.col("window.end").alias("we"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "q_stream_sliding",
    oracle="""
    SELECT ws, ws + INTERVAL '1 hour' AS we, count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM (
        SELECT value,
               unnest([time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
        FROM events
    )
    GROUP BY ws
    """,
)
def q_stream_sliding(spark, sf_dir):
    # 1h window sliding by 30min → every event lands in exactly 2 windows;
    # the oracle materializes both bucket starts per row and re-groups.
    e = table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return e.groupBy(w).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).select(
        F.col("window.start").alias("ws"),
        F.col("window.end").alias("we"),
        "n_events",
        "sum_value",
    )


@query(
    "q_stream_session",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
        SELECT *, sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def q_stream_session(spark, sf_dir):
    """B63: session_window(ts, 30m) per user. Oracle is the classic
    gaps-and-islands rewrite. Spark sessions are [start, last_ts + gap):
    an event exactly gap after its predecessor begins a NEW session —
    hence `>=` in the oracle's gap predicate."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "sum_value",
    )


@query(
    "q_stream_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup_keys(spark, sf_dir):
    # B65: dropDuplicates on a key subset — the batch twin of streaming
    # dedup state. Only keys are emitted (which full row survives is
    # nondeterministic by definition in both engines).
    e = table(spark, sf_dir, "events")
    return e.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
