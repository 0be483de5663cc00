"""T-group streaming operators (SURVEY §2.3 T1-T5) declared as event-time
batch recomputations — per SURVEY §7 "hard parts" #5, the reference flushes on
first-seen age per (service, minute) (reference src/batch/buffered_batch.rs:55-59),
which is wall-clock-dependent; the deterministic oracle-able surface is the
event-time semantics, identical between a batch run and a Structured Streaming
run over the same closed input. The live readStream forms of the same
pipelines are in otlp2parquet_spark.streaming.pipeline and are exercised
operationally in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from otlp2parquet_spark.queries.registry import T, query
from otlp2parquet_spark.queries.relational import davg, dsum, sql_davg, sql_dsum


@query(
    "t1_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
           time_bucket(INTERVAL '1 minute', ts) + INTERVAL 1 MINUTE AS window_end,
           event_type, COUNT(*) AS n, """
    + sql_dsum("value", "total_value")
    + """
    FROM events
    GROUP BY window_start, window_end, event_type
    ORDER BY window_start, event_type
    """,
    tags=("T1", "F2"),
)
def t1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-minute window agg — the event-time twin of the reference's
    (service, minute) batch key (reference src/batch/mod.rs:24-44)."""
    e = T(spark, sf_dir, "events")
    win = F.window("ts", "1 minute")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "t2_sliding_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 minute', ts) - k.k * INTERVAL 1 MINUTE AS window_start,
           time_bucket(INTERVAL '1 minute', ts) - k.k * INTERVAL 1 MINUTE + INTERVAL 5 MINUTE AS window_end,
           COUNT(*) AS n, """
    + sql_davg("value", "avg_value")
    + """
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4]) AS k) k
    GROUP BY window_start, window_end
    ORDER BY window_start
    """,
    tags=("T2", "F2"),
)
def t2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 5 min / slide 1 min: each event belongs to 5 windows;
    Spark's window() expands them natively, the oracle expands via unnest."""
    e = T(spark, sf_dir, "events")
    win = F.window("ts", "5 minutes", "1 minute")
    return (
        e.groupBy(win.alias("w"))
        .agg(F.count("*").alias("n"), davg(F.col("value"), "avg_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "avg_value",
        )
        .orderBy("window_start")
    )


@query(
    "t3_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 600 * 1000000
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 10 MINUTE AS session_end,
           COUNT(*) AS n_events, """
    + sql_dsum("value", "session_value")
    + """
    FROM sessions
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    tags=("T3",),
)
def t3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (gap 10 min) per user via native session_window — the
    oracle twin is the classic gaps-and-islands SQL. Spark's session end is
    last event + gap, reproduced in the oracle."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), "session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "t5_keyed_dedup",
    oracle="""
    SELECT user_id, event_type,
           time_bucket(INTERVAL '1 minute', ts) AS minute_bucket,
           MIN(event_id) AS first_event_id,
           COUNT(*) AS n_dupes
    FROM events
    GROUP BY user_id, event_type, minute_bucket
    ORDER BY user_id, event_type, minute_bucket
    """,
    tags=("T5", "O5"),
)
def t5_keyed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-dedup twin: first event per (user, type, minute) key — the
    batch recomputation of dropDuplicates-within-watermark semantics."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", "event_type", F.window("ts", "1 minute").alias("w")
        )
        .agg(F.min("event_id").alias("first_event_id"), F.count("*").alias("n_dupes"))
        .select(
            "user_id",
            "event_type",
            F.col("w.start").alias("minute_bucket"),
            "first_event_id",
            "n_dupes",
        )
        .orderBy("user_id", "event_type", "minute_bucket")
    )
