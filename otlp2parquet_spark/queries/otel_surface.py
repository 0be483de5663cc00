"""SURVEY.md §2.2 — the reference's documented query surface
(reference docs/querying.md), expressed over the driver's synthetic tables so
every shape is DuckDB-oracle-matched.

The same shapes run against the real `otel_logs`/`otel_traces`/`otel_metrics_*`
tables in otlp2parquet_spark.queries.otel (exercised by pytest over ingested
fixture data, since the oracle harness only registers the synthetic views).

Mapping: events.event_type plays ServiceName/SeverityText, events.value plays
Duration, user_id plays the join identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from otlp2parquet_spark.queries.registry import T, query
from otlp2parquet_spark.queries.relational import DEC, davg, dsum, sql_davg, sql_dsum
from otlp2parquet_spark.session import TABLES, register_views


@query(
    "q01_recent",
    oracle="""
    SELECT event_id, ts, event_type
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 10
    """,
    tags=("Q1", "O1", "O2"),
    doc="Recent records: project/sort-desc/limit (reference docs/querying.md:11-16).",
)
def q01_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return (
        e.select("event_id", "ts", "event_type")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(10)
    )


@query(
    "q02_time_filter",
    oracle="""
    SELECT event_id, ts, event_type
    FROM events
    WHERE ts > (SELECT max(ts) - INTERVAL 6 HOUR FROM events)
    ORDER BY event_id
    """,
    tags=("Q2", "F2"),
    doc="Time-window filter with interval arithmetic (reference docs/querying.md:33-37); "
    "anchored to max(ts) instead of now() for determinism.",
)
def q02_time_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_id, ts, event_type
        FROM events
        WHERE ts > (SELECT max(ts) - INTERVAL 6 HOURS FROM events)
        ORDER BY event_id
        """
    )


@query(
    "q03_count_by_service",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, event_type
    """,
    tags=("Q3", "A1"),
    doc="Records by service: GROUP BY + COUNT + ORDER BY count DESC (reference docs/querying.md:43-48).",
)
def q03_count_by_service(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.count("*").alias("n")).orderBy(F.desc("n"), "event_type")


@query(
    "q04_errors_recent",
    oracle="""
    SELECT event_id, ts, user_id
    FROM events
    WHERE event_type IN ('error', 'signup')
      AND ts > (SELECT max(ts) - INTERVAL 7 DAY FROM events)
    ORDER BY ts DESC, event_id DESC
    LIMIT 50
    """,
    tags=("Q4", "P2"),
    doc="Recent errors: IN-list + time conjunction + sort + limit (reference docs/querying.md:52-59).",
)
def q04_errors_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_id, ts, user_id
        FROM events
        WHERE event_type IN ('error', 'signup')
          AND ts > (SELECT max(ts) - INTERVAL 7 DAYS FROM events)
        ORDER BY ts DESC, event_id DESC
        LIMIT 50
        """
    )


@query(
    "q05_slow_topk",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'error'
    ORDER BY value DESC, event_id
    LIMIT 20
    """,
    tags=("Q5", "W6"),
    doc="Error traces by duration: equality filter + top-k (reference docs/querying.md:63-69).",
)
def q05_slow_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(20)
    )


@query(
    "q06_computed_threshold",
    oracle="""
    SELECT event_id, event_type, value,
           CAST(ROUND(CAST(value / 60.0 AS DECIMAL(25,6)), 4) AS DOUBLE) AS value_minutes
    FROM events
    WHERE value > 400
    ORDER BY event_id
    """,
    tags=("Q6", "P1"),
    doc="Slow traces: threshold + arithmetic projection Duration/1e9 analog (reference docs/querying.md:73-83).",
)
def q06_computed_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return (
        e.filter(F.col("value") > 400)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round((F.col("value") / 60.0).cast(DEC), 4).cast("double").alias("value_minutes"),
        )
        .orderBy("event_id")
    )


@query(
    "q07_hourly_avg",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           """
    + sql_davg("value", "avg_value")
    + """,
           COUNT(*) AS n
    FROM events
    GROUP BY hour, event_type
    ORDER BY hour, event_type
    """,
    tags=("Q7", "A1", "F2"),
    doc="Metrics over time: date_trunc(hour) + AVG per metric (reference docs/querying.md:87-95).",
)
def q07_hourly_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(davg(F.col("value"), "avg_value"), F.count("*").alias("n"))
        .orderBy("hour", "event_type")
    )


@query(
    "q08_histogram_p95",
    oracle="""
    WITH buckets AS (
      SELECT event_type, CAST(FLOOR(value / 50) AS BIGINT) AS bucket, COUNT(*) AS cnt
      FROM events GROUP BY event_type, bucket
    ), cum AS (
      SELECT event_type, bucket, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum_cnt,
             SUM(cnt) OVER (PARTITION BY event_type) AS total
      FROM buckets
    )
    SELECT event_type,
           CAST(MIN(CASE WHEN 20 * cum_cnt >= 19 * total THEN (bucket + 1) * 50.0 END) AS DOUBLE) AS p95_upper_bound,
           CAST(MAX(total) AS BIGINT) AS total
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("Q8", "W3", "A1"),
    doc="Histogram p95 estimation from bucket counts + explicit bounds "
    "(reference docs/querying.md:99-108) — the cumulative-distribution walk is the same "
    "computation used on otel_metrics_histogram.BucketCounts/ExplicitBounds.",
)
def q08_histogram_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    buckets = e.groupBy(
        "event_type", F.floor(F.col("value") / 50).cast("bigint").alias("bucket")
    ).agg(F.count("*").alias("cnt"))
    w_cum = Window.partitionBy("event_type").orderBy("bucket")
    w_all = Window.partitionBy("event_type")
    cum = buckets.select(
        "event_type",
        "bucket",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum_cnt"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.min(
                F.when(
                    20 * F.col("cum_cnt") >= 19 * F.col("total"), (F.col("bucket") + 1) * 50.0
                )
            ).alias("p95_upper_bound"),
            F.max("total").alias("total"),
        )
        .orderBy("event_type")
    )


@query(
    "q08_exp_histogram_p95",
    oracle="""
    WITH buckets AS (
      SELECT event_type,
             CASE WHEN value IS NULL OR value <= 1.0 THEN -100000
                  ELSE CAST(CEIL(4 * log2(value)) AS BIGINT) - 1 END AS idx,
             COUNT(*) AS cnt
      FROM events GROUP BY event_type, idx
    ), cum AS (
      SELECT event_type, idx, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY idx) AS cum_cnt,
             SUM(cnt) OVER (PARTITION BY event_type) AS total
      FROM buckets
    )
    SELECT event_type,
           CAST(MAX(CASE WHEN idx = -100000 THEN cnt ELSE 0 END) AS BIGINT)
             AS zero_count,
           CAST(MAX(total) AS BIGINT) AS total,
           CAST(MIN(CASE WHEN 20 * cum_cnt >= 19 * total THEN
             CASE WHEN idx = -100000 THEN 1.0
                  ELSE ROUND(POWER(2.0, (idx + 1) / 4.0), 4) END
           END) AS DOUBLE) AS p95_upper_bound
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("Q8", "W3", "A1", "F3"),
    doc="Exponential-histogram p95 (r9): the base-2 twin of q08 — OTel "
    "exp-histogram bucketing at scale 2 (base = 2^(2^-2), bucket i covers "
    "(base^i, base^(i+1)], zero bucket holds value <= 1.0), then the same "
    "cumulative-distribution walk to the 0.95 rank; the reported bound is "
    "the OTel boundary 2^((idx+1)/4). The same computation runs per-row "
    "over otel_metrics_exponential_histogram's Scale/ZeroCount/"
    "PositiveBucketCounts columns (queries/otel.py exp_histogram_p95, "
    "value-tested against the reference golden fixture).",
)
def q08_exp_histogram_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: identical to q08 — one map-side-combined bucket agg
    (events collapse to |event_types| x |buckets| rows), tiny windows over
    the bucket frame, no corpus-sized shuffle beyond the first agg. The
    zero bucket rides as sentinel idx -100000 (NULL values fold into it)
    so the cumulative ordering puts it first in BOTH engines without
    NULLS FIRST/LAST divergence. Exactness: idx is integer ceil of
    4*log2(value) (both engines evaluate libm log2 on the identical
    double — the DSIR ln-parity precedent) and the rank test is the
    integer 20*cum >= 19*total, never a 0.95 float; the boundary is
    ROUND(·,4)-pinned like every float surface. Bucket index and rank
    walk are the SHARED streaming/pipeline.exp_idx /
    exp_p95_from_buckets pair — T16's live lane and batch twin run the
    same definitions."""
    from otlp2parquet_spark.streaming.pipeline import exp_idx, exp_p95_from_buckets

    e = T(spark, sf_dir, "events")
    buckets = e.groupBy(
        "event_type", exp_idx(F.col("value")).alias("idx")
    ).agg(F.count("*").alias("cnt"))
    return (
        exp_p95_from_buckets(buckets, keys=("event_type",))
        .select("event_type", "zero_count", "total", "p95_upper_bound")
        .orderBy("event_type")
    )


# 98% negated: the p95 crossing lands INSIDE a negative bucket at all
# 3 SFs (measured bounds -2.83/-1.41/-1.41), so the negative-bound
# formula is load-bearing in the hash, not just the cum ordering
_SGN_VALUE_SQL = "CASE WHEN event_id % 50 <> 0 THEN -value ELSE value END"


def _sgn_exp_oracle() -> str:
    from otlp2parquet_spark.streaming.pipeline import SQL_EXP_BOUND, SQL_SGN_EXP_IDX

    return f"""
    WITH signed AS (
      SELECT event_type, {_SGN_VALUE_SQL} AS sv FROM events
    ), buckets AS (
      SELECT event_type, {SQL_SGN_EXP_IDX.format(v='sv')} AS idx, COUNT(*) AS cnt
      FROM signed GROUP BY event_type, idx
    ), cum AS (
      SELECT event_type, idx, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY idx) AS cum_cnt,
             SUM(cnt) OVER (PARTITION BY event_type) AS total
      FROM buckets
    )
    SELECT event_type,
           CAST(MAX(CASE WHEN idx = -100000 THEN cnt ELSE 0 END) AS BIGINT)
             AS zero_count,
           CAST(SUM(CASE WHEN idx < -100000 THEN cnt ELSE 0 END) AS BIGINT)
             AS neg_count,
           CAST(MAX(total) AS BIGINT) AS total,
           CAST(MIN(CASE WHEN 20 * cum_cnt >= 19 * total THEN
             {SQL_EXP_BOUND.format(i='idx')}
           END) AS DOUBLE) AS p95_upper_bound
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """


@query(
    "q08_exp_histogram_p95_signed",
    oracle=_sgn_exp_oracle(),
    tags=("Q8", "W3", "A1", "F3"),
    doc="SIGNED exponential-histogram p95 (r10): the full OTel data model "
    "including NEGATIVE buckets — the r9 negative-walk fix was pinned only "
    "by a crafted frame; this puts signed data through the hash-matched "
    "oracle gate at 3 SFs. The driver's events.value is non-negative, so "
    "the sign is synthesized from event_id by the x5/PII formula pattern "
    "(both engines derive the identical input, then the operator under "
    "test — the signed bucket walk — runs for real on both sides).",
)
def q08_exp_histogram_p95_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: identical to q08 — one map-side-combined bucket agg,
    tiny windows over the bucket frame. The signed walk traverses negative
    buckets most-negative-first (their integer codes sort below the zero
    sentinel, which sorts below the positives — see sgn_exp_idx), so the
    cumulative rank test is STILL one ORDER BY idx window; the per-bucket
    upper bound flips formula per sign (SQL_EXP_BOUND twin). Exactness:
    negation is exact in IEEE, log2/pow run on identical doubles in both
    engines, the rank test is integer 20*cum >= 19*total, bounds are
    ROUND(.,4)-pinned."""
    from otlp2parquet_spark.streaming.pipeline import exp_p95_from_buckets, sgn_exp_idx

    e = T(spark, sf_dir, "events")
    sv = F.when(F.col("event_id") % 50 != 0, -F.col("value")).otherwise(F.col("value"))
    buckets = (
        e.groupBy("event_type", sgn_exp_idx(sv).alias("idx"))
        .agg(F.count("*").alias("cnt"))
        # |types| x |buckets| rows — materialize so the walk and the
        # neg_count read share ONE corpus aggregate, not two scans
        .localCheckpoint(eager=False)
    )
    walked = exp_p95_from_buckets(buckets, keys=("event_type",))
    neg = buckets.groupBy("event_type").agg(
        F.sum(F.when(F.col("idx") < -100000, F.col("cnt")).otherwise(F.lit(0))).alias(
            "neg_count"
        )
    )
    return (
        walked.join(neg, "event_type")
        .select("event_type", "zero_count", "neg_count", "total", "p95_upper_bound")
        .orderBy("event_type")
    )


@query(
    "q09_hex_bridge_join",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n, """
    + sql_dsum("l_extendedprice", "total_price")
    + """
    FROM (SELECT hex(CAST(l_orderkey AS VARCHAR)) AS lk_hex, l_extendedprice FROM lineitem) l
    JOIN (SELECT hex(CAST(o_orderkey AS VARCHAR)) AS ok_hex, o_orderstatus FROM orders) o
      ON l.lk_hex = o.ok_hex
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("Q9", "J1", "F6"),
    doc="Join across hex-encoded id representations — the logs(binary TraceId) ⋈ "
    "traces(hex TraceId) bridge of reference docs/querying.md:112-124 (SURVEY §2.2 Q9).",
)
def q09_hex_bridge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select(
        F.hex(F.col("l_orderkey").cast("string").cast("binary")).alias("lk_hex"),
        "l_extendedprice",
    )
    o = T(spark, sf_dir, "orders").select(
        F.hex(F.col("o_orderkey").cast("string").cast("binary")).alias("ok_hex"),
        "o_orderstatus",
    )
    return (
        li.join(o, li.lk_hex == o.ok_hex, "inner")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dsum(F.col("l_extendedprice"), "total_price"))
        .orderBy("o_orderstatus")
    )


@query(
    "q10_rowcount_verify",
    oracle="\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, COUNT(*) AS n FROM {t}" for t in TABLES
    )
    + "\nORDER BY table_name",
    tags=("Q10", "O3"),
    doc="Per-table row-count verification — the reference smoke harness's DuckDB "
    "check (reference tests/harness/mod.rs:207-249).",
)
def q10_rowcount_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    dfs = [
        T(spark, sf_dir, t)
        .agg(F.count("*").alias("n"))
        .select(F.lit(t).alias("table_name"), "n")
        for t in TABLES
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionAll(d)
    return out.orderBy("table_name")
