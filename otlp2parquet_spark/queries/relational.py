"""SURVEY.md §2.3 relational operator inventory (P/J/A/W/O/F groups), each as a
PySpark DataFrame builder with a DuckDB oracle twin.

Design rules (scale-first):
- Everything is declarative DataFrame API — Catalyst handles pushdown, column
  pruning, join selection, AQE re-planning. No collect()-driven logic.
- Small dimensions (region/nation/customer-at-small-sf) are broadcast
  explicitly where the join is star-shaped (J5); other joins shuffle on their
  keys, which is the correct strategy at 100 TB.
- Floating aggregates accumulate in exact DECIMAL and round to 4 — this makes
  the result independent of partial-aggregation order (critical on a cluster,
  where the summation tree differs run to run) and lets the DuckDB oracle
  hash-match exactly.
- Every output has a total ORDER BY with a unique tiebreaker.

Reference parity notes: the reference delegates all querying to external
engines (reference docs/querying.md:1-9, README.md:73); this module IS the
query surface the reference promises its users, made first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from otlp2parquet_spark.queries.registry import T, query
from otlp2parquet_spark.session import spread

# ---------------------------------------------------------------------------
# helpers: exact-decimal accumulation for floating aggregates
# ---------------------------------------------------------------------------

DEC = "decimal(25,6)"


def dsum(col, alias: str):
    """SUM(double) that is reproducible across partial-agg orders: accumulate
    in DECIMAL(25,6) (exact), round to 4, emit double."""
    return F.round(F.sum(col.cast(DEC)), 4).cast("double").alias(alias)


def quant4(col):
    """4-dp quantization of a double, cross-engine exact: FLOOR(x*1e4+0.5)
    — NOT ROUND, whose double half-way tie-breaking differs between
    engines (half-up vs half-even). Caught for real at sf0.1 in round 6:
    q07_hourly_avg / t2_sliding_window hash-matched at sf0.01 for four
    rounds, then more rows produced .xxxx5 averages and ROUND diverged.
    Twin of sql_quant4; use BOTH or NEITHER in an oracle pair."""
    return F.floor(col * 10000.0 + 0.5) / 10000.0


def sql_quant4(expr: str) -> str:
    """DuckDB side of quant4 (see there)."""
    return f"FLOOR(({expr}) * 10000.0 + 0.5) / 10000.0"


def davg(col, alias: str):
    """AVG rounded to 4 dp, cross-engine exact: the sum accumulates in
    DECIMAL (order-free), the division is one IEEE double op both engines
    perform identically, and the 4-dp quantization is quant4 (see there)."""
    avg = F.sum(col.cast(DEC)).cast("double") / F.count(col)
    return quant4(avg).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(25,6))), 4) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    avg = f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr})"
    return f"{sql_quant4(avg)} AS {alias}"


# ===========================================================================
# P group — projection / filter / predicates
# ===========================================================================


@query(
    "p1_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           -- per-row (not aggregated) rounding: integer-math 4-dp
           -- quantization is order-independent AND identical IEEE ops in
           -- both engines, so no DECIMAL detour is needed
           FLOOR(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) / 10000.0 AS revenue,
           FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000.0 + 0.5) / 10000.0 AS charge
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("P1",),
    doc="Projection with computed columns (reference docs/querying.md:73-83 arithmetic-projection pattern).",
)
def p1_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = rev * (1 + F.col("l_tax"))
    # per-row quantization via FLOOR(x*1e4+0.5)/1e4 (values positive by TPC-H
    # construction): pure codegen double ops, no per-row BigDecimal
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(rev * 10000.0 + 0.5) / 10000.0).alias("revenue"),
        (F.floor(charge * 10000.0 + 0.5) / 10000.0).alias("charge"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "p2_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus NOT IN ('X', 'Y')
      AND l_shipdate IS NOT NULL
      AND l_discount >= 0.02
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("P2",),
)
def p2_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN / IN / NOT IN / IS NOT NULL / comparison conjunctions; all push
    down to the parquet scan (verified via explain: PushedFilters)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_returnflag").isin("A", "R")
            & ~F.col("l_linestatus").isin("X", "Y")
            & F.col("l_shipdate").isNotNull()
            & (F.col("l_discount") >= 0.02)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "p3_like_regex",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%STEEL%' OR regexp_matches(p_name, '^[a-f]')
    ORDER BY p_partkey
    """,
    tags=("P3", "F1"),
)
def p3_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and regex predicates (reference query surface over p_type-style
    string columns; SURVEY §2.3 P3)."""
    p = T(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("%STEEL%") | F.col("p_name").rlike("^[a-f]"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


@query(
    "p4_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS tier,
           COUNT(*) AS n,
           """
    + sql_dsum("o_totalprice", "total")
    + """
    FROM orders
    GROUP BY tier
    ORDER BY tier
    """,
    tags=("P4", "A1"),
)
def p4_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
        .alias("tier")
    )
    return (
        o.groupBy(tier)
        .agg(F.count("*").alias("n"), dsum(F.col("o_totalprice"), "total"))
        .orderBy("tier")
    )


@query(
    "p5_cast_matrix",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(l_shipdate AS DATE) AS ship_date,
           strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_str
    FROM lineitem
    WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("P5", "F2"),
)
def p5_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST matrix int<->string<->double<->timestamp<->date (SURVEY §2.3 P5).
    double->int goes through FLOOR so Spark (truncating cast) and DuckDB
    (rounding cast) agree; timestamp->string uses explicit format."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.floor("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("ship_str"),
    ).orderBy("l_orderkey", "l_linenumber")


# ===========================================================================
# J group — joins
# ===========================================================================


@query(
    "j1_inner_equi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders, """
    + sql_dsum("o_totalprice", "segment_total")
    + """
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("J1", "A1"),
)
def j1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders⋈customer; Spark picks SMJ/SHJ (AQE may convert
    to broadcast at small sf — both correct at scale)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum(F.col("o_totalprice"), "segment_total"))
        .orderBy("c_mktsegment")
    )


@query(
    "j2_left_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    tags=("J2",),
)
def j2_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@query(
    "j2_full_outer",
    oracle="""
    WITH cn AS (SELECT DISTINCT c_nationkey FROM customer),
         sn AS (SELECT DISTINCT s_nationkey FROM supplier)
    SELECT COALESCE(cn.c_nationkey, sn.s_nationkey) AS nationkey,
           (cn.c_nationkey IS NOT NULL) AS has_customer,
           (sn.s_nationkey IS NOT NULL) AS has_supplier
    FROM cn FULL OUTER JOIN sn ON cn.c_nationkey = sn.s_nationkey
    ORDER BY nationkey
    """,
    tags=("J2",),
)
def j2_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = T(spark, sf_dir, "customer").select("c_nationkey").distinct()
    sn = T(spark, sf_dir, "supplier").select("s_nationkey").distinct()
    return (
        cn.join(sn, cn.c_nationkey == sn.s_nationkey, "outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.col("c_nationkey").isNotNull().alias("has_customer"),
            F.col("s_nationkey").isNotNull().alias("has_supplier"),
        )
        .orderBy("nationkey")
    )


@query(
    "j3_left_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    ORDER BY c_custkey
    """,
    tags=("J3",),
)
def j3_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers that placed a big order; semi avoids the
    row-multiplication a plain join + distinct would shuffle."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "j4_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
    tags=("J4",),
)
def j4_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "j5_broadcast_star",
    oracle="""
    SELECT r_name, COUNT(*) AS n_orders, """
    + sql_dsum("o_totalprice", "revenue")
    + """
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    tags=("J5", "J1", "A1"),
)
def j5_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicit broadcast of the small dims (nation: 25 rows,
    region: 5 rows at any sf) — at 100 TB the fact table never shuffles for
    these joins."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_orders"), dsum(F.col("o_totalprice"), "revenue"))
        .orderBy("r_name")
    )


@query(
    "j6_multikey_date_pred",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n, """
    + sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")
    + """
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("J6",),
)
def j6_multikey_date_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with an extra non-equi conjunct (SURVEY §2.3 J6): the equi key
    drives the shuffle; the date predicate is applied as a join residual."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
    joined = li.join(
        o, (li.l_orderkey == o.o_orderkey) & (li.l_shipdate >= o.o_orderdate), "inner"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), dsum(rev, "revenue"))
        .orderBy("o_orderpriority")
    )


@query(
    "j7_range_join",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    GROUP BY a.user_id
    ORDER BY a.user_id
    """,
    tags=("J7",),
)
def j7_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join: event pairs of the same user within 5 minutes.

    Banded formulation: both sides get a 5-minute time bucket; a qualifying
    pair (b.ts in (a.ts, a.ts+5m]) always has bucket(b) in {bucket(a),
    bucket(a)+1}, so probing those two buckets as an extra equi-key turns the
    per-user O(n²) residual filter into O(n · per-bucket density). At 100 TB
    this is the difference between a feasible SMJ and a quadratic blowup;
    each pair matches exactly one probe bucket, so no dedup is needed."""
    e = T(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bucket = F.floor(us / (300 * 1000 * 1000))
    eb = e.withColumn("bucket", bucket)
    a = eb.withColumn(
        "probe_bucket", F.explode(F.array(F.col("bucket"), F.col("bucket") + 1))
    ).alias("a")
    b = eb.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.probe_bucket") == F.col("b.bucket"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return (
        a.join(b, cond, "inner")
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id")
    )


@query(
    "j8_cross_join",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    ORDER BY r1, r2
    """,
    tags=("J8",),
)
def j8_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = T(spark, sf_dir, "region")
    a = r.alias("a")
    b = r.alias("b")
    return (
        a.crossJoin(b)
        .select(F.col("a.r_name").alias("r1"), F.col("b.r_name").alias("r2"))
        .orderBy("r1", "r2")
    )


@query(
    "j9_asof_join",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
      FROM events
      WHERE event_type IN ('click', 'purchase')
    )
    SELECT event_id, user_id, ts, last_click_id
    FROM tagged
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
    tags=("J9", "W5"),
)
def j9_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.3 J9): each purchase matched to the latest
    prior-or-simultaneous click of the same user. Window formulation — one
    shuffle on user_id, no point-in-time cross product; this is the scalable
    distributed as-of pattern (vs per-row lookup joins)."""
    e = T(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    return (
        e.withColumn("last_click_id", F.last(click_id, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_id")
        .orderBy("event_id")
    )


# ===========================================================================
# A group — aggregations
# ===========================================================================


@query(
    "a1_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           """
    + sql_dsum("l_quantity", "sum_qty")
    + """,
           """
    + sql_dsum("l_extendedprice", "sum_base_price")
    + """,
           """
    + sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")
    + """,
           """
    + sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")
    + """,
           """
    + sql_davg("l_quantity", "avg_qty")
    + """,
           """
    + sql_davg("l_extendedprice", "avg_price")
    + """,
           """
    + sql_davg("l_discount", "avg_disc")
    + """,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("A1", "P2", "F3"),
)
def a1_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship aggregate. Map-side
    partial aggregation (hash agg) + 6-group final: near-zero shuffle at any
    scale."""
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz")
    )
    # DECIMAL accumulation is ~5x a double sum per row, so the partial agg is
    # the compute-bound stage: project to the 6 needed columns, then spread()
    # — a no-op whenever the scan is already at cluster parallelism (any real
    # multi-row-group input), but vital when a single-row-group file pins the
    # whole pipeline to one core
    li = spread(
        li.select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        )
    )
    price = F.col("l_extendedprice")
    disc_price = price * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(price, "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(price, "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "a2_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS nd_part,
           COUNT(DISTINCT l_suppkey) AS nd_supp,
           COUNT(DISTINCT l_linestatus) AS nd_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("A2",),
)
def a2_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one pass — Spark expands to a single
    grouped plan (expand + two-phase agg), not N scans."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd_part"),
            F.countDistinct("l_suppkey").alias("nd_supp"),
            F.countDistinct("l_linestatus").alias("nd_status"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "a3_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
           COUNT(*) AS n, """
    + sql_dsum("l_quantity", "sum_qty")
    + """
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("A3",),
)
def a3_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
            F.count("*").alias("n"),
            dsum(F.col("l_quantity"), "sum_qty"),
        )
        .orderBy(
            "g_rf",
            "g_ls",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "a3_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("A3",),
)
def a3_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
            F.count("*").alias("n"),
        )
        .orderBy(
            "g_rf",
            "g_ls",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "a4_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, """
    + sql_dsum("o_totalprice", "total")
    + """
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    ORDER BY o_custkey
    """,
    tags=("A4",),
)
def a4_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum(F.col("o_totalprice"), "total"))
        .filter(F.col("n_orders") >= 12)
        .orderBy("o_custkey")
    )


@query(
    "a5_conditional_agg",
    oracle="""
    SELECT o_orderpriority,
           """
    + sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END", "total_f")
    + """,
           """
    + sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END", "total_o")
    + """,
           """
    + sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END", "total_p")
    + """,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("A5",),
)
def a5_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (SUM(CASE WHEN ...)) — the
    shuffle-free way to pivot a low-cardinality dimension."""
    o = T(spark, sf_dir, "orders")

    def cond_total(status: str, alias: str):
        return dsum(
            F.when(F.col("o_orderstatus") == status, F.col("o_totalprice")).otherwise(F.lit(0.0)),
            alias,
        )

    return (
        o.groupBy("o_orderpriority")
        .agg(
            cond_total("F", "total_f"),
            cond_total("O", "total_o"),
            cond_total("P", "total_p"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "a6_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_discount), 4) AS sd_disc,
           ROUND(var_samp(l_tax), 4) AS var_tax,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           ROUND(quantile_cont(l_quantity, 0.95), 4) AS p95_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("A6",),
)
def a6_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact interpolated percentile (A6).
    Small-magnitude columns keep float round-off far below the ROUND(,4)
    canonicalization. approx_percentile / approx_count_distinct exist as
    tolerance-checked variants in tests, never oracle-hash-matched."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_discount"), 4).alias("sd_disc"),
            F.round(F.var_samp("l_tax"), 4).alias("var_tax"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_quantity, 0.95)"), 4).alias("p95_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "a7_ordered_array_agg",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS lines_csv,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_orderkey < 2000
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
    tags=("A7", "F4"),
)
def a7_ordered_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array agg: collect_list has no deterministic order in a
    distributed engine, so sort post-hoc (array_sort) — the scale-safe
    formulation of array_agg(x ORDER BY k)."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("l_linenumber")), lambda x: x.cast("string")),
                ",",
            ).alias("lines_csv"),
            F.count("*").alias("n"),
        )
        .orderBy("l_orderkey")
    )


@query(
    "a8_sketch_distinct",
    oracle=None,  # HLL++ estimates are engine-specific; error + determinism gated in tests
    tags=("A8", "A2"),
)
def a8_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct counting: approx_count_distinct (HLL++,
    rsd 0.02) next to the exact count, with the relative error surfaced —
    the cardinality-estimation surface every OLAP engine ships for the
    regime where exact COUNT(DISTINCT) no longer fits (at 100 TB the
    exact form is a full shuffle of the distinct keys; the sketch is a
    fixed ~KB-per-group merge, map-side combinable and mergeable across
    partitions/epochs in any order).

    Rows-only in the driver harness (the estimate is engine-specific);
    the error gate (<= 3 * rsd) and two-run determinism (HLL++ register
    merge is commutative) are pinned in test_approx_quality. The
    HASH-MATCHED form of this op exists too: t19_windowed_hll_distinct
    (streaming/batch_twins.py) hand-rolls md5-derived registers with an
    integer-exact estimator, which DuckDB replays bit-for-bit — this row
    keeps the built-in HLL++ surface (what a Spark user actually calls)."""
    li = T(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_exact"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("n_approx"),
    )
    return out.select(
        "l_returnflag",
        "n_exact",
        "n_approx",
        F.round(
            F.abs(F.col("n_approx") - F.col("n_exact")).cast("double")
            / F.col("n_exact"),
            4,
        ).alias("rel_err"),
    ).orderBy("l_returnflag")


@query(
    "a9_quantiles",
    oracle="""
    SELECT l_returnflag,
           FLOOR(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) * 10000.0 + 0.5) / 10000.0 AS p25,
           FLOOR(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.50) * 10000.0 + 0.5) / 10000.0 AS p50,
           FLOOR(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) * 10000.0 + 0.5) / 10000.0 AS p75,
           FLOOR(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) * 10000.0 + 0.5) / 10000.0 AS p95
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("A9", "A2"),
)
def a9_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (continuous/linear interpolation): Spark's
    `percentile` against DuckDB's quantile_cont — both engines sort within
    the group and interpolate identically, so this is hash-matchable unlike
    the sketch twin below. The exact form is the small-group tool; it
    shuffles every value to its group, which is exactly why a9_quantile_
    sketch exists for the 100-TB regime."""
    li = T(spark, sf_dir, "lineitem")
    q = F.percentile(F.col("l_extendedprice").cast("double"), F.lit([0.25, 0.5, 0.75, 0.95]))
    out = li.groupBy("l_returnflag").agg(q.alias("q"))
    return out.select(
        "l_returnflag",
        *[
            quant4(F.element_at("q", i + 1)).alias(name)
            for i, name in enumerate(("p25", "p50", "p75", "p95"))
        ],
    ).orderBy("l_returnflag")


@query(
    "a9_quantile_sketch",
    oracle=None,  # GK-sketch estimates are engine-specific; rank-error gated in tests
    tags=("A9", "A2"),
)
def a9_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles: approx_percentile (Greenwald-Khanna summary,
    accuracy 10000 => rank error <= 1/10000) beside the exact percentile,
    relative error surfaced. The sketch is the 100-TB form: fixed-size
    per-partition summaries, map-side combinable, merged in any order —
    no value-level shuffle. Rows-only in the driver harness; the rank-error
    gate and two-run determinism are pinned in test_approx_quality."""
    li = T(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    out = li.groupBy("l_returnflag").agg(
        F.percentile(price, F.lit([0.5, 0.95])).alias("exact"),
        F.percentile_approx(price, F.lit([0.5, 0.95]), F.lit(10000)).alias("approx"),
    )
    rel = lambda i: F.round(  # noqa: E731
        F.abs(F.element_at("approx", i) - F.element_at("exact", i))
        / F.element_at("exact", i),
        4,
    )
    return out.select(
        "l_returnflag",
        F.element_at("exact", 1).alias("p50_exact"),
        F.element_at("approx", 1).alias("p50_approx"),
        rel(1).alias("p50_rel_err"),
        F.element_at("exact", 2).alias("p95_exact"),
        F.element_at("approx", 2).alias("p95_approx"),
        rel(2).alias("p95_rel_err"),
    ).orderBy("l_returnflag")


@query(
    "a10_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           """
    + sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")
    + """,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-30'
      AND l_shipdate > TIMESTAMP '1998-06-30'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("J1", "A1", "O2", "P2"),
)
def a10_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority), adapted to the synthetic schema
    (o_orderpriority stands in for the missing o_shippriority): unshipped
    high-revenue orders for one market segment. The reference delegates
    exactly this class of multi-join top-k to external engines
    (reference docs/querying.md:1-9).

    Scale shape: all three filters reach their scans as PushedFilters
    (segment on customer, date on orders, date on lineitem) so every join
    input is pre-shrunk; the join keys are the natural shuffle keys
    (custkey, then orderkey) and the revenue aggregate rides the
    lineitem-orders shuffle already partitioned by orderkey. No static
    broadcast: customer-filtered is 1/5 of a table that is 15M rows at
    TPC-H SF100 — AQE re-plans it to broadcast at runtime when it is
    actually small, which is the right call in both regimes. The top-10
    is TakeOrderedAndProject (per-partition heap + driver merge of 10-row
    heads), never a global sort."""
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    ords = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-30").cast("timestamp_ntz")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-30").cast("timestamp_ntz")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.select("c_custkey")
        .join(ords.select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"),
              cust.c_custkey == ords.o_custkey)
        .join(li.select("l_orderkey", "l_extendedprice", "l_discount"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "a11_tpch_q5",
    oracle="""
    SELECT n_name,
           """
    + sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")
    + """
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("J1", "J5", "A1", "P2"),
)
def a11_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue by nation where customer
    and supplier share a nation inside one region — the 6-table join the
    benchmark uses to stress join ordering.

    Scale shape: region and nation are constant-size dimensions (5 / 25
    rows at every SF) — statically broadcast, and the region filter
    applied BEFORE the broadcast so the nation build side carries only
    ASIA nations, turning the region predicate into a semi-filter on
    supplier's shuffle input. The fact-fact joins (orders-customer on
    custkey, lineitem-orders on orderkey, lineitem-supplier on suppkey)
    shuffle on their keys; the locality predicate c_nationkey =
    s_nationkey is attached to the supplier join as a non-key conjunct so
    it filters during the probe instead of materializing mismatched
    pairs. Final aggregate is |nations|-bounded — map-side combine
    collapses it before the last exchange."""
    asia_nations = (
        T(spark, sf_dir, "nation")
        .join(
            T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    ords = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(ords.select("o_custkey", "o_orderkey"),
                  F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "a12_tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             """
    + sql_dsum("l_quantity", "sum_qty")
    + """
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 250
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("A4", "J1", "A1", "O2"),
)
def a12_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total line quantity
    exceeds a threshold, with their customer. The spec text re-scans
    lineitem for the outer sum; since the HAVING subquery already computes
    exactly that sum per qualifying order, this plan aggregates lineitem
    ONCE and carries sum_qty through the joins — half the spec's lineitem
    traffic, identical result (the oracle CTE states the same reuse).

    Scale shape: the quantity aggregate partial-aggregates map-side onto
    the orderkey shuffle; the HAVING filter cuts the frame to the rare
    heavy orders BEFORE any join, so the orders/customer joins probe with
    a tiny build side that AQE demotes to broadcast at runtime. Top-100 is
    TakeOrderedAndProject."""
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            F.sum(F.col("l_quantity").cast(DEC)).alias("_exact_qty"),
        )
        .filter(F.col("_exact_qty") > 250)
        .drop("_exact_qty")
    )
    ords = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(ords, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "a13_tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           """
    + sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")
    + """
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey < 4 AND n2.n_nationkey < 4
      AND n1.n_nationkey <> n2.n_nationkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("J1", "J5", "A1", "F2"),
)
def a13_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping), adapted: bilateral trade volume by
    (supplier nation, customer nation, ship year) inside a 4-nation bloc
    — the spec's single nation pair is empty at the smallest fixture, so
    the bloc keeps the query sf-agnostic while preserving the shape (two
    independent nation dimensions on one fact row).

    Scale shape: the SAME tiny nation table broadcasts twice under two
    aliases (supplier side, customer side) — each a map-only semi-filter;
    the nationkey predicates prune both probe streams before the fact-fact
    shuffles on suppkey/orderkey/custkey. The aggregate collapses to
    (4 x 3 x 2 years) groups map-side."""
    n1 = T(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 4).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 4).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ords = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        supp.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(li, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), (F.col("c_nationkey") == F.col("n2_key"))
              & (F.col("n2_key") != F.col("n1_key")))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(rev, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "a14_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           """
    + sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")
    + """,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("J1", "J5", "A1", "O2"),
)
def a14_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): the top-20 customers by revenue
    lost to returns in one half-year — the canonical churn-analysis join.

    Scale shape: the returnflag filter prunes lineitem AT THE SCAN
    (PushedFilters carries the string equality), the date filter prunes
    orders likewise; nation broadcasts; the custkey aggregate partial-
    aggregates map-side onto the customer join's shuffle; top-20 is
    TakeOrderedAndProject."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    ords = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nat = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(ords, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "a15_tpch_q6",
    oracle="""
    SELECT """
    + sql_dsum("l_extendedprice * l_discount", "revenue")
    + """
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("A1", "P2"),
)
def a15_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): THE filter-pushdown benchmark —
    a single global aggregate behind three conjunctive scan predicates.

    Scale shape: all three predicates reach the parquet scan as
    PushedFilters (date range, discount range, quantity bound), so the
    scan emits only qualifying rows of the two needed columns; the global
    sum partial-aggregates to ONE row per task. At 100 TB this query is
    pure scan bandwidth — exactly what the plan shows. (Discount bounds
    compare the same parquet doubles against the same literals in both
    engines — no arithmetic, no divergence.)"""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return spread(li.select("l_extendedprice", "l_discount")).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue")
    )


@query(
    "a16_tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("J2", "A1", "O1"),
)
def a16_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution), minus the spec's o_comment
    filter (the synthetic orders table carries no comment column): how
    many customers placed k orders, INCLUDING the zero-order customers the
    left outer join preserves — the histogram an inner join silently
    truncates.

    Scale shape: one custkey shuffle for the outer join + count (COUNT of
    a nullable key counts only matches — the standard outer-join-count
    idiom), then the distribution aggregate collapses to |distinct k|
    rows, map-side combined. No broadcast: both sides are corpus-scale at
    100 TB."""
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    ords = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(ords, cust.c_custkey == ords.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "a17_tpch_q14",
    oracle="""
    SELECT """
    + sql_quant4(
        "100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' "
        "THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) "
        "ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE) "
        "/ CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)"
    )
    + """ AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-12-01'
    """,
    tags=("J1", "A5", "P4"),
)
def a17_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): the share of a quarter's revenue from
    PROMO-type parts — a conditional aggregate over a fact-dim join (the
    synthetic p_type is a 6-value enum, so the spec's LIKE 'PROMO%%'
    becomes equality).

    Scale shape: the date filter pushes to the lineitem scan; part is a
    true dimension (200 rows per 6k lineitems at every SF) broadcast
    explicitly; both sums accumulate in DECIMAL so the one double
    division is order-free and cross-engine identical."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-12-01").cast("timestamp_ntz"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    ratio = (
        F.lit(100.0)
        * F.sum(promo).cast("double")
        / F.sum(rev).cast("double")
    )
    return joined.agg(quant4(ratio).alias("promo_revenue"))


@query(
    "a18_tpch_q17",
    oracle="""
    WITH pl AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#13'
    ), stats AS (
      SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS tot,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pl GROUP BY l_partkey
    )
    SELECT """
    + sql_quant4(
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0"
    )
    + """ AS avg_yearly
    FROM pl JOIN stats USING (l_partkey)
    WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < tot
    """,
    tags=("J1", "A4", "A1"),
)
def a18_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue) for one brand, minus the
    absent container predicate: revenue lost if orders below 20%% of a
    part's average order quantity were not taken.

    The correlated threshold l_quantity < 0.2 * AVG(l_quantity) is
    rewritten INTEGER-EXACT: quantities are integral, so the comparison
    becomes 5 * l_quantity * count < total — no engine-specific AVG
    accumulation can flip a boundary row (the double-average form is a
    real cross-engine hazard: a half-ulp difference in the mean moves the
    cut). Scale shape: the brand filter prunes part to a handful of keys,
    broadcast into the lineitem scan; the per-part stats ride ONE
    partkey-partitioned window over the already-joined frame — no second
    lineitem scan, no self-join re-execution."""
    part = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pl = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    pl = pl.withColumn("tot", F.sum(F.col("l_quantity").cast("long")).over(w))
    pl = pl.withColumn("cnt", F.count(F.lit(1)).over(w))
    small = pl.filter(
        5 * F.col("l_quantity").cast("long") * F.col("cnt") < F.col("tot")
    )
    avg_yearly = F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0
    return small.agg(quant4(avg_yearly).alias("avg_yearly"))


@query(
    "a19_tpch_q22",
    oracle="""
    WITH thresh AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
               AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           """
    + sql_dsum("c_acctbal", "totacctbal")
    + """
    FROM customer c, thresh
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("J4", "A1", "A4"),
)
def a19_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted to the synthetic
    schema: rich-but-lapsed customers — above-average account balance and
    NO order since 2000 — grouped by nation (the spec's phone-prefix
    country code is absent; every synthetic customer has old orders, so
    the anti-join is against RECENT orders, preserving the spec's
    "positive balance, no sales contact" shape).

    Scale shape: the balance threshold is ONE decimal-exact global
    aggregate broadcast back as a 1-row frame (the cross-join-literal
    idiom), so the comparison is identical IEEE math in both engines; the
    lapsed test is a LEFT ANTI join shuffled on custkey against
    date-pruned orders; the final aggregate collapses to |nations|."""
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    thresh = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    recent = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "a20_tpch_q15",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
               AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(ROUND(r, 4) AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE r = (SELECT MAX(r) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("A1", "A4", "J1", "P2"),
)
def a20_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximal revenue in a
    quarter — the spec's revenue VIEW consumed by a scalar
    aggregate-of-aggregate subquery. The equality test runs on the EXACT
    DECIMAL sums (order-free in both engines), never on rounded doubles,
    so a tie is decided identically everywhere; only the emitted revenue
    is 4-dp quantized.

    Scale shape: the date filter pushes to the scan; the revenue view is
    one map-side-combined suppkey aggregate; MAX(r) is a 1-row aggregate
    of that |suppliers|-sized frame broadcast back (the Q22 threshold
    idiom), and the supplier name join probes with only the winners."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
            ).alias("r")
        )
        .localCheckpoint(eager=False)  # consumed by the max AND the winners
    )
    top = rev.agg(F.max("r").alias("rmax"))
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("r") == F.col("rmax"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("r"), 4).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "a21_tpch_q8",
    oracle="""
    WITH flat AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    )
    SELECT o_year,
           """
    + sql_quant4(
        "CAST(SUM(CASE WHEN nation = 'NATION_8' THEN volume "
        "ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE) "
        "/ CAST(SUM(volume) AS DOUBLE)"
    )
    + """ AS mkt_share
    FROM flat
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("J1", "J5", "A5", "F2"),
)
def a21_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_8's share of AMERICA's
    ECONOMY-part order volume per year — the 8-table join the spec uses to
    stress multi-dimension star joins (the 13th classic; Q8 needs no
    partsupp, so the synthetic schema CAN express it — it was the one
    remaining expressible spec query after r9's twelve).

    Scale shape: every dimension (part/supplier/customer are dims relative
    to lineitem here; nation x2 + region are tiny) broadcasts explicitly
    except customer, which at 100 TB is corpus-scale — the c_custkey join
    stays a shuffle on the already date-pruned order stream. The
    o_orderdate range predicate pushes to the orders scan and prunes
    BEFORE the fact-fact shuffle; both share sums accumulate in DECIMAL so
    the one double division per year is order-free and cross-engine
    identical (the Q14 discipline, per-group)."""
    part = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ords = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA").select(
        "r_regionkey"
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    num = F.when(F.col("nation") == "NATION_8", vol).otherwise(F.lit(0).cast(DEC))
    share = F.sum(num).cast("double") / F.sum(vol).cast("double")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(
                n1.join(region, F.col("n1_region") == F.col("r_regionkey"))
            ),
            F.col("c_nationkey") == F.col("n1_key"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(quant4(share).alias("mkt_share"))
        .orderBy("o_year")
    )


# ===========================================================================
# W group — window functions
# ===========================================================================


@query(
    "w1_ranks",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER w AS rnk,
           DENSE_RANK()  OVER w AS drnk,
           NTILE(4)      OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("W1",),
)
def w1_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "w2_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) // 1000000 AS gap_prev_sec,
           (epoch_us(LEAD(ts) OVER w) - epoch_us(ts)) // 1000000 AS gap_next_sec
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    tags=("W2", "F2"),
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead event deltas per user — one shuffle on user_id. Gaps are
    computed on epoch microseconds with floor-division to whole seconds, a
    formulation both engines evaluate identically (DuckDB's date_diff counts
    boundary crossings instead)."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return e.select(
        "user_id",
        "event_id",
        F.floor((us - F.lag(us).over(w)) / 1000000).alias("gap_prev_sec"),
        F.floor((F.lead(us).over(w) - us) / 1000000).alias("gap_next_sec"),
    ).orderBy("user_id", "event_id")


@query(
    "w3_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_total,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("W3",),
)
def w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 4)
        .cast("double")
        .alias("running_total"),
        F.count("*").over(w).alias("running_n"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "w4_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(25,6)))
             OVER (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
                   RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS sum_10min
    FROM events
    ORDER BY user_id, event_id
    """,
    tags=("W4",),
)
def w4_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based sliding frame over epoch seconds (RANGE BETWEEN 600
    PRECEDING AND CURRENT ROW) — SURVEY §2.3 W4; epoch-seconds ordering keeps
    the frame engine-portable."""
    e = T(spark, sf_dir, "events").withColumn(
        "epoch_s", F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000000)
    )
    w = Window.partitionBy("user_id").orderBy("epoch_s").rangeBetween(-600, 0)
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum(F.col("value").cast(DEC)).over(w), 4).cast("double").alias("sum_10min"),
    ).orderBy("user_id", "event_id")


@query(
    "w5_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey)  OVER w AS last_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("W5",),
)
def w5_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "w6_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_orderpriority, rn
    """,
    tags=("W6",),
)
def w6_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — Spark rewrites rank<=k filters into a
    per-partition top-k (WindowGroupLimit), avoiding a full sort at scale."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_orderpriority", "rn")
    )


# ===========================================================================
# O group — sorts / limits / set ops
# ===========================================================================


@query(
    "o1_multisort_nulls",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio_or_null, o_totalprice
    FROM orders
    WHERE o_orderkey < 3000
    ORDER BY prio_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey
    """,
    tags=("O1", "F7"),
)
def o1_multisort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio_or_null"),
        "o_totalprice",
    ).orderBy(
        F.col("prio_or_null").asc_nulls_first(), F.col("o_totalprice").desc(), F.col("o_orderkey")
    )


@query(
    "o2_limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100 OFFSET 50
    """,
    tags=("O2",),
)
def o2_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice").orderBy("o_orderkey").offset(50).limit(100)


@query(
    "o3_union",
    oracle="""
    SELECT flag AS v, COUNT(*) AS n FROM (
      SELECT l_returnflag AS flag FROM lineitem
      UNION ALL
      SELECT l_linestatus AS flag FROM lineitem
    ) GROUP BY flag
    ORDER BY v
    """,
    tags=("O3",),
)
def o3_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    u = li.select(F.col("l_returnflag").alias("v")).unionAll(
        li.select(F.col("l_linestatus").alias("v"))
    )
    return u.groupBy("v").agg(F.count("*").alias("n")).orderBy("v")


@query(
    "o3_union_distinct",
    oracle="""
    SELECT l_returnflag AS v FROM lineitem
    UNION
    SELECT l_linestatus AS v FROM lineitem
    ORDER BY v
    """,
    tags=("O3", "O5"),
)
def o3_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return (
        li.select(F.col("l_returnflag").alias("v"))
        .union(li.select(F.col("l_linestatus").alias("v")))
        .distinct()
        .orderBy("v")
    )


@query(
    "o4_intersect_except",
    oracle="""
    WITH with_orders AS (SELECT DISTINCT o_custkey AS k FROM orders),
         rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
    SELECT 'intersect' AS op, k FROM (SELECT k FROM with_orders INTERSECT SELECT k FROM rich)
    UNION ALL
    SELECT 'except' AS op, k FROM (SELECT k FROM rich EXCEPT SELECT k FROM with_orders)
    ORDER BY op, k
    """,
    tags=("O4",),
)
def o4_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")).distinct()
    rich = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    inter = o.intersect(rich).select(F.lit("intersect").alias("op"), "k")
    exc = rich.subtract(o).select(F.lit("except").alias("op"), "k")
    return inter.unionAll(exc).orderBy("op", "k")


@query(
    "o5_dedup_subset",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn = 1
    ORDER BY o_custkey
    """,
    tags=("O5", "W6"),
)
def o5_dedup_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dropDuplicates(subset): keep the earliest order per
    customer. Plain dropDuplicates keeps an arbitrary row in a distributed
    engine, so the declared form pins the survivor with row_number."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_orderdate").alias("first_orderdate"),
        )
        .orderBy("o_custkey")
    )


@query(
    "o5_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("O5",),
)
def o5_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy("l_returnflag", "l_linestatus")


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_ORACLE_COLS = ",\n           ".join(
    # CAST: DuckDB SUM(int) returns HUGEINT -> Arrow decimal128(38,0), which
    # hash-mismatches Spark's bigint even when values are identical (the
    # x4_repetition trap; see tests/test_oracle_registry_lint.py).
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t},\n           "
    f"COALESCE(SUM(CASE WHEN event_type = '{t}' "
    f"THEN CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) END), 0) / 10000.0 AS v_{t}"
    for t in _PIVOT_TYPES
)


@query(
    "o6_pivot",
    oracle=f"""
    SELECT user_id,
           {_PIVOT_ORACLE_COLS}
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("O6", "A5", "P1"),
)
def o6_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot of the event stream: one row per user, one (count, sum)
    column pair per event type — the classic OLAP reshape
    (`groupBy().pivot()` with an EXPLICIT value list; an implicit list
    would add a whole extra distinct-scan job and make the output schema
    data-dependent, which breaks at 100 TB where the type domain must be
    a contract, not a discovery).

    Spark executes this as ONE hash aggregate whose buffer holds all 2·K
    pivot cells (same two-phase shuffle as any groupBy — pivoting adds
    zero extra passes). Sums ride the 1e-4 integer grid (BIGINT, order-free
    and exact — the x3_kmeans trick) so accumulation order cannot move the
    4-dp output; double->DECIMAL casts are avoided per the dedup.py
    determinism rule."""
    e = T(spark, sf_dir, "events")
    qv = F.floor(F.col("value") * 10000.0 + 0.5).cast("long")
    piv = (
        e.groupBy("user_id")
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(qv).alias("v"))
    )
    cols = [F.col("user_id")]
    for t in _PIVOT_TYPES:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"n_{t}"))
        cols.append(
            (F.coalesce(F.col(f"{t}_v"), F.lit(0)) / 10000.0).alias(f"v_{t}")
        )
    return piv.select(*cols).orderBy("user_id")


# ===========================================================================
# F group — scalar function families
# ===========================================================================


@query(
    "f1_string_funcs",
    oracle="""
    SELECT p_partkey,
           concat(p_brand, ':', p_type) AS brand_type,
           substr(p_name, 1, 8) AS name8,
           upper(p_brand) AS brand_up,
           lower(p_type) AS type_lo,
           length(p_name) AS name_len,
           trim(lpad(p_brand, 12, ' ')) AS brand_trim,
           replace(p_type, ' ', '_') AS type_us,
           string_split(p_type, ' ')[1] AS type_first,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devowel,
           starts_with(p_type, 'STANDARD') AS is_std,
           (p_type LIKE '%STEEL') AS ends_steel
    FROM part
    ORDER BY p_partkey
    """,
    tags=("F1",),
)
def f1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.length("p_name").alias("name_len"),
        F.trim(F.lpad("p_brand", 12, " ")).alias("brand_trim"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.split("p_type", " ").getItem(0).alias("type_first"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devowel"),
        F.startswith(F.col("p_type"), F.lit("STANDARD")).alias("is_std"),
        F.endswith(F.col("p_type"), F.lit("STEEL")).alias("ends_steel"),
    ).orderBy("p_partkey")


@query(
    "f2_datetime_funcs",
    oracle="""
    SELECT event_id,
           date_trunc('hour', ts)   AS ts_hour,
           date_trunc('minute', ts) AS ts_minute,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_day,
           year(ts) AS y, month(ts) AS mo, day(ts) AS d, hour(ts) AS h,
           epoch_us(ts) AS ts_us,
           make_timestamp(epoch_us(ts)) AS ts_roundtrip,
           CAST(ts AS DATE) + 30 AS plus30d,
           date_diff('day', TIMESTAMP '2024-01-01', ts) AS days_since,
           ts + INTERVAL 90 MINUTE AS plus90m
    FROM events
    WHERE event_id < 1000
    ORDER BY event_id
    """,
    tags=("F2",),
)
def f2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (F2) — the same functions the OTLP pipeline needs for
    ns->µs conversion (D14) and hour partitioning (D21)."""
    e = T(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return e.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.date_trunc("minute", "ts").alias("ts_minute"),
        F.date_trunc("day", "ts").alias("ts_day"),
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.timestamp_micros(F.unix_micros(F.col("ts").cast("timestamp")))
        .cast("timestamp_ntz")
        .alias("ts_roundtrip"),
        F.date_add(F.col("ts").cast("date"), 30).alias("plus30d"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("days_since"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("plus90m"),
    ).orderBy("event_id")


@query(
    "f3_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           CAST(FLOOR(l_quantity / 7) AS BIGINT)  AS qty_div7,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           ABS(l_discount - 0.05)    AS disc_dev,
           l_orderkey % 7            AS key_mod7,
           ROUND(power(l_quantity, 2), 4) AS qty_sq,
           ROUND(ln(l_extendedprice), 4)  AS price_ln,
           ROUND(sqrt(l_quantity), 4)     AS qty_sqrt,
           CAST(SIGN(l_discount - 0.05) AS INTEGER) AS disc_sign
    FROM lineitem
    WHERE l_orderkey < 2000
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("F3",),
)
def f3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "f4_array_funcs",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
    SELECT doc_id,
           len(tokens) AS n_tokens,
           tokens[1] AS first_tok,
           list_contains(tokens, 'the') AS has_the,
           len(list_distinct(tokens)) AS n_distinct,
           list_sort(tokens)[1] AS min_tok,
           array_to_string(tokens[1:5], ' ') AS head5,
           len(list_filter(tokens, x -> length(x) > 4)) AS n_long,
           CAST(list_aggregate(list_transform(tokens, x -> length(x)), 'sum') AS BIGINT) AS total_chars
    FROM tok
    ORDER BY doc_id
    """,
    tags=("F4", "X4"),
)
def f4_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order function family (F4) — size, indexing, contains,
    distinct, sort, slice, filter, transform, aggregate. These are the
    primitives Q8's histogram-bucket math builds on."""
    d = T(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        toks.getItem(0).alias("first_tok"),
        F.array_contains(toks, "the").alias("has_the"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_sort(toks).getItem(0).alias("min_tok"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("head5"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    ).orderBy("doc_id")


@query(
    "f5_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           json_extract_string(props, '$.k') AS k_str
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    tags=("F5",),
)
def f5_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (F5) — the same primitive used to query the OTLP
    pipeline's JSON-encoded attribute maps (D12)."""
    e = T(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
    ).orderBy("event_id")


@query(
    "f6_hash_encode",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           hex(CAST(doc_id AS VARCHAR)) AS id_hex,
           to_base64(encode(substr(text, 1, 24))) AS head_b64,
           octet_length(from_base64(to_base64(encode(substr(text, 1, 24))))) AS b64_roundtrip_len
    FROM documents
    ORDER BY doc_id
    """,
    tags=("F6", "X1"),
)
def f6_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/encoding family (F6): md5 / sha2-256 / hex / base64 — the
    primitives behind content-hash dedup (X1) and the binary<->hex TraceId
    bridge (SURVEY §2.2 Q9)."""
    d = T(spark, sf_dir, "documents")
    head = F.substring("text", 1, 24)
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
        F.hex(F.col("doc_id").cast("string").cast("binary")).alias("id_hex"),
        F.base64(head.cast("binary")).alias("head_b64"),
        F.length(F.unbase64(F.base64(head.cast("binary")))).alias("b64_roundtrip_len"),
    ).orderBy("doc_id")


@query(
    "f7_null_handling",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'was-urgent') AS prio_coalesced,
           (NULLIF(o_orderstatus, 'O') IS NULL) AS is_open,
           CASE WHEN isnan(CASE WHEN o_totalprice > 400000 THEN 'NaN'::DOUBLE ELSE o_totalprice END)
                THEN -1.0
                ELSE o_totalprice END AS price_nan_guarded
    FROM orders
    WHERE o_orderkey < 3000
    ORDER BY o_orderkey
    """,
    tags=("F7",),
)
def f7_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL/NaN handling (F7): coalesce/nullif/nanvl — mirrors the reference's
    empty-service fallback (D22) and NaN-drop policy (§1.3.12)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    nan_price = F.when(F.col("o_totalprice") > 400000, F.lit(float("nan"))).otherwise(
        F.col("o_totalprice")
    )
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("was-urgent")).alias(
            "prio_coalesced"
        ),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull().alias("is_open"),
        F.nanvl(nan_price, F.lit(-1.0)).alias("price_nan_guarded"),
    ).orderBy("o_orderkey")


@query(
    "w7_distribution_ranks",
    oracle="""
    SELECT s_nationkey, s_suppkey,
           FLOOR(percent_rank() OVER w * 10000.0 + 0.5) / 10000.0 AS pct_rank,
           FLOOR(cume_dist() OVER w * 10000.0 + 0.5) / 10000.0 AS cume,
           ntile(4) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
             AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal)
    ORDER BY s_nationkey, s_suppkey
    """,
    tags=("W7", "W1"),
)
def w7_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist (rank-based,
    so tie-safe under any shuffle order) and ntile with a fully-determined
    ordering (s_suppkey tiebreak — ntile assigns by ROW order, so an
    under-specified ORDER BY would be nondeterministic across engines)."""
    s = T(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal")
    wt = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    q4 = lambda c: F.floor(c * 10000.0 + 0.5) / 10000.0  # noqa: E731
    return (
        s.select(
            "s_nationkey",
            "s_suppkey",
            q4(F.percent_rank().over(w)).alias("pct_rank"),
            q4(F.cume_dist().over(w)).alias("cume"),
            F.ntile(4).over(wt).alias("quartile"),
        )
        .orderBy("s_nationkey", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# W8 — first-touch funnel sequencing (MATCH_RECOGNIZE-style path detection)


@query(
    "w8_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS view_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS click_ts
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.view_ts
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.click_ts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           (p.purchase_ts IS NOT NULL) AS converted,
           epoch_us(p.purchase_ts) - epoch_us(v.view_ts) AS conv_us
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    ORDER BY v.user_id
    """,
    tags=("W8", "J2", "A1"),
)
def w8_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel: per user, the earliest 'view', the earliest
    'click' strictly after it, and the earliest 'purchase' strictly after
    that — the MATCH_RECOGNIZE / CEP-style ordered-sequence detection that
    product analytics engines ship as a dedicated operator, expressed as
    staged conditional MINs (deterministic: MIN over event-time, no
    row_number over possibly-tied orderings).

    Scale shape: three event_type-pruned scans (each predicate pushes to
    the parquet scan, so each pass reads only its slice — at 100 TB this
    beats one wide scan forked three ways, which would materialize the
    whole event stream once per branch anyway after the column pruner);
    every shuffle — the three stage MINs and the stage joins — is keyed on
    user_id, so AQE coalesces them onto one co-partitioned layout and the
    per-user state never exceeds three timestamps. No collect, no window
    over an unpartitioned frame."""
    ev = T(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            F.col("purchase_ts").isNotNull().alias("converted"),
            (
                F.unix_micros(F.col("purchase_ts").cast("timestamp"))
                - F.unix_micros(F.col("view_ts").cast("timestamp"))
            ).alias("conv_us"),
        )
        .orderBy("user_id")
    )


@query(
    "w9_cohort_retention",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM events
    ), first_ev AS (
      SELECT user_id, MIN(active_week) AS cohort_week FROM active GROUP BY user_id
    ), joined AS (
      SELECT f.cohort_week,
             date_diff('day', f.cohort_week, a.active_week) // 7 AS week_offset,
             a.user_id
      FROM active a JOIN first_ev f ON a.user_id = f.user_id
    ), cohort_sizes AS (
      SELECT cohort_week, COUNT(*) AS n_cohort FROM first_ev GROUP BY cohort_week
    )
    SELECT j.cohort_week, j.week_offset,
           COUNT(DISTINCT j.user_id) AS n_active, cs.n_cohort,
           FLOOR((CAST(COUNT(DISTINCT j.user_id) AS DOUBLE) / cs.n_cohort)
                 * 10000.0 + 0.5) / 10000.0 AS retention
    FROM joined j JOIN cohort_sizes cs ON j.cohort_week = cs.cohort_week
    GROUP BY j.cohort_week, j.week_offset, cs.n_cohort
    ORDER BY j.cohort_week, j.week_offset
    """,
    tags=("W9", "A2", "J1"),
)
def w9_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users are cohorted by the ISO week of
    their first event; each cell (cohort_week, week_offset) counts how many
    of that cohort were active offset weeks later — the standard
    product-analytics retention triangle (the reference's users run this
    downstream of its parquet output; reference docs/querying.md delegates
    it, this makes it first-class).

    Scale shape: ONE corpus scan (2 columns, week truncation map-side) and
    ONE corpus-sized shuffle — the (user_id, active_week) distinct, then
    localCheckpointed because three plan branches consume it (Spark does
    no CSE across join inputs; without the checkpoint the corpus pass
    would re-execute per branch). The cohort week is MIN(active_week) per
    user (week truncation is monotone, so this equals week(MIN ts) without
    a second scan over raw events); everything downstream runs on the
    checkpointed week-level table, bounded by users x weeks. The final aggregation's key space is weeks^2
    (calendar-bounded, ~2.8k cells per decade of data), so the last shuffle
    and the output are constant-sized regardless of corpus. retention is
    one IEEE double division of two exact integers, quant4-quantized, so
    the oracle hash-matches (no ROUND ties). week_offset arithmetic stays
    in integer days/7 (both weeks are Monday-truncated, the diff is an
    exact multiple of 7)."""
    ev = T(spark, sf_dir, "events").select("user_id", "ts")
    week = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    active = (
        ev.select("user_id", week(F.col("ts")).alias("active_week"))
        .distinct()
        .localCheckpoint(eager=False)  # users x weeks rows; corpus pass runs ONCE
    )
    first_ev = active.groupBy("user_id").agg(F.min("active_week").alias("cohort_week"))
    joined = active.join(first_ev, "user_id").select(
        "cohort_week",
        (F.datediff("active_week", "cohort_week") / 7).cast("long").alias("week_offset"),
        "user_id",
    )
    sizes = first_ev.groupBy("cohort_week").agg(F.count("*").alias("n_cohort"))
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            quant4(F.col("n_active").cast("double") / F.col("n_cohort")).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "w10_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n
      FROM events GROUP BY event_type, hour_ts
    ), stats AS (
      SELECT event_type, hour_ts, n,
             SUM(n) OVER w AS s1,
             SUM(n * n) OVER w AS s2,
             COUNT(*) OVER w AS cnt
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_ts, n,
           CASE WHEN cnt >= 12
                     AND (CAST(s2 AS DOUBLE) - CAST(s1 * s1 AS DOUBLE) / cnt)
                         / (cnt - 1) > 0
                THEN FLOOR((n - CAST(s1 AS DOUBLE) / cnt)
                           / sqrt((CAST(s2 AS DOUBLE)
                                   - CAST(s1 * s1 AS DOUBLE) / cnt)
                                  / (cnt - 1))
                           * 10000.0 + 0.5) / 10000.0
                END AS zscore,
           COALESCE(
             CASE WHEN cnt >= 12
                       AND (CAST(s2 AS DOUBLE) - CAST(s1 * s1 AS DOUBLE) / cnt)
                           / (cnt - 1) > 0
                  THEN abs((n - CAST(s1 AS DOUBLE) / cnt)
                           / sqrt((CAST(s2 AS DOUBLE)
                                   - CAST(s1 * s1 AS DOUBLE) / cnt)
                                  / (cnt - 1))) > 3.0
                  END, FALSE) AS is_anomaly
    FROM stats
    ORDER BY event_type, hour_ts
    """,
    tags=("W10", "A6", "W4"),
)
def w10_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection over event-rate telemetry —
    the canonical observability query run downstream of the reference's
    parquet output (reference docs/querying.md delegates it; this makes it
    first-class): each (event_type, hour) count is scored against the mean
    and sample-stddev of its own trailing 24 populated hours, needing at
    least 12 of history; |z| > 3 flags the hour.

    Cross-engine exactness without tolerance: the window aggregates are
    exact integers (SUM n, SUM n^2, COUNT — order-free), and both engines
    then evaluate the SAME IEEE op tree — (s2 - s1^2/cnt)/(cnt-1), one
    sqrt, one division — so even the raw z agrees bit-for-bit and only the
    presentation value is quant4-quantized. s1^2 multiplies in LONG (exact;
    ~1e10 max at sf ladders vs 2^63).

    Scale shape: ONE corpus shuffle (the hourly pre-aggregation, map-side
    combined) reduces the stream to type x hours rows; the trailing window
    then runs on that calendar-bounded frame partitioned by event_type —
    at 100 TB the window input is ~types x hours (thousands of rows per
    year), never event-sized."""
    ev = T(spark, sf_dir, "events").select("event_type", "ts")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts"))
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-24, -1)
    )
    stats = hourly.select(
        "event_type",
        "hour_ts",
        "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count("*").over(w).alias("cnt"),
    )
    var = (
        F.col("s2").cast("double")
        - (F.col("s1") * F.col("s1")).cast("double") / F.col("cnt")
    ) / (F.col("cnt") - 1)
    z = (F.col("n") - F.col("s1").cast("double") / F.col("cnt")) / F.sqrt(var)
    ok = (F.col("cnt") >= 12) & (var > 0)
    return stats.select(
        "event_type",
        "hour_ts",
        "n",
        F.when(ok, quant4(z)).alias("zscore"),
        F.coalesce(F.when(ok, F.abs(z) > 3.0), F.lit(False)).alias("is_anomaly"),
    ).orderBy("event_type", "hour_ts")
