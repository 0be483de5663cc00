"""Bucketed co-located join: the plan-level proof of the SURVEY/README
claim that fact-fact joins use bucketing instead of per-query shuffles at
scale. Joins two tables bucketed on the same key and asserts the physical
plan has NO Exchange, while the identical join over plain parquet has two
— with identical results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otlp2parquet_spark.queries.bucketing import cojoined, write_bucketed
from otlp2parquet_spark.session import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, str(base / "orders"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        str(base / "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the sort-merge path so the comparison is exchange-count, not
    # a broadcast short-circuit (the tables are tiny at test scale)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cojoined(spark, left, right, ["o_orderkey"]).groupBy(
            "o_orderkey"
        ).agg(F.count("*").alias("n"))
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # scan layout satisfies BOTH the join and the downstream groupBy
        # distribution: zero shuffles end-to-end
        assert "Exchange" not in plan, plan

        plain = (
            load_table(spark, SF, "orders")
            .join(
                load_table(spark, SF, "lineitem").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        assert _plan(plain).count("Exchange") >= 2
        # same results either way
        a = sorted((r.o_orderkey, r.n) for r in joined.collect())
        b = sorted((r.o_orderkey, r.n) for r in plain.collect())
        assert a == b and a
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
