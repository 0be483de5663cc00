"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real content lives in otlp2parquet_spark.queries.registry; this module is
a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from otlp2parquet_spark.queries.registry import all_specs  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shaped pricing
    summary over lineitem (SURVEY §2.3 A1)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return all_specs()["a1_tpch_q1"].build(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in sorted(all_specs().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every oracle-matched query; non-SQL-expressible ops
    (approx/LSH/ANN/stubbed decode) are omitted -> rows-only check."""
    return {
        name: spec.oracle for name, spec in sorted(all_specs().items()) if spec.oracle is not None
    }
