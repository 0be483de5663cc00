"""Declared-query registry: the single source of truth for the engine's query
surface (SURVEY.md §2.2 / §2.3).

Every declared operator is a ``QuerySpec``:
- ``build(spark, sf_dir) -> DataFrame``  — the PySpark implementation,
- ``oracle``                             — equivalent ANSI SQL for DuckDB over
  the same parquet tables (None => non-SQL-expressible; the harness then only
  checks rows/schema stability),
- ``tags``                               — SURVEY §2 inventory IDs it covers.

Determinism contract for every oracle-matched query (SURVEY §2.3 preamble):
total ORDER BY with a unique-key tiebreaker, exact-decimal accumulation +
ROUND(·, 4) for floating aggregates, no approximate/sampling operators, and
identical output column names in both engines (the harness sorts columns by
name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from otlp2parquet_spark.session import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a synthetic oracle table (TESTDATA.md)."""
    return load_table(spark, sf_dir, name)


def all_specs() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry."""
    # Imports are deferred so `import otlp2parquet_spark` stays cheap.
    from otlp2parquet_spark.queries import relational  # noqa: F401
    from otlp2parquet_spark.queries import otel_surface  # noqa: F401
    from otlp2parquet_spark.queries import udf_surface  # noqa: F401
    from otlp2parquet_spark.extensions import dedup, multimodal, pipeline, similarity, text  # noqa: F401
    from otlp2parquet_spark.streaming import batch_twins  # noqa: F401

    return dict(REGISTRY)
