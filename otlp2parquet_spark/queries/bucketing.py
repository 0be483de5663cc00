"""Bucketed (co-located) joins — the shuffle-free fact-fact join path.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides on the key. Spark's bucketed tables pre-partition the DATA AT REST:
`bucketBy(n, key)` hashes rows into n files per partition at write time and
records the layout in the catalog, so a later join on that key needs NO
Exchange on either side — the scan itself satisfies the join's required
distribution (and `sortBy` additionally satisfies SortMergeJoin's ordering).
This is the batch analogue of the reference's (service, minute) physical
grouping, generalized to any join key.

Plan contract (asserted in tests/test_bucketed_join.py): joining two tables
bucketed on the same key into the same bucket count produces a
SortMergeJoin with ZERO Exchange operators; the same join over plain
parquet shows two. The write is a one-time cost amortized over every
downstream join/aggregation on that key — the standard warehouse layout
decision for a fact table's primary join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str,
) -> None:
    """Persist `df` as an external bucketed+sorted table (catalog-backed:
    bucketing metadata lives in the metastore, data at `path`)."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def cojoined(spark: SparkSession, left: str, right: str, on: list[str]) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys — planned
    as an exchange-free SortMergeJoin when the bucket layouts line up."""
    return spark.table(left).join(spark.table(right), on)
