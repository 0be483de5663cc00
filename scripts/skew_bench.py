"""Skew-boundedness check for the exact-Jaccard pair generator.

Builds a synthetic skewed corpus — one boilerplate sentence duplicated into
20% of docs (the classic web-crawl footer) — at N and 10N docs, and counts
candidate pairs produced by the gram self-join with and without the
GRAM_DF_CAP hot-gram cap. Without the cap the boilerplate grams alone
produce O((0.2 N)^2) join rows, so pairs grow ~100x for 10x data; with the
cap the hot grams drop out of the join once their per-source document
frequency passes the cap and growth stays bounded.

Usage: python scripts/skew_bench.py [N]   (default 2000; 10N run included)
Prints one JSON line per (n_docs, capped) cell for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOILER = "all rights reserved contact us for details"  # 7 tokens -> 5 grams


def make_fixture(path: str, n_docs: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for i in range(n_docs):
        # unique body: 12 tokens deterministic per doc, no cross-doc grams
        body = " ".join(f"w{i}x{j}" for j in range(12))
        text = f"{body} {BOILER}" if i % 5 == 0 else body
        rows.append((i, text, "en", "crawl", len(text)))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(path, "documents.parquet"))


def count_pairs(spark, sf_dir: str, capped: bool) -> tuple[int, float]:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from otlp2parquet_spark.extensions.dedup import (
        GRAM_DF_CAP,
        gram3_expr,
        with_tokens,
    )
    from otlp2parquet_spark.queries.registry import T

    t0 = time.perf_counter()
    d = T(spark, sf_dir, "documents")
    grams = (
        with_tokens(d, ("doc_id", "source"))
        .select("doc_id", "source", F.explode(gram3_expr(F.col("toks"))).alias("gram"))
        .filter(F.length("gram") > 0)
        .distinct()
    )
    if capped:
        grams = (
            grams.withColumn(
                "df", F.count("*").over(Window.partitionBy("source", "gram"))
            )
            .filter(F.col("df") <= GRAM_DF_CAP)
            .drop("df")
        )
    a, b = grams.alias("a"), grams.alias("b")
    n = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id"), F.col("b.doc_id"))
        .count()
        .count()
    )
    return n, time.perf_counter() - t0


def main() -> None:
    from pyspark.sql import SparkSession

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n_docs in (n, 10 * n):
        tmp = tempfile.mkdtemp(prefix="skewfix_")
        try:
            make_fixture(tmp, n_docs)
            for capped in (False, True):
                pairs, sec = count_pairs(spark, tmp, capped)
                print(
                    json.dumps(
                        {
                            "n_docs": n_docs,
                            "capped": capped,
                            "candidate_pairs": pairs,
                            "sec": round(sec, 2),
                        }
                    )
                )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
