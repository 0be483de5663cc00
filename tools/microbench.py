"""Isolated per-query micro-bench: same protocol as bench.py (noop sink,
best-of-N, cal kernel) for a named subset of queries, so a suspicious
full-suite number can be re-measured on a quiet box without paying the
whole suite. Usage:

    python tools/microbench.py q1 q2 ...            # best-of-3 each
    SPARK_GRAFT_RUNS=5 python tools/microbench.py q1

Prints one JSON line {"queries": {...}, "noise_index": ...} — NOT the
bench.py contract line (no "metric"/"value"), so nothing downstream can
mistake it for a suite run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CAL_REF_S, _cal_kernel  # noqa: E402
from otlp2parquet_spark.queries.registry import all_specs  # noqa: E402
from otlp2parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cal_before = _cal_kernel()
    spark = get_spark(app_name="otlp2parquet-microbench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    # same warm-up lane as bench.py: JIT + noop write path + Python workers
    for warm in ("a1_tpch_q1", "p1_project_compute", "u3_grouped_agg_pandas_udf"):
        specs[warm].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            specs[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    cal_after = _cal_kernel()
    noise = round((cal_before + cal_after) / 2.0 / CAL_REF_S, 3)
    print(
        json.dumps(
            {
                "queries": timings,
                "normalized": {k: round(v / noise, 3) for k, v in timings.items()},
                "noise_index": noise,
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
