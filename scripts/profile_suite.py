"""Per-query profiling for the optimization round: decomposes each headline
query's wall into build() time (driver-side planning + any measurement jobs)
vs noop-write time (the distributed computation), counts the Spark jobs each
phase launches, and dumps `.explain("formatted")` to plans/<round>/.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_suite.py \
        [--plans-dir plans/r12] [--suffix _before] [--runs 3] [query ...]

With no query names, profiles the full bench HEADLINE list. Prints one JSON
line per query: {"name", "best_total", "best_build", "best_write",
"jobs_build", "jobs_write", "n_stages"} and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from otlp2parquet_spark.queries.registry import all_specs  # noqa: E402
from otlp2parquet_spark.session import get_spark  # noqa: E402


def _job_count(sc, group: str) -> int:
    return len(sc.statusTracker().getJobIdsForGroup(group))


def profile(name: str, spec, spark, sf_dir: str, runs: int, plans_dir: str | None, suffix: str):
    sc = spark.sparkContext
    best = {"total": float("inf")}
    for r in range(runs + 1):  # first run is warm-up, not recorded
        grp_b = f"prof-{name}-build-{r}"
        sc.setJobGroup(grp_b, f"{name} build")
        t0 = time.perf_counter()
        df = spec.build(spark, sf_dir)
        t_build = time.perf_counter() - t0
        jobs_b = _job_count(sc, grp_b)
        grp_w = f"prof-{name}-write-{r}"
        sc.setJobGroup(grp_w, f"{name} write")
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_write = time.perf_counter() - t1
        jobs_w = _job_count(sc, grp_w)
        total = t_build + t_write
        if r == 0:
            if plans_dir:
                os.makedirs(plans_dir, exist_ok=True)
                with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            continue
        if total < best["total"]:
            best = {
                "total": total,
                "build": t_build,
                "write": t_write,
                "jobs_build": jobs_b,
                "jobs_write": jobs_w,
            }
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="otlp2parquet-profile")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    names = args.queries or HEADLINE

    # same warm-up protocol as bench.py
    specs["o5_distinct"].build(spark, sf_dir).count()
    for warm_name in names[:2]:
        specs[warm_name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out = []
    for name in names:
        b = profile(name, specs[name], spark, sf_dir, args.runs, args.plans_dir, args.suffix)
        row = {"name": name, **{k: round(v, 3) if isinstance(v, float) else v for k, v in b.items()}}
        out.append(row)
        print(json.dumps(row), flush=True)
    total = sum(r["total"] for r in out)
    build = sum(r["build"] for r in out)
    print(json.dumps({"suite_total": round(total, 3), "suite_build": round(build, 3),
                      "suite_write": round(total - build, 3), "n": len(out)}))


if __name__ == "__main__":
    main()
