"""lm_model_route scale evidence (r10): prove the LM scorers' model join
actually flips to the shuffle route when a corpus-grown type table crosses
LM_BROADCAST_MAX_MODEL_ROWS, on the SAME salted replica regime the other
scale rows use (scale_bench --salt-docs: per-replica gap salt, so replicas
share zero n-grams and the TYPE table — the model — genuinely grows ~Fx).

For each scorer it reports: measured model rows at base and at Fx, the
route taken (broadcast / shuffle), the join operator observed in the
EXECUTED plan at Fx, and best-of-N walls. The gate: any scorer whose Fx
model crosses the threshold must show SortMergeJoin/ShuffledHashJoin (no
BroadcastHashJoin on the model keys) in the plan that ran.

Usage: python scripts/lm_route_bench.py [--factor 100] [--runs 2]
       [--base /root/testdata/sf0.1] [--keep]
Prints one JSON line per scorer plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_bench import build_replica  # noqa: E402

SCORERS = ("x4_ngram_lm_score", "x4_kn_lm_score", "x4_kn3_lm_score")


def _model_rows(spark, sf_dir: str) -> dict[str, int]:
    """Distinct n-gram TYPE counts per scorer — the exact frames
    lm_model_route measures (bigram table for ngram/kn, trigram for kn3)."""
    from pyspark.sql import functions as F

    from otlp2parquet_spark.extensions.dedup import with_tokens
    from otlp2parquet_spark.queries.registry import T

    tok = with_tokens(T(spark, sf_dir, "documents"), ("doc_id", "source"))
    n = F.size("toks")
    bi = (
        tok.filter(n >= 2)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n - 2),
                    lambda i: F.struct(
                        F.col("toks")[i].alias("w1"),
                        F.col("toks")[i + 1].alias("w2"),
                    ),
                )
            ).alias("g"),
        )
        .select("source", "g.w1", "g.w2")
    )
    tri = (
        tok.filter(n >= 3)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n - 3),
                    lambda i: F.struct(
                        F.col("toks")[i].alias("w1"),
                        F.col("toks")[i + 1].alias("w2"),
                        F.col("toks")[i + 2].alias("w3"),
                    ),
                )
            ).alias("g"),
        )
        .select("source", "g.w1", "g.w2", "g.w3")
    )
    b = bi.distinct().count()
    t = tri.distinct().count()
    return {"x4_ngram_lm_score": b, "x4_kn_lm_score": b, "x4_kn3_lm_score": t}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from otlp2parquet_spark.extensions import text
    from otlp2parquet_spark.queries.registry import all_specs
    from otlp2parquet_spark.session import get_spark

    replica = tempfile.mkdtemp(prefix=f"lmroute{args.factor}x_")
    build_replica(args.base, replica, args.factor, salt_docs=True)

    spark = get_spark(app_name="otlp2parquet-lm-route-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    specs["o5_distinct"].build(spark, args.base).count()  # JVM warmup

    rows_base = _model_rows(spark, args.base)
    rows_fx = _model_rows(spark, replica)
    thr = text.LM_BROADCAST_MAX_MODEL_ROWS
    ok = True
    try:
        for name in SCORERS:
            walls = {}
            plans = {}
            for tag, sf_dir in (("base", args.base), (f"{args.factor}x", replica)):
                best = float("inf")
                df = None
                for _ in range(args.runs):
                    # build() INSIDE the timed region: the route's model
                    # count() materializes the corpus-sized type-table
                    # aggregation at build time, and walls must include it
                    # (the bench.py protocol) or the factor understates
                    # the scorers' true growth
                    t0 = time.perf_counter()
                    df = specs[name].build(spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    walls[tag] = best = min(best, time.perf_counter() - t0)
                # the noop write runs its OWN QueryExecution; finalize THIS
                # df's AQE plan with a real execution so the inspected plan
                # is one that actually ran (an AQE re-plan of the model
                # join is exactly what the gate exists to observe)
                df.collect()
                plan = df._jdf.queryExecution().executedPlan().toString()
                plan = plan.split("== Initial Plan ==")[0]
                plans[tag] = plan
            fx_rows = rows_fx[name]
            route = "shuffle" if fx_rows > thr else "broadcast"
            fx_plan = plans[f"{args.factor}x"]
            shuffle_join = "SortMergeJoin" in fx_plan or "ShuffledHashJoin" in fx_plan
            # ngram also statically broadcasts the per-source vocab frame,
            # so BroadcastHashJoin presence alone is not disqualifying there
            gate = shuffle_join if route == "shuffle" else ("BroadcastHashJoin" in fx_plan)
            ok = ok and gate
            print(
                json.dumps(
                    {
                        "op": name,
                        "threshold_rows": thr,
                        "model_rows_base": rows_base[name],
                        f"model_rows_{args.factor}x": fx_rows,
                        "route_fx": route,
                        "fx_plan_has_shuffle_join": shuffle_join,
                        "gate": "ok" if gate else "FAIL",
                        "base_s": round(walls["base"], 2),
                        f"{args.factor}x_s": round(walls[f"{args.factor}x"], 2),
                        "factor": round(
                            walls[f"{args.factor}x"] / walls["base"], 2
                        ),
                    }
                )
            )
        print(
            json.dumps(
                {
                    "summary": "lm_route",
                    "factor": args.factor,
                    "crossed": [n for n in SCORERS if rows_fx[n] > thr],
                    "ok": ok,
                }
            )
        )
    finally:
        if not args.keep:
            shutil.rmtree(replica, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
