"""Dump .explain('formatted') for named queries and print a one-line shape
summary (Exchange count, scan count, tokenizer-regex evaluation count,
Python-eval nodes) so plan claims are checkable. Usage:

    python tools/planshape.py out_dir q1 q2 ...
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otlp2parquet_spark.queries.registry import all_specs  # noqa: E402
from otlp2parquet_spark.session import get_spark  # noqa: E402


def shape(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    n_scan = len(re.findall(r"Scan parquet", plan))
    n_re = len(re.findall(r"regexp_replace", plan))
    n_py = len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas|WindowInPandas)", plan))
    n_smj = len(re.findall(r"SortMergeJoin", plan))
    n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
    n_win = len(re.findall(r"\bWindow\b", plan))
    return (
        f"Exchange={n_ex} Scan={n_scan} regexp_replace={n_re} "
        f"PyNodes={n_py} SMJ={n_smj} BHJ={n_bhj} Window={n_win}"
    )


def main() -> None:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="otlp2parquet-planshape")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    for name in names:
        df = specs[name].build(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, shape(plan), flush=True)


if __name__ == "__main__":
    main()
