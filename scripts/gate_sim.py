"""Driver-gate simulation: run EVERY declared query against its DuckDB
oracle exactly the way the grading harness does (vanilla SparkSession,
tests/oracle_util.compare), and report failures.

Usage: python scripts/gate_sim.py [sf_dir ...]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as m
    from oracle_util import compare

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = m.queries(), m.oracle_sql()
    fails: list[tuple[str, str, str]] = []
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        rows_only = 0
        t0 = time.perf_counter()
        for name, fn in sorted(qs.items()):
            try:
                if name in osql:
                    diff = compare(fn(spark, sf_dir), con, osql[name])
                    if diff:
                        fails.append((sf_dir, name, str(diff)[:160]))
                else:
                    rows_only += 1
                    assert fn(spark, sf_dir).count() >= 0
            except Exception as e:  # noqa: BLE001 - gate report, not control flow
                fails.append((sf_dir, name, f"{type(e).__name__}: {e}"[:160]))
        print(
            f"{sf_dir}: {len(qs)} queries ({len(qs) - rows_only} oracle-matched, "
            f"{rows_only} rows-only) in {time.perf_counter() - t0:.0f}s"
        )
    print("FAILURES:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
