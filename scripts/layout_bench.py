"""Measure what z-order clustering buys at row-group granularity, at
growing data volumes (BASELINE.md r8 protocol): replicate sf0.1 events
Nx (user ids re-salted so the user population grows with the corpus —
the salted regime of scale_bench), write the SAME rows in a z-ordered
layout and a time-sorted layout, then report the fraction of row groups a
2-D (user-range x quarter-time) box predicate must read under footer
min/max pruning, plus the wall time of the actual filtered Spark scan on
each layout.

Usage: python scripts/layout_bench.py [factor ...]   (default: 1 10)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from otlp2parquet_spark.layout import grid16, hilbert16, zorder_write, zvalue16  # noqa: E402
from otlp2parquet_spark.session import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def candidate_fraction(path: str, boxes: dict[str, tuple]) -> tuple[int, int]:
    matching = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            ok = True
            for col, (lo, hi) in boxes.items():
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or st.min is None:
                    continue
                if st.max < lo or st.min > hi:
                    ok = False
                    break
            matching += ok
    return matching, total


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF, "events").select(
        "event_id", "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    n_users = base.agg(F.max("user_id")).first()[0] + 1
    out: dict[str, dict] = {}
    for fx in factors:
        reps = spark.range(fx).withColumnRenamed("id", "rep")
        e = (
            base.crossJoin(reps)
            .select(
                (F.col("event_id") * fx + F.col("rep")).alias("event_id"),
                (F.col("user_id") + F.col("rep") * n_users).alias("user_id"),
                "ts_us",
            )
        )
        ext = e.agg(
            F.min("user_id").alias("umin"),
            F.max("user_id").alias("umax"),
            F.min("ts_us").alias("tmin"),
            F.max("ts_us").alias("tmax"),
        )
        umin, umax, tmin, tmax = ext.first()
        ez = (
            e.crossJoin(F.broadcast(ext))
            .withColumn("ux", grid16("user_id", "umin", "umax"))
            .withColumn("tx", grid16("ts_us", "tmin", "tmax"))
            .withColumn("zval", zvalue16(F.col("ux"), F.col("tx")).cast("long"))
        )
        ez = hilbert16(ez, "ux", "tx", out="hval").drop(
            "umin", "umax", "tmin", "tmax", "ux", "tx"
        )
        zpath, lpath = f"/tmp/layout_z_{fx}", f"/tmp/layout_t_{fx}"
        hpath = f"/tmp/layout_h_{fx}"
        n_files = max(8, 8 * fx)
        t0 = time.perf_counter()
        zorder_write(ez, F.col("zval"), zpath, n_files=n_files, drop=("hval",))
        z_write = time.perf_counter() - t0
        t0 = time.perf_counter()
        zorder_write(ez, F.col("hval"), hpath, n_files=n_files, drop=("zval",))
        h_write = time.perf_counter() - t0
        t0 = time.perf_counter()
        (
            ez.repartitionByRange(n_files, "ts_us")
            .sortWithinPartitions("ts_us")
            .write.mode("overwrite")
            .parquet(lpath)
        )
        l_write = time.perf_counter() - t0
        span_u, span_t = umax - umin + 1, tmax - tmin + 1
        boxes = {
            "user_id": (umin + span_u // 8, umin + span_u // 8 + span_u // 16),
            "ts_us": (tmin + span_t // 4, tmin + span_t // 2),
        }
        zc = candidate_fraction(zpath, boxes)
        hc = candidate_fraction(hpath, boxes)
        lc = candidate_fraction(lpath, boxes)

        def scan(path):
            t0 = time.perf_counter()
            n = (
                spark.read.parquet(path)
                .filter(
                    F.col("user_id").between(*boxes["user_id"])
                    & F.col("ts_us").between(*boxes["ts_us"])
                )
                .count()
            )
            return n, time.perf_counter() - t0

        zn, zt = scan(zpath)
        ln, lt = scan(lpath)
        assert zn == ln
        out[str(fx)] = {
            "rows": e.count(),
            "z_rowgroups": f"{zc[0]}/{zc[1]}",
            "h_rowgroups": f"{hc[0]}/{hc[1]}",
            "t_rowgroups": f"{lc[0]}/{lc[1]}",
            "z_frac": round(zc[0] / zc[1], 4),
            "h_frac": round(hc[0] / hc[1], 4),
            "t_frac": round(lc[0] / lc[1], 4),
            "prune_gain": round((lc[0] / lc[1]) / (zc[0] / zc[1]), 2),
            "hilbert_vs_z": round((zc[0] / zc[1]) / (hc[0] / hc[1]), 2),
            "z_scan_s": round(zt, 2),
            "t_scan_s": round(lt, 2),
            "z_write_s": round(z_write, 2),
            "h_write_s": round(h_write, 2),
            "t_write_s": round(l_write, 2),
            "box_rows": zn,
        }
        print(json.dumps({fx: out[str(fx)]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
