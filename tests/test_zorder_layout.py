"""Z-order layout gates: the clustered write must actually BUY something —
for a 2-D (user x time) box predicate, parquet row-group min/max stats over
the z-ordered layout must prune far more row groups than a single-dimension
(time-sorted) layout of the same data, and the layout change must never
change query RESULTS (clustering is a permutation)."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from otlp2parquet_spark.layout import grid16, zorder_write, zvalue16
from otlp2parquet_spark.session import load_table

SF = "/root/testdata/sf0.1"  # 100k events


def _candidate_row_groups(path: str, boxes: dict[str, tuple]) -> tuple[int, int]:
    """(matching, total) row groups whose [min,max] stats intersect EVERY
    box — exactly the footer-stats pruning decision a parquet reader makes."""
    import glob

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
                    continue  # no stats => cannot prune
                if st.max < lo or st.min > hi:
                    ok = False
                    break
            matching += ok
    return matching, total


def _with_z(e):
    ext = e.agg(
        F.min("user_id").alias("umin"),
        F.max("user_id").alias("umax"),
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("tmin"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("tmax"),
    )
    return (
        e.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .crossJoin(F.broadcast(ext))
        .withColumn("ux", grid16("user_id", "umin", "umax"))
        .withColumn("tx", grid16("ts_us", "tmin", "tmax"))
        .withColumn("zval", zvalue16(F.col("ux"), F.col("tx")).cast("long"))
        .drop("umin", "umax", "tmin", "tmax", "ux", "tx")
    )


def test_zorder_prunes_2d_boxes_linear_layout_cannot(spark, tmp_path):
    ez = _with_z(load_table(spark, SF, "events")).persist()
    try:
        # the query shape single-dimension layouts fail hardest at: a narrow
        # user range over a BROAD time window (per-user audits, GDPR scans)
        lo_u, hi_u = 100, 190  # ~1/16 of the 0..1499 user range
        t0, t1 = ez.agg(F.min("ts_us"), F.max("ts_us")).first()
        span = t1 - t0 + 1
        lo_t, hi_t = t0 + span // 4, t0 + span // 2  # a 1/4 time slice

        zpath = str(tmp_path / "events_z")
        zorder_write(
            ez, F.col("zval"), zpath, n_files=8, **{"parquet.block.size": 64 * 1024}
        )
        # the single-dimension baseline every warehouse already has: time-sorted
        lpath = str(tmp_path / "events_t")
        (
            ez.repartitionByRange(8, "ts_us")
            .sortWithinPartitions("ts_us")
            .write.mode("overwrite")
            .option("parquet.block.size", 64 * 1024)
            .parquet(lpath)
        )
        boxes = {"user_id": (lo_u, hi_u), "ts_us": (lo_t, hi_t)}
        z_match, z_total = _candidate_row_groups(zpath, boxes)
        l_match, l_total = _candidate_row_groups(lpath, boxes)
        # sanity: comparable granularity on both layouts
        assert z_total >= 16 and l_total >= 16
        z_frac, l_frac = z_match / z_total, l_match / l_total
        # the time-sorted layout prunes the time slice but reads EVERY group
        # inside it (user spans all); z-order must beat it decisively
        assert z_frac <= l_frac / 3, (z_frac, l_frac)

        # results are layout-invariant: the same box query returns the same
        # rows from both layouts (and from the unclustered source)
        def run(path):
            return sorted(
                r.event_id
                for r in spark.read.parquet(path)
                .filter(
                    (F.col("user_id").between(lo_u, hi_u))
                    & (F.col("ts_us").between(lo_t, hi_t))
                )
                .select("event_id")
                .collect()
            )

        expect = sorted(
            r.event_id
            for r in ez.filter(
                (F.col("user_id").between(lo_u, hi_u))
                & (F.col("ts_us").between(lo_t, hi_t))
            )
            .select("event_id")
            .collect()
        )
        assert expect and run(zpath) == expect and run(lpath) == expect
    finally:
        ez.unpersist()


def test_cli_zorder_end_to_end(spark, tmp_path, capsys):
    """The zorder CLI re-clusters a parquet table by two columns (one a
    timestamp, gridded on epoch-micros), preserves the exact input schema
    and row multiset, and reports the row count."""
    import json

    from otlp2parquet_spark import cli

    src = load_table(spark, SF, "events").limit(5000)
    src.write.mode("overwrite").parquet(str(tmp_path / "in"))
    rc = cli.main(
        [
            "zorder",
            str(tmp_path / "in"),
            str(tmp_path / "out"),
            "--by",
            "user_id,ts",
            "--files",
            "4",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] == 5000
    out = spark.read.parquet(str(tmp_path / "out"))
    inp = spark.read.parquet(str(tmp_path / "in"))
    assert set(out.columns) == set(inp.columns)
    assert out.count() == 5000
    assert inp.exceptAll(out.select(*inp.columns)).count() == 0


def test_cli_zorder_guards(spark, tmp_path, capsys):
    """Missing cluster columns and empty inputs fail LOUDLY with a JSON
    error and rc 2 — never a stack trace, never a silent empty output."""
    import json

    from otlp2parquet_spark import cli

    load_table(spark, SF, "events").limit(10).write.mode("overwrite").parquet(
        str(tmp_path / "in")
    )
    rc = cli.main(
        ["zorder", str(tmp_path / "in"), str(tmp_path / "o1"), "--by", "nope,ts"]
    )
    assert rc == 2
    assert "nope" in json.loads(capsys.readouterr().out.strip().splitlines()[-1])["error"]

    load_table(spark, SF, "events").limit(0).write.mode("overwrite").parquet(
        str(tmp_path / "empty")
    )
    rc = cli.main(
        ["zorder", str(tmp_path / "empty"), str(tmp_path / "o2"), "--by", "user_id,ts"]
    )
    assert rc == 2
    assert "error" in json.loads(capsys.readouterr().out.strip().splitlines()[-1])
