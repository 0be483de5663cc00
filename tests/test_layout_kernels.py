"""Layout-kernel parity: the Spark-side grid/Morton/Hilbert expressions must
agree value-for-value with independent pure-Python references over a seeded
random sweep of the full 16-bit grid (the DuckDB oracle already pins
cross-engine equality on the driver tables; this pins the MATH itself,
including corners the fixture data never hits)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from otlp2parquet_spark.layout import GRID_BITS, grid16, hilbert16, zvalue16


def _py_z(x: int, y: int) -> int:
    out = 0
    for i in range(GRID_BITS):
        out |= ((x >> i) & 1) << (2 * i + 1)
        out |= ((y >> i) & 1) << (2 * i)
    return out


def _py_hilbert(x: int, y: int) -> int:
    # canonical public xy->d loop
    d = 0
    s = (1 << GRID_BITS) // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_morton_and_hilbert_match_python_references(spark):
    rng = random.Random(0xC0FFEE)
    n = 1 << GRID_BITS
    pts = [(rng.randrange(n), rng.randrange(n)) for _ in range(2000)]
    # corners + seam cells (the quadrant boundaries where rot/swap bugs live)
    pts += [(0, 0), (n - 1, 0), (0, n - 1), (n - 1, n - 1)]
    pts += [(n // 2 - 1, n // 2), (n // 2, n // 2 - 1), (n // 2, n // 2)]
    df = spark.createDataFrame(pts, "ux long, tx long")
    got = (
        hilbert16(df.withColumn("zval", zvalue16(F.col("ux"), F.col("tx"))), "ux", "tx")
        .select("ux", "tx", "zval", "hval")
        .collect()
    )
    assert len(got) == len(pts)
    for r in got:
        assert r.zval == _py_z(r.ux, r.tx), (r.ux, r.tx)
        assert r.hval == _py_hilbert(r.ux, r.tx), (r.ux, r.tx)


def test_grid16_is_exact_integer_scaling(spark):
    """grid16 must land every extreme exactly: min -> 0, max -> a value
    < 65536, monotone, and exact int64 DIV (no double rounding) even for
    micro-timestamp spans where (v - min) * 65536 exceeds 2^53."""
    vmin, vmax = 1_700_000_000_000_000, 1_702_600_000_000_000  # ~30 days in us
    vals = [vmin, vmin + 1, (vmin + vmax) // 2, vmax - 1, vmax]
    df = spark.createDataFrame([(v,) for v in vals], "v long").withColumn(
        "g", grid16("v", vmin, vmax)
    )
    got = {r.v: r.g for r in df.collect()}
    span = vmax - vmin + 1
    for v in vals:
        assert got[v] == ((v - vmin) * 65536) // span, v  # exact python int div
    assert got[vmin] == 0 and got[vmax] < 65536
    assert got[vmin] <= got[(vmin + vmax) // 2] <= got[vmax]
