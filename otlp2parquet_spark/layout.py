"""Physical data-layout operators: Z-order (Morton) clustering for
multi-dimensional row-group skipping.

The reference's entire query-performance story is physical layout — hive
time partitions + service directories narrowing file globs
(`src/writer/write.rs:118-129`, `docs/querying.md:186-195`). That layout
prunes on ONE dimension tree (service, then time). A 100 TB events table is
queried on (user, time), (service, time), (type, time) boxes — and a layout
sorted on a single dimension leaves every other predicate reading the whole
slice. Z-ordering interleaves the bits of two dimensions so rows close in
BOTH dimensions land in the same parquet row groups, making min/max stats
selective for 2-D boxes — the Delta/Iceberg OPTIMIZE ZORDER technique,
implemented here as pure Catalyst expressions (one extremes aggregate
broadcast back, a map-only bit-interleave, one range shuffle to cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID_BITS = 16
GRID = 1 << GRID_BITS  # 65536 cells per dimension


def grid16(col, vmin, vmax):
    """Scale an integer column into the [0, 65535] grid given its extremes:
    (v - min) * 65536 DIV (max - min + 1). Pure int64 arithmetic (operands
    non-negative, so trunc == floor division in every engine); the +1 keeps
    the max value inside the grid. Bounds: (v - min) <= span and
    span * 65536 must stay under 2^63 — true for any timestamp span (micros
    span 2.9e12 for a century) and any 47-bit id space."""
    return F.expr(f"(({col} - {vmin}) * {GRID}) DIV ({vmax} - {vmin} + 1)")


def zvalue16(ux, uy):
    """Interleave two 16-bit grid coordinates into a 32-bit Morton z-value:
    bit i of ux lands at 2i+1, bit i of uy at 2i. A sum of 32 shift/mask
    terms — whole-stage-codegen integer ops, no UDF. The same unrolled
    formula replays in DuckDB (see _ZORDER_SQL_BITS), so z-values are
    hash-matchable across engines."""
    terms = []
    for i in range(GRID_BITS):
        terms.append(
            F.shiftleft(F.shiftright(ux, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(uy, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_sql_bits(ux_expr: str, uy_expr: str) -> str:
    """The DuckDB twin of zvalue16: the identical 32-term interleave over
    two SQL expressions."""
    terms = []
    for i in range(GRID_BITS):
        terms.append(f"((({ux_expr} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({uy_expr} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def zorder_write(
    df: DataFrame,
    zcol,
    path: str,
    n_files: int = 32,
    drop: tuple[str, ...] = (),
    **writer_opts,
) -> None:
    """Cluster `df` by the given z-value column into `n_files` range
    buckets, sorted by z within each bucket, and write parquet. Range
    partitioning on z gives each output file a tight z-interval; the
    within-file sort gives every ROW GROUP a tight interval — so a 2-D box
    predicate prunes at both the file level (footer min/max) and the
    row-group level. One range shuffle (sampled boundaries), no global
    sort. `drop` names helper columns (e.g. the CLI's epoch-micros
    projections zcol references) stripped from the output after
    clustering; writer_opts pass through (e.g. parquet.block.size to
    control row-group granularity)."""
    w = (
        df.withColumn("_z", zcol)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", *drop)
        .write.mode("overwrite")
    )
    for k, v in writer_opts.items():
        w = w.option(k, v)
    w.parquet(path)


def hilbert16(df: DataFrame, ux: str, uy: str, out: str = "hval") -> DataFrame:
    """Hilbert-curve distance for two 16-bit grid coordinates — the
    better-locality alternative to the Morton z-value (a contiguous
    Hilbert range is a connected region with no Morton "seam jumps", so
    box queries touch fewer false-positive row groups; Delta added
    Hilbert for exactly this reason).

    The classic xy->d loop (rot/swap per bit level) carries mutable state,
    so each of the 16 levels lands in NAMED intermediate columns
    (withColumns) — a purely functional expression chain would double in
    size per level. All integer CASE/AND/XOR arithmetic; the DuckDB twin
    (hilbert16_sql) is generated step-for-step from the same recurrence,
    so values hash-match across engines."""
    x, y, d = f"_h_x", f"_h_y", f"_h_d"
    df = df.withColumn(x, F.col(ux)).withColumn(y, F.col(uy)).withColumn(
        d, F.lit(0).cast("long")
    )
    for i in range(GRID_BITS - 1, -1, -1):
        s = 1 << i
        rx = F.when(F.col(x).bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col(y).bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        d_new = F.col(d) + F.lit(s) * F.lit(s) * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        ).cast("long")
        # rotation: ry == 0 -> (rx == 1 ? reflect both : identity), then swap
        x_new = (
            F.when(ry == 0, F.when(rx == 1, F.lit(s - 1) - F.col(y)).otherwise(F.col(y)))
            .otherwise(F.col(x))
        )
        y_new = (
            F.when(ry == 0, F.when(rx == 1, F.lit(s - 1) - F.col(x)).otherwise(F.col(x)))
            .otherwise(F.col(y))
        )
        nx, ny, nd = f"_h_x{i}", f"_h_y{i}", f"_h_d{i}"
        df = df.withColumn(nx, x_new).withColumn(ny, y_new).withColumn(nd, d_new)
        df = df.drop(x, y, d)
        x, y, d = nx, ny, nd
    return df.withColumn(out, F.col(d).cast("long")).drop(x, y, d)


def hilbert16_sql(src_cte: str, ux: str, uy: str, keep: str) -> str:
    """The DuckDB twin of hilbert16: a chain of 16 CTE steps generated
    from the identical recurrence. `src_cte` must expose columns `keep`,
    `ux`, `uy`; the returned fragment defines CTEs h15..h0 where h0 has
    (keep, hval)."""
    steps = []
    prev = src_cte
    px, py, pd = ux, uy, "CAST(0 AS BIGINT)"
    for i in range(GRID_BITS - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN ({px} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({py} & {s}) > 0 THEN 1 ELSE 0 END)"
        d_new = f"{pd} + CAST({s} AS BIGINT) * {s} * xor(3 * {rx}, {ry})"
        x_new = (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - {py} "
            f"ELSE {py} END) ELSE {px} END)"
        )
        y_new = (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - {px} "
            f"ELSE {px} END) ELSE {py} END)"
        )
        steps.append(
            f"h{i} AS (SELECT {keep}, {x_new} AS hx, {y_new} AS hy, "
            f"{d_new} AS hd FROM {prev})"
        )
        prev, px, py, pd = f"h{i}", "hx", "hy", "hd"
    return ",\n    ".join(steps)
