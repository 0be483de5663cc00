"""Canonicalization + comparison used to mirror the driver's DuckDB-oracle
hash-matching (row-count + column names + order-insensitive values). The local
check is stricter than the driver's: it diffs actual canonical rows, so any
mismatch is debuggable."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

FLOAT_DECIMALS = 4


def canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, FLOAT_DECIMALS)
        if r == int(r):
            return str(int(r))
        return repr(r)
    if isinstance(v, Decimal):
        return canon_value(float(v))
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver semantics), canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_value(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def compare(spark_df, duck_con, oracle: str, max_report: int = 5) -> list[str]:
    """Return a list of human-readable diffs (empty == match)."""
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duck_result(duck_con, oracle)
    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}")
    s_canon = canon_rows(s_cols, s_rows)
    d_canon = canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        s_set = set(s_canon)
        d_set = set(d_canon)
        only_s = [r for r in s_canon if r not in d_set][:max_report]
        only_d = [r for r in d_canon if r not in s_set][:max_report]
        cols_sorted = sorted(s_cols)
        problems.append(f"values differ (cols={cols_sorted})")
        for r in only_s:
            problems.append(f"  spark-only: {r}")
        for r in only_d:
            problems.append(f"  duck-only : {r}")
        if not only_s and not only_d:
            problems.append("  (same value sets, different multiplicities)")
    return problems
