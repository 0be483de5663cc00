"""Canonicalization + comparison used to mirror the driver's DuckDB-oracle
hash-matching (row-count + column names + order-insensitive values). The local
check is stricter than the driver's: it diffs actual canonical rows, so any
mismatch is debuggable.

Type strictness (round 6): the driver hashes *Arrow-typed* values, so DuckDB
HUGEINT (arrow decimal128(38,0)) never matches Spark bigint even when the
values are numerically identical — that is exactly how o6_pivot went
driver-red in round 5 while this mirror passed it (the old canon coerced
Decimal through float). The mirror now (a) reads the DuckDB result through
Arrow like the driver does, (b) compares a per-column TYPE FAMILY
(int / float / decimal / bool / str / bytes / date / timestamp / list<...>)
between the Spark schema and the DuckDB Arrow schema, and (c) canonicalizes
Decimal values with a `dec:` type tag so they can never collapse into
int/float. Int widths collapse into one family (driver-green queries mix
Spark int32 with DuckDB BIGINT, e.g. f2_datetime_funcs), but families never
cross."""

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
        # Exact, scale-insensitive, and type-tagged: 0.500000 == 0.5 within
        # the decimal family, but "dec:..." never equals an int/float canon.
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        if s in ("-0", ""):
            s = "0"
        return "dec:" + s
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


# --- type families -----------------------------------------------------------

def arrow_family(t) -> str:
    """Collapse a pyarrow DataType into the family the driver's typed hash
    distinguishes."""
    import pyarrow.types as pt

    if pt.is_null(t):
        return "null"  # all-NULL column: wildcard (matches any family)
    if pt.is_boolean(t):
        return "bool"
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return "decimal"
    if pt.is_string(t) or pt.is_large_string(t):
        return "str"
    if pt.is_binary(t) or pt.is_large_binary(t) or pt.is_fixed_size_binary(t):
        return "bytes"
    if pt.is_date(t):
        return "date"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return f"list<{arrow_family(t.value_type)}>"
    if pt.is_struct(t):
        return "struct"
    if pt.is_map(t):
        return "map"
    return str(t)


def spark_family(t) -> str:
    """Same families, from a pyspark.sql.types.DataType."""
    from pyspark.sql import types as st

    if isinstance(t, st.BooleanType):
        return "bool"
    if isinstance(t, (st.ByteType, st.ShortType, st.IntegerType, st.LongType)):
        return "int"
    if isinstance(t, (st.FloatType, st.DoubleType)):
        return "float"
    if isinstance(t, st.DecimalType):
        return "decimal"
    if isinstance(t, (st.StringType, st.VarcharType, st.CharType)):
        return "str"
    if isinstance(t, st.BinaryType):
        return "bytes"
    if isinstance(t, st.DateType):
        return "date"
    if isinstance(t, (st.TimestampType, st.TimestampNTZType)):
        return "timestamp"
    if isinstance(t, st.ArrayType):
        return f"list<{spark_family(t.elementType)}>"
    if isinstance(t, st.StructType):
        return "struct"
    if isinstance(t, st.MapType):
        return "map"
    return str(t)


def _families_match(a: str, b: str) -> bool:
    if a == b:
        return True
    # all-NULL columns surface as arrow null; match anything
    if a == "null" or b == "null":
        return True
    if a.startswith("list<") and b.startswith("list<"):
        return _families_match(a[5:-1], b[5:-1])
    return False


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cols, rows, _ = duck_result_typed(con, sql)
    return cols, rows


def duck_result_typed(con, sql: str) -> tuple[list[str], list[tuple], list]:
    """DuckDB result through Arrow — the driver's path — so HUGEINT/decimal
    typing is visible instead of silently collapsing in the DB-API layer."""
    tbl = con.execute(sql).fetch_arrow_table()
    cols = list(tbl.schema.names)
    types = [f.type for f in tbl.schema]
    if tbl.num_rows == 0:
        return cols, [], types
    pylists = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = list(zip(*pylists))
    return cols, rows, types


def compare(spark_df, duck_con, oracle: str, max_report: int = 5) -> list[str]:
    """Return a list of human-readable diffs (empty == match)."""
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows, d_types = duck_result_typed(duck_con, oracle)
    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    s_fam = {f.name: spark_family(f.dataType) for f in spark_df.schema.fields}
    d_fam = {c: arrow_family(t) for c, t in zip(d_cols, d_types)}
    for c in sorted(s_cols):
        if not _families_match(s_fam[c], d_fam[c]):
            problems.append(
                f"type family differs on '{c}': spark={s_fam[c]} duck={d_fam[c]}"
                " (driver hashes Arrow-typed values — this fails its gate even"
                " when values are equal)"
            )
    if problems:
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
