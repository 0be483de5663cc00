"""Registry-wide oracle typing lint.

The driver hashes Arrow-typed values, and DuckDB silently widens integer
aggregates to HUGEINT (SUM(int) -> decimal128(38,0)), which can never
hash-match a Spark bigint. Round 5 shipped exactly this bug in o6_pivot
(and latently in t4_watermark_late_drop). This lint runs EVERY declared
oracle through DuckDB -> Arrow at sf0.001 and asserts the surfaced schema
contains no decimal columns at any nesting depth — every exact-decimal
accumulation must be CAST to BIGINT (counts) or DOUBLE (4-dp quantized
floats) before it reaches the result surface.

Cheap by construction: each oracle is wrapped in `SELECT * FROM (...) LIMIT 0`
so DuckDB only plans/types it — no data is scanned, no Spark session needed.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow.types as pt
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _decimal_paths(t, path: str) -> list[str]:
    if pt.is_decimal(t):
        return [path]
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return _decimal_paths(t.value_type, path + "[]")
    if pt.is_struct(t):
        out = []
        for f in t:
            out.extend(_decimal_paths(f.type, f"{path}.{f.name}"))
        return out
    if pt.is_map(t):
        return _decimal_paths(t.key_type, path + ".key") + _decimal_paths(
            t.item_type, path + ".value"
        )
    return []


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


ORACLES = sorted(entry.oracle_sql().items())


@pytest.mark.parametrize("name,sql", ORACLES, ids=[n for n, _ in ORACLES])
def test_oracle_arrow_schema_is_decimal_free(duck, name, sql):
    tbl = duck.execute(f"SELECT * FROM ({sql}) LIMIT 0").fetch_arrow_table()
    offenders = []
    for field in tbl.schema:
        offenders.extend(_decimal_paths(field.type, field.name))
    assert not offenders, (
        f"oracle '{name}' surfaces decimal columns {offenders} "
        "(DuckDB HUGEINT/DECIMAL -> arrow decimal128 != Spark bigint/double "
        "in the driver's typed hash; CAST to BIGINT or DOUBLE)"
    )


def test_compare_catches_hugeint_vs_bigint(spark):
    """Regression for the round-5 o6_pivot driver failure: a DuckDB SUM(int)
    (HUGEINT -> arrow decimal128) must FAIL the mirror against a Spark bigint
    even when the values are numerically identical — the old mirror coerced
    Decimal through float and passed it, so the bug was only visible to the
    driver."""
    from tests.oracle_util import compare

    con = duckdb.connect()
    df = spark.range(1).selectExpr("CAST(10 AS BIGINT) AS n")
    problems = compare(df, con, "SELECT SUM(x) AS n FROM (VALUES (4), (6)) t(x)")
    assert problems and "type family" in problems[0] and "decimal" in problems[0]
    # and the cast form passes
    assert not compare(
        df, con, "SELECT CAST(SUM(x) AS BIGINT) AS n FROM (VALUES (4), (6)) t(x)"
    )
    con.close()
