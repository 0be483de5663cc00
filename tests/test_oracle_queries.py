"""The t2 mirror: every oracle-matched declared query runs in Spark and DuckDB
over the same parquet and must produce identical canonical results. One test
per query (parametrized) so failures name the query."""

from __future__ import annotations

import pytest

from otlp2parquet_spark.queries.registry import all_specs
from tests.conftest import SF_ORACLE
from tests.oracle_util import compare

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, duck, name):
    spec = SPECS[name]
    df = spec.build(spark, SF_ORACLE)
    problems = compare(df, duck, spec.oracle)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    spec = SPECS[name]
    df = spec.build(spark, SF_ORACLE)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
