"""lm_model_route plan guards: the LM scorers' model join must be
broadcast below LM_BROADCAST_MAX_MODEL_ROWS and a plain shuffle equi-join
above it (the r9 VERDICT weak row — a statically broadcast corpus-grown
type table cannot absorb 100x by adding machines), and the route must be
value-transparent: both plans produce the identical scored frame."""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from otlp2parquet_spark.extensions import text
from otlp2parquet_spark.queries.registry import all_specs
from tests.conftest import SF_SMOKE

SPECS = all_specs()


@contextmanager
def _no_auto_broadcast(spark):
    """Pin both static and AQE auto-broadcast off so the ONLY way a
    BroadcastHashJoin can appear is the lm_model_route hint — then restore
    (the test_tpch_plans conf-leak class, pre-empted)."""
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    prior = {}
    for k in keys:
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _executed_plan(spark, name: str) -> str:
    df = SPECS[name].build(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


@pytest.mark.parametrize(
    "name", ["x4_ngram_lm_score", "x4_kn_lm_score", "x4_kn3_lm_score"]
)
def test_small_model_takes_the_broadcast_route(spark, name):
    # fixture models are ~14k-26k type rows — far under the 500k threshold,
    # so the model join must plan as a hint-driven BroadcastHashJoin even
    # with every auto-broadcast mechanism disabled
    assert text.LM_BROADCAST_MAX_MODEL_ROWS > 100_000  # guards a fat-finger
    with _no_auto_broadcast(spark):
        plan = _executed_plan(spark, name)
    assert "BroadcastHashJoin" in plan, plan


@pytest.mark.parametrize(
    "name", ["x4_ngram_lm_score", "x4_kn_lm_score", "x4_kn3_lm_score"]
)
def test_large_model_takes_the_shuffle_route(spark, name, monkeypatch):
    # force the over-threshold route: the model join must plan as a shuffle
    # equi-join (SortMergeJoin / ShuffledHashJoin) with ZERO broadcast
    # hints left anywhere in the scorer (x4_ngram's vocab frame is one row
    # per source — but even it must not mask a model broadcast here, so we
    # assert on the specific join operators, not hint counts)
    monkeypatch.setattr(text, "LM_BROADCAST_MAX_MODEL_ROWS", 0)
    with _no_auto_broadcast(spark):
        plan = _executed_plan(spark, name)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    if name != "x4_ngram_lm_score":  # kn/kn3 have no other join at all
        assert "BroadcastHashJoin" not in plan, plan


def test_route_is_value_transparent(spark, monkeypatch):
    # the two physical routes must produce the identical result frame —
    # the property that makes the route safe to flip at any threshold
    spec = SPECS["x4_kn_lm_score"]
    base = [tuple(r) for r in spec.build(spark, SF_SMOKE).collect()]
    monkeypatch.setattr(text, "LM_BROADCAST_MAX_MODEL_ROWS", 0)
    with _no_auto_broadcast(spark):
        routed = [tuple(r) for r in spec.build(spark, SF_SMOKE).collect()]
    assert base == routed
