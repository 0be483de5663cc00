"""Equivalence harness for the r13 IVF assignment rewrite (r12 verdict #7).

The map-only nearest-centroid argmax (_nearest_centroid) replaced the
explode + Window(vec_id) assignment inside ivf_assign's flat path and
_ivfpq_residual_subs. ANN results are approximate vs brute force but must
be DETERMINISTIC and bit-stable across refactors: these tests pin the new
form row-for-row against the OLD window form (reconstructed here as the
reference spec) and the end-to-end ivfpq search against itself through
the persisted-index lifecycle.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import SF_ORACLE, SF_SMOKE
from otlp2parquet_spark.extensions.similarity import (
    _centroid_array,
    _ivfpq_residual_subs,
    _nearest_centroid,
    _score_centroids,
    ivf_assign,
    ivfpq_build,
    ivfpq_search,
)
from otlp2parquet_spark.session import load_table

SFS = [SF_SMOKE, SF_ORACLE]


def _old_window_assign(e, cents, n_centroids):
    """The pre-r13 flat assignment: explode x k + Window(vec_id) rn=1 —
    kept here as the reference spec the map-only form must reproduce."""
    scored = _score_centroids(e, cents, n_centroids, exact=True)
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cent_id").alias("cluster_id"))
    )


@pytest.mark.parametrize("sf_dir", SFS)
def test_assignment_matches_window_form(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents = (
        e.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb"))
    )
    new = (
        e.join(F.broadcast(_centroid_array(cents)))
        .select(
            "vec_id",
            _nearest_centroid(F.col("embedding"), F.col("carr"))
            .getField("cent_id")
            .alias("cluster_id"),
        )
    )
    old = _old_window_assign(e, cents, 8)
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_zero_norm_vector_failure_parity(spark):
    """Zero-norm vectors divide by zero inside cosine. Under ANSI mode
    (the Spark 4 default this engine runs with) BOTH the old window form
    and the new argmax raise DIVIDE_BY_ZERO — the refactor must not
    silently start tolerating inputs the old form rejected (or vice
    versa). (_nearest_centroid's -Infinity NaN mapping only matters with
    ANSI off, where it reproduces the window's NaN-first order.)"""
    rows = [
        (100, [0.0] * 4, 0),  # zero vector: cosine divides by zero
        (101, [1.0, 0.0, 0.0, 0.0], 0),
    ]
    cent_rows = [
        (1, [1.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cents = spark.createDataFrame(cent_rows, "cent_id long, cent_emb array<float>")
    new = (
        e.join(F.broadcast(_centroid_array(cents)))
        .select(
            "vec_id",
            _nearest_centroid(F.col("embedding"), F.col("carr"))
            .getField("cent_id")
            .alias("cluster_id"),
        )
    )
    old = _old_window_assign(e, cents, 2)
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        new.collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        old.collect()


@pytest.mark.parametrize("sf_dir", SFS)
def test_residual_subs_deterministic_and_keyed(spark, sf_dir):
    """The shared build/encode kernel: same rows on two constructions
    (bit-determinism is what lets streamed codes equal built codes)."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = (
        e.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb"))
        .localCheckpoint(eager=False)
    )
    a = _ivfpq_residual_subs(e, cents, 8).collect()
    b = _ivfpq_residual_subs(e, cents, 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == e.count() * 4  # M subvectors per vector


@pytest.mark.parametrize("sf_dir", SFS)
def test_ivfpq_search_bit_stable(spark, sf_dir):
    """End-to-end x3_ivfpq_ann determinism: two full build+search runs
    produce identical (q_id, neighbor_id, l2_sq, rank) rows."""
    e = load_table(spark, sf_dir, "embeddings")
    r1 = ivfpq_search(e, *ivfpq_build(e)).collect()
    r2 = ivfpq_search(e, *ivfpq_build(e)).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    assert len(r1) > 0


def test_ivf_assign_matches_window_form(spark):
    """ivf_assign's public output (with label) under the map-only path
    equals the reference window form."""
    e = load_table(spark, SF_SMOKE, "embeddings")
    assign, cents = ivf_assign(e, 8)
    scored = _score_centroids(e, cents, 8, exact=True)
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cent_id"))
    old = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", F.col("cent_id").alias("cluster_id"))
    )
    new = assign.select("vec_id", "label", "cluster_id")
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
