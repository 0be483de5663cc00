"""x2_cluster_keeper survivorship semantics on a crafted corpus: the keeper
must be the quality-maximal cluster member, NOT the smallest doc_id (the
regression a naive min-id labeling would reintroduce)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from otlp2parquet_spark.queries.registry import all_specs

# doc 1: the SHORT copy (first-crawled, under the 200-char quality bar).
# doc 2: the same passage with a long clean continuation — passes quality.
# doc 9: unrelated singleton.
_BASE = (
    "the quick brown fox jumps over the lazy dog while the calm river "
    "flows past the old stone bridge near the quiet village square"
)
_LONG = (
    _BASE
    + " and the morning light settles softly on the rooftops as the town "
    "wakes to the sound of bells and the market fills with voices and "
    "the day begins in earnest for everyone who lives there"
)
_DOCS = [
    (1, _BASE),
    (2, _LONG),
    (9, "completely different content about spacecraft telemetry systems"),
]


def test_keeper_prefers_quality_over_min_id(spark, tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in _DOCS], pa.int64()),
            "text": [t for _, t in _DOCS],
            "lang": ["en"] * len(_DOCS),
            "source": ["s"] * len(_DOCS),
            "n_chars": pa.array([len(t) for _, t in _DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in all_specs()["x2_cluster_keeper"].build(spark, str(tmp_path)).collect()
    }
    # docs 1 and 2 share the passage -> one cluster, labeled by min id 1
    assert rows[1]["cluster_id"] == 1 and rows[2]["cluster_id"] == 1
    # but the KEEPER is doc 2: it passes the quality gate (len >= 200) and
    # doc 1 does not — min-id labeling would wrongly keep 1
    assert len(_BASE) < 200 <= len(_LONG)
    assert rows[1]["keeper_id"] == 2 and rows[2]["keeper_id"] == 2
    assert not rows[1]["is_keeper"] and rows[2]["is_keeper"]
    # the singleton keeps itself
    assert rows[9]["cluster_id"] == 9 and rows[9]["keeper_id"] == 9
    assert rows[9]["is_keeper"]


def test_cc_star_forest_giant_diameter_distributed_rounds(spark, monkeypatch):
    """Regression for the fixed-16-round-cap bug (r11): a giant-DIAMETER
    component needs ~log2(n) contraction rounds, and the old cap exited
    half-contracted, returning wrong labels silently. Forcing the
    distributed path on a 300-hop chain (endgame threshold patched to 0 so
    the bounded collect cannot mask it) must still converge to exact
    labels, in more rounds than the trivial fixtures take."""
    from pyspark.sql import functions as F

    from otlp2parquet_spark.extensions import dedup as D

    monkeypatch.setattr(D, "_LOCAL_CC_EDGE_THRESHOLD", 0)
    E = (
        spark.range(1, 300)
        .select(F.col("id").alias("hi"), (F.col("id") - 1).alias("lo"))
        .localCheckpoint(eager=False)
    )
    stats: dict = {}
    mapping, forest = D.cc_star_forest(spark, E, stats=stats)
    assert mapping is None and not stats["endgame"]
    assert stats["rounds"] > 3  # genuinely multi-round, not a fixture walk
    labels = {r["hi"]: r["lo"] for r in forest.collect()}
    assert labels == {i: 0 for i in range(1, 300)}  # every node -> comp min


def test_cc_round_budget_boundary(spark, monkeypatch):
    """r11 ADVICE off-by-one: the safety bound counts CONTRACTION rounds,
    and convergence observed on exactly the bound-th round is SUCCESS —
    the old range(64) loop spent its final slot on the signature check, so
    a graph needing exactly 64 contractions raised despite converging.
    Pin both edges of the boundary on a chain whose true round count we
    first measure: bound == rounds must succeed with exact labels, bound
    == rounds - 1 must raise (never return half-contracted labels)."""
    import pytest
    from pyspark.sql import functions as F

    from otlp2parquet_spark.extensions import dedup as D

    monkeypatch.setattr(D, "_LOCAL_CC_EDGE_THRESHOLD", 0)
    E = (
        spark.range(1, 300)
        .select(F.col("id").alias("hi"), (F.col("id") - 1).alias("lo"))
        .localCheckpoint(eager=False)
    )
    stats: dict = {}
    _, forest = D.cc_star_forest(spark, E, stats=stats)
    need = stats["rounds"]
    assert need > 1  # boundary is meaningful

    monkeypatch.setattr(D, "_CC_MAX_ROUNDS", need)
    _, forest2 = D.cc_star_forest(spark, E, stats={})
    assert {r["hi"]: r["lo"] for r in forest2.collect()} == {
        i: 0 for i in range(1, 300)
    }

    monkeypatch.setattr(D, "_CC_MAX_ROUNDS", need - 1)
    with pytest.raises(RuntimeError, match="did not converge"):
        D.cc_star_forest(spark, E, stats={})
