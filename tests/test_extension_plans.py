"""Physical-plan shape assertions for the X1-X5 extension operators
(pattern proven on X6 in test_pipeline_plans.py): the properties that make
them survive a 100 TB corpus — broadcast small sides, map-side partial
aggregation before every shuffle, equi-join-shaped candidate generation
with NO cartesian expansion — must be visible in the executed plan.
"""

from __future__ import annotations

import pytest

from otlp2parquet_spark.queries.registry import all_specs
from tests.conftest import SF_SMOKE

SPECS = all_specs()


def _plan(spark, name: str) -> str:
    df = SPECS[name].build(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_cosine_topk_broadcasts_queries(spark):
    """x3_cosine_topk: the (tiny) query set must be broadcast so the corpus
    streams through map-side — a shuffle join here would move the whole
    embedding corpus for a 5-row probe table."""
    plan = _plan(spark, "x3_cosine_topk")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_minhash_partial_aggregation(spark):
    """x2_minhash_lsh: the per-doc signature min must run two-phase
    (partial_min before the exchange) so the gram explosion is absorbed
    map-side instead of crossing the shuffle row-per-gram. Asserted on the
    signature builder's own plan — the full query localCheckpoints the
    banded signatures (they feed both self-join sides), which truncates
    the visible executed plan at the checkpoint."""
    from otlp2parquet_spark.extensions.dedup import minhash_signatures
    from otlp2parquet_spark.queries.registry import T
    from otlp2parquet_spark.session import spread

    sig = minhash_signatures(spread(T(spark, SF_SMOKE, "documents")))
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan
    full = _plan(spark, "x2_minhash_lsh")
    assert "CartesianProduct" not in full


def test_fingerprint_partial_aggregation(spark):
    """x4_fingerprint: rolling-hash gram aggregation must partial-combine
    before its exchange."""
    plan = _plan(spark, "x4_fingerprint")
    assert "partial_" in plan  # partial_min/partial_count per variant
    assert "CartesianProduct" not in plan


def test_exact_dedup_partial_aggregation(spark):
    """x1_exact_dedup: the sha256 groupBy must partial-combine — at 100 TB
    the map-side combine is what makes the single shuffle carry one row per
    distinct hash per partition, not one per document."""
    plan = _plan(spark, "x1_exact_dedup")
    assert "partial_min" in plan or "partial_count" in plan
    assert "Exchange hashpartitioning" in plan


@pytest.mark.parametrize(
    "name",
    [
        n
        for n in sorted(SPECS)
        if n.startswith("x")
        and n not in ("x2_dedup_clusters", "x2_cluster_keeper", "x6_dedup_weight")
    ],
)
def test_no_cartesian_product_in_extensions(spark, name):
    """No extension operator may plan a CartesianProduct: every candidate
    generator (gram bucket, LSH band, label block, IVF list, broadcast
    probe) must stay equi-join shaped. (x2_dedup_clusters — and
    x2_cluster_keeper, which composes on it — is excluded only because
    building it executes the iterative CC loop eagerly; its edge generator
    is jaccard_pairs, covered via x2_ngram_jaccard.)"""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name


def test_embedding_neardup_blocked_not_allpairs(spark):
    """x2_embedding_neardup: candidate generation must be label-blocked —
    the plan must hash-partition on the block key, with no cartesian or
    nested-loop join anywhere (all-pairs would be O(n^2) at corpus scale)."""
    plan = _plan(spark, "x2_embedding_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_ann_no_full_corpus_join(spark):
    """x3_ivf_ann: probes join the corpus through the IVF list assignment
    (equi-join on the bucket id), never all-pairs."""
    plan = _plan(spark, "x3_ivf_ann")
    assert "CartesianProduct" not in plan


# Queries where scanning the same table from more than one plan branch is
# the intended shape (self-joins on different predicates, disjoint slices,
# count-only side scans) — with WHY. Anything NOT listed here that scans a
# table twice is an unintended re-execution of an expensive subtree
# (Spark does no CSE across join inputs) and fails the audit below.
_DUPLICATE_SCAN_ALLOWLIST = {
    "j7_range_join": "events self-join: banded range join needs both sides",
    "j8_cross_join": "deliberate 5x5 cartesian demonstration",
    "o3_union": "UNION ALL of two filtered slices, each with pushed filters",
    "o3_union_distinct": "UNION of two filtered slices",
    "o4_intersect_except": "set ops over two branch filters per table",
    "q02_time_filter": "scalar max-ts subquery (printed per reuse site)",
    "q04_errors_recent": "scalar max-ts subquery (printed per reuse site)",
    "t4_watermark_late_drop": (
        "bucket-max side scan is column-pruned to (event_id, ts) and "
        "aggregates immediately: cheaper than materializing the windowed "
        "event frame just to avoid a 2-column second pass"
    ),
    "x6_stratified_sample": (
        "distributed threshold search by construction: one map-side-"
        "combined bucket-count pass (checkpointed: its two window "
        "consumers never re-derive it), then two map-only broadcast-"
        "join filter passes (below-threshold + inside-threshold-bucket); "
        "three narrow scans replace the naive per-stratum corpus sort "
        "that serializes a hot source"
    ),
    "x6_token_budget_fill": (
        "the stratified threshold search, budget-weighted: the skinny "
        "(doc_id, n_tok, passes, hv) base frame is checkpointed once (r12: "
        "the corpus is scanned and tokenized exactly ONCE; mass pass and "
        "both select passes read the checkpoint), replacing the naive "
        "single-task global sort + running sum"
    ),
    "x4_heavy_hitters": (
        "sketch-then-verify by construction: pass 1 is the per-partition "
        "frequent-items summary (<= K rows out per partition), pass 2 "
        "recounts exactly over the candidate set alone — two narrow "
        "map-side-combined passes ARE the algorithm; materializing the "
        "exploded token frame to avoid the second scan would cost more "
        "than the scan at any corpus size"
    ),
    "t6_running_count": (
        "two-level prefix scan (r8 hot-key fix): the intra-bucket window "
        "and the per-bucket-totals aggregate each scan events once — two "
        "narrow column-pruned scans beat materializing the windowed frame, "
        "and deriving the totals FROM the window branch would re-execute "
        "the window subtree at both join consumers"
    ),
    "w8_funnel": "three disjoint event_type slices (view/click/purchase), "
    "each predicate pushed to its scan — the funnel's staged-MIN stages "
    "genuinely need three roles of events (same class as t8's two-slice "
    "stream-stream join)",
    "x1_incremental_dedup": "corpus slice vs batch slice: disjoint %10 predicates",
    "x2_minhash_firstseen": "doc_id-only second scan re-attaches gramless "
    "(<3 token) docs as is_neardup=FALSE (zero data columns, same class as "
    "x6_tfidf_topk's count-only side); the tokenize pass runs once",
    "x1_bloom_dedup": "probe plan unions the odd-doc slice with the "
    "re-keyed %10 duplicate-injection slice (two disjoint predicates on "
    "documents); the corpus build scan ran eagerly before this plan",
    "x3_cosine_topk": "query slice vs corpus: two roles of embeddings",
    "x3_radius_search": "query slice vs corpus: two roles of embeddings "
    "(the x3_cosine_topk shape, minus the window)",
    "x3_hard_negatives": "query slice (vec_id<5, broadcast) vs corpus: "
    "two roles of embeddings, the x3_cosine_topk class; the label-mismatch "
    "predicate rides inside the broadcast join",
    "x3_mmr_rerank": "query slice (vec_id<5, broadcast) vs corpus: two "
    "roles of embeddings, same shape as x3_cosine_topk; the MMR kernel "
    "itself runs on shortlist-sized groups only",
    "x3_dim_truncation": "query slice (vec_id<5, broadcast) vs corpus: two "
    "roles of embeddings, same shape as x3_cosine_topk; both cosines are "
    "computed in the ONE corpus-streaming pass",
    "x3_knn_join": "blocked exact self-join: both sides required",
    "x6_contamination": "bench slice (1/97) vs corpus slice: disjoint",
    "x6_zorder_layout": "extremes side scan is column-pruned to (user_id, "
    "ts) and aggregates immediately to ONE broadcast row (the "
    "x6_mix_temperature class); the z-value pass itself is map-only",
    "x6_hilbert_layout": "same extremes-scan class as x6_zorder_layout; "
    "the 16-level rot/swap chain is map-only named projections",
    "x6_fuzzy_decontam": "bench slice (1/97) + training slice: DISJOINT "
    "%97 predicates, each signature-hashed once from its own filter-pushed "
    "scan, plus a doc_id-only re-attach scan for gramless docs (zero data "
    "columns — the x2_minhash_firstseen class)",
    "x6_mix_temperature": "rate side scan is column-pruned to (source, "
    "n_chars) and aggregates immediately into a source-sized table — "
    "rates inherently need a global agg before the probe pass (same "
    "shape as x6_tfidf_topk's count-only side)",
    "x6_tfidf_topk": "count-only n_docs side scan (zero data columns)",
    "x3_kmeans": "two Lloyd assignment passes each stream the corpus once "
    "(inherent to the iteration) + a LIMIT-8 seed scan; re-scanning parquet "
    "beats materializing the corpus for a fixed 2-pass round",
    "t8_stream_stream_join": "view slice vs purchase slice: disjoint "
    "event_type filters, two genuine join roles (the live form reads two "
    "stream branches the same way)",
    "x5_media_meta": "three disjoint doc_id%3 slices, one per modality "
    "synth fixture (wav/png/avi) unioned into the mixed corpus",
    "x3_pq_ann": "subvector frame is checkpointed once for train/encode/"
    "query; the two remaining raw-vector scans are the exact re-rank "
    "(broadcast-shortlist-filtered corpus) and the 5-query slice — two "
    "genuine roles, kept as scans because the ADC pipeline deliberately "
    "never carries raw vectors",
    "x3_ivfpq_ann": "same class as x3_pq_ann: the residual subvector frame "
    "is checkpointed once for codebook/encode (and the coarse assignment "
    "ran eagerly inside ivf_assign); the three remaining scans are the "
    "5-row query slice (consumed by the cell probe AND the re-rank) and "
    "the broadcast-shortlist-filtered exact re-rank corpus pass — raw "
    "vectors deliberately never ride the ADC pipeline",
    "x2_semantic_dedup": "inherits x3_kmeans's fixed 2-pass Lloyd round "
    "(two corpus assignment streams + a LIMIT-8 seed scan) via "
    "kmeans_refined_assign; the dedup stage adds no further scans",
    "a13_tpch_q7": "nation scanned once per alias (supplier side, customer "
    "side) — two genuine dimension roles on a 25-row table; the EXECUTED "
    "plan reuses one broadcast exchange for both "
    "(tests/test_tpch_plans.py::test_q7_broadcasts_nation_twice pins it)",
    "a21_tpch_q8": "nation scanned once per alias (customer-region side, "
    "supplier-market-share side) — two genuine dimension roles on a 25-row "
    "table, the Q7 shape; both sides broadcast "
    "(tests/test_tpch_plans.py::test_q8_pushdown_and_broadcast_shape)",
    "a19_tpch_q22": "customer scanned twice by construction: the 1-row "
    "balance-threshold aggregate and the candidate stream it gates — the "
    "spec's correlated scalar subquery, decorrelated "
    "(tests/test_tpch_plans.py::test_q22_threshold_is_broadcast_not_recomputed "
    "pins the exact count)",
    # r13: the five barrier-removal sites. The STATIC plan prints the shared
    # subtree once per branch, but every branch point sits ABOVE an
    # Exchange, and AQE deduplicates identical shuffle stages at RUNTIME —
    # tests/test_stage_reuse.py executes each query and pins that the
    # final adaptive plan scans documents exactly once (the duplicate
    # branch collapses to a ReusedExchange). Task counts measured identical
    # to the old localCheckpoint form, minus its eager build-time stage
    # materialization.
    "x6_epoch_shuffle": (
        "bucket-counts and rank-join branches share spread()'s round-robin "
        "exchange (AQE runtime stage reuse; test_stage_reuse.py pins one "
        "executed documents scan); each branch recomputes only the cheap "
        "md5 projection above the reused exchange"
    ),
    "x6_source_overlap": (
        "counts and pair branches share the (ia, ib) tally aggregate's "
        "exchange (AQE runtime stage reuse; test_stage_reuse.py pins one "
        "executed documents scan); only the <= S + C(S,2)-row final "
        "aggregate recomputes per branch"
    ),
    "x2_minhash_lsh": (
        "both self-join sides share the signature aggregate's doc_id "
        "exchange (AQE runtime stage reuse; test_stage_reuse.py pins one "
        "executed documents scan); only the 4-rows-per-doc band explode "
        "recomputes per side"
    ),
    "x4_perplexity_buckets": (
        "percentile and bucket-select branches share the scorer's per-doc "
        "aggregate exchange (AQE runtime stage reuse; test_stage_reuse.py "
        "pins the executed documents scan count); only the skinny per-doc "
        "final aggregate recomputes per branch"
    ),
}


@pytest.mark.parametrize(
    "name",
    [n for n in sorted(SPECS) if n not in ("x2_dedup_clusters", "x2_cluster_keeper", "x6_dedup_weight")],
)
def test_no_unintended_duplicate_scans(spark, name):
    """Regression guard for the r4 plan audit: no query may scan the same
    source table from multiple plan branches unless the duplication is a
    declared, justified shape. Catches reintroduced subtree re-execution
    (the bug class fixed in tfidf/jaccard/minhash/ivf/resize/seq-pack).
    x2_dedup_clusters (and x2_cluster_keeper, which composes on it) is
    excluded: building it runs the CC loop eagerly."""
    import collections
    import re

    df = SPECS[name].build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    tables = re.findall(r"sf0\.001/(\w+)\.parquet", plan)
    dup = {t: n for t, n in collections.Counter(tables).items() if n > 1}
    if dup and name not in _DUPLICATE_SCAN_ALLOWLIST:
        raise AssertionError(
            f"{name} scans {dup} times with no allowlist justification — "
            "likely an expensive subtree re-executed across join branches; "
            "materialize it once (lazy localCheckpoint) or justify here"
        )


def test_dedup_clusters_local_and_distributed_paths_agree(spark):
    """The hybrid CC finisher (bounded collect + union-find once the
    contracted edge set fits the driver) must produce exactly the
    star-round result: run x2_dedup_clusters with the local threshold at
    its default (local endgame fires) and forced to 0 (pure distributed
    star rounds) and require identical (doc_id, cluster_id) assignments."""
    from otlp2parquet_spark.extensions import dedup

    hybrid = sorted(map(tuple, SPECS["x2_dedup_clusters"].build(spark, SF_SMOKE).collect()))
    old = dedup._LOCAL_CC_EDGE_THRESHOLD
    dedup._LOCAL_CC_EDGE_THRESHOLD = 0
    try:
        distributed = sorted(
            map(tuple, SPECS["x2_dedup_clusters"].build(spark, SF_SMOKE).collect())
        )
    finally:
        dedup._LOCAL_CC_EDGE_THRESHOLD = old
    assert hybrid == distributed and hybrid
