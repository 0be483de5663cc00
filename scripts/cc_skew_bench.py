"""Zipf-adversarial scale check for the connected-components kernel
(r10 verdict ask #7).

The 10x/100x rows for x2_dedup_clusters so far used plain/salted corpus
replicas — near-uniform component sizes and hub degrees. The alternating
large-star/small-star design ARGUES skew-safety (no per-node label table,
hot shuffle partitions split by AQE); this bench measures it on the
adversarial graph shapes replicas never produce, SEPARATING the two
adversaries because they stress different things:

- uniform    : N/7 independent 8-node stars — the easy baseline (already a
               star forest; contraction is a fixed point).
- zipf_hubs  : ONE giant component of Zipf(1) hub-degree stars (top hub
               degree ~10% of all edges — the "every crawl page links the
               boilerplate cluster" regime), hubs attached to node 0, so
               diameter stays small. This isolates HUB SKEW: the hot
               groupBy/join keys the ask is about.
- giant_path : ONE path through all nodes — zero skew, maximal DIAMETER.
               This isolates the O(log diameter) contraction-round law
               (the regime where plain label propagation would need
               500k rounds; the star algorithm pays ~log2(n)).

Edges are built directly with spark.range (deterministic formulas, no
text): the Jaccard pair generator's GRAM_DF_CAP intentionally prevents a
text corpus from producing such graphs, and the question here is the CC
ROUNDS' behavior, not pair generation (skew_bench.py covers that side).
Labels are asserted EXACT against the known component structure — this is
what caught the fixed-16-round-cap bug (a 500k-diameter path needs ~19
rounds; the old cap returned a half-contracted forest SILENTLY) — wall
time without exactness proves nothing.

Usage: python scripts/cc_skew_bench.py [N_EDGES] [SCALE]
       (defaults 50_000 and 100 -> measures N and N*SCALE per graph)
Prints one JSON line per (graph, n_edges) cell for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 1000  # hub count for zipf_hubs


def build_uniform(spark, n_edges: int):
    """8-node stars: nodes 8k..8k+7, edges (8k+j -> 8k). Expected label of
    node v: v - v % 8."""
    from pyspark.sql import functions as F

    e = spark.range(n_edges).select(
        ((F.col("id") / 7).cast("long") * 8 + (F.col("id") % 7) + 1).alias("hi"),
        ((F.col("id") / 7).cast("long") * 8).alias("lo"),
    )
    return e.distinct().localCheckpoint(eager=False)


def build_zipf_hubs(spark, n_edges: int):
    """Giant component, min node 0, SMALL diameter, Zipf(1) hub degrees:
    hubs 0..K-1 all attached to node 0; spoke i attaches to hub
    floor(K^(i/n)) - 1 via inverse-CDF, so P(hub = j) ~ 1/j — the top hub
    carries ~10% of all edges (one shuffle group, the skew under test).
    All labels must come out 0."""
    from pyspark.sql import functions as F

    n_spokes = n_edges - (K - 1)
    hub_star = spark.range(1, K).select(
        F.col("id").alias("hi"), F.lit(0).cast("long").alias("lo")
    )
    spokes = spark.range(n_spokes).select(
        (F.col("id") + K).alias("hi"),
        (
            F.floor(
                F.pow(F.lit(float(K)), F.col("id") / F.lit(float(n_spokes)))
            ).cast("long")
            - 1
        ).alias("lo"),
    )
    return hub_star.union(spokes).distinct().localCheckpoint(eager=False)


def build_giant_path(spark, n_edges: int):
    """One path 0-1-2-...-n: zero skew, diameter = n. All labels 0."""
    from pyspark.sql import functions as F

    e = spark.range(1, n_edges + 1).select(
        F.col("id").alias("hi"), (F.col("id") - 1).alias("lo")
    )
    return e.distinct().localCheckpoint(eager=False)


CHAIN_LEN = 10_000  # edges per chain in the mid-shape


def build_chains_10k(spark, n_edges: int):
    """MANY 10k-hop chains (r11 verdict ask #5): the mid-shape between
    uniform's diameter-1 stars and giant_path's one maximal-diameter
    component — where real corpora's worst plausible near-dup chains
    (template drift across a crawl) actually land. Nodes are cut into
    (CHAIN_LEN+1)-node blocks; node v links v-1 unless v starts a block.
    Expected label of v: v - v % (CHAIN_LEN+1). Rounds should follow
    O(log CHAIN_LEN), independent of HOW MANY chains there are."""
    from pyspark.sql import functions as F

    block = CHAIN_LEN + 1
    # closed form over edge index i (no filter+limit: Spark's limit is
    # "any N rows", and a non-prefix subset would break chains mid-block
    # and fake label corruption — r12 review finding): edge i lives in
    # chain i div CHAIN_LEN at offset i mod CHAIN_LEN, exactly n_edges
    # edges, every one present
    chain = F.expr(f"id div {CHAIN_LEN}")  # integer div: no float rounding
    off = F.col("id") % CHAIN_LEN
    e = spark.range(n_edges).select(
        (chain * block + off + 1).alias("hi"),
        (chain * block + off).alias("lo"),
    )
    return e.distinct().localCheckpoint(eager=False)


def labels_of(spark, E, stats):
    from pyspark.sql import functions as F

    from otlp2parquet_spark.extensions.dedup import cc_star_forest

    mapping, forest = cc_star_forest(spark, E, stats=stats)
    nodes = (
        E.select(F.col("hi").alias("doc_id"))
        .union(E.select(F.col("lo").alias("doc_id")))
        .distinct()
    )
    if mapping is not None:
        map_df = spark.createDataFrame(mapping, schema="doc_id long, cluster_min long")
        return nodes.join(F.broadcast(map_df), "doc_id", "left").select(
            "doc_id", F.coalesce("cluster_min", "doc_id").alias("cluster_id")
        )
    return nodes.join(forest.hint("merge"), nodes.doc_id == forest.hi, "left").select(
        "doc_id", F.coalesce("lo", "doc_id").alias("cluster_id")
    )


def check_exact(graph: str, lab) -> int:
    from pyspark.sql import functions as F

    if graph == "uniform":
        return lab.filter(
            F.col("cluster_id") != (F.col("doc_id") - F.col("doc_id") % 8)
        ).count()
    if graph == "chains_10k":
        return lab.filter(
            F.col("cluster_id")
            != (F.col("doc_id") - F.col("doc_id") % (CHAIN_LEN + 1))
        ).count()
    return lab.filter(F.col("cluster_id") != 0).count()


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    from otlp2parquet_spark.session import get_spark

    spark = get_spark(app_name="cc-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    graphs = (
        ("uniform", build_uniform),
        ("zipf_hubs", build_zipf_hubs),
        ("giant_path", build_giant_path),
        ("chains_10k", build_chains_10k),
    )
    if only is not None:
        graphs = tuple((g, b) for g, b in graphs if g in only)
    for graph, build in graphs:
        for n in (n_edges, n_edges * scale):
            E = build(spark, n)
            E.count()  # materialize the fixture outside the timed window
            stats: dict = {}
            t0 = time.perf_counter()
            lab = labels_of(spark, E, stats)
            n_nodes = lab.count()  # forces the full contraction + labeling
            wall = time.perf_counter() - t0
            bad = check_exact(graph, lab)
            results[(graph, n)] = wall
            print(
                json.dumps(
                    {
                        "op": "cc_star_forest",
                        "graph": graph,
                        "n_edges": n,
                        "n_nodes": n_nodes,
                        "wall_s": round(wall, 2),
                        "rounds": stats.get("rounds"),
                        "endgame": stats.get("endgame"),
                        "labels_exact": bad == 0,
                        "bad_labels": bad,
                        "load_1m": round(os.getloadavg()[0], 2),
                    }
                )
            )
    big = n_edges * scale
    for graph in ("zipf_hubs", "giant_path", "chains_10k"):
        if (graph, big) not in results or ("uniform", big) not in results:
            continue  # graph filtered out by the optional 3rd arg
        print(
            json.dumps(
                {
                    "summary": f"{graph}/uniform wall factor at {big} edges",
                    "factor": round(
                        results[(graph, big)] / results[("uniform", big)], 2
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
