"""Scale-sweep harness: measures wall-factor of named queries at Fx replicated
data (BASELINE.md "10x scale sanity" tables — formalizing the ad-hoc r3/r4
/tmp-replica methodology so the sweep is reproducible every round).

Replica construction (documented so factors stay comparable across rounds):
- documents: F copies, doc_id offset by k*ID_SPAN per replica, text UNCHANGED
  (plain replication: a 10x corpus where every doc gains 10 exact/near copies
  — the worst case for dedup ops, whose edge graphs densify ~F^2; matches the
  r3 methodology behind the x2_dedup_clusters 2.8x row).
- --salt-docs: each replica's text gets a per-replica token salt (every
  inter-word gap becomes " sNN"), so replicas share ZERO word trigrams.
  This measures CORPUS GROWTH at the base duplication rate — the realistic
  100x question — instead of raising the per-doc duplication factor to F.
  Plain replication at F=100 is a DIFFERENT experiment: every doc becomes a
  100-clique, so the TRUE pair set grows ~F^2 (10,000x) and no engine that
  materializes pairs can be linear there; use a small factor for that
  adversarial regime and salted replicas for the growth question.
- embeddings: F copies, vec_id offset, vectors/labels unchanged (each ANN
  block densifies Fx — worst case for blocked kNN).
- events: F copies, event_id AND user_id offset — more users at constant
  per-user density, the realistic growth mode for the per-user windows.

Timing protocol = bench.py: best-of-N noop-format writes (full column
materialization, no driver transfer), after one warmup action. Load average
recorded; factors are only comparable at similar ambient load.

Usage:
  python scripts/scale_bench.py --ops x6_contamination,x6_seq_pack_sharded \
      [--factor 10] [--runs 2] [--base /root/testdata/sf0.1] [--keep]
Prints one JSON line per op: {"op", "base_s", "scaled_s", "factor", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ID_SPAN = 10_000_000

TABLES = ("documents", "embeddings", "events")
# columns to offset per replica so replicated rows stay distinct entities
OFFSET_COLS = {
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
}

# --tpch regime (r9): replicate the relational fact/dim tables too, with
# CONSISTENT key offsets on both sides of every join the a10-a12 analytics
# exercise (orderkey across lineitem/orders, custkey across orders/customer,
# suppkey across lineitem/supplier) — F replicas = F disjoint sub-economies
# of the base scale, i.e. more customers/orders at constant per-key density,
# the realistic growth mode. nation/region stay constant-size dims.
TPCH_TABLES = ("lineitem", "orders", "customer", "supplier")
TPCH_OFFSET_COLS = {
    "lineitem": ("l_orderkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
}


def _hash_u01(ids, k: int):
    """Replica-offset ids -> deterministic u in [0,1) via the Knuth
    multiplicative hash — the ONE definition all skew regimes share
    (zipf_sources / zipf_events / hot_sources), so a fix to the hash can
    never silently diverge between regimes (r12 review finding)."""
    import numpy as np

    offset = np.asarray(ids, dtype=np.int64) + k * ID_SPAN
    h = (offset.astype(np.uint64) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    return h.astype(np.float64) / 2.0**32


def build_replica(
    base: str,
    out: str,
    factor: int,
    salt_docs: bool | str = False,
    zipf_events: bool = False,
    zipf_sources: bool = False,
    hot_sources: bool = False,
    tpch: bool = False,
) -> None:
    """Write an Fx replica of the x-op tables into `out`; other tables are
    symlinked unchanged (the TPC-H side has its own sf ladder already).

    salt_docs modes:
    - "gap" (or True, the historical BASELINE.md regime): every inter-word
      gap gains a per-replica salt TOKEN — replicas share zero trigrams, but
      intra-replica gram entropy drops (half the grams are drawn from the
      salt-sandwich vocabulary), which collapses MinHash signatures: fine
      for corpus-growth wall-time rows, WRONG for index-cardinality growth.
    - "token": every token gains a per-replica alphanumeric SUFFIX (survives
      the [^a-z0-9 ] normalizer) — replicas share zero trigrams AND each
      replica's gram/signature structure is isomorphic to the base corpus,
      so index cardinality genuinely grows ~Fx (probe_bench uses this).

    zipf_events (r8, judge ask #4): remap every event's user_id to a
    Zipf(s=1)-distributed rank over the BASE user population instead of
    offsetting — rank = floor(n_users ** u) with u a deterministic hash of
    the replica-offset event_id, so P(rank) ~ 1/rank and the hottest user
    absorbs ~ln(2)/ln(n_users) (~9.5% at 1,500 users) of ALL events at any
    factor. Both uniform regimes keep per-key density constant; real 100 TB
    key distributions are Zipfian, and this is the regime that exposes
    hot-key pathologies in user-keyed shuffles, windows, stateful
    sessionization and stream-stream joins (AQE skew-join splitting must
    engage, not be argued).

    zipf_sources (r8 addendum): same construction over documents.source —
    rank = floor(n_sources ** u) with u hashed from the replica-offset
    doc_id, so the hottest source absorbs ~ln(2)/ln(n_sources) (~23% at the
    base corpus's 20 sources) of ALL docs. Real corpora ARE source-skewed
    (one crawl dwarfs every curated set); this is the regime for the
    source-keyed pipeline ops (per-source windows/quotas/packing). The
    src{N} naming is preserved so the band conventions stay valid.

    hot_sources (r12, judge ask #3): the CommonCrawl shape — ONE source
    (src0) absorbs 90% of all docs (deterministic per-doc hash decides),
    the rest keep their original source. Harsher than zipf_sources' ~23%
    hottest; this is the regime for source-GROUPED ledgers (t21's
    retention report) and any per-source window: if an op serializes on
    the hot source, 10x data shows it immediately."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = TABLES + (TPCH_TABLES if tpch else ())
    offset_cols = {**OFFSET_COLS, **(TPCH_OFFSET_COLS if tpch else {})}
    os.makedirs(out, exist_ok=True)
    for fn in os.listdir(base):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        dst = os.path.join(out, fn)
        if name not in tables:
            # a reused --replica-dir may carry this table in REPLICATED form
            # from a prior --tpch run — a stale Fx directory read here would
            # silently corrupt every factor measured against it
            if os.path.isdir(dst) and not os.path.islink(dst):
                shutil.rmtree(dst)
            if not os.path.exists(dst):
                os.symlink(os.path.join(base, fn), dst)
            continue
        # one part file per replica (a `documents.parquet/` DIRECTORY, which
        # spark.read.parquet accepts): Fx data must come with Fx scan
        # splits, as it does in production — a single small file would cap
        # the scan at one task and the "scale factor" would mostly measure
        # single-core throughput, not the plan (observed: map-only
        # x6_data_mix at 6.3x wall for 10x data purely from the 1-split scan)
        t = pq.read_table(os.path.join(base, fn))
        # clear stale state from a previous run into the same replica dir —
        # leftover part files (possibly higher-factor) would silently inflate
        # the replica, and a non---tpch run leaves this table as a SYMLINK
        # that makedirs would trip over
        if os.path.islink(dst):
            os.unlink(dst)
        elif os.path.isdir(dst):
            shutil.rmtree(dst)
        os.makedirs(dst, exist_ok=True)
        for k in range(factor):
            cols = []
            for col in t.schema.names:
                arr = t.column(col)
                if zipf_sources and name == "documents" and col == "source":
                    import numpy as np

                    u = _hash_u01(t.column("doc_id"), k)
                    import pyarrow.compute as pc

                    n_src = int(pc.count_distinct(t.column("source")).as_py())
                    # base n+1 so floor spans [1, n] and the -1 shift yields
                    # ranks covering EVERY source id [0, n-1] (base n capped
                    # rank at n-2, silently dropping the last source and
                    # skewing the %4 band populations)
                    rank = np.power(float(n_src) + 1.0, u).astype(np.int64)
                    rank = np.minimum(rank, n_src) - 1
                    arr = pa.array([f"src{r}" for r in rank], pa.string())
                    cols.append(arr)
                    continue
                if hot_sources and name == "documents" and col == "source":
                    import pyarrow.compute as pc

                    u = _hash_u01(t.column("doc_id"), k)
                    arr = pc.if_else(
                        pa.array(u < 0.9), pa.scalar("src0", pa.string()), arr
                    )
                    cols.append(arr)
                    continue
                if zipf_events and name == "events" and col == "user_id":
                    import numpy as np

                    # rank = floor(n^u) is log-uniform over [1, n]: Zipf s=1
                    u = _hash_u01(t.column("event_id"), k)
                    import pyarrow.compute as pc

                    n_users = int(pc.count_distinct(t.column("user_id")).as_py())
                    # base n+1 for full [0, n-1] rank coverage (see the
                    # zipf_sources note above)
                    rank = np.power(float(n_users) + 1.0, u).astype(np.int64)
                    arr = pa.array(np.minimum(rank, n_users) - 1, pa.int64())
                    cols.append(arr)
                    continue
                if col in offset_cols[name] and k > 0:
                    import pyarrow.compute as pc

                    arr = pc.add(arr, k * ID_SPAN)
                if salt_docs and name == "documents" and col == "text" and k > 0:
                    import pyarrow.compute as pc

                    if salt_docs == "token":
                        arr = pc.replace_substring(
                            arr, pattern=" ", replacement=f"s{k:03d} "
                        )
                    else:  # "gap" / True: the historical regime
                        arr = pc.replace_substring(
                            arr, pattern=" ", replacement=f" s{k:03d} "
                        )
                cols.append(arr)
            pq.write_table(
                pa.table(dict(zip(t.schema.names, cols))),
                os.path.join(dst, f"part-{k:03d}.parquet"),
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", required=True, help="comma-separated query names")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--keep", action="store_true", help="keep the replica dir")
    ap.add_argument("--replica-dir", default=None)
    ap.add_argument(
        "--salt-docs",
        action="store_true",
        help="per-replica text salt: measures corpus growth at the base "
        "duplication rate instead of F-fold per-doc duplication",
    )
    ap.add_argument(
        "--zipf-sources",
        action="store_true",
        help="Zipf(s=1) source remap for documents: the hot-source regime "
        "for source-keyed pipeline ops (see build_replica)",
    )
    ap.add_argument(
        "--hot-sources",
        action="store_true",
        help="route 90%% of docs to ONE source (src0): the CommonCrawl "
        "shape for source-grouped ledgers/windows (see build_replica)",
    )
    ap.add_argument(
        "--zipf-events",
        action="store_true",
        help="Zipf(s=1) user_id remap for events: the hot-key regime for "
        "user-keyed shuffles/windows/joins (see build_replica)",
    )
    ap.add_argument(
        "--tpch",
        action="store_true",
        help="also replicate lineitem/orders/customer/supplier with "
        "consistent join-key offsets (for the a10-a12 analytics)",
    )
    args = ap.parse_args()

    from otlp2parquet_spark.queries.registry import all_specs
    from otlp2parquet_spark.session import get_spark

    if args.zipf_sources and args.hot_sources:
        # the per-column remap branches are first-match-wins; letting both
        # through would silently produce the zipf regime labeled as hot
        raise SystemExit("--zipf-sources and --hot-sources are mutually exclusive")

    ops = [o.strip() for o in args.ops.split(",") if o.strip()]
    specs = all_specs()
    unknown = [o for o in ops if o not in specs]
    if unknown:
        raise SystemExit(f"unknown ops: {unknown}")

    replica = args.replica_dir or tempfile.mkdtemp(prefix=f"scale{args.factor}x_")
    build_replica(
        args.base,
        replica,
        args.factor,
        salt_docs=args.salt_docs,
        zipf_events=args.zipf_events,
        zipf_sources=args.zipf_sources,
        hot_sources=args.hot_sources,
        tpch=args.tpch,
    )

    # adversarial plain-replication factors make broadcast/collect stages
    # carry F^2-densified intermediates; don't let the 1g default mask the
    # measurement with a spurious maxResultSize abort
    spark = get_spark(
        app_name="otlp2parquet-scale-bench",
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs["o5_distinct"].build(spark, args.base).count()  # JVM warmup

    def timed(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            specs[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    try:
        for name in ops:
            base_s = timed(name, args.base)
            scaled_s = timed(name, replica)
            print(
                json.dumps(
                    {
                        "op": name,
                        "factor_data": args.factor,
                        "base_s": round(base_s, 2),
                        "scaled_s": round(scaled_s, 2),
                        "factor_wall": round(scaled_s / base_s, 2),
                        "load_1m": round(os.getloadavg()[0], 2),
                    }
                ),
                flush=True,
            )
    finally:
        if not args.keep and args.replica_dir is None:
            shutil.rmtree(replica, ignore_errors=True)


if __name__ == "__main__":
    main()
