"""Live streaming T-group tests: a closed input drained with availableNow
must reproduce the batch recomputation exactly (SURVEY §7 hard-part 5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otlp2parquet_spark.session import load_table
from otlp2parquet_spark.streaming import pipeline as P

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events re-written with µs timestamps (streaming schema needs a plain
    TimestampType; the driver file carries TIMESTAMP(NANOS))."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).coalesce(4).write.mode("overwrite").parquet(d)
    return d


def _batch_events(spark, events_dir):
    return spark.read.schema(P.EVENTS_SCHEMA).parquet(events_dir)


def test_t1_t4_tumbling_with_watermark(spark, events_dir):
    stream = P.events_stream(spark, events_dir)
    # complete mode: every window state emits -> equals batch recomputation
    P.run_to_memory(P.tumbling_counts(stream), "t1_live", output_mode="complete")
    live = {
        (r.window_start, r.event_type): (r.n, round(r.total_value or 0, 4))
        for r in spark.sql("SELECT * FROM t1_live").collect()
    }
    batch = {
        (r.w.start, r.event_type): (r.n, round(r.total_value or 0, 4))
        for r in _batch_events(spark, events_dir)
        .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert live == batch and live


def test_t4_append_mode_withholds_open_windows(spark, events_dir):
    """T4 evidence: in append mode only windows sealed by the watermark emit;
    the tail window (watermark never advanced past it on a finite stream)
    stays open — exactly the late-data barrier semantics."""
    stream = P.events_stream(spark, events_dir)
    P.run_to_memory(P.tumbling_counts(stream), "t4_live", output_mode="append")
    emitted = {r.window_start for r in spark.sql("SELECT * FROM t4_live").collect()}
    all_windows = {
        r.w.start
        for r in _batch_events(spark, events_dir)
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert emitted and emitted < all_windows
    # everything except the unsealed tail emitted
    assert all_windows - emitted == {max(all_windows)}


def test_t2_sliding_live(spark, events_dir):
    stream = P.events_stream(spark, events_dir)
    P.run_to_memory(P.sliding_counts(stream), "t2_live", output_mode="complete")
    live = {r.window_start: r.n for r in spark.sql("SELECT * FROM t2_live").collect()}
    batch = {
        r.w.start: r.n
        for r in _batch_events(spark, events_dir)
        .groupBy(F.window("ts", "5 minutes", "1 minute").alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert live == batch and live


def test_t5_dedup_live(spark, events_dir, tmp_path):
    """Duplicate a slice of events into a second file; the stream keeps
    exactly one row per event_id."""
    import shutil

    dup_dir = tmp_path / "dup"
    shutil.copytree(events_dir, dup_dir)
    base = _batch_events(spark, events_dir)
    base.limit(100).write.mode("append").parquet(str(dup_dir))
    stream = P.events_stream(spark, str(dup_dir))
    P.run_to_memory(P.dedup_events(stream), "t5_live")
    n = spark.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM t5_live").collect()[0]
    assert n.c == n.n == base.count()


def test_t6_stateful_running_count(spark, events_dir):
    """applyInPandasWithState totals == batch groupBy totals on a closed
    stream (final update per user wins)."""
    stream = P.events_stream(spark, events_dir)
    P.run_to_memory(P.running_count(stream), "t6_live", output_mode="update")
    # multiple micro-batches may emit interim rows per user; the last is final
    live_df = spark.sql("SELECT * FROM t6_live")
    # availableNow over one closed dir -> single micro-batch here, so rows are final
    live = {r.user_id: (r.n_events, round(r.total_value, 4)) for r in live_df.collect()}
    batch = {
        r.user_id: (r.n, round(r.total, 4))
        for r in _batch_events(spark, events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("total"))
        .collect()
    }
    assert live == batch and len(live) > 10


def test_t8_stream_stream_join_live(spark, events_dir):
    """T8 live: the stream-stream interval join over a closed input must
    reproduce the batch twin's pair set exactly (inner join in append mode
    emits every sealed match; a generous watermark on a finite drain seals
    everything that can pair)."""
    stream = P.events_stream(spark, events_dir)
    P.run_to_memory(P.attribution_join(stream), "t8_live", output_mode="append")
    live = {
        (r.user_id, r.view_id, r.purchase_id, r.delay_s)
        for r in spark.sql("SELECT * FROM t8_live").collect()
    }
    e = _batch_events(spark, events_dir)
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    batch = {
        (r.v_user, r.view_id, r.purchase_id, r.delay_s)
        for r in v.join(
            p,
            F.expr(
                "v_user = p_user AND p_ts >= v_ts "
                "AND p_ts <= v_ts + interval 10 minutes"
            ),
        )
        .select(
            "v_user",
            "view_id",
            "purchase_id",
            F.expr("(unix_micros(p_ts) - unix_micros(v_ts)) div 1000000").alias(
                "delay_s"
            ),
        )
        .collect()
    }
    assert live == batch and live


def test_t9_stream_static_join_live(spark, events_dir):
    """T9 live: static-dim enrichment of the stream must reproduce the
    batch join exactly over a closed input."""
    dim = load_table(spark, SF, "customer")
    stream = P.events_stream(spark, events_dir)
    P.run_to_memory(P.enrich_events(stream, dim), "t9_live", output_mode="append")
    live = {
        (r.event_id, r.segment, r.nation)
        for r in spark.sql("SELECT * FROM t9_live").collect()
    }
    e = _batch_events(spark, events_dir)
    batch = {
        (r.event_id, r.segment, r.nation)
        for r in P.enrich_events(e, dim).collect()
    }
    assert live == batch and live


def test_t16_exp_p95_live_matches_batch_twin(spark, events_dir):
    """T16: the live bucket sketch drained complete + the shared read-side
    walk must equal the batch twin exactly (same walk over the same
    mergeable bucket counts — the identity IS the gate)."""
    stream = P.events_stream(spark, events_dir)
    P.run_to_memory(P.exp_hist_buckets(stream), "t16_live", output_mode="complete")
    live = {
        (r.window_start, r.event_type): (r.zero_count, r.total, r.p95_upper_bound)
        for r in P.exp_p95_from_buckets(spark.sql("SELECT * FROM t16_live")).collect()
    }
    # watermark=None: the same single sketch definition the twin uses
    batch_buckets = P.exp_hist_buckets(_batch_events(spark, events_dir), watermark=None)
    batch = {
        (r.window_start, r.event_type): (r.zero_count, r.total, r.p95_upper_bound)
        for r in P.exp_p95_from_buckets(batch_buckets).collect()
    }
    assert live == batch and live


def test_t16_append_mode_seals_windows_like_t4(spark, events_dir):
    """T16 watermark evidence: append mode emits only sealed windows; every
    sealed window's walk equals the batch twin's row for that window."""
    stream = P.events_stream(spark, events_dir)
    P.run_to_memory(P.exp_hist_buckets(stream), "t16_append", output_mode="append")
    sealed = P.exp_p95_from_buckets(spark.sql("SELECT * FROM t16_append"))
    live = {
        (r.window_start, r.event_type): (r.zero_count, r.total, r.p95_upper_bound)
        for r in sealed.collect()
    }
    assert live
    from otlp2parquet_spark.queries.registry import all_specs
    batch = {
        (r.window_start, r.event_type): (r.zero_count, r.total, r.p95_upper_bound)
        for r in all_specs()["t16_windowed_exp_p95"].build(spark, SF).collect()
        # the fixture re-writes ts to µs, so window keys align with the twin
    }
    open_windows = set(batch) - set(live)
    assert set(live) <= set(batch)
    # only the unsealed tail window(s) are withheld
    assert open_windows and max(k[0] for k in batch) in {k[0] for k in open_windows}
    for k, v in live.items():
        assert batch[k] == v, k


def test_t16_null_values_fold_into_zero_bucket(spark, tmp_path):
    """r9 review finding, pinned: a NULL value must ride the sentinel zero
    bucket in BOTH engines — a NULL bucket key would sort NULLS FIRST in
    Spark's cumulative rank walk but NULLS LAST in DuckDB's, putting the
    p95 threshold crossing at different buckets (no fixture carries NULLs,
    so only this crafted frame exercises the fold)."""
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from otlp2parquet_spark.queries.registry import all_specs
    from tests.oracle_util import compare

    ts = datetime.datetime(2024, 1, 1, 0, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array([ts] * 6, pa.timestamp("us")),
            "user_id": pa.array([1] * 6, pa.int64()),
            "event_type": ["a"] * 6,
            "value": pa.array([None, 0.5, 3.0, 9.0, 80.0, 700.0], pa.float64()),
            "props": ["{}"] * 6,
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    spec = all_specs()["t16_windowed_exp_p95"]
    assert not compare(spec.build(spark, str(tmp_path)), con, spec.oracle)
    row = spec.build(spark, str(tmp_path)).collect()[0]
    assert row["zero_count"] == 2 and row["total"] == 6


def test_t19_hll_live_matches_batch_twin(spark, events_dir):
    """T19: the live register sketch drained complete + the shared read-side
    estimator must equal the batch twin exactly — registers are md5-derived
    integers and the estimator's register sum is exact integer arithmetic,
    so the identity is bit-level, not tolerance."""
    stream = P.events_stream(spark, events_dir)
    P.run_to_memory(P.hll_reg_buckets(stream), "t19_live", output_mode="complete")
    live = {
        (r.window_start, r.event_type): r.n_approx
        for r in P.hll_estimate_from_registers(
            spark.sql("SELECT * FROM t19_live")
        ).collect()
    }
    batch_regs = P.hll_reg_buckets(_batch_events(spark, events_dir), watermark=None)
    batch = {
        (r.window_start, r.event_type): r.n_approx
        for r in P.hll_estimate_from_registers(batch_regs).collect()
    }
    assert live == batch and live


def test_t19_append_mode_seals_windows(spark, events_dir):
    """Append mode emits only watermark-sealed register rows; every sealed
    window's estimate equals the batch twin's row for that window."""
    from otlp2parquet_spark.queries.registry import all_specs

    stream = P.events_stream(spark, events_dir)
    P.run_to_memory(P.hll_reg_buckets(stream), "t19_append", output_mode="append")
    live = {
        (r.window_start, r.event_type): r.n_approx
        for r in P.hll_estimate_from_registers(
            spark.sql("SELECT * FROM t19_append")
        ).collect()
    }
    assert live
    batch = {
        (r.window_start, r.event_type): r.n_approx
        for r in all_specs()["t19_windowed_hll_distinct"].build(spark, SF).collect()
    }
    open_windows = set(batch) - set(live)
    assert set(live) <= set(batch)
    assert open_windows and max(k[0] for k in batch) in {k[0] for k in open_windows}
    for k, v in live.items():
        assert batch[k] == v, k


def test_t19_estimate_error_gated_vs_exact(spark, events_dir):
    """The deterministic HLL's estimates track exact per-window distinct
    counts within 3x the theoretical rsd (1.04/sqrt(256) ~ 6.5%) on
    average, and every window stays within a generous per-window band —
    the a8 error-gate discipline applied to the hand-rolled sketch."""
    from pyspark.sql import functions as F

    e = _batch_events(spark, events_dir)
    exact = {
        (r.window_start, r.event_type): r.n_exact
        for r in e.groupBy(
            F.window("ts", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("n_exact"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_exact"
        )
        .collect()
    }
    approx = {
        (r.window_start, r.event_type): r.n_approx
        for r in P.hll_estimate_from_registers(
            P.hll_reg_buckets(e, watermark=None)
        ).collect()
    }
    assert set(exact) == set(approx)
    rels = []
    for k, n in exact.items():
        rel = abs(approx[k] - n) / n
        rels.append(rel)
        assert rel <= 0.35, (k, n, approx[k])  # generous per-window band
    assert sum(rels) / len(rels) <= 3 * 1.04 / 16.0  # mean within 3x rsd


def test_t19_raw_branch_matches_duckdb_at_high_cardinality(spark, tmp_path):
    """r10 review finding, pinned: the HLL alpha constant must be ONE
    Python double (F.expr would parse the literal as DECIMAL, diverging
    from DuckDB's DOUBLE evaluation by 3.7e-9 — enough to flip ~2.4% of
    raw-branch 4-dp quantizations). No fixture window exceeds 640 distinct
    users, so every fixture row takes the alpha-free linear-count branch;
    this crafted frame (3,000 distinct users in one window) forces the RAW
    branch in both engines and requires bit-equality. Also pins the NULL
    rule: null user_id rows are not distinct users."""
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from otlp2parquet_spark.queries.registry import all_specs

    ts0 = datetime.datetime(2024, 1, 1, 0, 1, 0)
    n = 3000
    tbl = pa.table(
        {
            "event_id": pa.array(range(n + 5), pa.int64()),
            "ts": pa.array([ts0] * (n + 5), pa.timestamp("us")),
            "user_id": pa.array(
                list(range(n)) + [None] * 5, pa.int64()
            ),
            "event_type": ["click"] * (n + 5),
            "value": pa.array([1.0] * (n + 5), pa.float64()),
            "props": [""] * (n + 5),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    spec = all_specs()["t19_windowed_hll_distinct"]
    got = spec.build(spark, str(tmp_path)).collect()
    assert len(got) == 1
    est = got[0].n_approx
    # raw branch engaged (estimate far above the 640 correction cutoff)
    # and within the HLL error envelope of the true 3,000
    assert est > 640.0 and abs(est - n) / n < 0.25, est
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.execute(spec.oracle).fetchall()
    assert len(want) == 1 and float(want[0][-1]) == est, (want, est)


def test_t19_rollup_merge_equals_direct_and_tracks_exact(spark):
    """t19_hll_rollup's merge of the per-WINDOW register table must equal
    the estimate computed from a direct per-type register build (MAX is
    associative: merge of per-window MAXes == global MAX — the
    mergeability identity, bit-level), and the estimate must track the
    exact per-type distinct-user count within the standard HLL error
    (rsd 1.04/sqrt(256) ~ 6.5%; gate at 4 sigma)."""
    from pyspark.sql import functions as F

    from otlp2parquet_spark.queries.registry import all_specs
    from otlp2parquet_spark.session import load_table

    e = load_table(spark, SF, "events")
    rolled = {
        r.event_type: r.n_approx
        for r in all_specs()["t19_hll_rollup"].build(spark, SF).collect()
    }
    direct = {
        r.event_type: r.n_approx
        for r in P.hll_estimate_from_registers(
            P.hll_reg_buckets(e, watermark=None), keys=("event_type",)
        ).collect()
    }
    assert rolled == direct and rolled
    exact = {
        r.event_type: r.n
        for r in e.filter(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rolled) == set(exact)
    for et, est in rolled.items():
        assert abs(est - exact[et]) <= 4 * 0.065 * exact[et], (et, est, exact[et])
