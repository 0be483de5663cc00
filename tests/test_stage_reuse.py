"""Runtime stage-reuse gates for the r13 barrier removals.

Four queries dropped a `localCheckpoint(eager=False)` materialization
barrier in r13 (x2_minhash_lsh, x6_epoch_shuffle, x6_source_overlap,
x4_perplexity_buckets) on the argument that their multi-consumer branch
points sit ABOVE an Exchange and every consumer prunes the SAME columns, so
the exchanges stay canonically equal, AQE deduplicates the shared subtree
at runtime, and the barrier bought nothing except an eager build-time stage
materialization (serial driver jobs) and a corpus-sized RDD pin.
(x6_dedup_funnel keeps its barrier: its two flag consumers prune different
column sets, the pruned exchanges stop being equal, and reuse does not
fire — measured 3 corpus scans without the checkpoint.)

The static plan cannot show this (it prints the shared subtree once per
branch — the duplicate-scan audit allowlists these five for exactly that
reason), so this suite EXECUTES each query and inspects the final adaptive
plan: if the shuffle stages were genuinely reused, the duplicated branch
collapses to `ReusedExchange` leaves and the documents table is scanned by
exactly the number of GENUINE roles the query has (one, for all five).
A regression that breaks reuse (e.g. a branch point slipping below the
exchange, or a non-deterministic expression blocking stage canonicalization)
would re-execute the corpus pass per branch and double the scan count here.
"""

from __future__ import annotations

import re

import pytest

from otlp2parquet_spark.queries.registry import all_specs

SF_SMOKE = "/root/testdata/sf0.001"

# query -> max executed parquet scans of `documents` in the FINAL plan
# (= the number of genuine corpus roles; every duplicate branch must have
# collapsed into a ReusedExchange)
_EXPECTED = {
    "x2_minhash_lsh": 1,
    "x6_epoch_shuffle": 1,
    # 2 genuine roles: the (source, text) gram pass and the source-only
    # pruned scan under the distinct-source index frame (r13 — replaced
    # the per-build driver collect); its three broadcast consumers must
    # still share ONE distinct aggregate via ReusedExchange
    "x6_source_overlap": 2,
    "x4_perplexity_buckets": 1,
}


@pytest.mark.parametrize("name", sorted(_EXPECTED))
def test_shared_subtree_reused_at_runtime(spark, name):
    df = all_specs()[name].build(spark, SF_SMOKE)
    df.collect()  # smoke SF: forces the df's own execution to its final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # AdaptiveSparkPlan.toString appends the pre-execution "Initial Plan"
    # (which prints the shared subtree once per branch); only the final
    # section above it shows what actually executed
    plan = plan.split("== Initial Plan ==")[0]
    scans = len(re.findall(r"Scan parquet[^\n]*documents", plan))
    assert scans <= _EXPECTED[name], (
        f"{name}: {scans} executed documents scans in the final plan "
        f"(expected <= {_EXPECTED[name]}) — a multi-consumer branch stopped "
        "reusing its shared exchange; the corpus pass now re-executes per "
        "branch (the regression the removed localCheckpoint used to mask)"
    )
    assert "ReusedExchange" in plan, (
        f"{name}: no ReusedExchange in the final plan — the multi-consumer "
        "branch shape this test pins has changed; re-verify stage reuse "
        "and update the expectation"
    )
