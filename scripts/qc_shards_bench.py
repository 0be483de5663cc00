"""Measure the quality classifier's shard-parallelism lever (BASELINE.md r8
addendum): IPM's wall per round is ~corpus/SHARDS sequential Python, so
raising the pinned shard count is the documented production remedy for the
100x row. This times _qc_features + quality_classifier_train + qc_score at
the given factor for each shard count, on the same salted replica.

Usage: python scripts/qc_shards_bench.py [factor] [shards ...]
       (default: 100 8 64)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_bench import build_replica  # noqa: E402


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    factor = args[0] if args else 100
    shard_counts = args[1:] or [8, 64]

    from pyspark.sql import functions as F

    from otlp2parquet_spark.extensions.text import (
        _qc_features,
        qc_score,
        quality_classifier_train,
    )
    from otlp2parquet_spark.session import get_spark, load_table

    replica = tempfile.mkdtemp(prefix=f"qcshards{factor}x_")
    try:
        build_replica("/root/testdata/sf0.1", replica, factor, salt_docs="token")
        spark = get_spark(app_name="otlp2parquet-qc-shards")
        spark.sparkContext.setLogLevel("ERROR")
        docs = load_table(spark, replica, "documents").select("doc_id", "text")
        n = docs.count()  # warms the scan too
        for shards in shard_counts:
            t0 = time.perf_counter()
            feat = _qc_features(docs, shards=shards).localCheckpoint(eager=False)
            feat.count()  # force the checkpoint: tokenize+label is
            # shard-INDEPENDENT work — time it apart from the IPM rounds,
            # which are what the shard count parallelizes
            t_feat = time.perf_counter() - t0
            t0 = time.perf_counter()
            w = quality_classifier_train(
                feat.filter(F.col("doc_id") % 5 != 0), shards=shards
            )
            t_train = time.perf_counter() - t0
            t0 = time.perf_counter()
            qc_score(docs, w, feat=feat).write.format("noop").mode(
                "overwrite"
            ).save()
            t_score = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "factor": factor,
                        "docs": n,
                        "shards": shards,
                        "feat_s": round(t_feat, 2),
                        "train_s": round(t_train, 2),
                        "score_s": round(t_score, 2),
                        "nonzero_weights": sum(1 for v in w if v),
                        "load_1m": round(os.getloadavg()[0], 2),
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(replica, ignore_errors=True)


if __name__ == "__main__":
    main()
