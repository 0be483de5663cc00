"""Exactly-once contract of the parity sink under task retry / speculative
execution (round-5 verdict ask #8): the deterministic `{run_tag}-{group
hash}-{chunk}` naming claims a re-executed write overwrites its own first
attempt instead of duplicating it. These tests force the double-write and
assert the file SET and the file BYTES are identical — for the batch
writer and for the foreachBatch sink's write path (write_partitioned with
run_tag=epochN, exactly what streaming/ingest._write calls per
micro-batch).

Byte-identity is the strong form: pyarrow's writer is deterministic given
the same rows in the same order, and write_group sorts its group by
Timestamp (stable, nulls last) before writing. Rows tied on Timestamp
keep shuffle arrival order, so byte-identity is guaranteed when (file,
Timestamp) orders rows — true for these fixtures and for the sink's
re-executed plan (same shuffle, same arrival order). The contract the
sink NEEDS — same file set, no duplicated rows — holds regardless of tie
order, and is asserted separately via the path set and row counts.
"""

from __future__ import annotations

import glob
import hashlib

from otlp2parquet_spark.otel import ingest, writer

FIX = "/root/reference/testdata/logs.pb"


def _decoded(spark):
    payloads = spark.createDataFrame(
        [("m.pb", bytearray(open(FIX, "rb").read()), "pb")],
        "path string, content binary, fmt string",
    )
    return ingest.decode_logs(payloads)


def _digests(out: str) -> dict[str, str]:
    return {
        f: hashlib.sha256(open(f, "rb").read()).hexdigest()
        for f in sorted(glob.glob(f"{out}/logs/**/*.parquet", recursive=True))
    }


def test_batch_writer_double_write_is_byte_identical(spark, tmp_path):
    out = str(tmp_path / "lake")
    df = _decoded(spark)
    n = df.count()
    acct1 = writer.write_partitioned(df, "otel_logs", out, run_tag="retry-tag").collect()
    first = _digests(out)
    assert len(first) == len(acct1)

    # forced re-execution of the same plan with the same tag (what a
    # speculative duplicate or retried task does)
    acct2 = writer.write_partitioned(df, "otel_logs", out, run_tag="retry-tag").collect()
    second = _digests(out)
    assert second == first  # same file set, same bytes — no duplicates
    assert sorted(map(tuple, acct1)) == sorted(map(tuple, acct2))
    assert writer.read_table(spark, out, "otel_logs").count() == n


def test_streaming_sink_epoch_replay_is_byte_identical(spark, tmp_path):
    """The foreachBatch sink's exact write call (bucket=minute,
    run_tag=epochN): a replayed micro-batch epoch must converge on the
    identical file set."""
    out = str(tmp_path / "stream-lake")
    df = _decoded(spark)
    n = df.count()
    writer.write_partitioned(
        df, "otel_logs", out, bucket="minute", run_tag="epoch42"
    ).collect()
    first = _digests(out)
    assert first

    writer.write_partitioned(
        df, "otel_logs", out, bucket="minute", run_tag="epoch42"
    ).collect()
    assert _digests(out) == first
    assert writer.read_table(spark, out, "otel_logs").count() == n

    # a DIFFERENT epoch over new data appends instead of overwriting
    writer.write_partitioned(
        df, "otel_logs", out, bucket="minute", run_tag="epoch43"
    ).collect()
    assert writer.read_table(spark, out, "otel_logs").count() == 2 * n
