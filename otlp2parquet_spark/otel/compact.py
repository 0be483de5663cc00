"""Small-file compaction for the parity-layout parquet sink.

The reference's (service, minute) flush policy (D16/D17) — and this repo's
streaming sink twin — trades latency for file count: steady low-volume
ingest produces one small parquet file per flush, and small files are THE
operational tax of any streaming lake (open/footer overhead per scan task,
object-store request amplification). `compact_table` rewrites each
(service, hour) partition's fragments into max_rows_per_file-sized files
and removes the fragments.

Spark-first: the rewrite IS `writer.write_partitioned` over
`writer.read_table` — one distributed pass, same golden schema/footers,
same executor-side pyarrow writes — so compaction scales exactly like the
original write. Old-file deletion is a driver-side file-op pass over the
pre-compaction listing (metadata, not data).

Crash-safety contract (documented, not transactional): new files land
first (fresh deterministic run-tag names), originals are deleted after.
A crash in between leaves BOTH generations visible — re-running
compaction converges (the duplicated rows compact again and the stale
generation is removed). Readers racing a compaction can observe
duplicates for its duration; at production scale a table format with
commit atomicity (Delta/Iceberg) is the right tool — this operator is
the layout-preserving variant for the reference's plain-parquet layout.
Reference context: src/writer/write.rs flush-per-batch file naming.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

from otlp2parquet_spark.otel import schemas, writer


def _list_parquet(root: str, table: str) -> list[str]:
    base = os.path.join(root, schemas.TABLE_PATH_SEGMENT[table])
    out: list[str] = []
    for dirpath, _dirs, files in os.walk(base):
        out.extend(
            os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
        )
    return sorted(out)


def compact_table(
    spark: SparkSession,
    root: str,
    table: str,
    *,
    bucket: str = "hour",
    max_rows_per_file: int = writer.DEFAULT_MAX_ROWS_PER_FILE,
    min_files_per_partition: int = 2,
) -> DataFrame:
    """Rewrite the table's fragment files into full-size files in place.

    Returns the new accounting frame (path, rows, service). Only
    partitions holding at least `min_files_per_partition` fragments are
    rewritten — already-compact partitions are never read, rewritten or
    deleted, so the I/O (and the crash-exposure window) is bounded by the
    fragmented subset, not the table."""
    if "://" in root:
        # the writer handles object stores, but this listing/deletion pass
        # is local-filesystem; silently "finding nothing" on s3:// would
        # masquerade as a compacted table
        raise NotImplementedError(
            "compact_table lists/deletes via the local filesystem; for "
            "object-store roots use a table format with commit atomicity"
        )
    old_files = _list_parquet(root, table)
    by_dir: dict[str, list[str]] = {}
    for f in old_files:
        by_dir.setdefault(os.path.dirname(f), []).append(f)
    frag_files = [
        f
        for files in by_dir.values()
        if len(files) >= min_files_per_partition
        for f in files
    ]
    if not frag_files:
        return spark.createDataFrame(
            [], "path string, rows long, service string"
        )
    # read ONLY the fragmented partitions' files; the (service, bucket)
    # regrouping inside write_partitioned re-derives the same partition
    # paths, so the rewrite lands exactly where the fragments were
    df = spark.read.parquet(*frag_files)
    acct = writer.write_partitioned(
        df, table, root, bucket=bucket, max_rows_per_file=max_rows_per_file
    ).collect()
    _delete(frag_files)
    return spark.createDataFrame(acct, "path string, rows long, service string")


def _delete(paths: Iterable[str]) -> None:
    for p in paths:
        try:
            os.remove(p)
        except FileNotFoundError:
            pass
