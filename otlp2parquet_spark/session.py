"""SparkSession construction with scale-oriented defaults.

Local testing runs on local[N]; the conf set here is chosen so the same code
is correct and fast on a large cluster:

- AQE on (runtime re-planning, skew-join handling, partition coalescing).
- Arrow enabled for all Python<->JVM exchange (pandas UDFs, toPandas).
- Session timezone pinned to UTC — the reference stores all timestamps as
  timestamp[us, UTC] (reference src/writer/write.rs:24) and oracle matching
  compares wall-clock values.
- shuffle.partitions kept moderate locally; on a real cluster AQE coalesces
  from a high initial number, so we only set the initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """Scale the local-mode heap to the machine: in local[N] every executor
    thread shares the ONE driver JVM heap, and at 8g the 32-thread bench
    OOMed intermittently in the partitioned parity-write stage on a 128 GiB
    box. 16g fixes that, but is hostile to small CI hosts — so size by
    physical memory and let SPARK_DRIVER_MEMORY override either way."""
    try:
        total_gib = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")) / (1 << 30)
    except (ValueError, OSError, AttributeError):
        return "8g"
    if total_gib >= 64:
        return "16g"
    if total_gib >= 16:
        return "8g"
    return "4g"


def get_spark(
    app_name: str = "otlp2parquet-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one synthetic table (see /root/repo/TESTDATA.md).

    events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    rejects (PARQUET_TYPE_ILLEGAL); read nanos as long and truncate ns -> µs
    explicitly — the same conversion the OTLP pipeline applies to *UnixNano
    fields (reference src/writer/write.rs:24), and identical to DuckDB's
    ns -> µs read behavior, so oracle comparisons agree.
    """
    from pyspark.sql import functions as F

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division: ns epoch (~1.7e18) exceeds double's 53-bit
            # mantissa, so a float `/ 1000` would corrupt microseconds
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df, multiplier: int = 1):
    """Repartition a DataFrame to cluster parallelism before CPU-heavy
    per-row work (regex sweeps, per-gram hashing, vector math).

    Small dimension files arrive as 1-3 partitions (one per parquet file /
    128 MiB split); everything downstream would then run on one core. At
    100 TB inputs are naturally wide, but an explicit spread before a
    compute-bound stage is still correct whenever the upstream stage has
    fewer partitions than cores (e.g. after a selective filter or a
    small-table scan).
    """
    target = df.sparkSession.sparkContext.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
