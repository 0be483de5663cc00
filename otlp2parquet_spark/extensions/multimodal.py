"""Multimodal column handling (SURVEY §2.3 X5): image/audio/video payloads as
opaque binary columns with typed metadata, plus the decode/feature-extract
plumbing as Arrow-batched mapInPandas stages.

The container ships no image/audio codecs, so the decode kernel is a
clearly-marked deterministic stub (STUB_DECODER) — the Spark-side contract
(schemas, partitioning, batch iteration, UDF signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from otlp2parquet_spark.queries.registry import T, query
from otlp2parquet_spark.session import spread

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField("byte_len", LongType(), True),
        StructField("content_sha256", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("feature_hash", StringType(), True),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the opaque-binary media table from documents.text — at
    production scale this is `spark.read.format('binaryFile')` over an object
    store plus a sidecar metadata table; the column shapes are identical."""
    d = spread(T(spark, sf_dir, "documents"))
    payload = F.col("text").cast("binary")
    return d.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("content_sha256"),
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    The per-batch kernel is where PIL/ffmpeg/torchaudio would run; here it is
    a deterministic stub deriving fake dimensions from the payload hash. The
    mapInPandas plumbing (schema contract, batch shape, memory profile) is the
    production dataflow.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "width": [],
                "height": [],
                "n_frames": [],
                "feature_hash": [],
            }
            for payload in pdf["payload"]:
                # STUB_DECODER: real decode (PIL.Image.open / av.open /
                # soundfile.read) is unavailable in this container; derive
                # deterministic fake dims from the content hash instead.
                h = hashlib.sha256(bytes(payload or b"")).digest()
                out["width"].append(64 + h[0] % 192)
                out["height"].append(64 + h[1] % 192)
                out["n_frames"].append(1 + h[2] % 32)
                out["feature_hash"].append(h.hex()[:16])
            yield pd.DataFrame(out)

    cols = ["media_id", "media_type", "payload"]
    return media.select(*cols).mapInPandas(kernel, schema=FEATURE_SCHEMA)


@query(
    "x5_binary_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           sha256(text) AS content_sha256
    FROM documents
    ORDER BY media_id
    """,
    tags=("X5", "F6"),
)
def x5_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads — length/hash/type columns;
    everything JVM-side."""
    return media_table(spark, sf_dir).select(
        "media_id", "media_type", "byte_len", "content_sha256"
    ).orderBy("media_id")


@query(
    "x5_decode_features",
    oracle=None,  # decode stub: schema/plumbing validated in tests
    tags=("X5", "U4"),
)
def x5_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extraction pipeline over binary media columns via
    Arrow-batched mapInPandas (stubbed kernel, real dataflow)."""
    return decode_features(media_table(spark, sf_dir)).orderBy("media_id")
