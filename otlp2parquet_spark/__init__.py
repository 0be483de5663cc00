"""otlp2parquet_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of smithclay/otlp2parquet (reference snapshot at
/root/reference, v0.12.0).

The reference is an OTLP -> Parquet ingestion engine (Rust); its query surface
is delegated to external Parquet readers (reference docs/querying.md). This
package re-expresses the whole system Spark-first:

- ``otlp``      : OTLP payload decode (protobuf / JSON / JSONL) -> the seven
                  fixed ClickHouse-compatible schemas (reference src/codec.rs,
                  external crate otlp2records), as Arrow-vectorized transforms.
- ``writer``    : partitioned Snappy-Parquet sink with the reference's path
                  layout (reference src/writer/write.rs:71-165).
- ``queries``   : the full declared relational query surface (SURVEY.md §2.2 /
                  §2.3) as DataFrame builders with DuckDB oracle twins.
- ``extensions``: LLM-data-pipeline operators — dedup (exact / near-dup /
                  MinHash-LSH / SimHash), similarity search over embeddings,
                  text analysis, multimodal binary columns.
- ``streaming`` : Structured Streaming re-expression of the reference's
                  batching/flush dataflow (reference src/batch/mod.rs).
"""

__version__ = "0.1.0"
