from otlp2parquet_spark.queries.registry import QuerySpec, all_specs, query, REGISTRY

__all__ = ["QuerySpec", "all_specs", "query", "REGISTRY"]
