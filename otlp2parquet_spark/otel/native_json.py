"""Pure-Catalyst OTLP/JSON logs decode — the JSONL fast path (SURVEY §7
hard-part 7: "consider the JSONL fast path via native from_json … no Python
needed").

The general codec (otlp_json.py + flatten.py via mapInArrow) handles every
OTLP shape at ~14k rows/s/core of Python. This module decodes the HOT shape —
log records whose attribute/body values are scalars (string/int/double/bool),
which is the overwhelming share of real log traffic — entirely with Spark
built-ins: `from_json` -> `explode` -> higher-order functions. Whole-stage
codegen applies; no Python worker, no Arrow transfer.

`decode_logs_json_auto` routes each line: payloads containing nested
attribute values (`arrayValue`/`kvlistValue`/`bytesValue`) or other
fast-path-unsupported constructs fall back to the general codec, and the two
outputs union. Routing is textual-contains — conservative (false positives
only cost speed, never correctness).

Canonical-encoding parity (verified against the Python codec cell-by-cell in
tests):
- attr maps: keys sorted via `array_sort` on (key, …) structs, values typed;
  JSON string escaping borrowed from Spark's own `to_json` (wrap one value in
  a struct, strip the envelope) so escapes match serde_json;
- ints stay JSON integers; doubles are formatted `{int}.0` when integral
  (serde_json style) else Spark's shortest-repr cast;
- service.name/namespace/instance.id promoted and removed (§1.3.6);
- ids: base64 or hex -> 16/8-byte binary, zero-filled when absent;
- enum strings (SEVERITY_NUMBER_*) -> ints, numeric passthrough;
- ns -> µs integer division, epoch-0 defaults.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from otlp2parquet_spark.otel import schemas
from otlp2parquet_spark.otel.otlp_json import SEVERITY_NUMBER

# from_json schema for the scalar-attrs log shape (camelCase, protobuf-JSON).
# int64 fields are StringType: protobuf-JSON renders them as strings, and
# from_json would null-out a quoted number under LongType.
_ANYVALUE_SCALAR = StructType(
    [
        StructField("stringValue", StringType()),
        StructField("boolValue", BooleanType()),
        StructField("intValue", StringType()),
        StructField("doubleValue", DoubleType()),
    ]
)
_KV = StructType([StructField("key", StringType()), StructField("value", _ANYVALUE_SCALAR)])
_SCOPE = StructType(
    [
        StructField("name", StringType()),
        StructField("version", StringType()),
        StructField("attributes", ArrayType(_KV)),
    ]
)
_LOG_RECORD = StructType(
    [
        StructField("timeUnixNano", StringType()),
        StructField("observedTimeUnixNano", StringType()),
        StructField("severityNumber", StringType()),
        StructField("severityText", StringType()),
        StructField("body", _ANYVALUE_SCALAR),
        StructField("attributes", ArrayType(_KV)),
        StructField("flags", LongType()),
        StructField("traceId", StringType()),
        StructField("spanId", StringType()),
    ]
)
LOGS_REQUEST_SCHEMA = StructType(
    [
        StructField(
            "resourceLogs",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "resource",
                            StructType([StructField("attributes", ArrayType(_KV))]),
                        ),
                        StructField(
                            "scopeLogs",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("scope", _SCOPE),
                                        StructField("logRecords", ArrayType(_LOG_RECORD)),
                                        StructField("schemaUrl", StringType()),
                                    ]
                                )
                            ),
                        ),
                        StructField("schemaUrl", StringType()),
                    ]
                )
            ),
        )
    ]
)

# textual markers that force the general-codec path (nested/bytes values,
# snake_case payloads the native schema doesn't parse)
FALLBACK_MARKERS = (
    # \u00XX escapes (control chars must be escaped in JSON source): Jackson
    # re-emits them uppercase, Python/serde lowercase — general codec decides
    "\\u00",
    "\\U00",
    '"arrayValue"',
    '"kvlistValue"',
    '"bytesValue"',
    # doubles route to the general codec: Python/serde shortest-repr float
    # formatting (incl. -0.0 and the >=1e16 exponent switch) is not
    # reproducible with Spark casts, and canonical-JSON parity beats speed
    '"doubleValue"',
    '"double_value"',
    '"array_value"',
    '"kvlist_value"',
    '"bytes_value"',
    "resource_logs",
    "scope_logs",
    "log_records",
    "time_unix_nano",
)


def _json_escape(s: Column) -> Column:
    """JSON-encode one string. Fast path: strings without quote/backslash/
    control chars (the vast majority of attribute keys and values) wrap in
    quotes directly; everything else goes through Spark's own JSON writer
    (to_json a 1-field struct, strip the `{"a":` envelope) so escape
    sequences match Jackson/serde exactly."""
    j = F.to_json(F.struct(s.alias("a")))
    slow = F.substring(j, 6, F.length(j) - F.lit(6))
    clean = ~s.rlike('[\\x00-\\x1f"\\\\]')
    return F.when(clean, F.concat(F.lit('"'), s, F.lit('"'))).otherwise(slow)


def _encode_scalar_value(v: Column) -> Column:
    """AnyValue(scalar) -> its canonical JSON value text (§1.3.5/§1.3.4)."""
    dv = v.getField("doubleValue")
    return (
        F.when(v.getField("stringValue").isNotNull(), _json_escape(v.getField("stringValue")))
        .when(v.getField("boolValue").isNotNull(), v.getField("boolValue").cast("string"))
        .when(v.getField("intValue").isNotNull(), v.getField("intValue").cast("long").cast("string"))
        .when(
            dv.isNotNull(),
            # serde_json prints integral doubles as "N.0"; Spark's cast gives
            # scientific notation for big values, so build it explicitly
            F.when(
                (dv == F.floor(dv)) & ~((dv == 0) & (F.lit(1.0) / dv < 0)),
                F.concat(dv.cast("long").cast("string"), F.lit(".0")),
            ).otherwise(dv.cast("string")),
        )
        .otherwise(F.lit("null"))
    )


def _attrs_to_json(attrs: Column, drop_keys: tuple[str, ...] = ()) -> Column:
    """KeyValue array -> canonical sorted-key JSON object string."""
    kept = attrs
    if drop_keys:
        drop_lit = F.array(*[F.lit(k) for k in drop_keys])
        kept = F.filter(attrs, lambda a: ~F.array_contains(drop_lit, a.getField("key")))
    # array_sort on (key, …) structs sorts by key (unique per OTLP spec)
    entries = F.array_sort(
        F.transform(
            kept,
            lambda a: F.struct(
                a.getField("key").alias("k"),
                F.concat(
                    _json_escape(a.getField("key")),
                    F.lit(":"),
                    _encode_scalar_value(a.getField("value")),
                ).alias("e"),
            ),
        )
    )
    body = F.array_join(F.transform(entries, lambda s: s.getField("e")), ",")
    return F.when(attrs.isNull() | (F.size(attrs) == 0), F.lit("{}")).otherwise(
        F.concat(F.lit("{"), body, F.lit("}"))
    )


def _attr_lookup(attrs: Column, key: str) -> Column:
    hit = F.filter(attrs, lambda a: a.getField("key") == key)
    return F.try_element_at(hit, F.lit(1)).getField("value").getField("stringValue")


_HEX16 = "^[0-9a-fA-F]{32}$"
_HEX8 = "^[0-9a-fA-F]{16}$"


def _decode_id(col: Column, nbytes: int) -> Column:
    """base64-or-hex id -> fixed-width binary, zero-filled when absent.
    Malformed ids raise via the length assertion (hard-error parity)."""
    hex_re = _HEX16 if nbytes == 16 else _HEX8
    raw = (
        F.when(col.isNull() | (col == ""), F.lit(b"\x00" * nbytes))
        .when(col.rlike(hex_re), F.to_binary(F.lower(col), F.lit("hex")))
        .otherwise(F.to_binary(col, F.lit("base64")))
    )
    ok = F.length(raw) == nbytes
    return F.when(
        F.assert_true(ok, F.concat(F.lit("invalid id encoding: "), col)).isNull(), raw
    )


def _sev_map() -> Column:
    # built lazily: F.lit at module import would require an active SparkContext
    return F.create_map(*[F.lit(x) for kv in SEVERITY_NUMBER.items() for x in kv])


def _severity_to_int(col: Column) -> Column:
    num = F.when(col.rlike("^-?[0-9]+$"), col.cast("int"))
    named = F.try_element_at(_sev_map(), col)
    ok = col.isNull() | num.isNotNull() | named.isNotNull()
    checked = F.assert_true(ok, F.concat(F.lit("unknown severity enum: "), col))
    return F.when(checked.isNull(), F.coalesce(num, named, F.lit(0)))


def _cast_to_raw(df: DataFrame, table: str) -> DataFrame:
    """Project to the raw-schema column order/types. Array columns keep their
    element type uncast: Spark refuses nullability-only array casts, and the
    downstream union/finalize accepts the relaxed containsNull."""
    from pyspark.sql.types import ArrayType as _AT

    cols = []
    for f in schemas.raw_spark_schema(table).fields:
        c = F.col(f.name)
        cols.append((c if isinstance(f.dataType, _AT) else c.cast(f.dataType)).alias(f.name))
    return df.select(*cols)


def decode_logs_json_native(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """One OTLP/JSON logs export request per row -> raw otel_logs frame
    (same column set/types as the Python codec's raw output).

    Malformed JSON hard-errors via assert_true (parity with the general
    codec's OtlpDecodeError -> task failure).
    """
    parsed = lines.select(
        F.from_json(F.col(line_col), LOGS_REQUEST_SCHEMA, {"mode": "FAILFAST"}).alias("req")
    )
    rl = parsed.select(F.explode("req.resourceLogs").alias("rl"))
    sl = rl.select(
        F.col("rl.resource.attributes").alias("rattrs"),
        F.col("rl.schemaUrl").alias("res_schema"),
        F.explode("rl.scopeLogs").alias("sl"),
    )
    rec = sl.select(
        "rattrs",
        "res_schema",
        F.col("sl.scope").alias("scope"),
        F.col("sl.schemaUrl").alias("scope_schema"),
        F.explode("sl.logRecords").alias("r"),
    )

    ts_us = F.expr("CAST(coalesce(CAST(r.timeUnixNano AS LONG), 0L) div 1000 AS LONG)")
    obs_us = F.expr("CAST(coalesce(CAST(r.observedTimeUnixNano AS LONG), 0L) div 1000 AS LONG)")
    svc = _attr_lookup(F.col("rattrs"), "service.name")
    body_v = F.col("r.body")
    body_json = F.when(
        body_v.isNotNull()
        & (
            body_v.getField("stringValue").isNotNull()
            | body_v.getField("boolValue").isNotNull()
            | body_v.getField("intValue").isNotNull()
            | body_v.getField("doubleValue").isNotNull()
        ),
        _encode_scalar_value(body_v),
    )

    out = rec.select(
        ts_us.alias("Timestamp"),
        _decode_id(F.col("r.traceId"), 16).alias("TraceId"),
        _decode_id(F.col("r.spanId"), 8).alias("SpanId"),
        F.coalesce(svc, F.lit("")).alias("ServiceName"),
        _attr_lookup(F.col("rattrs"), "service.namespace").alias("ServiceNamespace"),
        _attr_lookup(F.col("rattrs"), "service.instance.id").alias("ServiceInstanceId"),
        _attrs_to_json(
            F.col("rattrs"), ("service.name", "service.namespace", "service.instance.id")
        ).alias("ResourceAttributes"),
        F.nullif(F.col("res_schema"), F.lit("")).alias("ResourceSchemaUrl"),
        F.coalesce(F.col("scope.name"), F.lit("")).alias("ScopeName"),
        F.nullif(F.col("scope.version"), F.lit("")).alias("ScopeVersion"),
        _attrs_to_json(F.col("scope.attributes")).alias("ScopeAttributes"),
        F.nullif(F.col("scope_schema"), F.lit("")).alias("ScopeSchemaUrl"),
        ts_us.alias("TimestampTime"),
        obs_us.alias("ObservedTimestamp"),
        F.coalesce(F.col("r.flags"), F.lit(0)).alias("TraceFlags"),
        F.coalesce(F.col("r.severityText"), F.lit("")).alias("SeverityText"),
        _severity_to_int(F.col("r.severityNumber")).alias("SeverityNumber"),
        body_json.alias("Body"),
        _attrs_to_json(F.col("r.attributes")).alias("LogAttributes"),
    )
    return _cast_to_raw(out, "otel_logs")


# intValue with >=19 digits may overflow int64: Catalyst's long cast would
# null it out and array_join would silently DROP the attribute, while the
# Python codec emits the arbitrary-precision integer (ADVICE r1). Route such
# lines to the general codec. (19 digits is conservative — int64 max is
# 9223372036854775807 — so some in-range values also take the slow lane.)
_BIG_INT_RE = '"intValue"\\s*:\\s*"?-?[0-9]{19}'


def _risky_int(line: Column) -> Column:
    return line.rlike(_BIG_INT_RE)


def needs_fallback(line: Column) -> Column:
    """True when a payload uses shapes outside the native fast path."""
    cond = _risky_int(line)
    for marker in FALLBACK_MARKERS:
        cond = cond | line.contains(marker)
    return cond


def decode_logs_json_auto(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Route each JSONL line: hot scalar shape -> Catalyst decode; anything
    nested/snake_case -> the general Python codec. Union of the two is the
    complete, canonical decode (finalized to golden types)."""
    from otlp2parquet_spark.otel import ingest

    simple = lines.filter(~needs_fallback(F.col(line_col)))
    complex_ = lines.filter(needs_fallback(F.col(line_col)))
    native_raw = decode_logs_json_native(simple, line_col)
    py_payloads = complex_.select(
        F.lit("").alias("path"),
        F.encode(F.col(line_col), "UTF-8").alias("content"),
        F.lit("json").alias("fmt"),
    )
    py_raw = py_payloads.mapInArrow(
        ingest._decode_simple("logs", "otel_logs", "raise"),
        schemas.raw_spark_schema("otel_logs"),
    )
    return ingest.finalize(native_raw.unionAll(py_raw), "otel_logs")


# ---------------------------------------------------------------------------
# Traces fast path (same design; metrics stay on the general codec — OTLP/JSON
# metric traffic is rare and the 5-way oneof routing buys little)

_SPAN_EVENT = StructType(
    [
        StructField("timeUnixNano", StringType()),
        StructField("name", StringType()),
        StructField("attributes", ArrayType(_KV)),
    ]
)
_SPAN_LINK = StructType(
    [
        StructField("traceId", StringType()),
        StructField("spanId", StringType()),
        StructField("traceState", StringType()),
        StructField("attributes", ArrayType(_KV)),
    ]
)
_SPAN = StructType(
    [
        StructField("traceId", StringType()),
        StructField("spanId", StringType()),
        StructField("traceState", StringType()),
        StructField("parentSpanId", StringType()),
        StructField("name", StringType()),
        StructField("kind", StringType()),
        StructField("startTimeUnixNano", StringType()),
        StructField("endTimeUnixNano", StringType()),
        StructField("attributes", ArrayType(_KV)),
        StructField("events", ArrayType(_SPAN_EVENT)),
        StructField("links", ArrayType(_SPAN_LINK)),
        StructField(
            "status",
            StructType([StructField("message", StringType()), StructField("code", StringType())]),
        ),
    ]
)
TRACES_REQUEST_SCHEMA = StructType(
    [
        StructField(
            "resourceSpans",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "resource",
                            StructType([StructField("attributes", ArrayType(_KV))]),
                        ),
                        StructField(
                            "scopeSpans",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("scope", _SCOPE),
                                        StructField("spans", ArrayType(_SPAN)),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

TRACES_FALLBACK_MARKERS = (
    # \u00XX escapes (control chars must be escaped in JSON source): Jackson
    # re-emits them uppercase, Python/serde lowercase — general codec decides
    "\\u00",
    "\\U00",
    '"arrayValue"',
    '"kvlistValue"',
    '"bytesValue"',
    '"doubleValue"',
    '"double_value"',
    # doubles route to the general codec: Python/serde shortest-repr float
    # formatting (incl. -0.0 and the >=1e16 exponent switch) is not
    # reproducible with Spark casts, and canonical-JSON parity beats speed
    '"doubleValue"',
    '"double_value"',
    '"array_value"',
    '"kvlist_value"',
    '"bytes_value"',
    "resource_spans",
    "scope_spans",
    "trace_id",
    "start_time_unix_nano",
)

_SPAN_KIND_NAMES = {
    0: "SPAN_KIND_UNSPECIFIED",
    1: "SPAN_KIND_INTERNAL",
    2: "SPAN_KIND_SERVER",
    3: "SPAN_KIND_CLIENT",
    4: "SPAN_KIND_PRODUCER",
    5: "SPAN_KIND_CONSUMER",
}
_STATUS_NAMES = {0: "STATUS_CODE_UNSET", 1: "STATUS_CODE_OK", 2: "STATUS_CODE_ERROR"}


def _enum_to_name(col: Column, names: dict[int, str], variants: dict[str, int], what: str) -> Column:
    """Numeric or variant-string enum -> canonical variant name; unknown
    values hard-error (reference invalid-corpus semantics)."""
    as_num = F.when(col.rlike("^[0-9]+$"), col.cast("int"))
    num_map = F.create_map(*[F.lit(x) for kv in names.items() for x in kv])
    str_map = F.create_map(*[F.lit(x) for kv in variants.items() for x in kv])
    name = F.coalesce(
        F.try_element_at(num_map, as_num),
        F.when(F.try_element_at(str_map, col).isNotNull(), col),
        F.when(col.isNull(), F.lit(names[0])),
    )
    checked = F.assert_true(name.isNotNull(), F.concat(F.lit(f"invalid {what}: "), col))
    return F.when(checked.isNull(), name)


def _hex_id(col: Column, nbytes: int) -> Column:
    """Input base64-or-hex -> lowercase hex string (traces id encoding)."""
    return F.lower(F.hex(_decode_id(col, nbytes)))


def needs_fallback_traces(line: Column) -> Column:
    cond = _risky_int(line)
    for marker in TRACES_FALLBACK_MARKERS:
        cond = cond | line.contains(marker)
    return cond


def decode_traces_json_native(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """One OTLP/JSON traces export request per row -> raw otel_traces frame."""
    from otlp2parquet_spark.otel.otlp_json import SPAN_KIND, STATUS_CODE

    parsed = lines.select(
        F.from_json(F.col(line_col), TRACES_REQUEST_SCHEMA, {"mode": "FAILFAST"}).alias("req")
    )
    rs = parsed.select(F.explode("req.resourceSpans").alias("rs"))
    ss = rs.select(
        F.col("rs.resource.attributes").alias("rattrs"),
        F.explode("rs.scopeSpans").alias("ss"),
    )
    sp = ss.select(
        "rattrs",
        F.col("ss.scope").alias("scope"),
        F.explode("ss.spans").alias("s"),
    )
    start = F.coalesce(F.col("s.startTimeUnixNano").cast("long"), F.lit(0))
    end = F.coalesce(F.col("s.endTimeUnixNano").cast("long"), F.lit(0))
    events = F.coalesce(F.col("s.events"), F.array())
    links = F.coalesce(F.col("s.links"), F.array())
    parent_hex = _hex_id(F.col("s.parentSpanId"), 8)

    out = sp.select(
        F.expr("CAST(coalesce(CAST(s.startTimeUnixNano AS LONG), 0L) div 1000 AS LONG)").alias(
            "Timestamp"
        ),
        _hex_id(F.col("s.traceId"), 16).alias("TraceId"),
        _hex_id(F.col("s.spanId"), 8).alias("SpanId"),
        _attr_lookup(F.col("rattrs"), "service.name").alias("ServiceName"),
        _attrs_to_json(
            F.col("rattrs"), ("service.name", "service.namespace", "service.instance.id")
        ).alias("ResourceAttributes"),
        F.nullif(F.col("scope.name"), F.lit("")).alias("ScopeName"),
        F.nullif(F.col("scope.version"), F.lit("")).alias("ScopeVersion"),
        # all-zero parent == absent (flatten.py parity)
        F.when(parent_hex.rlike("^0+$") | parent_hex.isNull(), F.lit(None)).otherwise(
            parent_hex
        ).alias("ParentSpanId"),
        F.nullif(F.col("s.traceState"), F.lit("")).alias("TraceState"),
        F.coalesce(F.col("s.name"), F.lit("")).alias("SpanName"),
        _enum_to_name(F.col("s.kind"), _SPAN_KIND_NAMES, SPAN_KIND, "span kind").alias("SpanKind"),
        _attrs_to_json(F.col("s.attributes")).alias("SpanAttributes"),
        (end - start).alias("Duration"),
        _enum_to_name(
            F.col("s.status.code"), _STATUS_NAMES, STATUS_CODE, "status code"
        ).alias("StatusCode"),
        F.nullif(F.col("s.status.message"), F.lit("")).alias("StatusMessage"),
        F.transform(
            events, lambda e: F.coalesce(e.getField("timeUnixNano").cast("long"), F.lit(0))
        ).alias("__ev_ns"),
        F.transform(events, lambda e: F.coalesce(e.getField("name"), F.lit(""))).alias(
            "EventsName"
        ),
        F.transform(events, lambda e: _attrs_to_json(e.getField("attributes"))).alias(
            "EventsAttributes"
        ),
        F.transform(links, lambda ln: _hex_id(ln.getField("traceId"), 16)).alias("LinksTraceId"),
        F.transform(links, lambda ln: _hex_id(ln.getField("spanId"), 8)).alias("LinksSpanId"),
        F.transform(links, lambda ln: F.nullif(ln.getField("traceState"), F.lit(""))).alias(
            "LinksTraceState"
        ),
        F.transform(links, lambda ln: _attrs_to_json(ln.getField("attributes"))).alias(
            "LinksAttributes"
        ),
    ).withColumn(
        "EventsTimestamp", F.expr("transform(__ev_ns, x -> CAST(x div 1000 AS LONG))")
    ).drop("__ev_ns")
    return _cast_to_raw(out, "otel_traces")


def decode_traces_json_auto(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Route + union, finalized to golden types (traces twin of
    decode_logs_json_auto)."""
    from otlp2parquet_spark.otel import ingest

    simple = lines.filter(~needs_fallback_traces(F.col(line_col)))
    complex_ = lines.filter(needs_fallback_traces(F.col(line_col)))
    native_raw = decode_traces_json_native(simple, line_col)
    py_payloads = complex_.select(
        F.lit("").alias("path"),
        F.encode(F.col(line_col), "UTF-8").alias("content"),
        F.lit("json").alias("fmt"),
    )
    py_raw = py_payloads.mapInArrow(
        ingest._decode_simple("traces", "otel_traces", "raise"),
        schemas.raw_spark_schema("otel_traces"),
    )
    return ingest.finalize(native_raw.unionAll(py_raw), "otel_traces")


# ---------------------------------------------------------------------------
# Metrics fast path: all five metric shapes (gauge/sum number points,
# histogram, exponential histogram, summary) decode pure-Catalyst, including
# the skipped.{summaries,missing_values,nan_values,infinity_values} counters,
# which ride the same union frame as `MetricType='skipped'` rows. Only
# payloads with complex attribute values / escape-sensitive text / snake_case
# keys / literal NaN-Infinity tokens route to the general Python codec.

_NUMBER_DP = StructType(
    [
        StructField("timeUnixNano", StringType()),
        StructField("asDouble", DoubleType()),
        StructField("asInt", StringType()),
        StructField("attributes", ArrayType(_KV)),
    ]
)
# proto3 JSON maps (u)int64 to strings; Jackson also tolerates bare numbers
# into StringType, so count-like fields read as text and cast("long") later
_HIST_DP = StructType(
    [
        StructField("timeUnixNano", StringType()),
        StructField("attributes", ArrayType(_KV)),
        StructField("count", StringType()),
        StructField("sum", DoubleType()),
        StructField("bucketCounts", ArrayType(StringType())),
        StructField("explicitBounds", ArrayType(DoubleType())),
        StructField("min", DoubleType()),
        StructField("max", DoubleType()),
    ]
)
_EXP_BUCKETS = StructType(
    [StructField("offset", IntegerType()), StructField("bucketCounts", ArrayType(StringType()))]
)
_EXP_HIST_DP = StructType(
    [
        StructField("timeUnixNano", StringType()),
        StructField("attributes", ArrayType(_KV)),
        StructField("count", StringType()),
        StructField("sum", DoubleType()),
        StructField("scale", IntegerType()),
        StructField("zeroCount", StringType()),
        StructField("positive", _EXP_BUCKETS),
        StructField("negative", _EXP_BUCKETS),
        StructField("min", DoubleType()),
        StructField("max", DoubleType()),
    ]
)
_QUANTILE = StructType(
    [StructField("quantile", DoubleType()), StructField("value", DoubleType())]
)
_SUMMARY_DP = StructType(
    [
        StructField("timeUnixNano", StringType()),
        StructField("attributes", ArrayType(_KV)),
        StructField("count", StringType()),
        StructField("sum", DoubleType()),
        StructField("quantileValues", ArrayType(_QUANTILE)),
    ]
)
_METRIC = StructType(
    [
        StructField("name", StringType()),
        StructField("description", StringType()),
        StructField("unit", StringType()),
        StructField("gauge", StructType([StructField("dataPoints", ArrayType(_NUMBER_DP))])),
        StructField(
            "sum",
            StructType(
                [
                    StructField("dataPoints", ArrayType(_NUMBER_DP)),
                    StructField("aggregationTemporality", StringType()),
                    StructField("isMonotonic", BooleanType()),
                ]
            ),
        ),
        StructField("histogram", StructType([StructField("dataPoints", ArrayType(_HIST_DP))])),
        StructField(
            "exponentialHistogram",
            StructType([StructField("dataPoints", ArrayType(_EXP_HIST_DP))]),
        ),
        StructField("summary", StructType([StructField("dataPoints", ArrayType(_SUMMARY_DP))])),
    ]
)
METRICS_REQUEST_SCHEMA = StructType(
    [
        StructField(
            "resourceMetrics",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "resource",
                            StructType([StructField("attributes", ArrayType(_KV))]),
                        ),
                        StructField(
                            "scopeMetrics",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("scope", _SCOPE),
                                        StructField("metrics", ArrayType(_METRIC)),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

METRICS_FALLBACK_MARKERS = (
    "\\u00",
    "\\U00",
    '"arrayValue"',
    '"kvlistValue"',
    # NOTE: no NaN/Infinity markers — Jackson parses the literal tokens
    # (allowNonNumericNumbers) exactly like Python's json, and _number_rows'
    # native skip lane counts nan/infinity/missing values; a NaN inside an
    # attribute double still routes via the "doubleValue" marker below
    '"bytesValue"',
    '"doubleValue"',
    # snake_case payloads
    "resource_metrics",
    "scope_metrics",
    "data_points",
    "time_unix_nano",
    "_value",
    "as_double",
    "as_int",
)

_TEMPORALITY = {
    "AGGREGATION_TEMPORALITY_UNSPECIFIED": 0,
    "AGGREGATION_TEMPORALITY_DELTA": 1,
    "AGGREGATION_TEMPORALITY_CUMULATIVE": 2,
}


# uint64 histogram/exp-histogram count, zeroCount, and bucketCounts entries
# with >=19 digits may exceed int64: the fast path's long cast would null
# them while the general Python codec keeps the arbitrary-precision value —
# lane-dependent output for the same payload (ADVICE r3). Route such lines
# to the general codec, mirroring _BIG_INT_RE for attribute intValue.
_BIG_COUNT_RE = (
    '"(count|zeroCount)"\\s*:\\s*"?[0-9]{19}'
    '|"bucketCounts"\\s*:\\s*\\[[^\\]]*[0-9]{19}'
)


def needs_fallback_metrics(line: Column) -> Column:
    cond = _risky_int(line) | line.rlike(_BIG_COUNT_RE)
    for marker in METRICS_FALLBACK_MARKERS:
        cond = cond | line.contains(marker)
    return cond


def _number_rows(sm_df, kind: str):
    """Explode one number-metric kind (gauge|sum) to union-frame rows."""
    m = sm_df.filter(F.col(f"m.{kind}").isNotNull())
    dp = m.select(
        "rattrs",
        "svc",
        "scope",
        F.col("m.name").alias("mname"),
        F.col("m.description").alias("mdesc"),
        F.col("m.unit").alias("munit"),
        *(
            [
                F.col("m.sum.aggregationTemporality").alias("temp_raw"),
                F.coalesce(F.col("m.sum.isMonotonic"), F.lit(False)).alias("IsMonotonic"),
            ]
            if kind == "sum"
            else [F.lit(None).cast("string").alias("temp_raw"), F.lit(None).cast("boolean").alias("IsMonotonic")]
        ),
        F.explode(F.col(f"m.{kind}.dataPoints")).alias("dp"),
    )
    # as_double wins the oneof when both appear; as_int coerced to double
    val = F.coalesce(F.col("dp.asDouble"), F.col("dp.asInt").cast("double"))
    # flatten._number_points parity (flatten.py:326-339): a valueless /
    # NaN / infinite point becomes a skipped.* counter row instead of a
    # data row — same frame, so the payload is still parsed exactly once
    skip_reason = (
        F.when(val.isNull(), F.lit("missing_values"))
        .when(F.isnan(val), F.lit("nan_values"))
        .when(F.abs(val) == F.lit(float("inf")), F.lit("infinity_values"))
    )
    keep = lambda c: F.when(skip_reason.isNull(), c)  # noqa: E731
    temp_num = F.when(F.col("temp_raw").rlike("^[0-9]+$"), F.col("temp_raw").cast("int"))
    temp_named = F.try_element_at(
        F.create_map(*[F.lit(x) for kv in _TEMPORALITY.items() for x in kv]), F.col("temp_raw")
    )
    # numeric temporality must be in the spec enum {0,1,2} — the general
    # codec (flatten.flatten_metrics) hard-errors outside it, so the fast
    # path must too, or the same payload is lane-dependent (ADVICE r1)
    temp_ok = (
        F.col("temp_raw").isNull()
        | F.coalesce(temp_num.isin(0, 1, 2), F.lit(False))
        | temp_named.isNotNull()
    )
    temp_checked = F.assert_true(
        temp_ok, F.concat(F.lit("invalid aggregation temporality: "), F.col("temp_raw"))
    )
    return dp.select(
        keep(
            F.expr("CAST(coalesce(CAST(dp.timeUnixNano AS LONG), 0L) div 1000 AS LONG)")
        ).alias("Timestamp"),
        keep(F.coalesce(F.col("svc"), F.lit(""))).alias("ServiceName"),
        # metrics KEEP service.* inside ResourceAttributes (§1.3.6)
        keep(_attrs_to_json(F.col("rattrs"))).alias("ResourceAttributes"),
        keep(F.nullif(F.col("scope.name"), F.lit(""))).alias("ScopeName"),
        keep(F.nullif(F.col("scope.version"), F.lit(""))).alias("ScopeVersion"),
        keep(F.coalesce(F.col("mname"), F.lit(""))).alias("MetricName"),
        keep(F.nullif(F.col("mdesc"), F.lit(""))).alias("MetricDescription"),
        keep(F.nullif(F.col("munit"), F.lit(""))).alias("MetricUnit"),
        keep(_attrs_to_json(F.col("dp.attributes"))).alias("Attributes"),
        keep(val).alias("Value"),
        # the temporality assert rides every row (skip rows included, hence
        # temp_checked as the left AND operand — codegen evaluates it first):
        # the general codec parses the metric's temporality before looking
        # at any data point, so an invalid enum hard-errors on both lanes
        F.when(
            temp_checked.isNull() & skip_reason.isNull(),
            F.coalesce(temp_num, temp_named, F.lit(0)),
        ).alias("AggregationTemporality"),
        keep(F.col("IsMonotonic")).alias("IsMonotonic"),
        F.when(skip_reason.isNull(), F.lit(kind)).otherwise(F.lit("skipped")).alias("MetricType"),
        skip_reason.alias("SkipReason"),
        F.when(skip_reason.isNotNull(), F.lit(1).cast("long")).alias("SkipCount"),
    )


def _metric_prefix_cols(kind: str, wrap=None):
    """The shared 9-column metrics prefix (§1.3.6: service.* stays in
    ResourceAttributes) + MetricType tag. `wrap` (Column -> Column) lets a
    caller null the prefix out on rows it repurposes as skip counters."""
    w = wrap or (lambda c: c)
    return [
        w(
            F.expr("CAST(coalesce(CAST(dp.timeUnixNano AS LONG), 0L) div 1000 AS LONG)")
        ).alias("Timestamp"),
        w(F.coalesce(F.col("svc"), F.lit(""))).alias("ServiceName"),
        w(_attrs_to_json(F.col("rattrs"))).alias("ResourceAttributes"),
        w(F.nullif(F.col("scope.name"), F.lit(""))).alias("ScopeName"),
        w(F.nullif(F.col("scope.version"), F.lit(""))).alias("ScopeVersion"),
        w(F.coalesce(F.col("m.name"), F.lit(""))).alias("MetricName"),
        w(F.nullif(F.col("m.description"), F.lit(""))).alias("MetricDescription"),
        w(F.nullif(F.col("m.unit"), F.lit(""))).alias("MetricUnit"),
        w(_attrs_to_json(F.col("dp.attributes"))).alias("Attributes"),
        w(F.lit(kind)).alias("MetricType"),
    ]


def _counts_to_longs(col: Column) -> Column:
    """uint64-as-string bucket counts -> array<long> ([] when absent, like
    flatten's `[int(c) for c in dp.get(..., [])]`)."""
    return F.coalesce(
        F.transform(col, lambda c: c.cast("long")), F.array().cast("array<long>")
    )


def _histogram_rows(sm_df):
    """Explode histogram metrics to union-frame rows (flatten.py:262-273
    parity: count/sum default 0, bucket arrays default empty, min/max null)."""
    m = sm_df.filter(F.col("m.histogram").isNotNull())
    dp = m.select("rattrs", "svc", "scope", "m", F.explode("m.histogram.dataPoints").alias("dp"))
    return dp.select(
        *_metric_prefix_cols("histogram"),
        F.coalesce(F.col("dp.count").cast("long"), F.lit(0)).alias("Count"),
        F.coalesce(F.col("dp.sum"), F.lit(0.0)).alias("Sum"),
        _counts_to_longs(F.col("dp.bucketCounts")).alias("BucketCounts"),
        F.coalesce(F.col("dp.explicitBounds"), F.array().cast("array<double>")).alias(
            "ExplicitBounds"
        ),
        F.col("dp.min").alias("Min"),
        F.col("dp.max").alias("Max"),
    )


def _exp_histogram_rows(sm_df):
    """Explode exponentialHistogram metrics to union-frame rows
    (flatten.py:274-292 parity)."""
    m = sm_df.filter(F.col("m.exponentialHistogram").isNotNull())
    dp = m.select(
        "rattrs", "svc", "scope", "m", F.explode("m.exponentialHistogram.dataPoints").alias("dp")
    )
    return dp.select(
        *_metric_prefix_cols("exponential_histogram"),
        F.coalesce(F.col("dp.count").cast("long"), F.lit(0)).alias("Count"),
        F.coalesce(F.col("dp.sum"), F.lit(0.0)).alias("Sum"),
        F.coalesce(F.col("dp.scale"), F.lit(0)).alias("Scale"),
        F.coalesce(F.col("dp.zeroCount").cast("long"), F.lit(0)).alias("ZeroCount"),
        F.coalesce(F.col("dp.positive.offset"), F.lit(0)).alias("PositiveOffset"),
        _counts_to_longs(F.col("dp.positive.bucketCounts")).alias("PositiveBucketCounts"),
        F.coalesce(F.col("dp.negative.offset"), F.lit(0)).alias("NegativeOffset"),
        _counts_to_longs(F.col("dp.negative.bucketCounts")).alias("NegativeBucketCounts"),
        F.col("dp.min").alias("Min"),
        F.col("dp.max").alias("Max"),
    )


def _summary_rows(sm_df):
    """Explode summary metrics to union-frame rows (flatten.py:294-307
    parity): each data point yields its decoded summary row AND one
    `skipped.summaries` counter row — summaries are decoded but not
    persisted by the default 4-table pipeline, and the skip accounting
    rides the same frame so the payload is still parsed exactly once."""
    m = sm_df.filter(F.col("m.summary").isNotNull())
    dp = m.select(
        "rattrs", "svc", "scope", "m", F.explode("m.summary.dataPoints").alias("dp")
    ).select("*", F.explode(F.array(F.lit(False), F.lit(True))).alias("is_skip"))
    keep = lambda c: F.when(~F.col("is_skip"), c)  # noqa: E731
    qv = F.coalesce(F.col("dp.quantileValues"), F.array().cast(_SUMMARY_DP["quantileValues"].dataType))
    return dp.select(
        *_metric_prefix_cols("summary", wrap=keep)[:-1],
        F.when(F.col("is_skip"), F.lit("skipped")).otherwise(F.lit("summary")).alias("MetricType"),
        F.when(F.col("is_skip"), F.lit("summaries")).alias("SkipReason"),
        F.when(F.col("is_skip"), F.lit(1).cast("long")).alias("SkipCount"),
        keep(F.coalesce(F.col("dp.count").cast("long"), F.lit(0))).alias("Count"),
        keep(F.coalesce(F.col("dp.sum"), F.lit(0.0))).alias("Sum"),
        # absent per-quantile fields default to 0.0 (float(q.get(..., 0.0)))
        keep(F.transform(qv, lambda q: F.coalesce(q["value"], F.lit(0.0)))).alias(
            "QuantileValues"
        ),
        keep(F.transform(qv, lambda q: F.coalesce(q["quantile"], F.lit(0.0)))).alias(
            "QuantileQuantiles"
        ),
    )


def decode_metrics_json_native(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """One OTLP/JSON metrics export request per row -> gauge/sum/histogram/
    exponential-histogram rows in the metrics-union layout
    (ingest.METRICS_UNION_SCHEMA columns)."""
    parsed = lines.select(
        F.from_json(F.col(line_col), METRICS_REQUEST_SCHEMA, {"mode": "FAILFAST"}).alias("req")
    )
    return metrics_union_from_req(parsed)


def metrics_union_from_req(parsed: DataFrame) -> DataFrame:
    """camelCase metrics request struct (column `req`, METRICS_REQUEST_SCHEMA
    shape — from_json here, or the JVM protobuf lane's snake->camel adapter
    in jvm_codec) -> metrics-union rows. Source-agnostic so the protobuf
    lane reuses the entire native pipeline."""
    from otlp2parquet_spark.otel import ingest as ing

    rm = parsed.select(F.explode("req.resourceMetrics").alias("rm"))
    sm = rm.select(
        F.col("rm.resource.attributes").alias("rattrs"),
        F.explode("rm.scopeMetrics").alias("sm"),
    ).select(
        "rattrs",
        F.col("sm.scope").alias("scope"),
        F.explode("sm.metrics").alias("m"),
    )
    sm = sm.withColumn("svc", _attr_lookup(F.col("rattrs"), "service.name"))

    def to_union(rows: DataFrame) -> DataFrame:
        # project to the union schema (absent type-specific columns -> NULL)
        cols = []
        have = set(rows.columns)
        for f in ing.METRICS_UNION_SCHEMA.fields:
            if f.name in have:
                c = F.col(f.name)
                cols.append(
                    (c if isinstance(f.dataType, ArrayType) else c.cast(f.dataType)).alias(f.name)
                )
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return rows.select(*cols)

    parts = [
        to_union(_number_rows(sm, "gauge")),
        to_union(_number_rows(sm, "sum")),
        to_union(_histogram_rows(sm)),
        to_union(_exp_histogram_rows(sm)),
        to_union(_summary_rows(sm)),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def decode_metrics_json_auto(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Route + union in the metrics-union layout (pair with
    ingest.metrics_table / ingest.skipped_metrics for per-table frames)."""
    from otlp2parquet_spark.otel import ingest as ing

    simple = lines.filter(~needs_fallback_metrics(F.col(line_col)))
    complex_ = lines.filter(needs_fallback_metrics(F.col(line_col)))
    native_rows = decode_metrics_json_native(simple, line_col)
    py_payloads = complex_.select(
        F.lit("").alias("path"),
        F.encode(F.col(line_col), "UTF-8").alias("content"),
        F.lit("json").alias("fmt"),
    )
    py_rows = ing.decode_metrics_union(py_payloads)
    return native_rows.unionAll(py_rows)
