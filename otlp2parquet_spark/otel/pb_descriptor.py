"""Compiled protobuf descriptor set for the public opentelemetry-proto v1
schema, generated without protoc: this module hand-encodes the
`FileDescriptorSet` wire format (descriptor.proto, field numbers from the
public protobuf release) and emits the same artifact
`protoc --include_imports --descriptor_set_out` would produce for the OTLP
.proto files (opentelemetry-proto repo, the same field numbers the pure-
Python decoder mirrors in wire.DESCRIPTORS — wire.py:109-290).

Purpose (D5 scale path): Spark's JVM protobuf connector
(`from_protobuf(col, messageName, descFilePath)`, spark-protobuf module)
decodes OTLP/pb entirely JVM-side — the per-core ceiling of the Python
wire decoder (~22-32k rows/s/core) is the fleet-cost dominator for a
pb-heavy 100 TB ingest (reference decode path: src/codec.rs:34-75). The
spark-protobuf jar is NOT bundled with pip pyspark, so jvm_codec.py
gates on its presence and wire.py remains the always-available fallback
and parity oracle. `tests/test_pb_descriptor.py` machine-checks this
descriptor against wire.DESCRIPTORS field-by-field.

Known, deliberate divergences from the official files (wire-compatible —
the binary encoding of every message is identical):
- gRPC service declarations are omitted (data plane only).

Presence semantics: Histogram/ExponentialHistogramDataPoint sum/min/max
are declared `proto3_optional` with the official synthetic oneofs
(_sum/_min/_max), so the JVM lane distinguishes an absent min/max from an
explicitly-sent 0.0 exactly like the presence-exact Python wire codec
(wire.py keeps None for absent; flatten passes Min/Max through as null).
"""

from __future__ import annotations

import os

# --- minimal protobuf wire encoder (descriptor.proto subset) ---------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _tag(field_no: int, wtype: int) -> bytes:
    return _varint((field_no << 3) | wtype)


def _ld(field_no: int, payload: bytes) -> bytes:
    return _tag(field_no, 2) + _varint(len(payload)) + payload


def _s(field_no: int, text: str) -> bytes:
    return _ld(field_no, text.encode())


def _vi(field_no: int, value: int) -> bytes:
    return _tag(field_no, 0) + _varint(value)


# FieldDescriptorProto.Type values (public descriptor.proto)
_TYPE = {
    "double": 1,
    "float": 2,
    "int64": 3,
    "uint64": 4,
    "int32": 5,
    "fixed64": 6,
    "fixed32": 7,
    "bool": 8,
    "string": 9,
    "message": 11,
    "bytes": 12,
    "uint32": 13,
    "enum": 14,
    "sfixed32": 15,
    "sfixed64": 16,
    "sint32": 17,
    "sint64": 18,
}

_LABEL_OPTIONAL, _LABEL_REPEATED = 1, 3


def _field(
    name: str,
    number: int,
    kind: str,
    *,
    repeated: bool = False,
    oneof: int | None = None,
    proto3_optional: bool = False,
) -> bytes:
    """FieldDescriptorProto: name=1, number=3, label=4, type=5, type_name=6,
    oneof_index=9, proto3_optional=17. `kind` is a scalar type or
    'msg:.fq.Name' / 'enum:.fq.Name'. proto3_optional fields must also set
    `oneof` to their synthetic single-member oneof (declared after all real
    oneofs, per the official descriptor contract)."""
    if kind.startswith("msg:"):
        t, type_name = _TYPE["message"], kind[4:]
    elif kind.startswith("enum:"):
        t, type_name = _TYPE["enum"], kind[5:]
    else:
        t, type_name = _TYPE[kind], None
    out = _s(1, name) + _vi(3, number)
    out += _vi(4, _LABEL_REPEATED if repeated else _LABEL_OPTIONAL)
    out += _vi(5, t)
    if type_name:
        out += _s(6, type_name)
    if oneof is not None:
        out += _vi(9, oneof)
    if proto3_optional:
        out += _vi(17, 1)
    return out


def _enum(name: str, values: list[tuple[str, int]]) -> bytes:
    """EnumDescriptorProto: name=1, value=2 (EnumValueDescriptorProto:
    name=1, number=2)."""
    body = _s(1, name)
    for vname, vnum in values:
        body += _ld(2, _s(1, vname) + _vi(2, vnum))
    return body


def _message(
    name: str,
    fields: list[bytes],
    *,
    nested: list[bytes] = (),
    enums: list[bytes] = (),
    oneofs: list[str] = (),
) -> bytes:
    """DescriptorProto: name=1, field=2, nested_type=3, enum_type=4,
    oneof_decl=8 (OneofDescriptorProto: name=1)."""
    body = _s(1, name)
    for f in fields:
        body += _ld(2, f)
    for n in nested:
        body += _ld(3, n)
    for e in enums:
        body += _ld(4, e)
    for o in oneofs:
        body += _ld(8, _s(1, o))
    return body


def _file(
    name: str,
    package: str,
    deps: list[str],
    messages: list[bytes],
    enums: list[bytes] = (),
) -> bytes:
    """FileDescriptorProto: name=1, package=2, dependency=3, message_type=4,
    enum_type=5, syntax=12."""
    body = _s(1, name) + _s(2, package)
    for d in deps:
        body += _s(3, d)
    for m in messages:
        body += _ld(4, m)
    for e in enums:
        body += _ld(5, e)
    body += _s(12, "proto3")
    return body


# --- the OTLP v1 schema (public opentelemetry-proto field numbers) ---------

_COMMON = "opentelemetry.proto.common.v1"
_RESOURCE = "opentelemetry.proto.resource.v1"
_LOGS = "opentelemetry.proto.logs.v1"
_TRACE = "opentelemetry.proto.trace.v1"
_METRICS = "opentelemetry.proto.metrics.v1"

_KV = f"msg:.{_COMMON}.KeyValue"
_ANY = f"msg:.{_COMMON}.AnyValue"


def _common_file() -> bytes:
    any_value = _message(
        "AnyValue",
        [
            _field("string_value", 1, "string", oneof=0),
            _field("bool_value", 2, "bool", oneof=0),
            _field("int_value", 3, "int64", oneof=0),
            _field("double_value", 4, "double", oneof=0),
            _field("array_value", 5, f"msg:.{_COMMON}.ArrayValue", oneof=0),
            _field("kvlist_value", 6, f"msg:.{_COMMON}.KeyValueList", oneof=0),
            _field("bytes_value", 7, "bytes", oneof=0),
        ],
        oneofs=["value"],
    )
    array_value = _message("ArrayValue", [_field("values", 1, _ANY, repeated=True)])
    kv_list = _message("KeyValueList", [_field("values", 1, _KV, repeated=True)])
    key_value = _message(
        "KeyValue", [_field("key", 1, "string"), _field("value", 2, _ANY)]
    )
    scope = _message(
        "InstrumentationScope",
        [
            _field("name", 1, "string"),
            _field("version", 2, "string"),
            _field("attributes", 3, _KV, repeated=True),
            _field("dropped_attributes_count", 4, "uint32"),
        ],
    )
    return _file(
        "opentelemetry/proto/common/v1/common.proto",
        _COMMON,
        [],
        [any_value, array_value, kv_list, key_value, scope],
    )


def _resource_file() -> bytes:
    resource = _message(
        "Resource",
        [
            _field("attributes", 1, _KV, repeated=True),
            _field("dropped_attributes_count", 2, "uint32"),
        ],
    )
    return _file(
        "opentelemetry/proto/resource/v1/resource.proto",
        _RESOURCE,
        ["opentelemetry/proto/common/v1/common.proto"],
        [resource],
    )


_SEVERITY_VALUES = [("SEVERITY_NUMBER_UNSPECIFIED", 0)] + [
    (f"SEVERITY_NUMBER_{lvl}{'' if i == 0 else i + 1}", base + i)
    for lvl, base in [
        ("TRACE", 1),
        ("DEBUG", 5),
        ("INFO", 9),
        ("WARN", 13),
        ("ERROR", 17),
        ("FATAL", 21),
    ]
    for i in range(4)
]


def _logs_file() -> bytes:
    log_record = _message(
        "LogRecord",
        [
            _field("time_unix_nano", 1, "fixed64"),
            _field("observed_time_unix_nano", 11, "fixed64"),
            _field("severity_number", 2, f"enum:.{_LOGS}.SeverityNumber"),
            _field("severity_text", 3, "string"),
            _field("body", 5, _ANY),
            _field("attributes", 6, _KV, repeated=True),
            _field("dropped_attributes_count", 7, "uint32"),
            _field("flags", 8, "fixed32"),
            _field("trace_id", 9, "bytes"),
            _field("span_id", 10, "bytes"),
            _field("event_name", 12, "string"),
        ],
    )
    scope_logs = _message(
        "ScopeLogs",
        [
            _field("scope", 1, f"msg:.{_COMMON}.InstrumentationScope"),
            _field("log_records", 2, f"msg:.{_LOGS}.LogRecord", repeated=True),
            _field("schema_url", 3, "string"),
        ],
    )
    resource_logs = _message(
        "ResourceLogs",
        [
            _field("resource", 1, f"msg:.{_RESOURCE}.Resource"),
            _field("scope_logs", 2, f"msg:.{_LOGS}.ScopeLogs", repeated=True),
            _field("schema_url", 3, "string"),
        ],
    )
    logs_data = _message(
        "LogsData",
        [_field("resource_logs", 1, f"msg:.{_LOGS}.ResourceLogs", repeated=True)],
    )
    return _file(
        "opentelemetry/proto/logs/v1/logs.proto",
        _LOGS,
        [
            "opentelemetry/proto/common/v1/common.proto",
            "opentelemetry/proto/resource/v1/resource.proto",
        ],
        [logs_data, resource_logs, scope_logs, log_record],
        enums=[_enum("SeverityNumber", _SEVERITY_VALUES)],
    )


def _trace_file() -> bytes:
    event = _message(
        "Event",
        [
            _field("time_unix_nano", 1, "fixed64"),
            _field("name", 2, "string"),
            _field("attributes", 3, _KV, repeated=True),
            _field("dropped_attributes_count", 4, "uint32"),
        ],
    )
    link = _message(
        "Link",
        [
            _field("trace_id", 1, "bytes"),
            _field("span_id", 2, "bytes"),
            _field("trace_state", 3, "string"),
            _field("attributes", 4, _KV, repeated=True),
            _field("dropped_attributes_count", 5, "uint32"),
            _field("flags", 6, "fixed32"),
        ],
    )
    span_kind = _enum(
        "SpanKind",
        [
            ("SPAN_KIND_UNSPECIFIED", 0),
            ("SPAN_KIND_INTERNAL", 1),
            ("SPAN_KIND_SERVER", 2),
            ("SPAN_KIND_CLIENT", 3),
            ("SPAN_KIND_PRODUCER", 4),
            ("SPAN_KIND_CONSUMER", 5),
        ],
    )
    span = _message(
        "Span",
        [
            _field("trace_id", 1, "bytes"),
            _field("span_id", 2, "bytes"),
            _field("trace_state", 3, "string"),
            _field("parent_span_id", 4, "bytes"),
            _field("name", 5, "string"),
            _field("kind", 6, f"enum:.{_TRACE}.Span.SpanKind"),
            _field("start_time_unix_nano", 7, "fixed64"),
            _field("end_time_unix_nano", 8, "fixed64"),
            _field("attributes", 9, _KV, repeated=True),
            _field("dropped_attributes_count", 10, "uint32"),
            _field("events", 11, f"msg:.{_TRACE}.Span.Event", repeated=True),
            _field("dropped_events_count", 12, "uint32"),
            _field("links", 13, f"msg:.{_TRACE}.Span.Link", repeated=True),
            _field("dropped_links_count", 14, "uint32"),
            _field("status", 15, f"msg:.{_TRACE}.Status"),
            _field("flags", 16, "fixed32"),
        ],
        nested=[event, link],
        enums=[span_kind],
    )
    status = _message(
        "Status",
        [
            _field("message", 2, "string"),
            _field("code", 3, f"enum:.{_TRACE}.Status.StatusCode"),
        ],
        enums=[
            _enum(
                "StatusCode",
                [
                    ("STATUS_CODE_UNSET", 0),
                    ("STATUS_CODE_OK", 1),
                    ("STATUS_CODE_ERROR", 2),
                ],
            )
        ],
    )
    scope_spans = _message(
        "ScopeSpans",
        [
            _field("scope", 1, f"msg:.{_COMMON}.InstrumentationScope"),
            _field("spans", 2, f"msg:.{_TRACE}.Span", repeated=True),
            _field("schema_url", 3, "string"),
        ],
    )
    resource_spans = _message(
        "ResourceSpans",
        [
            _field("resource", 1, f"msg:.{_RESOURCE}.Resource"),
            _field("scope_spans", 2, f"msg:.{_TRACE}.ScopeSpans", repeated=True),
            _field("schema_url", 3, "string"),
        ],
    )
    traces_data = _message(
        "TracesData",
        [_field("resource_spans", 1, f"msg:.{_TRACE}.ResourceSpans", repeated=True)],
    )
    return _file(
        "opentelemetry/proto/trace/v1/trace.proto",
        _TRACE,
        [
            "opentelemetry/proto/common/v1/common.proto",
            "opentelemetry/proto/resource/v1/resource.proto",
        ],
        [traces_data, resource_spans, scope_spans, span, status],
    )


def _metrics_file() -> bytes:
    temporality = _enum(
        "AggregationTemporality",
        [
            ("AGGREGATION_TEMPORALITY_UNSPECIFIED", 0),
            ("AGGREGATION_TEMPORALITY_DELTA", 1),
            ("AGGREGATION_TEMPORALITY_CUMULATIVE", 2),
        ],
    )
    exemplar = _message(
        "Exemplar",
        [
            _field("filtered_attributes", 7, _KV, repeated=True),
            _field("time_unix_nano", 2, "fixed64"),
            _field("as_double", 3, "double", oneof=0),
            _field("as_int", 6, "sfixed64", oneof=0),
            _field("span_id", 4, "bytes"),
            _field("trace_id", 5, "bytes"),
        ],
        oneofs=["value"],
    )
    number_dp = _message(
        "NumberDataPoint",
        [
            _field("attributes", 7, _KV, repeated=True),
            _field("start_time_unix_nano", 2, "fixed64"),
            _field("time_unix_nano", 3, "fixed64"),
            _field("as_double", 4, "double", oneof=0),
            _field("as_int", 6, "sfixed64", oneof=0),
            _field("exemplars", 5, f"msg:.{_METRICS}.Exemplar", repeated=True),
            _field("flags", 8, "uint32"),
        ],
        oneofs=["value"],
    )
    histogram_dp = _message(
        "HistogramDataPoint",
        [
            _field("attributes", 9, _KV, repeated=True),
            _field("start_time_unix_nano", 2, "fixed64"),
            _field("time_unix_nano", 3, "fixed64"),
            _field("count", 4, "fixed64"),
            _field("sum", 5, "double", oneof=0, proto3_optional=True),
            _field("bucket_counts", 6, "fixed64", repeated=True),
            _field("explicit_bounds", 7, "double", repeated=True),
            _field("exemplars", 8, f"msg:.{_METRICS}.Exemplar", repeated=True),
            _field("flags", 10, "uint32"),
            _field("min", 11, "double", oneof=1, proto3_optional=True),
            _field("max", 12, "double", oneof=2, proto3_optional=True),
        ],
        oneofs=["_sum", "_min", "_max"],
    )
    buckets = _message(
        "Buckets",
        [
            _field("offset", 1, "sint32"),
            _field("bucket_counts", 2, "uint64", repeated=True),
        ],
    )
    exp_histogram_dp = _message(
        "ExponentialHistogramDataPoint",
        [
            _field("attributes", 1, _KV, repeated=True),
            _field("start_time_unix_nano", 2, "fixed64"),
            _field("time_unix_nano", 3, "fixed64"),
            _field("count", 4, "fixed64"),
            _field("sum", 5, "double", oneof=0, proto3_optional=True),
            _field("scale", 6, "sint32"),
            _field("zero_count", 7, "fixed64"),
            _field(
                "positive",
                8,
                f"msg:.{_METRICS}.ExponentialHistogramDataPoint.Buckets",
            ),
            _field(
                "negative",
                9,
                f"msg:.{_METRICS}.ExponentialHistogramDataPoint.Buckets",
            ),
            _field("flags", 10, "uint32"),
            _field("exemplars", 11, f"msg:.{_METRICS}.Exemplar", repeated=True),
            _field("min", 12, "double", oneof=1, proto3_optional=True),
            _field("max", 13, "double", oneof=2, proto3_optional=True),
            _field("zero_threshold", 14, "double"),
        ],
        nested=[buckets],
        oneofs=["_sum", "_min", "_max"],
    )
    value_at_quantile = _message(
        "ValueAtQuantile",
        [_field("quantile", 1, "double"), _field("value", 2, "double")],
    )
    summary_dp = _message(
        "SummaryDataPoint",
        [
            _field("attributes", 7, _KV, repeated=True),
            _field("start_time_unix_nano", 2, "fixed64"),
            _field("time_unix_nano", 3, "fixed64"),
            _field("count", 4, "fixed64"),
            _field("sum", 5, "double"),
            _field(
                "quantile_values",
                6,
                f"msg:.{_METRICS}.SummaryDataPoint.ValueAtQuantile",
                repeated=True,
            ),
            _field("flags", 8, "uint32"),
        ],
        nested=[value_at_quantile],
    )
    gauge = _message(
        "Gauge",
        [_field("data_points", 1, f"msg:.{_METRICS}.NumberDataPoint", repeated=True)],
    )
    sum_msg = _message(
        "Sum",
        [
            _field("data_points", 1, f"msg:.{_METRICS}.NumberDataPoint", repeated=True),
            _field(
                "aggregation_temporality", 2, f"enum:.{_METRICS}.AggregationTemporality"
            ),
            _field("is_monotonic", 3, "bool"),
        ],
    )
    histogram = _message(
        "Histogram",
        [
            _field(
                "data_points", 1, f"msg:.{_METRICS}.HistogramDataPoint", repeated=True
            ),
            _field(
                "aggregation_temporality", 2, f"enum:.{_METRICS}.AggregationTemporality"
            ),
        ],
    )
    exp_histogram = _message(
        "ExponentialHistogram",
        [
            _field(
                "data_points",
                1,
                f"msg:.{_METRICS}.ExponentialHistogramDataPoint",
                repeated=True,
            ),
            _field(
                "aggregation_temporality", 2, f"enum:.{_METRICS}.AggregationTemporality"
            ),
        ],
    )
    summary = _message(
        "Summary",
        [_field("data_points", 1, f"msg:.{_METRICS}.SummaryDataPoint", repeated=True)],
    )
    metric = _message(
        "Metric",
        [
            _field("name", 1, "string"),
            _field("description", 2, "string"),
            _field("unit", 3, "string"),
            _field("gauge", 5, f"msg:.{_METRICS}.Gauge", oneof=0),
            _field("sum", 7, f"msg:.{_METRICS}.Sum", oneof=0),
            _field("histogram", 9, f"msg:.{_METRICS}.Histogram", oneof=0),
            _field(
                "exponential_histogram",
                10,
                f"msg:.{_METRICS}.ExponentialHistogram",
                oneof=0,
            ),
            _field("summary", 11, f"msg:.{_METRICS}.Summary", oneof=0),
            _field("metadata", 12, _KV, repeated=True),
        ],
        oneofs=["data"],
    )
    scope_metrics = _message(
        "ScopeMetrics",
        [
            _field("scope", 1, f"msg:.{_COMMON}.InstrumentationScope"),
            _field("metrics", 2, f"msg:.{_METRICS}.Metric", repeated=True),
            _field("schema_url", 3, "string"),
        ],
    )
    resource_metrics = _message(
        "ResourceMetrics",
        [
            _field("resource", 1, f"msg:.{_RESOURCE}.Resource"),
            _field("scope_metrics", 2, f"msg:.{_METRICS}.ScopeMetrics", repeated=True),
            _field("schema_url", 3, "string"),
        ],
    )
    metrics_data = _message(
        "MetricsData",
        [
            _field(
                "resource_metrics", 1, f"msg:.{_METRICS}.ResourceMetrics", repeated=True
            )
        ],
    )
    return _file(
        "opentelemetry/proto/metrics/v1/metrics.proto",
        _METRICS,
        [
            "opentelemetry/proto/common/v1/common.proto",
            "opentelemetry/proto/resource/v1/resource.proto",
        ],
        [
            metrics_data,
            resource_metrics,
            scope_metrics,
            metric,
            gauge,
            sum_msg,
            histogram,
            exp_histogram,
            summary,
            number_dp,
            histogram_dp,
            exp_histogram_dp,
            summary_dp,
            exemplar,
        ],
        enums=[temporality],
    )


def _collector_file(signal: str, item_field: str, item_type: str) -> bytes:
    pkg = f"opentelemetry.proto.collector.{signal}.v1"
    cap = "".join(w.capitalize() for w in signal.split("_"))
    # official naming: logs -> ExportLogsServiceRequest, trace -> ExportTraceServiceRequest
    request = _message(
        f"Export{cap}ServiceRequest",
        [_field(item_field, 1, item_type, repeated=True)],
    )
    # official partial-success rejected-count names per signal (the proto
    # names the rejected unit, not the top-level request field)
    rejected = {
        "logs": "rejected_log_records",
        "trace": "rejected_spans",
        "metrics": "rejected_data_points",
    }[signal]
    partial = _message(
        f"Export{cap}PartialSuccess",
        [
            _field(rejected, 1, "int64"),
            _field("error_message", 2, "string"),
        ],
    )
    response = _message(
        f"Export{cap}ServiceResponse",
        [_field("partial_success", 1, f"msg:.{pkg}.Export{cap}PartialSuccess")],
    )
    dep_file = {"logs": "logs/v1/logs.proto", "trace": "trace/v1/trace.proto",
                "metrics": "metrics/v1/metrics.proto"}[signal]
    return _file(
        f"opentelemetry/proto/collector/{signal}/v1/{signal}_service.proto",
        pkg,
        [f"opentelemetry/proto/{dep_file}"],
        [request, response, partial],
    )


def build_descriptor_set() -> bytes:
    """The complete FileDescriptorSet (repeated FileDescriptorProto file=1),
    dependency-ordered like --include_imports output."""
    files = [
        _common_file(),
        _resource_file(),
        _logs_file(),
        _trace_file(),
        _metrics_file(),
        _collector_file("logs", "resource_logs", f"msg:.{_LOGS}.ResourceLogs"),
        _collector_file("trace", "resource_spans", f"msg:.{_TRACE}.ResourceSpans"),
        _collector_file(
            "metrics", "resource_metrics", f"msg:.{_METRICS}.ResourceMetrics"
        ),
    ]
    return b"".join(_ld(1, f) for f in files)


REQUEST_MESSAGES = {
    "logs": "opentelemetry.proto.collector.logs.v1.ExportLogsServiceRequest",
    "traces": "opentelemetry.proto.collector.trace.v1.ExportTraceServiceRequest",
    "metrics": "opentelemetry.proto.collector.metrics.v1.ExportMetricsServiceRequest",
}

DESC_PATH = os.path.join(os.path.dirname(__file__), "otlp.desc")


def write_descriptor_set(path: str = DESC_PATH) -> str:
    with open(path, "wb") as f:
        f.write(build_descriptor_set())
    return path


if __name__ == "__main__":
    p = write_descriptor_set()
    print(f"wrote {p} ({os.path.getsize(p)} bytes)")
