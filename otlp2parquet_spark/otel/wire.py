"""Minimal pure-Python protobuf wire-format reader for OTLP payloads.

The container ships no protobuf runtime, so this implements the (publicly
documented) protobuf encoding — varint / zigzag / fixed32 / fixed64 /
length-delimited — plus hand-written descriptors for the OTLP v1 messages
(public schema: open-telemetry/opentelemetry-proto). Output is a plain nested
dict keyed by snake_case proto field names: the same canonical tree
`otlp_json.parse_request` produces, so one flattener serves both wire formats
(reference src/codec.rs:34-75 dispatches formats the same way).

Covers the decode surface of reference tests/e2e.rs: ExportLogs/Traces/
MetricsServiceRequest with all five metric data kinds.
"""

from __future__ import annotations

import struct
from typing import Any


class OtlpDecodeError(ValueError):
    """Invalid OTLP payload — the reference hard-errors with HTTP 400
    (reference src/lib.rs:75-117, testdata/invalid/README.md).

    `code` is a typed reason for programmatic handling (the quarantine
    sink records it; twin of the reference's E-coded WriterError,
    src/writer/error.rs:7-28). Derived from the message when not given."""

    def __init__(self, message: str, code: str | None = None):
        super().__init__(message)
        self.code = code or _classify_decode_error(message)


_DECODE_ERROR_CODES = (
    # (code, message-substring) — first match wins; substrings cover every
    # raise site in wire.py / otlp_json.py / flatten.py
    ("E-JSON", "malformed JSON"),
    ("E-PB", "malformed protobuf"),
    ("E-PB", "truncated"),
    ("E-PB", "varint"),
    ("E-PB", "wire type"),
    ("E-PB", "packed field"),
    ("E-PB", "invalid utf-8"),
    ("E-ID", "id encoding"),
    ("E-ID", "Id length"),
    ("E-ENUM-KIND", "span kind"),
    ("E-ENUM-STATUS", "status code"),
    ("E-ENUM-TEMPORALITY", "temporality"),
    ("E-ENUM", "enum variant"),
    ("E-VALUE", "bad "),
    ("E-SHAPE", "expected "),
)


def _classify_decode_error(message: str) -> str:
    for code, needle in _DECODE_ERROR_CODES:
        if needle in message:
            return code
    return "E-DECODE"


# ---------------------------------------------------------------------------
# Wire primitives

_WIRE_VARINT, _WIRE_I64, _WIRE_LEN, _WIRE_I32 = 0, 1, 2, 5


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise OtlpDecodeError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise OtlpDecodeError("varint too long")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _to_signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _to_signed32(n: int) -> int:
    n &= 0xFFFFFFFF
    return n - (1 << 32) if n >= (1 << 31) else n


# ---------------------------------------------------------------------------
# OTLP descriptors: message -> {field_no: (name, kind, repeated)}
# kind: msg:<Name> | string | bytes | int64/uint64/int32/uint32/enum (varint)
#       | sint32 (zigzag) | bool | double | fixed64 | sfixed64 | fixed32
# Field numbers from the public opentelemetry-proto v1 .proto files.

_KV = {1: ("key", "string", False), 2: ("value", "msg:AnyValue", False)}

DESCRIPTORS: dict[str, dict[int, tuple[str, str, bool]]] = {
    "AnyValue": {
        1: ("string_value", "string", False),
        2: ("bool_value", "bool", False),
        3: ("int_value", "int64", False),
        4: ("double_value", "double", False),
        5: ("array_value", "msg:ArrayValue", False),
        6: ("kvlist_value", "msg:KeyValueList", False),
        7: ("bytes_value", "bytes", False),
    },
    "ArrayValue": {1: ("values", "msg:AnyValue", True)},
    "KeyValueList": {1: ("values", "msg:KeyValue", True)},
    "KeyValue": _KV,
    "Resource": {1: ("attributes", "msg:KeyValue", True), 2: ("dropped_attributes_count", "uint32", False)},
    "InstrumentationScope": {
        1: ("name", "string", False),
        2: ("version", "string", False),
        3: ("attributes", "msg:KeyValue", True),
        4: ("dropped_attributes_count", "uint32", False),
    },
    # --- logs ---
    "ExportLogsServiceRequest": {1: ("resource_logs", "msg:ResourceLogs", True)},
    "ResourceLogs": {
        1: ("resource", "msg:Resource", False),
        2: ("scope_logs", "msg:ScopeLogs", True),
        3: ("schema_url", "string", False),
    },
    "ScopeLogs": {
        1: ("scope", "msg:InstrumentationScope", False),
        2: ("log_records", "msg:LogRecord", True),
        3: ("schema_url", "string", False),
    },
    "LogRecord": {
        1: ("time_unix_nano", "fixed64", False),
        2: ("severity_number", "enum", False),
        3: ("severity_text", "string", False),
        5: ("body", "msg:AnyValue", False),
        6: ("attributes", "msg:KeyValue", True),
        7: ("dropped_attributes_count", "uint32", False),
        8: ("flags", "fixed32", False),
        9: ("trace_id", "bytes", False),
        10: ("span_id", "bytes", False),
        11: ("observed_time_unix_nano", "fixed64", False),
        12: ("event_name", "string", False),
    },
    # --- traces ---
    "ExportTraceServiceRequest": {1: ("resource_spans", "msg:ResourceSpans", True)},
    "ResourceSpans": {
        1: ("resource", "msg:Resource", False),
        2: ("scope_spans", "msg:ScopeSpans", True),
        3: ("schema_url", "string", False),
    },
    "ScopeSpans": {
        1: ("scope", "msg:InstrumentationScope", False),
        2: ("spans", "msg:Span", True),
        3: ("schema_url", "string", False),
    },
    "Span": {
        1: ("trace_id", "bytes", False),
        2: ("span_id", "bytes", False),
        3: ("trace_state", "string", False),
        4: ("parent_span_id", "bytes", False),
        5: ("name", "string", False),
        6: ("kind", "enum", False),
        7: ("start_time_unix_nano", "fixed64", False),
        8: ("end_time_unix_nano", "fixed64", False),
        9: ("attributes", "msg:KeyValue", True),
        10: ("dropped_attributes_count", "uint32", False),
        11: ("events", "msg:SpanEvent", True),
        12: ("dropped_events_count", "uint32", False),
        13: ("links", "msg:SpanLink", True),
        14: ("dropped_links_count", "uint32", False),
        15: ("status", "msg:Status", False),
        16: ("flags", "fixed32", False),
    },
    "SpanEvent": {
        1: ("time_unix_nano", "fixed64", False),
        2: ("name", "string", False),
        3: ("attributes", "msg:KeyValue", True),
        4: ("dropped_attributes_count", "uint32", False),
    },
    "SpanLink": {
        1: ("trace_id", "bytes", False),
        2: ("span_id", "bytes", False),
        3: ("trace_state", "string", False),
        4: ("attributes", "msg:KeyValue", True),
        5: ("dropped_attributes_count", "uint32", False),
        6: ("flags", "fixed32", False),
    },
    "Status": {2: ("message", "string", False), 3: ("code", "enum", False)},
    # --- metrics ---
    "ExportMetricsServiceRequest": {1: ("resource_metrics", "msg:ResourceMetrics", True)},
    "ResourceMetrics": {
        1: ("resource", "msg:Resource", False),
        2: ("scope_metrics", "msg:ScopeMetrics", True),
        3: ("schema_url", "string", False),
    },
    "ScopeMetrics": {
        1: ("scope", "msg:InstrumentationScope", False),
        2: ("metrics", "msg:Metric", True),
        3: ("schema_url", "string", False),
    },
    "Metric": {
        1: ("name", "string", False),
        2: ("description", "string", False),
        3: ("unit", "string", False),
        5: ("gauge", "msg:Gauge", False),
        7: ("sum", "msg:Sum", False),
        9: ("histogram", "msg:Histogram", False),
        10: ("exponential_histogram", "msg:ExponentialHistogram", False),
        11: ("summary", "msg:Summary", False),
        12: ("metadata", "msg:KeyValue", True),
    },
    "Gauge": {1: ("data_points", "msg:NumberDataPoint", True)},
    "Sum": {
        1: ("data_points", "msg:NumberDataPoint", True),
        2: ("aggregation_temporality", "enum", False),
        3: ("is_monotonic", "bool", False),
    },
    "Histogram": {
        1: ("data_points", "msg:HistogramDataPoint", True),
        2: ("aggregation_temporality", "enum", False),
    },
    "ExponentialHistogram": {
        1: ("data_points", "msg:ExponentialHistogramDataPoint", True),
        2: ("aggregation_temporality", "enum", False),
    },
    "Summary": {1: ("data_points", "msg:SummaryDataPoint", True)},
    "NumberDataPoint": {
        2: ("start_time_unix_nano", "fixed64", False),
        3: ("time_unix_nano", "fixed64", False),
        4: ("as_double", "double", False),
        6: ("as_int", "sfixed64", False),
        7: ("attributes", "msg:KeyValue", True),
        8: ("flags", "uint32", False),
    },
    "HistogramDataPoint": {
        2: ("start_time_unix_nano", "fixed64", False),
        3: ("time_unix_nano", "fixed64", False),
        4: ("count", "fixed64", False),
        5: ("sum", "double", False),
        6: ("bucket_counts", "fixed64", True),
        7: ("explicit_bounds", "double", True),
        9: ("attributes", "msg:KeyValue", True),
        10: ("flags", "uint32", False),
        11: ("min", "double", False),
        12: ("max", "double", False),
    },
    "ExponentialHistogramDataPoint": {
        1: ("attributes", "msg:KeyValue", True),
        2: ("start_time_unix_nano", "fixed64", False),
        3: ("time_unix_nano", "fixed64", False),
        4: ("count", "fixed64", False),
        5: ("sum", "double", False),
        6: ("scale", "sint32", False),
        7: ("zero_count", "fixed64", False),
        8: ("positive", "msg:EHBuckets", False),
        9: ("negative", "msg:EHBuckets", False),
        10: ("flags", "uint32", False),
        12: ("min", "double", False),
        13: ("max", "double", False),
        14: ("zero_threshold", "double", False),
    },
    "EHBuckets": {1: ("offset", "sint32", False), 2: ("bucket_counts", "uint64", True)},
    "SummaryDataPoint": {
        2: ("start_time_unix_nano", "fixed64", False),
        3: ("time_unix_nano", "fixed64", False),
        4: ("count", "fixed64", False),
        5: ("sum", "double", False),
        6: ("quantile_values", "msg:ValueAtQuantile", True),
        7: ("attributes", "msg:KeyValue", True),
        8: ("flags", "uint32", False),
    },
    "ValueAtQuantile": {1: ("quantile", "double", False), 2: ("value", "double", False)},
}

_SCALAR_WIDTH = {"double": 8, "fixed64": 8, "sfixed64": 8, "fixed32": 4}


def _decode_scalar_i64(kind: str, raw: bytes) -> Any:
    if kind == "double":
        return struct.unpack("<d", raw)[0]
    if kind == "sfixed64":
        return struct.unpack("<q", raw)[0]
    return struct.unpack("<Q", raw)[0]  # fixed64


def decode_message(buf: bytes, msg: str) -> dict[str, Any]:
    """Decode one protobuf message into a canonical dict.

    Unknown fields are skipped (protobuf forward-compat rule); oneof members
    (AnyValue, Metric.data, NumberDataPoint.value) simply land as whichever
    key was present, mirroring protobuf last-one-wins semantics.
    """
    desc = DESCRIPTORS[msg]
    out: dict[str, Any] = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field_no, wire = tag >> 3, tag & 7
        spec = desc.get(field_no)
        if wire == _WIRE_VARINT:
            val, pos = _read_varint(buf, pos)
            if spec is None:
                continue
            name, kind, repeated = spec
            if kind == "bool":
                val = bool(val)
            elif kind == "sint32":
                val = _zigzag(val)
            elif kind == "int64":
                val = _to_signed64(val)
            elif kind in ("int32", "enum"):
                val = _to_signed64(val)  # negative enums arrive 64-bit-encoded
            # uint32/uint64: varint value as-is
            if repeated:
                out.setdefault(name, []).append(val)
            else:
                out[name] = val
        elif wire in (_WIRE_I64, _WIRE_I32):
            width = 8 if wire == _WIRE_I64 else 4
            if pos + width > n:
                raise OtlpDecodeError("truncated fixed field")
            raw = buf[pos : pos + width]
            pos += width
            if spec is None:
                continue
            name, kind, repeated = spec
            if wire == _WIRE_I32:
                val = struct.unpack("<f", raw)[0] if kind == "float" else struct.unpack("<I", raw)[0]
            else:
                val = _decode_scalar_i64(kind, raw)
            if repeated:
                out.setdefault(name, []).append(val)
            else:
                out[name] = val
        elif wire == _WIRE_LEN:
            length, pos = _read_varint(buf, pos)
            if pos + length > n:
                raise OtlpDecodeError("truncated length-delimited field")
            raw = buf[pos : pos + length]
            pos += length
            if spec is None:
                continue
            name, kind, repeated = spec
            if kind.startswith("msg:"):
                val = decode_message(raw, kind[4:])
                if repeated:
                    out.setdefault(name, []).append(val)
                else:
                    out[name] = val
            elif kind == "string":
                try:
                    sval = raw.decode("utf-8")
                except UnicodeDecodeError as e:
                    raise OtlpDecodeError(f"invalid utf-8 in {msg}.{name}") from e
                if repeated:
                    out.setdefault(name, []).append(sval)
                else:
                    out[name] = sval
            elif kind == "bytes":
                if repeated:
                    out.setdefault(name, []).append(raw)
                else:
                    out[name] = raw
            else:
                # packed repeated scalars
                vals: list[Any] = []
                if kind in _SCALAR_WIDTH:
                    width = _SCALAR_WIDTH[kind]
                    if length % width:
                        raise OtlpDecodeError(f"bad packed field length in {msg}.{name}")
                    for off in range(0, length, width):
                        vals.append(_decode_scalar_i64(kind, raw[off : off + width]))
                else:  # packed varints
                    p = 0
                    while p < length:
                        v, p = _read_varint(raw, p)
                        if kind == "sint32":
                            v = _zigzag(v)
                        elif kind in ("int64", "int32", "enum"):
                            v = _to_signed64(v)
                        vals.append(v)
                    if kind == "bool":
                        vals = [bool(v) for v in vals]
                out.setdefault(name, []).extend(vals)
        else:
            raise OtlpDecodeError(f"unsupported wire type {wire} in {msg}")
    return out


_REQUEST_MSG = {
    "logs": "ExportLogsServiceRequest",
    "traces": "ExportTraceServiceRequest",
    "metrics": "ExportMetricsServiceRequest",
}


def parse_request_pb(body: bytes, signal: str) -> dict[str, Any]:
    """Parse an OTLP export request protobuf for a signal (logs|traces|metrics)."""
    try:
        return decode_message(body, _REQUEST_MSG[signal])
    except OtlpDecodeError:
        raise
    except Exception as e:  # struct errors etc.
        raise OtlpDecodeError(f"malformed protobuf: {e}") from e
