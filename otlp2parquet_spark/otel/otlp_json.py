"""OTLP/JSON (protobuf-JSON mapping) -> the same canonical dict as wire.py.

Implements the behaviors the reference inherits from its JSON decoder
(reference tests/e2e.rs:238-318, testdata/invalid/README.md):

- camelCase and snake_case field names both accepted;
- (u)int64 values arrive as JSON strings or numbers;
- enum fields accept the full variant string (``"SEVERITY_NUMBER_INFO"``,
  ``"SPAN_KIND_SERVER"``, ...) or the numeric value; an unknown variant string
  is a hard error;
- trace/span id bytes accept protobuf-JSON base64 AND plain hex
  (reference testdata/log.json uses base64, docs use hex); a string that is
  neither is a hard error;
- malformed JSON is a hard error.
"""

from __future__ import annotations

import base64
import binascii
import json
import re
from typing import Any

from otlp2parquet_spark.otel.wire import DESCRIPTORS, OtlpDecodeError, _REQUEST_MSG

# Public OTLP v1 enum tables (open-telemetry/opentelemetry-proto).
SEVERITY_NUMBER = {"SEVERITY_NUMBER_UNSPECIFIED": 0}
for _i, _base in enumerate(["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"]):
    for _j in range(4):
        _name = f"SEVERITY_NUMBER_{_base}" + (str(_j + 1) if _j else "")
        SEVERITY_NUMBER[_name] = _i * 4 + _j + 1

SPAN_KIND = {
    "SPAN_KIND_UNSPECIFIED": 0,
    "SPAN_KIND_INTERNAL": 1,
    "SPAN_KIND_SERVER": 2,
    "SPAN_KIND_CLIENT": 3,
    "SPAN_KIND_PRODUCER": 4,
    "SPAN_KIND_CONSUMER": 5,
}

STATUS_CODE = {"STATUS_CODE_UNSET": 0, "STATUS_CODE_OK": 1, "STATUS_CODE_ERROR": 2}

AGGREGATION_TEMPORALITY = {
    "AGGREGATION_TEMPORALITY_UNSPECIFIED": 0,
    "AGGREGATION_TEMPORALITY_DELTA": 1,
    "AGGREGATION_TEMPORALITY_CUMULATIVE": 2,
}

# message.field -> enum table (the only enum-typed fields in the descriptors)
_ENUM_TABLES = {
    ("LogRecord", "severity_number"): SEVERITY_NUMBER,
    ("Span", "kind"): SPAN_KIND,
    ("Status", "code"): STATUS_CODE,
    ("Sum", "aggregation_temporality"): AGGREGATION_TEMPORALITY,
    ("Histogram", "aggregation_temporality"): AGGREGATION_TEMPORALITY,
    ("ExponentialHistogram", "aggregation_temporality"): AGGREGATION_TEMPORALITY,
}

_HEX_RE = re.compile(r"^[0-9a-fA-F]+$")


def _camel(snake: str) -> str:
    parts = snake.split("_")
    return parts[0] + "".join(p.capitalize() for p in parts[1:])


# message -> {json key (camel or snake) -> (canonical name, kind, repeated)}
_JSON_FIELDS: dict[str, dict[str, tuple[str, str, bool]]] = {}
for _msg, _desc in DESCRIPTORS.items():
    m: dict[str, tuple[str, str, bool]] = {}
    for _no, (_name, _kind, _rep) in _desc.items():
        m[_name] = (_name, _kind, _rep)
        m[_camel(_name)] = (_name, _kind, _rep)
    _JSON_FIELDS[_msg] = m

# AnyValue oneof members map JSON-value conversion specially
_ANYVALUE_INT_FIELDS = {"int_value"}


def decode_id_bytes(s: str, field: str) -> bytes:
    """base64-or-hex id decode with hard error on neither (reference
    testdata/invalid/README.md: trace_invalid_base64, trace_mixed_encoding)."""
    if s == "":
        return b""
    # hex ids have even length and hex alphabet; base64 of 16/8 bytes is
    # 24/12 chars with padding — a 32/16-char hex string never parses as
    # full-length base64, so try hex first.
    if len(s) % 2 == 0 and _HEX_RE.match(s):
        try:
            return binascii.unhexlify(s)
        except binascii.Error:
            pass
    try:
        decoded = base64.b64decode(s, validate=True)
    except (binascii.Error, ValueError) as e:
        raise OtlpDecodeError(f"invalid id encoding in {field}: {s!r} is neither hex nor base64") from e
    return decoded


def _conv_scalar(msg: str, name: str, kind: str, v: Any) -> Any:
    if kind in ("fixed64", "sfixed64", "int64", "uint64", "uint32", "int32", "fixed32"):
        if isinstance(v, bool) or not isinstance(v, (int, str, float)):
            raise OtlpDecodeError(f"bad integer for {msg}.{name}: {v!r}")
        try:
            return int(v)
        except ValueError as e:
            raise OtlpDecodeError(f"bad integer for {msg}.{name}: {v!r}") from e
    if kind == "enum":
        if isinstance(v, int) and not isinstance(v, bool):
            return v
        if isinstance(v, str):
            table = _ENUM_TABLES.get((msg, name))
            if table is None or v not in table:
                raise OtlpDecodeError(f"unknown enum variant for {msg}.{name}: {v!r}")
            return table[v]
        raise OtlpDecodeError(f"bad enum for {msg}.{name}: {v!r}")
    if kind == "sint32":
        return int(v)
    if kind == "double":
        if isinstance(v, str):
            # protobuf-JSON allows "NaN"/"Infinity"/"-Infinity"
            return float(v)
        return float(v)
    if kind == "bool":
        if not isinstance(v, bool):
            raise OtlpDecodeError(f"bad bool for {msg}.{name}: {v!r}")
        return v
    if kind == "string":
        if not isinstance(v, str):
            raise OtlpDecodeError(f"bad string for {msg}.{name}: {v!r}")
        return v
    if kind == "bytes":
        if not isinstance(v, str):
            raise OtlpDecodeError(f"bad bytes for {msg}.{name}: {v!r}")
        return decode_id_bytes(v, f"{msg}.{name}")
    raise OtlpDecodeError(f"unmapped kind {kind} for {msg}.{name}")


def _conv_message(msg: str, obj: Any) -> dict[str, Any]:
    if not isinstance(obj, dict):
        raise OtlpDecodeError(f"expected object for {msg}, got {type(obj).__name__}")
    fields = _JSON_FIELDS[msg]
    out: dict[str, Any] = {}
    for key, v in obj.items():
        spec = fields.get(key)
        if spec is None:
            continue  # unknown field: protobuf-JSON ignore (forward compat)
        name, kind, repeated = spec
        if repeated:
            if v is None:
                continue
            if not isinstance(v, list):
                raise OtlpDecodeError(f"expected array for {msg}.{name}")
            if kind.startswith("msg:"):
                out[name] = [_conv_message(kind[4:], item) for item in v]
            else:
                out[name] = [_conv_scalar(msg, name, kind, item) for item in v]
        else:
            if v is None:
                continue
            if kind.startswith("msg:"):
                out[name] = _conv_message(kind[4:], v)
            else:
                out[name] = _conv_scalar(msg, name, kind, v)
    return out


def parse_request_json(body: str | bytes, signal: str) -> dict[str, Any]:
    """Parse one OTLP/JSON export request into the canonical dict."""
    try:
        obj = json.loads(body)
    except json.JSONDecodeError as e:
        raise OtlpDecodeError(f"malformed JSON: {e}") from e
    return _conv_message(_REQUEST_MSG[signal], obj)


def parse_request_jsonl(body: str | bytes, signal: str) -> list[dict[str, Any]]:
    """Parse a JSONL payload: one export request per non-empty line
    (reference tests/e2e.rs:44-52; line format scripts/generate_testdata.py)."""
    if isinstance(body, bytes):
        body = body.decode("utf-8")
    return [parse_request_json(line, signal) for line in body.splitlines() if line.strip()]
