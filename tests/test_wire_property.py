"""Property-based cross-validation of the two OTLP decoders.

Strategy: generate random-but-valid OTLP trees (hypothesis), render each tree
BOTH as protobuf wire bytes (tiny encoder below, written from the public wire
spec — the inverse of otel/wire.py) AND as protobuf-JSON, decode each with
the corresponding production decoder, flatten both, and require identical
rows. Any field-number, wire-type, zigzag, enum or id-encoding disagreement
between the two independent paths fails the property.

(The reference has no property tests — SURVEY §5.9; this goes beyond it.)
"""

from __future__ import annotations

import base64
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from otlp2parquet_spark.otel import flatten, otlp_json, wire

# ---------------------------------------------------------------------------
# Minimal protobuf encoder driven by the SAME descriptors (inverse of wire.py)


def _enc_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_zigzag(n: int) -> bytes:
    return _enc_varint((n << 1) ^ (n >> 63) if n < 0 else n << 1)


def encode_message(obj: dict, msg: str) -> bytes:
    desc = wire.DESCRIPTORS[msg]
    by_name = {name: (no, kind, rep) for no, (name, kind, rep) in desc.items()}
    out = bytearray()
    for name, val in obj.items():
        no, kind, rep = by_name[name]
        vals = val if rep else [val]
        for v in vals:
            if kind.startswith("msg:"):
                body = encode_message(v, kind[4:])
                out += _enc_varint(no << 3 | 2) + _enc_varint(len(body)) + body
            elif kind == "string":
                b = v.encode("utf-8")
                out += _enc_varint(no << 3 | 2) + _enc_varint(len(b)) + b
            elif kind == "bytes":
                out += _enc_varint(no << 3 | 2) + _enc_varint(len(v)) + v
            elif kind == "double":
                out += _enc_varint(no << 3 | 1) + struct.pack("<d", v)
            elif kind in ("fixed64",):
                out += _enc_varint(no << 3 | 1) + struct.pack("<Q", v)
            elif kind == "sfixed64":
                out += _enc_varint(no << 3 | 1) + struct.pack("<q", v)
            elif kind == "fixed32":
                out += _enc_varint(no << 3 | 5) + struct.pack("<I", v)
            elif kind == "sint32":
                out += _enc_varint(no << 3 | 0) + _enc_zigzag(v)
            elif kind == "bool":
                out += _enc_varint(no << 3 | 0) + _enc_varint(1 if v else 0)
            else:  # varint int64/uint64/int32/uint32/enum
                out += _enc_varint(no << 3 | 0) + _enc_varint(v & 0xFFFFFFFFFFFFFFFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# JSON rendering of the same canonical tree (protobuf-JSON mapping)

_INT64_KINDS = {"fixed64", "sfixed64", "int64", "uint64"}


def render_json(obj: dict, msg: str) -> dict:
    desc = wire.DESCRIPTORS[msg]
    by_name = {name: (kind, rep) for _, (name, kind, rep) in desc.items()}
    out = {}
    for name, val in obj.items():
        kind, rep = by_name[name]

        def one(v):
            if kind.startswith("msg:"):
                return render_json(v, kind[4:])
            if kind == "bytes":
                return base64.b64encode(v).decode()
            if kind in _INT64_KINDS:
                return str(v)  # protobuf-JSON renders 64-bit ints as strings
            return v

        out[otlp_json._camel(name)] = [one(v) for v in val] if rep else one(val)
    return out


# ---------------------------------------------------------------------------
# Strategies

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=12
)
_key = st.text(alphabet="abcdefghij.x_", min_size=1, max_size=8)
_ns = st.integers(min_value=0, max_value=2**62)


def anyvalue(depth: int = 2):
    base = st.one_of(
        st.fixed_dictionaries({"string_value": _text}),
        st.fixed_dictionaries({"bool_value": st.booleans()}),
        st.fixed_dictionaries({"int_value": st.integers(-(2**53), 2**53)}),
        st.fixed_dictionaries(
            {"double_value": st.floats(allow_nan=False, allow_infinity=False, width=32)}
        ),
    )
    if depth <= 0:
        return base
    return st.one_of(
        base,
        st.fixed_dictionaries(
            {"array_value": st.fixed_dictionaries({"values": st.lists(anyvalue(depth - 1), max_size=3)})}
        ),
        st.fixed_dictionaries(
            {
                "kvlist_value": st.fixed_dictionaries(
                    {"values": st.lists(keyvalue(depth - 1), max_size=3, unique_by=lambda kv: kv["key"])}
                )
            }
        ),
    )


def keyvalue(depth: int = 1):
    return st.fixed_dictionaries({"key": _key, "value": anyvalue(depth)})


_attrs = st.lists(keyvalue(), max_size=4, unique_by=lambda kv: kv["key"])

_log_record = st.fixed_dictionaries(
    {},
    optional={
        "time_unix_nano": _ns,
        "observed_time_unix_nano": _ns,
        "severity_number": st.integers(0, 24),
        "severity_text": _text,
        "body": anyvalue(),
        "attributes": _attrs,
        "flags": st.integers(0, 2**32 - 1),
        "trace_id": st.binary(min_size=16, max_size=16),
        "span_id": st.binary(min_size=8, max_size=8),
    },
)

_scope = st.fixed_dictionaries({}, optional={"name": _text, "version": _text})
_resource = st.fixed_dictionaries({}, optional={"attributes": _attrs})

_logs_request = st.fixed_dictionaries(
    {
        "resource_logs": st.lists(
            st.fixed_dictionaries(
                {"scope_logs": st.lists(
                    st.fixed_dictionaries(
                        {"log_records": st.lists(_log_record, max_size=3)},
                        optional={"scope": _scope, "schema_url": _text},
                    ),
                    max_size=2,
                )},
                optional={"resource": _resource, "schema_url": _text},
            ),
            max_size=2,
        )
    }
)

_span = st.fixed_dictionaries(
    {
        "trace_id": st.binary(min_size=16, max_size=16),
        "span_id": st.binary(min_size=8, max_size=8),
    },
    optional={
        "parent_span_id": st.binary(min_size=8, max_size=8),
        "name": _text,
        "kind": st.integers(0, 5),
        "start_time_unix_nano": _ns,
        "end_time_unix_nano": _ns,
        "attributes": _attrs,
        "status": st.fixed_dictionaries({}, optional={"message": _text, "code": st.integers(0, 2)}),
        "events": st.lists(
            st.fixed_dictionaries(
                {}, optional={"time_unix_nano": _ns, "name": _text, "attributes": _attrs}
            ),
            max_size=2,
        ),
        "links": st.lists(
            st.fixed_dictionaries(
                {
                    "trace_id": st.binary(min_size=16, max_size=16),
                    "span_id": st.binary(min_size=8, max_size=8),
                },
                optional={"trace_state": _text, "attributes": _attrs},
            ),
            max_size=2,
        ),
    },
)

_traces_request = st.fixed_dictionaries(
    {
        "resource_spans": st.lists(
            st.fixed_dictionaries(
                {"scope_spans": st.lists(
                    st.fixed_dictionaries({"spans": st.lists(_span, max_size=3)}, optional={"scope": _scope}),
                    max_size=2,
                )},
                optional={"resource": _resource},
            ),
            max_size=2,
        )
    }
)

_number_dp = st.fixed_dictionaries(
    {"time_unix_nano": _ns},
    optional={
        "as_double": st.floats(allow_nan=False, allow_infinity=False),
        "as_int": st.integers(-(2**62), 2**62),
        "attributes": _attrs,
    },
)

_metrics_request = st.fixed_dictionaries(
    {
        "resource_metrics": st.lists(
            st.fixed_dictionaries(
                {
                    "scope_metrics": st.lists(
                        st.fixed_dictionaries(
                            {
                                "metrics": st.lists(
                                    st.fixed_dictionaries(
                                        {"name": _text},
                                        optional={
                                            "description": _text,
                                            "unit": _text,
                                            "gauge": st.fixed_dictionaries(
                                                {"data_points": st.lists(_number_dp, max_size=3)}
                                            ),
                                            "sum": st.fixed_dictionaries(
                                                {
                                                    "data_points": st.lists(_number_dp, max_size=3),
                                                    "aggregation_temporality": st.integers(0, 2),
                                                    "is_monotonic": st.booleans(),
                                                }
                                            ),
                                        },
                                    ),
                                    max_size=2,
                                )
                            },
                            optional={"scope": _scope},
                        ),
                        max_size=2,
                    )
                },
                optional={"resource": _resource},
            ),
            max_size=2,
        )
    }
)


# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(_logs_request)
def test_logs_pb_json_agree(tree):
    pb_rows = flatten.flatten_logs(
        wire.parse_request_pb(encode_message(tree, "ExportLogsServiceRequest"), "logs")
    )
    js_rows = flatten.flatten_logs(
        otlp_json.parse_request_json(
            __import__("json").dumps(render_json(tree, "ExportLogsServiceRequest")), "logs"
        )
    )
    assert pb_rows == js_rows


@settings(max_examples=150, deadline=None)
@given(_traces_request)
def test_traces_pb_json_agree(tree):
    pb_rows = flatten.flatten_traces(
        wire.parse_request_pb(encode_message(tree, "ExportTraceServiceRequest"), "traces")
    )
    js_rows = flatten.flatten_traces(
        otlp_json.parse_request_json(
            __import__("json").dumps(render_json(tree, "ExportTraceServiceRequest")), "traces"
        )
    )
    assert pb_rows == js_rows


@settings(max_examples=100, deadline=None)
@given(_metrics_request)
def test_metrics_pb_json_agree(tree):
    pb_out, pb_skip = flatten.flatten_metrics(
        wire.parse_request_pb(encode_message(tree, "ExportMetricsServiceRequest"), "metrics")
    )
    js_out, js_skip = flatten.flatten_metrics(
        otlp_json.parse_request_json(
            __import__("json").dumps(render_json(tree, "ExportMetricsServiceRequest")), "metrics"
        )
    )
    assert pb_out == js_out and pb_skip == js_skip


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=16, max_size=16))
def test_id_hex_base64_equivalent(raw):
    """The two accepted JSON id encodings decode to the same bytes."""
    assert otlp_json.decode_id_bytes(raw.hex(), "t") == raw
    assert otlp_json.decode_id_bytes(base64.b64encode(raw).decode(), "t") == raw
