"""The compiled OTLP descriptor set (pb_descriptor.py) must agree, field by
field, with the pure-Python wire decoder's tables (wire.DESCRIPTORS) — the
two lanes decode the same bytes, so their schemas must be provably the
same. A minimal descriptor.proto reader (plain tag-walking, independent of
the encoder under test) parses the artifact for the checks.

The from_protobuf parity test at the bottom runs only when the
spark-protobuf jar is on the classpath (pip pyspark does not bundle it).
"""

from __future__ import annotations

import os

import pytest

from otlp2parquet_spark.otel import jvm_codec, pb_descriptor, wire

# --- minimal FileDescriptorSet reader (decoder side, written against the
# public descriptor.proto field numbers; independent of the generator) ----


def _read_varint(buf: bytes, pos: int):
    result = shift = 0
    while True:
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7


def _walk(buf: bytes):
    """Yield (field_no, wire_type, value) over one message's bytes."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field_no, wtype = tag >> 3, tag & 7
        if wtype == 0:
            val, pos = _read_varint(buf, pos)
        elif wtype == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        else:  # pragma: no cover - descriptor.proto uses only varint/bytes
            raise AssertionError(f"unexpected wire type {wtype}")
        yield field_no, val


def _parse_field(buf: bytes) -> dict:
    f = {}
    for no, val in _walk(buf):
        if no == 1:
            f["name"] = val.decode()
        elif no == 3:
            f["number"] = val
        elif no == 4:
            f["label"] = val
        elif no == 5:
            f["type"] = val
        elif no == 6:
            f["type_name"] = val.decode()
        elif no == 9:
            f["oneof_index"] = val
        elif no == 17:
            f["proto3_optional"] = bool(val)
    return f


def _parse_message(buf: bytes, prefix: str) -> dict:
    name, fields, nested, enums, oneofs = None, [], {}, [], []
    for no, val in _walk(buf):
        if no == 1:
            name = val.decode()
        elif no == 2:
            fields.append(_parse_field(val))
        elif no == 3:
            nested.update(_parse_message(val, ""))
        elif no == 4:
            enums.append(val)
        elif no == 8:  # OneofDescriptorProto: name=1
            oneofs.append(next(v for n, v in _walk(val) if n == 1).decode())
    full = f"{prefix}{name}"
    out = {full: {"fields": fields, "enums": enums, "oneofs": oneofs}}
    for sub, meta in nested.items():
        out[f"{full}.{sub}"] = meta
    return out


def _parse_set(buf: bytes) -> dict:
    """{fully.qualified.Message: {fields: [...], enums: [...]}}"""
    messages = {}
    for no, fbuf in _walk(buf):
        assert no == 1
        package, msgs = "", []
        for fno, val in _walk(fbuf):
            if fno == 2:
                package = val.decode()
            elif fno == 4:
                msgs.append(val)
        for m in msgs:
            for full, meta in _parse_message(m, "").items():
                messages[f"{package}.{full}"] = meta
    return messages


# wire.py message name -> descriptor fully-qualified name
_C = "opentelemetry.proto.common.v1"
_NAME_MAP = {
    "AnyValue": f"{_C}.AnyValue",
    "ArrayValue": f"{_C}.ArrayValue",
    "KeyValueList": f"{_C}.KeyValueList",
    "KeyValue": f"{_C}.KeyValue",
    "InstrumentationScope": f"{_C}.InstrumentationScope",
    "Resource": "opentelemetry.proto.resource.v1.Resource",
    "ExportLogsServiceRequest": "opentelemetry.proto.collector.logs.v1.ExportLogsServiceRequest",
    "ResourceLogs": "opentelemetry.proto.logs.v1.ResourceLogs",
    "ScopeLogs": "opentelemetry.proto.logs.v1.ScopeLogs",
    "LogRecord": "opentelemetry.proto.logs.v1.LogRecord",
    "ExportTraceServiceRequest": "opentelemetry.proto.collector.trace.v1.ExportTraceServiceRequest",
    "ResourceSpans": "opentelemetry.proto.trace.v1.ResourceSpans",
    "ScopeSpans": "opentelemetry.proto.trace.v1.ScopeSpans",
    "Span": "opentelemetry.proto.trace.v1.Span",
    "SpanEvent": "opentelemetry.proto.trace.v1.Span.Event",
    "SpanLink": "opentelemetry.proto.trace.v1.Span.Link",
    "Status": "opentelemetry.proto.trace.v1.Status",
    "ExportMetricsServiceRequest": "opentelemetry.proto.collector.metrics.v1.ExportMetricsServiceRequest",
    "ResourceMetrics": "opentelemetry.proto.metrics.v1.ResourceMetrics",
    "ScopeMetrics": "opentelemetry.proto.metrics.v1.ScopeMetrics",
    "Metric": "opentelemetry.proto.metrics.v1.Metric",
    "Gauge": "opentelemetry.proto.metrics.v1.Gauge",
    "Sum": "opentelemetry.proto.metrics.v1.Sum",
    "Histogram": "opentelemetry.proto.metrics.v1.Histogram",
    "ExponentialHistogram": "opentelemetry.proto.metrics.v1.ExponentialHistogram",
    "Summary": "opentelemetry.proto.metrics.v1.Summary",
    "NumberDataPoint": "opentelemetry.proto.metrics.v1.NumberDataPoint",
    "HistogramDataPoint": "opentelemetry.proto.metrics.v1.HistogramDataPoint",
    "ExponentialHistogramDataPoint": "opentelemetry.proto.metrics.v1.ExponentialHistogramDataPoint",
    "EHBuckets": "opentelemetry.proto.metrics.v1.ExponentialHistogramDataPoint.Buckets",
    "SummaryDataPoint": "opentelemetry.proto.metrics.v1.SummaryDataPoint",
    "ValueAtQuantile": "opentelemetry.proto.metrics.v1.SummaryDataPoint.ValueAtQuantile",
}

# wire kind -> acceptable FieldDescriptorProto.Type values
_KIND_TO_TYPES = {
    "string": {9},
    "bytes": {12},
    "bool": {8},
    "double": {1},
    "fixed64": {6},
    "sfixed64": {16},
    "fixed32": {7},
    "sint32": {17},
    "int64": {3},
    "uint64": {4},
    "int32": {5},
    "uint32": {13},
    "enum": {14},
}


def test_descriptor_agrees_with_wire_tables():
    """Every message/field the Python decoder knows must appear in the
    descriptor set with the same number and a wire-compatible type."""
    messages = _parse_set(pb_descriptor.build_descriptor_set())
    for wire_name, fields in wire.DESCRIPTORS.items():
        fq = _NAME_MAP[wire_name]
        assert fq in messages, f"{fq} missing from descriptor set"
        by_number = {f["number"]: f for f in messages[fq]["fields"]}
        for number, (fname, kind, repeated) in fields.items():
            assert number in by_number, f"{fq}.{fname} (#{number}) missing"
            df = by_number[number]
            assert df["name"] == fname, (fq, number, df["name"], fname)
            assert df["label"] == (3 if repeated else 1), (fq, fname)
            if kind.startswith("msg:"):
                assert df["type"] == 11, (fq, fname)
                assert df["type_name"].lstrip(".").endswith(
                    _NAME_MAP[kind[4:]].rsplit(".", 1)[-1]
                ), (fq, fname, df.get("type_name"))
            else:
                assert df["type"] in _KIND_TO_TYPES[kind], (fq, fname, df["type"])


def test_histogram_min_max_presence():
    """Histogram/ExponentialHistogramDataPoint sum/min/max must be declared
    proto3_optional with the official synthetic oneofs (_sum/_min/_max) —
    otherwise the JVM lane reads an absent min/max as 0.0 while the
    presence-exact Python wire codec keeps None (lane-divergent output)."""
    messages = _parse_set(pb_descriptor.build_descriptor_set())
    m = "opentelemetry.proto.metrics.v1"
    for msg, (sum_no, min_no, max_no) in {
        f"{m}.HistogramDataPoint": (5, 11, 12),
        f"{m}.ExponentialHistogramDataPoint": (5, 12, 13),
    }.items():
        meta = messages[msg]
        assert meta["oneofs"] == ["_sum", "_min", "_max"], msg
        by_number = {f["number"]: f for f in meta["fields"]}
        for name, number, idx in (
            ("sum", sum_no, 0),
            ("min", min_no, 1),
            ("max", max_no, 2),
        ):
            f = by_number[number]
            assert f["name"] == name, (msg, number)
            assert f.get("proto3_optional") is True, (msg, name)
            assert f.get("oneof_index") == idx, (msg, name)
    # every synthetic oneof holds exactly one field (descriptor contract)
    for msg in (f"{m}.HistogramDataPoint", f"{m}.ExponentialHistogramDataPoint"):
        counts = {}
        for f in messages[msg]["fields"]:
            if "oneof_index" in f:
                counts[f["oneof_index"]] = counts.get(f["oneof_index"], 0) + 1
        assert counts == {0: 1, 1: 1, 2: 1}, msg


def test_partial_success_official_field_names():
    """Collector Export*PartialSuccess rejected-count fields must carry the
    official proto names (rejected_log_records / rejected_spans /
    rejected_data_points), not request-field-derived ones."""
    messages = _parse_set(pb_descriptor.build_descriptor_set())
    want = {
        "opentelemetry.proto.collector.logs.v1.ExportLogsPartialSuccess": "rejected_log_records",
        "opentelemetry.proto.collector.trace.v1.ExportTracePartialSuccess": "rejected_spans",
        "opentelemetry.proto.collector.metrics.v1.ExportMetricsPartialSuccess": "rejected_data_points",
    }
    for msg, fname in want.items():
        fields = {f["number"]: f["name"] for f in messages[msg]["fields"]}
        assert fields[1] == fname, msg
        assert fields[2] == "error_message", msg


def test_descriptor_artifact_is_current():
    """The checked-in otlp.desc must byte-match the generator (regenerate
    with `python -m otlp2parquet_spark.otel.pb_descriptor`)."""
    assert os.path.exists(pb_descriptor.DESC_PATH)
    with open(pb_descriptor.DESC_PATH, "rb") as f:
        assert f.read() == pb_descriptor.build_descriptor_set()


def test_request_message_names_resolve():
    messages = _parse_set(pb_descriptor.build_descriptor_set())
    for fq in pb_descriptor.REQUEST_MESSAGES.values():
        assert fq in messages


def test_severity_enum_values():
    """SeverityNumber must carry the full public 0..24 range with the
    official names (TRACE=1..4, DEBUG=5..8, ..., FATAL=21..24)."""
    vals = dict(pb_descriptor._SEVERITY_VALUES)
    assert vals["SEVERITY_NUMBER_UNSPECIFIED"] == 0
    assert vals["SEVERITY_NUMBER_TRACE"] == 1
    assert vals["SEVERITY_NUMBER_DEBUG"] == 5
    assert vals["SEVERITY_NUMBER_INFO"] == 9
    assert vals["SEVERITY_NUMBER_WARN"] == 13
    assert vals["SEVERITY_NUMBER_ERROR"] == 17
    assert vals["SEVERITY_NUMBER_FATAL"] == 21
    assert vals["SEVERITY_NUMBER_FATAL4"] == 24
    assert len(vals) == 25


def test_decode_logs_pb_falls_back_without_jar(spark, tmp_path):
    """Without the spark-protobuf jar, decode_logs_pb must produce the
    Python codec's exact output (the always-available lane)."""
    from otlp2parquet_spark.otel import ingest

    d = tmp_path / "landing"
    d.mkdir()
    (d / "logs.pb").write_bytes(open("/root/reference/testdata/logs.pb", "rb").read())
    payloads, _ = ingest.read_landing(spark, str(d))
    got = jvm_codec.decode_logs_pb(spark, payloads)
    want = ingest.decode_logs(payloads)
    assert sorted(map(tuple, got.collect()), key=repr) == sorted(
        map(tuple, want.collect()), key=repr
    )


def test_jvm_lane_parity_with_wire(spark, tmp_path):
    """Golden parity: JVM from_protobuf lane vs the Python wire codec on
    the reference logs fixture — cell-identical raw frames. Skips when the
    spark-protobuf jar is absent (pip pyspark does not bundle it; run under
    spark-submit --packages org.apache.spark:spark-protobuf_2.13:<version>
    to activate)."""
    from otlp2parquet_spark.otel import ingest

    if not jvm_codec.jvm_protobuf_available(spark):
        pytest.skip("spark-protobuf jar not on the JVM classpath")
    d = tmp_path / "landing"
    d.mkdir()
    (d / "logs.pb").write_bytes(open("/root/reference/testdata/logs.pb", "rb").read())
    payloads, _ = ingest.read_landing(spark, str(d))
    got = jvm_codec.decode_logs_pb_jvm(spark, payloads)
    want = ingest.decode_logs(payloads)
    assert sorted(map(tuple, got.collect()), key=repr) == sorted(
        map(tuple, want.collect()), key=repr
    )


def _minmax_metrics_payload() -> bytes:
    """A histogram request covering the min/max presence matrix: explicitly-
    sent 0.0, explicitly-sent nonzero, and absent. The JVM lane must
    distinguish 0.0-sent from absent exactly like the wire codec (the
    proto3_optional descriptor declaration carries the presence bit)."""
    from tests.test_wire_property import encode_message

    def dp(extra):
        return {
            "time_unix_nano": 1_700_000_000_000_000_000,
            "count": 4,
            "bucket_counts": [1, 3],
            "explicit_bounds": [5.0],
            **extra,
        }

    req = {
        "resource_metrics": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name", "value": {"string_value": "m"}}
                    ]
                },
                "scope_metrics": [
                    {
                        "scope": {"name": "s"},
                        "metrics": [
                            {
                                "name": "h",
                                "histogram": {
                                    "aggregation_temporality": 2,
                                    "data_points": [
                                        dp({"min": 0.0, "max": 0.0}),
                                        dp({"min": 1.5, "max": 9.5}),
                                        dp({}),  # min/max absent -> null
                                        dp({"sum": 12.5, "min": 0.0}),
                                    ],
                                },
                            }
                        ],
                    }
                ],
            }
        ]
    }
    return encode_message(req, "ExportMetricsServiceRequest")


def test_jvm_metrics_minmax_parity_with_wire(spark):
    """Gated parity (needs the spark-protobuf jar): the JVM metrics lane
    must reproduce the wire codec's presence-exact Min/Max — null for
    absent, 0.0 for explicitly-sent zero."""
    from otlp2parquet_spark.otel import ingest

    if not jvm_codec.jvm_protobuf_available(spark):
        pytest.skip("spark-protobuf jar not on the JVM classpath")
    payloads = spark.createDataFrame(
        [("", bytearray(_minmax_metrics_payload()), "pb")],
        "path string, content binary, fmt string",
    )
    got = ingest.metrics_table(
        jvm_codec.decode_metrics_pb_jvm(spark, payloads), "histogram"
    )
    want = ingest.metrics_table(ingest.decode_metrics_union(payloads), "histogram")
    a = sorted(map(tuple, got.collect()), key=repr)
    b = sorted(map(tuple, want.collect()), key=repr)
    assert a == b and len(a) == 4
    # the presence matrix itself: one (null,null) row, one (0.0,0.0) row
    mins = sorted(repr(r["Min"]) for r in want.collect())
    assert mins == ["0.0", "0.0", "1.5", "None"]
