"""OTLP tree -> flat table rows (SURVEY.md §1.3 value-encoding semantics,
reference D8-D14; ground truth = /root/reference/testdata/parquet golden files).

Input is the canonical dict produced by wire.py / otlp_json.py. Output rows
use the *raw* schemas of schemas.py: timestamps as epoch-microsecond int64
(exact ns//1000 truncation, reference src/writer/write.rs:24), attribute maps
as canonical JSON strings (sorted keys, compact separators, UTF-8 —
reference golden files §1.3.5), ids binary (logs) / lowercase hex (traces).
"""

from __future__ import annotations

import json
import math
from typing import Any

from otlp2parquet_spark.otel.otlp_json import SPAN_KIND, STATUS_CODE
from otlp2parquet_spark.otel.wire import OtlpDecodeError

_SPAN_KIND_NAME = {v: k for k, v in SPAN_KIND.items()}
_STATUS_CODE_NAME = {v: k for k, v in STATUS_CODE.items()}


def anyvalue_to_py(v: dict[str, Any] | None) -> Any:
    """OTLP AnyValue -> plain Python value (JSON-encodable)."""
    if not v:
        return None
    if "string_value" in v:
        return v["string_value"]
    if "bool_value" in v:
        return v["bool_value"]
    if "int_value" in v:
        return v["int_value"]
    if "double_value" in v:
        return v["double_value"]
    if "array_value" in v:
        return [anyvalue_to_py(x) for x in v["array_value"].get("values", [])]
    if "kvlist_value" in v:
        return {kv.get("key", ""): anyvalue_to_py(kv.get("value")) for kv in v["kvlist_value"].get("values", [])}
    if "bytes_value" in v:
        import base64

        return base64.b64encode(v["bytes_value"]).decode("ascii")
    return None


def canonical_json(obj: Any) -> str:
    """serde_json-compatible canonical encoding: sorted keys, compact,
    raw UTF-8 (reference golden files sort attribute keys lexicographically)."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def attrs_to_json(attrs: list[dict[str, Any]] | None) -> str:
    """KeyValue list -> sorted JSON object string; empty -> '{}' (§1.3.5)."""
    if not attrs:
        return "{}"
    return canonical_json({kv.get("key", ""): anyvalue_to_py(kv.get("value")) for kv in attrs})


def encode_body(v: dict[str, Any] | None) -> str | None:
    """Log Body: JSON-encoded AnyValue; plain string becomes a quoted JSON
    string (§1.3.4); absent body -> NULL."""
    if not v:
        return None
    return canonical_json(anyvalue_to_py(v))


def _ns_to_us(ns: int | None) -> int:
    return 0 if not ns else int(ns) // 1000


def _opt(s: str | None) -> str | None:
    """proto3 string default '' -> NULL for nullable columns (golden files
    show None, never '' in ScopeVersion/StatusMessage/...)."""
    return s if s else None


def _attr_map(attrs: list[dict[str, Any]] | None) -> dict[str, Any]:
    return {kv.get("key", ""): anyvalue_to_py(kv.get("value")) for kv in (attrs or [])}


def _check_id(raw: bytes, want: int, what: str) -> bytes:
    if raw and len(raw) != want:
        raise OtlpDecodeError(f"invalid {what} length {len(raw)} (want {want})")
    # absent id -> zero-filled full-width bytes (golden logs.parquet rows
    # without trace context carry 16/8 zero bytes, not empty)
    return raw if raw else b"\x00" * want


# ---------------------------------------------------------------------------
# Logs (D8, D11-D14; golden testdata/parquet/logs.parquet)


def flatten_logs(req: dict[str, Any]) -> list[dict[str, Any]]:
    rows: list[dict[str, Any]] = []
    for rl in req.get("resource_logs", []):
        res = rl.get("resource", {})
        rattrs = _attr_map(res.get("attributes"))
        # signal-dependent service extraction (§1.3.6): logs promote all
        # three service.* keys and REMOVE them from the attr map
        service_name = rattrs.pop("service.name", None)
        service_ns = rattrs.pop("service.namespace", None)
        service_iid = rattrs.pop("service.instance.id", None)
        res_attrs_json = canonical_json(rattrs) if rattrs else "{}"
        res_schema = _opt(rl.get("schema_url"))
        for sl in rl.get("scope_logs", []):
            scope = sl.get("scope", {})
            scope_attrs = attrs_to_json(scope.get("attributes"))
            for rec in sl.get("log_records", []):
                ts_us = _ns_to_us(rec.get("time_unix_nano"))
                rows.append(
                    {
                        "Timestamp": ts_us,
                        "TraceId": _check_id(rec.get("trace_id", b""), 16, "trace id"),
                        "SpanId": _check_id(rec.get("span_id", b""), 8, "span id"),
                        "ServiceName": service_name if service_name is not None else "",
                        "ServiceNamespace": service_ns,
                        "ServiceInstanceId": service_iid,
                        "ResourceAttributes": res_attrs_json,
                        "ResourceSchemaUrl": res_schema,
                        "ScopeName": scope.get("name", ""),
                        "ScopeVersion": _opt(scope.get("version")),
                        "ScopeAttributes": scope_attrs,
                        "ScopeSchemaUrl": _opt(sl.get("schema_url")),
                        "TimestampTime": ts_us,  # == Timestamp in golden (§1.3.2)
                        "ObservedTimestamp": _ns_to_us(rec.get("observed_time_unix_nano")),
                        "TraceFlags": int(rec.get("flags", 0)),
                        "SeverityText": rec.get("severity_text", ""),
                        "SeverityNumber": int(rec.get("severity_number", 0)),
                        "Body": encode_body(rec.get("body")),
                        "LogAttributes": attrs_to_json(rec.get("attributes")),
                    }
                )
    return rows


# ---------------------------------------------------------------------------
# Traces (D9; golden testdata/parquet/traces.parquet)


def flatten_traces(req: dict[str, Any]) -> list[dict[str, Any]]:
    rows: list[dict[str, Any]] = []
    for rs in req.get("resource_spans", []):
        res = rs.get("resource", {})
        rattrs = _attr_map(res.get("attributes"))
        # traces promote only service.name, but remove all three service.*
        # keys from the map (golden traces.parquet drops service.namespace
        # despite having no column for it)
        service_name = rattrs.pop("service.name", None)
        rattrs.pop("service.namespace", None)
        rattrs.pop("service.instance.id", None)
        res_attrs_json = canonical_json(rattrs) if rattrs else "{}"
        for ss in rs.get("scope_spans", []):
            scope = ss.get("scope", {})
            for span in ss.get("spans", []):
                start = int(span.get("start_time_unix_nano", 0))
                end = int(span.get("end_time_unix_nano", 0))
                status = span.get("status", {})
                events = span.get("events", [])
                links = span.get("links", [])
                parent = _check_id(span.get("parent_span_id", b""), 8, "parent span id")
                kind = span.get("kind", 0)
                kind_name = _SPAN_KIND_NAME.get(kind)
                if kind_name is None:
                    raise OtlpDecodeError(f"invalid span kind: {kind}")
                code = status.get("code", 0)
                code_name = _STATUS_CODE_NAME.get(code)
                if code_name is None:
                    raise OtlpDecodeError(f"invalid status code: {code}")
                rows.append(
                    {
                        "Timestamp": start // 1000,
                        "TraceId": _check_id(span.get("trace_id", b""), 16, "trace id").hex(),
                        "SpanId": _check_id(span.get("span_id", b""), 8, "span id").hex(),
                        "ServiceName": service_name,
                        "ResourceAttributes": res_attrs_json,
                        "ScopeName": _opt(scope.get("name")),
                        "ScopeVersion": _opt(scope.get("version")),
                        "ParentSpanId": parent.hex() if parent.strip(b"\x00") else None,
                        "TraceState": _opt(span.get("trace_state")),
                        "SpanName": span.get("name", ""),
                        "SpanKind": kind_name,
                        "SpanAttributes": attrs_to_json(span.get("attributes")),
                        "Duration": end - start,  # nanoseconds (§1.3.9)
                        "StatusCode": code_name,
                        "StatusMessage": _opt(status.get("message")),
                        "EventsTimestamp": [_ns_to_us(e.get("time_unix_nano")) for e in events],
                        "EventsName": [e.get("name", "") for e in events],
                        "EventsAttributes": [attrs_to_json(e.get("attributes")) for e in events],
                        "LinksTraceId": [
                            _check_id(ln.get("trace_id", b""), 16, "link trace id").hex()
                            for ln in links
                        ],
                        "LinksSpanId": [
                            _check_id(ln.get("span_id", b""), 8, "link span id").hex()
                            for ln in links
                        ],
                        "LinksTraceState": [_opt(ln.get("trace_state")) for ln in links],
                        "LinksAttributes": [attrs_to_json(ln.get("attributes")) for ln in links],
                    }
                )
    return rows


# ---------------------------------------------------------------------------
# Metrics (D10; type split + skip accounting, reference src/codec.rs:15-26,54-75)

SKIP_KEYS = ("summaries", "nan_values", "infinity_values", "missing_values")


def flatten_metrics(
    req: dict[str, Any],
) -> tuple[dict[str, list[dict[str, Any]]], dict[str, int]]:
    """Returns ({metric_type: rows} incl. 'summary', skipped counters).

    The server pipeline persists only gauge/sum/histogram/exponential_histogram
    and counts summary points in skipped.summaries — the summary rows are
    still returned here so callers with a summary sink (the golden schema
    exists) can use them; `ingest` drops them by default like the reference.
    NaN / ±Inf / missing number values are dropped and counted (§1.3.12).
    """
    out: dict[str, list[dict[str, Any]]] = {
        "gauge": [],
        "sum": [],
        "histogram": [],
        "exponential_histogram": [],
        "summary": [],
    }
    skipped = dict.fromkeys(SKIP_KEYS, 0)
    for rm in req.get("resource_metrics", []):
        res = rm.get("resource", {})
        rattrs = _attr_map(res.get("attributes"))
        # metrics promote service.name but KEEP it in the map (§1.3.6)
        service_name = rattrs.get("service.name", "")
        res_attrs_json = canonical_json(rattrs) if rattrs else "{}"
        for sm in rm.get("scope_metrics", []):
            scope = sm.get("scope", {})
            for metric in sm.get("metrics", []):
                base = {
                    "ServiceName": service_name if isinstance(service_name, str) else "",
                    "ResourceAttributes": res_attrs_json,
                    "ScopeName": _opt(scope.get("name")),
                    "ScopeVersion": _opt(scope.get("version")),
                    "MetricName": metric.get("name", ""),
                    "MetricDescription": _opt(metric.get("description")),
                    "MetricUnit": _opt(metric.get("unit")),
                }
                if "gauge" in metric:
                    _number_points(metric["gauge"], base, None, out["gauge"], skipped)
                elif "sum" in metric:
                    s = metric["sum"]
                    temporality = s.get("aggregation_temporality", 0)
                    if not isinstance(temporality, int) or temporality not in (0, 1, 2):
                        raise OtlpDecodeError(f"invalid aggregation temporality: {temporality}")
                    extra = {
                        "AggregationTemporality": temporality,
                        "IsMonotonic": bool(s.get("is_monotonic", False)),
                    }
                    _number_points(s, base, extra, out["sum"], skipped)
                elif "histogram" in metric:
                    for dp in metric["histogram"].get("data_points", []):
                        out["histogram"].append(
                            base
                            | _dp_common(dp)
                            | {
                                "Count": int(dp.get("count", 0)),
                                "Sum": float(dp.get("sum", 0.0)),
                                "BucketCounts": [int(c) for c in dp.get("bucket_counts", [])],
                                "ExplicitBounds": [float(b) for b in dp.get("explicit_bounds", [])],
                                "Min": dp.get("min"),
                                "Max": dp.get("max"),
                            }
                        )
                elif "exponential_histogram" in metric:
                    for dp in metric["exponential_histogram"].get("data_points", []):
                        pos = dp.get("positive", {})
                        neg = dp.get("negative", {})
                        out["exponential_histogram"].append(
                            base
                            | _dp_common(dp)
                            | {
                                "Count": int(dp.get("count", 0)),
                                "Sum": float(dp.get("sum", 0.0)),
                                "Scale": int(dp.get("scale", 0)),
                                "ZeroCount": int(dp.get("zero_count", 0)),
                                "PositiveOffset": int(pos.get("offset", 0)),
                                "PositiveBucketCounts": [int(c) for c in pos.get("bucket_counts", [])],
                                "NegativeOffset": int(neg.get("offset", 0)),
                                "NegativeBucketCounts": [int(c) for c in neg.get("bucket_counts", [])],
                                "Min": dp.get("min"),
                                "Max": dp.get("max"),
                            }
                        )
                elif "summary" in metric:
                    for dp in metric["summary"].get("data_points", []):
                        skipped["summaries"] += 1
                        qs = dp.get("quantile_values", [])
                        out["summary"].append(
                            base
                            | _dp_common(dp)
                            | {
                                "Count": int(dp.get("count", 0)),
                                "Sum": float(dp.get("sum", 0.0)),
                                "QuantileValues": [float(q.get("value", 0.0)) for q in qs],
                                "QuantileQuantiles": [float(q.get("quantile", 0.0)) for q in qs],
                            }
                        )
                # metric with no data payload: nothing to emit
    return out, skipped


def _dp_common(dp: dict[str, Any]) -> dict[str, Any]:
    return {
        "Timestamp": _ns_to_us(dp.get("time_unix_nano")),
        "Attributes": attrs_to_json(dp.get("attributes")),
    }


def _number_points(
    container: dict[str, Any],
    base: dict[str, Any],
    extra: dict[str, Any] | None,
    out: list[dict[str, Any]],
    skipped: dict[str, int],
) -> None:
    for dp in container.get("data_points", []):
        if "as_double" in dp:
            val = float(dp["as_double"])
        elif "as_int" in dp:
            val = float(dp["as_int"])  # as_int coerced to double (§1.3.11)
        else:
            skipped["missing_values"] += 1
            continue
        if math.isnan(val):
            skipped["nan_values"] += 1
            continue
        if math.isinf(val):
            skipped["infinity_values"] += 1
            continue
        row = base | _dp_common(dp) | {"Value": val}
        if extra:
            row |= extra
        out.append(row)
