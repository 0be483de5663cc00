"""Fused OTLP/protobuf -> flat rows for ALL pb signals (logs, traces, metrics).

Companion to fast_flatten.py (the JSON edition of the same idea): the
two-step lane (wire.decode_message -> canonical dict -> flatten) spends
most of its time building and tearing down per-attribute KeyValue/AnyValue
dicts — ~12k rows/s/core on the replicated logs.pb fixture. This walker
decodes the wire bytes straight into flat rows: offsets into the original
buffer, no intermediate tree, canonical-JSON attrs built from plain Python
values in one pass.

Semantic authority stays with the slow pair; parity is enforced by the
differential Hypothesis suite in tests/test_fast_wire.py, including
wire-order permutations (fields of a message may arrive in any order) and
slow-lane quirks kept bug-for-bug:

- unknown fields AND known fields on a mismatched wire type are skipped
  (dispatch is on the full tag, exactly like wire._COMPILED);
- re-occurring scalar/message fields: last occurrence wins outright (the
  slow lane does not do proto3 message-merge);
- a multi-member AnyValue resolves by member PRIORITY (string > bool >
  int > double > array > kvlist > bytes — flatten.anyvalue_to_py's key
  check order), not wire order.

Reference wire semantics: src/codec.rs:34-75 (prost decode), golden
fixtures testdata/*.pb.
"""

from __future__ import annotations

import base64
import struct
from typing import Any

from otlp2parquet_spark.otel.fast_flatten import _canon
from otlp2parquet_spark.otel.wire import OtlpDecodeError

_unpack_from = struct.unpack_from

_EMPTY = object()  # AnyValue with no known member (encodes as NULL/None)

_ZERO16 = b"\x00" * 16
_ZERO8 = b"\x00" * 8


def _varint(buf: bytes, pos: int, end: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= end:
            raise OtlpDecodeError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise OtlpDecodeError("varint too long")


def _skip(buf: bytes, pos: int, end: int, wire: int) -> int:
    if wire == 0:
        if pos >= end:
            raise OtlpDecodeError("truncated varint")
        if buf[pos] < 0x80:
            return pos + 1
        _, pos = _varint(buf, pos, end)
        return pos
    if wire == 2:
        length, pos = _varint(buf, pos, end)
        pos += length
        if pos > end:
            raise OtlpDecodeError("truncated length-delimited field")
        return pos
    if wire == 1 or wire == 5:
        pos += 8 if wire == 1 else 4
        if pos > end:
            raise OtlpDecodeError("truncated fixed field")
        return pos
    raise OtlpDecodeError(f"unsupported wire type {wire}")


def _len_prefixed(buf: bytes, pos: int, end: int) -> tuple[int, int]:
    """-> (start, end_of_field); caller resumes at end_of_field."""
    if pos >= end:
        raise OtlpDecodeError("truncated varint")
    b = buf[pos]
    if b < 0x80:
        length = b
        pos += 1
    else:
        length, pos = _varint(buf, pos, end)
    npos = pos + length
    if npos > end:
        raise OtlpDecodeError("truncated length-delimited field")
    return pos, npos


def _utf8(buf: bytes, pos: int, end: int, label: str) -> str:
    try:
        return buf[pos:end].decode("utf-8")
    except UnicodeDecodeError as e:
        raise OtlpDecodeError(f"invalid utf-8 in {label}") from e


def _anyvalue(buf: bytes, pos: int, end: int) -> Any:
    """AnyValue message bytes -> plain Python value, or _EMPTY when no
    known member is present. Member priority mirrors anyvalue_to_py."""
    s = b = i = d = arr = kvl = by = _EMPTY
    while pos < end:
        tag = buf[pos]
        if tag < 0x80:
            pos += 1
        else:
            tag, pos = _varint(buf, pos, end)
        if tag == 0x0A:  # string_value
            p, npos = _len_prefixed(buf, pos, end)
            s = _utf8(buf, p, npos, "AnyValue.string_value")
            pos = npos
        elif tag == 0x10:  # bool_value varint
            v, pos = _varint(buf, pos, end)
            b = v != 0
        elif tag == 0x18:  # int_value varint (signed-64 normalize)
            v, pos = _varint(buf, pos, end)
            i = v - 0x10000000000000000 if v >= 0x8000000000000000 else v
        elif tag == 0x21:  # double_value fixed64
            if pos + 8 > end:
                raise OtlpDecodeError("truncated fixed field")
            d = _unpack_from("<d", buf, pos)[0]
            pos += 8
        elif tag == 0x2A:  # array_value msg
            p, npos = _len_prefixed(buf, pos, end)
            vals = []
            while p < npos:
                t2 = buf[p]
                if t2 < 0x80:
                    p += 1
                else:
                    t2, p = _varint(buf, p, npos)
                if t2 == 0x0A:  # values
                    q, nq = _len_prefixed(buf, p, npos)
                    v = _anyvalue(buf, q, nq)
                    vals.append(None if v is _EMPTY else v)
                    p = nq
                else:
                    p = _skip(buf, p, npos, t2 & 7)
            arr = vals
            pos = npos
        elif tag == 0x32:  # kvlist_value msg
            p, npos = _len_prefixed(buf, pos, end)
            m: dict[str, Any] = {}
            while p < npos:
                t2 = buf[p]
                if t2 < 0x80:
                    p += 1
                else:
                    t2, p = _varint(buf, p, npos)
                if t2 == 0x0A:  # values (KeyValue)
                    q, nq = _len_prefixed(buf, p, npos)
                    k, v = _keyvalue(buf, q, nq)
                    m[k] = v
                    p = nq
                else:
                    p = _skip(buf, p, npos, t2 & 7)
            kvl = m
            pos = npos
        elif tag == 0x3A:  # bytes_value
            p, npos = _len_prefixed(buf, pos, end)
            by = base64.b64encode(buf[p:npos]).decode("ascii")
            pos = npos
        else:
            pos = _skip(buf, pos, end, tag & 7)
    if s is not _EMPTY:
        return s
    if b is not _EMPTY:
        return b
    if i is not _EMPTY:
        return i
    if d is not _EMPTY:
        return d
    if arr is not _EMPTY:
        return arr
    if kvl is not _EMPTY:
        return kvl
    if by is not _EMPTY:
        return by
    return _EMPTY


def _keyvalue(buf: bytes, pos: int, end: int) -> tuple[str, Any]:
    key = ""
    vrange = None
    while pos < end:
        tag = buf[pos]
        if tag < 0x80:
            pos += 1
        else:
            tag, pos = _varint(buf, pos, end)
        if tag == 0x0A:  # key
            p, npos = _len_prefixed(buf, pos, end)
            key = _utf8(buf, p, npos, "KeyValue.key")
            pos = npos
        elif tag == 0x12:  # value (last occurrence wins)
            vrange = _len_prefixed(buf, pos, end)
            pos = vrange[1]
        else:
            pos = _skip(buf, pos, end, tag & 7)
    if vrange is None:
        return key, None
    v = _anyvalue(buf, vrange[0], vrange[1])
    return key, (None if v is _EMPTY else v)


def _attrs(buf: bytes, ranges: list[tuple[int, int]]) -> dict[str, Any]:
    m: dict[str, Any] = {}
    for p, e in ranges:
        k, v = _keyvalue(buf, p, e)
        m[k] = v
    return m


# --- decode memo ------------------------------------------------------------
# Telemetry attribute blocks are massively repetitive: every record in a
# resource block shares ResourceAttributes/Scope, and log/span attribute
# sets recur across records (the same redundancy OTel-Arrow exploits with
# dictionary encoding and ClickHouse with LowCardinality). The mappings
# below are PURE functions of the wire bytes, so a bytes-keyed memo is
# semantically transparent (differential suites in test_fast_wire.py hold
# bit-for-bit) and turns the dominant attrs->canonical-JSON decode into a
# dict hit on repeated blocks. Caches are module-level (they survive across
# payloads inside one long-lived Spark worker) and bounded TWO ways: entry
# count (clear-at-cap, amortized O(1) per miss) AND per-entry key size —
# slices above _MEMO_MAX_KEY bytes are decoded without caching, because
# large bodies/attr blocks are exactly the ones least likely to repeat and
# most able to blow up worker memory (16384 entries x ~2 KiB keys + values
# bounds each memo at ~tens of MB even adversarially; typical telemetry
# attr blocks are <300 B).
_MEMO_CAP = 1 << 14
_MEMO_MAX_KEY = 2048
_ATTRS_MEMO: dict[tuple, str] = {}
_VALUE_MEMO: dict[bytes, str | None] = {}


def _memo_evict_half(memo: dict) -> None:
    """At-cap eviction: drop the least-recently-USED half instead of
    clearing — clear-at-cap rebuilt the whole memo repeatedly on streams
    whose attr diversity exceeds the cap, turning steady-state hits into
    periodic all-miss latency spikes (ADVICE r6). Same amortized O(1) per
    miss (CAP/2 deletions every CAP/2 misses). _memo_get re-inserts on hit,
    so dict insertion order IS recency order: a hot working set that
    arrived early still survives the cut (plain insertion-order eviction
    would drop it wholesale at the first cap crossing)."""
    from itertools import islice

    for k in list(islice(memo, len(memo) // 2)):
        del memo[k]


_MEMO_MISS = object()  # sentinel: memo values may legitimately be None


def _memo_get(memo: dict, key):
    """Lookup with an LRU touch: on hit the entry re-inserts at the end so
    dict order tracks use recency for _memo_evict_half. Returns _MEMO_MISS
    when absent."""
    try:
        val = memo.pop(key)
    except KeyError:
        return _MEMO_MISS
    memo[key] = val
    return val


def _attrs_json_memo(buf: bytes, ranges: list[tuple[int, int]]) -> str:
    """Attribute KeyValue ranges -> canonical JSON, memoized.

    The key is (per-range lengths, concatenated payload bytes): the split
    sizes disambiguate range boundaries, so two different range lists can
    never collide on the same key with different decodes."""
    sizes = tuple(e - p for p, e in ranges)
    if sum(sizes) > _MEMO_MAX_KEY:
        return _canon(_attrs(buf, ranges))
    key = (sizes, b"".join(buf[p:e] for p, e in ranges))
    out = _memo_get(_ATTRS_MEMO, key)
    if out is _MEMO_MISS:
        out = _canon(_attrs(buf, ranges))
        if len(_ATTRS_MEMO) >= _MEMO_CAP:
            _memo_evict_half(_ATTRS_MEMO)
        _ATTRS_MEMO[key] = out
    return out


def _body_json_memo(buf: bytes, pos: int, end: int) -> str | None:
    """AnyValue body bytes -> canonical JSON (None for empty), memoized."""
    if end - pos > _MEMO_MAX_KEY:
        v = _anyvalue(buf, pos, end)
        return None if v is _EMPTY else _canon(v)
    key = buf[pos:end]
    out = _memo_get(_VALUE_MEMO, key)
    if out is not _MEMO_MISS:
        return out
    v = _anyvalue(buf, pos, end)
    out = None if v is _EMPTY else _canon(v)
    if len(_VALUE_MEMO) >= _MEMO_CAP:
        _memo_evict_half(_VALUE_MEMO)
    _VALUE_MEMO[key] = out
    return out


_SCOPE_MEMO: dict[tuple[bytes, bool], tuple[str, str | None, str]] = {}
_RESOURCE_MEMO: dict[bytes, tuple] = {}


def _scope_fields_memo(
    buf: bytes, pos: int, end: int, *, with_attrs: bool = True
) -> tuple[str, str | None, str]:
    if end - pos > _MEMO_MAX_KEY:
        return _scope_fields(buf, pos, end, with_attrs=with_attrs)
    key = (buf[pos:end], with_attrs)
    out = _memo_get(_SCOPE_MEMO, key)
    if out is _MEMO_MISS:
        out = _scope_fields(buf, pos, end, with_attrs=with_attrs)
        if len(_SCOPE_MEMO) >= _MEMO_CAP:
            _memo_evict_half(_SCOPE_MEMO)
        _SCOPE_MEMO[key] = out
    return out


def _resource_attr_ranges(buf: bytes, pos: int, end: int) -> list[tuple[int, int]]:
    attr_ranges: list[tuple[int, int]] = []
    p, e = pos, end
    while p < e:
        t = buf[p]
        if t < 0x80:
            p += 1
        else:
            t, p = _varint(buf, p, e)
        if t == 0x0A:
            r = _len_prefixed(buf, p, e)
            attr_ranges.append(r)
            p = r[1]
        else:
            p = _skip(buf, p, e, t & 7)
    return attr_ranges


def _resource_fields(buf: bytes, pos: int, end: int) -> tuple:
    rattrs = _attrs(buf, _resource_attr_ranges(buf, pos, end))
    service_name = rattrs.pop("service.name", None)
    service_ns = rattrs.pop("service.namespace", None)
    service_iid = rattrs.pop("service.instance.id", None)
    return (
        service_name,
        service_ns,
        service_iid,
        _canon(rattrs) if rattrs else "{}",
    )


def _resource_fields_memo(
    buf: bytes, pos: int, end: int
) -> tuple[str | None, str | None, str | None, str]:
    """Resource message -> (service.name, service.namespace,
    service.instance.id, remaining-attrs canonical JSON), memoized on the
    raw message bytes (one resource serves every record in its block)."""
    if end - pos > _MEMO_MAX_KEY:
        return _resource_fields(buf, pos, end)
    key = buf[pos:end]
    out = _memo_get(_RESOURCE_MEMO, key)
    if out is _MEMO_MISS:
        out = _resource_fields(buf, pos, end)
        if len(_RESOURCE_MEMO) >= _MEMO_CAP:
            _memo_evict_half(_RESOURCE_MEMO)
        _RESOURCE_MEMO[key] = out
    return out


_MRES_MEMO: dict[bytes, tuple[str, str]] = {}


def _metrics_resource(buf: bytes, pos: int, end: int) -> tuple[str, str]:
    rattrs = _attrs(buf, _resource_attr_ranges(buf, pos, end))
    service_name = rattrs.get("service.name", "")
    return (
        service_name if isinstance(service_name, str) else "",
        _canon(rattrs) if rattrs else "{}",
    )


def _metrics_resource_memo(buf: bytes, pos: int, end: int) -> tuple[str, str]:
    """Metrics variant: service.name STAYS in the attrs map (§1.3.6);
    -> (service-or-"", full-attrs canonical JSON), memoized."""
    if end - pos > _MEMO_MAX_KEY:
        return _metrics_resource(buf, pos, end)
    key = buf[pos:end]
    out = _memo_get(_MRES_MEMO, key)
    if out is _MEMO_MISS:
        out = _metrics_resource(buf, pos, end)
        if len(_MRES_MEMO) >= _MEMO_CAP:
            _memo_evict_half(_MRES_MEMO)
        _MRES_MEMO[key] = out
    return out


def _scope_fields(
    buf: bytes, pos: int, end: int, *, with_attrs: bool = True
) -> tuple[str, str | None, str]:
    """InstrumentationScope -> (name, version-or-None, attrs_json).

    Traces/metrics rows carry no ScopeAttributes column — those callers
    pass with_attrs=False so scope attributes are skipped as opaque
    ranges instead of decoded + canonical-JSON-encoded and thrown away."""
    name = ""
    version: str | None = None
    attr_ranges: list[tuple[int, int]] = []
    while pos < end:
        tag = buf[pos]
        if tag < 0x80:
            pos += 1
        else:
            tag, pos = _varint(buf, pos, end)
        if tag == 0x0A:
            p, npos = _len_prefixed(buf, pos, end)
            name = _utf8(buf, p, npos, "InstrumentationScope.name")
            pos = npos
        elif tag == 0x12:
            p, npos = _len_prefixed(buf, pos, end)
            version = _utf8(buf, p, npos, "InstrumentationScope.version") or None
            pos = npos
        elif tag == 0x1A and with_attrs:
            r = _len_prefixed(buf, pos, end)
            attr_ranges.append(r)
            pos = r[1]
        else:
            pos = _skip(buf, pos, end, tag & 7)
    attrs_json = _canon(_attrs(buf, attr_ranges)) if attr_ranges else "{}"
    return name, version, attrs_json


def _check_id(raw: bytes, want: int, what: str, zero: bytes) -> bytes:
    if raw and len(raw) != want:
        raise OtlpDecodeError(f"invalid {what} length {len(raw)} (want {want})")
    return raw if raw else zero


def flatten_logs_pb(body: bytes) -> list[dict[str, Any]]:
    """One ExportLogsServiceRequest protobuf -> flat rows (== slow pair)."""
    try:
        return _flatten_logs_pb(body)
    except OtlpDecodeError:
        raise
    except Exception as e:  # struct errors etc. — parse_request_pb parity
        raise OtlpDecodeError(f"malformed protobuf: {e}") from e


def _flatten_logs_pb(body: bytes) -> list[dict[str, Any]]:
    rows: list[dict[str, Any]] = []
    end0 = len(body)
    pos0 = 0
    while pos0 < end0:
        tag = body[pos0]
        if tag < 0x80:
            pos0 += 1
        else:
            tag, pos0 = _varint(body, pos0, end0)
        if tag != 0x0A:  # not resource_logs
            pos0 = _skip(body, pos0, end0, tag & 7)
            continue
        rl_start, rl_end = _len_prefixed(body, pos0, end0)
        pos0 = rl_end

        # --- ResourceLogs: buffer sub-ranges first (wire order is free) ---
        res_range = None
        rl_schema: str | None = None
        sl_ranges: list[tuple[int, int]] = []
        p = rl_start
        while p < rl_end:
            t = body[p]
            if t < 0x80:
                p += 1
            else:
                t, p = _varint(body, p, rl_end)
            if t == 0x0A:  # resource (last wins)
                res_range = _len_prefixed(body, p, rl_end)
                p = res_range[1]
            elif t == 0x12:  # scope_logs
                r = _len_prefixed(body, p, rl_end)
                sl_ranges.append(r)
                p = r[1]
            elif t == 0x1A:  # schema_url (last wins)
                q, nq = _len_prefixed(body, p, rl_end)
                rl_schema = _utf8(body, q, nq, "ResourceLogs.schema_url") or None
                p = nq
            else:
                p = _skip(body, p, rl_end, t & 7)

        if res_range is not None:
            service_name, service_ns, service_iid, res_attrs_json = (
                _resource_fields_memo(body, res_range[0], res_range[1])
            )
        else:
            service_name = service_ns = service_iid = None
            res_attrs_json = "{}"
        svc = service_name if service_name is not None else ""

        for sl_start, sl_end in sl_ranges:
            scope_range = None
            sl_schema: str | None = None
            rec_ranges: list[tuple[int, int]] = []
            p = sl_start
            while p < sl_end:
                t = body[p]
                if t < 0x80:
                    p += 1
                else:
                    t, p = _varint(body, p, sl_end)
                if t == 0x0A:  # scope (last wins)
                    scope_range = _len_prefixed(body, p, sl_end)
                    p = scope_range[1]
                elif t == 0x12:  # log_records
                    r = _len_prefixed(body, p, sl_end)
                    rec_ranges.append(r)
                    p = r[1]
                elif t == 0x1A:  # schema_url
                    q, nq = _len_prefixed(body, p, sl_end)
                    sl_schema = _utf8(body, q, nq, "ScopeLogs.schema_url") or None
                    p = nq
                else:
                    p = _skip(body, p, sl_end, t & 7)
            if scope_range is not None:
                scope_name, scope_version, scope_attrs = _scope_fields_memo(
                    body, scope_range[0], scope_range[1]
                )
            else:
                scope_name, scope_version, scope_attrs = "", None, "{}"

            for r_start, r_end in rec_ranges:
                ts_ns = 0
                obs_ns = 0
                sev_no = 0
                sev_text = ""
                body_range = None
                attr_ranges = []
                flags = 0
                trace_id = b""
                span_id = b""
                p = r_start
                while p < r_end:
                    t = body[p]
                    if t < 0x80:
                        p += 1
                    else:
                        t, p = _varint(body, p, r_end)
                    if t == 0x09:  # time_unix_nano fixed64
                        if p + 8 > r_end:
                            raise OtlpDecodeError("truncated fixed field")
                        ts_ns = _unpack_from("<Q", body, p)[0]
                        p += 8
                    elif t == 0x10:  # severity_number enum varint
                        v, p = _varint(body, p, r_end)
                        sev_no = v - 0x10000000000000000 if v >= 0x8000000000000000 else v
                    elif t == 0x1A:  # severity_text
                        q, nq = _len_prefixed(body, p, r_end)
                        sev_text = _utf8(body, q, nq, "LogRecord.severity_text")
                        p = nq
                    elif t == 0x2A:  # body (last wins)
                        body_range = _len_prefixed(body, p, r_end)
                        p = body_range[1]
                    elif t == 0x32:  # attributes
                        r = _len_prefixed(body, p, r_end)
                        attr_ranges.append(r)
                        p = r[1]
                    elif t == 0x45:  # flags fixed32
                        if p + 4 > r_end:
                            raise OtlpDecodeError("truncated fixed field")
                        flags = _unpack_from("<I", body, p)[0]
                        p += 4
                    elif t == 0x4A:  # trace_id bytes
                        q, nq = _len_prefixed(body, p, r_end)
                        trace_id = body[q:nq]
                        p = nq
                    elif t == 0x52:  # span_id bytes
                        q, nq = _len_prefixed(body, p, r_end)
                        span_id = body[q:nq]
                        p = nq
                    elif t == 0x59:  # observed_time_unix_nano fixed64
                        if p + 8 > r_end:
                            raise OtlpDecodeError("truncated fixed field")
                        obs_ns = _unpack_from("<Q", body, p)[0]
                        p += 8
                    else:
                        p = _skip(body, p, r_end, t & 7)
                if body_range is not None:
                    body_out = _body_json_memo(body, body_range[0], body_range[1])
                else:
                    body_out = None
                ts_us = ts_ns // 1000 if ts_ns else 0
                rows.append(
                    {
                        "Timestamp": ts_us,
                        "TraceId": _check_id(trace_id, 16, "trace id", _ZERO16),
                        "SpanId": _check_id(span_id, 8, "span id", _ZERO8),
                        "ServiceName": svc,
                        "ServiceNamespace": service_ns,
                        "ServiceInstanceId": service_iid,
                        "ResourceAttributes": res_attrs_json,
                        "ResourceSchemaUrl": rl_schema,
                        "ScopeName": scope_name,
                        "ScopeVersion": scope_version,
                        "ScopeAttributes": scope_attrs,
                        "ScopeSchemaUrl": sl_schema,
                        "TimestampTime": ts_us,
                        "ObservedTimestamp": obs_ns // 1000 if obs_ns else 0,
                        "TraceFlags": flags,
                        "SeverityText": sev_text,
                        "SeverityNumber": sev_no,
                        "Body": body_out,
                        "LogAttributes": _attrs_json_memo(body, attr_ranges)
                        if attr_ranges
                        else "{}",
                    }
                )
    return rows


# ---------------------------------------------------------------------------
# Traces


def flatten_traces_pb(body: bytes) -> list[dict[str, Any]]:
    """One ExportTraceServiceRequest protobuf -> flat rows (== slow pair)."""
    try:
        return _flatten_traces_pb(body)
    except OtlpDecodeError:
        raise
    except Exception as e:  # struct errors etc. — parse_request_pb parity
        raise OtlpDecodeError(f"malformed protobuf: {e}") from e


def _event_fields(buf: bytes, pos: int, end: int) -> tuple[int, str, str]:
    ts = 0
    name = ""
    attr_ranges: list[tuple[int, int]] = []
    while pos < end:
        t = buf[pos]
        if t < 0x80:
            pos += 1
        else:
            t, pos = _varint(buf, pos, end)
        if t == 0x09:  # time_unix_nano fixed64
            if pos + 8 > end:
                raise OtlpDecodeError("truncated fixed field")
            ts = _unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif t == 0x12:  # name
            q, nq = _len_prefixed(buf, pos, end)
            name = _utf8(buf, q, nq, "SpanEvent.name")
            pos = nq
        elif t == 0x1A:  # attributes
            r = _len_prefixed(buf, pos, end)
            attr_ranges.append(r)
            pos = r[1]
        else:
            pos = _skip(buf, pos, end, t & 7)
    attrs = _attrs_json_memo(buf, attr_ranges) if attr_ranges else "{}"
    return (ts // 1000 if ts else 0), name, attrs


def _link_fields(buf: bytes, pos: int, end: int) -> tuple[str, str, str | None, str]:
    trace_id = b""
    span_id = b""
    state: str | None = None
    attr_ranges: list[tuple[int, int]] = []
    while pos < end:
        t = buf[pos]
        if t < 0x80:
            pos += 1
        else:
            t, pos = _varint(buf, pos, end)
        if t == 0x0A:  # trace_id
            q, nq = _len_prefixed(buf, pos, end)
            trace_id = buf[q:nq]
            pos = nq
        elif t == 0x12:  # span_id
            q, nq = _len_prefixed(buf, pos, end)
            span_id = buf[q:nq]
            pos = nq
        elif t == 0x1A:  # trace_state
            q, nq = _len_prefixed(buf, pos, end)
            state = _utf8(buf, q, nq, "SpanLink.trace_state") or None
            pos = nq
        elif t == 0x22:  # attributes
            r = _len_prefixed(buf, pos, end)
            attr_ranges.append(r)
            pos = r[1]
        else:
            pos = _skip(buf, pos, end, t & 7)
    attrs = _attrs_json_memo(buf, attr_ranges) if attr_ranges else "{}"
    return (
        _check_id(trace_id, 16, "link trace id", _ZERO16).hex(),
        _check_id(span_id, 8, "link span id", _ZERO8).hex(),
        state,
        attrs,
    )


def _flatten_traces_pb(body: bytes) -> list[dict[str, Any]]:
    from otlp2parquet_spark.otel.flatten import _SPAN_KIND_NAME, _STATUS_CODE_NAME

    rows: list[dict[str, Any]] = []
    end0 = len(body)
    pos0 = 0
    while pos0 < end0:
        tag = body[pos0]
        if tag < 0x80:
            pos0 += 1
        else:
            tag, pos0 = _varint(body, pos0, end0)
        if tag != 0x0A:  # not resource_spans
            pos0 = _skip(body, pos0, end0, tag & 7)
            continue
        rs_start, rs_end = _len_prefixed(body, pos0, end0)
        pos0 = rs_end

        res_range = None
        ss_ranges: list[tuple[int, int]] = []
        p = rs_start
        while p < rs_end:
            t = body[p]
            if t < 0x80:
                p += 1
            else:
                t, p = _varint(body, p, rs_end)
            if t == 0x0A:
                res_range = _len_prefixed(body, p, rs_end)
                p = res_range[1]
            elif t == 0x12:
                r = _len_prefixed(body, p, rs_end)
                ss_ranges.append(r)
                p = r[1]
            else:
                p = _skip(body, p, rs_end, t & 7)

        if res_range is not None:
            service_name, _ns, _iid, res_attrs_json = _resource_fields_memo(
                body, res_range[0], res_range[1]
            )
        else:
            service_name = None
            res_attrs_json = "{}"

        for ss_start, ss_end in ss_ranges:
            scope_range = None
            span_ranges: list[tuple[int, int]] = []
            p = ss_start
            while p < ss_end:
                t = body[p]
                if t < 0x80:
                    p += 1
                else:
                    t, p = _varint(body, p, ss_end)
                if t == 0x0A:
                    scope_range = _len_prefixed(body, p, ss_end)
                    p = scope_range[1]
                elif t == 0x12:
                    r = _len_prefixed(body, p, ss_end)
                    span_ranges.append(r)
                    p = r[1]
                else:
                    p = _skip(body, p, ss_end, t & 7)
            if scope_range is not None:
                sname, sversion, _sattrs = _scope_fields_memo(
                    body, scope_range[0], scope_range[1], with_attrs=False
                )
                scope_name = sname or None  # traces use _opt on name
                scope_version = sversion
            else:
                scope_name, scope_version = None, None

            for sp_start, sp_end in span_ranges:
                trace_id = b""
                span_id = b""
                parent_id = b""
                trace_state: str | None = None
                name = ""
                kind = 0
                start_ns = 0
                end_ns = 0
                attr_ranges = []
                ev_ranges: list[tuple[int, int]] = []
                ln_ranges: list[tuple[int, int]] = []
                status_range = None
                p = sp_start
                while p < sp_end:
                    t = body[p]
                    if t < 0x80:
                        p += 1
                    else:
                        t, p = _varint(body, p, sp_end)
                    if t == 0x0A:
                        q, nq = _len_prefixed(body, p, sp_end)
                        trace_id = body[q:nq]
                        p = nq
                    elif t == 0x12:
                        q, nq = _len_prefixed(body, p, sp_end)
                        span_id = body[q:nq]
                        p = nq
                    elif t == 0x1A:
                        q, nq = _len_prefixed(body, p, sp_end)
                        trace_state = _utf8(body, q, nq, "Span.trace_state") or None
                        p = nq
                    elif t == 0x22:
                        q, nq = _len_prefixed(body, p, sp_end)
                        parent_id = body[q:nq]
                        p = nq
                    elif t == 0x2A:
                        q, nq = _len_prefixed(body, p, sp_end)
                        name = _utf8(body, q, nq, "Span.name")
                        p = nq
                    elif t == 0x30:  # kind enum varint
                        v, p = _varint(body, p, sp_end)
                        kind = v - 0x10000000000000000 if v >= 0x8000000000000000 else v
                    elif t == 0x39:  # start fixed64
                        if p + 8 > sp_end:
                            raise OtlpDecodeError("truncated fixed field")
                        start_ns = _unpack_from("<Q", body, p)[0]
                        p += 8
                    elif t == 0x41:  # end fixed64
                        if p + 8 > sp_end:
                            raise OtlpDecodeError("truncated fixed field")
                        end_ns = _unpack_from("<Q", body, p)[0]
                        p += 8
                    elif t == 0x4A:  # attributes
                        r = _len_prefixed(body, p, sp_end)
                        attr_ranges.append(r)
                        p = r[1]
                    elif t == 0x5A:  # events
                        r = _len_prefixed(body, p, sp_end)
                        ev_ranges.append(r)
                        p = r[1]
                    elif t == 0x6A:  # links
                        r = _len_prefixed(body, p, sp_end)
                        ln_ranges.append(r)
                        p = r[1]
                    elif t == 0x7A:  # status (last wins)
                        status_range = _len_prefixed(body, p, sp_end)
                        p = status_range[1]
                    else:
                        p = _skip(body, p, sp_end, t & 7)

                kind_name = _SPAN_KIND_NAME.get(kind)
                if kind_name is None:
                    raise OtlpDecodeError(f"invalid span kind: {kind}")
                status_msg: str | None = None
                code = 0
                if status_range is not None:
                    p, e = status_range
                    while p < e:
                        t = body[p]
                        if t < 0x80:
                            p += 1
                        else:
                            t, p = _varint(body, p, e)
                        if t == 0x12:  # message
                            q, nq = _len_prefixed(body, p, e)
                            status_msg = _utf8(body, q, nq, "Status.message") or None
                            p = nq
                        elif t == 0x18:  # code enum
                            v, p = _varint(body, p, e)
                            code = (
                                v - 0x10000000000000000
                                if v >= 0x8000000000000000
                                else v
                            )
                        else:
                            p = _skip(body, p, e, t & 7)
                code_name = _STATUS_CODE_NAME.get(code)
                if code_name is None:
                    raise OtlpDecodeError(f"invalid status code: {code}")

                events = [_event_fields(body, r[0], r[1]) for r in ev_ranges]
                links = [_link_fields(body, r[0], r[1]) for r in ln_ranges]
                parent = _check_id(parent_id, 8, "parent span id", _ZERO8)
                rows.append(
                    {
                        "Timestamp": start_ns // 1000,
                        "TraceId": _check_id(trace_id, 16, "trace id", _ZERO16).hex(),
                        "SpanId": _check_id(span_id, 8, "span id", _ZERO8).hex(),
                        "ServiceName": service_name,
                        "ResourceAttributes": res_attrs_json,
                        "ScopeName": scope_name,
                        "ScopeVersion": scope_version,
                        "ParentSpanId": parent.hex() if parent.strip(b"\x00") else None,
                        "TraceState": trace_state,
                        "SpanName": name,
                        "SpanKind": kind_name,
                        "SpanAttributes": _attrs_json_memo(body, attr_ranges)
                        if attr_ranges
                        else "{}",
                        "Duration": end_ns - start_ns,
                        "StatusCode": code_name,
                        "StatusMessage": status_msg,
                        "EventsTimestamp": [e[0] for e in events],
                        "EventsName": [e[1] for e in events],
                        "EventsAttributes": [e[2] for e in events],
                        "LinksTraceId": [ln[0] for ln in links],
                        "LinksSpanId": [ln[1] for ln in links],
                        "LinksTraceState": [ln[2] for ln in links],
                        "LinksAttributes": [ln[3] for ln in links],
                    }
                )
    return rows


# ---------------------------------------------------------------------------
# Metrics


def flatten_metrics_pb(body: bytes):
    """One ExportMetricsServiceRequest protobuf -> ({metric_type: rows},
    skipped counters) — same contract as flatten.flatten_metrics, fused.

    Slow-pair quirks kept: the Metric data member resolves by PRIORITY
    (gauge > sum > histogram > exponential_histogram > summary — the
    `elif` chain in flatten_metrics), not wire order; min/max are
    presence-tracked (None when absent) while count/sum default to 0/0.0;
    NaN/Inf/missing number values are dropped and counted."""
    try:
        return _flatten_metrics_pb(body)
    except OtlpDecodeError:
        raise
    except Exception as e:  # struct errors etc. — parse_request_pb parity
        raise OtlpDecodeError(f"malformed protobuf: {e}") from e


def _fixed64(buf: bytes, pos: int, end: int) -> tuple[int, int]:
    if pos + 8 > end:
        raise OtlpDecodeError("truncated fixed field")
    return _unpack_from("<Q", buf, pos)[0], pos + 8


def _double(buf: bytes, pos: int, end: int) -> tuple[float, int]:
    if pos + 8 > end:
        raise OtlpDecodeError("truncated fixed field")
    return _unpack_from("<d", buf, pos)[0], pos + 8


def _packed_fixed64(buf: bytes, pos: int, end: int, out: list) -> int:
    p, npos = _len_prefixed(buf, pos, end)
    count, rem = divmod(npos - p, 8)
    if rem:
        raise OtlpDecodeError("bad packed field length")
    out.extend(_unpack_from(f"<{count}Q", buf, p))
    return npos


def _packed_double(buf: bytes, pos: int, end: int, out: list) -> int:
    p, npos = _len_prefixed(buf, pos, end)
    count, rem = divmod(npos - p, 8)
    if rem:
        raise OtlpDecodeError("bad packed field length")
    out.extend(_unpack_from(f"<{count}d", buf, p))
    return npos


def _packed_varint(buf: bytes, pos: int, end: int, out: list) -> int:
    p, npos = _len_prefixed(buf, pos, end)
    while p < npos:
        v, p = _varint(buf, p, npos)
        out.append(v)
    return npos


def _eh_buckets(buf: bytes, pos: int, end: int) -> tuple[int, list[int]]:
    offset = 0
    counts: list[int] = []
    while pos < end:
        t = buf[pos]
        if t < 0x80:
            pos += 1
        else:
            t, pos = _varint(buf, pos, end)
        if t == 0x08:  # offset sint32
            v, pos = _varint(buf, pos, end)
            offset = (v >> 1) ^ -(v & 1)
        elif t == 0x12:  # bucket_counts packed uint64
            pos = _packed_varint(buf, pos, end, counts)
        elif t == 0x10:  # bucket_counts unpacked
            v, pos = _varint(buf, pos, end)
            counts.append(v)
        else:
            pos = _skip(buf, pos, end, t & 7)
    return offset, counts


def _dp_base(buf, attr_ranges, ts_ns):
    return {
        "Timestamp": ts_ns // 1000 if ts_ns else 0,
        "Attributes": _attrs_json_memo(buf, attr_ranges) if attr_ranges else "{}",
    }


def _flatten_metrics_pb(body: bytes):
    out: dict[str, list[dict[str, Any]]] = {
        "gauge": [],
        "sum": [],
        "histogram": [],
        "exponential_histogram": [],
        "summary": [],
    }
    skipped = {"summaries": 0, "nan_values": 0, "infinity_values": 0, "missing_values": 0}
    import math

    end0 = len(body)
    pos0 = 0
    while pos0 < end0:
        tag = body[pos0]
        if tag < 0x80:
            pos0 += 1
        else:
            tag, pos0 = _varint(body, pos0, end0)
        if tag != 0x0A:  # not resource_metrics
            pos0 = _skip(body, pos0, end0, tag & 7)
            continue
        rm_start, rm_end = _len_prefixed(body, pos0, end0)
        pos0 = rm_end

        res_range = None
        sm_ranges: list[tuple[int, int]] = []
        p = rm_start
        while p < rm_end:
            t = body[p]
            if t < 0x80:
                p += 1
            else:
                t, p = _varint(body, p, rm_end)
            if t == 0x0A:
                res_range = _len_prefixed(body, p, rm_end)
                p = res_range[1]
            elif t == 0x12:
                r = _len_prefixed(body, p, rm_end)
                sm_ranges.append(r)
                p = r[1]
            else:
                p = _skip(body, p, rm_end, t & 7)

        # metrics KEEP service.name in the map (§1.3.6)
        if res_range is not None:
            svc, res_attrs_json = _metrics_resource_memo(
                body, res_range[0], res_range[1]
            )
        else:
            svc, res_attrs_json = "", "{}"

        for sm_start, sm_end in sm_ranges:
            scope_range = None
            metric_ranges: list[tuple[int, int]] = []
            p = sm_start
            while p < sm_end:
                t = body[p]
                if t < 0x80:
                    p += 1
                else:
                    t, p = _varint(body, p, sm_end)
                if t == 0x0A:
                    scope_range = _len_prefixed(body, p, sm_end)
                    p = scope_range[1]
                elif t == 0x12:
                    r = _len_prefixed(body, p, sm_end)
                    metric_ranges.append(r)
                    p = r[1]
                else:
                    p = _skip(body, p, sm_end, t & 7)
            if scope_range is not None:
                sname, sversion, _sa = _scope_fields(
                    body, scope_range[0], scope_range[1], with_attrs=False
                )
                scope_name = sname or None
                scope_version = sversion
            else:
                scope_name, scope_version = None, None

            for m_start, m_end in metric_ranges:
                name = ""
                desc: str | None = None
                unit: str | None = None
                # data members, last occurrence per member; priority applied after
                ranges = {}
                p = m_start
                while p < m_end:
                    t = body[p]
                    if t < 0x80:
                        p += 1
                    else:
                        t, p = _varint(body, p, m_end)
                    if t == 0x0A:
                        q, nq = _len_prefixed(body, p, m_end)
                        name = _utf8(body, q, nq, "Metric.name")
                        p = nq
                    elif t == 0x12:
                        q, nq = _len_prefixed(body, p, m_end)
                        desc = _utf8(body, q, nq, "Metric.description") or None
                        p = nq
                    elif t == 0x1A:
                        q, nq = _len_prefixed(body, p, m_end)
                        unit = _utf8(body, q, nq, "Metric.unit") or None
                        p = nq
                    elif t in (0x2A, 0x3A, 0x4A, 0x52, 0x5A):
                        r = _len_prefixed(body, p, m_end)
                        ranges[t] = r
                        p = r[1]
                    else:
                        p = _skip(body, p, m_end, t & 7)
                base = {
                    "ServiceName": svc,
                    "ResourceAttributes": res_attrs_json,
                    "ScopeName": scope_name,
                    "ScopeVersion": scope_version,
                    "MetricName": name,
                    "MetricDescription": desc,
                    "MetricUnit": unit,
                }
                # member priority == flatten_metrics' elif chain
                if 0x2A in ranges:  # gauge
                    _number_points_pb(
                        body, ranges[0x2A], base, None, out["gauge"], skipped, math
                    )
                elif 0x3A in ranges:  # sum
                    _sum_points_pb(body, ranges[0x3A], base, out["sum"], skipped, math)
                elif 0x4A in ranges:  # histogram
                    _hist_points_pb(body, ranges[0x4A], base, out["histogram"])
                elif 0x52 in ranges:  # exponential_histogram
                    _exp_points_pb(
                        body, ranges[0x52], base, out["exponential_histogram"]
                    )
                elif 0x5A in ranges:  # summary
                    _summary_points_pb(body, ranges[0x5A], base, out["summary"], skipped)
    return out, skipped


def _container_dps(buf: bytes, rng) -> tuple[list, int, bool]:
    """Gauge/Sum/Histogram/... container -> (dp ranges, temporality,
    is_monotonic). Unused extras are simply not read by the caller."""
    dps = []
    temporality = 0
    monotonic = False
    p, e = rng
    while p < e:
        t = buf[p]
        if t < 0x80:
            p += 1
        else:
            t, p = _varint(buf, p, e)
        if t == 0x0A:  # data_points
            r = _len_prefixed(buf, p, e)
            dps.append(r)
            p = r[1]
        elif t == 0x10:  # aggregation_temporality enum
            v, p = _varint(buf, p, e)
            temporality = v - 0x10000000000000000 if v >= 0x8000000000000000 else v
        elif t == 0x18:  # is_monotonic bool
            v, p = _varint(buf, p, e)
            monotonic = v != 0
        else:
            p = _skip(buf, p, e, t & 7)
    return dps, temporality, monotonic


def _number_points_pb(buf, rng, base, extra, rows, skipped, math):
    dps, _, _ = _container_dps(buf, rng)
    _number_points_from(buf, dps, base, extra, rows, skipped, math)


def _sum_points_pb(buf, rng, base, rows, skipped, math):
    dps, temporality, monotonic = _container_dps(buf, rng)
    if temporality not in (0, 1, 2):
        raise OtlpDecodeError(f"invalid aggregation temporality: {temporality}")
    extra = {"AggregationTemporality": temporality, "IsMonotonic": monotonic}
    _number_points_from(buf, dps, base, extra, rows, skipped, math)


def _number_points_from(buf, dps, base, extra, rows, skipped, math):
    for d_start, d_end in dps:
        ts_ns = 0
        has_double = has_int = False
        vd = vi = 0
        attr_ranges: list[tuple[int, int]] = []
        p = d_start
        while p < d_end:
            t = buf[p]
            if t < 0x80:
                p += 1
            else:
                t, p = _varint(buf, p, d_end)
            if t == 0x19:  # time_unix_nano
                ts_ns, p = _fixed64(buf, p, d_end)
            elif t == 0x21:  # as_double
                vd, p = _double(buf, p, d_end)
                has_double = True
            elif t == 0x31:  # as_int sfixed64
                if p + 8 > d_end:
                    raise OtlpDecodeError("truncated fixed field")
                vi = _unpack_from("<q", buf, p)[0]
                p += 8
                has_int = True
            elif t == 0x3A:  # attributes
                r = _len_prefixed(buf, p, d_end)
                attr_ranges.append(r)
                p = r[1]
            else:
                p = _skip(buf, p, d_end, t & 7)
        # member priority: as_double beats as_int (anyvalue-style), absent -> skip
        if has_double:
            val = vd
        elif has_int:
            val = float(vi)
        else:
            skipped["missing_values"] += 1
            continue
        if math.isnan(val):
            skipped["nan_values"] += 1
            continue
        if math.isinf(val):
            skipped["infinity_values"] += 1
            continue
        row = base | _dp_base(buf, attr_ranges, ts_ns) | {"Value": val}
        if extra:
            row |= extra
        rows.append(row)


def _hist_points_pb(buf, rng, base, rows):
    dps, _, _ = _container_dps(buf, rng)
    for d_start, d_end in dps:
        ts_ns = 0
        count = 0
        total = 0.0
        bucket_counts: list[int] = []
        bounds: list[float] = []
        vmin = vmax = None
        attr_ranges: list[tuple[int, int]] = []
        p = d_start
        while p < d_end:
            t = buf[p]
            if t < 0x80:
                p += 1
            else:
                t, p = _varint(buf, p, d_end)
            if t == 0x19:  # time 3
                ts_ns, p = _fixed64(buf, p, d_end)
            elif t == 0x21:  # count 4
                count, p = _fixed64(buf, p, d_end)
            elif t == 0x29:  # sum 5
                total, p = _double(buf, p, d_end)
            elif t == 0x32:  # bucket_counts packed fixed64
                p = _packed_fixed64(buf, p, d_end, bucket_counts)
            elif t == 0x31:  # bucket_counts unpacked
                v, p = _fixed64(buf, p, d_end)
                bucket_counts.append(v)
            elif t == 0x3A:  # explicit_bounds packed double
                p = _packed_double(buf, p, d_end, bounds)
            elif t == 0x39:  # explicit_bounds unpacked
                v, p = _double(buf, p, d_end)
                bounds.append(v)
            elif t == 0x4A:  # attributes 9
                r = _len_prefixed(buf, p, d_end)
                attr_ranges.append(r)
                p = r[1]
            elif t == 0x59:  # min 11
                vmin, p = _double(buf, p, d_end)
            elif t == 0x61:  # max 12
                vmax, p = _double(buf, p, d_end)
            else:
                p = _skip(buf, p, d_end, t & 7)
        rows.append(
            base
            | _dp_base(buf, attr_ranges, ts_ns)
            | {
                "Count": count,
                "Sum": total,
                "BucketCounts": bucket_counts,
                "ExplicitBounds": bounds,
                "Min": vmin,
                "Max": vmax,
            }
        )


def _exp_points_pb(buf, rng, base, rows):
    dps, _, _ = _container_dps(buf, rng)
    for d_start, d_end in dps:
        ts_ns = 0
        count = 0
        total = 0.0
        scale = 0
        zero_count = 0
        pos_b = (0, [])
        neg_b = (0, [])
        vmin = vmax = None
        attr_ranges: list[tuple[int, int]] = []
        p = d_start
        while p < d_end:
            t = buf[p]
            if t < 0x80:
                p += 1
            else:
                t, p = _varint(buf, p, d_end)
            if t == 0x0A:  # attributes 1
                r = _len_prefixed(buf, p, d_end)
                attr_ranges.append(r)
                p = r[1]
            elif t == 0x19:  # time 3
                ts_ns, p = _fixed64(buf, p, d_end)
            elif t == 0x21:  # count 4
                count, p = _fixed64(buf, p, d_end)
            elif t == 0x29:  # sum 5
                total, p = _double(buf, p, d_end)
            elif t == 0x30:  # scale sint32
                v, p = _varint(buf, p, d_end)
                scale = (v >> 1) ^ -(v & 1)
            elif t == 0x39:  # zero_count fixed64
                zero_count, p = _fixed64(buf, p, d_end)
            elif t == 0x42:  # positive
                q, nq = _len_prefixed(buf, p, d_end)
                pos_b = _eh_buckets(buf, q, nq)
                p = nq
            elif t == 0x4A:  # negative
                q, nq = _len_prefixed(buf, p, d_end)
                neg_b = _eh_buckets(buf, q, nq)
                p = nq
            elif t == 0x61:  # min 12
                vmin, p = _double(buf, p, d_end)
            elif t == 0x69:  # max 13
                vmax, p = _double(buf, p, d_end)
            else:
                p = _skip(buf, p, d_end, t & 7)
        rows.append(
            base
            | _dp_base(buf, attr_ranges, ts_ns)
            | {
                "Count": count,
                "Sum": total,
                "Scale": scale,
                "ZeroCount": zero_count,
                "PositiveOffset": pos_b[0],
                "PositiveBucketCounts": pos_b[1],
                "NegativeOffset": neg_b[0],
                "NegativeBucketCounts": neg_b[1],
                "Min": vmin,
                "Max": vmax,
            }
        )


def _summary_points_pb(buf, rng, base, rows, skipped):
    dps, _, _ = _container_dps(buf, rng)
    for d_start, d_end in dps:
        skipped["summaries"] += 1
        ts_ns = 0
        count = 0
        total = 0.0
        qs: list[float] = []
        qv: list[float] = []
        attr_ranges: list[tuple[int, int]] = []
        p = d_start
        while p < d_end:
            t = buf[p]
            if t < 0x80:
                p += 1
            else:
                t, p = _varint(buf, p, d_end)
            if t == 0x19:  # time 3
                ts_ns, p = _fixed64(buf, p, d_end)
            elif t == 0x21:  # count 4
                count, p = _fixed64(buf, p, d_end)
            elif t == 0x29:  # sum 5
                total, p = _double(buf, p, d_end)
            elif t == 0x32:  # quantile_values 6
                q, nq = _len_prefixed(buf, p, d_end)
                quant = val = 0.0
                pp = q
                while pp < nq:
                    tt = buf[pp]
                    if tt < 0x80:
                        pp += 1
                    else:
                        tt, pp = _varint(buf, pp, nq)
                    if tt == 0x09:
                        quant, pp = _double(buf, pp, nq)
                    elif tt == 0x11:
                        val, pp = _double(buf, pp, nq)
                    else:
                        pp = _skip(buf, pp, nq, tt & 7)
                qs.append(quant)
                qv.append(val)
                p = nq
            elif t == 0x3A:  # attributes 7
                r = _len_prefixed(buf, p, d_end)
                attr_ranges.append(r)
                p = r[1]
            else:
                p = _skip(buf, p, d_end, t & 7)
        rows.append(
            base
            | _dp_base(buf, attr_ranges, ts_ns)
            | {
                "Count": count,
                "Sum": total,
                "QuantileValues": qv,
                "QuantileQuantiles": qs,
            }
        )
