"""e2e: HTTP receiver -> landing dir -> Spark ingest (D1).

Mirrors the reference's server e2e (tests/e2e.rs:21-52 + harness POST flow,
tests/harness/mod.rs:207-249): POST the reference fixtures at the receiver,
then run the engine over the landing dir and check the decoded row counts
match a direct decode of the same fixtures.
"""

from __future__ import annotations

import gzip
import json
import urllib.error
import urllib.request

import pytest

from otlp2parquet_spark.otel import ingest, receiver

TD = "/root/reference/testdata"


@pytest.fixture()
def server(tmp_path):
    srv = receiver.make_server(str(tmp_path / "landing"), max_payload_bytes=1024 * 1024)
    receiver.serve_background(srv)
    yield srv, tmp_path / "landing"
    srv.shutdown()
    srv.server_close()


def _post(srv, path, body: bytes, headers: dict | None = None):
    port = srv.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, headers=headers or {}, method="POST"
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(srv, path):
    port = srv.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_ready(server):
    srv, _ = server
    assert _get(srv, "/health") == (200, {"status": "healthy"})
    assert _get(srv, "/ready") == (200, {"status": "ready"})
    assert _get(srv, "/nope")[0] == 404


def test_content_type_dispatch():
    f = receiver.format_from_content_type
    assert f("application/x-protobuf") == "pb"
    assert f("application/json; charset=utf-8") == "json"
    assert f("application/x-ndjson") == "jsonl"
    assert f(None) == "pb"  # OTLP wire default
    assert f("text/weird") == "pb"


def test_receiver_e2e_counts_match_direct_decode(spark, server):
    """POST pb + json + gzip-jsonl fixtures, then ingest the landing dir;
    row counts must equal decoding the fixtures directly (e2e.rs:21-52)."""
    srv, landing = server
    pb = open(f"{TD}/logs.pb", "rb").read()
    js = open(f"{TD}/log.json", "rb").read()
    jl = open(f"{TD}/logs.jsonl", "rb").read()
    assert _post(srv, "/v1/logs", pb, {"Content-Type": "application/x-protobuf"})[0] == 200
    assert _post(srv, "/v1/logs", js, {"Content-Type": "application/json"})[0] == 200
    st, resp = _post(
        srv,
        "/v1/logs",
        gzip.compress(jl),
        {"Content-Type": "application/x-ndjson", "Content-Encoding": "gzip"},
    )
    assert st == 200 and resp["bytes"] == len(jl)  # size counted decompressed

    tables = ingest.ingest_directory(spark, str(landing / "logs"), "logs")
    got = tables["otel_logs"].count()

    # direct decode of the same three payloads
    from otlp2parquet_spark.otel import otlp_json, wire

    def n_records(req) -> int:
        return sum(
            len(sl.get("log_records", []))
            for rl in req["resource_logs"]
            for sl in rl.get("scope_logs", [])
        )

    direct = n_records(wire.parse_request_pb(pb, "logs"))
    direct += n_records(otlp_json.parse_request_json(js, "logs"))
    direct += sum(n_records(req) for req in otlp_json.parse_request_jsonl(jl, "logs"))
    assert got == direct > 0


def test_receiver_413_and_404(server):
    srv, _ = server
    st, resp = _post(srv, "/v1/logs", b"x" * (1024 * 1024 + 1))
    assert st == 413 and "exceeds limit" in resp["error"]
    # gzip bomb-ish: limit applies AFTER decompression, like the reference
    big = gzip.compress(b"y" * (1024 * 1024 + 1))
    assert len(big) < 1024 * 1024
    st, resp = _post(srv, "/v1/logs", big, {"Content-Encoding": "gzip"})
    assert st == 413
    assert _post(srv, "/v1/bogus", b"")[0] == 404
    assert _post(srv, "/v2/logs", b"")[0] == 404


def test_receiver_bad_gzip(server):
    srv, _ = server
    st, resp = _post(srv, "/v1/logs", b"not gzip", {"Content-Encoding": "gzip"})
    assert st == 400 and "gzip" in resp["error"]


def test_no_partial_files_visible(server):
    """Atomic landing: no .tmp leftovers, every visible file is complete."""
    srv, landing = server
    body = open(f"{TD}/traces.pb", "rb").read()
    for _ in range(5):
        assert _post(srv, "/v1/traces", body)[0] == 200
    files = list((landing / "traces").iterdir())
    assert len(files) == 5
    assert all(not f.name.startswith(".") for f in files)
    assert all(f.stat().st_size == len(body) for f in files)


def test_receiver_to_streaming_ingest_e2e(spark, server, tmp_path):
    """Full reference dataflow: POST -> landing -> Structured Streaming ->
    partitioned parquet read-back (tests/e2e.rs + harness/mod.rs:207-249)."""
    from otlp2parquet_spark.otel import writer
    from otlp2parquet_spark.streaming import ingest as sing

    srv, landing = server
    body = open(f"{TD}/traces.pb", "rb").read()
    for _ in range(3):
        assert _post(srv, "/v1/traces", body)[0] == 200
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = sing.stream_ingest(
        spark, str(landing / "traces"), "traces", out, ckpt,
        layout="parity", available_now=True,
    )
    q.awaitTermination()
    per_payload = 19  # traces.pb golden record count (tests/e2e.rs)
    assert writer.read_table(spark, out, "otel_traces").count() == 3 * per_payload
