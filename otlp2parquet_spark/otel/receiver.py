"""Out-of-engine HTTP receiver: OTLP/HTTP -> landing directory (D1).

The reference is an HTTP server (src/lib.rs:221-228 axum router,
src/handlers.rs:26-60 POST /v1/{logs,traces,metrics} + GET /health /ready,
docs/sending-data.md). SURVEY.md §3.1 deliberately keeps the receiver
out-of-engine: this stdlib implementation closes the loop by accepting the
same POSTs and appending each body as one landing file that the Spark side
(batch `ingest_directory` or `streaming.stream_ingest`) decodes — the
receiver never parses payloads, so it stays I/O-bound and horizontally
scalable (run N instances behind a balancer, all writing to the same
landing root; file names are per-request uuids so writers never collide).

Parity notes:
- content-type dispatch mirrors InputFormat::from_content_type
  (src/handlers.rs:69): application/x-protobuf -> .pb, application/json ->
  .json, application/jsonl / x-ndjson -> .jsonl; OTLP's wire default
  (protobuf) when absent/unknown.
- gzip request bodies are decompressed at the edge (reference
  RequestDecompressionLayer, src/lib.rs:227) and the 413 limit applies to
  the decompressed payload exactly like the reference. Decompression is
  *incremental* (zlib.decompressobj with max_length) and aborts with 413 as
  soon as expanded output crosses the limit, so a small gzip bomb cannot
  exhaust receiver memory; similarly a huge declared Content-Length is
  rejected before any body bytes are read.
- oversize -> 413 {"error": ...}; bad gzip -> 400; missing/zero
  Content-Length -> 411 (chunked bodies are not supported — a 0-length
  read would silently land an empty payload); unknown route -> 404
  (reference AppError::into_response shape, src/lib.rs:80-91).
- landing writes are atomic: body lands under a dot-prefixed temp name
  (ignored by Spark file sources) and is renamed into place, so a
  concurrent binaryFile scan never reads a partial payload.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from otlp2parquet_spark.otel.ingest import DEFAULT_MAX_PAYLOAD_BYTES

_SIGNALS = ("logs", "traces", "metrics")

_CONTENT_TYPES = {
    "application/x-protobuf": "pb",
    "application/protobuf": "pb",
    "application/json": "json",
    "application/jsonl": "jsonl",
    "application/x-ndjson": "jsonl",
}


def format_from_content_type(content_type: str | None) -> str:
    """Twin of InputFormat::from_content_type (src/handlers.rs:69): OTLP/HTTP
    defaults to protobuf when the header is absent or unrecognized."""
    if not content_type:
        return "pb"
    base = content_type.split(";", 1)[0].strip().lower()
    return _CONTENT_TYPES.get(base, "pb")


class _Handler(BaseHTTPRequestHandler):
    # set by make_server(): landing_root, max_payload_bytes, quiet
    server_version = "otlp2parquet-spark-receiver/1.0"

    def log_message(self, fmt, *args):  # stdlib logs to stderr per request
        if not getattr(self.server, "quiet", True):
            super().log_message(fmt, *args)

    def _json(self, status: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _drain(self, n: int) -> None:
        """Read and discard n body bytes in fixed-size chunks (bounded memory)."""
        while n > 0:
            chunk = self.rfile.read(min(n, 65536))
            if not chunk:
                break
            n -= len(chunk)

    def do_GET(self) -> None:  # noqa: N802 (stdlib naming)
        if self.path == "/health":
            self._json(200, {"status": "healthy"})
        elif self.path == "/ready":
            self._json(200, {"status": "ready"})
        else:
            self._json(404, {"error": f"not found: {self.path}"})

    def do_POST(self) -> None:  # noqa: N802
        parts = self.path.strip("/").split("/")
        if len(parts) != 2 or parts[0] != "v1" or parts[1] not in _SIGNALS:
            self._json(404, {"error": f"not found: {self.path}"})
            return
        signal = parts[1]
        limit = self.server.max_payload_bytes
        try:
            length = int(self.headers.get("Content-Length", "0"))
        except ValueError:
            self._json(400, {"error": "bad Content-Length"})
            return
        if length <= 0:
            # Chunked / length-less bodies would read as 0 bytes and land an
            # empty payload with a 200 — silent data loss. Refuse instead.
            self._json(411, {"error": "Content-Length required"})
            return
        if length > limit:
            # Reject before buffering: a hostile declared length must never
            # size an allocation. Discard a bounded amount so a well-behaved
            # client blocked in send() can finish and read the 413 (beyond
            # the cap the connection just closes).
            self._drain(min(length, max(limit, 8 * 1024 * 1024)))
            self.close_connection = True
            self._json(413, {"error": f"payload {length} exceeds limit {limit}"})
            return
        body = self.rfile.read(length)
        if self.headers.get("Content-Encoding", "").lower() == "gzip":
            # Incremental inflate, capped: never materialize more than
            # limit+1 decompressed bytes no matter the compression ratio.
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)  # gzip wrapper
            out: list[bytes] = []
            produced = 0
            try:
                chunk = d.decompress(body, limit + 1 - produced)
                out.append(chunk)
                produced += len(chunk)
                while d.unconsumed_tail and produced <= limit:
                    chunk = d.decompress(d.unconsumed_tail, limit + 1 - produced)
                    out.append(chunk)
                    produced += len(chunk)
                if produced <= limit:
                    tail = d.flush()
                    out.append(tail)
                    produced += len(tail)
            except zlib.error as e:
                self._json(400, {"error": f"bad gzip body: {e}"})
                return
            if produced > limit:
                self._json(413, {"error": f"payload exceeds limit {limit} after decompression"})
                return
            if not d.eof:
                self._json(400, {"error": "bad gzip body: truncated stream"})
                return
            body = b"".join(out)
        if len(body) > limit:
            self._json(413, {"error": f"payload {len(body)} exceeds limit {limit}"})
            return
        fmt = format_from_content_type(self.headers.get("Content-Type"))
        d = os.path.join(self.server.landing_root, signal)
        os.makedirs(d, exist_ok=True)
        name = f"{uuid.uuid4().hex}.{fmt}"
        tmp = os.path.join(d, "." + name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(body)
        os.rename(tmp, os.path.join(d, name))
        self._json(200, {"status": "ok", "landed": f"{signal}/{name}", "bytes": len(body)})


def make_server(
    landing_root: str,
    host: str = "127.0.0.1",
    port: int = 0,
    *,
    max_payload_bytes: int = DEFAULT_MAX_PAYLOAD_BYTES,
    quiet: bool = True,
) -> ThreadingHTTPServer:
    """Build (not start) the receiver; port=0 binds an ephemeral port.
    `server.server_address[1]` is the bound port."""
    srv = ThreadingHTTPServer((host, port), _Handler)
    srv.landing_root = landing_root
    srv.max_payload_bytes = max_payload_bytes
    srv.quiet = quiet
    return srv


def serve_background(server: ThreadingHTTPServer) -> threading.Thread:
    """Run the receiver on a daemon thread (tests / embedded use)."""
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="otlp2parquet-spark-receiver")
    p.add_argument("landing_root", help="directory the Spark side ingests from")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=4318)  # OTLP/HTTP default port
    p.add_argument("--max-payload-bytes", type=int, default=DEFAULT_MAX_PAYLOAD_BYTES)
    args = p.parse_args(argv)
    srv = make_server(
        args.landing_root,
        args.host,
        args.port,
        max_payload_bytes=args.max_payload_bytes,
        quiet=False,
    )
    print(f"listening on {args.host}:{srv.server_address[1]}, landing -> {args.landing_root}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
