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
  RequestDecompressionLayer, src/lib.rs:227) BEFORE the size guard, so the
  413 limit applies to the decompressed payload exactly like the reference.
- oversize -> 413 {"error": ...}; bad gzip -> 400; unknown route -> 404
  (reference AppError::into_response shape, src/lib.rs:80-91).
- landing writes are atomic: body lands under a dot-prefixed temp name
  (ignored by Spark file sources) and is renamed into place, so a
  concurrent binaryFile scan never reads a partial payload.
"""

from __future__ import annotations

import gzip
import json
import os
import threading
import uuid
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
        try:
            length = int(self.headers.get("Content-Length", "0"))
        except ValueError:
            self._json(400, {"error": "bad Content-Length"})
            return
        body = self.rfile.read(length)
        if self.headers.get("Content-Encoding", "").lower() == "gzip":
            try:
                body = gzip.decompress(body)
            except (OSError, EOFError) as e:
                self._json(400, {"error": f"bad gzip body: {e}"})
                return
        limit = self.server.max_payload_bytes
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
