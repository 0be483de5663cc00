"""`connect` config generators (reference D29, src/connect/mod.rs:11-209).

Emit ready-to-paste client configuration pointing an OTLP producer at the
ingest endpoint (the HTTP receiver in front of the landing dir). Same three
targets as the reference: an OpenTelemetry Collector pipeline, Claude Code
telemetry env (shell or settings-JSON form), and the OpenAI Codex CLI TOML.
"""

from __future__ import annotations

DEFAULT_ENDPOINT = "http://localhost:4318"


def otel_collector_yaml(endpoint: str = DEFAULT_ENDPOINT) -> str:
    """Collector pipeline: OTLP in (grpc+http), batch by resource, OTLP/HTTP
    out with gzip — batching numbers per reference src/connect/mod.rs:100-104."""
    return f"""\
# OpenTelemetry Collector pipeline exporting to the otlp2parquet endpoint.
# Usage: save as otel-collector-config.yaml, then
#   otelcol --config otel-collector-config.yaml
receivers:
  otlp:
    protocols:
      grpc:
        endpoint: 0.0.0.0:4317
      http:
        endpoint: 0.0.0.0:4318
processors:
  batch:
    # batching groups records per resource (service.name) before export
    send_batch_size: 1000
    send_batch_max_size: 2000
    timeout: 5s
exporters:
  otlphttp:
    endpoint: {endpoint}
    compression: gzip
service:
  pipelines:
    logs:
      receivers: [otlp]
      processors: [batch]
      exporters: [otlphttp]
    traces:
      receivers: [otlp]
      processors: [batch]
      exporters: [otlphttp]
    metrics:
      receivers: [otlp]
      processors: [batch]
      exporters: [otlphttp]
"""


def claude_code_shell(endpoint: str = DEFAULT_ENDPOINT) -> str:
    return f"""\
# Claude Code telemetry -> otlp2parquet. Add to your shell profile or run
# before launching the CLI.
export CLAUDE_CODE_ENABLE_TELEMETRY=1
export OTEL_METRICS_EXPORTER=otlp
export OTEL_LOGS_EXPORTER=otlp
export OTEL_EXPORTER_OTLP_PROTOCOL=http/protobuf
export OTEL_EXPORTER_OTLP_ENDPOINT={endpoint}
# optional tuning:
#   export OTEL_METRIC_EXPORT_INTERVAL=10000
#   export OTEL_LOGS_EXPORT_INTERVAL=5000
#   export OTEL_RESOURCE_ATTRIBUTES=department=engineering,team.id=platform
"""


def claude_code_json(endpoint: str = DEFAULT_ENDPOINT) -> str:
    return f"""\
# Merge into ~/.claude/settings.json
{{
  "env": {{
    "CLAUDE_CODE_ENABLE_TELEMETRY": "1",
    "OTEL_METRICS_EXPORTER": "otlp",
    "OTEL_LOGS_EXPORTER": "otlp",
    "OTEL_EXPORTER_OTLP_PROTOCOL": "http/protobuf",
    "OTEL_EXPORTER_OTLP_ENDPOINT": "{endpoint}"
  }}
}}"""


def codex_toml(endpoint: str = DEFAULT_ENDPOINT) -> str:
    return f"""\
# OpenAI Codex CLI -> otlp2parquet. Merge into ~/.codex/config.toml
[otel]
exporter = "otlp-http"
# trace_exporter = "otlp-http"
# log_user_prompt = true

[otel.exporter."otlp-http"]
endpoint = "{endpoint}/v1/logs"
protocol = "binary"
"""


GENERATORS = {
    "otel-collector": otel_collector_yaml,
    "claude-code": claude_code_shell,
    "claude-code-json": claude_code_json,
    "codex": codex_toml,
}


def generate(service: str, endpoint: str = DEFAULT_ENDPOINT) -> str:
    if service not in GENERATORS:
        raise ValueError(
            f"unknown connect target {service!r}; expected one of {sorted(GENERATORS)}"
        )
    return GENERATORS[service](endpoint)
