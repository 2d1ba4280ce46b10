"""X9 — the /health and /metrics HTTP endpoints (main.go:47-59).

The reference exposes a Prometheus /metrics handler and a /health
probe on its HTTP mux. Engine realization: a stdlib
``ThreadingHTTPServer`` on a daemon thread exporting a
``MetricsRegistry`` (fed by ``MetricsListener`` riding the streaming
query) in the Prometheus text exposition format, plus a JSON health
probe.

Driver-side only: metrics aggregation already happens in the listener
(one registry per driver), so the endpoint is a read-only view — no
locks beyond the GIL-atomic dict reads, no Spark actions per scrape.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .observability import MetricsRegistry

_NAME_RE = re.compile(r"[^a-zA-Z0-9_]")


def _prom_name(name: str) -> str:
    return _NAME_RE.sub("_", name)


def render_prometheus(registry: MetricsRegistry) -> str:
    """Registry → Prometheus text exposition (counters + last-batch
    gauges). Counter names mirror metrics.go:8-34 where they map."""
    lines = []
    for name in sorted(registry.counters):
        prom = _prom_name(name)
        lines.append(f"# TYPE {prom} counter")
        lines.append(f"{prom} {registry.counters[name]}")
    for name, value in sorted(registry.gauges().items()):
        prom = _prom_name(name)
        lines.append(f"# TYPE {prom} gauge")
        lines.append(f"{prom} {value}")
    p = registry.last_progress
    if p:
        lines.append("# TYPE last_batch_id gauge")
        lines.append(f"last_batch_id {p.get('batchId', -1)}")
        lines.append("# TYPE last_batch_input_rows gauge")
        lines.append(f"last_batch_input_rows {p.get('numInputRows', 0)}")
        for phase, ms in (p.get("durationMs") or {}).items():
            prom = _prom_name(f"last_batch_duration_ms_{phase}")
            lines.append(f"# TYPE {prom} gauge")
            lines.append(f"{prom} {ms}")
    return "\n".join(lines) + "\n"


class MetricsServer:
    """/health + /metrics on a daemon thread (main.go:47-59)."""

    def __init__(self, registry: MetricsRegistry,
                 host: str = "127.0.0.1", port: int = 0):
        self.registry = registry
        reg = registry

        class _Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 - http.server API
                if self.path == "/health":
                    body = json.dumps({"status": "ok"}).encode()
                    ctype = "application/json"
                elif self.path == "/metrics":
                    body = render_prometheus(reg).encode()
                    ctype = "text/plain; version=0.0.4"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # quiet
                pass

        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self.host, self.port = self._httpd.server_address
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "MetricsServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
