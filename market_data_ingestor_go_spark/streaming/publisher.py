"""K4 — the live WebSocket broadcast sink (server.go:43-130).

The reference runs a WS server: clients connect with an x-api-key
header, the server authenticates and loads their transform config,
and a 1 s ticker snapshots the cache and writes every record to every
connection through its per-client transform (server.go:88-130).

Engine realization: ``ServePublisher`` wraps the stdlib WS server
(streaming/ws_minimal.py — production swaps in the ``websockets``
package), registers connections with their presented key, and on each
tick:

1. authenticates ALL live connections with ONE broadcast semi-join
   (``serve.resolve_connections`` — not N point reads per tick),
2. builds one wire view per DISTINCT client config over a single
   shared flattened snapshot (``serve.client_wire_views``),
3. unions the per-client views with a client_id tag and collects the
   tick in ONE Spark action, then fans the pre-serialized JSON rows
   out over the sockets.

Scale posture: tick cost is one job over ~|symbols| × |distinct
configs| rows regardless of connection count; the per-connection work
is a socket write of already-serialized bytes. The reference's own
loop is O(connections × symbols) marshalling per tick — this is the
sharing it couldn't do.

Delivery is best-effort per tick, matching the reference: a dead
connection is dropped on write failure (server.go:82-87), and a
client that connects mid-tick starts receiving on the next tick.
"""

from __future__ import annotations

import itertools
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cache import release_pinned
from ..operators.enrich import _sha256_hex, audit_key_usage_inline
from .serve import distinct_wire_views, resolve_connections
from .ws_minimal import ConnectionClosed, FrameTooLarge, WSServer

# Reference read-pump limits (server.go:161-165): 512 B client frames,
# 60 s idle deadline, pong extends. Pings go out well inside the
# deadline so a live-but-quiet client keeps extending it.
READ_LIMIT_BYTES = 512
IDLE_DEADLINE_S = 60.0
PING_INTERVAL_S = 20.0


class ServePublisher:
    """Auth-gated per-client broadcast over live WS connections."""

    def __init__(self, spark: SparkSession, api_keys: DataFrame,
                 configs_df: DataFrame, host: str = "127.0.0.1",
                 port: int = 0, audit_sink=None,
                 read_limit_bytes: int = READ_LIMIT_BYTES,
                 idle_deadline_s: float = IDLE_DEADLINE_S,
                 ping_interval_s: float = PING_INTERVAL_S):
        self.spark = spark
        self.api_keys = api_keys
        self.configs_df = configs_df
        # K5: optional fire-and-forget sink for the last_used_at touch —
        # called with the audited api_keys DataFrame off the tick thread
        self.audit_sink = audit_sink
        self.read_limit_bytes = read_limit_bytes
        self.idle_deadline_s = idle_deadline_s
        self.ping_interval_s = ping_interval_s
        self._conns: dict[str, tuple] = {}  # conn_id -> (WSConnection, key)
        self._ids = itertools.count(1)
        self._lock = threading.Lock()
        self._ticker: threading.Timer | None = None
        self._stopping = threading.Event()
        self._audit_busy = threading.Event()
        self.ticks = 0          # observability
        self.records_sent = 0
        self.evictions = 0      # idle/oversize drops (read pump)
        self.server = WSServer(host, port, on_connect=self._on_connect,
                               max_frame_bytes=read_limit_bytes)

    # -- connection registry + read pump (server.go:43-61, 161-178) ---

    def _on_connect(self, conn) -> None:
        key = conn.headers.get("x-api-key", "")
        conn_id = f"conn-{next(self._ids)}"
        with self._lock:
            self._conns[conn_id] = (conn, key)
        # Broadcast-only server: drain (and ignore) client frames so
        # ping/close are serviced; deregister when the peer goes away.
        # The pump enforces the reference's read limits: an oversized
        # frame closes the connection (FrameTooLarge ⊂ ConnectionClosed,
        # SetReadLimit semantics), and a client silent past the idle
        # deadline is evicted — pings go out every ping_interval_s and
        # any frame (pong included) extends the deadline.
        last_ping = time.monotonic()
        try:
            while not self._stopping.is_set():
                try:
                    conn.recv(timeout=1.0)
                except TimeoutError:
                    now = time.monotonic()
                    if now - conn.last_activity > self.idle_deadline_s:
                        self.evictions += 1
                        break
                    if now - last_ping >= self.ping_interval_s:
                        try:
                            conn.ping()
                        except OSError:
                            break
                        last_ping = now
                    continue
        except FrameTooLarge:
            self.evictions += 1  # read-limit drop counts as an eviction
        except ConnectionClosed:
            pass
        finally:
            conn.close()
            with self._lock:
                self._conns.pop(conn_id, None)

    def presented_keys(self) -> dict[str, str]:
        with self._lock:
            return {cid: key for cid, (conn, key) in self._conns.items()
                    if not conn._closed}

    # -- the tick (server.go:88-130) ----------------------------------

    def tick(self, latest: DataFrame) -> int:
        """One broadcast tick; returns records sent across all conns."""
        presented = self.presented_keys()
        if not presented:
            self.ticks += 1
            return 0
        conn2client = resolve_connections(self.api_keys, presented)
        client_ids = set(conn2client.values())
        if not client_ids:
            self.ticks += 1
            return 0
        # release_pinned spans the WHOLE view-building block:
        # distinct_wire_views pins the flattened snapshot before the
        # collect, so an exception anywhere after it (config parse,
        # union construction, the collect itself) must still drop the
        # pin — the ticker loop keeps ticking through failures, and a
        # leaked pin per failing tick accumulates without bound.
        try:
            views = distinct_wire_views(latest, self.configs_df, client_ids)
            # ONE action for the whole tick: union the per-distinct-config
            # views tagged with their STABLE config-hash key (id()-based
            # keys would change every tick and bust Spark's analysis and
            # codegen caches — measured as seconds of replanning per tick
            # for large configs).
            view_key = {cid: k for k, (_, cids) in views.items() for cid in cids}
            tagged = [v.select(F.lit(k).alias("vk"), "wire")
                      for k, (v, _) in sorted(views.items())]
            union = tagged[0]
            for t in tagged[1:]:
                union = union.unionAll(t)
            by_view: dict[str, list[str]] = {}
            for row in union.collect():
                by_view.setdefault(row["vk"], []).append(row["wire"])
        finally:
            release_pinned()
        sent = 0
        for conn_id, client_id in conn2client.items():
            with self._lock:
                entry = self._conns.get(conn_id)
            if entry is None:
                continue
            conn = entry[0]
            try:
                for wire in by_view.get(view_key[client_id], ()):
                    conn.send(wire)
                    sent += 1
            except OSError:  # dead conn → drop (server.go:82-87)
                conn.close()
        # K5 (postgres.go:156-160): fire-and-forget last_used_at touch
        # for every key that authenticated this tick.
        self._fire_audit({_sha256_hex(presented[cid]) for cid in conn2client})
        self.ticks += 1
        self.records_sent += sent
        return sent

    def _fire_audit(self, used_hashes: set[str]) -> None:
        """Best-effort async audit touch, mirroring the reference's
        goroutine: result ignored, never blocks the tick, and at most
        one touch in flight (a slow sink skips ticks, it doesn't queue)."""
        if self.audit_sink is None or not used_hashes:
            return
        if self._audit_busy.is_set():
            return
        self._audit_busy.set()

        def _run():
            try:
                self.audit_sink(
                    audit_key_usage_inline(self.api_keys, sorted(used_hashes)))
            except Exception:  # fire-and-forget: result ignored
                pass
            finally:
                self._audit_busy.clear()

        threading.Thread(target=_run, daemon=True).start()

    # -- observability (A2: metrics.go counters for the serve side) ---

    def metrics(self) -> dict:
        with self._lock:
            live = sum(1 for c, _ in self._conns.values() if not c._closed)
        return {"serve_ticks": self.ticks,
                "serve_records_sent": self.records_sent,
                "serve_evictions": self.evictions,
                "serve_connections": live}

    def export_metrics(self, registry) -> None:
        """Register the serve-side counters as a LIVE gauge source: the
        /metrics endpoint re-reads them at every scrape (a one-time
        counter snapshot would report startup zeros forever)."""
        if self.metrics not in registry.gauge_sources:
            registry.gauge_sources.append(self.metrics)

    # -- lifecycle -----------------------------------------------------

    def start(self, latest_provider=None, interval_s: float = 1.0) -> "ServePublisher":
        """Start accepting connections; with ``latest_provider`` (a
        zero-arg callable returning the latest-state DataFrame — e.g.
        ``pipeline.latest_snapshot``) also start the 1 s tick loop
        (server.go:88, the reference's ticker)."""
        self.server.start()
        if latest_provider is not None:
            def _loop():
                if self._stopping.is_set():
                    return
                try:
                    self.tick(latest_provider())
                except Exception:  # pragma: no cover - keep ticking
                    pass
                if not self._stopping.is_set():
                    self._ticker = threading.Timer(interval_s, _loop)
                    self._ticker.daemon = True
                    self._ticker.start()
            self._ticker = threading.Timer(interval_s, _loop)
            self._ticker.daemon = True
            self._ticker.start()
        return self

    @property
    def url(self) -> str:
        return self.server.url

    def stop(self) -> None:
        self._stopping.set()
        if self._ticker is not None:
            self._ticker.cancel()
        self.server.stop()
