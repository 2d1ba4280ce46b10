"""Streaming sources — S1, the WebSocket ingest source.

The reference dials a market-data WS URL with an x-api-key header,
sends a subscribe message, reads frames forever, and reconnects with
exponential backoff 1 s → 30 s (ingestor.go:31-127). Spark 4's Python
streaming DataSource API (pyspark.sql.datasource) lets us express that
as a first-class ``spark.readStream.format("ws_market_data")`` source.

This module ships the full source skeleton with the offset/partition
contract implemented; only the network read is gated behind an
import-try on ``websockets`` (not installed in this container — the
``prefetched_frames`` hook injects frames for tests). A WS feed has no
replay, so the source offers at-least-once from the connection buffer
(documented; the reference is at-most-once, ingestor.go/processor.go).

File/rate sources (tests, backfill) come from streaming/pipeline.py.
"""

from __future__ import annotations

import json

try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )
    _HAS_DS_API = True
except ImportError:  # pragma: no cover - older pyspark
    DataSource = object
    DataSourceStreamReader = object
    InputPartition = object
    _HAS_DS_API = False

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

WIRE_SCHEMA = StructType([
    StructField("name", StringType()),
    StructField("timestamp", LongType()),
    StructField("exchange", StringType()),
    StructField("data", StringType()),
])

RECONNECT_INITIAL_S = 1.0   # ingestor.go:37
RECONNECT_CAP_S = 30.0      # ingestor.go:52-56


class WebSocketStreamReader(DataSourceStreamReader):
    """Single-partition stream reader over a WS connection buffer.

    Offset = count of frames handed to Spark. The reader keeps an
    in-memory buffer between ``latestOffset`` calls (the 10k-message
    channel, main.go:61); ``read`` serves the [start, end) slice.
    """

    def __init__(self, options):
        self.url = options.get("url", "")
        self.api_key = options.get("api_key", "")
        self.symbols = json.loads(options.get("symbols", "[]"))
        self.max_per_trigger = int(options.get("maxFramesPerTrigger", "10000"))
        self._buffer: list[tuple] = []
        self._served = 0
        self._ws = None

    def initialOffset(self) -> dict:
        return {"count": 0}

    def _connect(self):  # pragma: no cover - needs network + websockets
        try:
            import websockets.sync.client as ws_client
        except ImportError as exc:
            raise NotImplementedError(
                "websockets not installed in this environment; inject "
                "frames via prefetched_frames() in tests") from exc
        conn = ws_client.connect(
            self.url, additional_headers={"x-api-key": self.api_key})
        # subscribe handshake (ingestor.go:63-77)
        conn.send(json.dumps({"event": "subscribe", "symbols": self.symbols}))
        return conn

    def prefetched_frames(self, frames: list[dict]) -> None:
        """Test hook: enqueue decoded frames as if read off the wire."""
        for f in frames:
            self._buffer.append((
                f.get("name"), f.get("timestamp"), f.get("exchange"),
                json.dumps(f.get("data")) if f.get("data") is not None else None))

    def _poll(self):  # pragma: no cover - needs network
        import time
        backoff = RECONNECT_INITIAL_S
        while len(self._buffer) - self._served < self.max_per_trigger:
            try:
                if self._ws is None:
                    self._ws = self._connect()
                    backoff = RECONNECT_INITIAL_S
                raw = self._ws.recv(timeout=0.1)
            except NotImplementedError:
                raise
            except Exception:
                self._ws = None
                time.sleep(backoff)
                backoff = min(backoff * 2, RECONNECT_CAP_S)  # ingestor.go:52-56
                continue
            try:
                msg = json.loads(raw)
            except ValueError:
                continue  # unmarshal error → drop (ingestor.go:105-110)
            self._buffer.append((
                msg.get("name"), msg.get("timestamp"), msg.get("exchange"),
                json.dumps(msg.get("data")) if msg.get("data") is not None else None))

    def latestOffset(self) -> dict:
        if self._ws is not None or self.url:
            try:
                self._poll()
            except NotImplementedError:
                pass
        return {"count": len(self._buffer)}

    def partitions(self, start: dict, end: dict):
        return [_RangePartition(start["count"], end["count"])]

    def read(self, partition):
        for row in self._buffer[partition.start:partition.end]:
            yield row

    def commit(self, end: dict) -> None:
        self._served = end["count"]


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class WebSocketDataSource(DataSource):
    """spark.readStream.format("ws_market_data").options(url=..., api_key=...)"""

    @classmethod
    def name(cls) -> str:
        return "ws_market_data"

    def schema(self):
        return WIRE_SCHEMA

    def streamReader(self, schema):
        return WebSocketStreamReader(self.options)


def register(spark) -> bool:
    """Register the WS source if this Spark build has the Python
    DataSource API; returns False (no-op) otherwise."""
    if not _HAS_DS_API:
        return False
    spark.dataSource.register(WebSocketDataSource)
    return True
