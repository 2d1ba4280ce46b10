"""A2 observability + §2.10 stateful operator tests: observed metrics
through a real streaming query with the listener attached, and the
applyInPandasWithState latest-state change stream."""

from __future__ import annotations

import json
import time

from pyspark.sql import Row, functions as F

from market_data_ingestor_go_spark.streaming.endpoints import MetricsServer
from market_data_ingestor_go_spark.streaming.observability import (
    MetricsListener, MetricsRegistry, observe_ingest)
from market_data_ingestor_go_spark.streaming.stateful import streaming_latest_state


def test_listener_collects_observed_metrics(spark, tmp_path):
    """A2 + X9: observed metrics flow listener → registry → the
    /metrics HTTP endpoint, scraped while the query is live
    (main.go:47-59)."""
    from urllib.request import urlopen

    src = str(tmp_path / "src")
    import os
    os.makedirs(src)
    with open(src + "/a.json", "w") as fh:
        for i in range(5):
            fh.write(json.dumps({"name": "AAPL" if i < 4 else "",
                                 "timestamp": i + 1}) + "\n")

    registry = MetricsRegistry()
    listener = MetricsListener(registry)
    spark.streams.addListener(listener)
    server = MetricsServer(registry).start()
    try:
        raw = (spark.readStream.schema("name STRING, timestamp LONG")
               .json(src))
        validated = observe_ingest(
            raw, lambda df: df.filter((F.col("name") != "")
                                      & (F.col("timestamp") > 0)))
        q = (validated.writeStream.format("noop")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        q.processAllAvailable()
        # listener events are async — poll before stopping the query
        deadline = time.time() + 10
        while time.time() < deadline and "processed.messages_processed" not in registry.counters:
            time.sleep(0.2)

        # scrape while the query is still running
        health = json.loads(urlopen(server.url + "/health", timeout=5).read())
        assert health == {"status": "ok"}
        metrics = urlopen(server.url + "/metrics", timeout=5).read().decode()
        q.stop()
    finally:
        server.stop()
        spark.streams.removeListener(listener)

    assert registry.counters.get("batch_inserts", 0) >= 1
    assert registry.counters.get("received.messages_received") == 5
    assert registry.counters.get("processed.messages_processed") == 4
    assert "received_messages_received 5" in metrics
    assert "processed_messages_processed 4" in metrics
    assert "# TYPE batch_inserts counter" in metrics
    assert "last_batch_id" in metrics


def test_streaming_latest_state_change_stream(spark, tmp_path):
    """applyInPandasWithState: emits per-key updates, keeps the max
    timestamp, ignores ts==0, and only emits on change."""
    import os
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = int(time.time() * 1000)  # recent → not lazily TTL-evicted
    rows = [
        {"name": "AAPL", "timestamp": now + 100, "exchange": "usstock", "data": "{\"bid\":1}"},
        {"name": "AAPL", "timestamp": now + 90, "exchange": "usstock", "data": "{\"bid\":0}"},
        {"name": "BTC", "timestamp": now + 50, "exchange": "crypto", "data": "{}"},
        {"name": "BTC", "timestamp": 0, "exchange": "crypto", "data": "{}"},
    ]
    with open(src + "/a.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    stream = (spark.readStream
              .schema("name STRING, timestamp LONG, exchange STRING, data STRING")
              .json(src))
    out = streaming_latest_state(stream)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("latest_updates")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()

    first = {r["name"]: r["timestamp"]
             for r in spark.sql("SELECT * FROM latest_updates").collect()}
    assert first == {"AAPL": now + 100, "BTC": now + 50}

    # second batch: one real update, one stale record (no emit)
    with open(src + "/b.json", "w") as fh:
        fh.write(json.dumps({"name": "AAPL", "timestamp": now + 200,
                             "exchange": "usstock", "data": "{}"}) + "\n")
        fh.write(json.dumps({"name": "BTC", "timestamp": now + 10,
                             "exchange": "crypto", "data": "{}"}) + "\n")
    q.processAllAvailable()
    q.stop()

    all_updates = spark.sql("SELECT * FROM latest_updates").collect()
    aapl = [r["timestamp"] for r in all_updates if r["name"] == "AAPL"]
    btc = [r["timestamp"] for r in all_updates if r["name"] == "BTC"]
    assert sorted(aapl) == [now + 100, now + 200]  # emitted twice (changed twice)
    assert btc == [now + 50]            # stale row produced no update


def test_unmarshal_error_counter(spark, tmp_path):
    """ErrorsTotal{type=unmarshal} (ingestor.go:105-110): undecodable
    frames drop AND count, observed on the executed ingest lineage."""
    import os
    from pyspark.sql import Row
    from market_data_ingestor_go_spark.streaming.pipeline import IngestPipeline

    src = str(tmp_path / "wire")
    os.makedirs(src)
    good = {"name": "AAPL", "timestamp": int(time.time() * 1000),
            "exchange": None, "data": {"data": {"bid": 1.0}}}
    with open(src + "/a.json", "w") as fh:
        fh.write(json.dumps(good) + "\n")
        fh.write("not json at all {{{\n")
        fh.write("}} also broken\n")

    registry = MetricsRegistry()
    listener = MetricsListener(registry)
    spark.streams.addListener(listener)
    try:
        symbols = spark.createDataFrame([Row(name="AAPL", exchange="usstock")])
        raw = spark.readStream.schema("value STRING").text(src)
        pipe = IngestPipeline(spark, str(tmp_path / "out"), symbols)
        q = pipe.start(raw)
        q.processAllAvailable()
        q.stop()
        deadline = time.time() + 10
        while time.time() < deadline and "decode.errors_unmarshal" not in registry.counters:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert registry.counters.get("decode.frames_received") == 3
    assert registry.counters.get("decode.errors_unmarshal") == 2


def test_publisher_ticker_loop(spark, tmp_path):
    """K4 ticker (server.go:88): the publisher's interval loop drives
    ticks without manual calls; a live client receives snapshots."""
    import hashlib
    from pyspark.sql import Row
    from market_data_ingestor_go_spark.streaming.publisher import ServePublisher
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm

    spark.createDataFrame([
        Row(name="AAPL", timestamp=1, exchange="x",
            data=json.dumps({"data": {"bid": 1.0}}))]) \
        .write.mode("overwrite").parquet(str(tmp_path / "latest"))
    configs = spark.createDataFrame(
        [Row(id="c1", config=None)], schema="id string, config string")
    keys = spark.createDataFrame([
        Row(client_id="c1", key_hash=hashlib.sha256(b"k1").hexdigest(),
            is_active=True)])
    pub = ServePublisher(spark, keys, configs).start(
        latest_provider=lambda: spark.read.parquet(str(tmp_path / "latest")),
        interval_s=0.5)
    try:
        client = wm.connect(pub.url, headers={"x-api-key": "k1"})
        msgs = []
        # 45 s, not 20: each tick's Spark job can take several seconds
        # under co-tenant load (observed: 1 delivery in 20 s at
        # loadavg ≈ 3.4, then green alone) — the assertions below are
        # unchanged, the deadline just outlasts host noise
        deadline = time.time() + 45
        while len(msgs) < 2 and time.time() < deadline:
            try:
                msgs.append(json.loads(client.recv(timeout=2.0)))
            except TimeoutError:
                continue
        assert len(msgs) >= 2  # at least two tick deliveries
        assert all(m["symbol"] == "AAPL" for m in msgs)
        assert pub.ticks >= 2 and pub.records_sent >= 2
        client.close()
    finally:
        pub.stop()
