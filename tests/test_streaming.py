"""Streaming pipeline tests (SURVEY.md §5 item 4): file-source-driven
micro-batches through the E1 dual sink, latest-state semantics, serve
path shared-scan + per-client transforms."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from market_data_ingestor_go_spark.functions.market import MARKET_DATA_SCHEMA
from market_data_ingestor_go_spark.streaming.pipeline import (
    IngestPipeline, build_ingest_stream)
from market_data_ingestor_go_spark.streaming.serve import (
    build_serve_snapshot, flatten_snapshot, serve_tick, wire_payload)
from market_data_ingestor_go_spark.streaming import sources as ws_sources


# Managed-table base names used by gate/maintainer/index tests in this
# file. A previously INTERRUPTED run can leave the data directory under
# spark-warehouse/ while the fresh session's catalog has no entry for
# the table — saveAsTable then refuses the existing location
# (LOCATION_ALREADY_EXISTS) and the test fails through no code fault
# (r14 verdict "what's wrong" #1: test_video_gate_dedups_across_batches
# poisoned by a stale vg_state_fp). The autouse fixture below clears
# exactly that state: warehouse directories matching these prefixes
# whose table is NOT registered in the current catalog. Registered
# tables (live state from this session) are never touched.
_WAREHOUSE_BASES = (
    "vg_state", "pg_state", "pga_state", "iom_state", "iom_live",
    "tmc_state", "tmx_state", "s_pq_idx", "s_postings_idx",
    "s_postings_nosc",
)


@pytest.fixture(autouse=True)
def _clear_stale_warehouse(spark):
    """Remove orphaned spark-warehouse directories for this file's
    managed-table names before each test (stale-run poisoning guard)."""
    import shutil

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
            break
    if os.path.isdir(wh):
        known = {t.name for t in spark.catalog.listTables()}
        for d in os.listdir(wh):
            if d.startswith(_WAREHOUSE_BASES) and d not in known:
                shutil.rmtree(os.path.join(wh, d), ignore_errors=True)
    yield


def _frame(name, ts, bid=None, ask=None):
    data = {"data": {}}
    if bid is not None:
        data["data"]["bid"] = bid
    if ask is not None:
        data["data"]["ask"] = ask
    return {"name": name, "timestamp": ts, "exchange": None, "data": data}


def _write_wire_files(spark, path, frames, n_files=2):
    os.makedirs(path, exist_ok=True)
    chunk = max(1, len(frames) // n_files)
    for i in range(0, len(frames), chunk):
        with open(os.path.join(path, f"frames_{i}.json"), "w") as fh:
            for f in frames[i:i + chunk]:
                fh.write(json.dumps(f) + "\n")


@pytest.fixture
def symbols_dim(spark):
    return spark.createDataFrame([
        Row(name="AAPL", exchange="usstock"),
        Row(name="BTCUSD", exchange="crypto"),
    ])


def test_ingest_dual_sink_end_to_end(spark, symbols_dim, tmp_path):
    """E1: wire frames → validate → enrich → history append + latest
    merge, driven by the file source through real micro-batches."""
    import time
    now = int(time.time() * 1000)  # recent → survives the 24 h TTL
    frames = [
        _frame("AAPL", now - 1000, bid=10.0), _frame("AAPL", now, bid=11.0),
        _frame("BTCUSD", now - 500, bid=9.0), _frame("ZZZ", now - 800, bid=1.0),
        _frame("", now - 700, bid=2.0),  # P1: dropped
        _frame("AAPL", 0, bid=3.0),      # P1/P2: dropped
        _frame("AAPL", now - 100_000_000_000, bid=4.0),  # > 24 h old → TTL-evicted from latest
    ]
    src_dir = str(tmp_path / "wire")
    _write_wire_files(spark, src_dir, frames)

    raw = (spark.readStream.schema("value STRING").text(src_dir)
           .withColumnRenamed("value", "value"))
    pipe = IngestPipeline(spark, str(tmp_path / "out"), symbols_dim,
                          trigger_seconds=1)
    q = pipe.start(raw)
    q.processAllAvailable()
    q.stop()

    hist = spark.read.parquet(pipe.history_path)
    assert hist.count() == 5  # 7 frames - 2 invalid (history keeps old rows)
    got = {r["name"]: r["exchange"] for r in hist.collect()}
    assert got["AAPL"] == "usstock" and got["ZZZ"] == "unknown"

    latest = pipe.latest_snapshot()
    by_name = {r["name"]: r["timestamp"] for r in latest.collect()}
    assert by_name["AAPL"] == now  # timestamp-max last-write-wins
    assert set(by_name) == {"AAPL", "BTCUSD", "ZZZ"}


def test_ingest_exactly_once_on_restart(spark, symbols_dim, tmp_path):
    """Restarting from the checkpoint must not duplicate history rows
    (the upgrade over the reference's at-most-once, SURVEY §2.9)."""
    import time
    now = int(time.time() * 1000)
    src_dir = str(tmp_path / "wire")
    _write_wire_files(spark, src_dir, [_frame("AAPL", now - 1000, bid=1.0)], n_files=1)
    pipe = IngestPipeline(spark, str(tmp_path / "out"), symbols_dim)

    raw = spark.readStream.schema("value STRING").text(src_dir)
    q = pipe.start(raw)
    q.processAllAvailable(); q.stop()
    assert spark.read.parquet(pipe.history_path).count() == 1

    # restart same checkpoint, add one new file
    with open(os.path.join(src_dir, "frames_new.json"), "w") as fh:
        fh.write(json.dumps(_frame("AAPL", now, bid=2.0)) + "\n")
    raw2 = spark.readStream.schema("value STRING").text(src_dir)
    q2 = pipe.start(raw2)
    q2.processAllAvailable(); q2.stop()
    hist = spark.read.parquet(pipe.history_path)
    assert hist.count() == 2  # old file not reprocessed
    assert pipe.latest_snapshot().filter(F.col("name") == "AAPL") \
        .collect()[0]["timestamp"] == now


def test_history_epoch_replay_idempotent(spark, symbols_dim, tmp_path):
    """Replaying a crashed epoch (same epoch_id) must not duplicate
    history rows: each epoch overwrites its own partition directory
    (the foreachBatch idempotence contract)."""
    import time
    now = int(time.time() * 1000)
    frames = spark.createDataFrame([
        Row(value=json.dumps(_frame("AAPL", now, bid=10.0))),
        Row(value=json.dumps(_frame("BTCUSD", now, bid=9.0))),
    ])
    batch = build_ingest_stream(frames, symbols_dim)
    pipe = IngestPipeline(spark, str(tmp_path / "out"), symbols_dim)
    pipe._write_batch(batch, 7)
    pipe._write_batch(batch, 7)  # crash-replay of the same epoch
    assert pipe.history().count() == 2
    assert pipe.latest_snapshot().count() == 2
    pipe._write_batch(batch, 8)  # a new epoch appends
    assert pipe.history().count() == 4
    assert pipe.latest_snapshot().count() == 2  # ts-max merge unchanged


def test_serve_path_flatten_and_client_views(spark, tmp_path):
    """E2: shared flatten + per-client compiled transforms + wire JSON."""
    latest = spark.createDataFrame([
        Row(name="AAPL", timestamp=2000, exchange="usstock",
            data=json.dumps({"data": {"bid": 10.0, "ask": 11.0}})),
        Row(name="BTCUSD", timestamp=1500, exchange="crypto",
            data=json.dumps({"data": {"bid": 9.0, "ask": 9.5}})),
    ])
    configs = spark.createDataFrame([
        Row(id="c1", config=json.dumps({"symbols": {"AAPL": {
            "value_rules": {"bid": {"op": "add", "value": 1}},
            "remove_fields": ["ask"]}}})),
        Row(id="c2", config=None),
    ])
    views = build_serve_snapshot(latest, configs)
    c1 = {r["symbol"]: dict(r["fields"]) for r in views["c1"].collect()}
    assert c1["AAPL"] == {"bid": 11.0}          # transformed
    assert c1["BTCUSD"] == {"bid": 9.0, "ask": 9.5}  # P8 passthrough
    c2 = {r["symbol"]: dict(r["fields"]) for r in views["c2"].collect()}
    assert c2["AAPL"] == {"bid": 10.0, "ask": 11.0}  # no config → identity

    wire = wire_payload(views["c1"]).collect()
    parsed = {r["symbol"]: json.loads(r["wire"]) for r in wire}
    assert parsed["AAPL"]["fields"] == {"bid": 11.0}


def test_serve_tick_auth_gate(spark):
    import hashlib
    latest = spark.createDataFrame([
        Row(name="AAPL", timestamp=1, exchange="usstock",
            data=json.dumps({"data": {"bid": 1.0}}))])
    configs = spark.createDataFrame([Row(id="c1", config=None)],
                                    schema="id string, config string")
    keys = spark.createDataFrame([
        Row(client_id="c1", key_hash=hashlib.sha256(b"good").hexdigest(),
            is_active=True),
        Row(client_id="c2", key_hash=hashlib.sha256(b"dead").hexdigest(),
            is_active=False),
    ])
    views = serve_tick(spark, latest, configs, keys,
                       {"conn1": "good", "conn2": "dead", "conn3": "nope"})
    assert set(views) == {"conn1"}  # inactive + unknown keys rejected


def test_ws_source_contract(spark):
    """WS source offset/read/commit contract with injected frames
    (pure-contract path, no socket)."""
    reader = ws_sources.WebSocketStreamReader(
        {"symbols": json.dumps(["AAPL"]), "maxFramesPerTrigger": "100"})
    assert reader.initialOffset() == {"count": 0}
    reader.prefetched_frames([
        {"name": "AAPL", "timestamp": 1, "data": {"data": {"bid": 1.0}}},
        {"name": "MSFT", "timestamp": 2, "data": {"data": {"bid": 2.0}}},
    ])
    it, end = reader.read({"count": 0})
    rows = list(it)
    assert end == {"count": 2}
    assert len(rows) == 2 and rows[0][0] == "AAPL"
    # in-flight replay before commit sees the same slice
    assert len(list(reader.readBetweenOffsets({"count": 0}, end))) == 2
    reader.commit(end)
    assert reader._base == 2 and reader._buffer == []  # buffer trimmed
    # next read starts where we left off
    reader.prefetched_frames([
        {"name": "AAPL", "timestamp": 3, "data": {"data": {"bid": 3.0}}}])
    it2, end2 = reader.read(end)
    assert end2 == {"count": 3} and len(list(it2)) == 1
    assert ws_sources.register(spark) in (True, False)


def test_ws_publisher_broadcast_e2e(spark):
    """K4 e2e (server.go:43-130): two live WS clients with different
    configs receive differently-transformed JSON for the SAME snapshot
    in one tick; a client with a dead key receives nothing."""
    import hashlib
    import time
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm
    from market_data_ingestor_go_spark.streaming.publisher import ServePublisher

    latest = spark.createDataFrame([
        Row(name="AAPL", timestamp=2000, exchange="usstock",
            data=json.dumps({"data": {"bid": 10.0, "ask": 11.0}})),
        Row(name="BTCUSD", timestamp=1500, exchange="crypto",
            data=json.dumps({"data": {"bid": 9.0, "ask": 9.5}})),
    ])
    configs = spark.createDataFrame([
        Row(id="c1", config=json.dumps({"symbols": {"AAPL": {
            "value_rules": {"bid": {"op": "add", "value": 1}},
            "remove_fields": ["ask"]}}})),
        Row(id="c2", config=None),
    ])
    keys = spark.createDataFrame([
        Row(client_id="c1", key_hash=hashlib.sha256(b"k1").hexdigest(),
            is_active=True),
        Row(client_id="c2", key_hash=hashlib.sha256(b"k2").hexdigest(),
            is_active=True),
        Row(client_id="c3", key_hash=hashlib.sha256(b"dead").hexdigest(),
            is_active=False),
    ])
    pub = ServePublisher(spark, keys, configs).start()
    try:
        c1 = wm.connect(pub.url, headers={"x-api-key": "k1"})
        c2 = wm.connect(pub.url, headers={"x-api-key": "k2"})
        c3 = wm.connect(pub.url, headers={"x-api-key": "dead"})
        deadline = time.monotonic() + 5
        while len(pub.presented_keys()) < 3 and time.monotonic() < deadline:
            time.sleep(0.05)
        sent = pub.tick(latest)
        assert sent == 4  # 2 records × 2 authorized clients

        got1 = {}
        for _ in range(2):
            m = json.loads(c1.recv(timeout=5.0))
            got1[m["symbol"]] = m
        got2 = {}
        for _ in range(2):
            m = json.loads(c2.recv(timeout=5.0))
            got2[m["symbol"]] = m
        assert got1["AAPL"]["fields"] == {"bid": 11.0}          # transformed
        assert got2["AAPL"]["fields"] == {"bid": 10.0, "ask": 11.0}  # identity
        assert got1["BTCUSD"]["fields"] == got2["BTCUSD"]["fields"]  # P8 gate
        with pytest.raises(TimeoutError):
            c3.recv(timeout=0.3)  # inactive key → no broadcast
        for c in (c1, c2, c3):
            c.close()
    finally:
        pub.stop()


def test_ws_minimal_loopback():
    """RFC 6455 stdlib client/server: handshake, text echo, ping/pong,
    headers, masked payloads >125 bytes, close."""
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm

    echoed = []

    def on_connect(conn):
        try:
            while True:
                echoed.append(conn.recv(timeout=5.0))
                conn.send("ack:" + echoed[-1][:10])
        except (wm.ConnectionClosed, TimeoutError):
            pass

    server = wm.WSServer(on_connect=on_connect).start()
    try:
        client = wm.connect(server.url, headers={"x-api-key": "k1"})
        client.send("hello")
        assert client.recv(timeout=5.0) == "ack:hello"
        big = "x" * 70000  # 64-bit length frame path
        client.send(big)
        assert client.recv(timeout=5.0) == "ack:" + "x" * 10
        assert echoed == ["hello", big]
        # server saw the auth header from the upgrade request
        srv_conn = server.connections()[0]
        assert srv_conn.headers.get("x-api-key") == "k1"
        # idle recv raises TimeoutError, not ConnectionClosed
        with pytest.raises(TimeoutError):
            client.recv(timeout=0.1)
        client.close()
    finally:
        server.stop()


def _frame_feed_server(wm, frames_per_conn):
    """WS server that reads the subscribe handshake then replays a
    batch of frames per connection (one batch per connect cycle)."""
    handshakes = []

    def on_connect(conn):
        try:
            handshakes.append(json.loads(conn.recv(timeout=5.0)))
            batch = frames_per_conn.pop(0) if frames_per_conn else []
            for f in batch:
                conn.send(f if isinstance(f, str) else json.dumps(f))
        except (wm.ConnectionClosed, TimeoutError):
            pass

    return wm.WSServer(on_connect=on_connect).start(), handshakes


def test_ws_reader_live_poll_and_reconnect(monkeypatch):
    """S1/X7 e2e over a real socket: subscribe handshake, frame decode,
    drop-on-unmarshal-error, idle-vs-disconnect distinction, reconnect
    with backoff after the server drops the connection
    (ingestor.go:31-127)."""
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm
    monkeypatch.setattr(ws_sources, "RECONNECT_INITIAL_S", 0.05)

    batches = [
        [_frame("AAPL", 1, bid=1.0), "not json {{{", _frame("MSFT", 2, bid=2.0)],
        [_frame("AAPL", 3, bid=3.0)],
    ]
    server, handshakes = _frame_feed_server(wm, batches)
    try:
        reader = ws_sources.WebSocketStreamReader({
            "url": server.url, "api_key": "k1",
            "symbols": json.dumps(["AAPL", "MSFT"]),
            "pollBudgetSecs": "3.0"})
        it, end = reader.read(reader.initialOffset())
        rows = list(it)
        assert [r[0] for r in rows] == ["AAPL", "MSFT"]  # bad JSON dropped
        assert end == {"count": 2}
        assert handshakes[0] == {"event": "subscribe",
                                 "symbols": ["AAPL", "MSFT"]}
        reader.commit(end)

        # server drops the connection (close all live conns); the next
        # read must reconnect (fresh subscribe handshake) and get batch 2
        for c in server.connections():
            c.close()
        it2, end2 = reader.read(end)
        rows2 = list(it2)
        assert [r[0] for r in rows2] == ["AAPL"] and rows2[0][1] == 3
        assert end2 == {"count": 3}
        assert reader.reconnects >= 1
        assert len(handshakes) == 2  # re-subscribe on reconnect
    finally:
        server.stop()


def test_ws_reader_backpressure_cap(monkeypatch):
    """X1: maxFramesPerTrigger caps a trigger's batch even when the
    feed has more buffered — the remainder arrives next trigger."""
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm
    monkeypatch.setattr(ws_sources, "RECONNECT_INITIAL_S", 0.05)

    frames = [_frame("AAPL", i, bid=float(i)) for i in range(1, 26)]
    server, _ = _frame_feed_server(wm, [frames])
    try:
        reader = ws_sources.WebSocketStreamReader({
            "url": server.url, "api_key": "k",
            "symbols": json.dumps(["AAPL"]),
            "maxFramesPerTrigger": "10", "pollBudgetSecs": "3.0"})
        it1, end1 = reader.read(reader.initialOffset())
        n1 = len(list(it1))
        assert n1 <= 10 and end1["count"] == n1
        reader.commit(end1)
        it2, end2 = reader.read(end1)
        n2 = len(list(it2))
        assert n2 <= 10
        reader.commit(end2)
        it3, end3 = reader.read(end2)
        total = n1 + n2 + len(list(it3))
        assert total == 25  # nothing lost under the cap
    finally:
        server.stop()


def test_ws_source_readstream_e2e(spark, tmp_path):
    """Full Structured Streaming path: readStream.format("ws_market_data")
    against a live local WS server → memory sink. The reader runs in
    Spark's Python source-runner process and dials back over TCP."""
    import time
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm

    if not ws_sources.register(spark):  # pragma: no cover
        pytest.skip("pyspark build lacks the Python DataSource API")

    frames = [_frame("AAPL", i, bid=float(i)) for i in range(1, 21)]
    server, _ = _frame_feed_server(wm, [frames])
    try:
        q = (spark.readStream.format("ws_market_data")
             .option("url", server.url)
             .option("api_key", "k1")
             .option("symbols", json.dumps(["AAPL"]))
             .option("pollBudgetSecs", "2.0")
             .load()
             .writeStream.format("memory").queryName("ws_e2e")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(processingTime="1 second")
             .start())
        deadline = time.monotonic() + 30
        n = 0
        while time.monotonic() < deadline:
            n = spark.sql("SELECT count(*) c FROM ws_e2e").first()["c"]
            if n >= len(frames):
                break
            time.sleep(0.5)
        q.stop()
        assert n == len(frames)
        got = spark.sql(
            "SELECT name, timestamp FROM ws_e2e ORDER BY timestamp").collect()
        assert [r["timestamp"] for r in got] == list(range(1, 21))
        assert got[0]["name"] == "AAPL"
    finally:
        server.stop()


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join with watermarked range condition —
    clicks joined to purchases of the same user within the following
    hour. Both sides buffer in the state store bounded by their
    watermarks (SURVEY §2.4: join shapes the reference lacks, exposed
    by the engine natively in streaming)."""
    base = "2030-01-01T00:"
    c_src, p_src = str(tmp_path / "c"), str(tmp_path / "p")
    os.makedirs(c_src), os.makedirs(p_src)
    with open(c_src + "/a.json", "w") as fh:
        fh.write(json.dumps({"user_id": 1, "cts": f"{base}00:00"}) + "\n")
        fh.write(json.dumps({"user_id": 2, "cts": f"{base}00:00"}) + "\n")
    with open(p_src + "/a.json", "w") as fh:
        fh.write(json.dumps({"user_id": 1, "pts": f"{base}30:00"}) + "\n")  # in range
        fh.write(json.dumps({"user_id": 2, "pts": f"{base}00:00"}) + "\n")  # before → out? no: same time in range
        fh.write(json.dumps({"user_id": 2, "pts": f"{base}59:00"}) + "\n")  # hour later, in range

    clicks = (spark.readStream.schema("user_id LONG, cts TIMESTAMP").json(c_src)
              .withWatermark("cts", "2 hours"))
    purchases = (spark.readStream.schema("user_id LONG, pts TIMESTAMP").json(p_src)
                 .withWatermark("pts", "2 hours"))
    joined = clicks.join(
        purchases,
        (clicks.user_id == purchases.user_id)
        & (purchases.pts >= clicks.cts)
        & (purchases.pts <= clicks.cts + F.expr("INTERVAL 1 HOUR")),
        "inner")
    q = (joined.select(clicks.user_id, "cts", "pts")
         .writeStream.outputMode("append").format("memory")
         .queryName("ssj")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    q.stop()
    rows = {(r["user_id"], r["pts"].minute) for r in spark.sql("SELECT * FROM ssj").collect()}
    assert rows == {(1, 30), (2, 0), (2, 59)}


def test_build_ingest_stream_batch_equivalence(spark, symbols_dim):
    """The same logical plan runs in batch mode (backfill path)."""
    frames = spark.createDataFrame(
        [Row(value=json.dumps(_frame("AAPL", 1000, bid=5.0))),
         Row(value=json.dumps(_frame("", 900, bid=1.0)))])
    out = build_ingest_stream(frames, symbols_dim).collect()
    assert len(out) == 1 and out[0]["exchange"] == "usstock"


def test_streaming_ohlc_matches_batch_rollup(spark, tmp_path):
    """Continuous aggregate (streaming OHLC bars) over file-source
    micro-batches converges to exactly the batch rollup of the same
    events, including a second batch refining an open bar."""
    import os
    from market_data_ingestor_go_spark.streaming.rollup import streaming_ohlc_bars

    src = str(tmp_path / "ev")
    os.makedirs(src)
    base = "2030-01-01T10:"
    rows1 = [
        {"event_id": 1, "ts": f"{base}00:05", "event_type": "trade", "value": 10.0},
        {"event_id": 2, "ts": f"{base}01:00", "event_type": "trade", "value": 12.0},
        {"event_id": 3, "ts": f"{base}16:00", "event_type": "trade", "value": 9.0},
        {"event_id": 4, "ts": f"{base}00:30", "event_type": "quote", "value": 5.0},
    ]
    rows2 = [  # second micro-batch refines the first trade bar
        {"event_id": 5, "ts": f"{base}14:59", "event_type": "trade", "value": 20.0},
        {"event_id": 6, "ts": f"{base}00:01", "event_type": "trade", "value": 1.0},
    ]
    with open(src + "/a.json", "w") as fh:
        for r in rows1:
            fh.write(json.dumps(r) + "\n")

    schema = "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
    stream = spark.readStream.schema(schema).json(src)
    q = (streaming_ohlc_bars(stream).writeStream
         .outputMode("complete").format("memory").queryName("ohlc_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    with open(src + "/b.json", "w") as fh:
        for r in rows2:
            fh.write(json.dumps(r) + "\n")
    q.processAllAvailable()
    q.stop()

    got = {(r["bar_start_ms"], r["event_type"]): r
           for r in spark.sql("SELECT * FROM ohlc_stream").collect()}
    batch = spark.createDataFrame([Row(**r) for r in rows1 + rows2])
    from market_data_ingestor_go_spark.streaming.rollup import streaming_ohlc_bars as _s
    expect = {(r["bar_start_ms"], r["event_type"]): r
              for r in _s(batch.withColumn("ts", F.col("ts").cast("timestamp")))
              .collect()}
    assert set(got) == set(expect) and len(got) == 3
    for k in expect:
        for c in ("open", "high", "low", "close", "n_events", "sum_value"):
            assert got[k][c] == expect[k][c], (k, c)
    tbar = got[(1893492000000, "trade")]
    assert (tbar["open"], tbar["close"], tbar["n_events"]) == (1.0, 20.0, 4)


def test_serve_tick_envelope(spark, tmp_path):
    """E2 envelope (server.go:88 — 1 s tick): steady-state publisher
    tick over a parquet-backed 500-symbol snapshot with 10 live
    connections across 2 distinct configs. Bound is 2.5 s (generous
    for shared-host noise; measured steady ~0.6-1.0 s on local[32]) —
    catches order-of-magnitude regressions like per-client view
    compilation or per-connection auth lookups."""
    import hashlib
    import time
    from market_data_ingestor_go_spark.streaming.publisher import ServePublisher
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm

    spark.createDataFrame([
        Row(name=f"SYM{i}", timestamp=1000 + i, exchange="x",
            data=json.dumps({"data": {"bid": float(i), "ask": float(i) + 0.5}}))
        for i in range(500)]).write.mode("overwrite").parquet(str(tmp_path / "latest"))
    cfg = json.dumps({"symbols": {
        "SYM1": {"value_rules": {"bid": {"op": "mul", "value": 2}}},
        "SYM2": {"remove_fields": ["ask"]}}})
    configs = spark.createDataFrame(
        [Row(id=f"c{j}", config=cfg if j % 2 else None) for j in range(10)]).cache()
    keys = spark.createDataFrame(
        [Row(client_id=f"c{j}",
             key_hash=hashlib.sha256(f"k{j}".encode()).hexdigest(),
             is_active=True) for j in range(10)]).cache()
    configs.count(), keys.count()

    pub = ServePublisher(spark, keys, configs).start()
    try:
        conns = [wm.connect(pub.url, headers={"x-api-key": f"k{j}"})
                 for j in range(10)]
        deadline = time.monotonic() + 5
        while len(pub.presented_keys()) < 10 and time.monotonic() < deadline:
            time.sleep(0.05)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            sent = pub.tick(spark.read.parquet(str(tmp_path / "latest")))
            times.append(time.perf_counter() - t0)
            assert sent == 5000  # 500 symbols × 10 authorized conns
        steady = sorted(times[1:])[len(times[1:]) // 2]  # median of warm ticks
        if steady >= 2.5:
            # Load-calibrated rescue (the bench.py device): under
            # ambient co-tenant load absolute seconds lie — observed
            # steady 3.56 s during a run where the WHOLE suite ran
            # 2.2x slow. Measure a fixed pure-CPU calibration job in
            # the same session (quiet-host median ~0.39 s, recorded
            # in bench_detail.json) and accept when the RATIO stays
            # inside the quiet-host envelope x ~2.7 headroom.
            import pyspark.sql.functions as _F
            cals = []
            for _ in range(3):
                c0 = time.perf_counter()
                (spark.range(0, 2_000_000, 1, 8)
                 .select(_F.xxhash64(_F.col("id").cast("string"))
                         .alias("h"))
                 .agg(_F.sum(_F.pmod("h", _F.lit(1000)))).collect())
                cals.append(time.perf_counter() - c0)
            cal = sorted(cals)[1]
            assert steady / cal < 7.0, \
                f"serve tick envelope blown: {times} (cal {cal:.3f}s)"
        for c in conns:
            c.close()
    finally:
        pub.stop()


def test_history_date_partitioned_layout(spark, symbols_dim, tmp_path):
    """Opt-in ds=<date> partitioning inside each epoch dir: time-range
    scans prune at the directory level, epoch replay stays idempotent,
    and compaction preserves the partition layout."""
    frames1 = spark.createDataFrame([
        Row(value=json.dumps(_frame("AAPL", 1735689600000, bid=1.0))),  # 2025-01-01
        Row(value=json.dumps(_frame("AAPL", 1735776000000, bid=2.0))),  # 2025-01-02
    ])
    frames2 = spark.createDataFrame([
        Row(value=json.dumps(_frame("BTCUSD", 1735862400000, bid=3.0)))  # 2025-01-03
    ])
    from market_data_ingestor_go_spark.streaming.pipeline import (
        IngestPipeline, build_ingest_stream, compact_history, read_history)
    pipe = IngestPipeline(spark, str(tmp_path / "out"), symbols_dim,
                          ttl_millis=1 << 60, partition_by_date=True)
    pipe._write_batch(build_ingest_stream(frames1, symbols_dim), 0)
    pipe._write_batch(build_ingest_stream(frames1, symbols_dim), 0)  # replay
    pipe._write_batch(build_ingest_stream(frames2, symbols_dim), 1)

    import pathlib
    ds_dirs = {p.name for p in pathlib.Path(pipe.history_path).rglob("ds=*")}
    assert ds_dirs == {"ds=2025-01-01", "ds=2025-01-02", "ds=2025-01-03"}

    hist = pipe.history()
    assert hist.count() == 3  # replay did not duplicate
    assert "ds" in hist.columns and "epoch" not in hist.columns

    # a ds filter reaches the scan as a PartitionFilter (directory prune)
    plan = (hist.filter(F.col("ds") == "2025-01-02")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [isnotnull(ds" in plan, plan

    n_files = compact_history(spark, pipe.history_path, target_partitions=1)
    assert n_files >= 3  # ≥ one file per date partition
    hist2 = read_history(spark, pipe.history_path)
    assert hist2.count() == 3
    assert {r["ds"].isoformat() for r in hist2.select("ds").collect()} == {
        "2025-01-01", "2025-01-02", "2025-01-03"}
    # post-compaction epochs keep writing cleanly into the same table
    pipe._write_batch(build_ingest_stream(frames2, symbols_dim), 2)
    assert read_history(spark, pipe.history_path).count() == 4


# -- round 3: WS read-pump hardening + K5 audit + replay gap ----------


def test_ws_partial_frame_buffering():
    """A recv() timeout mid-frame must keep the partial bytes buffered:
    the next recv returns the full message instead of desyncing on
    payload bytes parsed as a frame header (advisor finding r2)."""
    import time
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm

    server = wm.WSServer().start()
    try:
        client = wm.connect(server.url)
        deadline = time.monotonic() + 5
        while not server.connections() and time.monotonic() < deadline:
            time.sleep(0.02)
        srv_conn = server.connections()[0]
        frame = wm._encode_frame(b"split-frame-payload", wm.OP_TEXT, mask=True)
        client.sock.sendall(frame[:5])  # header + part of the mask/payload
        with pytest.raises(TimeoutError):
            srv_conn.recv(timeout=0.2)  # partial frame → idle, NOT desync
        client.sock.sendall(frame[5:])
        assert srv_conn.recv(timeout=2.0) == "split-frame-payload"
        # stream stays in sync for subsequent whole frames
        client.send("next")
        assert srv_conn.recv(timeout=2.0) == "next"
        client.close()
    finally:
        server.stop()


def test_ws_oversized_frame_drops_connection():
    """server.go:161 SetReadLimit(512) semantics: a frame declaring a
    length over the limit closes the connection before any payload
    read (the declared length alone triggers it)."""
    import time
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm

    server = wm.WSServer(max_frame_bytes=64).start()
    try:
        client = wm.connect(server.url)
        deadline = time.monotonic() + 5
        while not server.connections() and time.monotonic() < deadline:
            time.sleep(0.02)
        srv_conn = server.connections()[0]
        client.send("x" * 200)
        with pytest.raises(wm.FrameTooLarge):
            srv_conn.recv(timeout=2.0)
        assert srv_conn._closed
        client.close()
    finally:
        server.stop()


def _publisher_fixture(spark, **kwargs):
    import hashlib
    from market_data_ingestor_go_spark.streaming.publisher import ServePublisher

    configs = spark.createDataFrame([Row(id="c1", config=None)],
                                    schema="id string, config string")
    keys = spark.createDataFrame([
        Row(client_id="c1", key_hash=hashlib.sha256(b"k1").hexdigest(),
            is_active=True, last_used_at=None),
        Row(client_id="c2", key_hash=hashlib.sha256(b"k2").hexdigest(),
            is_active=True, last_used_at=None),
    ], schema="client_id string, key_hash string, is_active boolean, "
              "last_used_at timestamp")
    return ServePublisher(spark, keys, configs, **kwargs)


def test_publisher_idle_eviction_and_pong_extend(spark):
    """server.go:161-165: a silent client is evicted past the idle
    deadline; a client answering pings (pong) keeps extending it."""
    import socket
    import threading
    import time
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm

    pub = _publisher_fixture(spark, idle_deadline_s=1.2, ping_interval_s=0.4)
    pub.server.start()  # accept loop only — no Spark ticker needed
    try:
        # responsive client: a recv loop auto-pongs the server's pings
        alive = wm.connect(pub.url, headers={"x-api-key": "k1"})
        stop = threading.Event()

        def _pump():
            while not stop.is_set():
                try:
                    alive.recv(timeout=0.2)
                except TimeoutError:
                    continue
                except wm.ConnectionClosed:
                    return

        t = threading.Thread(target=_pump, daemon=True)
        t.start()
        # silent client: never reads, never writes after the handshake
        silent = wm.connect(pub.url, headers={"x-api-key": "k2"})
        silent.sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        deadline = time.monotonic() + 5
        while len(pub.presented_keys()) < 2 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert len(pub.presented_keys()) == 2
        time.sleep(3.0)  # > 2 idle deadlines
        keys_left = set(pub.presented_keys().values())
        assert keys_left == {"k1"}, keys_left  # silent evicted, live stays
        assert pub.evictions >= 1
        stop.set()
        t.join(timeout=2)
        alive.close()
        silent.close()
    finally:
        pub.stop()


def test_publisher_audit_touches_used_key(spark):
    """K5 wired into the live tick (postgres.go:156-160): after a tick
    with one connected client, the audit sink sees last_used_at set for
    THAT key only — fire-and-forget, off the tick thread."""
    import threading
    import time
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm

    audited = {}
    done = threading.Event()

    def audit_sink(df):
        for r in df.collect():
            audited[r["client_id"]] = r["last_used_at"]
        done.set()

    pub = _publisher_fixture(spark, audit_sink=audit_sink)
    pub.server.start()
    latest = spark.createDataFrame([
        Row(name="AAPL", timestamp=2000, exchange="usstock",
            data=json.dumps({"data": {"bid": 10.0}}))])
    try:
        c1 = wm.connect(pub.url, headers={"x-api-key": "k1"})
        deadline = time.monotonic() + 5
        while not pub.presented_keys() and time.monotonic() < deadline:
            time.sleep(0.05)
        assert pub.tick(latest) == 1
        assert done.wait(timeout=10), "audit sink never fired"
        assert audited["c1"] is not None      # connected key touched
        assert audited["c2"] is None          # unused key untouched
        c1.close()
    finally:
        pub.stop()


def test_ws_replay_gap_raises():
    """A fresh reader (post-restart) asked to replay offsets it cannot
    cover must raise, not silently complete with zero rows (advisor
    finding r2: silent data loss)."""
    reader = ws_sources.WebSocketStreamReader({"symbols": "[]"})
    with pytest.raises(RuntimeError, match="cannot replay"):
        reader.readBetweenOffsets({"count": 5}, {"count": 10})


def test_latest_state_partitions_knob(spark, symbols_dim, tmp_path):
    """state_partitions>1 writes the latest table as multiple key-hash
    files (the 10^8-key posture) instead of the hardcoded coalesce(1)."""
    import pathlib
    frames = [_frame(f"SYM{i}", 1000 + i, bid=float(i)) for i in range(200)]
    batch = spark.createDataFrame(
        [Row(**f) for f in frames],
        schema="name string, timestamp long, exchange string, data string")
    batch = batch.withColumn("data", F.to_json(F.struct(F.struct(
        F.lit(1.0).alias("bid")).alias("data"))))
    pipe = IngestPipeline(spark, str(tmp_path / "out"), symbols_dim,
                          ttl_millis=1 << 60, state_partitions=4)
    pipe._write_batch(batch, 0)
    files = [p for p in pathlib.Path(pipe.latest_path).glob("part-*.parquet")]
    assert len(files) == 4, files
    assert pipe.latest_snapshot().count() == 200


def test_streaming_dedup_within_watermark(spark, symbols_dim, tmp_path):
    """Effectively-once stage: duplicate (name, timestamp) frames —
    the at-least-once WS replay shape — reach history exactly once
    when dedup_horizon is set, across micro-batches."""
    import time
    now = int(time.time() * 1000)
    dup = _frame("AAPL", now - 1000, bid=10.0)
    frames = [dup, _frame("BTCUSD", now - 500, bid=9.0), dup,
              dup, _frame("AAPL", now, bid=11.0)]
    src_dir = str(tmp_path / "wire")
    _write_wire_files(spark, src_dir, frames, n_files=3)  # dups straddle files
    raw = spark.readStream.schema("value STRING").text(src_dir)
    pipe = IngestPipeline(spark, str(tmp_path / "out"), symbols_dim,
                          dedup_horizon="10 minutes", trigger_seconds=1)
    q = pipe.start(raw)
    q.processAllAvailable(); q.stop()
    hist = spark.read.parquet(pipe.history_path)
    rows = [(r["name"], r["timestamp"]) for r in hist.collect()]
    assert len(rows) == 3 and len(set(rows)) == 3, rows
    assert pipe.latest_snapshot().count() == 2


def test_publisher_metrics_export(spark):
    """Serve-side counters export into the shared registry and render
    through the Prometheus endpoint beside the ingest metrics."""
    from market_data_ingestor_go_spark.streaming.endpoints import (
        render_prometheus)
    from market_data_ingestor_go_spark.streaming.observability import (
        MetricsRegistry)
    pub = _publisher_fixture(spark)
    pub.ticks, pub.records_sent, pub.evictions = 3, 12, 1
    reg = MetricsRegistry()
    pub.export_metrics(reg)
    text = render_prometheus(reg)
    assert "serve_ticks 3" in text
    assert "serve_records_sent 12" in text
    assert "serve_evictions 1" in text
    assert "serve_connections 0" in text


def test_ws_parser_chunking_invariance():
    """Property: however the byte stream is sliced into recv() chunks,
    the parser yields the same message sequence (hypothesis over
    messages + chunk boundaries; covers 7/16/64-bit length paths)."""
    from hypothesis import given, settings, strategies as st
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm

    class _FakeSock:
        def __init__(self, chunks):
            self._chunks = list(chunks)
        def settimeout(self, t):
            pass
        def recv(self, n):
            if not self._chunks:
                raise TimeoutError("drained")
            return self._chunks.pop(0)
        def sendall(self, b):
            pass
        def close(self):
            pass

    @settings(max_examples=150, deadline=None)
    @given(
        msgs=st.lists(st.text(
            alphabet=st.characters(codec="utf-8"), max_size=300),
            min_size=1, max_size=5),
        mask=st.booleans(),
        seed=st.randoms(use_true_random=False),
    )
    def prop(msgs, mask, seed):
        # one message forced over the 16-bit length boundary sometimes
        stream = b"".join(
            wm._encode_frame(m.encode(), wm.OP_TEXT, mask) for m in msgs)
        # random chunk boundaries, including 1-byte slices
        chunks, i = [], 0
        while i < len(stream):
            step = seed.randint(1, 7)
            chunks.append(stream[i:i + step])
            i += step
        conn = wm.WSConnection(_FakeSock(chunks), mask_outgoing=False)
        got = []
        while True:
            try:
                # generous per-call deadline: the fake sock never
                # blocks (drained -> immediate TimeoutError), so the
                # deadline's only possible effect is a FALSE timeout
                # between queued chunks when the host stalls the
                # process >10 ms (observed: FlakyFailure under a
                # loaded box truncated the stream after message 1)
                got.append(conn.recv(timeout=5.0))
            except TimeoutError:
                break
        assert got == msgs

    prop()


def test_ws_recv_deadline_survives_trickle():
    """recv(timeout) is a per-call deadline: a peer trickling one byte
    per read cannot keep the call alive past the timeout (the read
    pump's eviction/ping logic lives in the TimeoutError branch)."""
    import time
    from market_data_ingestor_go_spark.streaming import ws_minimal as wm

    frame = wm._encode_frame(b"x" * 200, wm.OP_TEXT, mask=False)

    class _TrickleSock:
        def __init__(self):
            self.i = 0
        def settimeout(self, t):
            pass
        def recv(self, n):
            time.sleep(0.05)
            self.i += 1
            return frame[self.i - 1:self.i]  # one byte per read, forever
        def sendall(self, b):
            pass
        def close(self):
            pass

    conn = wm.WSConnection(_TrickleSock(), mask_outgoing=False)
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        conn.recv(timeout=0.3)
    assert time.monotonic() - t0 < 1.5  # deadline held, not per-read reset


def test_redis_mirror_failure_is_best_effort(spark, symbols_dim, tmp_path):
    """A dead cache must not fail the epoch: parquet sinks land, the
    drop is counted (processor.go retry-exhausted drops are logged and
    ignored too)."""
    batch = spark.createDataFrame(
        [Row(name="AAPL", timestamp=2000, exchange=None, data=None)],
        schema="name string, timestamp long, exchange string, data string")
    pipe = IngestPipeline(spark, str(tmp_path / "out"), symbols_dim,
                          ttl_millis=1 << 60,
                          redis_latest=("127.0.0.1", 1))  # nothing listens
    from market_data_ingestor_go_spark.streaming.pipeline import (
        build_ingest_stream)
    pipe._write_batch(build_ingest_stream(batch, symbols_dim), 0)
    assert pipe.redis_failures == 1
    assert pipe.latest_snapshot().count() == 1  # parquet sink unaffected


def test_contamination_gate_streaming(spark, tmp_path):
    """Round 5 (§2.11 streaming twin): a held-out document leaking
    into a document stream is flagged WITHIN ONE TRIGGER by the
    MinHash contamination gate — held-out side broadcast, zero
    held-out shuffle per batch, flags idempotent per epoch."""
    from market_data_ingestor_go_spark.streaming.contamination import (
        ContaminationGate)

    held_text = ("the quick brown fox jumps over the lazy dog while the "
                 "market data ingestor streams ticks into the history "
                 "table every two seconds without dropping frames")
    heldout = spark.createDataFrame(
        [Row(doc_id=1, text="completely unrelated held out evaluation "
                            "prompt about cooking pasta with garlic "
                            "and olive oil in a large pan tonight"),
         Row(doc_id=2, text=held_text)])
    gate = ContaminationGate(heldout, flags_path=str(tmp_path / "flags"),
                             threshold=0.6, trigger_seconds=1)

    src = tmp_path / "docs"
    src.mkdir()
    stream = spark.readStream.schema("doc_id LONG, text STRING") \
        .json(str(src))
    q = gate.attach(stream, str(tmp_path / "ckpt"))

    def write_docs(fname, docs):
        with open(src / fname, "w") as fh:
            for d in docs:
                fh.write(json.dumps(d) + "\n")

    # trigger 1: clean documents only — nothing flagged
    write_docs("b1.json", [
        {"doc_id": 100, "text": "earnings per share rose four percent "
                                "in the third quarter on strong demand "
                                "for cloud services and accelerators"},
        {"doc_id": 101, "text": "the central bank held rates steady "
                                "citing cooling inflation and a tight "
                                "labor market across most regions"}])
    q.processAllAvailable()
    assert gate.docs_flagged == 0 and gate.docs_checked == 2

    # trigger 2: one near-identical leak of held-out doc 2 + one clean
    leaked = held_text.replace("lazy dog", "sleepy dog")
    write_docs("b2.json", [
        {"doc_id": 200, "text": leaked},
        {"doc_id": 201, "text": "shipping volumes through the canal "
                                "recovered to pre disruption levels "
                                "according to the latest port data"}])
    checked_before = gate.docs_checked
    q.processAllAvailable()
    q.stop()

    # flagged within the single trigger that carried the leak
    assert gate.docs_checked == checked_before + 2
    assert gate.docs_flagged == 1
    flags = gate.flags(spark).collect()
    assert {(r["doc_id"], r["heldout_id"]) for r in flags} == {(200, 2)}
    assert all(r["jacc"] >= 0.6 for r in flags)
    gate.stop()


def test_contamination_gate_composes_with_ingest_history(
        spark, symbols_dim, tmp_path):
    """The same gate kernel audits an existing batch table (the ingest
    pipeline's history) via check_batch — streaming and batch share
    one code path, so the eval-integrity check composes with E1."""
    from market_data_ingestor_go_spark.streaming.contamination import (
        ContaminationGate)

    heldout = spark.createDataFrame(
        [Row(doc_id=7, text="alpha beta gamma delta epsilon zeta eta "
                            "theta iota kappa lambda mu nu xi omicron "
                            "pi rho sigma tau upsilon phi chi psi")])
    gate = ContaminationGate(heldout, flags_path=str(tmp_path / "flags2"),
                             threshold=0.6)
    history_like = spark.createDataFrame(
        [Row(doc_id=500, text="alpha beta gamma delta epsilon zeta eta "
                              "theta iota kappa lambda mu nu xi omicron "
                              "pi rho sigma tau upsilon phi chi omega"),
         Row(doc_id=501, text="unrelated text about a completely "
                              "different subject with no shared "
                              "shingles at all in this row")])
    hits = gate.check_batch(history_like).collect()
    assert {(r["doc_id"], r["heldout_id"]) for r in hits} == {(500, 7)}
    gate.stop()


def test_streaming_vector_index_maintenance(spark, tmp_path):
    """Round 5: the materialized ANN index stays fresh from an
    embedding stream — bootstrap a half-corpus, stream the rest in two
    micro-batches, and the probe over the maintained index equals the
    on-the-fly ANN over the FULL corpus; epoch replay is idempotent."""
    import shutil

    from market_data_ingestor_go_spark.operators.similarity import (
        random_hyperplane_ann)
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.vector_index import (
        StreamingVectorIndex)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    boot = emb.filter("vec_id % 2 = 0")
    part1 = emb.filter("vec_id % 4 = 1")
    part2 = emb.filter("vec_id % 4 = 3")

    src = tmp_path / "vecs"
    src.mkdir()

    def drop_file(df, name):
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), str(src / f"{name}.parquet"))

    ix = StreamingVectorIndex(spark, "s_ann_idx", trigger_seconds=1)
    try:
        ix.bootstrap(boot)
        assert ix.epochs == 0  # bootstrap is not a stream epoch

        stream = spark.readStream.schema(emb.schema).parquet(str(src))
        q = ix.attach(stream, str(tmp_path / "ckpt"))
        drop_file(part1, "b1")
        q.processAllAvailable()
        assert ix.epochs == 1

        # new vectors are probe-visible within the trigger that
        # indexed them
        n_after_b1 = spark.table("s_ann_idx").count()
        assert n_after_b1 == boot.count() + part1.count()

        drop_file(part2, "b2")
        q.processAllAvailable()
        q.stop()
        assert ix.epochs == 2
        assert ix.rows_indexed == boot.count() + part1.count() + part2.count()
        # the TABLE must hold every epoch — a static (whole-table)
        # overwrite on the cloned foreachBatch session would pass the
        # counter check but wipe earlier epochs (regression guard for
        # the clone-session conf bug)
        assert spark.table("s_ann_idx").count() == ix.rows_indexed

        # probe over the maintained index == on-the-fly ANN over the
        # full corpus (identical planes/probes/ranking)
        q_vecs = emb.filter("vec_id < 10")
        live = {(r["q_id"], r["n_id"], r["rn"]) for r in
                random_hyperplane_ann(emb, q_vecs, k=5).collect()}
        from_ix = {(r["q_id"], r["n_id"], r["rn"]) for r in
                   ix.probe(q_vecs, k=5).collect()}
        assert from_ix == live

        # idempotent epoch replay: rewriting epoch 1 changes nothing
        n_before = spark.table("s_ann_idx").count()
        ix._index_batch(part2, epoch_id=1)
        assert spark.table("s_ann_idx").count() == n_before

        # compaction folds epochs into one partition, preserving every
        # row and probe results
        assert ix.compact() == n_before
        parts = [r["epoch"] for r in
                 spark.table("s_ann_idx").select("epoch").distinct()
                 .collect()]
        assert parts == [-1]
        assert spark.table("s_ann_idx").count() == n_before
        compacted = {(r["q_id"], r["n_id"], r["rn"]) for r in
                     ix.probe(q_vecs, k=5).collect()}
        assert compacted == live
    finally:
        ix.stop()
        spark.sql("DROP TABLE IF EXISTS s_ann_idx")
        spark.sql("DROP TABLE IF EXISTS s_ann_idx__staging")


def test_streaming_pq_index_maintenance(spark, tmp_path):
    """Round 6: the PQ codes table stays fresh from an embedding
    stream (train offline → encode on ingest → scan at serve) —
    bootstrap a half-corpus, stream the rest in two micro-batches,
    and the probe over the maintained index is ROW-IDENTICAL to
    pq_ann over the full corpus; epoch replay is idempotent."""
    import shutil

    from market_data_ingestor_go_spark.operators.cache import (
        release_pinned)
    from market_data_ingestor_go_spark.operators.similarity import (
        pq_ann, train_pq_codebooks)
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.vector_index import (
        StreamingPQIndex)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    boot = emb.filter("vec_id % 2 = 0")
    part1 = emb.filter("vec_id % 4 = 1")
    part2 = emb.filter("vec_id % 4 = 3")
    books_rows = train_pq_codebooks(emb, m=16, k=16, n_iters=2).collect()
    release_pinned()

    src = tmp_path / "pqvecs"
    src.mkdir()

    def drop_file(df, name):
        stage = str(tmp_path / f"pqstage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), str(src / f"{name}.parquet"))

    ix = StreamingPQIndex(spark, "s_pq_idx", codebook_rows=books_rows,
                          trigger_seconds=1)
    try:
        ix.bootstrap(boot)
        assert ix.epochs == 0
        stream = spark.readStream.schema(emb.schema).parquet(str(src))
        q = ix.attach(stream, str(tmp_path / "pq_ckpt"))
        drop_file(part1, "b1")
        q.processAllAvailable()
        drop_file(part2, "b2")
        q.processAllAvailable()
        q.stop()
        assert ix.epochs == 2
        assert spark.table("s_pq_idx").count() == ix.rows_indexed \
            == emb.count()

        # probe over the maintained codes == pq_ann over the full
        # corpus with the same codebook artifact, row for row
        q_vecs = emb.filter("vec_id < 10")
        books = spark.createDataFrame(
            books_rows, "subspace INT, cell INT, cv ARRAY<DOUBLE>")
        direct = sorted(map(tuple, pq_ann(emb, q_vecs, books, k=5,
                                          shortlist=8).collect()))
        release_pinned()
        from_ix = sorted(map(tuple, ix.probe(q_vecs, k=5,
                                             shortlist=8).collect()))
        assert from_ix == direct

        # idempotent epoch replay
        n_before = spark.table("s_pq_idx").count()
        ix._index_batch(part2, epoch_id=1)
        assert spark.table("s_pq_idx").count() == n_before
    finally:
        ix.stop()
        spark.sql("DROP TABLE IF EXISTS s_pq_idx")


def test_streaming_dedup_gate(spark, tmp_path):
    """Round 5: online near-dup dedup at ingest — batch-internal
    duplicates collapse to the min-id keeper, later arrivals that
    near-duplicate ALREADY-ACCEPTED docs are rejected with an audit
    row, unique docs accumulate in the signature/shingle state."""
    from market_data_ingestor_go_spark.streaming.dedup_gate import (
        StreamingDedupGate)

    base = ("the quick brown fox jumps over the lazy dog while the "
            "ingest pipeline streams documents into training shards "
            "every two seconds without dropping a single frame")
    other = ("completely different prose about cooking pasta with "
             "garlic and olive oil in a large heavy pan over medium "
             "heat until the kitchen smells wonderful tonight")
    third = ("a third unrelated document describing how compilers "
             "lower intermediate representations into machine code "
             "through a long pipeline of optimization passes")

    gate = StreamingDedupGate(spark, "ddg_state",
                              dups_dir=str(tmp_path / "dups"),
                              threshold=0.7, trigger_seconds=1)
    src_dir = tmp_path / "docs"
    src_dir.mkdir()
    stream = spark.readStream.schema("doc_id LONG, text STRING") \
        .json(str(src_dir))

    def write_docs(fname, docs):
        with open(src_dir / fname, "w") as fh:
            for d in docs:
                fh.write(json.dumps(d) + "\n")

    try:
        q = gate.attach(stream, str(tmp_path / "ckpt"))

        # batch 1: two near-copies of base (internal dup) + one unique
        write_docs("b1.json", [
            {"doc_id": 10, "text": base},
            {"doc_id": 11, "text": base.replace("lazy", "sleepy")},
            {"doc_id": 12, "text": other}])
        q.processAllAvailable()
        assert gate.docs_seen == 3
        assert gate.docs_accepted == 2   # 10 (keeper) + 12
        assert gate.docs_rejected == 1   # 11 -> dup_of 10

        # batch 2: near-dup of an ACCEPTED doc + a fresh unique doc
        write_docs("b2.json", [
            {"doc_id": 20, "text": base.replace("dog", "cat")},
            {"doc_id": 21, "text": third}])
        q.processAllAvailable()
        q.stop()
        assert gate.docs_seen == 5
        assert gate.docs_accepted == 3   # + 21
        assert gate.docs_rejected == 2   # + (20 -> dup_of 10)

        dups = {(r["doc_id"], r["dup_of"]) for r in
                gate.duplicates().collect()}
        assert dups == {(11, 10), (20, 10)}
        accepted = {r["doc_id"] for r in gate.accepted_ids().collect()}
        assert accepted == {10, 12, 21}
    finally:
        gate.stop()
        spark.sql("DROP TABLE IF EXISTS ddg_state_sig")
        spark.sql("DROP TABLE IF EXISTS ddg_state_sh")


def test_streaming_dedup_gate_replay_idempotent(spark, tmp_path):
    """Replaying a crashed epoch through the gate must leave the
    signature/shingle state and the audit table unchanged (dynamic
    partition overwrite per epoch — same contract as the other
    foreachBatch sinks)."""
    from market_data_ingestor_go_spark.streaming.dedup_gate import (
        StreamingDedupGate)

    gate = StreamingDedupGate(spark, "ddg_replay",
                              dups_dir=str(tmp_path / "dups"),
                              threshold=0.7)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="one unique document about compilers "
                            "lowering intermediate representations "
                            "through optimization passes"),
         Row(doc_id=2, text="another unique document about cooking "
                            "pasta with garlic and olive oil in a "
                            "heavy pan over medium heat")])
    try:
        gate._gate_batch(docs, epoch_id=0)
        n_sig = spark.table("ddg_replay_sig").count()
        n_sh = spark.table("ddg_replay_sh").count()
        assert n_sh == 2
        gate._gate_batch(docs, epoch_id=0)  # crash-replay, same epoch
        assert spark.table("ddg_replay_sig").count() == n_sig
        assert spark.table("ddg_replay_sh").count() == n_sh
        # audit table for the replayed epoch is also overwritten,
        # not duplicated
        assert gate.duplicates().count() == 0
    finally:
        gate.stop()
        spark.sql("DROP TABLE IF EXISTS ddg_replay_sig")
        spark.sql("DROP TABLE IF EXISTS ddg_replay_sh")


def test_streaming_dedup_gate_state_not_shuffled(spark, tmp_path):
    """The vs-corpus candidate join must broadcast the BATCH side: the
    accumulated signature table is the big side at scale and must be
    probed in place (no Exchange of the state table, no
    SortMergeJoin)."""
    import re

    from market_data_ingestor_go_spark.operators.dedup import (
        banded_signatures, minhash_signatures, shingle_df)
    from market_data_ingestor_go_spark.streaming.dedup_gate import (
        StreamingDedupGate)

    gate = StreamingDedupGate(spark, "ddg_plan",
                              dups_dir=str(tmp_path / "dups"),
                              threshold=0.7)
    seed = spark.createDataFrame(
        [Row(doc_id=1, text="seed document establishing the accepted "
                            "corpus state for the plan assertion "
                            "below with enough words to shingle")])
    probe = spark.createDataFrame(
        [Row(doc_id=2, text="a probing document that is entirely "
                            "different from the seed so nothing "
                            "matches during this plan check")])
    try:
        gate._gate_batch(seed, epoch_id=0)
        sa = shingle_df(probe, "text", "doc_id", 3)
        bands_a = banded_signatures(
            minhash_signatures(sa, gate.num_perms),
            gate.num_bands, gate.num_perms // gate.num_bands)
        cand = (F.broadcast(bands_a.withColumnRenamed("id", "a_id"))
                .join(spark.table(gate.sig_table), ["band", "bh"])
                .select("a_id", F.col("id").alias("b_id")).distinct())
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, plan
        # the state-table scan must not sit under a hash-partitioning
        # exchange (broadcast of the batch side probes it in place)
        assert not re.search(
            r"Exchange hashpartitioning[^\n]*\n[^\n]*ddg_plan_sig",
            plan), plan
    finally:
        gate.stop()
        spark.sql("DROP TABLE IF EXISTS ddg_plan_sig")
        spark.sql("DROP TABLE IF EXISTS ddg_plan_sh")


def test_streaming_count_min_equals_batch(spark, tmp_path):
    """Streaming CMS contract: after any number of micro-batches the
    state (≤ d·w counter rows) is BIT-IDENTICAL to the batch sketch
    of the concatenated input — mergeability as the batch↔streaming
    equivalence proof — and heavy-hitter estimates read straight off
    the complete-mode sink agree with the batch path."""
    import json as _json

    from market_data_ingestor_go_spark.operators.sketch import (
        count_min_build, count_min_estimate)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_count_min)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = docs.collect()
    for i, half in enumerate((rows[::2], rows[1::2])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in half:
                fh.write(_json.dumps({"text": r.text}) + "\n")

    d, w = 4, 512
    stream = (spark.readStream.schema("text STRING")
              .option("maxFilesPerTrigger", 1)  # force ≥2 micro-batches
              .json(src))
    q = run_sketch_stream(streaming_count_min(stream, "text", d, w),
                          "cms_stream", str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        assert q.lastProgress["stateOperators"][0]["numRowsTotal"] <= d * w
    finally:
        q.stop()

    got = spark.table("cms_stream")
    want = count_min_build(docs, "text", d, w)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # estimation works directly off the sink table
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")).distinct()
    est_s = count_min_estimate(got, toks, "tok", d, w)
    est_b = count_min_estimate(want, toks, "tok", d, w)
    assert est_s.exceptAll(est_b).count() == 0

    # per-epoch TOP-K readout (r5 verdict task 6): the split-stream
    # heavy hitters equal the batch top-k over the concatenated input
    # row for row (same estimator + deterministic order), and CMS
    # one-sided error holds vs the exact counts
    from market_data_ingestor_go_spark.operators.sketch import (
        token_heavy_hitters)
    from market_data_ingestor_go_spark.streaming.sketches import (
        heavy_hitters_readout)
    top_s = heavy_hitters_readout(got, toks, k=10, d=d, w=w).collect()
    top_b = token_heavy_hitters(docs, "text", k=10, d=d, w=w).collect()
    assert [tuple(r) for r in top_s] == [tuple(r) for r in top_b]
    exact = {r["tok"]: r["cnt"] for r in docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("cnt")).collect()}
    assert all(r["est_count"] >= exact[r["tok"]] for r in top_s)


def test_streaming_distinct_sketch_equals_batch(spark, tmp_path):
    """Streaming HLL distinct per group: state is one sketch per
    group; register-max order-independence makes the streamed
    estimate EQUAL to the batch estimate over the same rows."""
    import json as _json

    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_distinct_sketch)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("lang", "text")
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = docs.collect()
    for i, half in enumerate((rows[::2], rows[1::2])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in half:
                fh.write(_json.dumps({"lang": r.lang, "text": r.text}) + "\n")

    stream = (spark.readStream.schema("lang STRING, text STRING")
              .option("maxFilesPerTrigger", 1)
              .json(src)
              .withColumn("fp", F.xxhash64("text")))
    q = run_sketch_stream(
        streaming_distinct_sketch(stream, "fp", ["lang"], lgk=12),
        "hll_stream", str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.lang): (r.approx_distinct, r.n_rows)
           for r in spark.table("hll_stream").collect()}
    want = {(r.lang): (r.approx_distinct, r.n_rows)
            for r in docs.withColumn("fp", F.xxhash64("text"))
            .groupBy("lang")
            .agg(F.hll_sketch_estimate(
                F.hll_sketch_agg("fp", 12)).alias("approx_distinct"),
                F.count("*").alias("n_rows")).collect()}
    assert got == want


def test_streaming_bloom_equals_batch(spark, tmp_path):
    """Streaming Bloom contract: after N micro-batches the state
    (≤ n_bits/64 word rows) is BIT-IDENTICAL to the batch filter of
    the concatenated key set — OR idempotence means even replayed
    batches can't corrupt it — and the complete-mode sink compiles
    directly into a scan predicate with zero false negatives."""
    import json as _json

    from market_data_ingestor_go_spark.operators.sketch import (
        bloom_build, bloom_might_contain)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_bloom)

    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    keys = part.filter(F.col("p_size") >= 40).select("p_partkey")
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = keys.collect()
    for i, half in enumerate((rows[::2], rows[1::2])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in half:
                fh.write(_json.dumps({"p_partkey": r.p_partkey}) + "\n")

    n_bits, k = 1 << 12, 5
    stream = (spark.readStream.schema("p_partkey BIGINT")
              .option("maxFilesPerTrigger", 1)
              .json(src))
    q = run_sketch_stream(streaming_bloom(stream, "p_partkey", n_bits, k),
                          "bloom_stream", str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        assert state_rows <= n_bits // 64
    finally:
        q.stop()

    got = spark.table("bloom_stream")
    want = bloom_build(keys, "p_partkey", n_bits, k)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # the sink compiles into a predicate: no false negatives
    flag = bloom_might_contain(got, F.col("p_partkey"), n_bits, k)
    members = part.filter(F.col("p_size") >= 40)
    assert members.filter(~flag).count() == 0


def test_streaming_boilerplate_gate(spark, tmp_path):
    """Sub-document boilerplate gate e2e: epoch-0 docs score clean
    (empty state); an epoch-1 doc stitched ENTIRELY from epoch-0
    passages is flagged within its own trigger, while a fresh doc in
    the same batch is not; Bloom state stays ≤ n_bits/64 rows per
    epoch partition no matter how many docs flowed."""
    import json as _json
    import time as _time

    from market_data_ingestor_go_spark.streaming.boilerplate_gate import (
        PassageBoilerplateGate)

    w8 = ["alpha beta gamma delta epsilon zeta eta theta",
          "one two three four five six seven eight",
          "red orange yellow green blue indigo violet umber",
          "north south east west up down left right"]
    src = str(tmp_path / "src")
    os.makedirs(src)
    b0 = [{"doc_id": i + 1, "text": t} for i, t in enumerate(w8)]
    b1 = [{"doc_id": 10, "text": w8[0] + " " + w8[1]},   # all seen
          {"doc_id": 11, "text": "fresh words never appeared before now ok"}]
    for i, batch in enumerate((b0, b1)):
        fp = os.path.join(src, f"b{i}.json")
        with open(fp, "w") as fh:
            for r in batch:
                fh.write(_json.dumps(r) + "\n")
        # file-source batch order follows modification time
        _time.sleep(0.01)
        os.utime(fp, (1700000000 + i, 1700000000 + i))

    gate = PassageBoilerplateGate(
        spark, state_dir=str(tmp_path / "state"),
        audit_dir=str(tmp_path / "audit"), n_bits=1 << 14, threshold=0.5)
    stream = (spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = gate.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    scores = {r.doc_id: r for r in gate.scores().collect()}
    assert len(scores) == 6
    for d in (1, 2, 3, 4):          # epoch 0: nothing seen yet
        assert scores[d].n_seen == 0 and not scores[d].flagged
    assert scores[10].seen_ratio == 1.0 and scores[10].flagged
    assert scores[11].n_seen == 0 and not scores[11].flagged
    assert gate.metrics()["boilerplate_gate_docs_flagged"] == 1

    # bounded state: each epoch partial is a bloom, never the digests
    state = spark.read.parquet(str(tmp_path / "state"))
    per_epoch = state.groupBy("epoch").count().collect()
    assert all(r["count"] <= (1 << 14) // 64 for r in per_epoch)


def test_boilerplate_gate_state_absence_vs_corruption(spark, tmp_path):
    """r6 crash-replay contract: a state dir holding only the
    _temporary/ staging debris of a killed first-epoch write reads as
    'no state yet' (the gate must recover), while a dir with an
    unreadable DATA file fails loud (corrupt state must never degrade
    silently to an empty Bloom filter)."""
    import pytest as _pytest

    from market_data_ingestor_go_spark.streaming.boilerplate_gate import (
        PassageBoilerplateGate)

    state = tmp_path / "bp_state"
    gate = PassageBoilerplateGate(spark, state_dir=str(state))
    assert gate._read_state() is None  # missing path

    (state / "epoch=0" / "_temporary" / "0").mkdir(parents=True)
    (state / "epoch=0" / "_temporary" / "0" / "task-stage.parquet") \
        .write_bytes(b"partial")  # staging debris is NOT data
    assert gate._read_state() is None  # killed first write → recover

    (state / "epoch=0" / "part-00000.parquet").write_bytes(b"garbage")
    with _pytest.raises(Exception):
        df = gate._read_state()  # corrupt DATA file → fail loud
        if df is not None:  # schema may infer lazily; force the read
            df.collect()


def test_boilerplate_gate_compaction(spark, tmp_path):
    """State compaction folds epoch partials into one bit-identical
    filter (OR idempotence), bounded at n_bits/64 rows, and the gate
    keeps flagging correctly against the compacted state."""
    import json as _json
    import time as _time

    from market_data_ingestor_go_spark.operators.sketch import bloom_merge
    from market_data_ingestor_go_spark.streaming.boilerplate_gate import (
        PassageBoilerplateGate)

    w8 = ["alpha beta gamma delta epsilon zeta eta theta",
          "one two three four five six seven eight"]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, t in enumerate(w8):
        fp = os.path.join(src, f"b{i}.json")
        with open(fp, "w") as fh:
            fh.write(_json.dumps({"doc_id": i + 1, "text": t}) + "\n")
        _time.sleep(0.01)
        os.utime(fp, (1700000000 + i, 1700000000 + i))

    gate = PassageBoilerplateGate(
        spark, state_dir=str(tmp_path / "state"),
        audit_dir=str(tmp_path / "audit"), n_bits=1 << 12)
    stream = (spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = gate.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    before = spark.read.parquet(str(tmp_path / "state"))
    want = bloom_merge(before.select("word", "mask")).collect()
    assert before.select("epoch").distinct().count() == 2

    n = gate.compact_state()
    assert 0 < n <= (1 << 12) // 64
    after = spark.read.parquet(str(tmp_path / "state"))
    assert after.select("epoch").distinct().collect()[0][0] == -1
    got = after.select("word", "mask").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    # the gate still flags a doc stitched from compacted history
    q2 = gate.attach(stream, str(tmp_path / "ckpt"))
    try:
        fp = os.path.join(src, "b9.json")
        with open(fp, "w") as fh:
            fh.write(_json.dumps(
                {"doc_id": 99, "text": w8[0] + " " + w8[1]}) + "\n")
        os.utime(fp, (1700000050, 1700000050))
        q2.processAllAvailable()
    finally:
        q2.stop()
    scores = {r.doc_id: r for r in gate.scores().collect()}
    assert scores[99].flagged and scores[99].seen_ratio == 1.0


def test_streaming_moments_equal_batch_bit_exact(spark, tmp_path):
    """The exact-moments family is streaming-ready BY CONSTRUCTION:
    decimal sums are order-independent, so after any micro-batch
    split the streamed (n, sum, sum-of-squares) state is
    BIT-IDENTICAL to the batch sums — and a z-score/std finished
    from the sink equals the batch query's double ops exactly."""
    import json as _json

    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_moments)

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_type", "value")
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = e.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(_json.dumps(
                    {"event_type": r.event_type, "value": r.value}) + "\n")

    stream = (spark.readStream
              .schema("event_type STRING, value DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(
        streaming_moments(stream, "event_type", "value"),
        "moments_stream", str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r.k: (r.n, r.s1, r.s2) for r in
           spark.table("moments_stream").collect()}
    c = F.round(F.col("value") * 100.0).cast("decimal(10,0)")
    want = {r.k: (r.n, r.s1, r.s2) for r in
            e.select(F.col("event_type").alias("k"), c.alias("c"))
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.sum("c").alias("s1"),
                 F.sum(F.col("c") * F.col("c")).alias("s2")).collect()}
    assert got == want  # bit-identical decimals, any batch split

    # finish a std from the sink with the batch query's op sequence
    r = spark.table("moments_stream").filter("k = 'click'").first()
    nD = float(r.n)
    m = float(r.s1) / nD
    v = (float(r.s2) - float(r.s1) * m) / nD
    assert v > 0

    # NULL values drop from n AND the sums together (review catch:
    # counting them in n alone skews every finished statistic)
    from market_data_ingestor_go_spark.streaming.sketches import (
        streaming_moments as _sm)
    nulls = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 2.0)],
        "k STRING, v DOUBLE")
    row = _sm(nulls, "k", "v").collect()[0]
    assert row.n == 2 and int(row.s1) == 300


def test_streaming_lm_quality_gate(spark, tmp_path):
    """LM-quality gate e2e: the fixture corpus trains the reference
    model once; streamed docs score BIT-IDENTICALLY to the batch
    operator regardless of micro-batch split; a degenerate
    (repetitive) doc and an unscorable 1-token doc are flagged within
    their trigger; epoch replay overwrites into identical rows."""
    import json as _json
    import time as _time

    from market_data_ingestor_go_spark.operators.lm_quality import (
        score_with_model)
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.lm_gate import (
        LMQualityGate)

    ref = load_table(spark, "/root/testdata/sf0.01", "documents")
    real = [(r["doc_id"], r["text"]) for r in
            ref.select("doc_id", "text").limit(6).collect()]
    junk = [(100001, "zzq " * 30), (100002, "x")]   # degenerate, 1-token

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [real[:3], real[3:] + junk]
    for i, batch in enumerate(batches):
        fp = os.path.join(src, f"b{i}.json")
        with open(fp, "w") as fh:
            for did, text in batch:
                fh.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        _time.sleep(0.01)
        os.utime(fp, (1700000000 + i, 1700000000 + i))

    gate = LMQualityGate(reference=ref,
                         audit_path=str(tmp_path / "audit"),
                         vocab_size=24, lo_bits=3.0, hi_bits=6.0)
    stream = (spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = gate.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["doc_id"]: r for r in gate.scores().collect()}
    assert len(got) == 8

    # bit-agreement with the batch scorer on the same docs
    all_docs = spark.createDataFrame(
        [(d, t) for d, t in real + junk], "doc_id BIGINT, text STRING")
    batch = {r["doc_id"]: r for r in score_with_model(
        all_docs, gate._vocab, gate._bgc, gate._ctx).collect()}
    for did in batch:
        for c in ("n_tokens", "n_bigrams", "n_oov", "sum_bg",
                  "sum_ctx", "lm_score", "xent_bits"):
            assert got[did][c] == batch[did][c], (did, c)

    # flags: real docs in-band, repetitive doc below the band,
    # 1-token doc unscorable
    for did, _ in real:
        assert not got[did]["flagged"], did
    assert got[100001]["flagged"] and got[100001]["xent_bits"] < 3.0
    assert got[100002]["flagged"] and got[100002]["n_bigrams"] == 0
    m = gate.metrics()
    assert m["lm_gate_docs_scored"] == 8 and m["lm_gate_docs_flagged"] == 2

    # replay idempotence: re-running an epoch overwrites into the
    # exact same rows (static model, deterministic score)
    before = sorted(map(tuple, gate.scores().collect()))
    b1 = spark.createDataFrame(
        [(d, t) for d, t in batches[1]], "doc_id BIGINT, text STRING")
    gate._gate_batch(b1, 1)
    after = sorted(map(tuple, gate.scores().collect()))
    assert before == after
    gate.stop()


def test_streaming_novelty_gate(spark, tmp_path):
    """n-gram novelty gate e2e (r10): documents stream in two
    micro-batches and every audit row is BIT-identical to the batch
    ngram_novelty operator against the same reference split; a doc
    copied verbatim from the reference flags at novelty 0, a <n-token
    doc flags unscorable (null novelty) instead of being dropped, and
    epoch replay overwrites into identical rows (static reference,
    deterministic score)."""
    import json as _json
    import time as _time

    from market_data_ingestor_go_spark.operators.lm_quality import (
        ngram_novelty)
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.novelty_gate import (
        NoveltyGate)

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    ref = docs.filter("doc_id % 20 = 0")
    train = [(r["doc_id"], r["text"]) for r in
             docs.filter("doc_id % 20 != 0")
             .select("doc_id", "text").limit(6).collect()]
    leak_text = ref.select("text").first()["text"]   # verbatim copy
    extra = [(100001, leak_text), (100002, "x y")]   # leak, 2-token
    batches = [train[:3], train[3:] + extra]

    src = str(tmp_path / "nsrc")
    os.makedirs(src)
    for i, batch in enumerate(batches):
        fp = os.path.join(src, f"b{i}.json")
        with open(fp, "w") as fh:
            for did, text in batch:
                fh.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        _time.sleep(0.01)
        os.utime(fp, (1700000000 + i, 1700000000 + i))

    gate = NoveltyGate(reference=ref,
                       audit_path=str(tmp_path / "naudit"),
                       lo_novelty=0.5)
    stream = (spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = gate.attach(stream, str(tmp_path / "nckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["doc_id"]: r for r in gate.scores().collect()}
    assert len(got) == 8

    # bit-agreement with the batch operator on the same docs
    all_docs = spark.createDataFrame(
        [(d, t) for d, t in train + extra], "doc_id BIGINT, text STRING")
    batch = {r["doc_id"]: r for r in
             ngram_novelty(all_docs, ref).collect()}
    for did, r in batch.items():
        for c in ("n_shingles", "n_seen", "novelty"):
            assert got[did][c] == r[c], (did, c)

    # flags: the verbatim reference copy scores novelty 0 and flags;
    # the 2-token doc is unscorable (null novelty) and flags
    assert got[100001]["novelty"] == 0.0 and got[100001]["flagged"]
    assert got[100002]["novelty"] is None and got[100002]["flagged"]
    m = gate.metrics()
    assert m["novelty_gate_docs_scored"] == 8
    assert m["novelty_gate_docs_flagged"] >= 2

    # replay idempotence
    before = sorted(map(tuple, gate.scores().collect()))
    b1 = spark.createDataFrame(
        [(d, t) for d, t in batches[1]], "doc_id BIGINT, text STRING")
    gate._gate_batch(b1, 1)
    after = sorted(map(tuple, gate.scores().collect()))
    assert before == after
    gate.stop()


def test_streaming_semdedup_gate(spark, tmp_path):
    """Semantic dedup gate e2e: (1) within-batch duplicate rejected;
    (2) an epoch-1 vector near-duplicating an accepted epoch-0
    vector is rejected with the right dup_of; (3) SEQUENTIAL-GREEDY
    semantics — a chain a~b, b~c (a≁c) keeps {a, c} here while batch
    semdedup's dominance rule keeps only {a}; (4) epoch replay
    leaves state identical; (5) state probes are cell-bucketed."""
    import json as _json
    import time as _time

    from market_data_ingestor_go_spark.operators.similarity import (
        semdedup)
    from market_data_ingestor_go_spark.streaming.semdedup_gate import (
        StreamingSemanticDedupGate)

    # hand-built 4-d vectors: b sits between a and c so that
    # cos(a,b) >= t, cos(b,c) >= t, cos(a,c) < t at t=0.9
    a, c = [1.0, 0.0, 0.0, 0.0], [0.7071, 0.7071, 0.0, 0.0]
    b = [0.9239, 0.3827, 0.0, 0.0]           # 22.5 deg between a and c
    dup_a = [2.0, 0.02, 0.0, 0.0]            # ~a scaled: cos ~ 1
    fresh = [0.0, 0.0, 1.0, 0.0]
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])],
        "vec_id INT, embedding ARRAY<DOUBLE>")

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        [(1, a), (2, b), (6, a)],            # 6 dups 1 within batch
        [(3, c), (4, dup_a), (5, fresh)],    # 4 dups accepted 1
    ]
    for i, batch in enumerate(batches):
        fp = os.path.join(src, f"b{i}.json")
        with open(fp, "w") as fh:
            for vid, v in batch:
                fh.write(_json.dumps(
                    {"vec_id": vid, "embedding": v}) + "\n")
        _time.sleep(0.01)
        os.utime(fp, (1700000000 + i, 1700000000 + i))

    table = f"semgate_{abs(hash(str(tmp_path))) % 10**8}"
    gate = StreamingSemanticDedupGate(
        spark, centroids=cents, base_table=table,
        dups_dir=str(tmp_path / "dups"), threshold=0.9, n_probes=2)
    stream = (spark.readStream
              .schema("vec_id BIGINT, embedding ARRAY<DOUBLE>")
              .option("maxFilesPerTrigger", 1).json(src))
    q = gate.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    acc = {r["vec_id"] for r in gate.accepted().collect()}
    # sequential greedy: 1=a, 2=b rejected? cos(a,b)=cos(22.5/2...)
    # a~b (cos=0.9239 >= 0.9) -> 2 rejected within epoch 0 vs
    # accepted... NO: same batch -> batch-internal dominance applies
    # to epoch 0; 6 (dup of 1, same batch) rejected. Epoch 1: c vs
    # accepted {1}: cos(a,c)=0.7071 < 0.9 -> ACCEPTED (the batch
    # dominance rule would have dropped it via b); dup_a rejected
    # against 1; fresh accepted.
    assert acc == {1, 3, 5}
    # audit covers BOTH kinds: within-batch rejects (2, 6 — best
    # match is vector 1 by the (cos, id) tiebreak) and the
    # vs-corpus reject (4)
    rej = {r["new_id"]: r["dup_of"] for r in gate.rejections().collect()}
    assert rej == {2: 1, 4: 1, 6: 1}
    m = gate.metrics()
    assert m["semdedup_gate_vecs_seen"] == 6
    assert m["semdedup_gate_vecs_accepted"] == 3

    # batch semdedup on the full corpus drops c through the dropped
    # vector b (dominance rule) — the semantic difference this gate
    # documents
    full = spark.createDataFrame(
        [(vid, v) for bt in batches for vid, v in bt],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    batch_kept = {r["vec_id"] for r in
                  semdedup(full, threshold=0.9, centroids=cents,
                           n_probes=2).collect() if r["kept"]}
    assert 3 not in batch_kept and 3 in acc

    # epoch replay: re-running epoch 1 leaves accepted set identical
    before = sorted(map(tuple, gate.accepted().collect()))
    b1 = spark.createDataFrame(
        [(vid, v) for vid, v in batches[1]],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    gate._gate_batch(b1, 1)
    after = sorted(map(tuple, gate.accepted().collect()))
    assert before == after

    # the state table is bucketed by cell (probe-side shape)
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {table}_vec").collect()
    txt = "\n".join(str(r) for r in desc)
    assert "cell" in txt and "Bucket" in txt

    # compaction folds epochs into epoch=-1, content-identical,
    # bucketing preserved
    n = gate.compact_state()
    assert n == 3
    folded = spark.table(f"{table}_vec")
    assert {r["epoch"] for r in folded.select("epoch").collect()} == {-1}
    assert sorted(map(tuple, gate.accepted().drop("epoch").collect())) \
        == sorted((t[0], t[1]) for t in before)
    txt2 = "\n".join(str(r) for r in
                     spark.sql(f"DESCRIBE TABLE EXTENDED {table}_vec")
                     .collect())
    assert "Bucket" in txt2
    gate.stop()
    spark.sql(f"DROP TABLE IF EXISTS {table}_vec")


def test_streaming_semdedup_gate_single_probe_and_clean_stream(
        spark, tmp_path):
    """Regression (review catches): n_probes=1 must work across
    epochs (the probe explode used to reference a column that only
    exists at p>1), and rejections() must read from epoch 0 even
    when NOTHING was ever rejected (the audit dir is written
    unconditionally, like the text twin)."""
    import json as _json
    import time as _time

    from market_data_ingestor_go_spark.streaming.semdedup_gate import (
        StreamingSemanticDedupGate)

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id INT, embedding ARRAY<DOUBLE>")
    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [[(1, [1.0, 0.1])], [(2, [0.1, 1.0])]]  # all unique
    for i, batch in enumerate(batches):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for vid, v in batch:
                fh.write(_json.dumps(
                    {"vec_id": vid, "embedding": v}) + "\n")
        _time.sleep(0.01)
        os.utime(os.path.join(src, f"b{i}.json"),
                 (1700000000 + i,) * 2)

    table = f"semgate1p_{abs(hash(str(tmp_path))) % 10**8}"
    gate = StreamingSemanticDedupGate(
        spark, centroids=cents, base_table=table,
        dups_dir=str(tmp_path / "dups"), threshold=0.99, n_probes=1)
    stream = (spark.readStream
              .schema("vec_id BIGINT, embedding ARRAY<DOUBLE>")
              .option("maxFilesPerTrigger", 1).json(src))
    q = gate.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # both epochs processed (epoch 1 probes state — the p=1 crash
    # path), nothing rejected, and rejections() reads cleanly
    assert {r["vec_id"] for r in gate.accepted().collect()} == {1, 2}
    assert gate.rejections().count() == 0
    gate.stop()
    spark.sql(f"DROP TABLE IF EXISTS {table}_vec")


def test_streaming_semdedup_gate_bootstrap_real_embeddings(
        spark, tmp_path):
    """Bootstrap the gate from the real 64-d fixture corpus (epoch
    -1), then stream two probes: an exact copy of a bootstrapped
    vector is rejected against it; an orthogonal fresh vector is
    accepted. The bootstrapped baseline is itself batch-dedup'd."""
    import json as _json

    from market_data_ingestor_go_spark.operators.similarity import (
        semdedup, train_kmeans_codebook)
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.semdedup_gate import (
        StreamingSemanticDedupGate)

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = train_kmeans_codebook(e, k=8)
    table = f"semgateboot_{abs(hash(str(tmp_path))) % 10**8}"
    gate = StreamingSemanticDedupGate(
        spark, centroids=cents, base_table=table,
        dups_dir=str(tmp_path / "dups"), threshold=0.4, n_probes=2)
    gate.bootstrap(e)

    # baseline equals batch semdedup's keepers on the same corpus
    # (single batch ⇒ sequential greedy == the batch dominance rule
    # cannot diverge... it CAN via chains — so assert the weaker,
    # correct invariant: the baseline is exactly the gate's own
    # internal-dedup survivors, and every batch-kept vector is kept)
    acc0 = {r["vec_id"] for r in gate.accepted().collect()}
    batch_kept = {r["vec_id"] for r in
                  semdedup(e, threshold=0.4, centroids=cents,
                           n_probes=2).collect() if r["kept"]}
    assert batch_kept <= acc0 and len(acc0) <= e.count()

    # stream: a copy of an accepted vector + an orthogonal one
    some_id = min(acc0)
    vec = [float(x) for x in
           e.filter(F.col("vec_id") == some_id).first()["embedding"]]
    fresh = [0.0] * 64
    fresh[63] = 1.0
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "b0.json"), "w") as fh:
        fh.write(_json.dumps({"vec_id": 900001, "embedding": vec}) + "\n")
        fh.write(_json.dumps({"vec_id": 900002, "embedding": fresh}) + "\n")
    stream = (spark.readStream
              .schema("vec_id BIGINT, embedding ARRAY<DOUBLE>")
              .option("maxFilesPerTrigger", 1).json(src))
    q = gate.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    acc1 = {r["vec_id"] for r in gate.accepted().collect()}
    rej = {r["new_id"]: r["dup_of"] for r in gate.rejections().collect()
           if r["new_id"] >= 900000}
    assert 900002 in acc1 and 900001 not in acc1
    assert rej == {900001: some_id}

    # bootstrap REFUSES once state exists (its epoch=-1 write is
    # compact_state's fold partition — review catch: data loss)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="FRESH gate"):
        gate.bootstrap(e)
    gate.stop()
    spark.sql(f"DROP TABLE IF EXISTS {table}_vec")


def test_streaming_value_histogram_ks_equals_batch(spark, tmp_path):
    """Streaming KS-drift twin: the complete-mode histogram state is
    BIT-identical to the batch (g, x, c) aggregate after any
    micro-batch split (plain additive counts), and ks_from_counts
    over the sink reproduces batch ks_value_drift row-for-row,
    including the double ks and the ks_at argmax."""
    import json as _json

    from market_data_ingestor_go_spark.operators.lm_quality import (
        ks_from_counts, ks_value_drift)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_value_histogram)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("source", "n_chars")
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = docs.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(_json.dumps({"source": r.source,
                                      "n_chars": r.n_chars}) + "\n")

    stream = (spark.readStream.schema("source STRING, n_chars LONG")
              .option("maxFilesPerTrigger", 1)  # force ≥3 micro-batches
              .json(src))
    q = run_sketch_stream(streaming_value_histogram(stream, "source",
                                                    "n_chars"),
                          "ks_hist_stream", str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        n_state = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()

    sink = spark.table("ks_hist_stream")
    batch_counts = (docs.selectExpr("source AS g", "n_chars AS x")
                    .groupBy("g", "x").count()
                    .withColumnRenamed("count", "c"))
    assert n_state == batch_counts.count()   # domain-sized state
    assert sorted(map(tuple, sink.collect())) == \
        sorted(map(tuple, batch_counts.collect()))

    got = sorted(map(tuple, ks_from_counts(sink).collect()))
    want = sorted(map(tuple, ks_value_drift(docs).collect()))
    assert got == want
    spark.sql("DROP TABLE IF EXISTS ks_hist_stream")


def test_streaming_value_histogram_chi2_equals_batch(spark, tmp_path):
    """Streaming χ²-drift twin: the SAME complete-mode histogram
    sink serves the chi-square monitor — bin the stream value first
    (x = n_chars div 50), then chi2_from_counts over the sink
    reproduces batch chi2_value_drift row-for-row (bit-exact doubles
    included), after any micro-batch split."""
    import json as _json

    from market_data_ingestor_go_spark.operators.lm_quality import (
        chi2_from_counts, chi2_value_drift)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_value_histogram)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("source", "n_chars")
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = docs.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(_json.dumps({"source": r.source,
                                      "n_chars": r.n_chars}) + "\n")

    stream = (spark.readStream.schema("source STRING, n_chars LONG")
              .option("maxFilesPerTrigger", 1)  # force ≥3 micro-batches
              .json(src)
              .selectExpr("source", "n_chars div 50 AS bin"))
    q = run_sketch_stream(streaming_value_histogram(stream, "source",
                                                    "bin"),
                          "chi2_hist_stream", str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(map(tuple,
                     chi2_from_counts(spark.table("chi2_hist_stream"))
                     .collect()))
    want = sorted(map(tuple, chi2_value_drift(docs, bin_width=50)
                      .collect()))
    assert got == want
    spark.sql("DROP TABLE IF EXISTS chi2_hist_stream")


def test_streaming_vocab_state_curve_equals_batch(spark, tmp_path):
    """Streaming vocabulary-growth twin (r10): both state tables
    (per-bucket sizes — additive; per-term min bucket — idempotent)
    are BIT-identical to the batch aggregates after a 3-way
    micro-batch split, and vocab_growth_from_state over the two sinks
    reproduces batch vocab_growth_curve row-for-row including the
    ttr double."""
    import json as _json

    from market_data_ingestor_go_spark.operators.lm_quality import (
        _bucketed_tokens, bucket_sizes, term_first_bucket,
        vocab_growth_curve, vocab_growth_from_state)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_vocab_state)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    src = str(tmp_path / "vsrc")
    os.makedirs(src)
    rows = docs.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(_json.dumps({"doc_id": r.doc_id,
                                      "text": r.text}) + "\n")

    stream = (spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    sizes_df, fb_df = streaming_vocab_state(stream)
    q1 = run_sketch_stream(sizes_df, "vg_sizes", str(tmp_path / "c1"))
    q2 = run_sketch_stream(fb_df, "vg_fb", str(tmp_path / "c2"))
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
    finally:
        q1.stop()
        q2.stop()

    base = _bucketed_tokens(docs)
    assert sorted(map(tuple, spark.table("vg_sizes").collect())) == \
        sorted(map(tuple, bucket_sizes(base).collect()))
    assert sorted(map(tuple, spark.table("vg_fb").collect())) == \
        sorted(map(tuple, term_first_bucket(base).collect()))

    got = sorted(map(tuple, vocab_growth_from_state(
        spark.table("vg_sizes"), spark.table("vg_fb")).collect()))
    want = sorted(map(tuple, vocab_growth_curve(docs).collect()))
    assert got == want
    spark.sql("DROP TABLE IF EXISTS vg_sizes")
    spark.sql("DROP TABLE IF EXISTS vg_fb")


def test_streaming_centroid_sums_drift_equals_batch(spark, tmp_path):
    """Streaming embedding-drift twin (r10): the complete-mode
    (grp, pos, s, n) decimal-sum state is BIT-identical to the batch
    dim_sums aggregate after any micro-batch split (decimal addition
    is exact and order-independent), and centroid_drift_from_sums
    over the sink reproduces batch embedding_centroid_drift
    row-for-row, including the double cosine."""
    import shutil

    from market_data_ingestor_go_spark.operators.similarity import (
        centroid_drift_from_sums, dim_sums, embedding_centroid_drift)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_centroid_sums)

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "label", "embedding")
    src = tmp_path / "esrc"
    src.mkdir()

    def drop_file(df, name):
        stage = str(tmp_path / f"estage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), str(src / f"{name}.parquet"))

    for i in range(3):  # three micro-batches
        drop_file(e.filter(f"vec_id % 3 = {i}"), f"b{i}")

    stream = (spark.readStream.schema(e.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = run_sketch_stream(streaming_centroid_sums(stream),
                          "centroid_sums_stream",
                          str(tmp_path / "eckpt"))
    try:
        q.processAllAvailable()
        n_state = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()

    sink = spark.table("centroid_sums_stream")
    batch_sums = dim_sums(e)
    assert n_state == batch_sums.count()      # |groups|*dims state
    assert sorted(map(tuple, sink.collect())) == \
        sorted(map(tuple, batch_sums.collect()))

    got = sorted(map(tuple, centroid_drift_from_sums(sink).collect()))
    want = sorted(map(tuple, embedding_centroid_drift(e).collect()))
    assert got == want
    spark.sql("DROP TABLE IF EXISTS centroid_sums_stream")


def test_streaming_postings_index_maintenance(spark, tmp_path):
    """Round 9: the BM25 inverted index stays fresh from a document
    stream (tokenize on ingest, doc-local rows only) — bootstrap a
    half-corpus, stream the rest in two micro-batches, and the probe
    over the maintained index is ROW-IDENTICAL to bm25_topk over the
    full corpus (df/stats derived from current contents, so nothing
    goes stale as epochs land); epoch replay is idempotent."""
    import shutil

    from market_data_ingestor_go_spark.operators.retrieval import (
        FIXTURE_QUERIES, bm25_topk)
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.vector_index import (
        StreamingPostingsIndex)

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    boot = docs.filter("doc_id % 2 = 0")
    part1 = docs.filter("doc_id % 4 = 1")
    part2 = docs.filter("doc_id % 4 = 3")

    src = tmp_path / "pidocs"
    src.mkdir()

    def drop_file(df, name):
        stage = str(tmp_path / f"pistage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), str(src / f"{name}.parquet"))

    ix = StreamingPostingsIndex(spark, "s_postings_idx",
                                trigger_seconds=1)
    try:
        ix.bootstrap(boot)
        assert ix.epochs == 0
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        q = ix.attach(stream, str(tmp_path / "pi_ckpt"))
        drop_file(part1, "b1")
        q.processAllAvailable()
        drop_file(part2, "b2")
        q.processAllAvailable()
        q.stop()
        assert ix.epochs == 2

        # replaying an epoch rewrites only its own partition — for
        # the postings AND the stats sidecar (same epoch discipline)
        before = spark.table("s_postings_idx").count()
        stats_before = spark.table("s_postings_idx_stats") \
            .agg(F.sum("n_docs"), F.sum("tot")).collect()[0]
        ix._index_batch(part2, epoch_id=1)
        assert spark.table("s_postings_idx").count() == before
        assert spark.table("s_postings_idx_stats") \
            .agg(F.sum("n_docs"), F.sum("tot")).collect()[0] == stats_before

        # sidecar sums == stats derived from the full index (r10:
        # probe serves corpus stats at metadata cost, still stale-free)
        derived = spark.table("s_postings_idx").select("doc_id", "dl") \
            .distinct().agg(F.count("*"), F.sum("dl")).collect()[0]
        assert tuple(stats_before) == tuple(derived)

        got = sorted(map(tuple,
                         ix.probe(FIXTURE_QUERIES, k=10).collect()))
        want = sorted(map(tuple, bm25_topk(
            docs, FIXTURE_QUERIES, k=10).collect()))
        assert got == want

        # the sidecar-served probe plan reads the postings table for
        # MATCHING terms only — no full-index (doc_id, dl) distinct
        # (exactly one scan of the postings table)
        plan = ix.probe(FIXTURE_QUERIES, k=10) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count(".s_postings_idx[") == 1, plan
        assert ".s_postings_idx_stats[" in plan, plan

        # compaction folds epochs (and the sidecar) without changing
        # contents
        assert ix.compact() == before
        assert sorted(map(tuple,
                          ix.probe(FIXTURE_QUERIES, k=10).collect())) \
            == got
        assert spark.table("s_postings_idx_stats") \
            .agg(F.sum("n_docs"), F.sum("tot")).collect()[0] == stats_before
    finally:
        ix.stop()
        spark.sql("DROP TABLE IF EXISTS s_postings_idx")
        spark.sql("DROP TABLE IF EXISTS s_postings_idx_stats")


def test_gate_audit_partitions_knob(spark, tmp_path):
    """r11 (verdict #4): the gates' per-epoch audit writes no longer
    funnel through one task. With the default audit_partitions=None a
    multi-partition batch lands MULTIPLE part files per epoch, epoch
    replay still overwrites into identical rows (>1-file idempotence),
    and audit_partitions=1 restores the single-file fixture layout —
    same rows either way."""
    import glob as _glob

    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.novelty_gate import (
        NoveltyGate)

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    ref = docs.filter("doc_id % 20 = 0")
    batch = (docs.filter("doc_id % 20 != 0")
             .select("doc_id", "text").limit(8).repartition(4))

    gate = NoveltyGate(reference=ref,
                       audit_path=str(tmp_path / "naudit"))
    gate._gate_batch(batch, 0)
    parts = _glob.glob(str(tmp_path / "naudit" / "epoch=0" / "part-*"))
    assert len(parts) > 1, parts  # the batch's parallelism, not 1
    before = sorted(map(tuple, gate.scores().collect()))

    gate._gate_batch(batch, 0)  # crash-replay of the same epoch
    after = sorted(map(tuple, gate.scores().collect()))
    assert before == after

    single = NoveltyGate(reference=ref,
                         audit_path=str(tmp_path / "naudit1"),
                         audit_partitions=1)
    single._gate_batch(batch, 0)
    parts1 = _glob.glob(str(tmp_path / "naudit1" / "epoch=0" / "part-*"))
    assert len(parts1) == 1, parts1
    assert sorted(map(tuple, single.scores().collect())) == before
    gate.stop()
    single.stop()


def test_postings_probe_falls_back_without_sidecar(spark):
    """r11 (ADVICE): probing a postings index whose stats sidecar
    table is missing (registered externally, created pre-r10, or
    dropped) serves through the derived-stats path (full-index
    distinct) instead of throwing table-not-found — row-identical to
    the sidecar-served probe."""
    from market_data_ingestor_go_spark.operators.retrieval import (
        FIXTURE_QUERIES)
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.vector_index import (
        StreamingPostingsIndex)

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text").limit(40)
    ix = StreamingPostingsIndex(spark, "s_postings_nosc")
    try:
        ix.bootstrap(docs)
        with_sidecar = sorted(map(tuple,
                                  ix.probe(FIXTURE_QUERIES, k=10)
                                  .collect()))
        spark.sql("DROP TABLE s_postings_nosc_stats")
        without = sorted(map(tuple,
                             ix.probe(FIXTURE_QUERIES, k=10)
                             .collect()))
        assert without == with_sidecar
    finally:
        ix.stop()
        spark.sql("DROP TABLE IF EXISTS s_postings_nosc")
        spark.sql("DROP TABLE IF EXISTS s_postings_nosc_stats")


def test_streaming_scrub_gate(spark, tmp_path):
    """Span-scrub gate e2e (r11): documents stream in two
    micro-batches and every audit row is BIT-identical to the batch
    scrub_leaked_spans operator against the same reference split —
    the decontamination TRANSFORM applied at the door. A doc copied
    verbatim from the reference lands 'dropped' with NULL text, a doc
    embedding one reference run lands 'scrubbed' with the leaked
    block cut, clean docs keep their original text verbatim, and
    epoch replay overwrites into identical rows (static reference,
    deterministic span algebra)."""
    import json as _json
    import time as _time

    from market_data_ingestor_go_spark.operators.dedup import (
        scrub_leaked_spans)
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.scrub_gate import (
        ScrubGate)

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    ref = docs.filter("doc_id % 20 = 0")
    train = [(r["doc_id"], r["text"]) for r in
             docs.filter("doc_id % 20 != 0")
             .select("doc_id", "text").limit(6).collect()]
    leak_text = ref.select("text").first()["text"]   # verbatim copy
    extra = [(100001, leak_text),
             (100002, "own words " + leak_text + " more own words")]
    batches = [train[:3], train[3:] + extra]

    src = str(tmp_path / "scsrc")
    os.makedirs(src)
    for i, batch in enumerate(batches):
        fp = os.path.join(src, f"b{i}.json")
        with open(fp, "w") as fh:
            for did, text in batch:
                fh.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        _time.sleep(0.01)
        os.utime(fp, (1700000000 + i, 1700000000 + i))

    gate = ScrubGate(reference=ref,
                     audit_path=str(tmp_path / "scaudit"), w=8)
    stream = (spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = gate.attach(stream, str(tmp_path / "scckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["doc_id"]: r for r in gate.scrubbed().collect()}
    assert len(got) == 8

    # bit-agreement with the batch transform on the same docs,
    # regardless of which micro-batch a doc arrived in
    all_docs = spark.createDataFrame(
        [(d, t) for d, t in train + extra], "doc_id BIGINT, text STRING")
    batch_rows = {r["doc_id"]: r for r in
                  scrub_leaked_spans(all_docs, ref, w=8).collect()}
    for did, r in batch_rows.items():
        for c in ("status", "n_spans", "tokens_removed",
                  "n_tokens_kept", "text"):
            assert got[did][c] == r[c], (did, c)

    # the verbatim copy drops; the embedded leak scrubs to own words
    assert (got[100001]["status"], got[100001]["text"]) \
        == ("dropped", None)
    assert got[100002]["status"] == "scrubbed"
    assert got[100002]["text"] == "own words more own words"
    m = gate.metrics()
    assert m["scrub_gate_docs_seen"] == 8
    assert m["scrub_gate_docs_dropped"] >= 1
    assert m["scrub_gate_docs_scrubbed"] >= 1

    # replay idempotence
    before = sorted(map(tuple, gate.scrubbed().collect()))
    b1 = spark.createDataFrame(
        [(d, t) for d, t in batches[1]], "doc_id BIGINT, text STRING")
    gate._gate_batch(b1, 1)
    after = sorted(map(tuple, gate.scrubbed().collect()))
    assert before == after
    gate.stop()


def test_streaming_repetition_gate(spark, tmp_path):
    """Gopher repetition gate e2e (r11): documents stream in two
    micro-batches and every audit row is BIT-identical to the batch
    repetition_signals operator; a degenerate top-2-gram doc and a
    duplicate-line doc flag while a normal doc passes; unknown
    threshold keys fail loudly at construction; epoch replay
    overwrites into identical rows (stateless, deterministic)."""
    import json as _json
    import time as _time

    import pytest as _pytest

    from market_data_ingestor_go_spark.operators.lm_quality import (
        repetition_signals)
    from market_data_ingestor_go_spark.streaming.repetition_gate import (
        RepetitionGate)

    docs = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "buy now buy now buy now buy now buy now buy now"),
        (3, "line a\nline a\nline a\nline b"),
        (4, "p q r s t p q r s t u v w x y z a b c d"),
    ]
    batches = [docs[:2], docs[2:]]
    src = str(tmp_path / "rsrc")
    os.makedirs(src)
    for i, batch in enumerate(batches):
        fp = os.path.join(src, f"b{i}.json")
        with open(fp, "w") as fh:
            for did, text in batch:
                fh.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        _time.sleep(0.01)
        os.utime(fp, (1700000000 + i, 1700000000 + i))

    with _pytest.raises(ValueError, match="never produce"):
        RepetitionGate(audit_path="x",
                       thresholds={"dup9gram_char_frac": 0.1})

    # ADVICE r11 regression: an empty thresholds dict used to pass
    # validation (empty unknown set) then crash score_batch at over[0]
    with _pytest.raises(ValueError, match="at least one"):
        RepetitionGate(audit_path="x", thresholds={})

    gate = RepetitionGate(audit_path=str(tmp_path / "raudit"),
                          audit_partitions=1)
    stream = (spark.readStream.schema("doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = gate.attach(stream, str(tmp_path / "rckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["doc_id"]: r for r in gate.scores(spark).collect()}
    assert len(got) == 4

    # bit-agreement with the batch operator on the same docs
    all_docs = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    batch = {r["doc_id"]: r for r in
             repetition_signals(all_docs).collect()}
    for did, r in batch.items():
        for c in r.asDict():
            assert got[did][c] == r[c], (did, c)

    # flags: 'buy now' x6 tops 2-grams (22/35 chars > 0.20);
    # doc 3 duplicates 'line a' beyond-first 2/4 lines > 0.30;
    # doc 1 (all-unique) and doc 4 (one dup 5-gram over 20 tokens,
    # 10/20 chars... that exceeds 0.15 -> flags too) — assert exact
    assert got[2]["flagged"] and got[3]["flagged"]
    assert not got[1]["flagged"]
    assert got[4]["dup5gram_char_frac"] == 0.5 and got[4]["flagged"]
    m = gate.metrics()
    assert m["repetition_gate_docs_scored"] == 4
    assert m["repetition_gate_docs_flagged"] == 3

    # replay idempotence
    before = sorted(map(tuple, gate.scores(spark).collect()))
    b1 = spark.createDataFrame(batches[1], "doc_id BIGINT, text STRING")
    gate._gate_batch(b1, 1)
    after = sorted(map(tuple, gate.scores(spark).collect()))
    assert before == after
    gate.stop()


def test_streaming_embedding_covariance_equals_batch(spark, tmp_path):
    """Streaming covariance twin: both sufficient-statistic state
    tables (quantized-exact pair sums + dim sums — plain additive
    decimal aggregates) are BIT-identical to the batch tables after a
    3-way micro-batch split (parquet splits, so float bits survive
    the transport), and covariance_from_sums over the sinks
    reproduces batch embedding_covariance row-for-row, doubles
    included."""
    from market_data_ingestor_go_spark.operators.similarity import (
        cov_dim_sums, cov_pair_sums, covariance_from_sums,
        embedding_covariance)
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_embedding_covariance)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings") \
        .select("vec_id", "embedding")
    src = str(tmp_path / "esrc")
    os.makedirs(src)
    for i in range(3):   # 3 parquet files -> 3 micro-batches
        emb.filter(F.col("vec_id") % 3 == i).coalesce(1) \
           .write.parquet(os.path.join(src, f"b{i}"))
    stream = spark.readStream.schema(emb.schema) \
        .option("maxFilesPerTrigger", 1) \
        .parquet(src + "/b*")
    pair_df, dim_df = streaming_embedding_covariance(stream)
    q1 = run_sketch_stream(pair_df, "cov_pairs", str(tmp_path / "c1"))
    q2 = run_sketch_stream(dim_df, "cov_dims", str(tmp_path / "c2"))
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
    finally:
        q1.stop()
        q2.stop()

    assert sorted(map(tuple, spark.table("cov_pairs").collect())) == \
        sorted(map(tuple, cov_pair_sums(emb).collect()))
    assert sorted(map(tuple, spark.table("cov_dims").collect())) == \
        sorted(map(tuple, cov_dim_sums(emb).collect()))
    got = sorted(map(tuple, covariance_from_sums(
        spark.table("cov_pairs"), spark.table("cov_dims")).collect()))
    want = sorted(map(tuple, embedding_covariance(emb).collect()))
    assert got == want
    spark.sql("DROP TABLE IF EXISTS cov_pairs")
    spark.sql("DROP TABLE IF EXISTS cov_dims")


def test_streaming_user_days_retention_equals_batch(spark, tmp_path):
    """Streaming cohort-retention twin (r12): the complete-mode
    (u, d, n_events) state is the distinct (user, day) set of the
    batch operator (counts additive ⇒ identical after any micro-batch
    split), and retention_from_user_days over the sink reproduces
    batch cohort_retention row-for-row including the double ratio."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        cohort_retention, retention_from_user_days)
    from market_data_ingestor_go_spark.plans.queries import _events
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_user_days)

    events = _events(spark, "/root/testdata/sf0.001") \
        .select("user_id", "ts_ms")
    src = str(tmp_path / "rsrc")
    os.makedirs(src)
    rows = events.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(json.dumps({"user_id": r.user_id,
                                     "ts_ms": r.ts_ms}) + "\n")

    stream = (spark.readStream.schema("user_id BIGINT, ts_ms BIGINT")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_user_days(stream), "ud_state",
                          str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("ud_state")
    # the state IS the batch distinct (u, d) set
    batch_ud = (events.select(F.col("user_id").alias("u"),
                              F.expr("ts_ms div 86400000").alias("d"))
                .distinct())
    assert sorted(map(tuple, state.select("u", "d").collect())) == \
        sorted(map(tuple, batch_ud.collect()))

    got = sorted(map(tuple, retention_from_user_days(
        state.select("u", "d")).collect()))
    want = sorted(map(tuple, cohort_retention(events).collect()))
    assert got == want
    spark.sql("DROP TABLE IF EXISTS ud_state")


def test_streaming_cusum_stats_equals_batch(spark, tmp_path):
    """Streaming bucket-grain CUSUM twin (r12): the complete-mode
    (k, b, n_b, s_b) state is BIT-identical to the batch
    cusum_bucket_stats aggregate after a 3-way micro-batch split
    (counts + decimal sums are additive), and cusum_from_bucket_stats
    over the sink reproduces the batch readout row-for-row including
    the double magnitude."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        cusum_bucket_stats, cusum_from_bucket_stats)
    from market_data_ingestor_go_spark.plans.queries import _events
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_cusum_stats)

    events = _events(spark, "/root/testdata/sf0.001") \
        .select("event_type", "ts_ms", "value")
    src = str(tmp_path / "csrc")
    os.makedirs(src)
    rows = events.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(json.dumps({"event_type": r.event_type,
                                     "ts_ms": r.ts_ms,
                                     "value": r.value}) + "\n")

    stream = (spark.readStream
              .schema("event_type STRING, ts_ms BIGINT, value DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(
        streaming_cusum_stats(stream, bucket_ms=3_600_000),
        "cusum_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("cusum_state")
    want_state = cusum_bucket_stats(events, bucket_ms=3_600_000)
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    got = sorted(map(tuple, cusum_from_bucket_stats(state).collect()))
    want = sorted(map(tuple,
                      cusum_from_bucket_stats(want_state).collect()))
    assert got == want
    spark.sql("DROP TABLE IF EXISTS cusum_state")


def test_perceptual_gate_dedups_across_batches(spark, tmp_path):
    """PerceptualGate (r12): an upscaled and a brightness-shifted copy
    of an ACCEPTED image arriving in a later micro-batch are rejected
    against the fingerprint index (with the right dup_of), an
    in-batch re-encode is rejected internally, an undecodable blob is
    accepted-but-unindexed, and a crash-replay of the same epoch
    leaves state and audit unchanged."""
    from market_data_ingestor_go_spark.operators.multimodal import (
        synthetic_doc_images)
    from market_data_ingestor_go_spark.streaming.perceptual_gate import (
        PerceptualGate)

    docs = spark.createDataFrame(
        [(15, "the quick brown fox jumps over the lazy dog"),
         (1, "an entirely different document body"),
         (20, "a third body of text for the second batch")],
        ["doc_id", "text"])
    # 15 -> orig+up2+b16 ; 1 -> orig ; 20 -> orig+b16
    imgs = {r["img_id"]: bytes(r["content"])
            for r in synthetic_doc_images(docs).collect()}
    mk = lambda ids: spark.createDataFrame(
        [(i, imgs[i]) for i in ids], ["img_id", "content"])

    gate = PerceptualGate(spark, "pg_state", modality="image",
                          dups_dir=str(tmp_path / "dups"),
                          audit_partitions=1)
    try:
        gate._gate_batch(mk(["15:orig", "1:orig"]), epoch_id=0)
        accepted = {r["id"] for r in gate.accepted_ids().collect()}
        assert accepted == {"15:orig", "1:orig"}

        b2 = mk(["15:up2", "15:b16", "20:orig", "20:b16"]).union(
            spark.createDataFrame([("bad", b"\x89PNG\r\n\x1a\nxx")],
                                  ["img_id", "content"]))
        gate._gate_batch(b2, epoch_id=1)
        accepted = {r["id"] for r in gate.accepted_ids().collect()}
        # corrupt blob accepted-but-unindexed; both 15-variants
        # rejected vs corpus; within batch 2 the min-id keeper is
        # LEXICOGRAPHIC: '20:b16' < '20:orig', so orig is the dup
        assert accepted == {"15:orig", "1:orig", "20:b16"}
        dups = {(r["id"], r["dup_of"], r["hamming"]) for r in
                gate.duplicates().collect()}
        # 15:up2 pairs with its in-batch sibling first ('15:b16' <
        # '15:up2'); b16 then rejects vs the corpus index
        assert dups == {("15:up2", "15:b16", 0),
                        ("15:b16", "15:orig", 0),
                        ("20:orig", "20:b16", 0)}
        assert gate.blobs_rejected == 3

        # crash-replay epoch 1: no self-rejection, identical state
        n_fp = spark.table("pg_state_fp").count()
        gate._gate_batch(b2, epoch_id=1)
        assert spark.table("pg_state_fp").count() == n_fp
        assert {r["id"] for r in gate.accepted_ids().collect()} == accepted
        assert {(r["id"], r["dup_of"]) for r in
                gate.duplicates().collect()} == {
            ("15:up2", "15:b16"), ("15:b16", "15:orig"),
            ("20:orig", "20:b16")}
    finally:
        gate.stop()
        spark.sql("DROP TABLE IF EXISTS pg_state_fp")


def test_perceptual_gate_audio_modality(spark, tmp_path):
    """The same gate gates AUDIO: a gain-halved re-encode of an
    accepted clip arriving later is rejected against the fingerprint
    index under modality='audio'."""
    from market_data_ingestor_go_spark.operators.multimodal import (
        synthetic_doc_audio)
    from market_data_ingestor_go_spark.streaming.perceptual_gate import (
        PerceptualGate)

    docs = spark.createDataFrame(
        [(15, "the quick brown fox jumps over the lazy dog"),
         (1, "an entirely different document body")],
        ["doc_id", "text"])
    clips = {r["audio_id"]: bytes(r["content"])
             for r in synthetic_doc_audio(docs).collect()}
    mk = lambda ids: spark.createDataFrame(
        [(i, clips[i]) for i in ids], ["audio_id", "content"])

    gate = PerceptualGate(spark, "pga_state", modality="audio",
                          dups_dir=str(tmp_path / "dups"),
                          id_col="audio_id", max_hamming=3,
                          audit_partitions=1)
    try:
        gate._gate_batch(mk(["15:orig", "1:orig"]), epoch_id=0)
        gate._gate_batch(mk(["15:vol", "15:b24"]), epoch_id=1)
        assert {r["id"] for r in gate.accepted_ids().collect()} == {
            "15:orig", "1:orig"}
        # '15:b24' < '15:vol' ⇒ vol rejects internally against b24,
        # then b24 rejects vs the corpus index
        dups = {(r["id"], r["dup_of"]) for r in
                gate.duplicates().collect()}
        assert dups == {("15:vol", "15:b24"), ("15:b24", "15:orig")}
    finally:
        gate.stop()
        spark.sql("DROP TABLE IF EXISTS pga_state_fp")


def test_transition_maintainer_equals_batch_in_order(spark, tmp_path):
    """Streaming Markov-transitions maintainer (r12): after in-order
    (time-split) epochs the summed count deltas and the
    transition_probs readout are BIT-identical to batch
    event_transitions over the concatenated input, and a crash-replay
    of the last epoch leaves both state tables unchanged."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        event_transitions)
    from market_data_ingestor_go_spark.plans.queries import _events
    from market_data_ingestor_go_spark.streaming.transitions import (
        TransitionMaintainer)

    events = _events(spark, "/root/testdata/sf0.001") \
        .select("user_id", "ts_ms", "event_id", "event_type")
    rows = sorted(events.collect(),
                  key=lambda r: (r.ts_ms, r.event_id))
    cut1, cut2 = len(rows) // 3, 2 * len(rows) // 3
    mk = lambda part: spark.createDataFrame(
        part, ["user_id", "ts_ms", "event_id", "event_type"])

    tm = TransitionMaintainer(spark, "tmx_state")
    try:
        tm._gate_batch(mk(rows[:cut1]), epoch_id=0)
        tm._gate_batch(mk(rows[cut1:cut2]), epoch_id=1)
        tm._gate_batch(mk(rows[cut2:]), epoch_id=2)

        got = sorted(map(tuple, tm.transitions().collect()))
        want = sorted(map(tuple, event_transitions(events).collect()))
        assert got == want

        n_cnt = spark.table("tmx_state_cnt").count()
        n_last = spark.table("tmx_state_last").count()
        tm._gate_batch(mk(rows[cut2:]), epoch_id=2)  # crash-replay
        assert spark.table("tmx_state_cnt").count() == n_cnt
        assert spark.table("tmx_state_last").count() == n_last
        assert sorted(map(tuple, tm.transitions().collect())) == want
    finally:
        tm.stop()
        spark.sql("DROP TABLE IF EXISTS tmx_state_cnt")
        spark.sql("DROP TABLE IF EXISTS tmx_state_last")


def test_streaming_rfm_stats_equals_batch(spark, tmp_path):
    """Streaming RFM twin (r12): the complete-mode per-user
    (last_day, frequency, monetary) state is BIT-identical to the
    batch rfm_user_stats aggregate after a 3-way micro-batch split
    (max idempotent, count + decimal sum additive), and the shared
    rfm_segments_from_stats finisher over the sink reproduces the
    batch segment table row-for-row."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        rfm_segments_from_stats, rfm_user_stats)
    from market_data_ingestor_go_spark.plans.queries import _events
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_rfm_stats)

    events = _events(spark, "/root/testdata/sf0.001") \
        .select("user_id", "ts_ms", "value")
    src = str(tmp_path / "rfmsrc")
    os.makedirs(src)
    rows = events.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(json.dumps({"user_id": r.user_id,
                                     "ts_ms": r.ts_ms,
                                     "value": r.value}) + "\n")

    stream = (spark.readStream
              .schema("user_id BIGINT, ts_ms BIGINT, value DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_rfm_stats(stream), "rfm_state",
                          str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("rfm_state")
    want_state = rfm_user_stats(events)
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))
    got = sorted(map(tuple, rfm_segments_from_stats(state).collect()))
    want = sorted(map(tuple,
                      rfm_segments_from_stats(want_state).collect()))
    assert got == want
    spark.sql("DROP TABLE IF EXISTS rfm_state")


def test_video_gate_dedups_across_batches(spark, tmp_path):
    """VideoGate (r12): a rotated-palette re-encode and an
    every-2nd-frame subsample of an ACCEPTED clip arriving in a later
    micro-batch reject against the frame-hash posting store (dup_of =
    the accepted original, n_shared = 6 and 3), a corrupt clip is
    accepted-but-unindexed, and replaying the epoch leaves state and
    audit unchanged."""
    from market_data_ingestor_go_spark.operators.multimodal import (
        synthetic_doc_videos)
    from market_data_ingestor_go_spark.streaming.perceptual_gate import (
        VideoGate)

    docs = spark.createDataFrame(
        [(15, "the quick brown fox jumps over the lazy dog"),
         (1, "an entirely different document body")],
        ["doc_id", "text"])
    vids = {r["vid_id"]: bytes(r["content"])
            for r in synthetic_doc_videos(docs).collect()}
    mk = lambda ids: spark.createDataFrame(
        [(i, vids[i]) for i in ids], ["vid_id", "content"])

    gate = VideoGate(spark, "vg_state", dups_dir=str(tmp_path / "dups"),
                     audit_partitions=1)
    try:
        gate._gate_batch(mk(["15:orig", "1:orig"]), epoch_id=0)
        b2 = mk(["15:re", "15:sub2"]).union(
            spark.createDataFrame([("bad", b"GIF87a\x00")],
                                  ["vid_id", "content"]))
        gate._gate_batch(b2, epoch_id=1)

        assert {r["id"] for r in gate.accepted_ids().collect()} == {
            "15:orig", "1:orig"}
        # '15:re' pairs with its in-batch sibling first ('15:re' <
        # '15:sub2' shares 3 frames) — but both ALSO hit the corpus;
        # corpus check runs on internal keepers only, so sub2 rejects
        # internally against re (3 shared) and re rejects vs corpus
        dups = {(r["id"], r["dup_of"], r["n_shared"]) for r in
                gate.duplicates().collect()}
        assert dups == {("15:sub2", "15:re", 3),
                        ("15:re", "15:orig", 6)}
        assert gate.clips_rejected == 2
        assert gate.clips_accepted == 3  # 15:orig, 1:orig, bad

        n_fp = spark.table("vg_state_fp").count()
        gate._gate_batch(b2, epoch_id=1)  # crash-replay
        assert spark.table("vg_state_fp").count() == n_fp
        assert {(r["id"], r["dup_of"]) for r in
                gate.duplicates().collect()} == {
            ("15:sub2", "15:re"), ("15:re", "15:orig")}
    finally:
        gate.stop()
        spark.sql("DROP TABLE IF EXISTS vg_state_fp")


def test_transition_maintainer_compaction(spark, tmp_path):
    """compact(upto) folds the per-epoch pointer/delta partitions into
    one partition without changing any answer: after compacting the
    first two epochs the last-table holds exactly one row per user,
    the readout is unchanged, and a subsequent epoch still produces
    the batch-identical transition matrix."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        event_transitions)
    from market_data_ingestor_go_spark.plans.queries import _events
    from market_data_ingestor_go_spark.streaming.transitions import (
        TransitionMaintainer)

    events = _events(spark, "/root/testdata/sf0.001") \
        .select("user_id", "ts_ms", "event_id", "event_type")
    rows = sorted(events.collect(), key=lambda r: (r.ts_ms, r.event_id))
    cut1, cut2 = len(rows) // 3, 2 * len(rows) // 3
    mk = lambda part: spark.createDataFrame(
        part, ["user_id", "ts_ms", "event_id", "event_type"])

    tm = TransitionMaintainer(spark, "tmc_state")
    try:
        tm._gate_batch(mk(rows[:cut1]), epoch_id=0)
        tm._gate_batch(mk(rows[cut1:cut2]), epoch_id=1)
        before = sorted(map(tuple, tm.transitions().collect()))

        tm.compact(1)
        last = spark.table("tmc_state_last")
        assert last.select("epoch").distinct().collect()[0][0] == 1
        n_users = last.select("u").distinct().count()
        assert last.count() == n_users  # ONE pointer row per user
        assert sorted(map(tuple, tm.transitions().collect())) == before

        tm._gate_batch(mk(rows[cut2:]), epoch_id=2)
        got = sorted(map(tuple, tm.transitions().collect()))
        want = sorted(map(tuple, event_transitions(events).collect()))
        assert got == want
    finally:
        tm.stop()
        spark.sql("DROP TABLE IF EXISTS tmc_state_cnt")
        spark.sql("DROP TABLE IF EXISTS tmc_state_last")


def test_interval_overlap_maintainer_prefix_complete_and_replay(
        spark, tmp_path):
    """IntervalOverlapMaintainer (r13): after any micro-batch split of
    an interval set, the union of emitted pairs equals the BATCH
    self-join over the full set (id_a < id_b, exact overlaps) — each
    pair emitted exactly once, when its later member arrives — and a
    crash-replay of an epoch leaves state and matches unchanged."""
    from pyspark.sql import functions as F

    from market_data_ingestor_go_spark.operators.timeseries import (
        interval_overlap_join)
    from market_data_ingestor_go_spark.streaming.interval_index import (
        IntervalOverlapMaintainer)

    intervals = [("i1", 0, 10), ("i2", 5, 20), ("i3", 40, 50),
                 ("i4", 18, 45), ("i5", 100, 130), ("i6", 125, 160),
                 ("i7", 7, 8)]
    df = spark.createDataFrame(intervals, ["id", "s", "e"])
    a = df.select(F.col("id").alias("id_a"), F.col("s").alias("a_s"),
                  F.col("e").alias("a_e"))
    b = df.select(F.col("id").alias("id_b"), F.col("s").alias("b_s"),
                  F.col("e").alias("b_e"))
    truth = {(r["id_a"], r["id_b"]): r["overlap"] for r in
             interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e",
                                   bucket=16, a_keys=["id_a"],
                                   b_keys=["id_b"])
             .filter(F.col("id_a") < F.col("id_b")).collect()}
    assert len(truth) == 6  # fixture sanity: both paths exercised

    mk = lambda idx: spark.createDataFrame(
        [intervals[i] for i in idx], ["id", "s", "e"])
    m = IntervalOverlapMaintainer(spark, "iom_state",
                                  matches_dir=str(tmp_path / "m"),
                                  bucket=16, audit_partitions=1)
    try:
        m._gate_batch(mk([0, 1, 2]), epoch_id=0)  # i1 i2 i3
        m._gate_batch(mk([3, 4]), epoch_id=1)     # i4 i5
        m._gate_batch(mk([5, 6]), epoch_id=2)     # i6 i7 (cross-pairs
        #                        with OLD i5/i1/i2 via the index probe)
        got = {(r["id_a"], r["id_b"]): r["overlap"]
               for r in m.matches().collect()}
        assert got == truth
        assert m.matches().count() == len(truth)  # no dup emissions
        assert {r["id"] for r in m.indexed_ids().collect()} == {
            i for i, _, _ in intervals}

        # crash-replay epoch 2: probe excludes its own partition, so
        # no self-pairs; state and matches land byte-identical
        n_cells = spark.table("iom_state_cells").count()
        m._gate_batch(mk([5, 6]), epoch_id=2)
        assert spark.table("iom_state_cells").count() == n_cells
        got2 = {(r["id_a"], r["id_b"]): r["overlap"]
                for r in m.matches().collect()}
        assert got2 == truth
    finally:
        m.stop()
        spark.sql("DROP TABLE IF EXISTS iom_state_cells")


def test_streaming_benford_counts_equals_batch(spark, tmp_path):
    """Streaming Benford twin (r13): the complete-mode (digit, n_obs)
    state is BIT-identical to the batch benford_digit_counts
    aggregate after a 3-way micro-batch split (counts are additive),
    and benford_from_counts over the sink reproduces the batch
    conformance readout row-for-row including the double χ² terms."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        benford_digit_counts, benford_from_counts)
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_benford_counts)

    orders = load_table(spark, "/root/testdata/sf0.001", "orders") \
        .select("o_totalprice")
    src = str(tmp_path / "bsrc")
    os.makedirs(src)
    rows = orders.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(json.dumps(
                    {"o_totalprice": r.o_totalprice}) + "\n")

    stream = (spark.readStream.schema("o_totalprice DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(
        streaming_benford_counts(stream, "o_totalprice"),
        "benford_state", str(tmp_path / "b"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("benford_state")
    want_state = benford_digit_counts(orders, "o_totalprice")
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    got = sorted(map(tuple, benford_from_counts(state).collect()))
    want = sorted(map(tuple,
                      benford_from_counts(want_state).collect()))
    assert got == want
    spark.sql("DROP TABLE IF EXISTS benford_state")


def test_interval_overlap_maintainer_live_stream(spark, tmp_path):
    """The same prefix-completeness contract through a REAL
    readStream → attach() → processAllAvailable drive (file source,
    one file per trigger): emitted pairs equal the batch self-join
    over everything streamed."""
    from pyspark.sql import functions as F

    from market_data_ingestor_go_spark.operators.timeseries import (
        interval_overlap_join)
    from market_data_ingestor_go_spark.streaming.interval_index import (
        IntervalOverlapMaintainer)

    intervals = [("s1", 0, 12), ("s2", 10, 30), ("s3", 100, 110),
                 ("s4", 25, 105), ("s5", 200, 210)]
    src = str(tmp_path / "isrc")
    os.makedirs(src)
    for i, part in enumerate((intervals[:2], intervals[2:4],
                              intervals[4:])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for iid, s, e in part:
                fh.write(json.dumps({"id": iid, "s": s, "e": e}) + "\n")

    stream = (spark.readStream.schema("id STRING, s BIGINT, e BIGINT")
              .option("maxFilesPerTrigger", 1).json(src))
    m = IntervalOverlapMaintainer(spark, "iom_live",
                                  matches_dir=str(tmp_path / "lm"),
                                  bucket=16, audit_partitions=1)
    q = m.attach(stream, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        m.stop()

    df = spark.createDataFrame(intervals, ["id", "s", "e"])
    a = df.select(F.col("id").alias("id_a"), F.col("s").alias("a_s"),
                  F.col("e").alias("a_e"))
    b = df.select(F.col("id").alias("id_b"), F.col("s").alias("b_s"),
                  F.col("e").alias("b_e"))
    truth = {(r["id_a"], r["id_b"]): r["overlap"] for r in
             interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e",
                                   bucket=16, a_keys=["id_a"],
                                   b_keys=["id_b"])
             .filter(F.col("id_a") < F.col("id_b")).collect()}
    got = {(r["id_a"], r["id_b"]): r["overlap"]
           for r in m.matches().collect()}
    assert got == truth and len(truth) == 3
    spark.sql("DROP TABLE IF EXISTS iom_live_cells")


def test_streaming_contingency_counts_equals_batch(spark, tmp_path):
    """Streaming contingency twin (r13): the complete-mode
    (row_key, col_key, n_obs) state is BIT-identical to the batch
    contingency_counts table after a 3-way micro-batch split (cell
    counts are additive), and independence_from_counts over the sink
    reproduces the batch Pearson readout row-for-row including the
    double expected/chi2 terms."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        contingency_counts, independence_from_counts)
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_contingency_counts)

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("lang", "source")
    src = str(tmp_path / "ctsrc")
    os.makedirs(src)
    rows = docs.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(json.dumps({"lang": r.lang,
                                     "source": r.source}) + "\n")

    stream = (spark.readStream.schema("lang STRING, source STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(
        streaming_contingency_counts(stream, "lang", "source"),
        "cont_state", str(tmp_path / "ct"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("cont_state")
    want_state = contingency_counts(docs, "lang", "source")
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    got = sorted(map(tuple, independence_from_counts(state).collect()))
    want = sorted(map(tuple,
                      independence_from_counts(want_state).collect()))
    assert got == want

    # r14: the SAME contingency state also finishes the Gini–Simpson
    # diversity readout — one state table, two continuous monitors
    # (the user-days retention/rolling-actives precedent); the batch
    # query over the full table agrees row-for-row
    from market_data_ingestor_go_spark.operators.lm_quality import (
        diversity_from_counts)
    from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES
    got_div = sorted(map(tuple, diversity_from_counts(state)
                         .collect()))
    want_div = sorted(
        (r.source, r.n_rows, r.n_langs, r.simpson_lambda,
         r.effective_langs)
        for r in ALL_QUERIES["docs_source_lang_diversity"](
            spark, "/root/testdata/sf0.001").collect())
    assert got_div == want_div and len(got_div) > 0
    spark.sql("DROP TABLE IF EXISTS cont_state")


def test_streaming_user_days_rolling_actives_equals_batch(
        spark, tmp_path):
    """Streaming rolling 7-day distinct-actives twin (r13 verdict
    #3): the SAME streaming_user_days complete-mode state that feeds
    cohort retention also finishes the rolling-actives readout —
    rolling_active_users_from_user_days over the sink reproduces the
    batch events_rolling_active_users query row-for-row after a
    3-way micro-batch split (counts additive ⇒ identical state)."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        rolling_active_users_from_user_days)
    from market_data_ingestor_go_spark.plans.queries import (
        ALL_QUERIES, _events)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_user_days)

    sf = "/root/testdata/sf0.001"
    events = _events(spark, sf).select("user_id", "ts_ms")
    src = str(tmp_path / "rasrc")
    os.makedirs(src)
    rows = events.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(json.dumps({"user_id": r.user_id,
                                     "ts_ms": r.ts_ms}) + "\n")

    stream = (spark.readStream.schema("user_id BIGINT, ts_ms BIGINT")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_user_days(stream), "ra_ud_state",
                          str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(map(tuple, rolling_active_users_from_user_days(
        spark.table("ra_ud_state")).collect()))
    want = sorted(map(tuple, ALL_QUERIES["events_rolling_active_users"](
        spark, sf).collect()))
    assert got == want and len(got) > 0

    # r14: the SAME state also finishes the growth-accounting flow
    # readout — one state table, three continuous engagement readouts
    from market_data_ingestor_go_spark.operators.timeseries import (
        growth_accounting_from_user_days)
    got_ga = sorted(map(tuple, growth_accounting_from_user_days(
        spark.table("ra_ud_state").select("u", "d")).collect()))
    want_ga = sorted(map(tuple,
                         ALL_QUERIES["events_user_growth_accounting"](
                             spark, sf).collect()))
    assert got_ga == want_ga and len(got_ga) > 0
    spark.sql("DROP TABLE IF EXISTS ra_ud_state")


def test_streaming_user_types_cooccurrence_equals_batch(
        spark, tmp_path):
    """Streaming co-occurrence twin (r13 verdict #5): the
    (u, t, n_events) complete-mode state is the batch distinct
    (user, type) set after any micro-batch split, and
    cooccurrence_lift_from_user_types over the sink reproduces the
    batch events_type_cooccurrence_lift pair/support/lift table
    row-for-row including the doubles."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        cooccurrence_lift_from_user_types)
    from market_data_ingestor_go_spark.plans.queries import (
        ALL_QUERIES, _events)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_user_types)

    sf = "/root/testdata/sf0.001"
    events = _events(spark, sf).select("user_id", "event_type")
    src = str(tmp_path / "utsrc")
    os.makedirs(src)
    rows = events.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(json.dumps({"user_id": r.user_id,
                                     "event_type": r.event_type}) + "\n")

    stream = (spark.readStream
              .schema("user_id BIGINT, event_type STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_user_types(stream), "ut_state",
                          str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("ut_state")
    batch_ut = (events.select(F.col("user_id").alias("u"),
                              F.col("event_type").alias("t"))
                .distinct())
    assert sorted(map(tuple, state.select("u", "t").collect())) == \
        sorted(map(tuple, batch_ut.collect()))

    got = sorted(map(tuple, cooccurrence_lift_from_user_types(
        state.select("u", "t")).collect()))
    want = sorted(map(tuple, ALL_QUERIES["events_type_cooccurrence_lift"](
        spark, sf).collect()))
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS ut_state")


def test_streaming_anova_moments_equals_batch(spark, tmp_path):
    """Streaming one-way-ANOVA twin (r13 verdict #5): the per-group
    (n, Σx, Σx²) exact-decimal moments are plain additive aggregates
    ⇒ the complete-mode state after a 3-way micro-batch split is
    BIT-identical to the batch anova_group_moments table, and
    anova_from_group_moments over the sink reproduces the batch
    part_brand_price_anova row including the F statistic."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        anova_from_group_moments, anova_group_moments)
    from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_anova_moments)

    sf = "/root/testdata/sf0.001"
    part = load_table(spark, sf, "part") \
        .select("p_brand", "p_retailprice")
    src = str(tmp_path / "ansrc")
    os.makedirs(src)
    rows = part.collect()
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps(
                    {"p_brand": r.p_brand,
                     "p_retailprice": float(r.p_retailprice)}) + "\n")

    stream = (spark.readStream
              .schema("p_brand STRING, p_retailprice DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(
        streaming_anova_moments(stream, "p_brand", "p_retailprice"),
        "anova_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("anova_state")
    want_state = anova_group_moments(part, "p_brand", "p_retailprice")
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    got = sorted(map(tuple, anova_from_group_moments(state).collect()))
    want = sorted(map(tuple, ALL_QUERIES["part_brand_price_anova"](
        spark, sf).collect()))
    assert got == want and len(got) == 1
    spark.sql("DROP TABLE IF EXISTS anova_state")


def test_streaming_session_paths_prefix_complete(spark, tmp_path):
    """Streaming session-path twin (r13 verdict #7): after a
    time-ordered micro-batch split plus a watermark-advancing
    sentinel, the emitted closed-session paths equal the BATCH
    sessionization's per-session opening paths over the same events
    (every real session closes once the watermark passes its gap),
    and the top-20 readout over the emissions matches the batch
    events_session_funnel_paths table."""
    from pyspark.sql import Window
    from market_data_ingestor_go_spark.plans.queries import (
        ALL_QUERIES, _events)
    from market_data_ingestor_go_spark.streaming.stateful import (
        streaming_session_paths)

    sf = "/root/testdata/sf0.001"
    events = (_events(spark, sf)
              .select("user_id", "ts_ms", "event_id", "event_type"))
    rows = sorted(events.collect(), key=lambda r: (r.ts_ms, r.event_id))
    max_ts = rows[-1].ts_ms
    src = str(tmp_path / "spsrc")
    os.makedirs(src)
    third = (len(rows) + 2) // 3
    chunks = [rows[:third], rows[third:2 * third], rows[2 * third:]]
    # two sentinel batches for a dummy user far past every real
    # session's close: the first advances the event-time max, the
    # second runs with that watermark so every real user's timeout
    # fires (timeouts use the PREVIOUS batches' watermark)
    far = max_ts + 10 * 86400000
    chunks.append([{"user_id": -1, "ts_ms": far,
                    "event_id": "zz1", "event_type": "noop"}])
    chunks.append([{"user_id": -1, "ts_ms": far + 1,
                    "event_id": "zz2", "event_type": "noop"}])
    for i, chunk in enumerate(chunks):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                d = r if isinstance(r, dict) else {
                    "user_id": r.user_id, "ts_ms": r.ts_ms,
                    "event_id": r.event_id, "event_type": r.event_type}
                fh.write(json.dumps(d) + "\n")

    stream = (spark.readStream
              .schema("user_id BIGINT, ts_ms BIGINT, "
                      "event_id STRING, event_type STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = (streaming_session_paths(stream).writeStream
         .outputMode("append").format("memory").queryName("sp_out")
         .option("checkpointLocation", str(tmp_path / "c"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted((r.user_id, r.path)
                 for r in spark.table("sp_out").collect()
                 if r.user_id != "-1")

    # batch reference: per-session opening paths (the query's window
    # machinery, pre-top-20)
    w_user = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w_user)
    e3 = (events
          .withColumn("new_s", F.when(gap.isNull()
                                      | (gap > 1_800_000), 1)
                      .otherwise(0))
          .withColumn("sess", F.sum("new_s").over(
              w_user.rowsBetween(Window.unboundedPreceding, 0))))
    w_sess = (Window.partitionBy("user_id", "sess")
              .orderBy("ts_ms", "event_id"))
    paths = (e3.withColumn("rn", F.row_number().over(w_sess))
             .filter(F.col("rn") <= 3)
             .groupBy("user_id", "sess")
             .agg(F.concat_ws(
                 ">",
                 F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
                 F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
                 F.max(F.when(F.col("rn") == 3, F.col("event_type"))))
                 .alias("path")))
    want = sorted((str(r.user_id), r.path) for r in paths.collect())
    assert got == want and len(got) > 0

    # the top-20 readout over the emissions matches the batch query
    emitted = (spark.table("sp_out")
               .filter(F.col("user_id") != "-1"))
    got_top = [(r.path, r.n_sessions) for r in
               (emitted.groupBy("path")
                .agg(F.count("*").cast("bigint").alias("n_sessions"))
                .orderBy(F.col("n_sessions").desc(), F.col("path"))
                .limit(20)).collect()]
    want_top = [(r.path, r.n_sessions) for r in
                ALL_QUERIES["events_session_funnel_paths"](
                    spark, sf).collect()]
    assert got_top == want_top
    spark.sql("DROP TABLE IF EXISTS sp_out")


def test_streaming_value_histogram_mannwhitney_equals_batch(
        spark, tmp_path):
    """Streaming Mann–Whitney twin (r14): the SAME (g, x, c)
    complete-mode value-histogram state that serves KS and χ² also
    finishes the rank-sum test — mannwhitney_from_value_histogram
    over an events-value sink reproduces the batch
    events_mannwhitney_value_test row bit-exactly after a 3-way
    micro-batch split (counts additive)."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        mannwhitney_from_value_histogram)
    from market_data_ingestor_go_spark.plans.queries import (
        ALL_QUERIES, _events)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_value_histogram)

    sf = "/root/testdata/sf0.001"
    events = (_events(spark, sf)
              .filter(F.col("event_type").isin("click", "view")
                      & F.col("value").isNotNull())
              .select("event_type", "value"))
    src = str(tmp_path / "mwsrc")
    os.makedirs(src)
    rows = events.collect()
    for i, part in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in part:
                fh.write(json.dumps({"event_type": r.event_type,
                                     "value": r.value}) + "\n")

    stream = (spark.readStream
              .schema("event_type STRING, value DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(
        streaming_value_histogram(stream, "event_type", "value"),
        "mw_hist", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = [(r.n_a_total, r.n_b_total, r.u2_statistic, r.z_score)
           for r in mannwhitney_from_value_histogram(
               spark.table("mw_hist"), "click", "view").collect()]
    want = [(r.n_click, r.n_view, r.u2_statistic, r.z_score)
            for r in ALL_QUERIES["events_mannwhitney_value_test"](
                spark, sf).collect()]
    assert got == want and len(got) == 1
    spark.sql("DROP TABLE IF EXISTS mw_hist")


def test_streaming_skew_moments_equals_batch(spark, tmp_path):
    """Streaming skewness/kurtosis twin (r14): the per-group integer-
    cents power sums are plain additive aggregates ⇒ the complete-mode
    state after a 3-way micro-batch split is BIT-identical to the
    batch raw_moments4 table, and skew_kurtosis_from_moments over the
    sink reproduces the batch orders_price_skew_kurtosis rows."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        raw_moments4, skew_kurtosis_from_moments)
    from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_skew_moments)

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders") \
        .select("o_orderstatus", "o_totalprice")
    src = str(tmp_path / "sksrc")
    os.makedirs(src)
    rows = orders.collect()
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps(
                    {"o_orderstatus": r.o_orderstatus,
                     "o_totalprice": float(r.o_totalprice)}) + "\n")

    stream = (spark.readStream
              .schema("o_orderstatus STRING, o_totalprice DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(
        streaming_skew_moments(stream, "o_orderstatus", "o_totalprice"),
        "skew_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("skew_state")
    want_state = raw_moments4(orders, "o_orderstatus", "o_totalprice")
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    got = sorted(map(tuple,
                     skew_kurtosis_from_moments(state).collect()))
    want = sorted(map(tuple, ALL_QUERIES["orders_price_skew_kurtosis"](
        spark, sf).collect()))
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS skew_state")


def test_streaming_conversion_latency_equals_batch(spark, tmp_path):
    """Streaming conversion tracker (r14): after a time-ordered
    micro-batch split, the emitted per-user (v_ts, p_ts, latency)
    rows equal the batch first-view/first-qualifying-purchase base,
    and the exact quantile readout over the emissions matches the
    batch events_conversion_latency row."""
    from pyspark.sql import Window
    from market_data_ingestor_go_spark.plans.queries import (
        ALL_QUERIES, _events)
    from market_data_ingestor_go_spark.streaming.stateful import (
        streaming_conversion_latency)

    sf = "/root/testdata/sf0.001"
    events = (_events(spark, sf)
              .filter(F.col("event_type").isin("view", "purchase"))
              .select("user_id", "ts_ms", "event_id", "event_type"))
    rows = sorted(events.collect(), key=lambda r: (r.ts_ms, r.event_id))
    src = str(tmp_path / "clsrc")
    os.makedirs(src)
    third = (len(rows) + 2) // 3
    for i, chunk in enumerate((rows[:third], rows[third:2 * third],
                               rows[2 * third:])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps({"user_id": r.user_id,
                                     "ts_ms": r.ts_ms,
                                     "event_id": str(r.event_id),
                                     "event_type": r.event_type}) + "\n")

    stream = (spark.readStream
              .schema("user_id BIGINT, ts_ms BIGINT, "
                      "event_id STRING, event_type STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = (streaming_conversion_latency(stream).writeStream
         .outputMode("append").format("memory").queryName("conv_out")
         .option("checkpointLocation", str(tmp_path / "c"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = spark.table("conv_out")
    got = sorted((r.user_id, r.latency_ms)
                 for r in emitted.collect())

    # batch base: first view, first purchase at-or-after it
    fv = (events.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts_ms").alias("v_ts")))
    conv = (events.filter(F.col("event_type") == "purchase")
            .select("user_id", "ts_ms")
            .join(fv, "user_id")
            .filter(F.col("ts_ms") >= F.col("v_ts"))
            .groupBy("user_id")
            .agg((F.min("ts_ms") - F.min("v_ts")).alias("lat")))
    want = sorted((str(r.user_id), r.lat) for r in conv.collect())
    assert got == want and len(got) > 0

    # quantile readout over the emissions matches the batch query
    w = Window.partitionBy().orderBy("latency_ms", "user_id")
    r2 = (emitted.withColumn("rk", F.row_number().over(w))
          .withColumn("n", F.count("*").over(Window.partitionBy())))
    got_q = (r2.groupBy("n")
             .agg(F.max(F.when(F.col("rk") == F.expr("(n + 1) div 2"),
                               F.col("latency_ms"))).alias("med"),
                  F.max(F.when(F.col("rk") == F.expr("(9*n + 9) div 10"),
                               F.col("latency_ms"))).alias("p90"))
             .collect()[0])
    want_q = ALL_QUERIES["events_conversion_latency"](
        spark, sf).collect()[0]
    assert got_q.n == want_q.n_converted
    assert got_q.med == want_q.median_latency_ms
    assert got_q.p90 == want_q.p90_latency_ms
    spark.sql("DROP TABLE IF EXISTS conv_out")


def test_streaming_conversion_tie_matches_batch(spark, tmp_path):
    """r15 ADVICE: a first purchase sharing ts_ms with the user's
    first view but sorting BEFORE it (by event_id in the same batch,
    or landing in an earlier micro-batch under the ordered prefix
    split) must still convert with latency 0 — the batch filter is
    ts >= v_ts, equality included. Three crafted users: u1 ties
    in-batch (purchase event_id sorts first), u2 ties ACROSS the
    batch boundary (purchase in batch 0, view in batch 1), u3 has
    the purchase strictly before the view (never converts)."""
    from market_data_ingestor_go_spark.streaming.stateful import (
        streaming_conversion_latency)

    batch0 = [
        {"user_id": 1, "ts_ms": 1000, "event_id": "a", "event_type": "purchase"},
        {"user_id": 1, "ts_ms": 1000, "event_id": "b", "event_type": "view"},
        {"user_id": 2, "ts_ms": 2000, "event_id": "a", "event_type": "purchase"},
        {"user_id": 3, "ts_ms": 2999, "event_id": "a", "event_type": "purchase"},
    ]
    batch1 = [
        {"user_id": 2, "ts_ms": 2000, "event_id": "b", "event_type": "view"},
        {"user_id": 3, "ts_ms": 3000, "event_id": "b", "event_type": "view"},
        {"user_id": 2, "ts_ms": 9000, "event_id": "c", "event_type": "view"},
    ]
    src = str(tmp_path / "tiesrc")
    os.makedirs(src)
    for i, chunk in enumerate((batch0, batch1)):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
    stream = (spark.readStream
              .schema("user_id BIGINT, ts_ms BIGINT, "
                      "event_id STRING, event_type STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = (streaming_conversion_latency(stream).writeStream
         .outputMode("append").format("memory").queryName("conv_tie")
         .option("checkpointLocation", str(tmp_path / "c"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.user_id: (r.v_ts, r.p_ts, r.latency_ms)
           for r in spark.table("conv_tie").collect()}
    # batch semantics: u1 and u2 convert at latency 0 on the tie;
    # u3's purchase (2999 < v_ts 3000) never qualifies.
    assert got == {"1": (1000, 1000, 0), "2": (2000, 2000, 0)}
    spark.sql("DROP TABLE IF EXISTS conv_tie")


def test_streaming_return_counts_equals_batch(spark, tmp_path):
    """Streaming Wilson return-rate twin (r15 verdict #5): per-brand
    (n, r) counts are plain additive aggregates ⇒ the complete-mode
    state after a 3-way micro-batch split is BIT-identical to the
    batch brand_return_counts table, and wilson_from_counts over the
    sink reproduces the batch part_brand_return_rates rows."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        brand_return_counts, wilson_from_counts)
    from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_return_counts)

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem") \
        .select("l_partkey", "l_returnflag")
    pt = load_table(spark, sf, "part").select("p_partkey", "p_brand")
    joined = li.join(pt, li["l_partkey"] == pt["p_partkey"]) \
        .select("p_brand", "l_returnflag")
    rows = joined.collect()
    src = str(tmp_path / "wrsrc")
    os.makedirs(src)
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps({"p_brand": r.p_brand,
                                     "l_returnflag": r.l_returnflag})
                         + "\n")
    stream = (spark.readStream
              .schema("p_brand STRING, l_returnflag STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_return_counts(stream),
                          "wilson_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("wilson_state")
    want_state = brand_return_counts(joined)
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    got = [tuple(r) for r in wilson_from_counts(state).collect()]
    want = [tuple(r) for r in ALL_QUERIES["part_brand_return_rates"](
        spark, sf).collect()]
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS wilson_state")


def test_streaming_customer_spend_equals_batch(spark, tmp_path):
    """Streaming Pareto twin (r15 verdict #5): per-customer decimal
    spend sums are plain additive aggregates ⇒ the complete-mode
    state after a 3-way micro-batch split is BIT-identical to the
    batch customer_spend table, and pareto_from_spend over the sink
    (joined to the customer dim) reproduces the batch
    customer_revenue_pareto rows."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        customer_spend, pareto_from_spend)
    from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_customer_spend)

    sf = "/root/testdata/sf0.001"
    o = load_table(spark, sf, "orders") \
        .select("o_custkey", "o_totalprice")
    rows = o.collect()
    src = str(tmp_path / "cssrc")
    os.makedirs(src)
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps(
                    {"o_custkey": r.o_custkey,
                     "o_totalprice": float(r.o_totalprice)}) + "\n")
    stream = (spark.readStream
              .schema("o_custkey BIGINT, o_totalprice DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_customer_spend(stream),
                          "spend_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("spend_state")
    want_state = customer_spend(o)
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    c = load_table(spark, sf, "customer") \
        .select("c_custkey", "c_mktsegment")
    got = sorted(map(tuple, pareto_from_spend(state, c).collect()))
    want = sorted(map(tuple, ALL_QUERIES["customer_revenue_pareto"](
        spark, sf).collect()))
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS spend_state")


def test_streaming_supplier_revenue_equals_batch(spark, tmp_path):
    """Streaming HHI twin (r15): per-(nation, supplier) decimal
    revenue sums are plain additive aggregates ⇒ the complete-mode
    state after a 3-way micro-batch split is BIT-identical to the
    batch supplier_revenue table, and hhi_from_supplier_revenue over
    the sink (joined to the nation dim) reproduces the batch
    nation_supplier_hhi rows."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        hhi_from_supplier_revenue, supplier_revenue)
    from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_supplier_revenue)

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select(
        "l_suppkey",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
        .alias("rev"))
    s = load_table(spark, sf, "supplier") \
        .select("s_suppkey", "s_nationkey")
    joined = (li.join(s, li["l_suppkey"] == s["s_suppkey"])
              .select("s_nationkey", "l_suppkey", "rev"))
    rows = joined.collect()
    src = str(tmp_path / "hhisrc")
    os.makedirs(src)
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps({"s_nationkey": r.s_nationkey,
                                     "l_suppkey": r.l_suppkey,
                                     "rev": float(r.rev)}) + "\n")
    stream = (spark.readStream
              .schema("s_nationkey BIGINT, l_suppkey BIGINT, rev DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_supplier_revenue(stream),
                          "hhi_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("hhi_state")
    want_state = supplier_revenue(joined)
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    got = sorted(map(tuple,
                     hhi_from_supplier_revenue(state, n).collect()))
    want = sorted(map(tuple, ALL_QUERIES["nation_supplier_hhi"](
        spark, sf).collect()))
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS hhi_state")


def test_streaming_hour_counts_equals_batch(spark, tmp_path):
    """Streaming seasonality twin (r15): (type, hour) counts are
    plain additive aggregates ⇒ the complete-mode state after a
    3-way micro-batch split is BIT-identical to the batch
    hour_counts table, and seasonality_from_hour_counts over the
    sink reproduces the batch events_hourly_seasonality rows."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        hour_counts, seasonality_from_hour_counts)
    from market_data_ingestor_go_spark.plans.queries import (
        ALL_QUERIES, _events)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_hour_counts)

    sf = "/root/testdata/sf0.001"
    e = _events(spark, sf).select("event_type", "ts_ms")
    rows = e.collect()
    src = str(tmp_path / "hoursrc")
    os.makedirs(src)
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps({"event_type": r.event_type,
                                     "ts_ms": r.ts_ms}) + "\n")
    stream = (spark.readStream
              .schema("event_type STRING, ts_ms BIGINT")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_hour_counts(stream),
                          "hour_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("hour_state")
    want_state = hour_counts(e)
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    got = sorted(map(tuple,
                     seasonality_from_hour_counts(state).collect()))
    want = sorted(map(tuple, ALL_QUERIES["events_hourly_seasonality"](
        spark, sf).collect()))
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS hour_state")


def test_streaming_kruskal_readout_equals_batch(spark, tmp_path):
    """r15: the Kruskal-Wallis readout over the streamed (g, x, c)
    value-histogram state must equal the batch
    events_kruskal_value_test row — the FOURTH readout from the one
    histogram state (KS, Mann-Whitney, chi-square, now KW)."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        kruskal_from_value_histogram)
    from market_data_ingestor_go_spark.plans.queries import (
        ALL_QUERIES, _events)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_value_histogram)

    sf = "/root/testdata/sf0.001"
    e = (_events(spark, sf).filter(F.col("value").isNotNull())
         .select("event_type", "value"))
    rows = e.collect()
    src = str(tmp_path / "kwsrc")
    os.makedirs(src)
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps({"event_type": r.event_type,
                                     "value": r.value}) + "\n")
    stream = (spark.readStream
              .schema("event_type STRING, value DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(
        streaming_value_histogram(stream, "event_type", "value"),
        "kw_hist", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = [tuple(r) for r in kruskal_from_value_histogram(
        spark.table("kw_hist")).collect()]
    want = [tuple(r) for r in ALL_QUERIES["events_kruskal_value_test"](
        spark, sf).collect()]
    assert got == want and len(got) == 1
    spark.sql("DROP TABLE IF EXISTS kw_hist")


def test_streaming_backlog_deltas_equals_batch(spark, tmp_path):
    """r15: per-day sweep-line delta sums are plain additive
    aggregates ⇒ the complete-mode state after a 3-way micro-batch
    split is BIT-identical to the batch backlog_deltas table, and
    backlog_from_deltas over the sink reproduces the batch
    orders_open_backlog_days rows."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        backlog_deltas, backlog_from_deltas)
    from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_backlog_deltas)

    sf = "/root/testdata/sf0.001"
    day0 = F.lit("1970-01-01").cast("date")
    li = (load_table(spark, sf, "lineitem")
          .select("l_orderkey",
                  F.datediff(F.col("l_shipdate").cast("date"), day0)
                  .alias("ship_day"))
          .groupBy("l_orderkey")
          .agg(F.max("ship_day").alias("last_ship")))
    o = (load_table(spark, sf, "orders")
         .select("o_orderkey",
                 F.datediff(F.col("o_orderdate").cast("date"), day0)
                 .alias("order_day")))
    j = (o.join(li, o["o_orderkey"] == li["l_orderkey"])
         .select("order_day", "last_ship"))
    rows = j.collect()
    src = str(tmp_path / "blsrc")
    os.makedirs(src)
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps({"order_day": r.order_day,
                                     "last_ship": r.last_ship}) + "\n")
    stream = (spark.readStream
              .schema("order_day BIGINT, last_ship BIGINT")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_backlog_deltas(stream),
                          "bl_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("bl_state")
    want_state = backlog_deltas(j)
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    got = sorted(map(tuple, backlog_from_deltas(state).collect()))
    want = sorted(map(tuple, ALL_QUERIES["orders_open_backlog_days"](
        spark, sf).collect()))
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS bl_state")


def test_streaming_kfold_counts_equals_batch(spark, tmp_path):
    """r15: per-(stratum, fold) counts are plain additive aggregates
    ⇒ the complete-mode state after a 3-way micro-batch split is
    BIT-identical to the batch kfold_counts table, and
    kfold_from_counts over the sink reproduces the batch
    docs_stratified_kfold rows."""
    from market_data_ingestor_go_spark.operators.training import (
        kfold_counts, kfold_from_counts)
    from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_kfold_counts)

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents") \
        .select("doc_id", "source", "text")
    rows = d.collect()
    src = str(tmp_path / "kfsrc")
    os.makedirs(src)
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps({"doc_id": r.doc_id,
                                     "source": r.source,
                                     "text": r.text}) + "\n")
    stream = (spark.readStream
              .schema("doc_id BIGINT, source STRING, text STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_kfold_counts(stream),
                          "kf_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("kf_state")
    want_state = kfold_counts(d)
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    got = sorted(map(tuple, kfold_from_counts(state).collect()))
    want = sorted(map(tuple, ALL_QUERIES["docs_stratified_kfold"](
        spark, sf).collect()))
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS kf_state")


def test_streaming_funnel_flags_equals_batch(spark, tmp_path):
    """r15: per-user (hc, hp) incidence flags are idempotent maxes ⇒
    the complete-mode state after a 3-way micro-batch split is
    BIT-identical to the batch user_funnel_flags table, and
    ztest_from_flags over the sink reproduces the batch
    events_purchase_rate_ztest row."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        user_funnel_flags, ztest_from_flags)
    from market_data_ingestor_go_spark.plans.queries import (
        ALL_QUERIES, _events)
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_funnel_flags)

    sf = "/root/testdata/sf0.001"
    e = _events(spark, sf).select("user_id", "event_type")
    rows = e.collect()
    src = str(tmp_path / "ffsrc")
    os.makedirs(src)
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps({"user_id": r.user_id,
                                     "event_type": r.event_type}) + "\n")
    stream = (spark.readStream
              .schema("user_id BIGINT, event_type STRING")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_funnel_flags(stream),
                          "ff_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("ff_state")
    want_state = user_funnel_flags(e)
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))
    got = [tuple(r) for r in ztest_from_flags(state).collect()]
    want = [tuple(r) for r in ALL_QUERIES["events_purchase_rate_ztest"](
        spark, sf).collect()]
    assert got == want and len(got) == 1
    spark.sql("DROP TABLE IF EXISTS ff_state")


def test_streaming_yoy_counts_equals_batch(spark, tmp_path):
    """r15: per-customer paired year counts are plain additive
    aggregates ⇒ the complete-mode state after a 3-way micro-batch
    split is BIT-identical to the batch yoy_counts table, and
    sign_test_from_counts over the sink reproduces the batch
    customer_yoy_sign_test row."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        sign_test_from_counts, yoy_counts)
    from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_yoy_counts)

    sf = "/root/testdata/sf0.001"
    o = (load_table(spark, sf, "orders")
         .select("o_custkey", F.year("o_orderdate").alias("yr"))
         .filter(F.col("yr").isin(1996, 1997)))
    rows = o.collect()
    src = str(tmp_path / "yoysrc")
    os.makedirs(src)
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps({"o_custkey": r.o_custkey,
                                     "yr": r.yr}) + "\n")
    stream = (spark.readStream
              .schema("o_custkey BIGINT, yr INT")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_yoy_counts(stream),
                          "yoy_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("yoy_state")
    want_state = yoy_counts(o, "o_custkey", "yr")
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))
    got = [tuple(r) for r in sign_test_from_counts(state).collect()]
    want = [tuple(r) for r in ALL_QUERIES["customer_yoy_sign_test"](
        spark, sf).collect()]
    assert got == want and len(got) == 1
    spark.sql("DROP TABLE IF EXISTS yoy_state")


def test_streaming_daily_revenue_three_readouts(spark, tmp_path):
    """r15: day-grain revenue sums are plain additive aggregates ⇒
    the complete-mode state after a 3-way micro-batch split is
    BIT-identical to the batch daily_revenue table, and ALL THREE
    finishers over the sink (autocorrelation, Theil-Sen, runs test)
    reproduce their batch query rows — one state, three monitors."""
    from market_data_ingestor_go_spark.operators.timeseries import (
        autocorr_from_daily, daily_revenue, runs_test_from_daily,
        theilsen_from_daily)
    from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES
    from market_data_ingestor_go_spark.sources.tables import load_table
    from market_data_ingestor_go_spark.streaming.sketches import (
        run_sketch_stream, streaming_daily_revenue)

    sf = "/root/testdata/sf0.001"
    o = load_table(spark, sf, "orders") \
        .select("o_orderdate", "o_totalprice")
    rows = o.collect()
    src = str(tmp_path / "drsrc")
    os.makedirs(src)
    for i, chunk in enumerate((rows[::3], rows[1::3], rows[2::3])):
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps(
                    {"o_orderdate": str(r.o_orderdate),
                     "o_totalprice": float(r.o_totalprice)}) + "\n")
    stream = (spark.readStream
              .schema("o_orderdate TIMESTAMP, o_totalprice DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    q = run_sketch_stream(streaming_daily_revenue(stream),
                          "dr_state", str(tmp_path / "c"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.table("dr_state")
    want_state = daily_revenue(o)
    assert sorted(map(tuple, state.collect())) == \
        sorted(map(tuple, want_state.collect()))

    for fin, qname in ((autocorr_from_daily, "orders_daily_autocorr"),
                       (theilsen_from_daily, "orders_theilsen_trend"),
                       (runs_test_from_daily,
                        "orders_revenue_runs_test")):
        got = sorted(map(tuple, fin(state).collect()))
        want = sorted(map(tuple, ALL_QUERIES[qname](spark, sf)
                          .collect()))
        assert got == want and len(got) == 1, qname
    spark.sql("DROP TABLE IF EXISTS dr_state")
