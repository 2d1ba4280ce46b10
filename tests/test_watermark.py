"""§2.9 late-data semantics: event-time tumbling windows with a
watermark through a real streaming query — late rows beyond the
watermark are dropped, closed windows emit exactly once (append mode).

The reference has NO event-time logic (anything with ts>0 is accepted
forever, SURVEY.md §2.6); this is engine-surface coverage the driver
mandates, tested at the streaming level (batch twin: events_tumbling_window).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

BASE = "2030-01-01T00:00:"


def _write(src, fname, seconds):
    with open(os.path.join(src, fname), "w") as fh:
        for s in seconds:
            fh.write(json.dumps({"ts": f"{BASE}{s:02d}", "k": "a"}) + "\n")


def test_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(src, "b1.json", [1, 3, 5])          # window [0,10)

    stream = (spark.readStream.schema("ts TIMESTAMP, k STRING").json(src)
              .withWatermark("ts", "10 seconds")
              .groupBy(F.window("ts", "10 seconds").alias("w"), "k")
              .agg(F.count("*").alias("n")))
    q = (stream.select(F.unix_millis("w.start").alias("ws"), "k", "n")
         .writeStream.outputMode("append").format("memory")
         .queryName("wm")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()   # watermark after b1: 00:05 - 10s → nothing closed
    assert spark.sql("SELECT * FROM wm").count() == 0

    _write(src, "b2.json", [25])               # advances watermark to 00:15
    q.processAllAvailable()                    # [0,10) closes: emits n=3
    rows = {(r["ws"], r["n"]) for r in spark.sql("SELECT * FROM wm").collect()}
    base_ms = 1893456000000  # 2030-01-01T00:00:00Z
    assert rows == {(base_ms, 3)}

    # late row at 00:02 — watermark is 00:15, so it must be DROPPED,
    # and a new row at 00:40 closes [20,30)
    _write(src, "b3.json", [2, 40])
    q.processAllAvailable()
    q.stop()
    rows = {(r["ws"], r["n"]) for r in spark.sql("SELECT * FROM wm").collect()}
    assert rows == {(base_ms, 3), (base_ms + 20_000, 1)}  # late 00:02 ignored,
    # [0,10) emitted exactly once (count unchanged by the late row)


def test_streaming_gap_fill_locf(spark, tmp_path):
    """Streaming LOCF grid: gaps between micro-batches are emitted the
    moment a later observation closes them; late data older than the
    emitted grid head is dropped; state carries across batches."""
    import json
    import os

    from market_data_ingestor_go_spark.streaming.stateful import (
        streaming_gap_fill_locf)

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(src + "/a.json", "w") as fh:
        fh.write(json.dumps({"sym": "A", "ts": 5, "px": 1.0}) + "\n")
        fh.write(json.dumps({"sym": "A", "ts": 8, "px": 2.0}) + "\n")

    stream = (spark.readStream
              .schema("sym STRING, ts LONG, px DOUBLE").json(src))
    out = streaming_gap_fill_locf(stream, "sym", "ts", "px", step_ms=10)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("gapfill_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    rows = {(r.k, r.bucket_start_ms): (r.value_locf, r.is_gap)
            for r in spark.sql("SELECT * FROM gapfill_stream").collect()}
    assert rows == {("A", 0): (2.0, False)}  # last obs in bucket wins

    # batch 2: A jumps three buckets ahead (two gaps close), a late A
    # record inside the emitted head is dropped, B starts fresh
    with open(src + "/b.json", "w") as fh:
        fh.write(json.dumps({"sym": "A", "ts": 35, "px": 5.0}) + "\n")
        fh.write(json.dumps({"sym": "A", "ts": 3, "px": 9.0}) + "\n")
        fh.write(json.dumps({"sym": "B", "ts": 42, "px": 7.0}) + "\n")
    q.processAllAvailable()
    q.stop()
    rows = {(r.k, r.bucket_start_ms): (r.value_locf, r.is_gap)
            for r in spark.sql("SELECT * FROM gapfill_stream").collect()}
    assert rows == {
        ("A", 0): (2.0, False),
        ("A", 10): (2.0, True),
        ("A", 20): (2.0, True),
        ("A", 30): (5.0, False),
        ("B", 40): (7.0, False),
    }


def test_streaming_gap_fill_interpolate(spark, tmp_path):
    """Interpolate mode: a gap row is emitted only when the closing
    observation arrives, so both endpoints are always known — the
    causally-sound streaming interpolation."""
    import json
    import os

    from market_data_ingestor_go_spark.streaming.stateful import (
        streaming_gap_fill)

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(src + "/a.json", "w") as fh:
        fh.write(json.dumps({"sym": "A", "ts": 5, "px": 1.0}) + "\n")

    stream = (spark.readStream
              .schema("sym STRING, ts LONG, px DOUBLE").json(src))
    out = streaming_gap_fill(stream, "sym", "ts", "px", step_ms=10,
                             mode="interpolate")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("gapfill_interp_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    # batch 2 closes a 2-bucket gap: interpolation endpoints are the
    # stored (0, 1.0) and the closing (30, 4.0) observation
    with open(src + "/b.json", "w") as fh:
        fh.write(json.dumps({"sym": "A", "ts": 31, "px": 4.0}) + "\n")
    q.processAllAvailable()
    q.stop()
    rows = {(r.k, r.bucket_start_ms): (r.value_locf, r.is_gap)
            for r in spark.sql("SELECT * FROM gapfill_interp_stream")
            .collect()}
    assert rows == {
        ("A", 0): (1.0, False),
        ("A", 10): (2.0, True),
        ("A", 20): (3.0, True),
        ("A", 30): (4.0, False),
    }


def test_streaming_ewma_equals_batch_recursion(spark, tmp_path):
    """Streaming EWMA: state (two scalars) carries the recursion
    across micro-batches — the concatenated stream's smoothed values
    equal the batch recursion row-for-row; late rows at-or-before the
    consumed head are dropped; per-key independence holds."""
    import json
    import os

    from market_data_ingestor_go_spark.streaming.stateful import (
        streaming_ewma)

    src = str(tmp_path / "src")
    os.makedirs(src)
    a_vals = [(1, 10.0), (2, 20.0), (3, 30.0)]
    with open(src + "/a.json", "w") as fh:
        for ts, v in a_vals:
            fh.write(json.dumps({"sym": "A", "ts": ts, "px": v}) + "\n")

    stream = (spark.readStream
              .schema("sym STRING, ts LONG, px DOUBLE").json(src))
    out = streaming_ewma(stream, "sym", "ts", "px", alpha=0.5)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("ewma_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()

    # batch 2: A continues (recursion must carry y=22.5 forward), one
    # late A row is dropped, B starts its own series
    with open(src + "/b.json", "w") as fh:
        fh.write(json.dumps({"sym": "A", "ts": 4, "px": 40.0}) + "\n")
        fh.write(json.dumps({"sym": "A", "ts": 2, "px": 99.0}) + "\n")
        fh.write(json.dumps({"sym": "B", "ts": 1, "px": 8.0}) + "\n")
    q.processAllAvailable()
    q.stop()

    got = {(r.k, r.ts_ms): r.ewma
           for r in spark.sql("SELECT * FROM ewma_stream").collect()}
    # batch recursion: 10 -> 15 -> 22.5 -> (0.5*40 + 0.5*22.5) = 31.25
    assert got == {("A", 1): 10.0, ("A", 2): 15.0, ("A", 3): 22.5,
                   ("A", 4): 31.25, ("B", 1): 8.0}


def test_streaming_sessions_merge_across_batches(spark, tmp_path):
    """Streaming session windows: an event arriving in a LATER
    micro-batch inside the gap must merge into (extend) the open
    session — cross-batch merge is what distinguishes sessions from
    fixed windows — and append mode emits the session exactly once,
    after the watermark passes its close."""
    import json
    import os

    from market_data_ingestor_go_spark.streaming.rollup import (
        streaming_sessions)

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = 1_700_000_000  # seconds
    def ev(uid, t, v):
        return json.dumps({"uid": uid, "t": t + base, "v": v}) + "\n"

    with open(src + "/a.json", "w") as fh:
        fh.write(ev("A", 0, 1.0))
        fh.write(ev("A", 60, 2.0))

    stream = (spark.readStream.schema("uid STRING, t LONG, v DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src)
              .withColumn("ts", F.timestamp_seconds("t")))
    out = streaming_sessions(stream, gap="10 minutes",
                             watermark="1 second", ts_col="ts",
                             key_col="uid", value_col="v")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("sessions_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()

    # batch 2: extends A's session across the batch boundary, then a
    # far-future event pushes the watermark past A's close
    with open(src + "/b.json", "w") as fh:
        fh.write(ev("A", 120, 3.0))
        fh.write(ev("B", 10_000, 9.0))
    q.processAllAvailable()
    q.stop()

    rows = {r.uid: r for r in
            spark.sql("SELECT * FROM sessions_stream").collect()}
    assert "A" in rows  # closed and emitted exactly once
    a = rows["A"]
    assert a.n_events == 3 and a.sum_value == 6.0
    assert a.session_start_ms == base * 1000
    assert a.session_end_ms == (base + 120 + 600) * 1000
    assert "B" not in rows  # B's session is still open


def test_streaming_ewma_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState recovery: stop the query after batch 1,
    start a NEW query over the same checkpoint, feed batch 2 — the
    recursion must continue from the recovered (last_ts, last_y)
    state, not restart from scratch."""
    import json
    import os

    from market_data_ingestor_go_spark.streaming.stateful import (
        streaming_ewma)

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(src + "/a.json", "w") as fh:
        fh.write(json.dumps({"sym": "A", "ts": 1, "px": 10.0}) + "\n")
        fh.write(json.dumps({"sym": "A", "ts": 2, "px": 20.0}) + "\n")

    sink = str(tmp_path / "sink")

    def start():
        # memory sink can't recover a checkpoint; the parquet sink can
        stream = (spark.readStream
                  .schema("sym STRING, ts LONG, px DOUBLE").json(src))
        out = streaming_ewma(stream, "sym", "ts", "px", alpha=0.5)
        return (out.writeStream.outputMode("append").format("parquet")
                .option("path", sink)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .start())

    q = start()
    q.processAllAvailable()
    q.stop()  # simulate driver restart

    with open(src + "/b.json", "w") as fh:
        fh.write(json.dumps({"sym": "A", "ts": 3, "px": 30.0}) + "\n")
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = {r.ts_ms: r.ewma for r in
           spark.read.parquet(sink).collect()}
    # 10 -> 15 -> 22.5; a from-scratch restart would give 30.0 at ts 3
    assert got[3] == 22.5, got


def test_streaming_twap_buckets(spark, tmp_path):
    """Streaming TWAP: bars emit exactly once when closed; the held
    value weights by duration (hand-computed: 10 for 500ms + 20 for
    500ms -> 15); a multi-bucket silent gap emits every spanned
    bucket at the held value when the closing observation arrives;
    state carries across micro-batches."""
    import json
    import os

    from market_data_ingestor_go_spark.streaming.stateful import (
        streaming_twap)

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(src + "/a.json", "w") as fh:
        fh.write(json.dumps({"sym": "A", "ts": 0, "px": 10.0}) + "\n")
        fh.write(json.dumps({"sym": "A", "ts": 500, "px": 20.0}) + "\n")

    stream = (spark.readStream
              .schema("sym STRING, ts LONG, px DOUBLE").json(src))
    out = streaming_twap(stream, "sym", "ts", "px", bucket_ms=1000)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("twap_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM twap_stream").count() == 0  # open bar

    # batch 2: ts=1000 closes bucket 0; ts=3500 closes 1 and 2 (held
    # at 40 across the silent gap)
    with open(src + "/b.json", "w") as fh:
        fh.write(json.dumps({"sym": "A", "ts": 1000, "px": 40.0}) + "\n")
        fh.write(json.dumps({"sym": "A", "ts": 3500, "px": 7.0}) + "\n")
    q.processAllAvailable()
    q.stop()

    got = {r.bucket_start_ms: (r.twap, r.covered_ms) for r in
           spark.sql("SELECT * FROM twap_stream").collect()}
    assert got == {0: (15.0, 1000),      # 10*500 + 20*500 over 1000
                   1000: (40.0, 1000),   # held 40
                   2000: (40.0, 1000)}   # still held through the gap


def test_streaming_ewma_same_ts_arrival_order(spark, tmp_path):
    """Timestamp ties consume in ARRIVAL order, not value order: two
    same-ts ticks (9.0 then 3.0) must leave the FIRST one consumed
    (regression: a bare tuple sort tiebroke on value and kept 3.0)."""
    import json
    import os

    from market_data_ingestor_go_spark.streaming.stateful import (
        streaming_ewma)

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(src + "/a.json", "w") as fh:
        fh.write(json.dumps({"sym": "A", "ts": 5, "px": 9.0}) + "\n")
        fh.write(json.dumps({"sym": "A", "ts": 5, "px": 3.0}) + "\n")
        fh.write(json.dumps({"sym": "A", "ts": 6, "px": 1.0}) + "\n")

    stream = (spark.readStream
              .schema("sym STRING, ts LONG, px DOUBLE").json(src))
    out = streaming_ewma(stream, "sym", "ts", "px", alpha=0.5)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("ewma_ties")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    q.stop()
    got = {r.ts_ms: r.ewma for r in
           spark.sql("SELECT * FROM ewma_ties").collect()}
    # arrival order: 9.0 consumed, 3.0 dropped, then 0.5*1 + 0.5*9 = 5
    assert got == {5: 9.0, 6: 5.0}, got


def test_streaming_motif_alerts_cross_batch(spark, tmp_path):
    """Streaming motif alerts: a pattern occurrence that SPANS the
    micro-batch boundary is detected (the m-1 tail carries in state);
    a scaled recurrence alerts at ~0 distance; unrelated movement
    stays silent."""
    import json
    import os

    from market_data_ingestor_go_spark.streaming.stateful import (
        streaming_motif_alerts)

    pattern = [1.0, 2.0, 4.0, 8.0, 4.0, 2.0, 1.0]
    # batch 1 ends mid-pattern; batch 2 completes it at 10x amplitude
    b1 = [(0, 5.0), (1, 5.1), (2, 10.0), (3, 20.0), (4, 40.0)]
    b2 = [(5, 80.0), (6, 40.0), (7, 20.0), (8, 10.0),
          (9, 5.0), (10, 5.2)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    import time as _time
    for i, batch in enumerate((b1, b2)):
        fp = os.path.join(src, f"b{i}.json")
        with open(fp, "w") as fh:
            for t, v in batch:
                fh.write(json.dumps({"sym": "A", "ts": t, "px": v}) + "\n")
        _time.sleep(0.01)
        os.utime(fp, (1700000000 + i, 1700000000 + i))

    stream = (spark.readStream
              .schema("sym STRING, ts LONG, px DOUBLE")
              .option("maxFilesPerTrigger", 1).json(src))
    out = streaming_motif_alerts(stream, "sym", "ts", "px",
                                 pattern, threshold=0.5)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("motif_alerts")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    q.stop()

    alerts = spark.sql("SELECT * FROM motif_alerts").collect()
    assert len(alerts) == 1
    a = alerts[0]
    # window [2..8] = the 10x pattern, starting in batch 1
    assert a.win_start_ms == 2 and a.dist < 1e-9


def test_streaming_drawdown_equals_batch_window(spark, tmp_path):
    """Streaming drawdown: the running peak carries across
    micro-batches; the concatenated stream's (peak, dd) rows equal
    the batch cumulative-max window BIT-exactly (max/subtract are
    exact ops); a late row at-or-before the consumed head drops;
    per-key independence holds."""
    import json
    import os

    from market_data_ingestor_go_spark.streaming.stateful import (
        streaming_drawdown)

    src = str(tmp_path / "src")
    os.makedirs(src)
    a_vals = [(1, 10.0), (2, 30.0), (3, 17.5)]
    with open(src + "/a.json", "w") as fh:
        for ts, v in a_vals:
            fh.write(json.dumps({"sym": "A", "ts": ts, "px": v}) + "\n")

    stream = (spark.readStream
              .schema("sym STRING, ts LONG, px DOUBLE").json(src))
    out = streaming_drawdown(stream, "sym", "ts", "px")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dd_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()

    # batch 2: A continues (peak 30 must carry), a late A row drops,
    # B starts its own series
    with open(src + "/b.json", "w") as fh:
        fh.write(json.dumps({"sym": "A", "ts": 4, "px": 12.25}) + "\n")
        fh.write(json.dumps({"sym": "A", "ts": 2, "px": 99.0}) + "\n")
        fh.write(json.dumps({"sym": "B", "ts": 1, "px": 8.0}) + "\n")
        fh.write(json.dumps({"sym": "B", "ts": 2, "px": 9.5}) + "\n")
    q.processAllAvailable()
    q.stop()

    got = {(r.k, r.ts_ms): (r.peak, r.dd)
           for r in spark.sql("SELECT * FROM dd_stream").collect()}
    assert got == {
        ("A", 1): (10.0, 0.0), ("A", 2): (30.0, 0.0),
        ("A", 3): (30.0, 12.5), ("A", 4): (30.0, 17.75),
        ("B", 1): (8.0, 0.0), ("B", 2): (9.5, 0.0)}

    # bit-equality with the batch window formulation on the same rows
    from pyspark.sql.window import Window as W
    rows = [("A", 1, 10.0), ("A", 2, 30.0), ("A", 3, 17.5),
            ("A", 4, 12.25), ("B", 1, 8.0), ("B", 2, 9.5)]
    bdf = spark.createDataFrame(rows, "k STRING, ts_ms LONG, v DOUBLE")
    w = (W.partitionBy("k").orderBy("ts_ms")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    batch = {(r.k, r.ts_ms): (r.peak, r.dd) for r in
             bdf.withColumn("peak", F.max("v").over(w))
                .withColumn("dd", F.col("peak") - F.col("v"))
                .collect()}
    assert batch == got


def test_streaming_vwap_equals_batch_bit_exact(spark, tmp_path):
    """Streaming VWAP bars: after the stream drains, every refined
    bar equals the batch events_vwap aggregate over the same rows
    BIT-exactly — decimal weighted sums are order-independent, so
    micro-batch splits cannot perturb the result; a zero-quantity
    bar reads NULL vwap in both."""
    from market_data_ingestor_go_spark.streaming.rollup import (
        streaming_vwap)

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [  # two hours, split across batches mid-hour
        ("click", 1_700_000_000_000, 10.5, 3),
        ("click", 1_700_000_100_000, 11.25, 2),
        ("click", 1_700_003_700_000, 9.75, 4),
        ("view", 1_700_000_200_000, 7.125, 0),   # zero-qty bar
    ]
    batches = [rows[:2], rows[2:]]
    for i, batch in enumerate(batches):
        with open(f"{src}/b{i}.json", "w") as fh:
            for et, ms, v, k in batch:
                fh.write(json.dumps(
                    {"event_type": et, "ts_ms": ms,
                     "value": v, "k": k}) + "\n")
        os.utime(f"{src}/b{i}.json", (1700000000 + i,) * 2)

    stream = (spark.readStream
              .schema("event_type STRING, ts_ms LONG, value DOUBLE, k LONG")
              .option("maxFilesPerTrigger", 1).json(src)
              .withColumn("ts", F.timestamp_millis(F.col("ts_ms"))))
    out = streaming_vwap(stream)
    q = (out.writeStream.outputMode("complete").format("memory")
         .queryName("vwap_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.processAllAvailable()
    q.stop()

    got = {(r.event_type, r.hour_start_ms):
           (r.n_events, r.sum_qty, r.vwap)
           for r in spark.sql("SELECT * FROM vwap_stream").collect()}

    bdf = spark.createDataFrame(
        rows, "event_type STRING, ts_ms LONG, value DOUBLE, k LONG")
    batch = {(r.event_type, r.hour_start_ms):
             (r.n_events, r.sum_qty, r.vwap) for r in
             bdf.groupBy("event_type",
                         (F.expr("ts_ms div 3600000") * 3600000)
                         .alias("hour_start_ms"))
             .agg(F.count("*").alias("n_events"),
                  F.sum("k").alias("sum_qty"),
                  F.when(F.sum("k") > 0,
                         F.sum((F.col("value") * F.col("k"))
                               .cast("decimal(27,6)")).cast("double")
                         / F.sum("k").cast("double")).alias("vwap"))
             .collect()}
    assert got == batch
    assert got[("view", 1_699_999_200_000)][2] is None
