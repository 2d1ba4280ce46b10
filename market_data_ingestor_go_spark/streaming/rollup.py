"""Continuous aggregates — the streaming twin of the batch OHLC rollup.

TimescaleDB-style hypertable rollups (continuously-maintained
time-bucketed bars) map onto Structured Streaming as a watermarked
event-time window aggregate: each micro-batch folds new events into
the open bars, the watermark closes bars once late data can no longer
arrive, and ``min_by``/``max_by`` on a unique (ts, id) key give exact
open/close without a per-bar sort.

Scale posture (100 TB / firehose): state is one row per (bar, type) —
bounded by the watermark horizon, not the stream; the aggregation is
partial map-side within each micro-batch, so the shuffle carries bars,
not events. ``update`` output mode emits refined bars as they change;
``append`` emits only closed bars (use for sinks that can't upsert).

Batch twin (same expressions, driver-checked against the DuckDB
oracle): plans/queries.py::events_ohlc_bars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_ohlc_bars(events: DataFrame, bar: str = "15 minutes",
                        watermark: str = "30 minutes",
                        ts_col: str = "ts", id_col: str = "event_id",
                        key_col: str = "event_type",
                        value_col: str = "value") -> DataFrame:
    """Watermarked per-bar OHLC aggregate over an event-time stream.

    ``events`` needs an event-time timestamp column (``ts_col``), a
    unique id for deterministic open/close tie-breaks, a bar key and a
    value. Late rows beyond ``watermark`` are dropped (the bar is
    closed); within the horizon they refine the bar exactly like the
    batch rollup would.
    """
    ord_key = F.struct(F.col(ts_col), F.col(id_col))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, bar).alias("w"), F.col(key_col))
        .agg(F.min_by(value_col, ord_key).alias("open"),
             F.max(value_col).alias("high"),
             F.min(value_col).alias("low"),
             F.max_by(value_col, ord_key).alias("close"),
             F.count("*").alias("n_events"),
             F.sum(F.col(value_col).cast("decimal(27,10)"))
              .cast("double").alias("sum_value"))
        .select(F.unix_millis(F.col("w.start")).alias("bar_start_ms"),
                key_col, "open", "high", "low", "close",
                "n_events", "sum_value")
    )


def streaming_sessions(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "30 minutes",
                       ts_col: str = "ts", key_col: str = "user_id",
                       value_col: str = "value") -> DataFrame:
    """Watermarked SESSION windows over an event-time stream — the
    streaming twin of events_sessionization (same native
    session_window primitive as the batch query).

    Sessions are data-driven windows: the state store keeps one open
    session per (key, window) and MERGES sessions when a new event
    bridges two within ``gap`` — including across micro-batches, which
    no fixed-window rollup can express. ``append`` mode emits a
    session only once the watermark passes its close (start of the
    gap after its last event), so downstream sees each session exactly
    once, finalized. State is bounded by open sessions within the
    watermark horizon, never by stream length.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sw"),
                 F.col(key_col))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col(value_col).cast("decimal(27,10)"))
              .cast("double").alias("sum_value"))
        .select(key_col,
                F.unix_millis(F.col("sw.start")).alias("session_start_ms"),
                F.unix_millis(F.col("sw.end")).alias("session_end_ms"),
                "n_events", "sum_value")
    )


def streaming_vwap(events: DataFrame, bar: str = "1 hour",
                   watermark: str = "2 hours",
                   ts_col: str = "ts", key_col: str = "event_type",
                   value_col: str = "value",
                   qty_col: str = "k") -> DataFrame:
    """Continuously-maintained VWAP bars — the streaming twin of
    ``events_vwap``. Because the weighted sum is the repo's
    order-independent decimal pattern and the quantity sum is exact
    BIGINT, the refined bar after ANY micro-batch split is
    bit-identical to the batch aggregate over the same rows (the
    same argument as streaming_moments; tested). State per (bar,
    key) is three numbers; shuffle carries bars, not events; the
    when-guard mirrors the batch query (a zero-quantity bar reads
    NULL until quantity arrives)."""
    w = events.withWatermark(ts_col, watermark)
    return (
        w.groupBy(F.window(F.col(ts_col), bar).alias("w"),
                  F.col(key_col))
        .agg(F.count("*").alias("n_events"),
             F.sum(qty_col).alias("sum_qty"),
             F.when(F.sum(qty_col) > 0,
                    F.sum((F.col(value_col) * F.col(qty_col))
                          .cast("decimal(27,6)")).cast("double")
                    / F.sum(qty_col).cast("double")).alias("vwap"))
        .select(F.unix_millis(F.col("w.start")).alias("hour_start_ms"),
                key_col, "n_events", "sum_qty", "vwap"))
