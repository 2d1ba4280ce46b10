"""E1 — the ingest hot path as a Structured Streaming pipeline.

Reference dataflow (SURVEY.md §3 E1):

    WS frame → json decode (S2) → validate (P1) → exchange enrichment
    (P9/J1) → channel → worker micro-batch (flush on size/2 s timer)
    → PG append (K1) + Redis latest-value upsert (K2)

Spark realization:

    readStream(source) → from_json → P1 filter → broadcast join
    → writeStream.foreachBatch(dual_sink).trigger(processingTime='2s')
    with checkpointing

Semantics upgrades over the reference (documented, SURVEY.md §2.9):
- exactly-once per micro-batch (checkpoint + idempotent/transactional
  sink writes) vs the reference's at-most-once (3 retries then drop,
  processor.go:99-114);
- the latest-state view is timestamp-max last-write-wins, not
  arrival-order (cache_service.go:45-52 overwrites blindly).

Scale posture: the only stateful piece is latest-per-key over ~O(500)
symbol keys — trivial state. History append is partition-parallel
parquet. At 100 TB/day the knobs are source admission
(maxFilesPerTrigger / maxOffsetsPerTrigger ≈ the reference's 10k
channel buffer, main.go:61) and sink file sizing — not operator
changes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.market import MARKET_DATA_SCHEMA, validate
from ..operators.enrich import enrich_exchange
from ..operators.latest import latest_per_key
from ..sources import fs

DEFAULT_TTL_MILLIS = 24 * 3600 * 1000  # REDIS_TTL default 24h, config.go:37


def decode_raw_frames(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """S2: raw JSON frames → typed envelope; undecodable frames dropped
    and counted (ErrorsTotal{type="unmarshal"}, metrics.go:8-34 /
    ingestor.go:105-110) — the observe rides the executed lineage at
    zero extra scans."""
    from pyspark.sql import types as T
    schema_with_corrupt = T.StructType(
        list(MARKET_DATA_SCHEMA.fields)
        + [T.StructField("_corrupt", T.StringType())])
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), schema_with_corrupt,
                    {"columnNameOfCorruptRecord": "_corrupt"}).alias("r"))
    # PERMISSIVE parse puts the raw text in _corrupt on malformed input
    # (an all-null struct alone is NOT an unmarshal failure: `{}` is
    # valid JSON that later fails validation, a different counter)
    bad = F.col("r").isNull() | F.col("r._corrupt").isNotNull()
    parsed = parsed.observe(
        "decode",
        F.count(F.lit(1)).alias("frames_received"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("errors_unmarshal"))
    return (parsed.filter(~bad)
            .select(*[f"r.{f.name}" for f in MARKET_DATA_SCHEMA.fields]))


def dedup_frames_within(df: DataFrame, horizon: str = "10 minutes",
                        keys: tuple = ("name", "timestamp")) -> DataFrame:
    """Effectively-once upgrade for at-least-once sources: drop exact
    duplicate frames (same key tuple) arriving within ``horizon`` of
    event time. The WS source replays its connection buffer after a
    crash (at-least-once, streaming/sources.py) — this stage makes the
    pipeline end-to-end effectively-once even when the replay crosses
    an epoch boundary, the case epoch-idempotent sinks can't cover.

    Streaming: ``dropDuplicatesWithinWatermark`` — state is bounded by
    the watermark horizon (keys seen per horizon window), evicted by
    event time; at 100 TB state size is |keys within horizon|, not the
    stream's history. Batch: plain dropDuplicates (same contract)."""
    wm = df.withColumn("_event_ts", F.timestamp_millis(F.col("timestamp")))
    if df.isStreaming:
        wm = wm.withWatermark("_event_ts", horizon)
        out = wm.dropDuplicatesWithinWatermark(list(keys))
    else:
        out = wm.dropDuplicates(list(keys))
    return out.drop("_event_ts")


def build_ingest_stream(frames: DataFrame, symbols_dim: DataFrame) -> DataFrame:
    """The logical ingest plan: decode → validate → enrich.

    ``frames`` may be batch or streaming; the plan is identical (that's
    the point of declaring it in DataFrame algebra).
    """
    decoded = frames
    if "name" not in frames.columns:  # raw wire frames
        decoded = decode_raw_frames(frames)
    validated = validate(decoded)
    observed = validated.observe(
        "ingest", F.count(F.lit(1)).alias("messages_processed")) \
        if not validated.isStreaming else validated
    return enrich_exchange(observed, symbols_dim)


@dataclass
class IngestPipeline:
    """Checkpointed dual-sink ingest runner (K1 + K2 in one foreachBatch).

    - history: append-only parquet table (market_data DDL semantics,
      postgres.go:52-58 — duplicates allowed, ts==0 rows skipped).
      Each micro-batch lands in its own ``epoch=<id>`` partition
      directory written with mode=overwrite, so replaying an epoch
      after a crash rewrites the same directory instead of appending
      duplicates — idempotent, hence exactly-once end to end.
    - latest : per-symbol latest-value state table (the Redis cache,
      cache_service.go:37-61), TTL-evicted like `EX ttl`. The merge
      itself is idempotent (timestamp-max), and the table is replaced
      via an atomic rename swap with a ``.old`` backup
      (sources/fs.py) — a crash mid-swap never loses the table.

    The two writes share one micro-batch (one scan). ``base_dir`` owns
    the checkpoint AND both sinks as one unit: deleting the checkpoint
    but keeping the sinks (or vice versa) breaks the epoch/replay
    contract, exactly as it would for any exactly-once sink.
    """

    spark: SparkSession
    base_dir: str
    symbols_dim: DataFrame
    ttl_millis: int = DEFAULT_TTL_MILLIS
    trigger_seconds: int = 2  # FLUSH_INTERVAL default, config.go:38
    # Opt-in 100 TB layout: nest ds=<event date> partitions inside each
    # epoch dir, so time-range history scans prune at the directory
    # level (epoch stays OUTER — overwriting one epoch dir keeps the
    # crash-replay idempotence contract regardless of which dates the
    # batch touched). Off by default: tiny local tables don't need the
    # extra directory fan-out.
    partition_by_date: bool = False
    # Latest-state write parallelism. 1 (default) = single file, right
    # for the reference's ~500-key symbol space; a large key space
    # (10⁸ keys) sets this higher so the state write isn't one task —
    # >1 repartitions BY KEY, so a future bucketed/merge-on-key sink
    # reads co-located state.
    state_partitions: int = 1
    # Optional LIVE Redis mirror for the latest-value cache (K2,
    # cache_service.go:37-61): when set to (host, port), each
    # micro-batch's latest rows are pipelined SET..PX over the RESP
    # wire client (sources/redis_minimal) alongside the parquet state
    # table — the reference's actual cache target, best-effort like
    # its async cache write.
    redis_latest: tuple | None = None
    # Optional effectively-once stage: drop duplicate (name, timestamp)
    # frames within this event-time horizon (e.g. "10 minutes") before
    # the sinks — covers at-least-once source replays that cross epoch
    # boundaries (see dedup_frames_within). None = off (reference
    # semantics: duplicates allowed in history, postgres.go:52-58).
    dedup_horizon: str | None = None
    # Optional LIVE PostgreSQL history mirror (K1's actual target,
    # postgres.go:103-136): (host, port[, user[, database]]) — each
    # micro-batch also lands as a transactional batch INSERT over the
    # v3 wire client. Best-effort like the reference's
    # retry-then-drop (processor.go:99-101): a down database never
    # fails the epoch; the parquet history stays the exactly-once
    # record.
    pg_history: tuple | None = None
    queries: list = field(default_factory=list)
    redis_failures: int = 0  # observability: dropped cache writes
    pg_failures: int = 0     # observability: dropped PG batch inserts

    @property
    def history_path(self) -> str:
        return os.path.join(self.base_dir, "history")

    @property
    def latest_path(self) -> str:
        return os.path.join(self.base_dir, "latest")

    def _write_batch(self, batch: DataFrame, epoch_id: int) -> None:
        batch = batch.filter(F.col("timestamp") != 0)  # P2 sink guard
        batch.persist()
        try:
            spark = batch.sparkSession
            # K1: history append, idempotent per epoch — replaying a
            # crashed epoch overwrites its own partition directory
            # instead of duplicating rows.
            epoch_dir = os.path.join(self.history_path, f"epoch={int(epoch_id)}")
            if self.partition_by_date:
                (batch.withColumn(
                    "ds", F.to_date(F.timestamp_millis(F.col("timestamp"))))
                 .write.mode("overwrite").partitionBy("ds").parquet(epoch_dir))
            else:
                batch.write.mode("overwrite").parquet(epoch_dir)
            if self.pg_history is not None:
                from ..sources.connectors import pg_wire_append
                try:
                    pg_wire_append(batch, *self.pg_history)
                except Exception:
                    self.pg_failures += 1  # retry-exhausted → drop
            # K2/A1: merge latest-per-key into the state table. Only a
            # missing table (first epoch, or crash mid-swap → backup)
            # is tolerated; real IO errors propagate and fail the
            # epoch rather than silently dropping old keys.
            new_latest = latest_per_key(batch, "name", "timestamp")
            if self.redis_latest is not None:
                # best-effort like the reference's cache write (a
                # processor.go retry exhausting is LOGGED AND DROPPED,
                # at-most-once) — a down cache must not fail the epoch
                # and take the exactly-once parquet sinks with it
                from ..sources.connectors import redis_wire_latest_sink
                try:
                    redis_wire_latest_sink(
                        new_latest, self.redis_latest[0],
                        self.redis_latest[1], ttl_millis=self.ttl_millis)
                except Exception:
                    self.redis_failures += 1
            old = fs.read_with_backup(spark, self.latest_path)
            merged = new_latest if old is None else latest_per_key(
                old.select(*new_latest.columns).unionByName(new_latest),
                "name", "timestamp")
            # TTL eviction ≈ Redis EX (cache_service.go:45-52)
            horizon = F.unix_millis(F.current_timestamp()) - F.lit(self.ttl_millis)
            merged = merged.filter(F.col("timestamp") >= horizon)
            # micro-batches are sequential → one reusable staging dir
            if self.state_partitions <= 1:
                merged = merged.coalesce(1)  # ~500-key reference shape
            else:
                merged = merged.repartition(self.state_partitions,
                                            F.col("name"))
            staging = self.latest_path + ".staging"
            merged.write.mode("overwrite").parquet(staging)
            fs.atomic_swap(spark, staging, self.latest_path)
        finally:
            batch.unpersist()

    def start(self, frames: DataFrame):
        enriched = build_ingest_stream(frames, self.symbols_dim)
        if self.dedup_horizon is not None:
            enriched = dedup_frames_within(enriched, self.dedup_horizon)
        q = (
            enriched.writeStream
            .foreachBatch(self._write_batch)
            .option("checkpointLocation", os.path.join(self.base_dir, "checkpoint"))
            .trigger(processingTime=f"{self.trigger_seconds} seconds")
            .start()
        )
        self.queries.append(q)
        return q

    def metrics(self) -> dict:
        """Ingest-side gauges for the /metrics endpoint (register via
        ``registry.gauge_sources.append(pipe.metrics)``)."""
        return {"ingest_redis_dropped_writes": self.redis_failures,
                "ingest_pg_dropped_batches": self.pg_failures}

    def latest_snapshot(self) -> DataFrame:
        """S5: the cache full-scan read (cache_service.go:67-93).
        Falls back to the ``.old`` backup if a crash mid-swap left the
        live path missing (sources/fs.py::atomic_swap contract)."""
        df = fs.read_with_backup(self.spark, self.latest_path)
        if df is None:  # no write yet — surface the normal reader error
            return self.spark.read.parquet(self.latest_path)
        return df

    def history(self) -> DataFrame:
        """The append-only history table without the epoch partition
        bookkeeping column."""
        return read_history(self.spark, self.history_path)


def read_history(spark: SparkSession, history_path: str) -> DataFrame:
    """Read the epoch-partitioned history table, dropping the
    ``epoch`` bookkeeping partition column."""
    df = spark.read.parquet(history_path)
    return df.drop("epoch") if "epoch" in df.columns else df


def compact_history(spark: SparkSession, history_path: str,
                    target_partitions: int | None = None,
                    zorder_by: list[str] | None = None) -> int:
    """Compact the append-only history table's small files.

    Every micro-batch writes its own ``epoch=<id>`` directory with a
    few files; at a 2 s trigger that is ~43k files/day — the classic
    streaming-sink small-files problem that degrades scan planning and
    NameNode/liststatus at scale. This rewrites the table at
    ``target_partitions`` (default: size-based, ~128 MB per file) into
    a single ``epoch=-1`` partition via a staging directory + atomic
    rename swap (sources/fs.py — storage-agnostic, no local ``os``
    calls), preserving every row. Returns the new file count.

    ``zorder_by`` (numeric columns) additionally Z-orders the rewrite
    (sources/layout.py): the compaction shuffle it already pays becomes
    a range shuffle on the Morton code, so post-compaction files carry
    tight min/max footer stats on EVERY listed column — this is when
    layout optimization belongs in a streaming table's lifecycle
    (Delta's OPTIMIZE ZORDER BY does exactly this), since per-trigger
    micro-batches are too small to lay out well.

    Run it only while the stream is stopped with its checkpoint fully
    committed (no epoch pending replay): compaction folds epochs
    together, so a replay after compaction would re-create its epoch
    directory and duplicate those rows.
    """
    df = read_history(spark, history_path)
    if target_partitions is None:
        total_bytes = fs.total_size(spark, history_path)
        target_partitions = max(1, total_bytes // (128 * 1024 * 1024))
    staging = history_path + ".compact"
    if zorder_by:
        from ..sources.layout import bucket_rank, quantile_boundaries, z_value
        ranks = [bucket_rank(c, quantile_boundaries(df, c)) for c in zorder_by]
        df = df.withColumn("_z", z_value(ranks))
    # keep the epoch=<id> directory layout (mixing bare files and
    # partition dirs under one root breaks partition discovery); a
    # date-partitioned table likewise must KEEP ds as a partition
    # column — new epochs will write ds=<date> dirs, and a column
    # can't be partition-dir in some files and data in others.
    if "ds" in df.columns:
        # cluster by ds so each date dir gets dense files instead of
        # one sliver per (task × date); with zorder_by, range-cluster
        # (ds, z) so each date's files tile its own Z-curve
        keys = ["ds", "_z"] if zorder_by else ["ds"]
        clustered = df.repartitionByRange(int(target_partitions), *keys) \
            .sortWithinPartitions(*keys) if zorder_by \
            else df.repartition(int(target_partitions), "ds")
        writer = clustered.drop("_z").write.mode("overwrite").partitionBy("ds")
    elif zorder_by:
        writer = df.repartitionByRange(int(target_partitions), "_z") \
            .sortWithinPartitions("_z").drop("_z").write.mode("overwrite")
    else:
        writer = df.repartition(int(target_partitions)).write.mode("overwrite")
    writer.parquet(os.path.join(staging, "epoch=-1"))
    fs.atomic_swap(spark, staging, history_path)
    return len(fs.list_files(spark, history_path))


def rate_frames(spark: SparkSession, rows_per_second: int = 100,
                symbols: list[str] | None = None) -> DataFrame:
    """Synthetic wire-frame stream for smoke tests: the `rate` source
    shaped like the WS feed (SURVEY.md §2.1 S1 test strategy)."""
    symbols = symbols or ["AAPL", "MSFT", "BTCUSD", "EURUSD"]
    sym = F.array(*[F.lit(s) for s in symbols])[
        (F.col("value") % len(symbols)).cast("int")]
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second).load()
        .select(
            sym.alias("name"),
            F.unix_millis(F.col("timestamp")).alias("timestamp"),
            F.lit(None).cast("string").alias("exchange"),
            F.to_json(F.struct(F.struct(
                (F.rand(seed=42) * 100).alias("bid"),
                (F.rand(seed=43) * 100).alias("ask")).alias("data"))).alias("data"),
        )
    )
