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

DEFAULT_TTL_MILLIS = 24 * 3600 * 1000  # REDIS_TTL default 24h, config.go:37


def decode_raw_frames(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """S2: raw JSON frames → typed envelope; undecodable frames dropped
    (reference increments the `unmarshal` counter and continues,
    ingestor.go:105-110 — we observe() the drop count instead)."""
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), MARKET_DATA_SCHEMA).alias("r"))
    return parsed.filter(F.col("r").isNotNull()).select("r.*")


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
      postgres.go:52-58 — duplicates allowed, ts==0 rows skipped)
    - latest : per-symbol latest-value state table (the Redis cache,
      cache_service.go:37-61), TTL-evicted like `EX ttl`

    The two writes share one micro-batch (one scan); per-target
    idempotence replaces the reference's independent retry loops
    (processor.go:87-114). Cross-sink atomicity is still per-target —
    same as the reference — but replay-on-failure makes it
    effectively-once instead of at-most-once.
    """

    spark: SparkSession
    base_dir: str
    symbols_dim: DataFrame
    ttl_millis: int = DEFAULT_TTL_MILLIS
    trigger_seconds: int = 2  # FLUSH_INTERVAL default, config.go:38
    queries: list = field(default_factory=list)

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
            # K1: transactional-append history (atomic per micro-batch)
            batch.write.mode("append").parquet(self.history_path)
            # K2/A1: merge latest-per-key into the state table
            new_latest = latest_per_key(batch, "name", "timestamp")
            spark = batch.sparkSession
            try:
                old = spark.read.parquet(self.latest_path)
            except Exception:
                old = None
            merged = new_latest if old is None else latest_per_key(
                old.select(*new_latest.columns).unionByName(new_latest),
                "name", "timestamp")
            # TTL eviction ≈ Redis EX (cache_service.go:45-52)
            horizon = F.unix_millis(F.current_timestamp()) - F.lit(self.ttl_millis)
            merged = merged.filter(F.col("timestamp") >= horizon)
            # micro-batches are sequential → one reusable staging dir
            tmp = self.latest_path + ".staging"
            merged.coalesce(1).write.mode("overwrite").parquet(tmp)
            final = spark.read.parquet(tmp)
            final.write.mode("overwrite").parquet(self.latest_path)
        finally:
            batch.unpersist()

    def start(self, frames: DataFrame):
        enriched = build_ingest_stream(frames, self.symbols_dim)
        q = (
            enriched.writeStream
            .foreachBatch(self._write_batch)
            .option("checkpointLocation", os.path.join(self.base_dir, "checkpoint"))
            .trigger(processingTime=f"{self.trigger_seconds} seconds")
            .start()
        )
        self.queries.append(q)
        return q

    def latest_snapshot(self) -> DataFrame:
        """S5: the cache full-scan read (cache_service.go:67-93)."""
        return self.spark.read.parquet(self.latest_path)


def compact_history(spark: SparkSession, history_path: str,
                    target_partitions: int | None = None) -> int:
    """Compact the append-only history table's small files.

    Every micro-batch appends a few files; at a 2 s trigger that is
    ~43k files/day — the classic streaming-sink small-files problem
    that degrades scan planning and NameNode/liststatus at scale. This
    rewrites the table at ``target_partitions`` (default: size-based,
    ~128 MB per file) via a staging directory, preserving every row
    (append-only ⇒ a plain rewrite is safe; run it between micro-batch
    windows or on a snapshot copy). Returns the new file count.
    """
    import shutil

    df = spark.read.parquet(history_path)
    if target_partitions is None:
        total_bytes = sum(
            f.stat().st_size for f in __import__("pathlib").Path(history_path).rglob("*.parquet"))
        target_partitions = max(1, total_bytes // (128 * 1024 * 1024))
    staging = history_path + ".compact"
    df.repartition(int(target_partitions)).write.mode("overwrite").parquet(staging)
    backup = history_path + ".old"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(history_path, backup)
    os.rename(staging, history_path)
    shutil.rmtree(backup, ignore_errors=True)
    return len(list(__import__("pathlib").Path(history_path).glob("*.parquet")))


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
