"""Streaming train/test contamination gate (round 5, SURVEY.md §2.11).

The batch operator ``operators/dedup.py::cross_corpus_near_dup`` is
the eval-integrity check every LLM pipeline runs BEFORE training; this
module composes the same MinHash+banding+verify machinery with
Structured Streaming so a held-out document leaking into the ingest
stream is flagged within one trigger — before it lands in a training
shard, not in a post-hoc audit.

Design (scale posture first):

- The held-out corpus is static and small by nature (an eval set), so
  its shingle sets and banded signatures are computed ONCE at gate
  construction, persisted, and explicitly ``F.broadcast`` on both the
  candidate join and the verification join — each micro-batch does
  batch-side work only, with zero shuffle of the held-out side and no
  state store (the gate is stateless across batches by construction:
  contamination is a property of (batch doc, held-out doc) pairs).
- Flags land in an epoch-partitioned parquet table with
  mode=overwrite per epoch — the same idempotent-replay contract as
  the ingest history sink (streaming/pipeline.py), so a crashed epoch
  re-flags instead of duplicating flags.
- Counters (docs checked / flagged / epochs) are plain Python state on
  the gate, exported via ``metrics()`` for the /metrics endpoint
  exactly like ``IngestPipeline.metrics``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .audit import audit_layout
from ..operators.dedup import (banded_signatures, minhash_signatures,
                               shingle_df)


@dataclass
class ContaminationGate:
    """foreachBatch gate: flag stream documents near-duplicating a
    broadcast held-out corpus.

    ``heldout`` must expose (id_col, text_col). ``flags_path`` is the
    epoch-partitioned parquet table of hits
    (doc_id, heldout_id, jacc, epoch=<id>).
    """

    heldout: DataFrame
    flags_path: str
    text_col: str = "text"
    id_col: str = "doc_id"
    n: int = 3
    threshold: float = 0.6
    num_perms: int = 128
    num_bands: int = 32
    trigger_seconds: int = 2
    # audit file layout: None = the batch's own parallelism;
    # fixture tests pass 1 (streaming/audit.py)
    audit_partitions: int | None = None
    docs_checked: int = 0
    docs_flagged: int = 0
    epochs: int = 0
    queries: list = field(default_factory=list)

    def __post_init__(self) -> None:
        rows_per_band = self.num_perms // self.num_bands
        # static side, computed once: shingles for verification,
        # banded signatures for candidate generation — both persisted
        # (an eval set is tiny next to the stream; at 100 TB of stream
        # these stay the broadcast side of every join)
        sh = shingle_df(self.heldout, self.text_col, self.id_col, self.n)
        self._held_sh = sh.select(F.col("id").alias("h_id"),
                                  F.col("sh").alias("sh_b")).persist()
        self._held_banded = (
            banded_signatures(minhash_signatures(sh, self.num_perms),
                              self.num_bands, rows_per_band)
            .select(F.col("id").alias("h_id"), "band", "bh").persist())
        self._held_banded.count()  # materialize before the stream starts

    def check_batch(self, batch_docs: DataFrame) -> DataFrame:
        """Batch-side MinHash → banded equi-join against the broadcast
        held-out bands → exact-Jaccard verification. Returns
        (doc_id, heldout_id, jacc) hits ≥ threshold."""
        rows_per_band = self.num_perms // self.num_bands
        sa = shingle_df(batch_docs, self.text_col, self.id_col, self.n)
        sa = sa.persist()  # feeds signatures once + verification once
        banded_a = banded_signatures(
            minhash_signatures(sa, self.num_perms),
            self.num_bands, rows_per_band)
        cand = (
            banded_a.join(F.broadcast(self._held_banded), ["band", "bh"])
            .select(F.col("id").alias("a_id"), "h_id").distinct())
        va = sa.select(F.col("id").alias("a_id"), F.col("sh").alias("sh_a"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        return (
            cand.join(va, "a_id").join(F.broadcast(self._held_sh), "h_id")
            .select(F.col("a_id").alias("doc_id"),
                    F.col("h_id").alias("heldout_id"),
                    (inter.cast("double") / union.cast("double")).alias("jacc"))
            .filter(F.col("jacc") >= F.lit(self.threshold)))

    def _gate_batch(self, batch: DataFrame, epoch_id: int) -> None:
        batch = batch.persist()
        try:
            hits = self.check_batch(batch).persist()
            n_hits = hits.count()
            epoch_dir = os.path.join(self.flags_path, f"epoch={int(epoch_id)}")
            audit_layout(hits, self.audit_partitions)\
                .write.mode("overwrite").parquet(epoch_dir)
            self.docs_checked += batch.count()
            self.docs_flagged += n_hits
            self.epochs += 1
            hits.unpersist()
        finally:
            batch.unpersist()

    def attach(self, doc_stream: DataFrame, checkpoint_dir: str):
        """Run the gate over a streaming document source."""
        q = (doc_stream.writeStream
             .foreachBatch(self._gate_batch)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(processingTime=f"{self.trigger_seconds} seconds")
             .start())
        self.queries.append(q)
        return q

    def flags(self, spark) -> DataFrame:
        """The accumulated contamination table (epoch column dropped)."""
        df = spark.read.parquet(self.flags_path)
        return df.drop("epoch") if "epoch" in df.columns else df

    def metrics(self) -> dict:
        """Gauges for the /metrics endpoint (register via
        ``registry.gauge_sources.append(gate.metrics)``)."""
        return {"contamination_docs_checked": self.docs_checked,
                "contamination_docs_flagged": self.docs_flagged,
                "contamination_epochs": self.epochs}

    def stop(self) -> None:
        for q in self.queries:
            q.stop()
        self._held_sh.unpersist()
        self._held_banded.unpersist()
