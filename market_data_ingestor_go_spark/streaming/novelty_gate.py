"""Streaming n-gram novelty gate (round 10, SURVEY.md §2.11).

The streaming twin of ``doc_ngram_novelty``: batch answers "how novel
is every corpus document against the reference/eval n-gram set"; an
ingest pipeline needs the online form — score each ARRIVING document
within one trigger and flag the ones assembled from reference phrases
(novelty below the floor ⇒ an eval-set leak or boilerplate — the
decontamination filter applied at the door, next to the dedup / LM /
boilerplate / contamination gates).

Design (scale posture first):

- The reference n-gram set is built ONCE at gate construction
  (``operators/lm_quality.py::reference_shingles`` — eval corpora are
  bounded by definition) and persisted as the broadcast side of every
  micro-batch probe. The gate holds NO growing state: novelty is a
  property of the document against a fixed reference, so batches are
  independent by construction (the LM/contamination-gate
  statelessness argument; contrast the Bloom-history boilerplate
  gate).
- Scoring reuses the EXACT batch Column algebra
  (``novelty_against``), so a streamed document's (n_shingles,
  n_seen, novelty) row is bit-identical to the batch operator's —
  asserted across micro-batch splits in tests.
- Flag rule: ``novelty < lo_novelty`` ⇒ flagged (suspected leak /
  reference-derived boilerplate); documents with < n tokens yield no
  shingles — no denominator exists — and are flagged UNSCORABLE
  (null novelty) rather than silently dropped: a gate must account
  for every document it saw.
- Audit rows land in an epoch-partitioned parquet table with
  mode=overwrite per epoch — the idempotent-replay contract shared by
  every sink in this package (a crashed epoch re-scores identically:
  the reference is static and the score is deterministic).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.lm_quality import novelty_against, reference_shingles
from .audit import audit_layout


@dataclass
class NoveltyGate:
    """foreachBatch novelty scorer against a fixed reference n-gram
    set. ``reference`` must expose (id_col, text_col); ``audit_path``
    is the epoch-partitioned parquet table of scores."""

    reference: DataFrame
    audit_path: str
    n: int = 3
    text_col: str = "text"
    id_col: str = "doc_id"
    lo_novelty: float = 0.5
    trigger_seconds: int = 2
    # audit file layout: None = the batch's own parallelism (the
    # gate audits EVERY scored doc per epoch — never one task);
    # fixture tests pass 1 (streaming/audit.py)
    audit_partitions: int | None = None
    docs_scored: int = 0
    docs_flagged: int = 0
    epochs: int = 0
    queries: list = field(default_factory=list)

    def __post_init__(self) -> None:
        # bounded (module doc) — persist and materialize BEFORE the
        # stream starts so the reference shingle aggregate never runs
        # inside a trigger (the lm_gate lesson)
        self._ref_sh = reference_shingles(
            self.reference, self.n, self.text_col).persist()
        self._ref_sh.count()

    def score_batch(self, batch_docs: DataFrame) -> DataFrame:
        """(doc_id, n_shingles, n_seen, novelty, flagged) — identical
        Column algebra to the batch operator; docs without shingles
        (< n tokens or NULL text) carry null counts and flag as
        unscorable."""
        scored = novelty_against(batch_docs, self._ref_sh, self.n,
                                 self.text_col, self.id_col)
        ids = batch_docs.select(F.col(self.id_col).alias("doc_id"))
        return (ids.join(scored, "doc_id", "left")
                .withColumn("flagged",
                            F.when(F.col("novelty").isNull(), F.lit(True))
                            .otherwise(F.col("novelty")
                                       < F.lit(self.lo_novelty))))

    def _gate_batch(self, batch: DataFrame, epoch_id: int) -> None:
        out = self.score_batch(batch)
        epoch_dir = os.path.join(self.audit_path, f"epoch={int(epoch_id)}")
        audit_layout(out, self.audit_partitions)\
            .write.mode("overwrite").parquet(epoch_dir)
        # counters are observability only — the audit table is the
        # source of truth (replay double-counts here, like the other
        # gates; documented trade). One read-back job for both counts.
        r = (self.reference.sparkSession.read.parquet(epoch_dir)
             .agg(F.count("*").alias("n"),
                  F.sum(F.col("flagged").cast("int")).alias("nf")).first())
        self.docs_scored += r["n"]
        self.docs_flagged += int(r["nf"] or 0)
        self.epochs += 1

    def attach(self, doc_stream: DataFrame, checkpoint_dir: str):
        q = (doc_stream.writeStream
             .foreachBatch(self._gate_batch)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(processingTime=f"{self.trigger_seconds} seconds")
             .start())
        self.queries.append(q)
        return q

    def scores(self) -> DataFrame:
        """The audit table across all epochs."""
        df = self.reference.sparkSession.read.parquet(self.audit_path)
        return df.drop("epoch") if "epoch" in df.columns else df

    def metrics(self) -> dict:
        return {"novelty_gate_docs_scored": self.docs_scored,
                "novelty_gate_docs_flagged": self.docs_flagged,
                "novelty_gate_epochs": self.epochs}

    def stop(self) -> None:
        for q in self.queries:
            if q.isActive:
                q.stop()
        self._ref_sh.unpersist()
