"""Streaming span-scrub gate (round 11, SURVEY.md §2.11).

The streaming twin of ``eval_leak_scrub``: batch rewrites every
corpus document with its eval-leaked spans removed; an ingest
pipeline wants that applied AT THE DOOR — each arriving document is
scrubbed within one trigger, so leaked passages never land in the
training corpus at all (the decontamination TRANSFORM next to the
flag-only novelty/contamination gates: those mark, this one acts).

Design (scale posture first):

- The reference WINDOW set is built ONCE at gate construction
  (``operators/dedup.py::reference_windows`` — eval corpora are
  bounded by definition) and persisted as the broadcast side of
  every micro-batch's marking join. The gate holds NO growing state:
  the scrub is a property of the document against a fixed reference,
  so batches are independent by construction (the novelty-gate
  statelessness argument).
- Scrubbing reuses the EXACT batch operator
  (``scrub_leaked_spans`` with the precomputed ``ref_windows``), so
  a streamed document's (status, n_spans, tokens_removed,
  n_tokens_kept, text) row is bit-identical to the batch transform's
  — asserted across micro-batch splits in tests.
- Every document the gate saw is accounted for: 'clean' rows pass
  through with original text verbatim, 'scrubbed' rows carry the
  token-exact survivor reconstruction, fully-leaked docs land as
  'dropped' rows with NULL text — the row IS the audit record, and
  downstream consumes ``text IS NOT NULL``.
- Audit rows land in an epoch-partitioned parquet table with
  mode=overwrite per epoch — the idempotent-replay contract shared
  by every sink in this package (a crashed epoch re-scrubs
  identically: the reference is static and the span algebra is
  deterministic). File layout follows the r11 ``audit_partitions``
  knob (streaming/audit.py): the gate rewrites EVERY doc per epoch,
  so the default keeps the batch's parallelism.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import reference_windows, scrub_leaked_spans
from .audit import audit_layout


@dataclass
class ScrubGate:
    """foreachBatch span-scrubber against a fixed reference window
    set. ``reference`` must expose (id_col, text_col); ``audit_path``
    is the epoch-partitioned parquet table of scrub-output rows
    (clean + scrubbed + dropped — the full accounting)."""

    reference: DataFrame
    audit_path: str
    w: int = 8
    text_col: str = "text"
    id_col: str = "doc_id"
    trigger_seconds: int = 2
    # audit file layout: None = the batch's own parallelism (the
    # gate rewrites EVERY doc per epoch — never one task);
    # fixture tests pass 1 (streaming/audit.py)
    audit_partitions: int | None = None
    docs_seen: int = 0
    docs_scrubbed: int = 0
    docs_dropped: int = 0
    epochs: int = 0
    queries: list = field(default_factory=list)

    def __post_init__(self) -> None:
        # bounded (module doc) — persist and materialize BEFORE the
        # stream starts so the reference window aggregate never runs
        # inside a trigger (the novelty/lm-gate lesson)
        self._ref_wins = reference_windows(
            self.reference, self.w, self.text_col,
            self.id_col).persist()
        self._ref_wins.count()

    def scrub_batch(self, batch_docs: DataFrame) -> DataFrame:
        """(doc_id, status, n_spans, tokens_removed, n_tokens_kept,
        text) — identical span algebra to the batch operator; every
        doc of the batch appears exactly once."""
        return scrub_leaked_spans(batch_docs, None, w=self.w,
                                  text_col=self.text_col,
                                  id_col=self.id_col,
                                  ref_windows=self._ref_wins)

    def _gate_batch(self, batch: DataFrame, epoch_id: int) -> None:
        out = self.scrub_batch(batch)
        epoch_dir = os.path.join(self.audit_path, f"epoch={int(epoch_id)}")
        audit_layout(out, self.audit_partitions) \
            .write.mode("overwrite").parquet(epoch_dir)
        # counters are observability only — the audit table is the
        # source of truth (replay double-counts here, like the other
        # gates; documented trade). One read-back job for all counts.
        r = (self.reference.sparkSession.read.parquet(epoch_dir)
             .agg(F.count("*").alias("n"),
                  F.sum((F.col("status") == "scrubbed").cast("int"))
                  .alias("ns"),
                  F.sum((F.col("status") == "dropped").cast("int"))
                  .alias("nd")).first())
        self.docs_seen += r["n"]
        self.docs_scrubbed += int(r["ns"] or 0)
        self.docs_dropped += int(r["nd"] or 0)
        self.epochs += 1

    def attach(self, doc_stream: DataFrame, checkpoint_dir: str):
        q = (doc_stream.writeStream
             .foreachBatch(self._gate_batch)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(processingTime=f"{self.trigger_seconds} seconds")
             .start())
        self.queries.append(q)
        return q

    def scrubbed(self) -> DataFrame:
        """The audit table across all epochs (every doc seen; the
        surviving corpus is ``text IS NOT NULL``)."""
        df = self.reference.sparkSession.read.parquet(self.audit_path)
        return df.drop("epoch") if "epoch" in df.columns else df

    def metrics(self) -> dict:
        return {"scrub_gate_docs_seen": self.docs_seen,
                "scrub_gate_docs_scrubbed": self.docs_scrubbed,
                "scrub_gate_docs_dropped": self.docs_dropped,
                "scrub_gate_epochs": self.epochs}

    def stop(self) -> None:
        for q in self.queries:
            if q.isActive:
                q.stop()
        self._ref_wins.unpersist()
