"""Streaming repetition-quality gate (round 11, SURVEY.md §2.11).

The streaming twin of ``doc_repetition_signals``: batch answers "how
repetitive is every corpus document"; an ingest pipeline needs the
online form — score each ARRIVING document within one trigger and
flag the ones past the Gopher cutoffs (Rae et al. 2021, Table A1),
next to the dedup / boilerplate / LM / novelty / contamination gates.

Design (scale posture first):

- The gate is fully STATELESS: repetition is an intrinsic per-doc
  property, so micro-batches are independent by construction (the
  LM/contamination-gate statelessness argument, with no model side
  at all — there is nothing to train, broadcast, or persist).
- Scoring reuses the EXACT batch operator
  (``operators/lm_quality.py::repetition_signals``), so a streamed
  document's signals are bit-identical to the batch operator's —
  asserted across micro-batch splits in tests.
- Flag rule = any signal past its threshold. Defaults are the Gopher
  paper's published cutoffs for the signals the default column set
  computes: dup_line_frac > 0.30, dup_line_char_frac > 0.20,
  top2gram_char_frac > 0.20, top3gram_char_frac > 0.18,
  dup5gram_char_frac > 0.15. ``thresholds`` keys must name columns
  the configured (top_ns, dup_ns) actually produce — checked loudly
  at construction, not silently never-matched.
- Audit rows land in an epoch-partitioned parquet table with
  mode=overwrite per epoch — the idempotent-replay contract shared
  by every sink in this package (a crashed epoch re-scores
  identically: the signals are deterministic functions of the doc).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.lm_quality import repetition_signals
from .audit import audit_layout

GOPHER_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top2gram_char_frac": 0.20,
    "top3gram_char_frac": 0.18,
    "dup5gram_char_frac": 0.15,
}


@dataclass
class RepetitionGate:
    """foreachBatch Gopher-repetition scorer. ``audit_path`` is the
    epoch-partitioned parquet table of per-doc signals + flag."""

    audit_path: str
    text_col: str = "text"
    id_col: str = "doc_id"
    top_ns: tuple = (2, 3)
    dup_ns: tuple = (5,)
    thresholds: dict = field(
        default_factory=lambda: dict(GOPHER_THRESHOLDS))
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
        if not self.thresholds:
            raise ValueError(
                "thresholds must name at least one signal column — an "
                "empty gate flags nothing and score_batch would crash "
                "folding zero predicates")
        produced = ({"dup_line_frac", "dup_line_char_frac"}
                    | {f"top{n}gram_char_frac" for n in self.top_ns}
                    | {f"dup{n}gram_char_frac" for n in self.dup_ns})
        unknown = set(self.thresholds) - produced
        if unknown:
            raise ValueError(
                f"thresholds name columns the configured top_ns="
                f"{self.top_ns}/dup_ns={self.dup_ns} never produce: "
                f"{sorted(unknown)} (would silently never flag)")

    def score_batch(self, batch_docs: DataFrame) -> DataFrame:
        """Batch-identical signals plus the any-threshold flag."""
        scored = repetition_signals(
            batch_docs, self.text_col, self.id_col,
            self.top_ns, self.dup_ns)
        over = [F.col(c) > F.lit(t) for c, t in self.thresholds.items()]
        flag = over[0]
        for o in over[1:]:
            flag = flag | o
        return scored.withColumn("flagged", flag)

    def _gate_batch(self, batch: DataFrame, epoch_id: int) -> None:
        out = self.score_batch(batch)
        epoch_dir = os.path.join(self.audit_path, f"epoch={int(epoch_id)}")
        audit_layout(out, self.audit_partitions)\
            .write.mode("overwrite").parquet(epoch_dir)
        # counters are observability only — the audit table is the
        # source of truth (replay double-counts here, like the other
        # gates; documented trade). One read-back job for both counts.
        r = (batch.sparkSession.read.parquet(epoch_dir)
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

    def scores(self, spark) -> DataFrame:
        """The audit table across all epochs."""
        df = spark.read.parquet(self.audit_path)
        return df.drop("epoch") if "epoch" in df.columns else df

    def metrics(self) -> dict:
        return {"repetition_gate_docs_scored": self.docs_scored,
                "repetition_gate_docs_flagged": self.docs_flagged,
                "repetition_gate_epochs": self.epochs}

    def stop(self) -> None:
        for q in self.queries:
            if q.isActive:
                q.stop()
