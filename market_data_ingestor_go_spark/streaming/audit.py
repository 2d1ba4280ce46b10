"""Shared audit-write layout for the streaming gates.

Every gate lands its per-epoch audit rows under an epoch partition
(idempotent replay). Pre-r11 each write funneled through
``coalesce(1)`` — fine for flag-only tables, but the novelty and LM
gates audit EVERY scored document per epoch, and at real ingest
throughput one task then serializes the whole micro-batch's output
each trigger. ``audit_layout`` makes the file layout a knob:

- ``n=None`` (the default every gate now uses): keep the batch's own
  parallelism — the write fans out exactly as wide as the scoring
  did, no extra exchange either way.
- ``n=<int>``: coalesce to that many files (fixture-sized tests pass
  1 to keep single-file outputs; a production table might pick a
  small multiple of the trigger's expected volume).

Replay idempotence is unaffected — mode=overwrite per epoch directory
replaces ALL files of that epoch regardless of how many there are
(pinned by the gates' replay tests, which now run with >1 file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def audit_layout(df: DataFrame, n: int | None) -> DataFrame:
    """Apply the audit-file-layout knob: coalesce to ``n`` files, or
    keep the batch's parallelism when ``n`` is None."""
    return df.coalesce(n) if n else df
