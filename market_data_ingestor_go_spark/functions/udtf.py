"""Python UDTF surface (SURVEY.md §2.10) — table functions that fan one
row out to many, registered via Spark 4's native UDTF API.

The reference has no UDFs at all; this engine exposes the full PySpark
surface and uses it where row-multiplicity makes scalar functions
awkward. Example shipped: ``split_passages`` — chunk a document into
overlapping token-window passages, the standard pre-embedding step in
an LLM data pipeline.

Scale posture: UDTFs run row-at-a-time in the Python worker — fine for
low-volume fan-out (each doc → a handful of passages) but the wrong
tool for per-token work; the shingling/minhash operators stay in JVM
expressions for exactly that reason. The class is defined so it pickles
by value (no module import needed on workers).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

try:
    from pyspark.sql.functions import udtf
    _HAS_UDTF = True
except ImportError:  # pragma: no cover - older pyspark
    _HAS_UDTF = False


def make_split_passages(window: int = 32, stride: int = 24):
    """Build the passage-splitting UDTF: yields (passage_idx, n_tokens,
    passage) rows per input document."""
    if not _HAS_UDTF:  # pragma: no cover
        raise NotImplementedError("this pyspark build lacks the UDTF API")

    @udtf(returnType="passage_idx INT, n_tokens INT, passage STRING")
    class SplitPassages:
        def eval(self, text: str):
            if not text:
                return
            toks = text.split()
            idx = 0
            start = 0
            while start < len(toks):
                chunk = toks[start:start + window]
                yield idx, len(chunk), " ".join(chunk)
                if start + window >= len(toks):
                    break
                start += stride
                idx += 1

    return SplitPassages


def register_udtfs(spark: SparkSession, window: int = 32, stride: int = 24) -> bool:
    """Register ``split_passages`` for SQL use:
    ``SELECT p.* FROM documents, LATERAL split_passages(text) p``."""
    if not _HAS_UDTF:
        return False
    spark.udtf.register("split_passages", make_split_passages(window, stride))
    return True
