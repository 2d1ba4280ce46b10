"""Pinned-cache registry for operator-internal persists.

Operators like ``minhash_near_dup_pairs`` persist small intermediates
(shingle and signature tables) that several downstream joins reuse
within one query execution. Those handles used to leak: in a
long-lived session repeated invocations accumulated cached blocks
until the executor store filled (bench.py worked around it with a
blanket ``catalog.clearCache()``).

``pin`` persists and registers the handle; ``release_pinned``
unpersists everything registered since the last release. Callers that
run many queries in one session (benchmarks, services, notebooks)
call ``release_pinned()`` after each consuming action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register the handle for later release."""
    df.persist()
    _PINNED.append(df)
    return df


def release_pinned() -> int:
    """Unpersist every pinned DataFrame; returns how many were released."""
    n = 0
    while _PINNED:
        _PINNED.pop().unpersist()
        n += 1
    return n
