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

The registry is THREAD-LOCAL: a query built and released on the serve
ticker thread can never unpersist pins created concurrently by another
driver thread (e.g. a dedup job running beside the publisher). Pin and
release must therefore happen on the same thread — which is already
the registry's contract (release after *your* consuming action).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCAL = threading.local()


def _pins() -> list[DataFrame]:
    pins = getattr(_LOCAL, "pins", None)
    if pins is None:
        pins = _LOCAL.pins = []
    return pins


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register the handle for later release."""
    df.persist()
    _pins().append(df)
    return df


def release_pinned() -> int:
    """Unpersist every DataFrame pinned ON THIS THREAD; returns how
    many were released."""
    pins = _pins()
    n = 0
    while pins:
        pins.pop().unpersist()
        n += 1
    return n
