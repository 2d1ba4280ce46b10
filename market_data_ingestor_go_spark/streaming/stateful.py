"""Custom stateful streaming operator — latest-per-key with TTL as
``applyInPandasWithState`` (SURVEY.md §2.10: the engine's arbitrary-
stateful surface; the declarative twin lives in operators/latest.py).

This is the continuous version of the Redis latest-value cache
(cache_service.go:37-61): per symbol, keep the max-timestamp record,
emit an update whenever it changes, and let the state die after the
TTL with no fresh writes (Redis ``EX``; ProcessingTimeTimeout here).

When to prefer which:
- ``latest_per_key`` (max_by agg) — bounded key spaces, snapshot
  semantics per micro-batch; cheapest, fully declarative.
- this operator — per-key *update stream* semantics (emit only on
  change) or custom eviction logic; state lives in the state store,
  scales with distinct keys, partitioned by the grouping key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType([
    T.StructField("timestamp", T.LongType()),
    T.StructField("exchange", T.StringType()),
    T.StructField("data", T.StringType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("timestamp", T.LongType()),
    T.StructField("exchange", T.StringType()),
    T.StructField("data", T.StringType()),
])

DEFAULT_TTL_MILLIS = 24 * 3600 * 1000


def _make_update_latest(ttl_millis: int):
    """Build the per-key update function as a CLOSURE so cloudpickle
    serializes it by value — Spark's python workers don't have this
    package on their import path when the driver runs from another cwd
    (a module-level function would pickle by reference and fail with
    ModuleNotFoundError on the worker).

    Semantics: timestamp-max last-write-wins; emits a row only when the
    stored latest record changes. TTL is enforced lazily: a stored
    record older than the TTL is discarded before merging (Redis EX
    approximated; keys that never see new data are filtered by readers
    — serve-path snapshots apply the TTL predicate anyway).
    """

    def update_latest(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
                      ) -> Iterator[pd.DataFrame]:
        import time as _time

        import pandas as _pd

        name = key[0]
        best_ts, best_ex, best_data = state.get if state.exists else (0, None, None)
        now_ms = int(_time.time() * 1000)
        if best_ts and best_ts < now_ms - ttl_millis:
            best_ts, best_ex, best_data = 0, None, None  # lazy TTL eviction
        changed = False
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                ts = int(row["timestamp"])
                if ts == 0:  # P2 sink guard (cache_service.go:41-43)
                    continue
                if ts > best_ts:
                    best_ts, best_ex, best_data = ts, row["exchange"], row["data"]
                    changed = True
        if changed:
            state.update((best_ts, best_ex, best_data))
            yield _pd.DataFrame([{"name": name, "timestamp": best_ts,
                                  "exchange": best_ex, "data": best_data}])

    return update_latest


def streaming_latest_state(stream: DataFrame) -> DataFrame:
    """stream(name,timestamp,exchange,data) → change-stream of latest
    records per symbol.

    NOTE on eviction: this build of Spark (4.1.2 local) deadlocks any
    ``applyInPandasWithState`` query using ``ProcessingTimeTimeout``
    (the timeout-processing pass hangs the state commit; reproduced
    with a trivial no-op function — upstream bug, not this operator),
    so the operator runs with ``NoTimeout`` and enforces the 24 h TTL
    lazily inside the update function. On a cluster build where the
    timeout path works, switch ``timeoutConf`` back and drop state via
    ``state.remove()`` on ``hasTimedOut``.
    """
    return (
        stream.groupBy("name")
        .applyInPandasWithState(
            _make_update_latest(DEFAULT_TTL_MILLIS),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
