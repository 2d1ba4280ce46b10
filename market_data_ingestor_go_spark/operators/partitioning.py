"""Input-size-aware rebalancing for narrow local inputs.

Several operators (shingling, simhash, embedding signatures) do
explode-then-aggregate work whose scan arrives as ONE split for a
small single-file table. Round-1/2 spread those with a fixed
``repartition(defaultParallelism)`` — which over-shards small inputs:
at 32 partitions a 0.6 MB corpus pays 32 task launches + 32 wide-agg
buffer setups per stage for ~8 k rows of work each (measured: the
64-column simhash aggregate runs 2.2 s at 32 partitions vs 0.9 s at
4-8 for the sf0.1 fixture — task overhead, not compute).

``spread`` derives the partition count from the INPUT BYTES instead:

- a real table whose scan already has >= parallelism splits is left
  untouched (at 100 TB the scan is the parallelism — repartitioning
  it would be a pure extra shuffle);
- a narrow input is rebalanced to ~bytes_per_partition of compressed
  input per task, capped at defaultParallelism.

This is the same sizing rule a cluster job would express through
``spark.sql.files.maxPartitionBytes`` — applied at the operator level
because these operators' work is per-token (explode fan-out), so the
right granularity is much finer than the scan default of 128 MB.

Quadratic-work probe sides (all-pairs joins) deliberately do NOT use
this: their work scales with n², not input bytes, so they keep the
full-core fan-out.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def spread(df: DataFrame, bytes_per_partition: int = 96 * 1024,
           min_partitions: int = 4) -> DataFrame:
    """Rebalance a narrow file-backed input for explode-heavy work."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        # non-file source (createDataFrame, stream) — size unknown
        return df.repartition(par)
    if len(files) >= par:
        return df  # the scan is already parallel; don't re-shuffle it
    try:
        total = sum(os.path.getsize(f.split("://", 1)[-1]) for f in files)
    except OSError:
        return df.repartition(par)  # non-local FS — size unknown
    if total >= par * 4 * 1024 * 1024:
        # big enough that the parquet scan itself splits to >= par
        # tasks (split = max(openCostInBytes≈4MB, total/par)): let the
        # scan parallelize, never re-shuffle a large table just to
        # rebalance
        return df
    n = max(min_partitions, min(par, round(total / bytes_per_partition)))
    return df.repartition(n)
