"""Skew-handling aggregation — the salting pattern for hot keys.

At 100 TB a symbol-keyed market stream is Zipfian: a handful of hot
symbols (indexes, BTC) dominate. A plain ``groupBy(key)`` sends every
hot-key row to one reducer. Two mitigations ship here:

1. AQE skew handling (on by default in session.py) — splits skewed
   *join* partitions at runtime.
2. ``salted_agg`` — two-phase aggregation for *group-bys* whose
   per-key state is algebraic: phase 1 groups on (key, salt) spreading
   each hot key over N reducers, phase 2 merges the partials. For
   sums/counts/min/max the result is exactly the plain groupBy (the
   oracle-checked query `skew_salted_agg` proves it); for avg the
   merge carries (sum, count) pairs.

Note Spark already does map-side partial aggregation, which handles
most skew for algebraic aggs; explicit salting matters when the
reduce-side state itself is the bottleneck (huge distinct keys per
reducer, or memory-heavy buffers like collect_list/HLL at high
cardinality per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt (no RNG — reruns over the same input layout
    produce identical partitioning) that spreads even *identical* rows.

    A content-only hash would put every repeat of a hot tick (same
    symbol, same price — the typical hot-key shape) in one salt
    bucket, defeating the spread. Mixing in the per-row position
    (``monotonically_increasing_id`` = partition id ⟪33 + row index)
    round-robins duplicates across buckets while staying fully
    deterministic for a fixed input partitioning.
    """
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))


def salted_agg(df: DataFrame, key_cols: list[str], n_salts: int = 16,
               **aggs: tuple[str, str]) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name → (function, column) with function in
    {sum, count, min, max}. Example::

        salted_agg(li, ["l_returnflag"], 16,
                   total_qty=("sum", "l_quantity"),
                   n_rows=("count", "*"))
    """
    phase1_exprs = []
    phase2_exprs = []
    for out, (fn, col) in aggs.items():
        part = f"_p_{out}"
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(part))
            phase2_exprs.append(F.sum(part).alias(out))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(part))
            phase2_exprs.append(F.sum(part).alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(part))
            phase2_exprs.append(F.min(part).alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(part))
            phase2_exprs.append(F.max(part).alias(out))
        else:
            raise ValueError(f"unsupported salted agg fn: {fn}")
    salted = with_salt(df, n_salts)
    partials = salted.groupBy(*key_cols, "_salt").agg(*phase1_exprs)
    return partials.groupBy(*key_cols).agg(*phase2_exprs)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skewed equi-join: salt the big side, REPLICATE the small side.

    The remaining skew case once broadcast (small dim) and AQE skew
    splitting (handles most shuffle-join skew) are both off the table:
    a medium-sized build side too big to broadcast joined against a
    Zipf-hot probe side. Each big-side row gets one of ``n_salts``
    deterministic salts; every small-side row is exploded into all
    ``n_salts`` (a bounded ×n blowup of the SMALL side only), and the
    join runs on (key, salt) — a hot key's rows now land on ``n_salts``
    reducers instead of one. Row-for-row identical to the plain join
    (asserted in tests); supports inner and left joins (right/outer
    would duplicate unmatched small-side rows across salts).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got: {how}")
    b = with_salt(big, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))) \
        .withColumn("_salt", F.col("_salt").cast("long"))  # match pmod type
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def skew_report(df: DataFrame, key_cols: list[str] | str,
                top_k: int = 10,
                target_rows_per_task: int = 1_000_000) -> DataFrame:
    """Skew diagnostic for a prospective groupBy/join key: per-key row
    counts for the top-k heaviest keys, each key's share of the
    table, its ratio to the MEAN key size (the skew factor AQE's
    thresholds reason about), and the salt factor that would bring
    the key under ``target_rows_per_task`` — the number to pass to
    ``salted_agg``/``salted_join``.

    One aggregate + a top-k over the (small) per-key count table; run
    it on a sample at 100 TB (counts scale linearly, ratios don't
    care). The decision rule: salt when the report's max skew factor
    is >> AQE's skewedPartitionFactor and one key alone exceeds a
    task's budget — salting below that just pays the extra merge.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n_rows"))
    from .cache import pin
    counts = pin(counts)
    tot = counts.agg(F.sum("n_rows").alias("t"),
                     F.count("*").alias("k")).first()
    if not tot["k"]:  # empty input: empty report, not a TypeError
        return (counts.select(*key_cols, "n_rows",
                              F.lit(0.0).alias("share"),
                              F.lit(0.0).alias("skew_factor"),
                              F.lit(1).alias("suggested_salts"))
                .limit(0))
    total, n_keys = int(tot["t"]), int(tot["k"])
    mean = total / n_keys
    return (counts.orderBy(F.col("n_rows").desc(), *key_cols)
            .limit(top_k)
            .select(*key_cols, "n_rows",
                    (F.col("n_rows") / F.lit(float(total))).alias("share"),
                    (F.col("n_rows") / F.lit(float(mean)))
                    .alias("skew_factor"),
                    F.greatest(F.lit(1), F.ceil(
                        F.col("n_rows") / F.lit(target_rows_per_task)))
                    .cast("int").alias("suggested_salts")))
