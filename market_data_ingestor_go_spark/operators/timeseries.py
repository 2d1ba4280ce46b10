"""Time-series regularization: dense grids + gap filling (LOCF).

The canonical market-data query the reference's consumers run
downstream of its history table (reference stores sparse ticks:
internal/app/postgres.go batch-appends observations as they arrive):
resample irregular observations onto a fixed step and carry the last
observation forward through empty buckets — TimescaleDB's
``time_bucket_gapfill`` + ``locf``, Pandas' ``resample().ffill()``.

Engine shape (one declarative plan, no UDFs, no driver loops):

1. Per (key, bucket): keep the LAST observation by a caller-supplied
   unique order key — `max_by`, so the rollup is ONE map-side-combined
   aggregate (only a row per bucket per partition reaches the shuffle).
2. Per key: explode `sequence(min_bucket, max_bucket, step)` into the
   dense grid — rows created are exactly the output size, never joined
   against the raw stream.
3. Grid LEFT JOIN observed buckets (equi on key+bucket), then
   ``last(value, ignorenulls=True)`` over the per-key ordered window
   fills gaps forward.

100 TB posture: the raw stream is touched once (the bucket aggregate);
everything after operates on bucket-grain rows (|keys| × |grid|, data-
independent). The LOCF window partitions by key — a single
monster-hot key serializes its own fill (documented; split by
calendar range per key if a key's grid alone exceeds one task's
memory). Dedicated tiebreak column keeps results deterministic under
any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .cache import pin


def gap_fill_locf(df: DataFrame, key_col: str, ts_ms_col: str,
                  value_col: str, step_ms: int,
                  ord_col: Column | None = None) -> DataFrame:
    """Dense per-key time grid at ``step_ms`` with LOCF-filled values.

    Output: (key, bucket_start_ms, value_locf, is_gap) — one row per
    grid bucket from the key's first observation to its last; buckets
    before the first observation don't exist (LOCF has nothing to
    carry), matching time_bucket_gapfill over the observed range.
    """
    ord_key = ord_col if ord_col is not None \
        else F.struct(F.col(ts_ms_col))
    # integer `div` (not double /) — at epoch-ms magnitudes a double
    # quotient can truncate into the wrong bucket
    bucket = F.expr(f"cast({ts_ms_col} as bigint) div {int(step_ms)}") \
        * F.lit(int(step_ms))
    # pinned: it feeds both the grid bounds and the fill join — without
    # reuse the raw stream would be aggregated twice (bucket-grain rows,
    # tiny vs the corpus; release via operators.cache.release_pinned)
    per_bucket = pin(
        df.groupBy(F.col(key_col).alias("k"), bucket.alias("b"))
        .agg(F.max_by(F.col(value_col), ord_key).alias("v_obs")))
    grid = (
        per_bucket.groupBy("k")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select("k", F.explode(
            F.sequence("lo", "hi", F.lit(step_ms))).alias("b")))
    joined = grid.join(per_bucket, ["k", "b"], "left")
    w = (Window.partitionBy("k").orderBy("b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        F.col("k").alias(key_col),
        F.col("b").alias("bucket_start_ms"),
        F.last("v_obs", ignorenulls=True).over(w).alias("value_locf"),
        F.col("v_obs").isNull().alias("is_gap"))


def gap_fill_interpolate(df: DataFrame, key_col: str, ts_ms_col: str,
                         value_col: str, step_ms: int,
                         ord_col: Column | None = None) -> DataFrame:
    """Dense per-key grid with LINEARLY interpolated gaps (the
    ``interpolate`` companion to :func:`gap_fill_locf`).

    A gap bucket between observations at (b_prev, v_prev) and
    (b_next, v_next) gets ``v_prev + (v_next - v_prev) * (b - b_prev)
    / (b_next - b_prev)``; trailing gaps (no next observation) fall
    back to LOCF. Two window passes over bucket-grain rows — the raw
    stream is still aggregated exactly once; the expression order is
    fixed so results are IEEE-double bit-exact against the SQL oracle.
    """
    ord_key = ord_col if ord_col is not None \
        else F.struct(F.col(ts_ms_col))
    bucket = F.expr(f"cast({ts_ms_col} as bigint) div {int(step_ms)}") \
        * F.lit(int(step_ms))
    per_bucket = pin(
        df.groupBy(F.col(key_col).alias("k"), bucket.alias("b"))
        .agg(F.max_by(F.col(value_col), ord_key).alias("v_obs")))
    grid = (
        per_bucket.groupBy("k")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select("k", F.explode(
            F.sequence("lo", "hi", F.lit(step_ms))).alias("b")))
    joined = grid.join(per_bucket, ["k", "b"], "left")
    back = (Window.partitionBy("k").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fwd = (Window.partitionBy("k").orderBy("b")
           .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_b = F.when(F.col("v_obs").isNotNull(), F.col("b"))
    prev_v = F.last("v_obs", ignorenulls=True).over(back)
    prev_b = F.last(obs_b, ignorenulls=True).over(back)
    next_v = F.first("v_obs", ignorenulls=True).over(fwd)
    next_b = F.first(obs_b, ignorenulls=True).over(fwd)
    frac = (F.col("b") - prev_b).cast("double") \
        / (next_b - prev_b).cast("double")
    interp = (
        F.when(F.col("v_obs").isNotNull(), F.col("v_obs"))
        .when(next_b.isNull(), prev_v)  # trailing gap → LOCF
        .otherwise(prev_v + (next_v - prev_v) * frac))
    return joined.select(
        F.col("k").alias(key_col),
        F.col("b").alias("bucket_start_ms"),
        interp.alias("value_interp"),
        F.col("v_obs").isNull().alias("is_gap"))


def ewma(df: DataFrame, key_col: str, order_cols: list[str],
         value_col: str, alpha: float = 0.5,
         out_col: str = "ewma",
         value_decimals: int | None = None) -> DataFrame:
    """Exponentially weighted moving average per key, in event order:
    y_1 = x_1; y_t = alpha*x_t + (1-alpha)*y_{t-1}.

    The recursion is inherently sequential, but it has a CLOSED FORM
    over a cumulative window — with rn the 1-based row number and
    d = 1-alpha:

        s_t = sum_{j<=t} x_j * d^(-j)          (one running window sum)
        y_t = alpha * d^t * (s_t - x_1/d) + d^(t-1) * x_1

    so the whole operator is row_number + first_value + one cumulative
    sum: a single exchange on the key, no self-join, no Python, no
    driver loop (the naive per-row backward sum would be O(n²) per
    key).

    Numerics contract: d^(-j) grows geometrically, so the closed form
    is for BOUNDED series — |series| < ~900 at d=0.5 before the scale
    factor overflows (fixture max is 99; asserted in tests). Unbounded
    streams use the streaming twin (exact recursion, two scalars of
    state, no length limit).

    ``value_decimals`` (with d an exact power of two) makes the result
    BIT-REPRODUCIBLE across engines AND partitionings: fixed-decimal
    inputs scale to integers in DECIMAL(6,0) — the widest that still
    fits the decimal budget alongside the two 16-digit half-power
    factors, so scaled |value|·10^decimals must stay < 10^6 (e.g.
    < $10k at 2 decimals; fixture max 49002, asserted in tests —
    beyond that the cast overflows to NULL under non-ANSI sessions,
    silently) — the half-power 2^rn factors are IEEE-exact, and the
    running sum is exact integer arithmetic — order-independent, immune to how any engine
    tree-folds a window sum (measured: the double path differs from
    DuckDB by 1 ULP on ~0.1% of rows because its windowed SUM is not
    a strict left fold). Every remaining double op is a single
    correctly-rounded step, so the oracle matches hash-exact. The
    decimal path tightens the series bound to rn ≤ 99 at d=0.5
    (2^rn must fit 30 digits); longer series: segment, or stream.
    """
    d = 1.0 - alpha
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # rn MUST be materialized before the running sum references it:
    # nesting row_number() inside the sum's input expression makes
    # Spark evaluate the two window specs in separate passes whose
    # per-row pairing is not the declared order (measured: wrong
    # weights on ~1 row per key at sf0.01) — a projection barrier
    # between the two window layers removes the ambiguity.
    df = df.withColumn("__rn", F.row_number().over(w))
    rn = F.col("__rn")
    if value_decimals is None:
        x1 = F.first(value_col).over(cum)
        s = F.sum(F.col(value_col) * F.pow(F.lit(1.0 / d), rn)).over(cum)
        y = (F.lit(alpha) * F.pow(F.lit(d), rn)
             * (s - x1 * F.lit(1.0 / d))
             + F.pow(F.lit(d), rn - 1) * x1)
        return df.withColumn(out_col, y).drop("__rn")

    scale = float(10 ** value_decimals)
    c = F.round(F.col(value_col) * F.lit(scale)).cast("decimal(6,0)")
    # 2^rn as EXACT decimal: a direct pow(2,rn)::decimal corrupts at
    # rn >= 58 — Spark casts double→decimal through the double's
    # 17-significant-digit string, so 2^58's 18 digits round off
    # (measured: ...740 for ...744). Split into two half-powers
    # (each < 2^50 ≈ 1.1e15, inside the exact window on both
    # engines) and multiply in decimal, where the product is exact.
    half = F.floor(rn / F.lit(2)).cast("int")
    p_lo = F.pow(F.lit(1.0 / d), half).cast("decimal(16,0)")
    p_hi = F.pow(F.lit(1.0 / d), rn - half).cast("decimal(16,0)")
    s = F.sum(c * (p_lo * p_hi)).over(cum)  # exact integer sum
    c1 = F.first(c).over(cum).cast("double")
    # decimal→double via STRING: engines disagree at 1 ULP on direct
    # int128→double casts (measured: DuckDB); decimal-string parsing
    # is correctly rounded everywhere, so both sides land on the
    # nearest double of the same exact integer.
    s_d = s.cast("string").cast("double")
    y = ((F.lit(alpha) * F.pow(F.lit(d), rn)
          * (s_d - c1 * F.lit(1.0 / d))
          + F.pow(F.lit(d), rn - 1) * c1) / F.lit(scale))
    return df.withColumn(out_col, y).drop("__rn")


def znorm_pattern(pattern: list) -> list:
    """Z-normalize a query pattern (shared by the batch search and
    the streaming alert twin so the op sequence — and therefore the
    batch↔streaming bit agreement — cannot drift)."""
    m = len(pattern)
    mu = sum(pattern) / m
    var = sum((x - mu) ** 2 for x in pattern) / m
    sd = var ** 0.5
    if sd == 0:
        raise ValueError("constant pattern cannot be z-normalized")
    return [(x - mu) / sd for x in pattern]


def subsequence_search(df: DataFrame, key_col: str,
                       order_cols: list[str], value_col: str,
                       pattern: list[float], k: int = 3,
                       out_ts_col: str | None = None) -> DataFrame:
    """Top-k z-normalized subsequence matches per key (UCR-style
    similarity search): slide a window of len(pattern) over each
    key's ordered series, z-normalize each window, and rank by
    Euclidean distance to the z-normalized query pattern — "find
    where the series moved like THIS", scale/offset-invariant.

    Engine shape: the sliding window is a frame-bounded collect_list
    (CURRENT ROW .. m-1 FOLLOWING — one exchange on the key, windows
    materialize as m-element arrays row-by-row, never a self-join);
    z-norm and distance are array expressions (aggregate/zip_with,
    JVM-side); the per-key top-k is the WindowGroupLimit rank shape.
    Constant (zero-variance) windows can't z-normalize and are
    excluded. The query pattern z-normalizes once in plain Python
    and embeds as a literal.

    Scale: O(rows·m) expression work, shuffle = one key exchange +
    the rank's top-k rows. At 100 TB the m-element arrays exist only
    inside the stage — nothing but (key, ts, dist) survives. Like
    every per-key window, one key's series serializes through one
    task (measured: 5 keys → 5-way parallelism at sf0.1); for few
    huge keys, pre-split into overlapping time chunks (overlap m-1
    rows so no window is lost) and union — same results, task-sized
    series.
    """
    m = len(pattern)
    zq = znorm_pattern(pattern)

    w = (Window.partitionBy(key_col).orderBy(*order_cols)
         .rowsBetween(Window.currentRow, m - 1))
    win = F.collect_list(F.col(value_col).cast("double")).over(w)
    ts_out = F.col(out_ts_col if out_ts_col else order_cols[0])
    base = df.select(key_col, ts_out.alias("win_start"),
                     win.alias("win")).filter(F.size("win") == m)

    s = F.aggregate("win", F.lit(0.0), lambda a, x: a + x)
    mean = (s / F.lit(float(m)))
    ss = F.aggregate(F.transform("win", lambda x: (x - F.col("__mu"))
                                 * (x - F.col("__mu"))),
                     F.lit(0.0), lambda a, x: a + x)
    base = base.withColumn("__mu", mean)
    base = base.withColumn("__sd", F.sqrt(ss / F.lit(float(m))))
    base = base.filter(F.col("__sd") > 0)
    zw = F.transform("win", lambda x: (x - F.col("__mu")) / F.col("__sd"))
    dist = F.sqrt(F.aggregate(
        F.zip_with(zw, F.lit([float(x) for x in zq]),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda a, x: a + x))
    scored = base.select(key_col, "win_start", dist.alias("dist"))
    rw = Window.partitionBy(key_col).orderBy("dist", "win_start")
    return (scored.withColumn("rn", F.row_number().over(rw))
            .filter(F.col("rn") <= k))
