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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .cache import pin


def keyed_row_numbers(df: DataFrame, key_col: str, order_cols: list[str],
                      coarse_chunk: Column,
                      rn_col: str = "__rn_g") -> DataFrame:
    """Global 1-based per-key row numbers with keys × chunks
    parallelism — the shared machinery behind every chunked per-key
    window operator.

    A plain ``row_number() OVER (PARTITION BY key ORDER BY ...)``
    serializes each key's ENTIRE series through one task, so
    parallelism is bounded by key cardinality — the documented weak
    point of the per-key-window family at low-key-cardinality 100×
    scale. This helper computes the same numbers in three
    chunk-parallel steps:

    1. rank within (key, coarse_chunk) — parallel across chunks;
    2. per-(key, chunk) row counts, cumulative-summed over the
       CHUNK-GRAIN table (|keys| × |chunks| rows, tiny) to get each
       chunk's global offset;
    3. join the offsets back (chunk-grain side broadcasts under AQE):
       global rn = chunk offset + within-chunk rank.

    ``coarse_chunk`` must be ORDER-PREFIX-COMPATIBLE with
    ``order_cols``: every row of chunk c sorts before every row of
    chunk c+1 (e.g. ``ts_ms div span`` when order_cols[0] is ts_ms).
    Granularity only shapes parallelism, never results.

    The offsets join back NULL-SAFELY: a plain equi-join would
    silently drop rows whose key (or coarse-chunk value, from a NULL
    order column) is NULL, while the per-key window this replicates
    keeps NULL as its own partition (review catch r6).
    """
    df = df.withColumn("__cc", coarse_chunk)
    w_in = Window.partitionBy(key_col, "__cc").orderBy(*order_cols)
    df = df.withColumn("__rn_in", F.row_number().over(w_in))
    counts = df.groupBy(key_col, "__cc").agg(F.count("*").alias("__cnt"))
    w_off = (Window.partitionBy(key_col).orderBy("__cc")
             .rowsBetween(Window.unboundedPreceding, -1))
    offs = counts.select(
        F.col(key_col).alias("__k_o"), F.col("__cc").alias("__cc_o"),
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"))
    return (df.join(offs,
                    df[key_col].eqNullSafe(F.col("__k_o"))
                    & F.col("__cc").eqNullSafe(F.col("__cc_o")))
            .withColumn(rn_col, (F.col("__off") + F.col("__rn_in"))
                        .cast("bigint"))
            .drop("__cc", "__cc_o", "__k_o", "__rn_in", "__off"))


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
    # "first following observation" as a GROWING frame over the
    # DESCENDING order: Spark evaluates currentRow..unboundedFollowing
    # (a shrinking frame) by re-scanning to the partition end for
    # every row — O(grid²) per key (measured: 7x the LOCF twin at
    # sf0.1). last() over unboundedPreceding..currentRow on b DESC is
    # the same value in O(grid).
    fwd = (Window.partitionBy("k").orderBy(F.col("b").desc())
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    obs_b = F.when(F.col("v_obs").isNotNull(), F.col("b"))
    prev_v = F.last("v_obs", ignorenulls=True).over(back)
    prev_b = F.last(obs_b, ignorenulls=True).over(back)
    next_v = F.last("v_obs", ignorenulls=True).over(fwd)
    next_b = F.last(obs_b, ignorenulls=True).over(fwd)
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
    (2^rn must fit 30 digits). Both bounds are ENFORCED at runtime
    (fail-loud raise_error past them — ADVICE r5), and the decimal
    path rejects a non-power-of-two 1-alpha outright; longer series
    route through :func:`ewma_chunked` (segmented closed form +
    carry scan, tested ≡ the exact recursion) or the streaming twin.
    """
    d = 1.0 - alpha
    rn_max = _ewma_rn_bound(alpha, value_decimals)
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
        y, _ = _ewma_exprs_double(alpha, cum, rn, F.col(value_col))
        y = _ewma_guard(y, rn, rn_max)
        return df.withColumn(out_col, y).drop("__rn")

    scale = float(10 ** value_decimals)
    y, _ = _ewma_exprs_decimal(alpha, cum, rn, F.col(value_col), scale)
    y = _ewma_guard(y / F.lit(scale), rn, rn_max)
    return df.withColumn(out_col, y).drop("__rn")


def _ewma_rn_bound(alpha: float, value_decimals: int | None) -> int:
    """Longest per-key series the closed form survives, enforced at
    RUNTIME (not just by fixture assertions — ADVICE r5). The scale
    factor (1/d)^rn must fit the arithmetic: decimal path 2^(q·rn)
    within the 30-digit product budget (q·rn ≤ 99); double path
    (1/d)^rn finite (rn·log2(1/d) ≤ 1020). Also rejects a decimal-path
    d that is not an exact power of two: the bit-reproducibility
    contract needs exact half-power factors, so alpha=0.3 with
    value_decimals set must fail loud, not return silently-inexact
    results."""
    d = 1.0 - alpha
    if not 0.0 < d < 1.0:
        raise ValueError(f"alpha must be in (0,1); got {alpha}")
    if value_decimals is not None:
        mant, exp = math.frexp(d)
        if mant != 0.5:
            raise ValueError(
                "value_decimals (the bit-exact decimal path) requires "
                f"1-alpha to be an exact power of two; got 1-{alpha} = {d}. "
                "Use the double path, ewma_chunked, or the streaming twin.")
        q = 1 - exp  # d == 2**-q exactly
        return 99 // q
    return int(1020 / math.log2(1.0 / d))


def _ewma_guard(y: Column, rn: Column, rn_max: int) -> Column:
    """Fail loud past the closed form's numeric bound instead of
    silently overflowing to NULL/inf (runtime twin of the fixture
    assertions; the chunked/streaming paths carry longer series)."""
    return F.when(
        rn > F.lit(int(rn_max)),
        F.raise_error(F.lit(
            f"ewma closed form is bounded to {rn_max} rows per key; "
            "route longer series through ewma_chunked (seg_rows) or "
            "the streaming twin"))).otherwise(y)


def _ewma_exprs_double(alpha: float, cum, rn: Column, x: Column):
    """(seeded y_t, zero-state z_t) over a cumulative window — double
    path. z_t = alpha * sum_{i<=t} d^(t-i) x_i is the response with
    y_0 = 0, the building block the chunked path composes with a
    carried prefix state."""
    d = 1.0 - alpha
    x1 = F.first(x).over(cum)
    s = F.sum(x * F.pow(F.lit(1.0 / d), rn)).over(cum)
    y = (F.lit(alpha) * F.pow(F.lit(d), rn)
         * (s - x1 * F.lit(1.0 / d))
         + F.pow(F.lit(d), rn - 1) * x1)
    z = F.lit(alpha) * F.pow(F.lit(d), rn) * s
    return y, z


def _ewma_exprs_decimal(alpha: float, cum, rn: Column, value: Column,
                        scale: float):
    """(seeded y_t, zero-state z_t) over a cumulative window — exact-
    decimal path, both in SCALED (cents) units; caller divides by
    ``scale`` at the very end so the chunked path can carry scaled
    state."""
    d = 1.0 - alpha
    c = F.round(value * F.lit(scale)).cast("decimal(6,0)")
    # the decimal(6,0) cast overflows to NULL silently under non-ANSI
    # sessions — fail loud instead (runtime twin of the fixture bound)
    c = F.when(
        F.abs(F.round(value * F.lit(scale))) >= F.lit(1e6),
        F.raise_error(F.lit(
            "ewma decimal path requires scaled |value| < 10^6 "
            "(value_decimals too large for this column)"))).otherwise(c)
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
    y = (F.lit(alpha) * F.pow(F.lit(d), rn)
         * (s_d - c1 * F.lit(1.0 / d))
         + F.pow(F.lit(d), rn - 1) * c1)
    z = F.lit(alpha) * F.pow(F.lit(d), rn) * s_d
    return y, z


def ewma_chunked(df: DataFrame, key_col: str, order_cols: list[str],
                 value_col: str, alpha: float = 0.5,
                 out_col: str = "ewma",
                 value_decimals: int | None = None,
                 seg_rows: int = 64,
                 coarse_chunk: Column | None = None) -> DataFrame:
    """EWMA for per-key series LONGER than the closed form's numeric
    bound — the chunked batch path the :func:`ewma` docstring
    promises (clears the r5 'weak' mark: unbounded series, keys ×
    segments parallelism instead of one task per key).

    How: split each key's series into row-count segments of
    ``seg_rows`` (global row numbers via :func:`keyed_row_numbers` —
    itself chunk-parallel). Within a segment the existing closed form
    computes, in one cumulative window bounded to seg_rows rows:

    - the SEEDED values y0_t for segment 0 (identical expression to
      the unchunked operator — a series that fits one segment returns
      BIT-IDENTICAL results), and
    - the zero-state response z_t = alpha*sum d^(t-i) x_i elsewhere,

    so y_t = z_t + d^t_local * C_g, where C_g (the EWMA value entering
    segment g) satisfies the segment-level linear recursion
    C_{g+1} = z_end(g) + d^len(g) * C_g. That recursion is solved with
    a POINTER-JUMPING affine-composition scan on the segment-grain
    table (|keys| x |segments| rows, tiny): each node holds
    (t, A, B) meaning C_g = A*C_t + B; log2(segments) rounds of
    self-join compose transforms until every node references C_1 =
    y_end(segment 0) — the same O(log n) driver-loop shape as the
    connected-components operator, each round an exchange over
    segment-grain rows only.

    Numerics: within segments the decimal path keeps the exact-
    integer-sum machinery (seg_rows ≤ 99//q enforced); cross-segment
    carries compose in double with a FIXED op order. Exact EWMA values
    at row t are rationals with 2^(q*t)-scale denominators, so NO
    engine computes them exactly for long series — the honest contract
    here is: bit-identical to unchunked when one segment suffices,
    and within float-accumulation distance of the exact sequential
    recursion otherwise (tested against an exact-Fraction reference;
    the pointer-jumping composition is algebraically exact, only its
    double rounding differs from sequential order in low bits).

    100 TB posture: the raw stream is touched by one window bounded to
    seg_rows rows per task; the scan loop runs on segment-grain rows.
    A billion-row key is ~16M segment rows at seg_rows=64 — still
    dwarfed by the data — and 24 scan rounds.
    """
    rn_max = _ewma_rn_bound(alpha, value_decimals)
    if not 2 <= seg_rows <= rn_max:
        raise ValueError(f"seg_rows must be in [2, {rn_max}] for "
                         f"alpha={alpha}, value_decimals={value_decimals}")
    d = 1.0 - alpha
    scale = float(10 ** value_decimals) if value_decimals is not None \
        else 1.0
    if coarse_chunk is None:
        coarse_chunk = F.expr(
            f"cast({order_cols[0]} as bigint) div 3600000")

    base = keyed_row_numbers(df, key_col, order_cols, coarse_chunk)
    rn = F.col("__rn_g")
    base = (base.withColumn("__seg", ((rn - 1) / F.lit(seg_rows))
                            .cast("bigint"))
            .withColumn("__rl", ((rn - 1) % F.lit(seg_rows) + 1)
                        .cast("int")))
    wseg = (Window.partitionBy(key_col, "__seg").orderBy("__rn_g")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rl = F.col("__rl")
    if value_decimals is None:
        y0, z = _ewma_exprs_double(alpha, wseg, rl, F.col(value_col))
    else:
        y0, z = _ewma_exprs_decimal(alpha, wseg, rl, F.col(value_col),
                                    scale)
    rows = pin(base.withColumn("__y0", y0).withColumn("__z", z))

    # segment-grain summaries: C_1 = seeded end of segment 0; for
    # g >= 1 the affine step C_{g+1} = z_end + d^len * C_g
    summ = (rows.groupBy(key_col, "__seg")
            .agg(F.max_by("__z", "__rl").alias("z_end"),
                 F.max_by("__y0", "__rl").alias("y_end"),
                 F.count("*").alias("len")))
    c1 = (summ.filter(F.col("__seg") == 0)
          .select(key_col, F.col("y_end").alias("C1")))
    nodes = (summ.filter(F.col("__seg") >= 1)
             .select(key_col,
                     (F.col("__seg") + 1).alias("g"),
                     F.col("__seg").alias("t"),
                     F.pow(F.lit(d), F.col("len")).alias("A"),
                     F.col("z_end").alias("B")))

    # pointer-jumping scan: compose affine transforms until every node
    # expresses C_g = A*C_1 + B (t == 1). The round count is KNOWN up
    # front — after r rounds each node spans min(2^r, g-1) steps, so
    # ceil(log2(max_g - 1)) rounds suffice — which saves one
    # convergence action per round vs a check-every-round loop (r6);
    # localCheckpoint truncates the per-round lineage (same pattern
    # as dedup clustering).
    max_g = nodes.agg(F.max("g")).first()[0]
    rounds = 0 if max_g is None or max_g <= 2 \
        else math.ceil(math.log2(int(max_g) - 1))
    for _ in range(rounds):
        j = nodes.select(key_col, F.col("g").alias("t"),
                         F.col("t").alias("t2"), F.col("A").alias("A2"),
                         F.col("B").alias("B2"))
        hop = F.col("t") > 1
        nodes = (nodes.join(j, [key_col, "t"], "left")
                 .select(key_col, "g",
                         F.when(hop, F.col("t2"))
                         .otherwise(F.col("t")).alias("t"),
                         F.when(hop, F.col("A") * F.col("A2"))
                         .otherwise(F.col("A")).alias("A"),
                         F.when(hop, F.col("A") * F.col("B2")
                                + F.col("B"))
                         .otherwise(F.col("B")).alias("B"))
                 # LAZY checkpoint (r15 optimization): the round count
                 # is known up front and nothing needs a per-round
                 # metric, so plan truncation happens per round (the
                 # exponential-lineage guard) while materialization
                 # collapses into the convergence guard's single job —
                 # log2(segments) fewer driver round-trips (measured
                 # ~13% on events_ewma_chunked; values identical)
                 .localCheckpoint(eager=False))
    # fail-loud convergence guard (raise, not assert: asserts strip
    # under python -O and the failure mode is silently wrong carries)
    if rounds and nodes.filter(F.col("t") > 1).head(1):
        raise ValueError(
            "ewma_chunked pointer-jumping scan did not converge within "
            f"{rounds} rounds — segment ids are expected contiguous")
    carries = (nodes.join(c1, [key_col])
               .select(F.col(key_col).alias("__k_c"),
                       F.col("g").cast("bigint").alias("__seg_c"),
                       (F.col("A") * F.col("C1") + F.col("B"))
                       .alias("__C"))
               .unionByName(c1.select(
                   F.col(key_col).alias("__k_c"),
                   F.lit(1).cast("bigint").alias("__seg_c"),
                   F.col("C1").alias("__C"))))

    out = rows.join(carries,
                    (rows[key_col] == F.col("__k_c"))
                    & (F.col("__seg") == F.col("__seg_c")), "left")
    y = F.when(F.col("__seg") == 0, F.col("__y0")) \
        .otherwise(F.col("__z") + F.pow(F.lit(d), rl) * F.col("__C"))
    return (out.withColumn(out_col, y / F.lit(scale))
            .drop("__rn_g", "__seg", "__rl", "__y0", "__z",
                  "__k_c", "__seg_c", "__C"))


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
                       out_ts_col: str | None = None,
                       chunk_rows: int | None = None,
                       coarse_chunk: Column | None = None) -> DataFrame:
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
    huge keys pass ``chunk_rows``: the series pre-splits into
    row-count chunks with an m-1-row overlap carried from the next
    chunk, so every window still materializes exactly once — BIT-
    IDENTICAL results (same arrays → same distances → same ranks),
    keys × chunks parallelism, per-task series bounded by
    chunk_rows + m - 1 (equality pinned in tests). Chunk membership
    comes from :func:`keyed_row_numbers` (itself chunk-parallel);
    windows starting at carried rows are dropped as the next chunk's
    duplicates.
    """
    m = len(pattern)
    zq = znorm_pattern(pattern)
    ts_out = F.col(out_ts_col if out_ts_col else order_cols[0])

    if chunk_rows is None:
        w = (Window.partitionBy(key_col).orderBy(*order_cols)
             .rowsBetween(Window.currentRow, m - 1))
        win = F.collect_list(F.col(value_col).cast("double")).over(w)
        base = df.select(key_col, ts_out.alias("win_start"),
                         win.alias("win")).filter(F.size("win") == m)
        return _topk_znorm_matches(base, key_col, zq, m, k)

    if chunk_rows < m:
        raise ValueError(f"chunk_rows must be >= len(pattern)={m}")
    if coarse_chunk is None:
        coarse_chunk = F.expr(
            f"cast({order_cols[0]} as bigint) div 3600000")
    base = keyed_row_numbers(df, key_col, order_cols, coarse_chunk)
    rn = F.col("__rn_g")
    cid = ((rn - 1) / F.lit(chunk_rows)).cast("bigint")
    pos = (rn - 1) % F.lit(chunk_rows)
    # each row joins its own chunk, and — when it is one of the first
    # m-1 rows of a chunk — also the previous chunk as a carry, so a
    # window starting near a chunk's end is still complete. chunks are
    # defined in ROW space (every chunk has exactly chunk_rows rows),
    # so one chunk of carry always suffices — no multi-chunk-span
    # edge case.
    assignments = F.array_compact(F.array(
        F.struct(cid.alias("cid"), F.lit(False).alias("carry")),
        F.when((pos <= m - 2) & (cid > 0),
               F.struct((cid - 1).alias("cid"),
                        F.lit(True).alias("carry")))))
    rows = (base.select(key_col, ts_out.alias("win_start"), "__rn_g",
                        F.col(value_col).cast("double").alias("__v"),
                        F.explode(assignments).alias("__a"))
            .select(key_col, "win_start", "__rn_g", "__v",
                    F.col("__a.cid").alias("__cid"),
                    F.col("__a.carry").alias("__carry")))
    w = (Window.partitionBy(key_col, "__cid").orderBy("__rn_g")
         .rowsBetween(Window.currentRow, m - 1))
    win = F.collect_list("__v").over(w)
    scored_base = (rows.select(key_col, "win_start", "__carry",
                               win.alias("win"))
                   .filter((F.size("win") == m) & ~F.col("__carry"))
                   .drop("__carry"))
    return _topk_znorm_matches(scored_base, key_col, zq, m, k)


def _topk_znorm_matches(base: DataFrame, key_col: str, zq: list[float],
                        m: int, k: int) -> DataFrame:
    """Shared scorer for both subsequence_search paths: z-normalize
    each m-element window, Euclidean distance to the z-normalized
    pattern, per-key top-k. ONE copy so the chunked path's results
    are bit-identical by construction."""
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


def drawdown_chunked(df: DataFrame, key_col: str, order_cols: list[str],
                     value_col: str, coarse_chunk: Column) -> DataFrame:
    """Chunk-parallel running-peak drawdown — the per-key-window
    family's chunking applied to a MONOTONE PREFIX aggregate, where
    it is simplest: max is associative, so the carry scan is a plain
    running max over per-chunk maxima (contrast ewma_chunked's
    pointer-jumping affine scan).

    Three steps, keys × chunks parallel:
    1. running max within (key, chunk) over ``order_cols``;
    2. per-(key, chunk) maxima, running-maxed EXCLUSIVELY over
       preceding chunks at the chunk-grain table (|keys| × |chunks|
       rows, tiny) — each chunk's carry-in peak;
    3. peak = greatest(carry, within-chunk running max) joined back
       null-safely (first chunk has NULL carry; greatest skips it).

    ``coarse_chunk`` must be order-prefix-compatible with
    ``order_cols`` (same contract as keyed_row_numbers). Results are
    BIT-IDENTICAL to the plain per-key window: max and greatest are
    exact, order-insensitive across the chunk boundary by
    associativity — no seam handling, no numeric caveats.

    Returns df + (peak, dd) columns (internal columns dropped).
    """
    df = df.withColumn("__cc", coarse_chunk)
    w_in = (Window.partitionBy(key_col, "__cc").orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df = df.withColumn("__inmax", F.max(value_col).over(w_in))

    cmax = df.groupBy(key_col, "__cc").agg(
        F.max(value_col).alias("__cmax"))
    w_carry = (Window.partitionBy(key_col).orderBy("__cc")
               .rowsBetween(Window.unboundedPreceding, -1))
    carries = cmax.select(
        F.col(key_col).alias("__k_c"), F.col("__cc").alias("__cc_c"),
        F.max("__cmax").over(w_carry).alias("__carry"))

    out = (df.join(carries,
                   df[key_col].eqNullSafe(carries["__k_c"])
                   & df["__cc"].eqNullSafe(carries["__cc_c"]), "left")
           .withColumn("peak", F.greatest("__carry", "__inmax"))
           .withColumn("dd", F.col("peak") - F.col(value_col)))
    return out.drop("__cc", "__inmax", "__k_c", "__cc_c", "__carry")


def cohort_retention(events: DataFrame, ts_ms_col: str = "ts_ms",
                     user_col: str = "user_id") -> DataFrame:
    """Classic triangle retention matrix: users are cohorted by their
    first active day; retention(cohort, k) = |cohort members active
    on cohort day + k| / |cohort| → (cohort_day_ms, day_offset,
    cohort_users, active_users, retention). Offset 0 is 1.0 by
    construction (every member is active on their first day).

    Day = epoch-millis div 86400000 (the events_user_growth
    timezone-proof grain). All counts are exact BIGINTs; retention is
    one int/int IEEE division (exact < 2^53 ⇒ bit-exact
    cross-engine).

    Shapes at 100 TB: the only event-stream-sized exchange is the
    (user, day) DISTINCT (map-side partial); first-day and the
    activity join are user-keyed (co-partitioned after the distinct);
    cohort sizes are a |days|-row broadcast. No window over the
    event stream anywhere."""
    day = F.expr(f"{ts_ms_col} div 86400000")
    ud = (events.select(F.col(user_col).alias("u"), day.alias("d"))
          .distinct())
    return retention_from_user_days(ud)


def retention_from_user_days(ud: DataFrame) -> DataFrame:
    """The retention readout over an already-distinct (u, d) table —
    SHARED by batch ``cohort_retention`` and the streaming twin
    (``streaming/sketches.py::streaming_user_days`` maintains the same
    (u, d) set as a complete-mode state table; both being the identical
    distinct set, the readout is bit-identical either way — tested).
    Everything downstream of the distinct is user-keyed or
    |days|-broadcast; nothing here re-touches the event stream."""
    # the first-day side is re-keyed under a fresh attribute so the
    # ud⋈first self-join stays unambiguous for ANY input lineage (a
    # streaming memory-sink view hit "Conflicting attributes: u")
    first = (ud.groupBy("u").agg(F.min("d").alias("cohort"))
             .select(F.col("u").alias("u_first"), "cohort"))
    sizes = (first.groupBy("cohort")
             .agg(F.count("*").alias("cohort_users")))
    act = (ud.join(first, F.col("u") == F.col("u_first"))
           .groupBy("cohort", (F.col("d") - F.col("cohort"))
                    .alias("day_offset"))
           .agg(F.count("*").alias("active_users")))
    return (act.join(F.broadcast(sizes), "cohort")
            .select((F.col("cohort") * 86400000).alias("cohort_day_ms"),
                    F.col("day_offset").cast("bigint").alias("day_offset"),
                    F.col("cohort_users").cast("bigint")
                    .alias("cohort_users"),
                    F.col("active_users").cast("bigint")
                    .alias("active_users"),
                    (F.col("active_users").cast("double")
                     / F.col("cohort_users").cast("double"))
                    .alias("retention")))


def rolling_active_users_from_user_days(ud_counts: DataFrame
                                        ) -> DataFrame:
    """Rolling 7-day distinct-actives readout over a (u, d, n_events)
    per-(user, day) count table — SHARED by the batch
    events_rolling_active_users query and the streaming twin
    (``streaming/sketches.py::streaming_user_days`` maintains exactly
    this table as complete-mode state; counts are additive ⇒ the
    streamed state after any micro-batch split is BIT-identical to
    the batch aggregate, so this readout agrees row-for-row — tested).
    → (day_num, n_active_users, n_events_day).

    Shape — the grid-explode device shared with the interval join:
    each distinct (u, d) row explodes into the ≤7 trailing days it
    CONTRIBUTES to, a second distinct collapses multi-active users
    per contributed day, one count per day finishes; per-day event
    totals are a sum over the same state table. Everything here runs
    over |users|·|active days| narrow rows — never a per-day rescan
    of the corpus, never a serialized global window. Days with zero
    activity produce no row (inner join back to observed days)."""
    ud = ud_counts.select("u", "d")
    contrib = (ud.select(
        "u", F.explode(F.sequence(F.col("d"), F.col("d") + 6))
        .alias("d"))
        .distinct())
    rolling = (contrib.groupBy("d")
               .agg(F.count("*").alias("n_active_users")))
    per_day = (ud_counts.groupBy("d")
               .agg(F.sum("n_events").alias("n_events_day")))
    return (per_day.join(rolling, "d")
            .select(F.col("d").cast("bigint").alias("day_num"),
                    F.col("n_active_users").cast("bigint")
                    .alias("n_active_users"),
                    F.col("n_events_day").cast("bigint")
                    .alias("n_events_day")))


def growth_accounting_from_user_days(ud: DataFrame) -> DataFrame:
    """Growth-accounting readout over an already-distinct (u, d)
    user×active-day table — the per-day decomposition of the active
    base into NEW (first-ever day), RETAINED (also active the
    previous day), and RESURRECTED (returning after a gap), plus the
    churn count n_churned_from_prev = |active(d−1)| − |retained(d)|
    (the exact set identity: yesterday's actives split into today's
    retained and the churned). The flow view of engagement next to
    the stock views (cohort retention, rolling actives) — SHARED by
    the batch events_user_growth_accounting query and the streaming
    twin (``streaming_user_days`` maintains the same (u, d) set;
    counts additive ⇒ identical after any micro-batch split —
    tested). → (day_num, n_active, n_new, n_retained, n_resurrected,
    n_churned_from_prev); days with no activity produce no row.

    Determinism: pure integer day arithmetic + BIGINT counts ⇒
    bit-exact. Scale: ONE user-keyed sort window over the (u, d)
    table (user-days domain, never the event stream), day-grain
    aggregates with map-side partials, and a day-shifted self-join of
    the |days|-row per-day table."""
    w = Window.partitionBy("u").orderBy("d")
    lagged = ud.select("u", "d", F.lag("d").over(w).alias("prev_d"))
    per_day = (lagged.groupBy("d")
               .agg(F.count("*").alias("n_active"),
                    F.sum(F.when(F.col("prev_d").isNull(), 1)
                          .otherwise(0)).alias("n_new"),
                    F.sum(F.when(F.col("prev_d") == F.col("d") - 1, 1)
                          .otherwise(0)).alias("n_retained"),
                    F.sum(F.when(F.col("prev_d") < F.col("d") - 1, 1)
                          .otherwise(0)).alias("n_resurrected")))
    prev = per_day.select((F.col("d") + 1).alias("d"),
                          F.col("n_active").alias("n_active_prev"))
    return (per_day.join(prev, "d", "left")
            .select(F.col("d").cast("bigint").alias("day_num"),
                    F.col("n_active").cast("bigint").alias("n_active"),
                    F.col("n_new").cast("bigint").alias("n_new"),
                    F.col("n_retained").cast("bigint")
                    .alias("n_retained"),
                    F.col("n_resurrected").cast("bigint")
                    .alias("n_resurrected"),
                    (F.coalesce(F.col("n_active_prev"), F.lit(0))
                     - F.col("n_retained")).cast("bigint")
                    .alias("n_churned_from_prev")))


def cooccurrence_lift_from_user_types(ut: DataFrame) -> DataFrame:
    """Market-basket co-occurrence lift readout over an
    already-distinct (u, t) user×event-type table — SHARED by the
    batch events_type_cooccurrence_lift query and the streaming twin
    (``streaming/sketches.py::streaming_user_types`` maintains the
    same (u, t) set as complete-mode state; counts additive ⇒
    identical after any micro-batch split — tested).
    → (type_a, type_b, n_both, n_a, n_b, support, lift).

    All counts exact BIGINTs; support and lift one fixed IEEE tree
    (lift = (n_both·n_users)/(n_a·n_b), no intermediate rounding) ⇒
    bit-exact. The n_users denominator is a LAZY broadcast scalar row
    (count_distinct excludes NULL users, matching the SQL oracle);
    the pair join is equi on the user with per-user fanout bounded by
    |types|²; per-type counts broadcast back onto the pair table."""
    n_row = F.broadcast(
        ut.agg(F.count_distinct("u").alias("n_users")))
    per_type = ut.groupBy("t").agg(F.count("*").alias("n"))
    x = ut.select("u", F.col("t").alias("type_a"))
    # the pair side is re-keyed under a fresh attribute so the ut⋈ut
    # self-join stays unambiguous for ANY input lineage (a streaming
    # memory-sink view hits "conflicting references" otherwise — the
    # retention_from_user_days device)
    y = ut.select(F.col("u").alias("u_b"), F.col("t").alias("type_b"))
    both = (x.join(y, F.col("u") == F.col("u_b"))
            .filter(F.col("type_a") < F.col("type_b"))
            .groupBy("type_a", "type_b")
            .agg(F.count("*").alias("n_both")))
    nb = F.col("n_both").cast("double")
    na = F.col("n_a").cast("double")
    nbb = F.col("n_b").cast("double")
    nu = F.col("n_users").cast("double")
    return (both
            .join(F.broadcast(per_type.select(
                F.col("t").alias("type_a"),
                F.col("n").alias("n_a"))), "type_a")
            .join(F.broadcast(per_type.select(
                F.col("t").alias("type_b"),
                F.col("n").alias("n_b"))), "type_b")
            .crossJoin(n_row)
            .select("type_a", "type_b",
                    F.col("n_both").cast("bigint").alias("n_both"),
                    F.col("n_a").cast("bigint").alias("n_a"),
                    F.col("n_b").cast("bigint").alias("n_b"),
                    (nb / nu).alias("support"),
                    (nb * nu / (na * nbb)).alias("lift")))


def event_transitions(events: DataFrame, ts_ms_col: str = "ts_ms",
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition estimates over per-user event
    streams: count consecutive (prev → cur) event-type pairs ordered
    by (ts, id) within each user, row-normalized → (prev_type,
    event_type, n_transitions, p) with p = n(prev→cur)/Σ_cur.

    ``id_col`` must be a per-user tiebreak (unique event id) so the
    ordering — and therefore every count — is total and deterministic
    under any partitioning. p is one exact-int IEEE division ⇒
    bit-exact cross-engine.

    Shapes at 100 TB: ONE user-keyed shuffle for the lag window (the
    stream never exchanges again); the pair count collapses map-side
    to ≤ |types|² rows per partition; row totals broadcast."""
    w = Window.partitionBy(user_col).orderBy(ts_ms_col, id_col)
    pairs = (events.select(user_col, ts_ms_col, id_col,
                           F.col(type_col).alias("event_type"))
             .withColumn("prev_type", F.lag("event_type").over(w))
             .filter(F.col("prev_type").isNotNull()))
    counts = (pairs.groupBy("prev_type", "event_type")
              .agg(F.count("*").alias("n_transitions")))
    return transition_probs(counts)


def transition_probs(counts: DataFrame) -> DataFrame:
    """Row-normalize a (prev_type, event_type, n_transitions) count
    table into the transition-matrix readout — the finisher SHARED by
    batch ``event_transitions`` and the streaming maintainer
    (``streaming/transitions.py``: per-epoch count deltas sum to the
    identical integer table, so this one exact-int division makes the
    two paths bit-identical — tested). Totals broadcast (≤ |types|
    rows)."""
    totals = (counts.groupBy("prev_type")
              .agg(F.sum("n_transitions").alias("n_from")))
    return (counts.join(F.broadcast(totals), "prev_type")
            .select("prev_type", "event_type",
                    F.col("n_transitions").cast("bigint")
                    .alias("n_transitions"),
                    (F.col("n_transitions").cast("double")
                     / F.col("n_from").cast("double")).alias("p")))


def cusum_changepoint(df: DataFrame, key_col: str = "event_type",
                      order_cols: list[str] | None = None,
                      value_col: str = "value") -> DataFrame:
    """Per-key CUSUM change-point localization: with x_1..x_n the
    key's value sequence in ``order_cols`` order and x̄ its mean,
    S_i = Σ_{j≤i} (x_j − x̄); the change point is argmax_i |S_i|
    (smallest i on ties) — a level shift at t makes |S| peak at t.
    The TIME-axis complement of the group-wise drift monitors
    (TV/KS/χ² localize WHICH source drifted; CUSUM localizes WHEN).
    → (key, n, change_idx, cusum_mag) with cusum_mag = max|S_i|.

    Exactness: values quantize to DECIMAL(27,6) (single rounding,
    identical in Spark and DuckDB); the comparison statistic
    n·S_i = n·prefix_i − i·total is exact decimal arithmetic — the
    argmax and tie-break are decided with ZERO float error — and the
    reported magnitude is one exact-by-exact string-routed division.
    Factor widths are decimal(27,6) × decimal(10,0) so the product
    stays ≤ 38 digits on BOTH engines (DuckDB errors past 38):
    valid for n < 1e10 rows per key and |prefix| < 1e21.

    Shapes at 100 TB: ONE key shuffle; the rank is materialized
    BEFORE the cumulative window reads it (never nest row_number in
    a windowed aggregate's input — r5 lesson); all three windows are
    keyed; the argmax is a per-key max-of-struct aggregate. A single
    monster key serializes its own scan (chunk by calendar range if
    a key exceeds one task — the gap-fill caveat)."""
    order_cols = order_cols or ["ts_ms", "event_id"]
    d276, d100 = "decimal(27,6)", "decimal(10,0)"
    w_ord = Window.partitionBy("k").orderBy(*order_cols)
    d = (df.select(F.col(key_col).alias("k"), *order_cols,
                   F.col(value_col).cast(d276).alias("v"))
         .withColumn("i", F.row_number().over(w_ord)))
    w_cum = (Window.partitionBy("k").orderBy("i")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = (Window.partitionBy("k")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    d = (d.withColumn("prefix", F.sum("v").over(w_cum).cast(d276))
          .withColumn("total", F.sum("v").over(w_all).cast(d276))
          .withColumn("n", F.count("*").over(w_all)))
    dd = F.abs(F.col("n").cast(d100) * F.col("prefix")
               - F.col("i").cast(d100) * F.col("total"))
    return (d.withColumn("dd", dd)
            .groupBy("k")
            .agg(F.max("n").alias("n"),
                 F.max(F.struct(F.col("dd").alias("d"),
                                (-F.col("i")).alias("ni"))).alias("m"))
            .select(F.col("k").alias(key_col),
                    F.col("n").cast("bigint").alias("n"),
                    (-F.col("m.ni")).cast("bigint").alias("change_idx"),
                    (F.col("m.d").cast("string").cast("double")
                     / F.col("n").cast("double")).alias("cusum_mag")))


def rfm_user_stats(events: DataFrame, user_col: str = "user_id",
                   ts_ms_col: str = "ts_ms",
                   value_col: str = "value") -> DataFrame:
    """Per-user RFM sufficient statistics → (user_id, last_day,
    frequency, monetary_d): last active day (max — idempotent), event
    count (additive), exact-decimal value sum (additive). The SHARED
    transform of batch ``events_rfm_segments`` and the streaming twin
    (``streaming/sketches.py::streaming_rfm_stats``): every aggregate
    is mergeable, so the streamed complete-mode state after any
    micro-batch split is BIT-identical to this batch aggregate. One
    map-side-combined shuffle; state is |users| rows."""
    return (events.groupBy(F.col(user_col).alias("user_id"))
            .agg(F.max(F.expr(f"{ts_ms_col} div 86400000"))
                 .alias("last_day"),
                 F.count("*").alias("frequency"),
                 F.sum(F.col(value_col).cast("decimal(27,6)"))
                 .alias("monetary_d")))


def rfm_segments_from_stats(per_user: DataFrame) -> DataFrame:
    """Quintile-score the RFM sufficient statistics and aggregate to
    the (segment, n_users, sum_monetary) table — the finisher SHARED
    by batch and streaming (pure function of the per-user stats, so
    batch↔streaming readouts are bit-identical — tested). Every ntile
    orders by (metric, user_id): a total order, and NTILE's
    equal-bucket-remainder-first rule matches DuckDB's ⇒ bit-exact
    cross-engine. The global ntile serializes |users| rows through
    one task — at 100 TB swap for approx-quantile boundaries + a
    scan-side assignment (the doc_length_buckets posture)."""
    max_day = per_user.agg(F.max("last_day").alias("corpus_day"))
    u = (per_user.join(F.broadcast(max_day))
         .withColumn("recency_days",
                     (F.col("corpus_day") - F.col("last_day"))
                     .cast("bigint")))
    r = F.ntile(5).over(Window.orderBy(F.col("recency_days").desc(),
                                       "user_id"))
    f_ = F.ntile(5).over(Window.orderBy(F.col("frequency").asc(),
                                        "user_id"))
    m = F.ntile(5).over(Window.orderBy(F.col("monetary_d").asc(),
                                       "user_id"))
    scored = (u.withColumn("r_score", r)
              .withColumn("f_score", f_)
              .withColumn("m_score", m)
              .withColumn("segment",
                          (F.col("r_score") * 100 + F.col("f_score") * 10
                           + F.col("m_score")).cast("bigint")))
    return (scored.groupBy("segment")
            .agg(F.count("*").alias("n_users"),
                 F.sum("monetary_d").cast("string").cast("double")
                 .alias("sum_monetary"))
            .select("segment", F.col("n_users").cast("bigint")
                    .alias("n_users"), "sum_monetary"))


def cusum_bucket_stats(df: DataFrame, key_col: str = "event_type",
                       ts_ms_col: str = "ts_ms",
                       value_col: str = "value",
                       bucket_ms: int = 3_600_000) -> DataFrame:
    """Per-(key, time-bucket) CUSUM sufficient statistics → (k, b,
    n_b, s_b): row count and exact DECIMAL(27,6)-quantized value sum
    per ``bucket_ms`` grain. This is the SHARED transform of the
    batch bucket-grain CUSUM and its streaming twin
    (``streaming/sketches.py::streaming_cusum_stats``): both counts
    and decimal sums are plain additive aggregates, so the streamed
    complete-mode state after any micro-batch split is BIT-identical
    to this batch aggregate. State is |keys|·|active buckets| rows —
    time-domain-sized, never stream-length."""
    if bucket_ms <= 0:
        raise ValueError(f"bucket_ms must be positive (got {bucket_ms})")
    v = F.col(value_col).cast("decimal(27,6)")
    # EXACT integer floor division (the chi2_value_drift remainder
    # device) — floor is the bucketing contract so a pre-epoch
    # timestamp gets its own bucket instead of widening bucket 0.
    # Two traps verified r12: Spark `div` AND DuckDB `//` both
    # truncate toward zero (duckdb 1.0.0: -7 // 2 = -3), and
    # F.floor(col/lit) routes through a DOUBLE division (inexact past
    # 2^53 — the winnowing ADVICE class), so both sides floor via
    # div + negative-remainder correction (engine-vs-engine pinned by
    # test_cusum_bucket_negative_ts_matches_duckdb).
    _q = F.expr(f"cast({ts_ms_col} as bigint) div {bucket_ms}")
    _r = F.expr(f"cast({ts_ms_col} as bigint) % {bucket_ms}")
    b = (F.when(_r < 0, _q - 1).otherwise(_q)) * bucket_ms
    return (df.select(F.col(key_col).alias("k"),
                      b.cast("bigint").alias("b"), v.alias("v"))
            .groupBy("k", "b")
            .agg(F.count("v").alias("n_b"),
                 F.sum("v").cast("decimal(27,6)").alias("s_b")))


def cusum_from_bucket_stats(stats: DataFrame) -> DataFrame:
    """Bucket-grain CUSUM readout over ``cusum_bucket_stats`` rows →
    (k, n, change_bucket_ms, change_cum_idx, cusum_mag).

    RESOLUTION CONTRACT: |S_i| is evaluated only at bucket END
    boundaries (i = cumulative row count through bucket b); the
    change point is reported as the START ms of the bucket whose end
    boundary maximizes |S|, so the answer is the row-grain
    ``cusum_changepoint`` answer rounded to ``bucket_ms`` resolution. When every bucket holds at
    most one row the two forms agree exactly (tested); a level shift
    mid-bucket localizes to that bucket's end. Ties break to the
    earliest bucket, mirroring the row-grain smallest-i rule.

    Exactness: identical decimal algebra to the row-grain form —
    n·S_b = n·prefix_b − cum_n_b·total in DECIMAL arithmetic, argmax
    decided with zero float error, magnitude one exact-by-exact
    string-routed division. Valid for n < 1e10 rows/key, |prefix| <
    1e21 (the cusum_changepoint width budget).

    Shapes at 100 TB: input is already bucket-grain (tiny); ONE key
    shuffle for the cumulative windows; per-key argmax is a
    max-of-struct aggregate."""
    d276, d100 = "decimal(27,6)", "decimal(10,0)"
    w_cum = (Window.partitionBy("k").orderBy("b")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = (Window.partitionBy("k")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    d = (stats
         .withColumn("prefix", F.sum("s_b").over(w_cum).cast(d276))
         .withColumn("cum_n", F.sum("n_b").over(w_cum))
         .withColumn("total", F.sum("s_b").over(w_all).cast(d276))
         .withColumn("n", F.sum("n_b").over(w_all)))
    dd = F.abs(F.col("n").cast(d100) * F.col("prefix")
               - F.col("cum_n").cast(d100) * F.col("total"))
    return (d.withColumn("dd", dd)
            .groupBy("k")
            .agg(F.max("n").alias("n"),
                 F.max(F.struct(F.col("dd").alias("d"),
                                (-F.col("b")).alias("nb"),
                                (-F.col("cum_n")).alias("nc"))).alias("m"))
            .select(F.col("k").alias("event_type"),
                    F.col("n").cast("bigint").alias("n"),
                    (-F.col("m.nb")).cast("bigint")
                    .alias("change_bucket_ms"),
                    (-F.col("m.nc")).cast("bigint").alias("change_cum_idx"),
                    (F.col("m.d").cast("string").cast("double")
                     / F.col("n").cast("double")).alias("cusum_mag")))


def interval_overlap_join(a: DataFrame, b: DataFrame,
                          a_start: str, a_end: str,
                          b_start: str, b_end: str,
                          bucket: int = 32,
                          a_keys: list | None = None,
                          b_keys: list | None = None) -> DataFrame:
    """INTERVAL × INTERVAL overlap join — the two-sided sibling of the
    point-in-range join (range_join_click_context): emit every (a, b)
    row pair whose CLOSED integer intervals intersect
    (a_start ≤ b_end ∧ b_start ≤ a_end), plus ``overlap`` =
    min(ends) − max(starts) + 1.

    Scale shape: a naive theta join is a cartesian product — the
    classic Spark interval-join trap. Bucketize instead: explode each
    interval into the ``bucket``-width grid cells it touches
    (sequence + explode, interval-length/bucket rows per interval),
    equi-join on the cell, de-duplicate the multi-cell candidate
    pairs, and verify the exact overlap predicate as a post-filter —
    the equi-join carries ALL the pruning, so work is proportional to
    co-located cells, never |A|·|B|. Pick ``bucket`` near the typical
    interval length: too small multiplies postings, too large
    multiplies per-cell candidates (the standard tradeoff; both ends
    stay correct).

    Pair identity (r12 verdict #2): pass ``a_keys``/``b_keys`` — the
    columns that uniquely identify a row on each side. The cell join
    then runs on the NARROW (keys + bounds) projection, the pair
    dedup shuffles keys only, and any remaining payload columns are
    re-attached by key equi-join AFTER the exact filter — wide
    payloads never ride the candidate exchange, and two rows that
    differ only in payload can no longer silently collapse into one
    pair. Rows sharing a key collapse per the uniqueness contract.
    With keys omitted (legacy), every column is identity: the dedup
    compares (and shuffles) full rows — fine for pre-projected
    inputs, both collapse-prone and exchange-heavy for wide ones.

    Keyed NAME CONTRACT (enforced, raises ValueError): because the
    re-attach joins run on the COMBINED pair frame, every column name
    — keys, bounds, and payloads alike — must be unique across BOTH
    sides' outputs and must not collide with the emitted ``overlap``
    column or the internal ``__cell``; the two key sets and the four
    bound names must likewise be mutually disjoint. Rename before
    calling (the shipments query aliases ``l_`` / ``o_`` prefixes)
    rather than relying on positional disambiguation.
    """
    cells = lambda s, e: F.sequence(
        F.expr(f"{s} div {bucket}"), F.expr(f"{e} div {bucket}"))
    keyed = bool(a_keys) and bool(b_keys)
    if keyed:
        a_keys, b_keys = list(a_keys), list(b_keys)
        a_bounds, b_bounds = {a_start, a_end}, {b_start, b_end}
        a_payload = [c for c in a.columns
                     if c not in set(a_keys) | a_bounds]
        b_payload = [c for c in b.columns
                     if c not in set(b_keys) | b_bounds]
        reserved = {"overlap", "__cell"}
        # The output is one flat pair frame, so every name must be
        # unambiguous: keys/bounds across sides, payloads vs the
        # whole other side, and EVERY name — keys and bounds included,
        # not just payloads (r15 ADVICE) — vs the reserved output
        # columns: a key or bound named 'overlap' would be silently
        # overwritten by the emitted withColumn, and one named
        # '__cell' collides with the internal grid column.
        a_out = set(a_keys) | a_bounds | set(a_payload)
        b_out = set(b_keys) | b_bounds | set(b_payload)
        clashes = sorted(
            (a_out & b_out) | ((a_out | b_out) & reserved))
        if clashes:
            raise ValueError(
                "interval_overlap_join keyed mode needs disjoint "
                f"column names across sides (and none of {sorted(reserved)}); "
                f"rename before calling — colliding: {clashes}")
        na = a.select(*dict.fromkeys(a_keys + [a_start, a_end]))
        nb = b.select(*dict.fromkeys(b_keys + [b_start, b_end]))
    else:
        na, nb = a, b
    ax = na.withColumn("__cell", F.explode(cells(a_start, a_end)))
    bx = nb.withColumn("__cell", F.explode(cells(b_start, b_end)))
    joined = ax.join(bx, "__cell").drop("__cell")
    # keyed: the frame here is ALREADY the narrow keys+bounds
    # projection, and bounds are functionally dependent on the keys
    # (uniqueness contract), so a plain distinct() IS the key dedup —
    # and measurably cheaper than dropDuplicates(keys), which compiles
    # to a HashAggregate dragging first()-value buffers for the bound
    # columns (A/B at sf0.1: 1.2 s vs 0.95 s on the shipments query)
    joined = joined.distinct()
    joined = joined.filter((F.col(a_start) <= F.col(b_end))
                           & (F.col(b_start) <= F.col(a_end)))
    overlap = (F.least(F.col(a_end), F.col(b_end))
               - F.greatest(F.col(a_start), F.col(b_start)) + 1)
    out = joined.withColumn("overlap", overlap)
    if keyed:
        bound_cols = {a_start, a_end}
        a_extra = [c for c in a.columns
                   if c not in set(a_keys) | bound_cols]
        if a_extra:
            out = out.join(a.select(*a_keys, *a_extra), a_keys)
        b_extra = [c for c in b.columns
                   if c not in set(b_keys) | {b_start, b_end}]
        if b_extra:
            out = out.join(b.select(*b_keys, *b_extra), b_keys)
    return out


def _dstr_col(name: str):
    """Decimal → double via STRING (correctly rounded on both engines;
    direct casts differ at 1 ULP — verify-skill lesson)."""
    return F.col(name).cast("string").cast("double")


def brand_return_counts(df: DataFrame, brand_col: str = "p_brand",
                        flag_col: str = "l_returnflag") -> DataFrame:
    """Per-brand (n, r) return counts — the sufficient statistics
    behind the Wilson-interval return-rate ranking. Plain additive
    BIGINT counts ⇒ streams complete-mode with |brands|-row state
    (the benford_from_counts factoring; r15 verdict #5): the streamed
    state after any micro-batch split is BIT-identical to the batch
    aggregate, and ``wilson_from_counts`` finishes from either."""
    return (df.groupBy(F.col(brand_col).alias("p_brand"))
            .agg(F.count("*").alias("n"),
                 F.sum(F.when(F.col(flag_col) == "R", 1)
                       .otherwise(0)).alias("r")))


def wilson_from_counts(counts: DataFrame, top: int = 10) -> DataFrame:
    """Finisher: top-``top`` brands by the Wilson 95% lower bound
    from the additive (p_brand, n, r) counts — SHARED by the batch
    part_brand_return_rates query and the streaming counts twin, so
    the continuous readout is definitionally the batch readout. One
    fixed IEEE tree over exact BIGINTs with z = 1.96 embedded as an
    exact double literal (sqrt is correctly rounded on both engines);
    ties break on the brand — a total order ⇒ bit-exact."""
    n = F.col("n").cast("double")
    p = F.col("r").cast("double") / n
    z = F.lit(1.96)
    z2 = z * z
    center = p + z2 / (F.lit(2.0) * n)
    rad = z * F.sqrt((p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * n)) / n)
    denom = F.lit(1.0) + z2 / n
    wilson = (center - rad) / denom
    return (counts.select("p_brand",
                          F.col("n").cast("bigint").alias("n_items"),
                          F.col("r").cast("bigint").alias("n_returned"),
                          p.alias("return_rate"),
                          F.when(F.col("n") > 0, wilson)
                          .alias("wilson_lower"))
            .orderBy(F.col("wilson_lower").desc(), "p_brand")
            .limit(top))


def customer_spend(df: DataFrame, cust_col: str = "o_custkey",
                   price_col: str = "o_totalprice") -> DataFrame:
    """Per-customer exact-decimal spend — the sufficient statistic
    behind the Pareto revenue-concentration readout. A DECIMAL(27,6)
    sum is a plain additive aggregate ⇒ streams complete-mode with
    |customers|-row state (the streaming_rfm_stats pattern; r15
    verdict #5): the streamed state after any micro-batch split is
    BIT-identical to the batch aggregate, and ``pareto_from_spend``
    finishes from either."""
    return (df.groupBy(F.col(cust_col).alias("o_custkey"))
            .agg(F.sum(F.col(price_col).cast("decimal(27,6)"))
                 .alias("spend")))


def pareto_from_spend(spend: DataFrame,
                      customer_dim: DataFrame) -> DataFrame:
    """Finisher: per-segment top-10% revenue share from the additive
    (o_custkey, spend) state plus the (c_custkey, c_mktsegment)
    dimension — SHARED by the batch customer_revenue_pareto query and
    the streaming spend twin. Ranks are row_number over (spend DESC,
    c_custkey) — a total order; k = ⌈n/10⌉ in integer arithmetic; the
    share is one string-routed decimal division ⇒ bit-exact.

    r16 optimization round (guide §2.4/§2.5 — the Theil-Sen chunk-
    ledger selection in per-group top-k form): the former per-segment
    rank window serialized every segment's |customers| rows through
    ONE task's sort. Now the pinned (segment, custkey, spend) table
    aggregates once into a floor(spend/1024) chunk ledger (per-chunk
    count and exact-decimal sum; descending-chunk exclusive carries;
    n and total ride the same chunk-grain windows — floor of a
    monotone double cast is monotone, so chunks tile the spend
    order); the ledger locates the ONE chunk per segment whose
    descending rank range contains k = (n+9) div 10; only THAT
    chunk's rows are ranked (global rank = carry + local rank by
    counting associativity). top_spend = (whole chunks above the
    target, from the ledger) + (the target chunk's rank-qualified
    rows) — exact decimal sums are order-independent, so the split
    is bit-identical to the windowed form. Worst case (every spend
    in one chunk) degrades to the old per-segment sort, never
    worse."""
    s = (spend.join(customer_dim,
                    spend["o_custkey"] == customer_dim["c_custkey"])
         .select("c_mktsegment", "c_custkey", "spend"))
    s = pin(s.withColumn("__ck",
                         F.floor(F.col("spend") / F.lit(1024.0))))
    w_carry = (Window.partitionBy("c_mktsegment")
               .orderBy(F.col("__ck").desc())
               .rowsBetween(Window.unboundedPreceding, -1))
    w_all = Window.partitionBy("c_mktsegment")
    led = (s.groupBy("c_mktsegment", "__ck")
           .agg(F.count("*").alias("cn"), F.sum("spend").alias("cs"))
           .withColumn("carry",
                       F.coalesce(F.sum("cn").over(w_carry), F.lit(0)))
           .withColumn("carry_s",
                       F.coalesce(F.sum("cs").over(w_carry), F.lit(0)))
           .withColumn("n", F.sum("cn").over(w_all))
           .withColumn("total", F.sum("cs").over(w_all)))
    k = F.expr("(n + 9) div 10")
    target = (led.filter((F.col("carry") < k)
                         & (k <= F.col("carry") + F.col("cn")))
              .select(F.col("c_mktsegment").alias("seg_l"),
                      F.col("__ck").alias("__ck_l"),
                      "carry", "carry_s", "n", "total"))
    w_rk = (Window.partitionBy("c_mktsegment", "__ck")
            .orderBy(F.col("spend").desc(), "c_custkey"))
    r = (s.join(F.broadcast(target),
                (F.col("c_mktsegment") == F.col("seg_l"))
                & F.col("__ck").eqNullSafe(F.col("__ck_l")))
         .withColumn("rk", F.col("carry") + F.row_number().over(w_rk)))
    agg = (r.groupBy("c_mktsegment", "n", "total", "carry_s")
           .agg(F.sum(F.when(F.col("rk") <= F.expr("(n + 9) div 10"),
                             F.col("spend"))).alias("part_s")))
    top = F.col("carry_s") + F.col("part_s")
    share = (top.cast("string").cast("double")
             / _dstr_col("total"))
    return agg.select(
        "c_mktsegment",
        F.col("n").cast("bigint").alias("n_customers"),
        F.expr("(n + 9) div 10").cast("bigint").alias("k_top10"),
        F.when(F.col("total") > 0, share).alias("top10_share"))


def supplier_revenue(df: DataFrame, nation_col: str = "s_nationkey",
                     supp_col: str = "l_suppkey",
                     rev_col: str = "rev") -> DataFrame:
    """Per-(nation, supplier) exact-decimal revenue — the sufficient
    statistic behind the HHI concentration readout (r15; the
    customer_spend pattern on a two-level key). Additive DECIMAL
    sums ⇒ streams complete-mode with |suppliers|-row state:
    streamed state after any micro-batch split is BIT-identical to
    this batch aggregate, and ``hhi_from_supplier_revenue`` finishes
    from either."""
    return (df.groupBy(F.col(nation_col).alias("s_nationkey"),
                       F.col(supp_col).alias("l_suppkey"))
            .agg(F.sum(F.col(rev_col).cast("decimal(27,6)"))
                 .alias("srev")))


def hhi_from_supplier_revenue(per_supp: DataFrame,
                              nation_dim: DataFrame) -> DataFrame:
    """Finisher: per-nation (n_suppliers, total_revenue, hhi,
    effective_suppliers) from the additive (nation, supplier, srev)
    state plus the (n_nationkey, n_name) dimension — SHARED by the
    batch nation_supplier_hhi query and the streaming revenue twin.
    The share-space device: share = srevᵢ/R one IEEE division over
    string-routed decimals, share² summed through DECIMAL(27,12)
    (scaled < 10^12, inside the r14 safe boundary), HHI ≡ the sum
    itself ⇒ bit-exact at any revenue magnitude. The totals side is
    RE-KEYED under fresh attribute names before the self-join — the
    retention_from_user_days device, required when the state arrives
    through a streaming memory-sink view (conflicting-references
    resolution failure otherwise)."""
    totals = (per_supp.select(F.col("s_nationkey").alias("nk"),
                              F.col("srev").alias("srev_t"))
              .groupBy("nk")
              .agg(F.count("*").alias("n_suppliers"),
                   F.sum("srev_t").alias("total_rev")))
    share = (F.col("srev").cast("string").cast("double")
             / F.col("total_rev").cast("string").cast("double"))
    agg = (per_supp.join(F.broadcast(totals),
                         per_supp["s_nationkey"] == totals["nk"])
           .withColumn("sq", (share * share).cast("decimal(27,12)"))
           .groupBy("s_nationkey", "n_suppliers", "total_rev")
           .agg(F.sum("sq").alias("hhi_sum")))
    hhi = _dstr_col("hhi_sum")
    out = agg.join(F.broadcast(nation_dim),
                   agg["s_nationkey"] == nation_dim["n_nationkey"])
    return out.select(
        F.col("n_name").alias("nation"),
        F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
        _dstr_col("total_rev").alias("total_revenue"),
        F.when(F.col("total_rev") > 0, hhi).alias("hhi"),
        F.when((F.col("total_rev") > 0) & (F.col("hhi_sum") > 0),
               F.lit(1.0) / hhi).alias("effective_suppliers"))


def backlog_deltas(intervals: DataFrame,
                   start_col: str = "order_day",
                   end_col: str = "last_ship") -> DataFrame:
    """±1 sweep-line boundary deltas per day from an interval table —
    the sufficient statistics behind the open-backlog readout (r15).
    Each interval contributes +1 at its start day and −1 at
    end day + 1; per-day delta sums are plain additive BIGINTs ⇒
    streams complete-mode with |calendar days|-row state: streamed
    state after any micro-batch split is BIT-identical to this batch
    aggregate, and ``backlog_from_deltas`` finishes from either.
    Zero-sum days are kept IN the state (a later batch can move them
    off zero); the finisher drops them."""
    starts = intervals.select(F.col(start_col).alias("day_num"),
                              F.lit(1).alias("delta"))
    ends = intervals.select((F.col(end_col) + 1).alias("day_num"),
                            F.lit(-1).alias("delta"))
    return (starts.unionAll(ends)
            .groupBy("day_num").agg(F.sum("delta").alias("d")))


def backlog_from_deltas(deltas: DataFrame) -> DataFrame:
    """Finisher: (day_num, n_open) at change-point days from the
    additive per-day delta state — SHARED by the batch
    orders_open_backlog_days query and the streaming deltas twin.
    Exact BIGINT running sum over the (day) total order; the window
    is calendar-sized by construction (the weighted-sampler chunked
    carry applies verbatim if a calendar ever outgrows one task)."""
    w = (Window.orderBy("day_num")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (deltas.filter(F.col("d") != 0)
            .withColumn("n_open", F.sum("d").over(w))
            .select(F.col("day_num").cast("bigint").alias("day_num"),
                    F.col("n_open").cast("bigint").alias("n_open")))


def user_funnel_flags(df: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type",
                      type_a: str = "click",
                      type_b: str = "purchase") -> DataFrame:
    """Per-user (has_a, has_b) incidence flags — the sufficient
    statistics behind the two-proportion z-test (r15). MAX over 0/1
    flags is IDEMPOTENT ⇒ streams complete-mode with |users|-row
    state (replay lands on identical state): streamed state after
    any micro-batch split is BIT-identical to this batch aggregate,
    and ``ztest_from_flags`` finishes from either."""
    return (df.groupBy(F.col(user_col).alias("user_id"))
            .agg(F.max((F.col(type_col) == type_a).cast("int"))
                 .alias("hc"),
                 F.max((F.col(type_col) == type_b).cast("int"))
                 .alias("hp")))


def ztest_from_flags(flags: DataFrame) -> DataFrame:
    """Finisher: the pooled-variance two-proportion z over the
    per-user (hc, hp) incidence state — SHARED by the batch
    events_purchase_rate_ztest query and the streaming flags twin.
    Exact BIGINT counts, one fixed IEEE tree, mirrored degenerate
    guards (an empty arm NULLs its rate and the z)."""
    agg = flags.agg(
        F.sum("hc").alias("n1"),
        F.sum(F.col("hc") * F.col("hp")).alias("x1"),
        F.sum(F.lit(1) - F.col("hc")).alias("n2"),
        F.sum((F.lit(1) - F.col("hc")) * F.col("hp")).alias("x2"))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    x1d, x2d = F.col("x1").cast("double"), F.col("x2").cast("double")
    p1 = x1d / n1d
    p2 = x2d / n2d
    pp = (x1d + x2d) / (n1d + n2d)
    se = F.sqrt(pp * (F.lit(1.0) - pp)
                * (F.lit(1.0) / n1d + F.lit(1.0) / n2d))
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    return agg.select(
        F.col("n1").cast("bigint").alias("n_clickers"),
        F.col("n2").cast("bigint").alias("n_nonclickers"),
        F.when(F.col("n1") > 0, p1).alias("rate_clickers"),
        F.when(F.col("n2") > 0, p2).alias("rate_nonclickers"),
        F.when(ok & (pp > 0) & (pp < 1), (p1 - p2) / se)
        .alias("z_score"))


def yoy_counts(df: DataFrame, key_col: str = "o_custkey",
               year_col: str = "yr", year_a: int = 1996,
               year_b: int = 1997) -> DataFrame:
    """Per-key (n_a, n_b) year counts — the sufficient statistics
    behind the paired sign test (r15). Conditional counts are plain
    additive aggregates ⇒ streams complete-mode with |keys|-row
    state: streamed state after any micro-batch split is
    BIT-identical to this batch aggregate, and
    ``sign_test_from_counts`` finishes from either."""
    return (df.groupBy(F.col(key_col).alias("k"))
            .agg(F.sum((F.col(year_col) == year_a).cast("int"))
                 .alias("n_a"),
                 F.sum((F.col(year_col) == year_b).cast("int"))
                 .alias("n_b")))


def sign_test_from_counts(per: DataFrame) -> DataFrame:
    """Finisher: the paired sign-test z over the per-key (n_a, n_b)
    count state — SHARED by the batch customer_yoy_sign_test query
    and the streaming counts twin. Exact tie exclusion on integer
    equality, z = (2·n_up − n)/√n, one fixed IEEE tree."""
    cls = per.select(
        (F.col("n_b") > F.col("n_a")).cast("int").alias("up"),
        (F.col("n_b") < F.col("n_a")).cast("int").alias("down"))
    agg = (cls.filter((F.col("up") + F.col("down")) > 0)
           .agg(F.count("*").alias("n"),
                F.sum("up").alias("n_up"),
                F.sum("down").alias("n_down")))
    nD = F.col("n").cast("double")
    z = ((F.lit(2.0) * F.col("n_up").cast("double") - nD)
         / F.sqrt(nD))
    return agg.select(
        F.col("n").cast("bigint").alias("n_customers_used"),
        F.col("n_up").cast("bigint").alias("n_up"),
        F.col("n_down").cast("bigint").alias("n_down"),
        F.when(F.col("n") > 0, z).alias("z_score"))


def markov_removal_attribution(events: DataFrame,
                               conv_type: str = "purchase",
                               ts_ms_col: str = "ts_ms",
                               user_col: str = "user_id",
                               type_col: str = "event_type",
                               id_col: str = "event_id") -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2016 — the
    data-driven multi-touch attribution standard): model user
    journeys as a first-order Markov chain over channel states with
    START / CONV / NULL absorption, compute the baseline conversion
    probability by absorbing-chain solve, then each channel's
    REMOVAL EFFECT — the relative drop in conversion probability
    when that channel's visits are redirected to NULL — and its
    normalized attribution share. → (channel, base_conv_prob,
    removal_conv_prob, removal_effect, attribution_share), one row
    per non-conversion channel.

    Journey model (deterministic over the (ts, id) total order): a
    user's journey runs from START through their event types and
    ABSORBS at the first ``conv_type`` (CONV); later events are out
    of scope. Non-converters transition from their last event to
    NULL. Transitions INTO the conversion type map to CONV.

    Scale shape: journey truncation + transitions are ONE user-keyed
    window pass (the event_transitions machinery); counts collapse
    map-side to ≤ (|channels|+1)² rows. The absorbing-chain solve
    runs DRIVER-SIDE over that tiny bounded artifact (numpy
    linear solve — the PCA-spectrum precedent), so the operator is
    rows-only by design: correctness is pinned by an independent
    pure-Python reference implementation on both the fixture and a
    hand-computable journey set
    (tests/test_operators.py::test_markov_attribution_reference)."""
    w = Window.partitionBy(user_col).orderBy(ts_ms_col, id_col)
    e = (events.select(user_col, ts_ms_col, id_col,
                       F.col(type_col).alias("t"))
         .withColumn("rn", F.row_number().over(w)))
    conv_rn = (e.filter(F.col("t") == conv_type)
               .groupBy(user_col).agg(F.min("rn").alias("crn")))
    kept = (e.join(conv_rn, user_col, "left")
            .filter(F.col("crn").isNull() | (F.col("rn") <= F.col("crn"))))
    wk = Window.partitionBy(user_col).orderBy("rn")
    lab = (kept.withColumn(
        "src", F.coalesce(F.lag("t").over(wk), F.lit("START")))
        .withColumn("dst", F.when(F.col("t") == conv_type,
                                  F.lit("CONV")).otherwise(F.col("t"))))
    # terminal NULL rows for non-converters (their LAST kept event)
    last = (kept.filter(F.col("crn").isNull())
            .groupBy(user_col).agg(F.max("rn").alias("lrn")))
    nulls = (kept.join(last, user_col)
             .filter(F.col("rn") == F.col("lrn"))
             .select(F.col("t").alias("src"),
                     F.lit("NULL").alias("dst")))
    # src of a row whose own type is the conversion must not emit
    # onward transitions (it has none — absorbed); pairs already stop
    # at crn by construction.
    trans = (lab.select("src", "dst").unionAll(nulls)
             .groupBy("src", "dst").agg(F.count("*").alias("n")))
    rows = trans.collect()   # bounded: ≤ (|channels|+2)^2 rows

    import numpy as np
    counts = {}
    for r in rows:
        counts[(r.src, r.dst)] = counts.get((r.src, r.dst), 0) + r.n
    channels = sorted({s for s, _ in counts if s != "START"}
                      | {d for _, d in counts if d not in ("CONV", "NULL")})

    def conv_prob(removed=None):
        states = ["START"] + [c for c in channels if c != removed]
        idx = {s: i for i, s in enumerate(states)}
        n = len(states)
        Q = np.zeros((n, n))
        r_conv = np.zeros(n)
        for (s, d), c in counts.items():
            if s == removed or s not in idx:
                continue
            tot = sum(v for (s2, _), v in counts.items() if s2 == s)
            p = c / tot
            if d == "CONV":
                r_conv[idx[s]] += p
            elif d == removed or d == "NULL":
                pass                      # redirected / absorbed at NULL
            elif d in idx:
                Q[idx[s], idx[d]] += p
        b = np.linalg.solve(np.eye(n) - Q, r_conv)
        return float(b[idx["START"]])

    base = conv_prob()
    out = []
    for c in channels:
        rc = conv_prob(removed=c)
        re = 1.0 - (rc / base) if base > 0 else None
        out.append((c, base, rc, re))
    tot_re = sum(r[3] for r in out if r[3] is not None)
    spark = events.sparkSession
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("channel", T.StringType()),
        T.StructField("base_conv_prob", T.DoubleType()),
        T.StructField("removal_conv_prob", T.DoubleType()),
        T.StructField("removal_effect", T.DoubleType()),
        T.StructField("attribution_share", T.DoubleType()),
    ])
    data = [(c, b, rc, re,
             (re / tot_re) if (re is not None and tot_re > 0) else None)
            for c, b, rc, re in out]
    return spark.createDataFrame(data, schema)


def daily_revenue(df: DataFrame, date_col: str = "o_orderdate",
                  price_col: str = "o_totalprice") -> DataFrame:
    """Day-grain exact-decimal revenue — the sufficient statistic
    behind THREE time-series readouts (r15): lag-1 autocorrelation,
    the Theil–Sen robust trend, and the Wald–Wolfowitz runs test. A
    DECIMAL(27,6) sum keyed on epoch-day integers is a plain
    additive aggregate ⇒ streams complete-mode with |calendar
    days|-row state: streamed state after any micro-batch split is
    BIT-identical to this batch aggregate, and the three finishers
    (``autocorr_from_daily`` / ``theilsen_from_daily`` /
    ``runs_test_from_daily``) read from either — one state table,
    three continuous monitors (the streaming_user_days /
    value-histogram pattern)."""
    day0 = F.lit("1970-01-01").cast("date")
    return (df.select(
        F.datediff(F.col(date_col).cast("date"), day0).alias("d"),
        F.col(price_col).alias("p"))
        .groupBy("d")
        .agg(F.sum(F.col("p").cast("decimal(27,6)")).alias("rev")))


def autocorr_from_daily(per_day: DataFrame) -> DataFrame:
    """Finisher: lag-1 autocorrelation from the (d, rev) state —
    SHARED by the batch orders_daily_autocorr query and the
    streaming daily-revenue twin. The normalized-double device
    (terms on str(rev)/1e9, DECIMAL(27,6) sums, shared Pearson
    tree); the lagged side is RE-KEYED under fresh names (the
    memory-sink rule)."""
    nxt = per_day.select((F.col("d") - 1).alias("dn"),
                         F.col("rev").alias("rev_next"))
    pairs = (per_day.join(nxt, per_day["d"] == nxt["dn"])
             .select((F.col("rev").cast("string").cast("double")
                      / F.lit(1.0e9)).alias("x"),
                     (F.col("rev_next").cast("string").cast("double")
                      / F.lit(1.0e9)).alias("y")))
    d27 = "decimal(27,6)"
    m = pairs.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(d27)).alias("sx"),
        F.sum(F.col("y").cast(d27)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d27)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d27)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(d27)).alias("sxy"))
    nD = F.col("n").cast("double")
    ds = _dstr_col
    cov = ds("sxy") / nD - (ds("sx") / nD) * (ds("sy") / nD)
    vx = ds("sxx") / nD - (ds("sx") / nD) * (ds("sx") / nD)
    vy = ds("syy") / nD - (ds("sy") / nD) * (ds("sy") / nD)
    return m.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        F.when((F.col("n") > 1) & (vx > 0) & (vy > 0),
               cov / F.sqrt(vx * vy)).alias("lag1_autocorr"))


def theilsen_from_daily(per_day: DataFrame,
                        chunk_width: float = 1024.0) -> DataFrame:
    """Finisher: the Theil–Sen median pairwise slope from the
    (d, rev) state — SHARED by the batch orders_theilsen_trend query
    and the streaming twin. Exact lower-median element over the
    (slope, da, db) total order; both pair sides re-keyed; n_days as
    a lazy 1-row broadcast scalar.

    r15 optimization round (guide §2.4/§2.5): the former single
    global row_number window serialized every |days|²/2 pair row
    through ONE task's sort, and a second global count window
    re-exchanged the same rows just to learn n_pairs. Now a
    median-of-slopes SELECTION over floor(slope/1024) chunks —
    division by a power of two is exact IEEE scaling and floor is
    monotone, so chunks tile the slope order:

    - the pinned pair table aggregates once into a chunk-grain
      ledger (per-chunk count, exclusive prefix carry, grand total
      np — windows over the chunk-count-sized frame, never over
      pair rows); n_pairs = np rides the ledger;
    - the ledger locates the ONE chunk whose rank range contains
      k = (np+1) div 2 (carry < k ≤ carry+cn) — a 1-row broadcast;
    - only THAT chunk's pair rows are ranked (row_number within the
      chunk over the same (slope, da, db) total order; global rank
      = carry + local rank by counting associativity), so the sort
      touches ~np/|chunks| rows instead of np. Worst case (every
      slope in one chunk) degrades to the old single sort, never
      worse. The selected element, n_pairs and n_days are IDENTICAL
      to the global form (pinned by the exact-Python-reference test
      and the DuckDB oracle).

    ``chunk_width`` (r16 ADVICE) sets the slope units per chunk: any
    positive width yields identical results (floor of an exact
    power-of-two-scaled division stays monotone for every width;
    selection is width-independent), but a width wider than the
    data's slope RANGE degrades to the old single-task sort — size
    it so range/width lands in the tens-to-thousands of chunks."""
    a = per_day.select(F.col("d").alias("da"), F.col("rev").alias("ra"))
    b = per_day.select(F.col("d").alias("db"), F.col("rev").alias("rb"))
    pairs = (a.join(b, F.col("da") < F.col("db"))
             .select("da", "db",
                     ((F.col("rb") - F.col("ra")).cast("string")
                      .cast("double")
                      / (F.col("db") - F.col("da")).cast("double"))
                     .alias("slope")))
    # pinned: the ledger aggregate and the target-chunk rank both
    # read the pair table — one BNLJ execution, not two
    if not chunk_width > 0:
        raise ValueError(f"chunk_width must be > 0 (got {chunk_width})")
    pairs = pin(pairs.withColumn(
        "__ck", F.floor(F.col("slope") / F.lit(float(chunk_width)))))
    w_carry = (Window.orderBy("__ck")
               .rowsBetween(Window.unboundedPreceding, -1))
    w_all = (Window.orderBy("__ck")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    ledger = (pairs.groupBy("__ck").agg(F.count("*").alias("cn"))
              .withColumn("carry",
                          F.coalesce(F.sum("cn").over(w_carry),
                                     F.lit(0)))
              .withColumn("np", F.sum("cn").over(w_all)))
    k = F.expr("(np + 1) div 2")
    target = (ledger.filter((F.col("carry") < k)
                            & (k <= F.col("carry") + F.col("cn")))
              .select(F.col("__ck").alias("__ck_l"), "carry", "np"))
    w_cum = Window.partitionBy("__ck").orderBy("slope", "da", "db")
    # NULL-SAFE equality on purpose: a plain == infers an
    # isnotnull(floor(slope/1024)) predicate that Catalyst pushes into
    # the day-pair BNLJ's join condition AHEAD of da < db — evaluating
    # the slope division on da == db combos (ANSI divide-by-zero).
    # __ck is never null, so <=> is semantically identical and keeps
    # the hash join.
    r = (pairs.join(F.broadcast(target),
                    pairs["__ck"].eqNullSafe(target["__ck_l"]))
         .withColumn("rk", F.col("carry") + F.row_number().over(w_cum)))
    med = (r.filter(F.col("rk") == F.expr("(np + 1) div 2"))
           .select("np", F.col("slope").alias("slope_med")))
    nd = per_day.agg(F.count("*").alias("n_days"))
    return (med.crossJoin(F.broadcast(nd))
            .select(F.col("n_days").cast("bigint").alias("n_days"),
                    F.col("np").cast("bigint").alias("n_pairs"),
                    F.col("slope_med").alias("theilsen_slope")))


def runs_test_from_daily(per_day: DataFrame) -> DataFrame:
    """Finisher: the Wald–Wolfowitz runs test from the (d, rev)
    state — SHARED by the batch orders_revenue_runs_test query and
    the streaming twin. Exact lower-median element, deterministic
    tie exclusion, integer runs count, exact decimal μ/σ² products
    into one fixed IEEE z tree; the median row is re-keyed (fresh
    column name) before the broadcast join."""
    w_med = Window.orderBy("rev", "d")
    ranked = (per_day.withColumn("rk", F.row_number().over(w_med))
              .withColumn("n", F.count("*").over(Window.partitionBy())))
    med_row = (ranked.filter(F.col("rk") == F.expr("(n + 1) div 2"))
               .select(F.col("rev").alias("med")))
    signed = (per_day.crossJoin(F.broadcast(med_row))
              .filter(F.col("rev") != F.col("med"))
              .select("d", (F.col("rev") > F.col("med")).alias("up")))
    w_ord = Window.orderBy("d")
    runs = (signed
            .withColumn("brk", F.when(
                F.lag("up").over(w_ord).isNull()
                | (F.col("up") != F.lag("up").over(w_ord)), 1)
                .otherwise(0)))
    d38 = "decimal(38,0)"
    agg = runs.agg(
        F.count("*").alias("n_used"),
        F.sum(F.col("up").cast("int")).alias("n1"),
        F.sum((~F.col("up")).cast("int")).alias("n2"),
        F.sum("brk").alias("n_runs"))
    two_n1n2 = (F.lit(2).cast(d38) * F.col("n1").cast(d38)
                * F.col("n2").cast(d38))
    n38 = F.col("n_used").cast(d38)
    var_num = two_n1n2 * (two_n1n2 - n38)
    var_den = n38 * n38 * (n38 - F.lit(1).cast(d38))
    nD = F.col("n_used").cast("double")
    mu = F.lit(1.0) + two_n1n2.cast("string").cast("double") / nD
    var = (var_num.cast("string").cast("double")
           / var_den.cast("string").cast("double"))
    z = (F.col("n_runs").cast("double") - mu) / F.sqrt(var)
    ok = (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n_used") > 1)
    return agg.select(
        F.col("n_used").cast("bigint").alias("n_days_used"),
        F.col("n1").cast("bigint").alias("n_above"),
        F.col("n2").cast("bigint").alias("n_below"),
        F.col("n_runs").cast("bigint").alias("n_runs"),
        F.when(ok & (var > 0), z).alias("z_score"))
