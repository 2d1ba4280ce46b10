"""Count-min sketch: bounded-memory frequency estimation.

The frequency member of the engine's sketch family (HLL approx
distinct, MinHash set resemblance, SimHash cosine-ish): estimate
per-token counts over a corpus whose vocabulary is far larger than
memory. The sketch is a d×w counter grid — HERE a DataFrame of at most
d·w rows regardless of corpus size — built with one explode + one
map-side-combined aggregate. Estimates take the MIN over d hashed
counters, so error is ONE-SIDED: estimate ≥ true count always, and
exceeds it by more than ε·N with probability ≤ δ for w = ⌈e/ε⌉,
d = ⌈ln 1/δ⌉ (Cormode & Muthukrishnan 2005).

Sketches are MERGEABLE: counters from different corpora/partitions/
micro-batches union + sum into the sketch of the union (tested) — the
property that makes the structure work on a 1000-executor cluster and
as incremental streaming state.

Scale framing: the counter build touches each token once (partial agg
→ at most d·w rows per partition cross the shuffle). Estimation joins
a CANDIDATE table against the counters — candidates come from the
caller (a sample, a dictionary, a previous epoch's heavy hitters);
asking for every distinct token's estimate re-introduces the full
vocabulary and is only for fixtures/tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"))


def _hash_rows(col, d: int, w: int):
    """(depth, bucket) pairs for a token — depth-seeded xxhash64."""
    return F.array(*[
        F.struct(F.lit(j).alias("depth"),
                 F.pmod(F.xxhash64(col, F.lit(j)), F.lit(w)).alias("bucket"))
        for j in range(d)])


def count_min_build(df: DataFrame, text_col: str = "text", d: int = 4,
                    w: int = 1024) -> DataFrame:
    """Build the sketch: (depth, bucket, cnt), ≤ d·w rows total."""
    toks = _tokens(df, text_col)
    return (toks.select(F.explode(_hash_rows(F.col("tok"), d, w)).alias("h"))
            .groupBy("h.depth", "h.bucket")
            .agg(F.count("*").alias("cnt")))


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (d, w): union + sum —
    exactly the sketch of the concatenated corpora."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(sketch: DataFrame, candidates: DataFrame,
                       token_col: str = "tok", d: int = 4,
                       w: int = 1024) -> DataFrame:
    """Estimated count per candidate token: min over the d counters.

    The sketch is ≤ d·w rows — it BROADCASTS, so estimation never
    shuffles the candidate table. Missing counters mean the bucket saw
    zero tokens (count 0).
    """
    probes = candidates.select(
        F.col(token_col).alias("tok"),
        F.explode(_hash_rows(F.col(token_col), d, w)).alias("h")) \
        .select("tok", "h.depth", "h.bucket")
    joined = probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return (joined.groupBy("tok")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est_count")))


# ------------------------------------------------------------------
# Mergeable DISTINCT sketches (Datasketches HLL / theta, JVM-native).
#
# The 100 TB pattern: the sketch is what you STORE. One scan builds a
# few-KB sketch per cube cell (group × partition); every later rollup
# is a sketch UNION over those cells — never a rescan of the fact
# table — and theta sketches extend union with INTERSECTION /
# DIFFERENCE, so cross-corpus distinct overlap ("how many content
# fingerprints do sources A and B share?") costs K tiny sketches
# instead of a fingerprint self-join shuffle. Both families are
# order-independent (registers take max / keep-min-k hashes), so the
# estimates are deterministic for a given input set, and exact while
# the per-cell cardinality stays under the sketch's nominal capacity.
# ------------------------------------------------------------------


def distinct_sketch_partials(df: DataFrame, key_col: str,
                             group_cols: list[str], part_col,
                             lgk: int = 12) -> DataFrame:
    """Pre-aggregated HLL cube cells: one sketch per (group, part).

    `part_col` is a Column (e.g. month(date)) aliased to "part". At
    scale these cells are the materialized layer: ~(2**lgk)/2 bytes
    each, one per cell, built map-side in a single pass.
    """
    return (df.groupBy(*group_cols, part_col.alias("part"))
            .agg(F.hll_sketch_agg(key_col, lgk).alias("hll")))


def distinct_sketch_rollup(partials: DataFrame,
                           group_cols: list[str]) -> DataFrame:
    """Union partial sketches up to per-group distinct estimates.

    HLL registers combine by max, so the union of partials is
    REGISTER-IDENTICAL to a sketch built directly over the union of
    the inputs (tested bit-exact on the estimate).
    """
    agg = [F.hll_sketch_estimate(F.hll_union_agg("hll"))
           .alias("approx_distinct"),
           F.count("*").alias("n_cells")]
    if group_cols:
        return partials.groupBy(*group_cols).agg(*agg)
    return partials.agg(*agg)


def theta_set_sketches(df: DataFrame, key_col: str, set_col: str,
                       lg_nom: int = 14) -> DataFrame:
    """One theta sketch of `key_col` per value of `set_col` — the
    per-corpus summary that makes pairwise overlap O(K²) over
    kilobyte sketches instead of O(rows²) over keys."""
    return (df.groupBy(set_col)
            .agg(F.theta_sketch_agg(key_col, lg_nom).alias("sk")))


def theta_pairwise_overlap(sketches: DataFrame,
                           set_col: str = "source") -> DataFrame:
    """|A|, |B|, |A∩B|, |A∪B| estimates for every unordered pair.

    The sketch table has one row per set — the pairwise join is over
    K rows of kilobyte payloads (broadcast, no fact-table shuffle).
    Pinned so the self-join's two branches share ONE sketch build
    (without it each branch re-scans the corpus); callers release via
    operators.cache.release_pinned() after their consuming action.
    """
    from .cache import pin
    sketches = pin(sketches)
    a = sketches.select(F.col(set_col).alias("set_a"),
                        F.col("sk").alias("sk_a"))
    b = sketches.select(F.col(set_col).alias("set_b"),
                        F.col("sk").alias("sk_b"))
    pairs = a.join(F.broadcast(b), F.col("set_a") < F.col("set_b"))
    return pairs.select(
        "set_a", "set_b",
        F.theta_sketch_estimate("sk_a").alias("n_a"),
        F.theta_sketch_estimate("sk_b").alias("n_b"),
        F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b"))
        .alias("n_shared"),
        F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b"))
        .alias("n_union"))


def quantile_sketch_partials(df: DataFrame, value_col: str,
                             group_cols: list[str], part_col,
                             k: int = 200) -> DataFrame:
    """KLL quantile-sketch cube cells — the quantile member of the
    mergeable family (CMS=frequency, HLL/theta=distinct): one ~k·8-byte
    sketch per (group, part), built in a single pass. KLL compaction
    is RANDOMIZED (Karnin-Lang-Liberty 2016), so estimates carry a
    probabilistic normalized-rank-error bound (~1.65%/√? at k=200,
    asserted as measured rank error in tests) and are not
    run-repeatable — which is why the rollup query is rows-only with
    value_percentiles as its exact twin."""
    return (df.groupBy(*group_cols, part_col.alias("part"))
            .agg(F.kll_sketch_agg_double(value_col, k).alias("kll")))


def quantile_sketch_rollup(partials: DataFrame, group_cols: list[str],
                           qs: tuple = (0.5, 0.95, 0.99)) -> DataFrame:
    """Merge KLL cells up to per-group quantile estimates.

    Spark exposes only the pairwise kll_sketch_merge, so the per-group
    cells fold through a collect_list + aggregate() — safe because the
    list is the stored-cells layer (one sketch per partition, dozens
    of rows), never the raw values."""
    folded = (partials.groupBy(*group_cols)
              .agg(F.collect_list("kll").alias("sks")))
    sk = F.aggregate(F.expr("slice(sks, 2, size(sks) - 1)"),
                     F.element_at("sks", 1),
                     lambda acc, x: F.kll_sketch_merge_double(acc, x))
    merged = folded.select(*group_cols, sk.alias("sk"))
    return merged.select(
        *group_cols,
        F.kll_sketch_get_n_double("sk").alias("n_rows"),
        *[F.kll_sketch_get_quantile_double("sk", F.lit(q))
          .alias(f"q{int(q * 100)}") for q in qs])


# ------------------------------------------------------------------
# Bloom filter: the MEMBERSHIP member of the mergeable sketch family
# (CMS = frequency, HLL/theta = distinct, KLL = quantile). A bit array
# of n_bits, k depth-seeded xxhash64 positions per key — represented
# as a DataFrame of at most n_bits/64 (word, mask) rows, so a 2^20-bit
# filter is 16 Ki rows / 128 KiB no matter how many keys went in.
#
# Guarantees: NO false negatives ever (every inserted key sets its k
# bits; OR never clears one), false-positive rate ≈ (1-e^{-kn/m})^k.
# Merge is bitwise OR — commutative/associative/idempotent — so
# partition partials, per-corpus filters and per-micro-batch
# increments all combine into exactly the filter of the union (tested
# bit-identical), the property that makes it per-executor buildable
# and storable as streaming state.
#
# Scale framing vs Spark's runtime bloom injection (plan-pinned in
# test_plans): the injected filter lives and dies inside one query.
# This one is an ARTIFACT — build once over the accepted/dimension key
# set, store it (128 KiB), and compile it into any later query's scan
# stage as a pure Column predicate: the big side is pre-filtered
# before its exchange, so only ~(selectivity + fpp) of the rows ever
# cross a shuffle, with zero join and zero row blowup on the probe
# side.
# ------------------------------------------------------------------


def _bloom_positions(col, k: int, n_bits: int):
    """k bit positions for a key — depth-seeded xxhash64, seeds offset
    from the CMS seeds so composed pipelines never share hash planes."""
    return [F.pmod(F.xxhash64(col, F.lit(0x9E37 + j)), F.lit(n_bits))
            for j in range(k)]


def _bloom_words(df: DataFrame, key_col: str, n_bits: int,
                 k: int) -> DataFrame:
    """Shared (word, mask) aggregation for the batch build and the
    streaming state (same expression tree ⇒ bit-identical filters)."""
    pos = df.select(F.explode(F.array(*_bloom_positions(
        F.col(key_col), k, n_bits))).alias("pos"))
    return (pos.select(F.expr("pos div 64").alias("word"),
                       F.expr("shiftleft(CAST(1 AS BIGINT), "
                              "CAST(pos % 64 AS INT))").alias("m"))
            .groupBy("word").agg(F.bit_or("m").alias("mask")))


def bloom_build(df: DataFrame, key_col: str, n_bits: int = 1 << 17,
                k: int = 5) -> DataFrame:
    """Build the filter: (word, mask) rows, ≤ n_bits/64 total.

    One explode (k rows per key) + one map-side-combined bit_or — the
    only shuffle moves at most n_bits/64 rows per partition.
    """
    return _bloom_words(df, key_col, n_bits, k)


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union filters built with the same (n_bits, k): bitwise OR per
    word — exactly the filter of the concatenated key sets."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word").agg(F.bit_or("mask").alias("mask"))


def bloom_might_contain(bloom: DataFrame, key, n_bits: int = 1 << 17,
                        k: int = 5):
    """Compile the filter into a pure might-contain Column predicate.

    Collects the bounded sketch to the driver (control-plane, same
    contract as the k-means codebooks: ≤ n_bits/64 rows regardless of
    corpus size) and embeds it as an array literal, so the probe test
    is ALL-k-bits-set expression algebra — it runs inside the scan's
    WholeStageCodegen with no join, no explode and no shuffle.
    """
    words = {r["word"]: r["mask"] for r in bloom.collect()}
    # ceil-divide: an n_bits not divisible by 64 still owns a partial
    # tail word — truncating here made element_at return NULL for tail
    # positions and silently FALSE-NEGATIVED those keys (review catch)
    arr = F.lit([int(words.get(i, 0))
                 for i in range((n_bits + 63) // 64)])
    tests = None
    for pos in _bloom_positions(key, k, n_bits):
        word_val = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit_set = F.bit_get(word_val, (pos % 64).cast("int")) == 1
        tests = bit_set if tests is None else tests & bit_set
    return tests


def bloom_semi_join(big: DataFrame, keys: DataFrame, big_key: str,
                    key_col: str, n_bits: int = 1 << 17,
                    k: int = 5) -> DataFrame:
    """Semi join with a Bloom prefilter — result EXACTLY equals the
    plain semi join (no false negatives by construction; the verify
    semi join removes the ~fpp false positives), which is what lets
    the driver oracle check it with a plain EXISTS.

    The scale win is shuffle bytes: the compiled predicate filters the
    big side inside its scan stage, so when the key set is too large
    to broadcast (sort-merge territory) only ~(selectivity + fpp) of
    the rows reach the exchange. Unlike Spark's runtime-injected bloom
    (single-query lifetime), this filter is a stored, mergeable
    artifact — build once, reuse across queries and micro-batches.
    """
    bloom = bloom_build(keys, key_col, n_bits, k)
    pre = big.filter(bloom_might_contain(bloom, F.col(big_key), n_bits, k))
    return pre.join(keys.select(F.col(key_col).alias(big_key)).distinct(),
                    big_key, "left_semi")


def token_heavy_hitters(df: DataFrame, text_col: str = "text",
                        k: int = 20, d: int = 4, w: int = 1024) -> DataFrame:
    """Top-k tokens by CMS estimate (fixture-scale driver: candidates =
    all distinct tokens; production callers supply a candidate set).
    Deterministic order: estimate desc, then token."""
    sketch = count_min_build(df, text_col, d, w)
    cands = _tokens(df, text_col).distinct()
    est = count_min_estimate(sketch, cands, "tok", d, w)
    return est.orderBy(F.col("est_count").desc(), "tok").limit(k)
