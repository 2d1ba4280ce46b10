"""Training-data pipeline operators (SURVEY.md §2.11 extensions).

The dedup/similarity/text operators cover corpus cleaning; this module
adds the steps between a clean corpus and a training run:

- hash_split          : deterministic train/val/test assignment from a
                        content-independent key hash — stable across
                        runs, engines, and partitionings; no RNG state
                        to coordinate across 1000 executors.
- corpus_mix_weights  : per-group sampling weights that reshape the
                        corpus toward a target mixture (uniform by
                        default) — the "data mixing" step of LLM
                        pretraining, computed as one tiny aggregate.
- pack_chunks         : concatenate-and-chunk sequence packing — the
                        standard pretraining packing (documents are
                        concatenated in a deterministic stream order
                        and split into fixed-token context windows; a
                        document belongs to the chunk where it starts).
                        A windowed running sum, so it scales as one
                        shuffle on the stream bucket.
- pack_greedy         : first-fit greedy packing within hash buckets
                        via applyInPandas — the no-straddle variant for
                        fine-tuning-style packing where documents must
                        not cross pack boundaries.

All but pack_greedy are pure Column/window expressions (JVM-side,
engine-exact against a SQL oracle); pack_greedy is an inherently
sequential per-bucket algorithm, kept Arrow-batched and bounded by the
bucket partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import token_count
from .cache import pin


def hash_bucket(key, n_buckets: int = 100):
    """Deterministic bucket in [0, n_buckets) from md5 of the key's
    string form. md5 (not xxhash64) so any engine can reproduce the
    assignment bit-for-bit; the first 8 hex chars (32 bits) are far
    beyond what bucket assignment needs."""
    col = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long") % n_buckets
    )


def hash_split(df: DataFrame, id_col: str = "doc_id",
               train_pct: int = 80, val_pct: int = 10) -> DataFrame:
    """Assign each row to train/val/test by its id-hash bucket.

    Content-independent (id, not text) so near-duplicate leakage
    between splits is a dedup concern, not a split concern; stable
    under repartitioning because nothing depends on row order.
    """
    b = hash_bucket(id_col, 100)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
         .when(b < train_pct + val_pct, F.lit("val"))
         .otherwise(F.lit("test")))


def split_summary(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-split doc/token counts — the sanity check run after every
    split: one tiny aggregate, partial map-side."""
    return (
        hash_split(df, id_col)
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"),
             F.sum(token_count(text_col)).alias("n_tokens"))
    )


def corpus_mix_weights(df: DataFrame, group_col: str = "lang",
                       text_col: str = "text") -> DataFrame:
    """Per-group sampling weight to reshape the corpus toward a
    uniform token mixture across groups.

    weight_g = target_share / actual_share, where actual_share is the
    group's fraction of total tokens. Sampling each group's documents
    with probability proportional to its weight yields the target mix
    in expectation. One aggregate + a broadcast-size result (|groups|
    rows) — at 100 TB the scan dominates and the mixture math is free.
    """
    per_group = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"))
    w = Window.partitionBy()  # |groups| rows — a driver-size aggregate
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    n_groups = F.count("*").over(w)
    return per_group.select(
        group_col, "n_docs", "n_tokens",
        share.alias("token_share"),
        ((F.lit(1.0) / n_groups) / share).alias("mix_weight"))


def source_temperature_weights(df: DataFrame, group_col: str = "source",
                               text_col: str = "text") -> DataFrame:
    """α = ½ temperature-scaled sampling weights per group — the
    multilingual/multi-source pretraining recipe (sample group g
    proportional to n_g^α with α < 1, upweighting small groups
    relative to proportional sampling without the uniform mix's
    extreme repetition of tiny ones) → (group, n_docs, n_tokens,
    token_share, temp_rel_weight, upsample_boost).

    α is FIXED at ½ because ½ is the one exponent that stays
    bit-exact cross-engine: n^½ is ``sqrt``, correctly rounded by
    IEEE 754 (unlike ``pow(x, 0.3)``, whose last ULP differs across
    libm builds — the same reason the repo's scores are log-free).
    Normalization is by the LARGEST group, not the sum: a sum of k
    sqrt-doubles is fold-order-dependent (DuckDB window sums tree-
    fold, Spark folds left — the EWMA lesson), while

        temp_rel_weight = sqrt(n_g) / sqrt(n_max)
        token_share     = n_g / n_tot
        upsample_boost  = temp_rel_weight / (n_g / n_max)
                        (the factor vs proportional sampling; > 1 for
                         every non-largest group, sqrt(n_max/n_g) up
                         to rounding)

    are each a fixed tree of correctly-rounded IEEE ops over EXACT
    integer aggregates — bit-identical in Spark and DuckDB. Exact
    while n_tokens < 2^53 (≈ 9e15; a 100 TB corpus is ~1e14 tokens).
    Relative weights feed samplers unchanged (only ratios matter).

    One corpus aggregate; everything after is |groups| rows through
    an unpartitioned window (driver-sized, the corpus_mix_weights
    shape). NULL-text docs are excluded (no token count exists).
    """
    per_group = (df.filter(F.col(text_col).isNotNull())
                 .groupBy(group_col)
                 .agg(F.count("*").alias("n_docs"),
                      F.sum(token_count(text_col)).alias("n_tokens")))
    w = Window.partitionBy()  # |groups| rows — a driver-size aggregate
    tot = F.sum("n_tokens").over(w)        # BIGINT-exact
    mx = F.max("n_tokens").over(w)         # BIGINT-exact
    d = lambda c: c.cast("double")         # noqa: E731
    temp = F.sqrt(d(F.col("n_tokens"))) / F.sqrt(d(mx))
    return per_group.select(
        group_col,
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (d(F.col("n_tokens")) / d(tot)).alias("token_share"),
        temp.alias("temp_rel_weight"),
        (temp / (d(F.col("n_tokens")) / d(mx))).alias("upsample_boost"))


def weighted_resample(df: DataFrame, weights: dict[str, float],
                      group_col: str = "lang", id_col: str = "doc_id",
                      seed: str = "resample:v1") -> DataFrame:
    """Down-sample each group toward the ``corpus_mix_weights`` target:
    keep a row iff its deterministic id-hash coin lands under the
    group's weight (weights > 1 mean the group is under-represented —
    kept whole here; true up-sampling is the training loader's job).

    Seeded by content-independent md5(seed, id) so the sample is
    reproducible across runs, engines, and partitionings — no RNG
    state to coordinate across 1000 executors, and changing ``seed``
    draws a fresh sample. One scan, no shuffle.
    """
    w = F.create_map(*[F.lit(x) for kv in weights.items()
                       for x in (kv[0], float(min(kv[1], 1.0)))])
    col = F.col(id_col)
    coin = (F.conv(F.substring(
        F.md5(F.concat(F.lit(seed + ":"), col.cast("string"))), 1, 8), 16, 10)
        .cast("long") % 1_000_000) / 1_000_000.0
    keep = coin < F.coalesce(w[F.col(group_col)], F.lit(1.0))
    return df.filter(keep)


def pack_chunks(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", cap: int = 2048,
                n_streams: int = 32) -> DataFrame:
    """Concatenate-and-chunk packing: documents are laid out in a
    deterministic stream order and cut into ``cap``-token windows; a
    document belongs to the chunk where its first token lands (the
    GPT-style packing where documents may straddle chunk boundaries).

    Streams are id-hash buckets, so layout is reproducible across runs
    and engines and each stream packs independently — the only shuffle
    is the window sort per stream, and n_streams bounds the
    parallelism exactly like log-structured writers at 100 TB.
    """
    toks = df.select(
        F.col(id_col), hash_bucket(id_col, n_streams).alias("stream"),
        token_count(text_col).alias("n_tokens"))
    w = (Window.partitionBy("stream").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return toks.select(
        id_col, "stream", "n_tokens",
        start.alias("start_offset"),
        (start / F.lit(cap)).cast("long").alias("chunk_id"))


def pack_greedy(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", cap: int = 2048,
                n_buckets: int = 32) -> DataFrame:
    """First-fit greedy packing (no document straddles a pack): within
    each id-hash bucket, walk documents in id order and open a new
    pack when the current one can't fit the document. Documents longer
    than ``cap`` get a pack of their own (truncation is the
    tokenizer's job, not the packer's).

    Sequential by nature, so it runs as applyInPandas per bucket —
    Arrow-batched, deterministic (sorted input), parallel across
    buckets. Output: (doc_id, bucket, n_tokens, pack_id, pack_fill).
    """
    toks = df.select(
        F.col(id_col), hash_bucket(id_col, n_buckets).alias("bucket"),
        token_count(text_col).alias("n_tokens"))

    # worker-side fn MUST be a closure (module-level defs pickle by
    # reference and the executor can't import this repo package when
    # the driver runs from another cwd)
    def _pack(pdf):
        import pandas as pd
        pdf = pdf.sort_values(id_col.replace("`", ""))
        packs, fills = [], []
        pack_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > cap:
                pack_id, fill = pack_id + 1, 0
            packs.append(pack_id)
            fill += n
            fills.append(fill)
        return pd.DataFrame({
            "doc_id_out": pdf[pdf.columns[0]],
            "bucket": pdf["bucket"],
            "n_tokens": pdf["n_tokens"],
            "pack_id": packs,
            "pack_fill": fills,
        })

    out = toks.groupBy("bucket").applyInPandas(
        _pack,
        schema=("doc_id_out long, bucket long, n_tokens long, "
                "pack_id long, pack_fill long"))
    return out.withColumnRenamed("doc_id_out", id_col)


def global_shuffle_shards(df: DataFrame, id_col: str = "doc_id",
                          n_shards: int = 16,
                          seed: str = "shuffle:v1") -> DataFrame:
    """Deterministic global shuffle + sharding for training output.

    Training-data order is a hyperparameter: the corpus must be
    emitted in a REPRODUCIBLE pseudo-random order, in fixed shards a
    loader can stream. Order key = md5(seed:id) — content-independent
    and engine-reproducible (same coin family as hash_split), so the
    permutation is stable across runs, partitionings and engines, and
    a new ``seed`` draws a fresh permutation. Shard = top 32 bits of
    the key scaled by n_shards (``(key32 * n) >> 32``), i.e. each
    shard is a CONTIGUOUS slice of the global pseudo-random order:
    reading shard 0..n-1 in sequence replays the exact global shuffle.

    Scale shape: assignment is one scan (two md5+arithmetic columns,
    no shuffle here); materializing is ONE range-style shuffle on
    shard + an in-partition sort on the key — the same cost Spark
    pays for any total order, with no driver-side sampling because
    the hash is uniform by construction.
    """
    col = F.col(id_col)
    okey = F.md5(F.concat(F.lit(seed + ":"), col.cast("string")))
    key32 = F.conv(F.substring(okey, 1, 8), 16, 10).cast("long")
    return df.withColumn("okey", okey).withColumn(
        "shard", F.shiftright(key32 * n_shards, 32).cast("int"))


def write_training_shards(df: DataFrame, path: str,
                          id_col: str = "doc_id", n_shards: int = 16,
                          seed: str = "shuffle:v1") -> None:
    """Materialize the global shuffle: one hash-partition exchange on
    shard + per-partition sort on the order key, written as a
    shard-partitioned table. Reading shards in index order, rows in
    file order, replays the global permutation exactly (tested)."""
    sharded = global_shuffle_shards(df, id_col, n_shards, seed)
    (sharded.repartition(n_shards, "shard")
     .sortWithinPartitions("shard", "okey")
     .write.mode("overwrite").partitionBy("shard").parquet(path))


def cap_per_group(df: DataFrame, group_col: str, cap: int,
                  id_col: str = "doc_id",
                  seed: str = "cap:v1") -> DataFrame:
    """Frequency cap: keep at most ``cap`` rows per group, selected
    by the deterministic md5(seed:id) coin — the over-representation
    control of web-corpus curation (per-domain caps): without it the
    heaviest sources dominate the token budget and the model
    overfits their boilerplate.

    Selection is content-independent and engine-reproducible (same
    coin family as hash_split/weighted_resample), so the kept set is
    stable across runs, partitionings and engines — which also makes
    it oracle-checkable row-for-row, not just count-for-count.

    Scale shape: one exchange on the group key + a per-group rank; a
    pathologically hot group serializes its own rank (same caveat as
    any per-key window — pre-filter with weighted_resample at
    keep≈cap/|group| to thin hot groups before the exact cap if a
    single group exceeds one task).
    """
    col = F.col(id_col)
    coin = F.md5(F.concat(F.lit(seed + ":"), col.cast("string")))
    w = Window.partitionBy(group_col).orderBy(coin, col)
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= cap).drop("__rk"))


def length_bucket_boundaries(df: DataFrame, n_buckets: int = 8,
                             text_col: str = "text",
                             accuracy: int = 10000) -> list[float]:
    """The 100 TB path for equi-depth length bucketing: approximate
    quantile boundaries from ONE pass (Greenwald-Khanna via
    percentile_approx) — a broadcast-size driver artifact (n_buckets-1
    numbers), vs the exact global-ntile ground truth
    (plans/queries.py:doc_length_buckets) whose rank serializes
    through a single task."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(F.percentile_approx(
        token_count(text_col).cast("double"), qs, accuracy)
        .alias("b")).first()
    return list(row["b"])


def assign_length_bucket(text_col: str, boundaries: list[float]):
    """Scan-side bucket assignment from precomputed boundaries: a pure
    Column expression (no window, no shuffle, whole-stage codegen) —
    1 + count of boundaries strictly below the doc's token count."""
    n = token_count(text_col).cast("double")
    b = F.lit([float(x) for x in boundaries])
    return (F.size(F.filter(b, lambda x: x < n)) + 1).alias("bucket")


def upsample_with_repeats(df: DataFrame, weights: dict[str, float],
                          group_col: str = "lang",
                          id_col: str = "doc_id",
                          seed: str = "upsample:v1") -> DataFrame:
    """Up-sample under-represented groups by REPEATING documents —
    the repeat-factor side of corpus mixing (weighted_resample is the
    down-sampling side): a group with weight w emits ⌊w⌋ copies of
    every doc plus one more with probability w−⌊w⌋, decided by the
    deterministic md5(seed:id:copy) coin, so E[copies] = w exactly
    and the draw is reproducible across runs/partitionings/engines.

    Output adds ``copy`` (1-based) — (id, copy) stays unique so
    downstream packing/sharding can treat repeats as distinct rows.

    Scale shape: copies come from an inline ``sequence`` explode —
    rows created are exactly the output size, no join, no shuffle;
    the coin filter runs inside the same projection.
    """
    w = F.create_map(*[F.lit(x) for kv in weights.items()
                       for x in (kv[0], float(kv[1]))])
    weight = F.coalesce(w[F.col(group_col)], F.lit(1.0))
    n_full = F.floor(weight).cast("int")
    frac = weight - F.floor(weight)
    copies = F.explode(F.sequence(F.lit(1), n_full + 1)).alias("copy")
    out = df.select("*", weight.alias("__w"), copies)
    coin = (F.conv(F.substring(
        F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"),
                       F.lit(":"), F.col("copy").cast("string"))),
        1, 8), 16, 10).cast("long") % 1_000_000) / 1_000_000.0
    keep = (F.col("copy") <= F.floor(F.col("__w"))) | \
        (coin < (F.col("__w") - F.floor(F.col("__w"))))
    return out.filter(keep).drop("__w")


def equi_depth_boundaries(df: DataFrame, col: str, n_buckets: int,
                          relative_error: float = 1e-4) -> list[float]:
    """The SCALE path of equi-depth bucketing, step 1: interior
    quantile boundaries via the Greenwald-Khanna sketch
    (``approxQuantile`` — one pass, mergeable, driver result is
    n_buckets−1 numbers). This is the swap the doc_length_buckets /
    events_rfm_segments docstrings promise for 100 TB, where a global
    ntile would serialize every row through one task: the boundaries
    are a broadcast-size artifact and the assignment (step 2) is a
    map-only comparison chain at the scan.

    ``relative_error`` trades sketch size for rank accuracy (0.0 =
    exact ranks, O(n) driver memory — fixture/oracle use only)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2 (got {n_buckets})")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    return df.approxQuantile(col, probs, relative_error)


def assign_equi_depth_buckets(df: DataFrame, col: str,
                              boundaries: list[float],
                              bucket_col: str = "bucket") -> DataFrame:
    """Step 2: scan-side bucket assignment — bucket = 1 + Σ_b
    (col > b), a fixed whole-stage-codegen comparison chain with ZERO
    shuffle (plan-tested). Rows equal to a boundary land in the lower
    bucket (ties share a bucket — the rank-based ntile instead splits
    ties by the tiebreak column, the one divergence between the exact
    and scale forms; both are monotone in ``col``)."""
    bucket = F.lit(1)
    for b in boundaries:
        bucket = bucket + (F.col(col) > F.lit(float(b))).cast("int")
    return df.withColumn(bucket_col, bucket)


def quality_floor_summary(df: DataFrame, group_col: str,
                          metric_col: str, id_col: str = "doc_id",
                          q_num: int = 1, q_den: int = 4) -> DataFrame:
    """Per-group quality-floor curation accounting → (group, n_docs,
    threshold, n_kept, kept_metric_sum): each group's floor is the
    metric value at EXACT ascending rank ⌈(q_num/q_den)·n⌉ (integer
    ceil — no float quantile), and rows at or above it survive — the
    per-source bottom-quartile cut a C4/Gopher-style pipeline applies
    before mixing (drop each source's own worst tail rather than one
    global cutoff that would gut low-resource sources).

    Exactness: the rank is a total order over (metric, id) but the
    value AT a rank is tie-independent, so the threshold — and every
    count — is deterministic and identical cross-engine; all integer
    arithmetic ⇒ bit-exact oracle (the metric is assumed exact —
    integral or decimal — as the bigint output contract already
    required).

    r16 optimization round (guide §2.3/§2.4 — the Mann-Whitney /
    Spearman histogram-spine device): because the value at a rank is
    tie-independent, EVERYTHING this summary reports is derivable
    from the per-group VALUE HISTOGRAM — no per-row rank window, no
    join back onto the rows, no group ever serializing its own rows
    through one task:

    - one (group, metric) aggregate with map-side partials is the
      only corpus exchange (it shuffles |groups × distinct values|
      histogram rows, not docs);
    - cumulative counts over the histogram run CHUNKED on
      floor(m/1024) (the weighted-sampler carry composition: within-
      chunk windows sort in parallel, the chunk-grain carry ledger
      joins back broadcast), so even an extreme value domain never
      feeds a single-task sort;
    - the threshold is the value whose cumulative range covers rank
      ⌈(q_num/q_den)·n⌉; n_kept = n − (count below it) and
      kept_sum = (total metric sum) − (sum below it) — all additive
      histogram arithmetic, bit-identical to the per-row form.

    ``id_col`` is retained for API compatibility; tie-independence
    means the tiebreak column never affects the output.
    """
    from pyspark.sql.window import Window
    if not (0 < q_num < q_den):
        raise ValueError(f"need 0 < q_num < q_den (got {q_num}/{q_den})")
    _ = id_col  # tie-independent: the tiebreak never affects the output
    g, m = F.col(group_col).alias("g"), F.col(metric_col).alias("m")
    h = pin(df.select(g, m)
            .groupBy("g", "m")
            .agg(F.count("*").alias("cn"), F.sum("m").alias("ms"))
            .withColumn("__ck", F.floor(F.col("m") / F.lit(1024.0))))
    w_carry = (Window.partitionBy("g").orderBy("__ck")
               .rowsBetween(Window.unboundedPreceding, -1))
    w_all = Window.partitionBy("g")
    led = (h.groupBy("g", "__ck")
           .agg(F.sum("cn").alias("ccn"), F.sum("ms").alias("cms"))
           .withColumn("carry",
                       F.coalesce(F.sum("ccn").over(w_carry), F.lit(0)))
           .withColumn("carry_ms",
                       F.coalesce(F.sum("cms").over(w_carry), F.lit(0)))
           .withColumn("n", F.sum("ccn").over(w_all))
           .withColumn("tot_ms", F.sum("cms").over(w_all))
           .select(F.col("g").alias("g_l"), F.col("__ck").alias("__ck_l"),
                   "carry", "carry_ms", "n", "tot_ms"))
    w_cum = (Window.partitionBy("g", "__ck").orderBy("m")
             .rowsBetween(Window.unboundedPreceding, -1))
    r = (h.join(F.broadcast(led),
                (F.col("g") == F.col("g_l"))
                & F.col("__ck").eqNullSafe(F.col("__ck_l")))
         .withColumn("cum", F.col("carry")
                     + F.coalesce(F.sum("cn").over(w_cum), F.lit(0)))
         .withColumn("cum_ms", F.col("carry_ms")
                     + F.coalesce(F.sum("ms").over(w_cum), F.lit(0))))
    kth = F.expr(f"(n * {q_num} + {q_den} - 1) div {q_den}")
    return (r.filter((F.col("cum") < kth)
                     & (kth <= F.col("cum") + F.col("cn")))
            .select(F.col("g").alias(group_col),
                    F.col("n").cast("bigint").alias("n_docs"),
                    F.col("m").cast("bigint").alias("threshold"),
                    (F.col("n") - F.col("cum")).cast("bigint")
                    .alias("n_kept"),
                    (F.col("tot_ms") - F.col("cum_ms")).cast("bigint")
                    .alias("kept_sum")))


def quality_floor_summary_approx(df: DataFrame, group_col: str,
                                 metric_col: str,
                                 q_num: int = 1, q_den: int = 4,
                                 accuracy: int = 10000) -> DataFrame:
    """Sketch-based scale twin of ``quality_floor_summary`` — the
    swap its docstring promises for monster groups (r13, the
    equi_depth_boundaries pattern in per-group form): the per-group
    floor comes from ``percentile_approx`` (Greenwald-Khanna, a
    MERGEABLE aggregate with map-side partials), so the whole summary
    is TWO plain aggregates and a |groups|-row broadcast — no keyed
    sort window, no group serializing its own rank through one task.
    Same output schema as the exact form.

    Accuracy contract: GK at ``accuracy`` bounds the threshold's rank
    error by n/accuracy per group (exact when n ≤ accuracy — fixture
    sizes), and the kept-count error is bounded by the number of rows
    whose metric sits between the exact and approx thresholds
    (tests/test_operators.py::test_quality_floor_approx_accuracy).
    Rows-only posture: the sketch is engine-internal, its exact twin
    IS the oracle-checkable ground truth."""
    if not (0 < q_num < q_den):
        raise ValueError(f"need 0 < q_num < q_den (got {q_num}/{q_den})")
    t = df.select(F.col(group_col).alias("g"),
                  F.col(metric_col).alias("m"))
    th = t.groupBy("g").agg(
        F.count("*").alias("n_docs"),
        F.percentile_approx("m", q_num / q_den, accuracy)
        .alias("threshold"))
    keep = (F.col("m") >= F.col("threshold")).cast("int")
    return (t.join(F.broadcast(th), "g")
            .groupBy("g", "n_docs", "threshold")
            .agg(F.sum(keep).alias("n_kept"),
                 F.sum(F.col("m") * keep).alias("kept_sum"))
            .select(F.col("g").alias(group_col),
                    F.col("n_docs").cast("bigint").alias("n_docs"),
                    F.col("threshold").cast("bigint").alias("threshold"),
                    F.col("n_kept").cast("bigint").alias("n_kept"),
                    F.col("kept_sum").cast("bigint").alias("kept_sum")))


def weighted_systematic_sample(df: DataFrame, weight_col: str,
                               k: int, id_col: str = "doc_id"
                               ) -> DataFrame:
    """Exact weight-proportional systematic sample: lay every row's
    positive integer weight end-to-end along a deterministic
    md5-shuffled axis and pick the k rows whose weight interval
    crosses a multiple of total/k — the classic systematic
    (grid-point) sampler, the DETERMINISTIC counterpart of A-ES
    weighted reservoir sampling (whose u^(1/w) keys need pow/ln and
    can never be bit-exact cross-engine). A row's selection
    multiplicity ``n_picks`` = how many grid points its interval
    covers (a "whale" heavier than total/k is picked with
    multiplicity — the with-replacement view; distinct rows returned
    ≤ k). Every step is integer arithmetic over the md5 total order
    ⇒ bit-exact cross-engine.

    Width budget: cum·k must fit a BIGINT — valid for
    total_weight·k < 2^63 (100 TB of chars at k=100 is ~1e16 ✓).

    Scale (r15, the ewma_chunked/shard_manifest carry composition —
    no single-task corpus window): the md5 axis is split into 256
    CONTIGUOUS chunks by the hash's first two hex chars (hex-digit
    ASCII order == numeric order, so chunk ranges tile the
    lexicographic (h, id) total order). The cumulative sum is then
    (a) a per-chunk window — partitionBy(chunk), 256-way parallel,
    each task sorting |corpus|/256 rows — plus (b) a carry = the
    prefix sum of the 256 chunk totals, computed by a window over
    the ≤256-row aggregate (bounded by construction, never by corpus
    size) and broadcast back. Integer addition is associative, so
    chunk-local cum + carry is BIT-IDENTICAL to the former global
    window (pinned by tests/test_operators.py::
    test_weighted_sample_chunked_equals_global_window)."""
    h = F.md5(F.col(id_col).cast("string"))
    base = (df.filter(F.col(weight_col).isNotNull()
                      & (F.col(weight_col) > 0))
            .select(F.col(id_col),
                    F.col(weight_col).cast("bigint").alias("w"),
                    h.alias("h"))
            .withColumn("chunk", F.conv(F.substring("h", 1, 2), 16, 10)
                        .cast("int")))
    # ≤256-row chunk ledger: per-chunk totals, exclusive prefix carry,
    # and the grand total — tiny by construction, broadcast back.
    w_carry = (Window.orderBy("chunk")
               .rowsBetween(Window.unboundedPreceding, -1))
    ledger = (base.groupBy("chunk").agg(F.sum("w").alias("cw"))
              .withColumn("carry",
                          F.coalesce(F.sum("cw").over(w_carry), F.lit(0)))
              .withColumn("total",
                          F.sum("cw").over(Window.partitionBy()))
              .select("chunk", "carry", "total"))
    w_ord = (Window.partitionBy("chunk").orderBy("h", id_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    g = (base.join(F.broadcast(ledger), "chunk")
         .withColumn("cum", F.col("carry") + F.sum("w").over(w_ord)))
    picks = (F.expr(f"(cum * {int(k)}) div total")
             - F.expr(f"((cum - w) * {int(k)}) div total"))
    return (g.withColumn("n_picks", picks)
            .filter(F.col("n_picks") >= 1)
            .select(id_col,
                    F.col("w").cast("bigint").alias("w"),
                    F.col("cum").cast("bigint").alias("cum_w"),
                    F.col("n_picks").cast("bigint").alias("n_picks")))


def kfold_summary(df: DataFrame, strat_col: str = "source",
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = 5) -> DataFrame:
    """Stratified k-fold assignment summary — the cross-validation
    counterpart of the train/val/test split (same deterministic
    md5-bucket coin, so any engine reproduces the assignment
    bit-for-bit and a fold never leaks across reruns): fold =
    md5-bucket(id) mod k, reported per (stratum, fold) with each
    fold's share of its stratum. → (stratum, fold, n_docs, n_tokens,
    fold_share).

    Exactness: counts and token sums are exact BIGINTs; the share is
    one integer division in double ⇒ bit-exact. Scale: ONE
    (stratum, fold) aggregate with map-side partials (|strata|·k
    rows out) + a |strata|-row broadcast for the totals; counts are
    additive ⇒ the streaming complete-mode twin is the
    benford_from_counts factoring."""
    return kfold_from_counts(
        kfold_counts(df, strat_col, id_col, text_col, k))


def kfold_counts(df: DataFrame, strat_col: str = "source",
                 id_col: str = "doc_id", text_col: str = "text",
                 k: int = 5) -> DataFrame:
    """Per-(stratum, fold) doc/token counts — the sufficient
    statistics behind the k-fold summary. Plain additive BIGINTs
    over the deterministic md5 fold coin ⇒ streams complete-mode
    with |strata|·k rows of state (the benford_from_counts
    factoring): streamed state after any micro-batch split is
    BIT-identical to this batch aggregate, and ``kfold_from_counts``
    finishes from either."""
    from ..functions.text import token_count
    fold = hash_bucket(F.col(id_col), k)
    return (df.groupBy(F.col(strat_col).alias("stratum"),
                       fold.alias("fold"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(token_count(text_col)).alias("n_tokens")))


def kfold_from_counts(per: DataFrame) -> DataFrame:
    """Finisher: attach each fold's share of its stratum — SHARED by
    the batch docs_stratified_kfold query and the streaming counts
    twin. The totals side is re-keyed under fresh attribute names
    before the self-join (the memory-sink re-key rule)."""
    totals = (per.select(F.col("stratum").alias("st"),
                         F.col("n_docs").alias("nd"))
              .groupBy("st").agg(F.sum("nd").alias("n_total")))
    return (per.join(F.broadcast(totals),
                     per["stratum"] == totals["st"])
            .select("stratum",
                    F.col("fold").cast("bigint").alias("fold"),
                    F.col("n_docs").cast("bigint").alias("n_docs"),
                    F.col("n_tokens").cast("bigint").alias("n_tokens"),
                    (F.col("n_docs").cast("double")
                     / F.col("n_total").cast("double"))
                    .alias("fold_share")))
