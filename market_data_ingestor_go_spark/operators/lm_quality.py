"""Statistical language-model quality scoring for corpus curation.

The CCNet / DSIR family of data-selection signals, re-expressed as
Spark Column algebra:

- ``ngram_lm_score``    : count-pruned bigram LM trained on a
  deterministic hash-split of the corpus; every document scored
  against it (n-gram LM perplexity filtering a la CCNet — docs far
  from the reference distribution score low).
- ``dsir_importance``   : hashed-bigram importance weights (Data
  Selection via Importance Resampling) — the target/raw likelihood
  ratio under two hashed feature distributions.
- ``token_tv_divergence``: pairwise total-variation distance between
  per-group token distributions — the distribution-drift monitor run
  between sources/snapshots before mixing them.

Cross-engine determinism (the repo's oracle rules, queries.py module
doc): everything here is **log-free**. True cross-entropy needs
``ln()``, whose last ULP differs across libm builds, so the headline
scores are exact integer/rational forms instead:

- ``lm_score``  = (Σc_bg + n) / (Σc_ctx + n·(V+1)) — the aggregated
  Laplace likelihood ratio. Both sums are BIGINT-exact; the single
  IEEE division of two exactly-representable integers is correctly
  rounded, hence bit-identical in Spark and DuckDB.
- ``xent_bits`` (true per-token cross-entropy, base 2) IS also
  computed — engine-side only, excluded from the oracle projection
  and verified against an exact Python reference in tests.
- DSIR ratio terms are single-rounding double expressions over exact
  integer counts, decimal-cast-summed (the proven ``_dsum`` pattern).
- TV distance is computed on the common denominator: integer
  cross-products |c_a·C_b − c_b·C_a| summed exactly in DECIMAL(38,0),
  divided once at the end (decimal→double via the string route).

Scale shapes (100 TB posture):
- Tokenize/bigram explode is NARROW — pairs come from zipping the
  token array with its own tail before exploding, so no per-doc
  window shuffle exists anywhere in the path.
- The model is bounded by construction: vocab top-V, bigram table
  pruned at ``min_count`` (KenLM-style), feature buckets fixed at B.
  All model sides broadcast; the corpus never shuffles to be scored.
  The only wide exchanges are the model-count aggregates themselves
  (partial map-side combine on (prev,cur) / bucket keys).
- ``token_tv_divergence`` joins |groups|·|vocab-cap| count rows —
  model-sized, not corpus-sized.

Reference parity note: the reference repo has no curation surface
(internal/app/processor.go is a config-transform engine); this module
is part of the mandated training-data-pipeline extension (SURVEY.md
§2.11), built from the public CCNet (Wenzek et al. 2019) and DSIR
(Xie et al. 2023) recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens as _tokens
from .training import hash_bucket

# _tokens is the SHARED corpus tokenization (functions/text.py::tokens
# — whitespace split of trimmed text): importing it, rather than
# restating the split, makes the "same token stream as doc_top_terms /
# token_frequencies" claim structural (review catch).

UNK = "<unk>"


def _dstr(c):
    """Exact-decimal → double via the string route (int128→double
    direct casts differ at 1 ULP between engines; string parse is
    correctly rounded everywhere — the retrieval.py/BM25 device)."""
    return c.cast("string").cast("double")


def bigram_stream(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  extra_cols: list[str] | None = None) -> DataFrame:
    """(id, prev, cur) adjacent-token pairs, formed NARROW: the token
    array is zipped with its own tail in-row, then exploded — no
    per-doc window, no shuffle. Docs with <2 tokens contribute no
    rows (callers left-join back if they need empties)."""
    ts = _tokens(text_col)
    n = F.size(ts)
    pairs = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")))
    keep = [F.col(id_col)] + [F.col(c) for c in (extra_cols or [])]
    return (df.select(*keep, F.explode(pairs).alias("bg"))
              .select(*keep, F.col("bg.prev").alias("prev"),
                      F.col("bg.cur").alias("cur")))


def train_bigram_lm(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", vocab_size: int = 64,
                    min_count: int = 2, train_pct: int = 80,
                    ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count model for ``ngram_lm_score``: (vocab, bigram_counts,
    context_counts), all bounded, all broadcastable.

    - train split: md5-bucket(doc_id) < train_pct — the repo's
      engine-independent split coin (training.hash_bucket), so the
      DuckDB oracle reproduces membership bit-for-bit.
    - vocab: top ``vocab_size`` unigrams of the train split by
      (count DESC, term ASC) — the tiebreak makes the LIMIT
      deterministic in both engines. Out-of-vocab tokens map to
      ``<unk>`` BEFORE bigram formation (class-based smoothing).
    - bigram_counts: (prev, cur, c_bg) with c_bg >= min_count —
      KenLM-style pruning bounds the model independent of corpus
      size; pruned/absent bigrams fall back to the +1 smoothing
      floor at score time.
    - context_counts: (prev, c_ctx) — occurrences of prev AS A
      CONTEXT (i.e. over the bigram stream, not raw unigrams), which
      keeps Σ_cur p(cur|prev) <= 1 under pruning.
    """
    train = docs.filter(hash_bucket(id_col, 100) < train_pct)
    uni = train.select(F.explode(_tokens(text_col)).alias("term"))
    # Pin the model tables: they are MODEL-sized (vocab ≤ V rows, the
    # unpruned bigram grid ≤ (V+1)² rows) but referenced many times
    # downstream (vocab alone 5×: the two _unk_mapped sides at train
    # AND score time plus v_sz), and Catalyst replays the corpus
    # explode lineage per reference — 10 documents scans observed in
    # doc_lm_quality's executed plan before this pin (r9 audit). One
    # train-split explode for unigrams, one for bigrams, then every
    # consumer reads the pinned tables; swap localCheckpoint for
    # reliable checkpoint on a cluster.
    vocab = (uni.groupBy("term").agg(F.count("*").alias("cnt"))
             .orderBy(F.col("cnt").desc(), F.col("term"))
             .limit(vocab_size)
             .select("term")
             .localCheckpoint(eager=True))

    bg = _unk_mapped(bigram_stream(train, text_col, id_col), vocab)
    # both count tables from ONE aggregate of the bigram stream:
    # c_ctx(prev) = Σ_cur c_bg(prev, cur) over the UNPRUNED grid —
    # identical values to a second groupBy(prev) pass over the stream
    full_counts = (bg.groupBy("prev", "cur")
                   .agg(F.count("*").alias("c_bg"))
                   .localCheckpoint(eager=True))
    bigram_counts = full_counts.filter(F.col("c_bg") >= min_count)
    context_counts = (full_counts.groupBy("prev")
                      .agg(F.sum("c_bg").cast("bigint").alias("c_ctx")))
    return vocab, bigram_counts, context_counts


def _unk_mapped(bg: DataFrame, vocab: DataFrame) -> DataFrame:
    """Map both sides of the bigram stream onto vocab ∪ {<unk>} via
    two broadcast left joins (vocab is top-V — driver-bounded)."""
    vp = F.broadcast(vocab.select(F.col("term").alias("_vp")))
    vc = F.broadcast(vocab.select(F.col("term").alias("_vc")))
    return (
        bg.join(vp, bg.prev == vp._vp, "left")
          .join(vc, bg.cur == vc._vc, "left")
          .withColumn("prev", F.coalesce(F.col("_vp"), F.lit(UNK)))
          .withColumn("cur", F.coalesce(F.col("_vc"), F.lit(UNK)))
          .drop("_vp", "_vc"))


def score_with_model(docs: DataFrame, vocab: DataFrame,
                     bigram_counts: DataFrame, context_counts: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     extra_cols: list[str] | None = None) -> DataFrame:
    """Score documents against a PREBUILT bigram model — the serve
    half of ``ngram_lm_score`` (same Column algebra, so batch and
    streaming scores are bit-identical by construction). See
    ``ngram_lm_score`` for column semantics."""
    v_sz = F.broadcast(vocab.agg(F.count("*").alias("v_sz")))

    # only the id threads through the scoring aggregates; extra_cols
    # attach at the final spine join. Carrying extras through the
    # bigram explode + groupBy widened every internal shuffle tuple
    # AND built pathological downstream plans when callers joined the
    # result again (measured 14 s warm vs 0.2 s for 500 docs).
    bg = _unk_mapped(
        bigram_stream(docs, text_col, id_col), vocab)
    scored = (
        bg.join(F.broadcast(bigram_counts), ["prev", "cur"], "left")
          .join(F.broadcast(context_counts), ["prev"], "left")
          .withColumn("c_bg", F.coalesce(F.col("c_bg"), F.lit(0)))
          .withColumn("c_ctx", F.coalesce(F.col("c_ctx"), F.lit(0))))

    gcols = [id_col]
    per_doc = (
        scored.join(v_sz, F.lit(True))
        .groupBy(*gcols)
        .agg(F.count("*").alias("n_bigrams"),
             F.sum(F.when(F.col("cur") == UNK, 1).otherwise(0))
              .alias("n_oov"),
             F.sum("c_bg").alias("sum_bg"),
             F.sum("c_ctx").alias("sum_ctx"),
             # true cross-entropy: engine-side column (see docstring)
             (-F.sum(F.log2((F.col("c_bg") + 1).cast("double")
                            / (F.col("c_ctx") + F.col("v_sz") + 1)
                            .cast("double")))
              / F.count("*")).alias("xent_bits"),
             F.first("v_sz").alias("v_sz")))

    out_cols = [id_col] + list(extra_cols or [])
    spine = docs.select(
        *([F.col(c) for c in out_cols]
          + [F.size(_tokens(text_col)).cast("bigint").alias("n_tokens")]))
    num = (F.col("sum_bg") + F.col("n_bigrams")).cast("double")
    den = (F.col("sum_ctx")
           + F.col("n_bigrams") * (F.col("v_sz") + 1)).cast("double")
    return (
        spine.join(per_doc, gcols, "left")
        .select(*out_cols, "n_tokens",
                F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
                F.coalesce("sum_bg", F.lit(0)).alias("sum_bg"),
                F.coalesce("sum_ctx", F.lit(0)).alias("sum_ctx"),
                F.when(F.col("n_bigrams") > 0, num / den)
                 .alias("lm_score"),
                "xent_bits"))


def ngram_lm_score(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", vocab_size: int = 64,
                   min_count: int = 2, train_pct: int = 80,
                   extra_cols: list[str] | None = None) -> DataFrame:
    """Score every document against the count-pruned bigram LM —
    the CCNet quality-filtering signal (docs unlike the reference
    distribution score low; boilerplate/keyboard-mash scores lowest).

    Per doc: n_tokens, n_bigrams, n_oov (bigrams whose target token
    is OOV), sum_bg = Σ c_bg, sum_ctx = Σ c_ctx (both BIGINT-exact),
    and two scores:

    - ``lm_score``  = (sum_bg + n) / (sum_ctx + n·(V+1)): the
      aggregated Laplace likelihood — one division of two exact
      integers, bit-identical cross-engine (module doc). Higher =
      more in-distribution.
    - ``xent_bits`` = −(Σ log2 (c_bg+1)/(c_ctx+V+1)) / n: true
      per-token cross-entropy — engine-only (ln ULP), verified vs
      exact Python in tests; NULL when n = 0.

    Plan shape: model aggregates shuffle once each on their bounded
    keys and are PINNED (train_bigram_lm — one unigram + one bigram
    explode of the train split total, every consumer reads the
    model-sized tables); scoring is scan → narrow bigram explode →
    three broadcast joins → one groupBy(doc_id) partial agg → a
    doc_id-co-partitioned LeftOuter join back to the doc spine
    (corpus × per-doc scores — two corpus-sized tables, so the
    co-partitioned join is the honest 100 TB shape). At 100 TB you'd
    persist the model artifact itself, like the PQ codebook split in
    similarity.py.
    """
    vocab, bgc, ctx = train_bigram_lm(
        docs, text_col, id_col, vocab_size, min_count, train_pct)
    return score_with_model(docs, vocab, bgc, ctx,
                            text_col, id_col, extra_cols)


def dsir_importance(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", target_col: str = "lang",
                    target_value: str = "en", n_buckets: int = 512,
                    extra_cols: list[str] | None = None) -> DataFrame:
    """DSIR hashed-bigram importance weights (Xie et al. 2023):
    score each raw-corpus document by how target-like its hashed
    n-gram feature distribution is; resampling by this weight shifts
    the corpus toward the target domain.

    Features: every adjacent-token bigram hashes (md5 — engine-
    independent) into one of ``n_buckets`` buckets. The target
    distribution comes from rows where ``target_col == target_value``
    (a subset of the same corpus here; in production a separate
    high-quality corpus). Per bucket b with raw count cr_b / target
    count ct_b and totals Craw/Ctar, the (log-free) likelihood-ratio
    term is

        ratio_b = ((ct_b+1)·(Craw+B)) / ((cr_b+1)·(Ctar+B))

    — four exact-integer→double conversions, two products, one
    division: three IEEE roundings, bit-identical cross-engine. The
    per-doc weight is the mean ratio over its feature occurrences,
    decimal-cast-summed per the repo's order-independence rule:

        imp_score = Σ_occurrences DECIMAL(27,6)(ratio_bucket) / n

    (true DSIR averages log-ratios; the mean-ratio form is the
    monotone log-free surrogate — ordering agreement with the
    log form is asserted in tests on the fixture.)

    Plan: ONE pass builds both distributions (conditional agg by
    bucket — B-bounded), broadcast; scoring re-streams bigrams and
    aggregates per doc. No corpus shuffle except the two bounded
    groupBys.
    """
    bg = bigram_stream(docs, text_col, id_col,
                       [target_col] + list(extra_cols or []))
    feat = F.md5(F.concat_ws(" ", F.col("prev"), F.col("cur")))
    bucket = (F.conv(F.substring(feat, 1, 8), 16, 10).cast("long")
              % n_buckets)
    b = bg.withColumn("bucket", bucket)

    dist = (b.groupBy("bucket")
            .agg(F.count("*").alias("cr"),
                 F.sum(F.when(F.col(target_col) == target_value, 1)
                       .otherwise(0)).alias("ct")))
    totals = F.broadcast(dist.agg(F.sum("cr").alias("craw"),
                                  F.sum("ct").alias("ctar")))
    ratio = (
        ((F.col("ct") + 1).cast("double")
         * (F.col("craw") + n_buckets).cast("double"))
        / ((F.col("cr") + 1).cast("double")
           * (F.col("ctar") + n_buckets).cast("double")))
    # Pin the ratio table: it is B-bounded (≤ n_buckets rows) but its
    # lineage contains the corpus bigram explode, which Catalyst
    # replays once for the totals aggregate and once for the ratio
    # projection (3 documents scans observed, r9 audit). After the
    # pin: one explode builds the model, one scores — the two-pass
    # floor the module doc claims.
    rt = F.broadcast(
        dist.join(totals, F.lit(True))
        .select("bucket", ratio.alias("ratio"))
        .localCheckpoint(eager=True))

    gcols = [id_col, target_col] + list(extra_cols or [])
    return (
        b.join(rt, "bucket")
        .groupBy(*gcols)
        .agg(F.count("*").alias("n_feats"),
             (F.sum(F.col("ratio").cast("decimal(27,6)")).cast("double")
              / F.count("*")).alias("imp_score")))


def token_tv_divergence(docs: DataFrame, text_col: str = "text",
                        group_col: str = "source") -> DataFrame:
    """Pairwise total-variation distance between per-group token
    distributions — the drift monitor between corpus sources (run it
    before trusting corpus_mix_weights across snapshots).

    TV(a,b) = ½ Σ_t |p_a(t) − p_b(t)| computed EXACTLY on the common
    denominator: with per-group term counts c and totals C,

        S_ab = Σ_shared |c_a·C_b − c_b·C_a|
             + (C_a − Σ_shared c_a)·C_b + (C_b − Σ_shared c_b)·C_a
        tv   = S_ab / (2·C_a·C_b)

    so an INNER join on term covers the full support (terms private
    to one side fold into the complement products). Cross-products
    run in DECIMAL(38,0) (BIGINT would overflow at 100 TB counts);
    the single final division routes the decimal through the string
    cast (_dstr — int128→double direct casts differ at 1 ULP).

    Shapes: the count table is |groups|·|distinct terms| rows (term
    agg = one partial-combine shuffle); the pair join is model-sized.
    The groups×groups spine is a broadcast join of a |groups|-row
    aggregate with itself — driver-scale, never the corpus.
    """
    toks = docs.select(F.col(group_col).alias("g"),
                       F.explode(_tokens(text_col)).alias("term"))
    counts = toks.groupBy("g", "term").agg(F.count("*").alias("c"))
    # Materialize the domain-sized histogram ONCE: counts is consumed
    # by totals, both pair-join sides, and (via totals) the spine —
    # Catalyst cannot reuse a subplan across consumers, so without
    # this the corpus scan+explode+aggregate lineage re-ran SIX times
    # (observed in the executed plan, r9). After the aggregate the
    # frame is |groups|·|vocab| rows — domain-sized, cheap to pin;
    # swap localCheckpoint for reliable checkpoint on a cluster.
    counts = counts.localCheckpoint(eager=True)
    totals = counts.groupBy("g").agg(F.sum("c").alias("ctot"))

    a, bb = counts.alias("a"), counts.alias("bb")
    d38 = "decimal(38,0)"
    shared = (
        a.join(bb, (F.col("a.term") == F.col("bb.term"))
               & (F.col("a.g") < F.col("bb.g")))
        .join(F.broadcast(totals.select(F.col("g").alias("ga_t"),
                                        F.col("ctot").alias("ca"))),
              F.col("a.g") == F.col("ga_t"))
        .join(F.broadcast(totals.select(F.col("g").alias("gb_t"),
                                        F.col("ctot").alias("cb"))),
              F.col("bb.g") == F.col("gb_t"))
        .groupBy(F.col("a.g").alias("ga"), F.col("bb.g").alias("gb"))
        .agg(F.count("*").alias("shared_terms"),
             F.sum("a.c").alias("sa"), F.sum("bb.c").alias("sb"),
             F.sum(F.abs(F.col("a.c").cast(d38) * F.col("cb").cast(d38)
                         - F.col("bb.c").cast(d38)
                         * F.col("ca").cast(d38))).alias("sin")))

    ta = totals.select(F.col("g").alias("ga"), F.col("ctot").alias("ca"))
    tb = totals.select(F.col("g").alias("gb"), F.col("ctot").alias("cb"))
    spine = ta.join(F.broadcast(tb), F.col("ga") < F.col("gb"))
    s_total = (F.col("sin")
               + (F.col("ca").cast(d38) - F.col("sa").cast(d38))
               * F.col("cb").cast(d38)
               + (F.col("cb").cast(d38) - F.col("sb").cast(d38))
               * F.col("ca").cast(d38))
    return (
        spine.join(F.broadcast(shared), ["ga", "gb"], "left")
        .withColumn("sin", F.coalesce("sin", F.lit(0).cast(d38)))
        .withColumn("sa", F.coalesce("sa", F.lit(0)))
        .withColumn("sb", F.coalesce("sb", F.lit(0)))
        .withColumn("shared_terms",
                    F.coalesce("shared_terms", F.lit(0)))
        .select(F.col("ga").alias("source_a"),
                F.col("gb").alias("source_b"),
                F.col("shared_terms").cast("bigint").alias("shared_terms"),
                (s_total.cast("string").cast("double")
                 / (F.col("ca").cast("double") * F.col("cb").cast("double")
                    * F.lit(2.0))).alias("tv")))


def chi2_value_drift(df: DataFrame, value_col: str = "n_chars",
                     group_col: str = "source",
                     bin_width: int = 50) -> DataFrame:
    """Pairwise two-sample CHI-SQUARE homogeneity statistic between
    per-group distributions of a numeric property, over fixed-width
    integer bins (bin = value div bin_width) → (source_a, source_b,
    shared_bins, chi2) — the third drift monitor next to TV
    (token-frequency drift) and KS (CDF shape drift): χ² weights
    per-bin deviations by 1/expected, so it is the sensitive choice
    for tail-bin changes both TV and KS average away.

    χ²(a,b) = Σ_bins (n_a·N_b − n_b·N_a)² / (N_a·N_b·(n_a + n_b))
    — the standard two-sample form. Bins private to one side fold
    analytically: a bin with n_b = 0 contributes n_a·N_b/N_a, so the
    private mass folds into (N_a − Σ_shared n_a)·N_b/N_a per side
    (the token_tv_divergence complement device — the pair join stays
    INNER on the shared support).

    Cross-engine exactness (the BM25/DSIR device): the per-bin
    difference and the N_a·N_b product are EXACT DECIMAL(38,0)
    integers (headroom: totals ≤ 1e19), string-routed to double
    (correctly-rounded parse); the per-bin term is then two IEEE
    multiplies + one divide of identical doubles, quantized to
    DECIMAL(27,6) and summed EXACTLY (order-free); the two private
    folds quantize the same way. Bit-identical in Spark and DuckDB.

    Shapes: the count table is |groups|·|bins| rows (one
    partial-combine shuffle; bins are value-range/bin_width — tiny);
    everything downstream is bin-table-sized, the spine broadcast.
    """
    # exact integer FLOOR division — the deliberate binning contract:
    # bare `div` would merge -bin_width+1..bin_width-1 into one bin 0
    # twice as wide as every other. NOTE (r12, verified on duckdb
    # 1.0.0): DuckDB's `//` TRUNCATES toward zero exactly like
    # Spark's `div` (-7 // 2 = -3), so an oracle must apply the SAME
    # remainder correction below — a bare `//` oracle silently
    # truncates and diverges on negatives (engine-vs-engine pinned by
    # test_chi2_negative_bins_match_duckdb). floor(x/w) for w > 0 is
    # x div w minus 1 when the truncated remainder is negative.
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    _q = F.expr(f"cast({value_col} as bigint) div {bin_width}")
    _r = F.expr(f"cast({value_col} as bigint) % {bin_width}")
    binc = F.when(_r < 0, _q - 1).otherwise(_q)
    counts = (df.select(F.col(group_col).alias("g"),
                        binc.alias("x"))
              .groupBy("g", "x").agg(F.count("*").alias("c")))
    return chi2_from_counts(counts)


def chi2_from_counts(counts: DataFrame) -> DataFrame:
    """χ² readout from a (g, x, c) histogram table — the
    finish-from-the-sink half shared by ``chi2_value_drift`` (batch;
    x = the bin index) and ``streaming_value_histogram``'s
    complete-mode sink (bin the stream value first: the histogram is
    a plain additive aggregate, so the streamed state is
    bit-identical to the batch histogram and this readout gives the
    same χ² rows — tested). Everything here is bin-table-sized."""
    d38 = "decimal(38,0)"
    # bin-table-sized; pinned once for its four consumers (the
    # token_tv_divergence no-subplan-reuse lesson)
    counts = counts.localCheckpoint(eager=True)
    totals = counts.groupBy("g").agg(F.sum("c").alias("ctot"))

    a, bb = counts.alias("a"), counts.alias("bb")
    diff = F.abs(F.col("a.c").cast(d38) * F.col("cb").cast(d38)
                 - F.col("bb.c").cast(d38) * F.col("ca").cast(d38))
    dnn = _dstr((F.col("ca").cast(d38) * F.col("cb").cast(d38)))
    term = ((_dstr(diff) * _dstr(diff))
            / (dnn * (F.col("a.c") + F.col("bb.c")).cast("double"))
            ).cast("decimal(27,6)")
    shared = (
        a.join(bb, (F.col("a.x") == F.col("bb.x"))
               & (F.col("a.g") < F.col("bb.g")))
        .join(F.broadcast(totals.select(F.col("g").alias("ga_t"),
                                        F.col("ctot").alias("ca"))),
              F.col("a.g") == F.col("ga_t"))
        .join(F.broadcast(totals.select(F.col("g").alias("gb_t"),
                                        F.col("ctot").alias("cb"))),
              F.col("bb.g") == F.col("gb_t"))
        .groupBy(F.col("a.g").alias("ga"), F.col("bb.g").alias("gb"))
        .agg(F.count("*").alias("shared_bins"),
             F.sum("a.c").alias("sa"), F.sum("bb.c").alias("sb"),
             F.sum(term).alias("s_shared")))

    ta = totals.select(F.col("g").alias("ga"), F.col("ctot").alias("ca"))
    tb = totals.select(F.col("g").alias("gb"), F.col("ctot").alias("cb"))
    spine = ta.join(F.broadcast(tb), F.col("ga") < F.col("gb"))
    fold = lambda n, s, other, own: (  # noqa: E731
        _dstr((n.cast(d38) - s.cast(d38)) * other.cast(d38))
        / own.cast("double")).cast("decimal(27,6)")
    q0 = F.lit(0).cast("decimal(27,6)")
    chi2 = (F.coalesce(F.col("s_shared"), q0)
            + fold(F.col("ca"), F.coalesce(F.col("sa"), F.lit(0)),
                   F.col("cb"), F.col("ca"))
            + fold(F.col("cb"), F.coalesce(F.col("sb"), F.lit(0)),
                   F.col("ca"), F.col("cb")))
    return (
        spine.join(F.broadcast(shared), ["ga", "gb"], "left")
        .select(F.col("ga").alias("source_a"),
                F.col("gb").alias("source_b"),
                F.coalesce("shared_bins", F.lit(0)).cast("bigint")
                .alias("shared_bins"),
                _dstr(chi2).alias("chi2")))


def ks_value_drift(df: DataFrame, value_col: str = "n_chars",
                   group_col: str = "source") -> DataFrame:
    """Pairwise two-sample Kolmogorov-Smirnov statistic between
    per-group distributions of an integer-valued column — the
    SHAPE-sensitive drift monitor next to ``token_tv_divergence``
    (TV sees symbol-frequency drift; KS sees distributional shift of
    a numeric property like document length).

    D_ab = max_x |F_a(x) − F_b(x)| computed EXACTLY on the common
    denominator: with cumulative counts c_g(x) and totals n_g,

        d_num(x) = |c_a(x)·n_b − c_b(x)·n_a|     (DECIMAL(38,0))
        D        = max_x d_num(x) / (n_a·n_b)

    plus ``ks_at`` = the smallest x attaining the max (deterministic
    location). Cross-products are exact integers; the single final
    division routes the decimal through the string cast.

    Shapes (100 TB posture): the histogram aggregate is the only
    corpus-wide exchange (partial map-side combine on (g, x)); the
    densified grid is |groups|·|distinct values| rows — value-DOMAIN-
    sized, not corpus-sized (doc lengths, scores, …) — so the per-
    group cumulative window and the pair join are model-sized. For
    continuous doubles, bucket first (the KS of the bucketed CDF
    bounds the true D within one bucket's mass).
    """
    counts = (df.select(F.col(group_col).alias("g"),
                        F.col(value_col).alias("x"))
              .groupBy("g", "x").agg(F.count("*").alias("c")))
    return ks_from_counts(counts)


def ks_from_counts(counts: DataFrame) -> DataFrame:
    """KS readout from a (g, x, c) histogram table — the
    finish-from-the-sink half shared by ``ks_value_drift`` (batch)
    and ``streaming_value_histogram``'s complete-mode sink (the
    histogram is a plain additive aggregate, so the streamed state is
    bit-identical to the batch histogram and this readout gives the
    same KS rows — tested). Everything here is value-domain-sized."""
    # Materialize the histogram ONCE (|groups|·|distinct values| rows
    # — value-DOMAIN-sized): counts feeds totals, the grid, the spine
    # and the cumulative join, and Catalyst re-runs the upstream
    # (possibly corpus-scanning) lineage per consumer — 16 scans
    # observed in source_ks_drift's executed plan before this pin
    # (r9). One upstream pass total, and the self-join below never
    # sees conflicting references; swap localCheckpoint for reliable
    # checkpoint on a cluster.
    counts = counts.localCheckpoint(eager=True)
    totals = counts.groupBy("g").agg(F.sum("c").alias("n"))
    grid = counts.select("x").distinct()
    spine = grid.crossJoin(F.broadcast(totals.select("g")))
    from pyspark.sql.window import Window
    w = (Window.partitionBy("g").orderBy("x")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (spine.join(counts, ["g", "x"], "left")
           .withColumn("c", F.coalesce("c", F.lit(0)))
           .withColumn("cum", F.sum("c").over(w)))

    d38 = "decimal(38,0)"
    a = cum.select(F.col("g").alias("ga"), "x", F.col("cum").alias("ca"))
    b = cum.select(F.col("g").alias("gb"), F.col("x").alias("xb"),
                   F.col("cum").alias("cb"))
    ta = F.broadcast(totals.select(F.col("g").alias("ga"),
                                   F.col("n").alias("na")))
    tb = F.broadcast(totals.select(F.col("g").alias("gb"),
                                   F.col("n").alias("nb")))
    diffs = (a.join(b, (F.col("x") == F.col("xb"))
                    & (F.col("ga") < F.col("gb")))
             .join(ta, "ga").join(tb, "gb")
             .select("ga", "gb", "na", "nb", "x",
                     F.abs(F.col("ca").cast(d38) * F.col("nb").cast(d38)
                           - F.col("cb").cast(d38)
                           * F.col("na").cast(d38)).alias("d_num")))
    dmax = (diffs.groupBy("ga", "gb", "na", "nb")
            .agg(F.max("d_num").alias("d_max")))
    return (diffs.join(dmax, ["ga", "gb", "na", "nb"])
            .filter(F.col("d_num") == F.col("d_max"))
            .groupBy("ga", "gb", "na", "nb", "d_max")
            .agg(F.min("x").alias("ks_at"))
            .select(F.col("ga").alias("source_a"),
                    F.col("gb").alias("source_b"),
                    F.col("na").cast("bigint").alias("n_a"),
                    F.col("nb").cast("bigint").alias("n_b"),
                    F.col("ks_at").cast("bigint").alias("ks_at"),
                    (F.col("d_max").cast("string").cast("double")
                     / (F.col("na").cast("double")
                        * F.col("nb").cast("double"))).alias("ks")))


def repetition_signals(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       top_ns: tuple = (2, 3),
                       dup_ns: tuple = (5,)) -> DataFrame:
    """Within-document repetition quality signals (Rae et al. 2021
    "Gopher", Table A1; the RefinedWeb/DataTrove filter family) — the
    classic pre-training filters for boilerplate-heavy and
    degenerate-repetition docs:

    - ``dup_line_frac``: line occurrences beyond the first / lines
      (lines split on '\\n'; Σ(count−1) over duplicated lines).
    - ``dup_line_char_frac``: characters in those beyond-first line
      occurrences / Σ line characters.
    - ``top{n}gram_char_frac`` (n ∈ top_ns): characters covered by
      the single most frequent word n-gram (count × gram token
      chars, separators excluded) / Σ token chars — 0 unless that
      gram occurs ≥ 2 times (a unique gram is not repetition; without
      this rule every short doc tops the threshold spuriously).
      Tie-break: the lexicographically smallest gram among the most
      frequent.
    - ``dup{n}gram_char_frac`` (n ∈ dup_ns): characters of token
      POSITIONS covered by any n-gram occurring more than once /
      Σ token chars — positions union so overlapping duplicated
      grams never double-count (the Gopher "careful not to double
      count" rule).

    All numerators/denominators are exact BIGINTs; each fraction is
    ONE int/int IEEE division (exact ints < 2^53 ⇒ correctly rounded
    and bit-identical cross-engine). Empty docs (0 token chars)
    score 0.0 everywhere, guarded at the EXPRESSION level (ANSI).

    Shapes at 100 TB: line signals are pure in-row array expressions
    (zero shuffle). Each top-n signal is one explode + per-(doc,
    gram) count — all of a doc's grams originate from one row, so
    map-side partial aggregation collapses them before the shuffle,
    which carries only distinct grams per doc. Each dup-n signal
    shuffles its gram stream once (Window keyed by (doc_id, gram) —
    occurrence positions must meet their count); the dup-position
    union folds back as a per-doc collect_set (≤ n_tokens ints)
    joined doc-sized. Every Window/aggregate is per-doc — no global
    exchange anywhere; the corpus text is scanned ONCE (base pin)."""
    from pyspark.sql import Window

    zero = F.lit(0).cast("bigint")
    txt = F.coalesce(F.col(text_col), F.lit(""))  # NULL text ≡ empty
    base = (docs.select(F.col(id_col).alias("doc_id"),
                        _tokens(txt).alias("w"),
                        F.split(txt, "\n").alias("lines"))
            .withColumn("n_tokens", F.size("w").cast("bigint"))
            .withColumn("tok_chars", F.expr(
                "aggregate(w, 0L, (a, x) -> a + length(x))"))
            .withColumn("line_chars", F.expr(
                "aggregate(lines, 0L, (a, x) -> a + length(x))"))
            .withColumn("dup_lines",
                        (F.size("lines")
                         - F.size(F.array_distinct("lines")))
                        .cast("bigint"))
            .withColumn("dup_line_chars", F.col("line_chars") - F.expr(
                "aggregate(array_distinct(lines), 0L,"
                " (a, x) -> a + length(x))")))
    # grams are formed IN-ROW (transform over start offsets), one
    # explode per n; the (doc, gram) count collapses map-side
    base = base.localCheckpoint(eager=True)  # one corpus scan total

    def _grams(n: int):
        # guard size(w) >= n: sequence(0, negative) DESCENDS in Spark
        return base.select(
            "doc_id",
            F.expr(f"case when size(w) >= {n} then"
                   f" transform(sequence(0, size(w) - {n}),"
                   f" i -> struct(i AS i,"
                   f" concat_ws(' ', slice(w, i + 1, {n})) AS g))"
                   f" else array() end")
            .alias("gs")).select(
                "doc_id", F.explode("gs").alias("s")).select(
                "doc_id", F.col("s.i").alias("i"), F.col("s.g").alias("g"))

    out = base
    for n in top_ns:
        top = (_grams(n).groupBy("doc_id", "g")
               .agg(F.count("*").alias("cnt"))
               .groupBy("doc_id")
               .agg(F.min(F.struct((-F.col("cnt")).alias("nc"),
                                   F.col("g"))).alias("m"))
               .select("doc_id",
                       F.when(-F.col("m.nc") >= 2,
                              (-F.col("m.nc"))
                              * (F.length("m.g") - F.lit(n - 1)))
                       .otherwise(F.lit(0))
                       .cast("bigint").alias(f"_top{n}")))
        out = out.join(top, "doc_id", "left")
    for n in dup_ns:
        g = _grams(n)
        cnt = F.count("*").over(
            Window.partitionBy("doc_id", "g"))
        dup_pos = (g.withColumn("cnt", cnt)
                   .filter(F.col("cnt") > 1)
                   .select("doc_id", F.explode(
                       F.expr(f"sequence(i, i + {n - 1})")).alias("p"))
                   .groupBy("doc_id")
                   .agg(F.collect_set("p").alias("ps")))
        dup = (base.select("doc_id", "w").join(dup_pos, "doc_id")
               .select("doc_id", F.expr(
                   "aggregate(ps, 0L,"
                   " (a, p) -> a + length(element_at(w, p + 1)))")
                   .alias(f"_dup{n}")))
        out = out.join(dup, "doc_id", "left")

    def frac(num, den):
        return F.when(den > 0, F.coalesce(num, zero).cast("double")
                      / den.cast("double")).otherwise(F.lit(0.0))

    return out.select(
        "doc_id", "n_tokens",
        F.size("lines").cast("bigint").alias("n_lines"),
        frac(F.col("dup_lines"), F.size("lines").cast("bigint"))
        .alias("dup_line_frac"),
        frac(F.col("dup_line_chars"), F.col("line_chars"))
        .alias("dup_line_char_frac"),
        *[frac(F.col(f"_top{n}"), F.col("tok_chars"))
          .alias(f"top{n}gram_char_frac") for n in top_ns],
        *[frac(F.col(f"_dup{n}"), F.col("tok_chars"))
          .alias(f"dup{n}gram_char_frac") for n in dup_ns])


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and",
                    "that", "have", "with")


def quality_signals(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_words: int = 50, max_words: int = 100_000,
                    min_mwl: float = 3.0, max_mwl: float = 10.0,
                    max_symbol_ratio: float = 0.1,
                    max_bullet_frac: float = 0.9,
                    max_ellipsis_frac: float = 0.3,
                    min_alpha_frac: float = 0.8,
                    min_stop_hits: int = 2) -> DataFrame:
    """The heuristic half of Gopher's Table A1 quality filters (Rae
    et al. 2021) — the companion of ``repetition_signals``: per doc,

    - ``n_words`` and ``mean_word_len`` (token chars / tokens);
    - ``symbol_word_ratio``: '#' and '...' occurrences / words
      (non-overlapping left-to-right '...' count via replace — the
      same greedy rule both engines);
    - ``bullet_line_frac`` / ``ellipsis_line_frac``: lines starting
      with a bullet ('•', '-', '*') / ending with '...' or '…';
    - ``alpha_word_frac``: words containing ≥1 ASCII letter;
    - ``stop_hits``: how many of Gopher's eight required stopwords
      appear (the paper keeps docs with ≥ 2);
    - ``keep``: the paper's conjunction (thresholds are keyword
      params defaulting to Gopher's published cutoffs) —
      50 ≤ words ≤ 100 000, 3 ≤ mean word length ≤ 10, symbol ratio
      ≤ 0.1, bullet lines ≤ 90 %, ellipsis lines ≤ 30 %, alpha words
      ≥ 80 %, stop_hits ≥ 2.

    Every count is an exact BIGINT formed in-row; each ratio is one
    int/int IEEE division compared against the same double literal on
    both engines ⇒ keep/drop verdicts are bit-reproducible. Zero
    shuffle: the whole operator is per-row Column algebra (contrast
    repetition_signals' per-doc aggregates) — at 100 TB this is a
    map-only pass that fuses into whatever scan feeds it."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    w, lines = _tokens(txt), F.split(txt, "\n")
    n_words = F.size(w).cast("bigint")
    tok_chars = F.expr("aggregate(W, 0L, (a, x) -> a + length(x))")
    n_lines = F.size(lines).cast("bigint")

    d = docs.select(
        F.col(id_col).alias("doc_id"), w.alias("W"),
        lines.alias("LS"), n_words.alias("n_words"),
        n_lines.alias("n_lines"), txt.alias("T"))
    d = d.select(
        "doc_id", "n_words", "n_lines",
        tok_chars.alias("tok_chars"),
        ((F.length("T") - F.length(F.replace(F.col("T"), F.lit("#"),
                                             F.lit(""))))
         + (F.length("T") - F.length(F.replace(F.col("T"), F.lit("..."),
                                               F.lit("")))) / F.lit(3))
        .cast("bigint").alias("n_symbols"),
        F.size(F.filter("LS", lambda x: F.ltrim(x).startswith("•")
                        | F.ltrim(x).startswith("-")
                        | F.ltrim(x).startswith("*")))
        .cast("bigint").alias("n_bullet"),
        F.size(F.filter("LS", lambda x: F.rtrim(x).endswith("...")
                        | F.rtrim(x).endswith("…")))
        .cast("bigint").alias("n_ellipsis"),
        F.size(F.filter("W", lambda x: x.rlike("[a-zA-Z]")))
        .cast("bigint").alias("n_alpha"),
        sum((F.array_contains("W", s).cast("int")
             for s in GOPHER_STOPWORDS), F.lit(0))
        .cast("bigint").alias("stop_hits"))

    def frac(num, den):
        return F.when(den > 0, num.cast("double") / den.cast("double")) \
                .otherwise(F.lit(0.0))

    mwl = frac(F.col("tok_chars"), F.col("n_words"))
    sym = frac(F.col("n_symbols"), F.col("n_words"))
    bul = frac(F.col("n_bullet"), F.col("n_lines"))
    ell = frac(F.col("n_ellipsis"), F.col("n_lines"))
    alp = frac(F.col("n_alpha"), F.col("n_words"))
    keep = ((F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
            & (mwl >= min_mwl) & (mwl <= max_mwl)
            & (sym <= max_symbol_ratio) & (bul <= max_bullet_frac)
            & (ell <= max_ellipsis_frac) & (alp >= min_alpha_frac)
            & (F.col("stop_hits") >= min_stop_hits))
    return d.select(
        "doc_id", "n_words", mwl.alias("mean_word_len"),
        sym.alias("symbol_word_ratio"), bul.alias("bullet_line_frac"),
        ell.alias("ellipsis_line_frac"), alp.alias("alpha_word_frac"),
        "stop_hits", keep.alias("keep"))


def reference_shingles(ref: DataFrame, n: int = 3,
                       text_col: str = "text") -> DataFrame:
    """(sh) — the DISTINCT word n-gram set of a reference corpus, the
    static artifact the novelty score probes. Split out so the batch
    operator and the streaming gate share one construction (eval
    corpora are bounded by definition, so this set broadcasts /
    persists as a model side)."""
    from ..functions.text import shingles
    return (ref.filter(F.col(text_col).isNotNull())
            .select(F.explode(shingles(text_col, n)).alias("sh"))
            .distinct())


def novelty_against(docs: DataFrame, ref_sh: DataFrame, n: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Score ``docs`` against a prebuilt ``reference_shingles`` set —
    the scoring half of ``ngram_novelty`` (module contract there);
    reused verbatim by the streaming gate so a streamed doc's score
    is bit-identical to the batch operator's."""
    from ..functions.text import shingles

    t = (docs.filter(F.col(text_col).isNotNull())
         .select(F.col(id_col).alias("doc_id"),
                 F.explode(shingles(text_col, n)).alias("sh")))
    seen = F.broadcast(ref_sh.withColumn("hit", F.lit(1)))
    return (t.join(seen, "sh", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shingles"),
                 F.count("hit").alias("n_seen"))
            .select("doc_id",
                    F.col("n_shingles").cast("bigint").alias("n_shingles"),
                    F.col("n_seen").cast("bigint").alias("n_seen"),
                    ((F.col("n_shingles") - F.col("n_seen"))
                     .cast("double")
                     / F.col("n_shingles").cast("double"))
                    .alias("novelty")))


def ngram_novelty(train: DataFrame, ref: DataFrame, n: int = 3,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus →
    (doc_id, n_shingles, n_seen, novelty) — the doc-level
    decontamination/freshness signal next to the pair-level
    contamination check: novelty = fraction of a doc's DISTINCT word
    n-grams absent from the reference's n-gram set (novelty ≈ 0 ⇒
    the doc is assembled from reference phrases — an eval-set leak or
    boilerplate; ≈ 1 ⇒ genuinely new text). The mirror image of Lee
    et al. 2022-style overlap scoring, kept exact: integer shingle
    counts, ONE IEEE division (bit-identical cross-engine).

    Docs with < n tokens yield no shingles and are excluded (no
    denominator exists); NULL-text docs likewise.

    Shapes (100 TB posture): the train corpus crosses ONE exchange
    (the per-doc distinct-shingle aggregate); the reference n-gram
    set is an eval/held-out corpus — bounded by definition — so its
    distinct set BROADCASTS and the membership probe is a map-side
    hash lookup, never a corpus shuffle. For a reference too big to
    broadcast, swap the broadcast for a Bloom-filter prefilter +
    equi-join (the bloom_semi_join_agg pattern) — same semantics.
    """
    return novelty_against(train, reference_shingles(ref, n, text_col),
                           n, text_col, id_col)


def vocab_growth_curve(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       steps: int = 10) -> DataFrame:
    """Heaps'-law vocabulary growth over NESTED deterministic
    subsamples → (sample_pct, n_docs, n_tokens, n_vocab, ttr) — the
    corpus-analysis curve that says whether a corpus keeps yielding
    new vocabulary as it grows (tokenizer sizing, dedup saturation,
    diminishing-returns checks before buying more data).

    A literal prefix curve (vocab after the first k documents) needs
    a GLOBAL document rank — a one-task sort at corpus scale. The
    scale-correct estimator subsamples instead: bucket every doc by
    the md5 coin (``hash_bucket``, the repo's engine-exact split
    device), and step k reads the nested uniform sample
    {docs: bucket < k}, k = 1..steps. Each step is a k/steps uniform
    sample, the samples nest (the curve is monotone by construction),
    and everything is exact integers:

        n_vocab(k) = |{terms whose MINIMUM bucket < k}|

    so ONE corpus token pass (term → min-bucket aggregate) serves all
    steps; docs/tokens come from one doc-level pass; the step grid is
    ``steps`` rows broadcast against the vocabulary-sized min-bucket
    table. ``ttr`` (type-token ratio, the raw Heaps signal) is one
    IEEE division of exact integers — bit-identical cross-engine.
    NULL-text docs are excluded throughout.
    """
    if 100 % steps:
        raise ValueError(f"steps must divide 100 (sample_pct is an "
                         f"exact integer percent): got {steps}")
    base = _bucketed_tokens(docs, text_col, id_col, steps)
    per_bucket = bucket_sizes(base)
    term_fb = term_first_bucket(base)
    return vocab_growth_from_state(per_bucket, term_fb, steps)


def _bucketed_tokens(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     steps: int = 10) -> DataFrame:
    """(b, ts) — md5 sample bucket + token array per non-NULL doc;
    the shared projection under both state aggregates (batch and
    streaming), so the two can never drift on bucket/tokenization
    semantics."""
    from .training import hash_bucket
    return (docs.filter(F.col(text_col).isNotNull())
            .select(hash_bucket(id_col, steps).alias("b"),
                    _tokens(text_col).alias("ts")))


def bucket_sizes(base: DataFrame) -> DataFrame:
    """(b, docs, toks) — per-bucket doc/token counts. Plain additive
    aggregate ⇒ runs as bounded-state streaming (``steps`` rows)
    bit-identical to batch."""
    return (base.groupBy("b")
            .agg(F.count("*").alias("docs"),
                 F.sum(F.size("ts")).alias("toks")))


def term_first_bucket(base: DataFrame) -> DataFrame:
    """(term, fb) — each term's MINIMUM sample bucket. min is
    commutative/associative/idempotent ⇒ runs as bounded-state
    streaming (|vocab| rows) bit-identical to batch, replay-immune
    even without exactly-once."""
    return (base.select("b", F.explode("ts").alias("term"))
            .groupBy("term").agg(F.min("b").alias("fb")))


def vocab_growth_from_state(per_bucket: DataFrame, term_fb: DataFrame,
                            steps: int = 10) -> DataFrame:
    """Curve readout from the two state tables — the
    finish-from-the-sink half shared by ``vocab_growth_curve`` and
    the streaming twin (streaming/sketches.py::streaming_vocab_state;
    both aggregates are mergeable, so complete-mode sinks feed this
    bit-identically). Everything here is steps/vocabulary-sized."""
    grid = F.broadcast(
        per_bucket.sparkSession.range(1, steps + 1)
        .select(F.col("id").cast("int").alias("k")))
    sizes = (per_bucket.join(grid, F.col("b") < F.col("k"))
             .groupBy("k").agg(F.sum("docs").alias("n_docs"),
                               F.sum("toks").alias("n_tokens")))
    vocab = (term_fb.join(grid, F.col("fb") < F.col("k"))
             .groupBy("k").agg(F.count("*").alias("n_vocab")))
    return (sizes.join(vocab, "k")
            .select((F.col("k").cast("bigint") * (100 // steps))
                    .alias("sample_pct"),
                    F.col("n_docs").cast("bigint").alias("n_docs"),
                    F.col("n_tokens").cast("bigint").alias("n_tokens"),
                    F.col("n_vocab").cast("bigint").alias("n_vocab"),
                    (F.col("n_vocab").cast("double")
                     / F.col("n_tokens").cast("double")).alias("ttr")))


# Decimal headroom for pmi_from_counts' cross-products: the largest
# exact integer formed is num = c_ab·T_uni² ≤ T_uni³ (c_ab ≤ T_bi <
# T_uni) and den = c_a·c_b·T_bi ≤ T_uni³, so DECIMAL(38,0) holds both
# exactly while T_uni ≤ 4.6e12 ((4.6e12)³ ≈ 9.7e37 < 10³⁸) — a
# 4.6-trillion-token corpus, ~300× the fixture's 100 TB target at
# ~60 tokens/doc. Enforced at runtime (the EWMA runtime-bounds
# precedent, operators/timeseries.py): past the bound, shard the
# corpus or drop T_uni² to T_uni with a rescaled min_count.
PMI_MAX_TOTAL_TOKENS = 4_600_000_000_000


def pmi_collocations(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", min_count: int = 5,
                     k: int = 50) -> DataFrame:
    """Top-k adjacent-token collocations by pointwise mutual
    information → (rank, prev, cur, n_pair, n_prev, n_cur, score) —
    the standard collocation-extraction pass a corpus analysis runs
    (Church & Hanks 1990) and the vocabulary-building signal for
    multi-word tokenizer merges.

    PMI(a,b) = log p(a,b) / (p(a)·p(b)). The log's ARGUMENT is
    ranked directly (the repo's DSIR/BM25 device — log is monotone,
    so ranking is unchanged and the score stays oracle-exact):

        score = (c_ab · T_uni · T_uni) / (c_a · c_b · T_bi)

    with c_ab adjacent-pair counts over the bigram stream, c_a/c_b
    unigram counts, T_bi/T_uni the respective totals — exact
    DECIMAL(38,0) integer cross-products, ONE string-routed IEEE
    division (bit-identical cross-engine). ``min_count`` prunes
    rare-pair noise BEFORE the ratio (the classic PMI
    low-frequency-bias control); ranks break ties on (prev, cur).

    Shapes (100 TB posture): one narrow bigram explode + one
    partial-agg shuffle, one token explode + shuffle — corpus-sized
    data crosses exactly two exchanges, each aggregated ONCE. Each
    aggregate runs as GROUPING SETS ((keys), ()) so the grand total
    (T_bi / T_uni) lands in the SAME job as the counts, and only the
    min_count SURVIVORS plus the one total row are pinned — the
    UNPRUNED pair table (the largest intermediate) is never stored
    anywhere (r11, ADVICE; the r10 version localCheckpointed it —
    corpus-vocabulary²-bounded rows into executor-local non-fault-
    tolerant storage). Everything downstream is survivor-sized, and
    the global top-k is a distributed TakeOrderedAndProject
    (per-partition top-k, one k-row merge) — never a
    single-partition sort of the pair table.
    """
    bg = bigram_stream(docs, text_col, id_col)
    # ONE aggregation job yields pair counts AND the unpruned grand
    # total (grouping_id 3 = the () set); pin survivors + total only
    gs_pairs = (bg.groupingSets([["prev", "cur"], []], "prev", "cur")
                .agg(F.count("*").alias("n_pair"),
                     F.grouping_id().alias("gid")))
    pairs = (gs_pairs.filter((F.col("gid") == 3)
                             | (F.col("n_pair") >= min_count))
             .localCheckpoint(eager=True))
    t_bi = (pairs.filter(F.col("gid") == 3)
            .select(F.col("n_pair").alias("t_bi")))
    pruned = (pairs.filter(F.col("gid") == 0)
              .select("prev", "cur", "n_pair"))
    # unigram side: the vocabulary is needed whole (both broadcast
    # join sides), so the pin is vocabulary-sized + one total row
    gs_uni = (docs.select(F.explode(_tokens(text_col)).alias("term"))
              .groupingSets([["term"], []], "term")
              .agg(F.count("*").alias("n_term"),
                   F.grouping_id().alias("gid"))
              .localCheckpoint(eager=True))
    t_uni = (gs_uni.filter(F.col("gid") == 1)
             .select(F.col("n_term").alias("t_uni")))
    uni = gs_uni.filter(F.col("gid") == 0).select("term", "n_term")
    return _pmi_score(pruned, uni, _pmi_totals(t_bi, t_uni), k)


def pmi_from_counts(pair_counts: DataFrame, uni: DataFrame,
                    min_count: int = 5, k: int = 50) -> DataFrame:
    """PMI readout from UNPRUNED (prev, cur, n_pair) bigram counts
    and (term, n_term) unigram counts — the finish-from-the-sink half
    (the ``ks_from_counts`` pattern): both count tables are plain
    additive aggregates, so a streaming complete-mode sink feeds the
    same readout bit-identically. Everything here is bigram-TYPE /
    vocabulary-sized, never corpus-sized — the inputs are already
    MATERIALIZED count tables (a sink, a stored aggregate), which is
    why the multi-consumer pin below is bounded; the batch operator
    (``pmi_collocations``) does NOT route corpus lineage through
    here — it computes totals in the same grouping-sets job as the
    counts so the unpruned pair table is never stored (r11).

    T_bi = Σ n_pair over the UNPRUNED counts (the true pair mass, not
    the min_count survivors'); T_uni = Σ n_term. Decimal headroom is
    runtime-enforced (``PMI_MAX_TOTAL_TOKENS``): the job fails loudly
    the moment T_uni³ could overflow DECIMAL(38,0) instead of
    silently nulling scores.
    """
    # Pin both count tables ONCE: each is read by multiple consumers
    # (pair_counts → T_bi + the pruned score input; uni → T_uni + the
    # two broadcast sides), and Catalyst replays the upstream lineage
    # per consumer (the same no-subplan-reuse pattern pinned in
    # ks/tv/bigram-lm, r9). Bigram-type-sized pins (see docstring).
    pair_counts = pair_counts.localCheckpoint(eager=True)
    uni = uni.localCheckpoint(eager=True)
    t_bi = pair_counts.agg(F.sum("n_pair").alias("t_bi"))
    t_uni = uni.agg(F.sum("n_term").alias("t_uni"))
    pruned = pair_counts.filter(F.col("n_pair") >= min_count)
    return _pmi_score(pruned, uni, _pmi_totals(t_bi, t_uni), k)


def _pmi_totals(t_bi: DataFrame, t_uni: DataFrame) -> DataFrame:
    """Broadcast one-row (t_bi, t_uni) totals with the
    ``PMI_MAX_TOTAL_TOKENS`` headroom guard riding the row (evaluated
    once; folded into t_bi so column pruning can never drop it).
    Shared by the batch and finish-from-the-sink paths."""
    totals = t_bi.crossJoin(t_uni)
    guard = F.assert_true(
        F.col("t_uni") <= F.lit(PMI_MAX_TOTAL_TOKENS),
        F.concat(F.lit("pmi decimal headroom exceeded: t_uni="),
                 F.col("t_uni").cast("string"),
                 F.lit(f" > {PMI_MAX_TOTAL_TOKENS}"
                       " (T_uni^3 would overflow DECIMAL(38,0))")))
    return F.broadcast(totals.select(
        F.when(guard.isNull(), F.col("t_bi")).alias("t_bi"), "t_uni"))


def _pmi_score(pruned: DataFrame, uni: DataFrame, totals: DataFrame,
               k: int) -> DataFrame:
    """Shared PMI scoring tail: min_count-pruned (prev, cur, n_pair)
    × broadcast unigram sides × broadcast totals → exact-decimal
    surrogate scores, distributed top-k, rank. ONE expression tree
    for the batch and finish-from-the-sink paths ⇒ bit-identity
    between them holds by construction."""
    d38 = "decimal(38,0)"
    ua = F.broadcast(uni.select(F.col("term").alias("prev"),
                                F.col("n_term").alias("n_prev")))
    ub = F.broadcast(uni.select(F.col("term").alias("cur"),
                                F.col("n_term").alias("n_cur")))
    num = (F.col("n_pair").cast(d38) * F.col("t_uni").cast(d38)
           * F.col("t_uni").cast(d38))
    den = (F.col("n_prev").cast(d38) * F.col("n_cur").cast(d38)
           * F.col("t_bi").cast(d38))
    score = (num.cast("string").cast("double")
             / den.cast("string").cast("double"))
    scored = (pruned.join(ua, "prev").join(ub, "cur")
              .join(totals)
              .select("prev", "cur", "n_pair", "n_prev", "n_cur",
                      score.alias("score")))
    # Distributed global top-k: orderBy+limit lowers to
    # TakeOrderedAndProject (per-partition top-k, ONE k-row merge) —
    # the unpartitioned row_number window it replaces (r9) sorted the
    # whole min_count-pruned pair table in a single task. The rank
    # window then runs over the ≤k survivors only — free.
    from pyspark.sql.window import Window
    order = [F.col("score").desc(), F.col("prev"), F.col("cur")]
    topk = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (topk.withColumn("rank", F.row_number().over(w))
            .select(F.col("rank").cast("bigint").alias("rank"),
                    "prev", "cur",
                    F.col("n_pair").cast("bigint").alias("n_pair"),
                    F.col("n_prev").cast("bigint").alias("n_prev"),
                    F.col("n_cur").cast("bigint").alias("n_cur"),
                    "score"))


# --- Benford first-digit conformance (r13) ---------------------------
#
# The conformance sibling of the drift monitors above: χ²/KS/TV test a
# distribution against ANOTHER SAMPLE; Benford tests it against a LAW.
# Factored as additive counts + a finisher so the identical transform
# streams (streaming/sketches.py::streaming_benford_counts — per-digit
# counts are plain additive aggregates, complete-mode state after any
# micro-batch split is bit-identical to the batch aggregate).

BENFORD_P = {  # log10(1 + 1/d), repr-exact double literals
    1: 0.3010299956639812, 2: 0.17609125905568124,
    3: 0.12493873660829992, 4: 0.09691001300805642,
    5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129,
    9: 0.04575749056067514}


def benford_digit_counts(df: DataFrame, amount_col: str) -> DataFrame:
    """(digit, n_obs) — exact first-significant-digit counts of a
    positive amount column (rows < 1 are excluded: their first
    significant digit needs magnitude normalization the law's audit
    use doesn't — Nigrini tests the integer part). The first digit
    comes from floor(): double floor is exact IEEE and the result is
    integral, so the int cast is exact on BOTH engines (DuckDB's
    double→int CAST rounds half-to-even, Spark truncates — floor
    sidesteps the divergence). ONE scan, ≤9-group map-side-collapsing
    aggregate; counts are additive ⇒ streams complete-mode."""
    return (df.filter(F.col(amount_col) >= 1)
            .select(F.substring(F.floor(amount_col).cast("string"),
                                1, 1).cast("int").alias("digit"))
            .groupBy("digit").agg(F.count("*").alias("n_obs")))


def benford_from_counts(counts: DataFrame) -> DataFrame:
    """Finisher: (digit, n_obs, expected_p, observed_p, chi2_term)
    from the additive count table — total derives from a window sum
    over the ≤9-row counts (no second corpus pass), the Benford
    probabilities are repr-embedded literals, and the χ² term is one
    fixed IEEE tree over exact ints ⇒ bit-exact cross-engine."""
    from pyspark.sql.window import Window
    exp_p = F.element_at(
        F.create_map(*[F.lit(x) for kv in BENFORD_P.items()
                       for x in kv]), F.col("digit"))
    c = (counts
         .withColumn("t", F.sum("n_obs").over(Window.partitionBy()))
         .withColumn("expected_p", exp_p))
    n = F.col("n_obs").cast("double")
    t = F.col("t").cast("double")
    e = F.col("expected_p") * t
    return c.select(
        F.col("digit").cast("bigint").alias("digit"),
        F.col("n_obs").cast("bigint").alias("n_obs"),
        "expected_p",
        (n / t).alias("observed_p"),
        ((n - e) * (n - e) / e).alias("chi2_term"))


def contingency_counts(df: DataFrame, row_col: str,
                       col_col: str) -> DataFrame:
    """(row_key, col_key, n_obs) — exact contingency-table cell
    counts over two categorical columns (NULL categories excluded):
    the additive half of the χ² independence test. ONE corpus
    exchange with map-side partials; counts are plain additive
    aggregates ⇒ the identical transform streams complete-mode
    (streaming/sketches.py::streaming_contingency_counts) with
    |rows|·|cols| state, bit-identical to the batch table after any
    micro-batch split."""
    return (df.filter(F.col(row_col).isNotNull()
                      & F.col(col_col).isNotNull())
            .groupBy(F.col(row_col).alias("row_key"),
                     F.col(col_col).alias("col_key"))
            .agg(F.count("*").alias("n_obs")))


def independence_from_counts(cells: DataFrame) -> DataFrame:
    """Finisher: per-cell (row_key, col_key, n_obs, expected,
    chi2_term) with expected = row_total·col_total/n (Pearson 1900) —
    row/column/grand totals are window sums over the tiny cell table
    (nothing corpus-sized), and the χ² term is one fixed IEEE tree
    over exact ints ⇒ bit-exact cross-engine."""
    from pyspark.sql.window import Window
    c = (cells
         .withColumn("n_r", F.sum("n_obs").over(
             Window.partitionBy("row_key")))
         .withColumn("n_c", F.sum("n_obs").over(
             Window.partitionBy("col_key")))
         .withColumn("n", F.sum("n_obs").over(Window.partitionBy())))
    obs = F.col("n_obs").cast("double")
    exp = (F.col("n_r").cast("double") * F.col("n_c").cast("double")
           / F.col("n").cast("double"))
    return c.select(
        "row_key", "col_key",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        exp.alias("expected"),
        ((obs - exp) * (obs - exp) / exp).alias("chi2_term"))


def anova_group_moments(df: DataFrame, group_col: str,
                        value_col: str) -> DataFrame:
    """(g, n_g, s_g, ss_g) — per-group one-way-ANOVA sufficient
    statistics (Fisher 1925): exact BIGINT count plus exact-decimal
    Σx and Σx² (x² quantized to DECIMAL(27,6) per term — the DSIR
    single-rounding device — so the sum is order-independent). NULL
    values are excluded. ONE scan with a map-side-collapsing
    aggregate; all three stats are plain additive ⇒ streams
    complete-mode with |groups|-row state (the benford_digit_counts
    factoring), and the streamed state after any micro-batch split is
    BIT-identical to the batch aggregate."""
    x = F.col(value_col)
    return (df.filter(x.isNotNull())
            .select(F.col(group_col).alias("g"), x.alias("x"))
            .groupBy("g")
            .agg(F.count("*").alias("n_g"),
                 F.sum(F.col("x").cast("decimal(27,6)")).alias("s_g"),
                 F.sum((F.col("x") * F.col("x")).cast("decimal(27,6)"))
                 .alias("ss_g")))


def anova_from_group_moments(g: DataFrame) -> DataFrame:
    """Finisher: ONE row (k_groups, n_rows, ss_between, ss_within,
    f_stat) from the additive per-group moment table — group means
    and the grand mean are string-routed divisions, each group's
    SSB/SSW double term is quantized to DECIMAL(27,6) before the
    cross-group sum (order-independent k-term reduction), and the F
    statistic is one fixed IEEE tree ⇒ bit-exact cross-engine.
    Everything here is |groups|-row arithmetic — shared by the batch
    part_brand_price_anova query and the streaming moments twin."""
    from pyspark.sql.window import Window
    w = Window.partitionBy()
    tot = (g.withColumn("n", F.sum("n_g").over(w))
           .withColumn("s", F.sum("s_g").over(w)))
    mean_g = _dstr(F.col("s_g")) / F.col("n_g").cast("double")
    mean = _dstr(F.col("s")) / F.col("n").cast("double")
    ssb_term = (F.col("n_g").cast("double")
                * (mean_g - mean) * (mean_g - mean))
    ssw_term = (_dstr(F.col("ss_g"))
                - F.col("n_g").cast("double") * mean_g * mean_g)
    agg = (tot.groupBy("n")
           .agg(F.count("*").alias("k"),
                F.sum(ssb_term.cast("decimal(27,6)")).alias("ssb"),
                F.sum(ssw_term.cast("decimal(27,6)")).alias("ssw")))
    ssb_d, ssw_d = _dstr(F.col("ssb")), _dstr(F.col("ssw"))
    k_d = F.col("k").cast("double")
    n_d = F.col("n").cast("double")
    f_stat = ((ssb_d / (k_d - F.lit(1.0)))
              / (ssw_d / (n_d - k_d)))
    return agg.select(
        F.col("k").cast("bigint").alias("k_groups"),
        F.col("n").cast("bigint").alias("n_rows"),
        ssb_d.alias("ss_between"),
        ssw_d.alias("ss_within"),
        F.when((F.col("k") > 1) & (F.col("n") > F.col("k"))
               & (ssw_d > 0), f_stat)
        .alias("f_stat"))


def diversity_from_counts(cells: DataFrame,
                          group: str = "col_key") -> DataFrame:
    """Gini–Simpson diversity readout over a contingency-count table
    (Simpson 1949): per ``group`` (a cell-table key column), λ =
    1 − Σnᵢ²/n² over the other axis's counts, plus the effective
    category number 1/Σpᵢ² = n²/Σnᵢ² — "how many equally-common
    categories would look like this". The log-free diversity index
    (Shannon entropy's ln() diverges in the last ulp across libm
    builds; Simpson's is exact rational arithmetic): Σnᵢ² and n are
    exact BIGINTs routed through DECIMAL(38,0) products (n² overflows
    a long past ~3·10⁹ rows) and the string hop, finished by one
    fixed IEEE tree ⇒ bit-exact cross-engine.

    SHARED by the batch docs_source_lang_diversity query and the
    streaming twin: ``streaming/sketches.py::streaming_contingency_
    counts`` maintains the identical additive cell table, so this
    readout over the sink equals the batch readout after any
    micro-batch split (the independence_from_counts factoring).
    → (group key, n_rows, n_categories, simpson_lambda,
    effective_categories)."""
    d38 = "decimal(38,0)"
    g = (cells.groupBy(F.col(group).alias("g"))
         .agg(F.sum("n_obs").alias("n"),
              F.count("*").alias("k"),
              F.sum(F.col("n_obs").cast(d38) * F.col("n_obs").cast(d38))
              .alias("ssq")))
    nn = _dstr(F.col("n").cast(d38) * F.col("n").cast(d38))
    ssq = _dstr(F.col("ssq"))
    return g.select(
        F.col("g"),
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("k").cast("bigint").alias("n_categories"),
        (F.lit(1.0) - ssq / nn).alias("simpson_lambda"),
        (nn / ssq).alias("effective_categories"))


def mannwhitney_from_counts(h: DataFrame) -> DataFrame:
    """Mann–Whitney U readout over a (value, n_a, n_b) additive
    value-grain histogram (Mann & Whitney 1947): 2U = Σ_v n_a(v) ·
    (2·cum_b(<v) + n_b(v)) with the Σ(t³−t) tie correction in the
    normal-approximation variance → ONE row (n_a_total, n_b_total,
    u2_statistic, z_score). Exact DECIMAL(38,0) integer arithmetic
    through the string hop; the z finisher is one fixed IEEE tree
    (sqrt is IEEE-correctly-rounded on both engines) ⇒ bit-exact
    cross-engine.

    SHARED by the batch events_mannwhitney_value_test query and the
    streaming twin: ``streaming/sketches.py::streaming_value_
    histogram`` maintains the identical additive (g, x, c) state, so
    ``mannwhitney_from_value_histogram`` over the sink equals the
    batch readout after any micro-batch split (the ks_from_counts
    factoring — one histogram state, KS and Mann–Whitney both finish
    from it). Everything here runs over |distinct values| rows."""
    from pyspark.sql.window import Window
    d38 = "decimal(38,0)"
    w_cum = (Window.partitionBy().orderBy("value")
             .rowsBetween(Window.unboundedPreceding, -1))
    g = h.withColumn("cum_b",
                     F.coalesce(F.sum("n_b").over(w_cum), F.lit(0)))
    t = F.col("n_a") + F.col("n_b")
    u2_term = (F.col("n_a").cast(d38)
               * (F.lit(2).cast(d38) * F.col("cum_b").cast(d38)
                  + F.col("n_b").cast(d38)))
    tie_term = t.cast(d38) * t.cast(d38) * t.cast(d38) - t.cast(d38)
    agg = (g.agg(F.sum("n_a").alias("m"),
                 F.sum("n_b").alias("n"),
                 F.sum(u2_term).alias("u2"),
                 F.sum(tie_term).alias("ties")))
    a2 = agg.select(
        "m", "n", "u2", "ties",
        (F.col("m").cast(d38) * F.col("n").cast(d38)).alias("mn"),
        ((F.col("m") + F.col("n")).cast(d38)
         * (F.col("m") + F.col("n") - 1).cast(d38)).alias("nn1"))
    mn_d = _dstr(F.col("mn"))
    var = (mn_d / F.lit(12.0)
           * ((F.col("m") + F.col("n") + 1).cast("double")
              - _dstr(F.col("ties")) / _dstr(F.col("nn1"))))
    z = (_dstr(F.col("u2")) - mn_d) / (F.lit(2.0) * F.sqrt(var))
    return a2.select(
        F.col("m").cast("bigint").alias("n_a_total"),
        F.col("n").cast("bigint").alias("n_b_total"),
        F.col("u2").cast("string").cast("double").alias("u2_statistic"),
        F.when((F.col("m") > 0) & (F.col("n") > 0) & (var > 0), z)
        .alias("z_score"))


def mannwhitney_from_value_histogram(state: DataFrame, group_a,
                                     group_b) -> DataFrame:
    """Adapter: pivot the streaming (g, x, c) value-histogram state
    into the (value, n_a, n_b) two-sample histogram and finish —
    counts are additive, so the readout over the complete-mode sink
    is bit-identical to the batch query after any micro-batch split
    (tested)."""
    h = (state.filter(F.col("g").isin(group_a, group_b))
         .groupBy(F.col("x").alias("value"))
         .agg(F.sum(F.when(F.col("g") == group_a, F.col("c"))
                    .otherwise(0)).alias("n_a"),
              F.sum(F.when(F.col("g") == group_b, F.col("c"))
                    .otherwise(0)).alias("n_b")))
    return mannwhitney_from_counts(h)


def raw_moments4(df: DataFrame, group_col: str,
                 value_col: str) -> DataFrame:
    """(g, n_g, s1, s2, s3, s4) — per-group raw power sums through
    the fourth moment in EXACT INTEGER CENTS: the sufficient
    statistics behind skewness and kurtosis. CONTRACT: ``value_col``
    is a currency-grain column (≤2 decimal places, |x| < 10^7) — the
    cents value round(x·100) is then an exact integer on both
    engines (the double sits within ~1e-8 of it, never near a .5
    boundary), and every power is EXACT decimal integer arithmetic:
    no double→decimal quantization anywhere, so there is nothing to
    round and the sums are bit-identical cross-engine by
    construction (the double-product DSIR device diverges here —
    x² of a 6-digit price needs 17+ significant digits, where
    Spark's string-routed cast and DuckDB's binary-value cast round
    differently; measured r14). Widths: cents ≤ 10^9 ⇒ x⁴ ≤ 10^36,
    inside DECIMAL(38,0) products on both engines — and the SUM has
    its own budget: |s4| ≤ n_g·max(|cents|)⁴ must stay under 10^38,
    else Spark's non-ANSI decimal sum goes NULL silently while DuckDB
    errors (r15 ADVICE). That bound is ENFORCED loudly below via an
    assert over the per-group max: a violating group raises instead
    of poisoning the readout with NULLs (the s4 bound dominates
    s1/s2/s3 whenever max ≥ 1; groups past it need the hash-bucket
    chunk-and-resum composition, the weighted_systematic_sample
    budget precedent). All sums are plain additive ⇒ streams
    complete-mode with |groups|-row state (the anova_group_moments
    factoring). NULL values excluded."""
    d9 = "decimal(9,0)"
    xc = F.round(F.col(value_col) * F.lit(100)).cast(d9)
    base = (df.filter(F.col(value_col).isNotNull())
            .select(F.col(group_col).alias("g"), xc.alias("xc")))
    x1 = F.col("xc")
    x2 = x1 * x1
    agg = (base
           .groupBy("g")
           .agg(F.count("*").alias("n_g"),
                F.sum(x1).alias("s1"),
                F.sum(x2).alias("s2"),
                F.sum(x2 * x1).alias("s3"),
                F.sum(x2 * x2).alias("s4"),
                F.max(F.abs(x1)).alias("_xmax")))
    # Loud sum-width guard: n_g · max(|cents|, 1)^4 < 9.9·10^37 (double
    # arithmetic; ~1e-16 relative error is irrelevant at this margin).
    # assert_true returns NULL on success and raises on violation, so
    # the when() wrapper is an identity projection that cannot pass a
    # silently-overflowed NULL through.
    xm = F.greatest(F.col("_xmax").cast("double"), F.lit(1.0))
    ok = (F.col("n_g").cast("double") * xm * xm * xm * xm
          < F.lit(9.9e37))
    guard = F.assert_true(ok, F.concat(
        F.lit("raw_moments4 sum-width budget exceeded for group "),
        F.col("g").cast("string"),
        F.lit(": n_g * max_cents^4 approaches 1e38 — the DECIMAL(38,0)"
              " power sums would overflow (silent NULL in non-ANSI"
              " Spark); chunk the group (hash-bucket partial sums,"
              " re-sum) or widen the pipeline")))
    return agg.select(
        "g", "n_g", "s1", "s2", "s3",
        F.when(guard.isNull(), F.col("s4")).alias("s4"))


def skew_kurtosis_from_moments(g: DataFrame) -> DataFrame:
    """Finisher: per group (g, n_rows, mean, m2_variance, skewness,
    kurtosis_excess) from the additive cents power sums — population
    central moments via the standard raw→central identities in
    CENTS space, then Fisher g1 = M3/(M2·√M2) and excess
    g2 = M4/M2² − 3 (both SCALE-INVARIANT, so the cents grain drops
    out), with mean and variance rescaled by 100 / 10⁴. Every step is
    one fixed IEEE tree over string-routed exact decimals (sqrt is
    correctly rounded on both engines) ⇒ bit-exact cross-engine;
    degenerate groups (M2 ≤ 0) report NULL shape stats. |groups|-row
    arithmetic — shared by the batch query and the streaming moments
    twin."""
    n_d = F.col("n_g").cast("double")
    m1 = _dstr(F.col("s1")) / n_d
    r2 = _dstr(F.col("s2")) / n_d
    r3 = _dstr(F.col("s3")) / n_d
    r4 = _dstr(F.col("s4")) / n_d
    m2 = r2 - m1 * m1
    m3 = r3 - F.lit(3.0) * m1 * r2 + F.lit(2.0) * m1 * m1 * m1
    m4 = (r4 - F.lit(4.0) * m1 * r3 + F.lit(6.0) * m1 * m1 * r2
          - F.lit(3.0) * m1 * m1 * m1 * m1)
    g1 = m3 / (m2 * F.sqrt(m2))
    g2 = m4 / (m2 * m2) - F.lit(3.0)
    ok = (F.col("n_g") > 1) & (m2 > 0)
    return g.select(
        F.col("g"),
        F.col("n_g").cast("bigint").alias("n_rows"),
        (m1 / F.lit(100.0)).alias("mean"),
        (m2 / F.lit(10000.0)).alias("m2_variance"),
        F.when(ok, g1).alias("skewness"),
        F.when(ok, g2).alias("kurtosis_excess"))


def spearman_from_pairs(df: DataFrame, x_col: str, y_col: str
                        ) -> DataFrame:
    """Tie-aware EXACT Spearman rank correlation (Spearman 1904 with
    average ranks — the standard tie treatment): rho = Pearson over
    the per-row average ranks of x and y. The log-free, distribution-
    free monotone-association readout next to the Pearson family —
    rank transforms make it robust to outliers and nonlinearity.
    → ONE row (n_rows, spearman_rho).

    Exactness device: average ranks live on the .5 grid, so DOUBLED
    ranks are exact BIGINTs — R2(v) = 2·(count of rows before v) +
    n_v + 1 from the value histogram — and Pearson is invariant to
    the affine 2r scaling, so rho over doubled ranks IS rho over
    average ranks. Every moment is then an exact DECIMAL(38,0)
    integer sum; the finisher replicates _pearson_from_moments' fixed
    IEEE op order (the bit-exactness contract with the oracle).
    Widths: R2 ≤ 2n+1, R2x·R2y·n < 10^38 holds to n ≈ 10^9 rows per
    computation (chunk the corpus and merge histogram moments past
    that — sums are additive).

    Scale shape: moments decompose over the (x, y) PAIR histogram —
    Σ n_xy·R2x(x)·R2y(y) — so the corpus is touched by THREE
    map-side-combined aggregates (x histogram, y histogram, pair
    histogram); the rank maps are value-DOMAIN-sized broadcasts and
    their cum windows run over |distinct values| rows (the
    Mann-Whitney histogram spine; the weighted-sampler chunked carry
    applies verbatim at extreme value cardinality)."""
    from pyspark.sql.window import Window as W
    base = (df.filter(F.col(x_col).isNotNull()
                      & F.col(y_col).isNotNull())
            .select(F.col(x_col).alias("xv"), F.col(y_col).alias("yv")))

    def rank_map(col):
        # CHUNKED cumulative counts (r15 — the weighted-sampler carry
        # composition applied to the rank spine): chunk on
        # floor(value/1024) — IEEE division and floor are monotone, so
        # chunks tile the value order — per-chunk windows sort in
        # parallel and the chunk-grain carry ledger (exclusive prefix
        # of chunk totals) joins back broadcast. Identical ranks by
        # counting associativity; no value-domain-sized single-task
        # window remains.
        h = (base.groupBy(col).agg(F.count("*").alias("nv"))
             .withColumn("__ck", F.floor(F.col(col) / F.lit(1024.0))))
        w_carry = (W.orderBy("__ck")
                   .rowsBetween(W.unboundedPreceding, -1))
        ledger = (h.groupBy("__ck").agg(F.sum("nv").alias("cn"))
                  .withColumn("carry",
                              F.coalesce(F.sum("cn").over(w_carry),
                                         F.lit(0)))
                  .select(F.col("__ck").alias("__ck_l"), "carry"))
        w_cum = (W.partitionBy("__ck").orderBy(col)
                 .rowsBetween(W.unboundedPreceding, -1))
        return (h.join(F.broadcast(ledger),
                       h["__ck"] == ledger["__ck_l"])
                .withColumn(
                    "r2", 2 * (F.col("carry")
                               + F.coalesce(F.sum("nv").over(w_cum),
                                            F.lit(0)))
                    + F.col("nv") + 1)
                .select(col, F.col("r2").cast("decimal(38,0)")
                        .alias(col[0] + "r2")))

    pair = base.groupBy("xv", "yv").agg(F.count("*").alias("n_xy"))
    j = (pair.join(F.broadcast(rank_map("xv")), "xv")
         .join(F.broadcast(rank_map("yv")), "yv"))
    n_xy = F.col("n_xy").cast("decimal(38,0)")
    m = j.agg(
        F.sum("n_xy").alias("n"),
        F.sum(n_xy * F.col("xr2")).alias("sx"),
        F.sum(n_xy * F.col("yr2")).alias("sy"),
        F.sum(n_xy * F.col("xr2") * F.col("xr2")).alias("sxx"),
        F.sum(n_xy * F.col("yr2") * F.col("yr2")).alias("syy"),
        F.sum(n_xy * F.col("xr2") * F.col("yr2")).alias("sxy"))
    # _pearson_from_moments' exact op order (plans/common.py) — the
    # shared-copy contract: cov/var trees must match the oracle's.
    nD = F.col("n").cast("double")
    cov = (_dstr(F.col("sxy")) / nD
           - (_dstr(F.col("sx")) / nD) * (_dstr(F.col("sy")) / nD))
    vx = (_dstr(F.col("sxx")) / nD
          - (_dstr(F.col("sx")) / nD) * (_dstr(F.col("sx")) / nD))
    vy = (_dstr(F.col("syy")) / nD
          - (_dstr(F.col("sy")) / nD) * (_dstr(F.col("sy")) / nD))
    rho = cov / F.sqrt(vx * vy)
    return m.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.when((F.col("n") > 1) & (vx > 0) & (vy > 0), rho)
        .alias("spearman_rho"))


def hour_counts(df: DataFrame, type_col: str = "event_type",
                ts_ms_col: str = "ts_ms") -> DataFrame:
    """(type, hour-of-day, count) histogram — the sufficient
    statistics behind the hourly-seasonality χ² readout (r15).
    Hour from pure epoch arithmetic (timezone-free); plain additive
    BIGINT counts ⇒ streams complete-mode with |types|·24 rows of
    state (the benford_digit_counts factoring): streamed state after
    any micro-batch split is BIT-identical to this batch aggregate,
    and ``seasonality_from_hour_counts`` finishes from either."""
    hour = F.expr(f"({ts_ms_col} div 3600000) % 24")
    return (df.groupBy(F.col(type_col).alias("event_type"),
                       hour.alias("hour"))
            .agg(F.count("*").alias("n_h")))


def seasonality_from_hour_counts(h: DataFrame) -> DataFrame:
    """Finisher: per-type (n_events, peak_hour, peak_share,
    chi2_uniform) from the additive (event_type, hour, n_h) counts —
    SHARED by the batch events_hourly_seasonality query and the
    streaming counts twin. χ² against uniform via the
    24·Σo²/n − n identity (empty cells absorbed); Σo² is an exact
    DECIMAL(38,0) sum with one string-routed fixed IEEE tree; the
    peak is max(struct(count, −hour)) — ties break to the SMALLEST
    hour, a total order ⇒ bit-exact."""
    nh38 = F.col("n_h").cast("decimal(38,0)")
    agg = (h.groupBy("event_type")
           .agg(F.sum("n_h").alias("n"),
                F.sum(nh38 * nh38).alias("ssq"),
                F.max(F.struct(F.col("n_h").alias("c"),
                               (-F.col("hour")).alias("nh")))
                .alias("pk")))
    nD = F.col("n").cast("double")
    chi2 = F.lit(24.0) * _dstr(F.col("ssq")) / nD - nD
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        (-F.col("pk.nh")).cast("bigint").alias("peak_hour"),
        (F.col("pk.c").cast("double") / nD).alias("peak_share"),
        chi2.alias("chi2_uniform"))


def kruskal_from_value_histogram(state: DataFrame) -> DataFrame:
    """Kruskal–Wallis H test over the additive (g, x, c) value-grain
    histogram (Kruskal & Wallis 1952): the k-group completion of the
    two-group Mann–Whitney — rank-based one-way ANOVA, the fourth
    readout sharing the ONE histogram state (KS drift, Mann–Whitney,
    χ², now KW). → ONE row (n_total, k_groups, h_statistic,
    h_tie_corrected).

    Exactness devices (all established): doubled average ranks
    R2(v) = 2·cum_before + n_v + 1 over the POOLED histogram are
    exact integers; per-group doubled rank sums R2_g = Σ c_gv·R2(v)
    are exact DECIMAL sums; the identity
    H = (N+1)·(12·S − 3) with S = Σ_g w_g·mm_g²,
    w_g = n_g/N, mm_g = (R2_g/(2n_g))/(N+1) puts every summed term
    in (0, 1] — summed through DECIMAL(27,12), the HHI share-space
    device (scaled < 10^12, inside the r14 safe boundary) ⇒
    magnitude-safe at any N. The tie correction reuses Mann–Whitney's
    exact Σ(t³−t) integer term: H_c = H / (1 − Σ(t³−t)/(N³−N)).

    Scale: the pooled-histogram cumulative counts run CHUNKED (r15 —
    floor(value/1024) chunks + the carry ledger, identical ranks by
    associativity; no value-domain single-task window), one broadcast
    rank-map join, |groups|-row arithmetic. The rank map derives from the
    state and joins BACK to it, so it is RE-KEYED under fresh
    attribute names (the retention_from_user_days device) — required
    when the state arrives through a streaming memory-sink view."""
    from pyspark.sql.window import Window as W
    d38 = "decimal(38,0)"
    hist = (state.select(F.col("x").alias("xv"), F.col("c").alias("cv"))
            .groupBy("xv").agg(F.sum("cv").alias("n_v"))
            .withColumn("__ck", F.floor(F.col("xv") / F.lit(1024.0))))
    # CHUNKED cumulative counts (r15 — the weighted-sampler carry
    # composition on the rank spine): floor(value/1024) chunks tile
    # the value order (IEEE division and floor are monotone); the
    # chunk-grain carry ledger joins back broadcast. Identical ranks
    # by counting associativity — no value-domain single-task window.
    w_carry = (W.orderBy("__ck")
               .rowsBetween(W.unboundedPreceding, -1))
    ledger = (hist.groupBy("__ck").agg(F.sum("n_v").alias("cn"))
              .withColumn("carry",
                          F.coalesce(F.sum("cn").over(w_carry), F.lit(0)))
              .select(F.col("__ck").alias("__ck_l"), "carry"))
    w_cum = (W.partitionBy("__ck").orderBy("xv")
             .rowsBetween(W.unboundedPreceding, -1))
    r2map = (hist.join(F.broadcast(ledger),
                       hist["__ck"] == ledger["__ck_l"])
             .withColumn(
                 "r2", (2 * (F.col("carry")
                             + F.coalesce(F.sum("n_v").over(w_cum),
                                          F.lit(0)))
                        + F.col("n_v") + 1).cast(d38))
             .select("xv", "r2"))
    nv = F.col("n_v").cast(d38)
    ties = hist.agg(
        F.sum(nv * nv * nv - nv).alias("tie_term"),
        F.sum("n_v").alias("n_total"))
    per_g = (state.join(F.broadcast(r2map),
                        state["x"] == r2map["xv"])
             .groupBy("g")
             .agg(F.sum("c").alias("n_g"),
                  F.sum(F.col("c").cast(d38) * F.col("r2"))
                  .alias("r2g")))
    t = per_g.crossJoin(F.broadcast(ties))
    n_d = F.col("n_total").cast("double")
    ng_d = F.col("n_g").cast("double")
    w_g = ng_d / n_d
    mm_g = (_dstr(F.col("r2g")) / (F.lit(2.0) * ng_d)) / (n_d + F.lit(1.0))
    s_agg = (t.withColumn("sq", (w_g * mm_g * mm_g)
                          .cast("decimal(27,12)"))
             .groupBy("n_total", "tie_term")
             .agg(F.count("*").alias("k_groups"),
                  F.sum("sq").alias("s_sum")))
    n_d2 = F.col("n_total").cast("double")
    h = ((n_d2 + F.lit(1.0))
         * (F.lit(12.0) * _dstr(F.col("s_sum")) - F.lit(3.0)))
    nt38 = F.col("n_total").cast(d38)
    nn3 = nt38 * nt38 * nt38 - nt38
    c_corr = F.lit(1.0) - _dstr(F.col("tie_term")) / _dstr(nn3)
    ok = (F.col("n_total") > 0) & (F.col("k_groups") > 1)
    return s_agg.select(
        F.col("n_total").cast("bigint").alias("n_total"),
        F.col("k_groups").cast("bigint").alias("k_groups"),
        F.when(ok, h).alias("h_statistic"),
        F.when(ok & (c_corr > 0), h / c_corr).alias("h_tie_corrected"))
