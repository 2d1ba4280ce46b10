"""Streaming sketches: bounded state BY CONSTRUCTION.

The reason sketches compose with Structured Streaming for free is the
same mergeability that makes them work on a 1000-executor cluster: a
streaming aggregation's state store holds exactly the sketch —
≤ d·w counter rows for count-min, one HLL binary per group — so state
can never grow with the stream, no watermark/TTL is required, and
`complete` output mode re-emits the whole (tiny) sketch each trigger
for downstream estimation. A crashed query replays from the
checkpoint into the identical counters (order-independence).

Batch↔streaming equivalence is the correctness contract: the sketch
of a stream after N micro-batches is bit-identical to the batch
sketch of the concatenated input (tested in test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import _hash_rows


def streaming_count_min(stream: DataFrame, text_col: str = "text",
                        d: int = 4, w: int = 1024) -> DataFrame:
    """Count-min over a document stream as a plain streaming groupBy:
    the state store IS the d×w counter grid (≤ d·w rows, ever)."""
    toks = stream.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"))
    return (toks.select(
        F.explode(_hash_rows(F.col("tok"), d, w)).alias("h"))
        .groupBy("h.depth", "h.bucket")
        .agg(F.count("*").alias("cnt")))


def streaming_distinct_sketch(stream: DataFrame, key_col: str,
                              group_cols: list[str],
                              lgk: int = 12) -> DataFrame:
    """Streaming approx-distinct per group via HLL: one ~(2**lgk)/2-byte
    sketch of state per group, updated register-max per batch —
    distinct-counting a stream without storing the keys."""
    return (stream.groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(
                F.hll_sketch_agg(key_col, lgk)).alias("approx_distinct"),
                F.count("*").alias("n_rows")))


def streaming_bloom(stream: DataFrame, key_col: str,
                    n_bits: int = 1 << 17, k: int = 5) -> DataFrame:
    """Membership filter over a key stream: the state store holds the
    (word, mask) rows — ≤ n_bits/64 ever, regardless of stream length.
    bit_or is commutative/associative/idempotent, so replayed batches
    land on the identical bit array (exactly-once not even required
    for correctness), and the `complete`-mode output is directly
    consumable by bloom_might_contain to compile an
    accepted-so-far predicate into any later query's scan."""
    from ..operators.sketch import _bloom_words
    return _bloom_words(stream, key_col, n_bits, k)


def streaming_moments(stream: DataFrame, key_col: str,
                      value_col: str, decimals: int = 2) -> DataFrame:
    """Exact-decimal moment sums (n, Σc, Σc²) per key as a streaming
    aggregation — the state IS three numbers per key, and because
    decimal addition is exact and order-independent, the streamed
    state after any micro-batch split is BIT-IDENTICAL to the batch
    sums (tested), so every member of the exact-moments stats family
    (z-score, correlation, trend, TWAP) can be finished from the
    sink at read time with the same fixed double ops the batch
    queries use."""
    scale = float(10 ** decimals)
    c = F.round(F.col(value_col) * F.lit(scale)).cast("decimal(10,0)")
    # count("c"), not count("*"): a NULL value (or a scaled value
    # overflowing decimal(10,0) under a non-ANSI session) must drop
    # from n AND the sums together — counting it in n alone silently
    # skews every statistic finished from the sink (review catch)
    return (stream.select(F.col(key_col).alias("k"), c.alias("c"))
            .groupBy("k")
            .agg(F.count("c").alias("n"),
                 F.sum("c").alias("s1"),
                 F.sum(F.col("c") * F.col("c")).alias("s2")))


def heavy_hitters_readout(sketch_rows: DataFrame, candidates: DataFrame,
                          k: int = 20, d: int = 4, w: int = 1024,
                          token_col: str = "tok") -> DataFrame:
    """Per-epoch top-k heavy hitters straight off the streamed CMS
    state: estimate every candidate against the (≤ d·w row, broadcast)
    sketch sink and rank — the continuous companion of the batch
    ``token_heavy_hitters`` (same estimator, same deterministic
    est-desc-then-token order, so after any micro-batch split the
    readout is IDENTICAL to the batch top-k over the concatenated
    input; tested). Candidates come from the caller — production
    tracks a bounded candidate set (e.g. the monitored vocabulary);
    the sketch bounds state, the candidate set bounds the readout.
    """
    from ..operators.sketch import count_min_estimate
    est = count_min_estimate(sketch_rows, candidates, token_col, d, w)
    return est.orderBy(F.col("est_count").desc(), "tok").limit(k)


def run_sketch_stream(sketch_df: DataFrame, name: str,
                      checkpoint: str):
    """Drive a sketch aggregation into an in-memory table in
    `complete` mode — legal precisely because the result is
    sketch-sized; downstream estimation (count_min_estimate /
    heavy hitters) reads the table as an ordinary DataFrame."""
    return (sketch_df.writeStream.outputMode("complete")
            .format("memory").queryName(name)
            .option("checkpointLocation", checkpoint)
            .start())


def streaming_centroid_sums(stream: DataFrame,
                            group_col: str = "label",
                            vec_col: str = "embedding") -> DataFrame:
    """Per-(group, dimension) exact-decimal embedding sums as a
    streaming aggregation — the state store IS the |groups|·dims
    table (never stream-length), so no watermark/TTL is needed and
    `complete` mode re-emits the whole table each trigger. The
    transform is SHARED with the batch monitor
    (operators/similarity.py::dim_sums — decimal addition is exact
    and order-independent), so the streamed state after any
    micro-batch split is BIT-identical to the batch sums, and the
    embedding drift monitor finishes from the sink at read time via
    centroid_drift_from_sums — the streaming twin of
    source_embedding_drift (tested both ways)."""
    from ..operators.similarity import dim_sums
    return dim_sums(stream, group_col, vec_col)


def streaming_vocab_state(stream: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          steps: int = 10) -> tuple[DataFrame, DataFrame]:
    """The vocabulary-growth curve maintained FROM A DOCUMENT STREAM:
    two bounded streaming aggregations over the SHARED batch
    projection (operators/lm_quality.py::_bucketed_tokens) —
    per-bucket doc/token counts (``steps`` rows of state, additive)
    and per-term minimum sample bucket (|vocab| rows, min is
    idempotent ⇒ replay-immune). Both are mergeable, so complete-mode
    state after any micro-batch split is BIT-identical to the batch
    aggregates, and the curve finishes from the two sinks at read
    time via vocab_growth_from_state — the streaming twin of
    corpus_vocab_growth (tested both ways). Returns
    (bucket_sizes_df, term_first_bucket_df) to attach as two queries
    over the same source."""
    from ..operators.lm_quality import (_bucketed_tokens, bucket_sizes,
                                        term_first_bucket)
    base = _bucketed_tokens(stream, text_col, id_col, steps)
    return bucket_sizes(base), term_first_bucket(base)


def streaming_value_histogram(stream: DataFrame, group_col: str,
                              value_col: str) -> DataFrame:
    """Per-(group, value) counts as a streaming aggregation — the
    state store IS the value-DOMAIN-sized histogram (doc lengths,
    scores, …: |groups|·|distinct values| rows, never stream-length),
    so no watermark/TTL is needed and `complete` mode re-emits the
    whole table each trigger. Plain additive counts ⇒ the streamed
    state after any micro-batch split is BIT-identical to the batch
    histogram, and the KS drift monitor finishes from the sink at
    read time via operators/lm_quality.py::ks_from_counts — the
    streaming twin of source_ks_drift (tested both ways)."""
    return (stream.select(F.col(group_col).alias("g"),
                          F.col(value_col).alias("x"))
            .groupBy("g", "x").agg(F.count("*").alias("c")))


def streaming_user_days(stream: DataFrame, ts_ms_col: str = "ts_ms",
                        user_col: str = "user_id") -> DataFrame:
    """The (user, active-day) set maintained FROM AN EVENT STREAM —
    the state behind continuous cohort retention. A plain streaming
    groupBy(user, day) count: state is |users|·|active days| rows
    (user-×-day DOMAIN-sized, never stream-length; counts are
    additive ⇒ replay lands on identical state). The complete-mode
    sink IS the distinct (u, d) table of batch
    ``operators/timeseries.py::cohort_retention``, so
    ``retention_from_user_days`` over the sink (drop the count)
    reproduces the batch retention matrix BIT-identically after any
    micro-batch split — the vocab-growth state+readout pattern
    (tested both ways). The SAME sink also finishes the rolling
    7-day distinct-actives readout
    (``rolling_active_users_from_user_days`` — r13 verdict #3): one
    state table, two continuous engagement readouts."""
    day = F.expr(f"{ts_ms_col} div 86400000")
    return (stream.select(F.col(user_col).alias("u"), day.alias("d"))
            .groupBy("u", "d").agg(F.count("*").alias("n_events")))


def streaming_user_types(stream: DataFrame, user_col: str = "user_id",
                         type_col: str = "event_type") -> DataFrame:
    """The (user, event-type) incidence set maintained FROM AN EVENT
    STREAM — the state behind continuous market-basket co-occurrence
    (r13 verdict #5: the streaming_user_days pattern verbatim, with
    the type axis in place of the day axis). A plain streaming
    groupBy(user, type) count: state is |users|·|types| rows
    (domain-sized, never stream-length; counts additive ⇒ replay
    lands on identical state). The complete-mode sink IS the distinct
    (u, t) table of the batch events_type_cooccurrence_lift query, so
    ``operators/timeseries.py::cooccurrence_lift_from_user_types``
    over the sink reproduces the batch pair/support/lift table
    BIT-identically after any micro-batch split (tested)."""
    return (stream.select(F.col(user_col).alias("u"),
                          F.col(type_col).alias("t"))
            .groupBy("u", "t").agg(F.count("*").alias("n_events")))


def streaming_anova_moments(stream: DataFrame, group_col: str,
                            value_col: str) -> DataFrame:
    """Per-group one-way-ANOVA sufficient statistics maintained FROM
    A STREAM — the transform is SHARED with the batch form
    (``operators/lm_quality.py::anova_group_moments``: exact BIGINT
    count + exact-decimal Σx/Σx², all plain additive aggregates ⇒
    streamed complete-mode state after any micro-batch split is
    BIT-identical to the batch aggregate), and the F-statistic readout
    finishes from the |groups|-row sink at read time via
    ``anova_from_group_moments`` — the benford_from_counts factoring
    (r13 verdict #5). Continuous "does this factor still explain the
    metric" monitoring with |groups| rows of state."""
    from ..operators.lm_quality import anova_group_moments
    return anova_group_moments(stream, group_col, value_col)


def streaming_skew_moments(stream: DataFrame, group_col: str,
                           value_col: str) -> DataFrame:
    """Per-group power sums through the fourth moment maintained FROM
    A STREAM — the transform is SHARED with the batch form
    (``operators/lm_quality.py::raw_moments4``: exact integer-cents
    powers, all plain additive ⇒ streamed complete-mode state after
    any micro-batch split is BIT-identical to the batch aggregate),
    and the skewness/kurtosis readout finishes from the |groups|-row
    sink at read time via ``skew_kurtosis_from_moments`` — continuous
    distribution-SHAPE monitoring (asymmetry, tail weight) next to
    the mean/variance moments twin."""
    from ..operators.lm_quality import raw_moments4
    return raw_moments4(stream, group_col, value_col)


def streaming_cusum_stats(stream: DataFrame,
                          key_col: str = "event_type",
                          ts_ms_col: str = "ts_ms",
                          value_col: str = "value",
                          bucket_ms: int = 3_600_000) -> DataFrame:
    """Bucket-grain CUSUM sufficient statistics maintained FROM AN
    EVENT STREAM — the transform is SHARED with the batch form
    (``operators/timeseries.py::cusum_bucket_stats``: per-(key,
    bucket) counts + exact decimal sums, both additive ⇒ streamed
    complete-mode state after any micro-batch split is BIT-identical
    to the batch aggregate), and the change-point finishes from the
    sink at read time via ``cusum_from_bucket_stats`` under its
    documented bucket-resolution contract. This completes the drift
    family's streaming coverage: TV/KS/χ² histograms stream WHICH
    group drifted; this streams WHEN the level shifted. State is
    |keys|·|active buckets| rows — time-domain-sized, never
    stream-length."""
    from ..operators.timeseries import cusum_bucket_stats
    return cusum_bucket_stats(stream, key_col, ts_ms_col, value_col,
                              bucket_ms)


def streaming_rfm_stats(stream: DataFrame, user_col: str = "user_id",
                        ts_ms_col: str = "ts_ms",
                        value_col: str = "value") -> DataFrame:
    """Per-user RFM sufficient statistics maintained FROM AN EVENT
    STREAM — the transform is SHARED with the batch form
    (``operators/timeseries.py::rfm_user_stats``: max day is
    idempotent, count and exact-decimal sum are additive ⇒ streamed
    complete-mode state after any micro-batch split is BIT-identical
    to the batch aggregate), and the segment table finishes from the
    sink at read time via ``rfm_segments_from_stats`` — continuous
    user segmentation with |users|-row state."""
    from ..operators.timeseries import rfm_user_stats
    return rfm_user_stats(stream, user_col, ts_ms_col, value_col)


def streaming_embedding_covariance(stream: DataFrame,
                                   vec_col: str = "embedding"):
    """Streaming twin of the embedding covariance: the two
    sufficient-statistic tables — quantized-exact (i, j) second-
    moment sums and (i) first-moment sums — as complete-mode
    streaming aggregations (state is d²-sized, never stream-length;
    no watermark/TTL). Decimal sums are plain additive aggregates, so
    the streamed state after any micro-batch split is BIT-identical
    to the batch tables, and the covariance finishes from the sinks
    at read time via operators/similarity.py::covariance_from_sums —
    the vocab-growth two-sink pattern (tested both ways). Returns
    (pair_sums_df, dim_sums_df) to attach as two queries over the
    same source."""
    from ..operators.similarity import cov_dim_sums, cov_pair_sums
    return cov_pair_sums(stream, vec_col), cov_dim_sums(stream, vec_col)


def streaming_benford_counts(stream: DataFrame,
                             amount_col: str) -> DataFrame:
    """Benford first-digit counts maintained FROM A STREAM — the
    transform is SHARED with the batch form
    (``operators/lm_quality.py::benford_digit_counts``: per-digit
    counts are plain additive aggregates ⇒ streamed complete-mode
    state after any micro-batch split is BIT-identical to the batch
    aggregate), and the conformance readout (expected/observed/χ²
    against Benford's law) finishes from the ≤9-row sink at read time
    via ``benford_from_counts`` — the live feed-integrity monitor
    next to the drift-histogram family, with ≤9 rows of state."""
    from ..operators.lm_quality import benford_digit_counts
    return benford_digit_counts(stream, amount_col)


def streaming_contingency_counts(stream: DataFrame, row_col: str,
                                 col_col: str) -> DataFrame:
    """Contingency-table cell counts maintained FROM A STREAM — the
    transform is SHARED with the batch form
    (``operators/lm_quality.py::contingency_counts``: cell counts are
    plain additive aggregates ⇒ streamed complete-mode state after
    any micro-batch split is BIT-identical to the batch table), and
    the Pearson independence readout finishes from the
    |rows|·|cols|-row sink at read time via
    ``independence_from_counts`` — the live composition monitor next
    to the Benford and drift-histogram twins."""
    from ..operators.lm_quality import contingency_counts
    return contingency_counts(stream, row_col, col_col)


def streaming_return_counts(stream: DataFrame,
                            brand_col: str = "p_brand",
                            flag_col: str = "l_returnflag") -> DataFrame:
    """Per-brand return counts maintained FROM A STREAM — the
    transform is SHARED with the batch form
    (``operators/timeseries.py::brand_return_counts``: (n, r) are
    plain additive BIGINT counts ⇒ streamed complete-mode state after
    any micro-batch split is BIT-identical to the batch aggregate),
    and the Wilson lower-bound ranking finishes from the
    |brands|-row sink at read time via ``wilson_from_counts`` — the
    benford_from_counts factoring (r15 verdict #5). Continuous
    "which product lines are coming back" monitoring with |brands|
    rows of state; the stream carries pre-joined (brand, returnflag)
    rows (the enrich join runs upstream, the J1 broadcast pattern)."""
    from ..operators.timeseries import brand_return_counts
    return brand_return_counts(stream, brand_col, flag_col)


def streaming_customer_spend(stream: DataFrame,
                             cust_col: str = "o_custkey",
                             price_col: str = "o_totalprice"
                             ) -> DataFrame:
    """Per-customer exact-decimal spend maintained FROM A STREAM —
    the transform is SHARED with the batch form
    (``operators/timeseries.py::customer_spend``: a DECIMAL(27,6)
    sum is a plain additive aggregate ⇒ streamed complete-mode state
    after any micro-batch split is BIT-identical to the batch
    aggregate), and the per-segment Pareto concentration readout
    finishes from the |customers|-row sink at read time via
    ``pareto_from_spend`` joined to the customer dimension — the
    streaming_rfm_stats pattern (r15 verdict #5): one spend state,
    continuous whale-concentration monitoring."""
    from ..operators.timeseries import customer_spend
    return customer_spend(stream, cust_col, price_col)


def streaming_supplier_revenue(stream: DataFrame,
                               supp_col: str = "s_nationkey",
                               key_col: str = "l_suppkey",
                               rev_col: str = "rev") -> DataFrame:
    """Per-(nation, supplier) exact-decimal revenue maintained FROM A
    STREAM of pre-joined (nation, supplier, revenue) rows — the
    sufficient statistic behind the HHI concentration readout (r15:
    the customer_spend pattern on a two-level key). A DECIMAL(27,6)
    sum is a plain additive aggregate ⇒ streamed complete-mode state
    after any micro-batch split is BIT-identical to the batch
    per-supplier aggregate, and ``hhi_from_supplier_revenue``
    finishes from either — continuous market-power monitoring with
    |suppliers|-row state."""
    return (stream.groupBy(F.col(supp_col).alias("s_nationkey"),
                           F.col(key_col).alias("l_suppkey"))
            .agg(F.sum(F.col(rev_col).cast("decimal(27,6)"))
                 .alias("srev")))


def streaming_hour_counts(stream: DataFrame,
                          type_col: str = "event_type",
                          ts_ms_col: str = "ts_ms") -> DataFrame:
    """(type, hour-of-day) counts maintained FROM AN EVENT STREAM —
    the sufficient statistics behind the hourly-seasonality χ²
    readout (r15: the benford_from_counts factoring). Plain additive
    BIGINT counts over |types|·24 rows of state ⇒ streamed
    complete-mode state after any micro-batch split is BIT-identical
    to the batch (type, hour) aggregate, and
    ``seasonality_from_hour_counts`` finishes from either —
    continuous daily-cycle monitoring."""
    from ..operators.lm_quality import hour_counts
    return hour_counts(stream, type_col, ts_ms_col)


def streaming_backlog_deltas(stream: DataFrame,
                             start_col: str = "order_day",
                             end_col: str = "last_ship") -> DataFrame:
    """Sweep-line boundary deltas maintained FROM A STREAM of
    interval rows — the transform is SHARED with the batch form
    (``operators/timeseries.py::backlog_deltas``: ±1 per-day delta
    sums are plain additive aggregates ⇒ streamed complete-mode
    state after any micro-batch split is BIT-identical to the batch
    aggregate), and the open-backlog readout finishes from the
    |calendar days|-row sink at read time via
    ``backlog_from_deltas`` (r15) — continuous WIP/backlog
    monitoring with calendar-sized state."""
    from ..operators.timeseries import backlog_deltas
    return backlog_deltas(stream, start_col, end_col)


def streaming_kfold_counts(stream: DataFrame,
                           strat_col: str = "source",
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           k: int = 5) -> DataFrame:
    """Per-(stratum, fold) counts maintained FROM A DOCUMENT STREAM —
    the transform is SHARED with the batch form
    (``operators/training.py::kfold_counts``: additive BIGINT counts
    over the deterministic md5 fold coin ⇒ streamed complete-mode
    state after any micro-batch split is BIT-identical to the batch
    aggregate), and the fold-share summary finishes from the
    |strata|·k-row sink at read time via ``kfold_from_counts``
    (r15) — continuous CV-assignment monitoring as the corpus
    grows."""
    from ..operators.training import kfold_counts
    return kfold_counts(stream, strat_col, id_col, text_col, k)


def streaming_funnel_flags(stream: DataFrame,
                           user_col: str = "user_id",
                           type_col: str = "event_type",
                           type_a: str = "click",
                           type_b: str = "purchase") -> DataFrame:
    """Per-user funnel incidence flags maintained FROM AN EVENT
    STREAM — the transform is SHARED with the batch form
    (``operators/timeseries.py::user_funnel_flags``: MAX over 0/1
    flags is idempotent ⇒ streamed complete-mode state after any
    micro-batch split is BIT-identical to the batch aggregate, and
    replay is harmless), and the two-proportion z readout finishes
    from the |users|-row sink at read time via ``ztest_from_flags``
    (r15) — the continuous A/B monitor."""
    from ..operators.timeseries import user_funnel_flags
    return user_funnel_flags(stream, user_col, type_col, type_a, type_b)


def streaming_yoy_counts(stream: DataFrame,
                         key_col: str = "o_custkey",
                         year_col: str = "yr",
                         year_a: int = 1996,
                         year_b: int = 1997) -> DataFrame:
    """Per-key paired year counts maintained FROM A STREAM — the
    transform is SHARED with the batch form
    (``operators/timeseries.py::yoy_counts``: conditional counts are
    plain additive aggregates ⇒ streamed complete-mode state after
    any micro-batch split is BIT-identical to the batch aggregate),
    and the sign-test readout finishes from the |keys|-row sink at
    read time via ``sign_test_from_counts`` (r15) — continuous
    matched-pairs shift monitoring."""
    from ..operators.timeseries import yoy_counts
    return yoy_counts(stream, key_col, year_col, year_a, year_b)


def streaming_daily_revenue(stream: DataFrame,
                            date_col: str = "o_orderdate",
                            price_col: str = "o_totalprice"
                            ) -> DataFrame:
    """Day-grain exact-decimal revenue maintained FROM A STREAM —
    the transform is SHARED with the batch form
    (``operators/timeseries.py::daily_revenue``: a DECIMAL(27,6) sum
    on epoch-day integer keys is a plain additive aggregate ⇒
    streamed complete-mode state after any micro-batch split is
    BIT-identical to the batch aggregate), and THREE time-series
    readouts finish from the |calendar days|-row sink at read time:
    ``autocorr_from_daily`` (momentum), ``theilsen_from_daily``
    (robust trend), and ``runs_test_from_daily`` (serial randomness)
    — one state table, three continuous monitors (r15; the
    streaming_user_days / value-histogram pattern)."""
    from ..operators.timeseries import daily_revenue
    return daily_revenue(stream, date_col, price_col)
