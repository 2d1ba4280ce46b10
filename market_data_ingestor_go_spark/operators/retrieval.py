"""Text retrieval over the corpus: BM25 top-k and hybrid RRF fusion.

The retrieval surface a training-data pipeline needs next to its
vector stack (similarity.py): lexical ranking over an inverted index
(BM25 — Robertson & Spärck Jones's probabilistic relevance framework,
the Okapi BM25 form) and reciprocal-rank fusion (Cormack, Clarke &
Büttcher 2009) to combine a sparse/lexical arm with a dense/embedding
arm — the standard "hybrid search" recipe.

Cross-engine determinism (the repo's oracle rules):

- True BM25 weighs each matched term ``idf_t · tf_norm`` with
  ``idf_t = ln(1 + (N − df + ½)/(df + ½))``. ``ln()`` differs in the
  last ULP across libm builds, so the HEADLINE score is the log-free
  surrogate that replaces ``ln(1 + r)`` with ``r`` itself (the same
  monotone-per-term device as DSIR's mean-ratio form,
  lm_quality.py): per (doc, term)

      r_t      = (2N − 2·df + 1) / (2·df + 1)          # (N−df+½)/(df+½)
      tf_norm  = 22·tf·TOT / (10·tf·TOT + 3·TOT + 9·dl·N)
                 # tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
                 # with k1 = 1.2, b = 0.75, avgdl = TOT/N, cleared to
                 # the common denominator 10·TOT
      term     = (r_t · tf_norm)  — one division of two EXACT integer
                 products (DECIMAL(38,0) cross-products, string-routed
                 to double: correctly-rounded parse + one IEEE divide
                 ⇒ bit-identical in Spark and DuckDB)
      score    = Σ_terms DECIMAL(27,6)(term)   # exact, order-free sum

  Ranking ties break on doc_id; the rank is computed on the exact
  decimal sum, never on a float. tests/test_retrieval.py pins the
  engine bit-exactly to a Python twin of this arithmetic and asserts
  ranking agreement vs TRUE log-idf Okapi BM25 (exact top-k set
  equality, rank displacement ≤ 1 — per-term the surrogate is a
  monotone transform, so multi-term sums can only swap near-ties).

- RRF is exact by construction: 1/(60 + rank) is one IEEE division of
  small integers, decimal-cast per arm and summed exactly.

Decimal headroom (the PMI_MAX_TOTAL_TOKENS analysis applied here):
the largest exact integers formed are num ≤ (2N+1)·22·tf·TOT ≤
45·N·D·TOT and den ≤ (2N+1)·22·D·TOT ≤ 45·N·D·TOT, with D = max
document length (tf ≤ dl ≤ D; the den's 10·tf·TOT + 3·TOT + 9·dl·N
inner sum is ≤ 22·D·TOT since N ≤ TOT). DECIMAL(38,0) therefore
holds both exactly while N·D·TOT ≤ 2.2e36 — e.g. a TRILLION docs
(N = 1e12) of ≤ 1e6 tokens each (TOT ≤ 1e18) sits at 44·1e36, right
at the edge; every realistic corpus (N ≤ 1e11, D ≤ 1e5, TOT ≤ 1e15
≈ 100 TB of text) is ≥ 7 orders of magnitude inside it. Past the
bound, shard the corpus per index partition (df/N/TOT are additive
across shards only for disjoint doc sets — which sharding gives).

Scale shapes (100 TB posture):
- Query terms broadcast; postings are FILTERED to the query vocabulary
  before the tf aggregate, so only matching postings ever shuffle
  (the classic impact of an inverted index, expressed as predicate-
  first dataflow). df/TOT/N are model-sized aggregates.
- The per-query top-k is a WindowGroupLimit rank — ≤ q·k rows pass
  the final exchange.
- The RRF fuse joins two rank tables bounded by q·arm_k rows — model-
  sized regardless of corpus size.

Reference parity note: the reference repo (internal/app/*.go) has no
retrieval surface; this module is part of the mandated training-data-
pipeline extension (SURVEY.md §2.11), built from the public Okapi
BM25 and RRF formulations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens as _tokens

_D38 = "decimal(38,0)"


def _dstr(c: Column) -> Column:
    """Exact-decimal → double via the string route (int128→double
    direct casts differ at 1 ULP between engines; string parse is
    correctly rounded everywhere)."""
    return c.cast("string").cast("double")


# Fixture query set for the synthetic corpus (the ~40-term database-
# flavored vocabulary of documents.parquet) — three queries, three
# terms each. Kept module-level so the Spark query, the DuckDB oracle
# and the tests share one literal.
FIXTURE_QUERIES: list[tuple[str, str]] = [
    ("q_hash_join", "hash"), ("q_hash_join", "join"),
    ("q_hash_join", "merge"),
    ("q_scan_filter", "scan"), ("q_scan_filter", "filter"),
    ("q_scan_filter", "vector"),
    ("q_customer_order", "customer"), ("q_customer_order", "order"),
    ("q_customer_order", "data"),
]


def bm25_topk(docs: DataFrame, query_terms: list[tuple[str, str]],
              k: int = 10, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Top-k docs per query under the log-free BM25 surrogate
    (module doc) → (query_id, rank, doc_id, matched_terms, score).

    ``query_terms`` is a [(query_id, term), …] list — duplicates per
    query are ignored (BM25 over the query term SET; weighting by
    query-side tf is a trivial extension nobody uses at k1-default).

    Corpus semantics: docs with NULL text are excluded from the
    collection entirely (they produce no postings AND do not count in
    N / total length) — the same filter the index path applies, so
    the direct and from-index results stay row-identical on corpora
    with NULL rows, not just on the fixture.
    """
    qt, vocab = _query_tables(docs.sparkSession, query_terms)
    base = (docs.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"),
                    _tokens(text_col).alias("ts"))
            .withColumn("dl", F.size("ts")))
    stats = base.agg(F.count("*").alias("n_docs"),
                     F.sum("dl").alias("tot"),
                     F.max("dl").alias("max_dl"))
    # postings filtered to the query vocabulary BEFORE the tf
    # aggregate — only matching postings shuffle
    posts = (base.select("doc_id", "dl", F.explode("ts").alias("term"))
             .join(vocab, "term"))
    tf = (posts.groupBy("doc_id", "dl", "term")
          .agg(F.count("*").alias("tf")))
    # df = docs containing the term, as a WINDOW over tf rather than a
    # separate groupBy+join-back: Catalyst cannot reuse tf's subplan
    # across two consumers, so the join-back form re-ran the full
    # scan→explode→aggregate lineage a second time (observed in the
    # executed plan). The window costs one exchange of the already
    # vocab-filtered tf table (≤ |query vocab| · n_docs rows) and
    # keeps the corpus explode single-pass — the plan shape
    # tests/test_plans.py::test_bm25_postings_prefilter_before_shuffle
    # pins (one Generate, two documents scans: postings + stats).
    tf = tf.withColumn("df", F.count("*").over(
        Window.partitionBy("term")))
    return _score_and_rank(tf, stats, qt, k)


def _query_tables(spark, query_terms: list[tuple[str, str]]):
    """Broadcast (query_id, term) table + its distinct vocabulary —
    ONE canonicalization (sorted set) shared by the direct and
    from-index paths, for the same reason they share the scoring
    tail: identity by construction, not by parallel maintenance."""
    qt = F.broadcast(
        spark.createDataFrame(sorted(set(query_terms)),
                              "query_id STRING, term STRING"))
    return qt, F.broadcast(qt.select("term").distinct())


# Runtime decimal-headroom bound (the PMI_MAX_TOTAL_TOKENS pattern,
# r11): the module doc derives num, den ≤ 45·N·D·TOT for the exact
# DECIMAL(38,0) cross-products, so the job fails LOUDLY — on the
# one-row broadcast stats, evaluated once — the moment N·D·TOT could
# overflow, instead of silently nulling scores. Past the bound, shard
# the corpus per index partition (module doc).
BM25_MAX_N_D_TOT = 2.2e36


def _score_and_rank(tf: DataFrame, stats: DataFrame, qt: DataFrame,
                    k: int) -> DataFrame:
    """Shared surrogate-BM25 scoring tail: (doc_id, dl, term, tf, df)
    × broadcast (n_docs, tot[, max_dl]) × broadcast (query_id, term)
    → per-query exact-decimal sums, ranked. One expression tree for
    both the direct and the from-index paths ⇒ bit-identity between
    them holds by construction. When the stats row carries ``max_dl``
    the N·D·TOT ≤ 2.2e36 decimal-headroom bound is runtime-enforced
    on it (folded into n_docs so column pruning can never drop the
    assert); a legacy (n_docs, tot) sidecar sum has no D and skips
    the guard."""
    if "max_dl" in stats.columns:
        prod = (F.col("n_docs").cast("double")
                * F.col("max_dl").cast("double")
                * F.col("tot").cast("double"))
        guard = F.assert_true(
            prod <= F.lit(BM25_MAX_N_D_TOT),
            F.concat(F.lit("bm25 decimal headroom exceeded: "
                           "n_docs*max_dl*tot="),
                     prod.cast("string"),
                     F.lit(f" > {BM25_MAX_N_D_TOT} (the exact "
                           "DECIMAL(38,0) cross-products would "
                           "overflow; shard the corpus)")))
        stats = stats.select(
            F.when(guard.isNull(), F.col("n_docs")).alias("n_docs"),
            "tot")
    stats = F.broadcast(stats)
    num = ((2 * F.col("n_docs") - 2 * F.col("df") + 1).cast(_D38)
           * F.lit(22).cast(_D38) * F.col("tf").cast(_D38)
           * F.col("tot").cast(_D38))
    den = ((2 * F.col("df") + 1).cast(_D38)
           * (10 * F.col("tf").cast(_D38) * F.col("tot").cast(_D38)
              + 3 * F.col("tot").cast(_D38)
              + 9 * F.col("dl").cast(_D38) * F.col("n_docs").cast(_D38)))
    term_score = (_dstr(num) / _dstr(den)).cast("decimal(27,6)")

    scored = (tf.join(stats)
              .join(qt, "term")
              .groupBy("query_id", "doc_id")
              .agg(F.count("*").alias("matched_terms"),
                   F.sum(term_score).alias("score_dec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_dec").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.lit(k))
            .select("query_id", F.col("rank").cast("bigint").alias("rank"),
                    "doc_id",
                    F.col("matched_terms").cast("bigint")
                    .alias("matched_terms"),
                    _dstr(F.col("score_dec")).alias("score")))


def doc_postings(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document posting rows (doc_id, dl, term, tf) — the
    DOC-LOCAL half of the inverted index (everything corpus-global —
    df, N, total length — is derived at serve time so appended
    epochs stay correct). NULL-text docs are excluded from the
    collection (same semantics as bm25_topk's base). One explode +
    one partial-agg shuffle. Shared by the batch index build and the
    streaming maintainer so the two can never drift."""
    base = (docs.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"),
                    _tokens(text_col).alias("ts"))
            .withColumn("dl", F.size("ts")))
    return (base.select("doc_id", "dl", F.explode("ts").alias("term"))
            .groupBy("doc_id", "dl", "term")
            .agg(F.count("*").alias("tf")))


# Term-hash partition fan-out for the materialized index. md5-based
# (operators/training.py::hash_bucket), NOT xxhash64, so the bucket of
# a query term is reproducible DRIVER-side in pure Python
# (``term_bucket``) — the serve path turns its query vocabulary into a
# partition-value IN-list before the scan, and Spark prunes the
# non-matching partitions at planning time (zero non-matching postings
# read; plan-pinned). 16 buckets keeps fixture partitions non-trivial;
# a 100 TB index raises it to O(cluster parallelism).
N_TERM_BUCKETS = 16

# The bucket MODULUS travels in the partition column's NAME
# (``term_bkt16``): self-describing at schema level, zero extra I/O,
# and it survives any DataFrame slice of the index — so a serve call
# can never silently prune with the wrong modulus (the r10 hazard:
# an index built with term_buckets=4 served with the default 16
# pruned partitions that DID hold matching postings — missing
# results, not slow ones). ``bm25_from_index`` derives the modulus
# from the name and REFUSES a conflicting explicit n_term_buckets;
# only a legacy plain ``term_bkt`` column still relies on the caller
# threading the count.
import re as _re

_TERM_BKT_RE = _re.compile(r"^term_bkt(\d+)$")


def term_bkt_name(n_buckets: int) -> str:
    """Partition-column name carrying the bucket modulus —
    ``term_bkt16`` for a 16-bucket build."""
    return f"term_bkt{int(n_buckets)}"


def term_bucket(term: str, n_buckets: int = N_TERM_BUCKETS) -> int:
    """Pure-Python twin of ``hash_bucket(term, n_buckets)`` (md5 of
    the UTF-8 term, first 8 hex chars mod n) — bit-identical to the
    Spark column (equality tested over the fixture vocabulary)."""
    import hashlib
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def bm25_index(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", with_df: bool = False,
               term_buckets: int | None = None) -> DataFrame:
    """Materialize the FULL-vocabulary inverted index a deployment
    stores: (doc_id, dl, term, tf) — one corpus explode, one postings
    shuffle. Pass ``term_buckets`` and write the result
    ``.partitionBy("term_bkt")`` so a serve-time query-vocabulary
    filter becomes PARTITION PRUNING (zero non-matching postings
    read — ``bm25_from_index`` computes the matching buckets
    driver-side via ``term_bucket`` and prunes before the scan;
    plan-pinned in tests/test_plans.py). ``bm25_from_index`` over
    this table is row-identical to ``bm25_topk`` over the raw corpus
    (tested).

    ``with_df=True`` additionally stores a build-time ``df`` column
    (vocabulary diagnostics, df-cap pruning decisions) at the cost of
    one term-partitioned window over the full postings table — OFF by
    default because the serve path always recomputes df over the
    index's CURRENT contents (appended epochs would stale a stored
    df), so the default build skips the corpus-wide sort it would
    never read."""
    from .training import hash_bucket

    tf = doc_postings(docs, text_col, id_col)
    if with_df:
        tf = tf.withColumn("df", F.count("*").over(
            Window.partitionBy("term")))
    if term_buckets is not None:
        # modulus-carrying column name (module doc): write with
        # .partitionBy(term_bkt_name(term_buckets))
        tf = tf.withColumn(term_bkt_name(term_buckets),
                           hash_bucket("term", term_buckets))
    return tf


def latest_epoch_postings(postings: DataFrame,
                          id_col: str = "doc_id",
                          epoch_col: str = "epoch") -> DataFrame:
    """The UPDATE path for the append-only postings contract: keep
    only each doc's NEWEST epoch's posting set → same columns, one
    (doc_id, dl, term, tf, epoch, …) row set per doc from a single
    epoch. Re-ingesting a changed document as a new epoch then stops
    double-counting it: dedup-to-latest before stats/scoring makes
    the newest text the only one that serves (equality tested — the
    re-ingested doc scores ONLY its new text; N/TOT count it once).

    Use it (a) ad hoc, ``bm25_from_index(latest_epoch_postings(idx),
    …, stats=None)`` — the sidecar sums CANNOT be used with it,
    they count every epoch — or (b) permanently, as the dedup a
    compaction applies so the folded index is update-clean.

    Shape: one window over the index keyed by doc_id (max-epoch
    filter). At scale the index stores doc_id-bucketed and this is
    shuffle-free; it is the same exchange the stats=None distinct
    pays, so the ad-hoc form costs no extra pass."""
    w = Window.partitionBy(id_col)
    return (postings
            .withColumn("__max_e", F.max(epoch_col).over(w))
            .filter(F.col(epoch_col) == F.col("__max_e"))
            .drop("__max_e"))


def bm25_from_index(postings: DataFrame,
                    query_terms: list[tuple[str, str]],
                    k: int = 10, stats: DataFrame | None = None,
                    n_term_buckets: int | None = None) -> DataFrame:
    """Serve path: BM25 top-k against the MATERIALIZED inverted index
    (``bm25_index`` output, or ``StreamingPostingsIndex``'s epoch
    union) with zero tokenize/explode work per query — the
    steady-state deployment cost.

    APPEND-ONLY CONTRACT: the index may GROW (appended epochs of new
    doc_ids) but never update — re-ingesting an existing doc_id with
    changed text would leave both posting sets live, double-counting
    that doc in df/N/TOT and scoring both versions silently.
    A source with updates deduped to the newest epoch per doc_id via
    ``latest_epoch_postings`` serves correctly (the supported
    re-ingest path; ``StreamingPostingsIndex`` states the same
    contract).

    The corpus-GLOBAL quantities are derived from the postings being
    served, never trusted from build time — so an index that has
    grown by appended epochs serves the df/stats of its CURRENT
    contents (a stored df column, frozen at build, is ignored):

    - ``stats=None``: N/TOT/max-dl from one distinct over (doc_id,
      dl) (every doc carries ≥1 posting since tokenization yields ≥1
      token) — correct but a FULL-INDEX pass per query batch.
    - ``stats=<(n_docs, tot[, max_dl]) one-row DataFrame>``: the
      per-epoch sidecar sum a maintainer keeps
      (``StreamingPostingsIndex`` writes (epoch, n_docs, tot,
      max_dl) as it lands postings; summing sidecar rows is
      metadata-cost and stays stale-free because the sidecar lands
      in the SAME epoch write). Equality across appended epochs is
      tested. NOT valid over ``latest_epoch_postings`` output — the
      sidecar counts every epoch.

    df always comes from a window over the vocab-filtered postings
    (query-vocabulary-sized, never a full-index pass). If the index
    carries a modulus-carrying partition column (``term_bkt16`` —
    ``bm25_index(..., term_buckets=n)``), the bucket count is derived
    from the COLUMN NAME, the query vocabulary's buckets are computed
    driver-side, and non-matching partitions are pruned BEFORE the
    scan — and a conflicting explicit ``n_term_buckets`` raises
    instead of silently missing results. Only a LEGACY plain
    ``term_bkt`` column still relies on the caller threading the
    build's count (default ``N_TERM_BUCKETS``): a mismatch there
    prunes partitions that DO hold matching postings — silently
    missing results, not slow ones (tested both ways).
    Row-identical to ``bm25_topk`` (shared scoring tail and query
    canonicalization; equality tested)."""
    qt, vocab = _query_tables(postings.sparkSession, query_terms)
    if stats is None:
        stats = (postings.select("doc_id", "dl").distinct()
                 .agg(F.count("*").alias("n_docs"),
                      F.sum("dl").alias("tot"),
                      F.max("dl").alias("max_dl")))
    matched = postings
    bkt_col, modulus = None, None
    for c in postings.columns:
        m = _TERM_BKT_RE.match(c)
        if m:
            bkt_col, modulus = c, int(m.group(1))
            break
    if bkt_col is not None:
        if n_term_buckets is not None and n_term_buckets != modulus:
            raise ValueError(
                f"index column {bkt_col} says the build used "
                f"{modulus} term buckets, but n_term_buckets="
                f"{n_term_buckets} was passed — a mismatched modulus "
                f"would silently prune matching postings")
    elif "term_bkt" in postings.columns:  # legacy, modulus not stored
        bkt_col = "term_bkt"
        modulus = n_term_buckets if n_term_buckets is not None \
            else N_TERM_BUCKETS
    if bkt_col is not None:
        bkts = sorted({term_bucket(t, modulus)
                       for _, t in set(query_terms)})
        matched = postings.filter(F.col(bkt_col).isin(bkts))
    tf = (matched.select("doc_id", "dl", "term", "tf")
          .join(vocab, "term")
          .withColumn("df", F.count("*").over(Window.partitionBy("term"))))
    return _score_and_rank(tf, stats, qt, k)


def rrf_fuse(sparse_ranks: DataFrame, dense_ranks: DataFrame,
             k: int = 10, rrf_k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of two (q_id, doc_id, rn) rank tables →
    (q_id, doc_id, sparse_rank, dense_rank, rrf, rank).

    rrf = Σ_arms 1/(rrf_k + rank_arm) over the UNION of both arms'
    candidates (a missing arm contributes 0 — the standard convention).
    Each contribution is one IEEE division of small integers, decimal-
    cast, summed exactly; the fused rank is computed on the exact
    decimal, ties to the smaller doc_id.
    """
    s = sparse_ranks.select(F.col("q_id"), F.col("doc_id"),
                            F.col("rn").cast("bigint").alias("sparse_rank"))
    d = dense_ranks.select(F.col("q_id"), F.col("doc_id"),
                           F.col("rn").cast("bigint").alias("dense_rank"))
    contrib = lambda r: F.coalesce(  # noqa: E731
        (F.lit(1.0) / (F.lit(rrf_k) + r).cast("double"))
        .cast("decimal(27,6)"),
        F.lit(0).cast("decimal(27,6)"))
    fused = (s.join(d, ["q_id", "doc_id"], "full_outer")
             .withColumn("rrf_dec", contrib(F.col("sparse_rank"))
                         + contrib(F.col("dense_rank"))))
    w = Window.partitionBy("q_id").orderBy(
        F.col("rrf_dec").desc(), F.col("doc_id"))
    return (fused.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.lit(k))
            .select("q_id", "doc_id", "sparse_rank", "dense_rank",
                    _dstr(F.col("rrf_dec")).alias("rrf"),
                    F.col("rank").cast("bigint").alias("rank")))


def jaccard_ranks(docs: DataFrame, query_ids: list[int], arm_k: int = 20,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Sparse retrieval arm for doc-to-doc hybrid search: rank corpus
    docs against each query doc by DISTINCT-token-set Jaccard →
    (q_id, doc_id, rn), self-excluded, rn ≤ arm_k.

    Exact integers throughout: |A∩B| from array_intersect (both
    engines dedup), |A∪B| = |A|+|B|−|A∩B| (avoids the engine-specific
    element ORDER of list unions — only sizes are compared), one IEEE
    division for the ratio. At corpus scale this arm is the MinHash/
    BM25 candidate path; the exact broadcast form here is the oracle-
    checkable fixture shape (queries broadcast, corpus never
    shuffles to be scored).
    """
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.array_distinct(_tokens(text_col)).alias("ts"))
    q = F.broadcast(
        base.filter(F.col("doc_id").isin([int(i) for i in query_ids]))
        .select(F.col("doc_id").alias("q_id"), F.col("ts").alias("qts")))
    inter = F.size(F.array_intersect(F.col("qts"), F.col("ts")))
    union = F.size("qts") + F.size("ts") - inter
    jacc = F.when(union > 0, inter.cast("double") / union.cast("double")) \
        .otherwise(F.lit(0.0))
    scored = (q.join(base, F.col("q_id") != F.col("doc_id"))
              .select("q_id", "doc_id", jacc.alias("jacc"))
              .filter(F.col("jacc") > 0))
    w = Window.partitionBy("q_id").orderBy(
        F.col("jacc").desc(), F.col("doc_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= F.lit(arm_k))
            .select("q_id", "doc_id", "rn"))
