"""Engine-side tests for the retrieval family (operators/retrieval.py)
and the KS drift monitor (operators/lm_quality.py::ks_value_drift):

- the log-free BM25 surrogate is compared BIT-EXACTLY against a
  Python twin that mirrors the engine's arithmetic (exact integer
  cross-products, correctly-rounded int->double conversion, one IEEE
  division, DECIMAL(27,6) HALF_UP quantization, exact decimal sum);
- the surrogate's RANKING is compared against TRUE log-idf Okapi
  BM25 (k1=1.2, b=0.75) computed in Python: per-term the surrogate
  is a monotone transform of the true score, so rankings agree up to
  adjacent swaps where multi-term sums interleave — asserted as
  exact top-k SET agreement + rank displacement <= 1;
- RRF fusion on a hand case with exact decimal expectations,
  including a missing arm contributing zero through the full outer
  join;
- the Jaccard sparse arm on a hand case (distinct-token sets,
  self-exclusion, doc_id tiebreaks);
- KS drift closed-form cases (identical -> 0, disjoint -> 1, a hand
  case -> exact rational) and a random-data exact Python twin.
"""

from __future__ import annotations

import math
import random
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from market_data_ingestor_go_spark.operators.lm_quality import ks_value_drift
from market_data_ingestor_go_spark.operators.retrieval import (
    FIXTURE_QUERIES, bm25_topk, jaccard_ranks, rrf_fuse)

SF = "/root/testdata/sf0.01"


def _fixture_docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return {d: t.strip().split() for d, t in rows}


def _spark_docs(spark):
    from market_data_ingestor_go_spark.sources.tables import load_table
    return load_table(spark, SF, "documents")


def _q6(x: float) -> Decimal:
    """Spark's double -> DECIMAL(27,6) cast (HALF_UP on the shortest
    round-trip repr, which is the exact double value's rounding)."""
    return Decimal(repr(x)).quantize(Decimal("0.000001"),
                                     rounding=ROUND_HALF_UP)


def _py_bm25(docs: dict[int, list[str]], queries: list[tuple[str, str]],
             k: int = 10, surrogate: bool = True):
    """Exact Python twin of bm25_topk. surrogate=True mirrors the
    engine bit-for-bit (integer cross-products, float(str) parse, one
    IEEE divide, DECIMAL(27,6) sum); surrogate=False is TRUE log-idf
    Okapi BM25 (float), for rank-agreement assertions only."""
    by_q: dict[str, list[str]] = {}
    for q, t in sorted(set(queries)):
        by_q.setdefault(q, []).append(t)
    vocab = {t for ts in by_q.values() for t in ts}
    n, tot = len(docs), sum(len(ts) for ts in docs.values())
    tf = {d: Counter(t for t in ts if t in vocab) for d, ts in docs.items()}
    df = Counter()
    for c in tf.values():
        for t in c:
            df[t] += 1
    out = {}
    for q, terms in by_q.items():
        scores, matched = {}, {}
        for d, ts in docs.items():
            dl, sc, m = len(ts), Decimal(0), 0
            for t in terms:
                f = tf[d].get(t, 0)
                if not f:
                    continue
                m += 1
                if surrogate:
                    num = (2 * n - 2 * df[t] + 1) * 22 * f * tot
                    den = (2 * df[t] + 1) * (10 * f * tot + 3 * tot
                                             + 9 * dl * n)
                    sc += _q6(float(str(num)) / float(str(den)))
                else:
                    idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                    tfn = f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl * n / tot))
                    sc += Decimal(repr(idf * tfn))
            if m:
                scores[d], matched[d] = sc, m
        top = sorted(scores, key=lambda d: (-scores[d], d))[:k]
        out[q] = [(r + 1, d, matched[d], scores[d])
                  for r, d in enumerate(top)]
    return out


def test_bm25_engine_matches_exact_python_twin(spark):
    """Engine surrogate == the exact Python twin on every column
    (rank, doc_id, matched_terms) and the score to the 1e-6 decimal
    grid the engine sums on."""
    got = bm25_topk(_spark_docs(spark), FIXTURE_QUERIES, k=10).collect()
    want = _py_bm25(_fixture_docs(), FIXTURE_QUERIES, k=10, surrogate=True)
    assert len(got) == sum(len(v) for v in want.values())
    for r in got:
        w = want[r["query_id"]][r["rank"] - 1]
        assert (r["rank"], r["doc_id"], r["matched_terms"]) == w[:3], r
        assert _q6(r["score"]) == w[3], r


def test_bm25_surrogate_ranking_agrees_with_true_log_bm25(spark):
    """The surrogate replaces ln(1 + r) with r per term — monotone per
    term, so single-term rankings are identical and multi-term sums
    can only interleave near-ties: assert exact top-10 SET agreement
    and rank displacement <= 1 vs true log-idf Okapi BM25."""
    got = {}
    for r in bm25_topk(_spark_docs(spark), FIXTURE_QUERIES, k=10).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    true = _py_bm25(_fixture_docs(), FIXTURE_QUERIES, k=10, surrogate=False)
    assert set(got) == set(true)
    for q in got:
        eng = [d for _, d in sorted(got[q])]
        ref = [d for _, d, _, _ in true[q]]
        assert set(eng) == set(ref), q
        disp = max(abs(eng.index(d) - ref.index(d)) for d in eng)
        assert disp <= 1, (q, eng, ref)


def test_bm25_hand_case_tf_and_idf_directions(spark):
    """More occurrences of a term rank higher at equal length; a
    rarer term outweighs a common one at equal tf/dl; matched_terms
    counts matched QUERY terms (term sets, not occurrences)."""
    docs = spark.createDataFrame([
        Row(doc_id=1, text="rare x x x"),
        Row(doc_id=2, text="rare rare x x"),      # higher tf, same dl
        Row(doc_id=3, text="common x x x"),
        Row(doc_id=4, text="common y y y"),
        Row(doc_id=5, text="common z z z"),       # df(common)=3 > df(rare)=2
        Row(doc_id=6, text="rare common x x"),    # matches both terms
    ])
    out = bm25_topk(docs, [("q", "rare"), ("q", "common")], k=10,
                    text_col="text", id_col="doc_id").collect()
    rank = {r["doc_id"]: r["rank"] for r in out}
    matched = {r["doc_id"]: r["matched_terms"] for r in out}
    score = {r["doc_id"]: r["score"] for r in out}
    assert matched == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 2}
    assert rank[6] == 1                       # both terms matched
    assert score[2] > score[1]                # tf direction
    assert score[1] > score[3]                # idf direction (rarer wins)
    assert rank[3] < rank[4] < rank[5] or (
        score[3] == score[4] == score[5])     # equal-score ties by doc_id
    eq = [r["rank"] for r in out if r["doc_id"] in (3, 4, 5)]
    assert sorted(eq) == sorted(
        rank[d] for d in sorted((3, 4, 5)))   # ties broken by doc_id


def test_rrf_fuse_hand_case_exact_decimals(spark):
    """sparse {a:1, b:2}, dense {b:1, c:2} -> rrf(b)=1/61+1/62,
    rrf(a)=1/61, rrf(c)=1/62 on the 1e-6 decimal grid; a missing arm
    contributes exactly zero and surfaces as NULL rank."""
    sparse = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2)], "q_id STRING, doc_id STRING, rn INT")
    dense = spark.createDataFrame(
        [("q", "b", 1), ("q", "c", 2)], "q_id STRING, doc_id STRING, rn INT")
    out = {r["doc_id"]: r for r in rrf_fuse(sparse, dense, k=10).collect()}
    assert set(out) == {"a", "b", "c"}
    q6 = lambda v: float(_q6(v))  # noqa: E731
    assert out["b"]["rrf"] == q6(1 / 61) + q6(1 / 62)
    assert out["a"]["rrf"] == q6(1 / 61)
    assert out["c"]["rrf"] == q6(1 / 62)
    assert [out[d]["rank"] for d in ("b", "a", "c")] == [1, 2, 3]
    assert (out["a"]["sparse_rank"], out["a"]["dense_rank"]) == (1, None)
    assert (out["c"]["sparse_rank"], out["c"]["dense_rank"]) == (None, 2)
    assert (out["b"]["sparse_rank"], out["b"]["dense_rank"]) == (2, 1)


def test_jaccard_ranks_hand_case(spark):
    """Distinct-token-set Jaccard, self-excluded, zero-overlap rows
    dropped, ties by doc_id."""
    docs = spark.createDataFrame([
        Row(doc_id=0, text="a b c"),
        Row(doc_id=1, text="a b c c c"),   # J(0,1) = 3/3 = 1 (distinct sets)
        Row(doc_id=2, text="a b x y"),     # J(0,2) = 2/5
        Row(doc_id=3, text="x y z"),       # J(0,3) = 0 -> dropped
        Row(doc_id=4, text="a q r s"),     # J(0,4) = 1/6
    ])
    out = [(r["doc_id"], r["rn"])
           for r in jaccard_ranks(docs, [0], arm_k=10).collect()]
    assert sorted(out, key=lambda x: x[1]) == [(1, 1), (2, 2), (4, 3)]


def test_ks_drift_closed_form_cases(spark):
    """Identical samples -> D=0; separated supports -> D=1 at the
    crossing point; interleaved hand case -> exact rational."""
    rows = []
    for i, v in enumerate([1, 1, 2, 3]):
        rows.append(Row(doc_id=i, n_chars=v, source="a"))
    for i, v in enumerate([1, 2, 2, 3]):
        rows.append(Row(doc_id=10 + i, n_chars=v, source="b"))
    for i, v in enumerate([1, 1, 2, 3]):
        rows.append(Row(doc_id=20 + i, n_chars=v, source="c"))  # == a
    for i, v in enumerate([10, 20]):
        rows.append(Row(doc_id=30 + i, n_chars=v, source="d"))  # disjoint
    df = spark.createDataFrame(rows)
    out = {(r["source_a"], r["source_b"]): r
           for r in ks_value_drift(df).collect()}
    assert len(out) == 6
    # a vs c identical: D = 0, ks_at = smallest grid value
    assert out[("a", "c")]["ks"] == 0.0
    assert out[("a", "c")]["ks_at"] == 1
    # a vs d separated: F_a(3)=1, F_d(3)=0 -> D=1 at x=3
    assert out[("a", "d")]["ks"] == 1.0
    assert out[("a", "d")]["ks_at"] == 3
    # a=[1,1,2,3] vs b=[1,2,2,3]: |F| diffs at x=1: |2-1|/4, else 0
    assert out[("a", "b")]["ks"] == 0.25
    assert out[("a", "b")]["ks_at"] == 1
    assert (out[("a", "b")]["n_a"], out[("a", "b")]["n_b"]) == (4, 4)


def test_ks_drift_random_matches_exact_python(spark):
    """On random integer samples the engine equals an exact Python
    twin (integer cross-products, one final division) on every pair,
    including ks_at (the smallest argmax)."""
    rng = random.Random(9)
    rows, samples = [], {}
    for g, (lo, hi, n) in {"s1": (0, 30, 80), "s2": (5, 40, 50),
                           "s3": (0, 10, 65)}.items():
        vals = [rng.randint(lo, hi) for _ in range(n)]
        samples[g] = vals
        rows += [Row(doc_id=len(rows) + i, n_chars=v, source=g)
                 for i, v in enumerate(vals)]
    got = {(r["source_a"], r["source_b"]):
           (r["n_a"], r["n_b"], r["ks_at"], r["ks"])
           for r in ks_value_drift(spark.createDataFrame(rows)).collect()}
    grid = sorted({v for vs in samples.values() for v in vs})
    for ga, gb in [("s1", "s2"), ("s1", "s3"), ("s2", "s3")]:
        a, b = samples[ga], samples[gb]
        na, nb = len(a), len(b)
        diffs = [(abs(sum(1 for v in a if v <= x) * nb
                      - sum(1 for v in b if v <= x) * na), x) for x in grid]
        d_max = max(d for d, _ in diffs)
        ks_at = min(x for d, x in diffs if d == d_max)
        want = (na, nb, ks_at,
                float(str(d_max)) / (float(na) * float(nb)))
        assert got[(ga, gb)] == want, (ga, gb, got[(ga, gb)], want)


def test_bm25_from_index_row_identical_to_direct(spark):
    """The materialized-index serve path (bm25_index -> parquet ->
    bm25_from_index) returns rows BIT-identical to bm25_topk over the
    raw corpus, including the double score (shared scoring tail;
    stats derived from the index)."""
    import os
    import tempfile

    from market_data_ingestor_go_spark.operators.retrieval import (
        bm25_from_index, bm25_index)

    docs = _spark_docs(spark)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "postings")
        bm25_index(docs, with_df=True).write.parquet(path)
        postings = spark.read.parquet(path)
        got = sorted(map(tuple, bm25_from_index(
            postings, FIXTURE_QUERIES, k=10).collect()))
        # default build omits the diagnostic df column entirely (the
        # serve path recomputes it); with_df=True stores a consistent
        # one: one row per (doc, term), df constant within a term
        assert "df" not in bm25_index(docs).columns
        assert postings.groupBy("doc_id", "term").count() \
            .filter("count > 1").count() == 0
        assert postings.groupBy("term").agg(
            F.countDistinct("df").alias("n")).filter("n > 1").count() == 0
    want = sorted(map(tuple, bm25_topk(
        docs, FIXTURE_QUERIES, k=10).collect()))
    assert got == want


def test_term_bucket_python_twin_matches_spark(spark):
    """The driver-side partition-pruning hinge: the pure-Python
    ``term_bucket`` must assign every term the SAME bucket as the
    Spark ``hash_bucket`` column the index was partitioned with —
    over the full fixture vocabulary plus unicode/edge strings."""
    from market_data_ingestor_go_spark.operators.retrieval import (
        N_TERM_BUCKETS, term_bucket)
    from market_data_ingestor_go_spark.operators.training import (
        hash_bucket)

    docs = _spark_docs(spark)
    vocab = [r[0] for r in docs.filter("text is not null")
             .select(F.explode(F.split(F.trim("text"), r"\s+"))
                     .alias("t")).distinct().collect()]
    vocab += ["", "a", "ünïcode", "日本語", "x" * 100]
    sp = {r["t"]: r["b"] for r in
          spark.createDataFrame([(v,) for v in vocab], "t STRING")
          .withColumn("b", hash_bucket("t", N_TERM_BUCKETS)).collect()}
    assert sp == {v: term_bucket(v) for v in vocab}


def test_bm25_from_bucketed_index_row_identical(spark):
    """A term-bucket-PARTITIONED index (bm25_index(term_buckets=n) +
    partitionBy write under the modulus-carrying column name) serves
    rows bit-identical to the direct path: the driver-side bucket
    prune is a strict superset of the vocab join, and stats still
    aggregate over ALL partitions."""
    import os
    import tempfile

    from market_data_ingestor_go_spark.operators.retrieval import (
        N_TERM_BUCKETS, bm25_from_index, bm25_index, term_bkt_name)

    docs = _spark_docs(spark)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "postings_bkt")
        bm25_index(docs, term_buckets=N_TERM_BUCKETS) \
            .write.partitionBy(term_bkt_name(N_TERM_BUCKETS)) \
            .parquet(path)
        got = sorted(map(tuple, bm25_from_index(
            spark.read.parquet(path), FIXTURE_QUERIES, k=10).collect()))
    want = sorted(map(tuple, bm25_topk(
        docs, FIXTURE_QUERIES, k=10).collect()))
    assert got == want


def test_bm25_bucket_modulus_self_describing(spark):
    """r11 (ADVICE): the bucket modulus travels in the partition
    column NAME (term_bkt4), so (1) a non-default build serves
    row-identically with NO count threaded — derived from the
    schema; (2) a CONFLICTING explicit n_term_buckets raises instead
    of silently pruning matching postings; (3) the matching explicit
    count still works."""
    import os
    import tempfile

    import pytest

    from market_data_ingestor_go_spark.operators.retrieval import (
        bm25_from_index, bm25_index, term_bkt_name)

    docs = _spark_docs(spark)
    want = sorted(map(tuple, bm25_topk(docs, FIXTURE_QUERIES,
                                       k=10).collect()))
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "postings_b4")
        bm25_index(docs, term_buckets=4) \
            .write.partitionBy(term_bkt_name(4)).parquet(path)
        postings = spark.read.parquet(path)
        derived = sorted(map(tuple, bm25_from_index(
            postings, FIXTURE_QUERIES, k=10).collect()))
        assert derived == want
        explicit = sorted(map(tuple, bm25_from_index(
            postings, FIXTURE_QUERIES, k=10,
            n_term_buckets=4).collect()))
        assert explicit == want
        with pytest.raises(ValueError, match="4 term buckets"):
            bm25_from_index(postings, FIXTURE_QUERIES, k=10,
                            n_term_buckets=16)


def test_bm25_legacy_bucket_count_threads_to_serve(spark):
    """A LEGACY index whose partition column is plain ``term_bkt``
    (no modulus in the name) still relies on the caller threading the
    build's count — row-identical with the right one, and the
    documented mismatch hazard is real: pruning with the wrong
    modulus loses matching postings (results change) BOTH ways, which
    is why new builds self-describe."""
    import os
    import tempfile

    from market_data_ingestor_go_spark.operators.retrieval import (
        bm25_from_index, bm25_index, term_bkt_name)

    docs = _spark_docs(spark)
    want = sorted(map(tuple, bm25_topk(docs, FIXTURE_QUERIES,
                                       k=10).collect()))
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "postings_b4l")
        bm25_index(docs, term_buckets=4) \
            .withColumnRenamed(term_bkt_name(4), "term_bkt") \
            .write.partitionBy("term_bkt").parquet(path)
        postings = spark.read.parquet(path)
        got = sorted(map(tuple, bm25_from_index(
            postings, FIXTURE_QUERIES, k=10,
            n_term_buckets=4).collect()))
        assert got == want
        mismatched = sorted(map(tuple, bm25_from_index(
            postings, FIXTURE_QUERIES, k=10,
            n_term_buckets=16).collect()))
        assert mismatched != want


def test_bm25_from_index_sidecar_stats_equal_derived(spark):
    """The stats-sidecar serve contract: passing a precomputed
    (n_docs, tot) one-row stats DataFrame returns rows bit-identical
    to deriving stats from the full index — and a WRONG sidecar
    changes scores (the test would catch a silently ignored param)."""
    import os
    import tempfile

    from market_data_ingestor_go_spark.operators.retrieval import (
        bm25_from_index, bm25_index)

    docs = _spark_docs(spark)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "postings_sc")
        bm25_index(docs).write.parquet(path)
        postings = spark.read.parquet(path)
        stats = (postings.select("doc_id", "dl").distinct()
                 .agg(F.count("*").alias("n_docs"),
                      F.sum("dl").alias("tot")))
        derived = sorted(map(tuple, bm25_from_index(
            postings, FIXTURE_QUERIES, k=10).collect()))
        sidecar = sorted(map(tuple, bm25_from_index(
            postings, FIXTURE_QUERIES, k=10, stats=stats).collect()))
        assert sidecar == derived
        wrong = stats.select((F.col("n_docs") * 100).alias("n_docs"),
                             (F.col("tot") * 100).alias("tot"))
        perturbed = sorted(map(tuple, bm25_from_index(
            postings, FIXTURE_QUERIES, k=10, stats=wrong).collect()))
        assert perturbed != derived


def test_hybrid_rrf_ann_overlap_vs_exact(spark):
    """The ANN-armed hybrid (IVF dense arm, probe 2/16 cells) against
    the exact hybrid: fused-top-10 overlap per fixture query. The
    whole pipeline is deterministic (hash-sample centroids, doc_id
    tiebreaks), so the overlap is exactly reproducible — pinned at
    the observed values (repo convention: the value itself, not a
    lax floor; any recall regression fails immediately). The sparse
    arm is shared, so misses come only from IVF cell pruning on the
    near-random fixture embeddings."""
    from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES

    exact, ann = {}, {}
    for r in ALL_QUERIES["hybrid_rrf_retrieval"](spark, SF).collect():
        exact.setdefault(r["q_id"], set()).add(r["doc_id"])
    for r in ALL_QUERIES["hybrid_rrf_ann"](spark, SF).collect():
        ann.setdefault(r["q_id"], set()).add(r["doc_id"])
    got = {q: len(exact[q] & ann.get(q, set())) / len(exact[q])
           for q in sorted(exact)}
    assert got == {0: 0.8, 1: 0.5, 2: 0.6}, got


def test_bm25_null_text_docs_excluded_consistently(spark):
    """Review catch r9: a NULL-text doc must be excluded from the
    collection in BOTH paths (no postings AND no contribution to
    N/total-length), so the direct and from-index results stay
    row-identical on corpora with NULL rows — previously bm25_topk
    counted the doc in n_docs while the index path dropped it,
    shifting every score."""
    import os
    import tempfile

    from market_data_ingestor_go_spark.operators.retrieval import (
        bm25_from_index, bm25_index)

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma gamma"), (3, None),
         (4, "beta beta delta")],
        "doc_id LONG, text STRING")
    clean = docs.filter("text IS NOT NULL")
    q = [("q", "alpha"), ("q", "beta")]
    direct = sorted(map(tuple, bm25_topk(docs, q, k=10).collect()))
    # identical to running on the pre-filtered corpus...
    assert direct == sorted(map(tuple,
                                bm25_topk(clean, q, k=10).collect()))
    # ...and to the from-index serve over an index built WITH the
    # NULL row present
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "p")
        bm25_index(docs).write.parquet(path)
        got = sorted(map(tuple, bm25_from_index(
            spark.read.parquet(path), q, k=10).collect()))
    assert got == direct


def test_latest_epoch_postings_reingest_path(spark):
    """r11 (verdict #5): the supported UPDATE path for the
    append-only postings contract. A doc re-ingested with changed
    text as a NEW epoch double-counts when served raw (both versions
    live, N/TOT inflated); after latest_epoch_postings the serve is
    row-identical to bm25_topk over the corpus where the doc has ONLY
    its new text, and N/TOT count it once."""
    from market_data_ingestor_go_spark.operators.retrieval import (
        bm25_from_index, doc_postings, latest_epoch_postings)

    v1 = spark.createDataFrame(
        [(1, "hash join merge sort"), (2, "scan filter vector data")],
        "doc_id BIGINT, text STRING")
    new1 = spark.createDataFrame(
        [(1, "customer order data entry pipeline")],
        "doc_id BIGINT, text STRING")
    idx = (doc_postings(v1).withColumn("epoch", F.lit(0))
           .unionByName(doc_postings(new1).withColumn("epoch", F.lit(1))))

    latest = latest_epoch_postings(idx)
    # doc 1 carries ONLY its epoch-1 postings; doc 2 is untouched
    assert latest.filter("doc_id = 1").select("epoch").distinct() \
        .collect() == [Row(epoch=1)]
    stats = (latest.select("doc_id", "dl").distinct()
             .agg(F.count("*").alias("n"), F.sum("dl").alias("t"))
             .collect()[0])
    assert (stats["n"], stats["t"]) == (2, 5 + 4)  # counted ONCE

    after = v1.filter("doc_id != 1").unionByName(new1)
    want = sorted(map(tuple, bm25_topk(
        after, FIXTURE_QUERIES, k=10).collect()))
    got = sorted(map(tuple, bm25_from_index(
        latest, FIXTURE_QUERIES, k=10).collect()))
    assert got == want

    # the hazard the dedup removes: served RAW, doc 1's two posting
    # sets both live and N/TOT double-count it
    raw = sorted(map(tuple, bm25_from_index(
        idx, FIXTURE_QUERIES, k=10).collect()))
    assert raw != want


def test_bm25_decimal_guard_past_bound(spark):
    """r11 (verdict #6): the N·D·TOT ≤ 2.2e36 decimal-headroom bound
    (module-doc derivation) is RUNTIME-enforced on the broadcast
    stats row — mirroring PMI_MAX_TOTAL_TOKENS — so a corpus past it
    fails loudly instead of silently nulling scores. Just inside the
    bound still executes."""
    import pytest

    from market_data_ingestor_go_spark.operators.retrieval import (
        bm25_from_index, doc_postings)

    docs = spark.createDataFrame(
        [(1, "hash join merge"), (2, "scan filter hash")],
        "doc_id BIGINT, text STRING")
    postings = doc_postings(docs)

    over = spark.createDataFrame(
        [(10**12, 10**18, 10**7)],
        "n_docs BIGINT, tot BIGINT, max_dl BIGINT")  # 1e37 > 2.2e36
    with pytest.raises(Exception, match="decimal headroom"):
        bm25_from_index(postings, FIXTURE_QUERIES, k=10,
                        stats=over).collect()

    under = spark.createDataFrame(
        [(10**11, 10**15, 10**5)],
        "n_docs BIGINT, tot BIGINT, max_dl BIGINT")  # 1e31 ≪ bound
    assert bm25_from_index(postings, FIXTURE_QUERIES, k=10,
                           stats=under).collect() is not None
