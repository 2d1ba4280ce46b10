"""Tests for the LM-quality curation family (operators/lm_quality.py):
cross-entropy vs an exact Python reference, DSIR's log-form rank
agreement, TV divergence closed-form cases, discriminative power, and
partition-order determinism."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import Row, functions as F

from market_data_ingestor_go_spark.operators.lm_quality import (
    UNK, dsir_importance, ngram_lm_score, token_tv_divergence)
from market_data_ingestor_go_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return load_table(spark, SF, "documents")


def _py_model(rows, vocab_size=24, min_count=2, train_pct=80):
    """Exact Python twin of train_bigram_lm (same tokenization, same
    md5 split coin, same tiebreaks)."""
    def bucket(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:8], 16) % 100

    def toks(text):
        return text.strip().split()

    train = [(i, t) for i, t in rows if bucket(i) < train_pct]
    uni = Counter(w for _, t in train for w in toks(t))
    vocab = set(w for w, _ in sorted(
        uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size])

    def mapped(ws):
        return [w if w in vocab else UNK for w in ws]

    bgc, ctx = Counter(), Counter()
    for _, t in train:
        ws = mapped(toks(t))
        for a, b in zip(ws, ws[1:]):
            bgc[(a, b)] += 1
            ctx[a] += 1
    bgc = {k: v for k, v in bgc.items() if v >= min_count}
    return vocab, bgc, ctx


def test_xent_matches_exact_python(spark):
    """The engine-only xent_bits column (ln-based, excluded from the
    oracle) must equal the exact Python cross-entropy to float noise."""
    d = _docs(spark)
    rows = [(r["doc_id"], r["text"]) for r in
            d.select("doc_id", "text").collect()]
    vocab, bgc, ctx = _py_model(rows)
    v1 = len(vocab) + 1

    got = {r["doc_id"]: (r["xent_bits"], r["n_oov"], r["sum_bg"])
           for r in ngram_lm_score(d, vocab_size=24).collect()}

    checked = 0
    for doc_id, text in rows:
        ws = [w if w in vocab else UNK for w in text.strip().split()]
        terms = [-math.log2((bgc.get((a, b), 0) + 1)
                            / (ctx.get(a, 0) + v1))
                 for a, b in zip(ws, ws[1:])]
        if not terms:
            continue
        exp_x = sum(terms) / len(terms)
        exp_oov = sum(1 for b in ws[1:] if b == UNK)
        exp_bg = sum(bgc.get((a, b), 0) for a, b in zip(ws, ws[1:]))
        x, oov, sbg = got[doc_id]
        assert oov == exp_oov and sbg == exp_bg, doc_id
        assert x == pytest.approx(exp_x, abs=1e-9), doc_id
        checked += 1
    assert checked == len(rows)
    # vocab_size=24 < the fixture's 31 distinct tokens, so the OOV
    # path is genuinely exercised
    assert any(v[1] > 0 for v in got.values())


def test_lm_score_flags_out_of_distribution_docs(spark):
    """The curation property, CCNet-style BAND filtering: the fixture
    corpus is near-max-entropy word salad, so in-distribution docs
    live in a tight perplexity band near the ceiling — degenerate /
    repetitive docs (boilerplate, keyboard-mash loops) fall far BELOW
    the band on cross-entropy (and above it on likelihood), which is
    exactly how an LM-perplexity filter catches them. Both the
    rational lm_score and the true cross-entropy must separate them
    cleanly from every real doc."""
    d = _docs(spark)
    # junk ids chosen to hash OUTSIDE the 80% train split (md5 bucket
    # >= 80) so the model itself is untouched by the injected docs
    junk = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="xx", source="junk", n_chars=len(t))
         for i, t in zip([100001, 100012], [
             "zzq " * 30,                      # single-token OOV loop
             "foo bar " * 20])])               # two-token OOV loop
    scored = ngram_lm_score(d.unionByName(junk), vocab_size=24).collect()
    real = [r for r in scored if r["doc_id"] < 100000]
    fake = [r for r in scored if r["doc_id"] >= 100000]
    assert min(f["lm_score"] for f in fake) > \
        max(r["lm_score"] for r in real)
    assert max(f["xent_bits"] for f in fake) < \
        min(r["xent_bits"] for r in real)


def test_lm_score_partition_order_independent(spark):
    d = _docs(spark)
    a = {r["doc_id"]: r for r in ngram_lm_score(d, vocab_size=24).collect()}
    b = {r["doc_id"]: r
         for r in ngram_lm_score(d.repartition(7), vocab_size=24).collect()}
    assert set(a) == set(b)
    for k in a:
        assert tuple(a[k]) == tuple(b[k]), k


def test_dsir_tracks_log_weight_ordering(spark):
    """The mean-ratio surrogate must rank documents like true DSIR
    (mean log-ratio): Spearman rank correlation > 0.95 on the
    fixture, and the target class must score higher on average."""
    d = _docs(spark)
    out = dsir_importance(d).collect()
    got = {r["doc_id"]: r["imp_score"] for r in out}
    lang = {r["doc_id"]: r["lang"] for r in out}

    # exact Python log-DSIR from the same hashed-bigram features
    def bucket(prev, cur):
        h = hashlib.md5(f"{prev} {cur}".encode()).hexdigest()
        return int(h[:8], 16) % 512

    rows = [(r["doc_id"], r["lang"], r["text"].strip().split())
            for r in d.select("doc_id", "lang", "text").collect()]
    cr, ct = Counter(), Counter()
    for _, lg, ws in rows:
        for a, b in zip(ws, ws[1:]):
            k = bucket(a, b)
            cr[k] += 1
            if lg == "en":
                ct[k] += 1
    craw, ctar = sum(cr.values()), sum(ct.values())
    logw = {}
    for i, _, ws in rows:
        terms = [math.log((ct[bucket(a, b)] + 1) * (craw + 512))
                 - math.log((cr[bucket(a, b)] + 1) * (ctar + 512))
                 for a, b in zip(ws, ws[1:])]
        if terms:
            logw[i] = sum(terms) / len(terms)

    ids = sorted(logw)
    def ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        for rank, i in enumerate(order):
            r[i] = float(rank)
        return r
    ra = ranks([got[i] for i in ids])
    rb = ranks([logw[i] for i in ids])
    n = len(ids)
    d2 = sum((x - y) ** 2 for x, y in zip(ra, rb))
    rho = 1 - 6 * d2 / (n * (n * n - 1))
    assert rho > 0.95, rho

    en = [got[i] for i in got if lang[i] == "en"]
    rest = [got[i] for i in got if lang[i] != "en"]
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_tv_divergence_closed_form_cases(spark):
    """Identical distributions → 0; disjoint supports → 1; a hand
    case → exact rational value (the operator claims EXACT TV)."""
    rows = [
        Row(doc_id=1, text="a a b", source="s1"),
        Row(doc_id=2, text="a a b", source="s2"),   # identical to s1
        Row(doc_id=3, text="c c c d", source="s3"),  # disjoint from s1
        Row(doc_id=4, text="a b b b", source="s4"),
    ]
    df = spark.createDataFrame(rows)
    tv = {(r["source_a"], r["source_b"]): r["tv"]
          for r in token_tv_divergence(df, group_col="source").collect()}
    assert len(tv) == 6
    assert tv[("s1", "s2")] == 0.0
    assert tv[("s1", "s3")] == 1.0
    # s1 = {a:2/3, b:1/3}; s4 = {a:1/4, b:3/4}
    # TV = 0.5*(|2/3-1/4| + |1/3-3/4|) = 0.5*(5/12+5/12) = 5/12
    assert tv[("s1", "s4")] == pytest.approx(5 / 12, abs=1e-15)
    for v in tv.values():
        assert 0.0 <= v <= 1.0


def test_tv_divergence_fixture_sane(spark):
    """All 190 source pairs exist; same-generator sources sit close
    together (drift small but nonzero)."""
    out = token_tv_divergence(_docs(spark)).collect()
    assert len(out) == 190
    assert all(0.0 < r["tv"] < 0.5 for r in out)
    assert all(r["shared_terms"] > 0 for r in out)


def test_repetition_signals_hand_cases(spark):
    """Gopher signals on crafted docs: beyond-first line accounting,
    top-gram tie-break + separator-free char count, the dup-gram
    POSITION UNION (overlapping duplicated grams never double-count),
    and short/empty-doc zero guards."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        repetition_signals)
    rows = [
        Row(doc_id=1, text="a b\na b\nc d"),
        Row(doc_id=2, text="x y x y x y z"),
        Row(doc_id=3, text="q"),
        Row(doc_id=4, text=""),
        Row(doc_id=5, text="p q r s t p q r s t u v"),
    ]
    out = {r["doc_id"]: r for r in repetition_signals(
        spark.createDataFrame(rows), top_ns=(2, 3),
        dup_ns=(2, 5)).collect()}
    r1 = out[1]   # lines [a b, a b, c d]: 1 beyond-first of 3
    assert r1["dup_line_frac"] == pytest.approx(1 / 3)
    assert r1["dup_line_char_frac"] == pytest.approx(3 / 9)
    # 'a b' x2, gram chars 2 (separator excluded) over tok_chars 6
    assert r1["top2gram_char_frac"] == pytest.approx(4 / 6)
    # all 3-grams unique -> nothing REPEATS -> 0 (the count>=2 rule;
    # a count-1 gram is not repetition and must not trip the filter)
    assert r1["top3gram_char_frac"] == 0.0
    r2 = out[2]   # 'x y' x3; dup-2 union covers positions 0..5 of 7
    assert r2["top2gram_char_frac"] == pytest.approx(6 / 7)
    assert r2["dup2gram_char_frac"] == pytest.approx(6 / 7)
    assert r2["dup5gram_char_frac"] == 0.0
    r5 = out[5]   # 'p q r s t' at 0 and 5: union = 10 positions of 12
    assert r5["dup5gram_char_frac"] == pytest.approx(10 / 12)
    # overlapping dup 2-grams union to 0..9, never 2x-counted
    assert r5["dup2gram_char_frac"] == pytest.approx(10 / 12)
    for i in (3, 4):  # shorter than any n / empty: all-zero signals
        r = out[i]
        assert all(r[c] == 0.0 for c in r.asDict()
                   if c.endswith("_frac")), r


def test_quality_signals_hand_cases(spark):
    """Gopher heuristic filters on crafted docs: each cutoff trips
    exactly the doc built to trip it, a clean doc passes at the
    paper's defaults (stop_hits ≥ 2 included), ratios are exact."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        quality_signals)
    good = ("the cat and the dog have fun with all of that house "
            * 5).strip()
    rows = [
        Row(doc_id=1, text=good),                    # passes everything
        Row(doc_id=2, text="# " * 60),               # symbol soup
        Row(doc_id=3, text="- a\n- b\nplain"),       # bullets 2/3
        Row(doc_id=4, text="so...\nand more...\nok"),  # ellipsis 2/3
        Row(doc_id=5, text="123 456 789 " * 20),     # no alpha words
        Row(doc_id=6, text=""),                      # empty
    ]
    got = {r["doc_id"]: r for r in quality_signals(
        spark.createDataFrame(rows)).collect()}
    r1 = got[1]
    assert r1["keep"] and r1["stop_hits"] >= 2 and r1["n_words"] == 60
    assert not got[2]["keep"] and got[2]["symbol_word_ratio"] == 1.0
    assert got[3]["bullet_line_frac"] == pytest.approx(2 / 3)
    assert got[4]["ellipsis_line_frac"] == pytest.approx(2 / 3)
    # '...' occurrences also count as symbols: 2 of 4 words
    assert got[4]["symbol_word_ratio"] == 0.5
    assert got[5]["alpha_word_frac"] == 0.0 and not got[5]["keep"]
    assert got[6]["n_words"] == 1 and not got[6]["keep"]
    for i in (2, 3, 4, 5, 6):
        assert not got[i]["keep"]


def test_chi2_drift_closed_form_cases(spark):
    """Identical distributions → 0; disjoint supports → N_a + N_b
    (the standard two-sample degenerate case: every bin is fully
    private); a hand case → exact rational 25/36 + 25/48."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        chi2_value_drift)
    rows = [
        Row(doc_id=i, source=s, v=v)
        for i, (s, v) in enumerate([
            ("s1", 0), ("s1", 0), ("s1", 1),
            ("s2", 0), ("s2", 0), ("s2", 1),   # identical to s1
            ("s3", 5), ("s3", 6),              # disjoint from s1
            ("s4", 0), ("s4", 1), ("s4", 1), ("s4", 1),
        ])]
    df = spark.createDataFrame(rows)
    out = {(r["source_a"], r["source_b"]): r
           for r in chi2_value_drift(df, value_col="v",
                                     group_col="source",
                                     bin_width=1).collect()}
    assert len(out) == 6
    assert out[("s1", "s2")]["chi2"] == 0.0
    # disjoint: fold_a = N_b, fold_b = N_a → χ² = N_a + N_b = 5
    assert out[("s1", "s3")]["chi2"] == 5.0
    assert out[("s1", "s3")]["shared_bins"] == 0
    # s1 bins {0:2, 1:1} N=3; s4 bins {0:1, 1:3} N=4; no private mass
    # bin0: (2·4−1·3)²/(3·4·3) = 25/36; bin1: (1·4−3·3)²/(3·4·4) = 25/48
    assert out[("s1", "s4")]["chi2"] == pytest.approx(
        25 / 36 + 25 / 48, abs=2e-6)


def test_chi2_drift_matches_exact_python(spark):
    """Randomized corpus vs an exact Decimal twin replicating every
    IEEE/quantization step (d38 cross-products → string-routed
    doubles → DECIMAL(27,6) terms → exact sum): bit-identical."""
    import itertools
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from market_data_ingestor_go_spark.operators.lm_quality import (
        chi2_value_drift)
    rng = random.Random(411)
    rows = [Row(doc_id=i, source=f"g{rng.randrange(4)}",
                v=rng.randrange(0, 40))
            for i in range(300)]
    got = {(r["source_a"], r["source_b"]): r["chi2"]
           for r in chi2_value_drift(
               spark.createDataFrame(rows), value_col="v",
               group_col="source", bin_width=7).collect()}

    cnt, tot = Counter(), Counter()
    for r in rows:
        cnt[(r.source, r.v // 7)] += 1
        tot[r.source] += 1

    def q276(x):  # double → DECIMAL(27,6): 17-digit repr, HALF_UP
        return Decimal(repr(x)).quantize(Decimal("0.000001"),
                                         rounding=ROUND_HALF_UP)

    for ga, gb in itertools.combinations(sorted(tot), 2):
        na, nb = tot[ga], tot[gb]
        ba = {b: c for (g, b), c in cnt.items() if g == ga}
        bb = {b: c for (g, b), c in cnt.items() if g == gb}
        s, sa, sb = Decimal(0), 0, 0
        for b in sorted(set(ba) & set(bb)):
            ca, cb = ba[b], bb[b]
            sa, sb = sa + ca, sb + cb
            d = float(abs(ca * nb - cb * na))
            s += q276(d * d / (float(na * nb) * float(ca + cb)))
        s += q276(float((na - sa) * nb) / float(na))
        s += q276(float((nb - sb) * na) / float(nb))
        assert got[(ga, gb)] == float(s), (ga, gb)


def test_chi2_drift_negative_values_bin_by_floor(spark):
    """ADVICE r11 regression: chi2_value_drift must FLOOR-divide when
    binning (DuckDB's `//` floors; Spark's bare `div` truncates toward
    zero and would merge -bin_width+1..bin_width-1 into bin 0).
    Negative-valued corpus vs the exact Decimal twin binned with
    Python's floor `//`: bit-identical — and the floor/truncate
    difference is material on this data (asserted)."""
    import itertools
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from market_data_ingestor_go_spark.operators.lm_quality import (
        chi2_value_drift)
    rng = random.Random(412)
    rows = [Row(doc_id=i, source=f"g{rng.randrange(3)}",
                v=rng.randrange(-20, 21))
            for i in range(200)]
    got = {(r["source_a"], r["source_b"]): r["chi2"]
           for r in chi2_value_drift(
               spark.createDataFrame(rows), value_col="v",
               group_col="source", bin_width=7).collect()}

    cnt, tot, trunc = Counter(), Counter(), Counter()
    for r in rows:
        cnt[(r.source, r.v // 7)] += 1          # floor (DuckDB `//`)
        trunc[(r.source, int(r.v / 7))] += 1    # truncation (old bug)
        tot[r.source] += 1
    assert cnt != trunc, "fixture must distinguish floor from truncate"

    def q276(x):
        return Decimal(repr(x)).quantize(Decimal("0.000001"),
                                         rounding=ROUND_HALF_UP)

    for ga, gb in itertools.combinations(sorted(tot), 2):
        na, nb = tot[ga], tot[gb]
        ba = {b: c for (g, b), c in cnt.items() if g == ga}
        bb = {b: c for (g, b), c in cnt.items() if g == gb}
        s, sa, sb = Decimal(0), 0, 0
        for b in sorted(set(ba) & set(bb)):
            ca, cb = ba[b], bb[b]
            sa, sb = sa + ca, sb + cb
            d = float(abs(ca * nb - cb * na))
            s += q276(d * d / (float(na * nb) * float(ca + cb)))
        s += q276(float((na - sa) * nb) / float(na))
        s += q276(float((nb - sb) * na) / float(nb))
        assert got[(ga, gb)] == float(s), (ga, gb)


def test_lm_score_random_corpora_match_exact_python(spark):
    """Property test: on RANDOM corpora (including empty docs,
    singleton docs, all-OOV docs, heavy duplication) the Spark
    bigram-LM scorer equals an exact Python twin on every integer
    column and the rational lm_score, and matches the true
    cross-entropy to float noise.

    Tokenization twin uses re.split (not str.split): Spark's
    split(trim('')) yields [''] — one empty-string token — and
    re.split reproduces that; ASCII-only words keep Java's
    ASCII-\\s and Python's unicode-\\s regexes agreeing."""
    import re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = ["agg", "scan", "row", "key", "zz1", "zz2", "zz3", "zz4"]
    docs_strategy = st.lists(
        st.lists(st.sampled_from(words), min_size=0, max_size=20)
        .map(" ".join),
        min_size=3, max_size=10)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(texts=docs_strategy, vocab_size=st.integers(2, 6),
           min_count=st.integers(1, 3))
    def run(texts, vocab_size, min_count):
        rows = list(enumerate(texts))
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in rows])
        got = {r["doc_id"]: r for r in ngram_lm_score(
            df, vocab_size=vocab_size, min_count=min_count).collect()}

        vocab, bgc, ctx = _py_model_re(rows, vocab_size, min_count)
        v1 = len(vocab) + 1
        for i, t in rows:
            ws = [w if w in vocab else UNK
                  for w in re.split(r"\s+", t.strip())]
            pairs = list(zip(ws, ws[1:]))
            exp = dict(
                n_tokens=len(ws), n_bigrams=len(pairs),
                n_oov=sum(1 for _, b in pairs if b == UNK),
                sum_bg=sum(bgc.get(p, 0) for p in pairs),
                sum_ctx=sum(ctx.get(a, 0) for a, _ in pairs))
            g = got[i]
            for c, v in exp.items():
                assert g[c] == v, (i, c, g[c], v)
            if pairs:
                num = exp["sum_bg"] + exp["n_bigrams"]
                den = exp["sum_ctx"] + exp["n_bigrams"] * v1
                assert g["lm_score"] == num / den, i
                xt = sum(-math.log2((bgc.get(p, 0) + 1)
                                    / (ctx.get(p[0], 0) + v1))
                         for p in pairs) / len(pairs)
                assert g["xent_bits"] == pytest.approx(xt, abs=1e-9)
            else:
                assert g["lm_score"] is None and g["xent_bits"] is None

    def _py_model_re(rows, vocab_size, min_count, train_pct=80):
        import re as _re

        def bucket(doc_id):
            h = hashlib.md5(str(doc_id).encode()).hexdigest()
            return int(h[:8], 16) % 100

        train = [(i, t) for i, t in rows if bucket(i) < train_pct]
        uni = Counter(w for _, t in train
                      for w in _re.split(r"\s+", t.strip()))
        vocab = set(w for w, _ in sorted(
            uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size])
        bgc, ctx = Counter(), Counter()
        for _, t in train:
            ws = [w if w in vocab else UNK
                  for w in _re.split(r"\s+", t.strip())]
            for p in zip(ws, ws[1:]):
                bgc[p] += 1
                ctx[p[0]] += 1
        return vocab, {k: v for k, v in bgc.items()
                       if v >= min_count}, ctx

    run()


def test_pmi_collocations_hand_case(spark):
    """PMI surrogate on a hand corpus: the always-together pair ranks
    above a pair of frequent-but-independent tokens, scores match the
    exact integer formula, min_count prunes, and counts are right."""
    from fractions import Fraction

    from market_data_ingestor_go_spark.operators.lm_quality import (
        pmi_collocations)

    # "new york" always adjacent (5x); "the cat" co-occurs but both
    # tokens are frequent elsewhere; "one off" appears once (pruned
    # at min_count=2)
    rows = [Row(doc_id=i, text="new york " + "the cat " * 2 + "the dog")
            for i in range(5)]
    rows.append(Row(doc_id=9, text="one off"))
    out = {(r["prev"], r["cur"]): r
           for r in pmi_collocations(spark.createDataFrame(rows),
                                     min_count=2, k=50).collect()}
    assert ("one", "off") not in out          # pruned
    assert ("new", "york") in out and ("the", "cat") in out
    ny, tc = out[("new", "york")], out[("the", "cat")]
    assert ny["rank"] < tc["rank"]            # collocation wins
    assert (ny["n_pair"], ny["n_prev"], ny["n_cur"]) == (5, 5, 5)
    assert (tc["n_pair"], tc["n_prev"], tc["n_cur"]) == (10, 15, 10)
    # exact surrogate: (c_ab * T_uni^2) / (c_a * c_b * T_bi)
    t_uni = 5 * 8 + 2                          # 42 tokens
    t_bi = 5 * 7 + 1                           # 36 adjacent pairs
    assert ny["score"] == float(str(5 * t_uni * t_uni)) / float(
        str(5 * 5 * t_bi))
    assert tc["score"] == float(str(10 * t_uni * t_uni)) / float(
        str(15 * 10 * t_bi))
    assert Fraction(5 * t_uni * t_uni, 5 * 5 * t_bi) > \
        Fraction(10 * t_uni * t_uni, 15 * 10 * t_bi)


def test_ngram_novelty_hand_case(spark):
    """3-gram novelty on a hand corpus: exact seen/unseen counts, a
    fully-novel doc scores 1.0, a doc built from reference phrases
    scores low, short (<n tokens) and NULL-text docs are excluded."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        ngram_novelty)

    ref = spark.createDataFrame(
        [Row(doc_id=100, text="a b c d"),
         Row(doc_id=101, text=None)])
    train = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d e"),   # {abc,bcd,cde}: 2 seen
         Row(doc_id=2, text="x y z"),       # {xyz}: fully novel
         Row(doc_id=3, text="a b"),         # <3 tokens: no shingles
         Row(doc_id=4, text=None)])         # NULL: excluded
    out = {r["doc_id"]: r for r in
           ngram_novelty(train, ref, n=3).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["n_shingles"], out[1]["n_seen"]) == (3, 2)
    assert out[1]["novelty"] == 1.0 / 3.0
    assert (out[2]["n_shingles"], out[2]["n_seen"]) == (1, 0)
    assert out[2]["novelty"] == 1.0
    # repeated shingles within a doc count ONCE (distinct semantics):
    # 9 tokens -> 7 positional 3-grams but only {abc, bca, cab}
    # distinct, of which "a b c" appears in the reference
    rep = spark.createDataFrame([Row(doc_id=5, text="a b c a b c a b c")])
    r5 = ngram_novelty(rep, ref, n=3).collect()[0]
    assert (r5["n_shingles"], r5["n_seen"]) == (3, 1)
    assert r5["novelty"] == 2.0 / 3.0


def test_vocab_growth_curve_matches_python_twin(spark):
    """Heaps'-law curve vs an exact Python twin of the md5-bucket
    nested-subsample estimator on the fixture corpus — every row
    (counts AND the ttr double) bit-identical — plus the structural
    property the nesting guarantees: all columns monotone
    nondecreasing in sample_pct."""
    import hashlib
    import re as _re

    from market_data_ingestor_go_spark.operators.lm_quality import (
        vocab_growth_curve)
    from market_data_ingestor_go_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = sorted(map(tuple, vocab_growth_curve(docs, steps=10).collect()))

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10

    rows = [(r["doc_id"], r["text"]) for r in
            docs.select("doc_id", "text").collect()
            if r["text"] is not None]
    per_b_docs, per_b_toks, term_fb = {}, {}, {}
    for i, t in rows:
        b = bucket(i)
        ws = _re.split(r"\s+", t.strip()) or [""]
        per_b_docs[b] = per_b_docs.get(b, 0) + 1
        per_b_toks[b] = per_b_toks.get(b, 0) + len(ws)
        for w in ws:
            term_fb[w] = min(term_fb.get(w, 10), b)
    want = []
    for k in range(1, 11):
        nd = sum(v for b, v in per_b_docs.items() if b < k)
        nt = sum(v for b, v in per_b_toks.items() if b < k)
        nv = sum(1 for fb in term_fb.values() if fb < k)
        if nd:
            want.append((k * 10, nd, nt, nv, float(nv) / float(nt)))
    assert got == sorted(want)
    by_pct = sorted(got)
    for a, b in zip(by_pct, by_pct[1:]):
        assert a[1] <= b[1] and a[2] <= b[2] and a[3] <= b[3]


def test_pmi_decimal_headroom_guard(spark):
    """The runtime headroom guard (PMI_MAX_TOTAL_TOKENS): a corpus
    whose T_uni³ would overflow DECIMAL(38,0) fails LOUDLY at the
    guard, never by silently nulling scores; just inside the bound
    the same shape scores normally. Fed through pmi_from_counts with
    synthetic count tables — the bound is ~4.6 trillion tokens, far
    past anything a fixture can tokenize."""
    import pytest

    from market_data_ingestor_go_spark.operators.lm_quality import (
        PMI_MAX_TOTAL_TOKENS, pmi_from_counts)

    def run(t_uni_each):
        pairs = spark.createDataFrame(
            [("a", "b", 7)], "prev STRING, cur STRING, n_pair LONG")
        uni = spark.createDataFrame(
            [("a", t_uni_each), ("b", t_uni_each)],
            "term STRING, n_term LONG")
        return pmi_from_counts(pairs, uni, min_count=1, k=5).collect()

    # inside the bound: scores come back, exact formula holds
    ok = run(PMI_MAX_TOTAL_TOKENS // 2)
    assert len(ok) == 1 and ok[0]["score"] > 0
    # one past the bound (t_uni = bound + 2): the guard raises
    with pytest.raises(Exception, match="headroom"):
        run(PMI_MAX_TOTAL_TOKENS // 2 + 1)


def test_chi2_negative_bins_match_duckdb(spark):
    """Engine-vs-engine (not engine-vs-Python-twin): the chi2 binning
    law over NEGATIVE values must agree with a DuckDB oracle written
    with the documented `//` + negative-remainder correction — pinned
    because duckdb 1.0.0's `//` TRUNCATES toward zero (-7 // 2 = -3),
    same as Spark's `div`, so floor exists on neither side for free
    (the r12 review catch that inverted the r11 ADVICE claim)."""
    import duckdb
    import pandas as pd

    from market_data_ingestor_go_spark.operators.lm_quality import (
        chi2_value_drift)

    pdf = pd.DataFrame({
        "g": ["a"] * 6 + ["b"] * 6,
        "v": [-101, -50, -49, -1, 0, 49, -101, -100, -99, 1, 50, 99],
    })
    got = sorted(map(tuple, chi2_value_drift(
        spark.createDataFrame(pdf), value_col="v", group_col="g",
        bin_width=50).collect()))

    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(map(tuple, con.execute("""
WITH counts AS (
  SELECT g, CAST(v AS BIGINT) // 50
         - CASE WHEN CAST(v AS BIGINT) % 50 < 0 THEN 1 ELSE 0 END AS x,
         COUNT(*) AS c
  FROM t GROUP BY g, x
), totals AS (SELECT g, SUM(c) AS n FROM counts GROUP BY g)
SELECT c.g, c.x, CAST(c.c AS BIGINT) FROM counts c ORDER BY 1, 2
""").fetchall()))
    # compare the BINNING (the law under test); chi2_from_counts is
    # already parity-pinned downstream of identical histograms
    spark_bins = sorted(
        (r["g"], r["x"], r["c"]) for r in
        spark.createDataFrame(pdf).selectExpr(
            "g",
            "cast(v as bigint) div 50 - "
            "(case when cast(v as bigint) % 50 < 0 then 1 else 0 end)"
            " as x").groupBy("g", "x").count()
        .withColumnRenamed("count", "c").collect())
    assert spark_bins == want
    assert got  # chi2 over the negative corpus computes (smoke)


def test_raw_moments4_sum_width_guard(spark):
    """r15 ADVICE: the DECIMAL(38,0) power SUMS have their own width
    budget beyond the per-term x^4 <= 10^36 bound — n_g·max_cents^4
    approaching 10^38 silently NULLs Spark's non-ANSI decimal sum
    (DuckDB errors). The guard must raise LOUDLY on a violating group
    and stay an identity on groups inside the budget."""
    from market_data_ingestor_go_spark.operators.lm_quality import (
        raw_moments4)

    # cents = 999_999_999 (contract boundary |x| < 10^7):
    # cents^4 ≈ 1e36, so 100 rows breach the 9.9e37 budget…
    hot = spark.createDataFrame(
        [Row(g="a", v=9999999.99)] * 100)
    with pytest.raises(Exception, match="sum-width budget"):
        raw_moments4(hot, "g", "v").collect()

    # …while 90 rows (≈9.0e37) sit inside it and the sums are exact.
    ok = spark.createDataFrame([Row(g="a", v=9999999.99)] * 90)
    row = raw_moments4(ok, "g", "v").collect()[0]
    assert row.n_g == 90
    assert row.s4 == 90 * (999_999_999 ** 4)
    assert row.s1 == 90 * 999_999_999
