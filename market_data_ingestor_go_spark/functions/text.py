"""Text-analysis column functions for the LLM-data-pipeline surface.

These are extension operators (SURVEY.md §2.11, driver mandate): the
reference has no text processing, so the semantics here are defined by
this engine and checked against the DuckDB oracle. Everything is a pure
Column expression (JVM-side, codegen-friendly): tokenization, shingling,
stopword/quality stats, fingerprints, and a heuristic language guess.

Scale posture: all per-row expressions — embarrassingly parallel, no
shuffle, no Python. At 100 TB these run at parquet-scan speed inside
WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny function-word list used by the quality score and the heuristic
# language guess. Deliberately small and fixed so the DuckDB oracle can
# mirror it verbatim.
STOPWORDS = ["the", "a", "and", "of", "to"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (single-space corpus → exact split)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(col), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_count(text: str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    quoted = ", ".join(f"'{w}'" for w in sw)
    return F.expr(f"size(filter(split(trim({text}), '\\\\s+'), t -> t IN ({quoted})))")


def stopword_ratio(text: str) -> Column:
    """stopword tokens / all tokens as DOUBLE (no rounding — the ratio
    of two identical ints is bit-identical across engines)."""
    return stopword_count(text) / token_count(text).cast("double")


def quality_flag(text: str, min_tokens: int = 20, max_stop_ratio: float = 0.5) -> Column:
    """Boolean keep/drop signal: long enough and not stopword-soup."""
    return (token_count(text) >= F.lit(min_tokens)) & (stopword_ratio(text) <= F.lit(max_stop_ratio))


def normalized_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    col = F.col(text) if isinstance(text, str) else text
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """128-bit content fingerprint of the normalized text (md5 hex)."""
    return F.md5(normalized_text(text))


def shingles(text: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles — the unit of near-dup similarity.

    Docs with fewer than ``n`` tokens yield an EMPTY array, matching the
    oracle's ``len(w) >= n`` CASE. Without the guard the old
    ``sequence(0, greatest(size(w)-n, -1))`` form produced ``[0, -1]``
    for short docs and ``slice(w, 0, n)`` threw
    INVALID_PARAMETER_VALUE.START at runtime.

    The token array is BOUND ONCE per row via a single-element
    ``transform(array(split(...)), w -> ...)`` wrapper — inlining the
    split into the per-shingle lambda would re-tokenize the full text
    once per shingle (O(tokens²) per doc; dedup.shingle_df measured
    that shape 4× slower).
    """
    w = f"split(trim({text}), '\\\\s+')"
    return F.expr(
        f"CASE WHEN size({w}) >= {n} THEN "
        f"array_distinct(transform(array({w}),"
        f" w -> transform(sequence(1, size(w) - {n} + 1),"
        f" i -> concat_ws(' ', slice(w, i, {n}))))[0]) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def lang_guess(text: str) -> Column:
    """Heuristic language ID: function-word density → 'en' vs 'other'.

    A real deployment would use character n-gram profiles per language;
    the fixture corpus shares one vocabulary across langs, so the
    operator's value here is its deterministic, oracle-checkable shape.
    """
    return F.when(stopword_ratio(text) > F.lit(0.03), F.lit("en")).otherwise(F.lit("other"))


def ngram_total(text: str, n: int = 3) -> Column:
    """How many word n-grams the document yields (with repeats)."""
    return F.greatest(token_count(text) - F.lit(n - 1), F.lit(0))


def repetition_ratio(text: str, n: int = 3) -> Column:
    """1 − distinct/total n-grams — the boilerplate/repetition quality
    signal (0 = no repeated n-grams, →1 = loops of the same phrase).
    Pure Column arithmetic over the shingle machinery; scan-speed."""
    total = ngram_total(text, n)
    distinct = F.size(shingles(text, n))
    return F.when(
        total > 0,
        F.lit(1.0) - distinct.cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))


# BPE-ish pre-tokenizer (GPT-2 pretokenizer shape, minus the \s+(?!\S)
# lookahead RE2 can't do): contractions, letter runs, digit runs,
# punctuation runs. Counting its matches estimates BPE token counts at
# scan speed — the standard cheap proxy for "how many tokens will the
# tokenizer emit" in corpus budgeting. Shared Java∩RE2 syntax so the
# DuckDB oracle runs the identical pattern string.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_estimate(text: Column | str) -> Column:
    """Estimated BPE token count per row (JVM regexp, scan-speed)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


# Rabin-Karp rolling hash over token windows — document fingerprinting
# for shift-tolerant content identity (winnowing's ingredient). Token
# base hash is the md5-prefix integer (the cross-engine recipe:
# Spark conv(substring(md5(t),1,8),16,10) ≡ DuckDB
# CAST('0x'||substring(md5(t),1,8) AS BIGINT)); window hash is
# Σ x_{i+k}·B^(w-1-k) mod P with every term mod-reduced so the math
# stays inside a 64-bit long under ANSI mode.
ROLL_BASE = 257
ROLL_MOD = (1 << 31) - 1


def token_hash_array(text: str) -> Column:
    """ARRAY<BIGINT> of per-token md5-prefix hashes (32-bit range)."""
    return F.expr(
        f"transform(split(trim({text}), '\\\\s+'),"
        " t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT))")


def rolling_window_hashes(hash_arr: str, window: int = 8) -> Column:
    """ARRAY<BIGINT> of Rabin-Karp hashes, one per token window; docs
    shorter than ``window`` yield an empty array (CASE guard — see
    shingles() for why the unguarded sequence form crashes)."""
    powers = [pow(ROLL_BASE, window - 1 - k, ROLL_MOD) for k in range(window)]
    terms = " + ".join(
        f"(element_at({hash_arr}, CAST(i + {k} AS INT)) * {powers[k]}L) % {ROLL_MOD}"
        for k in range(window))
    return F.expr(
        f"CASE WHEN size({hash_arr}) >= {window} THEN "
        f"transform(sequence(1, size({hash_arr}) - {window} + 1),"
        f" i -> ({terms}) % {ROLL_MOD}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END")


def winnow_selected(wh_arr: str, w: int = 4) -> Column:
    """Winnowing fingerprint SELECTION (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm) over a per-doc window-hash array
    (``rolling_window_hashes`` output): from every window of ``w``
    consecutive hashes keep the MINIMUM, ties to the RIGHTMOST
    position (the paper's rule — it makes consecutive windows reuse
    the same selection), then dedup → ARRAY<BIGINT> of encoded
    (pos, fp) pairs, ``pos · (2³¹−1) + fp`` (injective: fp <
    2³¹−1 = ROLL_MOD; a single BIGINT survives array_distinct
    identically in every engine, structs do not). Decode with
    ``fp = v % ROLL_MOD``, ``pos = v div ROLL_MOD``.

    Guarantee (the paper's): every w consecutive hashes contribute
    ≥1 selection, so any shared token run of ≥ k + w − 1 tokens
    (k = the rolling window) is always detected through a shared
    fingerprint, while only ~2/(w+1) of hashes are kept — the index
    shrinks ~(w+1)/2× with NO detection gap above the guarantee
    length. Docs with 1 ≤ m < w hashes keep their single global
    minimum (one fingerprint per non-empty doc); empty → empty.

    Rightmost-argmin without an indexed fold (neither engine reduces
    over indices portably): mn = min(window), then the rightmost
    index of mn is ``w − first-position-of-mn-in-reversed-window``
    (1-based position functions in both engines)."""
    M = ROLL_MOD

    def sel(i_expr: str, width, arr: str) -> str:
        s = f"slice({arr}, {i_expr} + 1, {width})"
        mn = f"array_min({s})"
        pos = f"{i_expr} + {width} - array_position(reverse({s}), {mn})"
        return f"CAST({pos} AS BIGINT) * {M}L + {mn}"

    return F.expr(
        f"CASE WHEN size({wh_arr}) >= {w} THEN "
        f"array_distinct(transform(sequence(0, size({wh_arr}) - {w}),"
        f" i -> {sel('i', w, wh_arr)})) "
        f"WHEN size({wh_arr}) >= 1 THEN "
        f"array({sel('0', f'size({wh_arr})', wh_arr)}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END")


# PII patterns deliberately use only syntax shared by Java regex and
# RE2-family engines (no lookbehind) so the DuckDB oracle can run the
# same pattern strings verbatim.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
}


def pii_count(text: Column | str, pattern: str) -> Column:
    """Matches of one PII pattern per row (JVM regexp, scan-speed)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(pattern))


def scrub_pii(text: Column | str, token: str = "[PII]") -> Column:
    """Redact every PII pattern with ``token`` — the content-filter
    step of a training pipeline. Chained regexp_replace stays inside
    codegen; order is fixed (email → phone → ipv4) so engines agree
    when patterns overlap."""
    col = F.col(text) if isinstance(text, str) else text
    for pat in (PII_PATTERNS["email"], PII_PATTERNS["phone"],
                PII_PATTERNS["ipv4"]):
        col = F.regexp_replace(col, pat, token)
    return col


def compressibility_features(df, text_col: str = "text",
                             id_col: str = "doc_id",
                             level: int = 6):
    """Per-doc zlib compression ratio — the classic model-free
    boilerplate/repetition signal (highly compressible text is
    template-heavy; near-random text barely compresses). This is a
    DECLARED Python path (like the media kernels): zlib has no Column
    twin, so the kernel runs Arrow-batched via ``mapInPandas`` with
    stdlib zlib only. The declarative cousin is
    ``repetition_ratio`` (n-gram duplication); the two signals agree
    on what they flag (correlation asserted in tests) but
    compressibility also catches long-range and sub-token repetition
    n-gram counting can't see.

    Output: (<id_col>, n_bytes, n_compressed, compression_ratio) where
    ratio = compressed/raw in (0, ~1.1] — LOWER means more
    repetitive. Deterministic: zlib at a fixed level is a pure
    function of the bytes.
    """
    from pyspark.sql import types as T

    # preserve the caller's id column name AND type (a string/uuid id
    # must not be int()-coerced — that would abort the stage, against
    # the per-layer bad-input policy; review catch)
    id_field = df.schema[id_col]
    schema = T.StructType([
        T.StructField(id_col, id_field.dataType),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_compressed", T.LongType()),
        T.StructField("compression_ratio", T.DoubleType()),
    ])

    def kernel(batches):
        import zlib

        import pandas as _pd
        for pdf in batches:
            out = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raw = (t or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                ratio = (len(comp) / len(raw)) if raw else 1.0
                out.append((i, len(raw), len(comp), ratio))
            yield _pd.DataFrame(out, columns=[
                id_col, "n_bytes", "n_compressed", "compression_ratio"])

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
