"""Byte-pair-encoding tokenizer: real merges, Spark-scale application.

Token counts drive every packing/budget decision in a training-data
pipeline; ``text_bpe_token_estimate`` approximates them with a regex.
This module trains REAL BPE merges (Sennrich et al. 2016) and counts
tokens with them, split the way the k-means codebooks are:

- TRAIN on a bounded artifact: one corpus scan builds the word
  frequency table (the sufficient statistic for BPE — the algorithm
  only ever sees word types × counts); the top ``max_vocab`` word
  types by count collect to the driver (codebook contract: bounded
  regardless of corpus size) and the classic merge loop runs there —
  pure Python over ≤ max_vocab word types, deterministic ties
  (count desc, then lexicographic pair).
- APPLY in the JVM: tokenizing a word depends only on the word, so
  the per-word token counts for the vocabulary are computed once on
  the driver and BROADCAST; documents explode to words, join the
  vocab table (broadcast hash join), and unseen words fall back to
  their character count (the fully-unmerged worst case). No Python
  runs in the apply path.

Scale: training cost is bounded by max_vocab (never corpus size);
application is one explode + one broadcast join + one re-aggregate —
the same shape as every other per-token operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_freqs(df: DataFrame, text_col: str, max_vocab: int) -> list:
    """Top word types by corpus frequency — the bounded training set.
    Deterministic order: count desc, then word."""
    w = (df.select(F.explode(F.split(F.trim(F.col(text_col)),
                                     r"\s+")).alias("w"))
         .filter(F.col("w") != "")
         .groupBy("w").agg(F.count("*").alias("n"))
         .orderBy(F.col("n").desc(), "w")
         .limit(max_vocab))
    return [(r["w"], int(r["n"])) for r in w.collect()]


def train_bpe_merges(df: DataFrame, text_col: str = "text",
                     n_merges: int = 200,
                     max_vocab: int = 10_000,
                     freqs: list | None = None) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus word frequencies.

    Classic algorithm on the driver over the bounded word-type table:
    every word starts as a character sequence; each step merges the
    most frequent adjacent symbol pair (ties: lexicographic pair) and
    rewrites the affected words. Returns the ordered merge list — the
    tokenizer model artifact. Pass ``freqs`` (a ``_word_freqs``
    result) to reuse an already-collected table — callers that also
    need the vocab list otherwise pay the corpus scan twice.
    """
    if freqs is None:
        freqs = _word_freqs(df, text_col, max_vocab)
    words: list[tuple[list[str], int]] = [(list(w), n) for w, n in freqs]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break  # nothing left worth merging
        merges.append((a, b))
        merged = a + b
        new_words = []
        for syms, n in words:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, n))
        words = new_words
    return merges


def tokenize_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the merge list to one word (driver/test helper — the
    Spark path uses per-word COUNTS, not the symbols)."""
    syms = list(word)
    for a, b in merges:
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_token_counts(df: DataFrame, merges: list[tuple[str, str]],
                     vocab_words: list[str],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document BPE token count, JVM-side.

    Per-word counts for the vocabulary are computed once on the
    driver (|vocab| words × cheap merge walks) and broadcast; docs
    explode to words, equi-join the vocab (broadcast). Out-of-vocab
    words cost len(word) tokens — a conservative UPPER BOUND, not the
    exact count: trained merges apply to ANY word containing the
    pair, so a rare word sharing substrings with the vocab would
    tokenize shorter (exactness-vs-coverage trade pinned in tests).
    Counts are exact wherever the vocab covers the corpus.
    """
    spark = df.sparkSession
    rows = [(w, len(tokenize_word(w, merges))) for w in vocab_words]
    vocab = F.broadcast(spark.createDataFrame(rows, "w STRING, n_tok INT"))
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")) \
        .filter(F.col("w") != "")
    joined = words.join(vocab, "w", "left")
    per_word = F.coalesce(F.col("n_tok"), F.length("w"))
    return (joined.groupBy(id_col)
            .agg(F.sum(per_word).cast("bigint").alias("n_bpe_tokens"),
                 F.count("*").alias("n_words")))
