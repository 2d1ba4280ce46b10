#!/usr/bin/env python
"""SemDeDup crossover bench: measure the k-means bound's k* advantage
growing with corpus size (r7 verdict item 5).

The exact arm is ``cosine_pairs_blocked`` — the SAME global O(n^2)
pair source ``semantic_dedup_clusters`` (the declared oracle twin)
uses since r8 — followed by semdedup's identical min-id drop rule.
Both arms score pairs with the fold-order-preserving numpy kernel
(semdedup's per-cell kernel, the exact arm's per-block-pair kernel),
so the comparison isolates the clustering bound's WORK reduction,
not a kernel or parallelism artifact. The corpus is the sf0.1
embeddings fixture replicated deterministically
(per-replica sinusoidal perturbation, cosine vs the original ~1, so
replicas are true near-duplicates the dedup must find) up to 16x the
fixture = 32k vectors; nothing outside /root/repo is written.

Three arms:
  exact    cosine_pairs  (measured to n=8000; O(n^2) — the twin)
  fixed-k  k=16          (the declared semdedup_keepers config)
  scaled-k k=n/500       (constant expected cell size — the 100 TB
                          posture: k grows with the corpus, per-cell
                          work stays flat, total work ~linear)

Also records kept-set recall of each bounded arm against the exact
arm where both ran — the bound must buy time, not silently change
the answer beyond the measured boundary-miss floor.

Output: one JSON line per (arm, n) with seconds + recall; paste the
table into SCALING.md.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from market_data_ingestor_go_spark.operators.similarity import (  # noqa: E402
    cosine_pairs_blocked, semdedup, train_kmeans_codebook)
from market_data_ingestor_go_spark.sources.tables import (  # noqa: E402
    load_table, pin_session_confs)

SF_DIR = "/root/testdata/sf0.1"
BASE_N = 2000


def synth_corpus(spark, mult: int):
    """mult deterministic near-duplicate replicas of the fixture:
    replica r of vec v gets id v + r*BASE_N and embedding
    e_i + 0.002*sin(v + 7r + 13i) — tiny angular noise, cosine vs
    the original ~0.9999, so cross-replica pairs sit far above any
    dedup threshold. Pure Column expressions: the corpus
    materializes distributed, never on the driver."""
    base = load_table(spark, SF_DIR, "embeddings")
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    return (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(BASE_N)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + F.lit(0.002)
                * F.sin(F.col("vec_id") + 7 * F.col("rep") + 13 * i),
            ).alias("embedding"),
        )
    )


def timed_keepers(df, k, centroids):
    t0 = time.time()
    out = semdedup(df, n_clusters=k, threshold=0.4, centroids=centroids)
    kept = {r["vec_id"] for r in out.filter("kept").collect()}
    return time.time() - t0, kept


def timed_exact_keepers(df):
    """Global exact pair graph + semdedup's min-id drop rule: drop a
    vector iff ANY smaller-id neighbor has cosine >= threshold."""
    t0 = time.time()
    pairs = cosine_pairs_blocked(df, threshold=0.4)
    dropped = {r["b_id"] for r in
               pairs.select("b_id").distinct().collect()}
    ids = {r["vec_id"] for r in df.select("vec_id").collect()}
    return time.time() - t0, ids - dropped


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("semdedup-crossover")
        .getOrCreate()
    )
    pin_session_confs(spark)
    # centroids trained ONCE on the base fixture (the replica
    # distribution is the base distribution) — isolates pair-join
    # scaling from training cost, and matches production (codebook
    # trained on a bounded sample, reused across the corpus).
    base = load_table(spark, SF_DIR, "embeddings")
    cents = {k: train_kmeans_codebook(base, k=k).localCheckpoint()
             for k in (16, 4, 8, 32, 64, 128)}

    results = []
    exact_kept = {}
    for mult in (1, 2, 4, 8, 16, 32):
        n = BASE_N * mult
        df = synth_corpus(spark, mult).localCheckpoint()  # corpus fixed
        sec, kept = timed_exact_keepers(df)
        exact_kept[n] = kept
        row = {"arm": "exact", "n": n, "k": None,
               "sec": round(sec, 2), "kept": len(kept),
               "agree_vs_exact": None}
        results.append(row)
        print(json.dumps(row), flush=True)
        ks = max(4, n // 500)
        for arm, k in (("fixed-k", 16), ("scaled-k", ks)):
            sec, kept = timed_keepers(df, k, cents[k])
            rec = None
            if n in exact_kept:
                ex = exact_kept[n]
                # agreement on the drop decision vs the exact arm
                rec = 1 - len(kept.symmetric_difference(ex)) / n
            row = {"arm": arm, "n": n, "k": k, "sec": round(sec, 2),
                   "kept": len(kept),
                   "agree_vs_exact": None if rec is None else round(rec, 4)}
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"done": True, "rows": len(results)}))


if __name__ == "__main__":
    main()
