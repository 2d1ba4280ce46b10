#!/usr/bin/env python
"""End-to-end training-data pipeline demo over the documents corpus.

The §2.11 extension surface as one runnable flow — the stages every
LLM data pipeline runs between raw crawl and training shards:

  documents.parquet
    → quality / language / repetition filters        [functions/text]
    → LM perplexity band filter (CCNet)              [operators/lm_quality]
    → exact + MinHash-LSH near-dup dedup, clustered   [operators/dedup]
      into keep-groups (one canonical doc per cluster)
    → train/test contamination gate vs a held-out set [cross-corpus]
    → passage-level boilerplate profile               [operators/dedup]
    → per-source frequency cap                        [operators/training]
    → deterministic train/val/test split              [operators/training]
    → sequence packing into fixed-token chunks        [operators/training]
    → global-shuffle shard write (reproducible order) [operators/training]
    → streaming twins: contamination + dedup gates
      flag leaks / re-sent docs within one trigger    [streaming/*]

Run:  python examples/training_pipeline_demo.py   (~1 min at sf0.01).
Every stage prints row counts so the funnel is visible.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from market_data_ingestor_go_spark.functions.text import (  # noqa: E402
    quality_flag, repetition_ratio)
from market_data_ingestor_go_spark.operators.dedup import (  # noqa: E402
    cross_corpus_near_dup, minhash_near_dup_pairs, neardup_clusters)
from market_data_ingestor_go_spark.operators.training import (  # noqa: E402
    hash_split, pack_chunks)
from market_data_ingestor_go_spark.session import get_spark  # noqa: E402
from market_data_ingestor_go_spark.sources.tables import load_table  # noqa: E402
from market_data_ingestor_go_spark.streaming.contamination import (  # noqa: E402
    ContaminationGate)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("training-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()
    print(f"[0] corpus: {n0} docs")

    # 1. quality gate: drop low-quality / highly-repetitive docs
    kept = docs.filter(quality_flag("text")
                       & (repetition_ratio("text") <= 0.5)) \
               .select("doc_id", "text")
    n1 = kept.count()
    print(f"[1] quality+repetition filter: {n1} kept "
          f"({n0 - n1} dropped)")

    # 1b. LM-quality band filter (CCNet, late r6): score every doc
    # against the count-pruned bigram LM trained on the hash-split;
    # drop docs OUTSIDE the in-distribution cross-entropy band
    # (repetitive boilerplate falls below it, gibberish above)
    from market_data_ingestor_go_spark.operators.lm_quality import (
        ngram_lm_score)
    scored = ngram_lm_score(kept, vocab_size=24)
    lo, hi = 3.0, 6.0
    kept = (kept.join(scored.select(
                "doc_id",
                ((F.col("xent_bits") >= lo)
                 & (F.col("xent_bits") <= hi)).alias("_in_band")),
            "doc_id")
            .filter("_in_band").drop("_in_band"))
    n1b = kept.count()
    print(f"[1b] LM perplexity band [{lo}, {hi}] bits: {n1b} kept "
          f"({n1 - n1b} out-of-band dropped)")

    # 2. near-dup dedup: LSH pairs → connected components → keep the
    # cluster minimum (the canonical doc)
    pairs = minhash_near_dup_pairs(kept, threshold=0.8)
    clusters = neardup_clusters(pairs)
    dupes = (clusters.filter(F.col("doc_id") != F.col("cluster_id"))
             .select("doc_id"))
    deduped = kept.join(dupes, "doc_id", "left_anti")
    n2 = deduped.count()
    print(f"[2] near-dup dedup (thr 0.8): {n2} kept "
          f"({n1b - n2} near-duplicates removed)")

    # 3. contamination: drop anything near-duplicating the held-out
    # eval set (here: every 20th doc plays the eval corpus)
    heldout = docs.filter(F.col("doc_id") % 20 == 0)
    train_side = deduped.join(
        heldout.select("doc_id"), "doc_id", "left_anti")
    leaks = cross_corpus_near_dup(train_side, heldout, threshold=0.6)
    contaminated = leaks.select(
        F.col("a_id").alias("doc_id")).distinct()
    clean = train_side.join(contaminated, "doc_id", "left_anti")
    n3 = clean.count()
    print(f"[3] contamination gate: {n3} kept "
          f"({train_side.count() - n3} leaked docs removed)")

    # 3b. sub-document profile: passages repeated corpus-wide (the
    # boilerplate document-level dedup can't see)
    from market_data_ingestor_go_spark.operators.dedup import (
        passage_dedup_stats)
    pstats = passage_dedup_stats(clean).agg(
        F.sum("n_dup").alias("dup"),
        F.sum("n_passages").alias("all")).first()
    print(f"[3b] passage profile: {pstats['dup']}/{pstats['all']} "
          f"8-word passages repeat corpus-wide")

    # 3c. per-source frequency cap (over-representation control)
    from market_data_ingestor_go_spark.operators.training import (
        cap_per_group)
    with_src = clean.join(docs.select("doc_id", "source"), "doc_id")
    capped = cap_per_group(with_src, "source", cap=20) \
        .select("doc_id", "text")
    n3c = capped.count()
    print(f"[3c] source cap (≤20/source): {n3c} kept "
          f"({n3 - n3c} over-represented dropped)")

    # 4. deterministic split + packing into 2048-token chunks
    split = hash_split(capped)
    per_split = {r["split"]: r["n"] for r in
                 split.groupBy("split").agg(F.count("*").alias("n"))
                 .collect()}
    print(f"[4] split: {per_split}")
    packed = pack_chunks(split.filter(F.col("split") == "train"))
    n_chunks = packed.select("stream", "chunk_id").distinct().count()
    print(f"[5] packed train: {packed.count()} docs into "
          f"{n_chunks} chunks of 2048 tokens")

    # 5b. deterministic global-shuffle shards: training order is a
    # hyperparameter — reading shards 0..n-1 replays the exact
    # md5-keyed permutation
    from market_data_ingestor_go_spark.operators.training import (
        write_training_shards)
    with tempfile.TemporaryDirectory() as tmp:
        shard_dir = os.path.join(tmp, "shards")
        write_training_shards(split.filter(F.col("split") == "train"),
                              shard_dir, n_shards=8)
        written = spark.read.parquet(shard_dir)
        n_shards = written.select("shard").distinct().count()
        print(f"[5b] train split written as {n_shards} reproducible "
              f"shards ({written.count()} docs in permutation order)")

    # 6. streaming twin: the gate flags a leaked doc within one trigger
    with tempfile.TemporaryDirectory() as tmp:
        gate = ContaminationGate(
            heldout, flags_path=os.path.join(tmp, "flags"),
            threshold=0.6, trigger_seconds=1)
        src = os.path.join(tmp, "stream")
        os.makedirs(src)
        stream = spark.readStream.schema("doc_id LONG, text STRING") \
            .json(src)
        q = gate.attach(stream, os.path.join(tmp, "ckpt"))
        leak_text = heldout.select("text").first()["text"]
        with open(os.path.join(src, "b1.json"), "w") as fh:
            fh.write(json.dumps(
                {"doc_id": 10_000_001, "text": leak_text}) + "\n")
            fh.write(json.dumps(
                {"doc_id": 10_000_002,
                 "text": "an entirely clean document about nothing "
                         "in particular with fresh novel words"}) + "\n")
        q.processAllAvailable()
        q.stop()
        print(f"[6] streaming gate: checked={gate.docs_checked} "
              f"flagged={gate.docs_flagged} (the planted leak)")
        gate.stop()

    # 7. streaming dedup gate: a re-sent document is rejected online
    from market_data_ingestor_go_spark.streaming.dedup_gate import (
        StreamingDedupGate)
    with tempfile.TemporaryDirectory() as tmp:
        ddg = StreamingDedupGate(spark, "demo_ddg",
                                 dups_dir=os.path.join(tmp, "dups"),
                                 threshold=0.7, trigger_seconds=1)
        src = os.path.join(tmp, "stream")
        os.makedirs(src)
        stream = spark.readStream.schema("doc_id LONG, text STRING") \
            .json(src)
        q = ddg.attach(stream, os.path.join(tmp, "ckpt"))
        doc = clean.select("doc_id", "text").first()
        try:
            with open(os.path.join(src, "b1.json"), "w") as fh:
                fh.write(json.dumps(
                    {"doc_id": 1, "text": doc["text"]}) + "\n")
            q.processAllAvailable()
            with open(os.path.join(src, "b2.json"), "w") as fh:
                fh.write(json.dumps(   # the same doc arrives again
                    {"doc_id": 2, "text": doc["text"]}) + "\n")
            q.processAllAvailable()
            q.stop()
            print(f"[7] streaming dedup gate: seen={ddg.docs_seen} "
                  f"accepted={ddg.docs_accepted} "
                  f"rejected={ddg.docs_rejected} (the re-sent doc)")
        finally:
            ddg.stop()
            spark.sql("DROP TABLE IF EXISTS demo_ddg_sig")
            spark.sql("DROP TABLE IF EXISTS demo_ddg_sh")

    spark.stop()


if __name__ == "__main__":
    main()
