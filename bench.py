#!/usr/bin/env python
"""Benchmark harness — runs the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Headline set = the scale-representative queries: scan-heavy aggs
(q1/q6), shuffle joins (q3/q5), keyed latest-state (a1), event-time
windows/sessions, and the 100 TB-path extension operators (fingerprint
dedup, MinHash LSH near-dup, brute-force + LSH kNN). The O(n²)
exact-pair queries are deliberately absent — their scalable twins
(minhash, hyperplane ANN) stand in, which is the whole point.

Results materialize through the noop sink (full execution, no driver
collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from market_data_ingestor_go_spark.operators.cache import release_pinned  # noqa: E402
from market_data_ingestor_go_spark.plans.queries import QUERIES  # noqa: E402
from market_data_ingestor_go_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "q6_revenue_delta",
    "p1_validation_filter",
    "a1_latest_per_key",
    "agg_orders_stats",
    "window_topk_per_group",
    "events_tumbling_window",
    "events_sessionization",
    "events_ohlc_bars",
    "pack_sequences_chunked",
    "dedup_fingerprint",
    "minhash_neardup",
    "simhash_neardup",
    "embedding_lsh_neardup",
    "knn_bruteforce",
    "knn_ann_hyperplane",
    "knn_ann_ivf",
    "text_token_stats",
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Two runs per query, back-to-back; report steady-state (min).
    # Run 1 pays one-time whole-stage-codegen compilation (seconds for
    # the 128-column LSH aggregates) and page-cache warming — real, but
    # amortized to zero on any long-lived cluster. Back-to-back (not
    # two full passes) so the steady number measures THIS query's
    # plan, not cross-query JIT/GC interference. The cold total is
    # still reported alongside. release_pinned() between runs drops
    # operator-internal persists: no cross-run data reuse, only warm
    # JIT/page cache.
    cold: dict[str, float] = {}
    steady: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        materialize(QUERIES[name](spark, sf_dir))
        cold[name] = round(time.perf_counter() - t0, 3)
        release_pinned()
        t0 = time.perf_counter()
        materialize(QUERIES[name](spark, sf_dir))
        steady[name] = round(min(cold[name], time.perf_counter() - t0), 3)
        release_pinned()

    total = round(sum(steady.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": steady,
        "cold_total_sec": round(sum(cold.values()), 3),
        "runs_per_query": 2,
        "aggregation": "min (steady-state; cache cleared between runs)",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
