#!/usr/bin/env python
"""Connected-components engine crossover bench (r9): measure
label-propagation vs alternating large-star/small-star as the edge
set grows, to put an empirical curve under AUTO_CC_EDGE_THRESHOLD
(operators/dedup.py) the way examples/semdedup_crossover.py did for
the SemDeDup k* bound.

Two regimes measured SEPARATELY (running them mixed hides which
effect dominates — found the hard way: a 1000-node chain grafted
onto every size stalled the first version of this bench):

- VOLUME regime: deterministic sparse random graphs built with pure
  Column expressions (edge i connects xxhash64(i) % n and
  xxhash64(i + 777) % n over n = edges/4 nodes, average degree ~8 —
  a giant component plus fringe, the shape a near-dup pair graph
  takes at real thresholds; diameter stays O(log n)). This is the
  regime AUTO_CC_EDGE_THRESHOLD decides in.
- DIAMETER regime: one long path of `chain` nodes. Label propagation
  carries POINTER JUMPING (label's-label per round — chain depth
  halves), so its round count is ~log2(len). The alternating
  star contraction also converges in O(log) rounds on paths but with
  a larger constant and a heavier per-round stage graph, so at local
  scale its fixed round latency dominates — the honest caveat on the
  dispatcher's edge-count heuristic for pathological diameters.

Per (engine, case): seconds for the full cluster computation
(noop-write materialized) after warm-up, plus a label-equality check
(exceptAll both ways) so the speed comparison is between IDENTICAL
answers. Output: one JSON line per measurement; paste into
SCALING.md ("CC engine crossover"). Nothing outside /root/repo is
written.

Usage: cc_crossover.py [n_edges ...] (default 10k 100k 500k 2M)
       cc_crossover.py chain <len>   (diameter regime)
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from market_data_ingestor_go_spark.operators.dedup import (  # noqa: E402
    neardup_clusters, neardup_clusters_alternating)
from market_data_ingestor_go_spark.sources.tables import (  # noqa: E402
    pin_session_confs)


def synth_edges(spark, n_edges: int):
    n_nodes = max(n_edges // 4, 2000)
    return (spark.range(n_edges)
            .select((F.abs(F.xxhash64("id")) % n_nodes).alias("doc_a"),
                    (F.abs(F.xxhash64(F.col("id") + 777)) % n_nodes)
                    .alias("doc_b"))
            .filter(F.col("doc_a") != F.col("doc_b")))


def chain_edges(spark, length: int):
    return (spark.range(length)
            .select(F.col("id").alias("doc_a"),
                    (F.col("id") + 1).alias("doc_b")))


def mat(df):
    df.write.mode("overwrite").format("noop").save()


def run_case(spark, tag: str, edges):
    edges = edges.localCheckpoint(eager=True)
    real = edges.count()
    out = {}
    for eng, fn in [
            ("labelprop",
             lambda e: neardup_clusters(e, engine="labelprop",
                                        max_iters=60)),
            ("alternating",
             lambda e: neardup_clusters_alternating(e, max_iters=60))]:
        t0 = time.perf_counter()
        mat(fn(edges))
        secs = round(time.perf_counter() - t0, 3)
        out[eng] = secs
        print(json.dumps({"case": tag, "engine": eng, "n_edges": real,
                          "sec": secs}), flush=True)
    a = neardup_clusters(edges, engine="labelprop", max_iters=60)
    b = neardup_clusters_alternating(edges, max_iters=60)
    mism = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(json.dumps({"case": tag, "n_edges": real,
                      "label_mismatches": mism,
                      "ratio_alt_over_lp":
                      round(out["alternating"] / out["labelprop"], 3)}),
          flush=True)
    assert mism == 0, "engines disagree — abort the bench"


def main():
    # validate the invocation BEFORE paying for a SparkSession
    usage = ("usage: cc_crossover.py [N_EDGES ...] "
             "| cc_crossover.py chain N_NODES")
    args = sys.argv[1:]
    if args[:1] == ["chain"] and (len(args) != 2
                                  or not args[1].isdigit()):
        print(usage, file=sys.stderr)
        sys.exit(2)
    if args[:1] != ["chain"] and not all(a.isdigit() for a in args):
        print(usage, file=sys.stderr)
        sys.exit(2)

    spark = (SparkSession.builder.master("local[32]")
             .appName("cc_crossover")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    pin_session_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up both engines (JIT/codegen)
    e0 = synth_edges(spark, 10_000).localCheckpoint(eager=True)
    mat(neardup_clusters(e0, engine="labelprop"))
    mat(neardup_clusters_alternating(e0))

    if args[:1] == ["chain"]:
        run_case(spark, f"chain_{args[1]}",
                 chain_edges(spark, int(args[1])))
        return
    sizes = [int(s) for s in args] or [10_000, 100_000, 500_000,
                                       2_000_000]
    for n_edges in sizes:
        run_case(spark, "random", synth_edges(spark, n_edges))


if __name__ == "__main__":
    main()
