"""Iterative graph analytics over pair graphs (late round 6).

The dedup family's pair graphs (MinHash, exact-Jaccard, cosine) feed
two iterative algorithms: connected components (operators/dedup.py::
neardup_clusters — label propagation) and, here, PageRank — the
centrality signal that picks a CANONICAL document per near-dup
cluster by how connected it is, instead of the arbitrary min-id rule
(a hub that many variants copy from is a better keeper than whichever
variant happened to get the smallest id).

Cross-engine determinism: floating-point PageRank is order-dependent
(sums of doubles) and unverifiable bit-for-bit. This implementation
runs in FIXED-POINT INTEGER arithmetic — the recurrence

    r_0(v)     = scale div N
    base       = ((den − num) · r_0) div den
    r_{t+1}(v) = base + (num · Σ_{u→v} (r_t(u) div deg(u))) div den

with damping num/den = 17/20 (0.85) and scale = 10^12 — is EXACTLY
specified over BIGINTs (floor division, order-independent integer
sums), so Spark, the DuckDB oracle (iterations unrolled as chained
CTEs) and a plain-Python twin all produce identical ranks. The floor
truncations cost < N·den/scale of probability mass per iteration —
~1e-9 at fixture sizes, irrelevant to ranking.

Scale shape: each iteration is one equi-join (contributions along
edges) + one partial-combine integer aggregate — identical shuffle
structure to the CC rounds; ``localCheckpoint`` per iteration
truncates lineage (the CC lesson: plan trees double per round
without it). Iteration count is FIXED (power iteration converges
geometrically at rate = damping; 10 rounds ≈ 0.85^10 ≈ 0.2 residual,
plenty for rank ORDER which is what keeper selection consumes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 10^12 fixed-point unit


def pagerank_fixed_point(edges: DataFrame, src: str = "src",
                         dst: str = "dst", n_iters: int = 10,
                         damping_num: int = 17,
                         damping_den: int = 20) -> DataFrame:
    """(node, pr_scaled) — fixed-point PageRank over a DIRECTED edge
    list (pass both directions for an undirected pair graph; every
    node then has in-degree ≥ 1, so there are no dangling-node
    corrections). See module doc for the exact integer recurrence.

    The node count N is a one-off control-plane aggregate (the same
    driver-action budget as one CC round); each iteration's frame is
    localCheckpoint-ed so the plan stays one-round deep.
    """
    # the edge list feeds EVERY iteration — materialize it once, or
    # an expensive upstream pair join (O(n²) jaccard) re-executes per
    # round (measured 10×: 110 s → 11 s at sf0.01)
    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst")) \
        .localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    deg = e.groupBy("src").agg(F.count("*").alias("deg")) \
        .localCheckpoint()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr_scaled", F.lit(0).cast("long"))

    r0 = SCALE // n
    base = ((damping_den - damping_num) * r0) // damping_den
    ranks = nodes.withColumn("pr_scaled",
                             F.lit(r0).cast("long")).localCheckpoint()
    for _ in range(n_iters):
        contrib = (
            ranks.join(deg, ranks.node == deg.src)
            .select(F.col("src"),
                    F.expr("pr_scaled div deg").alias("c"))
            .join(e, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s")))
        ranks = (
            nodes.join(contrib, "node", "left")
            .select("node",
                    (F.lit(base)
                     + F.expr(f"({damping_num} * coalesce(s, 0)) "
                              f"div {damping_den}"))
                    .cast("long").alias("pr_scaled"))
            # LAZY checkpoint (r15 optimization, the ewma_chunked
            # pattern): the iteration count is fixed and no per-round
            # metric exists, so plan truncation happens per round (the
            # lineage guard) while materialization collapses into the
            # consumer's single job — n_iters fewer driver round-trips
            .localCheckpoint(eager=False))
    return ranks


def cluster_keepers_by_rank(ranks: DataFrame, clusters: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """One keeper per near-dup cluster by (pr_scaled, −id) — the
    centrality-based canonical-document policy (max rank; smaller id
    breaks exact rank ties so the choice stays deterministic).
    ``clusters`` is neardup_clusters' (doc_id, cluster_id) output.

    LEFT join on ranks: cluster stages are pair-source-agnostic
    (SCALING.md), so a member absent from the ranked graph (clusters
    from a different pair source) keeps its row with rank −1 rather
    than silently vanishing and skewing n_members (review catch) —
    an unranked member can still win only if the whole cluster is
    unranked, and then the −1 tie breaks to min id."""
    joined = clusters.join(
        ranks.select(F.col("node").alias(id_col), "pr_scaled"),
        id_col, "left").withColumn(
            "pr_scaled", F.coalesce("pr_scaled", F.lit(-1).cast("long")))
    return (joined.groupBy("cluster_id")
            .agg(F.max_by(
                     id_col,
                     F.struct(F.col("pr_scaled"),
                              (-F.col(id_col)).alias("neg")))
                  .alias("keeper_id"),
                 F.count("*").alias("n_members"),
                 F.max("pr_scaled").alias("keeper_pr")))


def oriented_edges(pairs: DataFrame, id_a: str = "doc_a",
                   id_b: str = "doc_b",
                   by_degree: bool = True) -> DataFrame:
    """Canonicalize an undirected pair list and orient every edge
    along a TOTAL order → (src, dst, odst) where odst is the struct
    orientation key of dst (for wedge-side comparisons).

    by_degree=True (the production default): orient by (degree, id) —
    Suri & Vassilvitskii 2011's fix for the curse of the last reducer.
    Every edge points from its lower-degree endpoint (ties broken by
    id), so a hub of degree Δ has out-degree ≤ √(2m) regardless of Δ
    and never centers its own wedges: Σ outdeg² is O(m^1.5) on ANY
    graph, where id-orientation degenerates to Σ deg² — quadratic in
    the hub degree on power-law pair graphs (boilerplate families).
    by_degree=False keeps plain id orientation (diagnostic / A-B).

    Σ C(outdeg(v), 2) over this frame IS the exact wedge volume the
    triangle join below will shuffle — the skew readout to check
    before running the close on an unfamiliar corpus.
    """
    e = (pairs.select(F.least(id_a, id_b).alias("a"),
                      F.greatest(id_a, id_b).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct()
         .localCheckpoint(eager=True))
    if not by_degree:
        # id order: a < b already ⇒ src=a, dst=b; odst = (0, b) keeps
        # the comparison shape identical to the degree branch
        return e.select(
            F.col("a").alias("src"), F.col("b").alias("dst"),
            F.struct(F.lit(0).cast("long").alias("dd"),
                     F.col("b").alias("nid")).alias("odst"))
    deg = (e.select(F.col("a").alias("id"))
           .unionAll(e.select(F.col("b").alias("id")))
           .groupBy("id").agg(F.count("*").alias("d")))
    da = deg.select(F.col("id").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("db"))
    ed = e.join(da, "a").join(db, "b")
    asc = (F.struct(F.col("da").alias("dd"), F.col("a").alias("nid"))
           < F.struct(F.col("db").alias("dd"), F.col("b").alias("nid")))
    return ed.select(
        F.when(asc, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(asc, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(asc, F.struct(F.col("db").alias("dd"),
                             F.col("b").alias("nid")))
        .otherwise(F.struct(F.col("da").alias("dd"),
                            F.col("a").alias("nid"))).alias("odst"))


def triangle_counts(pairs: DataFrame, id_a: str = "doc_a",
                    id_b: str = "doc_b") -> DataFrame:
    """Per-node triangle participation over an undirected pair graph
    → (id, degree, n_triangles, clustering) — the cohesion readout a
    dedup pipeline runs AFTER pair generation: a near-dup cluster
    whose members form triangles (template/boilerplate families) is
    qualitatively different from a chain of marginal pairs, and the
    local clustering coefficient 2t/(d(d−1)) separates the two.

    Edge-orientation counting (Suri & Vassilvitskii 2011, "Counting
    Triangles and the Curse of the Last Reducer"), DEGREE-oriented
    since r13 (the r12 verdict's upgrade): orient every edge along
    the (degree, id) total order, build wedges by self-joining
    oriented edges on their source, and close each wedge against the
    oriented (b, c) edge — each triangle is found EXACTLY once, at
    its minimum-order vertex. A hub never centers its own wedges, so
    wedge volume is O(m^1.5) even on power-law pair graphs where the
    old id orientation was quadratic in the hub degree (pinned by the
    star-fixture test). All joins are equi-joins; counts are exact
    BIGINTs; the coefficient is one fixed tree of correctly-rounded
    double ops ⇒ bit-exact cross-engine. The reported degree is the
    UNDIRECTED degree, so outputs are orientation-invariant (the
    DuckDB oracle keeps its id-oriented SQL formulation).
    Per-node aggregation collapses map-side.
    """
    oriented = (oriented_edges(pairs, id_a, id_b, by_degree=True)
                .localCheckpoint(eager=True))
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = (x.join(y, (F.col("x.src") == F.col("y.src"))
                     & (F.col("x.odst") < F.col("y.odst")))
              .select(F.col("x.src").alias("a"),
                      F.col("x.dst").alias("b"),
                      F.col("y.dst").alias("c")))
    closing = oriented.select(F.col("src").alias("b"),
                              F.col("dst").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    node_tri = (tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
                .groupBy("id").agg(F.count("*").alias("t")))
    deg = (oriented.select(F.col("src").alias("id"))
           .unionAll(oriented.select(F.col("dst").alias("id")))
           .groupBy("id").agg(F.count("*").alias("d")))
    t = F.coalesce(F.col("t"), F.lit(0))
    d = F.col("d")
    clustering = F.when(
        d > 1, (F.lit(2.0) * t.cast("double"))
        / (d.cast("double") * (d.cast("double") - F.lit(1.0)))
    ).otherwise(F.lit(0.0))
    return (deg.join(node_tri, "id", "left")
            .select(F.col("id"),
                    d.cast("bigint").alias("degree"),
                    t.cast("bigint").alias("n_triangles"),
                    clustering.alias("clustering")))
