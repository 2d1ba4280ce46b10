"""The declared query corpus — one entry per operator from SURVEY.md §2.

Each function takes (spark, sf_dir) and returns a DataFrame whose
column names/types match the DuckDB oracle twin in ``oracles.py``
(driver compares row-count + schema + order-insensitive value-hash).

Cross-engine determinism rules used throughout:
- SUM over doubles goes through ``CAST(expr AS DECIMAL(p,s))`` — the
  row-level double expression is bit-identical in both engines, the
  cast is exact, and decimal summation is order-independent. The final
  result casts back to DOUBLE.
- Averages are exact-decimal sums divided by counts in double.
- Timestamps are emitted as epoch milliseconds (BIGINT) to dodge
  timezone/precision mapping differences.
- Orderings that feed LIMIT/row_number always carry a unique tiebreak
  key.

Scale notes are attached per query; dimension joins broadcast
explicitly and every scan-side predicate is expressed so Catalyst can
push it into the parquet reader.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import market as M
from ..functions import text as TX
from ..operators import dedup as DD
from ..operators import similarity as SIM
from ..operators import training as TRAIN
from ..operators.enrich import anti_join, enrich_exchange, semi_join
from ..operators.latest import latest_per_key
from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dsum(expr, alias: str, scale: str = "decimal(27,6)"):
    """Order-independent sum of a double expression (see module doc)."""
    return F.sum(expr.cast(scale)).cast("double").alias(alias)


def _davg(expr, count_col, alias: str, scale: str = "decimal(27,6)"):
    return (F.sum(expr.cast(scale)).cast("double") / count_col).alias(alias)


def _dstr(col: str):
    """Decimal → double via STRING (correctly rounded on both engines;
    direct casts differ at 1 ULP — verify-skill lesson)."""
    return F.col(col).cast("string").cast("double")


def _pearson_from_moments(sx: str, sy: str, sxx: str, syy: str,
                          sxy: str, n: str):
    """The exact-moments Pearson finisher. ONE shared copy: the fixed
    op order IS the bit-exactness contract with the oracles, so every
    correlation query must run the identical sequence."""
    nD = F.col(n).cast("double")
    cov = _dstr(sxy) / nD - (_dstr(sx) / nD) * (_dstr(sy) / nD)
    vx = _dstr(sxx) / nD - (_dstr(sx) / nD) * (_dstr(sx) / nD)
    vy = _dstr(syy) / nD - (_dstr(sy) / nD) * (_dstr(sy) / nD)
    return cov / F.sqrt(vx * vy)


def _slope_from_moments(st: str, sx: str, stt: str, stx: str, n: str):
    """OLS slope from exact moments — same shared-copy rationale."""
    nD = F.col(n).cast("double")
    cov = _dstr(stx) / nD - (_dstr(st) / nD) * (_dstr(sx) / nD)
    vt = _dstr(stt) / nD - (_dstr(st) / nD) * (_dstr(st) / nD)
    return cov / vt


def _events(spark, sf_dir) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) in parquet → read as int64 nanos
    (legacy.parquet.nanosAsLong) and floor to micros, matching the
    oracle's epoch_us truncation of the same nanos."""
    e = _t(spark, sf_dir, "events")
    if dict(e.dtypes)["ts"] == "bigint":
        e = e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        e = e.withColumn("ts", F.col("ts").cast("timestamp"))
    return e.withColumn("ts_ms", F.unix_millis(F.col("ts")))


# ---------------------------------------------------------------- core TPC-H-ish

def q1_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H Q1 shape — scan-heavy groupBy with 8 aggregates.
    One shuffle on two low-cardinality keys; partial aggregation does
    ~all the work map-side, so it scales linearly to 100 TB."""
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
    price, disc, tax, qty = (F.col(c) for c in
                             ("l_extendedprice", "l_discount", "l_tax", "l_quantity"))
    n = F.count("*")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(qty, "sum_qty"),
            _dsum(price, "sum_base_price"),
            _dsum(price * (1 - disc), "sum_disc_price"),
            _dsum(price * (1 - disc) * (1 + tax), "sum_charge"),
            _davg(qty, n, "avg_qty"),
            _davg(price, n, "avg_price"),
            _davg(disc, n, "avg_disc"),
            n.alias("count_order"),
        )
    )


def q3_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.
    customer is broadcast; orders⋈lineitem is the real shuffle."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-01-01")))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(_dsum(revenue, "revenue"),
             F.unix_millis(F.first("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_region_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join; all dims broadcast, lineitem only
    shuffles for the final agg."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01"))))
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(_dsum(revenue, "revenue"), F.count("*").alias("n_items"))
    )


def q6_revenue_delta(spark, sf_dir):
    """TPC-H Q6 shape: pure filter+agg — the pushdown showcase; every
    predicate reaches the parquet scan, zero joins, one-row result."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24))
    return li.agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
                  F.count("*").alias("n_items"))


# ------------------------------------------------------- reference operators §2.3

def p1_validation_filter(spark, sf_dir):
    """P1 (models/market_data.go:12-20): drop empty-name / bad-ts rows —
    here: events with blank type, non-positive value or null user."""
    e = _events(spark, sf_dir)
    return (
        e.filter((F.col("event_type") != "") & F.col("user_id").isNotNull()
                 & (F.col("value") > 0) & (F.col("ts_ms") > 0))
        .select("event_id", "user_id", "event_type", "value", "ts_ms")
    )


def p3_flatten_payload(spark, sf_dir):
    """P3 (server.go:176-188): promote the JSON payload's inner keys to
    top-level columns (schema-on-read json_get on the props envelope)."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id", "event_type", "value",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"))


def events_variant_extract(spark, sf_dir):
    """Schema-on-read ingestion via Spark 4's VARIANT type: rebuild
    the reference's double-nested wire envelope (server.go:176-188's
    data.data shape, the P3 family), parse it with parse_json into an
    open VARIANT column, and pull typed fields back out with
    variant_get JSON paths — the drift-tolerant path for payloads
    whose shape changes release to release (no schema migration, no
    schema_of_json sampling pass; extraction stays JVM-side on the
    binary-encoded variant, unlike repeated get_json_object string
    re-parses). Aggregated per event_type so the check is
    order-stable; the oracle computes the same result straight from
    the typed columns — i.e. it checks that the build→parse→extract
    round trip is lossless, doubles included."""
    e = _events(spark, sf_dir)
    wire = e.select(
        "event_type",
        F.to_json(F.struct(
            F.struct(F.col("event_type").alias("type"),
                     F.col("user_id").alias("source_id")).alias("meta"),
            F.struct(F.struct(
                F.col("value").alias("value"),
                F.get_json_object("props", "$.k").cast("bigint")
                .alias("k")).alias("data")).alias("data"),
        )).alias("wire"))
    v = wire.select("event_type", F.parse_json("wire").alias("v"))
    ext = v.select(
        "event_type",
        F.variant_get("v", "$.data.data.value", "double").alias("val"),
        F.variant_get("v", "$.data.data.k", "bigint").alias("k"),
        F.variant_get("v", "$.meta.source_id", "bigint").alias("source_id"))
    return (ext.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 _dsum(F.col("val"), "sum_value"),
                 F.max("k").alias("max_k"),
                 F.countDistinct("source_id").alias("n_sources")))


def p4_value_rules(spark, sf_dir):
    """P4 (server.go:224-238): add/subtract/multiply/divide value rules;
    divide-by-zero → identity (server.go:232-236)."""
    li = _t(spark, sf_dir, "lineitem")
    price, qty, disc = F.col("l_extendedprice"), F.col("l_quantity"), F.col("l_discount")
    return li.select(
        "l_orderkey", "l_linenumber",
        (price + 10.0).alias("price_add"),
        (price - 5.0).alias("price_sub"),
        (qty * 2.0).alias("qty_mul"),
        F.when(disc != 0, price / disc).otherwise(price).alias("price_div_guarded"),
    )


def p5p6p7_config_pipeline(spark, sf_dir):
    """P5/P6/P7 (server.go:199-219) in stage order: value rule →
    rename(value→price) → remove(props) → override(source_tag)."""
    e = _events(spark, sf_dir)
    return (
        e.withColumn("value", F.col("value") * 1.1)        # 1. value rule
        .withColumnRenamed("value", "price")               # 2. rename
        .drop("props")                                     # 3. remove
        .withColumn("source_tag", F.lit("replay"))         # 4. override
        .select("event_id", "event_type", "price", "user_id", "source_tag", "ts_ms")
    )


def p8_conditional_gate(spark, sf_dir):
    """P8 (server.go:112-115): transform only configured symbols; others
    pass through untouched."""
    e = _events(spark, sf_dir)
    gated = F.when(F.col("event_type").isin("click", "view"),
                   F.col("value") * 2.0).otherwise(F.col("value"))
    return e.select("event_id", "event_type", gated.alias("value_t"))


def p9_exchange_enrichment(spark, sf_dir):
    """P9/J1 (ingestor.go:116-122): broadcast-left-join a small dim;
    probe miss → 'unknown' (exchanges_symbols.go:317-347)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    dim = (n.join(r, F.col("n_regionkey") == F.col("r_regionkey"))
           .select(F.col("n_nationkey").alias("name"), F.col("r_name").alias("exchange")))
    out = enrich_exchange(c.select(F.col("c_custkey"), F.col("c_nationkey").alias("name")),
                          dim, name_col="name")
    return out.select(F.col("c_custkey"), F.col("exchange"))


def p10_api_key_hash(spark, sf_dir):
    """P10 (utils/helper.go:8-11) + S3 shape: sha256 digest feeding the
    is_active-filtered auth lookup."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return c.select("c_custkey", M.hash_api_key("c_name").alias("key_hash"))


def p11_wire_json(spark, sf_dir):
    """P11 (postgres.go:121, server.go:117): struct → JSON wire string."""
    n = _t(spark, sf_dir, "nation")
    return n.select("n_nationkey", M.to_wire_json("n_nationkey", "n_name").alias("wire"))


# ------------------------------------------------------------------ joins §2.4

def j2_semi_join_auth(spark, sf_dir):
    """J2 (postgres.go:138-163): semi-join shape — customers holding at
    least one order (valid API keys)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return semi_join(c, o, "c_custkey").select("c_custkey", "c_name")


def j2_anti_join_unmatched(spark, sf_dir):
    """Anti-join twin of J2: probe keys with no matching order
    (rejected API keys, server.go:83-96 auth-miss path).

    The probe set is the real customer keys UNION a salted "ghost"
    population (every 7th key shifted past the keyspace) that cannot
    match — modelling requests carrying unknown API keys. Round 5:
    the previous all-real probe set anti-joined to zero rows at every
    SF (each fixture customer has orders), so the external hash check
    was trivially green; the ghosts make it non-trivial (>0 rows)."""
    c = _t(spark, sf_dir, "customer")
    probes = c.select("c_custkey", "c_name").unionAll(
        c.filter(F.col("c_custkey") % 7 == 0)
         .select((F.col("c_custkey") + F.lit(1_000_000)).cast("bigint").alias("c_custkey"),
                 F.concat(F.lit("ghost:"), F.col("c_name")).alias("c_name")))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti_join(probes, o, "c_custkey").select("c_custkey", "c_name")


# ------------------------------------------------------------ aggregations §2.5

def a1_latest_per_key(spark, sf_dir):
    """A1 (cache_service.go:45-52): keyed latest-value cache as a batch
    aggregation — timestamp-max last-write-wins with event_id tiebreak
    (documented divergence from the reference's arrival-order LWW,
    SURVEY.md §2.5). max_by partial-aggregates map-side."""
    e = _events(spark, sf_dir).select("user_id", "ts_ms", "event_id", "event_type", "value")
    return latest_per_key(e, "user_id", "ts_ms", tiebreak_cols=["event_id"])


def a1_latest_with_ttl(spark, sf_dir):
    """A1 + TTL eviction (Redis EX 24h, config.go:37): latest per key
    restricted to a 24 h horizon ending at the corpus max timestamp."""
    e = _events(spark, sf_dir).select("user_id", "ts_ms", "event_id", "event_type", "value")
    now = e.agg(F.max("ts_ms").alias("now_ms"))
    live = e.join(F.broadcast(now), F.col("ts_ms") >= F.col("now_ms") - F.lit(86_400_000)) \
            .drop("now_ms")
    return latest_per_key(live, "user_id", "ts_ms", tiebreak_cols=["event_id"])


def agg_orders_stats(spark, sf_dir):
    """Grouped multi-aggregate surface (Spark-native, SURVEY §2.5 'not
    present in reference, exposed by engine')."""
    o = _t(spark, sf_dir, "orders")
    n = F.count("*")
    return (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(n.alias("n_orders"),
             _dsum(F.col("o_totalprice"), "sum_total"),
             F.min("o_totalprice").alias("min_total"),
             F.max("o_totalprice").alias("max_total"),
             _davg(F.col("o_totalprice"), n, "avg_total"))
    )


def agg_rollup(spark, sf_dir):
    """ROLLUP grouping sets (status, priority) → subtotals + grand total."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), _dsum(F.col("o_totalprice"), "sum_total"))
    )


def distinct_count_exact(spark, sf_dir):
    """Exact distinct counts per group (expand + two-phase agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_parts"),
             F.countDistinct("l_suppkey").alias("n_supps"),
             F.count("*").alias("n_rows"))
    )


def approx_distinct_sketch(spark, sf_dir):
    """Sketch surface (HLL approx-distinct + t-digest approx
    percentiles) — rows-only check: sketch estimates are
    engine-specific by construction (the exact twins are
    distinct_count_exact and value_percentiles)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"),
             F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
             F.percentile_approx("l_extendedprice", 0.99).alias("approx_p99_price"),
             F.count("*").alias("n_rows"))
    )


# ------------------------------------------- windows / sort / limit / set §2.6

def window_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer — rank pushdown keeps the window cheap."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def order_limit_topk(spark, sf_dir):
    """Global deterministic top-20 (orderBy+limit → TakeOrderedAndProject,
    no full sort)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(20)
        .select("p_partkey", "p_name", "p_retailprice")
    )


def set_ops_status_migration(spark, sf_dir):
    """UNION/EXCEPT/INTERSECT surface: customers with only-open vs
    both open-and-finished orders."""
    o = _t(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    only_open = open_c.subtract(fin_c).select(F.col("o_custkey"), F.lit("only_open").alias("tag"))
    both = open_c.intersect(fin_c).select(F.col("o_custkey"), F.lit("both").alias("tag"))
    return only_open.unionAll(both)


def set_ops_all_variants(spark, sf_dir):
    """Multiset set-ops (UNION ALL / EXCEPT ALL / INTERSECT ALL) over
    order-status keys — duplicates preserved, unlike the distinct
    variants in set_ops_status_migration."""
    o = _t(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        open_c.exceptAll(fin_c).select("o_custkey", F.lit("open_minus_fin_all").alias("tag"))
        .unionAll(open_c.intersectAll(fin_c)
                  .select("o_custkey", F.lit("both_all").alias("tag")))
    )


def unpivot_event_matrix(spark, sf_dir):
    """Unpivot/melt: the per-user event-type count matrix back to long
    form — (user_id, event_type, n) rows, zero counts dropped."""
    kinds = ["click", "view", "purchase", "signup", "error"]
    wide = pivot_event_matrix(spark, sf_dir)
    long = wide.unpivot(
        "user_id", [f"n_{k}" for k in kinds], "kind", "n")
    return (
        long.filter(F.col("n") > 0)
        .select("user_id", F.expr("substring(kind, 3)").alias("event_type"), "n")
    )


def window_rank_stats(spark, sf_dir):
    """Ranking-function surface: rank, dense_rank, percent_rank and
    ntile over per-customer order prices (ties on price are real data
    → rank vs dense_rank diverge; percent_rank's double division is
    identical arithmetic in both engines)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(),
                                                F.col("o_orderkey"))
    return o.select(
        "o_custkey", "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


def pivot_event_matrix(spark, sf_dir):
    """Pivot: per-user event-type count matrix (explicit pivot values →
    no extra distinct-scan pass)."""
    e = _events(spark, sf_dir)
    kinds = ["click", "view", "purchase", "signup", "error"]
    piv = e.groupBy("user_id").pivot("event_type", kinds).count()
    return piv.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds])


def events_tumbling_window(spark, sf_dir):
    """Event-time tumbling window (native window()); epoch-aligned
    hourly buckets emitted as epoch millis."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"),
             _dsum(F.col("value"), "sum_value", "decimal(27,10)"))
        .select(F.unix_millis(F.col("w.start")).alias("window_start_ms"),
                "event_type", "n_events", "sum_value")
    )


def events_sessionization(spark, sf_dir):
    """Sessionization via native session_window (30 min gap) — new
    session iff gap ≥ 30 min (window end exclusive), matching the
    oracle's gaps-and-islands formulation at microsecond precision."""
    e = _events(spark, sf_dir)
    sess = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_in_session"))
    )
    return (
        sess.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"),
             F.sum("n_in_session").alias("n_events"),
             (F.sum("n_in_session").cast("double") / F.count("*")).alias("avg_events_per_session"))
    )


def asof_join_purchase_click(spark, sf_dir):
    """As-of join (Spark has no native one — SURVEY §2.4 'exposed'):
    for each purchase, the latest click by the same user at or before
    the purchase time. Implemented with the scalable union+window
    pattern (one shuffle on user, no range-join explosion): interleave
    both streams ordered by (ts, kind, id) and carry the last click
    struct forward. Ties: a click at the purchase's exact ts counts;
    equal-ts clicks resolve to max event_id."""
    e = _events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click") \
        .select("user_id", "ts_ms", "event_id", F.lit(0).alias("kind"))
    purchases = e.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts_ms", "event_id", F.lit(1).alias("kind"))
    both = clicks.unionByName(purchases)
    w = (Window.partitionBy("user_id")
         .orderBy("ts_ms", "kind", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = both.withColumn(
        "last_click",
        F.last(F.when(F.col("kind") == 0,
                      F.struct(F.col("ts_ms"), F.col("event_id"))),
               ignorenulls=True).over(w))
    return (
        carried.filter((F.col("kind") == 1) & F.col("last_click").isNotNull())
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts_ms").alias("purchase_ts_ms"),
                F.col("last_click.ts_ms").alias("click_ts_ms"),
                F.col("last_click.event_id").alias("click_event_id"))
    )


def value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (median + p90)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(F.percentile("value", 0.5).alias("p50"),
             F.percentile("value", 0.9).alias("p90"),
             F.count("*").alias("n"))
    )


def agg_cube_year_status(spark, sf_dir):
    """CUBE grouping sets over (order year, status)."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year(F.col("o_orderdate")))
    return (
        o.cube("order_year", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), _dsum(F.col("o_totalprice"), "sum_total"))
    )


def token_frequencies(spark, sf_dir):
    """Explode/unnest surface: corpus-wide top-20 token counts
    (deterministic tiebreak on the token itself)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(TX.tokens("text")).alias("token"))
        .groupBy("token").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


def window_running_total(spark, sf_dir):
    """Running (cumulative) revenue per customer over order date —
    ROWS frame with a unique ordering so the prefix sums are exact."""
    o = _t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    running = F.sum(F.col("o_totalprice").cast("decimal(27,6)")).over(w)
    return o.select(
        "o_custkey", "o_orderkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"),
        running.cast("double").alias("running_total"))


def event_gaps(spark, sf_dir):
    """lag/lead surface: inter-event gap stats per user (integer gap
    sums stay exact; the average divides in double at the end)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gapped = e.withColumn("gap_ms", F.col("ts_ms") - F.lag("ts_ms").over(w))
    return (
        gapped.filter(F.col("gap_ms").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("n_gaps"),
             F.sum("gap_ms").alias("total_gap_ms"),
             F.max("gap_ms").alias("max_gap_ms"),
             (F.sum("gap_ms").cast("double") / F.count("*")).alias("avg_gap_ms"))
    )


def orders_by_year(spark, sf_dir):
    """Date-function surface: year/quarter extraction + grouped agg."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"),
                  F.quarter("o_orderdate").alias("order_quarter"))
        .agg(F.count("*").alias("n_orders"), _dsum(F.col("o_totalprice"), "sum_total"))
    )


def range_join_click_context(spark, sf_dir):
    """Range join, the scale pattern: for each error event, count the
    same user's clicks in the preceding hour.

    A naive `a.ts BETWEEN b.ts-1h AND b.ts` join plans as a nested
    loop. The scalable shape bucketizes time: clicks land in their
    hour bucket, each error probes its own and the previous hour
    bucket (explode of 2 keys) — an equi-join on (user, bucket) whose
    shuffle is linear in events — then the exact range predicate
    filters within the tiny candidate set.
    """
    e = _events(spark, sf_dir)
    hour = 3_600_000
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts_ms").alias("c_ts"),
                      (F.col("ts_ms") / hour).cast("long").alias("bucket")))
    errors = (e.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("error_id"), "user_id",
                      F.col("ts_ms").alias("e_ts")))
    probes = errors.withColumn(
        "bucket", F.explode(F.array(
            (F.col("e_ts") / hour).cast("long"),
            (F.col("e_ts") / hour).cast("long") - 1)))
    joined = probes.join(clicks, ["user_id", "bucket"]).filter(
        (F.col("c_ts") <= F.col("e_ts"))
        & (F.col("c_ts") > F.col("e_ts") - hour))
    counts = joined.groupBy("error_id").agg(F.count("*").alias("n_clicks_prior_hour"))
    return (
        errors.join(counts, "error_id", "left")
        .select("error_id", "user_id", "e_ts",
                F.coalesce("n_clicks_prior_hour", F.lit(0)).alias("n_clicks_prior_hour"))
    )


def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING over a grouped sum, joined back to the
    dimension rows — agg-then-join keeps the big side pre-shrunk."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("qty"))
           .filter(F.col("qty") > 300))
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "o_custkey",
                F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"),
                F.col("qty").cast("double").alias("total_qty"))
    )


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: correlated-min — suppliers whose account balance
    equals the minimum within their nation (min computed once per
    group, broadcast back; no correlated re-scan)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    mins = s.groupBy("s_nationkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        s.join(F.broadcast(mins), "s_nationkey")
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )


def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bi-directional nation-pair trade volume by ship
    year. Two broadcast probes of the same nation dim under different
    aliases; the pair filter prunes before the aggregate."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01"))))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("ship_year"))
        .agg(_dsum(revenue, "revenue"), F.count("*").alias("n_items"))
    )


def q21_sole_late_supplier(spark, sf_dir):
    """TPC-H Q21 shape (exists + not-exists), adapted to this schema
    (no receipt/commit dates): suppliers who were the ONLY late shipper
    (shipdate > orderdate + 90 days) on a multi-supplier finished
    order. Expressed as per-order aggregates instead of correlated
    subqueries — one pass, no re-scans."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    per_order = joined.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supps"))
    qualifying = per_order.filter((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
    late_lines = joined.filter(F.col("late")).select("l_orderkey", "l_suppkey").distinct()
    return (
        late_lines.join(qualifying, "l_orderkey")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_sole_late_orders"))
    )


def sql_api_pricing_summary(spark, sf_dir):
    """The engine's SQL surface: the same logical plan as the flagship
    q1, declared as SQL text over registered views — Catalyst planning
    is identical either way, which is the point."""
    from ..sources.tables import register_views
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """)


def q8_nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape: a nation's share of revenue per order year —
    conditional decimal sum over total decimal sum, divided in double."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)")
    target = F.col("n_name") == "NATION_1"
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg((F.sum(F.when(target, rev).otherwise(F.lit(0).cast("decimal(27,6)"))).cast("double")
              / F.sum(rev).cast("double")).alias("nation1_share"),
             F.count("*").alias("n_items"))
    )


def q12_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 shape: conditional CASE counts per group — how many
    critical (1-URGENT/2-HIGH) vs other orders shipped late per year."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.count(F.when(critical, 1)).alias("late_critical"),
             F.count(F.when(~critical, 1)).alias("late_other"))
    )


def q14_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: ratio of conditional decimal sums (promo parts'
    share of revenue) — both sums exact, the division in double."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-07-01"))))
    p = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)")
    promo = F.col("p_type").startswith("PROMO")
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (F.sum(F.when(promo, rev).otherwise(F.lit(0).cast("decimal(27,6)"))).cast("double")
         / F.sum(rev).cast("double") * 100.0).alias("promo_share_pct"),
        F.count("*").alias("n_items"))


def q19_disjunctive_filter(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs predicate — the pushdown stress
    test (each disjunct combines brand/size/quantity ranges)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    d1 = (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 10)
    d2 = (F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 20)
    d3 = (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 45) & (F.col("l_quantity") >= 30)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(d1 | d2 | d3).agg(
        _dsum(rev, "revenue"), F.count("*").alias("n_items"))


def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar-subquery threshold + anti-join —
    above-average-balance customers with no orders, per market
    segment. The average is a broadcast one-row DF, the no-orders
    predicate a left_anti join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(27,6)")).cast("double")
         / F.count("*")).alias("avg_bal"))
    rich = c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal")).drop("avg_bal")
    idle = anti_join(rich, o, "c_custkey")
    return (
        idle.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"),
             _dsum(F.col("c_acctbal"), "total_balance"))
    )


def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (r8 — completes the 22-query plan-shape suite
    with q11/q16/q20): product-type profit by nation and order year,
    the widest join tree in the suite — lineitem × filtered part ×
    supplier × orders × nation. The fixture has no partsupp, so cost
    is proxied by p_retailprice·l_quantity·0.1; the five-way join +
    computed-measure + two-key rollup IS the Q9 shape. All dims
    broadcast; the only shuffle is the final aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("order_year"))
        .agg(_dsum(amount, "profit"), F.count("*").alias("n_lines"))
    )


def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-group value vs a GLOBAL scalar threshold
    (group-agg → scalar-agg → broadcast the scalar back as a filter).
    Value proxy: revenue per part from NATION_3's suppliers (no
    partsupp/supplycost in the fixture); keep parts above 0.1% of the
    national total. The two-level aggregate + scalar cross-filter is
    the Q11 shape."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_li = (
        li.join(F.broadcast(
            s.join(F.broadcast(n),
                   F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey")))
    per_part = nat_li.groupBy("l_partkey").agg(
        _dsum(F.col("l_extendedprice"), "part_value"))
    total = per_part.agg(
        F.sum(F.col("part_value").cast("decimal(27,6)")).cast("double")
        .alias("total_value"))
    return (
        per_part.join(F.broadcast(total),
                      F.col("part_value")
                      > F.col("total_value") * F.lit(0.001))
        .select("l_partkey", "part_value")
    )


def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: supplier diversity per part attribute — an
    anti-join exclusion list (s_name containing '7' proxies the
    'complaints' NOT IN subquery) feeding COUNT(DISTINCT) over a
    three-key group. Exclusion list broadcast; distinct-count is the
    only wide exchange."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO"))
    excluded = (_t(spark, sf_dir, "supplier")
                .filter(F.col("s_name").contains("7"))
                .select(F.col("s_suppkey").alias("l_suppkey")))
    return (
        anti_join(
            li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")),
            excluded, "l_suppkey")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_part_promotion(spark, sf_dir):
    """TPC-H Q20 shape: nested semi-join with a correlated aggregate
    threshold — suppliers who shipped more than 30% of a part's total
    1996 volume, for parts named like 'bolt'. Two aggregation grains
    (supplier×part, then part) joined back, then a semi-join into the
    supplier dim + nation name. The per-part total joins broadcast
    (part-grain ≪ corpus)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01"))))
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    sp = (li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
          .groupBy("l_suppkey", "l_partkey")
          .agg(_dsum(F.col("l_quantity"), "supp_qty")))
    part_tot = sp.groupBy("l_partkey").agg(
        F.sum(F.col("supp_qty").cast("decimal(27,6)")).cast("double")
        .alias("part_qty"))
    big = (sp.join(F.broadcast(part_tot), "l_partkey")
           .filter(F.col("supp_qty") > F.col("part_qty") * F.lit(0.3))
           .select("l_suppkey").distinct())
    return (
        s.join(F.broadcast(big), F.col("s_suppkey") == F.col("l_suppkey"),
               "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


def skew_salted_agg(spark, sf_dir):
    """Salted two-phase aggregation for hot keys (operators/skew.py) —
    the oracle is the PLAIN group-by, proving the salting is exact.
    l_returnflag has only 3 values → maximal skew for a 600k-row scan,
    the shape where reduce-side salting matters at 100 TB."""
    from ..operators.skew import salted_agg
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("decimal(27,6)").alias("qty"))
    out = salted_agg(li, ["l_returnflag"], n_salts=16,
                     total_qty=("sum", "qty"), n_rows=("count", "*"),
                     max_qty=("max", "qty"))
    return out.select(
        "l_returnflag",
        F.col("total_qty").cast("double").alias("total_qty"),
        F.col("n_rows"),
        F.col("max_qty").cast("double").alias("max_qty"))


def string_functions(spark, sf_dir):
    """String-function surface over part: case, substring, length,
    concat, trim/replace — all JVM-side codegen expressions."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
        F.length(F.col("p_name")).alias("name_len"),
        F.concat_ws("/", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("_")).alias("brand_safe"),
    )


# --------------------------------------------------------- extensions §2.11

def dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return DD.exact_dedup_groups(d)


def dedup_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return DD.fingerprint_dedup_groups(d)


def ngram_jaccard_neardup(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs (≥0.6) — the ground truth
    for the MinHash path; O(n²), correctness scale only."""
    d = _t(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(d, threshold=0.6)


def minhash_neardup(spark, sf_dir):
    """MinHash+LSH near-dup (≥0.6) with exact verification — the 100 TB
    dedup path; same contract (and oracle) as ngram_jaccard_neardup
    since verification makes precision exact and banding recall ≈ 1
    at this threshold."""
    d = _t(spark, sf_dir, "documents")
    return DD.minhash_near_dup_pairs(d, threshold=0.6)


def simhash_neardup(spark, sf_dir):
    """SimHash near-dup (Hamming ≤ 3, pigeonhole-blocked) — rows-only:
    signatures depend on Spark's xxhash64, not SQL-expressible."""
    d = _t(spark, sf_dir, "documents")
    return DD.simhash_pairs(d)


def text_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n = F.count("*")
    return (
        d.withColumn("n_tokens", TX.token_count("text"))
        .groupBy("lang")
        .agg(n.alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"),
             (F.sum("n_chars").cast("double") / n).alias("avg_chars"),
             (F.sum("n_tokens").cast("double") / n).alias("avg_tokens"))
    )


def text_quality_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.stopword_ratio("text").alias("stop_ratio"),
        TX.quality_flag("text").alias("keep"),
    )


def text_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    pred = TX.lang_guess("text")
    return d.select("doc_id", "lang", pred.alias("lang_pred"),
                    (pred == F.col("lang")).alias("agree"))


def embedding_cosine_neardup(spark, sf_dir):
    """Embedding near-dup pairs, exact cosine ≥ 0.4 — served by the
    BLOCKED exact pair join (r8: block-partitioned applyInPandas with
    a fold-order-preserving numpy kernel, bit-identical to the
    interpreted cosine_pairs and 10–21× faster once the quadratic
    term dominates; same DuckDB oracle)."""
    e = _t(spark, sf_dir, "embeddings")
    return SIM.cosine_pairs_blocked(e, threshold=0.4)


def token_heavy_hitters_sketch(spark, sf_dir):
    """Top-20 tokens by count-min estimate — rows-only (sketch
    internals are engine-side); the exact twin is `token_frequencies`.
    One-sided error + mergeability tested in test_operators."""
    from ..operators.sketch import token_heavy_hitters
    d = _t(spark, sf_dir, "documents")
    return token_heavy_hitters(d, "text", k=20)


def distinct_rollup_hll(spark, sf_dir):
    """Mergeable-distinct rollup (Datasketches HLL): monthly partial
    sketches of l_partkey per returnflag, unioned to per-flag
    estimates — the store-the-sketch pattern that answers rollups at
    100 TB without rescanning the fact table. Rows-only (estimates
    are Datasketches-specific); the exact twin is
    distinct_count_exact, and the register-identity of
    union-of-partials vs direct build is asserted in test_operators."""
    from ..operators.sketch import (distinct_sketch_partials,
                                    distinct_sketch_rollup)
    li = _t(spark, sf_dir, "lineitem")
    partials = distinct_sketch_partials(
        li, "l_partkey", ["l_returnflag"],
        F.date_trunc("month", F.col("l_shipdate")), lgk=12)
    return (distinct_sketch_rollup(partials, ["l_returnflag"])
            .withColumn("approx_distinct",
                        F.col("approx_distinct").cast("bigint")))


def value_quantiles_kll(spark, sf_dir):
    """Mergeable-quantile rollup (Datasketches KLL): monthly sketch
    cells of l_extendedprice per returnflag folded to per-flag
    p50/p95/p99 — store-the-sketch percentiles without rescanning.
    Rows-only AND non-repeatable by construction (KLL compaction is
    randomized), so correctness is pinned in tests as the sketch's
    actual contract: measured rank error of every estimate < 3% at
    k=200, n_rows exact. Exact twins: value_percentiles (interpolated
    percentile) and the percentile_approx path in
    approx_distinct_sketch (GK, deterministic)."""
    from ..operators.sketch import (quantile_sketch_partials,
                                    quantile_sketch_rollup)
    li = _t(spark, sf_dir, "lineitem")
    cells = quantile_sketch_partials(
        li, "l_extendedprice", ["l_returnflag"],
        F.date_trunc("month", F.col("l_shipdate")), k=200)
    return (quantile_sketch_rollup(cells, ["l_returnflag"])
            .withColumn("n_rows", F.col("n_rows").cast("bigint")))


def _source_shingles(spark, sf_dir):
    """(source, shingle) rows for the overlap twins. The shingle
    table is pinned BEFORE the explode: without the materialization
    barrier the explode stage re-evaluates the O(tokens·n) shingle
    transform (~4× slower, measured at sf0.1 — same pathology
    minhash_near_dup_pairs pins against, dedup.py:251)."""
    from ..operators.cache import pin
    from ..operators.dedup import shingle_df
    d = _t(spark, sf_dir, "documents")
    sh = pin(shingle_df(d, "text", "doc_id", 3))
    return (sh.join(d.select(F.col("doc_id").alias("id"), "source"), "id")
            .select("source", F.explode("sh").alias("shingle")))


def source_overlap_exact(spark, sf_dir):
    """Cross-source shingle overlap, exact: distinct 3-gram shingles
    shared per source pair. This is the O(shared-keys) self-join
    baseline the theta-sketch twin (source_overlap_theta) replaces at
    scale. Top-20 pairs by overlap, deterministic tiebreak."""
    sh = _source_shingles(spark, sf_dir).distinct()
    pairs = (sh.alias("a")
             .join(sh.alias("b"),
                   (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.source") < F.col("b.source")))
             .groupBy(F.col("a.source").alias("source_a"),
                      F.col("b.source").alias("source_b"))
             .agg(F.count("*").alias("n_shared")))
    return pairs.orderBy(F.col("n_shared").desc(),
                         "source_a", "source_b").limit(20)


def events_trend_slope(spark, sf_dir):
    """Per-series OLS trend: slope of hourly-bucketed values over the
    bucket index — cov(t, x)/var(t) with the exact-moment machinery
    (bucket indices are SMALL ints, so t-moments are exact integers
    outright). Completes the bit-exact stats family: mean/std
    (z-score), dependence (corr), trend (slope). Slope units:
    value per hour."""
    e = _events(spark, sf_dir)
    bucket = F.expr("ts_ms div 3600000")
    ord_key = F.col("ts_ms") * F.lit(1_000_000) + F.col("event_id")
    per = (e.groupBy(F.col("event_type").alias("k"), bucket.alias("bi"))
           .agg(F.max_by("value", ord_key).alias("v")))
    w0 = Window.partitionBy("k")
    t = (F.col("bi") - F.min("bi").over(w0)).cast("decimal(10,0)")
    c = F.round(F.col("v") * 100.0).cast("decimal(10,0)")
    rows = per.select("k", t.alias("t"), c.alias("c"))
    g = (rows.groupBy("k")
         .agg(F.count("*").alias("n"),
              F.sum("t").alias("st"), F.sum("c").alias("sx"),
              F.sum(F.col("t") * F.col("t")).alias("stt"),
              F.sum(F.col("t") * F.col("c")).alias("stx")))
    return g.select(F.col("k").alias("event_type"), "n",
                    (_slope_from_moments("st", "sx", "stt", "stx", "n")
                     / 100.0).alias("slope_per_hour"))


def events_pair_correlation(spark, sf_dir):
    """Cross-series correlation matrix (pairs screening): align every
    event-type pair on a 1-hour bucket grid (last observation per
    bucket), then Pearson over the shared buckets with the exact-
    decimal moment machinery — the same bit-exact recipe as
    lineitem_price_qty_corr, composed with time-bucket alignment and
    an unordered pair self-join. K series ⇒ the join is over K
    bucket-grain tables (tiny), never the raw stream."""
    from ..operators.cache import pin
    e = _events(spark, sf_dir)
    bucket = F.expr("ts_ms div 3600000") * F.lit(3600000)
    # composite numeric order key (DuckDB's max_by can't compare
    # structs): ms*1e6 + id is ts-then-id order while event_id < 1e6
    ord_key = F.col("ts_ms") * F.lit(1_000_000) + F.col("event_id")
    per = (e.groupBy(F.col("event_type").alias("k"), bucket.alias("b"))
           .agg(F.max_by("value", ord_key).alias("v")))
    c = F.round(F.col("v") * 100.0).cast("decimal(10,0)")
    # pin: both self-join branches reuse this bucket-grain aggregate —
    # without it the raw-events max_by scan runs twice per action.
    per = pin(per.select("k", "b", c.alias("c")))
    a = per.select(F.col("k").alias("ka"), "b", F.col("c").alias("ca"))
    bb = per.select(F.col("k").alias("kb"), "b", F.col("c").alias("cb"))
    j = a.join(bb, ["b"]).filter(F.col("ka") < F.col("kb"))
    g = (j.groupBy("ka", "kb")
         .agg(F.count("*").alias("n"),
              F.sum("ca").alias("sx"), F.sum("cb").alias("sy"),
              F.sum(F.col("ca") * F.col("ca")).alias("sxx"),
              F.sum(F.col("cb") * F.col("cb")).alias("syy"),
              F.sum(F.col("ca") * F.col("cb")).alias("sxy")))
    return g.select("ka", "kb", "n",
                    _pearson_from_moments("sx", "sy", "sxx", "syy",
                                          "sxy", "n").alias("corr"))


def events_motif_search(spark, sf_dir):
    """UCR-style subsequence similarity search: top-3 z-normalized
    matches per event type to a literal 8-tick spike pattern —
    "where did the series move like THIS", scale/offset-invariant.
    Sliding windows via a frame-bounded collect_list; distance in
    array expressions. Routed through the CHUNKED path (row-space
    chunks with an m-1 carry overlap): event_type is a 5-value key,
    so the plain per-key window would serialize each 20%-of-the-
    stream series through one task — chunking restores keys × chunks
    parallelism with BIT-IDENTICAL results (equality pinned in
    tests). See operators/timeseries.py:subsequence_search."""
    from ..operators.timeseries import subsequence_search
    e = _events(spark, sf_dir)
    pattern = [1.0, 2.0, 4.0, 8.0, 8.0, 4.0, 2.0, 1.0]
    return subsequence_search(e, "event_type", ["ts_ms", "event_id"],
                              "value", pattern, k=3, chunk_rows=2048)


def events_twap(spark, sf_dir):
    """Time-weighted average value per event type (the market-data
    TWAP: each observation holds until the next one, so its weight is
    its holding duration — plain AVG over irregular ticks over-weights
    bursts). value×duration products are exact integer decimals
    (cents × ms), so the weighted sum is order-independent and the
    result bit-exact vs the oracle. One window (lead) + one aggregate
    on the same key exchange."""
    from ..operators.cache import pin
    from ..operators.timeseries import keyed_row_numbers
    e = _events(spark, sf_dir)
    # lead(ts) WITHOUT a whole-key window: event_type is a 5-value
    # key, so the per-key window would serialize 20% of the stream
    # through one task (the r5 weak shape). keyed_row_numbers is
    # chunk-parallel; the successor lookup is then an equi-join on
    # (key, rn+1) — co-partitioned, keys x chunks parallelism, and
    # the durations (hence every downstream sum) are IDENTICAL to the
    # window-lead form, so oracle parity stays bit-exact. Pinned:
    # both self-join branches reuse the row-numbered scan (column
    # pruning makes the branches' exchanges differ, so ReuseExchange
    # alone would rescan the raw events twice — review catch r6).
    base = pin(keyed_row_numbers(
        e.select("event_type", "ts_ms", "event_id", "value"),
        "event_type", ["ts_ms", "event_id"],
        F.expr("ts_ms div 3600000")))
    nxt = base.select(F.col("event_type").alias("k2"),
                      (F.col("__rn_g") - 1).alias("rn2"),
                      F.col("ts_ms").alias("nxt_ts"))
    j = base.join(nxt, (F.col("event_type") == F.col("k2"))
                  & (F.col("__rn_g") == F.col("rn2")), "left")
    c = F.round(F.col("value") * 100.0).cast("decimal(10,0)")
    dur = (F.col("nxt_ts") - F.col("ts_ms")).cast("decimal(12,0)")
    rows = (j.select("event_type", c.alias("c"), dur.alias("dur"))
            .filter(F.col("dur").isNotNull()))
    g = (rows.groupBy("event_type")
         .agg(F.count("*").alias("n_intervals"),
              F.sum(F.col("c") * F.col("dur")).alias("swv"),
              F.sum("dur").alias("st")))
    twap = (F.col("swv").cast("string").cast("double")
            / F.col("st").cast("string").cast("double")) / 100.0
    return g.select("event_type", "n_intervals",
                    F.col("st").cast("bigint").alias("span_ms"),
                    twap.alias("twap_value"))


def lineitem_price_qty_corr(spark, sf_dir):
    """Pearson correlation per returnflag between quantity and
    extended price, via EXACT integer-decimal moment sums (the
    bivariate member of the exact-moments family begun by
    events_zscore_outliers): S_x S_y S_xx S_yy S_xy accumulate as
    exact decimals (order-independent), big sums cross to double
    through STRING casts (decimal→double direct casts differ 1 ULP
    between engines — verify-skill lesson), then one fixed sequence
    of correctly-rounded ops. Built-in corr() is the non-reproducible
    twin (FP accumulation order varies with partitioning)."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100.0).cast("decimal(10,0)")
    y = F.round(F.col("l_extendedprice") * 100.0).cast("decimal(12,0)")
    rows = li.select("l_returnflag", x.alias("x"), y.alias("y"))
    g = (rows.groupBy("l_returnflag")
         .agg(F.count("*").alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("y") * F.col("y")).alias("syy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy")))
    return g.select("l_returnflag", "n",
                    _pearson_from_moments("sx", "sy", "sxx", "syy",
                                          "sxy", "n")
                    .alias("corr_qty_price"))


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier by quarterly revenue) without the
    view: revenue per supplier over a 3-month shipdate window, keep
    the max-revenue supplier(s) — decimal-exact ties, no
    re-aggregation of lineitem.

    r10 (the PMI-audit class): the max used to be a PARTITION-LESS
    window over the per-supplier aggregate — a one-task sort of a
    supplier-count-sized table (10⁸ rows at 100 TB). Now it is a
    partial-combining one-row aggregate BROADCAST back onto the
    supplier table; the supplier aggregate is pinned once so its two
    consumers (the max and the filter) never replay the lineitem
    scan."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1996-04-01")))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                      "total_revenue"))
           .localCheckpoint(eager=True))
    mx = F.broadcast(rev.agg(F.max("total_revenue").alias("__mx")))
    top = rev.join(mx, rev["total_revenue"] == mx["__mx"]).drop("__mx")
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supplier_no"), "s_name")
    return top.join(F.broadcast(s), "supplier_no") \
        .select("supplier_no", "s_name", "total_revenue")


def fuzzy_name_block_join(spark, sf_dir):
    """Blocked fuzzy join (entity-resolution shape): customer-name
    pairs within the same nation at Levenshtein distance ≤ 2 —
    blocking on the nation key turns the quadratic all-pairs into
    per-block self-joins, the same candidate-bounding pattern as the
    LSH dedup family but for edit distance. Output: per-nation pair
    counts + the minimum observed distance (small, hash-stable)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey")
    # the scoring stage is CPU-bound (pairs × levenshtein) and the
    # dim side broadcasts, so the probe side's partitioning IS the
    # stage's parallelism — a 3-file parquet scan would run the whole
    # quadratic block on 3 cores (measured: 4.7x slower). Spread the
    # probe across the configured parallelism before pairing.
    par = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    a, b = c.repartition(par).alias("a"), c.alias("b")
    # threshold=2 runs the BANDED Levenshtein (O(len·threshold) per
    # pair instead of O(len²), returns -1 past the band) — ~2x less
    # per-pair work, same kept pairs/distances. NO broadcast hint:
    # customer grows with sf, so the planner must stay free to fall
    # back to a shuffled join past the auto-broadcast threshold
    # (review catch r6); at bench scale it auto-broadcasts, keeping
    # the repartitioned probe's parallelism for the scoring stage.
    pairs = (a.join(b,
                    (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
                    & (F.col("a.c_custkey") < F.col("b.c_custkey")))
             .select(F.col("a.c_nationkey").alias("nationkey"),
                     F.levenshtein("a.c_name", "b.c_name",
                                   threshold=2).alias("d"))
             .filter(F.col("d") >= 0))
    return (pairs.groupBy("nationkey")
            .agg(F.count("*").alias("n_close_pairs"),
                 F.min("d").alias("min_distance")))


def corpus_upsample_stats(spark, sf_dir):
    """Repeat-factor corpus mixing (the up-sampling side): langs get
    fixed weights — ⌊w⌋ guaranteed copies per doc plus a fractional
    copy by the deterministic md5 coin — and the query summarizes the
    emitted mixture per lang. Engine-reproducible draw ⇒ oracle-exact
    down to which copies were kept (total_tokens proves it)."""
    from ..functions.text import token_count
    from ..operators.training import upsample_with_repeats
    d = _t(spark, sf_dir, "documents")
    weights = {"en": 1.0, "de": 2.5, "fr": 1.75, "es": 3.0}
    up = upsample_with_repeats(d, weights, "lang", "doc_id")
    return (up.groupBy("lang")
            .agg(F.count("*").alias("n_rows_out"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.max("copy").cast("bigint").alias("max_copies"),
                 F.sum(token_count("text")).cast("bigint")
                 .alias("total_tokens")))


def doc_bpe_token_real(spark, sf_dir):
    """REAL BPE token counts (trained merges, not the regex estimate):
    merges learned on the driver from the bounded word-frequency
    artifact (codebook contract), applied JVM-side via a broadcast
    vocab join. Rows-only: the merge training loop is not
    SQL-expressible; the declared weak twin is
    text_bpe_token_estimate, and exactness vs a pure-python reference
    tokenization is pinned in test_operators."""
    from ..functions.bpe import (_word_freqs, bpe_token_counts,
                                 train_bpe_merges)
    d = _t(spark, sf_dir, "documents")
    freqs = _word_freqs(d, "text", 2000)   # ONE corpus scan, reused
    merges = train_bpe_merges(d, n_merges=60, freqs=freqs)
    return bpe_token_counts(d, merges, [w for w, _ in freqs])


def doc_length_buckets(spark, sf_dir):
    """Equi-depth length bucketing (the batch-shaping step before
    sequence packing: group docs of similar token length so padding
    waste is bounded): ntile(8) over (token count, doc_id) — exact,
    deterministic, rank-based, so bucket boundaries adapt to the
    length distribution with no histogram estimation. Per bucket:
    doc count, min/max/total tokens. Scale note: a GLOBAL ntile
    serializes the rank through one task — at 100 TB swap the exact
    ntile for approx-quantile boundaries + a scan-side bucket
    assignment (boundaries are a broadcast-size artifact); the exact
    form is the oracle-checkable ground truth of that path."""
    from ..functions.text import token_count
    d = _t(spark, sf_dir, "documents")
    rows = d.select("doc_id",
                    token_count("text").cast("bigint").alias("n_tok"))
    w = Window.orderBy("n_tok", "doc_id")
    b = rows.withColumn("bucket", F.ntile(8).over(w))
    return (b.groupBy("bucket")
            .agg(F.count("*").alias("n_docs"),
                 F.min("n_tok").alias("min_tokens"),
                 F.max("n_tok").alias("max_tokens"),
                 F.sum("n_tok").cast("bigint").alias("total_tokens")))


def events_mad_outliers(spark, sf_dir):
    """Robust (Hampel-style) outlier detection per event type: median
    and median-absolute-deviation instead of mean/stddev, flagging
    |value − med| > 3·MAD — the robust twin of events_zscore_outliers
    (a z-score's mean and σ are themselves dragged by the outliers
    they are supposed to find). Medians are RANK-BASED (the value at
    row_number (n+1) div 2 in value order — the lower median), so no
    interpolation arithmetic exists to diverge across engines: every
    emitted double is a value picked from the data or one
    subtract/multiply away, bit-exact. MAD == 0 degenerates safely
    (dev > 0 counts; no division anywhere).

    Scale shape: two per-key window passes (count + row_number,
    partitioned by event_type — no global window) and two broadcast
    joins of the 5-row medians table. The two medians tables are
    pinned (localCheckpoint — they are |event types| rows): without
    the pin, every downstream reference replayed the window lineage
    from the scan (6 window passes / 6 sorts / 4 scans observed in
    the r9 audit; now 2 / 2 / 3 — the remaining replays are narrow
    2-column scans + a broadcast join, cheaper than materializing a
    corpus-sized frame)."""
    e = _events(spark, sf_dir)
    kw = Window.partitionBy("event_type")
    rk = Window.partitionBy("event_type").orderBy("value")
    base = e.select("event_type", "value")
    v = (base
         .withColumn("n", F.count("*").over(kw))
         .withColumn("rn", F.row_number().over(rk)))
    med = (v.filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
           .select("event_type", F.col("value").alias("med"))
           .localCheckpoint(eager=True))
    d = (base.join(F.broadcast(med), "event_type")
         .withColumn("dev", F.abs(F.col("value") - F.col("med"))))
    dk = Window.partitionBy("event_type").orderBy("dev")
    d2 = (d.withColumn("n", F.count("*").over(kw))
          .withColumn("rn", F.row_number().over(dk)))
    mad = (d2.filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
           .select("event_type", F.col("dev").alias("mad"))
           .localCheckpoint(eager=True))
    return (d.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.max("med").alias("med"),
                 F.max("mad").alias("mad"),
                 F.sum(F.when(F.col("dev") > F.lit(3.0) * F.col("mad"), 1)
                       .otherwise(0)).cast("bigint").alias("n_outliers")))


def events_zscore_outliers(spark, sf_dir):
    """Statistical QC: per event type, standardize every value against
    the group's mean/std and count |z| > 3 outliers. Moments come from
    EXACT integer-decimal sums of cents and cents² (order-independent;
    both fit 2^53 so the decimal→double casts are exact), then a fixed
    sequence of correctly-rounded double ops — bit-exact vs the
    oracle, no tolerance anywhere. One aggregate + a broadcast join
    back; scan-bound at scale."""
    e = _events(spark, sf_dir)
    c = F.round(F.col("value") * F.lit(100.0)).cast("decimal(10,0)")
    rows = e.select("event_type", c.alias("c"))
    g = (rows.groupBy("event_type")
         .agg(F.count("*").alias("n"),
              F.sum("c").alias("s1"),
              F.sum(F.col("c") * F.col("c")).alias("s2")))
    nD = F.col("n").cast("double")
    # s1/s2 go through the string route (_dstr): DuckDB's int128→double
    # direct cast differs by 1 ULP once sums exceed 2^53, and this query
    # must stay bit-exact at ANY scale factor (ADVICE r5).
    m = _dstr("s1") / nD
    v = (_dstr("s2") - _dstr("s1") * m) / nD
    stats = g.select("event_type", "n", m.alias("m"),
                     F.sqrt(v).alias("s"))
    z = (F.col("c").cast("double") - F.col("m")) / F.col("s")
    return (rows.join(F.broadcast(stats), "event_type")
            .groupBy("event_type")
            .agg(F.first("n").alias("n_events"),
                 (F.first("m") / 100.0).alias("mean_value"),
                 (F.first("s") / 100.0).alias("std_value"),
                 F.count(F.when(F.abs(z) > 3.0, 1)).alias("n_outliers"),
                 F.max(F.abs(z)).alias("max_abs_z")))


def source_cap_sample(spark, sf_dir):
    """Per-source frequency cap (the per-domain over-representation
    control of web-corpus curation): keep ≤10 docs per source by the
    deterministic md5 coin, then summarize. n_kept_tokens proves the
    engines picked the IDENTICAL docs, not just the same count."""
    from ..operators.training import cap_per_group
    from ..functions.text import token_count
    d = _t(spark, sf_dir, "documents")
    kept = cap_per_group(d, "source", cap=10)
    return (kept.groupBy("source")
            .agg(F.count("*").alias("n_kept"),
                 F.sum(token_count("text")).alias("n_kept_tokens"),
                 F.min("doc_id").alias("min_kept_id")))


def shard_manifest(spark, sf_dir):
    """Deterministic global-shuffle shard manifest: every doc gets a
    reproducible md5 order key and a shard = contiguous slice of that
    pseudo-random order (reading shards in sequence replays the exact
    permutation — training-data order is a hyperparameter). Per-shard
    doc/token counts plus the first/last doc in permutation order,
    all engine-reproducible, so the oracle matches bit-for-bit."""
    from ..operators.training import global_shuffle_shards
    from ..functions.text import token_count
    d = _t(spark, sf_dir, "documents")
    sh = global_shuffle_shards(d, "doc_id", n_shards=16)
    return (sh.groupBy(F.col("shard").cast("bigint").alias("shard"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(token_count("text")).alias("n_tokens"),
                 F.min_by("doc_id", "okey").alias("first_doc"),
                 F.max_by("doc_id", "okey").alias("last_doc")))


def passage_dedup_scrub(spark, sf_dir):
    """Sub-document exact dedup (Lee et al. 2022): per doc, how many
    8-word passages repeat anywhere in the corpus, and the text length
    after scrubbing the repeated ones (order preserved). Document-level
    dedup can't see boilerplate repeated INSIDE unique pages — this is
    the curation step that does. Two keyed shuffles (digest counts +
    join back), no O(n²); oracle-exact vs the same chunking in SQL."""
    from ..operators.dedup import passage_dedup_stats
    d = _t(spark, sf_dir, "documents")
    out = passage_dedup_stats(d, "text", "doc_id", width=8)
    return out.select(
        "doc_id", "n_passages", "n_dup", "dup_ratio",
        F.col("scrubbed_n_chars").cast("bigint").alias("scrubbed_n_chars"))


def dup_span_extents(spark, sf_dir):
    """MAXIMAL duplicated spans (the missing half of Lee et al. 2022's
    exact substring dedup next to passage_dedup_scrub's disjoint
    chunks): overlapping 8-token windows, a window is duplicated if
    its text occurs ≥2 times anywhere in the corpus, and a doc's
    overlapping/contiguous duplicated windows merge into maximal
    spans via gaps-and-islands (break when the next window starts
    past the previous span's end). Per doc with ≥1 span: span count,
    duplicated-token coverage, longest span. All integers —
    bit-exact across engines.

    Scale shape: windows shuffle once for the global count (groupBy
    window text, partial-agg), join back on the window key, and the
    island merge is a per-doc window (partitioned by doc_id — no
    global window). At 100 TB swap the window STRING key for
    xxhash64(window) — identical plan, 8-byte shuffle keys; the
    string key here keeps the DuckDB oracle hash-exact."""
    W = 8
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w"))
    wins = (toks.filter(F.size("w") >= W)
            .select("doc_id", F.posexplode(F.expr(
                f"transform(sequence(0, size(w) - {W}),"
                f" i -> concat_ws(' ', slice(w, i + 1, {W})))"
            )).alias("pos", "win")))
    dup_wins = (wins.groupBy("win").agg(F.count("*").alias("n_occ"))
                .filter(F.col("n_occ") >= 2).select("win"))
    marked = wins.join(dup_wins, "win").select("doc_id", "pos")
    ww = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(ww)
    brk = F.when(prev.isNull() | (F.col("pos") > prev + W), 1).otherwise(0)
    isl = (marked.withColumn("brk", brk)
           .withColumn("grp", F.sum("brk").over(ww)))
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"), (F.max("pos") + F.lit(W - 1)).alias("e"))
    return spans.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_tokens"),
        F.max(F.col("e") - F.col("s") + 1).cast("bigint")
        .alias("max_span_tokens"))


def bloom_semi_join_agg(spark, sf_dir):
    """Bloom-prefiltered semi join (membership member of the sketch
    family): lineitem rows whose part is in the p_size ≥ 48 key set,
    prefiltered by a 2^14-bit / k=5 Bloom compiled into the scan as a
    pure Column predicate — no join, no explode, no shuffle on the
    probe side until the exchange sees only ~(selectivity + fpp) of
    the rows. Result is EXACT (no false negatives; the verify semi
    join removes false positives), so the oracle is a plain EXISTS.
    Merge/no-false-negative/fpp contracts pinned in test_operators."""
    from ..operators.sketch import bloom_semi_join
    li = _t(spark, sf_dir, "lineitem")
    keys = (_t(spark, sf_dir, "part")
            .filter(F.col("p_size") >= 48).select("p_partkey"))
    out = bloom_semi_join(li, keys, "l_partkey", "p_partkey",
                          n_bits=1 << 14, k=5)
    return (out.groupBy("l_returnflag")
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct("l_partkey").alias("n_parts"),
                 _dsum(F.col("l_quantity"), "sum_qty")))


def source_overlap_theta(spark, sf_dir):
    """Cross-source distinct-shingle set algebra via theta sketches:
    |A|, |B|, |A∩B|, |A∪B| per source pair from one corpus scan + a
    K-row sketch join — no fingerprint self-join. Rows-only (sketch
    estimates are engine-side); agreement with source_overlap_exact
    is asserted in test_operators (exact-mode sketches at fixture
    cardinalities). Same top-20 framing as the exact twin."""
    from ..operators.sketch import (theta_pairwise_overlap,
                                    theta_set_sketches)
    sh = _source_shingles(spark, sf_dir)
    sketches = theta_set_sketches(sh, "shingle", "source", lg_nom=14)
    out = theta_pairwise_overlap(sketches, "source")
    return (out.select(F.col("set_a").alias("source_a"),
                       F.col("set_b").alias("source_b"),
                       F.col("n_a").cast("bigint").alias("n_a"),
                       F.col("n_b").cast("bigint").alias("n_b"),
                       F.col("n_shared").cast("bigint").alias("n_shared"),
                       F.col("n_union").cast("bigint").alias("n_union"))
            .orderBy(F.col("n_shared").desc(), "source_a", "source_b")
            .limit(20))


def events_ewma_smooth(spark, sf_dir):
    """Per-user EWMA (alpha=0.5) of event values in time order — the
    exponential-smoothing member of the time-series family. The
    sequential recursion runs as its closed form over one cumulative
    window (single exchange on user_id, no self-join, no Python);
    the fixed-2-decimal values route the running sum through exact
    integer decimals, so the result is bit-reproducible across
    engines and partitionings and the oracle matches hash-exact.
    Bounded-series contract (rn ≤ 99/key on the decimal path; fixture
    max 99) — unbounded streams use the streaming twin. See
    operators/timeseries.py:ewma."""
    from ..operators.timeseries import ewma
    e = _events(spark, sf_dir)
    out = ewma(e, "user_id", ["ts_ms", "event_id"], "value", alpha=0.5,
               value_decimals=2)
    return out.select("event_id", "user_id", "ts_ms", "value", "ewma")


def events_ewma_chunked(spark, sf_dir):
    """EWMA over the 5-value event_type key — per-key series of
    thousands of rows, 20x past the closed form's decimal bound, so
    this query is only computable through the segmented path
    (operators/timeseries.py:ewma_chunked): per-segment closed form +
    pointer-jumping carry scan, keys x segments parallelism.
    Rows-only (the cross-segment carry composition is a parallel
    scan, not SQL-expressible bit-exact); correctness vs an
    exact-Fraction sequential recursion is pinned in
    tests/test_operators.py."""
    from ..operators.timeseries import ewma_chunked
    e = _events(spark, sf_dir)
    out = ewma_chunked(e, "event_type", ["ts_ms", "event_id"], "value",
                       alpha=0.5, value_decimals=2, seg_rows=64)
    return out.select("event_id", "event_type", "ts_ms", "value", "ewma")


def events_gapfill_locf(spark, sf_dir):
    """Dense 15-min grid per event type with last-observation-carried-
    forward — the hypertable gapfill+locf query over the sparse event
    stream (~50% of buckets are empty at this step). One raw-stream
    aggregate, then bucket-grain grid/join/window only."""
    from ..operators.timeseries import gap_fill_locf
    e = _events(spark, sf_dir)
    return gap_fill_locf(e, "event_type", "ts_ms", "value",
                         step_ms=900000,
                         ord_col=F.struct(F.col("ts_ms"),
                                          F.col("event_id")))


def events_gapfill_interpolate(spark, sf_dir):
    """Linear interpolation across the same 15-min gaps (the
    ``interpolate`` companion; trailing gaps fall back to LOCF)."""
    from ..operators.timeseries import gap_fill_interpolate
    e = _events(spark, sf_dir)
    return gap_fill_interpolate(e, "event_type", "ts_ms", "value",
                                step_ms=900000,
                                ord_col=F.struct(F.col("ts_ms"),
                                                 F.col("event_id")))


def curation_pipeline_summary(spark, sf_dir):
    """The batch curation funnel as ONE oracle-verifiable composition:
    quality gate → exact dedup (min-id keeper per distinct text) →
    deterministic split → per-split doc/token counts. The demo script
    runs this flow imperatively; this query proves the composed
    DataFrame program stays engine-exact end to end."""
    d = _t(spark, sf_dir, "documents")
    kept = d.filter(TX.quality_flag("text"))
    keeper = kept.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    split = TRAIN.hash_split(keeper, "doc_id")
    return (split.groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(TX.token_count("text")).alias("n_tokens")))


def doc_containment_pairs(spark, sf_dir):
    """Asymmetric n-gram CONTAINMENT pairs (|A∩B|/|A| ≥ 0.8, ordered
    a-contained-in-b): quote/subset detection — the measure Jaccard
    misses when a short doc sits inside a long one. Exact integer set
    sizes ⇒ bit-exact vs the oracle.
    See operators/dedup.py::ngram_containment_pairs."""
    d = _t(spark, sf_dir, "documents")
    return DD.ngram_containment_pairs(d, threshold=0.8)


def doc_sparse_cosine_neardup(spark, sf_dir):
    """Sparse-vector similarity join: doc pairs with cosine ≥ 0.7
    over term-frequency vectors via the inverted-index (postings)
    join with a doc-frequency prune — the third text-similarity
    family next to hash-based (MinHash/SimHash) and dense-embedding
    cosine. Exact integer dot/norms ⇒ bit-exact vs the oracle.
    See operators/dedup.py::sparse_cosine_pairs."""
    d = _t(spark, sf_dir, "documents")
    return DD.sparse_cosine_pairs(d, threshold=0.7, df_cap=200)


def semantic_dedup_clusters(spark, sf_dir):
    """Semantic (embedding-space) dedup keep-groups: exact-cosine pair
    graph ≥ 0.4 → connected components → one keeper per cluster.
    Shows the CC stage composes with ANY pair source (MinHash text
    pairs in dedup_cluster_keepers, cosine pairs here); at scale the
    pair source swaps to the banded-LSH twin unchanged. r8: the pair
    source is the BLOCKED exact join (bit-identical cosines, see
    cosine_pairs_blocked) so even the exact twin scales by block
    parallelism instead of one theta-join stream."""
    e = _t(spark, sf_dir, "embeddings")
    pairs = SIM.cosine_pairs_blocked(e, threshold=0.4)
    clusters = DD.neardup_clusters(pairs, id_a="a_id", id_b="b_id")
    return (clusters.groupBy("cluster_id")
            .agg(F.count("*").alias("n_members"))
            .select(F.col("cluster_id").alias("keeper_id"), "n_members"))


def knn_bruteforce(spark, sf_dir):
    """Exact top-5 cosine neighbors for query vectors (vec_id < 10)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return SIM.knn_bruteforce(e, q, k=5)


def knn_filtered_bruteforce(spark, sf_dir):
    """Metadata-FILTERED vector search (the vector-store feature every
    retrieval pipeline needs): exact top-5 cosine neighbors among the
    corpus subset with the query's label — pre-filtering the corpus
    BEFORE scoring, so the scan and the pair join shrink with the
    predicate's selectivity (post-filtering an unfiltered top-k
    under-fills k instead). Self-excluding, deterministic tiebreak;
    same oracle family as knn_bruteforce."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    corpus = e.filter(F.col("label") == 1)
    return SIM.knn_bruteforce(corpus, q, k=5)


def embedding_lsh_neardup(spark, sf_dir):
    """Banded-LSH near-dup pairs over embeddings — rows-only (banding
    is engine-side; the exact twin embedding_cosine_neardup is the
    oracle-checked ground truth). OR-combined 4×4 plane bands +
    Hamming-1 multiprobe: recall ≥0.9 at the declared 0.4 threshold
    (measured 58/59 on the sf0.01 fixture, asserted in
    test_lsh_pairs_recall_and_precision), precision exact via
    verification."""
    e = _t(spark, sf_dir, "embeddings")
    return SIM.lsh_cosine_pairs(e, threshold=0.4)


def knn_ann_hyperplane(spark, sf_dir):
    """Random-hyperplane LSH ANN — rows-only (bucketing is engine-side);
    recall vs knn_bruteforce is asserted in tests."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return SIM.random_hyperplane_ann(e, q, k=5)


def knn_ann_ivf(spark, sf_dir):
    """IVF-cell ANN (probe 2 nearest of 16 cells) — rows-only (cell
    assignment is engine-side); recall vs knn_bruteforce is asserted in
    tests. Centroids default to a deterministic hash-sample; at scale a
    k-means codebook is passed in via the ``centroids`` parameter."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return SIM.ivf_ann(e, q, k=5)


def embedding_norm_stats(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    v = SIM.as_double("embedding")
    n = F.count("*")
    return (
        e.select("label", SIM.norm(v).alias("nrm"))
        .groupBy("label")
        .agg(n.alias("n_vecs"),
             _davg(F.col("nrm"), n, "avg_norm", "decimal(27,12)"),
             F.min("nrm").alias("min_norm"),
             F.max("nrm").alias("max_norm"))
    )


def multimodal_binary_meta(spark, sf_dir):
    """Multimodal plumbing, oracle-checkable slice: treat text bytes as
    an opaque blob → byte length, content sha256, hex prefix. (Real
    decode kernels live in operators/multimodal.py behind mapInPandas.)"""
    d = _t(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).cast("long").alias("byte_len"),
        F.sha2(blob, 256).alias("content_sha256"),
        F.lower(F.substring(F.hex(blob), 1, 16)).alias("prefix_hex"),
    )


def events_moving_stats(spark, sf_dir):
    """Rolling-frame window surface (ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW): per-user moving sum/avg/min/max of value over the
    last 5 events — the time-series feature shape (moving averages,
    rolling vol) the batch corpus lacked. Exact-decimal rolling sum so
    the frame arithmetic is engine-identical."""
    e = _events(spark, sf_dir)
    w = (Window.partitionBy("user_id")
         .orderBy("ts_ms", "event_id")
         .rowsBetween(-4, Window.currentRow))
    return e.select(
        "user_id", "event_id", "ts_ms",
        F.sum(F.col("value").cast("decimal(27,10)")).over(w)
         .cast("double").alias("mov_sum"),
        (F.sum(F.col("value").cast("decimal(27,10)")).over(w).cast("double")
         / F.count("*").over(w)).alias("mov_avg"),
        F.min("value").over(w).alias("mov_min"),
        F.max("value").over(w).alias("mov_max"),
        F.count("*").over(w).alias("frame_n"),
    )


def events_funnel_conversion(spark, sf_dir):
    """Funnel shape without self-joins: first click / first purchase
    per user as conditional MIN aggregates, conversion = purchase at
    or after the first click — one shuffle on user_id, then a scalar
    rollup."""
    e = _events(spark, sf_dir)
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts_ms")))
         .alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts_ms")))
         .alias("first_purchase"))
    clicked = F.col("first_click").isNotNull()
    converted = clicked & F.col("first_purchase").isNotNull() \
        & (F.col("first_purchase") >= F.col("first_click"))
    return per_user.agg(
        F.count(F.when(clicked, 1)).alias("n_clickers"),
        F.count(F.when(converted, 1)).alias("n_converted"),
        (F.count(F.when(converted, 1)).cast("double")
         / F.count(F.when(clicked, 1))).alias("conversion_rate"))


def orders_cohort_matrix(spark, sf_dir):
    """Cohort retention: customers grouped by first-order year, order
    counts per (cohort_year, order_year). Two-level temporal agg —
    the first agg's output re-joins the fact table (broadcast: one row
    per customer)."""
    o = _t(spark, sf_dir, "orders")
    first = (o.groupBy("o_custkey")
             .agg(F.year(F.min("o_orderdate")).alias("cohort_year")))
    return (
        o.join(F.broadcast(first), "o_custkey")
        .groupBy("cohort_year", F.year("o_orderdate").alias("order_year"))
        .agg(F.count("*").alias("n_orders"),
             F.countDistinct("o_custkey").alias("n_active_custs"))
    )


def embedding_quantize_stats(spark, sf_dir):
    """Vector-storage primitive: symmetric int8 quantization per
    embedding (scale = 127/max|x|, floor(x·s + 0.5) — floor-based so
    rounding is identical across engines) with reconstruction-error
    stats. At 100 TB this is the 4× storage/IO lever for ANN corpora;
    pure per-row array math, scan-speed."""
    e = _t(spark, sf_dir, "embeddings")
    v = SIM.as_double("embedding")
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    sc = F.lit(127.0) / mx
    q = F.transform(v, lambda x: F.floor(x * sc + F.lit(0.5)).cast("int"))
    err = F.array_max(F.zip_with(
        v, q, lambda x, qi: F.abs(x - qi.cast("double") / sc)))
    return e.select(
        "vec_id",
        mx.alias("max_abs"),
        err.alias("max_quant_err"),
        F.aggregate(q, F.lit(0).cast("long"),
                    lambda acc, qi: acc + F.abs(qi).cast("long")).alias("l1_q"),
    )


def text_repetition(spark, sf_dir):
    """Repetition/boilerplate quality signal: distinct vs total word
    3-grams per document (1 − distinct/total)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.ngram_total("text").alias("n_ngrams"),
        F.size(TX.shingles("text")).alias("n_distinct"),
        TX.repetition_ratio("text").alias("rep_ratio"),
    )


# ---------------- additional TPC-H plan shapes (EXTRA window, §2.6 breadth)

def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS semi-join feeding an aggregate (adapted:
    the fixture lacks commit/receipt dates, so 'late' = has a returned
    line). The semi-join shuffles only (orderkey) pairs; the agg is a
    2-key partial."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-07-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-10-01"))))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        semi_join(o, li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: 4-way join, revenue agg per customer, top 20.
    nation broadcasts; orders⋈lineitem is the only real shuffle; the
    deterministic top-20 runs as TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01"))))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: LEFT OUTER join preserving zero-order
    customers, per-customer count, then a count-of-counts histogram —
    two aggregates, the second over |distinct counts| rows."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: per-part average threshold (the correlated
    scalar subquery) as an aggregate-then-join — the avg table is one
    row per part and broadcasts; lineitem never shuffles twice."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    thresholds = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg((F.lit(0.2) * (F.sum(F.col("l_quantity").cast("decimal(27,6)"))
                            .cast("double") / F.count("*"))).alias("qty_threshold"))
        .select(F.col("l_partkey").alias("t_partkey"), "qty_threshold")
    )
    small = (
        li.join(F.broadcast(thresholds), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return small.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
         .cast("double") / F.lit(7.0)).alias("avg_yearly"),
        F.count("*").alias("n_lines"))


# --------------------------------- training-pipeline + market rollup §2.11

def events_ohlc_bars(spark, sf_dir):
    """Hypertable-style OHLC rollup: 15-min bars per event type —
    open/close via min_by/max_by on a unique (ts, id) order key, so
    the whole bar is ONE map-side-combined aggregate (no window pass
    over the raw stream; at 100 TB only one row per bar per partition
    reaches the shuffle). The oracle reproduces open/close with a
    row_number window — same values, Spark just gets the cheaper plan."""
    e = _events(spark, sf_dir)
    ord_key = F.struct(F.col("ts_ms"), F.col("event_id"))
    return (
        e.groupBy((F.expr("ts_ms div 900000") * 900000).alias("bar_start_ms"),
                  F.col("event_type"))
        .agg(F.min_by("value", ord_key).alias("open"),
             F.max("value").alias("high"),
             F.min("value").alias("low"),
             F.max_by("value", ord_key).alias("close"),
             F.count("*").alias("n_events"),
             _dsum(F.col("value"), "sum_value", "decimal(27,10)"))
    )


def pack_sequences_chunked(spark, sf_dir):
    """LLM pretraining sequence packing (concatenate-and-chunk): a
    windowed running sum per hash stream — one shuffle, SQL-exact."""
    d = _t(spark, sf_dir, "documents")
    return TRAIN.pack_chunks(d, cap=2048, n_streams=32)


def train_test_split_hash(spark, sf_dir):
    """Deterministic md5-bucket train/val/test split + per-split stats."""
    d = _t(spark, sf_dir, "documents")
    return TRAIN.split_summary(d)


def corpus_mix(spark, sf_dir):
    """Data-mixing weights toward a uniform per-language token share."""
    d = _t(spark, sf_dir, "documents")
    return TRAIN.corpus_mix_weights(d)


def stratified_resample_stats(spark, sf_dir):
    """Apply ``weighted_resample`` down-weights (en halved, zh
    quartered — the corpus-mix step actually executed, not just its
    weights) and report the surviving per-language doc/token counts.
    Deterministic md5-coin keep decision → bit-exact oracle twin."""
    d = _t(spark, sf_dir, "documents")
    kept = TRAIN.weighted_resample(d, {"en": 0.5, "zh": 0.25})
    return (kept.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(TX.token_count("text")).alias("n_tokens")))


def pii_scrub_stats(spark, sf_dir):
    """Content filtering: PII match counts + redacted length per doc
    (the fixture corpus is synthetic word-salad, so counts are zero —
    the oracle still proves both engines compile the same patterns)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.pii_count("text", TX.PII_PATTERNS["email"]).alias("n_email"),
        TX.pii_count("text", TX.PII_PATTERNS["phone"]).alias("n_phone"),
        F.length(TX.scrub_pii("text")).alias("clean_len"),
    )


def pack_greedy_packing(spark, sf_dir):
    """First-fit greedy packing (no straddle) via applyInPandas — the
    non-SQL-expressible twin of pack_sequences_chunked; invariants are
    property-tested in tests/test_operators.py."""
    d = _t(spark, sf_dir, "documents")
    return TRAIN.pack_greedy(d, cap=2048, n_buckets=32)


def dedup_cluster_keepers(spark, sf_dir):
    """Near-dup COMPONENTS → canonical keepers: MinHash pairs (exact-
    verified, = the Jaccard oracle's pair set on this corpus) are
    clustered by iterative min-label propagation
    (operators/dedup.py::neardup_clusters) and each cluster reports its
    min-id keeper + member count. Near-dup similarity is not
    transitive, so this is the step that turns pairs into keep/drop
    decisions. Oracle: recursive-CTE reachability fixpoint over the
    exact-Jaccard pair graph — same labeling, engine-independent."""
    d = _t(spark, sf_dir, "documents")
    return DD.neardup_cluster_keepers(d, threshold=0.6)


def text_bpe_token_estimate(spark, sf_dir):
    """BPE-ish token counting (GPT-2 pretokenizer shape, Java∩RE2): the
    cheap scan-speed proxy for tokenizer output size used in corpus
    budgeting, beside the whitespace count and their ratio."""
    d = _t(spark, sf_dir, "documents")
    bpe = TX.bpe_token_estimate("text")
    ws = TX.token_count("text")
    return d.select(
        "doc_id",
        bpe.cast("bigint").alias("n_bpe"),
        ws.cast("bigint").alias("n_ws"),
        (bpe.cast("double") / ws.cast("double")).alias("bpe_per_ws"))


def doc_rolling_fingerprint(spark, sf_dir):
    """Document fingerprinting via Rabin-Karp rolling hashes over
    8-token windows (winnowing's ingredient): per doc the window
    count, distinct count, and min window hash (the shift-tolerant
    fingerprint). Integer mod arithmetic end to end — bit-identical
    across engines."""
    d = _t(spark, sf_dir, "documents")
    hs = d.select("doc_id", TX.token_hash_array("text").alias("hs"))
    wh = hs.select("doc_id", TX.rolling_window_hashes("hs").alias("wh"))
    return wh.select(
        "doc_id",
        F.size("wh").cast("bigint").alias("n_windows"),
        F.size(F.array_distinct("wh")).cast("bigint").alias("n_distinct"),
        F.array_min("wh").alias("min_whash"))


def rolling_fingerprint_neardup(spark, sf_dir):
    """Shift-tolerant near-dup candidates: doc pairs sharing ≥3
    distinct 8-token rolling-window hashes (winnowing's candidate
    rule). Candidates come from an equi-join on the window hash —
    shuffle linear in windows, never all-pairs; random docs share no
    windows (2³¹ hash space), near-dups share most of them."""
    d = _t(spark, sf_dir, "documents")
    wh = (d.select("doc_id", TX.token_hash_array("text").alias("hs"))
          .select("doc_id", F.explode(F.array_distinct(
              TX.rolling_window_hashes("hs"))).alias("h")))
    a = wh.select(F.col("doc_id").alias("doc_a"), "h")
    b = wh.select(F.col("doc_id").alias("doc_b"), "h")
    return (a.join(b, "h")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").cast("bigint").alias("n_shared"))
            .filter(F.col("n_shared") >= 3))


def doc_top_terms(spark, sf_dir):
    """Per-doc top-3 distinctive terms by tf·rarity — the
    vocabulary/keyword step of corpus analytics. Weighting is LOG-FREE
    (score = tf · (N_docs+1) / (df+1), exact integer ratio in double)
    so both engines produce bit-identical scores — ln() would differ
    in the last ulp across libm builds. Shuffles are one token agg +
    one broadcast-joined doc-frequency dim + one windowed top-k."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(
        F.split(F.trim(F.col("text")), r"\s+")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf"))
    df_ = toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df"))
    # corpus size as a broadcast scalar row — the plan stays LAZY
    # (an eager d.count() here would run a job at plan-build time)
    n_row = F.broadcast(d.agg(F.count("*").alias("n_docs")))
    scored = tf.join(F.broadcast(df_), "term").crossJoin(n_row).select(
        "doc_id", "term", "tf", "df",
        (F.col("tf").cast("double") * (F.col("n_docs") + F.lit(1))
         / (F.col("df") + F.lit(1)).cast("double")).alias("score"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("doc_id", "term", "tf", "df", "score",
                    F.col("rn").cast("bigint").alias("rn")))


# Trained-codebook artifact cache, keyed by sf_dir. Production PQ
# trains ONCE and stores the codebook (similarity.py says exactly
# this); re-training inside every serve query conflated model-build
# cost with serve cost and made the bench number unrepresentative
# (r5 verdict #2). Training is deterministic, so cached rows ≡
# retraining; the artifact is m·k tiny rows — a cheap LocalRelation.
_PQ_BOOKS: dict[str, list] = {}


def _pq_codebooks(spark, sf_dir):
    if sf_dir not in _PQ_BOOKS:
        e = _t(spark, sf_dir, "embeddings")
        _PQ_BOOKS[sf_dir] = (
            SIM.train_pq_codebooks(e, m=16, k=16, n_iters=3).collect())
    return spark.createDataFrame(
        _PQ_BOOKS[sf_dir], "subspace INT, cell INT, cv ARRAY<DOUBLE>")


def knn_ann_pq(spark, sf_dir):
    """Product-quantization ANN SERVE path: ADC-scored shortlist (m
    table lookups per pair instead of a 64-dim dot) against the
    stored 16×16 codebook artifact (trained once per process —
    production trains offline; see knn_ann_pq_train for the build
    cost), exact cosine re-rank of the shortlist. Rows-only (the
    index is engine-side); recall vs knn_bruteforce asserted in
    tests."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return SIM.pq_ann(e, q, _pq_codebooks(spark, sf_dir), k=5,
                      shortlist=8)


def knn_ann_pq_train(spark, sf_dir):
    """PQ codebook TRAINING as its own tracked query (the model-build
    half of the train/serve split): per-subspace Lloyd iterations on
    the deterministic ≤4096-row hash sample. Returns the codebook
    table (m·k rows). Rows-only — k-means artifacts are engine-side
    by construction; determinism is asserted in tests."""
    e = _t(spark, sf_dir, "embeddings")
    return SIM.train_pq_codebooks(e, m=16, k=16, n_iters=3)


# Materialized ENCODED index per (session, sf_dir): the production PQ
# deployment stores the codes table (encode on ingest), so serving
# does ADC + rerank only. The artifact is a real PARQUET table (not
# cached blocks) so the benched serve cost honestly includes the
# index scan a deployment pays; keyed by applicationId so a fresh
# session re-materializes.
_PQ_ENC: dict[tuple, object] = {}


_PQ_ENC_ROOT: list = []  # lazily-created per-process private tempdir


def _pq_enc_root():
    # One PRIVATE (mode-0700 mkdtemp) root per process, removed at
    # exit: a world-shared path derived only from sha256(sf_dir) let
    # two concurrent processes benching the same corpus overwrite
    # each other's index mid-read, and on multi-user hosts the fixed
    # path was pre-creatable by another user (advisor catch r6). The
    # per-(applicationId, sf_dir) cache key below still guarantees
    # exactly ONE index copy per corpus within a process, and the
    # atexit cleanup keeps the no-leaked-tempdir property the r6
    # review established.
    if not _PQ_ENC_ROOT:
        import atexit
        import shutil
        import tempfile
        root = tempfile.mkdtemp(prefix="spark_graft_pq_index_")
        atexit.register(shutil.rmtree, root, True)
        _PQ_ENC_ROOT.append(root)
    return _PQ_ENC_ROOT[0]


def _pq_index(spark, sf_dir):
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PQ_ENC:
        import hashlib
        import os
        tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:16]
        path = os.path.join(_pq_enc_root(), tag, "codes")
        e = _t(spark, sf_dir, "embeddings")
        SIM.pq_encode(e, _pq_codebooks(spark, sf_dir)) \
            .write.mode("overwrite").parquet(path)
        _PQ_ENC[key] = path
    return spark.read.parquet(_PQ_ENC[key])


def knn_ann_pq_serve(spark, sf_dir):
    """PQ ANN against the MATERIALIZED encoded index: ADC shortlist +
    exact rerank with zero train/encode work in the query — the pure
    serve cost (what a steady-state deployment pays per query batch).
    Results ≡ knn_ann_pq over the same corpus (tested). Rows-only."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return SIM.pq_ann_from_index(_pq_index(spark, sf_dir), q,
                                 _pq_codebooks(spark, sf_dir),
                                 k=5, shortlist=8)


def contamination_check(spark, sf_dir):
    """Train/test CONTAMINATION: near-dup pairs across a disjoint
    held-out split (doc_id % 20 == 0) and the training remainder —
    the eval-integrity check every LLM pipeline runs before training.
    MinHash+banding across the two corpora, exact-Jaccard verified
    (operators/dedup.py::cross_corpus_near_dup); the oracle computes
    the exact cross-corpus Jaccard join."""
    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 20 != 0)
    test = d.filter(F.col("doc_id") % 20 == 0)
    return DD.cross_corpus_near_dup(train, test, threshold=0.6) \
        .select(F.col("a_id").alias("train_id"),
                F.col("b_id").alias("test_id"), "jacc")


# Centroid artifact cache, keyed by sf_dir — the same train/serve
# split as _PQ_BOOKS (r5 verdict #2): the k-means cells are a model
# artifact a deployment trains once; re-training inside every call
# conflated model-build cost (driver-synchronized Lloyd rounds) with
# the dedup pass itself (12 s vs ~2 s at sf0.1). Training is
# deterministic, so cached centroids ≡ retraining. Cached as
# COLLECTED rows (k×dim tiny) and rebuilt against the caller's
# session per call — a cached DataFrame would pin the session that
# trained it and break after a session swap (review catch, mirrors
# _pq_codebooks exactly).
_SEM_CENTS: dict[str, list] = {}


def _sem_centroids(spark, sf_dir):
    from ..operators.similarity import train_kmeans_codebook
    if sf_dir not in _SEM_CENTS:
        e = _t(spark, sf_dir, "embeddings")
        _SEM_CENTS[sf_dir] = train_kmeans_codebook(e, k=16).collect()
    return spark.createDataFrame(
        _SEM_CENTS[sf_dir], "vec_id INT, embedding ARRAY<DOUBLE>")


def semdedup_keepers(spark, sf_dir):
    """SemDeDup (operators/similarity.py::semdedup): k-means-bounded
    semantic dedup — pairwise cosine only within each vector's top-2
    cells (IVF multiprobe applied to dedup), greedy min-id keeper;
    cells come from the per-process centroid artifact (train/serve
    split, see _SEM_CENTS). Rows-only by design (engine-trained
    centroids); the exact twin is semantic_dedup_clusters (global
    pair graph + CC, oracle-green), and pair coverage vs the global
    graph is a measured-deterministic floor in
    tests/test_operators.py. Work bound: n²·p²/k = n²/4 here; at
    corpus scale k grows with n (cells stay constant-sized) so the
    ratio keeps falling while coverage holds."""
    from ..operators.similarity import semdedup
    e = _t(spark, sf_dir, "embeddings")
    return semdedup(e, n_clusters=16, threshold=0.4, n_probes=2,
                    centroids=_sem_centroids(spark, sf_dir))


def events_user_growth(spark, sf_dir):
    """Growth accounting: per day — active users, NEW users (first
    ever seen that day) and the cumulative user base. The classic
    running-count-distinct is re-expressed exactly: first-seen day
    per user (one min-agg), new-user counts per day, cumulative sum
    over the DAY-grain table (|days| rows — the window runs on the
    aggregate, never the event stream). Pure integer arithmetic ⇒
    bit-exact; day = epoch-millis div 86400000 (timezone-proof)."""
    e = _events(spark, sf_dir)
    day = (F.expr("ts_ms div 86400000") * 86400000).alias("day_start_ms")
    active = (e.groupBy(day)
              .agg(F.countDistinct("user_id").cast("bigint")
                   .alias("n_active")))
    first = (e.groupBy("user_id")
             .agg(F.min(F.expr("ts_ms div 86400000") * 86400000)
                  .alias("day_start_ms")))
    new = (first.groupBy("day_start_ms")
           .agg(F.count("*").cast("bigint").alias("n_new")))
    w = (Window.orderBy("day_start_ms")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (active.join(new, "day_start_ms", "left")
            .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
            .withColumn("cum_users",
                        F.sum("n_new").over(w).cast("bigint"))
            .select("day_start_ms", "n_active", "n_new", "cum_users"))


def events_cohort_retention(spark, sf_dir):
    """Triangle retention matrix
    (operators/timeseries.py::cohort_retention): users cohorted by
    first-active day, retention(k) = cohort members active k days
    later / cohort size. Exact integer counts, one int/int division
    ⇒ bit-exact; day = epoch-millis div 86400000 (timezone-proof,
    the events_user_growth grain)."""
    from ..operators.timeseries import cohort_retention
    return cohort_retention(_events(spark, sf_dir))


def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    streams (operators/timeseries.py::event_transitions): consecutive
    (prev → cur) event-type counts ordered by (ts, event_id) — the
    unique id makes the order total, so counts are deterministic
    under any partitioning — row-normalized by exact-int division."""
    from ..operators.timeseries import event_transitions
    return event_transitions(_events(spark, sf_dir))


def events_cusum_changepoint(spark, sf_dir):
    """Per-event-type CUSUM change-point
    (operators/timeseries.py::cusum_changepoint): argmax_i |S_i| of
    the mean-centered cumulative sum — WHEN the value level shifted,
    complementing the TV/KS/χ² monitors' WHICH. The argmax is decided
    in exact decimal arithmetic (n·S_i = n·prefix − i·total, values
    quantized DECIMAL(27,6)) ⇒ bit-exact including the tie-break."""
    from ..operators.timeseries import cusum_changepoint
    return cusum_changepoint(_events(spark, sf_dir))


def neardup_pagerank(spark, sf_dir):
    """Fixed-point integer PageRank over the exact near-dup pair
    graph (operators/graph.py::pagerank_fixed_point) — the
    centrality signal behind rank-based canonical-document selection
    (a hub many variants copy from beats the arbitrary min-id
    keeper). The recurrence is pure BIGINT floor arithmetic
    (scale 10^12, damping 17/20, 10 iterations), so the ranks are
    bit-exact against the oracle's unrolled-CTE twin — a property
    floating-point PageRank cannot offer. Pair graph = exact 3-gram
    Jaccard ≥ 0.6 (the `ngram_jaccard_neardup` shape), both edge
    directions, so no dangling nodes exist."""
    from ..operators.graph import pagerank_fixed_point
    d = _t(spark, sf_dir, "documents")
    # materialize the pair join BEFORE mirroring: the union
    # references `pairs` twice, and without this the O(n²) jaccard
    # subtree executes twice inside the edge materialization
    # (plan-verified: 2 BNLJs, 0 ReusedExchange — review catch)
    pairs = DD.ngram_jaccard_pairs(d, threshold=0.6).localCheckpoint()
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .union(pairs.select(F.col("doc_b").alias("src"),
                                 F.col("doc_a").alias("dst"))))
    return (pagerank_fixed_point(edges, n_iters=10)
            .select(F.col("node").alias("doc_id"),
                    F.col("pr_scaled")))


def corpus_datacard(spark, sf_dir):
    """Per-source data card — the artifact published next to a
    training corpus: doc/token volume, language spread, heuristic
    quality pass-rate, exact-duplicate rate (fingerprint distinct
    ratio) and mean LM-quality score, one row per source. Pure
    composition of established exact patterns (integer counts, the
    bit-exact lm_score, decimal-cast mean) ⇒ bit-exact oracle. One
    corpus aggregate + the broadcast LM model joins — no new shapes."""
    from ..operators.lm_quality import ngram_lm_score
    d = _t(spark, sf_dir, "documents")
    # scores stay doc_id-keyed; source/lang/keep/fp attach via ONE
    # join (threading them through the scorer's extra_cols built a
    # pathological plan: 14 s warm vs 0.2 s for 500 docs — measured)
    lm = ngram_lm_score(d, vocab_size=24, min_count=2, train_pct=80)
    per_doc = lm.select("doc_id", "n_tokens", "lm_score").join(
        d.select("doc_id", "source", "lang",
                 TX.quality_flag("text").alias("keep"),
                 TX.fingerprint("text").alias("fp")), "doc_id")
    return (per_doc.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.countDistinct("lang").cast("bigint").alias("n_langs"),
                 F.sum(F.col("keep").cast("int")).cast("bigint")
                  .alias("n_quality_keep"),
                 (F.count("*") - F.countDistinct("fp")).cast("bigint")
                  .alias("n_exact_dups"),
                 (F.sum(F.col("lm_score").cast("decimal(27,6)"))
                  .cast("double") / F.count("lm_score"))
                  .alias("mean_lm_score")))


def events_vwap(spark, sf_dir):
    """Volume-weighted average price per (event_type, hour): weights
    come through the schema-on-read VARIANT path (parse_json →
    variant_get on the props payload — no schema migration when the
    payload drifts), the weighted sum is the order-independent
    decimal pattern, and the final division is one exact
    bigint-denominator divide. Composes the P3/VARIANT family with
    the exact-aggregate family."""
    e = _events(spark, sf_dir)
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    w = e.select("event_type",
                 (F.expr("ts_ms div 3600000") * 3600000)
                 .alias("hour_start_ms"),
                 F.col("value"), k.alias("k"))
    # when-guarded: a bucket can legitimately have zero total
    # quantity (93 zero-k events in the fixture) — its vwap is NULL,
    # and ANSI mode rejects the bare 0/0
    return (w.groupBy("event_type", "hour_start_ms")
            .agg(F.count("*").alias("n_events"),
                 F.sum("k").alias("sum_qty"),
                 F.when(F.sum("k") > 0,
                        F.sum((F.col("value") * F.col("k"))
                              .cast("decimal(27,6)")).cast("double")
                        / F.sum("k").cast("double")).alias("vwap")))


def events_drawdown(spark, sf_dir):
    """Per-series running-peak drawdown: peak = cumulative max over
    the deterministic (ts, event_id) order, drawdown = peak − value.
    NO accumulation anywhere — cummax and subtraction are exact, so
    the per-series maxima are bit-exact cross-engine with zero
    decimal machinery. Runs the CHUNKED path (weekly chunks → keys ×
    chunks parallelism, the per-key-window family's 100 TB shape —
    simplest instance: max is associative so the carry scan is a
    plain chunk-grain running max, bit-identical by construction;
    equality with the plain window is tested)."""
    from ..operators.timeseries import drawdown_chunked
    e = _events(spark, sf_dir)
    dd = drawdown_chunked(e, "event_type", ["ts_ms", "event_id"],
                          "value", F.expr("ts_ms div 604800000"))
    return (dd.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.max("value").alias("peak_value"),
                 F.max("dd").alias("max_drawdown")))


def jl_projection_distortion(spark, sf_dir):
    """Random-projection embedding compression QA
    (operators/similarity.py::jl_project): project 64-d embeddings to
    16-d with the deterministic Achlioptas ±1 JL transform, then
    measure pairwise squared-distance distortion over the vec_id<100
    pair set — the check run before swapping an index to compressed
    vectors. Every number is a deterministic left-fold / single-
    division expression (signs are md5-derived literals shared with
    the oracle), so the result is bit-exact cross-engine."""
    from ..operators.similarity import as_double, jl_project
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    # ONE pass: the projection carries the original vector through
    # (keep_cols) — the earlier join-back scanned embeddings twice
    # (review catch)
    base = (jl_project(e, in_dim=64, out_dim=16,
                       keep_cols=["embedding"])
            .select("vec_id", as_double("embedding").alias("v"),
                    "jl_vec"))

    def d2(x, y):
        return F.aggregate(F.zip_with(x, y, lambda a, b: (a - b) * (a - b)),
                           F.lit(0.0), lambda acc, t: acc + t)

    a = base.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va"),
                    F.col("jl_vec").alias("pa"))
    b = base.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"),
                    F.col("jl_vec").alias("pb"))
    # exact-duplicate pairs (d2 = 0) are excluded — distortion of a
    # zero distance is undefined. The division is ALSO guarded at the
    # expression level (when), not just by the row filter: ANSI mode
    # (Spark 4 default) rejects division by zero EVEN FOR DOUBLES
    # (empirically confirmed on this build: lit(0.0)/lit(0.0) raises
    # DIVIDE_BY_ZERO, not NaN), and Catalyst is free to reorder
    # filter conjuncts / push predicates into the join, where the
    # division could evaluate on a self-pair before the guard.
    pairs = (a.join(b, F.col("a_id") < F.col("b_id"))
             .select(d2(F.col("pa"), F.col("pb")).alias("d2p"),
                     d2(F.col("va"), F.col("vb")).alias("d2v"))
             .filter(F.col("d2v") > 0)
             .select(F.when(F.col("d2v") > 0,
                            F.col("d2p") / F.col("d2v")).alias("r")))
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        (F.sum(F.col("r").cast("decimal(27,6)")).cast("double")
         / F.count("*")).alias("mean_ratio"),
        F.min("r").alias("min_ratio"),
        F.max("r").alias("max_ratio"),
        F.sum(((F.col("r") >= 0.6) & (F.col("r") <= 1.4)).cast("int"))
         .cast("bigint").alias("n_within_40pct"))


def doc_lm_quality(spark, sf_dir):
    """CCNet-style n-gram LM quality scoring: a count-pruned bigram
    model trained on the deterministic 80% hash-split scores every
    document (operators/lm_quality.py::ngram_lm_score). vocab_size=24
    (< the fixture's 31 distinct tokens) so the <unk>/OOV machinery
    is live against the oracle. The headline lm_score is the log-free
    aggregated Laplace likelihood — bit-exact cross-engine; the true
    cross-entropy column (xent_bits, ln-based) is engine-only and
    verified against exact Python in tests/test_operators.py."""
    from ..operators.lm_quality import ngram_lm_score
    d = _t(spark, sf_dir, "documents")
    return ngram_lm_score(d, vocab_size=24, min_count=2, train_pct=80,
                          extra_cols=["lang"]).drop("xent_bits")


def lm_quality_bands(spark, sf_dir):
    """CCNet's second half: per-language head/middle/tail perplexity
    bands over the LM quality score (head = most in-distribution).
    Deterministic exact ntile(3) per lang on (lm_score DESC NULLS
    LAST, doc_id) — the unique tiebreak makes band assignment
    engine-exact; band stats aggregate per (lang, band). Exact ranks
    per the doc_length_buckets convention (its scan-side
    percentile_approx twin shows the 100 TB path — band CUTOFFS from
    approx quantiles, assignment by comparison, no global sort)."""
    from ..operators.lm_quality import ngram_lm_score
    d = _t(spark, sf_dir, "documents")
    scored = ngram_lm_score(d, vocab_size=24, min_count=2, train_pct=80,
                            extra_cols=["lang"]).drop("xent_bits")
    w = Window.partitionBy("lang").orderBy(
        F.col("lm_score").desc_nulls_last(), F.col("doc_id"))
    banded = scored.withColumn("b", F.ntile(3).over(w)).withColumn(
        "band", F.when(F.col("b") == 1, "head")
                 .when(F.col("b") == 2, "middle").otherwise("tail"))
    return (banded.groupBy("lang", "band")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.min("lm_score").alias("min_score"),
                 F.max("lm_score").alias("max_score")))


def dsir_importance_weights(spark, sf_dir):
    """DSIR hashed-bigram importance weights toward the lang='en'
    target distribution (operators/lm_quality.py::dsir_importance):
    per-doc mean target/raw likelihood-ratio over 512 md5-hashed
    bigram feature buckets — the data-selection signal that reshapes
    a raw corpus toward a target domain by resampling."""
    from ..operators.lm_quality import dsir_importance
    d = _t(spark, sf_dir, "documents")
    return dsir_importance(d, target_col="lang", target_value="en",
                           n_buckets=512)


def source_tv_drift(spark, sf_dir):
    """Pairwise total-variation distance between per-source token
    distributions (operators/lm_quality.py::token_tv_divergence) —
    the drift monitor between corpus snapshots/sources. Exact
    rational arithmetic on the common denominator (DECIMAL(38,0)
    cross-products, one final string-routed division) ⇒ bit-exact."""
    from ..operators.lm_quality import token_tv_divergence
    d = _t(spark, sf_dir, "documents")
    return token_tv_divergence(d, group_col="source")


def source_ks_drift(spark, sf_dir):
    """Pairwise exact two-sample Kolmogorov-Smirnov statistic over
    per-source doc-length distributions
    (operators/lm_quality.py::ks_value_drift) — the SHAPE-sensitive
    drift monitor next to source_tv_drift (TV sees token-frequency
    drift; KS sees distributional shift of a numeric property).
    Integer cross-products in DECIMAL(38,0), one string-routed final
    division ⇒ bit-exact; ks_at = smallest value attaining the max."""
    from ..operators.lm_quality import ks_value_drift
    d = _t(spark, sf_dir, "documents")
    return ks_value_drift(d, value_col="n_chars", group_col="source")


def doc_repetition_signals(spark, sf_dir):
    """Gopher-style within-document repetition quality signals
    (operators/lm_quality.py::repetition_signals; Rae et al. 2021
    Table A1): duplicate-line fraction + char fraction, most-frequent
    {2,3}-gram char coverage, and position-union char coverage of
    duplicated 3-grams (3, not Gopher's 5-10, because the synthetic
    corpus has no duplicated 5-grams — dup-3 is nonzero on 27 docs,
    so the union path is exercised by the external hash; larger n is
    pinned by hand tests) — the classic pre-training filters for
    boilerplate and degenerate repetition. Exact integer numerators
    and denominators, one int/int division per fraction ⇒ bit-exact."""
    from ..operators.lm_quality import repetition_signals
    d = _t(spark, sf_dir, "documents")
    return repetition_signals(d, top_ns=(2, 3), dup_ns=(3,))


# One-pass second-moment family (r12): covariance, correlation, and
# PCA are all pure functions of ONE d(d+1)/2-cell covariance matrix,
# so the fixture trio shares a single corpus pass per (application,
# sf_dir) — the matrix localCheckpoints (d²-sized, bounded) and the
# two readouts derive from it. At 100 TB this is the difference
# between one corpus scan and three. Keyed by applicationId so a
# fresh SparkSession (driver re-run, bare-worker contract test) never
# sees a stale checkpoint handle.
_COV_MEMO: dict = {}


def _cov_once(spark, sf_dir):
    from ..operators.similarity import embedding_covariance
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _COV_MEMO.get(key)
    if hit is None:
        hit = embedding_covariance(
            _t(spark, sf_dir, "embeddings")).localCheckpoint(eager=True)
        _COV_MEMO.clear()          # bound the cache: one live entry
        _COV_MEMO[key] = hit
    return hit


def embedding_covariance_matrix(spark, sf_dir):
    """Upper-triangle covariance of the 64-dim embedding distribution
    (operators/similarity.py::embedding_covariance) — 2080
    model-sized cells; per-row products quantized DECIMAL(27,6) and
    summed exactly, identical final IEEE expression both engines ⇒
    bit-exact. The pair products form IN-ROW (no corpus shuffle).
    Shares the one-pass family matrix (_cov_once) with the
    correlation and PCA readouts."""
    return _cov_once(spark, sf_dir)


def embedding_covariance_arrow_q(spark, sf_dir):
    """Arrow/BLAS twin of embedding_covariance_matrix
    (operators/similarity.py::embedding_covariance_arrow): one numpy
    matmul per Arrow batch, d²-row partial reduce — the measured
    fast path (sf0.1: 14.6 s exact → 3.8 s). Rows-only by design:
    float64 matmul accumulation order is hardware-defined, so it
    cannot be bit-pinned to a SQL oracle; agreement with the exact
    operator is equality-tested within the quantization headroom."""
    from ..operators.similarity import embedding_covariance_arrow
    return embedding_covariance_arrow(_t(spark, sf_dir, "embeddings"))


def embedding_correlation_matrix(spark, sf_dir):
    """Pearson correlation matrix from the bit-exact covariance
    (operators/similarity.py::embedding_correlation): scale-free
    collinearity readout. IEEE sqrt is correctly rounded both
    engines over bit-identical covariances ⇒ bit-exact. Derives from
    the one-pass family matrix (_cov_once) — no second corpus pass."""
    from ..operators.similarity import embedding_correlation
    return embedding_correlation(_t(spark, sf_dir, "embeddings"),
                                 cov=_cov_once(spark, sf_dir))


def embedding_pca_spectrum(spark, sf_dir):
    """PCA eigen-spectrum of the embedding covariance
    (operators/similarity.py::embedding_pca_variance): how many
    directions carry the variance. Distributed bit-exact covariance;
    only the 2080-cell matrix collects for the driver eigh (codebook
    contract). Rows-only by design — eigendecomposition is not
    SQL-expressible; invariants (Σλ = trace, λ ≥ −quantization floor,
    fractions telescope) are pinned in tests. Derives from the
    one-pass family matrix (_cov_once) — no third corpus pass."""
    from ..operators.similarity import embedding_pca_variance
    return embedding_pca_variance(_t(spark, sf_dir, "embeddings"),
                                  cov=_cov_once(spark, sf_dir))


def doc_quality_signals(spark, sf_dir):
    """The heuristic half of Gopher Table A1
    (operators/lm_quality.py::quality_signals), companion of
    doc_repetition_signals: word-count/mean-word-length bounds,
    symbol ratio, bullet/ellipsis line fractions, alpha-word
    fraction, required-stopword hits, and the paper's conjunctive
    keep verdict. min_stop_hits relaxed to 1 HERE because the
    synthetic vocabulary contains only 'the' of Gopher's eight
    required stopwords — at the paper's 2 the verdict is constant
    False on this fixture (the default is exercised by hand tests);
    with 1 the fixture keeps 251/500. Exact integer counts formed
    in-row (zero shuffle — a map-only pass), one int/int division
    per ratio ⇒ bit-exact."""
    from ..operators.lm_quality import quality_signals
    return quality_signals(_t(spark, sf_dir, "documents"),
                           min_stop_hits=1)


def source_chi2_drift(spark, sf_dir):
    """Pairwise two-sample chi-square homogeneity statistic over
    per-source doc-length histograms, 50-char bins
    (operators/lm_quality.py::chi2_value_drift) — the TAIL-sensitive
    drift monitor next to source_tv_drift (token frequencies) and
    source_ks_drift (CDF shape): chi-square weights per-bin deviations
    by 1/expected, so sparse-bin changes both TV and KS average away
    move it first. Integer cross-products in DECIMAL(38,0), per-bin
    terms quantized DECIMAL(27,6) and summed exactly ⇒ bit-exact."""
    from ..operators.lm_quality import chi2_value_drift
    d = _t(spark, sf_dir, "documents")
    return chi2_value_drift(d, value_col="n_chars", group_col="source",
                            bin_width=50)


def doc_bm25_topk(spark, sf_dir):
    """Okapi-BM25 top-10 docs per fixture query over the documents
    table (operators/retrieval.py::bm25_topk) — the lexical retrieval
    arm of hybrid search. Log-free BM25 surrogate (module doc: the
    idf log's argument ranked directly, the DSIR device); per-term
    scores are one IEEE division of exact DECIMAL(38,0) integer
    cross-products, decimal-cast-summed; ranks computed on the exact
    decimal, ties to the smaller doc_id."""
    from ..operators.retrieval import FIXTURE_QUERIES, bm25_topk
    d = _t(spark, sf_dir, "documents")
    return bm25_topk(d, FIXTURE_QUERIES, k=10)


_BM25_IDX: dict = {}


def _bm25_index_path(spark, sf_dir):
    """Materialize the full-vocabulary inverted index ONCE per
    (application, corpus) — same private-tempdir caching discipline
    as the PQ index (_pq_index above). Written PARTITIONED BY the
    md5 term bucket (r10) so the serve path's driver-side vocabulary
    filter becomes partition pruning — the deployment layout
    bm25_index's docstring prescribes, exercised by the benched
    fixture itself (plan-pinned:
    tests/test_plans.py::test_bm25_from_index_prunes_term_partitions)."""
    import hashlib
    import os
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BM25_IDX:
        from ..operators.retrieval import (N_TERM_BUCKETS, bm25_index,
                                           term_bkt_name)
        tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:16]
        path = os.path.join(_pq_enc_root(), tag, "bm25_postings")
        bm25_index(_t(spark, sf_dir, "documents"),
                   term_buckets=N_TERM_BUCKETS) \
            .write.mode("overwrite") \
            .partitionBy(term_bkt_name(N_TERM_BUCKETS)).parquet(path)
        _BM25_IDX[key] = path
    return _BM25_IDX[key]


def doc_pmi_collocations(spark, sf_dir):
    """Top-50 adjacent-token collocations by PMI
    (operators/lm_quality.py::pmi_collocations) — collocation
    extraction a la Church & Hanks 1990, the vocabulary-building
    signal for multi-word tokenizer merges. Log-free surrogate (the
    PMI log's argument ranked directly): one string-routed IEEE
    division of exact DECIMAL(38,0) cross-products
    (c_ab·T_uni²)/(c_a·c_b·T_bi); min_count=5 prunes the classic
    low-frequency bias; ranks tie-break on (prev, cur)."""
    from ..operators.lm_quality import pmi_collocations
    d = _t(spark, sf_dir, "documents")
    return pmi_collocations(d, min_count=5, k=50)


def doc_bm25_from_index(spark, sf_dir):
    """BM25 top-10 against the MATERIALIZED inverted index
    (operators/retrieval.py::bm25_index / bm25_from_index): zero
    tokenize/explode work per query, corpus stats derived from the
    index itself — the steady-state serve cost next to doc_bm25_topk
    the way knn_ann_pq_serve sits next to knn_ann_pq. Row-identical
    to doc_bm25_topk (shared scoring tail; same oracle)."""
    from ..operators.retrieval import FIXTURE_QUERIES, bm25_from_index
    postings = spark.read.parquet(_bm25_index_path(spark, sf_dir))
    return bm25_from_index(postings, FIXTURE_QUERIES, k=10)


def doc_ngram_novelty(spark, sf_dir):
    """Per-doc 3-gram novelty of the training split against the
    held-out reference split (doc_id % 20 == 0 — the
    contamination_check convention;
    operators/lm_quality.py::ngram_novelty): fraction of each train
    doc's DISTINCT word 3-grams absent from the reference's 3-gram
    set — the doc-level decontamination/freshness score next to the
    pair-level contamination check. Integer shingle counts, one IEEE
    division ⇒ bit-exact; reference set broadcasts (eval corpora are
    bounded by definition)."""
    from ..operators.lm_quality import ngram_novelty
    d = _t(spark, sf_dir, "documents")
    return ngram_novelty(d.filter(F.col("doc_id") % 20 != 0),
                         d.filter(F.col("doc_id") % 20 == 0), n=3)


def source_embedding_drift(spark, sf_dir):
    """Embedding-space drift monitor
    (operators/similarity.py::embedding_centroid_drift): pairwise
    centroid cosine between the embedding table's label groups — the
    representation-shift signal next to the token-space TV/KS
    monitors. Exact-decimal per-dim centroid sums (the DSIR device),
    one string-routed division per dim, deterministic left-fold
    cosine ⇒ bit-exact."""
    from ..operators.similarity import embedding_centroid_drift
    e = _t(spark, sf_dir, "embeddings")
    return embedding_centroid_drift(e, group_col="label")


def embedding_outlier_docs(spark, sf_dir):
    """Per-group embedding outliers
    (operators/similarity.py::centroid_outliers): each label group's
    top-3 farthest vectors from its exact centroid — the
    mislabel/contamination screen next to the group-grain drift
    monitor. Bit-exact centroids (decimal sums + string-routed
    division), deterministic left-fold squared distance, total-order
    rank ⇒ bit-exact oracle. One dim-exploded aggregate + a
    |groups|-row broadcast + map-side-pruned per-group top-k."""
    from ..operators.similarity import centroid_outliers
    e = _t(spark, sf_dir, "embeddings")
    return (centroid_outliers(e, "label", "embedding", "vec_id", k=3)
            .select(F.col("grp").alias("label"),
                    F.col("id").alias("vec_id"),
                    "dist_sq", "outlier_rank"))


def corpus_snapshot_diff(spark, sf_dir):
    """Between-crawls corpus diff (operators/dedup.py::snapshot_diff):
    per-source added/removed/changed/unchanged doc counts + exact
    token deltas between the fixture corpus and a deterministically
    perturbed next crawl (docs %17==3 removed, %13==1 edited,
    %23==2 re-landed under new ids) — the accounting pass an
    incremental pipeline runs before reprocessing. One full-outer
    doc_id join; BIGINT arithmetic throughout ⇒ bit-exact."""
    from ..operators.dedup import snapshot_diff
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    kept = d.filter(F.col("doc_id") % 17 != 3)
    changed = kept.withColumn(
        "text", F.when(F.col("doc_id") % 13 == 1,
                       F.concat(F.col("text"), F.lit(" updated")))
        .otherwise(F.col("text")))
    added = (d.filter(F.col("doc_id") % 23 == 2)
             .select((F.col("doc_id") + 1000000).alias("doc_id"),
                     "source",
                     F.concat(F.col("text"), F.lit(" fresh")).alias("text")))
    return snapshot_diff(d, changed.unionByName(added))


def eval_leak_spans(spark, sf_dir):
    """Span-level eval-leak localization
    (operators/dedup.py::cross_corpus_span_extents): maximal token
    spans of TRAIN docs occurring verbatim (8-token windows) in the
    held-out reference split (doc_id % 20 == 0 — the
    contamination_check convention) — decontamination's
    cut-the-passage step, localizing what ngram_novelty scores and
    contamination_check pairs. Integer gaps-and-islands ⇒
    bit-exact; reference windows broadcast."""
    from ..operators.dedup import cross_corpus_span_extents
    d = _t(spark, sf_dir, "documents")
    return cross_corpus_span_extents(
        d.filter(F.col("doc_id") % 20 != 0),
        d.filter(F.col("doc_id") % 20 == 0), w=8)


def eval_leak_scrub(spark, sf_dir):
    """ACT on the leak localization (operators/dedup.py::
    scrub_leaked_spans): rewrite every train doc (doc_id % 20 != 0)
    with its maximal leaked spans — 8-token windows occurring
    verbatim in the held-out reference split — removed. Every train
    doc passes through once: 'clean' docs keep their original text
    verbatim, 'scrubbed' docs get the token-exact survivor
    reconstruction, fully-leaked docs are 'dropped' with NULL text
    (the row is the audit record). Integer span/position algebra ⇒
    bit-exact; reference windows broadcast."""
    from ..operators.dedup import scrub_leaked_spans
    d = _t(spark, sf_dir, "documents")
    return scrub_leaked_spans(
        d.filter(F.col("doc_id") % 20 != 0),
        d.filter(F.col("doc_id") % 20 == 0), w=8)


def dup_span_scrub(spark, sf_dir):
    """Exact-substring SELF-deduplication
    (operators/dedup.py::scrub_duplicate_spans — Lee et al. 2022
    within the corpus): every duplicated maximal 8-token-window span
    is cut from all but its first (smallest doc_id, pos) occurrence;
    each doc lands once as clean (original text verbatim), scrubbed
    (token-exact survivor reconstruction) or dropped (fully
    duplicated, NULL text). Integer keep-first + islands algebra ⇒
    bit-exact."""
    from ..operators.dedup import scrub_duplicate_spans
    return scrub_duplicate_spans(_t(spark, sf_dir, "documents"), w=8)


def winnow_fingerprint_neardup(spark, sf_dir):
    """Near-dup candidate pairs over WINNOWED fingerprints
    (operators/dedup.py::winnowing_neardup_pairs — Schleimer,
    Wilkerson & Aiken 2003, the MOSS algorithm): per window of 4
    consecutive Rabin-Karp 8-gram hashes keep the minimum (ties
    rightmost), join docs sharing ≥2 selected fingerprint values.
    ~2/(w+1) of the rolling-hash postings with detection GUARANTEED
    for shared runs ≥ k+w−1 = 11 tokens — the scale upgrade of
    rolling_fingerprint_neardup. All integers ⇒ bit-exact."""
    from ..operators.dedup import winnowing_neardup_pairs
    return winnowing_neardup_pairs(
        _t(spark, sf_dir, "documents"), k=8, w=4, min_shared=2)


def crawl_delta_apply(spark, sf_dir):
    """APPLY an incremental crawl onto the corpus
    (operators/dedup.py::apply_crawl_delta): a deterministic delta —
    tombstones (%17==3, NULL text), edits (%13==1, ' updated'),
    content-identical re-lands (%19==5, leading whitespace only) and
    new docs (%23==2 under fresh ids) — upserts over the fixture
    corpus into the merged corpus with per-row op labels
    (carried/refreshed/updated/added; tombstoned docs leave). ONE
    full-outer doc_id join; fingerprint/flag algebra ⇒ bit-exact."""
    from ..operators.dedup import apply_crawl_delta
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    in_delta = ((F.col("doc_id") % 17 == 3) | (F.col("doc_id") % 13 == 1)
                | (F.col("doc_id") % 19 == 5))
    delta_text = (F.when(F.col("doc_id") % 17 == 3,
                         F.lit(None).cast("string"))
                  .when(F.col("doc_id") % 13 == 1,
                        F.concat(F.col("text"), F.lit(" updated")))
                  .otherwise(F.concat(F.lit("  "), F.col("text"))))
    changed = (d.filter(F.col("text").isNotNull() & in_delta)
               .withColumn("text", delta_text))
    added = (d.filter((F.col("doc_id") % 23 == 2)
                      & F.col("text").isNotNull())
             .select((F.col("doc_id") + 1000000).alias("doc_id"),
                     "source",
                     F.concat(F.col("text"), F.lit(" fresh")).alias("text")))
    return apply_crawl_delta(d, changed.unionByName(added))


def snapshot_change_magnitude(spark, sf_dir):
    """HOW MUCH each changed doc changed between crawls
    (operators/dedup.py::snapshot_change_profile): distinct-token
    Jaccard old-vs-new for the snapshot_diff 'changed' class (same
    deterministic perturbation) — jacc≈1 touch-ups vs jacc≈0
    rewrites decide re-embed/re-score vs metadata-only relanding.
    Integer set sizes, one IEEE division ⇒ bit-exact."""
    from ..operators.dedup import snapshot_change_profile
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    kept = d.filter(F.col("doc_id") % 17 != 3)
    changed = kept.withColumn(
        "text", F.when(F.col("doc_id") % 13 == 1,
                       F.concat(F.col("text"), F.lit(" updated")))
        .otherwise(F.col("text")))
    return snapshot_change_profile(d, changed)


def corpus_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth curve over nested md5-bucket
    subsamples (operators/lm_quality.py::vocab_growth_curve):
    (sample_pct, n_docs, n_tokens, n_vocab, ttr) at 10%..100% — does
    the corpus keep yielding new vocabulary as it grows? A literal
    prefix curve needs a global doc rank (one-task sort at scale);
    the nested-uniform-subsample estimator serves every step from ONE
    term→min-bucket aggregate. Exact integers, one IEEE division for
    ttr ⇒ bit-exact."""
    from ..operators.lm_quality import vocab_growth_curve
    return vocab_growth_curve(_t(spark, sf_dir, "documents"), steps=10)


def source_mix_weights(spark, sf_dir):
    """α=½ temperature-scaled sampling weights per source
    (operators/training.py::source_temperature_weights) — the
    multilingual/multi-source pretraining mix next to corpus_mix's
    uniform-target weights. sqrt is the one sub-linear exponent that
    is IEEE-correctly-rounded, and normalization is by the largest
    group (max, not a fold-order-dependent float sum) ⇒ every output
    double is a fixed tree of correctly-rounded ops over exact BIGINT
    aggregates — bit-exact cross-engine."""
    from ..operators.training import source_temperature_weights
    return source_temperature_weights(
        _t(spark, sf_dir, "documents"), group_col="source")


def hybrid_rrf_ann(spark, sf_dir):
    """The DEPLOYMENT-scale twin of hybrid_rrf_retrieval: the dense
    arm runs IVF-cell ANN (probe 2 of 16 cells) instead of exact
    brute-force cosine, so the corpus is scored only within probed
    cells — the arm a 100 TB hybrid search actually ships. Rows-only
    (cell assignment is engine-side, like the other ANN tiers);
    fused-top-10 overlap vs the exact hybrid is asserted in
    tests/test_retrieval.py."""
    from ..operators import similarity as SIM
    from ..operators.retrieval import jaccard_ranks, rrf_fuse
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    sparse = jaccard_ranks(d, [0, 1, 2], arm_k=20)
    q = e.filter(F.col("vec_id") < 3)
    dense = SIM.ivf_ann(e, q, k=20).select(
        "q_id", F.col("n_id").alias("doc_id"), "rn")
    return rrf_fuse(sparse, dense, k=10)


def hybrid_rrf_retrieval(spark, sf_dir):
    """Hybrid doc-to-doc retrieval for query docs 0-2 (doc_id ≡
    vec_id): token-set-Jaccard sparse arm + embedding-cosine dense
    arm (top-20 each), fused by reciprocal-rank fusion
    (Σ 1/(60+rank), Cormack et al. 2009;
    operators/retrieval.py::rrf_fuse). Fusion sums exact
    DECIMAL(27,6) contributions; the fused rank is computed on the
    exact decimal, ties to the smaller doc_id."""
    from ..operators import similarity as SIM
    from ..operators.retrieval import jaccard_ranks, rrf_fuse
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    sparse = jaccard_ranks(d, [0, 1, 2], arm_k=20)
    q = e.filter(F.col("vec_id") < 3)
    dense = SIM.knn_bruteforce(e, q, k=20).select(
        "q_id", F.col("n_id").alias("doc_id"), "rn")
    return rrf_fuse(sparse, dense, k=10)


def events_cusum_bucketed(spark, sf_dir):
    """Bucket-grain CUSUM change-point per event type
    (operators/timeseries.py::cusum_bucket_stats +
    cusum_from_bucket_stats, hourly buckets): the STREAMABLE form of
    events_cusum_changepoint — the per-(key, bucket) count/decimal-sum
    sufficient statistics are additive, so the identical transform
    runs as a complete-mode streaming aggregation
    (streaming/sketches.py::streaming_cusum_stats; batch↔streaming
    bit-agreement tested) and the change point finishes from the sink
    under the documented bucket-resolution contract. Exact decimal
    argmax ⇒ bit-exact. Scale: the heavy exchange is the tiny
    bucket-grain aggregate (map-side collapse); the windows run over
    |keys|·|buckets| rows only."""
    from ..operators.timeseries import (cusum_bucket_stats,
                                        cusum_from_bucket_stats)
    e = _events(spark, sf_dir)
    return cusum_from_bucket_stats(
        cusum_bucket_stats(e, "event_type", "ts_ms", "value",
                           bucket_ms=3_600_000))


def image_dhash_neardup(spark, sf_dir):
    """Perceptual image near-dup (dHash, Krawetz 2013) — the image leg
    of the dedup family, closing the modality the r11 verdict flagged
    (text ✓, embedding ✓, image ✗): re-encoded / resized /
    brightness-shifted copies of one image are DISTINCT to every
    byte/text/embedding dedup path but hash within a few bits here.

    Fixture (testdata ships no image blobs): real 9×8 grayscale PNGs
    whose pixels derive from sha256(text) nibbles, plus a 2× upscaled
    variant (doc_id%3==0) and a +16-brightness variant (doc_id%5==0) —
    operators/multimodal.py::synthetic_doc_images documents why the
    dHash is bit-invariant to both edits. This side EARNS each hash
    end-to-end (PNG encode → from-scratch decode → box downsample →
    gradient bits → pigeonhole Hamming join); the DuckDB oracle
    derives the same 64 bits directly from nibble comparisons and
    self-joins on bit_count(xor) ≤ 2. All-integer ⇒ bit-exact.

    Scale shape: pixels are touched exactly once per image (two narrow
    Arrow kernels back-to-back); the join is the SimHash pigeonhole
    block equi-join (operators/dedup.py::hamming_pairs — complete for
    Hamming ≤ 3, never an all-pairs scan), shuffling four 16-bit block
    keys per image, so 100 TB of images costs one decode pass + an
    images×4 equi-join."""
    from ..operators import multimodal as MM
    d = _t(spark, sf_dir, "documents")
    imgs = MM.synthetic_doc_images(d, "doc_id", "text")
    pairs = MM.image_neardup_pairs(imgs, "content", "img_id",
                                   max_hamming=2, num_blocks=4)
    return pairs.select(F.col("id_a").alias("img_a"),
                        F.col("id_b").alias("img_b"),
                        F.col("hamming").cast("bigint").alias("hamming"))


def orders_dq_profile(spark, sf_dir):
    """ANALYZE-style per-column data-quality profile of a table —
    the completeness/cardinality pass every warehouse engine exposes
    and every ingest pipeline runs before trusting a new snapshot:
    for each column of orders, exact row/null/distinct counts →
    (column_name, n_rows, n_null, n_distinct). All exact BIGINTs ⇒
    bit-exact. Scale: ONE scan feeds every per-column aggregate
    (Spark plans the multi-distinct as a single Expand pass —
    map-side partial per column); swap exact distinct for HLL
    (approx_distinct_sketch machinery) when cardinality itself is
    huge."""
    o = _t(spark, sf_dir, "orders")
    cols = o.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"dist_{c}"))
    row = o.agg(*aggs)
    stack = ", ".join(f"'{c}', null_{c}, dist_{c}" for c in cols)
    return (row.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) AS (column_name, n_null, n_distinct)")
        .select("column_name", F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("n_null").cast("bigint").alias("n_null"),
                F.col("n_distinct").cast("bigint").alias("n_distinct")))


def orders_dq_profile_approx(spark, sf_dir):
    """Sketch-based twin of orders_dq_profile — the HLL swap that
    profile documents for corpus-scale cardinalities (r12 verdict #4):
    row/null counts stay exact (cheap map-side sums), per-column
    distinct counts come from Datasketches HLL (lgK=12, mergeable
    per-partition sketches), all in ONE plain aggregate scan — no
    Expand, no per-value dedup shuffle: the exact form's
    count_distinct must move every distinct value through the
    exchange, this form moves one 2^12-bucket sketch per column per
    partition regardless of cardinality. Values sketch through a
    canonical string cast (injective for orders' int/decimal/date/
    string columns, so true cardinality is preserved). Rows-only BY
    DESIGN (DuckDB's approx_count_distinct is a different sketch —
    the token_heavy_hitters_sketch/distinct_rollup_hll precedent);
    accuracy is pinned against the exact in-window profile by
    tests/test_operators.py::test_dq_profile_approx_accuracy
    (HLL lgK=12 standard error ≈1.6%; contract ≤5% per column)."""
    o = _t(spark, sf_dir, "orders")
    cols = o.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"null_{c}"))
        aggs.append(F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(c).cast("string"), 12))
            .alias(f"dist_{c}"))
    row = o.agg(*aggs)
    stack = ", ".join(f"'{c}', null_{c}, dist_{c}" for c in cols)
    return (row.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) AS "
        "(column_name, n_null, approx_distinct)")
        .select("column_name",
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("n_null").cast("bigint").alias("n_null"),
                F.col("approx_distinct").cast("bigint")
                .alias("approx_distinct")))


def source_quality_floor(spark, sf_dir):
    """Per-source quality-floor curation
    (operators/training.py::quality_floor_summary): each source drops
    its own bottom token-count quartile — the floor is the value at
    exact ascending rank ⌈n/4⌉, no float quantile — and reports
    (source, n_docs, threshold, n_kept, kept_sum). The per-source cut
    a C4/Gopher-style mix applies before sampling, complementing the
    global-grid doc_length_buckets and the per-source caps. Integer
    ranks + tie-independent threshold values ⇒ bit-exact oracle.
    Scale: one keyed window pass + a |sources|-row broadcast; the
    approx-boundary swap (equi_depth_boundaries) is the documented
    100 TB upgrade for monster groups."""
    from ..functions.text import token_count
    from ..operators.training import quality_floor_summary
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("source", "doc_id",
                 token_count("text").cast("bigint").alias("n_tok")))
    return quality_floor_summary(d, "source", "n_tok")


def source_quality_floor_approx(spark, sf_dir):
    """Sketch-based twin of source_quality_floor — the monster-group
    swap its exact form documents (operators/training.py::
    quality_floor_summary_approx): per-source floors via the
    percentile_approx GK aggregate (mergeable, map-side partials), so
    the summary is two plain aggregates + a |sources|-row broadcast —
    no keyed sort window, no group serializing its rank through one
    task. Rows-only BY DESIGN (the sketch is engine-internal; the
    exact in-window source_quality_floor is the oracle-checkable
    ground truth); accuracy pinned by
    tests/test_operators.py::test_quality_floor_approx_accuracy."""
    from ..functions.text import token_count
    from ..operators.training import quality_floor_summary_approx
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("source", "doc_id",
                 token_count("text").cast("bigint").alias("n_tok")))
    return quality_floor_summary_approx(d, "source", "n_tok")


def interval_overlap_shipments(spark, sf_dir):
    """INTERVAL × INTERVAL overlap join
    (operators/timeseries.py::interval_overlap_join — the two-sided
    sibling of the in-window point-in-range join): every shipment
    transit interval [shipdate, shipdate + 1 + quantity days] of a
    part-sampled lineitem slice (testdata's lineitem carries no
    receiptdate — transit length derives deterministically from the
    integral quantity) × every 30-day urgent-order window opening in
    1995, with the exact closed-interval overlap in days. Dates
    reduce to epoch-day integers on both engines ⇒ bit-exact.

    Scale: the naive form is a cartesian theta join (the classic
    Spark interval-join trap — the oracle runs it as ground truth);
    the engine bucketizes both sides onto a 32-day grid and
    equi-joins on the cell, so candidates are co-located cells, never
    |A|·|B| (plan-pinned: no cartesian/nested-loop)."""
    from ..operators.timeseries import interval_overlap_join
    day0 = F.lit("1970-01-01").cast("date")
    a = (_t(spark, sf_dir, "lineitem")
         .filter(F.col("l_partkey") % 97 == 0)
         .select("l_orderkey", "l_linenumber",
                 F.datediff(F.col("l_shipdate").cast("date"), day0)
                 .alias("a_s"),
                 (F.datediff(F.col("l_shipdate").cast("date"), day0)
                  + 1 + F.col("l_quantity").cast("int"))
                 .alias("a_e")))
    b = (_t(spark, sf_dir, "orders")
         .filter((F.col("o_orderpriority") == "1-URGENT")
                 & (F.year("o_orderdate") == 1995))
         .select(F.col("o_orderkey").alias("promo_orderkey"),
                 F.datediff(F.col("o_orderdate").cast("date"), day0)
                 .alias("b_s")))
    b = b.withColumn("b_e", F.col("b_s") + 30)
    out = interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e",
                                bucket=32,
                                a_keys=["l_orderkey", "l_linenumber"],
                                b_keys=["promo_orderkey"])
    return out.select("l_orderkey", "l_linenumber", "promo_orderkey",
                      F.col("overlap").cast("bigint")
                      .alias("overlap_days"))


def neardup_triangle_stats(spark, sf_dir):
    """Triangle participation + local clustering coefficient over the
    exact near-dup pair graph (operators/graph.py::triangle_counts —
    Suri & Vassilvitskii 2011 edge-orientation counting): separates
    densely-interlinked template/boilerplate families (triangles,
    clustering → 1) from chains of marginal pairs (clustering 0) —
    the graph-cohesion readout next to CC keepers and PageRank.
    Exact BIGINT counts; the coefficient is one fixed double tree ⇒
    bit-exact oracle (same wedge-close joins in SQL over the exact
    _JACCARD_PAIRS ground truth). The engine side feeds the
    PRODUCTION pair graph — banded MinHash with exact-Jaccard
    verification (precision 1; banded recall is exactly 1 on this
    fixture, the same engine↔oracle pairing dedup_cluster_keepers
    has held green since r1 — an 18.9 s exact O(n²) pair scan
    measured at sf0.1 dropped to ~4 s). Counting itself is two
    equi-joins + map-side aggregates; degree-orientation upgrade
    documented in the operator."""
    from ..operators.graph import triangle_counts
    d = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_near_dup_pairs(d, threshold=0.6)
    return (triangle_counts(pairs)
            .select(F.col("id").alias("doc_id"), "degree",
                    "n_triangles", "clustering"))


def events_rfm_segments(spark, sf_dir):
    """RFM segmentation (Hughes 1994, the classic event-analytics
    user scoring): per user — recency (days since last activity,
    against the corpus max day), frequency (event count), monetary
    (exact-decimal value sum) — each quintile-scored 1..5 (5 = most
    recent / most frequent / highest value) and combined into the
    3-digit segment code. → (user_id, recency_days, frequency,
    monetary, r_score, f_score, m_score, segment), aggregated to one
    row per segment (segment, n_users, sum_monetary) so the output is
    segment-table-sized.

    Determinism: every ntile orders by (metric, user_id) — a total
    order, and NTILE's equal-bucket-with-remainder-first rule is
    identical in Spark and DuckDB ⇒ bit-exact. Monetary ranks on the
    exact DECIMAL (a double sum is fold-order-dependent).

    Scale note: the per-user aggregate is one shuffle with map-side
    combine; the GLOBAL ntile serializes |users| rows through one
    task — at 100 TB swap exact ntile for approx-quantile boundaries
    + scan-side assignment (the doc_length_buckets posture); this
    exact form is that path's oracle-checkable ground truth.
    Streaming twin: the per-user sufficient statistics (max day /
    count / decimal sum — all mergeable) stream as
    streaming/sketches.py::streaming_rfm_stats; the shared
    rfm_segments_from_stats finisher makes the readouts bit-identical
    (tested)."""
    from ..operators.timeseries import (rfm_segments_from_stats,
                                        rfm_user_stats)
    e = _events(spark, sf_dir)
    return rfm_segments_from_stats(rfm_user_stats(e))


def image_dedup_keepers(spark, sf_dir):
    """Canonical-keeper selection over the PERCEPTUAL image pair graph
    — the step a media dedup pipeline runs after image_dhash_neardup:
    Hamming similarity is not transitive, so variant pairs merge into
    keep-groups via connected components (operators/dedup.py::
    neardup_clusters — min-label propagation / alternating star, the
    dedup_cluster_keepers machinery over perceptual edges) and each
    cluster reports its lexicographically-smallest keeper id + member
    count. Oracle: the SAME recursive-CTE reachability fixpoint over
    the nibble-derived dHash pairs. Cluster labels are MIN over STRING
    ids — binary (byte-wise) comparison on both engines ⇒ bit-exact.
    Scale: everything after the (already-linear) pair join is the CC
    engine's per-round two equi-joins + partial-min — the 100 TB CC
    recipe shared with the text path."""
    from ..operators import multimodal as MM
    from ..operators.dedup import neardup_clusters
    d = _t(spark, sf_dir, "documents")
    imgs = MM.synthetic_doc_images(d, "doc_id", "text")
    pairs = (MM.image_neardup_pairs(imgs, "content", "img_id",
                                    max_hamming=2, num_blocks=4)
             .select(F.col("id_a").alias("doc_a"),
                     F.col("id_b").alias("doc_b")))
    clusters = neardup_clusters(pairs)
    return (clusters.groupBy("cluster_id")
            .agg(F.count("*").alias("n_members"))
            .select(F.col("cluster_id").alias("keeper_id"),
                    F.col("n_members").cast("bigint").alias("n_members")))


def video_frame_neardup(spark, sf_dir):
    """Perceptual VIDEO near-dup — the third perceptual modality next
    to image_dhash_neardup and audio_afp_neardup: clips pair when ≥3
    of their sampled frames dHash identically (the shared-fingerprint
    posting join — the winnowing shape over per-frame hashes), which
    catches frame-subsampled and re-encoded copies byte dedup can't
    see. Fixture: deterministic 6-frame 9×8 grayscale animated GIFs
    per doc (frame-j pixels from sha256(text‖':fj') nibbles) with an
    every-2nd-frame subsample (doc_id%3==0, shares exactly 3 hashes)
    and a rotated-palette re-encode (doc_id%5==0, identical pixels,
    different bytes, shares all 6). The engine EARNS every frame hash
    through REAL LZW encode → decode
    (operators/multimodal.py::synthetic_doc_videos /
    video_frame_signatures); the DuckDB oracle derives the same
    per-frame 64-bit values from nibble comparisons and counts shared
    hashes. All-integer ⇒ bit-exact. Scale: pixels touched once; the
    pair join is an equi-join over DISTINCT (clip, hash) postings."""
    from ..operators import multimodal as MM
    d = _t(spark, sf_dir, "documents")
    vids = MM.synthetic_doc_videos(d, "doc_id", "text")
    pairs = MM.video_neardup_pairs(vids, "content", "vid_id",
                                   every_nth=1, min_shared=3)
    return pairs.select(F.col("id_a").alias("vid_a"),
                        F.col("id_b").alias("vid_b"),
                        F.col("n_shared").cast("bigint")
                        .alias("n_shared"))


def audio_afp_neardup(spark, sf_dir):
    """Perceptual AUDIO near-dup — the audio leg of the perceptual
    dedup family next to image_dhash_neardup: spectral-band-gradient
    fingerprints (functions/afp_minimal.py, after Haitsma & Kalker
    2002) over real WAV decode, paired by the shared pigeonhole
    Hamming join. Fixture: deterministic sha256-seeded tone+noise
    clips per doc with gain-halved (doc_id%3==0) and 24-bit-repacked
    (doc_id%5==0) variants — different bytes, same perceptual content
    (operators/multimodal.py::synthetic_doc_audio). Rows-only BY
    DESIGN (FFT is not SQL-expressible — the simhash_neardup/knn_ann
    precedent); correctness pinned by invariance/discrimination unit
    tests and the e2e variant-recall test instead. Scale shape
    identical to the image leg: one Arrow decode pass, narrow
    fingerprint sidecar, 4-block equi-join."""
    from ..operators import multimodal as MM
    d = _t(spark, sf_dir, "documents")
    clips = MM.synthetic_doc_audio(d, "doc_id", "text")
    pairs = MM.audio_neardup_pairs(clips, "content", "audio_id",
                                   max_hamming=3, num_blocks=4)
    return pairs.select(F.col("id_a").alias("audio_a"),
                        F.col("id_b").alias("audio_b"),
                        F.col("hamming").cast("bigint").alias("hamming"))


def orders_benford_test(spark, sf_dir):
    """Benford first-digit conformance test over order totals — the
    distributional data-quality/fraud screen (Benford 1938; Nigrini
    1996 popularized the audit use): naturally-occurring amounts
    follow P(d) = log10(1+1/d), and a synthetic or manipulated feed
    shows up as per-digit χ² excess. Per first significant digit →
    (digit, n_obs, expected_p, observed_p, chi2_term); the drift
    monitor family's conformance sibling (χ²/KS/TV test against data,
    this tests against a LAW). Machinery shared with the streaming
    twin (operators/lm_quality.py::benford_digit_counts — additive
    counts — + benford_from_counts; the bucket-CUSUM factoring).

    Determinism: the first digit comes from floor(price) — double
    floor is exact IEEE and DuckDB's double→int CAST rounds
    half-to-even while Spark truncates, so both engines cast the
    already-integral floor. The total derives from a window sum over
    the ≤9-row count table (no second corpus pass); n/total division
    of exact ints and the χ² tree over repr-embedded Benford literals
    are the same fixed IEEE ops on both sides ⇒ bit-exact. Scale:
    ONE scan, 9-group map-side-collapsing aggregate — nothing else."""
    from ..operators.lm_quality import (benford_digit_counts,
                                        benford_from_counts)
    return benford_from_counts(
        benford_digit_counts(_t(spark, sf_dir, "orders"),
                             "o_totalprice"))


def events_session_funnel_paths(spark, sf_dir):
    """Session path mining — the top-20 most common 3-step opening
    event paths: sessionize by (user, >30 min gap), take each
    session's first three event types in (ts, event_id) order, count
    sessions per 'a>b>c' path. The discovery-mode sibling of the
    fixed-funnel events_funnel_conversion (which paths DO users take,
    not how many complete a given one). All strings + exact counts;
    top-20 ordered by (n_sessions DESC, path ASC) — a total order ⇒
    bit-exact oracle.

    Scale: two keyed window passes over the same (user, ts) sort
    (session boundaries, then per-session row numbers — one exchange,
    Spark reuses the sort), a per-session 3-row pivot aggregate, a
    path-grain count with map-side partials, and a global top-20
    TakeOrdered — no corpus-sized sort."""
    e = _events(spark, sf_dir)
    w_user = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w_user)
    e2 = e.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1_800_000), 1)
        .otherwise(0))
    e3 = e2.withColumn(
        "sess", F.sum("new_s").over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)))
    w_sess = (Window.partitionBy("user_id", "sess")
              .orderBy("ts_ms", "event_id"))
    e4 = (e3.withColumn("rn", F.row_number().over(w_sess))
          .filter(F.col("rn") <= 3))
    paths = (e4.groupBy("user_id", "sess")
             .agg(F.concat_ws(
                 ">",
                 F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
                 F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
                 F.max(F.when(F.col("rn") == 3, F.col("event_type"))))
                 .alias("path")))
    return (paths.groupBy("path")
            .agg(F.count("*").alias("n_sessions"))
            .orderBy(F.col("n_sessions").desc(), F.col("path"))
            .limit(20)
            .select("path",
                    F.col("n_sessions").cast("bigint")
                    .alias("n_sessions")))


def source_gini_concentration(spark, sf_dir):
    """Per-source Gini concentration of document length — the
    inequality readout a corpus curator runs next to the mix weights
    and caps: a source whose token mass concentrates in a few giant
    documents (G→1) needs per-doc caps where an even source (G→0)
    needs only per-source ones. G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    ascending-ranked lengths (the exact rank form of the standard
    estimator, Glasser 1962) → (source, n_docs, total_chars, gini).

    Determinism: ranks are row_number over (n_chars, doc_id) — a
    total order; Σ(i·xᵢ) and Σx are exact BIGINTs; the finisher is
    one fixed IEEE tree over those ints ⇒ bit-exact. Scale: one
    keyed window pass (rank within source) + one map-side-collapsing
    aggregate; a |sources|-row result."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("n_chars").isNotNull())
         .select("source", "doc_id", "n_chars"))
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = d.withColumn("rk", F.row_number().over(w))
    agg = (r.groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.sum(F.col("rk").cast("long") * F.col("n_chars"))
                .alias("rank_mass")))
    n = F.col("n_docs").cast("double")
    gini = (F.lit(2.0) * F.col("rank_mass").cast("double")
            / (n * F.col("total_chars").cast("double"))
            - (n + F.lit(1.0)) / n)
    # expression-level zero guard (ANSI divide errors even for
    # doubles, and Catalyst may evaluate the division before a row
    # filter): an all-empty source reports NULL, mirrored in the
    # oracle's CASE so degenerate data stays cross-engine-identical
    gini = F.when(F.col("total_chars") > 0, gini)
    return agg.select(
        "source", F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
        gini.alias("gini"))


def events_type_cooccurrence_lift(spark, sf_dir):
    """User-grain market-basket co-occurrence (Agrawal & Srikant 1994
    support/lift, at the user level): for every unordered pair of
    event types, how many users do BOTH, with support n_both/n_users
    and lift = support(a,b)/(support(a)·support(b)) — lift > 1 marks
    behaviors that travel together, the unordered complement of the
    ordered events_session_funnel_paths and the fixed-funnel
    conversion. → (type_a, type_b, n_both, n_a, n_b, support, lift).

    Determinism: all counts are exact BIGINTs over DISTINCT
    (user, type); support and lift are one fixed IEEE tree over those
    ints (lift computed as (n_both·n_users)/(n_a·n_b) — two products
    and one division, no intermediate support rounding) ⇒ bit-exact.
    Scale: ONE distinct shuffle on (user, type); the pair self-join
    is equi on user_id with per-user fanout bounded by |types|²
    (types is a small vocabulary); every aggregate collapses
    map-side; per-type counts broadcast back onto the pair table."""
    # readout machinery SHARED with the streaming user-type state
    # twin (operators/timeseries.py::cooccurrence_lift_from_user_types
    # — the retention_from_user_days factoring); the n_users
    # denominator inside it is a LAZY broadcast scalar row, so the
    # query stays a pure transform (the r14 fix for the eager
    # plan-build-time count the r13 advice flagged)
    from ..operators.timeseries import cooccurrence_lift_from_user_types
    ut = (_events(spark, sf_dir)
          .select(F.col("user_id").alias("u"),
                  F.col("event_type").alias("t"))
          .distinct()
          .localCheckpoint(eager=True))  # feeds 3 aggregates + a join
    return cooccurrence_lift_from_user_types(ut)


def docs_lang_source_independence(spark, sf_dir):
    """χ² test of INDEPENDENCE over the lang × source contingency
    table (Pearson 1900) — the third member of the χ² family next to
    the two-sample homogeneity drift monitor and the Benford law
    conformance test: is language composition independent of source?
    Per cell → (lang, source, n_obs, expected, chi2_term); summing
    chi2_term gives the statistic at (|langs|−1)(|sources|−1) dof.

    Determinism: observed counts are exact BIGINTs; expected =
    row_total·col_total/n and the χ² term are one fixed IEEE tree
    over those ints ⇒ bit-exact. Scale: ONE corpus exchange (the
    cell groupBy with map-side partials); row/column/grand totals are
    window sums over the |langs|·|sources|-row cell table — nothing
    corpus-sized past the first aggregate. Machinery shared with the
    streaming twin (operators/lm_quality.py::contingency_counts —
    additive cells — + independence_from_counts; the Benford
    factoring)."""
    from ..operators.lm_quality import (contingency_counts,
                                        independence_from_counts)
    d = _t(spark, sf_dir, "documents")
    return (independence_from_counts(
        contingency_counts(d, "lang", "source"))
        .select(F.col("row_key").alias("lang"),
                F.col("col_key").alias("source"),
                "n_obs", "expected", "chi2_term"))


def events_rolling_active_users(spark, sf_dir):
    """Rolling 7-day distinct active users per day — the classic
    WAU-style sliding-window COUNT DISTINCT no window frame can
    express (DISTINCT isn't frameable in Spark OR DuckDB): for every
    day with activity, how many distinct users were active in the
    trailing 7-day window [d−6, d]. → (day_num, n_active_users,
    n_events_day). The engagement readout next to cohort retention
    (fixed cohorts) and user growth (cumulative firsts).

    Shape — the grid-explode device shared with the interval join:
    distinct (user, day) rows explode into the ≤7 trailing days they
    CONTRIBUTE to, a second distinct collapses multi-active users per
    contributed day, and one count per day finishes — three keyed
    exchanges over |users|·|active days|·7 narrow rows, never a
    per-day rescan of the corpus (the naive form joins the event
    table once per day) and never a serialized global window. Days
    with zero activity produce no row (inner join back to observed
    days). All exact integer day arithmetic + BIGINT counts ⇒
    bit-exact oracle."""
    # readout machinery SHARED with the streaming user-days state
    # (operators/timeseries.py::rolling_active_users_from_user_days
    # finishes from the same (u, d, n_events) table that
    # streaming_user_days maintains complete-mode — the
    # retention_from_user_days factoring, r13 verdict #3)
    from ..operators.timeseries import rolling_active_users_from_user_days
    ud_counts = (_events(spark, sf_dir)
                 .select(F.col("user_id").alias("u"),
                         F.expr("ts_ms div 86400000").alias("d"))
                 .groupBy("u", "d").agg(F.count("*").alias("n_events")))
    return rolling_active_users_from_user_days(ud_counts)


def part_brand_price_anova(spark, sf_dir):
    """One-way ANOVA of retail price across part brands (Fisher
    1925): decompose price variance into between-brand and
    within-brand sums of squares and report the F statistic — the
    classic "does this categorical factor explain the metric" test,
    completing the statistics family next to correlation/regression
    moments, the χ² pair, and Benford. → ONE row
    (k_groups, n_rows, ss_between, ss_within, f_stat).

    Determinism: per-group n/Σx/Σx² are exact decimals (the DSIR
    single-rounding device for x² terms); group means and the grand
    mean are string-routed divisions; each group's SSB/SSW double
    term is quantized to DECIMAL(27,6) before the cross-group sum so
    the k-term reduction is order-independent (a raw double sum over
    groups would be fold-order-dependent); the F finisher is one
    fixed IEEE tree ⇒ bit-exact cross-engine. Scale: ONE scan with a
    map-side-collapsing per-group aggregate, then |groups|-row
    arithmetic — nothing corpus-sized past the first exchange."""
    from ..operators.lm_quality import (anova_from_group_moments,
                                        anova_group_moments)
    p = _t(spark, sf_dir, "part")
    return anova_from_group_moments(
        anova_group_moments(p, "p_brand", "p_retailprice"))


def fk_orphan_audit(spark, sf_dir):
    """Referential-integrity audit over the warehouse's FK edges —
    the relational completion of the per-column DQ profile: for each
    child→parent foreign key, how many child rows, how many carry a
    non-NULL key, how many are ORPHANS (non-NULL key with no parent
    row), and the orphan rate. → one row per edge (fk_edge, n_child,
    n_nonnull, n_orphans, orphan_rate) — the first thing a pipeline
    owner checks after an ingest incident, and the join-safety
    precondition every downstream query silently assumes.

    Determinism: counts are exact BIGINTs; the rate is one int/int
    IEEE division behind an expression-level zero guard (mirrored
    CASE in the oracle) ⇒ bit-exact. Scale: each edge is ONE
    co-partitioned LEFT ANTI join on the key (parent side
    deduplicated first with map-side partials; small parents —
    nation, supplier — broadcast under AQE) plus map-side-collapsing
    count aggregates; the result is |edges| rows. No edge ever
    materializes the join payload — keys only."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    pt = _t(spark, sf_dir, "part")
    sp = _t(spark, sf_dir, "supplier")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")

    def edge(child, fk, parent, pk, name):
        c = child.select(F.col(fk).alias("k"))
        p = parent.select(F.col(pk).alias("k")).distinct()
        tot = c.agg(F.count("*").alias("n_child"),
                    F.count("k").alias("n_nonnull"))
        orph = (c.filter(F.col("k").isNotNull())
                .join(p, "k", "left_anti")
                .agg(F.count("*").alias("n_orphans")))
        rate = (F.col("n_orphans").cast("double")
                / F.col("n_nonnull").cast("double"))
        return (tot.crossJoin(orph)
                .select(F.lit(name).alias("fk_edge"),
                        F.col("n_child").cast("bigint").alias("n_child"),
                        F.col("n_nonnull").cast("bigint")
                        .alias("n_nonnull"),
                        F.col("n_orphans").cast("bigint")
                        .alias("n_orphans"),
                        F.when(F.col("n_nonnull") > 0, rate)
                        .alias("orphan_rate")))

    edges = [
        edge(li, "l_orderkey", od, "o_orderkey", "lineitem->orders"),
        edge(li, "l_partkey", pt, "p_partkey", "lineitem->part"),
        edge(li, "l_suppkey", sp, "s_suppkey", "lineitem->supplier"),
        edge(od, "o_custkey", cu, "c_custkey", "orders->customer"),
        edge(cu, "c_nationkey", na, "n_nationkey", "customer->nation"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out


def orders_price_skew_kurtosis(spark, sf_dir):
    """Distribution SHAPE per order status: skewness (Fisher g1) and
    excess kurtosis (g2) of order totals — the third/fourth-moment
    completion of the exact-moments stats family (mean/variance/
    correlation stop at the second moment; drift monitors compare
    histograms; this quantifies asymmetry and tail weight directly).
    → (o_orderstatus, n_rows, mean, m2_variance, skewness,
    kurtosis_excess).

    Determinism: per-group raw power sums are exact decimals with the
    per-term single-rounding device (the power chain ((x·x)·x)·x is
    the identical left-associated IEEE tree on both engines); the
    raw→central identities and the g1/g2 finishers are one fixed IEEE
    tree over string-routed decimals ⇒ bit-exact. Scale: ONE scan
    with a map-side-collapsing per-group aggregate, then |groups|-row
    arithmetic; the (n, Σx..Σx⁴) state is additive ⇒ streams
    complete-mode (streaming_skew_moments — the anova factoring)."""
    from ..operators.lm_quality import (raw_moments4,
                                        skew_kurtosis_from_moments)
    o = _t(spark, sf_dir, "orders")
    return (skew_kurtosis_from_moments(
        raw_moments4(o, "o_orderstatus", "o_totalprice"))
        .select(F.col("g").alias("o_orderstatus"), "n_rows", "mean",
                "m2_variance", "skewness", "kurtosis_excess"))


def events_user_growth_accounting(spark, sf_dir):
    """Growth accounting — per day, decompose the active-user base
    into NEW / RETAINED / RESURRECTED and report the churn count
    implied by yesterday's actives (the standard DAU growth-
    accounting identity): the FLOW view of engagement next to the
    stock views (cohort retention = fixed-cohort decay, rolling
    actives = trailing distinct count, user growth = cumulative
    firsts). → (day_num, n_active, n_new, n_retained, n_resurrected,
    n_churned_from_prev).

    Determinism: integer day arithmetic + BIGINT counts ⇒ bit-exact
    oracle. Scale: the only event-stream-sized exchange is the
    (user, day) DISTINCT (map-side partials); the lag window runs
    over the user-days table; per-day aggregates collapse map-side;
    the churn join is over the |days|-row table. Readout machinery
    SHARED with the streaming user-days state
    (operators/timeseries.py::growth_accounting_from_user_days —
    the retention/rolling-actives factoring: ONE state table, three
    continuous engagement readouts)."""
    from ..operators.timeseries import growth_accounting_from_user_days
    ud = (_events(spark, sf_dir)
          .select(F.col("user_id").alias("u"),
                  F.expr("ts_ms div 86400000").alias("d"))
          .distinct())
    return growth_accounting_from_user_days(ud)


def events_mannwhitney_value_test(spark, sf_dir):
    """Mann–Whitney U rank-sum test (Mann & Whitney 1947) comparing
    the 'click' vs 'view' value distributions — the NONPARAMETRIC
    two-sample test completing the family next to KS (distribution
    shape), χ² (categorical), and ANOVA (parametric means): does one
    group stochastically dominate the other? → ONE row (n_click,
    n_view, u2_statistic, z_score) with the normal approximation
    including the tie correction.

    Determinism: computed on the VALUE-GRAIN HISTOGRAM (the
    source_ks_drift spine), never per-row ranks: 2U = Σ_v n_a(v) ·
    (2·cum_b(<v) + n_b(v)) — exact integers through DECIMAL(38,0)
    products; ties contribute the standard Σ(t³−t) variance
    correction, also exact; the z finisher is one fixed IEEE tree
    over string-routed decimals (sqrt is IEEE-correctly-rounded on
    both engines) ⇒ bit-exact. Scale: ONE histogram shuffle with
    map-side partials; the cumulative window and the finisher run
    over |distinct values| rows — value-domain-sized, never
    stream-length."""
    # readout machinery SHARED with the streaming value-histogram
    # state (operators/lm_quality.py::mannwhitney_from_counts — the
    # ks_from_counts factoring: one additive histogram, KS and
    # Mann–Whitney both finish from it)
    from ..operators.lm_quality import mannwhitney_from_counts
    e = (_events(spark, sf_dir)
         .filter(F.col("event_type").isin("click", "view")
                 & F.col("value").isNotNull()))
    h = (e.groupBy("value")
         .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                    .otherwise(0)).alias("n_a"),
              F.sum(F.when(F.col("event_type") == "view", 1)
                    .otherwise(0)).alias("n_b")))
    return (mannwhitney_from_counts(h)
            .select(F.col("n_a_total").alias("n_click"),
                    F.col("n_b_total").alias("n_view"),
                    "u2_statistic", "z_score"))


def events_conversion_latency(spark, sf_dir):
    """Conversion latency distribution: per user, the time from their
    FIRST 'view' to their first 'purchase' at-or-after it; report the
    converted-user count with exact median/p90/mean latency — the
    time-dimension completion of the funnel family (the fixed funnel
    counts WHO converts; this measures HOW LONG conversion takes).
    → ONE row (n_converted, median_latency_ms, p90_latency_ms,
    mean_latency_ms).

    Determinism: latencies are exact BIGINT ms; quantiles are EXACT
    lower-quantile elements at rank ⌈qn⌉ over the (latency, user_id)
    total order — (n+1) div 2 and (9n+9) div 10 in integer
    arithmetic; the mean is an exact decimal sum with one
    string-routed division ⇒ bit-exact. Scale: two user-keyed
    aggregates (first view, first qualifying purchase — map-side
    partials) and ONE rank window over |converted users| rows; at
    100 TB the documented GK-percentile swap replaces the exact rank
    (the source_quality_floor_approx precedent). Empty-conversion
    contract (r15 ADVICE): when NO user converts, all three forms —
    this groupBy('n'), the oracle (HAVING COUNT(*) > 0), and the
    approx twin (n_converted > 0 filter) — agree on ZERO rows (a
    distribution over an empty set is empty, not a NULL row)."""
    e = _events(spark, sf_dir)
    fv = (e.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts_ms").alias("v_ts")))
    conv = (e.filter(F.col("event_type") == "purchase")
            .select("user_id", "ts_ms")
            .join(fv, "user_id")
            .filter(F.col("ts_ms") >= F.col("v_ts"))
            .groupBy("user_id")
            .agg((F.min("ts_ms") - F.min("v_ts")).alias("lat")))
    w = Window.partitionBy().orderBy("lat", "user_id")
    r = (conv.withColumn("rk", F.row_number().over(w))
         .withColumn("n", F.count("*").over(Window.partitionBy())))
    med_idx = F.expr("(n + 1) div 2")
    p90_idx = F.expr("(9 * n + 9) div 10")
    return (r.groupBy("n")
            .agg(F.max(F.when(F.col("rk") == med_idx, F.col("lat")))
                 .alias("med"),
                 F.max(F.when(F.col("rk") == p90_idx, F.col("lat")))
                 .alias("p90"),
                 F.sum(F.col("lat").cast("decimal(27,6)")).alias("s"))
            .select(F.col("n").cast("bigint").alias("n_converted"),
                    F.col("med").cast("bigint").alias("median_latency_ms"),
                    F.col("p90").cast("bigint").alias("p90_latency_ms"),
                    (_dstr("s") / F.col("n").cast("double"))
                    .alias("mean_latency_ms")))


def orders_fulfillment_lag(spark, sf_dir):
    """Fulfillment lag distribution per order priority: per order,
    the days from order date to its LAST lineitem shipment; per
    priority, the count with exact median/p90/mean lag — the
    operational-SLA readout (does URGENT actually ship faster?),
    completing the fact-to-fact latency family next to the
    event-funnel conversion latency. → (o_orderpriority, n_orders,
    median_lag_days, p90_lag_days, mean_lag_days).

    Determinism: dates reduce to epoch-day integers (the shipments
    device); quantiles are exact rank-⌈qn⌉ elements over a
    (lag, orderkey) total order; the mean is an exact-decimal sum
    with one string-routed division ⇒ bit-exact. Scale: ONE orderkey
    aggregate over lineitem (map-side max), a co-partitioned key
    join to orders, one per-priority rank window over |orders| rows
    (the GK swap applies verbatim — the quality_floor/pareto
    precedent); orders with no lineitems are out of scope (inner
    join)."""
    day0 = F.lit("1970-01-01").cast("date")
    li = (_t(spark, sf_dir, "lineitem")
          .select("l_orderkey",
                  F.datediff(F.col("l_shipdate").cast("date"), day0)
                  .alias("ship_day"))
          .groupBy("l_orderkey")
          .agg(F.max("ship_day").alias("last_ship")))
    o = (_t(spark, sf_dir, "orders")
         .select("o_orderkey", "o_orderpriority",
                 F.datediff(F.col("o_orderdate").cast("date"), day0)
                 .alias("order_day")))
    j = (o.join(li, o["o_orderkey"] == li["l_orderkey"])
         .select("o_orderkey", "o_orderpriority",
                 (F.col("last_ship") - F.col("order_day")).alias("lag")))
    w = Window.partitionBy("o_orderpriority").orderBy(
        "lag", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    r = (j.withColumn("rk", F.row_number().over(w))
         .withColumn("n", F.count("*").over(wn)))
    med_idx = F.expr("(n + 1) div 2")
    p90_idx = F.expr("(9 * n + 9) div 10")
    return (r.groupBy("o_orderpriority")
            .agg(F.max("n").alias("n_orders"),
                 F.max(F.when(F.col("rk") == med_idx, F.col("lag")))
                 .alias("med"),
                 F.max(F.when(F.col("rk") == p90_idx, F.col("lag")))
                 .alias("p90"),
                 F.sum(F.col("lag").cast("decimal(27,6)")).alias("s"))
            .select("o_orderpriority",
                    F.col("n_orders").cast("bigint").alias("n_orders"),
                    F.col("med").cast("bigint").alias("median_lag_days"),
                    F.col("p90").cast("bigint").alias("p90_lag_days"),
                    (_dstr("s") / F.col("n_orders").cast("double"))
                    .alias("mean_lag_days")))


def part_brand_return_rates(spark, sf_dir):
    """Return-rate ranking per part brand with the Wilson 95% lower
    bound (Wilson 1927; the Agresti-recommended ranking score): raw
    return share n_returned/n orders brands misleadingly when n is
    small — the Wilson lower bound penalizes uncertainty, the
    standard "sort by lower confidence bound" device for rates. Top
    10 brands by the bound → (p_brand, n_items, n_returned,
    return_rate, wilson_lower).

    Determinism: counts are exact BIGINTs; the rate and the Wilson
    bound are one fixed IEEE tree over those ints with z = 1.96
    embedded as an exact double literal (sqrt is correctly rounded
    on both engines); ties break on the brand — a total order ⇒
    bit-exact. Scale: broadcast part dim onto lineitem (or key join
    at 100 TB), ONE brand aggregate with map-side partials,
    |brands|-row arithmetic, TakeOrdered top-10. The (n, r) counts
    are plain additive sufficient statistics SHARED with the
    streaming twin (streaming/sketches.py::streaming_return_counts,
    r15 verdict #5); the Wilson readout finishes from either state
    via operators/timeseries.py::wilson_from_counts."""
    from ..operators.timeseries import (brand_return_counts,
                                        wilson_from_counts)
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(pt, li["l_partkey"] == pt["p_partkey"])
    return wilson_from_counts(brand_return_counts(j), top=10)


def docs_weighted_sample(spark, sf_dir):
    """Exact weight-proportional systematic corpus sample — pick 100
    documents with probability proportional to length (the training-
    mix sampling step executed exactly): weights laid end-to-end
    along a deterministic md5-shuffled axis, one doc per crossing of
    a total/k grid point (operators/training.py::
    weighted_systematic_sample — the deterministic counterpart of
    A-ES reservoir sampling, whose u^(1/w) keys can never be
    bit-exact cross-engine). → (doc_id, w, cum_w, n_picks), ≤100
    rows, n_picks > 1 marks whales heavier than a grid step.

    Determinism: the md5 order is a cross-engine total order (the
    train/test-split coin device) and every step is BIGINT integer
    arithmetic ⇒ bit-exact oracle. Scale (r15): the cumulative sum
    runs CHUNKED — 256 hash-prefix chunks tile the md5 order, the
    per-chunk windows sort in parallel, and a ≤256-row carry ledger
    broadcasts back (bit-identical to the global window by
    associativity; no single-task corpus window remains). Width
    budget total·k < 2^63."""
    from ..operators.training import weighted_systematic_sample
    d = _t(spark, sf_dir, "documents")
    return weighted_systematic_sample(d, "n_chars", 100, "doc_id")


def events_conversion_latency_approx(spark, sf_dir):
    """GK-sketch twin of events_conversion_latency — the scale swap
    its exact form documents: median/p90 via percentile_approx
    (mergeable GK aggregate with map-side partials) instead of the
    exact global rank window, so the readout is ONE plain aggregate
    over the converted-user latencies — no single-partition sort,
    no matter how many users convert. Rows-only BY DESIGN (the
    sketch is engine-internal; the exact in-rotation
    events_conversion_latency is the oracle-checkable ground truth);
    accuracy pinned by
    tests/test_operators.py::test_conversion_latency_approx_accuracy.
    Shares the exact form's empty-conversion contract (r15 ADVICE):
    the n_converted > 0 filter on the 1-row aggregate yields ZERO
    rows when no user converts, matching the exact query and the
    oracle."""
    e = _events(spark, sf_dir)
    fv = (e.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts_ms").alias("v_ts")))
    conv = (e.filter(F.col("event_type") == "purchase")
            .select("user_id", "ts_ms")
            .join(fv, "user_id")
            .filter(F.col("ts_ms") >= F.col("v_ts"))
            .groupBy("user_id")
            .agg((F.min("ts_ms") - F.min("v_ts")).alias("lat")))
    return (conv.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.percentile_approx("lat", 0.5, 10000).cast("bigint")
        .alias("median_latency_ms"),
        F.percentile_approx("lat", 0.9, 10000).cast("bigint")
        .alias("p90_latency_ms"),
        (F.sum(F.col("lat").cast("decimal(27,6)")).cast("string")
         .cast("double") / F.count("*").cast("double"))
        .alias("mean_latency_ms"))
        .filter(F.col("n_converted") > 0))


def customer_revenue_pareto_approx(spark, sf_dir):
    """GK-sketch twin of customer_revenue_pareto — the scale swap its
    exact form documents: the top-10% spend threshold per segment via
    percentile_approx(0.9) (mergeable, map-side partials) and the
    share via a threshold FILTER instead of the per-segment rank
    window — two plain aggregates + a |segments|-row broadcast, no
    keyed sort serializing a segment through one task. k_top10 counts
    the customers at-or-above the sketched threshold (ties inflate it
    slightly vs the exact ⌈n/10⌉ — the documented sketch contract).
    Rows-only BY DESIGN; accuracy pinned by
    tests/test_operators.py::test_revenue_pareto_approx_accuracy."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = (o.groupBy("o_custkey")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
                  .alias("spend")))
    s = (spend.join(c, spend["o_custkey"] == c["c_custkey"])
         .select("c_mktsegment", "spend"))
    thr = (s.groupBy("c_mktsegment")
           .agg(F.percentile_approx(
               F.col("spend").cast("double"), 0.9, 10000).alias("thr")))
    j = s.join(F.broadcast(thr), "c_mktsegment")
    agg = (j.groupBy("c_mktsegment")
           .agg(F.count("*").alias("n_customers"),
                F.sum(F.when(F.col("spend").cast("double")
                             >= F.col("thr"), 1).otherwise(0))
                .alias("k_top10"),
                F.sum("spend").alias("total_spend"),
                F.sum(F.when(F.col("spend").cast("double")
                             >= F.col("thr"), F.col("spend")))
                .alias("top_spend")))
    share = _dstr("top_spend") / _dstr("total_spend")
    return agg.select(
        "c_mktsegment",
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("k_top10").cast("bigint").alias("k_top10"),
        F.when(F.col("total_spend") > 0, share).alias("top10_share"))


def customer_revenue_pareto(spark, sf_dir):
    """Pareto (80/20) revenue concentration per market segment: what
    share of a segment's revenue comes from its top-10% customers —
    the per-ENTITY concentration readout next to the per-ITEM Gini
    (source_gini_concentration ranks documents; this ranks paying
    customers), and the classic account-management "whale" metric.
    → (c_mktsegment, n_customers, k_top10, top10_share).

    Determinism: per-customer spend is an exact DECIMAL(27,6) sum;
    ranks are row_number over (spend DESC, c_custkey) — a total
    order; k = ⌈n/10⌉ via integer (n+9) div 10 (DuckDB's // truncates
    like Spark's div — positive here, so identical); the share is one
    string-routed decimal division ⇒ bit-exact. Customers with no
    orders are out of scope (inner join — "paying customers").

    Scale: ONE custkey shuffle for the spend aggregate (map-side
    partials), the segment dim attaches by key join, one per-segment
    rank window over |customers| rows (the source_quality_floor
    shape — at 100 TB the documented GK-percentile threshold swap
    applies verbatim), and the finisher collapses map-side. The
    per-customer decimal spend is a plain additive sufficient
    statistic SHARED with the streaming twin
    (streaming/sketches.py::streaming_customer_spend, r15 verdict
    #5); the Pareto readout finishes from either state via
    operators/timeseries.py::pareto_from_spend."""
    from ..operators.timeseries import customer_spend, pareto_from_spend
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return pareto_from_spend(customer_spend(o), c)


def docs_source_lang_diversity(spark, sf_dir):
    """Gini–Simpson language diversity per source (Simpson 1949):
    λ = 1 − Σnᵢ²/n² over a source's per-language counts, plus the
    effective language number n²/Σnᵢ² — the corpus-composition
    readout a curator runs next to the mix weights (is a source
    monolingual or balanced?). The LOG-FREE diversity index: Shannon
    entropy's ln() diverges in the last ulp across libm builds;
    Simpson's is exact rational arithmetic → (source, n_rows,
    n_langs, simpson_lambda, effective_langs).

    Determinism: counts are exact BIGINTs; n² and Σnᵢ² go through
    DECIMAL(38,0) products and the string hop; two IEEE divisions
    finish ⇒ bit-exact. Scale: ONE corpus exchange (the shared
    contingency cell aggregate with map-side partials) — the SAME
    additive cell table the χ² independence test and the streaming
    twin (streaming_contingency_counts) maintain; the diversity
    readout is |cells|-row arithmetic
    (operators/lm_quality.py::diversity_from_counts)."""
    from ..operators.lm_quality import (contingency_counts,
                                        diversity_from_counts)
    d = _t(spark, sf_dir, "documents")
    return (diversity_from_counts(
        contingency_counts(d, "lang", "source"))
        .select(F.col("g").alias("source"), "n_rows",
                F.col("n_categories").alias("n_langs"),
                "simpson_lambda",
                F.col("effective_categories").alias("effective_langs")))


# The driver's correctness gate checks the FIRST 50 entries of
# queries() (CORRECTNESS_r01 stopped at exactly entry 50, leaving the
# whole §2.11 extension surface unverified). QUERIES is therefore a
# curated, ordered window of exactly ≤50 entries: the driver-mandated
# LLM-pipeline operators first, then the reference-parity shapes, then
# the analytics shapes — with near-duplicate plan shapes demoted to
# EXTRA_QUERIES (still run by tests/test_parity.py, just not declared
# to the driver).
#
# ROUND-7 ROTATION (supersedes the round-6 one, same mechanics): the
# 34 ROTATION_CANDIDATES_R7 queries — the 22 round-2 window
# re-curation demotions plus the 12 late-r6 additions, i.e. every
# remaining oracle-backed query that had NEVER held a green external
# CORRECTNESS row — rotate IN; 34 long-green shapes rotate OUT to
# EXTRA_QUERIES, each leaving an in-window twin of its plan shape
# (twin noted per entry below; all stay parity-tested locally every
# round). The two rows-only sketch readouts (CMS heavy-hitters, HLL
# rollup) rotate out in favor of their exact oracle-backed twins
# (token_frequencies, agg_cube_year_status), so the window is now
# 50/50 hash-checked — zero rows-only entries.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- strong representatives KEPT in-window through the round-7
    #    rotation (each anchors an operator family whose siblings
    #    rotated out): dedup/graph/contamination/fingerprint core,
    #    exact + filtered kNN, multimodal metadata, config-compiled
    #    transforms, keyed latest-state, fuzzy blocking, hypertable
    #    gapfill, exact moments, chunked motif windows, range join,
    #    skew-salted agg.
    "dedup_cluster_keepers": dedup_cluster_keepers,
    "contamination_check": contamination_check,
    "knn_bruteforce": knn_bruteforce,
    "p5p6p7_config_pipeline": p5p6p7_config_pipeline,
    "a1_latest_per_key": a1_latest_per_key,
    "events_gapfill_interpolate": events_gapfill_interpolate,
    "skew_salted_agg": skew_salted_agg,
    # -- r7-rotated shapes KEPT in-window (anchors for ordered-frame
    #    windows; their demoted siblings note them as twins).
    "events_moving_stats": events_moving_stats,
    # -- ROTATED IN (round 9): all nine ROTATION_CANDIDATES_R8 —
    #    the round-8 TPC-H shape completion, the two late-r8 curation
    #    operators, and the retrieval/KS family whose oracles landed
    #    in round 9 — externally verified for the first time this
    #    round. Nine twice-green r7 shapes demoted in exchange (twin
    #    noted per entry in EXTRA_QUERIES).
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_part_promotion": q20_part_promotion,
    # -- ROTATED IN (round 10): both ROTATION_CANDIDATES_R9 — the
    #    materialized-index BM25 serve path and the (r10-fixed,
    #    TakeOrdered top-k) PMI collocation extraction — externally
    #    verified for the first time this round. Two thrice-green
    #    (r7+r8+r9) shapes demoted in exchange (twin noted per entry
    #    in EXTRA_QUERIES).
    "doc_bm25_from_index": doc_bm25_from_index,
    # -- ROTATED IN (round 12): all twelve ROTATION_CANDIDATES_R11 —
    #    the round-11 build (decontamination scrub ×2, crawl-delta
    #    upsert, winnowing near-dup, χ² drift, Gopher quality +
    #    repetition signals, cohort retention, Markov transitions,
    #    CUSUM changepoint, embedding covariance + correlation) —
    #    collecting their first external CORRECTNESS row this round.
    #    Twelve long-green (≥3 external rounds each) shapes demoted in
    #    exchange (twin noted per entry in EXTRA_QUERIES).
    "eval_leak_scrub": eval_leak_scrub,
    "crawl_delta_apply": crawl_delta_apply,
    "winnow_fingerprint_neardup": winnow_fingerprint_neardup,
    "dup_span_scrub": dup_span_scrub,
    "source_chi2_drift": source_chi2_drift,
    "doc_repetition_signals": doc_repetition_signals,
    "events_cohort_retention": events_cohort_retention,
    "events_markov_transitions": events_markov_transitions,
    "events_cusum_changepoint": events_cusum_changepoint,
    "doc_quality_signals": doc_quality_signals,
    "embedding_covariance_matrix": embedding_covariance_matrix,
    "embedding_correlation_matrix": embedding_correlation_matrix,
    # -- ROTATED IN (round 13): all nine ROTATION_CANDIDATES_R12 —
    #    the round-12 build (perceptual image dHash near-dup + CC
    #    keepers, video frame near-dup, bucket-grain streaming CUSUM,
    #    RFM segmentation, triangle counting over the production pair
    #    graph, the interval×interval overlap join, per-source quality
    #    floors, the per-column DQ profile) — collecting their first
    #    external CORRECTNESS row this round. Nine long-green (≥3
    #    external rounds each) shapes demoted in exchange (twin noted
    #    per entry in EXTRA_QUERIES).
    "image_dhash_neardup": image_dhash_neardup,
    "image_dedup_keepers": image_dedup_keepers,
    "events_cusum_bucketed": events_cusum_bucketed,
    "events_rfm_segments": events_rfm_segments,
    "video_frame_neardup": video_frame_neardup,
    "neardup_triangle_stats": neardup_triangle_stats,
    "interval_overlap_shipments": interval_overlap_shipments,
    "source_quality_floor": source_quality_floor,
    "orders_dq_profile": orders_dq_profile,
    # -- ROTATED IN (round 14): all eight ROTATION_CANDIDATES_R13 —
    #    the round-13 analytics build (Benford first-digit
    #    conformance, session path mining, per-source Gini
    #    concentration, user-grain co-occurrence lift, χ² lang×source
    #    independence, per-group embedding outlier screen, rolling
    #    7-day distinct actives, one-way ANOVA over brands) —
    #    collecting their first external CORRECTNESS row this round.
    #    Eight long-green (≥3 external rounds each) shapes demoted in
    #    exchange (twin noted per entry in EXTRA_QUERIES).
    "orders_benford_test": orders_benford_test,
    "events_session_funnel_paths": events_session_funnel_paths,
    "source_gini_concentration": source_gini_concentration,
    "events_type_cooccurrence_lift": events_type_cooccurrence_lift,
    "docs_lang_source_independence": docs_lang_source_independence,
    "embedding_outlier_docs": embedding_outlier_docs,
    "events_rolling_active_users": events_rolling_active_users,
    "part_brand_price_anova": part_brand_price_anova,
    # -- ROTATED IN (round 15): all ten ROTATION_CANDIDATES_R14 —
    #    the round-14 analytics build (FK orphan audit, order
    #    fulfillment lag, Wilson-interval return-rate ranking,
    #    weighted systematic sampling, exact skew/kurtosis moments,
    #    user growth accounting, Pareto revenue concentration,
    #    view→purchase conversion latency, Mann–Whitney U test,
    #    Gini–Simpson lang diversity) — collecting their first
    #    external CORRECTNESS row this round. Ten long-green (≥6
    #    external rounds each) shapes demoted in exchange (twin noted
    #    per entry in EXTRA_QUERIES).
    "fk_orphan_audit": fk_orphan_audit,
    "orders_fulfillment_lag": orders_fulfillment_lag,
    "part_brand_return_rates": part_brand_return_rates,
    "docs_weighted_sample": docs_weighted_sample,
    "orders_price_skew_kurtosis": orders_price_skew_kurtosis,
    "events_user_growth_accounting": events_user_growth_accounting,
    "customer_revenue_pareto": customer_revenue_pareto,
    "events_conversion_latency": events_conversion_latency,
    "events_mannwhitney_value_test": events_mannwhitney_value_test,
    "docs_source_lang_diversity": docs_source_lang_diversity,
}

assert len(QUERIES) <= 50, "driver correctness window is 50 queries"

# Near-duplicate plan shapes pruned from the driver window (their
# operator classes stay evidenced by a QUERIES twin) — still fully
# parity-tested against their DuckDB oracles in tests/test_parity.py.
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "source_overlap_theta": source_overlap_theta,    # rows-only (theta ∩/∪)
    "doc_bpe_token_real": doc_bpe_token_real,        # rows-only (trained)
    "value_quantiles_kll": value_quantiles_kll,      # rows-only (KLL, randomized)
    "pack_greedy_packing": pack_greedy_packing,      # rows-only (applyInPandas)
    # round-5 rotation: long-green shapes demoted so the 13 round-3
    # operators above could enter the driver's 50-query window — each
    # keeps an in-window twin of its plan shape.
    "p11_wire_json": p11_wire_json,                  # to_json ⊂ p3 family
    "q2_min_cost_supplier": q2_min_cost_supplier,    # corr-subquery ⊂ q21 family
    "q3_top_revenue_orders": q3_top_revenue_orders,  # top-k ⊂ window_topk_per_group
    "q6_revenue_delta": q6_revenue_delta,            # filter-agg ⊂ q1
    "q8_nation_market_share": q8_nation_market_share,  # ratio-agg ⊂ q5 family
    "q18_large_orders": q18_large_orders,            # having ⊂ agg_orders_stats
    "q21_sole_late_supplier": q21_sole_late_supplier,  # exists/anti ⊂ j2 pair
    "agg_rollup": agg_rollup,                        # grouping-sets ⊂ cube (EXTRA)
    "distinct_count_exact": distinct_count_exact,    # ⊂ agg_orders_stats
    "approx_distinct_sketch": approx_distinct_sketch,  # rows-only (HLL)
    "pivot_event_matrix": pivot_event_matrix,        # inverse in unpivot (EXTRA)
    "a1_latest_with_ttl": a1_latest_with_ttl,        # ⊂ a1_latest_per_key
    "events_tumbling_window": events_tumbling_window,  # ⊂ events_ohlc_bars
    "events_ewma_chunked": events_ewma_chunked,      # rows-only (r6 chunked path)
    "knn_ann_pq_train": knn_ann_pq_train,            # rows-only (codebook build)
    "knn_ann_pq_serve": knn_ann_pq_serve,            # rows-only (indexed serve)
    # round-6 rotation: 25 long-green shapes demoted so every
    # ROTATION_CANDIDATES_R6 query (the whole late-r5 build) gets its
    # first external CORRECTNESS row — in-window twin noted per entry.
    "dedup_exact": dedup_exact,                      # ⊂ dedup_fingerprint + passage_dedup_scrub
    "ngram_jaccard_neardup": ngram_jaccard_neardup,  # pair-join ⊂ minhash_neardup
    "simhash_neardup": simhash_neardup,              # block equi-join ⊂ minhash_neardup
    "text_quality_score": text_quality_score,        # Column exprs ⊂ text_token_stats
    "text_langid": text_langid,                      # Column exprs ⊂ text_token_stats
    "embedding_lsh_neardup": embedding_lsh_neardup,  # ⊂ embedding_cosine_neardup (exact twin)
    "embedding_norm_stats": embedding_norm_stats,    # array exprs ⊂ embedding_quantize_stats
    "knn_ann_hyperplane": knn_ann_hyperplane,        # ANN ⊂ knn_bruteforce + knn_filtered
    "knn_ann_ivf": knn_ann_ivf,                      # ANN ⊂ knn_bruteforce + knn_filtered
    "knn_ann_pq": knn_ann_pq,                        # ANN ⊂ knn_bruteforce + knn_filtered
    "p1_validation_filter": p1_validation_filter,    # filter ⊂ p5p6p7 pipeline
    "p3_flatten_payload": p3_flatten_payload,        # nested access ⊂ events_variant_extract
    "p4_value_rules": p4_value_rules,                # config rules ⊂ p5p6p7_config_pipeline
    "p8_conditional_gate": p8_conditional_gate,      # config gate ⊂ p5p6p7_config_pipeline
    "p10_api_key_hash": p10_api_key_hash,            # hash fn ⊂ train_test_split_hash
    "j2_semi_join_auth": j2_semi_join_auth,          # semi-join ⊂ bloom_semi_join_agg (EXISTS)
    "q5_region_nation_revenue": q5_region_nation_revenue,  # multi-join agg ⊂ q15_top_supplier
    "agg_orders_stats": agg_orders_stats,            # multi-agg ⊂ orders_cohort_matrix
    "window_topk_per_group": window_topk_per_group,  # WindowGroupLimit ⊂ events_motif_search
    "set_ops_status_migration": set_ops_status_migration,  # ∩/∪ ⊂ source_overlap_exact
    "events_ohlc_bars": events_ohlc_bars,            # time-bucket agg ⊂ events_twap/gapfill
    "pack_sequences_chunked": pack_sequences_chunked,  # training prep ⊂ shard_manifest
    "events_sessionization": events_sessionization,  # ordered key window ⊂ events_gapfill_locf
    "asof_join_purchase_click": asof_join_purchase_click,  # ⊂ range_join_click_context
    "value_percentiles": value_percentiles,          # exact ranks ⊂ doc_length_buckets
    # rows-only by design (engine-trained centroids); exact twin
    # semantic_dedup_clusters stays parity-tested in EXTRA
    "semdedup_keepers": semdedup_keepers,
    # round-7 rotation: 34 long-green shapes demoted so every
    # ROTATION_CANDIDATES_R7 query (the round-2 demotions + the whole
    # late-r6 build) gets its first external CORRECTNESS row —
    # in-window twin noted per entry; all stay parity-tested locally.
    "dedup_fingerprint": dedup_fingerprint,          # normalized fp ⊂ corpus_datacard
    "minhash_neardup": minhash_neardup,              # banded minhash ⊂ contamination_check
    "semantic_dedup_clusters": semantic_dedup_clusters,  # CC ⊂ dedup_cluster_keepers + neardup_pagerank
    "text_token_stats": text_token_stats,            # token exprs ⊂ token_frequencies
    "text_repetition": text_repetition,              # token-stream exprs ⊂ doc_lm_quality
    "text_bpe_token_estimate": text_bpe_token_estimate,  # token exprs ⊂ token_frequencies
    "doc_rolling_fingerprint": doc_rolling_fingerprint,  # ⊂ rolling_fingerprint_neardup (kept)
    "doc_top_terms": doc_top_terms,                  # rank-per-group ⊂ window_rank_stats + token_frequencies
    "doc_length_buckets": doc_length_buckets,        # exact ntile ⊂ lm_quality_bands
    "pii_scrub_stats": pii_scrub_stats,              # regexp surface ⊂ string_functions
    "train_test_split_hash": train_test_split_hash,  # md5 coin ⊂ corpus_mix + stratified_resample_stats
    "corpus_upsample_stats": corpus_upsample_stats,  # weighting ⊂ corpus_mix
    "source_cap_sample": source_cap_sample,          # per-key top-k ⊂ order_limit_topk + corpus_datacard
    "shard_manifest": shard_manifest,                # cum window ⊂ window_running_total
    "curation_pipeline_summary": curation_pipeline_summary,  # signal composition ⊂ corpus_datacard
    "embedding_cosine_neardup": embedding_cosine_neardup,  # exact cosine ⊂ knn_bruteforce + embedding_outlier_docs (rotated in r14; exact-decimal centroid + fold distance)
    "embedding_quantize_stats": embedding_quantize_stats,  # array exprs ⊂ embedding_outlier_docs (rotated in r14; dim-exploded decimal centroid aggregate)
    "source_overlap_exact": source_overlap_exact,    # ∩/∪ ⊂ set_ops_all_variants
    "bloom_semi_join_agg": bloom_semi_join_agg,      # EXISTS semi ⊂ q4_order_priority
    "token_heavy_hitters_sketch": token_heavy_hitters_sketch,  # rows-only CMS; exact twin token_frequencies IN-window
    "distinct_rollup_hll": distinct_rollup_hll,      # rows-only HLL; grouping-sets distinct ⊂ agg_cube_year_status
    "p9_exchange_enrichment": p9_exchange_enrichment,  # broadcast dim join ⊂ q9_product_profit (broadcast nation dim)
    "j2_anti_join_unmatched": j2_anti_join_unmatched,  # anti join ⊂ q22_idle_customers
    "q1_pricing_summary": q1_pricing_summary,        # plan ≡ sql_api_pricing_summary
    "q15_top_supplier": q15_top_supplier,            # agg-join-topk ⊂ q9_product_profit + order_limit_topk
    "events_variant_extract": events_variant_extract,  # VARIANT path ⊂ events_vwap
    "events_gapfill_locf": events_gapfill_locf,      # grid/join/window ⊂ events_gapfill_interpolate (kept)
    "events_twap": events_twap,                      # weighted mean ⊂ events_vwap + events_gapfill_interpolate
    "events_ewma_smooth": events_ewma_smooth,        # rolling stats ⊂ events_moving_stats + window_running_total
    "events_zscore_outliers": events_zscore_outliers,  # moments ⊂ events_pair_correlation (kept)
    "events_trend_slope": events_trend_slope,        # moments ⊂ events_pair_correlation (kept)
    "lineitem_price_qty_corr": lineitem_price_qty_corr,  # moments ⊂ events_pair_correlation (kept)
    "events_funnel_conversion": events_funnel_conversion,  # first-touch ⊂ events_user_growth
    "orders_cohort_matrix": orders_cohort_matrix,    # cohort histogram ⊂ q16_supplier_part_counts (count-of-counts)
    # round-9 rotation: 9 twice-green (r7+r8) shapes demoted so every
    # ROTATION_CANDIDATES_R8 query gets its first external
    # CORRECTNESS row — in-window twin noted per entry; all stay
    # parity-tested locally every round.
    # round-9 addition: ANN-armed hybrid fusion — rows-only (IVF cell
    # assignment is engine-side, the knn_ann_* precedent); overlap
    # floor vs the exact hybrid tested in tests/test_retrieval.py
    "hybrid_rrf_ann": hybrid_rrf_ann,
    # round-10 rotation: 2 thrice-green (r7+r8+r9) shapes demoted so
    # both ROTATION_CANDIDATES_R9 queries get their first external
    # CORRECTNESS row — in-window twin noted per entry; both stay
    # parity-tested locally every round.
    "orders_by_year": orders_by_year,                # year agg ⊂ agg_cube_year_status (rollup of the same grain)
    "window_running_total": window_running_total,    # cumulative window ⊂ events_user_growth (day-grain running totals) + events_moving_stats (rolling frames)
    "q4_order_priority": q4_order_priority,          # EXISTS semi ⊂ q20_part_promotion (IN semi, rotated in)
    "q7_nation_volume": q7_nation_volume,            # multi-join year agg ⊂ q9_product_profit (rotated in)
    "q14_promo_revenue_share": q14_promo_revenue_share,  # ratio-vs-total agg ⊂ q11_important_stock (rotated in)
    "q17_small_qty_revenue": q17_small_qty_revenue,  # per-key-threshold agg-join ⊂ q20_part_promotion (rotated in)
    "q22_idle_customers": q22_idle_customers,        # NOT-IN anti ⊂ q16_supplier_part_counts (rotated in)
    "event_gaps": event_gaps,                        # lag/gaps-and-islands ⊂ dup_span_extents (rotated in)
    "window_rank_stats": window_rank_stats,          # rank windows ⊂ doc_bm25_topk top-k + events_mad_outliers rank-median (rotated in)
    "source_tv_drift": source_tv_drift,              # pairwise common-denominator drift ⊂ source_ks_drift (rotated in)
    "dsir_importance_weights": dsir_importance_weights,  # broadcast-model decimal-mean scoring ⊂ doc_lm_quality (kept)
    # round-11 rotation: 7 four-times-green (r7+r8+r9+r10) shapes
    # demoted so every ROTATION_CANDIDATES_R10 query gets its first
    # external CORRECTNESS row — in-window twin noted per entry; all
    # stay parity-tested locally every round.
    "q10_returned_items": q10_returned_items,        # multi-join agg-topk ⊂ q9_product_profit (multi-join agg) + order_limit_topk (top-k)
    "q12_late_shipment_priority": q12_late_shipment_priority,  # conditional lineitem aggs ⊂ sql_api_pricing_summary + q9_product_profit (orders×lineitem join)
    "q13_customer_distribution": q13_customer_distribution,  # count-of-counts histogram ⊂ q16_supplier_part_counts (distinct-count per group)
    "q19_disjunctive_filter": q19_disjunctive_filter,  # disjunctive part×lineitem predicate join ⊂ q20_part_promotion
    "events_drawdown": events_drawdown,              # per-key running-peak window ⊂ events_moving_stats (ordered frames) + events_user_growth (cumulative window)
    "doc_containment_pairs": doc_containment_pairs,  # inverted-index pair equi-join ⊂ doc_sparse_cosine_neardup (kept)
    "jl_projection_distortion": jl_projection_distortion,  # exact-decimal embedding arithmetic ⊂ embedding_outlier_docs (rotated in r14) + knn_bruteforce (pairwise cosine)
    # round-11 additions that stay EXTRA: rows-only by design (PCA
    # eigen-decomposition is driver-side eigh over the d×d matrix;
    # the Arrow/BLAS covariance twin is float64, equality-tested
    # against the exact in-window embedding_covariance_matrix)
    "embedding_pca_spectrum": embedding_pca_spectrum,
    "embedding_covariance_arrow": embedding_covariance_arrow_q,
    # round-12 rotation: 12 long-green (≥3 external rounds each)
    # shapes demoted so every ROTATION_CANDIDATES_R11 query gets its
    # first external CORRECTNESS row — in-window twin noted per entry;
    # all stay parity-tested against their DuckDB oracles locally
    # every round (tests/test_parity.py).
    "passage_dedup_scrub": passage_dedup_scrub,      # window-key scrub ⊂ dup_span_scrub + eval_leak_scrub (rotated in)
    "rolling_fingerprint_neardup": rolling_fingerprint_neardup,  # rolling-hash postings join ⊂ winnow_fingerprint_neardup (rotated in; same Rabin-Karp machinery + winnowed selection)
    "dup_span_extents": dup_span_extents,            # gaps-and-islands extents ⊂ dup_span_scrub (rotated in; same island merge feeding the scrub)
    "source_ks_drift": source_ks_drift,              # shared-histogram drift ⊂ source_chi2_drift (rotated in; same ONE-shuffle histogram spine)
    "events_user_growth": events_user_growth,        # user-day cumulative windows ⊂ events_cohort_retention (rotated in; same (user,day) distinct base)
    "events_pair_correlation": events_pair_correlation,  # exact decimal moments ⊂ embedding_correlation_matrix (rotated in) + events_cusum_changepoint (keyed exact stats)
    "corpus_mix": corpus_mix,                        # corpus mixing aggregate ⊂ source_gini_concentration (rotated in r14; per-source composition) + stratified_resample_stats (kept)
    "doc_lm_quality": doc_lm_quality,                # broadcast-model scoring ⊂ doc_quality_signals + doc_repetition_signals (rotated in) + lm_quality_bands (kept)
    "doc_bm25_topk": doc_bm25_topk,                  # BM25 rank top-k ⊂ doc_bm25_from_index (in window; same scoring over the materialized index)
    "events_mad_outliers": events_mad_outliers,      # rank-median windows ⊂ events_moving_stats (kept ordered frames) + events_cusum_changepoint (keyed argmax)
    "events_motif_search": events_motif_search,      # chunked sliding windows + WindowGroupLimit ⊂ order_limit_topk (kept top-k) + events_moving_stats (kept frames)
    "knn_filtered_bruteforce": knn_filtered_bruteforce,  # predicate-first exact kNN ⊂ knn_bruteforce (kept; same dot-product top-k)
    # round-13 rotation: nine long-green (≥3 external rounds each)
    # shapes demoted so every ROTATION_CANDIDATES_R12 query gets its
    # first external CORRECTNESS row — in-window twin noted per entry;
    # all stay parity-tested against their DuckDB oracles locally
    # every round (tests/test_parity.py).
    "token_frequencies": token_frequencies,          # token-grain explode+agg ⊂ string_functions (kept tokenize exprs) + doc_quality_signals (in window; token-grain signal aggregation)
    "events_vwap": events_vwap,                      # keyed weighted decimal agg ⊂ sql_api_pricing_summary (kept decimal aggregate tree) + events_cusum_bucketed (rotated in; keyed decimal bucket aggregation)
    "corpus_datacard": corpus_datacard,              # one-scan multi-aggregate profile ⊂ orders_dq_profile (in window; same single-scan profile readout) + source_gini_concentration (rotated in r14; corpus composition)
    "neardup_pagerank": neardup_pagerank,            # per-round equi-join + integer agg over the pair graph ⊂ neardup_triangle_stats (rotated in; same banded pair graph) + dedup_cluster_keepers (kept CC rounds)
    "doc_sparse_cosine_neardup": doc_sparse_cosine_neardup,  # df-capped postings pair equi-join ⊂ image_dhash_neardup (rotated in; pigeonhole posting join) + winnow_fingerprint_neardup (kept postings join)
    "lm_quality_bands": lm_quality_bands,            # quality-score banding ⊂ doc_quality_signals (kept signal scoring) + source_quality_floor (rotated in; per-source quality thresholding)
    "hybrid_rrf_retrieval": hybrid_rrf_retrieval,    # BM25 + rank fusion top-k ⊂ doc_bm25_from_index (kept; same scoring over the materialized index)
    "q9_product_profit": q9_product_profit,          # multi-join year agg ⊂ q20_part_promotion + q16_supplier_part_counts (kept multi-join agg family)
    "agg_cube_year_status": agg_cube_year_status,    # Expand grouping-sets agg ⊂ orders_dq_profile (rotated in; same single-scan Expand machinery) + unpivot_event_matrix (kept reshape)
    # rows-only by design (FFT not SQL-expressible; invariance +
    # recall tests pin correctness — the simhash/knn_ann precedent)
    "audio_afp_neardup": audio_afp_neardup,
    # r13: HLL swap of the in-window exact DQ profile — rows-only by
    # design (Datasketches HLL ≠ DuckDB's sketch); accuracy pinned
    # against the exact profile (≤5% relative-error contract test)
    "orders_dq_profile_approx": orders_dq_profile_approx,
    # r13: GK-percentile swap of the in-window exact quality floor —
    # rows-only by design (engine-internal sketch); accuracy pinned
    # against the exact floor (rank-error contract test)
    "source_quality_floor_approx": source_quality_floor_approx,
    # round-14 rotation: eight long-green (≥3 external rounds each)
    # shapes demoted so every ROTATION_CANDIDATES_R13 query gets its
    # first external CORRECTNESS row — in-window twin noted per entry;
    # all stay parity-tested against their DuckDB oracles locally
    # every round (tests/test_parity.py).
    "doc_pmi_collocations": doc_pmi_collocations,    # pair support/lift arithmetic ⊂ events_type_cooccurrence_lift (rotated in; same co-occurrence counting, lift is PMI's exp form) + string_functions (kept tokenize exprs)
    "doc_ngram_novelty": doc_ngram_novelty,          # n-gram explode + broadcast reference join ⊂ contamination_check (kept; same shingle/reference machinery)
    "source_mix_weights": source_mix_weights,        # per-source composition weights ⊂ source_gini_concentration (rotated in; per-source composition readout) + stratified_resample_stats (kept)
    "corpus_vocab_growth": corpus_vocab_growth,      # first-seen cumulative distinct growth ⊂ events_rolling_active_users (rotated in; windowed distinct-user machinery) + string_functions (kept tokenize)
    "corpus_snapshot_diff": corpus_snapshot_diff,    # snapshot key diff ⊂ crawl_delta_apply (in window; same snapshot upsert/delta machinery)
    "source_embedding_drift": source_embedding_drift,  # exact-decimal centroid + fold distance ⊂ embedding_outlier_docs (rotated in; same centroid broadcast + squared-delta fold)
    "snapshot_change_magnitude": snapshot_change_magnitude,  # diff magnitude agg ⊂ crawl_delta_apply (in window; same snapshot delta base)
    "eval_leak_spans": eval_leak_spans,              # span localization postings ⊂ eval_leak_scrub (in window; same span machinery feeding the scrub)
    # r14: GK scale twins of the two new rank-window queries — rows-
    # only by design (engine-internal sketch; the exact forms are the
    # oracle-checkable ground truth), accuracy-contract-tested
    "events_conversion_latency_approx": events_conversion_latency_approx,
    "customer_revenue_pareto_approx": customer_revenue_pareto_approx,
    # round-15 rotation: ten long-green (≥6 external rounds each)
    # shapes demoted so every ROTATION_CANDIDATES_R14 query gets its
    # first external CORRECTNESS row — in-window twin noted per entry;
    # all stay parity-tested against their DuckDB oracles locally
    # every round (tests/test_parity.py).
    "stratified_resample_stats": stratified_resample_stats,  # deterministic hash-order sampling ⊂ docs_weighted_sample (rotated in; same md5-keyed systematic draw) + source_quality_floor (kept per-source thresholding)
    "multimodal_binary_meta": multimodal_binary_meta,  # corrupt-safe binary decode mapInPandas ⊂ image_dhash_neardup + video_frame_neardup (in window; same codec/Arrow batch machinery)
    "fuzzy_name_block_join": fuzzy_name_block_join,    # blocked candidate equi-join ⊂ winnow_fingerprint_neardup (in window; postings/block join) + image_dhash_neardup (pigeonhole block join)
    "range_join_click_context": range_join_click_context,  # bounded-interval event pairing ⊂ interval_overlap_shipments (in window; interval×interval join) + events_conversion_latency (rotated in; ordered event pairing)
    "sql_api_pricing_summary": sql_api_pricing_summary,  # spark.sql decimal aggregate tree ⊂ orders_price_skew_kurtosis (rotated in; exact decimal moments over the same scan family); plan ≡ q1_pricing_summary (EXTRA)
    "set_ops_all_variants": set_ops_all_variants,      # ∩/∪/EXCEPT (ALL) ⊂ fk_orphan_audit (rotated in; anti/semi-join audit of the same key-membership class)
    "unpivot_event_matrix": unpivot_event_matrix,      # Expand reshape ⊂ orders_dq_profile (in window; same single-scan Expand machinery)
    "string_functions": string_functions,              # string expr surface ⊂ doc_quality_signals (in window; token/string signal exprs) + docs_source_lang_diversity (rotated in; lang-grain string aggregation)
    "order_limit_topk": order_limit_topk,              # global/keyed top-k ⊂ customer_revenue_pareto (rotated in; global ordered rank window) + events_session_funnel_paths (in window; per-key ordered window)
    "q11_important_stock": q11_important_stock,        # share-of-global-total threshold ⊂ customer_revenue_pareto (rotated in; cumulative share vs total) + q16_supplier_part_counts (kept multi-join agg)
}

ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    **QUERIES, **EXTRA_QUERIES}


# Round-6 rotation (EXECUTED this round): the 25 candidates below
# rotated INTO the driver window above — pinned by
# tests/test_parity.py::test_round6_rotated_operators_sit_in_declared_window.
ROTATED_IN_R6: list[str] = [
    "stratified_resample_stats",
    "semantic_dedup_clusters",
    "curation_pipeline_summary",
    "events_gapfill_locf",
    "events_gapfill_interpolate",
    "bloom_semi_join_agg",
    "passage_dedup_scrub",
    "shard_manifest",
    "events_ewma_smooth",
    "source_cap_sample",
    "events_zscore_outliers",
    "knn_filtered_bruteforce",
    "doc_length_buckets",
    "corpus_upsample_stats",
    "q15_top_supplier",
    "fuzzy_name_block_join",
    "lineitem_price_qty_corr",
    "events_twap",
    "events_motif_search",
    "events_pair_correlation",
    "events_trend_slope",
    "events_variant_extract",
    "source_overlap_exact",
    "token_heavy_hitters_sketch",   # rows-only, CMS — weaker check ok
    "distinct_rollup_hll",          # rows-only, HLL
]

# Round-7 rotation (EXECUTED this round, window literal above): the 34
# candidates below rotated INTO the driver window for their first
# external CORRECTNESS row — the 22 round-2 window re-curation
# demotions plus the 12 late-r6 additions; 34 long-green shapes
# demoted to EXTRA_QUERIES (twin per entry there). Pinned by
# tests/test_parity.py::test_round7_rotated_operators_sit_in_declared_window.
# After this rotation EVERY oracle-backed query in the corpus has held
# a green external row in at least one round.
ROTATED_IN_R7: list[str] = [
    "q4_order_priority",
    "q7_nation_volume",
    "q10_returned_items",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_revenue_share",
    "q17_small_qty_revenue",
    "q19_disjunctive_filter",
    "q22_idle_customers",
    "sql_api_pricing_summary",
    "orders_by_year",
    "set_ops_all_variants",
    "unpivot_event_matrix",
    "window_running_total",
    "event_gaps",
    "token_frequencies",
    "string_functions",
    "agg_cube_year_status",
    "order_limit_topk",
    "window_rank_stats",
    "corpus_mix",
    "events_moving_stats",
    "doc_sparse_cosine_neardup",  # added r6, oracle-backed, never verified
    "doc_containment_pairs",      # added r6, oracle-backed, never verified
    "doc_lm_quality",             # added r6, oracle-backed, never verified
    "lm_quality_bands",           # added r6, oracle-backed, never verified
    "jl_projection_distortion",   # added r6, oracle-backed, never verified
    "corpus_datacard",            # added r6, oracle-backed, never verified
    "neardup_pagerank",           # added r6, oracle-backed, never verified
    "events_user_growth",         # added r6, oracle-backed, never verified
    "events_vwap",                # added r6, oracle-backed, never verified
    "events_drawdown",            # added r6, oracle-backed, never verified
    "dsir_importance_weights",    # added r6, oracle-backed, never verified
    "source_tv_drift",            # added r6, oracle-backed, never verified
]


# Round-8 rotation candidates (HISTORICAL — rotation EXECUTED round
# 9, see ROTATED_IN_R9): oracle-backed queries that had never held a
# green external CORRECTNESS row at the r8 close. Three of them were
# registered late in r8 with an "oracle-backed" claim their session
# never fulfilled (the r8 verdict's headline finding); their oracles
# and engine tests landed at the start of round 9, and all nine then
# rotated into the declared window.
ROTATION_CANDIDATES_R8: list[str] = [
    "q9_product_profit",          # added r8, oracle-backed
    "q11_important_stock",        # added r8, oracle-backed
    "q16_supplier_part_counts",   # added r8, oracle-backed
    "q20_part_promotion",         # added r8, oracle-backed
    "dup_span_extents",           # added r8, oracle-backed
    "events_mad_outliers",        # added r8, oracle-backed
    "doc_bm25_topk",              # added r8, oracle landed r9
    "hybrid_rrf_retrieval",       # added r8, oracle landed r9
    "source_ks_drift",            # added r8, oracle landed r9
]

# Round-9 rotation (EXECUTED this round, window literal above): all
# nine ROTATION_CANDIDATES_R8 rotated INTO the driver window for
# their first external CORRECTNESS row; nine twice-green (r7+r8)
# shapes demoted to EXTRA_QUERIES (twin per entry there). Pinned by
# tests/test_parity.py::test_round9_rotated_operators_sit_in_declared_window.
ROTATED_IN_R9: list[str] = list(ROTATION_CANDIDATES_R8)

# Round-9 rotation candidates: oracle-backed queries that have never
# held a green external CORRECTNESS row AND are not already in the
# declared window collecting one. Empty at the START of round 9 (the
# r9 rotation queued the whole backlog); every oracle-backed query
# added during round 9 must be listed here — POLICY (adopted after
# two consecutive rounds shipped claims ahead of artifacts): an entry
# may be added here, and may say "oracle-backed" anywhere, only in
# the commit that adds the oracle itself; the never-verified scan in
# tests/test_parity.py enforces listing, and the rotation-policy test
# is fast (<1 s) — run it before every end-of-round commit.
ROTATION_CANDIDATES_R9: list[str] = [
    "doc_bm25_from_index",        # added r9, oracle added same commit
    "doc_pmi_collocations",       # added r9, oracle added same commit
]

# Round-10 rotation (EXECUTED this round, window literal above): both
# ROTATION_CANDIDATES_R9 rotated INTO the driver window for their
# first external CORRECTNESS row; two thrice-green (r7+r8+r9) shapes
# demoted to EXTRA_QUERIES (twin per entry there). Pinned by
# tests/test_parity.py::test_round10_rotated_operators_sit_in_declared_window.
ROTATED_IN_R10: list[str] = list(ROTATION_CANDIDATES_R9)

# Round-10 rotation candidates: oracle-backed queries that have never
# held a green external CORRECTNESS row AND are not already in the
# declared window collecting one. Empty at the START of round 10 (the
# r10 rotation queued the whole backlog); every oracle-backed query
# added during round 10 must be listed here in the SAME commit that
# adds its oracle (the r9 policy, enforced by the never-verified scan
# in tests/test_parity.py).
ROTATION_CANDIDATES_R10: list[str] = [
    "doc_ngram_novelty",          # added r10, oracle added same commit
    "source_mix_weights",         # added r10, oracle added same commit
    "corpus_vocab_growth",        # added r10, oracle added same commit
    "corpus_snapshot_diff",       # added r10, oracle added same commit
    "source_embedding_drift",     # added r10, oracle added same commit
    "snapshot_change_magnitude",  # added r10, oracle added same commit
    "eval_leak_spans",            # added r10, oracle added same commit
]

# Round-11 rotation (EXECUTED this round, window literal above): all
# seven ROTATION_CANDIDATES_R10 rotated INTO the driver window for
# their first external CORRECTNESS row; seven four-times-green
# (r7+r8+r9+r10) shapes demoted to EXTRA_QUERIES (twin per entry
# there). Pinned by
# tests/test_parity.py::test_round11_rotated_operators_sit_in_declared_window.
ROTATED_IN_R11: list[str] = list(ROTATION_CANDIDATES_R10)

# Round-11 rotation candidates: oracle-backed queries that have never
# held a green external CORRECTNESS row AND are not already in the
# declared window collecting one. Empty at the START of round 11 (the
# r11 rotation queued the whole backlog); every oracle-backed query
# added during round 11 must be listed here in the SAME commit that
# adds its oracle (the r9 policy, enforced by the never-verified scan
# in tests/test_parity.py).
ROTATION_CANDIDATES_R11: list[str] = [
    "eval_leak_scrub",            # added r11, oracle added same commit
    "crawl_delta_apply",          # added r11, oracle added same commit
    "winnow_fingerprint_neardup",  # added r11, oracle added same commit
    "dup_span_scrub",             # added r11, oracle added same commit
    "source_chi2_drift",          # added r11, oracle added same commit
    "doc_repetition_signals",     # added r11, oracle added same commit
    "events_cohort_retention",    # added r11, oracle added same commit
    "events_markov_transitions",  # added r11, oracle added same commit
    "events_cusum_changepoint",   # added r11, oracle added same commit
    "doc_quality_signals",        # added r11, oracle added same commit
    "embedding_covariance_matrix",  # added r11, oracle added same commit
    "embedding_correlation_matrix",  # added r11, oracle added same commit
]

# Round-12 rotation (EXECUTED this round, window literal above): all
# twelve ROTATION_CANDIDATES_R11 rotated INTO the driver window for
# their first external CORRECTNESS row; twelve long-green (≥3 external
# rounds each) shapes demoted to EXTRA_QUERIES (twin per entry there).
# Pinned by
# tests/test_parity.py::test_round12_rotated_operators_sit_in_declared_window.
ROTATED_IN_R12: list[str] = list(ROTATION_CANDIDATES_R11)

# Round-12 rotation candidates: oracle-backed queries that have never
# held a green external CORRECTNESS row AND are not already in the
# declared window collecting one. Empty at the START of round 12 (the
# r12 rotation queued the whole backlog); every oracle-backed query
# added during round 12 must be listed here in the SAME commit that
# adds its oracle (the r9 policy, enforced by the never-verified scan
# in tests/test_parity.py).
ROTATION_CANDIDATES_R12: list[str] = [
    "image_dhash_neardup",        # added r12, oracle added same commit
    "image_dedup_keepers",        # added r12, oracle added same commit
    "events_cusum_bucketed",      # added r12, oracle added same commit
    "events_rfm_segments",        # added r12, oracle added same commit
    "video_frame_neardup",        # added r12, oracle added same commit
    "neardup_triangle_stats",     # added r12, oracle added same commit
    "interval_overlap_shipments",  # added r12, oracle added same commit
    "source_quality_floor",       # added r12, oracle added same commit
    "orders_dq_profile",          # added r12, oracle added same commit
]

# Round-13 rotation (EXECUTED this round, window literal above): all
# nine ROTATION_CANDIDATES_R12 rotated INTO the driver window for
# their first external CORRECTNESS row; nine long-green (≥3 external
# rounds each) shapes demoted to EXTRA_QUERIES (twin per entry there).
# Pinned by
# tests/test_parity.py::test_round13_rotated_operators_sit_in_declared_window.
ROTATED_IN_R13: list[str] = list(ROTATION_CANDIDATES_R12)

# Round-13 rotation candidates: oracle-backed queries that have never
# held a green external CORRECTNESS row AND are not already in the
# declared window collecting one. Empty at the START of round 13 (the
# r13 rotation queued the whole backlog); every oracle-backed query
# added during round 13 must be listed here in the SAME commit that
# adds its oracle (the r9 policy, enforced by the never-verified scan
# in tests/test_parity.py).
ROTATION_CANDIDATES_R13: list[str] = [
    "orders_benford_test",          # added r13, oracle added same commit
    "events_session_funnel_paths",  # added r13, oracle added same commit
    "source_gini_concentration",    # added r13, oracle added same commit
    "events_type_cooccurrence_lift",   # added r13, oracle same commit
    "docs_lang_source_independence",   # added r13, oracle same commit
    "embedding_outlier_docs",          # added r13, oracle same commit
    "events_rolling_active_users",     # added r13, oracle same commit
    "part_brand_price_anova",          # added r13, oracle same commit
]

# Round-14 rotation (EXECUTED this round, window literal above): all
# eight ROTATION_CANDIDATES_R13 rotated INTO the driver window for
# their first external CORRECTNESS row; eight long-green (≥3 external
# rounds each) shapes demoted to EXTRA_QUERIES (twin per entry there).
# Pinned by
# tests/test_parity.py::test_round14_rotated_operators_sit_in_declared_window.
ROTATED_IN_R14: list[str] = list(ROTATION_CANDIDATES_R13)

# Round-14 rotation candidates: oracle-backed queries that have never
# held a green external CORRECTNESS row AND are not already in the
# declared window collecting one. Empty at the START of round 14 (the
# r14 rotation queued the whole backlog); every oracle-backed query
# added during round 14 must be listed here in the SAME commit that
# adds its oracle (the r9 policy, enforced by the never-verified scan
# in tests/test_parity.py).
ROTATION_CANDIDATES_R14: list[str] = [
    "docs_source_lang_diversity",   # added r14, oracle added same commit
    "fk_orphan_audit",              # added r14, oracle added same commit
    "customer_revenue_pareto",      # added r14, oracle added same commit
    "events_conversion_latency",    # added r14, oracle added same commit
    "events_mannwhitney_value_test",  # added r14, oracle same commit
    "events_user_growth_accounting",  # added r14, oracle same commit
    "orders_price_skew_kurtosis",     # added r14, oracle same commit
    "docs_weighted_sample",           # added r14, oracle same commit
    "orders_fulfillment_lag",         # added r14, oracle same commit
    "part_brand_return_rates",        # added r14, oracle same commit
]

# Round-15 rotation (EXECUTED this round, window literal above): all
# ten ROTATION_CANDIDATES_R14 rotated INTO the driver window for
# their first external CORRECTNESS row; ten long-green (≥6 external
# rounds each) shapes demoted to EXTRA_QUERIES (twin per entry there).
# Pinned by
# tests/test_parity.py::test_round15_rotated_operators_sit_in_declared_window.
ROTATED_IN_R15: list[str] = list(ROTATION_CANDIDATES_R14)

# Round-15 rotation candidates: oracle-backed queries that have never
# held a green external CORRECTNESS row AND are not already in the
# declared window collecting one. Empty at the START of round 15 (the
# r15 rotation queued the whole backlog); every oracle-backed query
# added during round 15 must be listed here in the SAME commit that
# adds its oracle (the r9 policy, enforced by the never-verified scan
# in tests/test_parity.py).
ROTATION_CANDIDATES_R15: list[str] = []


# Frozen at the close of round 7: every oracle-backed query name that
# existed when the round-7 rotation completed (all have held a green
# external CORRECTNESS row in rounds 1-7, except events_vwap, which
# stays in the round-8 window to collect its row now that its oracle's
# HUGEINT projection is cast to BIGINT). Any oracle-backed query NOT
# in this set was added in round 8 or later and must appear in
# ROTATION_CANDIDATES_R8 or already sit in the declared window --
# enforced by tests/test_parity.py::test_rotation_candidates_are_rotatable.
ORACLE_BACKED_AT_R7_CLOSE: frozenset = frozenset({
    "a1_latest_per_key",
    "a1_latest_with_ttl",
    "agg_cube_year_status",
    "agg_orders_stats",
    "agg_rollup",
    "asof_join_purchase_click",
    "bloom_semi_join_agg",
    "contamination_check",
    "corpus_datacard",
    "corpus_mix",
    "corpus_upsample_stats",
    "curation_pipeline_summary",
    "dedup_cluster_keepers",
    "dedup_exact",
    "dedup_fingerprint",
    "distinct_count_exact",
    "doc_containment_pairs",
    "doc_length_buckets",
    "doc_lm_quality",
    "doc_rolling_fingerprint",
    "doc_sparse_cosine_neardup",
    "doc_top_terms",
    "dsir_importance_weights",
    "embedding_cosine_neardup",
    "embedding_norm_stats",
    "embedding_quantize_stats",
    "event_gaps",
    "events_drawdown",
    "events_ewma_smooth",
    "events_funnel_conversion",
    "events_gapfill_interpolate",
    "events_gapfill_locf",
    "events_motif_search",
    "events_moving_stats",
    "events_ohlc_bars",
    "events_pair_correlation",
    "events_sessionization",
    "events_trend_slope",
    "events_tumbling_window",
    "events_twap",
    "events_user_growth",
    "events_variant_extract",
    "events_vwap",
    "events_zscore_outliers",
    "fuzzy_name_block_join",
    "j2_anti_join_unmatched",
    "j2_semi_join_auth",
    "jl_projection_distortion",
    "knn_bruteforce",
    "knn_filtered_bruteforce",
    "lineitem_price_qty_corr",
    "lm_quality_bands",
    "minhash_neardup",
    "multimodal_binary_meta",
    "neardup_pagerank",
    "ngram_jaccard_neardup",
    "order_limit_topk",
    "orders_by_year",
    "orders_cohort_matrix",
    "p10_api_key_hash",
    "p11_wire_json",
    "p1_validation_filter",
    "p3_flatten_payload",
    "p4_value_rules",
    "p5p6p7_config_pipeline",
    "p8_conditional_gate",
    "p9_exchange_enrichment",
    "pack_sequences_chunked",
    "passage_dedup_scrub",
    "pii_scrub_stats",
    "pivot_event_matrix",
    "q10_returned_items",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q1_pricing_summary",
    "q21_sole_late_supplier",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q3_top_revenue_orders",
    "q4_order_priority",
    "q5_region_nation_revenue",
    "q6_revenue_delta",
    "q7_nation_volume",
    "q8_nation_market_share",
    "range_join_click_context",
    "rolling_fingerprint_neardup",
    "semantic_dedup_clusters",
    "set_ops_all_variants",
    "set_ops_status_migration",
    "shard_manifest",
    "skew_salted_agg",
    "source_cap_sample",
    "source_overlap_exact",
    "source_tv_drift",
    "sql_api_pricing_summary",
    "stratified_resample_stats",
    "string_functions",
    "text_bpe_token_estimate",
    "text_langid",
    "text_quality_score",
    "text_repetition",
    "text_token_stats",
    "token_frequencies",
    "train_test_split_hash",
    "unpivot_event_matrix",
    "value_percentiles",
    "window_rank_stats",
    "window_running_total",
    "window_topk_per_group",
})


# Frozen at the close of round 8: the round-7 set plus the nine
# round-8 additions (ROTATION_CANDIDATES_R8). All round-7-close names
# held a green external row in rounds 1-8; the nine additions sit in
# the round-9 window collecting theirs. Any oracle-backed query NOT
# in this set was added in round 9 or later and must appear in
# ROTATION_CANDIDATES_R9 or already sit in the declared window --
# enforced by tests/test_parity.py::test_rotation_candidates_are_rotatable.
ORACLE_BACKED_AT_R8_CLOSE: frozenset = frozenset(
    ORACLE_BACKED_AT_R7_CLOSE | set(ROTATION_CANDIDATES_R8))

# Frozen at the close of round 9: the round-8 set plus the two
# round-9 additions (ROTATION_CANDIDATES_R9), which sit in the
# round-10 window collecting their first external row. Any
# oracle-backed query NOT in this set was added in round 10 or later
# and must appear in ROTATION_CANDIDATES_R10 or already sit in the
# declared window — enforced by
# tests/test_parity.py::test_rotation_candidates_are_rotatable.
ORACLE_BACKED_AT_R9_CLOSE: frozenset = frozenset(
    ORACLE_BACKED_AT_R8_CLOSE | set(ROTATION_CANDIDATES_R9))

# Frozen at the close of round 10: the round-9 set plus the seven
# round-10 additions (ROTATION_CANDIDATES_R10), which sit in the
# round-11 window collecting their first external row. Any
# oracle-backed query NOT in this set was added in round 11 or later
# and must appear in ROTATION_CANDIDATES_R11 or already sit in the
# declared window — enforced by
# tests/test_parity.py::test_rotation_candidates_are_rotatable.
ORACLE_BACKED_AT_R10_CLOSE: frozenset = frozenset(
    ORACLE_BACKED_AT_R9_CLOSE | set(ROTATION_CANDIDATES_R10))

# Frozen at the close of round 11: the round-10 set plus the twelve
# round-11 additions (ROTATION_CANDIDATES_R11), which sit in the
# round-12 window collecting their first external row. Any
# oracle-backed query NOT in this set was added in round 12 or later
# and must appear in ROTATION_CANDIDATES_R12 or already sit in the
# declared window — enforced by
# tests/test_parity.py::test_rotation_candidates_are_rotatable.
ORACLE_BACKED_AT_R11_CLOSE: frozenset = frozenset(
    ORACLE_BACKED_AT_R10_CLOSE | set(ROTATION_CANDIDATES_R11))

# Frozen at the close of round 12: the round-11 set plus the nine
# round-12 additions (ROTATION_CANDIDATES_R12), which sit in the
# round-13 window collecting their first external row. Any
# oracle-backed query NOT in this set was added in round 13 or later
# and must appear in ROTATION_CANDIDATES_R13 or already sit in the
# declared window — enforced by
# tests/test_parity.py::test_rotation_candidates_are_rotatable.
ORACLE_BACKED_AT_R12_CLOSE: frozenset = frozenset(
    ORACLE_BACKED_AT_R11_CLOSE | set(ROTATION_CANDIDATES_R12))

# Frozen at the close of round 13: the round-12 set plus the eight
# round-13 additions (ROTATION_CANDIDATES_R13), which sit in the
# round-14 window collecting their first external row. Any
# oracle-backed query NOT in this set was added in round 14 or later
# and must appear in ROTATION_CANDIDATES_R14 or already sit in the
# declared window — enforced by
# tests/test_parity.py::test_rotation_candidates_are_rotatable.
ORACLE_BACKED_AT_R13_CLOSE: frozenset = frozenset(
    ORACLE_BACKED_AT_R12_CLOSE | set(ROTATION_CANDIDATES_R13))

# Frozen at the close of round 14: the round-13 set plus the ten
# round-14 additions (ROTATION_CANDIDATES_R14), which sit in the
# round-15 window collecting their first external row. Any
# oracle-backed query NOT in this set was added in round 15 or later
# and must appear in ROTATION_CANDIDATES_R15 or already sit in the
# declared window — enforced by
# tests/test_parity.py::test_rotation_candidates_are_rotatable.
ORACLE_BACKED_AT_R14_CLOSE: frozenset = frozenset(
    ORACLE_BACKED_AT_R13_CLOSE | set(ROTATION_CANDIDATES_R14))
