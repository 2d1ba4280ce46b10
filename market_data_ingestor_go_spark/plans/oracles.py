"""DuckDB oracle SQL twins for plans/queries.py.

Each statement runs against pre-registered views (region nation customer
supplier part orders lineitem events documents embeddings) and must
match the Spark result on row-count + schema + order-insensitive
value-hash. See queries.py module doc for the cross-engine determinism
rules (decimal-cast sums, epoch-millis timestamps, unique tiebreaks).

Queries intentionally absent (rows-only driver check):
- simhash_neardup, embedding_lsh_neardup, knn_ann_hyperplane,
  knn_ann_ivf, knn_ann_pq : depend on Spark's xxhash64 / engine-side
  LSH bucketing / trained codebooks — not SQL-expressible.
- approx_distinct_sketch (EXTRA)      : HLL estimates are
  engine-specific by construction.
- distinct_rollup_hll, source_overlap_theta (EXTRA) : Datasketches
  HLL / theta estimates are engine-specific; exact twins are
  distinct_count_exact and source_overlap_exact, and sketch↔exact
  agreement is asserted in tests/test_operators.py.
- value_quantiles_kll (EXTRA)         : KLL compaction is randomized
  (not even run-repeatable); tests pin the sketch's rank-error
  contract instead; exact twin value_percentiles.
- pack_greedy_packing (EXTRA)         : greedy applyInPandas packer,
  property-tested instead.
- semdedup_keepers (EXTRA)            : engine-trained k-means cells;
  exact twin semantic_dedup_clusters, coverage floor in tests.
"""

DSUM = "CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


def _dsum(expr: str) -> str:
    return DSUM.format(expr=expr)


ORACLES: dict[str, str] = {}

ORACLES["q1_pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum('l_quantity')} AS sum_qty,
       {_dsum('l_extendedprice')} AS sum_base_price,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_dsum('l_quantity')} / COUNT(*) AS avg_qty,
       {_dsum('l_extendedprice')} / COUNT(*) AS avg_price,
       {_dsum('l_discount')} / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q3_top_revenue_orders"] = f"""
SELECT o_orderkey, o_orderpriority,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       epoch_ms(o_orderdate) AS o_orderdate_ms
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderpriority, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

ORACLES["q5_region_nation_revenue"] = f"""
SELECT r_name, n_name,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY r_name, n_name
"""

ORACLES["q6_revenue_delta"] = f"""
SELECT {_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06
  AND l_quantity < 24
"""

ORACLES["p1_validation_filter"] = """
SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS ts_ms
FROM events
WHERE event_type <> '' AND user_id IS NOT NULL
  AND value > 0 AND epoch_ms(ts) > 0
"""

ORACLES["p3_flatten_payload"] = """
SELECT event_id, event_type, value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""

ORACLES["p4_value_rules"] = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice + 10.0 AS price_add,
       l_extendedprice - 5.0  AS price_sub,
       l_quantity * 2.0       AS qty_mul,
       CASE WHEN l_discount <> 0 THEN l_extendedprice / l_discount
            ELSE l_extendedprice END AS price_div_guarded
FROM lineitem
"""

ORACLES["p5p6p7_config_pipeline"] = """
SELECT event_id, event_type, value * 1.1 AS price, user_id,
       'replay' AS source_tag, epoch_ms(ts) AS ts_ms
FROM events
"""

ORACLES["p8_conditional_gate"] = """
SELECT event_id, event_type,
       CASE WHEN event_type IN ('click', 'view') THEN value * 2.0
            ELSE value END AS value_t
FROM events
"""

ORACLES["p9_exchange_enrichment"] = """
SELECT c_custkey, COALESCE(d.exchange, 'unknown') AS exchange
FROM customer
LEFT JOIN (
  SELECT n_nationkey, r_name AS exchange
  FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name IN ('ASIA', 'EUROPE')
) d ON c_nationkey = d.n_nationkey
"""

ORACLES["p10_api_key_hash"] = """
SELECT c_custkey, sha256(c_name) AS key_hash
FROM customer
WHERE c_acctbal > 0
"""

ORACLES["p11_wire_json"] = """
SELECT n_nationkey,
       to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name)) AS wire
FROM nation
"""

ORACLES["j2_semi_join_auth"] = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

ORACLES["j2_anti_join_unmatched"] = """
WITH probes AS (
  SELECT c_custkey, c_name FROM customer
  UNION ALL
  SELECT CAST(c_custkey + 1000000 AS BIGINT) AS c_custkey,
         concat('ghost:', c_name) AS c_name
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT c_custkey, c_name FROM probes p
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = p.c_custkey)
"""

ORACLES["a1_latest_per_key"] = """
SELECT user_id, ts_ms, event_id, event_type, value FROM (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""

ORACLES["a1_latest_with_ttl"] = """
SELECT user_id, ts_ms, event_id, event_type, value FROM (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
  FROM events
  WHERE epoch_ms(ts) >= (SELECT MAX(epoch_ms(ts)) FROM events) - 86400000
) WHERE rn = 1
"""

ORACLES["agg_orders_stats"] = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice')} AS sum_total,
       MIN(o_totalprice) AS min_total,
       MAX(o_totalprice) AS max_total,
       {_dsum('o_totalprice')} / COUNT(*) AS avg_total
FROM orders
GROUP BY o_orderstatus, o_orderpriority
"""

ORACLES["agg_rollup"] = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice')} AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

ORACLES["distinct_count_exact"] = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""

ORACLES["window_topk_per_group"] = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""

ORACLES["order_limit_topk"] = """
SELECT p_partkey, p_name, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey
LIMIT 20
"""

ORACLES["set_ops_status_migration"] = """
SELECT o_custkey, 'only_open' AS tag FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT o_custkey, 'both' AS tag FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""

ORACLES["set_ops_all_variants"] = """
SELECT o_custkey, 'open_minus_fin_all' AS tag FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT o_custkey, 'both_all' AS tag FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""

ORACLES["unpivot_event_matrix"] = """
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE event_type IN ('click', 'view', 'purchase', 'signup', 'error')
GROUP BY user_id, event_type
"""

ORACLES["window_rank_stats"] = """
SELECT o_custkey, o_orderkey,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       percent_rank() OVER w AS prnk,
       ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey)
"""

ORACLES["pivot_event_matrix"] = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error
FROM events
GROUP BY user_id
"""

ORACLES["events_tumbling_window"] = """
SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,10))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""

ORACLES["events_sessionization"] = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000 THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_in_session
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_in_session) AS BIGINT) AS n_events,
       CAST(SUM(n_in_session) AS DOUBLE) / COUNT(*) AS avg_events_per_session
FROM per_session
GROUP BY user_id
"""

ORACLES["asof_join_purchase_click"] = """
WITH c AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events
  WHERE event_type = 'click'),
p AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events
  WHERE event_type = 'purchase'),
j AS (
  SELECT p.event_id AS purchase_id, p.user_id,
         p.ts_ms AS purchase_ts_ms, c.ts_ms AS click_ts_ms,
         c.event_id AS click_event_id,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts_ms DESC, c.event_id DESC) AS rn
  FROM p JOIN c ON p.user_id = c.user_id AND c.ts_ms <= p.ts_ms)
SELECT purchase_id, user_id, purchase_ts_ms, click_ts_ms, click_event_id
FROM j WHERE rn = 1
"""

ORACLES["value_percentiles"] = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""

ORACLES["agg_cube_year_status"] = f"""
SELECT year(o_orderdate) AS order_year, o_orderstatus,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice')} AS sum_total
FROM orders
GROUP BY CUBE (order_year, o_orderstatus)
"""

ORACLES["token_frequencies"] = """
SELECT token, COUNT(*) AS n FROM (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""

ORACLES["window_running_total"] = """
SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
FROM orders
"""

ORACLES["event_gaps"] = """
WITH g AS (
  SELECT user_id,
         epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap_ms
  FROM events)
SELECT user_id, COUNT(*) AS n_gaps,
       CAST(SUM(gap_ms) AS BIGINT) AS total_gap_ms,
       MAX(gap_ms) AS max_gap_ms,
       CAST(SUM(gap_ms) AS DOUBLE) / COUNT(*) AS avg_gap_ms
FROM g WHERE gap_ms IS NOT NULL
GROUP BY user_id
"""

ORACLES["orders_by_year"] = f"""
SELECT year(o_orderdate) AS order_year,
       quarter(o_orderdate) AS order_quarter,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice')} AS sum_total
FROM orders
GROUP BY 1, 2
"""

ORACLES["string_functions"] = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_type, 1, 5) AS type_prefix,
       length(p_name) AS name_len,
       concat_ws('/', p_brand, p_type) AS brand_type,
       replace(p_brand, '#', '_') AS brand_safe
FROM part
WHERE p_size >= 25
"""

ORACLES["range_join_click_context"] = """
WITH c AS (
  SELECT user_id, epoch_ms(ts) AS c_ts FROM events WHERE event_type = 'click'),
e AS (
  SELECT event_id AS error_id, user_id, epoch_ms(ts) AS e_ts
  FROM events WHERE event_type = 'error')
SELECT e.error_id, e.user_id, e.e_ts,
       CAST(COUNT(c.c_ts) AS BIGINT) AS n_clicks_prior_hour
FROM e LEFT JOIN c
  ON e.user_id = c.user_id
 AND c.c_ts <= e.e_ts AND c.c_ts > e.e_ts - 3600000
GROUP BY e.error_id, e.user_id, e.e_ts
"""

ORACLES["q18_large_orders"] = """
SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
       CAST(qty AS DOUBLE) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(27,6))) AS qty
  FROM lineitem GROUP BY l_orderkey HAVING qty > 300
) b ON o_orderkey = b.l_orderkey
"""

ORACLES["q2_min_cost_supplier"] = """
SELECT s_suppkey, s_name, n_name, s_acctbal
FROM supplier
JOIN (SELECT s_nationkey, MIN(s_acctbal) AS min_bal
      FROM supplier GROUP BY s_nationkey) m USING (s_nationkey)
JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = min_bal
"""

ORACLES["q7_nation_volume"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS ship_year,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""

ORACLES["q21_sole_late_supplier"] = """
WITH j AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supps
  FROM j GROUP BY l_orderkey),
late_lines AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM j WHERE late)
SELECT l.l_suppkey, COUNT(*) AS n_sole_late_orders
FROM late_lines l
JOIN per_order p ON l.l_orderkey = p.l_orderkey
WHERE p.n_supps > 1 AND p.n_late_supps = 1
GROUP BY l.l_suppkey
"""

ORACLES["sql_api_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q8_nation_market_share"] = """
SELECT year(o_orderdate) AS order_year,
       CAST(SUM(CASE WHEN n_name = 'NATION_1'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
                     ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
       AS nation1_share,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1
"""

ORACLES["q12_late_shipment_priority"] = """
SELECT year(o_orderdate) AS order_year,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS late_critical,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS late_other
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY 1
"""

ORACLES["q14_promo_revenue_share"] = """
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
                     ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
       * 100.0 AS promo_share_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-07-01'
"""

ORACLES["q19_disjunctive_filter"] = f"""
SELECT {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size <= 30 AND l_quantity >= 20)
   OR (p_brand = 'Brand#3' AND p_size <= 45 AND l_quantity >= 30)
"""

ORACLES["q22_idle_customers"] = f"""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS v
  FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       {_dsum('c_acctbal')} AS total_balance
FROM customer, avg_bal
WHERE c_acctbal > avg_bal.v
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""

ORACLES["skew_salted_agg"] = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_rows,
       CAST(MAX(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""

ORACLES["dedup_exact"] = """
SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents
GROUP BY text
"""

ORACLES["dedup_fingerprint"] = """
SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
       MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""

_SHINGLES = """
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in range(1, len(w) - 1)]) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents)
  WHERE len(w) >= 3
"""

_JACCARD_PAIRS = f"""
WITH s AS ({_SHINGLES})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jacc
FROM s a JOIN s b ON a.doc_id < b.doc_id
"""

ORACLES["ngram_jaccard_neardup"] = f"""
SELECT doc_a, doc_b, jacc FROM ({_JACCARD_PAIRS}) WHERE jacc >= 0.6
"""

# MinHash+LSH verifies candidates with exact Jaccard, and banding
# recall at this threshold/data is 1.0 (asserted in tests at sf0.01) —
# so the exact-Jaccard SQL is a valid oracle for the LSH path too.
ORACLES["minhash_neardup"] = ORACLES["ngram_jaccard_neardup"]

_COS = ("list_inner_product({a}, {b}) / "
        "sqrt(list_inner_product({a}, {a}) * list_inner_product({b}, {b}))")

ORACLES["embedding_cosine_neardup"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {_COS.format(a='a.v', b='b.v')} AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_COS.format(a='a.v', b='b.v')} >= 0.4
"""

ORACLES["knn_bruteforce"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         {_COS.format(a='q.v', b='c.v')} AS cos
  FROM q JOIN e c ON q.vec_id <> c.vec_id)
SELECT q_id, n_id, cos, rn FROM (
  SELECT q_id, n_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn
  FROM scored
) WHERE rn <= 5
"""

ORACLES["embedding_norm_stats"] = """
WITH n AS (
  SELECT label,
         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings)
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(CAST(nrm AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS avg_norm,
       MIN(nrm) AS min_norm,
       MAX(nrm) AS max_norm
FROM n GROUP BY label
"""

_STOP = "['the', 'a', 'and', 'of', 'to']"

ORACLES["text_token_stats"] = """
WITH t AS (
  SELECT lang, n_chars,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM t GROUP BY lang
"""

ORACLES["text_quality_score"] = f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> list_contains({_STOP}, x))) AS n_stop
  FROM documents)
SELECT doc_id, n_tokens,
       CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
       (n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.5) AS keep
FROM t
"""

ORACLES["text_langid"] = f"""
WITH t AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> list_contains({_STOP}, x))) AS n_stop
  FROM documents)
SELECT doc_id, lang,
       CASE WHEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.03
            THEN 'en' ELSE 'other' END AS lang_pred,
       (CASE WHEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.03
             THEN 'en' ELSE 'other' END = lang) AS agree
FROM t
"""

ORACLES["multimodal_binary_meta"] = """
SELECT doc_id,
       octet_length(encode(text)) AS byte_len,
       sha256(text) AS content_sha256,  -- this DuckDB's sha256 is VARCHAR-only; hashes the same UTF-8 bytes
       lower(substring(hex(encode(text)), 1, 16)) AS prefix_hex
FROM documents
"""

# ------------------------------------------------------------------
# Oracles for EXTRA_QUERIES (plans/queries.py): shapes pruned from the
# driver's 50-entry correctness window but still parity-tested locally
ORACLES["q4_order_priority"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""

ORACLES["q10_returned_items"] = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

ORACLES["q13_customer_distribution"] = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus <> 'F') o
    ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
"""

ORACLES["q17_small_qty_revenue"] = """
WITH t AS (
  SELECT l_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                / COUNT(*)) AS qty_threshold
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
  GROUP BY l_partkey)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem JOIN t ON lineitem.l_partkey = t.l_partkey
WHERE l_quantity < qty_threshold
"""


ORACLES["events_funnel_conversion"] = """
WITH u AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END)
           AS first_click,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END)
           AS first_purchase
  FROM events GROUP BY user_id)
SELECT COUNT(CASE WHEN first_click IS NOT NULL THEN 1 END) AS n_clickers,
       COUNT(CASE WHEN first_click IS NOT NULL
                   AND first_purchase IS NOT NULL
                   AND first_purchase >= first_click THEN 1 END)
         AS n_converted,
       CAST(COUNT(CASE WHEN first_click IS NOT NULL
                        AND first_purchase IS NOT NULL
                        AND first_purchase >= first_click THEN 1 END)
            AS DOUBLE)
         / COUNT(CASE WHEN first_click IS NOT NULL THEN 1 END)
         AS conversion_rate
FROM u
"""

ORACLES["orders_cohort_matrix"] = """
WITH f AS (
  SELECT o_custkey, year(MIN(o_orderdate)) AS cohort_year
  FROM orders GROUP BY o_custkey)
SELECT cohort_year, year(o_orderdate) AS order_year,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT orders.o_custkey) AS n_active_custs
FROM orders JOIN f ON orders.o_custkey = f.o_custkey
GROUP BY cohort_year, year(o_orderdate)
"""

ORACLES["embedding_quantize_stats"] = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS max_abs
  FROM e)
SELECT vec_id, max_abs,
       list_max([abs(v[i] - CAST(floor(v[i] * (127.0 / max_abs) + 0.5)
                                 AS INTEGER) / (127.0 / max_abs))
                 for i in range(1, len(v) + 1)]) AS max_quant_err,
       CAST(list_sum([abs(CAST(floor(v[i] * (127.0 / max_abs) + 0.5)
                                AS INTEGER))
                      for i in range(1, len(v) + 1)]) AS BIGINT) AS l1_q
FROM s
"""

ORACLES["events_moving_stats"] = """
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events)
SELECT user_id, event_id, ts_ms,
       CAST(SUM(CAST(value AS DECIMAL(27,10))) OVER w AS DOUBLE) AS mov_sum,
       CAST(SUM(CAST(value AS DECIMAL(27,10))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS mov_avg,
       MIN(value) OVER w AS mov_min,
       MAX(value) OVER w AS mov_max,
       COUNT(*) OVER w AS frame_n
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""

ORACLES["text_repetition"] = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents),
s AS (
  SELECT doc_id,
         greatest(len(w) - 2, 0) AS n_ngrams,
         CASE WHEN len(w) >= 3 THEN
           len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]))
         ELSE 0 END AS n_distinct
  FROM t)
SELECT doc_id,
       CAST(n_ngrams AS INTEGER) AS n_ngrams,
       CAST(n_distinct AS INTEGER) AS n_distinct,
       CASE WHEN n_ngrams > 0 THEN
         CAST(1.0 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / n_ngrams
       ELSE CAST(0.0 AS DOUBLE) END AS rep_ratio
FROM s
"""


# hash-bucket fragment shared by the training-pipeline oracles
# (mirrors operators/training.py::hash_bucket — md5 so both engines
# agree bit-for-bit)
_BUCKET = ("CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
           "AS BIGINT) % {n}")
_NTOK = "len(regexp_split_to_array(trim(text), '\\s+'))"

ORACLES["events_ohlc_bars"] = """
WITH e AS (
  SELECT epoch_ms(ts) AS ts_ms, event_id, event_type, value FROM events),
r AS (
  SELECT (ts_ms // 900000) * 900000 AS bar_start_ms, event_type, value,
         row_number() OVER (PARTITION BY ts_ms // 900000, event_type
                            ORDER BY ts_ms, event_id) AS rna,
         row_number() OVER (PARTITION BY ts_ms // 900000, event_type
                            ORDER BY ts_ms DESC, event_id DESC) AS rnd
  FROM e)
SELECT bar_start_ms, event_type,
       MAX(CASE WHEN rna = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rnd = 1 THEN value END) AS close,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,10))) AS DOUBLE) AS sum_value
FROM r GROUP BY 1, 2
"""

ORACLES["pack_sequences_chunked"] = f"""
WITH t AS (
  SELECT doc_id, {_BUCKET.format(n=32)} AS stream,
         CAST({_NTOK} AS BIGINT) AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, stream, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_offset
  FROM t)
SELECT doc_id, stream, CAST(n_tokens AS INTEGER) AS n_tokens, start_offset,
       CAST(start_offset // 2048 AS BIGINT) AS chunk_id
FROM s
"""

ORACLES["train_test_split_hash"] = f"""
WITH b AS (
  SELECT {_BUCKET.format(n=100)} AS bk, CAST({_NTOK} AS BIGINT) AS n_tokens
  FROM documents)
SELECT CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM b GROUP BY 1
"""

ORACLES["corpus_mix"] = f"""
WITH g AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM({_NTOK}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang)
SELECT lang, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS BIGINT)
         AS token_share,
       (CAST(1.0 AS DOUBLE) / COUNT(*) OVER ())
         / (CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS BIGINT))
         AS mix_weight
FROM g
"""

# patterns mirror functions/text.py::PII_PATTERNS verbatim (both are
# Java-regex ∩ RE2-safe); DuckDB regexp_replace needs the 'g' flag
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+?[0-9][0-9 ()-]{7,}[0-9]"
_PII_IPV4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

ORACLES["pii_scrub_stats"] = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INTEGER) AS n_email,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS INTEGER) AS n_phone,
       length(regexp_replace(regexp_replace(regexp_replace(text,
              '{_PII_EMAIL}', '[PII]', 'g'),
              '{_PII_PHONE}', '[PII]', 'g'),
              '{_PII_IPV4}', '[PII]', 'g')) AS clean_len
FROM documents
"""

# (tests/test_parity.py runs ORACLES ∪ EXTRA_ORACLES). oracle_sql()
# exposes only ORACLES, matching the declared queries() window.
# Round-5 rotation: train/test split, PII scrub, repetition, quantize,
# funnel, cohort stayed in ORACLES (promoted to the window); the 12
# oracle-backed shapes demoted from the window moved here.
EXTRA_ORACLES: dict[str, str] = {
    k: ORACLES.pop(k) for k in [
        "q7_nation_volume",
        "q12_late_shipment_priority",
        "q14_promo_revenue_share",
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
        "q4_order_priority",
        "q10_returned_items",
        "q13_customer_distribution",
        "q17_small_qty_revenue",
        "events_moving_stats",
        # demoted round 5 (each keeps an in-window plan-shape twin)
        "p11_wire_json",
        "q2_min_cost_supplier",
        "q3_top_revenue_orders",
        "q6_revenue_delta",
        "q8_nation_market_share",
        "q18_large_orders",
        "q21_sole_late_supplier",
        "agg_rollup",
        "distinct_count_exact",
        "pivot_event_matrix",
        "a1_latest_with_ttl",
        "events_tumbling_window",
    ]
}

# weighted_resample's keep-coin is md5('resample:v1:' || id) — the same
# engine-independent construction as _BUCKET, so the sampled SET (not
# just its size) matches bit-for-bit across engines.
EXTRA_ORACLES["stratified_resample_stats"] = f"""
WITH kept AS (
  SELECT lang, text FROM documents
  WHERE (CAST(concat('0x', substring(md5(concat('resample:v1:',
            CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 1000000)
        / 1000000.0
        < CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.25 ELSE 1.0 END)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM({_NTOK}) AS BIGINT) AS n_tokens
FROM kept GROUP BY lang
"""

# same reachability fixpoint as dedup_cluster_keepers, over the exact
# cosine pair graph instead of the Jaccard one
EXTRA_ORACLES["semantic_dedup_clusters"] = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE {_COS.format(a='a.v', b='b.v')} >= 0.4
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
), comp AS (
  SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id
)
SELECT cluster_id AS keeper_id, CAST(COUNT(*) AS BIGINT) AS n_members
FROM comp GROUP BY cluster_id
"""

# gapfill + LOCF: same last-observation convention as the OHLC close
# (row_number desc), grid via generate_series, fill via IGNORE NULLS
EXTRA_ORACLES["events_gapfill_locf"] = """
WITH e AS (
  SELECT epoch_ms(ts) AS ts_ms, event_id, event_type, value FROM events),
r AS (
  SELECT event_type, (ts_ms // 900000) * 900000 AS b, value,
         row_number() OVER (PARTITION BY event_type, ts_ms // 900000
                            ORDER BY ts_ms DESC, event_id DESC) AS rn
  FROM e),
pb AS (
  SELECT event_type, b, MAX(CASE WHEN rn = 1 THEN value END) AS v_obs
  FROM r GROUP BY 1, 2),
bounds AS (
  SELECT event_type, MIN(b) AS lo, MAX(b) AS hi FROM pb GROUP BY 1),
grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, 900000)) AS b
  FROM bounds),
j AS (
  SELECT g.event_type, g.b, pb.v_obs
  FROM grid g LEFT JOIN pb ON g.event_type = pb.event_type AND g.b = pb.b)
SELECT event_type, b AS bucket_start_ms,
       last_value(v_obs IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS value_locf,
       v_obs IS NULL AS is_gap
FROM j
"""

# linear interpolation twin — identical expression ORDER to the Spark
# operator (prev + (next-prev)*frac) so doubles stay bit-exact
EXTRA_ORACLES["events_gapfill_interpolate"] = """
WITH e AS (
  SELECT epoch_ms(ts) AS ts_ms, event_id, event_type, value FROM events),
r AS (
  SELECT event_type, (ts_ms // 900000) * 900000 AS b, value,
         row_number() OVER (PARTITION BY event_type, ts_ms // 900000
                            ORDER BY ts_ms DESC, event_id DESC) AS rn
  FROM e),
pb AS (
  SELECT event_type, b, MAX(CASE WHEN rn = 1 THEN value END) AS v_obs
  FROM r GROUP BY 1, 2),
bounds AS (
  SELECT event_type, MIN(b) AS lo, MAX(b) AS hi FROM pb GROUP BY 1),
grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, 900000)) AS b
  FROM bounds),
j AS (
  SELECT g.event_type, g.b, pb.v_obs
  FROM grid g LEFT JOIN pb ON g.event_type = pb.event_type AND g.b = pb.b),
x AS (
  SELECT event_type, b, v_obs,
         last_value(v_obs IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(CASE WHEN v_obs IS NOT NULL THEN b END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_b,
         first_value(v_obs IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY b
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN v_obs IS NOT NULL THEN b END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY b
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_b
  FROM j)
SELECT event_type, b AS bucket_start_ms,
       CASE WHEN v_obs IS NOT NULL THEN v_obs
            WHEN next_b IS NULL THEN prev_v
            ELSE prev_v + (next_v - prev_v)
                 * (CAST(b - prev_b AS DOUBLE)
                    / CAST(next_b - prev_b AS DOUBLE))
       END AS value_interp,
       v_obs IS NULL AS is_gap
FROM x
"""

# the curation funnel composed end-to-end: quality gate → exact dedup
# (min-id keeper) → md5-bucket split → per-split stats
EXTRA_ORACLES["curation_pipeline_summary"] = f"""
WITH q AS (
  SELECT doc_id, text,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> list_contains({_STOP}, x))) AS n_stop
  FROM documents),
kept AS (
  SELECT doc_id, text, n_tokens FROM q
  WHERE n_tokens >= 20
    AND CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.5),
dedup AS (
  SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens
  FROM kept GROUP BY text),
s AS (
  SELECT n_tokens,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS bk
  FROM dedup)
SELECT CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM s GROUP BY 1
"""

# -- round-3 additions (promoted to the declared window in round 5) ------------------------------------------

# Connected components over the exact-Jaccard pair graph as a
# recursive-CTE reachability fixpoint: every node's label is the min id
# it can reach, identical to the engine's min-label propagation.
ORACLES["dedup_cluster_keepers"] = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS}) WHERE jacc >= 0.6
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
), comp AS (
  SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id
)
SELECT cluster_id AS keeper_id, CAST(COUNT(*) AS BIGINT) AS n_members
FROM comp GROUP BY 1
"""

# Same BPE-ish pattern string as functions/text.py (Java ∩ RE2).
_BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
_BPE_ISH_SQL = _BPE_ISH.replace("'", "''")  # SQL-literal apostrophe

ORACLES["text_bpe_token_estimate"] = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_ISH_SQL}')) AS BIGINT) AS n_bpe,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws,
       CAST(len(regexp_extract_all(text, '{_BPE_ISH_SQL}')) AS DOUBLE)
       / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
         AS bpe_per_ws
FROM documents
"""

# Rabin-Karp over 8-token windows; token hash = md5-prefix integer
# (the cross-engine recipe), every product mod-reduced before the sum.
_ROLL_P = (1 << 31) - 1
_ROLL_POWERS = [pow(257, 8 - 1 - k, _ROLL_P) for k in range(8)]
_ROLL_TERMS = " + ".join(
    f"(hs[i + {k}] * {_ROLL_POWERS[k]}) % {_ROLL_P}" for k in range(8))

ORACLES["doc_rolling_fingerprint"] = f"""
WITH h AS (
  SELECT doc_id,
         list_transform(regexp_split_to_array(trim(text), '\\s+'),
                        t -> CAST(concat('0x', substring(md5(t), 1, 8))
                                  AS BIGINT)) AS hs
  FROM documents
), w AS (
  SELECT doc_id,
         [({_ROLL_TERMS}) % {_ROLL_P}
          for i in range(1, len(hs) - 8 + 2)] AS wh
  FROM h
)
SELECT doc_id,
       CAST(len(wh) AS BIGINT) AS n_windows,
       CAST(len(list_distinct(wh)) AS BIGINT) AS n_distinct,
       list_min(wh) AS min_whash
FROM w
"""

ORACLES["rolling_fingerprint_neardup"] = f"""
WITH h AS (
  SELECT doc_id,
         list_transform(regexp_split_to_array(trim(text), '\\s+'),
                        t -> CAST(concat('0x', substring(md5(t), 1, 8))
                                  AS BIGINT)) AS hs
  FROM documents
), w AS (
  SELECT doc_id,
         list_distinct([({_ROLL_TERMS}) % {_ROLL_P}
                        for i in range(1, len(hs) - 8 + 2)]) AS wh
  FROM h
), x AS (
  SELECT doc_id, UNNEST(wh) AS hsh FROM w
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM x a JOIN x b ON a.hsh = b.hsh AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
"""

# Log-free tf-idf-style weighting: score = tf*(N+1)/(df+1) — exact
# integer ratio evaluated in double, bit-identical across engines
# (ln() would differ in the last ulp across libm builds).
ORACLES["doc_top_terms"] = """
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY 1
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * (n.n_docs + 1)
         / CAST(df.df + 1 AS DOUBLE) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, score, CAST(rn AS BIGINT) AS rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rn
  FROM scored) WHERE rn <= 3
"""

# Exact cross-corpus Jaccard between the held-out split and the
# training remainder — the ground truth for the MinHash contamination
# path (banding recall is 1.0 at this threshold on this corpus, same
# argument as ORACLES["minhash_neardup"]).
ORACLES["contamination_check"] = f"""
WITH s AS ({_SHINGLES})
SELECT a.doc_id AS train_id, b.doc_id AS test_id,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
              AS DOUBLE) AS jacc
FROM s a JOIN s b
  ON a.doc_id % 20 != 0 AND b.doc_id % 20 = 0
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
             AS DOUBLE) >= 0.6
"""

# Cross-source distinct-shingle overlap, exact — the self-join
# baseline whose theta-sketch twin (source_overlap_theta) replaces
# the key shuffle with per-source kilobyte sketches at scale.
EXTRA_ORACLES["source_overlap_exact"] = f"""
WITH s AS ({_SHINGLES}),
exploded AS (
  SELECT d.source AS source, unnest(s.sh) AS shingle
  FROM s JOIN documents d USING (doc_id)),
src AS (SELECT DISTINCT source, shingle FROM exploded)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS n_shared
FROM src a JOIN src b
  ON a.shingle = b.shingle AND a.source < b.source
GROUP BY 1, 2
ORDER BY n_shared DESC, source_a, source_b
LIMIT 20
"""

# Per-series OLS trend: identical bucket alignment, zero-based bucket
# index and exact-decimal moments; same string-routed cast recipe.
EXTRA_ORACLES["events_trend_slope"] = """
WITH e AS (
  SELECT event_type, epoch_ms(ts) AS ts_ms, event_id, value
  FROM events),
p AS (
  SELECT event_type AS k, ts_ms // 3600000 AS bi,
         max_by(value, ts_ms * 1000000 + event_id) AS v
  FROM e GROUP BY 1, 2),
r AS (
  SELECT k,
         CAST(bi - MIN(bi) OVER (PARTITION BY k) AS DECIMAL(10,0)) AS t,
         CAST(round(v * 100.0) AS DECIMAL(10,0)) AS c
  FROM p),
g AS (
  SELECT k, COUNT(*) AS n,
         SUM(t) AS st, SUM(c) AS sx,
         SUM(t * t) AS stt, SUM(t * c) AS stx
  FROM r GROUP BY k)
SELECT k AS event_type, n,
       (CAST(CAST(stx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
        - (CAST(CAST(st AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
          * (CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)))
       / (CAST(CAST(stt AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(CAST(st AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(CAST(st AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)))
       / 100.0 AS slope_per_hour
FROM g
"""

# Pairs correlation matrix: identical bucket alignment (max_by last
# obs), unordered pair join and exact-decimal moments — bit-exact.
EXTRA_ORACLES["events_pair_correlation"] = """
WITH e AS (
  SELECT event_type, epoch_ms(ts) AS ts_ms, event_id, value
  FROM events),
p AS (
  SELECT event_type AS k, (ts_ms // 3600000) * 3600000 AS b,
         CAST(round(max_by(value, ts_ms * 1000000 + event_id) * 100.0)
              AS DECIMAL(10,0)) AS c
  FROM e GROUP BY 1, 2),
j AS (
  SELECT a.k AS ka, bb.k AS kb, a.c AS ca, bb.c AS cb
  FROM p a JOIN p bb ON a.b = bb.b AND a.k < bb.k),
g AS (
  SELECT ka, kb, COUNT(*) AS n,
         SUM(ca) AS sx, SUM(cb) AS sy,
         SUM(ca * ca) AS sxx, SUM(cb * cb) AS syy,
         SUM(ca * cb) AS sxy
  FROM j GROUP BY ka, kb)
SELECT ka, kb, n,
       ((CAST(CAST(sxy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)))
        / sqrt((CAST(CAST(sxx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)))
               * (CAST(CAST(syy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)))))
         AS corr
FROM g
"""

# Z-normalized subsequence search: identical window framing, z-norm
# and distance expression order; the query pattern z-normalizes to
# the same literals on both sides.
def _motif_oracle() -> str:
    m = 8
    pattern = [1.0, 2.0, 4.0, 8.0, 8.0, 4.0, 2.0, 1.0]
    mu = sum(pattern) / m
    sd = (sum((x - mu) ** 2 for x in pattern) / m) ** 0.5
    # string-routed literals: DuckDB types a bare decimal literal as
    # DECIMAL and the DECIMAL→DOUBLE hop is not exact (measured 1 ULP
    # on the z-normalized pattern); VARCHAR→DOUBLE parse is correctly
    # rounded (same lesson as the decimal casts in the verify skill)
    zq = ", ".join(f"CAST('{(x - mu) / sd!r}' AS DOUBLE)"
                   for x in pattern)
    # list_reduce (sequential left fold) — NOT list_sum, whose
    # accumulation order differs from Spark's aggregate() by 1 ULP
    red = "list_reduce({0}, (a, b) -> a + b)"
    return f"""
WITH e AS (
  SELECT event_type, epoch_ms(ts) AS ts_ms, event_id,
         CAST(value AS DOUBLE) AS value
  FROM events),
w AS (
  SELECT event_type, ts_ms,
         list(value) OVER (PARTITION BY event_type
                           ORDER BY ts_ms, event_id
                           ROWS BETWEEN CURRENT ROW AND {m - 1} FOLLOWING)
           AS win
  FROM e),
f AS (SELECT * FROM w WHERE len(win) = {m}),
z AS (
  SELECT event_type, ts_ms, win,
         {red.format('win')} / {float(m)} AS mu
  FROM f),
z2 AS (
  SELECT event_type, ts_ms, win, mu,
         sqrt({red.format('list_transform(win, x -> (x - mu) * (x - mu))')}
              / {float(m)}) AS sd
  FROM z
  WHERE sqrt({red.format('list_transform(win, x -> (x - mu) * (x - mu))')}
             / {float(m)}) > 0),
d AS (
  SELECT event_type, ts_ms AS win_start,
         sqrt({red.format("list_transform(list_zip(list_transform(win, x -> (x - mu) / sd), [" + zq + "]), p -> (p[1] - p[2]) * (p[1] - p[2]))")}) AS dist
  FROM z2)
SELECT event_type, win_start, dist, rn FROM (
  SELECT event_type, win_start, dist,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY dist, win_start) AS rn
  FROM d) WHERE rn <= 3
"""


EXTRA_ORACLES["events_motif_search"] = _motif_oracle()

# TWAP: exact cents×ms integer-decimal weighted sums; same string-
# routed casts and op order as the rest of the exact-moments family.
EXTRA_ORACLES["events_twap"] = """
WITH e AS (
  SELECT event_id, event_type, epoch_ms(ts) AS ts_ms, value
  FROM events),
r AS (
  SELECT event_type,
         CAST(round(value * 100.0) AS DECIMAL(10,0)) AS c,
         CAST(lead(ts_ms) OVER (PARTITION BY event_type
                                ORDER BY ts_ms, event_id) - ts_ms
              AS DECIMAL(12,0)) AS dur
  FROM e),
g AS (
  SELECT event_type, COUNT(*) AS n_intervals,
         SUM(c * dur) AS swv, SUM(dur) AS st
  FROM r WHERE dur IS NOT NULL GROUP BY event_type)
SELECT event_type, n_intervals, CAST(st AS BIGINT) AS span_ms,
       (CAST(CAST(swv AS VARCHAR) AS DOUBLE)
        / CAST(CAST(st AS VARCHAR) AS DOUBLE)) / 100.0 AS twap_value
FROM g
"""

# Exact-moment Pearson: identical integer-decimal sums, string-routed
# decimal→double casts, identical op sequence — bit-exact correlation.
EXTRA_ORACLES["lineitem_price_qty_corr"] = """
WITH r AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100.0) AS DECIMAL(10,0)) AS x,
         CAST(round(l_extendedprice * 100.0) AS DECIMAL(12,0)) AS y
  FROM lineitem),
g AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy,
         SUM(x * y) AS sxy
  FROM r GROUP BY l_returnflag)
SELECT l_returnflag, n,
       ((CAST(CAST(sxy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)))
        / sqrt((CAST(CAST(sxx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)))
               * (CAST(CAST(syy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)))))
         AS corr_qty_price
FROM g
"""

# TPC-H Q15 shape: decimal-exact revenue, max kept via a window over
# the per-supplier aggregate (ties survive on both engines).
EXTRA_ORACLES["q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey)
SELECT supplier_no, s_name, total_revenue
FROM rev JOIN supplier ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""

# Blocked fuzzy join: DuckDB's levenshtein is the same edit-distance
# metric as Spark's; blocking keys and tiebreaks identical.
EXTRA_ORACLES["fuzzy_name_block_join"] = """
WITH p AS (
  SELECT a.c_nationkey AS nationkey,
         levenshtein(a.c_name, b.c_name) AS d
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 2)
SELECT nationkey, COUNT(*) AS n_close_pairs, MIN(d) AS min_distance
FROM p GROUP BY nationkey
"""

# Repeat-factor corpus mixing: identical floor/fractional split and
# md5(seed:id:copy) coin — total_tokens matches only if both engines
# kept the IDENTICAL fractional copies.
EXTRA_ORACLES["corpus_upsample_stats"] = f"""
WITH w AS (
  SELECT doc_id, lang, text,
         CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 2.5
                   WHEN 'fr' THEN 1.75 WHEN 'es' THEN 3.0
                   ELSE 1.0 END AS wt
  FROM documents),
c AS (
  SELECT doc_id, lang, text, wt,
         unnest(generate_series(1, CAST(floor(wt) AS INT) + 1)) AS copy
  FROM w),
k AS (
  SELECT * FROM c
  WHERE copy <= floor(wt)
     OR (CAST(concat('0x', substring(md5(
           'upsample:v1:' || CAST(doc_id AS VARCHAR) || ':'
           || CAST(copy AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000)
        / 1000000.0 < wt - floor(wt))
SELECT lang, COUNT(*) AS n_rows_out,
       COUNT(DISTINCT doc_id) AS n_docs,
       MAX(copy) AS max_copies,
       CAST(SUM({_NTOK}) AS BIGINT) AS total_tokens
FROM k GROUP BY lang
"""

# Equi-depth length buckets: ntile is rank-based — identical with the
# same total order (token count, doc_id tiebreak) on both engines.
EXTRA_ORACLES["doc_length_buckets"] = f"""
WITH r AS (
  SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tok FROM documents),
b AS (
  SELECT doc_id, n_tok,
         ntile(8) OVER (ORDER BY n_tok, doc_id) AS bucket
  FROM r)
SELECT bucket, COUNT(*) AS n_docs,
       MIN(n_tok) AS min_tokens, MAX(n_tok) AS max_tokens,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM b GROUP BY bucket
"""

# Filtered vector search: identical label pre-filter before scoring.
EXTRA_ORACLES["knn_filtered_bruteforce"] = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 10),
c AS (SELECT * FROM e WHERE label = 1),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         {_COS.format(a='q.v', b='c.v')} AS cos
  FROM q JOIN c ON q.vec_id <> c.vec_id)
SELECT q_id, n_id, cos, rn FROM (
  SELECT q_id, n_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn
  FROM scored
) WHERE rn <= 5
"""

# Z-score QC: identical exact-decimal moment sums (cents, cents²) and
# the identical fixed sequence of double ops, so means/stds/flags match
# bit-for-bit. s1/s2 cast to double via VARCHAR (correctly rounded on
# both engines at ANY magnitude; direct int128→double differs by 1 ULP
# past 2^53 — ADVICE r5), mirroring the Spark side's _dstr.
EXTRA_ORACLES["events_zscore_outliers"] = """
WITH r AS (
  SELECT event_type,
         CAST(round(value * 100.0) AS DECIMAL(10,0)) AS c
  FROM events),
g AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(c) AS s1, SUM(c * c) AS s2
  FROM r GROUP BY event_type),
st AS (
  SELECT event_type, n,
         CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         sqrt((CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
               - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                 * (CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)))
              / CAST(n AS DOUBLE)) AS s
  FROM g)
SELECT r.event_type,
       MIN(st.n) AS n_events,
       MIN(st.m) / 100.0 AS mean_value,
       MIN(st.s) / 100.0 AS std_value,
       COUNT(*) FILTER (WHERE abs((CAST(c AS DOUBLE) - st.m) / st.s) > 3.0)
         AS n_outliers,
       MAX(abs((CAST(c AS DOUBLE) - st.m) / st.s)) AS max_abs_z
FROM r JOIN st USING (event_type)
GROUP BY r.event_type
"""

# Per-source frequency cap: identical md5 coin and (coin, id) rank —
# kept-token sums match only if both engines select the same docs.
EXTRA_ORACLES["source_cap_sample"] = f"""
WITH r AS (
  SELECT source, doc_id, text,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('cap:v1:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents)
SELECT source, COUNT(*) AS n_kept,
       CAST(SUM({_NTOK}) AS BIGINT) AS n_kept_tokens,
       MIN(doc_id) AS min_kept_id
FROM r WHERE rk <= 10
GROUP BY source
"""

# Closed-form EWMA, alpha = 0.5: identical scaled-cumsum formulation
# with the running sum in EXACT integer decimals (2-dp values × 2^rn)
# — order-independent, so it cannot depend on either engine's window
# sum fold order; with decay a power of two every remaining double op
# is a single correctly-rounded step, so values match bit-for-bit.
EXTRA_ORACLES["events_ewma_smooth"] = """
WITH e AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value FROM events),
r AS (
  SELECT event_id, user_id, ts_ms, value,
         CAST(round(value * 100.0) AS DECIMAL(6,0)) AS c,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_ms, event_id) AS rn
  FROM e),
s AS (
  SELECT event_id, user_id, ts_ms, value, rn,
         first_value(c) OVER (PARTITION BY user_id ORDER BY rn
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c1,
         SUM(c * (CAST(pow(2.0, rn // 2) AS DECIMAL(19,0))
                  * CAST(pow(2.0, rn - rn // 2) AS DECIMAL(19,0))))
           OVER (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
  FROM r)
SELECT event_id, user_id, ts_ms, value,
       (0.5 * pow(0.5, rn)
        * (CAST(CAST(cs AS VARCHAR) AS DOUBLE)
           - CAST(c1 AS DOUBLE) * 2.0)
        + pow(0.5, rn - 1) * CAST(c1 AS DOUBLE)) / 100.0 AS ewma
FROM s
"""

# Global-shuffle shard manifest: identical md5 order key and
# top-32-bit shard scaling ((key32 * n) >> 32) — the permutation and
# its contiguous shard slices are engine-reproducible by design.
EXTRA_ORACLES["shard_manifest"] = f"""
WITH s AS (
  SELECT doc_id, text,
         md5('shuffle:v1:' || CAST(doc_id AS VARCHAR)) AS okey
  FROM documents),
k AS (
  SELECT doc_id, text, okey,
         (CAST(concat('0x', substring(okey, 1, 8)) AS BIGINT) * 16) >> 32
           AS shard
  FROM s)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM({_NTOK}) AS BIGINT) AS n_tokens,
       arg_min(doc_id, okey) AS first_doc,
       arg_max(doc_id, okey) AS last_doc
FROM k GROUP BY shard
"""

# Sub-document exact dedup: identical 8-word chunking (0-based chunk
# starts, 1-based inclusive list slice), md5 digests for the global
# counts, order-preserving scrub. STRING_AGG ... FILTER returns NULL
# for all-dup docs where Spark's concat_ws gives '' — coalesce to 0.
EXTRA_ORACLES["passage_dedup_scrub"] = """
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
           FROM documents),
p AS (SELECT doc_id, CAST(i // 8 AS INT) AS pidx,
             array_to_string(w[i+1:i+8], ' ') AS passage
      FROM w, unnest(range(0, greatest(len(w), 1), 8)) AS t(i)
      WHERE array_to_string(w[i+1:i+8], ' ') != ''),
c AS (SELECT md5(passage) AS digest, COUNT(*) AS n_occ
      FROM p GROUP BY 1),
f AS (SELECT p.doc_id, p.pidx, p.passage, c.n_occ > 1 AS is_dup
      FROM p JOIN c ON md5(p.passage) = c.digest)
SELECT doc_id, COUNT(*) AS n_passages,
       COUNT(*) FILTER (WHERE is_dup) AS n_dup,
       CAST(COUNT(*) FILTER (WHERE is_dup) AS DOUBLE) / COUNT(*)
         AS dup_ratio,
       COALESCE(LENGTH(STRING_AGG(passage, ' ' ORDER BY pidx)
                       FILTER (WHERE NOT is_dup)), 0) AS scrubbed_n_chars
FROM f GROUP BY doc_id
"""

# Maximal duplicated spans: same tokenization as passage_dedup_scrub
# but OVERLAPPING windows (one per start position) and gaps-and-islands
# merging. Integer aggregates only; SUM/COUNT cast to BIGINT (DuckDB
# SUM(int) -> HUGEINT, the events_vwap r7 lesson).
EXTRA_ORACLES["dup_span_extents"] = """
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
           FROM documents),
win AS (SELECT doc_id, CAST(i AS INT) AS pos,
               array_to_string(w[i+1:i+8], ' ') AS win
        FROM w, unnest(range(0, greatest(len(w) - 7, 0))) AS t(i)),
c AS (SELECT win FROM win GROUP BY win HAVING COUNT(*) >= 2),
m AS (SELECT win.doc_id, win.pos FROM win JOIN c USING (win)),
b AS (SELECT doc_id, pos,
        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  IS NULL
              OR pos > lag(pos) OVER (PARTITION BY doc_id
                                      ORDER BY pos) + 8
             THEN 1 ELSE 0 END AS brk
      FROM m),
g AS (SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM b),
s AS (SELECT doc_id, grp, MIN(pos) AS sp, MAX(pos) + 7 AS ep
      FROM g GROUP BY doc_id, grp)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(ep - sp + 1) AS BIGINT) AS dup_tokens,
       CAST(MAX(ep - sp + 1) AS BIGINT) AS max_span_tokens
FROM s GROUP BY doc_id
"""

# Rank-based median/MAD: the lower median is the value at
# row_number (n+1)//2 in value order — no interpolation, so every
# double is data-picked or one IEEE subtract/multiply away.
EXTRA_ORACLES["events_mad_outliers"] = """
WITH v AS (SELECT event_type, value,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value) AS rn
           FROM events),
med AS (SELECT event_type, value AS med FROM v WHERE rn = (n + 1) // 2),
d AS (SELECT v.event_type, v.value, med.med,
             abs(v.value - med.med) AS dev
      FROM v JOIN med USING (event_type)),
d2 AS (SELECT d.*, COUNT(*) OVER (PARTITION BY event_type) AS n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev) AS rn
       FROM d),
mad AS (SELECT event_type, dev AS mad FROM d2 WHERE rn = (n + 1) // 2)
SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(d.med) AS med, MAX(mad.mad) AS mad,
       CAST(COUNT(*) FILTER (WHERE d.dev > 3.0 * mad.mad) AS BIGINT)
         AS n_outliers
FROM d JOIN mad USING (event_type)
GROUP BY d.event_type
"""

# Bloom-prefiltered semi join: the filter guarantees no false
# negatives and the verify join removes false positives, so the exact
# EXISTS is the oracle — a hash match proves the probabilistic
# prefilter changed nothing but the shuffle volume.
EXTRA_ORACLES["bloom_semi_join_agg"] = f"""
SELECT l_returnflag, COUNT(*) AS n_rows,
       COUNT(DISTINCT l_partkey) AS n_parts,
       {_dsum('l_quantity')} AS sum_qty
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM part p
              WHERE p.p_partkey = l.l_partkey AND p.p_size >= 48)
GROUP BY l_returnflag
"""

# VARIANT round-trip: the oracle computes straight from the typed
# columns — matching means build→parse_json→variant_get lost nothing,
# doubles included.
EXTRA_ORACLES["events_variant_extract"] = f"""
SELECT event_type, COUNT(*) AS n_events,
       {_dsum('value')} AS sum_value,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(DISTINCT user_id) AS n_sources
FROM events GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# Round-6 window rotation (mirrors plans/queries.py — see ROTATED_IN_R6).
# ORACLES must equal the declared window's oracle-backed set: the driver
# exposes oracle_sql() = ORACLES, and test_driver_window_is_at_most_50
# pins "no oracle outside the window". The moves are mechanical pops so
# a typo fails loud at import time rather than silently dropping a check.
# ---------------------------------------------------------------------------
_R6_IN = [  # promoted into the driver window (oracle-backed subset)
    "stratified_resample_stats", "semantic_dedup_clusters",
    "curation_pipeline_summary", "events_gapfill_locf",
    "events_gapfill_interpolate", "bloom_semi_join_agg",
    "passage_dedup_scrub", "shard_manifest", "events_ewma_smooth",
    "source_cap_sample", "events_zscore_outliers",
    "knn_filtered_bruteforce", "doc_length_buckets",
    "corpus_upsample_stats", "q15_top_supplier", "fuzzy_name_block_join",
    "lineitem_price_qty_corr", "events_twap", "events_motif_search",
    "events_pair_correlation", "events_trend_slope",
    "events_variant_extract", "source_overlap_exact",
    # token_heavy_hitters_sketch / distinct_rollup_hll promoted too,
    # but rows-only by design (CMS/HLL internals) — no oracle to move.
]
_R6_OUT = [  # demoted to EXTRA (oracle-backed subset; the five ANN/LSH
    # demotions — simhash, embedding_lsh, hyperplane, ivf, pq — were
    # rows-only and never had an oracle entry)
    "dedup_exact", "ngram_jaccard_neardup", "text_quality_score",
    "text_langid", "embedding_norm_stats", "p1_validation_filter",
    "p3_flatten_payload", "p4_value_rules", "p8_conditional_gate",
    "p10_api_key_hash", "j2_semi_join_auth", "q5_region_nation_revenue",
    "agg_orders_stats", "window_topk_per_group",
    "set_ops_status_migration", "events_ohlc_bars",
    "pack_sequences_chunked", "events_sessionization",
    "asof_join_purchase_click", "value_percentiles",
]
for _k in _R6_IN:
    ORACLES[_k] = EXTRA_ORACLES.pop(_k)
for _k in _R6_OUT:
    EXTRA_ORACLES[_k] = ORACLES.pop(_k)

# Sparse-cosine similarity join (r6): identical df<=200 vocabulary
# prune, exact BIGINT tf/norm/dot sums, one correctly-rounded
# sqrt+division — bit-exact cross-engine.
EXTRA_ORACLES["doc_sparse_cosine_neardup"] = """
WITH toks AS (
  SELECT doc_id AS id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents),
tf AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY id, term),
rare AS (
  SELECT term FROM tf GROUP BY term HAVING COUNT(*) <= 200),
kept AS (SELECT tf.* FROM tf JOIN rare USING (term)),
norms AS (
  SELECT id, CAST(SUM(tf * tf) AS BIGINT) AS nrm
  FROM kept GROUP BY id),
dots AS (
  SELECT a.id AS a_id, b.id AS b_id,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM kept a JOIN kept b USING (term)
  WHERE a.id < b.id GROUP BY a.id, b.id)
SELECT a_id, b_id,
       CAST(dot AS DOUBLE)
         / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) AS cos
FROM dots
JOIN norms na ON na.id = a_id
JOIN norms nb ON nb.id = b_id
WHERE CAST(dot AS DOUBLE)
        / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) >= 0.7
"""

# Asymmetric containment (r6): same 3-gram shingle sets as the
# Jaccard family, ratio over |A| only — integer sizes, bit-exact.
EXTRA_ORACLES["doc_containment_pairs"] = f"""
WITH s AS ({_SHINGLES})
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / CAST(len(a.sh) AS DOUBLE) AS containment
FROM s a JOIN s b ON a.doc_id <> b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / CAST(len(a.sh) AS DOUBLE) >= 0.8
"""

# ---- LM-quality curation family (late r6) --------------------------
# All three are LOG-FREE by design (queries.py module doc): exact
# integer/rational forms whose single IEEE divisions are bit-identical
# cross-engine. The md5 bucket/feature hashes reuse the established
# concat('0x', substring(md5(..),1,8)) construction (= Spark's
# conv(substring(md5(..),1,8),16,10)).

# Count-pruned bigram LM over the 80% hash-split; vocab = top-24
# train unigrams (count DESC, term ASC); OOV -> '<unk>' before bigram
# formation; bigram counts pruned at >= 2; c_ctx counts prev AS A
# CONTEXT (over the bigram stream). lm_score = aggregated Laplace
# likelihood (Σc_bg + n) / (Σc_ctx + n·(V+1)).
EXTRA_ORACLES["doc_lm_quality"] = """
WITH tok AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents
), train AS (
  SELECT * FROM tok
  WHERE (CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100) < 80
), vocab AS (
  SELECT t AS term FROM (SELECT unnest(ts) AS t FROM train)
  GROUP BY t ORDER BY count(*) DESC, t LIMIT 24
), tbg AS (
  SELECT CASE WHEN p IN (SELECT term FROM vocab)
              THEN p ELSE '<unk>' END AS prev,
         CASE WHEN c IN (SELECT term FROM vocab)
              THEN c ELSE '<unk>' END AS cur
  FROM (SELECT unnest(ts[1:len(ts)-1]) AS p,
               unnest(ts[2:len(ts)]) AS c FROM train)
), bgc AS (
  SELECT prev, cur, count(*) AS c_bg FROM tbg
  GROUP BY prev, cur HAVING count(*) >= 2
), ctx AS (
  SELECT prev, count(*) AS c_ctx FROM tbg GROUP BY prev
), vsz AS (SELECT count(*) AS v_sz FROM vocab),
abg AS (
  SELECT doc_id,
         CASE WHEN p IN (SELECT term FROM vocab)
              THEN p ELSE '<unk>' END AS prev,
         CASE WHEN c IN (SELECT term FROM vocab)
              THEN c ELSE '<unk>' END AS cur
  FROM (SELECT doc_id, unnest(ts[1:len(ts)-1]) AS p,
               unnest(ts[2:len(ts)]) AS c FROM tok)
), sc AS (
  SELECT doc_id, count(*) AS n_bigrams,
         SUM(CASE WHEN cur = '<unk>' THEN 1 ELSE 0 END) AS n_oov,
         SUM(COALESCE(c_bg, 0)) AS sum_bg,
         SUM(COALESCE(c_ctx, 0)) AS sum_ctx
  FROM abg
  LEFT JOIN bgc USING (prev, cur)
  LEFT JOIN ctx USING (prev)
  GROUP BY doc_id
)
SELECT t.doc_id, t.lang, CAST(len(ts) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(n_oov, 0) AS BIGINT) AS n_oov,
       CAST(COALESCE(sum_bg, 0) AS BIGINT) AS sum_bg,
       CAST(COALESCE(sum_ctx, 0) AS BIGINT) AS sum_ctx,
       CASE WHEN n_bigrams > 0 THEN
         CAST(sum_bg + n_bigrams AS DOUBLE)
         / CAST(sum_ctx + n_bigrams * ((SELECT v_sz FROM vsz) + 1)
                AS DOUBLE)
       END AS lm_score
FROM tok t LEFT JOIN sc ON t.doc_id = sc.doc_id
"""

# DSIR hashed-bigram importance toward lang='en': ratio_b =
# ((ct+1)(Craw+B)) / ((cr+1)(Ctar+B)) in double from exact integers;
# per-doc mean of DECIMAL(27,6)-cast per-occurrence ratios.
EXTRA_ORACLES["dsir_importance_weights"] = """
WITH bk AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substring(md5(p || ' ' || c), 1, 8))
              AS BIGINT) % 512 AS bucket
  FROM (SELECT doc_id, lang, unnest(ts[1:len(ts)-1]) AS p,
               unnest(ts[2:len(ts)]) AS c
        FROM (SELECT doc_id, lang,
                     regexp_split_to_array(trim(text), '\\s+') AS ts
              FROM documents))
), dist AS (
  SELECT bucket, count(*) AS cr,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
  FROM bk GROUP BY bucket
), tot AS (SELECT SUM(cr) AS craw, SUM(ct) AS ctar FROM dist),
rt AS (
  SELECT bucket,
         (CAST(ct + 1 AS DOUBLE) * CAST(craw + 512 AS DOUBLE))
         / (CAST(cr + 1 AS DOUBLE) * CAST(ctar + 512 AS DOUBLE)) AS ratio
  FROM dist, tot)
SELECT doc_id, lang, count(*) AS n_feats,
       CAST(SUM(CAST(ratio AS DECIMAL(27,6))) AS DOUBLE) / count(*)
         AS imp_score
FROM bk JOIN rt USING (bucket)
GROUP BY doc_id, lang
"""

# Pairwise total-variation drift between per-source token
# distributions, exact on the common denominator: HUGEINT (= Spark
# DECIMAL(38,0)) cross-products, one string-routed final division.
EXTRA_ORACLES["source_tv_drift"] = """
WITH toks AS (
  SELECT source AS g, unnest(regexp_split_to_array(trim(text), '\\s+'))
           AS term
  FROM documents
), counts AS (
  SELECT g, term, count(*) AS c FROM toks GROUP BY g, term
), totals AS (
  SELECT g, SUM(c) AS ctot FROM counts GROUP BY g
), shared AS (
  SELECT a.g AS ga, b.g AS gb, count(*) AS shared_terms,
         SUM(a.c) AS sa, SUM(b.c) AS sb,
         SUM(ABS(CAST(a.c AS HUGEINT) * CAST(tb.ctot AS HUGEINT)
                 - CAST(b.c AS HUGEINT) * CAST(ta.ctot AS HUGEINT)))
           AS sin
  FROM counts a
  JOIN counts b ON a.term = b.term AND a.g < b.g
  JOIN totals ta ON a.g = ta.g
  JOIN totals tb ON b.g = tb.g
  GROUP BY a.g, b.g
)
SELECT ta.g AS source_a, tb.g AS source_b,
       CAST(COALESCE(shared_terms, 0) AS BIGINT) AS shared_terms,
       CAST(CAST(COALESCE(sin, 0)
                 + (CAST(ta.ctot AS HUGEINT) - COALESCE(sa, 0))
                   * CAST(tb.ctot AS HUGEINT)
                 + (CAST(tb.ctot AS HUGEINT) - COALESCE(sb, 0))
                   * CAST(ta.ctot AS HUGEINT)
            AS VARCHAR) AS DOUBLE)
       / (CAST(ta.ctot AS DOUBLE) * CAST(tb.ctot AS DOUBLE) * 2.0) AS tv
FROM totals ta
JOIN totals tb ON ta.g < tb.g
LEFT JOIN shared ON shared.ga = ta.g AND shared.gb = tb.g
"""

# CCNet band split composed over the doc_lm_quality oracle: exact
# per-lang ntile(3) on (lm_score DESC NULLS LAST, doc_id).
EXTRA_ORACLES["lm_quality_bands"] = f"""
WITH base AS ({EXTRA_ORACLES["doc_lm_quality"]}),
banded AS (
  SELECT lang, n_tokens, lm_score,
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY lm_score DESC NULLS LAST, doc_id) AS b
  FROM base
)
SELECT lang,
       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
              ELSE 'tail' END AS band,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(lm_score) AS min_score,
       MAX(lm_score) AS max_score
FROM banded GROUP BY lang, b
"""

# Achlioptas JL projection distortion (late r6): the ±1 sign matrix
# is md5-derived Python literals (operators/similarity.py::jl_signs)
# inlined below, so both engines project with the identical matrix;
# each output dim is list_inner_product (≡ Spark's zip_with fold,
# proven bit-identical), distances are the same left-fold squares.
from ..operators.similarity import jl_signs as _jl_signs

_JL = _jl_signs(64, 16)
_JL_PROJ = ", ".join(
    "list_inner_product(v, CAST(["
    + ", ".join(str(x) for x in row)
    + "] AS DOUBLE[])) * 0.25" for row in _JL)
_D2 = ("list_reduce(list_transform(list_zip({a}, {b}), "
       "s -> (s[1] - s[2]) * (s[1] - s[2])), (x, y) -> x + y)")

EXTRA_ORACLES["jl_projection_distortion"] = f"""
WITH p AS (
  SELECT vec_id, v, [{_JL_PROJ}] AS jl_vec
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 100)
), d AS (
  SELECT {_D2.format(a='a.jl_vec', b='b.jl_vec')} AS d2p,
         {_D2.format(a='a.v', b='b.v')} AS d2v
  FROM p a JOIN p b ON a.vec_id < b.vec_id
), r AS (
  SELECT d2p / d2v AS r FROM d WHERE d2v > 0
)
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CAST(r AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
         AS mean_ratio,
       MIN(r) AS min_ratio,
       MAX(r) AS max_ratio,
       CAST(SUM(CASE WHEN r >= 0.6 AND r <= 1.4 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_within_40pct
FROM r
"""

# VWAP per (event_type, hour): weights via JSON payload extraction
# (the VARIANT path engine-side), decimal-summed weighted values,
# exact bigint denominator.
EXTRA_ORACLES["events_vwap"] = """
WITH e AS (
  SELECT event_type, (epoch_ms(ts) // 3600000) * 3600000 AS hour_start_ms,
         value, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type, hour_start_ms,
       COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_qty,
       CASE WHEN SUM(k) > 0 THEN
         CAST(SUM(CAST(value * k AS DECIMAL(27,6))) AS DOUBLE)
           / CAST(SUM(k) AS DOUBLE) END AS vwap
FROM e GROUP BY event_type, hour_start_ms
"""

# Running-peak drawdown per series: cumulative max over the
# deterministic (ts_ms, event_id) order — no accumulation, bit-exact
# with zero decimal machinery.
EXTRA_ORACLES["events_drawdown"] = """
WITH e AS (
  SELECT event_type, epoch_ms(ts) AS ts_ms, event_id, value FROM events),
d AS (
  SELECT event_type, value,
         MAX(value) OVER (PARTITION BY event_type
                          ORDER BY ts_ms, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS peak
  FROM e)
SELECT event_type, COUNT(*) AS n_events,
       MAX(value) AS peak_value,
       MAX(peak - value) AS max_drawdown
FROM d GROUP BY event_type
"""

# Per-source data card: composes the doc_lm_quality oracle (as a CTE)
# with the SAME quality-flag predicate the engine uses (_STOP — the
# canonical 5-word STOPWORDS; an earlier draft hard-coded a different
# 20-word list that agreed on the fixture only by coincidence) and
# the NORMALIZED content fingerprint (functions/text.py::fingerprint
# — what the actual dedup stage hashes; raw-text md5 would understate
# the dup rate the pipeline will see).
EXTRA_ORACLES["corpus_datacard"] = f"""
WITH base AS ({EXTRA_ORACLES["doc_lm_quality"]}),
q AS (
  SELECT doc_id, source,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
           AS fp,
         (len(regexp_split_to_array(trim(text), '\\s+')) >= 20
          AND CAST(len(list_filter(regexp_split_to_array(trim(text),
                       '\\s+'), x -> list_contains({_STOP}, x)))
                AS DOUBLE)
              / CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                     AS DOUBLE) <= 0.5) AS keep
  FROM documents)
SELECT q.source,
       COUNT(*) AS n_docs,
       CAST(SUM(base.n_tokens) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT base.lang) AS BIGINT) AS n_langs,
       CAST(SUM(CASE WHEN q.keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality_keep,
       CAST(COUNT(*) - COUNT(DISTINCT q.fp) AS BIGINT) AS n_exact_dups,
       CAST(SUM(CAST(base.lm_score AS DECIMAL(27,6))) AS DOUBLE)
         / COUNT(base.lm_score) AS mean_lm_score
FROM base JOIN q USING (doc_id)
GROUP BY q.source
"""

# Fixed-point integer PageRank over the exact near-dup graph: the
# recurrence is pure BIGINT floor arithmetic, so the 10 iterations
# unroll as chained CTEs (recursive CTEs disallow aggregation in the
# recursive term) and match Spark's loop bit-for-bit.
_PR_ITER = """
pr{next} AS (
  SELECT n.node,
         CAST({base} + (17 * COALESCE(s.s, 0)) // 20 AS BIGINT)
           AS pr_scaled
  FROM prnodes n
  LEFT JOIN (
    SELECT e.dst AS node, SUM(pr{cur}.pr_scaled // d.deg) AS s
    FROM pr{cur}
    JOIN prdeg d ON pr{cur}.node = d.src
    JOIN predges e ON pr{cur}.node = e.src
    GROUP BY e.dst) s ON n.node = s.node
)"""


def _pagerank_oracle(n_iters: int = 10) -> str:
    # the pair graph REUSES the canonical _JACCARD_PAIRS fragment so
    # it can never drift from the ngram_jaccard_neardup oracle
    # (review catch: an inlined copy existed briefly); MATERIALIZED
    # because DuckDB otherwise re-inlines the O(n²) join into every
    # unrolled iteration (88 s → 21 s measured).
    head = f"""
WITH jp AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS}) WHERE jacc >= 0.6
), predges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM jp
  UNION ALL SELECT doc_b, doc_a FROM jp
), prnodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM predges),
prdeg AS MATERIALIZED (
  SELECT src, COUNT(*) AS deg FROM predges GROUP BY src),
prn AS MATERIALIZED (SELECT COUNT(*) AS n FROM prnodes),
pr0 AS (
  SELECT node, CAST(1000000000000 // (SELECT n FROM prn) AS BIGINT)
           AS pr_scaled
  FROM prnodes)"""
    base = ("((3 * (1000000000000 // (SELECT n FROM prn))) // 20)")
    iters = "".join(
        "," + _PR_ITER.format(cur=i, next=i + 1, base=base)
        for i in range(n_iters))
    return (head + iters
            + f"\nSELECT node AS doc_id, pr_scaled FROM pr{n_iters}")


EXTRA_ORACLES["neardup_pagerank"] = _pagerank_oracle(10)

# Growth accounting: active / new / cumulative users per day — the
# running count-distinct re-expressed exactly via first-seen days.
EXTRA_ORACLES["events_user_growth"] = """
WITH e AS (
  SELECT user_id, (epoch_ms(ts) // 86400000) * 86400000
           AS day_start_ms
  FROM events),
active AS (
  SELECT day_start_ms, COUNT(DISTINCT user_id) AS n_active
  FROM e GROUP BY day_start_ms),
first AS (
  SELECT user_id, MIN(day_start_ms) AS day_start_ms
  FROM e GROUP BY user_id),
new AS (
  SELECT day_start_ms, COUNT(*) AS n_new FROM first
  GROUP BY day_start_ms)
SELECT a.day_start_ms, a.n_active,
       COALESCE(n.n_new, 0) AS n_new,
       CAST(SUM(COALESCE(n.n_new, 0)) OVER (
              ORDER BY a.day_start_ms
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_users
FROM active a LEFT JOIN new n USING (day_start_ms)
"""

# ---------------------------------------------------------------------------
# Round-7 window rotation (mirrors plans/queries.py — see ROTATED_IN_R7).
# Same mechanics as the round-6 block above: mechanical pops so a typo
# fails loud at import time. All 34 promotions are oracle-backed; the
# two rows-only demotions (token_heavy_hitters_sketch,
# distinct_rollup_hll) never had an ORACLES entry, so the demotion
# list below holds the 32 oracle-backed shapes only — after this move
# the window is 50/50 hash-checked.
# ---------------------------------------------------------------------------
_R7_IN = [  # promoted into the driver window (all oracle-backed)
    "q4_order_priority", "q7_nation_volume", "q10_returned_items",
    "q12_late_shipment_priority", "q13_customer_distribution",
    "q14_promo_revenue_share", "q17_small_qty_revenue",
    "q19_disjunctive_filter", "q22_idle_customers",
    "sql_api_pricing_summary", "orders_by_year", "set_ops_all_variants",
    "unpivot_event_matrix", "window_running_total", "event_gaps",
    "token_frequencies", "string_functions", "agg_cube_year_status",
    "order_limit_topk", "window_rank_stats", "corpus_mix",
    "events_moving_stats", "doc_sparse_cosine_neardup",
    "doc_containment_pairs", "doc_lm_quality", "lm_quality_bands",
    "jl_projection_distortion", "corpus_datacard", "neardup_pagerank",
    "events_user_growth", "events_vwap", "events_drawdown",
    "dsir_importance_weights", "source_tv_drift",
]
_R7_OUT = [  # demoted to EXTRA (oracle-backed subset)
    "dedup_fingerprint", "minhash_neardup", "semantic_dedup_clusters",
    "text_token_stats", "text_repetition", "text_bpe_token_estimate",
    "doc_rolling_fingerprint", "doc_top_terms", "doc_length_buckets",
    "pii_scrub_stats", "train_test_split_hash", "corpus_upsample_stats",
    "source_cap_sample", "shard_manifest", "curation_pipeline_summary",
    "embedding_cosine_neardup", "embedding_quantize_stats",
    "source_overlap_exact", "bloom_semi_join_agg",
    "p9_exchange_enrichment", "j2_anti_join_unmatched",
    "q1_pricing_summary", "q15_top_supplier", "events_variant_extract",
    "events_gapfill_locf", "events_twap", "events_ewma_smooth",
    "events_zscore_outliers", "events_trend_slope",
    "lineitem_price_qty_corr", "events_funnel_conversion",
    "orders_cohort_matrix",
]
for _k in _R7_IN:
    ORACLES[_k] = EXTRA_ORACLES.pop(_k)
for _k in _R7_OUT:
    EXTRA_ORACLES[_k] = ORACLES.pop(_k)


# ---------------------------------------------------------------- round 8
# TPC-H shape completion (q9/q11/q16/q20 — the four whose canonical
# form needs partsupp, absent from the fixture; the SHAPES are intact,
# see the query docstrings). Double literals embedded as
# CAST('<repr>' AS DOUBLE) per the cross-engine numerics rules; every
# integer aggregate in a final projection stays COUNT (BIGINT both
# engines) — no HUGEINT-able SUMs escape uncast.

EXTRA_ORACLES["q9_product_profit"] = f"""
SELECT n_name AS nation, year(o_orderdate) AS order_year,
       {_dsum("l_extendedprice * (1 - l_discount) "
              "- p_retailprice * l_quantity * CAST('0.1' AS DOUBLE)")}
         AS profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, year(o_orderdate)
"""

EXTRA_ORACLES["q11_important_stock"] = f"""
WITH per_part AS (
  SELECT l_partkey, {_dsum('l_extendedprice')} AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey),
total AS (
  SELECT {_dsum('part_value')} AS total_value FROM per_part)
SELECT l_partkey, part_value
FROM per_part, total
WHERE part_value > total_value * CAST('0.001' AS DOUBLE)
"""

EXTRA_ORACLES["q16_supplier_part_counts"] = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
GROUP BY p_brand, p_type, p_size
"""

EXTRA_ORACLES["q20_part_promotion"] = f"""
WITH sp AS (
  SELECT l_suppkey, l_partkey, {_dsum('l_quantity')} AS supp_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%bolt%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey),
part_tot AS (
  SELECT l_partkey, {_dsum('supp_qty')} AS part_qty
  FROM sp GROUP BY l_partkey),
big AS (
  SELECT DISTINCT l_suppkey
  FROM sp JOIN part_tot USING (l_partkey)
  WHERE supp_qty > part_qty * CAST('0.3' AS DOUBLE))
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM big)
"""


# ---------------------------------------------------------------- round 9
# Oracles for the three queries the final round-8 session registered
# with an "oracle-backed" claim it never fulfilled (the r8 verdict's
# top item). The Spark sides were built oracle-compatible from the
# start (retrieval.py / lm_quality.py module docs): exact HUGEINT
# (= Spark DECIMAL(38,0)) integer cross-products, string-routed
# int->double conversions, one IEEE division per score term,
# DECIMAL(27,6)-cast order-free sums, ranks computed on the exact
# decimal with doc_id tiebreaks.

# Log-free Okapi-BM25 surrogate top-10 per fixture query
# (operators/retrieval.py module doc derives the integer form). The
# fixture query list is the module-level literal shared with the
# Spark query and the tests.
from ..operators.retrieval import FIXTURE_QUERIES as _BM25_Q

_BM25_VALUES = ", ".join(f"('{q}', '{t}')" for q, t in sorted(set(_BM25_Q)))

EXTRA_ORACLES["doc_bm25_topk"] = f"""
WITH qt AS (SELECT * FROM (VALUES {_BM25_VALUES}) v(query_id, term)),
docs2 AS (
  SELECT doc_id, len(ts) AS dl, ts
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
        FROM documents WHERE text IS NOT NULL)),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS tot FROM docs2),
tf AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf
  FROM (SELECT doc_id, dl, unnest(ts) AS term FROM docs2)
  WHERE term IN (SELECT DISTINCT term FROM qt)
  GROUP BY doc_id, dl, term),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT q.query_id, t.doc_id, COUNT(*) AS matched_terms,
         SUM(CAST(
           CAST(CAST((2 * CAST(s.n_docs AS HUGEINT)
                      - 2 * CAST(d.df AS HUGEINT) + 1)
                     * 22 * CAST(t.tf AS HUGEINT)
                     * CAST(s.tot AS HUGEINT) AS VARCHAR) AS DOUBLE)
           / CAST(CAST((2 * CAST(d.df AS HUGEINT) + 1)
                       * (10 * CAST(t.tf AS HUGEINT) * CAST(s.tot AS HUGEINT)
                          + 3 * CAST(s.tot AS HUGEINT)
                          + 9 * CAST(t.dl AS HUGEINT)
                            * CAST(s.n_docs AS HUGEINT)) AS VARCHAR)
                  AS DOUBLE)
           AS DECIMAL(27,6))) AS score_dec
  FROM tf t
  JOIN dft d USING (term)
  JOIN qt q USING (term)
  CROSS JOIN stats s
  GROUP BY q.query_id, t.doc_id)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       CAST(matched_terms AS BIGINT) AS matched_terms,
       CAST(CAST(score_dec AS VARCHAR) AS DOUBLE) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_dec DESC, doc_id) AS rnk
      FROM scored)
WHERE rnk <= 10
"""

# Hybrid doc-to-doc retrieval: token-set-Jaccard sparse arm +
# embedding-cosine dense arm (knn_bruteforce's exact _COS twin),
# fused by reciprocal-rank fusion on exact DECIMAL(27,6) sums
# (operators/retrieval.py::rrf_fuse).
EXTRA_ORACLES["hybrid_rrf_retrieval"] = f"""
WITH d AS (
  SELECT doc_id,
         list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS ts
  FROM documents),
q AS (SELECT doc_id AS q_id, ts AS qts FROM d WHERE doc_id IN (0, 1, 2)),
sparse_scored AS (
  SELECT q.q_id, d.doc_id,
         CAST(len(list_intersect(q.qts, d.ts)) AS DOUBLE)
         / CAST(len(q.qts) + len(d.ts)
                - len(list_intersect(q.qts, d.ts)) AS DOUBLE) AS jacc
  FROM q JOIN d ON q.q_id <> d.doc_id),
sparse AS (
  SELECT q_id, doc_id, rn AS sparse_rank FROM (
    SELECT q_id, doc_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY jacc DESC, doc_id) AS rn
    FROM sparse_scored WHERE jacc > 0)
  WHERE rn <= 20),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qe AS (SELECT * FROM e WHERE vec_id < 3),
dense_scored AS (
  SELECT qe.vec_id AS q_id, c.vec_id AS doc_id,
         {_COS.format(a='qe.v', b='c.v')} AS cos
  FROM qe JOIN e c ON qe.vec_id <> c.vec_id),
dense AS (
  SELECT q_id, doc_id, rn AS dense_rank FROM (
    SELECT q_id, doc_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos DESC, doc_id) AS rn
    FROM dense_scored)
  WHERE rn <= 20),
fused AS (
  SELECT COALESCE(s.q_id, dn.q_id) AS q_id,
         COALESCE(s.doc_id, dn.doc_id) AS doc_id,
         s.sparse_rank, dn.dense_rank,
         COALESCE(CAST(1.0 / CAST(60 + s.sparse_rank AS DOUBLE)
                       AS DECIMAL(27,6)), CAST(0 AS DECIMAL(27,6)))
         + COALESCE(CAST(1.0 / CAST(60 + dn.dense_rank AS DOUBLE)
                         AS DECIMAL(27,6)), CAST(0 AS DECIMAL(27,6)))
           AS rrf_dec
  FROM sparse s FULL OUTER JOIN dense dn
    ON s.q_id = dn.q_id AND s.doc_id = dn.doc_id)
SELECT q_id, doc_id,
       CAST(sparse_rank AS BIGINT) AS sparse_rank,
       CAST(dense_rank AS BIGINT) AS dense_rank,
       CAST(CAST(rrf_dec AS VARCHAR) AS DOUBLE) AS rrf,
       CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY rrf_dec DESC, doc_id) AS rnk
      FROM fused)
WHERE rnk <= 10
"""

# Pairwise exact two-sample Kolmogorov-Smirnov over per-source
# doc-length distributions (operators/lm_quality.py::ks_value_drift):
# D = max_x |c_a(x)*n_b - c_b(x)*n_a| / (n_a*n_b) on the common
# denominator, cross-products exact in HUGEINT, one string-routed
# final division; ks_at = smallest x attaining the max.
EXTRA_ORACLES["source_ks_drift"] = """
WITH counts AS (
  SELECT source AS g, n_chars AS x, COUNT(*) AS c
  FROM documents GROUP BY g, x),
totals AS (SELECT g, SUM(c) AS n FROM counts GROUP BY g),
spine AS (
  SELECT t.g, d.x
  FROM totals t CROSS JOIN (SELECT DISTINCT x FROM counts) d),
cum AS (
  SELECT s.g, s.x,
         SUM(COALESCE(c.c, 0)) OVER (PARTITION BY s.g ORDER BY s.x) AS cum
  FROM spine s LEFT JOIN counts c ON s.g = c.g AND s.x = c.x),
diffs AS (
  SELECT a.g AS ga, b.g AS gb, ta.n AS na, tb.n AS nb, a.x,
         ABS(CAST(a.cum AS HUGEINT) * CAST(tb.n AS HUGEINT)
             - CAST(b.cum AS HUGEINT) * CAST(ta.n AS HUGEINT)) AS d_num
  FROM cum a
  JOIN cum b ON a.x = b.x AND a.g < b.g
  JOIN totals ta ON a.g = ta.g
  JOIN totals tb ON b.g = tb.g),
dmax AS (SELECT ga, gb, na, nb, MAX(d_num) AS d_max
         FROM diffs GROUP BY ga, gb, na, nb)
SELECT ga AS source_a, gb AS source_b,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(MIN(x) AS BIGINT) AS ks_at,
       CAST(CAST(d_max AS VARCHAR) AS DOUBLE)
         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks
FROM diffs JOIN dmax USING (ga, gb, na, nb)
WHERE d_num = d_max
GROUP BY ga, gb, na, nb, d_max
"""


# ---------------------------------------------------------------------------
# ROUND-9 WINDOW ROTATION (mechanical; mirrors plans/queries.py): the
# nine ROTATION_CANDIDATES_R8 promote into the driver window's oracle
# set; nine twice-green r7 shapes demote to EXTRA (still parity-swept
# locally every round). ORACLES must equal the declared window's
# oracle-backed set (pinned by test_driver_window_is_at_most_50).
# ---------------------------------------------------------------------------
_R9_IN = [  # promoted into the driver window (all oracle-backed)
    "q9_product_profit", "q11_important_stock",
    "q16_supplier_part_counts", "q20_part_promotion",
    "dup_span_extents", "events_mad_outliers",
    "doc_bm25_topk", "hybrid_rrf_retrieval", "source_ks_drift",
]
_R9_OUT = [  # demoted to EXTRA (all keep an in-window twin)
    "q4_order_priority", "q7_nation_volume", "q14_promo_revenue_share",
    "q17_small_qty_revenue", "q22_idle_customers", "event_gaps",
    "window_rank_stats", "source_tv_drift", "dsir_importance_weights",
]
for _k in _R9_IN:
    ORACLES[_k] = EXTRA_ORACLES.pop(_k)
for _k in _R9_OUT:
    EXTRA_ORACLES[_k] = ORACLES.pop(_k)


# BM25 serve path against the materialized inverted index: the index
# build is lossless (tf/df/dl/stats identical by construction, shared
# scoring tail in operators/retrieval.py), so the oracle IS
# doc_bm25_topk's — same result set, different physical path (the
# knn_ann_pq_serve pattern, but exactly checkable).
EXTRA_ORACLES["doc_bm25_from_index"] = ORACLES["doc_bm25_topk"]


# PMI collocation extraction (r9): log-free surrogate — the PMI
# log's argument ranked directly. Exact HUGEINT cross-products,
# string-routed final division; parallel unnests zip positionally
# (the dsir_importance_weights bigram device); HAVING applies the
# min_count prune before any ratio.
EXTRA_ORACLES["doc_pmi_collocations"] = """
WITH docs2 AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE text IS NOT NULL),
bg AS (
  SELECT unnest(ts[1:len(ts)-1]) AS prev, unnest(ts[2:len(ts)]) AS cur
  FROM docs2),
pair_counts AS (
  SELECT prev, cur, COUNT(*) AS n_pair
  FROM bg GROUP BY prev, cur HAVING COUNT(*) >= 5),
unic AS (
  SELECT term, COUNT(*) AS n_term
  FROM (SELECT unnest(ts) AS term FROM docs2) GROUP BY term),
tot AS (
  SELECT (SELECT COUNT(*) FROM bg) AS t_bi,
         (SELECT SUM(n_term) FROM unic) AS t_uni),
scored AS (
  SELECT p.prev, p.cur, p.n_pair,
         ua.n_term AS n_prev, ub.n_term AS n_cur,
         CAST(CAST(CAST(p.n_pair AS HUGEINT)
                   * CAST(t.t_uni AS HUGEINT)
                   * CAST(t.t_uni AS HUGEINT) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(CAST(ua.n_term AS HUGEINT)
                     * CAST(ub.n_term AS HUGEINT)
                     * CAST(t.t_bi AS HUGEINT) AS VARCHAR) AS DOUBLE)
           AS score
  FROM pair_counts p
  JOIN unic ua ON p.prev = ua.term
  JOIN unic ub ON p.cur = ub.term
  CROSS JOIN tot t)
SELECT CAST(rnk AS BIGINT) AS rank, prev, cur,
       CAST(n_pair AS BIGINT) AS n_pair,
       CAST(n_prev AS BIGINT) AS n_prev,
       CAST(n_cur AS BIGINT) AS n_cur, score
FROM (SELECT *, row_number() OVER (ORDER BY score DESC, prev, cur)
               AS rnk
      FROM scored)
WHERE rnk <= 50
"""


# Per-doc 3-gram novelty vs the held-out reference split (r10): the
# doc-level decontamination/freshness score. Distinct shingles via
# positional token indexing (range is end-exclusive: i in
# [1, len-2] for 3-grams, empty for short docs — matching Spark's
# shingles() CASE guard); integer counts, one IEEE division.
EXTRA_ORACLES["doc_ngram_novelty"] = """
WITH tr AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE text IS NOT NULL AND doc_id % 20 != 0),
tsh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh
  FROM tr, unnest(range(1, len(ts) - 1)) AS t(i)),
ref AS (
  SELECT DISTINCT ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh
  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS ts
        FROM documents WHERE text IS NOT NULL AND doc_id % 20 = 0),
       unnest(range(1, len(ts) - 1)) AS t(i))
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(r.sh) AS BIGINT) AS n_seen,
       CAST(COUNT(*) - COUNT(r.sh) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS novelty
FROM tsh t LEFT JOIN ref r ON t.sh = r.sh
GROUP BY t.doc_id
"""


# Span-level eval-leak localization (r10): dup_span_extents' window
# + gaps-and-islands SQL pointed ACROSS corpora — a train window is
# marked when its text appears anywhere in the reference split.
EXTRA_ORACLES["eval_leak_spans"] = """
WITH tw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents WHERE doc_id % 20 != 0),
rw AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS w
       FROM documents WHERE doc_id % 20 = 0),
twin AS (SELECT doc_id, CAST(i AS INT) AS pos,
                array_to_string(w[i+1:i+8], ' ') AS win
         FROM tw, unnest(range(0, greatest(len(w) - 7, 0))) AS t(i)),
rwin AS (SELECT DISTINCT array_to_string(w[i+1:i+8], ' ') AS win
         FROM rw, unnest(range(0, greatest(len(w) - 7, 0))) AS t(i)),
m AS (SELECT twin.doc_id, twin.pos FROM twin JOIN rwin USING (win)),
b AS (SELECT doc_id, pos,
        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  IS NULL
              OR pos > lag(pos) OVER (PARTITION BY doc_id
                                      ORDER BY pos) + 8
             THEN 1 ELSE 0 END AS brk
      FROM m),
g AS (SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM b),
s AS (SELECT doc_id, grp, MIN(pos) AS sp, MAX(pos) + 7 AS ep
      FROM g GROUP BY doc_id, grp)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(ep - sp + 1) AS BIGINT) AS leaked_tokens,
       CAST(MAX(ep - sp + 1) AS BIGINT) AS max_span_tokens
FROM s GROUP BY doc_id
"""


# Change magnitude for the snapshot 'changed' class (r10): distinct-
# token Jaccard old-vs-new per doc. Integer set sizes (both engines
# dedup via list_distinct/array_distinct), union by |A|+|B|-|A∩B|
# (list_intersect is only ever len()'d — its element order is
# engine-specific), one IEEE division.
EXTRA_ORACLES["snapshot_change_magnitude"] = """
WITH oldc AS (SELECT doc_id, text FROM documents),
newc AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 1 THEN text || ' updated'
              ELSE text END AS text
  FROM documents WHERE doc_id % 17 != 3),
po AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp_o,
         list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS ts_o
  FROM oldc WHERE text IS NOT NULL),
pn AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp_n,
         list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS ts_n
  FROM newc WHERE text IS NOT NULL)
SELECT doc_id,
       CAST(len(ts_o) AS BIGINT) AS n_old,
       CAST(len(ts_n) AS BIGINT) AS n_new,
       CAST(len(list_intersect(ts_o, ts_n)) AS BIGINT) AS n_common,
       CAST(len(list_intersect(ts_o, ts_n)) AS DOUBLE)
         / CAST(len(ts_o) + len(ts_n) - len(list_intersect(ts_o, ts_n))
                AS DOUBLE) AS jacc
FROM po JOIN pn USING (doc_id)
WHERE fp_o != fp_n
"""


# Embedding-space drift monitor (r10): exact-decimal per-dimension
# centroid means (the DSIR decimal-sum device; one string-routed
# division per dim), then the deterministic left-fold cosine
# (list_inner_product ≡ Spark's aggregate/zip_with fold — proven
# bit-identical) between |groups|-sized centroid arrays. Parallel
# positional unnest (1-based here, 0-based in Spark — pos is only an
# ordering key and never projected).
EXTRA_ORACLES["source_embedding_drift"] = """
WITH dims AS (
  SELECT label AS grp, i, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
sums AS (
  SELECT grp, i, SUM(CAST(v AS DECIMAL(27,6))) AS s, COUNT(*) AS n
  FROM dims GROUP BY grp, i),
cents AS (
  SELECT grp, CAST(MAX(n) AS BIGINT) AS n_vecs,
         list(CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
              ORDER BY i) AS centroid
  FROM sums GROUP BY grp)
SELECT a.grp AS group_a, b.grp AS group_b,
       a.n_vecs AS n_a, b.n_vecs AS n_b,
       list_inner_product(a.centroid, b.centroid)
         / sqrt(list_inner_product(a.centroid, a.centroid)
                * list_inner_product(b.centroid, b.centroid))
         AS centroid_cos
FROM cents a JOIN cents b ON a.grp < b.grp
"""


# Between-crawls corpus snapshot diff (r10): one FULL OUTER join on
# doc_id, normalized-md5 content identity, BIGINT token deltas. The
# "new crawl" is the same deterministic perturbation the Spark query
# builds (%17 removed, %13 edited, %23 re-landed under new ids).
EXTRA_ORACLES["corpus_snapshot_diff"] = """
WITH oldc AS (SELECT doc_id, source, text FROM documents),
newc AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 13 = 1 THEN text || ' updated'
              ELSE text END AS text
  FROM documents WHERE doc_id % 17 != 3
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, source, text || ' fresh' AS text
  FROM documents WHERE doc_id % 23 = 2),
po AS (
  SELECT doc_id, source AS grp_o,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp_o,
         len(regexp_split_to_array(trim(text), '\\s+')) AS ntok_o
  FROM oldc WHERE text IS NOT NULL),
pn AS (
  SELECT doc_id, source AS grp_n,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp_n,
         len(regexp_split_to_array(trim(text), '\\s+')) AS ntok_n
  FROM newc WHERE text IS NOT NULL)
SELECT COALESCE(grp_n, grp_o) AS source,
       CASE WHEN fp_o IS NULL THEN 'added'
            WHEN fp_n IS NULL THEN 'removed'
            WHEN fp_o != fp_n THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(COALESCE(ntok_n, 0) - COALESCE(ntok_o, 0)) AS BIGINT)
         AS token_delta
FROM po FULL OUTER JOIN pn USING (doc_id)
GROUP BY 1, 2
"""


# Heaps'-law vocabulary growth over nested md5-bucket subsamples
# (r10): n_vocab(k) = |terms with min bucket < k| — one token pass
# serves every step; exact integers, one IEEE division for ttr.
EXTRA_ORACLES["corpus_vocab_growth"] = """
WITH base AS (
  SELECT CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                     1, 8)) AS BIGINT) % 10 AS b,
         regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE text IS NOT NULL),
per_bucket AS (
  SELECT b, COUNT(*) AS docs, SUM(len(ts)) AS toks
  FROM base GROUP BY b),
term_fb AS (
  SELECT term, MIN(b) AS fb
  FROM (SELECT b, unnest(ts) AS term FROM base) GROUP BY term),
grid AS (SELECT CAST(k AS INT) AS k FROM range(1, 11) t(k)),
sizes AS (
  SELECT k, CAST(SUM(docs) AS BIGINT) AS n_docs,
         CAST(SUM(toks) AS BIGINT) AS n_tokens
  FROM per_bucket JOIN grid ON b < k GROUP BY k),
vocab AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_vocab
  FROM term_fb JOIN grid ON fb < k GROUP BY k)
SELECT CAST(k * 10 AS BIGINT) AS sample_pct, n_docs, n_tokens, n_vocab,
       CAST(n_vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
FROM sizes JOIN vocab USING (k)
"""


# α=½ temperature-scaled source mixing weights (r10): sqrt is
# IEEE-correctly-rounded (the one bit-exact sub-linear exponent);
# normalization by the LARGEST group's integer count (max, never a
# fold-order-dependent float sum); window SUM routes HUGEINT→BIGINT
# before the double cast (int128→double is not correctly rounded).
EXTRA_ORACLES["source_mix_weights"] = """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
              AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL GROUP BY source)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE)
         / CAST(CAST(SUM(n_tokens) OVER () AS BIGINT) AS DOUBLE)
         AS token_share,
       sqrt(CAST(n_tokens AS DOUBLE))
         / sqrt(CAST(MAX(n_tokens) OVER () AS DOUBLE))
         AS temp_rel_weight,
       (sqrt(CAST(n_tokens AS DOUBLE))
          / sqrt(CAST(MAX(n_tokens) OVER () AS DOUBLE)))
         / (CAST(n_tokens AS DOUBLE)
              / CAST(MAX(n_tokens) OVER () AS DOUBLE))
         AS upsample_boost
FROM per
"""


# ---------------------------------------------------------------------------
# ROUND-10 WINDOW ROTATION (mechanical; mirrors plans/queries.py):
# both ROTATION_CANDIDATES_R9 promote into the driver window's oracle
# set; two thrice-green (r7+r8+r9) shapes demote to EXTRA (still
# parity-swept locally every round). ORACLES must equal the declared
# window's oracle-backed set (pinned by test_driver_window_is_at_most_50).
# ---------------------------------------------------------------------------
_R10_IN = [  # promoted into the driver window (all oracle-backed)
    "doc_bm25_from_index", "doc_pmi_collocations",
]
_R10_OUT = [  # demoted to EXTRA (both keep an in-window twin)
    "orders_by_year", "window_running_total",
]
for _k in _R10_IN:
    ORACLES[_k] = EXTRA_ORACLES.pop(_k)
for _k in _R10_OUT:
    EXTRA_ORACLES[_k] = ORACLES.pop(_k)


# ---------------------------------------------------------------------------
# ROUND-11 WINDOW ROTATION (mechanical; mirrors plans/queries.py):
# all seven ROTATION_CANDIDATES_R10 promote into the driver window's
# oracle set; seven four-times-green (r7+r8+r9+r10) shapes demote to
# EXTRA (still parity-swept locally every round). ORACLES must equal
# the declared window's oracle-backed set (pinned by
# test_driver_window_is_at_most_50).
# ---------------------------------------------------------------------------
_R11_IN = [  # promoted into the driver window (all oracle-backed)
    "doc_ngram_novelty", "source_mix_weights", "corpus_vocab_growth",
    "corpus_snapshot_diff", "source_embedding_drift",
    "snapshot_change_magnitude", "eval_leak_spans",
]
_R11_OUT = [  # demoted to EXTRA (all keep an in-window twin)
    "q10_returned_items", "q12_late_shipment_priority",
    "q13_customer_distribution", "q19_disjunctive_filter",
    "events_drawdown", "doc_containment_pairs",
    "jl_projection_distortion",
]
for _k in _R11_IN:
    ORACLES[_k] = EXTRA_ORACLES.pop(_k)
for _k in _R11_OUT:
    EXTRA_ORACLES[_k] = ORACLES.pop(_k)


# Span-scrub transform (r11): the eval_leak_spans window/island SQL
# re-used to produce the (s, e) extent table, then every train doc is
# rewritten — tokens (0-based position) anti-range-joined against the
# extents, survivors string_agg'd back in position order. Clean docs
# keep their ORIGINAL text (no whitespace normalization on untouched
# rows); fully-leaked docs emit NULL text with their audit counts.
EXTRA_ORACLES["eval_leak_scrub"] = """
WITH tw AS (SELECT doc_id, text,
                   CASE WHEN text IS NOT NULL THEN
                        regexp_split_to_array(trim(text), '\\s+') END AS w
            FROM documents WHERE doc_id % 20 != 0),
rwin AS (SELECT DISTINCT array_to_string(w[i+1:i+8], ' ') AS win
         FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS w
               FROM documents WHERE doc_id % 20 = 0),
              unnest(range(0, greatest(len(w) - 7, 0))) AS t(i)),
twin AS (SELECT doc_id, CAST(i AS INT) AS pos,
                array_to_string(w[i+1:i+8], ' ') AS win
         FROM tw, unnest(range(0, greatest(len(w) - 7, 0))) AS t(i)),
m AS (SELECT twin.doc_id, twin.pos FROM twin JOIN rwin USING (win)),
b AS (SELECT doc_id, pos,
        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  IS NULL
              OR pos > lag(pos) OVER (PARTITION BY doc_id
                                      ORDER BY pos) + 8
             THEN 1 ELSE 0 END AS brk
      FROM m),
g AS (SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM b),
s AS (SELECT doc_id, grp, MIN(pos) AS sp, MAX(pos) + 7 AS ep
      FROM g GROUP BY doc_id, grp),
agg AS (SELECT doc_id, COUNT(*) AS n_spans,
               SUM(ep - sp + 1) AS tokens_removed
        FROM s GROUP BY doc_id),
tok AS (SELECT doc_id, w, unnest(range(len(w))) AS i
        FROM tw WHERE doc_id IN (SELECT doc_id FROM agg)),
tok2 AS (SELECT doc_id, CAST(i AS INT) AS i, w[i+1] AS t FROM tok),
kept AS (SELECT k.doc_id, k.i, k.t
         FROM tok2 k LEFT JOIN s
           ON s.doc_id = k.doc_id AND k.i BETWEEN s.sp AND s.ep
         WHERE s.doc_id IS NULL),
krows AS (SELECT doc_id, COUNT(*) AS n_kept,
                 string_agg(t, ' ' ORDER BY i) AS newtext
          FROM kept GROUP BY doc_id)
SELECT tw.doc_id,
       CASE WHEN agg.doc_id IS NULL THEN 'clean'
            WHEN COALESCE(krows.n_kept, 0) > 0 THEN 'scrubbed'
            ELSE 'dropped' END AS status,
       CAST(COALESCE(agg.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(agg.tokens_removed, 0) AS BIGINT)
         AS tokens_removed,
       CAST(CASE WHEN agg.doc_id IS NULL THEN COALESCE(len(tw.w), 0)
                 ELSE COALESCE(krows.n_kept, 0) END AS BIGINT)
         AS n_tokens_kept,
       CASE WHEN agg.doc_id IS NULL THEN tw.text
            WHEN COALESCE(krows.n_kept, 0) > 0 THEN krows.newtext
            END AS text
FROM tw LEFT JOIN agg ON tw.doc_id = agg.doc_id
        LEFT JOIN krows ON tw.doc_id = krows.doc_id
"""


# Incremental-crawl apply (r11): upsert the deterministic delta over
# the corpus — full-outer join on doc_id, op classification by
# presence flags + the normalized md5 fingerprint (refreshed =
# content-identical re-land), tombstones (delta NULL text) excluded.
EXTRA_ORACLES["crawl_delta_apply"] = """
WITH delta AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 17 = 3 THEN NULL
              WHEN doc_id % 13 = 1 THEN text || ' updated'
              ELSE '  ' || text END AS text
  FROM documents
  WHERE text IS NOT NULL
    AND (doc_id % 17 = 3 OR doc_id % 13 = 1 OR doc_id % 19 = 5)
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, source, text || ' fresh' AS text
  FROM documents WHERE doc_id % 23 = 2 AND text IS NOT NULL),
b AS (SELECT doc_id, source AS grp_b, text AS txt_b,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
               AS fp_b,
             TRUE AS in_b
      FROM documents),
d AS (SELECT doc_id, source AS grp_d, text AS txt_d,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
               AS fp_d,
             TRUE AS in_d
      FROM delta),
j AS (SELECT doc_id, grp_b, txt_b, fp_b, in_b, grp_d, txt_d, fp_d,
             in_d,
             CASE WHEN in_d IS NULL THEN 'carried'
                  WHEN txt_d IS NULL THEN 'deleted'
                  WHEN in_b IS NULL THEN 'added'
                  WHEN fp_b = fp_d THEN 'refreshed'
                  ELSE 'updated' END AS op
      FROM b FULL OUTER JOIN d USING (doc_id))
SELECT doc_id,
       CASE WHEN op = 'carried' THEN grp_b ELSE grp_d END AS source,
       op,
       CASE WHEN op = 'carried' THEN txt_b ELSE txt_d END AS text
FROM j WHERE op != 'deleted'
"""


# Winnowing fingerprint near-dup (r11): the rolling-hash wh table
# winnowed — per window of 4 consecutive hashes keep the min (ties
# RIGHTMOST: position = w − first-position-in-reversed-window, the
# same expression the engine uses), encode (pos, fp) as one BIGINT
# (pos·(2³¹−1) + fp) so list_distinct behaves identically, then the
# rolling_fingerprint_neardup equi-join over the selected VALUES.
_WINNOW_M = 2147483647
_WINNOW_SEL = (
    "CAST(i + 4 - list_position(list_reverse(wh[i+1:i+4]),"
    " list_min(wh[i+1:i+4])) AS BIGINT) * 2147483647"
    " + list_min(wh[i+1:i+4])")
_WINNOW_SHORT = (
    "CAST(len(wh) - list_position(list_reverse(wh), list_min(wh))"
    " AS BIGINT) * 2147483647 + list_min(wh)")
EXTRA_ORACLES["winnow_fingerprint_neardup"] = f"""
WITH h AS (
  SELECT doc_id,
         list_transform(regexp_split_to_array(trim(text), '\\s+'),
                        t -> CAST(concat('0x', substring(md5(t), 1, 8))
                                  AS BIGINT)) AS hs
  FROM documents WHERE text IS NOT NULL
), w AS (
  SELECT doc_id,
         [({_ROLL_TERMS}) % {_ROLL_P}
          for i in range(1, len(hs) - 8 + 2)] AS wh
  FROM h
), sel AS (
  SELECT doc_id,
         CASE WHEN len(wh) >= 4 THEN
           list_distinct([{_WINNOW_SEL}
                          for i in range(0, len(wh) - 4 + 1)])
         WHEN len(wh) >= 1 THEN [{_WINNOW_SHORT}]
         ELSE CAST([] AS BIGINT[]) END AS s
  FROM w
), x AS (
  SELECT doc_id, UNNEST(s) AS v FROM sel
), fps AS (
  SELECT DISTINCT doc_id, v % {_WINNOW_M} AS fp FROM x
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


# Within-corpus exact-substring self-dedup scrub (r11): the
# eval_leak_scrub reconstruction tail over KEEP-FIRST duplicate
# extents — first occurrence of each >1-occurrence window by the
# encoded doc_id*2^31+pos minimum, every other occurrence marked,
# islands merged per doc, survivors string_agg'd back.
EXTRA_ORACLES["dup_span_scrub"] = """
WITH tw AS (SELECT doc_id, text,
                   CASE WHEN text IS NOT NULL THEN
                        regexp_split_to_array(trim(text), '\\s+') END AS w
            FROM documents),
twin AS (SELECT doc_id, CAST(i AS INT) AS pos,
                array_to_string(w[i+1:i+8], ' ') AS win
         FROM tw, unnest(range(0, greatest(len(w) - 7, 0))) AS t(i)),
firsts AS (SELECT win,
                  MIN(CAST(doc_id AS BIGINT) * 2147483648 + pos)
                    AS first_enc,
                  COUNT(*) AS n_occ
           FROM twin GROUP BY win HAVING COUNT(*) > 1),
m AS (SELECT twin.doc_id, twin.pos
      FROM twin JOIN firsts USING (win)
      WHERE CAST(twin.doc_id AS BIGINT) * 2147483648 + twin.pos
            != firsts.first_enc),
b AS (SELECT doc_id, pos,
        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  IS NULL
              OR pos > lag(pos) OVER (PARTITION BY doc_id
                                      ORDER BY pos) + 8
             THEN 1 ELSE 0 END AS brk
      FROM m),
g AS (SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM b),
s AS (SELECT doc_id, grp, MIN(pos) AS sp, MAX(pos) + 7 AS ep
      FROM g GROUP BY doc_id, grp),
agg AS (SELECT doc_id, COUNT(*) AS n_spans,
               SUM(ep - sp + 1) AS tokens_removed
        FROM s GROUP BY doc_id),
tok AS (SELECT doc_id, w, unnest(range(len(w))) AS i
        FROM tw WHERE doc_id IN (SELECT doc_id FROM agg)),
tok2 AS (SELECT doc_id, CAST(i AS INT) AS i, w[i+1] AS t FROM tok),
kept AS (SELECT k.doc_id, k.i, k.t
         FROM tok2 k LEFT JOIN s
           ON s.doc_id = k.doc_id AND k.i BETWEEN s.sp AND s.ep
         WHERE s.doc_id IS NULL),
krows AS (SELECT doc_id, COUNT(*) AS n_kept,
                 string_agg(t, ' ' ORDER BY i) AS newtext
          FROM kept GROUP BY doc_id)
SELECT tw.doc_id,
       CASE WHEN agg.doc_id IS NULL THEN 'clean'
            WHEN COALESCE(krows.n_kept, 0) > 0 THEN 'scrubbed'
            ELSE 'dropped' END AS status,
       CAST(COALESCE(agg.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(agg.tokens_removed, 0) AS BIGINT)
         AS tokens_removed,
       CAST(CASE WHEN agg.doc_id IS NULL THEN COALESCE(len(tw.w), 0)
                 ELSE COALESCE(krows.n_kept, 0) END AS BIGINT)
         AS n_tokens_kept,
       CASE WHEN agg.doc_id IS NULL THEN tw.text
            WHEN COALESCE(krows.n_kept, 0) > 0 THEN krows.newtext
            END AS text
FROM tw LEFT JOIN agg ON tw.doc_id = agg.doc_id
        LEFT JOIN krows ON tw.doc_id = krows.doc_id
"""

# Pairwise two-sample chi-square homogeneity over per-source 50-char
# doc-length bins, exact: HUGEINT (= Spark DECIMAL(38,0))
# cross-products, string-routed to double, per-bin terms quantized
# DECIMAL(27,6) and summed exactly; private-bin mass folds
# analytically per side ((N_a - shared_a)*N_b/N_a). Bin = n_chars
# div 50 (integer division — NOT double-cast, which rounds here but
# truncates in Spark).
EXTRA_ORACLES["source_chi2_drift"] = """
WITH counts AS (
  SELECT source AS g,
         -- exact integer FLOOR (DuckDB `//` truncates like Spark
         -- `div`; n_chars >= 0 here, correction kept so the oracle
         -- states the engine's actual binning law)
         CAST(n_chars AS BIGINT) // 50
         - CASE WHEN CAST(n_chars AS BIGINT) % 50 < 0
                THEN 1 ELSE 0 END AS bin,
         COUNT(*) AS c
  FROM documents GROUP BY g, bin
), totals AS (
  SELECT g, SUM(c) AS ctot FROM counts GROUP BY g
), shared AS (
  SELECT a.g AS ga, b.g AS gb, COUNT(*) AS shared_bins,
         SUM(a.c) AS sa, SUM(b.c) AS sb,
         SUM(CAST(
           CAST(CAST(ABS(CAST(a.c AS HUGEINT) * CAST(tb.ctot AS HUGEINT)
                         - CAST(b.c AS HUGEINT) * CAST(ta.ctot AS HUGEINT))
                     AS VARCHAR) AS DOUBLE)
           * CAST(CAST(ABS(CAST(a.c AS HUGEINT) * CAST(tb.ctot AS HUGEINT)
                           - CAST(b.c AS HUGEINT) * CAST(ta.ctot AS HUGEINT))
                       AS VARCHAR) AS DOUBLE)
           / (CAST(CAST(CAST(ta.ctot AS HUGEINT) * CAST(tb.ctot AS HUGEINT)
                        AS VARCHAR) AS DOUBLE)
              * CAST(a.c + b.c AS DOUBLE))
           AS DECIMAL(27,6))) AS s_shared
  FROM counts a
  JOIN counts b ON a.bin = b.bin AND a.g < b.g
  JOIN totals ta ON a.g = ta.g
  JOIN totals tb ON b.g = tb.g
  GROUP BY a.g, b.g
), spine AS (
  SELECT ta.g AS ga, ta.ctot AS ca, tb.g AS gb, tb.ctot AS cb
  FROM totals ta JOIN totals tb ON ta.g < tb.g
)
SELECT ga AS source_a, gb AS source_b,
       CAST(COALESCE(shared_bins, 0) AS BIGINT) AS shared_bins,
       CAST(CAST(
         COALESCE(s_shared, CAST(0 AS DECIMAL(27,6)))
         + CAST(CAST(CAST((ca - COALESCE(sa, 0)) * CAST(cb AS HUGEINT)
                          AS VARCHAR) AS DOUBLE)
                / CAST(ca AS DOUBLE) AS DECIMAL(27,6))
         + CAST(CAST(CAST((cb - COALESCE(sb, 0)) * CAST(ca AS HUGEINT)
                          AS VARCHAR) AS DOUBLE)
                / CAST(cb AS DOUBLE) AS DECIMAL(27,6))
         AS VARCHAR) AS DOUBLE) AS chi2
FROM spine LEFT JOIN shared USING (ga, gb)
"""

# Gopher repetition signals: exact integer numerators/denominators,
# top-gram numerators zero unless the gram repeats (count >= 2),
# one int/int IEEE division per fraction (exact ints < 2^53 divide
# correctly-rounded on both engines). Grams are 1-based list slices;
# the dup-5 numerator is the POSITION-UNION char sum (DISTINCT
# (doc, pos) before the token-length join — overlapping duplicated
# grams never double-count). Line split on chr(10), non-regex (Spark
# split('\n') is the same literal split).
EXTRA_ORACLES["doc_repetition_signals"] = """
WITH base AS (
  SELECT doc_id,
         regexp_split_to_array(trim(COALESCE(text, '')), '\\s+') AS w,
         string_split(COALESCE(text, ''), chr(10)) AS lines
  FROM documents
), b AS (
  SELECT doc_id, w, lines,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(COALESCE(list_sum(list_transform(w, x -> length(x))), 0)
              AS BIGINT) AS tok_chars,
         CAST(COALESCE(list_sum(list_transform(lines, x -> length(x))),
                       0) AS BIGINT) AS line_chars,
         CAST(len(lines) - len(list_distinct(lines)) AS BIGINT)
           AS dup_lines,
         CAST(COALESCE(list_sum(list_transform(lines, x -> length(x))),
                       0)
              - COALESCE(list_sum(list_transform(list_distinct(lines),
                                                 x -> length(x))), 0)
              AS BIGINT) AS dup_line_chars
  FROM base
), g2 AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, array_to_string(w[i:i+1], ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        FROM b WHERE len(w) >= 2)
), g3 AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, array_to_string(w[i:i+2], ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        FROM b WHERE len(w) >= 3)
), t2 AS (
  SELECT doc_id, CAST(CASE WHEN cnt >= 2
                         THEN cnt * (length(g) - 1)
                         ELSE 0 END AS BIGINT) AS topchars
  FROM (SELECT doc_id, g, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY COUNT(*) DESC, g ASC) AS rn
        FROM g2 GROUP BY doc_id, g)
  WHERE rn = 1
), t3 AS (
  SELECT doc_id, CAST(CASE WHEN cnt >= 2
                         THEN cnt * (length(g) - 2)
                         ELSE 0 END AS BIGINT) AS topchars
  FROM (SELECT doc_id, g, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY COUNT(*) DESC, g ASC) AS rn
        FROM g3 GROUP BY doc_id, g)
  WHERE rn = 1
), d3 AS (
  SELECT dp.doc_id, CAST(SUM(length(b2.w[dp.p])) AS BIGINT) AS dupchars
  FROM (SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS p
        FROM (SELECT doc_id, unnest(range(i, i + 3)) AS p
              FROM (SELECT doc_id, i,
                           COUNT(*) OVER (PARTITION BY doc_id, g) AS cnt
                    FROM g3)
              WHERE cnt > 1)) dp
  JOIN b b2 USING (doc_id)
  GROUP BY dp.doc_id
)
SELECT b.doc_id, b.n_tokens, b.n_lines,
       CASE WHEN b.n_lines > 0 THEN CAST(b.dup_lines AS DOUBLE)
                                    / CAST(b.n_lines AS DOUBLE)
            ELSE 0.0 END AS dup_line_frac,
       CASE WHEN b.line_chars > 0 THEN CAST(b.dup_line_chars AS DOUBLE)
                                       / CAST(b.line_chars AS DOUBLE)
            ELSE 0.0 END AS dup_line_char_frac,
       CASE WHEN b.tok_chars > 0
            THEN CAST(COALESCE(t2.topchars, 0) AS DOUBLE)
                 / CAST(b.tok_chars AS DOUBLE)
            ELSE 0.0 END AS top2gram_char_frac,
       CASE WHEN b.tok_chars > 0
            THEN CAST(COALESCE(t3.topchars, 0) AS DOUBLE)
                 / CAST(b.tok_chars AS DOUBLE)
            ELSE 0.0 END AS top3gram_char_frac,
       CASE WHEN b.tok_chars > 0
            THEN CAST(COALESCE(d3.dupchars, 0) AS DOUBLE)
                 / CAST(b.tok_chars AS DOUBLE)
            ELSE 0.0 END AS dup3gram_char_frac
FROM b LEFT JOIN t2 USING (doc_id)
       LEFT JOIN t3 USING (doc_id)
       LEFT JOIN d3 USING (doc_id)
"""

# Cohort retention: day = epoch_ms // 86400000 (the
# events_user_growth grain — `//`/div agree on positive millis);
# exact BIGINT counts, one int/int double division.
EXTRA_ORACLES["events_cohort_retention"] = """
WITH ud AS (
  SELECT DISTINCT user_id AS u, epoch_ms(ts) // 86400000 AS d
  FROM events),
first AS (SELECT u, MIN(d) AS cohort FROM ud GROUP BY u),
sizes AS (SELECT cohort, COUNT(*) AS cohort_users
          FROM first GROUP BY cohort),
act AS (
  SELECT f.cohort, ud.d - f.cohort AS day_offset,
         COUNT(*) AS active_users
  FROM ud JOIN first f USING (u)
  GROUP BY f.cohort, ud.d - f.cohort)
SELECT CAST(a.cohort * 86400000 AS BIGINT) AS cohort_day_ms,
       CAST(a.day_offset AS BIGINT) AS day_offset,
       CAST(s.cohort_users AS BIGINT) AS cohort_users,
       CAST(a.active_users AS BIGINT) AS active_users,
       CAST(a.active_users AS DOUBLE) / CAST(s.cohort_users AS DOUBLE)
         AS retention
FROM act a JOIN sizes s USING (cohort)
"""

# Markov transitions: lag over (epoch_ms(ts), event_id) — the unique
# id totalizes the order, so counts are engine-independent; p is one
# exact-int double division.
EXTRA_ORACLES["events_markov_transitions"] = """
WITH p AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_ms(ts), event_id)
           AS prev_type
  FROM events),
c AS (SELECT prev_type, event_type, COUNT(*) AS n
      FROM p WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type),
t AS (SELECT prev_type, SUM(n) AS n_from FROM c GROUP BY prev_type)
SELECT c.prev_type, c.event_type,
       CAST(c.n AS BIGINT) AS n_transitions,
       CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
FROM c JOIN t USING (prev_type)
"""

# CUSUM change-point: the argmax of |n*prefix_i - i*total| is exact
# decimal arithmetic (values quantized DECIMAL(27,6) — single
# rounding both engines; factors 27,6 x 10,0 keep the product <= 38
# digits, DuckDB's hard cap); magnitude = one string-routed
# exact/exact division. Ties -> smallest i.
EXTRA_ORACLES["events_cusum_changepoint"] = """
WITH d AS (
  SELECT event_type AS k,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY epoch_ms(ts), event_id) AS i,
         CAST(value AS DECIMAL(27,6)) AS v
  FROM events),
c AS (
  SELECT k, i,
         CAST(SUM(v) OVER (PARTITION BY k ORDER BY i) AS DECIMAL(27,6))
           AS prefix,
         CAST(SUM(v) OVER (PARTITION BY k) AS DECIMAL(27,6)) AS total,
         COUNT(*) OVER (PARTITION BY k) AS n
  FROM d),
s AS (
  SELECT k, n, i,
         ABS(CAST(n AS DECIMAL(10,0)) * prefix
             - CAST(i AS DECIMAL(10,0)) * total) AS dd
  FROM c),
m AS (
  SELECT k, n, dd, MIN(i) AS change_idx
  FROM (SELECT k, n, i, dd, MAX(dd) OVER (PARTITION BY k) AS dmax
        FROM s)
  WHERE dd = dmax GROUP BY k, n, dd)
SELECT k AS event_type, CAST(n AS BIGINT) AS n,
       CAST(change_idx AS BIGINT) AS change_idx,
       CAST(CAST(dd AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
         AS cusum_mag
FROM m
"""

# Gopher heuristic quality signals: exact in-row integer counts, one
# int/int division per ratio, same double-literal thresholds ->
# bit-reproducible keep verdicts (min_stop_hits relaxed to 1 on
# this fixture -- see the query docstring). '...' occurrences via replace
# (non-overlapping left-to-right greedy on both engines).
EXTRA_ORACLES["doc_quality_signals"] = """
WITH b AS (
  SELECT doc_id, COALESCE(text, '') AS t,
         regexp_split_to_array(trim(COALESCE(text, '')), '\\s+') AS w,
         string_split(COALESCE(text, ''), chr(10)) AS lines
  FROM documents
), c AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(COALESCE(list_sum(list_transform(w, x -> length(x))), 0)
              AS BIGINT) AS tok_chars,
         CAST((length(t) - length(replace(t, '#', '')))
              + (length(t) - length(replace(t, '...', ''))) // 3
              AS BIGINT) AS n_symbols,
         CAST(len(list_filter(lines, x ->
                starts_with(ltrim(x), chr(8226))
                OR starts_with(ltrim(x), '-')
                OR starts_with(ltrim(x), '*'))) AS BIGINT) AS n_bullet,
         CAST(len(list_filter(lines, x ->
                ends_with(rtrim(x), '...')
                OR ends_with(rtrim(x), chr(8230)))) AS BIGINT)
           AS n_ellipsis,
         CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
              AS BIGINT) AS n_alpha,
         CAST(CAST(list_contains(w, 'the') AS INT)
              + CAST(list_contains(w, 'be') AS INT)
              + CAST(list_contains(w, 'to') AS INT)
              + CAST(list_contains(w, 'of') AS INT)
              + CAST(list_contains(w, 'and') AS INT)
              + CAST(list_contains(w, 'that') AS INT)
              + CAST(list_contains(w, 'have') AS INT)
              + CAST(list_contains(w, 'with') AS INT) AS BIGINT)
           AS stop_hits
  FROM b
), f AS (
  SELECT doc_id, n_words, stop_hits,
         CASE WHEN n_words > 0 THEN CAST(tok_chars AS DOUBLE)
                                    / CAST(n_words AS DOUBLE)
              ELSE 0.0 END AS mean_word_len,
         CASE WHEN n_words > 0 THEN CAST(n_symbols AS DOUBLE)
                                    / CAST(n_words AS DOUBLE)
              ELSE 0.0 END AS symbol_word_ratio,
         CASE WHEN n_lines > 0 THEN CAST(n_bullet AS DOUBLE)
                                    / CAST(n_lines AS DOUBLE)
              ELSE 0.0 END AS bullet_line_frac,
         CASE WHEN n_lines > 0 THEN CAST(n_ellipsis AS DOUBLE)
                                    / CAST(n_lines AS DOUBLE)
              ELSE 0.0 END AS ellipsis_line_frac,
         CASE WHEN n_words > 0 THEN CAST(n_alpha AS DOUBLE)
                                    / CAST(n_words AS DOUBLE)
              ELSE 0.0 END AS alpha_word_frac
  FROM c)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
       bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
       stop_hits,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_word_ratio <= 0.1
        AND bullet_line_frac <= 0.9
        AND ellipsis_line_frac <= 0.3
        AND alpha_word_frac >= 0.8
        AND stop_hits >= 1) AS keep
FROM f
"""

# Embedding covariance: per-row products quantized DECIMAL(27,6) and
# summed exactly (the DSIR device), per-dim sums likewise; the final
# (Sxy - Sx*Sy/n)/(n-1) is the IDENTICAL IEEE expression (string-
# routed decimal->double hops) -> bit-exact. 1-based unnest indices
# shift to the operator's 0-based dims.
EXTRA_ORACLES["embedding_covariance_matrix"] = """
WITH e AS (
  SELECT vec_id, i - 1 AS i, CAST(v[i] AS DOUBLE) AS x
  FROM (SELECT vec_id, embedding AS v,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
), sxy AS (
  SELECT a.i AS i, b.i AS j, COUNT(*) AS n,
         SUM(CAST(a.x * b.x AS DECIMAL(27,6))) AS sxy
  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
), dims AS (
  SELECT i, SUM(CAST(x AS DECIMAL(27,6))) AS sx FROM e GROUP BY i
)
SELECT CAST(s.i AS INT) AS dim_i, CAST(s.j AS INT) AS dim_j,
       CAST(s.n AS BIGINT) AS n,
       CASE WHEN s.n > 1 THEN
         (CAST(CAST(s.sxy AS VARCHAR) AS DOUBLE)
          - CAST(CAST(da.sx AS VARCHAR) AS DOUBLE)
            * CAST(CAST(db.sx AS VARCHAR) AS DOUBLE)
            / CAST(s.n AS DOUBLE))
         / (CAST(s.n AS DOUBLE) - 1.0)
       END AS cov
FROM sxy s JOIN dims da ON s.i = da.i
           JOIN dims db ON s.j = db.i
"""

# Pearson correlation from the bit-exact covariance: IEEE sqrt is
# correctly rounded on both engines, so corr = cov/(sqrt(vi)*sqrt(vj))
# over bit-identical covs is bit-exact; zero-variance dims -> NULL.
EXTRA_ORACLES["embedding_correlation_matrix"] = """
WITH e AS (
  SELECT vec_id, i - 1 AS i, CAST(v[i] AS DOUBLE) AS x
  FROM (SELECT vec_id, embedding AS v,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
), sxy AS (
  SELECT a.i AS i, b.i AS j, COUNT(*) AS n,
         SUM(CAST(a.x * b.x AS DECIMAL(27,6))) AS sxy
  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
), dims AS (
  SELECT i, SUM(CAST(x AS DECIMAL(27,6))) AS sx FROM e GROUP BY i
), cov AS (
  SELECT CAST(s.i AS INT) AS dim_i, CAST(s.j AS INT) AS dim_j,
         CAST(s.n AS BIGINT) AS n,
         CASE WHEN s.n > 1 THEN
           (CAST(CAST(s.sxy AS VARCHAR) AS DOUBLE)
            - CAST(CAST(da.sx AS VARCHAR) AS DOUBLE)
              * CAST(CAST(db.sx AS VARCHAR) AS DOUBLE)
              / CAST(s.n AS DOUBLE))
           / (CAST(s.n AS DOUBLE) - 1.0)
         END AS cov
  FROM sxy s JOIN dims da ON s.i = da.i
             JOIN dims db ON s.j = db.i
), diag AS (
  SELECT dim_i AS d_, cov AS var_ FROM cov WHERE dim_i = dim_j
)
SELECT c.dim_i, c.dim_j, c.n,
       CASE WHEN vi.var_ > 0 AND vj.var_ > 0
            THEN c.cov / (sqrt(vi.var_) * sqrt(vj.var_)) END AS corr
FROM cov c JOIN diag vi ON c.dim_i = vi.d_
           JOIN diag vj ON c.dim_j = vj.d_
"""

# Bucket-grain CUSUM (r12): the streamable form of
# events_cusum_changepoint — identical decimal algebra evaluated only
# at hourly bucket END boundaries, change point reported as the START
# ms of the argmax bucket (ties -> earliest bucket). Bucketing is
# exact integer FLOOR division: DuckDB's `//` TRUNCATES toward zero
# (verified, duckdb 1.0.0) exactly like Spark's `div`, so BOTH sides
# apply the negative-remainder correction — a bare `//` here would
# silently diverge from the engine on pre-epoch timestamps.
EXTRA_ORACLES["events_cusum_bucketed"] = """
WITH d AS (
  SELECT event_type AS k,
         (epoch_ms(ts) // 3600000
          - CASE WHEN epoch_ms(ts) % 3600000 < 0 THEN 1 ELSE 0 END)
         * 3600000 AS b,
         CAST(value AS DECIMAL(27,6)) AS v
  FROM events),
g AS (
  SELECT k, b, COUNT(v) AS n_b, CAST(SUM(v) AS DECIMAL(27,6)) AS s_b
  FROM d GROUP BY k, b),
c AS (
  SELECT k, b, cum_n,
         CAST(SUM(s_b) OVER (PARTITION BY k ORDER BY b)
              AS DECIMAL(27,6)) AS prefix,
         CAST(SUM(s_b) OVER (PARTITION BY k) AS DECIMAL(27,6)) AS total,
         SUM(n_b) OVER (PARTITION BY k) AS n
  FROM (SELECT *, SUM(n_b) OVER (PARTITION BY k ORDER BY b) AS cum_n
        FROM g)),
s AS (
  SELECT k, n, b, cum_n,
         ABS(CAST(n AS DECIMAL(10,0)) * prefix
             - CAST(cum_n AS DECIMAL(10,0)) * total) AS dd
  FROM c),
m AS (
  SELECT k, n, dd AS dmax, MIN(b) AS change_b
  FROM (SELECT k, n, b, dd, MAX(dd) OVER (PARTITION BY k) AS dm FROM s)
  WHERE dd = dm GROUP BY k, n, dd)
SELECT m.k AS event_type, CAST(m.n AS BIGINT) AS n,
       CAST(m.change_b AS BIGINT) AS change_bucket_ms,
       CAST(s.cum_n AS BIGINT) AS change_cum_idx,
       CAST(CAST(m.dmax AS VARCHAR) AS DOUBLE) / CAST(m.n AS DOUBLE)
         AS cusum_mag
FROM m JOIN s ON m.k = s.k AND m.change_b = s.b
"""


# Perceptual image near-dup (r12): the Spark side EARNS each 64-bit
# dHash end-to-end (sha256-nibble pixels → real PNG encode →
# from-scratch decode → box downsample → gradient bits → pigeonhole
# Hamming join); this oracle derives the identical bits directly from
# the nibble comparisons — bit r*8+c is set iff nibble(r*9+c) >
# nibble(r*9+c+1) over the 72 nibbles of sha256(text) ‖
# sha256(text||':1') — because the fixture pixels are 64+8·nibble and
# both variants (2× NN upscale, +16 brightness) are dHash-invariant
# by construction (see operators/multimodal.py::synthetic_doc_images).
# Exact 500-image self-join is the oracle-side ground truth; the
# engine's pigeonhole join is complete for Hamming ≤ 3 ≥ the 2 asked.
def _dhash_bits_expr(h1: str = "h1", h2: str = "h2") -> str:
    """The 64-bit dHash as SQL over the 72 hex nibbles of two sha256
    columns (the fixture's pixel law is 64+8·nibble, so pixel
    comparisons reduce to nibble strpos comparisons — the −1 cancels
    in >). Shared by the image fixture and the per-frame video
    fixture (different digest columns per frame)."""
    def nib(p: int) -> str:
        if p < 64:
            return (f"strpos('0123456789abcdef', "
                    f"substring({h1}, {p + 1}, 1))")
        return (f"strpos('0123456789abcdef', "
                f"substring({h2}, {p - 63}, 1))")
    return " + ".join(
        f"CASE WHEN {nib(r * 9 + c)} > {nib(r * 9 + c + 1)} "
        f"THEN CAST({-(1 << 63) if r * 8 + c == 63 else (1 << (r * 8 + c))} "
        f"AS BIGINT) ELSE 0 END"
        for r in range(8) for c in range(8))


_DHASH_BITS = _dhash_bits_expr()

EXTRA_ORACLES["image_dhash_neardup"] = f"""
WITH d AS (
  SELECT doc_id, sha256(text) AS h1, sha256(text || ':1') AS h2
  FROM documents WHERE text IS NOT NULL
), h AS (
  SELECT doc_id, ({_DHASH_BITS}) AS dh FROM d
), imgs AS (
  SELECT CAST(doc_id AS VARCHAR) || ':orig' AS img_id, dh FROM h
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR) || ':up2', dh FROM h WHERE doc_id % 3 = 0
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR) || ':b16', dh FROM h WHERE doc_id % 5 = 0
)
SELECT a.img_id AS img_a, b.img_id AS img_b,
       CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
FROM imgs a JOIN imgs b ON a.img_id < b.img_id
WHERE bit_count(xor(a.dh, b.dh)) <= 2
"""

# Per-column data-quality profile (r12): exact row/null/distinct
# counts per column of orders, one row per column. COUNT(DISTINCT)
# excludes NULLs on both engines.
_DQ_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
EXTRA_ORACLES["orders_dq_profile"] = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM orders""" for c in _DQ_COLS)


# Per-source quality floor (r12): exact integer rank threshold at
# ceil(n/4); the value AT a rank is tie-independent, so counts match
# bit-for-bit under any tiebreak.
EXTRA_ORACLES["source_quality_floor"] = """
WITH t AS (
  SELECT source AS g, doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS m
  FROM documents WHERE text IS NOT NULL
), r AS (
  SELECT g, doc_id, m,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY m, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM t
), th AS (
  SELECT g, n, m AS threshold FROM r
  WHERE rn = (n * 1 + 4 - 1) // 4
)
SELECT r.g AS source, CAST(th.n AS BIGINT) AS n_docs,
       CAST(th.threshold AS BIGINT) AS threshold,
       CAST(SUM(CASE WHEN r.m >= th.threshold THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN r.m >= th.threshold THEN r.m ELSE 0 END)
            AS BIGINT) AS kept_sum
FROM r JOIN th ON r.g = th.g
GROUP BY 1, 2, 3
"""


# Interval overlap join (r12): the oracle runs the exact theta join
# (ground truth; cartesian by nature, fine at oracle scale) over
# epoch-day integers; the engine's bucketized equi-join must emit the
# identical pair set + closed-interval overlap lengths.
EXTRA_ORACLES["interval_overlap_shipments"] = """
WITH a AS (
  SELECT l_orderkey, l_linenumber,
         date_diff('day', DATE '1970-01-01',
                   CAST(l_shipdate AS DATE)) AS a_s,
         date_diff('day', DATE '1970-01-01',
                   CAST(l_shipdate AS DATE))
         + 1 + CAST(l_quantity AS INT) AS a_e
  FROM lineitem WHERE l_partkey % 97 = 0
), b AS (
  SELECT o_orderkey AS promo_orderkey,
         date_diff('day', DATE '1970-01-01',
                   CAST(o_orderdate AS DATE)) AS b_s
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND EXTRACT(year FROM o_orderdate) = 1995
)
SELECT l_orderkey, l_linenumber, promo_orderkey,
       CAST(LEAST(a_e, b_s + 30) - GREATEST(a_s, b_s) + 1 AS BIGINT)
         AS overlap_days
FROM a JOIN b ON a_s <= b_s + 30 AND b_s <= a_e
"""


# Triangle participation (r12): wedge-close counting over the exact
# Jaccard pair graph — each triangle {a<b<c} found exactly once by
# joining its two smallest-endpoint edges and closing against (b,c);
# identical join tree to the engine. 2.0*t/(d*(d-1.0)) is the same
# fixed IEEE expression both sides.
EXTRA_ORACLES["neardup_triangle_stats"] = f"""
WITH p AS (
  SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS}) WHERE jacc >= 0.6
), e AS (
  SELECT LEAST(doc_a, doc_b) AS a, GREATEST(doc_a, doc_b) AS b
  FROM p WHERE doc_a <> doc_b GROUP BY 1, 2
), tri AS (
  SELECT x.a, x.b, y.b AS c
  FROM e x JOIN e y ON x.a = y.a AND x.b < y.b
  JOIN e z ON z.a = x.b AND z.b = y.b
), node_tri AS (
  SELECT id, COUNT(*) AS t FROM (
    SELECT a AS id FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri) GROUP BY id
), deg AS (
  SELECT id, COUNT(*) AS d FROM (
    SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY id
)
SELECT deg.id AS doc_id, CAST(d AS BIGINT) AS degree,
       CAST(COALESCE(t, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d > 1
            THEN 2.0 * CAST(COALESCE(t, 0) AS DOUBLE)
                 / (CAST(d AS DOUBLE) * (CAST(d AS DOUBLE) - 1.0))
            ELSE 0.0 END AS clustering
FROM deg LEFT JOIN node_tri ON deg.id = node_tri.id
"""


# RFM segmentation (r12): quintile scores over total orders
# (metric, user_id); NTILE's equal-bucket-remainder-first rule is
# identical cross-engine; monetary ranks and sums on the exact
# decimal, string-routed to double at the end.
EXTRA_ORACLES["events_rfm_segments"] = """
WITH pu AS (
  SELECT user_id,
         MAX(epoch_ms(ts) // 86400000) AS last_day,
         COUNT(*) AS frequency,
         SUM(CAST(value AS DECIMAL(27,6))) AS monetary_d
  FROM events GROUP BY user_id),
mx AS (SELECT MAX(last_day) AS corpus_day FROM pu),
u AS (SELECT pu.*, (corpus_day - last_day) AS recency_days FROM pu, mx),
s AS (
  SELECT user_id, monetary_d,
         NTILE(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
         NTILE(5) OVER (ORDER BY frequency ASC, user_id) AS f_score,
         NTILE(5) OVER (ORDER BY monetary_d ASC, user_id) AS m_score
  FROM u)
SELECT CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(CAST(SUM(monetary_d) AS VARCHAR) AS DOUBLE) AS sum_monetary
FROM s GROUP BY 1
"""


# Video perceptual near-dup (r12): per-frame dHashes from the same
# nibble law (frame j hashes sha256(text||':fj') / ':fj:1'), clips
# join on shared frame hashes (>= 3) — the engine earns each hash
# through real animated-GIF LZW encode -> decode; the rotated-palette
# re-encode decodes to identical pixels so it shares all 6, the
# every-2nd-frame subsample shares exactly 3.
_VIDEO_FRAME_SELECTS = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {j} AS fi, ({_dhash_bits_expr()}) AS dh\n"
    f"  FROM (SELECT doc_id, sha256(text || ':f{j}') AS h1,\n"
    f"               sha256(text || ':f{j}:1') AS h2 FROM d)"
    for j in range(6))

EXTRA_ORACLES["video_frame_neardup"] = f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
), fh AS (
{_VIDEO_FRAME_SELECTS}
), vids AS (
  SELECT CAST(doc_id AS VARCHAR) || ':orig' AS vid_id, dh FROM fh
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR) || ':sub2', dh FROM fh
  WHERE doc_id % 3 = 0 AND fi % 2 = 0
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR) || ':re', dh FROM fh WHERE doc_id % 5 = 0
), s AS (
  SELECT DISTINCT vid_id, dh FROM vids
)
SELECT a.vid_id AS vid_a, b.vid_id AS vid_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM s a JOIN s b ON a.dh = b.dh AND a.vid_id < b.vid_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
"""


# Canonical keepers over the perceptual pair graph: the
# dedup_cluster_keepers recursive-CTE reachability fixpoint pointed at
# the dHash pairs above. MIN over VARCHAR ids is byte-wise on both
# engines (ASCII ids) ⇒ identical labels.
EXTRA_ORACLES["image_dedup_keepers"] = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, sha256(text) AS h1, sha256(text || ':1') AS h2
  FROM documents WHERE text IS NOT NULL
), h AS (
  SELECT doc_id, ({_DHASH_BITS}) AS dh FROM d
), imgs AS (
  SELECT CAST(doc_id AS VARCHAR) || ':orig' AS img_id, dh FROM h
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR) || ':up2', dh FROM h WHERE doc_id % 3 = 0
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR) || ':b16', dh FROM h WHERE doc_id % 5 = 0
), p AS (
  SELECT a.img_id AS doc_a, b.img_id AS doc_b
  FROM imgs a JOIN imgs b ON a.img_id < b.img_id
  WHERE bit_count(xor(a.dh, b.dh)) <= 2
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION
  SELECT doc_b, doc_a FROM p
), reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
), comp AS (
  SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id
)
SELECT cluster_id AS keeper_id, CAST(COUNT(*) AS BIGINT) AS n_members
FROM comp GROUP BY 1
"""


# --- round-12 window rotation (EXECUTED, mirrors queries.py): all
# twelve ROTATION_CANDIDATES_R11 promote into the driver window's
# oracle dict for their first external CORRECTNESS row; twelve
# long-green shapes demote to EXTRA (each keeps an in-window twin and
# stays parity-tested locally every round). ORACLES must equal the
# declared window's oracle-backed set (pinned by
# test_driver_window_is_at_most_50).
_R12_IN = [  # promoted into the driver window (all oracle-backed)
    "eval_leak_scrub", "crawl_delta_apply", "winnow_fingerprint_neardup",
    "dup_span_scrub", "source_chi2_drift", "doc_repetition_signals",
    "events_cohort_retention", "events_markov_transitions",
    "events_cusum_changepoint", "doc_quality_signals",
    "embedding_covariance_matrix", "embedding_correlation_matrix",
]
_R12_OUT = [  # demoted to EXTRA (all keep an in-window twin)
    "passage_dedup_scrub", "rolling_fingerprint_neardup",
    "dup_span_extents", "source_ks_drift", "events_user_growth",
    "events_pair_correlation", "corpus_mix", "doc_lm_quality",
    "doc_bm25_topk", "events_mad_outliers", "events_motif_search",
    "knn_filtered_bruteforce",
]
for _k in _R12_IN:
    ORACLES[_k] = EXTRA_ORACLES.pop(_k)
for _k in _R12_OUT:
    EXTRA_ORACLES[_k] = ORACLES.pop(_k)


# --- round-13 window rotation (EXECUTED, mirrors queries.py): all
# nine ROTATION_CANDIDATES_R12 promote into the driver window's
# oracle dict for their first external CORRECTNESS row; nine
# long-green shapes demote to EXTRA (each keeps an in-window twin and
# stays parity-tested locally every round). ORACLES must equal the
# declared window's oracle-backed set (pinned by
# test_driver_window_is_at_most_50).
_R13_IN = [  # promoted into the driver window (all oracle-backed)
    "image_dhash_neardup", "image_dedup_keepers", "events_cusum_bucketed",
    "events_rfm_segments", "video_frame_neardup", "neardup_triangle_stats",
    "interval_overlap_shipments", "source_quality_floor",
    "orders_dq_profile",
]
_R13_OUT = [  # demoted to EXTRA (all keep an in-window twin)
    "token_frequencies", "events_vwap", "corpus_datacard",
    "neardup_pagerank", "doc_sparse_cosine_neardup", "lm_quality_bands",
    "hybrid_rrf_retrieval", "q9_product_profit", "agg_cube_year_status",
]
for _k in _R13_IN:
    ORACLES[_k] = EXTRA_ORACLES.pop(_k)
for _k in _R13_OUT:
    EXTRA_ORACLES[_k] = ORACLES.pop(_k)


# --- round-13 additions (oracle-backed, queued in
# ROTATION_CANDIDATES_R13; plans/queries.py docstrings carry the
# operator rationale) -------------------------------------------------

# Benford first-digit conformance. First digit via floor() on BOTH
# engines: DuckDB's double→int CAST rounds half-to-even while Spark
# truncates, but double floor() is exact IEEE and the result is
# integral so the cast is exact. Benford probabilities are
# repr-embedded double literals (string parse is correctly rounded);
# the χ² tree is the identical fixed IEEE op sequence.
EXTRA_ORACLES["orders_benford_test"] = """
WITH f AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1
), tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM f),
g AS (SELECT digit, COUNT(*) AS n_obs FROM f GROUP BY digit),
p (digit, expected_p) AS (VALUES
  (1, CAST('0.3010299956639812' AS DOUBLE)),
  (2, CAST('0.17609125905568124' AS DOUBLE)),
  (3, CAST('0.12493873660829992' AS DOUBLE)),
  (4, CAST('0.09691001300805642' AS DOUBLE)),
  (5, CAST('0.07918124604762482' AS DOUBLE)),
  (6, CAST('0.06694678963061322' AS DOUBLE)),
  (7, CAST('0.05799194697768673' AS DOUBLE)),
  (8, CAST('0.05115252244738129' AS DOUBLE)),
  (9, CAST('0.04575749056067514' AS DOUBLE)))
SELECT CAST(g.digit AS BIGINT) AS digit,
       CAST(g.n_obs AS BIGINT) AS n_obs,
       p.expected_p,
       CAST(g.n_obs AS DOUBLE) / t AS observed_p,
       (CAST(g.n_obs AS DOUBLE) - p.expected_p * t)
       * (CAST(g.n_obs AS DOUBLE) - p.expected_p * t)
       / (p.expected_p * t) AS chi2_term
FROM g JOIN p USING (digit) CROSS JOIN tot
"""

# Session path mining: ms-floored timestamps on both engines (floor of
# the difference ≠ difference of floors, so BOTH floor per-row first),
# (ts_ms, event_id) total order everywhere, concat_ws skips NULLs on
# both engines, and the top-20 is ordered by the unique (count, path).
EXTRA_ORACLES["events_session_funnel_paths"] = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) // 1000 AS ts_ms
  FROM events
), marked AS (
  SELECT user_id, event_type, ts_ms, event_id,
         CASE WHEN lag(ts_ms) OVER w IS NULL THEN 1
              WHEN ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1
              ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
), sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                             ORDER BY ts_ms, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked
), rn AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, sess
                               ORDER BY ts_ms, event_id) AS rn
  FROM sess
), paths AS (
  SELECT user_id, sess,
         concat_ws('>',
                   MAX(CASE WHEN rn = 1 THEN event_type END),
                   MAX(CASE WHEN rn = 2 THEN event_type END),
                   MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
  FROM rn WHERE rn <= 3 GROUP BY user_id, sess
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""

# User-grain co-occurrence lift: exact counts over DISTINCT
# (user, type); lift as (n_both·n_users)/(n_a·n_b) — the identical
# two-products-one-division tree (no intermediate support rounding).
EXTRA_ORACLES["events_type_cooccurrence_lift"] = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), tot AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users FROM ut
), per_type AS (
  SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
), pr AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         COUNT(*) AS n_both
  FROM ut x JOIN ut y ON x.user_id = y.user_id
                     AND x.event_type < y.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b,
       CAST(n_both AS BIGINT) AS n_both,
       CAST(a.n AS BIGINT) AS n_a,
       CAST(b.n AS BIGINT) AS n_b,
       CAST(n_both AS DOUBLE) / n_users AS support,
       CAST(n_both AS DOUBLE) * n_users
       / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)) AS lift
FROM pr
JOIN per_type a ON a.event_type = type_a
JOIN per_type b ON b.event_type = type_b
CROSS JOIN tot
"""

# χ² independence: exact BIGINT cell/row/col/grand totals (window
# sums routed through BIGINT before the double hop), identical
# expected/χ² IEEE tree.
EXTRA_ORACLES["docs_lang_source_independence"] = """
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n_obs
  FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY lang, source
), t AS (
  SELECT lang, source, n_obs,
         CAST(SUM(n_obs) OVER (PARTITION BY lang) AS BIGINT) AS n_l,
         CAST(SUM(n_obs) OVER (PARTITION BY source) AS BIGINT) AS n_s,
         CAST(SUM(n_obs) OVER () AS BIGINT) AS n
  FROM cells
)
SELECT lang, source, CAST(n_obs AS BIGINT) AS n_obs,
       CAST(n_l AS DOUBLE) * CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE)
         AS expected,
       (CAST(n_obs AS DOUBLE)
        - CAST(n_l AS DOUBLE) * CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE))
       * (CAST(n_obs AS DOUBLE)
          - CAST(n_l AS DOUBLE) * CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE))
       / (CAST(n_l AS DOUBLE) * CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE))
         AS chi2_term
FROM t
"""

# One-way ANOVA: per-group exact decimal moments, string-routed
# means, each group's SSB/SSW double term quantized to DECIMAL(27,6)
# before the cross-group sum (order-independent reduction — a raw
# double sum over groups would be fold-order-dependent), identical
# F finisher tree with the degenerate-case CASE guard mirrored.
EXTRA_ORACLES["part_brand_price_anova"] = """
WITH g AS (
  SELECT p_brand,
         COUNT(*) AS n_g,
         SUM(CAST(p_retailprice AS DECIMAL(27,6))) AS s_g,
         SUM(CAST(p_retailprice * p_retailprice AS DECIMAL(27,6)))
           AS ss_g
  FROM part WHERE p_retailprice IS NOT NULL
  GROUP BY p_brand
), t AS (
  SELECT *, SUM(n_g) OVER () AS n, SUM(s_g) OVER () AS s FROM g
), terms AS (
  SELECT n,
         CAST(CAST(s_g AS VARCHAR) AS DOUBLE) / CAST(n_g AS DOUBLE)
           AS mean_g,
         CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
           AS mean,
         CAST(n_g AS DOUBLE) AS n_g_d,
         CAST(CAST(ss_g AS VARCHAR) AS DOUBLE) AS ss_g_d
  FROM t
), agg AS (
  SELECT n, COUNT(*) AS k,
         SUM(CAST(n_g_d * (mean_g - mean) * (mean_g - mean)
                  AS DECIMAL(27,6))) AS ssb,
         SUM(CAST(ss_g_d - n_g_d * mean_g * mean_g
                  AS DECIMAL(27,6))) AS ssw
  FROM terms GROUP BY n
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(n AS BIGINT) AS n_rows,
       CAST(CAST(ssb AS VARCHAR) AS DOUBLE) AS ss_between,
       CAST(CAST(ssw AS VARCHAR) AS DOUBLE) AS ss_within,
       CASE WHEN k > 1 AND n > k
                 AND CAST(CAST(ssw AS VARCHAR) AS DOUBLE) > 0 THEN
         (CAST(CAST(ssb AS VARCHAR) AS DOUBLE)
          / (CAST(k AS DOUBLE) - 1.0))
         / (CAST(CAST(ssw AS VARCHAR) AS DOUBLE)
            / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
       END AS f_stat
FROM agg
"""

# Rolling 7-day distinct active users: DISTINCT is not frameable in
# either engine's window frames, so both sides run the grid-explode
# form — distinct (user, day), explode the ≤7 contributed days,
# re-distinct, count. Integer day arithmetic (// on positives ≡ div).
EXTRA_ORACLES["events_rolling_active_users"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day_num FROM events
), ud AS (
  SELECT DISTINCT user_id, day_num FROM e
), contrib AS (
  SELECT DISTINCT user_id, day_num + d AS day_num
  FROM ud, unnest(range(0, 7)) AS t(d)
), rolling AS (
  SELECT day_num, COUNT(*) AS n_active_users
  FROM contrib GROUP BY day_num
), per_day AS (
  SELECT day_num, COUNT(*) AS n_events_day FROM e GROUP BY day_num
)
SELECT CAST(p.day_num AS BIGINT) AS day_num,
       CAST(r.n_active_users AS BIGINT) AS n_active_users,
       CAST(p.n_events_day AS BIGINT) AS n_events_day
FROM per_day p JOIN rolling r ON p.day_num = r.day_num
"""

# Per-group embedding outliers: the drift oracle's exact centroid CTE
# (decimal dim sums, string-routed division, ORDER BY i lists), then
# list_reduce squared-delta distance (≡ Spark's 0.0-seeded aggregate
# over zip_with — the cosine-fold device) and a total-order rank.
EXTRA_ORACLES["embedding_outlier_docs"] = """
WITH dims AS (
  SELECT label AS grp, i, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
sums AS (
  SELECT grp, i, SUM(CAST(v AS DECIMAL(27,6))) AS s, COUNT(*) AS n
  FROM dims GROUP BY grp, i),
cents AS (
  SELECT grp,
         list(CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
              ORDER BY i) AS centroid
  FROM sums GROUP BY grp),
v AS (
  SELECT label AS grp, vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
  FROM embeddings),
d AS (
  SELECT v.grp, v.vec_id,
         list_reduce(list_transform(list_zip(v.x, c.centroid),
                                    s -> (s[1] - s[2]) * (s[1] - s[2])),
                     (a, b) -> a + b) AS dist_sq
  FROM v JOIN cents c ON v.grp = c.grp),
r AS (
  SELECT grp, vec_id, dist_sq,
         row_number() OVER (PARTITION BY grp
                            ORDER BY dist_sq DESC, vec_id) AS rk
  FROM d)
SELECT grp AS label, vec_id, dist_sq,
       CAST(rk AS BIGINT) AS outlier_rank
FROM r WHERE rk <= 3
"""

# Per-source Gini: exact BIGINT rank-mass and totals (HUGEINT sums
# routed through BIGINT before the double hop — the int128→double
# cast is not correctly rounded), one fixed IEEE finisher tree.
EXTRA_ORACLES["source_gini_concentration"] = """
WITH d AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rk
  FROM documents WHERE n_chars IS NOT NULL
), a AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(rk * n_chars) AS BIGINT) AS rank_mass
  FROM d GROUP BY source
)
SELECT source, n_docs, total_chars,
       CASE WHEN total_chars > 0 THEN
         2.0 * CAST(rank_mass AS DOUBLE)
         / (CAST(n_docs AS DOUBLE) * CAST(total_chars AS DOUBLE))
         - (CAST(n_docs AS DOUBLE) + 1.0) / CAST(n_docs AS DOUBLE)
       END AS gini
FROM a
"""


# --- round-14 window rotation (EXECUTED, mirrors queries.py): all
# eight ROTATION_CANDIDATES_R13 promote into the driver window's
# oracle dict for their first external CORRECTNESS row; eight
# long-green shapes demote to EXTRA (each keeps an in-window twin and
# stays parity-tested locally every round). ORACLES must equal the
# declared window's oracle-backed set (pinned by
# test_driver_window_is_at_most_50).
_R14_IN = [  # promoted into the driver window (all oracle-backed)
    "orders_benford_test", "events_session_funnel_paths",
    "source_gini_concentration", "events_type_cooccurrence_lift",
    "docs_lang_source_independence", "embedding_outlier_docs",
    "events_rolling_active_users", "part_brand_price_anova",
]
_R14_OUT = [  # demoted to EXTRA (all keep an in-window twin)
    "doc_pmi_collocations", "doc_ngram_novelty", "source_mix_weights",
    "corpus_vocab_growth", "corpus_snapshot_diff",
    "source_embedding_drift", "snapshot_change_magnitude",
    "eval_leak_spans",
]
for _k in _R14_IN:
    ORACLES[_k] = EXTRA_ORACLES.pop(_k)
for _k in _R14_OUT:
    EXTRA_ORACLES[_k] = ORACLES.pop(_k)


# Gini–Simpson diversity per source: exact BIGINT cell counts (the χ²
# independence oracle's cell CTE), n²/Σnᵢ² through DECIMAL(38,0)
# products (forces the int128 path) and the VARCHAR hop, two IEEE
# divisions — 1.0 is exactly representable so DuckDB's DECIMAL
# literal promotes to double with zero error.
EXTRA_ORACLES["docs_source_lang_diversity"] = """
WITH c AS (
  SELECT source, lang, COUNT(*) AS n_obs
  FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY source, lang
), g AS (
  SELECT source,
         CAST(SUM(n_obs) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         SUM(CAST(n_obs AS DECIMAL(38,0))
             * CAST(n_obs AS DECIMAL(38,0))) AS ssq
  FROM c GROUP BY source
)
SELECT source, n_rows, n_langs,
       1.0 - CAST(CAST(ssq AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(n_rows AS DECIMAL(38,0))
                          * CAST(n_rows AS DECIMAL(38,0)) AS VARCHAR)
                    AS DOUBLE) AS simpson_lambda,
       CAST(CAST(CAST(n_rows AS DECIMAL(38,0))
                 * CAST(n_rows AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
       / CAST(CAST(ssq AS VARCHAR) AS DOUBLE) AS effective_langs
FROM g
"""


# FK orphan audit: per-edge exact counts via NOT-EXISTS anti
# semantics; every integer count in the final projection CAST to
# BIGINT (HUGEINT otherwise); the rate division mirrored behind the
# same zero-guard CASE.
EXTRA_ORACLES["fk_orphan_audit"] = """
WITH e AS (
  SELECT 'lineitem->orders' AS fk_edge,
         (SELECT COUNT(*) FROM lineitem) AS n_child,
         (SELECT COUNT(l_orderkey) FROM lineitem) AS n_nonnull,
         (SELECT COUNT(*) FROM lineitem c
          WHERE c.l_orderkey IS NOT NULL AND NOT EXISTS
            (SELECT 1 FROM orders p
             WHERE p.o_orderkey = c.l_orderkey)) AS n_orphans
  UNION ALL
  SELECT 'lineitem->part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(l_partkey) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem c
          WHERE c.l_partkey IS NOT NULL AND NOT EXISTS
            (SELECT 1 FROM part p WHERE p.p_partkey = c.l_partkey))
  UNION ALL
  SELECT 'lineitem->supplier',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(l_suppkey) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem c
          WHERE c.l_suppkey IS NOT NULL AND NOT EXISTS
            (SELECT 1 FROM supplier p WHERE p.s_suppkey = c.l_suppkey))
  UNION ALL
  SELECT 'orders->customer',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(o_custkey) FROM orders),
         (SELECT COUNT(*) FROM orders c
          WHERE c.o_custkey IS NOT NULL AND NOT EXISTS
            (SELECT 1 FROM customer p WHERE p.c_custkey = c.o_custkey))
  UNION ALL
  SELECT 'customer->nation',
         (SELECT COUNT(*) FROM customer),
         (SELECT COUNT(c_nationkey) FROM customer),
         (SELECT COUNT(*) FROM customer c
          WHERE c.c_nationkey IS NOT NULL AND NOT EXISTS
            (SELECT 1 FROM nation p
             WHERE p.n_nationkey = c.c_nationkey))
)
SELECT fk_edge,
       CAST(n_child AS BIGINT) AS n_child,
       CAST(n_nonnull AS BIGINT) AS n_nonnull,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       CASE WHEN n_nonnull > 0 THEN
         CAST(n_orphans AS DOUBLE) / CAST(n_nonnull AS DOUBLE)
       END AS orphan_rate
FROM e
"""


# Pareto revenue concentration: exact DECIMAL(27,6) spend sums, a
# (spend DESC, custkey) total-order rank, k = (n+9)//10 (truncating
# // ≡ Spark div on positives), string-routed decimal division.
EXTRA_ORACLES["customer_revenue_pareto"] = """
WITH spend AS (
  SELECT o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS spend
  FROM orders GROUP BY o_custkey
), s AS (
  SELECT c.c_mktsegment, c.c_custkey, spend.spend,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY spend.spend DESC, c.c_custkey)
           AS rk,
         COUNT(*) OVER (PARTITION BY c.c_mktsegment) AS n
  FROM spend JOIN customer c ON spend.o_custkey = c.c_custkey
), a AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(MAX((n + 9) // 10) AS BIGINT) AS k_top10,
         SUM(spend) AS total_spend,
         SUM(CASE WHEN rk <= (n + 9) // 10 THEN spend END) AS top_spend
  FROM s GROUP BY c_mktsegment
)
SELECT c_mktsegment, n_customers, k_top10,
       CASE WHEN total_spend > 0 THEN
         CAST(CAST(top_spend AS VARCHAR) AS DOUBLE)
         / CAST(CAST(total_spend AS VARCHAR) AS DOUBLE)
       END AS top10_share
FROM a
"""


# Conversion latency quantiles: exact BIGINT ms latencies, exact
# lower-quantile elements at rank ceil(qn) over a (latency, user)
# total order, exact-decimal mean through the VARCHAR hop.
EXTRA_ORACLES["events_conversion_latency"] = """
WITH fv AS (
  SELECT user_id, MIN(epoch_ms(ts)) AS v_ts
  FROM events WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT e.user_id,
         MIN(epoch_ms(e.ts)) - MIN(fv.v_ts) AS lat
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= fv.v_ts
  GROUP BY e.user_id
), r AS (
  SELECT user_id, lat,
         row_number() OVER (ORDER BY lat, user_id) AS rk,
         COUNT(*) OVER () AS n
  FROM conv
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN lat END) AS BIGINT)
         AS median_latency_ms,
       CAST(MAX(CASE WHEN rk = (9 * n + 9) // 10 THEN lat END)
            AS BIGINT) AS p90_latency_ms,
       CAST(CAST(SUM(CAST(lat AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)
         / CAST(MAX(n) AS DOUBLE) AS mean_latency_ms
FROM r
HAVING COUNT(*) > 0
"""


# Mann-Whitney U on the value-grain histogram: exact DECIMAL(38,0)
# integer arithmetic for 2U / m·n / the tie term, string-routed
# double hops, one fixed IEEE z tree (sqrt is correctly rounded on
# both engines), mirrored positivity guard.
EXTRA_ORACLES["events_mannwhitney_value_test"] = """
WITH h AS (
  SELECT value,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_b
  FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
  GROUP BY value
), g AS (
  SELECT n_a, n_b,
         COALESCE(SUM(n_b) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_b
  FROM h
), a AS (
  SELECT SUM(n_a) AS m, SUM(n_b) AS n,
         SUM(CAST(n_a AS DECIMAL(38,0))
             * (2 * CAST(cum_b AS DECIMAL(38,0))
                + CAST(n_b AS DECIMAL(38,0)))) AS u2,
         SUM(CAST(n_a + n_b AS DECIMAL(38,0))
             * CAST(n_a + n_b AS DECIMAL(38,0))
             * CAST(n_a + n_b AS DECIMAL(38,0))
             - CAST(n_a + n_b AS DECIMAL(38,0))) AS ties
  FROM g
), b AS (
  SELECT m, n, u2, ties,
         CAST(m AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) AS mn,
         CAST(m + n AS DECIMAL(38,0))
           * CAST(m + n - 1 AS DECIMAL(38,0)) AS nn1
  FROM a
)
SELECT CAST(m AS BIGINT) AS n_click,
       CAST(n AS BIGINT) AS n_view,
       CAST(CAST(u2 AS VARCHAR) AS DOUBLE) AS u2_statistic,
       CASE WHEN m > 0 AND n > 0
             AND CAST(CAST(mn AS VARCHAR) AS DOUBLE) / 12.0
                 * (CAST(m + n + 1 AS DOUBLE)
                    - CAST(CAST(ties AS VARCHAR) AS DOUBLE)
                      / CAST(CAST(nn1 AS VARCHAR) AS DOUBLE)) > 0
       THEN
         (CAST(CAST(u2 AS VARCHAR) AS DOUBLE)
          - CAST(CAST(mn AS VARCHAR) AS DOUBLE))
         / (2.0 * sqrt(CAST(CAST(mn AS VARCHAR) AS DOUBLE) / 12.0
                       * (CAST(m + n + 1 AS DOUBLE)
                          - CAST(CAST(ties AS VARCHAR) AS DOUBLE)
                            / CAST(CAST(nn1 AS VARCHAR) AS DOUBLE))))
       END AS z_score
FROM b
"""


# Growth accounting: distinct (user, day), per-user lag window,
# day-grain conditional counts, day-shifted self-join for the churn
# identity; pure integer arithmetic, every count CAST to BIGINT.
EXTRA_ORACLES["events_user_growth_accounting"] = """
WITH ud AS (
  SELECT DISTINCT user_id AS u, epoch_ms(ts) // 86400000 AS d
  FROM events
), lagged AS (
  SELECT u, d, lag(d) OVER (PARTITION BY u ORDER BY d) AS prev_d
  FROM ud
), per_day AS (
  SELECT d,
         COUNT(*) AS n_active,
         SUM(CASE WHEN prev_d IS NULL THEN 1 ELSE 0 END) AS n_new,
         SUM(CASE WHEN prev_d = d - 1 THEN 1 ELSE 0 END)
           AS n_retained,
         SUM(CASE WHEN prev_d < d - 1 THEN 1 ELSE 0 END)
           AS n_resurrected
  FROM lagged GROUP BY d
)
SELECT CAST(p.d AS BIGINT) AS day_num,
       CAST(p.n_active AS BIGINT) AS n_active,
       CAST(p.n_new AS BIGINT) AS n_new,
       CAST(p.n_retained AS BIGINT) AS n_retained,
       CAST(p.n_resurrected AS BIGINT) AS n_resurrected,
       CAST(COALESCE(q.n_active, 0) - p.n_retained AS BIGINT)
         AS n_churned_from_prev
FROM per_day p
LEFT JOIN per_day q ON q.d = p.d - 1
"""


# Skewness/kurtosis per order status: identical left-associated
# power chains, per-term decimal quantization, string-routed central
# moment identities, mirrored degenerate guard. Double literals
# (2.0/3.0/4.0/6.0) are exactly representable so DuckDB's DECIMAL
# literal promotion is lossless.
EXTRA_ORACLES["orders_price_skew_kurtosis"] = """
WITH b AS (
  SELECT o_orderstatus AS g,
         CAST(round(o_totalprice * 100) AS DECIMAL(9,0)) AS xc
  FROM orders WHERE o_totalprice IS NOT NULL
), b2 AS (
  -- xc2 at DECIMAL(19,0): forces DuckDB's int128 multiply path
  -- (the documented int64 fast-path overflow at width <= 18)
  SELECT g, xc, CAST(xc * xc AS DECIMAL(19,0)) AS xc2 FROM b
), m AS (
  SELECT g,
         COUNT(*) AS n_g,
         SUM(xc) AS s1,
         SUM(xc2) AS s2,
         SUM(xc2 * xc) AS s3,
         SUM(xc2 * xc2) AS s4
  FROM b2 GROUP BY g
), f AS (
  SELECT g, n_g,
         CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n_g AS DOUBLE) AS m1,
         CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n_g AS DOUBLE) AS r2,
         CAST(CAST(s3 AS VARCHAR) AS DOUBLE) / CAST(n_g AS DOUBLE) AS r3,
         CAST(CAST(s4 AS VARCHAR) AS DOUBLE) / CAST(n_g AS DOUBLE) AS r4
  FROM m
), c AS (
  SELECT g, n_g, m1,
         r2 - m1 * m1 AS m2,
         r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
         r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
            - 3.0 * m1 * m1 * m1 * m1 AS m4
  FROM f
)
SELECT g AS o_orderstatus,
       CAST(n_g AS BIGINT) AS n_rows,
       m1 / 100.0 AS mean,
       m2 / 10000.0 AS m2_variance,
       CASE WHEN n_g > 1 AND m2 > 0
         THEN m3 / (m2 * sqrt(m2)) END AS skewness,
       CASE WHEN n_g > 1 AND m2 > 0
         THEN m4 / (m2 * m2) - 3.0 END AS kurtosis_excess
FROM c
"""


# Weighted systematic sample: identical md5 total order, BIGINT
# cumulative sums, truncating integer division on positives (// ≡
# Spark div), grid-crossing multiplicity.
EXTRA_ORACLES["docs_weighted_sample"] = """
WITH b AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
), g AS (
  SELECT doc_id, w,
         SUM(w) OVER (ORDER BY h, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum,
         SUM(w) OVER () AS total
  FROM b
)
SELECT doc_id, w, CAST(cum AS BIGINT) AS cum_w,
       CAST((cum * 100) // total - ((cum - w) * 100) // total
            AS BIGINT) AS n_picks
FROM g
WHERE (cum * 100) // total - ((cum - w) * 100) // total >= 1
"""


# Fulfillment lag per priority: epoch-day integers, exact rank-⌈qn⌉
# quantile elements over a (lag, orderkey) total order, exact-decimal
# mean via the VARCHAR hop, BIGINT-cast final integers.
EXTRA_ORACLES["orders_fulfillment_lag"] = """
WITH li AS (
  SELECT l_orderkey,
         MAX(date_diff('day', DATE '1970-01-01',
                       CAST(l_shipdate AS DATE))) AS last_ship
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         li.last_ship - date_diff('day', DATE '1970-01-01',
                                  CAST(o.o_orderdate AS DATE)) AS lag
  FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
), r AS (
  SELECT o_orderpriority, o_orderkey, lag,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY lag, o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM j
)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN lag END) AS BIGINT)
         AS median_lag_days,
       CAST(MAX(CASE WHEN rk = (9 * n + 9) // 10 THEN lag END)
            AS BIGINT) AS p90_lag_days,
       CAST(CAST(SUM(CAST(lag AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)
         / CAST(MAX(n) AS BIGINT) AS mean_lag_days
FROM r GROUP BY o_orderpriority
"""


# Wilson lower-bound return-rate ranking: exact BIGINT counts, one
# fixed IEEE tree (1.96 embeds exactly; sqrt correctly rounded),
# (bound DESC, brand) total order, top 10.
EXTRA_ORACLES["part_brand_return_rates"] = """
WITH a AS (
  SELECT p.p_brand,
         COUNT(*) AS n,
         SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
), f AS (
  SELECT p_brand,
         CAST(n AS BIGINT) AS n_items,
         CAST(r AS BIGINT) AS n_returned,
         CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         CAST(n AS DOUBLE) AS nd
  FROM a
)
SELECT p_brand, n_items, n_returned,
       p AS return_rate,
       -- z routed through a VARCHAR-parsed double so both engines
       -- compute the identical double product tree (a bare 1.96 is
       -- DECIMAL in DuckDB and z*z would fold decimal-exactly)
       CASE WHEN n_items > 0 THEN
         (p + (CAST('1.96' AS DOUBLE) * CAST('1.96' AS DOUBLE))
              / (2.0 * nd)
          - CAST('1.96' AS DOUBLE)
            * sqrt((p * (1.0 - p)
                    + (CAST('1.96' AS DOUBLE)
                       * CAST('1.96' AS DOUBLE)) / (4.0 * nd)) / nd))
         / (1.0 + (CAST('1.96' AS DOUBLE)
                   * CAST('1.96' AS DOUBLE)) / nd)
       END AS wilson_lower
FROM f
ORDER BY wilson_lower DESC, p_brand
LIMIT 10
"""


# --- round-15 window rotation (EXECUTED, mirrors queries.py): all
# ten ROTATION_CANDIDATES_R14 promote into the driver window's
# oracle dict for their first external CORRECTNESS row; ten
# long-green (≥6 external rounds each) shapes demote to EXTRA (each
# keeps an in-window twin and stays parity-tested locally every
# round). ORACLES must equal the declared window's oracle-backed set
# (pinned by test_driver_window_is_at_most_50).
_R15_IN = [  # promoted into the driver window (all oracle-backed)
    "fk_orphan_audit", "orders_fulfillment_lag",
    "part_brand_return_rates", "docs_weighted_sample",
    "orders_price_skew_kurtosis", "events_user_growth_accounting",
    "customer_revenue_pareto", "events_conversion_latency",
    "events_mannwhitney_value_test", "docs_source_lang_diversity",
]
_R15_OUT = [  # demoted to EXTRA (all keep an in-window twin)
    "stratified_resample_stats", "multimodal_binary_meta",
    "fuzzy_name_block_join", "range_join_click_context",
    "sql_api_pricing_summary", "set_ops_all_variants",
    "unpivot_event_matrix", "string_functions", "order_limit_topk",
    "q11_important_stock",
]
for _k in _R15_IN:
    ORACLES[_k] = EXTRA_ORACLES.pop(_k)
for _k in _R15_OUT:
    EXTRA_ORACLES[_k] = ORACLES.pop(_k)
