package graft.queries

/** DuckDB oracle SQL twins for every query in the inventory (driver runs
  * these against the same parquet tables and hash-compares; column names and
  * value semantics must match the Spark side exactly — see CoreQueries
  * numeric convention).
  */
object Oracles {

  val core: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order,
        | ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity >= 49.0
        |  AND l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-02-01'""".stripMargin,

    "q03_join_broadcast" ->
      """SELECT r_name,
        | COUNT(*) AS num_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q04_join_large" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        | COUNT(*) AS num_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE EXTRACT(year FROM o_orderdate) = 1996
        |GROUP BY o_orderpriority""".stripMargin,

    "q05_window_topk" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        | FROM orders) t
        |WHERE rn <= 3""".stripMargin,

    "q06_union" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 400000.0
        |UNION
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,

    "q07_count_gate" ->
      "SELECT COUNT(*) AS row_cnt FROM lineitem WHERE l_returnflag = 'R'",

    "q08_anti_join" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""".stripMargin,

    "q09_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin,

    // plain GROUP BY: the salted two-stage plan must produce identical rows
    "q30_salted_agg" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,

    // the custom TopKPerKeyExec must equal the window row_number form
    "q35_topk_custom" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "q36_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(RANK() OVER (PARTITION BY o_custkey
        |                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS price_rank,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey < 500
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin,

    "q37_set_ops" ->
      """WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |high AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
        |SELECT o_custkey, 'both' AS set_kind FROM (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM high)
        |UNION ALL
        |SELECT o_custkey, 'urgent_only' AS set_kind FROM (SELECT o_custkey FROM urgent EXCEPT SELECT o_custkey FROM high)""".stripMargin,

    "q31_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q46_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    // SUM over an empty filtered set is NULL in both engines — matching
    // Spark's pivot semantics for absent (priority, status) combos
    "q47_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q49_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q69_ship_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
        |  o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-03-15'
        |  AND l_shipdate > TIMESTAMP '1996-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) DESC,
        |  o_orderdate ASC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q70_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,

    // dialect-safe UNION ALL form of UNPIVOT (identical row multiset)
    "q48_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |  CAST(l_quantity AS DOUBLE) AS val FROM lineitem WHERE l_quantity >= 49.0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |  CAST(l_extendedprice AS DOUBLE) FROM lineitem WHERE l_quantity >= 49.0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount',
        |  CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_quantity >= 49.0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax',
        |  CAST(l_tax AS DOUBLE) FROM lineitem WHERE l_quantity >= 49.0""".stripMargin,

    // bin membership compares against UNROUNDED interpolated edges, as the
    // Spark side does; rounding only in the output projection
    "q72_equidepth_hist" ->
      """WITH e AS (SELECT lang,
        |  quantile_cont(n_chars, 0.25) AS q1,
        |  quantile_cont(n_chars, 0.5) AS q2,
        |  quantile_cont(n_chars, 0.75) AS q3
        |  FROM documents GROUP BY lang),
        |b AS (SELECT d.lang, d.n_chars, e.q1, e.q2, e.q3,
        |  1 + CAST(d.n_chars > e.q1 AS INT)
        |    + CAST(d.n_chars > e.q2 AS INT)
        |    + CAST(d.n_chars > e.q3 AS INT) AS bin
        |  FROM documents d JOIN e USING (lang))
        |SELECT lang, CAST(bin AS INTEGER) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MIN(n_chars) AS BIGINT) AS lo,
        |  CAST(MAX(n_chars) AS BIGINT) AS hi,
        |  ROUND(q1, 4) AS p25, ROUND(q2, 4) AS p50, ROUND(q3, 4) AS p75
        |FROM b GROUP BY lang, bin, q1, q2, q3""".stripMargin,

    "q81_big_orders" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |  CAST(b.sq AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300) b
        |  ON o_orderkey = b.l_orderkey
        |JOIN customer ON c_custkey = o_custkey""".stripMargin,

    "q80_window_distribution" ->
      """SELECT o_orderstatus, o_orderkey,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume,
        |  NTH_VALUE(o_orderkey, 2) OVER w AS second_key,
        |  FIRST_VALUE(o_orderkey) OVER wf AS first_key,
        |  LAST_VALUE(o_orderkey) OVER wf AS last_key
        |FROM orders WHERE o_custkey < 200
        |WINDOW
        |  w AS (PARTITION BY o_orderstatus
        |        ORDER BY o_totalprice ASC, o_orderkey ASC),
        |  wf AS (PARTITION BY o_orderstatus
        |         ORDER BY o_totalprice ASC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "q76_full_outer" ->
      """WITH o AS (SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1),
        |l AS (SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS d,
        |  CAST(COUNT(*) AS BIGINT) AS n_shipped FROM lineitem GROUP BY 1)
        |SELECT COALESCE(o.d, l.d) AS d, o.n_orders, l.n_shipped
        |FROM o FULL OUTER JOIN l ON o.d = l.d""".stripMargin,

    // violation = predicate not TRUE (NULL violates); FK/unique exempt
    // NULL keys, mirroring Quality.expectations' documented semantics
    "q75_expectations" ->
      """SELECT 'not_null_o_custkey' AS rule,
        |  CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
        |  CAST(COUNT(*) AS BIGINT) AS n_checked
        |FROM orders
        |UNION ALL
        |SELECT 'domain_o_orderstatus',
        |  CAST(SUM(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 0 ELSE 1 END) AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'range_o_totalprice',
        |  CAST(SUM(CASE WHEN o_totalprice > 0 AND o_totalprice <= 350000 THEN 0 ELSE 1 END) AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'unique_o_orderkey',
        |  CAST(COALESCE(SUM(n - 1), 0) AS BIGINT),
        |  CAST(COALESCE(SUM(n), 0) AS BIGINT)
        |FROM (SELECT COUNT(*) AS n FROM orders
        |      WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)
        |UNION ALL
        |SELECT 'fk_orders_customer',
        |  CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM customer
        |    WHERE c_custkey = o_custkey) THEN 0 ELSE 1 END) AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT)
        |FROM orders WHERE o_custkey IS NOT NULL""".stripMargin,

    "q73_exists_lateship" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority""".stripMargin,

    // deliberately the OTHER algorithm (quadratic NOT EXISTS dominator)
    // than the Spark side's sort-based running-max frontier
    "q92_skyline" ->
      """SELECT p_partkey, p_name, p_retailprice, p_size
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin,

    // deliberately the literal triple-correlated EXISTS / NOT EXISTS
    // formulation — the Spark side runs the single-pass aggregate
    // decorrelation; two independent formulations must agree
    "q116_sole_returned_supplier" ->
      """WITH f AS (SELECT l.l_orderkey, l.l_suppkey, l.l_returnflag
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE o.o_orderstatus = 'F')
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait FROM (
        |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        |  FROM f l1
        |  WHERE l1.l_returnflag = 'R'
        |    AND EXISTS (SELECT 1 FROM f l2
        |      WHERE l2.l_orderkey = l1.l_orderkey
        |        AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM f l3
        |      WHERE l3.l_orderkey = l1.l_orderkey
        |        AND l3.l_suppkey <> l1.l_suppkey
        |        AND l3.l_returnflag = 'R')
        |) w JOIN supplier ON s_suppkey = w.l_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 10""".stripMargin,

    "q120_inactive_rich" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        |t AS (SELECT CAST(SUM(cents) AS BIGINT) AS s,
        |  CAST(COUNT(*) AS BIGINT) AS n_pos FROM c WHERE cents > 0)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(cents) AS DOUBLE) / 100 AS totacctbal
        |FROM c CROSS JOIN t
        |JOIN nation ON n_nationkey = c_nationkey
        |WHERE cents * n_pos > s
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY n_name""".stripMargin,

    "q123_promo_share" ->
      """WITH l AS (SELECT EXTRACT(MONTH FROM l_shipdate)::INT AS ship_month,
        |  p_type,
        |  CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2))) AS rev
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'),
        |a AS (SELECT ship_month,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000 AS HUGEINT) AS promo_q,
        |  CAST(SUM(rev) * 10000 AS HUGEINT) AS tot_q
        |  FROM l GROUP BY 1)
        |SELECT ship_month,
        |  CAST(promo_q AS DOUBLE) / 1e4 AS promo_revenue,
        |  CAST(tot_q AS DOUBLE) / 1e4 AS total_revenue,
        |  CAST((2 * promo_q * 10000 + tot_q) // (2 * tot_q) AS DOUBLE) / 1e2 AS promo_pct
        |FROM a""".stripMargin,

    "q124_nation_trade" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  EXTRACT(YEAR FROM o_orderdate)::INT AS order_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation cn ON cn.n_nationkey = c_nationkey
        |WHERE sn.n_name IN ('NATION_1', 'NATION_2')
        |  AND cn.n_name IN ('NATION_1', 'NATION_2')
        |  AND sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3""".stripMargin,

    "q125_hierarchy_share" ->
      """WITH pn AS (SELECT r_name, n_name,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  GROUP BY 1, 2),
        |pr AS (SELECT r_name, CAST(SUM(c) AS BIGINT) AS rc FROM pn GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS tc FROM pn)
        |SELECT r_name, n_name, n_orders,
        |  CAST(c AS DOUBLE) / 100 AS revenue,
        |  CAST((2 * c * 10000 + rc) // (2 * rc) AS DOUBLE) / 1e2 AS pct_of_region,
        |  CAST((2 * c * 10000 + tc) // (2 * tc) AS DOUBLE) / 1e2 AS pct_of_total
        |FROM pn JOIN pr USING (r_name) CROSS JOIN t""".stripMargin,

    "q127_topk_ties" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(o_orderdate AS VARCHAR) AS o_orderdate, CAST(rnk AS INT) AS rnk
        |FROM (SELECT o_orderpriority, o_orderkey, o_orderdate,
        |  RANK() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_orderdate DESC) AS rnk
        |  FROM orders) r
        |WHERE rnk <= 3""".stripMargin,

    "q128_union_by_name" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_orderstatus, NULL::BIGINT AS price_cents
        |  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) < 1997
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) >= 1997)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(price_cents) AS BIGINT) AS n_with_price,
        |  CAST(SUM(price_cents) AS DOUBLE) / 100 AS sum_price
        |FROM u GROUP BY 1""".stripMargin,

    "q117_part_supplier_diversity" ->
      """SELECT p_brand, p_type,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) a
        |JOIN part ON p_partkey = l_partkey
        |WHERE l_suppkey NOT IN
        |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2""".stripMargin,

    "q148_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q149_market_share" ->
      """SELECT EXTRACT(YEAR FROM o_orderdate)::INT AS o_year,
        |  ROUND(
        |    CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
        |    6) AS mkt_share,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS total_revenue
        |FROM customer
        |JOIN nation cn ON cn.n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = cn.n_regionkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,

    "q150_cust_order_dist" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey) c
        |GROUP BY c_count""".stripMargin,

    "q151_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM revenue JOIN supplier ON s_suppkey = l_suppkey
        |WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)""".stripMargin,

    "q152_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#23' AND p_type = 'ECONOMY'),
        |stats AS (
        |  SELECT l_partkey AS sk,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    CAST(COUNT(*) AS BIGINT) AS n_li
        |  FROM li GROUP BY 1),
        |small AS (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_price,
        |    CAST(COUNT(*) AS BIGINT) AS n_small
        |  FROM li JOIN stats ON l_partkey = sk
        |  WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_li < sum_qty)
        |SELECT ROUND(total_price / 7.0, 4) AS avg_yearly, total_price, n_small
        |FROM small""".stripMargin,

    "q153_disjunctive_predicates" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q154_product_profit" ->
      """SELECT n_name AS nation,
        |  EXTRACT(YEAR FROM o_orderdate)::INT AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(0.5 AS DECIMAL(2,1))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,

    "q155_min_cost_supplier" ->
      """WITH lip AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, n_name, l_extendedprice
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE r_name = 'EUROPE' AND p_size < 10),
        |mins AS (
        |  SELECT p_partkey AS mk, MIN(l_extendedprice) AS min_price
        |  FROM lip GROUP BY 1)
        |SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, n_name, min_price
        |FROM lip JOIN mins ON p_partkey = mk AND l_extendedprice = min_price""".stripMargin,

    "q166_stock_value" ->
      """WITH v AS (SELECT l_partkey,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * l_quantity * 100) AS BIGINT))
        |    AS BIGINT) AS value_cents
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  WHERE n_name = 'NATION_7'
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM v)
        |SELECT l_partkey, value_cents,
        |  CAST(value_cents AS DOUBLE) / 100 AS value
        |FROM v CROSS JOIN t
        |WHERE value_cents * 1000 > total_cents""".stripMargin,

    "q167_shipmode_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,

    "q156_excess_shippers" ->
      """SELECT s_suppkey, s_name, n_name,
        |  CAST(qty_dec AS DOUBLE) AS total_qty
        |FROM (SELECT l_suppkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_type = 'PROMO'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_suppkey) s
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE qty_dec > CAST(450 AS DECIMAL(18,2))""".stripMargin
  )
}
