package graft.oracles

import graft.oracles.Gen._

/** DuckDB oracle SQL for the the TPC-H join-shape queries —
  * one entry per SparkEntry.queries key in this family. Moved out
  * of SparkEntry mechanically (round-10 verdict ask #7); the text
  * of every entry is unchanged.
  */
private[graft] object JoinOracles {
  val sql: Map[String, String] = Map(
    "j2_left_enrich" ->
      """SELECT c.c_custkey, c.c_name,
        | COALESCE(r.n_orders_2001, 0) AS n_orders_2001,
        | COALESCE(r.spend_2001, 0.0) AS spend_2001,
        | COALESCE(r.last_status, 'Not_Found') AS last_status
        |FROM customer c
        |LEFT JOIN (SELECT o_custkey,
        |        CAST(COUNT(*) AS BIGINT) AS n_orders_2001,
        |        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |          AS spend_2001,
        |        MAX(o_orderstatus) AS last_status
        |      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        |      GROUP BY o_custkey) r
        |  ON c.c_custkey = r.o_custkey
        |ORDER BY c.c_custkey""".stripMargin,
    "j3_join_revenue" ->
      """SELECT c_mktsegment, CAST(year(o_orderdate) AS INT) AS order_year,
        | CAST(CAST(SUM(CAST(order_revenue AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |        CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |          AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS order_revenue
        |      FROM lineitem GROUP BY l_orderkey) lo
        |  ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "j_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "j4_promo_revenue" ->
      """SELECT p_brand,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        | CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS promo_revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items,
        | CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) /
        |   CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |     AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j5_local_supplier" ->
      """SELECT n_name,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN orders ON c_custkey = o_custkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND s_nationkey = c_nationkey
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "j03_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |JOIN lineitem ON o_orderkey = l_orderkey
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "j04_priority_check" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate >= TIMESTAMP '1996-04-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j06_forecast_revenue" ->
      """SELECT
        | CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS VARCHAR)
        |   AS DOUBLE) AS revenue_delta,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "j7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS INT) AS l_year,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM supplier
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  AND n1.n_name IN ('NATION_1', 'NATION_2')
        |JOIN lineitem ON s_suppkey = l_suppkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  AND n2.n_name IN ('NATION_1', 'NATION_2')
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "j8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS nation_volume,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_volume,
        | CAST(CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) /
        |   CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |     AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE EXISTS (SELECT 1 FROM nation cn JOIN region
        |    ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  WHERE c_nationkey = cn.n_nationkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "j13_order_histogram" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey,
        |        CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey
        |        AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "j19_disjunctive_revenue" ->
      """SELECT p_brand,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j09_product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year DESC""".stripMargin,
    "j12_shipmode_priority" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j02_min_cost_supplier" ->
      // textbook CORRELATED form — the min re-runs per outer row in
      // the SQL; Spark's decorrelated window plan must match it
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, p_type,
        |    CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,6)))
        |      AS DOUBLE) AS supply_cost
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |    AND p_type = 'ECONOMY' AND p_size < 10
        |  GROUP BY 1, 2, 3),
        |eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |    AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
        |  p_type, supply_cost
        |FROM ps JOIN eu ON l_suppkey = s_suppkey
        |WHERE supply_cost = (
        |  SELECT MIN(ps2.supply_cost)
        |  FROM ps ps2 JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey
        |  WHERE ps2.l_partkey = ps.l_partkey)
        |ORDER BY p_partkey, s_name""".stripMargin,
    "j11_important_parts" ->
      // decimal threshold (part*10000 > total) on both sides; the
      // HAVING subquery re-aggregates the fact — Spark's plan reads
      // the materialized per-part table instead (same values)
      """SELECT l_partkey AS p_partkey,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR)
        |    AS DOUBLE) AS part_value
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |  AND n_name = 'NATION_7'
        |GROUP BY 1
        |HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 10000 > (
        |  SELECT SUM(CAST(l2.l_extendedprice AS DECIMAL(18,6)))
        |  FROM lineitem l2
        |  JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        |  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    AND n2.n_name = 'NATION_7')
        |ORDER BY part_value DESC, p_partkey""".stripMargin,
    "j16_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        | COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13'
        |  AND p_size IN (1, 7, 14, 23, 30, 36, 42, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 1500)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "j20_dominant_supplier" ->
      // correlated scalar inside HAVING (this part's 1998 total);
      // the part prune inside the IN chain is implied by the
      // correlation equality, so the inner query needs no p_name test
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE 'cold%')
        |    AND l_shipdate >= TIMESTAMP '1998-01-01'
        |    AND l_shipdate < TIMESTAMP '1999-01-01'
        |  GROUP BY l_partkey, l_suppkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) * 2 > (
        |    SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
        |    FROM lineitem l2
        |    WHERE l2.l_partkey = lineitem.l_partkey
        |      AND l2.l_shipdate >= TIMESTAMP '1998-01-01'
        |      AND l2.l_shipdate < TIMESTAMP '1999-01-01'))
        |ORDER BY s_suppkey""".stripMargin,
    "j15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "j17_small_qty_revenue" ->
      // the threshold compare is the EXACT rearranged integer form
      // (qty*5*n < sum_qty in decimal) on both sides — see
      // Subqueries.q17SmallQtyRevenue
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part
        |    ON l_partkey = p_partkey AND p_brand = 'Brand#23'),
        |pp AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
        |    COUNT(*) AS n_lines
        |  FROM li GROUP BY 1)
        |SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR)
        |    AS DOUBLE) / 7.0 AS avg_yearly,
        |  CAST(COUNT(*) AS BIGINT) AS n_small_lines
        |FROM li JOIN pp USING (l_partkey)
        |WHERE CAST(l_quantity AS DECIMAL(18,6)) * 5 * n_lines
        |  < sum_qty""".stripMargin,
    "j18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |      AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR)
        |    AS DOUBLE) > 120)
        |SELECT o_orderkey, o_orderdate, o_totalprice, sum_qty,
        |  c_custkey, c_name
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "j21_sole_failing_supplier" ->
      """WITH pos AS (
        |  SELECT l_orderkey, l_suppkey,
        |    MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS failed
        |  FROM lineitem GROUP BY 1, 2),
        |po AS (
        |  SELECT l_orderkey FROM pos GROUP BY 1
        |  HAVING COUNT(*) > 1 AND SUM(failed) = 1)
        |SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM pos
        |JOIN po USING (l_orderkey)
        |JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE failed = 1
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,
    "j22_idle_customers" ->
      """WITH st AS (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS sum_bal,
        |    COUNT(*) AS n_pos
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    AS total_bal
        |FROM customer, st
        |WHERE CAST(c_acctbal AS DECIMAL(18,6)) * n_pos > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j_fuzzy_match" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |b AS (SELECT name, list_extract(string_split(name, ' '),
        |    len(string_split(name, ' '))) AS block FROM names)
        |SELECT a.name AS name_a, bb.name AS name_b,
        |  CAST(levenshtein(a.name, bb.name) AS INTEGER) AS dist
        |FROM b a JOIN b bb ON a.block = bb.block AND a.name < bb.name
        |WHERE levenshtein(a.name, bb.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    "j_bloom_semi" ->
      // the bloom prefilter is exact end-to-end (false positives die
      // in the verify semi join, false negatives can't exist), so the
      // oracle is simply the plain EXISTS semi join
      """SELECT o_orderkey, o_custkey FROM orders d
        |WHERE o_orderdate >= DATE '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM orders h
        |    WHERE h.o_orderdate < DATE '1997-01-01'
        |      AND h.o_custkey = d.o_custkey)
        |ORDER BY 1""".stripMargin,
  )
}
