package graft.oracles

import graft.oracles.Gen._

/** DuckDB oracle SQL for the graph-algorithm queries (bounded-round CTE replays) —
  * one entry per SparkEntry.queries key in this family. Moved out
  * of SparkEntry mechanically (round-10 verdict ask #7); the text
  * of every entry is unchanged.
  */
private[graft] object GraphOracles {
  val sql: Map[String, String] = Map(
    "graph_pagerank" -> pagerankOracle(3),
    "graph_ppr" -> pprOracle(3),
    "graph_label_prop" -> lpaOracle(3),
    "graph_modularity" -> modularityOracle(3),
    "graph_modularity_sample" -> modularityOracle(3, sample = true),
    // sampled-subgraph companions (round-12): identical unrollings
    // over the ¼-node induced subgraph. The node sample is pushed
    // INTO li (before pairing) — equivalent, since a surviving
    // pair's co-occurrence count cannot change when other parts
    // drop, and it keeps the oracle from materializing the full
    // corpus pair aggregate (which is the prohibitive part at sf1.0)
    "graph_kcore_sample" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_partkey % 4 = 0),
        |ed AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM ed
        |  UNION ALL SELECT b, a FROM ed),
        |d0 AS MATERIALIZED (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
        |dc AS MATERIALIZED (SELECT deg, CAST(count(*) AS BIGINT) AS cnt
        |  FROM d0 GROUP BY 1),
        |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM d0),
        |cum AS MATERIALIZED (SELECT l.deg, CAST(SUM(r.cnt) AS BIGINT) AS cum
        |  FROM dc l JOIN dc r ON r.deg <= l.deg GROUP BY 1),
        |kk AS MATERIALIZED (SELECT MIN(deg) + 1 AS k FROM cum, nn
        |  WHERE cum >= (n + 1) // 2),
        |d1 AS MATERIALIZED (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
        |k1 AS MATERIALIZED (SELECT src FROM d1, kk WHERE deg >= k),
        |e1 AS MATERIALIZED (SELECT e.src, e.dst FROM e0 e
        |  JOIN k1 a ON e.src = a.src JOIN k1 b ON e.dst = b.src),
        |d2 AS MATERIALIZED (SELECT src, count(*) AS deg FROM e1 GROUP BY 1),
        |k2 AS MATERIALIZED (SELECT src FROM d2, kk WHERE deg >= k),
        |e2 AS MATERIALIZED (SELECT e.src, e.dst FROM e1 e
        |  JOIN k2 a ON e.src = a.src JOIN k2 b ON e.dst = b.src),
        |d3 AS MATERIALIZED (SELECT src, count(*) AS deg FROM e2 GROUP BY 1),
        |k3 AS MATERIALIZED (SELECT src FROM d3, kk WHERE deg >= k),
        |e3 AS MATERIALIZED (SELECT e.src, e.dst FROM e2 e
        |  JOIN k3 a ON e.src = a.src JOIN k3 b ON e.dst = b.src)
        |SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |FROM e3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_bfs_hops_sample" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_partkey % 4 = 0),
        |ed AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM ed
        |  UNION ALL SELECT b, a FROM ed),
        |f0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym WHERE src % 50 = 0),
        |f1 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM sym e
        |  JOIN f0 ON e.src = f0.node
        |  WHERE e.dst NOT IN (SELECT node FROM f0)),
        |v1 AS MATERIALIZED (SELECT node FROM f0 UNION ALL SELECT node FROM f1),
        |f2 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM sym e
        |  JOIN f1 ON e.src = f1.node
        |  WHERE e.dst NOT IN (SELECT node FROM v1)),
        |v2 AS MATERIALIZED (SELECT node FROM v1 UNION ALL SELECT node FROM f2),
        |f3 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM sym e
        |  JOIN f2 ON e.src = f2.node
        |  WHERE e.dst NOT IN (SELECT node FROM v2))
        |SELECT node, CAST(0 AS INT) AS dist FROM f0
        |UNION ALL SELECT node, 1 FROM f1
        |UNION ALL SELECT node, 2 FROM f2
        |UNION ALL SELECT node, 3 FROM f3
        |ORDER BY node""".stripMargin,
    "graph_local_cc" ->
      // independent path: direct a<b<c triangle enumeration
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ed AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |tr AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM ed e1 JOIN ed e2 ON e1.b = e2.a
        |  JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
        |inc AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |  SELECT x AS node FROM tr
        |  UNION ALL SELECT y FROM tr
        |  UNION ALL SELECT z FROM tr) GROUP BY 1),
        |deg AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        |  SELECT a AS node FROM ed
        |  UNION ALL SELECT b FROM ed) GROUP BY 1)
        |SELECT deg.node AS node, d AS degree,
        |  CAST(coalesce(n_tri, 0) AS BIGINT) AS n_triangles,
        |  CAST(CASE WHEN d >= 2 THEN coalesce(n_tri, 0) * 2000000
        |    // (d * (d - 1)) ELSE 0 END AS BIGINT) AS lcc_ppm
        |FROM deg LEFT JOIN inc ON deg.node = inc.node
        |ORDER BY 1""".stripMargin,
    "graph_kcore" ->
      // the same three peel rounds unrolled, k = lower-median degree
      // + 1 re-derived in SQL; counts only, no floats
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ed AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM ed
        |  UNION ALL SELECT b, a FROM ed),
        |d0 AS MATERIALIZED (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
        |dc AS MATERIALIZED (SELECT deg, CAST(count(*) AS BIGINT) AS cnt
        |  FROM d0 GROUP BY 1),
        |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM d0),
        |cum AS MATERIALIZED (SELECT l.deg, CAST(SUM(r.cnt) AS BIGINT) AS cum
        |  FROM dc l JOIN dc r ON r.deg <= l.deg GROUP BY 1),
        |kk AS MATERIALIZED (SELECT MIN(deg) + 1 AS k FROM cum, nn
        |  WHERE cum >= (n + 1) // 2),
        |d1 AS MATERIALIZED (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
        |k1 AS MATERIALIZED (SELECT src FROM d1, kk WHERE deg >= k),
        |e1 AS MATERIALIZED (SELECT e.src, e.dst FROM e0 e
        |  JOIN k1 a ON e.src = a.src JOIN k1 b ON e.dst = b.src),
        |d2 AS MATERIALIZED (SELECT src, count(*) AS deg FROM e1 GROUP BY 1),
        |k2 AS MATERIALIZED (SELECT src FROM d2, kk WHERE deg >= k),
        |e2 AS MATERIALIZED (SELECT e.src, e.dst FROM e1 e
        |  JOIN k2 a ON e.src = a.src JOIN k2 b ON e.dst = b.src),
        |d3 AS MATERIALIZED (SELECT src, count(*) AS deg FROM e2 GROUP BY 1),
        |k3 AS MATERIALIZED (SELECT src FROM d3, kk WHERE deg >= k),
        |e3 AS MATERIALIZED (SELECT e.src, e.dst FROM e2 e
        |  JOIN k3 a ON e.src = a.src JOIN k3 b ON e.dst = b.src)
        |SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |FROM e3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_bfs_hops" ->
      // the same level-synchronous frontier rounds unrolled: v_k =
      // visited after k rounds, f_k = the round-k frontier (reached,
      // not yet visited); distances are the round constants
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ed AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM ed
        |  UNION ALL SELECT b, a FROM ed),
        |f0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym WHERE src % 50 = 0),
        |f1 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM sym e
        |  JOIN f0 ON e.src = f0.node
        |  WHERE e.dst NOT IN (SELECT node FROM f0)),
        |v1 AS MATERIALIZED (SELECT node FROM f0 UNION ALL SELECT node FROM f1),
        |f2 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM sym e
        |  JOIN f1 ON e.src = f1.node
        |  WHERE e.dst NOT IN (SELECT node FROM v1)),
        |v2 AS MATERIALIZED (SELECT node FROM v1 UNION ALL SELECT node FROM f2),
        |f3 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM sym e
        |  JOIN f2 ON e.src = f2.node
        |  WHERE e.dst NOT IN (SELECT node FROM v2))
        |SELECT node, CAST(0 AS INT) AS dist FROM f0
        |UNION ALL SELECT node, 1 FROM f1
        |UNION ALL SELECT node, 2 FROM f2
        |UNION ALL SELECT node, 3 FROM f3
        |ORDER BY node""".stripMargin,
    "graph_sssp" ->
      // the same Bellman-Ford relaxation rounds unrolled: d_k holds
      // the exact shortest distance among paths of ≤ k edges
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ed AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b, count(*) AS sup FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS MATERIALIZED (SELECT a AS src, b AS dst, 1000000 // sup AS w FROM ed
        |  UNION ALL SELECT b, a, 1000000 // sup FROM ed),
        |d0 AS MATERIALIZED (SELECT DISTINCT src AS node,
        |    CAST(0 AS BIGINT) AS dist FROM sym WHERE src % 50 = 0),
        |d1 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d0
        |  UNION ALL SELECT s.dst, d.dist + s.w FROM d0 d
        |    JOIN sym s ON d.node = s.src) GROUP BY 1),
        |d2 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d1
        |  UNION ALL SELECT s.dst, d.dist + s.w FROM d1 d
        |    JOIN sym s ON d.node = s.src) GROUP BY 1),
        |d3 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d2
        |  UNION ALL SELECT s.dst, d.dist + s.w FROM d2 d
        |    JOIN sym s ON d.node = s.src) GROUP BY 1)
        |SELECT node, CAST(dist AS BIGINT) AS dist FROM d3
        |ORDER BY node""".stripMargin,
    "graph_clustering_coeff" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pp AS (
        |  SELECT a, b FROM (
        |    SELECT x.l_partkey AS a, y.l_partkey AS b,
        |      COUNT(*) AS sup
        |    FROM li x JOIN li y
        |      ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |    GROUP BY 1, 2) WHERE sup >= 2),
        |tri AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |  FROM pp e1
        |  JOIN pp e2 ON e2.a = e1.b
        |  JOIN pp e3 ON e3.a = e1.a AND e3.b = e2.b),
        |wg AS MATERIALIZED (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
        |  FROM (SELECT v, COUNT(*) AS d FROM
        |          (SELECT a AS v FROM pp UNION ALL SELECT b FROM pp)
        |        GROUP BY v))
        |SELECT n_triangles, n_wedges,
        |  n_triangles * 3.0 / n_wedges AS global_coeff
        |FROM tri, wg""".stripMargin,
    "graph_linkpred" ->
      // full RA-index replay: same support-pruned edge CTE, integer
      // // contributions, NOT EXISTS anti join, same total order
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pp AS (
        |  SELECT a, b FROM (
        |    SELECT x.l_partkey AS a, y.l_partkey AS b,
        |      COUNT(*) AS sup
        |    FROM li x JOIN li y
        |      ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |    GROUP BY 1, 2) WHERE sup >= 2),
        |sym AS MATERIALIZED (SELECT a AS w, b AS v FROM pp
        |        UNION ALL SELECT b, a FROM pp),
        |deg AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS d
        |        FROM sym GROUP BY 1),
        |adj AS MATERIALIZED (SELECT s.w, s.v, 1000000 // d.d AS contrib
        |        FROM sym s JOIN deg d ON s.w = d.w),
        |wed AS MATERIALIZED (SELECT x.v AS a, y.v AS b, x.contrib
        |        FROM adj x JOIN adj y ON x.w = y.w AND x.v < y.v),
        |sc AS MATERIALIZED (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_common,
        |         CAST(SUM(contrib) AS BIGINT) AS ra_score
        |       FROM wed GROUP BY 1, 2)
        |SELECT a, b, n_common, ra_score FROM sc
        |WHERE NOT EXISTS
        |  (SELECT 1 FROM pp WHERE pp.a = sc.a AND pp.b = sc.b)
        |ORDER BY ra_score DESC, a, b LIMIT 100""".stripMargin,
    "graph_item_cf" ->
      // same support-pruned pair counts; the cos² ppm law in HUGEINT
      // (// is floor division — matches the decimal floor), same
      // (cos2_ppm desc, sup desc, neighbor) rank order
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |ic AS MATERIALIZED (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM li GROUP BY 1),
        |pr AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b,
        |    CAST(COUNT(*) AS BIGINT) AS sup
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sym AS MATERIALIZED (SELECT a, b, sup FROM pr
        |  UNION ALL SELECT b, a, sup FROM pr),
        |sc AS MATERIALIZED (SELECT sym.a AS item, sym.b AS neighbor, sup,
        |    ia.c AS c_item, ib.c AS c_neighbor,
        |    CAST(CAST(sup AS HUGEINT) * sup * 1000000
        |      // (ia.c * ib.c) AS BIGINT) AS cos2_ppm
        |  FROM sym JOIN ic ia ON sym.a = ia.pk
        |           JOIN ic ib ON sym.b = ib.pk),
        |rk AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY item
        |    ORDER BY cos2_ppm DESC, sup DESC, neighbor) AS rank
        |  FROM sc)
        |SELECT item, neighbor, sup, c_item, c_neighbor, cos2_ppm,
        |  CAST(rank AS INT) AS rank
        |FROM rk WHERE rank <= 5 ORDER BY item, rank""".stripMargin,
    "graph_triangles" ->
      // naive a<b<c replay; the engine's degree-ordered orientation
      // must count the identical triangle set
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pp AS (
        |  SELECT a, b FROM (
        |    SELECT x.l_partkey AS a, y.l_partkey AS b,
        |      COUNT(*) AS sup
        |    FROM li x JOIN li y
        |      ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |    GROUP BY 1, 2) WHERE sup >= 2),
        |nodes AS MATERIALIZED (SELECT a AS v FROM pp UNION SELECT b FROM pp)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM pp e1
        |        JOIN pp e2 ON e2.a = e1.b
        |        JOIN pp e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT)
        |    AS n_triangles,
        |  CAST((SELECT COUNT(*) FROM pp) AS BIGINT) AS n_edges,
        |  CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes""".stripMargin,
  )
}
