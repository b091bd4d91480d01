package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relationship tables (beyond the
  * connected-components fixpoint in Dedup): weighted PageRank on the
  * supplier↔customer bipartite graph induced by lineitem+orders.
  * The reference has no graph surface; a complete engine needs the
  * iterative-propagation shape — it is the same loop PageRank-style
  * quality weighting runs over web-crawl link graphs when scoring
  * pretraining documents.
  */
object Graph {

  /** Weighted PageRank, 3 synchronous iterations, damping 0.85.
    *
    * Graph: node ids keep the two sides disjoint by sign — customers
    * as c_custkey (≥ 0), suppliers as -(s_suppkey+1) (< 0). Each
    * (supplier, customer) pair that co-occurs on a lineitem
    * contributes an edge in BOTH directions weighted by the
    * co-occurrence count, so every node has out-degree > 0 (no
    * dangling-mass correction needed).
    *
    * Determinism is the engineered part: the per-target sum of
    * neighbor contributions is a SUM over doubles, which is
    * order-dependent — so each contribution is scaled to an exact
    * integer (round(r·w/outdeg · 1e12)) and the shuffle sums BIGINTs
    * (order-independent, overflow-safe: contributions ≤ 1e12, edge
    * count bounds the sum far under 2^63). One double multiply/add
    * per node closes the iteration: r' = 0.15/N + 0.85·(S/1e12),
    * identical operand structure in the DuckDB oracle → bit-exact
    * ranks after all 3 rounds.
    *
    * Scale shape per iteration: one shuffle keyed by dst (the
    * contribution sum); ranks and degrees join edges by src — at
    * 100 TB that is a co-partitioned join on the same key the next
    * round shuffles anyway. localCheckpoint truncates the per-round
    * lineage so plan depth stays flat (the CC/BPE loop discipline).
    */
  def pagerank(s: SparkSession, dir: String, iterations: Int = 3)
      : DataFrame =
    // pooled like the CC labels: the rank loop's job cascade is the
    // cost (the rank table itself is |nodes| rows) — one build per
    // (session, dir, iterations), later invocations read the table
    graft.CachePool.cached(s, s"graph.pagerank:$dir:$iterations") {
      pagerankBuild(s, dir, iterations)
    }

  private def pagerankBuild(s: SparkSession, dir: String,
      iterations: Int): DataFrame = {
    val pair = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(
        (-(col("l_suppkey") + 1)).as("supp_node"),
        col("o_custkey").as("cust_node"))
      .agg(count(lit(1)).as("w"))
    val edges = pair
      .select(col("supp_node").as("src"), col("cust_node").as("dst"),
        col("w"))
      .unionByName(pair.select(col("cust_node").as("src"),
        col("supp_node").as("dst"), col("w")))
      .localCheckpoint()
    val outdeg = edges.groupBy("src").agg(sum(col("w")).as("outdeg"))
    // loop-invariant: each edge annotated with its source's degree
    // ONCE — re-joining degrees inside the loop would repeat a full
    // edge-table join every round for a value that never changes
    val edgesDeg = edges.join(outdeg, Seq("src")).localCheckpoint()
    val n = outdeg.count() // node set = all edge sources (both sides)
    var ranks = outdeg.select(col("src").as("node"),
      (lit(1.0) / n).as("rank")).localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = edgesDeg
        .join(ranks, edgesDeg("src") === ranks("node"))
        .select(col("dst"),
          round(col("rank") * col("w") / col("outdeg") * lit(1e12))
            .cast("long").as("c"))
      ranks = contrib.groupBy(col("dst").as("node"))
        .agg((lit(0.15) / n +
          lit(0.85) * (sum(col("c")) / lit(1e12))).as("rank"))
        .localCheckpoint()
    }
    ranks.orderBy("node")
  }
}
