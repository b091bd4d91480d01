package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PageRank contract: mass conservation, positivity, and EXACT
  * equality with an independent driver-side recompute that mirrors
  * the scaled-integer contribution arithmetic — the distributed loop
  * must be bit-identical to the sequential definition, which is what
  * makes the DuckDB oracle able to replay it.
  */
class GraphSpec extends SparkSpec {

  test("pagerank: mass ≈ 1, all positive, exact vs sequential recompute") {
    val out = Graph.pagerank(spark, sfDir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    assert(out.values.forall(_ > 0.0))
    val mass = out.values.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass")

    // independent sequential recompute with the same integer scaling
    val pair = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy((-(col("l_suppkey") + 1)).as("s"), col("o_custkey").as("c"))
      .agg(count(lit(1)).as("w")).collect()
      .map(r => (r.getAs[Long]("s"), r.getAs[Long]("c"), r.getAs[Long]("w")))
    val edges = pair.flatMap { case (s, c, w) => Seq((s, c, w), (c, s, w)) }
    val outdeg = edges.groupBy(_._1).map { case (k, es) =>
      k -> es.map(_._3).sum
    }
    val n = outdeg.size
    var rank = outdeg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val sums = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (src, dst, w) =>
        val contrib = math.round(rank(src) * w / outdeg(src) * 1e12)
        sums(dst) = sums.getOrElse(dst, 0L) + contrib
      }
      rank = sums.map { case (k, s) =>
        k -> (0.15 / n + 0.85 * (s / 1e12))
      }.toMap
    }
    assert(out.keySet == rank.keySet)
    out.foreach { case (k, v) =>
      assert(v == rank(k), s"node $k: distributed $v vs sequential ${rank(k)}")
    }
  }
}
