package graft.operators

import graft.SparkSpec

/** Pins the IVF-PQ scale shape found by the round-13 sf3.0 deep
  * point: the rerank's shortlist⋈emb join and the ADC's
  * candPairs⋈codesLong join must BROADCAST their bounded sides
  * (shortlist ≤ |queries|·shortlistSize; candPairs ≤ |queries|·
  * √cells·cell-occupancy), never shuffle or broadcast the O(n)
  * corpus/code tables. Before the explicit hints, the planner's
  * estimate crossed the auto-broadcast threshold between sf1.0 and
  * sf3.0 and the executed plan shuffled the ENTIRE embedding table
  * on cand_id (measured 9.4 MB at sf3.0, shuffle_slope_d 3.89) —
  * at 10⁹ vectors that is the whole corpus through one exchange.
  * The pin: every shuffle exchange in the executed sf0.01 plan stays
  * candidate-bounded (≪ corpus bytes), so a regression to a
  * corpus-sized exchange fails loudly at test scale.
  */
class IvfPqPlanProbe extends SparkSpec {

  private def exchangeBytes(dir: String): Seq[Long] = {
    val df = Similarity.ivfPqTopK(spark, dir)
    df.queryExecution.toRdd.count()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          out += e.metrics.get("shuffleBytesWritten")
            .orElse(e.metrics.get("dataSize")).map(_.value).getOrElse(0L)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    out.toSeq
  }

  test("ivfPqTopK shuffles stay candidate-bounded — no corpus-sized " +
    "exchange (the sf3.0 deep-point regression)") {
    val dir = "/root/testdata/sf0.01"
    val corpusBytes = new java.io.File(s"$dir/embeddings.parquet").length()
    val ex = exchangeBytes(dir)
    assert(ex.nonEmpty) // the bounded groupBy/window exchanges exist
    // every exchange must be far below the corpus parquet size: the
    // old plan's emb shuffle serialized the WHOLE table (≥ its
    // on-disk footprint); candidate-bounded exchanges sit orders
    // of magnitude under it
    ex.foreach(b => assert(b < corpusBytes / 4,
      s"exchange $b bytes vs corpus $corpusBytes — a corpus-sized " +
        "shuffle is back in the IVF-PQ plan"))
  }
}
