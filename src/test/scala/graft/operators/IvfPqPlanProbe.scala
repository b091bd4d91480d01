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

  /** On-disk footprint of a parquet path that may be a SINGLE FILE
    * (driver testdata) or a DIRECTORY of part files (Spark-written
    * fixtures) — File.length() on a directory returns the ~4 KB dirent
    * size, which would make the corpusBytes/4 threshold below fail
    * every exchange spuriously (ADVICE r13).
    */
  private def parquetBytes(path: java.io.File): Long =
    if (path.isDirectory)
      path.listFiles().map(parquetBytes).sum
    else if (path.getName.startsWith(".") || path.getName.startsWith("_"))
      0L // checksums/_SUCCESS markers are not data
    else path.length()

  test("ivfPqTopK shuffles stay candidate-bounded — no corpus-sized " +
    "exchange (the sf3.0 deep-point regression)") {
    // one decade above SparkSpec.sfDir on purpose: at sf0.001 the
    // bounded exchanges and a corpus-sized one are both ~KBs and the
    // /4 separation threshold has no signal
    val dir = "/root/testdata/sf0.01"
    val corpusBytes = parquetBytes(
      new java.io.File(s"$dir/embeddings.parquet"))
    assert(corpusBytes > 64 * 1024,
      s"corpus sizing degenerate ($corpusBytes B) — the threshold " +
        "below would fail every exchange for the wrong reason")
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
