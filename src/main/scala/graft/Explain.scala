package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan for the given
  * queries (or a default set of representative ones). Used to check
  * that plans have the shape we want at scale — broadcast joins on dim
  * sides, PushedFilters/ReadSchema pruning at parquet scans, wide
  * WholeStageCodegen spans — not just that they return correct rows.
  *
  * Usage: runMain graft.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local(4, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("p_snapshot", "j3_join_revenue", "a1_pricing_summary",
        "p_insight_gold", "dedup_cosine")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
