package graft

/** Plan-audit tool: prints the formatted physical plan for the given
  * queries (default: every query) without executing them. Used to
  * check that plans have the shape we want at scale — broadcast joins
  * on dim sides, PushedFilters/ReadSchema pruning at parquet scans,
  * wide WholeStageCodegen spans — not just that they return correct
  * rows.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only = args.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable =>
          println(s"[explain] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
