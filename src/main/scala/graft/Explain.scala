package graft

/** Plan-audit tool: prints the formatted physical plan for the given
  * queries (default: every LAZY query) without executing them. Used
  * to check that plans have the shape we want at scale — broadcast
  * joins on dim sides, PushedFilters/ReadSchema pruning at parquet
  * scans, wide WholeStageCodegen spans — not just that they return
  * correct rows.
  *
  * The no-args sweep skips `SparkEntry.eagerWriters` (their builders
  * RUN jobs — sink writes, stream drains, training loops — so
  * "print the plan" would execute minutes of side-effecting work;
  * the same contract PlanQualitySpec's sweep follows). Naming one
  * explicitly still works — that's an informed request. Unknown
  * names abort loudly instead of silently matching nothing.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only = args.toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val skipped = SparkEntry.queries.keySet
      .filter(n => only.isEmpty && SparkEntry.eagerWriters(n))
    SparkEntry.queries
      .filter { case (n, _) =>
        if (only.isEmpty) !SparkEntry.eagerWriters(n) else only(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try {
          val df = fn(spark, sfDir)
          df.explain("formatted")
          // the mechanical review (plans.PlanAudit) under the plan it
          // reviewed — warns first; exchange-count summarizes
          graft.plans.PlanAudit.audit(df).foreach(f =>
            println(s"[lint:${f.severity}] ${f.rule} @ ${f.node}: " +
              f.detail))
        } catch { case e: Throwable =>
          println(s"[explain] $name failed: ${e.getMessage}")
        }
      }
    if (skipped.nonEmpty)
      println(s"\n[explain] skipped eager-writer builders (name " +
        s"explicitly to include): ${skipped.toSeq.sorted.mkString(", ")}")
    spark.stop()
  }
}
