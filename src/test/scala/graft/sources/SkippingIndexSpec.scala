package graft.sources

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The manifest-based file-skipping index: planning must actually drop
  * files, and the pruned read must stay exact (the residual predicate
  * covers whatever the surviving files over-contain).
  */
class SkippingIndexSpec extends SparkSpec {

  test("prunedFiles keeps only range-overlapping files — a narrow " +
    "slice reads a strict subset of the clustered files") {
    val (keep, total) = SkippingIndex.prunedFiles(spark, sfDir, 3, 7)
    assert(keep.nonEmpty)
    assert(keep.size < total, s"kept ${keep.size} of $total — no pruning")
  }

  test("pruned-scan aggregate is identical to the raw full-scan slice") {
    val viaIndex = SkippingIndex.userSliceAgg(spark, sfDir).collect()
    val raw = Tables.events(spark, sfDir)
      .filter(col("user_id").between(3, 7))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Scalars.moneySum(col("value")).as("total_value"))
      .orderBy("user_id").collect()
    assert(viaIndex.toSeq == raw.toSeq)
  }

  test("a slice outside every file's range prunes ALL files (the " +
    "planning path alone answers empty)") {
    val (keep, total) = SkippingIndex.prunedFiles(spark, sfDir,
      1000000, 2000000)
    assert(keep.isEmpty && total > 0)
  }

  test("daySliceAgg: partition filter prunes directories — the scan " +
    "reads strictly fewer files than the layout holds") {
    val df = SkippingIndex.daySliceAgg(spark, sfDir)
    df.collect() // populate the scan's SQL metrics
    // walk through AQE wrappers (QueryStageExec are LEAF nodes — a
    // plain collect stops at them), summing numFiles off every scan
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def filesRead(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => filesRead(a.executedPlan)
      case q: QueryStageExec => filesRead(q.plan)
      case f: FileSourceScanExec => f.metrics("numFiles").value
      case other => other.children.map(filesRead).sum
    }
    val read = filesRead(df.queryExecution.executedPlan)
    val layout = new java.io.File(
      s"/tmp/graft_skip/${new java.io.File(sfDir).getName}/events_by_day")
    val total = Option(layout.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("day="))
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .count(_.getName.endsWith(".parquet"))
    // 7 of 30 day directories overlap the slice
    assert(read > 0 && total >= 30, s"read=$read total=$total")
    assert(read < total, s"no partition pruning: read=$read total=$total")
    assert(read <= 7, s"pruning too weak: read=$read of $total")
  }
}
