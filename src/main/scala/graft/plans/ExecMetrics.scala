package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Executed-plan SQLMetrics rollup — the 100 TB predictors the bench
  * artifact carries per query (shuffle_mb / spill_mb / peak_mem_mb):
  * a query whose shuffle grows with input is bound by it at scale no
  * matter its local seconds; a query that spills at sf0.1 is
  * memory-bound at 100×; peak memory is the per-task high-water mark
  * executor sizing starts from. Shared by Bench and the PlanAudit
  * spec that pins the plumbing (metrics only populate AFTER the
  * plan's own toRdd executes — a separate count() runs a different
  * QueryExecution and reads zeros, the round-6 bug).
  */
object ExecMetrics {

  /** (shuffleBytesWritten summed, spillSize summed, peakMemory maxed)
    * across the executed plan, walking THROUGH AdaptiveSparkPlanExec
    * and QueryStageExec wrappers — they are leaf nodes to a plain
    * children traversal, which otherwise reads zero under AQE.
    */
  def walk(df: DataFrame): (Long, Long, Long) = {
    def go(p: SparkPlan): (Long, Long, Long) = {
      val shuffle = p.metrics.collect {
        case ("shuffleBytesWritten", m) => m.value
      }.sum
      val spill = p.metrics.collect {
        case ("spillSize", m) if m.value > 0 => m.value
      }.sum
      val peak = p.metrics.collect {
        case ("peakMemory", m) => m.value
      }.foldLeft(0L)(math.max)
      val below = p match {
        case a: AdaptiveSparkPlanExec => Seq(go(a.executedPlan))
        case q: QueryStageExec => Seq(go(q.plan))
        case other => other.children.map(go)
      }
      below.foldLeft((shuffle, spill, peak)) {
        case ((s1, s2, s3), (b1, b2, b3)) =>
          (s1 + b1, s2 + b2, math.max(s3, b3))
      }
    }
    go(df.queryExecution.executedPlan)
  }
}
