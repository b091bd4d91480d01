package graft.operators

import graft.SparkSpec

/** Exploratory decomposition of dedup_lsh_index's sf1.0 shuffle. */
class LshIndexProbe extends SparkSpec {
  test("lsh index exchange decomposition at sf1.0",
      org.scalatest.Tag("probe")) {
    assume(new java.io.File("data/sf1.0/documents.parquet").exists())
    val df = Dedup.incrementalLshBucketed(spark, "data/sf1.0")
    df.queryExecution.toRdd.count()
    def walk(p: org.apache.spark.sql.execution.SparkPlan,
        depth: Int): Unit = {
      p match {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          val w = e.metrics.get("shuffleBytesWritten").map(_.value)
          println(s"[lsh] ${e.outputPartitioning} bytes=$w " +
            s"childFirst=${e.child.getClass.getSimpleName}")
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth)
        case _ => ()
      }
      p.children.foreach(walk(_, depth + 1))
      p.subqueries.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
  }
}
