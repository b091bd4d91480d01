package graft.operators

import graft.SparkSpec

/** The skew-join demo only demonstrates anything if AQE actually
  * SPLIT the hot partition — without this pin the query silently
  * degrades into an ordinary sort-merge join and the "runtime skew
  * handling" claim is prose. Executes the un-checkpointed frame under
  * the same tuned confs the operator uses and reads the executed
  * (adaptive) plan.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot partition: skew=true in the executed SMJ") {
    Advanced.withSkewConfs(spark) {
      val df = Advanced.skewJoinFrame(spark, sfDir)
      df.queryExecution.toRdd.count() // materialize the adaptive plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(3000))
      assert(!p.contains("BroadcastHashJoin"), p.take(2000))
    }
  }

  test("the split changes the schedule, not the answer: equals the " +
    "same join with skew handling off") {
    val tuned = Advanced.skewJoin(spark, sfDir).collect().toSeq
    val plain = Advanced.skewJoinFrame(spark, sfDir).collect().toSeq
    assert(tuned == plain)
  }
}
