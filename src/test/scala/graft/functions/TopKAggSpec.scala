package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Analytics

/** The mergeable per-group top-k pinned three ways: row-identical to
  * the window formulation it replaces, partition-invariant (a result
  * that depends on task layout is not an aggregate), and planned as a
  * two-phase aggregate with NO Window node — the property that makes
  * it scale.
  */
class TopKAggSpec extends SparkSpec {

  test("equals the window formulation, tie-break included") {
    val got = Analytics.topkPerGroup(spark, sfDir).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = graft.Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"),
        col("o_totalprice").cast("double"), col("o_orderkey"))
      .orderBy("o_orderpriority", "rk").collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("partition-invariant: any task layout, same top-k") {
    import spark.implicits._
    val topk = udaf(new TopKAgg(5))
    def run(parts: Int) =
      (1 to 10000).map(i => ((i % 7).toString, (i % 101).toDouble, i.toLong))
        .toDF("g", "v", "id").repartition(parts)
        .groupBy("g").agg(topk(col("v"), col("id")).as("top"))
        .orderBy("g").collect().toSeq
    assert(run(1) == run(13))
  }

  test("plan: two-phase aggregate, no Window, no per-group full sort") {
    val p = Analytics.topkPerGroup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      p.take(2000))
    assert(p.toLowerCase.contains("partial"), p.take(2000))
  }
}
