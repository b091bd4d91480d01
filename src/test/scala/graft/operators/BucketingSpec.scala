package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("bucketed co-located join runs without a shuffle exchange") {
    val s = spark
    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a non-broadcast join so bucketing (not broadcasting) is
      // what eliminates the shuffle; AQE off for a stable plan string
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Advanced.bucketedJoin(s, sfDir)
      val joined = s.table("graft_lineitem_b")
        .join(s.table("graft_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"expected no Exchange in bucketed join plan:\n${plan.take(2000)}")
      // and the result matches the unbucketed computation
      val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val want = graft.Tables.lineitem(s, sfDir)
        .join(graft.Tables.orders(s, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
