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

  test("persisted LSH index: the bucketed history side joins with NO " +
    "exchange — only the small delta band stream shuffles to the " +
    "bucket layout — and the audit row equals the pooled-index form") {
    val s = spark
    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      // build the index + audit (result parity with the pooled form)
      val bucketed = Dedup.incrementalLshBucketed(s, sfDir).collect()
      val pooled = Dedup.incrementalLsh(s, sfDir).collect()
      assert(bucketed.toSeq == pooled.toSeq)
      // the probe join in isolation: the history (bucketed) side must
      // carry its bucket layout into the join — any Exchange directly
      // above the graft_lsh_hist_b scan means bucketing bought nothing
      val probe = s.table("graft_lsh_hist_b")
        .join(spark.range(0, 10)
          .selectExpr("concat('0:', id) AS bandkey", "id AS doc_id"),
          "bandkey")
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      // exactly ONE exchange: the probe side's; zero would need the
      // probe bucketed too, two would mean the index shuffled anyway
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"$exchanges exchanges in bucketed probe plan:\n${plan.take(2000)}")
      // and the scan itself reports its bucket layout
      assert(plan.contains("Bucketed: true"), plan.take(2500))
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
