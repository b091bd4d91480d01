package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contract of the mergeable histogram-sketch percentile rollup:
  * the TOTAL row really is the merge of the day sketches (no rescan
  * can be asserted, but the counts must reconcile), and every
  * estimate is within one bin width above the exact percentile.
  */
class QuantileSketchSpec extends SparkSpec {

  test("quantileRollup: TOTAL reconciles and estimates bound the exact " +
    "percentile within one bin width") {
    val out = Analytics.quantileRollup(spark, sfDir).collect()
    val total = out.filter(_.getAs[String]("scope") == "TOTAL")
    assert(total.length == 1)
    val orders = graft.Tables.orders(spark, sfDir)
    assert(total.head.getAs[Long]("n_orders") == orders.count())
    val days = out.filterNot(_.getAs[String]("scope") == "TOTAL")
    assert(days.map(_.getAs[Long]("n_orders")).sum == orders.count(),
      "day sketch counts must partition the table")

    // exact percentiles of the whole table; the sketch's upper-edge
    // read-off must land in (exact, exact + Width]
    val width = graft.functions.HistSketch.Width
    val Array(p50, p95) = orders.stat
      .approxQuantile("o_totalprice", Array(0.5, 0.95), 0.0)
    val t = total.head
    assert(t.getAs[Double]("p50_est") >= p50 - width &&
      t.getAs[Double]("p50_est") <= p50 + width,
      s"p50_est ${t.getAs[Double]("p50_est")} vs exact $p50")
    assert(t.getAs[Double]("p95_est") >= p95 - width &&
      t.getAs[Double]("p95_est") <= p95 + width,
      s"p95_est ${t.getAs[Double]("p95_est")} vs exact $p95")
    // estimates are always a bin upper edge
    assert(out.forall(r =>
      r.getAs[Double]("p50_est") % width == 0.0 &&
        r.getAs[Double]("p95_est") % width == 0.0))
    assert(out.forall(r =>
      r.getAs[Double]("p50_est") <= r.getAs[Double]("p95_est")))
  }
}
