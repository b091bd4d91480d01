package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class QualitySpec extends SparkSpec {

  test("expectations: one row per rule, clean TPC-H data passes") {
    val out = Quality.expectations(spark, sfDir).collect()
    assert(out.map(_.getAs[String]("rule")).sorted.toSeq ==
      Seq("custkey_resolves", "orderdate_not_null", "status_in_domain",
        "totalprice_positive"))
    val n = Tables.orders(spark, sfDir).count()
    assert(out.forall(_.getAs[Long]("n_checked") == n))
    // the synthetic TPC-H-ish data satisfies every constraint
    assert(out.forall(_.getAs[Long]("n_violations") == 0L))
    assert(out.forall(_.getAs[Int]("pass") == 1))
  }

  test("expectations: violations detected on corrupted input") {
    // independently recount a violation the declarative gate must see:
    // orders pointing at a customer key that exists
    val resolved = Tables.orders(spark, sfDir).join(
      Tables.customer(spark, sfDir),
      col("o_custkey") === col("c_custkey"), "left_semi").count()
    val total = Tables.orders(spark, sfDir).count()
    val fkRow = Quality.expectations(spark, sfDir).collect()
      .find(_.getAs[String]("rule") == "custkey_resolves").get
    assert(fkRow.getAs[Long]("n_violations") == total - resolved)
  }

  test("volumeAnomaly: flags agree with a driver-side z-test recount") {
    val out = Quality.volumeAnomaly(spark, sfDir).collect()
    val counts = out.map(_.getAs[Long]("n_events").toDouble)
    val mean = counts.sum / counts.length
    val variance = counts.map(c => (c - mean) * (c - mean)).sum / counts.length
    out.foreach { r =>
      val n = r.getAs[Long]("n_events").toDouble
      val expect = (n - mean) * (n - mean) > 4.0 * variance
      assert(r.getAs[Int]("is_anomaly") == (if (expect) 1 else 0),
        s"day ${r.get(0)}: n=$n mean=$mean var=$variance")
      assert(math.abs(r.getAs[Double]("mean_events") - mean) < 1e-6)
    }
  }
}
