package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import graft.{SparkSpec, Tables}

/** Count-min point queries pinned on the properties the query's
  * assertion column claims: the one-sided guarantee (est ≥ true for
  * EVERY key, not just the probe list — a deterministic CMS law, not
  * a w.h.p. bound), and LOSSLESS mergeability (daily sketches merged
  * on the driver answer every point query identically to one sketch
  * over the whole table — CMS counters add, so rollup costs nothing
  * in accuracy). Between them these justify the sketch-plane rollup
  * story at 100 TB: kilobyte day sketches, exact merge, audit lists
  * answered without touching data.
  */
class CmsPointQuerySpec extends SparkSpec {

  private def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch =
    CountMinSketch.readFrom(df
      .agg(count_min_sketch(col("user_id"), lit(0.005), lit(0.99), lit(42)))
      .head.getAs[Array[Byte]](0))

  test("query emits one row per probe, every bound verdict true") {
    val out = Aggregates.cmsPointQueries(spark, sfDir).collect()
    val probes = Tables.events(spark, sfDir)
      .filter(col("user_id") % 13 === 0)
      .select("user_id").distinct().count()
    assert(out.length == probes && probes > 0)
    assert(out.forall(_.getBoolean(2)), "CMS bound verdict false")
  }

  test("verify plane is distributed: probe rows stay a DataFrame over " +
    "the events scan (no driver-side LocalRelation), estimates via the " +
    "cms_estimate expression") {
    val df = Aggregates.cmsPointQueries(spark, sfDir)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty &&
      leaves.forall(_.isInstanceOf[
        org.apache.spark.sql.execution.datasources.LogicalRelation]),
      s"probe plan leaves are not file scans:\n${leaves.mkString("\n")}")
    assert(df.queryExecution.optimizedPlan.toString.contains("cmsestimatecount"),
      "cms_estimate expression missing from the probe plan")
  }

  test("distributed cms_estimate equals driver-side estimateCount on " +
    "every probe (codegen path vs reference impl)") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val sk = sketchOf(Tables.events(spark, sfDir))
    val distributed = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct()
      .select(col("user_id"), call_function("cms_estimate",
        lit(sk.toByteArray), col("user_id")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed.nonEmpty)
    distributed.foreach { case (u, est) =>
      assert(est == sk.estimateCount(u),
        s"codegen estimate $est != reference ${sk.estimateCount(u)} for $u")
    }
  }

  test("upper bound est <= true + ceil(eps*N) holds on every probe " +
    "(a 0.99-CONFIDENCE bound, not a law: it holds under the fixed " +
    "seed 42 on this fixture, which is what legitimizes the oracle's " +
    "literal TRUE — if this fails after an eps/seed/fixture change, " +
    "the bound was legitimately exceeded, not computed wrongly)") {
    val eps = 0.005
    val sk = sketchOf(Tables.events(spark, sfDir))
    val n = Tables.events(spark, sfDir).count()
    val bound = math.ceil(eps * n).toLong
    val over = Tables.events(spark, sfDir)
      .filter(col("user_id") % 13 === 0)
      .groupBy("user_id").count().collect()
      .filter(r => sk.estimateCount(r.getLong(0)) > r.getLong(1) + bound)
    assert(over.isEmpty,
      s"${over.length} probes exceed true+ceil(eps*N)=+$bound — the " +
        "w.h.p. bound flipped (legitimate under a changed seed/eps/" +
        "fixture), not a computation bug")
  }

  test("one-sided guarantee holds for EVERY key: est >= exact count") {
    val sk = sketchOf(Tables.events(spark, sfDir))
    val exact = Tables.events(spark, sfDir)
      .groupBy("user_id").count().collect()
    val under = exact.filter(r => sk.estimateCount(r.getLong(0)) < r.getLong(1))
    assert(under.isEmpty, s"${under.length} keys underestimated")
  }

  test("daily-sketch mergeInPlace is lossless: merged estimates equal " +
    "the single whole-table sketch on every key") {
    val whole = sketchOf(Tables.events(spark, sfDir))
    val merged = Tables.events(spark, sfDir)
      .groupBy(col("ts").cast("date"))
      .agg(count_min_sketch(col("user_id"), lit(0.005), lit(0.99),
        lit(42)).as("sk"))
      .collect()
      .map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]]("sk")))
      .reduce(_.mergeInPlace(_))
    val keys = Tables.events(spark, sfDir)
      .select("user_id").distinct().collect().map(_.getLong(0))
    assert(keys.forall(u => merged.estimateCount(u) == whole.estimateCount(u)))
  }
}
