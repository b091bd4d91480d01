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
