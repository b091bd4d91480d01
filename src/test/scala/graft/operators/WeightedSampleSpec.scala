package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Weighted reservoir sampling (Efraimidis–Spirakis keys + TopKAgg)
  * pinned on four fronts: the aggregate equals the window-rank
  * formulation (the DuckDB oracle's shape, replayed in-engine), the
  * sample is well-formed (size, membership), the WEIGHTING is real
  * (high-weight rows overrepresented vs a uniform sample), and the
  * rank-k boundary has a key gap ≫ 1 ulp so engine-level `ln`
  * rounding differences cannot flip membership — the fact that lets
  * a RANDOMIZED operator be hash-exact under the driver's gate.
  */
class WeightedSampleSpec extends SparkSpec {

  private val k = 20

  private def esKeyed = {
    val u = (pmod(pmod(col("event_id"), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))
      .cast("double") + lit(1.0)) / lit(4294967297.0)
    Tables.events(spark, sfDir).select(col("event_type"), col("event_id"),
      greatest(col("value"), lit(1e-6)).as("w"),
      (log(u) / greatest(col("value"), lit(1e-6))).as("es_key"))
  }

  test("aggregate top-k equals the window row_number formulation") {
    val viaAgg = Aggregates.weightedSample(spark, sfDir, k)
      .select("event_type", "rk", "event_id")
    val w = Window.partitionBy("event_type")
      .orderBy(col("es_key").desc, col("event_id"))
    val viaWindow = esKeyed
      .select(col("event_type"), row_number().over(w).cast("long").as("rk"),
        col("event_id"))
      .filter(col("rk") <= k)
    assert(viaAgg.except(viaWindow).count() == 0)
    assert(viaWindow.except(viaAgg).count() == 0)
  }

  test("sample is well-formed: min(k, |group|) rows, all members, " +
    "deterministic across runs") {
    val sample = Aggregates.weightedSample(spark, sfDir, k)
    val sizes = sample.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val groups = Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == groups.map { case (g, n) => g -> math.min(k.toLong, n) })
    // membership: every sampled (type, id) is a real event row
    val stray = sample.join(Tables.events(spark, sfDir),
      Seq("event_type", "event_id"), "left_anti").count()
    assert(stray == 0)
    assert(sample.collect().toSeq ==
      Aggregates.weightedSample(spark, sfDir, k).collect().toSeq)
  }

  test("weighting is real: sampled rows' mean weight exceeds the " +
    "population mean (P[pick] ∝ value)") {
    val popMean = Tables.events(spark, sfDir)
      .agg(avg(greatest(col("value"), lit(1e-6)))).head.getDouble(0)
    val sampMean = Aggregates.weightedSample(spark, sfDir, k)
      .join(Tables.events(spark, sfDir), Seq("event_type", "event_id"))
      .agg(avg(greatest(col("value"), lit(1e-6)))).head.getDouble(0)
    assert(sampMean > popMean,
      s"weighted sample mean $sampMean <= population mean $popMean")
  }

  test("rank-k boundary gap is >> 1 ulp: cross-engine ln rounding " +
    "cannot change the sample") {
    val w = Window.partitionBy("event_type")
      .orderBy(col("es_key").desc, col("event_id"))
    val boundary = esKeyed
      .select(col("event_type"), col("es_key"), row_number().over(w).as("rn"))
      .filter(col("rn").isin(k, k + 1))
      .groupBy("event_type")
      // only groups that actually HAVE a rank-(k+1) row carry a
      // boundary: a group with exactly k rows yields one filtered row
      // (gap 0 — spuriously failing), and a group with < k rows none
      .agg(count(lit(1)).as("nb"), (max("es_key") - min("es_key")).as("gap"))
      .filter(col("nb") === 2)
      .agg(min("gap")).head
    // tiny fixtures may have no group exceeding k rows — vacuously ok
    if (!boundary.isNullAt(0)) {
      val gap = boundary.getDouble(0)
      // |es_key| < 40 here, so 1 ulp < 1e-14; demand 5 orders of margin
      assert(gap > 1e-9, s"boundary key gap $gap too small")
    }
  }
}
