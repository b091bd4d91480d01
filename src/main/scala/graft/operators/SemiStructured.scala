package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.Scalars._

/** Semi-structured JSON operators (SURVEY.md §2.1 S4-S6, §2.6 X3/X6):
  * the REST-response flattening layer. The nested documents are BUILT
  * from the relational testdata (to_json of collected structs — the
  * same shape a DataSource-V2 REST connector would land as a bronze
  * layer), then parsed back with explicit schemas (`from_json`),
  * traversed permissively, exploded, and aggregated. Oracles check the
  * whole round trip against the flat tables.
  */
object SemiStructured {

  private val orderDocSchema = StructType(Seq(
    StructField("okey", LongType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("qty", DoubleType),
      StructField("flag", StringType)))))))

  /** S5/S6 + A1: JSON document → from_json(schema) → explode array of
    * structs → grouped SUM. Mirrors the `multiDailyMetricTimeSeries`
    * unwind (`BP:587-607`) with a full build→parse round trip.
    */
  def jsonFlatten(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(to_json(struct(col("l_orderkey").as("okey"),
        collect_list(struct(col("l_quantity").as("qty"),
          col("l_returnflag").as("flag"))).as("items"))).as("doc"))
    docs
      .select(from_json(col("doc"), orderDocSchema).as("d"))
      .select(explode(col("d.items")).as("it"))
      .groupBy(col("it.flag").as("flag"))
      .agg(sum(money(col("it.qty"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("flag")
  }

  /** X6/X3: untyped JSON field access with permissive missing keys —
    * `get_json_object` over the free-JSON `events.props` column
    * (guarded dict access, `BP:511`), missing → null → sentinel/0.
    */
  def propsExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        get_json_object(col("props"), "$.missing").as("missing"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("k_sum"),
        count(col("missing")).as("n_missing_present"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** S6 struct traversal: typed from_json + nested field paths with
    * null-safe defaults (`categories.primaryCategory.displayName`
    * shape, `BP:560-568`).
    */
  def structTraversal(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("profile", StructType(Seq(
      StructField("name", StringType),
      StructField("meta", StructType(Seq(
        StructField("segment", StringType),
        StructField("uri", StringType)))))))))
    Tables.customer(s, dir)
      .withColumn("doc", to_json(struct(struct(col("c_name").as("name"),
        struct(col("c_mktsegment").as("segment"),
          lit(null).cast("string").as("uri")).as("meta")).as("profile"))))
      .select(col("c_custkey"), from_json(col("doc"), schema).as("d"))
      .select(col("c_custkey"),
        col("d.profile.name").as("name"),
        col("d.profile.meta.segment").as("segment"),
        notFound(col("d.profile.meta.uri")).as("uri"))
      .orderBy("c_custkey")
  }

  /** End-to-end differential test of the GMB performance flattener
    * (`GmbFlattener.flattenPerformance`, reference `main.py:587-615`):
    * deterministic bronze JSON in the exact GMB response shape is
    * BUILT from `events`, pushed through the real build → parse →
    * explode → last-wins → pivot path, and the DuckDB oracle computes
    * the same aggregation directly from `events` — so the whole JSON
    * round trip must be semantics-preserving, not just parse.
    */
  def gmbPerformanceRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val metricOf = when(col("event_type") === "click", "CALL_CLICKS")
      .when(col("event_type") === "view", "WEBSITE_CLICKS")
      .when(col("event_type") === "purchase", "BUSINESS_CONVERSATIONS")
      .when(col("event_type") === "signup",
        "BUSINESS_IMPRESSIONS_DESKTOP_MAPS")
      .otherwise("BUSINESS_DIRECTION_REQUESTS")
    // floor() on both engines (double→int CAST truncates in Spark but
    // ROUNDS in DuckDB — never cast a fractional double cross-engine)
    val perMetric = Tables.events(s, dir)
      .select(col("user_id").as("id"), metricOf.as("metric"),
        col("ts"), floor(col("value")).cast("long").as("v"))
      .groupBy(col("id"), col("metric"))
      .agg(collect_list(struct(
        struct(year(col("ts")).as("year"), month(col("ts")).as("month"),
          dayofmonth(col("ts")).as("day")).as("date"),
        col("v").cast("string").as("value"))).as("dvs"))
    val bronze = perMetric.groupBy("id")
      // one series per metric; sort for a deterministic series order
      // (sum is order-independent inside a series)
      .agg(sort_array(collect_list(struct(col("metric"), col("dvs"))))
        .as("ms"))
      .select(col("id"), to_json(struct(transform(col("ms"), m =>
        struct(array(struct(
          m.getField("metric").as("dailyMetric"),
          struct(m.getField("dvs").as("datedValues")).as("timeSeries")))
          .as("dailyMetricTimeSeries")))
        .as("multiDailyMetricTimeSeries"))).as("doc"))
    GmbFlattener.flattenPerformance(bronze).orderBy("id")
  }
}
