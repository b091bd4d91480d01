package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet loaders for the driver-generated testdata tables
  * (/root/repo/TESTDATA.md). Every operator entry point takes
  * `(SparkSession, sfDir)` and reads only through here, so Catalyst
  * sees a plain parquet relation and can push filters/projections
  * into the scan.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a small-file scan across all cores. The testdata tables are
    * single small parquet files → one input split → CPU-heavy per-row
    * operators (hashing, shingling) run single-threaded without this.
    * On a real cluster the input would arrive in many splits; this
    * restores that shape locally. Use only in front of compute-heavy
    * per-row work — a shuffle is not free.
    */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` arrives in whatever parquet timestamp encoding the
    * corpus generator used — normalize every variant to a plain
    * TimestampType so downstream operators see one type:
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark 4 reads
    *    TIMESTAMP_NTZ; the session TZ is pinned to UTC (Sessions), so
    *    casting reinterprets the wall-clock as the same UTC instant.
    *  - TIMESTAMP(NANOS) → raw long if the caller set the legacy
    *    `spark.sql.legacy.parquet.nanosAsLong` read; convert ns→µs
    *    (older corpus generations).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _        => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
