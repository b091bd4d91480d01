package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SinksSpec extends SparkSpec {

  test("upsertByDate: dynamic overwrite of one partition preserves the rest") {
    val out = Sinks.upsertByDate(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == want)
    // the overwritten day's directory exists exactly once
    val dirs = new java.io.File(s"/tmp/graft_sinks/${new java.io.File(sfDir)
      .getName}/daily_counts").listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName)
    assert(dirs.distinct.length == dirs.length)
    assert(dirs.contains("day=2024-01-15"))
  }

  test("compact: 16 scattered files become ≤2, same content") {
    val row = Sinks.compact(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_rows") == Tables.orders(spark, sfDir).count())
    val root = s"/tmp/graft_sinks/${new java.io.File(sfDir).getName}"
    def parquets(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquets(s"$root/scattered") == 16)
    assert(parquets(s"$root/compacted") <= 2)
  }

  test("schemaEvolution: early-generation rows surface null priorities") {
    val out = Sinks.schemaEvolution(spark, sfDir).collect()
    val totalN = out.map(_.getAs[Long]("n")).sum
    val withPriority = out.map(_.getAs[Long]("n_with_priority")).sum
    assert(totalN == Tables.orders(spark, sfDir).count())
    val expected = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) >= 1998).count()
    assert(withPriority == expected) // gen-1 rows read as null priority
    assert(withPriority < totalN)    // both generations present
  }
}
