package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.Scalars

class RelationalSpec extends SparkSpec {

  test("snapshot: semi join keeps only positive-balance customers' orders") {
    val out = Relational.snapshot(spark, sfDir).cache()
    assert(out.count() > 0)
    val badIds = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") <= 0).select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val custsInOut = out.select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(custsInOut.intersect(badIds).isEmpty)
  }

  test("snapshot: X1 bool normalize and X2 null-overwrite column") {
    val out = Relational.snapshot(spark, sfDir)
    val flags = out.select("is_fulfilled").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(flags.subsetOf(Set(0, 1)))
    assert(out.filter(col("geolocation").isNotNull).count() == 0)
  }

  test("digitIdFilter: extracted numeric id equals the customer key") {
    val bad = Relational.digitIdFilter(spark, sfDir)
      .filter(col("id_num") =!= col("c_custkey")).count()
    assert(bad == 0)
  }

  test("fullDump: schema-walk turns every BooleanType column into 0/1") {
    val out = Relational.fullDump(spark, sfDir)
    assert(!out.schema.fields.exists(_.dataType ==
      org.apache.spark.sql.types.BooleanType))
    val vals = out.select("is_low_key").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(vals == Set(0, 1))
  }

  test("leftEnrich: X3 sentinel appears only for customers without 2001 orders") {
    val out = Relational.leftEnrich(spark, sfDir).cache()
    val sentinelRows = out.filter(col("last_status") === Scalars.NotFoundSentinel)
    val zeroRows = out.filter(col("n_orders_2001") === 0)
    assert(sentinelRows.count() == zeroRows.count())
    assert(out.count() == Tables.customer(spark, sfDir).count())
  }

  test("anti join + semi join partition the customer set") {
    val anti = Relational.antiJoin(spark, sfDir).count()
    val total = Tables.customer(spark, sfDir).count()
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select("o_custkey").distinct().count()
    assert(anti == total - recent)
  }

  test("normalizeBooleans leaves non-boolean columns untouched") {
    import spark.implicits._
    val df = Seq((1L, true, "x"), (2L, false, "y")).toDF("id", "flag", "s")
    val out = Scalars.normalizeBooleans(df)
    assert(out.schema("flag").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(out.schema("s").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(out.select("flag").collect().map(_.getInt(0)).toSeq == Seq(1, 0))
  }
}
