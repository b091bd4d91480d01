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

  test("q13: outer-join histogram buckets count EVERY customer — " +
    "order-less ones land in c_count=0, totals reconcile") {
    val out = Relational.q13OrderHistogram(spark, sfDir).cache()
    val nCustomers = Tables.customer(spark, sfDir).count()
    val histTotal = out.agg(sum(col("custdist"))).collect()(0).getLong(0)
    assert(histTotal == nCustomers)
    // customers with zero (non-urgent) orders exist at this sf and
    // survive the outer join into the zero bucket
    val zeroBucket = out.filter(col("c_count") === 0)
      .select("custdist").collect()
    val orderless = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert((if (zeroBucket.isEmpty) 0L else zeroBucket(0).getLong(0))
      == orderless)
  }

  test("tokenBudgetFill: per-source selection is quality-greedy and " +
    "never exceeds the budget") {
    val out = TextAnalysis.tokenBudgetFill(spark, sfDir, budget = 600L)
      .cache()
    // running total through every kept doc stays within budget
    assert(out.filter(col("cum_tokens") > 600).count() == 0)
    // greedy: a kept doc's quality is >= every dropped doc of the same
    // source unless the dropped doc appeared after budget exhaustion —
    // equivalently, per source the kept set is a prefix of the
    // quality-descending order. Check prefix property via min kept
    // quality vs max dropped quality among docs that would still fit
    // alone (strictly weaker docs only).
    val perSrc = out.groupBy("source")
      .agg(min("quality_score").as("min_kept"),
        sum("n_tokens").as("kept_tokens"))
    val all = TextAnalysis.tokenBudgetFill(spark, sfDir,
      budget = Long.MaxValue)
    val dropped = all.join(out.select(col("doc_id").as("kept_id")),
      col("doc_id") === col("kept_id"), "left_anti")
      .groupBy("source").agg(max("quality_score").as("max_dropped"))
    val violations = perSrc.join(dropped, "source")
      // ties broken by doc_id can interleave equal scores — strict
      .filter(col("max_dropped") > col("min_kept")).count()
    assert(violations == 0)
  }
}
