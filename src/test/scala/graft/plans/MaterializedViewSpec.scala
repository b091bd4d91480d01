package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Aggregates, MaterializedView}

/** The aggregate-navigator rewrite, pinned from both sides: the
  * covered rollup must swap onto the summary (zero fact scans), the
  * rewrite must be row-for-row exact vs the raw plan, and anything the
  * summary cannot answer must be left alone.
  */
class MaterializedViewSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def scansOf(p: String, table: String): Int =
    p.linesIterator.count(l =>
      l.contains("Location") && l.contains(s"$table.parquet"))

  test("covered rollup rewrites onto the summary: zero fact scans, " +
    "coarser grain re-aggregated from the month-grain pre-sums") {
    val df = MaterializedView.rollupRewrite(spark, sfDir)
    val p = plan(df)
    assert(scansOf(p, "lineitem") == 0, p.take(2500))
    assert(p.contains("pricing_rollup_mv"), p.take(2500))
  }

  test("rewrite is exact: identical rows to the raw fact scan with " +
    "the rule disabled") {
    val rewritten = MaterializedView.rollupRewrite(spark, sfDir).collect()
    val conf = spark.conf
    val key = "spark.graft.summaryRewrite.enabled"
    try {
      conf.set(key, "false")
      val raw = MaterializedView.rollupRewrite(spark, sfDir)
      // disabled → the plan scans the fact again
      assert(scansOf(plan(raw), "lineitem") == 1, plan(raw).take(2500))
      assert(raw.collect().toSeq == rewritten.toSeq)
    } finally conf.unset(key)
  }

  test("a summary registered for one dir never answers another dir's " +
    "same-named fact (dir-qualified path equality, not suffix match)") {
    MaterializedView.install(spark, sfDir)
    val other = "/root/testdata/sf0.01" // same file name, different dir
    import org.apache.spark.sql.functions._
    val p = plan(graft.Tables.lineitem(spark, other)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(graft.functions.Scalars.moneySum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("count_order")))
    assert(scansOf(p, "lineitem") == 1, p.take(2500))
    assert(!p.contains("pricing_rollup_mv"), p.take(2500))
  }

  test("count(NULL literal) is never rewritten to the group row count: " +
    "0 per group survives the summary rewrite") {
    // Catalyst folds count(NULL) to literal 0 before our rule runs, so
    // the remaining keys-only aggregate MAY legally swap onto the
    // summary (distinct keys over it ≡ distinct over the fact); the
    // guarded rewritableAgg is defense for any unfolded Count(null)
    // form. Either way the VALUES must be 0, never the row count.
    MaterializedView.install(spark, sfDir)
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(null)).as("n_null"))
      .collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(2) == 0L),
      rows.mkString(","))
  }

  test("a filtered aggregate below the summary grain is NOT rewritten") {
    MaterializedView.install(spark, sfDir)
    // pricingSummary filters on l_shipdate — the summary cannot answer
    // it, so the plan must keep the fact scan
    val p = plan(Aggregates.pricingSummary(spark, sfDir))
    assert(scansOf(p, "lineitem") == 1, p.take(2500))
    assert(!p.contains("pricing_rollup_mv"), p.take(2500))
  }

  test("incremental refresh rewrites ONLY the delta's months and " +
    "serves exactly the full recompute") {
    import java.io.File
    import org.apache.spark.sql.functions._
    MaterializedView.buildIncBase(spark, sfDir)
    val root = new File(MaterializedView.incPath(sfDir))
    def listing(month: String): Seq[(String, Long, Long)] = {
      val d = new File(root, s"m=$month")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).toSeq.sorted
    }
    // pick a real pre-cutoff month so the pin survives any testdata
    // date-range change; 1998-06 straddles the 1998-06-15 cutoff
    val untouchedMonth = root.listFiles().map(_.getName)
      .filter(_.startsWith("m=")).sorted.head.stripPrefix("m=")
    val untouchedBefore = listing(untouchedMonth)
    val junBefore = listing("1998-06-01")
    assert(untouchedBefore.nonEmpty && junBefore.nonEmpty)

    MaterializedView.applyIncDelta(spark, sfDir)

    // O(delta) refresh: months outside the delta keep their exact
    // files; the straddling month was dynamic-partition-overwritten
    assert(listing(untouchedMonth) == untouchedBefore)
    assert(listing("1998-06-01") != junBefore)

    val served = MaterializedView.incrementalRollup(spark, sfDir)
      .collect().toSeq
    val direct = graft.Tables.lineitem(spark, sfDir)
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(graft.functions.Scalars.moneySum(col("l_quantity")).as("sum_qty"),
        graft.functions.Scalars.moneySum(col("l_extendedprice"))
          .as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .orderBy("ship_month").collect().toSeq
    assert(served == direct)
  }

  test("joinDeltaRollup: retract ∪ re-derive ∪ insert equals the full " +
    "O_new ⋈ C_new recompute — the dimension UPDATE retracts stale " +
    "join rows instead of double-counting them") {
    val inc = MaterializedView.joinDeltaRollup(spark, sfDir).collect().toSeq
    val cNew = graft.Tables.customer(spark, sfDir)
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 97 === 0, lit("PROMOTED"))
          .otherwise(col("c_mktsegment")))
    val full = graft.Tables.orders(spark, sfDir)
      .join(cNew, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(graft.functions.Scalars.money(col("o_totalprice")))
          .cast("double").as("revenue"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(inc == full)
    // the update delta is really exercised: a PROMOTED segment exists
    // and holds exactly the %97 customers' orders
    val promotedOrders = graft.Tables.orders(spark, sfDir)
      .filter(col("o_custkey") % 97 === 0).count()
    val seg = inc.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(promotedOrders > 0 && seg.get("PROMOTED").contains(promotedOrders))
  }
}
