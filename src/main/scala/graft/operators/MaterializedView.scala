package graft.operators

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Scalars._
import graft.plans.{SummaryDef, SummaryRewrite}

/** Materialized rollup summary + the automatic aggregate rewrite
  * (graft.plans.SummaryRewrite). The summary is the fact pre-aggregated
  * at a FINER grain than the queries it serves — (returnflag,
  * linestatus, ship month) here — so one summary answers every rollup
  * whose keys are a subset: the rule re-aggregates partial sums and
  * counts (sum-of-sums, sum-of-counts, avg = their ratio).
  *
  * Scale story: the pricing rollup scans the full lineitem fact —
  * petabytes at 100 TB — while the month-grain summary is
  * |flags|×|statuses|×|months| rows (hundreds), maintained
  * incrementally by the signed-delta refresh (`Pipelines
  * .incrementalAgg` is the same algebra). The rewrite makes every
  * repeated dashboard rollup a summary read without the query author
  * changing a line.
  */
object MaterializedView {

  private def root(dir: String) =
    s"/tmp/graft_mv/${new File(dir).getName}"

  def summaryPath(dir: String): String = s"${root(dir)}/pricing_rollup_mv"

  /** Build the month-grain summary once per sfDir. The pre-sum inputs
    * use the EXACT `money()` cast the serving queries aggregate with —
    * the contract that makes sum-of-sum re-aggregation bit-exact.
    */
  private def ensureSummary(s: SparkSession, dir: String): Unit = {
    val path = summaryPath(dir)
    if (!new File(path, "_SUCCESS").exists()) {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          date_trunc("month", col("l_shipdate")).as("ship_month"))
        .agg(
          sum(money(col("l_quantity"))).as("s_qty"),
          sum(money(col("l_extendedprice"))).as("s_price"),
          count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(path)
    }
  }

  /** Register the summary for `dir`'s lineitem (building it if needed).
    * Keyed by the fact's RESOLVED root path, not the bare file name:
    * Verify and Bench run multiple sfDirs in one JVM, and a
    * suffix-keyed registry would rewrite every dir's lineitem rollup
    * onto the first dir's summary — wrong rows, no error.
    */
  def install(s: SparkSession, dir: String): Unit = {
    ensureSummary(s, dir)
    SummaryRewrite.register(SummaryDef(
      factPath = SummaryRewrite.resolvedPath(Tables.lineitem(s, dir)),
      summaryPath = summaryPath(dir),
      keys = Set("l_returnflag", "l_linestatus"),
      sums = Map("l_quantity" -> "s_qty", "l_extendedprice" -> "s_price"),
      countCol = "cnt"))
  }

  /** The user-facing rollup, written against the RAW fact — the
    * optimizer swaps in the summary. The driver's oracle computes this
    * from raw lineitem in DuckDB, so a green row proves the rewrite
    * exact end-to-end.
    */
  def rollupRewrite(s: SparkSession, dir: String): DataFrame = {
    install(s, dir)
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ---------------------------------------------------------------
  // Partition-level incremental refresh: the STORAGE side of MV
  // maintenance. `Pipelines.incrementalAggRefresh` proves the
  // signed-delta algebra in one query; this proves the physical
  // discipline a 100 TB summary needs — the stored summary is
  // partitioned by month, a late-arriving delta touches only the
  // months it contains, and the refresh (a) partition-PRUNES the
  // base read down to those months and (b) dynamic-partition-
  // overwrites only them. Refresh IO is O(delta months), not
  // O(summary) and certainly not O(fact) — the property
  // MaterializedViewSpec pins by snapshotting an untouched month's
  // files across the refresh.
  // ---------------------------------------------------------------

  def incPath(dir: String): String = s"${root(dir)}/pricing_rollup_inc"

  /** The cutoff splitting "initial load" from "late-arriving delta".
    * Mid-month on purpose: 1998-06 exists on BOTH sides, so the
    * refresh exercises a real partial-aggregate merge, not a pure
    * append of new months.
    */
  private val cutoff = "1998-06-15"

  /** Month-grain partial aggregates — the mergeable (sum, sum, count)
    * triple; `m` doubles as the hive partition column. A DateType
    * first-of-month (not a "yyyy-MM" string): hive partition-value
    * inference reads "1998-06" back as a DATE anyway, so the date is
    * the type that round-trips the write→read cycle unchanged. Sums
    * are pinned back to decimal(18,6) so a merged partition's files
    * never drift from the initial load's schema (sum over
    * decimal(18,6) widens to (28,6), and parquet readers do not
    * reconcile conflicting decimal precisions across files).
    */
  private def monthGrain(li: DataFrame): DataFrame =
    li.groupBy(col("l_returnflag"), col("l_linestatus"),
        date_trunc("month", col("l_shipdate")).cast("date").as("m"))
      .agg(
        sum(money(col("l_quantity"))).cast("decimal(18,6)").as("s_qty"),
        sum(money(col("l_extendedprice"))).cast("decimal(18,6)")
          .as("s_price"),
        count(lit(1)).as("cnt"))

  /** Initial load: everything shipped before the cutoff, stored
    * partitioned by month.
    */
  private[graft] def buildIncBase(s: SparkSession, dir: String): Unit =
    monthGrain(Tables.lineitem(s, dir)
        .filter(col("l_shipdate") < lit(cutoff).cast("date")))
      .repartition(col("m")) // one file per month partition
      .write.mode("overwrite").partitionBy("m").parquet(incPath(dir))

  /** Merge the late-arriving delta into ONLY the months it touches.
    * The affected-month list is O(months) driver-side planning state
    * (same plane as SkippingIndex's manifest); the base read is
    * partition-pruned by it, the merge re-sums the partial aggregates
    * (sum-of-sums — the algebra that makes month grain re-aggregable),
    * and the write leaves every other partition's files untouched
    * (dynamic overwrite mode). localCheckpoint cuts the self-read
    * lineage, as in `Sinks.upsertByDate` — it materializes O(affected
    * months) rows, never the fact.
    */
  private[graft] def applyIncDelta(s: SparkSession, dir: String): Unit = {
    val delta = monthGrain(Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(cutoff).cast("date")))
    val months = delta.select("m").distinct()
      .collect().map(_.getDate(0)).toSeq
    val base = s.read.parquet(incPath(dir))
      .filter(col("m").isin(months: _*)) // partition-pruned read
    val merged = base.unionByName(delta)
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("m"))
      .agg(sum(col("s_qty")).cast("decimal(18,6)").as("s_qty"),
        sum(col("s_price")).cast("decimal(18,6)").as("s_price"),
        sum(col("cnt")).as("cnt"))
      .localCheckpoint()
    merged.repartition(col("m"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("m").parquet(incPath(dir))
  }

  private def ensureIncremental(s: SparkSession, dir: String): Unit = {
    val marker = new File(s"${root(dir)}/_inc_refreshed")
    if (!marker.exists()) {
      buildIncBase(s, dir)
      applyIncDelta(s, dir)
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
  }

  /** Driver-checked query: the month rollup served from the
    * incrementally-refreshed summary. The oracle recomputes it from
    * the RAW fact in DuckDB, so a green row proves base + merged
    * delta is exactly the full aggregate — including the 1998-06
    * month that lived on both sides of the cutoff.
    */
  def incrementalRollup(s: SparkSession, dir: String): DataFrame = {
    ensureIncremental(s, dir)
    s.read.parquet(incPath(dir))
      .groupBy(date_format(col("m"), "yyyy-MM").as("ship_month"))
      .agg(sum(col("s_qty")).cast("double").as("sum_qty"),
        sum(col("s_price")).cast("double").as("sum_base_price"),
        sum(col("cnt")).as("count_order"))
      .orderBy("ship_month")
  }

  // ---------------------------------------------------------------
  // Delta-rule maintenance of a JOIN view. incrementalRollup covers
  // the aggregate side of IVM; this covers the join side — the other
  // half of the classic view-maintenance algebra (Blakeley et al.,
  // SIGMOD '86): for V = O ⋈ C with an insert delta ΔO on the fact
  // and an update delta ΔC on the dimension,
  //
  //   V_new = (V_old ∖ V_old ⋉ ΔC)   -- retract rows of updated dims
  //         ∪ (O_old ⋈ ΔC_new)        -- re-derive them from new dim rows
  //         ∪ (ΔO ⋈ C_new)            -- join new facts against new dims
  //
  // Scale story: V_old is a stored table read back, never recomputed;
  // ΔC is dimension-update-sized (broadcast on both the retract
  // anti join and the re-derive join), and ΔO ⋈ C_new is
  // delta-fact-sized. Total refresh IO is O(V_old + ΔO + |ΔC|·sel),
  // with the O(|O|·|C|) recompute never run — at 100 TB the recompute
  // is the thing IVM exists to avoid. The driver's oracle IS that
  // full recompute (in DuckDB), so a green row proves the three-term
  // algebra exact, retraction included.
  // ---------------------------------------------------------------

  def joinViewPath(dir: String): String = s"${root(dir)}/orders_enriched_mv"

  /** Fact inserts: orders from 2000-01-01 on (~45% at sf0.01 — a real
    * delta, not a corner case). o_orderdate is a timestamp in the
    * corpus; compare on the cast date.
    */
  private val joinCutoff = "2000-01-01"

  /** Dimension update: every 97th customer moves to the PROMOTED
    * segment — an UPDATE delta, the case where pure insert-algebra
    * IVM silently keeps stale join rows unless it retracts first.
    */
  private def promoted(c: Column): Column =
    when(c % 97 === 0, lit("PROMOTED"))

  private def customerNew(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).withColumn("c_mktsegment",
      coalesce(promoted(col("c_custkey")), col("c_mktsegment")))

  private def joinView(o: DataFrame, c: DataFrame): DataFrame =
    o.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"),
        money(col("o_totalprice")).as("price"))

  /** Build V_old = O_old ⋈ C_old once per sfDir. */
  private def ensureJoinView(s: SparkSession, dir: String): Unit = {
    val path = joinViewPath(dir)
    if (!new File(path, "_SUCCESS").exists()) {
      joinView(
        Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit(joinCutoff).cast("timestamp")),
        Tables.customer(s, dir))
        .write.mode("overwrite").parquet(path)
    }
  }

  /** Driver-checked query: segment rollup served from the
    * delta-maintained join view. The oracle recomputes O_new ⋈ C_new
    * from the raw tables, so a green row proves retract + re-derive +
    * insert lands on exactly the recomputed view.
    */
  def joinDeltaRollup(s: SparkSession, dir: String): DataFrame = {
    ensureJoinView(s, dir)
    val vOld = s.read.parquet(joinViewPath(dir))
    val cNew = customerNew(s, dir)
    val deltaC = Tables.customer(s, dir)
      .filter(col("c_custkey") % 97 === 0)
    val deltaCNew = cNew.filter(col("c_custkey") % 97 === 0)
    val oOld = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit(joinCutoff).cast("timestamp"))
    val deltaO = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(joinCutoff).cast("timestamp"))
    val kept = vOld.join(broadcast(deltaC.select("c_custkey")),
      vOld("o_custkey") === col("c_custkey"), "left_anti")
    val rederived = joinView(oOld, broadcast(deltaCNew))
    val inserted = joinView(deltaO, cNew)
    kept.unionByName(rederived).unionByName(inserted)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price")).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }
}
