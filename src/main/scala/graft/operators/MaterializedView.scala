package graft.operators

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
