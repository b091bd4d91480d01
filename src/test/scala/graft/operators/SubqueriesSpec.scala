package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.Scalars._

/** Independent-path consistency checks for the decorrelated-subquery
  * family: each window/broadcast rewrite re-computed here via the
  * NAIVE groupBy + join-back formulation it replaced, on the real
  * tables — if the rewrite ever drifts from subquery semantics, these
  * diverge even while the DuckDB oracle (which replays the rewritten
  * arithmetic) stays green. Tie semantics get a targeted check.
  */
class SubqueriesSpec extends SparkSpec {

  test("q17 window decorrelation equals the naive per-part avg join") {
    val brandParts = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey"))
    val li = Tables.lineitem(spark, sfDir)
      .join(brandParts, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(money(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n_lines"))
    val naive = li.join(perPart, Seq("l_partkey"))
      .filter(money(col("l_quantity")) * 5 * col("n_lines") < col("sum_qty"))
      .agg((moneySum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_small_lines"))
      .collect().head
    val fast = Subqueries.q17SmallQtyRevenue(spark, sfDir).collect().head
    assert(fast.getLong(1) == naive.getLong(1))
    assert(fast.getDouble(0) == naive.getDouble(0)) // decimal-exact sums
  }

  test("q21 window decorrelation equals the naive rollup + semi join") {
    val perOrderSupp = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max((col("l_returnflag") === "R").cast("int")).as("failed"))
    val perOrder = perOrderSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("failed")).as("n_failed"))
      .filter(col("n_suppliers") > 1 && col("n_failed") === 1)
    val finalized = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val naive = perOrderSupp.filter(col("failed") === 1)
      .join(perOrder, Seq("l_orderkey"), "left_semi")
      .join(finalized, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Subqueries.q21SoleFailingSupplier(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fast == naive)
  }

  test("q15 surfaces ALL tied max suppliers (scalar = semantics, " +
    "not an arbitrary top-1)") {
    // the fixture's revenues are almost surely tie-free, so the tie
    // path is proven structurally: every returned row carries the one
    // global max revenue, and re-running with the winner's revenue as
    // a filter returns the same row set
    val out = Subqueries.q15TopSupplier(spark, sfDir).collect()
    assert(out.nonEmpty)
    val maxRev = out.map(_.getDouble(2)).max
    assert(out.forall(_.getDouble(2) == maxRev))
    // no qualifying supplier is missing: count suppliers at maxRev in
    // the quarter directly
    val direct = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("r"))
      .filter(col("r") === maxRev).count()
    assert(direct == out.length.toLong)
  }

  test("incrementalAggRefresh drops groups whose orders all retract") {
    // structural guarantee on the real data: no surviving row may
    // report a non-positive count, and the merged row set equals the
    // direct aggregation over surviving orders
    val merged = Pipelines.incrementalAggRefresh(spark, sfDir)
    assert(merged.filter(col("n_orders") <= 0).count() == 0)
    val direct = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") ||
        col("o_orderkey") % 10 =!= 0)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val joined = merged.select(col("o_custkey"), col("n_orders"))
      .join(direct.withColumnRenamed("n_orders", "direct_n"),
        Seq("o_custkey"), "full_outer")
    assert(joined.filter(col("n_orders").isNull ||
      col("direct_n").isNull ||
      col("n_orders") =!= col("direct_n")).count() == 0)
  }
}
