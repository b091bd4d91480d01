package graft.plans

import graft.SparkSpec
import graft.operators.{Aggregates, Relational}

/** Column-lineage extraction asserted on real queries: every output
  * column of a multi-join aggregate, an explode, and a union must
  * trace to exactly the physical table.columns that feed it.
  */
class LineageSpec extends SparkSpec {

  test("join3Revenue: revenue traces to lineitem price+discount, keys " +
    "to their dims, through join+aggregate+orderBy") {
    val lin = Lineage.columnLineage(Relational.join3Revenue(spark, sfDir))
    assert(lin("c_mktsegment") == Set("customer.c_mktsegment"), lin)
    assert(lin("order_year") == Set("orders.o_orderdate"), lin)
    assert(lin("revenue") ==
      Set("lineitem.l_extendedprice", "lineitem.l_discount"), lin)
    // count(lit(1)) references no physical column — empty lineage
    assert(lin("n_orders") == Set.empty, lin)
  }

  test("explodeSum: columns born from a generator trace through it") {
    val lin = Lineage.columnLineage(Aggregates.explodeSum(spark, sfDir))
    // struct fields pass through collect_list+explode at references
    // granularity: both struct members surface as sources
    assert(lin("metric") ==
      Set("events.event_type", "events.value"), lin)
    assert(lin("metric_sum") ==
      Set("events.event_type", "events.value"), lin)
    assert(lin("n_points") == Set.empty, lin) // count(lit(1))
  }

  test("union + projection: lineage merges positionally across both " +
    "branches; literal-only columns map to the empty set") {
    import org.apache.spark.sql.functions._
    val a = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("k"), col("c_name").as("v"))
    val b = graft.Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("k"), col("s_name").as("v"))
    val lin = Lineage.columnLineage(
      a.unionByName(b).withColumn("tag", lit("x")))
    assert(lin("k") == Set("customer.c_custkey", "supplier.s_suppkey"),
      lin)
    assert(lin("v") == Set("customer.c_name", "supplier.s_name"), lin)
    assert(lin("tag") == Set.empty, lin)
  }

  test("edges: deterministic catalog-shaped dump") {
    val es = Lineage.edges(Relational.scanProject(spark, sfDir))
    assert(es.nonEmpty && es == es.sorted, es.take(5))
    assert(es.forall { case (_, src) => src.startsWith("orders.") },
      es.take(5))
  }
}
