package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The bloom-prefilter dedup pinned at its two failure points: the
  * wire format (stat.bloomFilter bytes must deserialize inside
  * Spark's BloomFilterMightContain — a silent mismatch would return
  * false for everything and the query would "pass" on empty-ish
  * results), and end-to-end exactness vs the un-prefiltered join.
  */
class BloomDedupSpec extends SparkSpec {

  test("bloom_might_contain is wire-compatible with stat.bloomFilter: " +
    "zero false negatives, non-members mostly pruned") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val members = (0L until 1000L).map(_ * 2)
    val bf = members.toDF("x").stat.bloomFilter("x", 1000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val survived = (0L until 2000L).toDF("x")
      .filter(call_function("bloom_might_contain",
        lit(bos.toByteArray), col("x")))
      .collect().map(_.getLong(0)).toSet
    assert(members.forall(survived), "bloom dropped a member")
    // 1000 odd non-members at 1% fpp: expect ~10 false positives;
    // 100 is a 10x cushion that still proves real pruning
    assert(survived.size < 1100, s"pruned nothing: ${survived.size}")
  }

  test("bloomSemiJoin equals the plain semi join (false positives " +
    "verified away, no false negatives) and is non-trivial") {
    val got = Dedup.bloomSemiJoin(spark, sfDir).collect().toSeq
    val cutoff = lit("1997-01-01").cast("date")
    val orders = graft.Tables.orders(spark, sfDir)
    val expect = orders.filter(col("o_orderdate") >= cutoff)
      .join(orders.filter(col("o_orderdate") < cutoff)
        .select(col("o_custkey").as("ck")),
        col("o_custkey") === col("ck"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy("o_orderkey").collect().toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("bloomSemiJoin carries the sketch as a scalar subquery, not a " +
    "plan literal sized O(|history|)") {
    import org.apache.spark.sql.catalyst.expressions.{Literal, PlanExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val qe = Dedup.bloomSemiJoin(spark, sfDir).queryExecution
    val plan = qe.optimizedPlan
    // no binary literal anywhere in the plan tree (the r7 shape
    // embedded the serialized filter — O(|history keys|) bytes that
    // break task-binary limits at scale)
    val binLits = plan.flatMap(_.expressions.flatMap(_.collect {
      case l @ Literal(_, BinaryType) => l
    }))
    assert(binLits.isEmpty, s"plan-literal bloom survived: $binLits")
    // the sketch rides a subquery whose plan aggregates with
    // BloomFilterAggregate — Spark's own runtime-filter delivery shape
    val subAggs = plan.flatMap(_.expressions.flatMap(_.collect {
      case p: PlanExpression[_] => p.plan match {
        case lp: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
          lp.flatMap(_.expressions.flatMap(_.collect {
            case b: BloomFilterAggregate => b
          }))
        case _ => Nil
      }
    }).flatten)
    assert(subAggs.nonEmpty, "no BloomFilterAggregate subquery in plan")
  }
}
