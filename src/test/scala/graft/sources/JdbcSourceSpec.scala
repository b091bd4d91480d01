package graft.sources

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.operators.Relational

/** The S2 JDBC ingest path over embedded Derby: the relation must
  * behave like the reference's database read
  * (`Gonukkad_Merchants.py:61`) with Spark's pushdown — predicates and
  * the projection reach the database, the scan range-partitions, and
  * the round-tripped rows match the parquet source they were seeded
  * from.
  */
class JdbcSourceSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("seeded Derby table round-trips the parquet supplier rows") {
    // s_nationkey is int32 in the parquet source — Derby INTEGER must
    // round-trip back to IntegerType, hence getInt
    val viaJdbc = JdbcSource.supplier(spark, sfDir)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getDouble(3))).toSet
    val viaParquet = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getDouble(3))).toSet
    assert(viaJdbc == viaParquet)
    assert(viaJdbc.nonEmpty)
  }

  test("predicate pushes down into the JDBC scan") {
    val p = plan(JdbcSource.supplier(spark, sfDir)
      .filter(col("s_acctbal") > 0))
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(p.contains("GreaterThan(s_acctbal"), p.take(2000))
  }

  test("projection prunes the JDBC select list") {
    val pruned = JdbcSource.supplier(spark, sfDir)
      .select("s_suppkey", "s_acctbal")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.schema.fieldNames.toSet == Set("s_suppkey", "s_acctbal"))
  }

  test("read splits into range partitions on the numeric key") {
    assert(JdbcSource.supplier(spark, sfDir).rdd.getNumPartitions == 4)
  }

  test("jdbcSnapshot: broadcast semi join over the pushed-down scan") {
    val df = Relational.jdbcSnapshot(spark, sfDir)
    val p = plan(df)
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      p.take(1500))
    assert(p.contains("PushedFilters"), p.take(2000))
    // rows agree with computing the same thing from parquet
    val viaParquet = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") > 0)
      .join(Tables.nation(spark, sfDir).filter(col("n_regionkey") === 1)
        .select("n_nationkey"),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .count()
    assert(df.count() == viaParquet)
  }

  test("v2 catalog pushes the WHOLE aggregation into the database — " +
    "the external engine query carries GROUP BY + SUM/COUNT/MIN/MAX") {
    val df = JdbcSource.nationRollupPushdown(spark, sfDir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedAggregates"), p.take(2500))
    assert(p.contains("SUM(CAST(s_acctbal AS decimal(18,6)))"), p.take(2500))
    assert(p.contains("PushedGroupByExpressions: [s_nationkey]"),
      p.take(2500))
    // and the rollup equals the same aggregation over the parquet seed
    val viaParquet = graft.Tables.supplier(spark, sfDir)
      .groupBy(col("s_nationkey"))
      .agg(graft.functions.Scalars.moneySum(col("s_acctbal")).as("bal"),
        count(lit(1)).as("n"),
        min(col("s_acctbal")).as("lo"), max(col("s_acctbal")).as("hi"))
      .orderBy("s_nationkey").collect().toSeq
    assert(df.collect().toSeq == viaParquet)
  }
}
