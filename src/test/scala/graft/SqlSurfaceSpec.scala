package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** The SQL entry point a migrating user gets: every table registered
  * as a view is queryable through `spark.sql`, and the engine's custom
  * kernels resolve as SQL functions after `ensureRegistered` — the
  * same Catalyst plans as the Column API, proven by result parity.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over registered views matches the DataFrame plan") {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_v")
    val sql = spark.sql(
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM customer_v JOIN orders_v ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val api = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sql.toSeq == api.toSeq)
  }

  test("custom kernels are callable from SQL text") {
    VectorExpressions.ensureRegistered(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_v")
    val viaSql = spark.sql(
      """SELECT vec_id, vector_dot(embedding, embedding) AS nrm2,
        |  vector_project(embedding, 4) AS proj
        |FROM emb_v ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    val viaApi = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        call_function("vector_dot", col("embedding"), col("embedding"))
          .as("nrm2"),
        call_function("vector_project", col("embedding"), lit(4)).as("proj"))
      .orderBy("vec_id").limit(5).collect()
    assert(viaSql.length == 5)
    viaSql.zip(viaApi).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getDouble(1) == b.getDouble(1))
      assert(a.getSeq[Double](2) == b.getSeq[Double](2))
    }
    // text kernels resolve too
    val sh = spark.sql(
      "SELECT simhash64(word_shingles('a b c d', 3)) AS h").head.getLong(0)
    assert(sh != 0L)
  }
}
