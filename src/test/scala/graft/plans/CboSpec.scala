package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import graft.{SparkSpec, Tables}

/** Cost-based optimization, pinned: with ANALYZE statistics and the
  * CBO join-reorder rule on, a join chain WRITTEN fact-first is
  * re-ordered so the selective dim join runs first — the
  * statistics-driven behavior a 1000-executor deploy relies on (plan
  * quality must come from stats, not from authors hand-ordering every
  * query). Catalog tables + ANALYZE are the deploy-side prerequisite
  * this spec documents.
  */
class CboSpec extends SparkSpec {

  private def leafTables(p: LogicalPlan): Set[String] =
    p.collectLeaves().flatMap { l =>
      l.toString.split("\n").headOption.toSeq.flatMap(line =>
        Seq("cbo_orders", "cbo_lineitem", "cbo_customer")
          .filter(line.contains))
    }.toSet

  test("ANALYZE + CBO reorder: the selective customer dim joins orders " +
    "BEFORE the lineitem fact, although the query is written fact-first") {
    val s = spark
    Seq("cbo_orders", "cbo_lineitem", "cbo_customer").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      // a fresh JVM's catalog does not know tables a previous run
      // materialized, so DROP alone leaves the managed location on
      // disk and CREATE then refuses it — clear the location too
      val p = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), t)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    Tables.orders(s, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.saveAsTable("cbo_orders")
    Tables.lineitem(s, sfDir)
      .select("l_orderkey", "l_extendedprice")
      .write.saveAsTable("cbo_lineitem")
    Tables.customer(s, sfDir)
      .select("c_custkey", "c_acctbal")
      .write.saveAsTable("cbo_customer")
    Seq("cbo_orders", "cbo_lineitem", "cbo_customer").foreach(t =>
      s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
    val conf = s.conf
    val saved = Seq("spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.cbo.enabled", "true")
      conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val q = s.sql(
        """SELECT sum(l_extendedprice) AS rev
          |FROM cbo_lineitem
          |JOIN cbo_orders ON l_orderkey = o_orderkey
          |JOIN cbo_customer ON o_custkey = c_custkey
          |WHERE c_acctbal > 9000""".stripMargin)
      val joins = q.queryExecution.optimizedPlan.collect {
        case j: Join => j }
      assert(joins.size == 2, q.queryExecution.optimizedPlan.toString)
      // the INNERMOST join (no Join beneath it) must pair orders with
      // the filtered customer dim — lineitem waits for the pruned side
      val innermost = joins.filter(j =>
        j.children.forall(c => c.collect { case jj: Join => jj }.isEmpty))
      assert(innermost.nonEmpty)
      val tables = innermost.map(j => leafTables(j)).head
      assert(tables == Set("cbo_orders", "cbo_customer"),
        s"innermost join over $tables\n" +
          q.queryExecution.optimizedPlan.toString.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
