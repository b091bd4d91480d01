package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, max, min}

/** JDBC relational source (SURVEY.md §2.1 S2/S3): the reference's
  * primary ingest is a direct database-table read
  * (`Azure_datalake_etl/Gonukkad_Merchants.py:61` and
  * `MerchantCallBack.py:37` — pymssql cursor + `fetchall()`, the whole
  * table materialized on one client). Spark-first, the same ingest is
  * `spark.read.format("jdbc")`: predicates and the projection push
  * down INTO the database, the read splits across executors on a
  * numeric column, and nothing ever lands on the driver.
  *
  * The zero-egress container has no network database, so the backing
  * engine is embedded Derby (its jars ship with Spark) seeded from the
  * parquet testdata — which also lets the DuckDB oracle state expected
  * results from the same rows. Everything above the JDBC URL is the
  * production shape.
  */
object JdbcSource {

  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def url(dir: String) = {
    // basename + full-path digest: two sfDirs that happen to share a
    // last path segment must NOT alias to one database (the seeded
    // guard would silently serve the first dir's rows for the second).
    // SHA-256/16-hex, not String.hashCode: a 32-bit hash collision
    // between two dirs would silently reproduce exactly the failure
    // this suffix exists to prevent.
    val f = new java.io.File(dir)
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(f.getCanonicalPath.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    s"jdbc:derby:/tmp/graft_derby/${f.getName}_$h;create=true"
  }

  /** Seeded databases by URL, with the key range observed at seed
    * time (one seed per JVM run; Overwrite makes re-seeding across
    * runs safe).
    */
  @volatile private var seeded = Map.empty[String, (Long, Long)]

  private def seedSupplier(s: SparkSession, dir: String): (String, Long, Long) =
    synchronized {
      // keep derby.log (and lock files on crash recovery) out of cwd
      System.setProperty("derby.system.home", "/tmp/graft_derby")
      val u = url(dir)
      val (lo, hi) = seeded.getOrElse(u, graft.Fixtures.timed(s"derby:$dir") {
        val src = graft.Tables.supplier(s, dir)
        src.write.mode(SaveMode.Overwrite)
          .format("jdbc")
          .option("url", u)
          .option("dbtable", "supplier")
          .option("driver", Driver)
          .save()
        // real key range for the partitioned read: hardcoded bounds
        // would pile every out-of-range row into a boundary partition
        // (Spark's first/last stride is unbounded) — one task would do
        // all the work on a table whose range drifted
        val r = src.agg(min(col("s_suppkey")), max(col("s_suppkey")))
          .head()
        // min/max over zero rows are null; getLong would NPE with no
        // hint of the cause — name the actual problem instead
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"supplier table at $dir is empty — cannot derive JDBC partition bounds")
        val range = (r.getLong(0), r.getLong(1))
        seeded += u -> range
        range
      }) // Fixtures.timed: one-time seed cost -> bench fixture component
      (u, lo, hi)
    }

  /** The supplier table as a JDBC relation. Partitioned read: at real
    * scale the table splits into `numPartitions` range-parallel
    * selects on the numeric key (bounds = the observed key range) —
    * the fix for the reference's single-cursor `fetchall()`.
    */
  def supplier(s: SparkSession, dir: String): DataFrame = {
    val (u, lo, hi) = seedSupplier(s, dir)
    s.read.format("jdbc")
      .option("url", u)
      .option("dbtable", "supplier")
      .option("driver", Driver)
      .option("partitionColumn", "s_suppkey")
      .option("lowerBound", lo.toString)
      .option("upperBound", (hi + 1).toString)
      .option("numPartitions", "4")
      .load()
  }

  /** The supplier table through the DSv2 JDBC *catalog* with aggregate
    * pushdown: the per-nation rollup executes INSIDE the database —
    * the scan's `External engine query` is
    * `SELECT s_nationkey, SUM(CAST(..)), COUNT(*), MIN(..), MAX(..)
    *  GROUP BY s_nationkey` — and Spark reads back one row per group
    * instead of the whole table. At 100 TB-warehouse scale this is the
    * difference between shipping a table and shipping its answer; the
    * decimal cast rides INTO the pushed SQL, so the database's sum is
    * exact and engine-order-independent (the DuckDB oracle states the
    * same rollup over the parquet seed). Catalog name embeds the dir
    * digest: Spark caches catalog instances by name, so two sfDirs
    * must never share one.
    */
  def nationRollupPushdown(s: SparkSession, dir: String): DataFrame = {
    val (u, _, _) = seedSupplier(s, dir)
    val cat = "graftdb_" + u.split("/").last.split(";").head
      .replaceAll("[^a-zA-Z0-9]", "_")
    s.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.url", u)
    s.conf.set(s"spark.sql.catalog.$cat.driver", Driver)
    s.conf.set(s"spark.sql.catalog.$cat.pushDownAggregate", "true")
    // v1-written, unquoted → Derby stores APP.SUPPLIER upper-case
    s.sql(s"""SELECT s_nationkey,
             | CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal,
             | COUNT(*) AS n,
             | MIN(s_acctbal) AS lo,
             | MAX(s_acctbal) AS hi
             |FROM $cat.APP.SUPPLIER
             |GROUP BY s_nationkey
             |ORDER BY s_nationkey""".stripMargin)
  }
}
