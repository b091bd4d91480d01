package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
    val name = new java.io.File(dir).getName
    s"jdbc:derby:/tmp/graft_derby/$name;create=true"
  }

  /** sfDirs whose Derby database already holds the seeded table (one
    * seed per JVM run; Overwrite makes re-seeding across runs safe).
    */
  @volatile private var seeded = Set.empty[String]

  private def seedSupplier(s: SparkSession, dir: String): String =
    synchronized {
      // keep derby.log (and lock files on crash recovery) out of cwd
      System.setProperty("derby.system.home", "/tmp/graft_derby")
      val u = url(dir)
      if (!seeded.contains(u)) {
        graft.Tables.supplier(s, dir)
          .write.mode(SaveMode.Overwrite)
          .format("jdbc")
          .option("url", u)
          .option("dbtable", "supplier")
          .option("driver", Driver)
          .save()
        seeded += u
      }
      u
    }

  /** The supplier table as a JDBC relation. Partitioned read: at real
    * scale the table splits into `numPartitions` range-parallel
    * selects on the numeric key — the fix for the reference's
    * single-cursor `fetchall()`.
    */
  def supplier(s: SparkSession, dir: String): DataFrame =
    s.read.format("jdbc")
      .option("url", seedSupplier(s, dir))
      .option("dbtable", "supplier")
      .option("driver", Driver)
      .option("partitionColumn", "s_suppkey")
      .option("lowerBound", "0")
      .option("upperBound", "1000000")
      .option("numPartitions", "4")
      .load()
}
