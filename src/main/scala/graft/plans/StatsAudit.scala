package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANALYZE-statistics audit — the fourth leg of the optimizer
  * tooling (PlanAudit lints shapes, Lineage maps columns,
  * Quality.joinCard scores the CBO's size formula; this one scores
  * the STATISTICS the formula runs on): write the table, run
  * `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS`, then hold the
  * catalog's numbers against ground truth computed from the data —
  * rowCount must be EXACT (it is a count, not an estimate), and the
  * per-column distinctCount (HLL++-based) must sit within the
  * sketch's error envelope. Stats that drift silently are how a
  * CBO picks a broadcast side that OOMs at 100 TB; this query makes
  * the drift a gated number.
  *
  * Assertion form: the ground-truth columns (actual rows, exact ndv)
  * replay in DuckDB; the catalog's estimates are engine-internal, so
  * they cross the gate as deterministic bound booleans (HLL++ with a
  * fixed relativeSD on fixed data is deterministic) — the raw
  * estimates are spec-asserted with real numbers.
  */
object StatsAudit {

  private val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority")

  def audit(s: SparkSession, dir: String,
      withEstimates: Boolean = false): DataFrame = {
    val tbl = "graft_stats_audit_orders"
    // a FRESH session's in-memory catalog doesn't know a previous
    // JVM's managed-table location — clear both catalog entry and
    // directory or saveAsTable trips LOCATION_ALREADY_EXISTS
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir") + s"/$tbl")
    loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    graft.Tables.orders(s, dir)
      .select(cols.map(col): _*)
      .write.mode("overwrite").saveAsTable(tbl)
    s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS " +
      s"FOR COLUMNS ${cols.mkString(", ")}")
    val cat = s.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
    val stats = cat.stats.getOrElse(
      sys.error("ANALYZE left no table stats"))
    val rowCount = stats.rowCount
      .getOrElse(sys.error("no rowCount stat")).toLong
    val ndvEst = cols.map(c => c -> stats.colStats.get(c)
      .flatMap(_.distinctCount).map(_.toLong)
      .getOrElse(sys.error(s"no ndv stat for $c"))).toMap
    import s.implicits._
    val est = ndvEst.toSeq.toDF("col_name", "ndv_est")
      .withColumn("stat_rows", lit(rowCount))
    val truth = s.table(tbl).agg(
      count(lit(1)).as("actual_rows"),
      countDistinct(col(cols(0))).as(s"ndv_${cols(0)}"),
      countDistinct(col(cols(1))).as(s"ndv_${cols(1)}"),
      countDistinct(col(cols(2))).as(s"ndv_${cols(2)}"))
    val truthLong = truth.select(col("actual_rows"),
      expr(s"stack(3, ${cols.map(c => s"'$c', ndv_$c").mkString(", ")})" +
        " AS (col_name, ndv_exact)"))
    val joined = truthLong.join(est, "col_name")
      .select(col("col_name"), col("actual_rows"), col("ndv_exact"),
        col("stat_rows"), col("ndv_est"))
    val out =
      if (withEstimates) joined
      else joined.select(col("col_name"), col("actual_rows"),
        col("ndv_exact"),
        (col("stat_rows") === col("actual_rows")).as("rowcount_exact"),
        // HLL++ at the default 5% relativeSD: generous 3σ envelope
        (abs(col("ndv_est") - col("ndv_exact")).cast("double") <=
          greatest(col("ndv_exact").cast("double") * 0.15, lit(2.0)))
          .as("ndv_in_envelope"))
    out.orderBy("col_name")
  }
}
