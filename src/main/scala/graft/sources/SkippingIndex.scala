package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Scalars._

/** External file-level data-skipping index — the manifest pattern every
  * table format (Iceberg, Delta) uses to plan scans at scale. Parquet
  * already skips ROW GROUPS via footer min/max, but at 100 TB a
  * selective query still pays an open+footer-read per file (100k+
  * round trips on object storage). A manifest — one row of (path,
  * min, max, rows) per data file, written once at load time — moves
  * that decision into a kilobyte-sized sidecar: query planning reads
  * the manifest, keeps only the files whose [min, max] range overlaps
  * the predicate, and hands Spark the surviving file list.
  *
  * The driver-side collect here is the PLANNING plane, not the data
  * plane: O(files) tuples of (path, two longs) — the same scale as
  * Spark's own InMemoryFileIndex listing, and exactly what Iceberg's
  * planFiles() does on the driver. Data never moves through it.
  *
  * Skipping only bites when file ranges are narrow, so the build
  * range-partitions on the indexed column first (the write-once
  * clustering discipline, same as the bucketed/zorder sinks): 16
  * files, each covering ~1/16th of the user domain → a 100-user slice
  * touches 1-2 files instead of 16.
  */
object SkippingIndex {

  private def root(dir: String) =
    s"/tmp/graft_skip/${new File(dir).getName}"

  /** Write the range-clustered copy + its manifest once per dir. */
  private def ensureIndex(s: SparkSession, dir: String): (String, String) = {
    val dataOut = s"${root(dir)}/events_by_user"
    val manOut = s"${root(dir)}/events_by_user_manifest"
    if (!new File(dataOut, "_SUCCESS").exists() ||
        !new File(manOut, "_SUCCESS").exists()) {
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        .repartitionByRange(16, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(dataOut)
      // per-file stats from the hidden _metadata column — one
      // distributed pass, no extra listing
      s.read.parquet(dataOut)
        .groupBy(col("_metadata.file_path").as("file"))
        .agg(min(col("user_id")).as("min_uid"),
          max(col("user_id")).as("max_uid"),
          count(lit(1)).as("n_rows"))
        .coalesce(1) // manifests are single small planning files
        .write.mode("overwrite").parquet(manOut)
    }
    (dataOut, manOut)
  }

  /** The data files whose [min_uid, max_uid] overlaps [lo, hi] —
    * manifest-only planning, never touches the data files.
    */
  private[graft] def prunedFiles(s: SparkSession, dir: String,
      lo: Long, hi: Long): (Seq[String], Int) = {
    val (_, manOut) = ensureIndex(s, dir)
    val man = s.read.parquet(manOut)
    val total = man.count().toInt
    val keep = man
      .filter(col("max_uid") >= lo && col("min_uid") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq
    (keep, total)
  }

  /** Hive-partitioned daily layout — the multi-file partitioned-INPUT
    * shape the single-file testdata otherwise never exercises (the
    * sinks cover the partitioned-write side). Written once per dir: 30
    * `day=YYYY-MM-DD/` directories, one file each (the repartition on
    * the partition column sends each day to one task).
    */
  private[graft] def ensurePartitioned(s: SparkSession, dir: String): String = {
    val out = s"${root(dir)}/events_by_day"
    if (!new File(out, "_SUCCESS").exists()) {
      Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(out)
    }
    out
  }

  /** Partition-pruned aggregate over the daily layout: the day
    * predicate is a PARTITION filter, so Catalyst drops the 23
    * non-matching directories at planning time and the scan never
    * opens them — SkippingIndexSpec pins files-read < files-total off
    * the executed scan's numFiles metric. This is static pruning on
    * the query's own literal (vs `adv_dpp_prune`'s runtime dynamic
    * pruning from a joined dimension).
    */
  def daySliceAgg(s: SparkSession, dir: String,
      from: String = "2024-01-05", to: String = "2024-01-11"): DataFrame = {
    val out = ensurePartitioned(s, dir)
    // partition inference reads day=YYYY-MM-DD as DateType; filter the
    // raw partition column (casting IT would block partition pruning)
    s.read.parquet(out)
      .filter(col("day").between(lit(from).cast("date"), lit(to).cast("date")))
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n_events"),
        moneySum(col("value")).as("total_value"))
      .orderBy("day")
  }

  /** Driver-checked query: a narrow user slice aggregated from ONLY
    * the manifest-surviving files. The residual predicate stays on the
    * scan (a file can cover more than the slice), so the result is
    * exact regardless of how the range boundaries fell — the oracle
    * computes the same slice from the raw events table. The [3, 7]
    * default exists at every test sf (user domains 0-14 / 0-149 /
    * 0-1499).
    */
  def userSliceAgg(s: SparkSession, dir: String,
      lo: Long = 3, hi: Long = 7): DataFrame = {
    val (files, _) = prunedFiles(s, dir, lo, hi)
    require(files.nonEmpty, "manifest pruned every file — bad index")
    s.read.parquet(files: _*)
      .filter(col("user_id").between(lo, hi))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        moneySum(col("value")).as("total_value"))
      .orderBy("user_id")
  }
}
