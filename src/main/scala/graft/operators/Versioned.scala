package graft.operators

import java.io.File
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Scalars._
import graft.streaming.StreamStats.RecordedQuery

/** Manifest-versioned parquet table with time-travel reads — the
  * production form of the reference's blob housekeeping
  * (`Azure_datalake_etl/Gonukkad_Merchants.py:144-155`, which "versions"
  * snapshots by renaming every older blob so only the newest stays
  * load-eligible). Instead of mutating history, every commit writes an
  * immutable data directory and then PUBLISHES it with a one-file
  * manifest; readers resolve the manifest log, never the data listing.
  *
  * Layout:
  *   <table>/data/v=N/            immutable per-version parquet data
  *   <table>/_manifest/N          commit marker (created atomically
  *                                with create-no-overwrite; its
  *                                EXISTENCE is the commit)
  *
  * Correctness/scale properties:
  *  - The data write is a normal distributed parquet job; the publish
  *    is one driver-side file create — the commit point is atomic and
  *    O(1) regardless of data size.
  *  - A failed/partial data write is invisible (no manifest); a retry
  *    writes a fresh nonce directory and publishes that — it never
  *    touches the failed attempt's files.
  *  - Readers pin a version at resolve time, so a concurrent commit
  *    never changes a running query's input (snapshot isolation).
  *  - Listing cost is O(versions) manifest files, independent of data
  *    volume; `vacuum` bounds history (and is the ONLY deletion path —
  *    it also garbage-collects orphan data dirs left by commits that
  *    died between the data write and the manifest create, gated on a
  *    modification-time grace window so an in-flight commit's
  *    not-yet-published directory is never mistaken for garbage).
  */
object Versioned {

  private def hfs(s: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending (empty for a fresh/absent table). */
  def versions(s: SparkSession, table: String): Seq[Int] = {
    val dir = new Path(s"$table/_manifest")
    val fs = hfs(s, table)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.forall(_.isDigit))
      .map(_.toInt)
      .sorted
  }

  /** Write `df` as the table's next version and publish it. Returns
    * the committed version number.
    *
    * Race safety: each attempt writes to a UNIQUE data directory
    * (version + attempt nonce) and the manifest records that path —
    * two writers racing to the same version number can never clobber
    * each other's files; exactly one manifest publish succeeds, the
    * loser's orphan directory is deleted on the failure path (and is
    * invisible regardless, since readers resolve paths only through
    * manifests).
    *
    * The publish primitive matters: `fs.create(path, overwrite=false)`
    * is atomic on HDFS but check-then-create on RawLocalFileSystem and
    * most object-store connectors — two racers could both "succeed".
    * So the manifest is written to a nonce temp file and PROMOTED with
    * an atomic no-replace primitive: hard-link creation for `file://`
    * (link(2) is atomic and fails EEXIST on conflict) and
    * rename-no-replace elsewhere (atomic on HDFS, where rename to an
    * existing destination returns false). Connectors with non-atomic
    * rename (older S3A) need an external lock — documented limit.
    */
  def commit(df: DataFrame, table: String): Int = {
    val s = df.sparkSession
    val v = versions(s, table).lastOption.getOrElse(0) + 1
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"data/v=$v-$nonce"
    df.write.parquet(s"$table/$dataDir")
    val fs = hfs(s, table)
    try publish(fs, table, v, nonce, s"""{"version":$v,"path":"$dataDir"}""")
    catch { case e: Throwable =>
      fs.delete(new Path(s"$table/$dataDir"), true)
      throw e
    }
    v
  }

  /** Optimistic-concurrency commit — the table-format multi-writer
    * loop (Delta/Iceberg commit retry). The data write happens ONCE
    * into a version-free nonce directory; on a lost race (another
    * writer published our target version between our head read and
    * our publish) only the O(1) manifest publish re-resolves the head
    * and retries — the distributed write is never repeated, and every
    * retry publishes the same immutable data path. `maxRetries`
    * bounds livelock under pathological contention; data is cleaned
    * up only when the commit is abandoned for good.
    */
  def commitRetry(df: DataFrame, table: String, maxRetries: Int = 10): Int = {
    val s = df.sparkSession
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"data/c-$nonce"
    df.write.parquet(s"$table/$dataDir")
    val fs = hfs(s, table)
    var attempt = 0
    while (true) {
      val v = versions(s, table).lastOption.getOrElse(0) + 1
      try {
        publish(fs, table, v, s"$nonce-$attempt",
          s"""{"version":$v,"path":"$dataDir"}""")
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException
            if attempt < maxRetries => attempt += 1
        case e: Throwable =>
          fs.delete(new Path(s"$table/$dataDir"), true)
          throw e
      }
    }
    -1 // unreachable: the loop returns or throws
  }

  /** Idempotent per-batch commit — the exactly-once contract a
    * streaming `foreachBatch` sink needs on top of the versioned
    * table: version = batchId + 1, so a REPLAYED batch (restart from
    * checkpoint, speculative re-run) finds its version already
    * committed and does nothing — not even the data write (checked
    * BEFORE writing, so replays cost one manifest listing, not a
    * distributed job; a publish race after the check still loses
    * cleanly on the atomic no-replace and removes its orphan).
    * Deterministic source + this sink = exactly-once end to end.
    * Returns true when this call committed the version.
    */
  def commitBatch(df: DataFrame, table: String, batchId: Long): Boolean = {
    val s = df.sparkSession
    val v = batchId.toInt + 1
    if (versions(s, table).contains(v)) return false // replay — done
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"data/b$batchId-$nonce"
    df.write.parquet(s"$table/$dataDir")
    val fs = hfs(s, table)
    try {
      publish(fs, table, v, nonce, s"""{"version":$v,"path":"$dataDir"}""")
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        fs.delete(new Path(s"$table/$dataDir"), true) // lost the race
        false
    }
  }

  /** The driver-checked exactly-once streaming ingest: the feed
    * drained by AvailableNow, each microbatch committed as version
    * batchId+1 via commitBatch, the result read back as the union of
    * ALL committed versions — every feed row lands in exactly one
    * version, so the rollup matches the generator replay even under
    * batch replays (VersionedStreamSpec re-fires a batch and proves
    * no duplicate version and no double-counted rows).
    */
  def streamVersionedIngest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    val base =
      s"/tmp/graft_streams/${new File(dir).getName}/versioned_ingest"
    val fs = hfs(s, base)
    fs.delete(new Path(base), true)
    val table = s"$base/table"
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 3000)
      .option("rowsPerTrigger", 1000) // 3 committed versions
      .option("partitionsPerBatch", 4)
      .load()
    feed.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row],
          id: Long) =>
        commitBatch(batch, table, id): Unit
      }
      .start()
      .drainRecorded()
    val all = versions(s, table)
      .map(v => read(s, table, Some(v)))
      .reduce(_ unionByName _)
    all.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_events"),
        moneySum(col("amount")).as("total_amount"))
      .orderBy("kind")
  }

  /** DELETE as a new version — the tombstone/right-to-erasure path a
    * versioned table needs: rows matching `pred` are rewritten away
    * into version N+1 (copy-on-write, one distributed scan+filter);
    * version N still serves time-travel reads until `vacuum` retires
    * it, which is when the erasure becomes physical. SQL DELETE
    * semantics on the predicate: a row is removed only when `pred` is
    * TRUE — FALSE and NULL rows survive. At 100 TB the rewrite is one
    * pass over the table; a file-skipping manifest (sources/
    * SkippingIndex) would confine it to files whose min/max overlap
    * the predicate, and a deletion-vector design would avoid the
    * rewrite entirely — both compose with this commit protocol since
    * a version is just a manifest pointing at immutable data.
    */
  def delete(s: SparkSession, table: String, pred: Column): Int = {
    val kept = read(s, table).filter(!coalesce(pred, lit(false)))
    commit(kept, table)
  }

  /** The driver-checked DELETE query: snapshot customers as v1,
    * apply an erasure-request batch (every key ≡ 3 mod 10) as v2,
    * return the post-delete table. The oracle replays the surviving
    * predicate over the raw table; VersionedSpec proves v1 still
    * contains the erased rows (time-travel) until vacuum.
    */
  def versionedDelete(s: SparkSession, dir: String): DataFrame = {
    val table = s"/tmp/graft_sinks/${new File(dir).getName}/versioned_delete"
    hfs(s, table).delete(new Path(table), true) // fresh run, idempotent
    val snap = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    commit(snap, table)
    delete(s, table, col("c_custkey") % 10 === 3)
    read(s, table).orderBy("c_custkey")
  }

  /** Atomically publish manifest `v`; throws (leaving no temp debris)
    * if `v` is already committed — exactly one racer returns.
    */
  private[operators] def publish(fs: FileSystem, table: String, v: Int,
      nonce: String, body: String): Unit = {
    val tmp = new Path(s"$table/_manifest/.tmp-$v-$nonce")
    val dst = new Path(s"$table/_manifest/$v")
    try {
      val out = fs.create(tmp, true)
      try out.writeBytes(body)
      finally out.close()
      if (fs.getScheme == "file") {
        // atomic no-replace on POSIX: link(2); EEXIST = lost the race
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath),
          java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath))
        fs.delete(tmp, false)
      } else if (!fs.rename(tmp, dst)) {
        throw new java.nio.file.FileAlreadyExistsException(
          s"version $v already committed at $table")
      }
    } catch { case e: Throwable =>
      fs.delete(tmp, false)
      throw e
    }
  }

  private def pathOf(s: SparkSession, table: String, v: Int): String = {
    val in = hfs(s, table).open(new Path(s"$table/_manifest/$v"))
    val body = try scala.io.Source.fromInputStream(in).mkString
      finally in.close()
    """"path":"([^"]+)"""".r.findFirstMatchIn(body)
      .map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"malformed manifest $v at $table: $body"))
  }

  /** Read the table at `asOf` (must be committed), or latest. */
  def read(s: SparkSession, table: String, asOf: Option[Int] = None)
      : DataFrame = {
    val vs = versions(s, table)
    require(vs.nonEmpty, s"no committed versions at $table")
    val v = asOf.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not committed (have $vs)")
    s.read.parquet(s"$table/${pathOf(s, table, v)}")
  }

  /** Compact the LATEST version into `targetFiles` files, committed
    * as a NEW version — table-format OPTIMIZE: readers never see a
    * half-rewritten layout (the rewrite is just another snapshot),
    * old small-file versions age out through `vacuum`. Returns the
    * new version number. coalesce (not repartition): compaction must
    * not pay a shuffle to merge files.
    */
  def optimize(s: SparkSession, table: String, targetFiles: Int): Int =
    commit(read(s, table).coalesce(math.max(1, targetFiles)), table)

  /** Drop all but the newest `keep` versions: resolve the data path,
    * retract the manifest FIRST (readers stop resolving the version),
    * then delete data. Returns the vacuumed version numbers.
    *
    * Also reclaims ORPHANS — data directories no surviving manifest
    * references, left behind when a commit dies between its data
    * write and its manifest create (the driver crashing there leaves
    * the files with no in-process catch to clean them). Without this,
    * repeated failed commits accumulate unbounded garbage that no
    * reader can ever see but every storage bill pays for. A directory
    * is only treated as an orphan once its modification time is older
    * than `orphanGraceMs`, so a LIVE commit's data dir (written,
    * manifest a moment away) is never collected — the same
    * retention-window discipline table formats use for their vacuum.
    */
  def vacuum(s: SparkSession, table: String, keep: Int,
      orphanGraceMs: Long = 24L * 3600 * 1000): Seq[Int] = {
    val doomed = versions(s, table).dropRight(math.max(1, keep))
    val fs = hfs(s, table)
    doomed.foreach { v =>
      val p = pathOf(s, table, v)
      fs.delete(new Path(s"$table/_manifest/$v"), false)
      fs.delete(new Path(s"$table/$p"), true)
    }
    // orphan GC: anything under data/ that the surviving manifests
    // don't reference and that is older than the grace window
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    val live = versions(s, table).map(v => pathOf(s, table, v)).toSet
    val dataRoot = new Path(s"$table/data")
    if (fs.exists(dataRoot)) {
      fs.listStatus(dataRoot).foreach { st =>
        val rel = s"data/${st.getPath.getName}"
        if (!live.contains(rel) && st.getModificationTime < cutoff)
          fs.delete(st.getPath, true)
      }
    }
    // stale publish temps (a writer that died between its temp write
    // and the promote) age out under the same grace window
    val manRoot = new Path(s"$table/_manifest")
    if (fs.exists(manRoot)) {
      fs.listStatus(manRoot).foreach { st =>
        if (st.getPath.getName.startsWith(".tmp-") &&
            st.getModificationTime < cutoff)
          fs.delete(st.getPath, false)
      }
    }
    doomed
  }

  /** MERGE INTO the versioned table: read the LATEST snapshot, apply
    * a keyed I/U/D change batch in one full-outer join (the MERGE
    * execution shape after pruning — see Pipelines.mergeCdc), and
    * commit the result as a NEW version. This is the ACID upsert
    * story the reference's rewrite-in-place can't give: readers
    * pinned to version N are untouched, N+1 appears atomically at
    * manifest publish, a failed merge leaves nothing referenced.
    *
    * `changes` convention: the merge key column, an `op` column
    * (I/U/D), and one `c_<col>` column per target data column
    * (null = keep current value).
    */
  def mergeInto(s: SparkSession, table: String, changes: DataFrame,
      key: String): Int = {
    val cur = read(s, table)
    val dataCols = cur.columns.filterNot(_ == key)
    val merged = cur.join(changes, Seq(key), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col(key) +: dataCols.map(c =>
        coalesce(col(s"c_$c"), col(c)).as(c)): _*)
    commit(merged, table)
  }

  /** Driver-checked query: two commits of the orders snapshot (v1 =
    * pre-1996 history, v2 = full), then one read AS-OF v1 and one of
    * the latest — proving the older version stays byte-stable after a
    * newer commit (the reference's rename pass destroys exactly this).
    * Output: one aggregate row per version, oracle-replayable from
    * the base table because each version is a pure filter of it.
    */
  /** Driver-checked MERGE query: commit the orders snapshot as v1,
    * mergeInto the SAME I/U/D batch as p_merge_cdc (shared builder) →
    * v2, read v2 back. Result must equal the plain full-outer merge —
    * proving the versioned write→publish→read round trip preserves
    * MERGE semantics — while v1 stays readable underneath (the spec
    * layer covers isolation; the shared oracle covers values).
    */
  def versionedMerge(s: SparkSession, dir: String): DataFrame = {
    val table = s"/tmp/graft_sinks/${new File(dir).getName}/versioned_merge"
    hfs(s, table).delete(new Path(table), true) // fresh run, idempotent
    val snap = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    commit(snap, table)
    val changes = Pipelines.cdcChanges(snap)
      .select(col("o_orderkey"), col("op"),
        col("c_status").as("c_o_orderstatus"),
        col("c_total").as("c_o_totalprice"))
    mergeInto(s, table, changes, "o_orderkey")
    read(s, table).orderBy("o_orderkey")
  }

  /** Change data feed between two versions — the "what changed since
    * version N" read Delta/Iceberg expose as CDF, composed from this
    * table's own primitives: commit v1, MERGE to v2, then diff
    * read(asOf=1) against read(latest) with a key-equi full outer
    * join and row-local classification (absent-old → insert,
    * absent-new → delete, value drift → update; unchanged rows never
    * leave the join). Downstream incremental consumers (the
    * mv_incremental_refresh shape) get exactly the rows to reprocess
    * without scanning either snapshot twice — and unlike a log-based
    * CDF, this reconstruction works between ANY two versions. The
    * oracle rebuilds v2 from the deterministic change law and
    * re-derives the identical diff.
    */
  def changeFeed(s: SparkSession, dir: String): DataFrame = {
    val table = s"/tmp/graft_sinks/${new File(dir).getName}/versioned_cdf"
    hfs(s, table).delete(new Path(table), true) // fresh run, idempotent
    val snap = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    commit(snap, table)
    mergeInto(s, table, Pipelines.cdcChanges(snap)
      .select(col("o_orderkey"), col("op"),
        col("c_status").as("c_o_orderstatus"),
        col("c_total").as("c_o_totalprice")),
      "o_orderkey")
    val old = read(s, table, asOf = Some(1))
      .select(col("o_orderkey"), col("o_orderstatus").as("old_status"),
        col("o_totalprice").as("old_total"), lit(true).as("in_old"))
    val neu = read(s, table)
      .select(col("o_orderkey"), col("o_orderstatus").as("new_status"),
        col("o_totalprice").as("new_total"), lit(true).as("in_new"))
    old.join(neu, Seq("o_orderkey"), "full_outer")
      .filter(col("in_old").isNull || col("in_new").isNull ||
        !(col("old_status") <=> col("new_status")) ||
        !(col("old_total") <=> col("new_total")))
      .select(col("o_orderkey"),
        when(col("in_old").isNull, "insert")
          .when(col("in_new").isNull, "delete")
          .otherwise("update").as("change_type"),
        col("old_status"), col("new_status"),
        col("old_total"), col("new_total"))
      .orderBy("o_orderkey")
  }

  def timeTravel(s: SparkSession, dir: String): DataFrame = {
    val table = s"/tmp/graft_sinks/${new File(dir).getName}/versioned_orders"
    hfs(s, table).delete(new Path(table), true) // fresh run, idempotent
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    commit(orders.filter(col("o_orderdate") < lit("1996-01-01")
      .cast("timestamp")), table)
    commit(orders, table)
    def rollup(df: DataFrame, v: Int): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        moneySum(col("o_totalprice")).as("total_price"))
        .select(lit(v).as("version"), col("n_rows"), col("total_price"))
    rollup(read(s, table, asOf = Some(1)), 1)
      .unionByName(rollup(read(s, table), 2))
      .orderBy("version")
  }
}
