package graft.streaming

import java.io.File

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSpec
import graft.operators.Versioned

/** The crash-recovery drill the round-7 verdict asked for: exactly-once
  * was pinned by REPLAYING a batch through the idempotent sink, but no
  * test killed a stream mid-drain and RESTARTED it from the
  * checkpoint — the failure a production user hits first. Both drills
  * inject a crash AFTER the batch's side effect lands but BEFORE the
  * engine records the batch complete (a throw inside foreachBatch —
  * the worst-case window: the restart MUST replay that batch), then
  * restart from the same checkpoint and demand the final table equal
  * the uninterrupted run's.
  */
class CrashRecoverySpec extends SparkSpec {

  private def cleanBase(name: String): String = {
    val base = s"/tmp/graft_streams/crash_drill/$name"
    val p = new Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    new File(base).getParentFile.mkdirs()
    base
  }

  private def feed(totalRows: Int, perTrigger: Int) =
    spark.readStream.format("graft.sources.FeedSource")
      .option("totalRows", totalRows)
      .option("rowsPerTrigger", perTrigger)
      .option("partitionsPerBatch", 4)
      .load()

  test("versioned ingest: crash after batch-0's commit; checkpoint " +
    "restart replays it idempotently — exactly-once end to end") {
    val base = cleanBase("versioned")
    val table = s"$base/table"
    def drain(injectCrash: Boolean): Unit = {
      val q = feed(3000, 1000).writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          Versioned.commitBatch(batch, table, id): Unit
          // the commit has LANDED; the engine has not yet marked the
          // batch complete — the restart must re-fire batch `id`
          if (injectCrash && id == 0)
            throw new RuntimeException("injected crash")
        }
        .start()
      q.awaitTermination()
    }
    intercept[StreamingQueryException](drain(injectCrash = true))
    // the crashed run committed version 1 (batch 0) and nothing else
    assert(Versioned.versions(spark, table) == Seq(1))
    drain(injectCrash = false) // restart from the SAME checkpoint
    // batch 0 replayed into its already-committed version (commitBatch
    // returned false), batches 1-2 committed fresh: versions 1,2,3
    assert(Versioned.versions(spark, table) == Seq(1, 2, 3))
    val all = Versioned.versions(spark, table)
      .map(v => Versioned.read(spark, table, Some(v)))
      .reduce(_ unionByName _)
    // every feed row in exactly one version: no loss, no duplication
    assert(all.count() == 3000)
    assert(all.select(countDistinct(col("id"))).head.getLong(0) == 3000)
  }

  test("append-mode session windows: crash after a batch's sink write; " +
    "checkpoint restart replays it idempotently and the emitted session " +
    "set equals an uninterrupted run's — emit-exactly-once for the one " +
    "streaming contract the first three drills didn't cover") {
    val base = cleanBase("sessions")
    import org.apache.spark.sql.functions.session_window
    // the feedSessions shape: multiplicative-hash user key (real
    // pseudo-random per-user gaps), 2-hour session windows, append
    // mode so a session emits exactly once — when the watermark
    // proves it closed
    def sessions = feed(5000, 1000)
      .withColumn("user_id",
        (col("id") * lit(2654435761L)) % lit(100000L) % lit(101L))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "2 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
    def drain(tag: String, injectCrash: Boolean): Unit = {
      val q = sessions.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$base/$tag/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          // IDEMPOTENT append sink: one directory per batch id,
          // overwritten on replay — the plain mode("append") of the
          // production query would double the replayed batch's rows,
          // which is exactly what this drill exists to catch
          batch.write.mode("overwrite").parquet(s"$base/$tag/table/batch=$id")
          // sink effect has LANDED; the engine has not yet marked the
          // batch complete — the restart must re-fire this batch
          if (injectCrash && id == 1)
            throw new RuntimeException("injected crash")
        }
        .start()
      q.awaitTermination()
    }
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      intercept[StreamingQueryException](drain("crashed", injectCrash = true))
      drain("crashed", injectCrash = false) // resume from the SAME ckpt
      drain("clean", injectCrash = false) // uninterrupted reference run
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedParts)
    def emitted(tag: String) = spark.read.parquet(s"$base/$tag/table")
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3)))
    val crashed = emitted("crashed")
    val clean = emitted("clean")
    // no silent vacuity: the drill must cover real emissions, and the
    // crash-restart run must emit each closed session EXACTLY once
    assert(clean.nonEmpty, "reference run emitted no sessions")
    assert(crashed.length == clean.length,
      s"${crashed.length} emitted vs ${clean.length} uninterrupted")
    assert(crashed.toSet == clean.toSet)
  }

  test("running distinct (transformWithState/RocksDB): crash after " +
    "batch-0's sink write; checkpoint restart resumes the KMV state " +
    "and converges to the exact distinct counts") {
    val base = cleanBase("distinct")
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val savedProvider = spark.conf.getOption(providerKey)
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    def pairs = feed(5000, 1000)
      .select(col("kind"),
        ((col("id") * lit(2654435761L)) % lit(100000L) % lit(101L))
          .as("user_id"))
      .as[(String, Long)]
    def drain(injectCrash: Boolean): Unit = {
      val q = StreamingAnalogs.runningDistinctTws(pairs)
        .toDF("kind", "n_users").writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kind")
            .parquet(s"$base/table")
          if (injectCrash && id == 0)
            throw new RuntimeException("injected crash")
        }
        .start()
      q.awaitTermination()
    }
    try {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      intercept[StreamingQueryException](drain(injectCrash = true))
      drain(injectCrash = false) // resume: state restored, batch 0 replays
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      savedProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    val got = spark.read.parquet(s"$base/table")
      .select(col("kind"), col("n_users")).orderBy("kind")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ground truth: the generator's formula replayed in batch
    // (FeedSource is streaming-only; its row law is id ∈ [0, 5000),
    // kind = id%3==0 ? credit : debit) — k=1024 > the 101-user
    // domain, so the sketch is in its exact regime and a restart that
    // lost or double-applied state cannot match
    val expect = spark.range(0, 5000)
      .select(when(col("id") % 3 === 0, lit("credit"))
        .otherwise(lit("debit")).as("kind"),
        ((col("id") * lit(2654435761L)) % lit(100000L) % lit(101L))
          .as("user_id"))
      .groupBy("kind").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect, s"got $got expected $expect")
  }

  test("heavy hitters (transformWithState/RocksDB): crash after " +
    "batch-0's sink write; checkpoint restart resumes the MG counter " +
    "map and drains to the same candidate set as an uninterrupted run") {
    val base = cleanBase("hh")
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val savedProvider = spark.conf.getOption(providerKey)
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    val h = (col("id") * lit(2654435761L)) % lit(100000L)
    val tok = concat(lit("t"), when(h % 4 =!= 0, h % 16)
      .otherwise(lit(16) + h % 499).cast("string"))
    def keyed = feed(5000, 1000)
      .select(col("kind"), tok.as("token"), col("id"))
      .as[(String, String, Long)]
    def drain(tag: String, injectCrash: Boolean): Unit = {
      val q = StreamingAnalogs.heavyHittersTws(keyed)
        .toDF("kind", "token", "est").writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/$tag/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kind")
            .parquet(s"$base/$tag/table")
          if (injectCrash && id == 0)
            throw new RuntimeException("injected crash")
        }
        .start()
      q.awaitTermination()
    }
    try {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      intercept[StreamingQueryException](drain("crashed", injectCrash = true))
      drain("crashed", injectCrash = false) // resume: MG map restored
      drain("clean", injectCrash = false) // uninterrupted reference
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      savedProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    def counters(tag: String) = spark.read.parquet(s"$base/$tag/table")
      .select(col("kind"), col("token"), col("est"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val crashed = counters("crashed")
    val clean = counters("clean")
    // MG state is order-sensitive, so a lost or double-applied batch 0
    // shifts the counter VALUES, not just membership — set equality on
    // (kind, token, est) is the strictest possible restart check
    assert(clean.nonEmpty)
    assert(crashed == clean,
      s"diverged: only-crashed=${crashed -- clean} only-clean=${clean -- crashed}")
  }

  test("quantile sketch (transformWithState/RocksDB): crash after " +
    "batch-0's sink write; checkpoint restart resumes the histogram " +
    "bins and drains to the exact full-stream estimates") {
    val base = cleanBase("quant")
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val savedProvider = spark.conf.getOption(providerKey)
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    def cents = feed(5000, 1000)
      .select(col("kind"),
        ((col("id") * lit(2654435761L)) % lit(100000L)).as("cents"))
      .as[(String, Long)]
    def drain(injectCrash: Boolean): Unit = {
      val q = StreamingAnalogs.quantileSketchTws(cents)
        .toDF("kind", "n_events", "p50", "p95").writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kind")
            .parquet(s"$base/table")
          if (injectCrash && id == 0)
            throw new RuntimeException("injected crash")
        }
        .start()
      q.awaitTermination()
    }
    try {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      intercept[StreamingQueryException](drain(injectCrash = true))
      drain(injectCrash = false) // resume: bins restored, batch 0 replays
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      savedProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    val got = spark.read.parquet(s"$base/table")
      .select(col("kind"), col("n_events"), col("p50"), col("p95"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // ground truth: exact generator replay through the same bin-edge
    // read-off — a lost batch shifts n_events, a double-applied one
    // shifts bin counts (and with them possibly the rank bin)
    val expect = spark.range(0, 5000)
      .select(when(col("id") % 3 === 0, lit("credit"))
        .otherwise(lit("debit")).as("kind"),
        ((col("id") * lit(2654435761L)) % lit(100000L)).as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, xs) =>
        val vs = xs.map(_._2).sorted
        val n = vs.length.toLong
        def est(frac: Double) = {
          val rank = math.floor(n * frac + (1 - frac)).toInt
          (math.min(vs(rank - 1) / 400, 255) + 1) * 400
        }
        k -> ((n, est(0.5), est(0.95)))
      }
    assert(got == expect, s"got $got expected $expect")
  }

  test("weighted reservoir (transformWithState/RocksDB): crash after " +
    "batch-0's sink write; checkpoint restart resumes the A-ES buffer " +
    "and drains to the exact full-stream sample") {
    val base = cleanBase("wsample")
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val savedProvider = spark.conf.getOption(providerKey)
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    val u = (pmod(col("id") * lit(2654435761L), lit(4294967296L))
      .cast("double") + lit(1.0)) / lit(4294967297.0)
    val w = greatest(((col("id") * lit(2654435761L)) % lit(100000L))
      .cast("double") / lit(100.0), lit(1e-6))
    def keyed = feed(5000, 1000)
      .select(col("kind"), col("id"), (log(u) / w).as("es_key"))
      .as[(String, Long, Double)]
    def drain(injectCrash: Boolean): Unit = {
      val q = StreamingAnalogs.weightedReservoirTws(keyed)
        .toDF("kind", "rk", "id").writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kind")
            .parquet(s"$base/table")
          if (injectCrash && id == 0)
            throw new RuntimeException("injected crash")
        }
        .start()
      q.awaitTermination()
    }
    try {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      intercept[StreamingQueryException](drain(injectCrash = true))
      drain(injectCrash = false) // resume: buffer restored, batch 0 replays
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      savedProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    val got = spark.read.parquet(s"$base/table")
      .select(col("kind"), col("rk"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // ground truth: the batch A-ES sample over the replayed generator.
    // A restart that lost the buffer (sampling only batches 1-4) or
    // double-applied batch 0 (ids can't duplicate — the buffer would
    // hold batch-0 ids twice, displacing true members) cannot match.
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("kind")
      .orderBy(col("es_key").desc, col("id"))
    val expect = spark.range(0, 5000)
      .select(when(col("id") % 3 === 0, lit("credit"))
        .otherwise(lit("debit")).as("kind"), col("id"),
        (log(u) / w).as("es_key"))
      .select(col("kind"), row_number().over(win).cast("long").as("rk"),
        col("id"))
      .filter(col("rk") <= 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expect)
  }

  test("running EWMA (transformWithState/RocksDB): crash after " +
    "batch-0's sink write; checkpoint restart resumes the level and " +
    "the drained double is BIT-IDENTICAL to the full id-ordered fold") {
    val base = cleanBase("ewma")
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val savedProvider = spark.conf.getOption(providerKey)
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    def keyed = feed(5000, 1000)
      .select(col("kind"), col("id"),
        ((col("id") * lit(2654435761L)) % lit(100000L)).cast("double")
          .as("cents"))
      .as[(String, Long, Double)]
    def drain(injectCrash: Boolean): Unit = {
      val q = StreamingAnalogs.runningEwmaTws(keyed)
        .toDF("kind", "ewma").writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kind")
            .parquet(s"$base/table")
          if (injectCrash && id == 0)
            throw new RuntimeException("injected crash")
        }
        .start()
      q.awaitTermination()
    }
    try {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      intercept[StreamingQueryException](drain(injectCrash = true))
      drain(injectCrash = false) // resume: level restored, batch 0 replays
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      savedProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    val got = spark.read.parquet(s"$base/table")
      .select(col("kind"), col("ewma"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // ground truth: the full per-kind id-ordered fold. A restart that
    // lost the level OR double-applied batch 0 shifts the double —
    // equality is BITWISE, the sharpest recovery assertion available
    val expect = (0L until 5000L)
      .map(id => (if (id % 3 == 0) "credit" else "debit",
        ((id * 2654435761L) % 100000L).toDouble))
      .groupBy(_._1)
      .map { case (k, xs) =>
        k -> xs.map(_._2).foldLeft(0.0)((acc, x) => acc / 2 + x)
      }
    assert(got == expect, s"$got != $expect")
  }

  test("running CUSUM (transformWithState/RocksDB): crash after " +
    "batch-0's sink write; restart resumes (s, peak, peakId, n) and " +
    "the drained statistics equal the full-stream integer fold") {
    val base = cleanBase("cusum")
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val savedProvider = spark.conf.getOption(providerKey)
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    def keyed = feed(5000, 1000)
      .select(col("kind"), col("id"),
        ((col("id") * lit(2654435761L)) % lit(100000L)).as("cents"))
      .as[(String, Long, Long)]
    def drain(injectCrash: Boolean): Unit = {
      val q = StreamingAnalogs.runningCusumTws(keyed, 50000L)
        .toDF("kind", "n_events", "cusum", "cusum_peak", "peak_id")
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kind")
            .parquet(s"$base/table")
          if (injectCrash && id == 0)
            throw new RuntimeException("injected crash")
        }
        .start()
      q.awaitTermination()
    }
    try {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      intercept[StreamingQueryException](drain(injectCrash = true))
      drain(injectCrash = false) // resume: state restored, batch 0 replays
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      savedProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    val got = spark.read.parquet(s"$base/table")
      .select(col("kind"), col("n_events"), col("cusum"),
        col("cusum_peak"), col("peak_id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // ground truth: the full per-kind id-ordered integer fold. A lost
    // or double-applied batch shifts the EXACT integers — n doubles,
    // s/peak drift — so plain equality is the recovery assertion
    val expect = (0L until 5000L)
      .map(id => (if (id % 3 == 0) "credit" else "debit", id,
        (id * 2654435761L) % 100000L))
      .groupBy(_._1)
      .map { case (k, xs) =>
        var s = 0L; var peak = Long.MinValue; var peakId = -1L
        xs.sortBy(_._2).foreach { case (_, id, x) =>
          s = math.max(0L, s + x - 50000L)
          if (s > peak) { peak = s; peakId = id }
        }
        k -> ((xs.size.toLong, s, peak, peakId))
      }
    assert(got == expect, s"$got != $expect")
  }

  test("watermark dedup: crash after batch-1's sink write; checkpoint " +
    "restart restores the seen-id state, so a slower source's LATER " +
    "duplicates of pre-crash ids are still dropped") {
    val base = cleanBase("dedup")
    // two copies of the generator at DIFFERENT pacing: the fast
    // source's id arrives batches before the slow source's duplicate,
    // so dedup depends on state SURVIVING across batches — and across
    // the crash. A restart that lost the state would pass the slow
    // copies through as fresh rows. 2000 rows = 33 h of event time,
    // inside the 2-day watermark: no row ever ages out of state, so
    // the only correct output is each id exactly once.
    def doubled = feed(2000, 1000).union(
      spark.readStream.format("graft.sources.FeedSource")
        .option("totalRows", 2000)
        .option("rowsPerTrigger", 400)
        .option("partitionsPerBatch", 4)
        .load())
      .withWatermark("ts", "2 days")
      .dropDuplicatesWithinWatermark("id")
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    def drain(injectCrash: Boolean): Unit = {
      val q = doubled.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          batch.write.mode("overwrite").parquet(s"$base/table/batch=$id")
          if (injectCrash && id == 1)
            throw new RuntimeException("injected crash")
        }
        .start()
      q.awaitTermination()
    }
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      intercept[StreamingQueryException](drain(injectCrash = true))
      drain(injectCrash = false) // resume: seen-ids restored, batch 1 replays
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedParts)
    val ids = spark.read.parquet(s"$base/table")
      .select(col("id")).collect().map(_.getLong(0))
    assert(ids.length == 2000,
      s"${ids.length} rows emitted — lost state re-admits duplicates " +
        "or a replayed batch double-emitted")
    assert(ids.toSet == (0L until 2000L).toSet)
  }

  test("sliding distinct (transformWithState/RocksDB MapState): crash " +
    "after batch-0's sink write; restart restores the day→sketch " +
    "ledger and the final window matches the exact recount") {
    val base = cleanBase("sliding")
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val savedProvider = spark.conf.getOption(providerKey)
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    def rows = feed(5000, 1000)
      .select(col("kind"),
        ((col("id") * lit(2654435761L)) % lit(100000L) % lit(101L))
          .as("user_id"),
        (col("id") / lit(500L)).cast("int").as("day"))
      .as[(String, Long, Int)]
    def drain(injectCrash: Boolean): Unit = {
      val q = StreamingAnalogs.slidingDistinctTws(rows)
        .toDF("kind", "day", "n_users_7d").writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kind")
            .parquet(s"$base/table")
          if (injectCrash && id == 0)
            throw new RuntimeException("injected crash")
        }
        .start()
      q.awaitTermination()
    }
    try {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      intercept[StreamingQueryException](drain(injectCrash = true))
      drain(injectCrash = false) // resume: the day ledger is restored
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      savedProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    val got = spark.read.parquet(s"$base/table")
      .select(col("kind"), col("day"), col("n_users_7d"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    // exact recount from the generator law: retained window set per
    // kind (day > max − 7) with trailing-7 windowed distinct; a
    // restart that lost a day sketch or re-applied batch 0's rows
    // into the wrong day cannot reproduce these sub-k-exact counts
    val f = spark.range(0, 5000)
      .select(when(col("id") % 3 === 0, lit("credit"))
        .otherwise(lit("debit")).as("kind"),
        ((col("id") * lit(2654435761L)) % lit(100000L) % lit(101L))
          .as("user_id"),
        (col("id") / lit(500L)).cast("int").as("day"))
    val expect = f.as("k").select(col("kind"), col("day")).distinct()
      .join(f.groupBy("kind").agg(max(col("day")).as("mx")), "kind")
      .filter(col("day") > col("mx") - 7)
      .join(f.select(col("kind"), col("day").as("fd"), col("user_id")),
        Seq("kind"))
      .filter(col("fd") > col("day") - 7 && col("fd") <= col("day"))
      .groupBy("kind", "day")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(got == expect,
      s"missing ${(expect.keySet -- got.keySet).take(4)}, " +
        s"diff ${got.filter { case (k, v) => expect.get(k) != Some(v) }.take(4)}")
  }

  test("domain counters (transformWithState/RocksDB): crash after " +
    "batch-0's sink write; restart must not double-count the " +
    "replayed batch — final counts exactly the generator's buckets") {
    val base = cleanBase("mixture")
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val savedProvider = spark.conf.getOption(providerKey)
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    def domains = feed(5000, 1000)
      .select(when(col("id") % 10 < 5, "head")
        .when(col("id") % 10 < 8, "mid")
        .otherwise("tail").as("domain"), col("id"))
      .as[(String, Long)]
    def drain(injectCrash: Boolean): Unit = {
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val q = domains.groupByKey(_._1)
        .transformWithState(new StreamingAnalogs.DomainCountProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("kind", "n_seen").writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kind")
            .parquet(s"$base/table")
          if (injectCrash && id == 0)
            throw new RuntimeException("injected crash")
        }
        .start()
      q.awaitTermination()
    }
    try {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      intercept[StreamingQueryException](drain(injectCrash = true))
      drain(injectCrash = false)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      savedProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    // a counter is the sharpest double-application detector in the
    // family: replaying batch 0 against restored-too-new state
    // inflates head by exactly 500 — any off-by-a-batch shows
    val got = spark.read.parquet(s"$base/table")
      .select(col("kind"), col("n_seen"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("head" -> 2500L, "mid" -> 1500L, "tail" -> 1000L),
      s"got $got")
  }
}
