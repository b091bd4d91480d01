package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Versioned
import StreamingAnalogs.Event

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Event(ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
    Event(ts("2024-01-01 11:00:00"), 2L, "click", 2.0),
    Event(ts("2024-01-02 09:00:00"), 1L, "purchase", 3.0))
  private val batch2 = Seq(
    Event(ts("2024-01-02 12:00:00"), 3L, "view", 4.0),
    Event(ts("2024-01-03 08:00:00"), 1L, "error", 5.0))

  test("tumblingDaily over MemoryStream equals the batch aggregate") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingAnalogs.tumblingDaily(input.toDF())
      .writeStream.format("memory").queryName("st1_out")
      .outputMode("update").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      val streamed = s.table("st1_out")
        .groupBy("day_start").agg(max("n_events").as("n_events"))
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      val batch = StreamingAnalogs
        .tumblingDaily((batch1 ++ batch2).toDF())
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(streamed == batch)
      assert(batch("2024-01-02 00:00:00.0") == 2L)
    } finally q.stop()
  }

  test("dailyActive update mode: later batch updates the same day's row") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingAnalogs.dailyActive(input.toDF())
      .writeStream.format("memory").queryName("st3_out")
      .outputMode("update").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      val latest = s.table("st3_out")
        .groupBy("day_start").agg(max("n_events").as("n_events"))
      val jan2 = latest
        .filter(col("day_start") === ts("2024-01-02 00:00:00"))
        .collect().head.getLong(1)
      assert(jan2 == 2L) // 1 from batch1 upserted to 2 after batch2
    } finally q.stop()
  }

  test("sessionize: session merges across microbatches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingAnalogs.sessionize(input.toDF())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start() // session windows require append
    try {
      input.addData(Seq(Event(ts("2024-01-01 10:00:00"), 1L, "view", 1.0)))
      q.processAllAvailable()
      // 11:30 is within 2h of 10:00 → same session, extended
      input.addData(Seq(Event(ts("2024-01-01 11:30:00"), 1L, "click", 1.0)))
      q.processAllAvailable()
      // 18:00 starts a new session
      input.addData(Seq(Event(ts("2024-01-01 18:00:00"), 1L, "view", 1.0)))
      q.processAllAvailable()
      // advance the watermark past both sessions so append emits them
      input.addData(Seq(Event(ts("2024-01-05 00:00:00"), 99L, "view", 1.0)))
      q.processAllAvailable()
      val closed = s.table("sess_out")
        .filter(col("user_id") === 1L)
        .orderBy("session_start").collect()
      assert(closed.length == 2)
      assert(closed(0).getAs[Long]("n_events") == 2)
      assert(closed(0).getAs[java.sql.Timestamp]("session_end").toString
        == "2024-01-01 13:30:00.0") // last event + 2h gap
      assert(closed(1).getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("file-source streaming: parquet readStream → windowed agg") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_src").toString
    // one file: with several files and maxFilesPerTrigger=1 the
    // processing ORDER is nondeterministic, and tumblingDaily's 1-day
    // watermark would drop an out-of-order file's older events
    (batch1 ++ batch2).toDF().coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val stream = s.readStream
      .schema((batch1: Seq[Event]).toDF().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = StreamingAnalogs.tumblingDaily(stream)
      .writeStream.format("memory").queryName("file_out")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val streamed = s.table("file_out")
        .groupBy("day_start").agg(max("n_events").as("n_events"))
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      val batch = StreamingAnalogs.tumblingDaily((batch1 ++ batch2).toDF())
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("runningUserCounts keeps state across microbatches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingAnalogs.runningUserCounts(input.toDS())
      .toDF("user_id", "running_count")
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      val finalCounts = s.table("state_out")
        .groupBy("user_id").agg(max("running_count").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(finalCounts == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
    } finally q.stop()
  }

  test("RocksDB state store: the same stateful query runs on the " +
    "disk-backed provider — the 100 TB state backend, not a conf relic") {
    // default HDFSBackedStateStoreProvider keeps every key's state on
    // the executor HEAP — a running aggregate over billions of keys
    // OOMs. RocksDB spills to local disk with changelog checkpointing;
    // this pins that the library's stateful shapes actually run on it
    // (rocksdbjni loads, state survives across microbatches) so a
    // deploy can flip the provider without surprises.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_rocksdb_ckpt").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    val q = StreamingAnalogs.runningUserCounts(input.toDS())
      .toDF("user_id", "running_count")
      .writeStream.format("memory").queryName("rocksdb_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      val finalCounts = s.table("rocksdb_out")
        .groupBy("user_id").agg(max("running_count").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(finalCounts == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
      // the provider actually engaged: the HDFS-backed provider writes
      // version.delta per commit, RocksDB snapshots/changelogs — the
      // checkpoint's state dir must hold state files and no .delta
      val stateFiles = java.nio.file.Files
        .walk(java.nio.file.Paths.get(ckpt, "state"))
        .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      val names = new scala.collection.mutable.ArrayBuffer[String]
      while (stateFiles.hasNext) names += stateFiles.next().toString
      assert(names.nonEmpty)
      assert(!names.exists(_.endsWith(".delta")), names.take(20).toString)
    } finally {
      q.stop()
      saved match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  test("transformWithState (new arbitrary-state API): running spend on " +
    "RocksDB agrees with the old-API running counts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tws_ckpt").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = s.conf.getOption(key)
    // transformWithState requires the RocksDB provider
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    val q = StreamingAnalogs.runningSpendTws(input.toDS())
      .toDF("user_id", "n_events", "total_value")
      .writeStream.format("memory").queryName("tws_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      val finalRows = s.table("tws_out")
        .groupBy("user_id").agg(max("n_events").as("n"),
          max("total_value").as("v"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      // batch1+batch2: user 1 → 3 events (1.0+3.0+5.0), user 2 → 1
      // (2.0), user 3 → 1 (4.0) — the same totals runningUserCounts
      // proves for counts, extended with the spend sum
      assert(finalRows == Map(
        1L -> ((3L, 9.0)), 2L -> ((1L, 2.0)), 3L -> ((1L, 4.0))))
    } finally {
      q.stop()
      saved match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  test("stream-static anti join: only ids absent from the static " +
    "history pass, across a batch boundary, with no stream state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long)]
    val history = Seq(1L, 3L, 5L).toDF("seen_id")
    val feed = input.toDS().toDF("kind", "id")
    val admitted = feed.join(history,
      feed("id") === history("seen_id"), "left_anti")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_hist_ckpt").toString
    val q = admitted.writeStream.format("memory")
      .queryName("hist_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(Seq(("a", 0L), ("a", 1L), ("a", 2L)))
      q.processAllAvailable()
      input.addData(Seq(("a", 3L), ("a", 4L), ("a", 5L), ("a", 6L)))
      q.processAllAvailable()
      val got = s.table("hist_out").collect()
        .map(_.getLong(1)).toSet
      assert(got == Set(0L, 2L, 4L, 6L)) // history ids dropped
      // the anti join holds no stream state: append mode with no
      // watermark is only legal because the static side re-plans
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("openIntervalTws: out-of-order expiries need the full open-end " +
    "set; max and final replay a hand sweep across a batch boundary") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long, Long, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_conc_ckpt").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    // intervals (start, end): a long one [0, 100) outlives two short
    // ones [10, 20) and [30, 40) — a plain counter or max-end scalar
    // gets the pops wrong; then [95, 99) overlaps only the long one
    val q = StreamingAnalogs.openIntervalTws(input.toDS())
      .toDF("kind", "n_events", "max_open", "open_final")
      .writeStream.format("memory").queryName("conc_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      input.addData(Seq(("a", 0L, 0L, 100L), ("a", 1L, 10L, 20L)))
      q.processAllAvailable()
      input.addData(Seq(("a", 2L, 30L, 40L), ("a", 3L, 95L, 99L),
        ("a", 4L, 200L, 210L)))
      q.processAllAvailable()
      val r = s.table("conc_out")
        .collect().map(x => (x.getString(0), x.getLong(1),
          x.getLong(2), x.getLong(3))).toSet
      // sweep: open after each event = 1, 2 | 2, 2, 1 — max 2; the
      // last interval [200,210) starts after everything expired
      assert(r == Set(("a", 2L, 2L, 2L), ("a", 5L, 2L, 1L)))
    } finally {
      q.stop()
      saved match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  test("runningCusumTws: the streamed fold equals the closed-form " +
    "reflection replay, peak ties keep the first id, and the " +
    "max(0,·) floor actually fires") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cusum_ckpt").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    val kRef = 10L
    // deviations x−10: +14, −25 (floor fires: S clamps at 0), +14
    // again (peak TIE with id 0 — must keep id 0), then −5 (decay,
    // so the tie stays the final peak and the law is observable)
    val xs = Seq(24L, -15L, 24L, 5L)
    val q = StreamingAnalogs.runningCusumTws(input.toDS(), kRef)
      .toDF("kind", "n_events", "cusum", "cusum_peak", "peak_id")
      .writeStream.format("memory").queryName("cusum_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      // split across two batches so state crosses a batch boundary
      input.addData(Seq(("a", 0L, xs(0)), ("a", 1L, xs(1))))
      q.processAllAvailable()
      input.addData(Seq(("a", 2L, xs(2)), ("a", 3L, xs(3))))
      q.processAllAvailable()
      val r = s.table("cusum_out")
        .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
          x.getLong(3), x.getLong(4))).toSet
      // hand fold: S = [14, 0, 14, 9]. Batch-1 emission: peak 14 at
      // id 0. Batch-2: id 2 TIES the 14 peak (S back to 14) and must
      // NOT move peak_id (strict > in the fold); id 3 decays to 9.
      // Both update-mode emissions land in the memory sink, so the
      // floor, the tie law, and the decay are all visible.
      assert(r == Set(("a", 2L, 0L, 14L, 0L), ("a", 4L, 9L, 14L, 0L)))
      // closed-form reflection replay on the same xs: S_t = P_t −
      // min(0, min_{i≤t} P_i) with P = running sum of (x − kRef) —
      // the identity the DuckDB oracle rides
      val p = xs.map(_ - kRef).scanLeft(0L)(_ + _).tail
      val closed = p.zipWithIndex.map { case (pt, t) =>
        pt - math.min(0L, p.take(t + 1).min) }
      assert(closed == Seq(14L, 0L, 14L, 9L))
    } finally {
      q.stop()
      saved match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  test("dedupStream: replayed event_id across microbatches is dropped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import StreamingAnalogs.IdEvent
    val input = MemoryStream[IdEvent]
    val q = StreamingAnalogs.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        IdEvent(1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
        IdEvent(2L, ts("2024-01-01 10:01:00"), 2L, "click", 2.0)))
      q.processAllAvailable()
      // batch 2 replays event 2 (at-least-once delivery) + a new event
      input.addData(Seq(
        IdEvent(2L, ts("2024-01-01 10:01:00"), 2L, "click", 2.0),
        IdEvent(3L, ts("2024-01-01 10:02:00"), 1L, "purchase", 3.0)))
      q.processAllAvailable()
      val ids = s.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // 2 appears once, not twice
    } finally q.stop()
  }

  test("dailyActiveUpsertQuery: foreachBatch upserts day partitions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val out = "/tmp/graft_stream_upsert"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val input = MemoryStream[Event]
    val q = StreamingAnalogs.dailyActiveUpsertQuery(input.toDF(), out)
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2) // adds a Jan-2 event → that partition upserts
      q.processAllAvailable()
      val table = s.read.parquet(out)
        .select(col("day").cast("string"), col("n_events"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(table("2024-01-02") == 2L) // upserted from 1 to 2
      assert(table("2024-01-01") == 2L) // untouched partition preserved
      assert(table("2024-01-03") == 1L)
    } finally q.stop()
  }

  test("feedDaily: AvailableNow drain runs MULTIPLE admission-capped " +
    "microbatches and materializes the full feed's daily rollup") {
    val out = StreamingAnalogs.feedDaily(spark, sfDir).collect()
    // 5000 minutes from 2024-01-01T00:00 span 4 UTC days
    assert(out.length == 4, out.mkString("\n"))
    assert(out.map(_.getLong(1)).sum == 5000L)
    // first three days are full (1440 min), the fourth partial
    assert(out.take(3).forall(_.getLong(1) == 1440L), out.mkString("\n"))
    // the drain really went through admission control: 5000 rows at
    // GateTrigger/trigger = ceil(5000/GateTrigger) data microbatches
    // in the checkpoint log (plus possibly one trailing empty batch
    // advancing the watermark) — derived from the shared constant so
    // the pin follows the gate's admission size
    val dataBatches =
      ((5000L + StreamingAnalogs.GateTrigger - 1) /
        StreamingAnalogs.GateTrigger).toInt
    assert(dataBatches >= 2, "gate admission must stay multi-batch")
    val base = s"/tmp/graft_streams/${new java.io.File(sfDir).getName}" +
      "/feed_daily/ckpt/commits"
    val commits = new java.io.File(base).listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits >= dataBatches && commits <= dataBatches + 1,
      s"$commits commits")
  }

  test("streaming CDC apply: each microbatch MERGEs into the " +
    "versioned table; time travel reads any batch boundary") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val table = s"/tmp/graft_sinks/spec_stream_ver_${System.nanoTime()}"
    try {
      // bootstrap version 1: the empty snapshot
      Versioned.commit(
        Seq.empty[(Long, Long)].toDF("user_id", "n_events"), table)
      val input = MemoryStream[Event]
      val q = input.toDF()
        .groupBy("user_id").agg(count(lit(1)).as("n_events"))
        .writeStream.outputMode("update")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            // update-mode rows are upserts; the versioned MERGE makes
            // each microbatch an atomic, time-travelable version
            Versioned.mergeInto(s, table, b.select(col("user_id"),
              lit("U").as("op"), col("n_events").as("c_n_events")),
              "user_id"): Unit
        }
        .start()
      try {
        input.addData(batch1) // users 1, 2, 1
        q.processAllAvailable()
        input.addData(batch2) // users 3, 1
        q.processAllAvailable()
      } finally q.stop()
      assert(graft.operators.Versioned.versions(s, table) == Seq(1, 2, 3))
      def at(v: Int) = Versioned.read(s, table, Some(v))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(at(1) == Map.empty)
      assert(at(2) == Map(1L -> 2L, 2L -> 1L))
      assert(at(3) == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
    } finally {
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("purchaseAttribution: stream-stream join matches the 10-min window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import StreamingAnalogs.IdEvent
    val purchases = MemoryStream[IdEvent]
    val clicks = MemoryStream[IdEvent]
    val q = StreamingAnalogs
      .purchaseAttribution(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      clicks.addData(Seq(
        IdEvent(10L, ts("2024-01-01 09:55:00"), 1L, "click", 5.0), // in
        IdEvent(11L, ts("2024-01-01 09:40:00"), 1L, "click", 6.0), // old
        IdEvent(12L, ts("2024-01-01 10:05:00"), 2L, "click", 7.0))) // after
      purchases.addData(Seq(
        IdEvent(1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 1.0),
        IdEvent(2L, ts("2024-01-01 10:00:00"), 2L, "purchase", 2.0)))
      q.processAllAvailable()
      val rows = s.table("attr_out")
        .select("purchase_id", "click_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((1L, 5.0))) // only user 1's in-window click
    } finally q.stop()
  }

  test("purchaseAttributionLeft: unmatched purchase emits null-padded " +
      "only after the click watermark seals its window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import StreamingAnalogs.IdEvent
    val purchases = MemoryStream[IdEvent]
    val clicks = MemoryStream[IdEvent]
    val q = StreamingAnalogs
      .purchaseAttributionLeft(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attr_left_out")
      .outputMode("append").start()
    try {
      // user 1 has an in-window click; user 2 has none
      clicks.addData(Seq(
        IdEvent(10L, ts("2024-01-01 09:55:00"), 1L, "click", 5.0)))
      purchases.addData(Seq(
        IdEvent(1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 1.0),
        IdEvent(2L, ts("2024-01-01 10:00:00"), 2L, "purchase", 2.0)))
      q.processAllAvailable()
      def rows() = s.table("attr_left_out")
        .select("purchase_id", "click_value").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
      // the matched row may emit immediately; the unmatched purchase
      // must NOT — a qualifying click could still arrive late
      assert(!rows().contains((2L, None)),
        "unmatched row emitted before the watermark proved no match")
      // advance BOTH watermarks far past the join window's upper bound
      clicks.addData(Seq(
        IdEvent(99L, ts("2024-01-02 12:00:00"), 9L, "click", 0.0)))
      purchases.addData(Seq(
        IdEvent(98L, ts("2024-01-02 12:00:00"), 9L, "purchase", 0.0)))
      q.processAllAvailable()
      assert(rows().contains((1L, Some(5.0))))
      assert(rows().contains((2L, None)),
        "sealed unmatched purchase must emit null-padded")
    } finally q.stop()
  }

  test("purchaseAttributionFull: BOTH sides' unmatched rows null-pad " +
      "after the opposite watermark seals them") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import StreamingAnalogs.IdEvent
    val purchases = MemoryStream[IdEvent]
    val clicks = MemoryStream[IdEvent]
    val q = StreamingAnalogs
      .purchaseAttributionFull(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attr_full_out")
      .outputMode("append").start()
    try {
      // user 1: matched pair; user 2: purchase w/o click; user 3:
      // click w/o purchase
      clicks.addData(Seq(
        IdEvent(10L, ts("2024-01-01 09:55:00"), 1L, "click", 5.0),
        IdEvent(11L, ts("2024-01-01 09:50:00"), 3L, "click", 7.0)))
      purchases.addData(Seq(
        IdEvent(1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 1.0),
        IdEvent(2L, ts("2024-01-01 10:00:00"), 2L, "purchase", 2.0)))
      q.processAllAvailable()
      def rows() = s.table("attr_full_out")
        .select("purchase_id", "click_id").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      // neither unmatched row may emit before its sealing watermark
      assert(!rows().contains((Some(2L), None)))
      assert(!rows().contains((None, Some(11L))))
      // advance both watermarks far past every join window
      clicks.addData(Seq(
        IdEvent(99L, ts("2024-01-02 12:00:00"), 9L, "click", 0.0)))
      purchases.addData(Seq(
        IdEvent(98L, ts("2024-01-02 12:00:00"), 9L, "purchase", 0.0)))
      q.processAllAvailable()
      assert(rows().contains((Some(1L), Some(10L)))) // matched
      assert(rows().contains((Some(2L), None)),
        "sealed unmatched purchase must emit")
      assert(rows().contains((None, Some(11L))),
        "sealed unmatched click must emit")
    } finally q.stop()
  }

  test("sessionizeCustom: late events extend sealed-looking sessions; " +
      "only the watermark emits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingAnalogs.sessionizeCustom(input.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // session A: user 1 at 10:00 + 10:30
      input.addData(Seq(
        Event(ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
        Event(ts("2024-01-01 10:30:00"), 1L, "click", 1.0),
        Event(ts("2024-01-01 11:00:00"), 2L, "view", 1.0)))
      q.processAllAvailable()
      // a >2h in-batch gap must NOT emit session A: with a 1-day
      // lateness allowance, an event that extends A can still arrive
      input.addData(Seq(Event(ts("2024-01-01 14:00:00"), 1L, "view", 1.0)))
      q.processAllAvailable()
      assert(s.table("sess_out").isEmpty)
      // ...and one does: 11:00 arrives late (watermark is still Dec 31)
      // and extends A to [10:00, 11:00] n=3 — emitting at the gap
      // would have lost this event or miscounted the session
      input.addData(Seq(Event(ts("2024-01-01 11:00:00"), 1L, "view", 1.0)))
      q.processAllAvailable()
      assert(s.table("sess_out").isEmpty)
      // advancing the watermark past end+gap seals everything (two
      // batches: the watermark used by batch N derives from batch
      // N-1's max event time)
      input.addData(Seq(Event(ts("2024-01-05 00:00:00"), 3L, "view", 1.0)))
      q.processAllAvailable()
      input.addData(Seq(Event(ts("2024-01-06 00:00:00"), 3L, "view", 1.0)))
      q.processAllAvailable()
      val all = s.table("sess_out").as[StreamingAnalogs.ClosedSession]
        .collect()
        .map(c => (c.user_id, c.session_start.toString,
          c.session_end.toString, c.n_events)).toSet
      assert(all == Set(
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 11:00:00.0", 3L),
        (1L, "2024-01-01 14:00:00.0", "2024-01-01 14:00:00.0", 1L),
        (2L, "2024-01-01 11:00:00.0", "2024-01-01 11:00:00.0", 1L)))
    } finally q.stop()
  }

  test("enrichStream: stream-static dimension join — no state, missing " +
    "dims sentinel, per-batch broadcast") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("user_id", "segment")
    val input = MemoryStream[Event]
    val q = StreamingAnalogs.enrichStream(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData(batch1) // users 1, 2, 1
      q.processAllAvailable()
      input.addData(batch2) // users 3 (no dim row), 1
      q.processAllAvailable()
      val rows = s.table("enrich_out")
        .select("user_id", "segment").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(rows.length == 5)
      val byUser = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      assert(byUser(1L) == Set("GOLD"))
      assert(byUser(2L) == Set("SILVER"))
      // the unmatched dimension row gets the X3 sentinel, like batch J2
      assert(byUser(3L) == Set("Not_Found"))
      // stream-static join keeps NO join state (nothing to watermark):
      // the progress metrics report zero state rows
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("runningDistinctTws: KMV-as-state matches exact distinct in the " +
    "sub-k regime and monotonically accumulates across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_kmvtws_ckpt").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    val q = StreamingAnalogs.runningDistinctTws(input.toDS(), k = 64)
      .toDF("k", "n")
      .writeStream.format("memory").queryName("kmv_tws_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      input.addData((1 to 30).map(i => ("a", i.toLong)) ++
        Seq(("b", 1L), ("b", 1L)))
      q.processAllAvailable()
      // overlapping second batch: 10 repeats + 10 new per key
      input.addData((21 to 40).map(i => ("a", i.toLong)) ++
        Seq(("b", 2L)))
      q.processAllAvailable()
      val last = s.table("kmv_tws_out")
        .groupBy("k").agg(max("n").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(last == Map("a" -> 40L, "b" -> 2L), last)
    } finally {
      q.stop()
      saved match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  test("feedPitEnrich: the streamed point-in-time enrichment equals " +
    "the batch backfill computation — the feature-store serving " +
    "consistency contract") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingAnalogs.feedPitEnrich(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // batch backfill over the replayed generator: version(id) =
    // id div 1000 because ts(id) = base + id minutes and versions
    // are 1000-minute epochs
    val batch = spark.range(0, 5000)
      .select(
        when(col("id") % 3 === 0, lit("credit")).otherwise(lit("debit"))
          .as("kind"),
        ((col("id") * lit(2654435761L)) % lit(100000L)).as("cents"),
        (col("id") / lit(1000)).cast("long").as("rate_version"))
      .groupBy("kind", "rate_version")
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents") * (lit(100L) + lit(7L) * col("rate_version")))
          .as("revenue_cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed == batch)
  }

  test("feedMixtureDrift: drained domain counts equal the generator's " +
    "skewed buckets; alarm fires on the drifted domains only") {
    val out = StreamingAnalogs.feedMixtureDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getInt(6))).sortBy(_._1)
    // generator law: id % 10 buckets 5/3/2 over 5000 rows
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq(("head", 2500L), ("mid", 1500L), ("tail", 1000L)))
    out.foreach { case (d, n, tot, share, drift, alarm) =>
      assert(tot == 5000L, d)
      assert(share == 1000000L * n / tot, d)
      assert(drift == math.abs(share - 333333L), d)
      assert(alarm == (if (drift > 50000L) 1 else 0), d)
    }
    // both paths exercised: head+tail alarm, mid stays quiet
    assert(out.map(_._6).toSeq == Seq(1, 0, 1))
  }
}
