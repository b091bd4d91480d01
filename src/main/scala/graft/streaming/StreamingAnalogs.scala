package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.streaming.StreamStats.RecordedQuery

/** Structured Streaming analogs of the reference's batch cadences
  * (SURVEY.md §2.8): the daily snapshot (ST1), the upsert-by-date
  * audit count (ST3, `buisness_profile_etl/main.py:20-50`), and a
  * custom-state running counter (`mapGroupsWithState`).
  *
  * These take the (possibly streaming) events DataFrame so the same
  * plan runs from `readStream` or from a batch relation — tested with
  * MemoryStream in StreamingSpec. Watermarks bound state at scale:
  * day-grain windows with a 2-day watermark keep O(days in flight)
  * state per key regardless of input volume.
  */
object StreamingAnalogs {

  /** Admission cap for the GATE drains' deterministic 5000-row feed.
    * Every drained result below is a pure function of the feed
    * content, not of how admission chops it (the sf0.01/sf0.001
    * oracle gates re-prove that on every change), so the batch count
    * is pure per-batch engine floor — measured at 0.2-0.7 s/batch of
    * WAL + planning + state commit REGARDLESS of batch size
    * (AmortizationProfile, round 13/14). 2500 keeps the multi-batch
    * path the gate exists to exercise — state saved in batch 1,
    * restored in batch 2, watermark-flush batch after — at half the
    * fixed cost of the old 1000-row chop; the many-batch behaviors
    * (crash drills, replay, admission capping) are driven by the
    * MemoryStream specs, not the gate. Production batch sizing is the
    * measured 10^5-10^6-row regime, parameterized on the two drains
    * AmortizationProfile sweeps.
    */
  val GateTrigger = 2500L

  case class Event(ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Event with a delivery id, for dedup / join streams. */
  case class IdEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** ST1: tumbling 1-day event counts. Append-capable once the
    * watermark passes; also valid in update mode.
    */
  def tumblingDaily(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("day_start"), col("n_events"))

  /** ST3: upsert-by-date running count — update output mode gives the
    * reference's "rewrite the date's row each run" semantics without
    * the file rewrite. Distinct counts use the streaming-legal sketch.
    */
  def dailyActive(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct("user_id").as("n_active_approx"))
      .select(col("w.start").as("day_start"), col("n_events"),
        col("n_active_approx"))

  /** Streaming sessionization: per-user sessions with a 2-hour gap —
    * `session_window` merges windows across microbatches; the watermark
    * bounds session state.
    */
  def sessionize(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 day")
      .groupBy(col("user_id"),
        org.apache.spark.sql.functions.session_window(col("ts"), "2 hours")
          .as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Streaming exact dedup: drop events whose event_id was already
    * seen, keeping only state within the watermark — the streaming
    * form of Dedup.exact for at-least-once sources (Kafka replays,
    * API retries). State is bounded: ids older than the watermark are
    * evicted, so memory is O(ids per watermark window), not O(stream).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-STATIC enrichment join — the streaming form of J2: each
    * event enriched with its user's dimension row. The static side is
    * a plain batch DataFrame; Spark re-plans it per microbatch and
    * (dimension-sized → planner-sized) broadcasts it, so the stream
    * side never shuffles and no join state accumulates — unlike a
    * stream-stream join, a static side needs no watermark at all.
    * Missing dimension rows surface as the X3 sentinel, exactly like
    * the batch enrichment. At 100 TB-of-stream this is the shape for
    * dimension lookups; only a second STREAM requires the
    * watermarked-state join above.
    */
  def enrichStream(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(dim, Seq("user_id"), "left")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"),
        graft.functions.Scalars.notFound(col("segment")).as("segment"))

  /** Stream-stream interval join — the streaming form of
    * Advanced.intervalJoin: each purchase joined to same-user click
    * events in the 10 minutes before it. Both sides carry watermarks
    * and the join condition bounds event time on BOTH ends, so each
    * side's buffered state is evictable once the other side's
    * watermark passes — the only configuration where Spark can run a
    * stream-stream join with bounded state.
    */
  def purchaseAttribution(purchases: DataFrame,
      clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("click_value"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") < col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("c_ts"), col("click_value"))
  }

  /** LEFT OUTER stream-stream join: purchaseAttribution where
    * purchases with NO qualifying click still emit, null-padded. The
    * unmatched row cannot be produced eagerly — a matching click may
    * still arrive late — so Spark holds the purchase in state and
    * emits the null-padded row only when the CLICK side's watermark
    * passes the join window's upper bound, proving no match can ever
    * arrive. Same bounded-state configuration as the inner form
    * (watermarks on both sides + both-ends time bound); the only new
    * cost is that unmatched left rows live until the watermark, not
    * until first match.
    */
  def purchaseAttributionLeft(purchases: DataFrame,
      clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("click_value"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") < col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("c_ts"), col("click_value"))
  }

  /** FULL OUTER stream-stream join — the remaining cell of the join
    * matrix: unmatched PURCHASES null-pad once the click watermark
    * seals their window (as in the left form) AND unmatched CLICKS
    * null-pad once the PURCHASE watermark proves no purchase within
    * 10 minutes after them can still arrive. Both directions need the
    * time bound both ways (c_ts ∈ [p_ts−10m, p_ts) bounds each side
    * by the other), or state on the unbounded side could never be
    * evicted. Click rows carry their ids so the unmatched-click
    * output is identifiable.
    */
  def purchaseAttributionFull(purchases: DataFrame,
      clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("click_value"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") < col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"),
      "full_outer")
      .select(col("purchase_id"), col("click_id"),
        coalesce(col("p_user"), col("c_user")).as("user_id"),
        col("c_ts"), col("click_value"))
  }

  /** foreachBatch upsert sink: bridge a streaming aggregation into a
    * batch writer — each microbatch's updated day-rows dynamically
    * overwrite ONLY their partitions in the target table. This is the
    * production form of the reference's upsert-by-date audit file
    * (`main.py:20-50`): update-mode aggregation + idempotent
    * partition overwrite (a replayed microbatch rewrites the same
    * partitions to the same content).
    */
  def dailyActiveUpsertQuery(events: DataFrame, outPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    dailyActive(events).writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch
          .withColumn("day",
            date_format(col("day_start"), "yyyy-MM-dd"))
          .write.mode("overwrite")
          // per-write option, NOT a session conf mutation — the shared
          // session's overwrite semantics must not leak past this sink
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("day")
          .parquet(outPath)
      }
      .start()

  /** ST3 driven END-TO-END as a stream (the reference's polling
    * cadence, `buisness_profile_etl/main.py:20-50`, minus the
    * sleeping): FeedSource (DSv2 MicroBatchStream) → watermarked
    * daily aggregation → update-mode foreachBatch upsert with dynamic
    * partition overwrite → read the materialized table back.
    * `Trigger.AvailableNow` drains the feed through the admission-
    * control path in `rowsPerTrigger`-sized microbatches — the same
    * multi-batch execution a live cadence runs — then terminates, so
    * the result is a plain batch table the driver can oracle-check
    * (the feed is a pure function of the row index; see
    * FeedSource.tsOf/kindOf/amountOf).
    *
    * Scale shape: state is O(days inside the watermark) regardless of
    * feed volume, each microbatch writes only the day partitions it
    * updated, and a replayed batch rewrites the same partitions to
    * the same content (exactly-once with the deterministic source +
    * idempotent sink). The checkpoint is cleared per run so the drain
    * always re-processes — a production deploy would KEEP it and
    * resume from the committed offset instead.
    */
  def feedDaily(s: SparkSession, dir: String, totalRows: Long = 5000L,
      rowsPerTrigger: Long = GateTrigger): DataFrame = {
    // feed-size parameters exist for AmortizationProfile's batch-size
    // sweep (round-13 verdict ask #3); the gate/bench defaults are the
    // original 5 × 1000-row microbatches. Batch parallelism follows
    // batch size (~64k rows/partition) so a million-row batch isn't
    // squeezed through the small drain's 4 splits.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    val base = s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_daily"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", totalRows)
      .option("rowsPerTrigger", rowsPerTrigger)
      .option("partitionsPerBatch",
        math.min(32L, math.max(4L, rowsPerTrigger / 65536L)).toInt)
      .load()
    val agg = feed.withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Scalars.moneySum(col("amount")).as("total_amount"),
        sum(when(col("kind") === "credit", 1L).otherwise(0L)).as("n_credit"))
      .select(col("w.start").as("day_start"), col("n_events"),
        col("total_amount"), col("n_credit"))
    // the state-partition count is pinned into the checkpoint at first
    // run, and per-batch overhead (state-store files + commit log) is
    // proportional to it — a day-grain aggregate holds a handful of
    // groups, so 32 partitions would be pure fixed cost per microbatch.
    // Size state to the KEY CARDINALITY, not the core count (on a real
    // cluster a high-cardinality streaming agg would set this high
    // instead). Restored after start: conf is read at query planning.
    // (restored only after the drain: start() is async and the first
    // batch snapshots the conf into the checkpoint's offset metadata)
    withStateConf(s, 4) {
      agg.writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          batch.withColumn("day", date_format(col("day_start"), "yyyy-MM-dd"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(s"$base/table")
        }
        .start()
        .drainRecorded()
    }
    s.read.parquet(s"$base/table")
      .select(col("day_start"), col("n_events"), col("total_amount"),
        col("n_credit"))
      .orderBy("day_start")
  }

  /** Driver-checked stateful streaming query #2 — session windows in
    * APPEND mode (feedDaily covers update mode): per-user sessions
    * with a 2-hour gap over the deterministic feed, drained with
    * AvailableNow and materialized as a plain batch table.
    *
    * Append mode emits a session exactly once — when the watermark
    * passes its end, proving no late event can extend it — so the
    * sink is a pure parquet APPEND, no overwrite or upsert machinery.
    * The cost of that simplicity is the tail: sessions still open at
    * the final watermark (each user's last session) are never
    * finalized and do not emit. The oracle replays the generator,
    * sessionizes with gaps-and-islands SQL, and applies the SAME
    * final-watermark cutoff, so the driver checks exactly the
    * emitted-once contract.
    *
    * The user key derives from the feed's multiplicative hash
    * ((id·2654435761) mod 100000 mod 101): per-user inter-event gaps
    * are pseudo-random with ~101-minute mean, so ~30% of gaps exceed
    * the 2-hour session gap and every user accumulates a real session
    * history — a stride-mod derivation would give every user a
    * constant sub-gap cadence and one unsplit session.
    *
    * Scale shape: session state is O(open sessions), bounded by the
    * watermark; the merge of adjacent windows happens inside the
    * session-window state store, never as a re-shuffle of history.
    */
  def feedSessions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_sessions"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
    val sess = feed
      .withColumn("user_id",
        (col("id") * lit(2654435761L)) % lit(100000L) % lit(101L))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"),
        session_window(col("ts"), "2 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Scalars.moneySum(col("amount"))
          .as("session_amount"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"),
        col("session_amount"))
    // state sized to key cardinality (~101 open sessions), not core
    // count — see feedDaily's note; restored after the drain
    withStateConf(s, 4) {
      sess.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          batch.write.mode("append").parquet(s"$base/table")
        }
        .start()
        .drainRecorded()
    }
    s.read.parquet(s"$base/table")
      .orderBy("user_id", "session_start")
  }

  /** Driver-checked streaming exact dedup through the gate: TWO
    * independent instances of the deterministic feed union into one
    * at-least-once stream — every event arrives twice, the Kafka-replay
    * / API-retry delivery model — and `dropDuplicatesWithinWatermark`
    * keeps exactly the first arrival. The sources advance in lockstep
    * (same admission cap), so each id's duplicate lands inside the
    * watermark and the drained output is EXACTLY the generator's 5 000
    * rows — the oracle replays the generator and nothing else.
    *
    * Scale shape: dedup state is one entry per id seen within the
    * watermark window (here 2 days ≈ 2 880 ids), evicted as the
    * watermark passes — O(arrival rate × lateness bound) at ANY stream
    * length, the only state bound that survives an unbounded stream.
    * The sink is the idempotent per-batch-directory overwrite (a
    * replayed batch rewrites its own directory byte-identically).
    */
  def feedDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_dedup"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    def src(): DataFrame = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
    val dedup = src().union(src())
      .withWatermark("ts", "2 days")
      .dropDuplicatesWithinWatermark("id")
    // state sized to key cardinality — see feedDaily's note
    withStateConf(s, 4) {
      dedup.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], bid: Long) =>
          batch.write.mode("overwrite").parquet(s"$base/table/batch=$bid")
        }
        .start()
        .drainRecorded()
    }
    s.read.parquet(s"$base/table")
      .select(col("id"), col("ts"), col("kind"), col("amount"))
      .orderBy("id")
  }

  /** Open (not yet emitted) sessions in flight for one user, kept as
    * gap-merged disjoint intervals sorted by start.
    */
  case class OpenSessions(sessions: List[(Long, Long, Long)])

  /** A finished session, emitted once it can no longer grow. */
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Custom-state sessionization via flatMapGroupsWithState — the
    * hand-rolled form of `sessionize` above for session semantics
    * `session_window` can't express (here: emit a session ONLY when
    * closed, exactly once, in append mode).
    *
    * Correctness under out-of-order arrival: a session may only be
    * emitted when the WATERMARK proves nothing can extend it — a
    * large in-batch gap proves nothing, because an event between two
    * observed ones can still arrive within the lateness allowance and
    * extend or even BRIDGE sessions. So state holds ALL of the user's
    * open sessions (disjoint intervals; a new event extends one,
    * starts one, or merges two it now bridges), and only the
    * event-time timeout — watermark past end + gap — closes, emits,
    * and evicts. State per key is O(open sessions inside the lateness
    * window), watermark-bounded regardless of stream length.
    */
  def sessionizeCustom(events: Dataset[Event],
      gapMs: Long = 2L * 3600 * 1000): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, OutputMode}
    def close(uid: Long, s: (Long, Long, Long)) = ClosedSession(uid,
      new java.sql.Timestamp(s._1), new java.sql.Timestamp(s._2), s._3)
    // insert one event, merging every interval within gap of it —
    // handles extend-left, extend-right, and bridging two sessions
    def insert(ss: List[(Long, Long, Long)], t: Long)
        : List[(Long, Long, Long)] = {
      val (near, far) = ss.partition { case (lo, hi, _) =>
        t >= lo - gapMs && t <= hi + gapMs }
      val merged = near.foldLeft((t, t, 1L)) {
        case ((lo, hi, n), (l2, h2, n2)) =>
          (math.min(lo, l2), math.max(hi, h2), n + n2)
      }
      (merged :: far).sortBy(_._1)
    }
    events.withWatermark("ts", "1 day")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state: GroupState[OpenSessions]) =>
          val held = state.getOption.map(_.sessions).getOrElse(Nil)
          val ss = it.foldLeft(held)((acc, e) => insert(acc, e.ts.getTime))
          // emit every session the watermark has sealed: STRICTLY
          // end + gap < wm, because an event at ts == wm is still
          // admitted (Spark drops only ts < watermark) and insert()
          // merges it when t <= hi + gap — at hi+gap == wm both
          // would hold and the session would split. hasTimedOut is
          // just the no-new-events case.
          val wm = state.getCurrentWatermarkMs()
          val (sealedSs, open) = ss.partition(_._2 + gapMs < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open))
            // flush when the watermark passes the earliest horizon
            state.setTimeoutTimestamp(open.map(_._2).min + gapMs)
          }
          sealedSs.map(close(uid, _)).iterator
      }
  }

  /** Custom keyed state: running per-user event count via
    * mapGroupsWithState (KeyValueGroupedDataset API).
    */
  def runningUserCounts(events: Dataset[Event]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          val total = state.getOption.getOrElse(0L) + it.size
          state.update(total)
          (uid, total)
      }
  }

  /** Per-user running (count, spend) on Spark 4's transformWithState —
    * the NEW arbitrary-state API (StatefulProcessor + typed state
    * handles) replacing flatMapGroupsWithState: named state variables
    * with per-variable TTL, timers decoupled from input arrival, and
    * the RocksDB state store REQUIRED — which is the point at scale:
    * the API family is built for state that cannot live on the heap.
    * Functionally the runningUserCounts shape, so the spec can pin
    * old-API/new-API agreement on the same input.
    */
  class RunningSpendProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, (Long, Long, Double)] {
    @transient private var agg:
      org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      agg = getHandle.getValueState[(Long, Double)]("agg",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Double)] = {
      val (n0, s0) = if (agg.exists()) agg.get() else (0L, 0.0)
      val (n, sum) = rows.foldLeft((n0, s0)) {
        case ((cn, cs), e) => (cn + 1, cs + e.value)
      }
      agg.update((n, sum))
      Iterator((key, n, sum))
    }
  }

  def runningSpendTws(events: Dataset[Event])
      : Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new RunningSpendProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Running DISTINCT count per key with a KMV sketch as the state
    * value — the streaming composition of graft.functions.KmvSketch:
    * state is the sketch's bounded array (≤ k doubles per key), never
    * the id set, so per-key state is O(k) at ANY stream length — the
    * reason sketches exist in streaming. Exact while a key's ndv ≤ k
    * (the driver oracle's regime), ~1/√k beyond. The hash is the SAME
    * xxhash64(seed 42)→[0,1) map the batch sketch uses, so streaming
    * state and batch sketches are value-compatible (mergeable across
    * the lambda boundary).
    */
  class RunningDistinctProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long), (String, Long)] {
    @transient private var sk:
      org.apache.spark.sql.streaming.ValueState[Seq[Double]] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      sk = getHandle.getValueState[Seq[Double]]("kmv",
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Seq[Double]](),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def uOf(id: Long): Double =
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(id, 42L).toDouble / math.pow(2, 64) + 0.5

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, Long)] = {
      val agg = new graft.functions.KmvSketch(k)
      val cur = if (sk.exists()) sk.get() else agg.zero
      val next = agg.finish(
        rows.foldLeft(cur)((b, r) => agg.reduce(b, uOf(r._2))))
      sk.update(next)
      Iterator((key, math.round(graft.functions.Kmv.estimate(k, next))))
    }
  }

  def runningDistinctTws(pairs: Dataset[(String, Long)], k: Int = 1024)
      : Dataset[(String, Long)] = {
    import pairs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    pairs.groupByKey(_._1)
      .transformWithState(new RunningDistinctProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** Running per-event EWMA (α = 1/2) as transformWithState state —
    * the SIMPLEST state shape in the TWS family (one double per key)
    * and the streaming twin of Analytics.ewmaDaily: level' = level/2
    * + x folded per event. The batch Analytics form smooths a daily
    * series; this smooths the raw event stream as it arrives — the
    * live-metric decay any monitoring pipeline keeps per key.
    *
    * Determinism: each batch's rows fold in id order (the Misra-Gries
    * trick — the buffer is bounded by the source's admission cap),
    * batches arrive in id order, so the drained level IS the full
    * per-key id-ordered fold — and because every step is acc/2 + x
    * (exponent decrement + add, identical op sequence in DuckDB's
    * list_reduce), the oracle replays the level bit-for-bit from the
    * generator. No bound booleans, plain hash equality on doubles.
    */
  class RunningEwmaProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Double), (String, Double)] {
    @transient private var lvl:
      org.apache.spark.sql.streaming.ValueState[Double] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      lvl = getHandle.getValueState[Double]("lvl",
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Double)],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, Double)] = {
      val buf = rows.toArray.sortBy(_._2) // id order; admission-capped
      val cur = if (lvl.exists()) lvl.get() else 0.0
      val next = buf.foldLeft(cur)((acc, r) => acc / 2 + r._3)
      lvl.update(next)
      Iterator((key, next))
    }
  }

  def runningEwmaTws(rows: Dataset[(String, Long, Double)])
      : Dataset[(String, Double)] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    rows.groupByKey(_._1)
      .transformWithState(new RunningEwmaProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming one-sided CUSUM change detector (Page 1954) as
    * transformWithState state — the ONLINE twin of
    * Analytics.cusumChangePoint: the batch form scores a finished
    * daily series retrospectively; this maintains the alarm statistic
    * S_t = max(0, S_{t−1} + (x_t − k_ref)) per key AS EVENTS ARRIVE —
    * the live drift alarm a quality pipeline keeps on ingest volume
    * or amount streams (alarm when S crosses h; here the statistic,
    * its running peak, and the peak's position are emitted so the
    * threshold stays policy, not plumbing).
    *
    * Exactness: x is integer cents and k_ref an integer literal, so
    * every S_t is exact BIGINT arithmetic — no float drift across
    * 5000 folds. The oracle replays the recursion through its CLOSED
    * FORM S_t = P_t − min(0, min_{i≤t} P_i) (reflection at zero;
    * P = running sum of x − k_ref), a plain pair of SQL windows —
    * the recursion itself never crosses engines. Peak ties keep the
    * FIRST attaining id (strict > in the fold ⇔ rank by cusum DESC,
    * id ASC in the replay). State per key is four longs — RocksDB
    * scale-ready like the rest of the TWS family.
    */
  class RunningCusumProcessor(kRef: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Long), (String, Long, Long, Long, Long)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[
      (Long, Long, Long, Long)] = _ // (s, peak, peakId, n)

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long, Long)]("cusum",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Long)],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, Long, Long, Long, Long)] = {
      // id order within the batch (admission-capped buffer); batches
      // arrive in id order, so the state walks the full-stream fold
      val buf = rows.toArray.sortBy(_._2)
      // peak seeds BELOW any reachable S (S ≥ 0 always): the first row
      // must SET the peak, so an all-flat stream still reports the
      // first position — matching the replay's unconditional rank
      var (s, peak, peakId, n) =
        if (st.exists()) st.get() else (0L, Long.MinValue, -1L, 0L)
      buf.foreach { case (_, id, x) =>
        s = math.max(0L, s + x - kRef)
        if (s > peak) { peak = s; peakId = id }
        n += 1
      }
      st.update((s, peak, peakId, n))
      Iterator((key, n, s, peak, peakId))
    }
  }

  def runningCusumTws(rows: Dataset[(String, Long, Long)], kRef: Long)
      : Dataset[(String, Long, Long, Long, Long)] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    rows.groupByKey(_._1)
      .transformWithState(new RunningCusumProcessor(kRef),
        TimeMode.None(), OutputMode.Update())
  }

  /** Driver-checked gate query for the streaming CUSUM: per kind the
    * final statistic, its full-stream peak, and the peak's first
    * position after the AvailableNow drain — hash-exact (all BIGINT)
    * vs the closed-form window replay (see RunningCusumProcessor).
    * k_ref = 50000 is the generator's domain midpoint, so both kinds
    * hover near criticality and exercise the max(0, ·) reflection.
    */
  def feedCusum(s: SparkSession, dir: String, totalRows: Long = 5000L,
      rowsPerTrigger: Long = GateTrigger): DataFrame = {
    // feed-size parameters for AmortizationProfile's batch-size sweep
    // (round-13 verdict ask #3); gate/bench defaults unchanged
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_cusum"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    import s.implicits._
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", totalRows)
      .option("rowsPerTrigger", rowsPerTrigger)
      .option("partitionsPerBatch",
        math.min(32L, math.max(4L, rowsPerTrigger / 65536L)).toInt)
      .load()
      .select(col("kind"), col("id"),
        ((col("id") * lit(2654435761L)) % lit(100000L)).as("cents"))
      .as[(String, Long, Long)]
    drainTwsToTable(s, base, runningCusumTws(feed, 50000L)
      .toDF("kind", "n_events", "cusum", "cusum_peak", "peak_id"))
    s.read.parquet(s"$base/table")
      .select(col("kind"), col("n_events"), col("cusum"),
        col("cusum_peak"), col("peak_id"))
      .orderBy("kind")
  }

  /** Streaming point-in-time dimension enrichment — the SERVING-side
    * twin of Pipelines.pitLookup: each event joins the dimension
    * version in effect AT ITS OWN event time (valid_from ≤ ts <
    * valid_to), so live features match what a batch PIT backfill
    * would have produced — the feature-store consistency contract.
    *
    * The dimension is a 5-version rate table over the feed's time
    * domain (1000-minute epochs). Stream-STATIC join: Spark re-plans
    * the static side per micro-batch and broadcasts it (version
    * tables are dimension-sized), the interval predicate rides the
    * broadcast join as a residual, and NO join state accumulates —
    * unlike a stream-stream join, the static side needs no watermark.
    * Downstream: an update-mode (kind, version) revenue rollup in
    * exact integer cents, hash-checked against the generator replay
    * (ts(id) = base + id minutes ⇒ version(id) = id div 1000, so the
    * oracle re-derives the interval match arithmetically).
    */
  def feedPitEnrich(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_pit"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
    val dim = s.range(0, 5).select(
      col("id").as("rate_version"),
      (t0 + expr("make_interval(0, 0, 0, 0, 0, cast(id * 1000 as int), 0)"))
        .as("valid_from"),
      (t0 + expr(
        "make_interval(0, 0, 0, 0, 0, cast((id + 1) * 1000 as int), 0)"))
        .as("valid_to"),
      (lit(100L) + lit(7L) * col("id")).as("rate"))
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
      .select(col("kind"), col("ts"),
        ((col("id") * lit(2654435761L)) % lit(100000L)).as("cents"))
    val enriched = feed.join(dim,
      col("ts") >= col("valid_from") && col("ts") < col("valid_to"))
    val agg = enriched.groupBy(col("kind"), col("rate_version"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents") * col("rate")).as("revenue_cents"))
    withStateConf(s, 4) {
      agg.writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          // partition by the FULL group key: update mode emits only
          // the batch's changed groups, so a coarser partition (kind
          // alone) would be wiped down to whichever versions the last
          // batch touched
          batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kind", "rate_version")
            .parquet(s"$base/table")
        }
        .start()
        .drainRecorded()
    }
    s.read.parquet(s"$base/table")
      .select(col("kind"), col("rate_version").cast("long")
        .as("rate_version"), col("n_events"), col("revenue_cents"))
      .orderBy("kind", "rate_version")
  }

  /** Driver-checked gate query for the streaming EWMA: the decayed
    * level per kind after the full drain, hash-exact vs the
    * generator-replay fold (see RunningEwmaProcessor).
    */
  def feedEwma(s: SparkSession, dir: String): DataFrame = {
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_ewma"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    import s.implicits._
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
      .select(col("kind"), col("id"),
        ((col("id") * lit(2654435761L)) % lit(100000L)).cast("double")
          .as("cents"))
      .as[(String, Long, Double)]
    drainTwsToTable(s, base, runningEwmaTws(feed).toDF("kind", "ewma"))
    s.read.parquet(s"$base/table")
      .select(col("kind"), col("ewma")).orderBy("kind")
  }

  /** Driver-checked drain: running distinct users per feed kind
    * through transformWithState on the REQUIRED RocksDB store. Each
    * microbatch update-emits the key's cumulative estimate; the sink
    * dynamic-overwrites per kind, so after the AvailableNow drain the
    * table holds each kind's FULL-stream distinct count — which the
    * oracle replays as a plain COUNT(DISTINCT) over the generator
    * (k=1024 > the 101-user domain: exact regime).
    */
  def feedDistinct(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_distinct"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    import s.implicits._
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
      // same derived user domain as feedSessions (~101 users)
      .select(col("kind"),
        ((col("id") * lit(2654435761L)) % lit(100000L) % lit(101L))
          .as("user_id"))
      .as[(String, Long)]
    drainTwsToTable(s, base, runningDistinctTws(feed)
      .toDF("kind", "n_users"))
    s.read.parquet(s"$base/table")
      .select(col("kind"), col("n_users")).orderBy("kind")
  }

  /** Streaming mixture-drift monitor: is the arriving stream's DOMAIN
    * MIX still the mixture the pipeline declared? (The training-feed
    * guard for text_mixture_temp's plan: a crawler source going dark
    * or a loader bug silently reweights the corpus long before any
    * per-doc check fires.) One ValueState[Long] counter per domain —
    * state O(|domains|), a constant — emitted per batch; shares,
    * drift vs the declared target, and the alarm are computed
    * BATCH-SIDE off the drained table, because a share needs the
    * cross-key total and TWS state is per-key (a single-key global
    * map would funnel the whole stream through one task).
    *
    * Fixture domains: deterministic id-range buckets with real skew
    * (head 50% / mid 30% / tail 20%), so against the uniform target
    * two domains alarm at 50 000 ppm and one does not — the alarm
    * path and the quiet path both exercised, generator-replayed
    * exactly by the oracle.
    */
  class DomainCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long), (String, Long)] {
    @transient private var n:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      n = getHandle.getValueState[Long]("n",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, Long)] = {
      val total = (if (n.exists()) n.get() else 0L) + rows.size
      n.update(total)
      Iterator((key, total))
    }
  }

  def feedMixtureDrift(s: SparkSession, dir: String,
      alarmPpm: Long = 50000L): DataFrame = {
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/mixture_drift"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
      .select(when(col("id") % 10 < 5, "head")
        .when(col("id") % 10 < 8, "mid")
        .otherwise("tail").as("domain"), col("id"))
      .as[(String, Long)]
    val counts = feed.groupByKey(_._1)
      .transformWithState(new DomainCountProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("kind", "n_seen") // drain harness partitions by "kind"
    drainTwsToTable(s, base, counts)
    val table = s.read.parquet(s"$base/table")
      .select(col("kind").as("domain"), col("n_seen"))
    val total = table.agg(sum(col("n_seen")).as("n_total"))
    table.crossJoin(broadcast(total))
      .select(col("domain"), col("n_seen"), col("n_total"),
        expr("1000000L * n_seen div n_total").as("share_ppm"),
        lit(333333L).as("target_ppm"))
      .withColumn("drift_ppm",
        abs(col("share_ppm") - col("target_ppm")))
      .withColumn("alarm", (col("drift_ppm") > alarmPpm).cast("int"))
      .orderBy("domain")
  }

  /** Per-drain state-store posture, set for the drain and restored
    * after: key-cardinality-sized shuffle partitions always (see
    * feedDaily's note: state-store fixed cost is per PARTITION per
    * batch, so partitions track key count, not cores), plus — only
    * where `rocksdb = true` — the RocksDB provider with CHANGELOG
    * checkpointing (commit appends the batch's changelog instead of
    * uploading a full snapshot every batch). The flag is MEASURED,
    * not doctrinal: on the transformWithState drains (which require
    * RocksDB anyway) changelog checkpointing cut per-batch state
    * commit ~170 → ~62 ms; on the 4-partition windowed-agg drains
    * the same flip made things WORSE (batch-0 addBatch 1082 → 3859
    * ms from cold instance opens, steady-state commit no better than
    * the HDFS-backed store at this state size), so those keep the
    * default provider. At production state sizes the calculus shifts
    * toward RocksDB for the aggs too — that is a deployment conf,
    * and this helper is the one knob to turn. Restored only after
    * the drain — start() is async and the first batch snapshots
    * confs into the checkpoint's metadata.
    */
  private def withStateConf[T](s: SparkSession, partitions: Int,
      rocksdb: Boolean = false)(body: => T): T = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey = "spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled"
    val savedProvider = s.conf.getOption(providerKey)
    val savedChangelog = s.conf.getOption(changelogKey)
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    try {
      if (rocksdb) {
        s.conf.set(providerKey,
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")
        s.conf.set(changelogKey, "true")
      }
      s.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      body
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", savedParts)
      savedProvider match {
        case Some(v) => s.conf.set(providerKey, v)
        case None => s.conf.unset(providerKey)
      }
      savedChangelog match {
        case Some(v) => s.conf.set(changelogKey, v)
        case None => s.conf.unset(changelogKey)
      }
    }
  }

  /** Shared transformWithState drain harness: the withStateConf
    * posture (TWS requires RocksDB) around an update-mode
    * AvailableNow drain into `$base/table`, dynamic-partition-
    * overwritten by `kind` so the table keeps each key's LATEST
    * emission — the TWS feed drains differ only in their query
    * and output schema.
    */
  private def drainTwsToTable(s: SparkSession, base: String,
      out: DataFrame): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    withStateConf(s, 2, rocksdb = true) {
      out.writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kind")
            .parquet(s"$base/table")
        }
        .start()
        .drainRecorded()
    }
  }

  /** Streaming Misra–Gries heavy hitters: the MG counter map as
    * transformWithState state — the running candidate set of each
    * kind's most frequent tokens with state bounded at ≤ m counters
    * at ANY stream length (the same mergeable summary
    * `TextAnalysis.heavyHitters` fans in map-side, here folded batch
    * by batch instead). The MG law survives incrementalization
    * verbatim: after N stream items, every token with true frequency
    * > N/(m+1) is present in the state, and each kept counter
    * undercounts by at most N/(m+1) — so the DRAIN of the stream
    * carries the same guarantee the batch pass proves, without ever
    * retaining a token count table.
    *
    * Determinism (what lets the driver hash-check a stream sketch):
    * MG's result depends on arrival ORDER, and rows shuffled into the
    * state partition arrive in nondeterministic partition order — so
    * each batch's rows are buffered and folded in id order. The
    * buffer is bounded by the source's admission cap (rowsPerTrigger),
    * not the stream: bounded memory, deterministic fold, replayable
    * result.
    */
  class HeavyHittersProcessor(m: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, String, Long), (String, String, Long)] {
    @transient private var sk:
      org.apache.spark.sql.streaming.ValueState[Map[String, Long]] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      sk = getHandle.getValueState[Map[String, Long]]("mg",
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Map[String, Long]](),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, String, Long)],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, String, Long)] = {
      val agg = new graft.functions.MisraGries(m)
      val cur = if (sk.exists()) sk.get() else agg.zero
      // id-ordered fold (see scaladoc); rows per batch per key are
      // bounded by the source's admission cap
      val next = rows.toSeq.sortBy(_._3)
        .foldLeft(cur)((b, r) => agg.reduce(b, r._2))
      sk.update(next)
      next.iterator.map { case (tok, est) => (key, tok, est) }
    }
  }

  def heavyHittersTws(rows: Dataset[(String, String, Long)],
      m: Int = 32): Dataset[(String, String, Long)] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    rows.groupByKey(_._1)
      .transformWithState(new HeavyHittersProcessor(m),
        TimeMode.None(), OutputMode.Update())
  }

  /** The deterministic skewed token law shared by the stream side,
    * the in-plan exact replay, and the DuckDB oracle: 75% of rows
    * land on the heavy branch h%16 — and since that branch requires
    * h%4 ≠ 0 while h%16 ≡ h (mod 4), residues {0,4,8,12} are
    * unreachable, leaving 12 heavy tokens of ~6.25% each (75%/12) —
    * clearing the MG nomination bar N/(m+1) ≈ 3% at m=32 with ~2×
    * margin; the remaining 25% spreads over a 499-token tail
    * (~0.05% each), far below it.
    */
  private def tokenOf(h: Column): Column =
    concat(lit("t"), when(h % 4 =!= 0, h % 16)
      .otherwise(lit(16) + h % 499).cast("string"))

  /** Driver-checked drain + assertion form: per-kind MG candidates
    * from the full stream, verified against an in-plan exact replay
    * of the generator. Emitted per kind:
    *  - n_total, n_heavy_true — exact, oracle-replayed;
    *  - n_heavy_found — candidates that are true heavy hitters; by MG
    *    completeness this EQUALS n_heavy_true, so the oracle emits
    *    the same exact expression (a replayable equality, not a
    *    literal);
    *  - est_bounds_ok — every candidate's counter within
    *    [exact − ⌊N/(m+1)⌋, exact] (the MG undercount law);
    *  - candidates_bounded — state size ≤ m.
    */
  def feedHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    val m = 32
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_hh"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    import s.implicits._
    val h = (col("id") * lit(2654435761L)) % lit(100000L)
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
      .select(col("kind"), tokenOf(h).as("token"), col("id"))
      .as[(String, String, Long)]
    drainTwsToTable(s, base,
      heavyHittersTws(feed, m).toDF("kind", "token", "est"))
    val cand = s.read.parquet(s"$base/table")
      .select(col("kind"), col("token"), col("est"))
    // exact replay of the generator, batch-side — the same row law
    // the DuckDB oracle re-derives independently
    val hh = (col("id") * lit(2654435761L)) % lit(100000L)
    val exact = s.range(0, 5000)
      .select(when(col("id") % 3 === 0, lit("credit"))
        .otherwise(lit("debit")).as("kind"), tokenOf(hh).as("token"))
      .groupBy("kind", "token").agg(count(lit(1)).as("n_exact"))
    val totals = exact.groupBy("kind").agg(sum(col("n_exact")).as("n_total"))
    val joined = cand
      .join(exact, Seq("kind", "token"), "left")
      .join(broadcast(totals), "kind")
      .withColumn("is_heavy", col("n_exact") * (m + 1) > col("n_total"))
      .withColumn("bound_ok",
        col("est") <= col("n_exact") &&
          col("est") + floor(col("n_total") / (m + 1)) >= col("n_exact"))
    val perKindCand = joined.groupBy("kind")
      .agg(count(lit(1)).as("n_candidates"),
        count(when(col("is_heavy"), 1)).as("n_heavy_found"),
        min(col("bound_ok")).as("est_bounds_ok"))
    val perKindTrue = exact.join(broadcast(totals), "kind")
      .filter(col("n_exact") * (m + 1) > col("n_total"))
      .groupBy("kind").agg(count(lit(1)).as("n_heavy_true"))
    totals.join(perKindTrue, Seq("kind"), "left")
      .join(perKindCand, Seq("kind"), "left")
      .select(col("kind"), col("n_total"),
        coalesce(col("n_heavy_true"), lit(0L)).as("n_heavy_true"),
        coalesce(col("n_heavy_found"), lit(0L)).as("n_heavy_found"),
        coalesce(col("est_bounds_ok"), lit(true)).as("est_bounds_ok"),
        (coalesce(col("n_candidates"), lit(0L)) <= m)
          .as("candidates_bounded"))
      .orderBy("kind")
  }

  /** Streaming mergeable quantiles: the fixed-bin histogram sketch
    * (`HistSketchAgg`, the engine behind `agg_quantile_rollup` and
    * the sketch MAD gate) as transformWithState state — per key one
    * `bins`-long count array at ANY stream length, folded batch by
    * batch exactly as the batch aggregate's `reduce` (mergeability
    * incrementalized, the same argument as the weighted reservoir).
    * Each microbatch update-emits the key's CURRENT p50/p95
    * estimates read off the state.
    *
    * Unlike most streaming sketches this one is HASH-EXACT under the
    * gate with no bound booleans: bin counts are integers (fold order
    * irrelevant), and the read-off is the deterministic bin-edge
    * identity — the upper edge of the exact rank element's bin — so
    * the DuckDB oracle replays the estimates themselves from the
    * generator (rank window + integer bin arithmetic).
    */
  class QuantileSketchProcessor(bins: Int, widthC: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long), (String, Long, Long, Long)] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[Array[Long]] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[Array[Long]]("hist",
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Array[Long]](),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, Long, Long, Long)] = {
      val agg = new graft.functions.HistSketchAgg(bins, widthC.toDouble)
      val cur = if (st.exists()) st.get() else agg.zero
      val next = rows.foldLeft(cur)((b, r) => agg.reduce(b, r._2.toDouble))
      st.update(next)
      val n = next.sum
      // same rank law as Analytics.quantileRollup, in INTEGER
      // arithmetic: rank(p/q) = (p·n + (q−p)) div q (≡ floor(n·f +
      // (1−f)) exactly — the double form flipped a bin cross-engine
      // at a rank boundary); estimate = upper edge of the first bin
      // whose cumulative count reaches it
      def est(p: Long, q: Long): Long = {
        val rank = (p * n + (q - p)) / q
        var cum = 0L; var b = 0
        while (b < bins && cum + next(b) < rank) { cum += next(b); b += 1 }
        (b + 1) * widthC
      }
      Iterator((key, n, est(1, 2), est(19, 20)))
    }
  }

  def quantileSketchTws(rows: Dataset[(String, Long)], bins: Int = 256,
      widthC: Long = 400L): Dataset[(String, Long, Long, Long)] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    rows.groupByKey(_._1)
      .transformWithState(new QuantileSketchProcessor(bins, widthC),
        TimeMode.None(), OutputMode.Update())
  }

  /** Driver-checked drain: running per-kind p50/p95 of the feed's
    * amount (in exact integer cents, derived straight from the
    * generator law so no float round-trip can shift a bin). Dynamic
    * overwrite keeps each kind's latest emission; after the
    * AvailableNow drain the table holds the FULL stream's estimates,
    * which the oracle replays exactly.
    */
  def feedQuantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_quant"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    import s.implicits._
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
      // amount cents straight from the generator law (amount itself
      // is cents/100.0 — re-multiplying the double could land a ±1ulp
      // value in the neighboring bin)
      .select(col("kind"),
        ((col("id") * lit(2654435761L)) % lit(100000L)).as("cents"))
      .as[(String, Long)]
    drainTwsToTable(s, base, quantileSketchTws(feed)
      .toDF("kind", "n_events", "p50_est_cents", "p95_est_cents"))
    s.read.parquet(s"$base/table")
      .select(col("kind"), col("n_events"), col("p50_est_cents"),
        col("p95_est_cents"))
      .orderBy("kind")
  }

  /** Streaming weighted reservoir: the TopKAgg buffer as
    * transformWithState state — a weighted sample WITHOUT replacement
    * of the FULL stream so far, per key, with state bounded at ≤ k
    * (key, id) pairs at ANY stream length. This is the property that
    * makes the AGGREGATE form of top-k matter (TopKAgg's scaladoc):
    * the A-ES reservoir is mergeable, so folding each microbatch into
    * the retained buffer IS the batch aggregate incrementalized —
    * no retained raw rows, no re-ranking of history. The es_key is
    * the SAME deterministic formula as Aggregates.weightedSample, so
    * the full-stream drain equals the batch A-ES sample over the
    * replayed generator — which is exactly what the DuckDB oracle
    * demands (a randomized STREAMING operator, hash-exact).
    */
  class WeightedReservoirProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Double), (String, Long, Long)] {
    @transient private var buf:
      org.apache.spark.sql.streaming.ValueState[Seq[(Double, Long)]] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      buf = getHandle.getValueState[Seq[(Double, Long)]]("topk",
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Seq[(Double, Long)]](),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Double)],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, Long, Long)] = {
      val agg = new graft.functions.TopKAgg(k)
      val cur = if (buf.exists()) buf.get() else agg.zero
      // rows are (kind, id, es_key); reduce takes (value=es_key, id)
      val next = agg.finish(
        rows.foldLeft(cur)((b, r) => agg.reduce(b, (r._3, r._2))))
      buf.update(next)
      next.iterator.zipWithIndex.map { case ((_, id), i) =>
        (key, (i + 1).toLong, id)
      }
    }
  }

  def weightedReservoirTws(rows: Dataset[(String, Long, Double)],
      k: Int = 20): Dataset[(String, Long, Long)] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    rows.groupByKey(_._1)
      .transformWithState(new WeightedReservoirProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** Driver-checked drain: the running weighted sample per feed kind,
    * weights from the generator's deterministic amount. Each
    * microbatch update-emits the key's CURRENT full-stream top-k;
    * dynamic partition overwrite keeps only the latest emission per
    * kind, so the drained table is the weighted sample of the whole
    * stream — replayed by the oracle as a rank-over-key window on the
    * generator (same arithmetic-hash keys as agg_weighted_sample).
    */
  def feedWeightedSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_wsample"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    import s.implicits._
    val u = (pmod(col("id") * lit(2654435761L), lit(4294967296L))
      .cast("double") + lit(1.0)) / lit(4294967297.0)
    // the versioned-ingest generator's amount as the sampling weight
    val w = greatest(((col("id") * lit(2654435761L)) % lit(100000L))
      .cast("double") / lit(100.0), lit(1e-6))
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
      .select(col("kind"), col("id"), (log(u) / w).as("es_key"))
      .as[(String, Long, Double)]
    drainTwsToTable(s, base, weightedReservoirTws(feed)
      .toDF("kind", "rk", "id"))
    s.read.parquet(s"$base/table")
      .select(col("kind"), col("rk"), col("id")).orderBy("kind", "rk")
  }

  /** Streaming trailing-7-day distinct users — the streaming twin of
    * Aggregates.slidingDistinct and the TWS family's MAPSTATE member
    * (value/list shapes are covered by the other processors; a keyed
    * sub-map is the shape a per-day sketch ledger actually needs):
    * state per kind is day → KMV sketch, each batch folds its rows
    * into their days' sketches, EVICTS days at or below
    * maxDay − retain (the bound running distinct cannot have: state
    * is ≤ retain+1 day sketches per key at ANY stream length), and
    * re-emits the full retained trailing-window estimates so the
    * sink's dynamic overwrite always holds the complete live window.
    * Sub-k regime + the same XXH64 hash as the batch sketches → the
    * drained estimates are EXACT and the oracle replays them as
    * plain windowed COUNT(DISTINCT) over the generator.
    */
  class SlidingDistinctProcessor(k: Int, window: Int, retain: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Int), (String, Int, Long)] {
    @transient private var days:
      org.apache.spark.sql.streaming.MapState[Int, Seq[Double]] = _
    @transient private var maxDay:
      org.apache.spark.sql.streaming.ValueState[Int] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      days = getHandle.getMapState[Int, Seq[Double]]("days",
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Seq[Double]](),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      maxDay = getHandle.getValueState[Int]("maxDay",
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    private def uOf(id: Long): Double =
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(id, 42L).toDouble / math.pow(2, 64) + 0.5

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Int)],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, Int, Long)] = {
      val agg = new graft.functions.KmvSketch(k)
      // fold the batch into its days' sketches
      rows.toArray.groupBy(_._3).foreach { case (d, rs) =>
        val cur = if (days.containsKey(d)) days.getValue(d) else agg.zero
        days.updateValue(d, agg.finish(
          rs.foldLeft(cur)((b, r) => agg.reduce(b, uOf(r._2)))))
      }
      // advance the horizon and evict expired day sketches
      val retained = days.keys().toArray.sorted
      val mx = math.max(if (maxDay.exists()) maxDay.get() else Int.MinValue,
        if (retained.nonEmpty) retained.max else Int.MinValue)
      maxDay.update(mx)
      retained.filter(_ <= mx - retain).foreach(days.removeKey)
      // re-emit the full retained window set (state-bounded rows):
      // trailing estimate per kept day from the per-day sketch merge
      val live = days.keys().toArray.sorted
      live.iterator.map { d =>
        val merged = live.filter(x => x > d - window && x <= d)
          .map(days.getValue)
          .reduce((a, b) => graft.functions.Kmv.union(k, a, b))
        (key, d, math.round(graft.functions.Kmv.estimate(k, merged)))
      }
    }
  }

  def slidingDistinctTws(rows: Dataset[(String, Long, Int)],
      k: Int = 1024, window: Int = 7, retain: Int = 7)
      : Dataset[(String, Int, Long)] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    rows.groupByKey(_._1)
      .transformWithState(new SlidingDistinctProcessor(k, window, retain),
        TimeMode.None(), OutputMode.Update())
  }

  def feedSlidingDistinct(s: SparkSession, dir: String): DataFrame = {
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_sliding"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    import s.implicits._
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
      // 10 synthetic days of 500 ids each; same 101-user domain
      .select(col("kind"),
        ((col("id") * lit(2654435761L)) % lit(100000L) % lit(101L))
          .as("user_id"),
        (col("id") / lit(500L)).cast("int").as("day"))
      .as[(String, Long, Int)]
    drainTwsToTable(s, base, slidingDistinctTws(feed)
      .toDF("kind", "day", "n_users_7d"))
    s.read.parquet(s"$base/table")
      .select(col("kind"), col("day"), col("n_users_7d"))
      .orderBy("kind", "day")
  }

  /** Streaming open-interval concurrency per key — the ONLINE twin of
    * Analytics.concurrency, generalized to VARIABLE interval lengths
    * (each event opens an interval of 1 + hash(id) % 30 minutes), so
    * expiries complete out of order and the state must be the set of
    * open interval ENDS (a priority queue), not a counter or a single
    * max-end. State per key is bounded by the key's PEAK concurrency
    * — exactly the number this operator reports — never by stream
    * length.
    *
    * Determinism note (why a logical sweep, not event-time timers):
    * physical timer firing depends on watermark cadence, i.e. on
    * micro-batch layout — an operator whose MAX depends on when the
    * engine fires callbacks is not replayable. Here expiry is applied
    * LOGICALLY at each event's own timestamp (pop ends ≤ ts before
    * pushing, the half-open convention) while folding in id order, so
    * the result is a pure function of the stream and the DuckDB
    * oracle replays it from the generator: open(i) =
    * |{j : ts_j ≤ ts_i < ts_j + len_j}| within the key.
    */
  class OpenIntervalProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Long, Long), (String, Long, Long, Long)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[
      (Seq[Long], Long, Long)] = _ // (open ends, n_events, max_open)

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Seq[Long], Long, Long)]("open",
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[(Seq[Long], Long, Long)](),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Long, Long)],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, Long, Long, Long)] = {
      val buf = rows.toArray.sortBy(_._2) // id order = ts order
      var (open, n, maxOpen) =
        if (st.exists()) st.get() else (Seq.empty[Long], 0L, 0L)
      buf.foreach { case (_, _, startUs, endUs) =>
        open = open.filter(_ > startUs) :+ endUs // pop ≤ ts, push
        n += 1
        if (open.size > maxOpen) maxOpen = open.size.toLong
      }
      st.update((open, n, maxOpen))
      Iterator((key, n, maxOpen, open.size.toLong))
    }
  }

  def openIntervalTws(rows: Dataset[(String, Long, Long, Long)])
      : Dataset[(String, Long, Long, Long)] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    rows.groupByKey(_._1)
      .transformWithState(new OpenIntervalProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Driver-checked gate query for the streaming concurrency: per
    * kind the event count, the peak number of simultaneously open
    * intervals, and how many are still open after the last event —
    * all BIGINT, hash-exact vs the generator-replay pair count (see
    * OpenIntervalProcessor).
    */
  def feedConcurrency(s: SparkSession, dir: String): DataFrame = {
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_conc"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    import s.implicits._
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
      .select(col("kind"), col("id"),
        unix_micros(col("ts")).as("start_us"),
        (unix_micros(col("ts")) +
          (lit(1L) + (col("id") * lit(2654435761L)) % lit(30L))
            * lit(60000000L)).as("end_us"))
      .as[(String, Long, Long, Long)]
    drainTwsToTable(s, base, openIntervalTws(feed)
      .toDF("kind", "n_events", "max_open", "open_final"))
    s.read.parquet(s"$base/table")
      .select(col("kind"), col("n_events"), col("max_open"),
        col("open_final"))
      .orderBy("kind")
  }

  /** Stream-STATIC ANTI-join dedup: admit only feed rows whose id is
    * NOT in a static already-ingested index — the "don't re-crawl
    * what the warehouse already has" gate, and the admission-side
    * complement of dropDuplicates (which dedups WITHIN the stream;
    * this dedups AGAINST history). The static side is re-planned and
    * broadcast per micro-batch with NO join state accumulating —
    * at scale the index side would be a bucketed fingerprint table
    * and the anti join its bloom/DPP-pruned probe; the streaming
    * plan above it is identical. Downstream an update-mode per-kind
    * rollup in exact cents, hash-checked against the generator
    * replay (history = ids ≡ 3 mod 7, arithmetic both engines).
    */
  def feedDedupHistory(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    val base =
      s"/tmp/graft_streams/${new java.io.File(dir).getName}/feed_hist"
    val path = new org.apache.hadoop.fs.Path(base)
    val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.delete(path, true)
    val history = s.range(0, 5000).filter(col("id") % 7 === 3)
      .select(col("id").as("seen_id"))
    val feed = s.readStream.format("graft.sources.FeedSource")
      .option("totalRows", 5000)
      .option("rowsPerTrigger", GateTrigger)
      .option("partitionsPerBatch", 4)
      .load()
      .select(col("kind"), col("id"),
        ((col("id") * lit(2654435761L)) % lit(100000L)).as("cents"))
    val admitted = feed.join(history,
      feed("id") === history("seen_id"), "left_anti")
    val agg = admitted.groupBy("kind")
      .agg(count(lit(1)).as("n_admitted"),
        sum(col("cents")).as("cents_admitted"),
        max(col("id")).as("max_id"))
    withStateConf(s, 4) {
      agg.writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("kind")
            .parquet(s"$base/table")
        }
        .start()
        .drainRecorded()
    }
    s.read.parquet(s"$base/table")
      .select(col("kind"), col("n_admitted"), col("cents_admitted"),
        col("max_id"))
      .orderBy("kind")
  }
}
