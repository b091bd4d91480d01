package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryProgress}

/** Per-run progress capture for the AvailableNow stream drains — the
  * round-9 verdict's bench ask: a `stream_*` query's wall time is
  * dominated by FIXED setup (checkpoint init, RocksDB load, microbatch
  * scheduling), so a real per-batch regression is invisible in the
  * total. Every drain site funnels its StreamingQuery through
  * `drain()`, which blocks to termination and then snapshots
  * `recentProgress` (populated synchronously by the stream execution
  * thread as each batch commits — no async listener-bus race). Bench
  * drains the buffer per query and decomposes wall time into
  * (setup, trigger-execution, addBatch) in BENCH_FULL.json;
  * tools/benchdiff.py compares the work component for stream queries.
  */
object StreamStats {
  private val buf =
    scala.collection.mutable.ArrayBuffer.empty[StreamingQueryProgress]

  /** Await the query's termination and record its batch progress. */
  def drain(q: StreamingQuery): Unit = {
    q.awaitTermination()
    val prog = q.recentProgress
    // recentProgress is a RING buffer sized by
    // spark.sql.streaming.numRecentProgressUpdates (Sessions raises it
    // to 1000): a drain with more microbatches than the cap silently
    // drops the earliest events and the setup/drain/addBatch
    // decomposition undercounts. Make that loud, never silent.
    val cap = try q.sparkSession.conf
      .get("spark.sql.streaming.numRecentProgressUpdates").toInt
    catch { case _: Throwable => 100 }
    if (prog.length >= cap)
      System.err.println(s"[StreamStats] WARNING: query ${q.name} hit " +
        s"the recentProgress cap ($cap) — breakdown undercounts")
    synchronized { buf ++= prog }
  }

  /** Progress events recorded since the previous call. */
  def drainProgress(): Seq[StreamingQueryProgress] = synchronized {
    val out = buf.toSeq
    buf.clear()
    out
  }

  /** `.start().drainRecorded()` — the awaitTermination shape every
    * drain site already had, plus the progress capture.
    */
  implicit class RecordedQuery(private val q: StreamingQuery)
      extends AnyVal {
    def drainRecorded(): Unit = StreamStats.drain(q)
  }
}
