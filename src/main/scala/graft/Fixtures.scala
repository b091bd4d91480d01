package graft

/** One-time fixture-build cost registry (round-10 verdict ask #3).
  * Some queries pay a first-touch cost that is NOT plan cost — the
  * embedded-Derby seed behind the JDBC source, a pooled intermediate's
  * materialization — and BENCH_FULL.json's `cold` numbers conflated
  * them with execution (ss_gmb_location read as 18 s "cold" when the
  * plan runs in 1.3 s warm). Every such build site wraps itself in
  * `timed(tag)`; Bench drains the buffer per timed run and emits
  * per-query (fixture_s, pool_s, run_s) components, the same way
  * stream_breakdown decomposes stream drains. A regression in fixture
  * or pool code then shows up in ITS component, not as a phantom query
  * regression (and vice versa).
  */
object Fixtures {
  private val buf =
    scala.collection.mutable.ArrayBuffer.empty[(String, Double)]

  /** Run `build`, recording its wall time under `tag`. Call ONLY
    * around genuine one-time work (a hit-path call would record ~0 s
    * entries, which is harmless but noisy).
    */
  def timed[T](tag: String)(build: => T): T = {
    val t0 = System.nanoTime()
    val v = build
    val dt = (System.nanoTime() - t0) / 1e9
    synchronized { buf += tag -> dt }
    v
  }

  /** (tag, seconds) builds recorded since the previous drain. */
  def drainBuilt(): Seq[(String, Double)] = synchronized {
    val out = buf.toSeq
    buf.clear()
    out
  }
}
