package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hints for build sides the static planner can't
  * size (derived/cached intermediates with no relation stats).
  *
  * An unconditional `broadcast()` on a side that GROWS with the data is
  * a forced-OOM at scale: the hint overrides every threshold, so a
  * candidate set that is MBs at sf0.01 but TBs at 100 TB would still be
  * collected to the driver and shipped to every executor. The gate keeps
  * the hint only when a measured row count says the side fits the
  * session's own `spark.sql.autoBroadcastJoinThreshold`; above it (or
  * when auto-broadcast is disabled) the join plans shuffled and AQE is
  * free to re-plan a runtime broadcast from ACTUAL shuffle sizes —
  * behavior degrades with data size instead of failing.
  */
object Broadcasts {

  /** The session's auto-broadcast threshold in bytes; -1 when disabled. */
  def thresholdBytes(s: SparkSession): Long = {
    val v = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    if (v.startsWith("-")) -1L
    else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
  }

  /** `broadcast(df)` iff `rows * bytesPerRow` fits the session
    * threshold (and auto-broadcast isn't disabled); `df` untouched
    * otherwise. `rows` should come from a count the caller pays anyway
    * (e.g. materializing a CachePool entry), never a dedicated job over
    * unbounded input.
    */
  def gated(s: SparkSession, df: DataFrame, rows: Long,
      bytesPerRow: Long): DataFrame = {
    val t = thresholdBytes(s)
    if (t > 0 && rows <= t / math.max(1L, bytesPerRow)) broadcast(df) else df
  }
}
