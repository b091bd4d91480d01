package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded LRU of cached per-operator DataFrames, keyed by
  * (session, tag). One pool for every operator-level `.cache()` in the
  * engine: a 93-query Verify/Bench session would otherwise accumulate
  * each query's private cache in executor storage memory until the
  * session dies, degrading *unrelated* later queries (the measured
  * round-2 symptom: untouched queries slowed 2-9× as storage filled).
  *
  * Entries are access-ordered; inserting past capacity unpersists and
  * drops the least-recently-used entry, so both driver heap and
  * executor storage stay bounded no matter how many (session, dir)
  * combinations a long-lived process sees. Tags embed every input that
  * determines the plan (dir, parameters), so a hit is always the same
  * deterministic DataFrame — repeated queries (bench best-of-2,
  * cross-query shared subplans like the similarity corpus) reuse the
  * materialized cache instead of re-deriving it.
  *
  * (A weak-keyed map would not work here: the cached DataFrame value
  * strongly references its own SparkSession key, which per WeakHashMap's
  * contract pins the entry forever.)
  */
object CachePool {
  // comfortably above the ~40 distinct tags a single-dir session
  // creates (round 9 added prefixCand / bandIndex / bpeEncoded): the
  // bound exists to stop UNBOUNDED accumulation across many
  // (session, dir) combinations, not to evict the live working set —
  // a Max at-or-under the tag count makes any full sweep thrash
  // evict/recompute (sequential access is LRU's worst case: round 8's
  // 33rd tag evicted the sweep's oldest entries right before their
  // pass-2 reuse, and the pooled graph/cluster queries silently went
  // cold — 0.03 s → 2.5 s each). Two-dir sessions (tests run
  // sf0.001 + sf0.01) hold two working sets at once, hence ≥ 2×40
  // with headroom.
  private val Max = 128
  private val memo =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame])
          : Boolean = {
        val evict = size() > Max
        if (evict) {
          // the evicted entry's session may already be stopped — its
          // cache died with it, and unpersist through a stopped
          // context throws; never let that abort the LIVE query whose
          // insertion triggered this eviction
          try {
            if (!e.getKey._1.sparkContext.isStopped) e.getValue.unpersist()
          } catch { case _: Throwable => () }
        }
        evict
      }
    }

  // tags touched since the last drain — lets the bench harness mark
  // which queries read pooled intermediates (their best-of-2 timing
  // reflects a cache hit, not end-to-end compute)
  private val touched = scala.collection.mutable.LinkedHashSet[String]()

  /** Tags accessed through `cached` since the previous drain. */
  def drainTouched(): Seq[String] = memo.synchronized {
    val out = touched.toSeq
    touched.clear()
    out
  }

  // (tag, seconds) of pool entries MATERIALIZED since the last drain
  // (round-10 verdict asks #2/#3): a shared intermediate's one-time
  // build used to be silently charged to whichever query consumed it
  // first (sim_ann_lsh absorbed bruteForceTopK's build and read as a
  // 1.7× regression). `cached` now materializes eagerly under a timer,
  // so Bench can attribute the build to a `pool` component and report
  // the query's own cost as `run`.
  private val built =
    scala.collection.mutable.ArrayBuffer.empty[(String, Double)]

  /** (tag, seconds) cache materializations since the previous drain. */
  def drainBuilt(): Seq[(String, Double)] = memo.synchronized {
    val out = built.toSeq
    built.clear()
    out
  }

  // ---- value-object lane ----------------------------------------
  // Driver-side trained state that is NOT a DataFrame (PQ codebooks:
  // O(m·k·d) doubles; the legal iterative-algorithm collect shape)
  // but wants the same pooling contract: keyed by (session, tag),
  // bounded count, access-ordered eviction, entries die with their
  // session. One lane for every such memo so no operator grows a
  // bespoke driver-side map with hand-rolled eviction (round-9
  // review finding on Similarity.booksMemo). Values need no
  // unpersist — dropping the reference is the whole eviction.
  private val ValMax = 64
  private val valMemo =
    new java.util.LinkedHashMap[(SparkSession, String), AnyRef](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), AnyRef])
          : Boolean = size() > ValMax
    }

  /** The memoized value for (s, tag), building it on first use.
    * `build` must be a pure function of (s, tag); it may run Spark
    * jobs (training collects) but must return plain driver objects.
    */
  def memoized[T <: AnyRef](s: SparkSession, tag: String)(build: => T): T = {
    memo.synchronized { touched += tag } // never nested inside valMemo's
    val key = (s, tag)
    val hit = valMemo.synchronized {
      val it = valMemo.keySet().iterator()
      while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
      valMemo.get(key)
    }
    if (hit != null) hit.asInstanceOf[T]
    else {
      // build OUTSIDE the lock: training collects run Spark jobs for
      // seconds and must not block unrelated memo lookups. Builds are
      // pure functions of (s, tag), so a rare concurrent double-build
      // is wasted work, never divergent state — last insert wins.
      val t0 = System.nanoTime()
      val v = build
      val dt = (System.nanoTime() - t0) / 1e9
      memo.synchronized { built += tag -> dt }
      valMemo.synchronized { valMemo.put(key, v) }
      v
    }
  }

  /** The cached DataFrame for (s, tag), building + `.cache()`-ing it on
    * first use. `build` must be a pure function of (s, tag).
    *
    * The miss path MATERIALIZES the cache eagerly (a count() over the
    * freshly `.cache()`d frame) under a timer recorded in `drainBuilt`.
    * Lazily-cached entries were materialized inside the first
    * consumer's job, so the pool's one-time cost was indistinguishable
    * from that query's own cost in every timing artifact. The count
    * runs OUTSIDE the memo lock (it is a multi-second Spark job;
    * concurrent lookups of other tags must not block behind it) — a
    * concurrent consumer of the same tag simply races the
    * materialization, which Spark's cache locking already handles.
    */
  def cached(s: SparkSession, tag: String)(build: => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    val (df, miss) = memo.synchronized {
      touched += tag
      // entries keyed by a stopped session are dead weight (their
      // executor-side cache died with the context, but the entry still
      // pins session + plan objects on the driver until 32 newer tags
      // push it out) — drop them eagerly; their storage needs no
      // unpersist, the stopped context already released it
      val it = memo.keySet().iterator()
      while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
      val key = (s, tag)
      val hit = memo.get(key)
      if (hit != null) (hit, false)
      else {
        // build inside the lock (as before — double-builds of a cached
        // frame would double executor storage); iterative builds run
        // their internal checkpoint jobs here, which the timer covers
        val fresh = build.cache()
        memo.put(key, fresh)
        (fresh, true)
      }
    }
    if (miss) {
      try df.count()
      catch { case _: Throwable => () } // consumer's own run reports it
      val dt = (System.nanoTime() - t0) / 1e9
      memo.synchronized { built += tag -> dt }
    }
    df
  }
}
