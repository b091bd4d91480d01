package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Fixed headline subset: the queries the driver's size-bounded
    * stdout capture carries every round (cross-round comparable), and
    * the subset graft.Scale measures slopes for.
    */
  val headline: Set[String] = Set(
    "p_snapshot", "p_insight_gold", "p_corpus_clean", "j3_join_revenue",
    "j2_left_enrich", "a1_pricing_summary", "a2_pivot_daily", "w_topk",
    "set_rollup", "agg_percentile", "dedup_exact", "dedup_minhash",
    "dedup_ngram_jaccard", "dedup_simhash_pairs", "dedup_clusters",
    "sim_topk", "sim_ann_lsh", "text_tfidf", "text_quality", "text_pack",
    "ss_gmb_roundtrip", "ss_json_flatten", "sink_upsert_by_date",
    "sink_compact", "s2_jdbc_source", "s4_rest_source",
    "adv_bucketed_join", "st2_sliding_7day",
    "j5_local_supplier", "dq_expectations", "dq_volume_anomaly",
    "sink_zorder", "dedup_incremental", "text_token_mixture",
    "sim_centroids", "sim_hard_negatives", "text_repetition",
    "text_gopher_quality",
    "agg_sketch_rollup", "text_span_dedup", "sim_kmeans",
    "text_quality_filter", "text_resample", "sink_orc_roundtrip",
    "text_bpe_train", "text_bpe_apply", "p_diverse_subset",
    "dedup_semantic", "text_bm25", "text_lm_score",
    "agg_funnel", "agg_cohort", "agg_quantile_rollup",
    "j_fuzzy_match", "sim_random_proj", "sim_standardize",
    "text_heavy_hitters", "st_gap_fill", "p_entity_resolution",
    "p_merge_cdc", "agg_mode", "dq_referential", "graph_pagerank",
    "agg_correlation", "w_percent_rank", "agg_weighted_avg")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.local(cpus, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet-footer paths so the first measured
    // query doesn't absorb ~4s of one-time session cost.
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    // Ambient-load calibration: a fixed CPU-bound probe (no IO, no
    // shuffle) timed before and after the sweep. Same-code totals have
    // varied ±10% run-to-run on shared machines; the probe pair lets a
    // reader separate "the engine got slower" from "the machine was
    // busy" when diffing artifacts across rounds.
    def calibrate(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 50000000L).selectExpr("sum(id * 3 % 7)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    // Per query: best of 2 runs (standard practice — transient machine
    // load otherwise dominates sub-second queries). A failed query is
    // reported as -1 and excluded from the total, so crashes can't
    // masquerade as timings.
    //
    // The two runs are SEPARATED into two full sweeps (pass 1 times
    // every query cold-first, pass 2 re-times every query) rather than
    // back-to-back. Back-to-back trials share the same wall-clock
    // window, so a transient ambient-load burst (another process on a
    // shared machine) slows BOTH trials of every query scheduled
    // inside it and best-of-2 cannot recover — the round-5 driver
    // artifact showed exactly that: a contiguous alphabetical block
    // 6-10x slower while the suite's median ratio was 1.12. With the
    // trials minutes apart, a burst lands on different queries in
    // each pass and min() discards it.
    // Per-query shuffle volume from the executed plan's SQL metrics —
    // the number that PREDICTS 100 TB behavior where local seconds
    // can't: a query whose shuffle grows linearly with input is bound
    // by it at scale regardless of how fast sf0.1 runs. Summed across
    // the final adaptive plan + subqueries; builder-side jobs of
    // eager queries (training loops, stream drains) happen before the
    // returned frame and are not attributed.
    var shuffleBytes = Map.empty[String, Long]
    // spill + peak-memory from the same executed-plan metrics — the
    // second 100 TB predictor (verdict r7 #7): a query that spills at
    // sf0.1 is memory-bound at 100×, no matter its local seconds.
    // spillSize sums sort/agg/join spills; peakMemory maxes over
    // operators (per-task high-water mark, the number to size
    // executor memory from).
    var spillBytes = Map.empty[String, Long]
    var peakMemBytes = Map.empty[String, Long]
    // stream-drain decomposition (r9 verdict ask #5): a stream_*
    // query's wall time is ~fixed checkpoint/RocksDB/AvailableNow
    // setup plus the actual microbatch work — a real per-batch
    // regression is invisible in the total. Recorded from the pass-2
    // run (same convention as the shuffle metrics): setup = wall −
    // Σ triggerExecution, drain = Σ triggerExecution, addbatch =
    // Σ addBatch (the per-batch work component benchdiff compares).
    var streamBreak = Map.empty[String, (Double, Double, Double, Int)]
    // per-run cost components (round-10 verdict asks #2/#3): `fixture`
    // = one-time disk/db fixture builds (Fixtures.timed sites),
    // `pool` = CachePool entry materializations, `run` = wall − both —
    // the query's own plan cost, which is what benchdiff should
    // compare (a pool rebuild charged to its first consumer read as a
    // 1.7× sim_ann_lsh regression in r10). runBest = best `run` over
    // all recorded runs of the query.
    var fixC = Map.empty[String, Double]   // cold-pass fixture seconds
    var poolC = Map.empty[String, Double]  // cold-pass pool-build seconds
    var runBest = Map.empty[String, Double]
    // the AQE-aware metric rollup lives in plans.ExecMetrics so the
    // PlanAudit spec can pin the same plumbing the artifact reports
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame, name: String,
        recordShuffle: Boolean = false,
        recordComponents: Boolean = false): Double = {
      graft.streaming.StreamStats.drainProgress() // clear stale events
      Fixtures.drainBuilt(); CachePool.drainBuilt() // clear stale builds
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        // Execute the df's OWN plan, fully. Two earlier materializers
        // were both wrong: df.count() runs a SEPARATE QueryExecution
        // (so reading SQLMetrics off df's never-executed plan reported
        // 0 shuffle for every query — round-6 verdict), and any
        // count-shaped plan lets the optimizer PRUNE cardinality-
        // preserving work (Window nodes, final sorts, all column
        // evaluation) — window queries measured as bare scans.
        // toRdd runs the plan that produces the query's actual output,
        // distributed (rows counted per-partition, never collected),
        // and populates the very accumulators planShuffleBytes walks.
        df.queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val fix = Fixtures.drainBuilt().map(_._2).sum
        val pool = CachePool.drainBuilt().map(_._2).sum
        val run = math.max(0.0, dt - fix - pool)
        if (recordComponents) { fixC += name -> fix; poolC += name -> pool }
        runBest += name -> math.min(runBest.getOrElse(name, run), run)
        if (recordShuffle) {
          val prog = graft.streaming.StreamStats.drainProgress()
          if (prog.nonEmpty) {
            def sumMs(key: String): Double = prog.map { p =>
              Option(p.durationMs.get(key)).map(_.toLong).getOrElse(0L)
            }.sum / 1000.0
            val trig = sumMs("triggerExecution")
            streamBreak += name ->
              ((dt - trig).max(0.0), trig, sumMs("addBatch"), prog.size)
          }
        }
        if (recordShuffle)
          try {
            val (sh, sp, pk) = graft.plans.ExecMetrics.walk(df)
            shuffleBytes += name -> sh
            if (sp > 0) spillBytes += name -> sp
            peakMemBytes += name -> pk
          }
          catch { case _: Throwable => () }
        dt
      }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        -1.0
      }
    }
    // optional args = query-name filter (profiling a subset); the
    // driver invokes with no args → full sweep, unchanged
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    var pooled = Set.empty[String] // queries whose runs read CachePool
    var cold = Map.empty[String, Double] // first-run (cold-path) times
    // Interleaved ambient-load probes (round-7 adjudication fix): the
    // pre/post calibration pair brackets the sweep but by construction
    // misses mid-sweep load bursts — two rounds of driver artifacts
    // needed a judge rerun to separate machine noise from regressions.
    // A single CPU-bound probe every PROBE_EVERY queries makes bursts
    // VISIBLE IN THE ARTIFACT: a slow window in the probe series marks
    // exactly which queries' timings are suspect, and
    // tools/benchdiff.py normalizes cross-round ratios by the nearest
    // probe. One probe ≈ 0.4 s; at 205 queries / 15 that is ~6 s per
    // pass — noise against a 100+ s sweep.
    val PROBE_EVERY = 15
    var probeSeries = List.empty[(Int, String, Double)] // (pass, after, sec)
    def probeOnce(pass: Int, after: String): Unit = {
      // min of 2: a single run right after a query completes carries
      // that query's residual cleanup (GC, AQE pools) — observed 2-3x
      // spread vs calibrate()'s min-of-3 on an idle box. The min
      // suppresses it; NOTE the units still differ from calibrate()
      // (min-of-2 vs min-of-3), so benchdiff compares each probe to
      // its OWN artifact's series median, never across kinds.
      val sec = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0, 50000000L).selectExpr("sum(id * 3 % 7)").collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      probeSeries ::= ((pass, after, sec))
    }
    val calibPre = calibrate()
    val order = selected.toSeq.sortBy(_._1)
    // pass 1: cold sweep — first-consumer pool builds land here, and
    // a query that touched pooled intermediates reports a timing that
    // may exclude the pool's one-time build cost — tag it so the
    // artifact can't be read as end-to-end compute cost
    order.zipWithIndex.foreach { case ((name, fn), i) =>
      CachePool.drainTouched()
      cold += name -> timeOnce(fn, name, recordComponents = true)
      if (CachePool.drainTouched().nonEmpty) pooled += name
      if ((i + 1) % PROBE_EVERY == 0) probeOnce(1, name)
    }
    // pass 2: warm sweep, minutes after pass 1; shuffle volume is
    // plan-determined (same both passes), recorded here
    val best2 = order.zipWithIndex.map { case ((name, fn), i) =>
      val a = cold(name)
      val b = if (a >= 0) timeOnce(fn, name, recordShuffle = true) else a
      if ((i + 1) % PROBE_EVERY == 0) probeOnce(2, name)
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }.toMap
    // pass 3 (round-8 verdict ask #1): an ambient-load burst that
    // spans BOTH sweeps defeats best-of-2 — r8's dedup_prefix_jaccard
    // recorded 17.3 s (real: 2.1 s) and needed a judge rerun to
    // clear. So: against the PREVIOUS committed artifact (read before
    // this run overwrites it), re-time any query whose
    // machine-speed-normalized ratio exceeds the benchdiff threshold,
    // at sweep end when the burst has likely passed. All timings are
    // recorded ("retry" map), so a flagged number carries its own
    // adjudication; a genuinely regressed query stays slow in all
    // three and still surfaces.
    val RETRY_THRESHOLD = 1.3
    val MAX_RETRIES = 24 // a machine slow ALL round retries everything
    // — cap the pass so the artifact still lands
    val prevAny = PrevArtifact.load("BENCH_FULL.json")
    // an artifact from a different scale factor is no baseline —
    // cross-sf ratios would flag every query
    val prev = if (prevAny.sf.forall(_ == sfDir)) prevAny
      else PrevArtifact.Prev(Map.empty, None, None)
    val speedFactor = // expected ratio of an UNCHANGED query
      prev.calibMedian.map(c => calibPre / c).getOrElse(1.0)
    val flagged = order.collect {
      case (name, fn) if best2(name) > 0 && prev.queries.get(name)
        .exists(p => p > 0 && best2(name) / p / speedFactor > RETRY_THRESHOLD) =>
        (name, fn)
    }.take(MAX_RETRIES)
    var retry = Map.empty[String, Double]
    flagged.foreach { case (name, fn) =>
      retry += name -> timeOnce(fn, name)
      probeOnce(3, name) // localize ambient load during the retry pass
    }
    val results = best2.map { case (name, v) =>
      name -> (retry.get(name).filter(_ >= 0)
        .map(math.min(v, _)).getOrElse(v))
    }
    def fmt(v: Double) = // Locale.ROOT: "." decimal point, valid JSON
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jsonOf(rs: Seq[(String, Double)]) = rs
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val sorted = results.toSeq.sortBy(_._1)
    val total = results.values.filter(_ >= 0).sum
    // The driver's log-tail capture holds ~2.2KB; the full 100+-query
    // map (~2.5KB and growing) overflowed it in rounds 1-3, losing the
    // per-query numbers ("parsed": null). So: the LAST stdout line is a
    // SHORT parseable JSON with the total plus a fixed headline subset,
    // and the complete per-query map goes to BENCH_FULL.json (committed
    // with the repo, always recoverable).
    val calibPost = calibrate()
    val calibJson =
      s"""{"pre":${fmt(calibPre)},"post":${fmt(calibPost)}}"""
    val pooledJson = pooled.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // "queries" = best of all recorded runs (two sweeps + the retry
    // pass where flagged); "cold" = each query's FIRST run in suite
    // order. Pool entries persist ACROSS queries
    // within the sweep, so a pooled query's cold number includes a
    // shared-intermediate build only when it is that intermediate's
    // first consumer in suite order — later consumers' cold runs are
    // cache hits. The end-to-end build cost of a shared intermediate
    // is the cold time of its alphabetically-first consumer.
    val shuffleJson = shuffleBytes.toSeq.sortBy(_._1)
      .map { case (k, v) => // fractional MB: integer-MB floor read
        // sub-MB (but real) shuffles as "no shuffle" — misleading
        "\"" + k + "\":" + fmt(v / 1048576.0) }
      .mkString("{", ",", "}")
    // streaming queries drain a real microbatch engine — their wall
    // time carries a fixed per-batch scheduling overhead (~1-3 s at
    // ANY sf) that is not plan cost; tagged so a reader doesn't rank
    // them against pure batch plans
    val streamingJson = sorted.map(_._1).filter(_.startsWith("stream_"))
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // per-stream-query (setup, drain, addbatch, batches) from the
    // pass-2 run — the decomposition that makes per-batch regressions
    // visible under the ~2 s fixed drain overhead
    val streamBreakJson = streamBreak.toSeq.sortBy(_._1)
      .map { case (k, (su, dr, ab, nb)) =>
        s""""$k":{"setup":${fmt(su)},"drain":${fmt(dr)},""" +
          s""""addbatch":${fmt(ab)},"batches":$nb}""" }
      .mkString("{", ",", "}")
    val spillJson = spillBytes.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v / 1048576.0) }
      .mkString("{", ",", "}")
    val peakJson = peakMemBytes.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v / 1048576.0) }
      .mkString("{", ",", "}")
    // probe series in sweep order: [pass, after-query, sec] triples —
    // the mid-sweep ambient-load record benchdiff.py normalizes by
    val probeJson = probeSeries.reverse
      .map { case (p, q, v) => s"""[$p,"$q",${fmt(v)}]""" }
      .mkString("[", ",", "]")
    // third-timing record for every retried query: with best-of-2 "a"
    // in "cold" and the final min in "queries", the three timings the
    // verdict asked for are all recoverable from the artifact
    val retryJson = jsonOf(retry.toSeq.sortBy(_._1))
    // cold_components: the pass-1 (fixture, pool, run) decomposition —
    // fixture = Fixtures.timed one-time builds (Derby seed), pool =
    // CachePool materializations, run = wall − both. run_s = each
    // query's best run component over ALL its timed runs; benchdiff
    // compares run_s so a pool/fixture rebuild can never masquerade as
    // a query regression (or mask one).
    val coldCompJson = cold.keys.toSeq.sorted.filter(fixC.contains)
      .map { n =>
        val f = fixC.getOrElse(n, 0.0); val p = poolC.getOrElse(n, 0.0)
        val r = math.max(0.0, cold(n) - f - p)
        s""""$n":{"fixture":${fmt(f)},"pool":${fmt(p)},"run":${fmt(r)}}"""
      }.mkString("{", ",", "}")
    val runJson = jsonOf(runBest.toSeq.sortBy(_._1))
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jsonOf(sorted)},"cold":${jsonOf(cold.toSeq.sortBy(_._1))},"cold_components":$coldCompJson,"run_s":$runJson,"retry":$retryJson,"pooled":$pooledJson,"shuffle_mb":$shuffleJson,"spill_mb":$spillJson,"peak_mem_mb":$peakJson,"calib_series":$probeJson,"streaming":$streamingJson,"stream_breakdown":$streamBreakJson,"calib":$calibJson,"sf":"$sfDir"}"""
    if (args.isEmpty) // a filtered profiling run must not clobber the artifact
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL.json"),
        (fullLine + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () } // best-effort artifact
    val headline = Bench.headline
    // a filtered profiling run exists to print ITS queries' numbers —
    // only the unfiltered sweep (whose 100+-entry map overflows the
    // capture) trims stdout to the headline subset
    val stdoutQs =
      if (args.isEmpty) sorted.filter(p => headline(p._1)) else sorted
    // npooled only: the full pooled name list lives in BENCH_FULL.json
    // (the driver's stdout capture is size-bounded)
    // filtered profiling runs also print their shuffle volumes (the
    // full sweep's map lives in BENCH_FULL.json only — stdout is
    // size-bounded)
    val shortShuffle =
      if (args.isEmpty) "" else {
        val sb = if (streamBreak.isEmpty) ""
          else s""","stream_breakdown":$streamBreakJson"""
        s""","shuffle_mb":$shuffleJson$sb"""
      }
    val shortLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","nqueries":${sorted.size},"npooled":${pooled.size},"nretried":${retry.size},"calib":$calibJson,"queries":${jsonOf(stdoutQs)}$shortShuffle,"sf":"$sfDir","full":"BENCH_FULL.json"}"""
    println(shortLine)
    spark.stop()
  }
}

/** Reader for the PREVIOUS committed BENCH_FULL.json — the retry
  * pass's comparison baseline. json4s rides Spark's own classpath.
  * Any parse problem degrades to "no baseline" (no retries), never an
  * aborted bench.
  */
private[graft] object PrevArtifact {
  final case class Prev(queries: Map[String, Double],
      calibMedian: Option[Double], sf: Option[String] = None)

  def load(path: String): Prev = try {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val j = JsonMethods.parse(txt)
    def num(v: JValue): Option[Double] = v match {
      case JDouble(d) => Some(d)
      case JInt(i) => Some(i.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case JLong(l) => Some(l.toDouble)
      case _ => None
    }
    val qs = j \ "queries" match {
      case JObject(fs) => fs.flatMap { case (k, v) => num(v).map(k -> _) }
        .toMap
      case _ => Map.empty[String, Double]
    }
    val cal = j \ "calib" match {
      case JObject(fs) =>
        val vs = fs.flatMap { case (_, v) => num(v) }
        if (vs.isEmpty) None else Some(vs.sum / vs.size)
      case _ => None
    }
    val sf = j \ "sf" match {
      case JString(s) => Some(s)
      case _ => None
    }
    Prev(qs, cal, sf)
  } catch { case _: Throwable => Prev(Map.empty, None, None) }
}
