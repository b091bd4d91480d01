package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.{SparkSpec, SparkEntry}
import graft.operators._

/** Plan-quality regression guards: the physical-plan properties the
  * engine is designed around (pushdown reaching the parquet scan,
  * broadcast semi joins instead of collected ID lists, equi joins with
  * range residuals instead of pair scans) asserted so a refactor can't
  * silently trade them away. PLANS.md is the human-readable audit;
  * these are the executable version.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("snapshot: broadcast LEFT SEMI join + filter pushed to the scan") {
    val p = plan(Relational.snapshot(spark, sfDir))
    assert(p.contains("LeftSemi"), p.take(800))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      p.take(800))
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(2000))
  }

  test("scanProject: ReadSchema pruned to the projected columns") {
    val p = plan(Relational.scanProject(spark, sfDir))
    val schemaLine = p.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    // projection reaches the scan: far fewer columns than lineitem's 11
    assert(schemaLine.nonEmpty)
    assert(schemaLine.split(",").length <= 5, schemaLine)
  }

  test("intervalJoin: equi join with range residual, no cartesian/BNLJ") {
    val p = plan(Advanced.intervalJoin(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // the range predicate rides as a join condition, not a pair scan
    assert(p.contains("Join condition") || p.contains("Join cond"),
      p.take(2000))
  }

  test("hashSample: sampling predicate evaluated before any exchange") {
    val p = plan(Relational.hashSample(spark, sfDir))
    val filterIdx = p.indexOf("Filter")
    val exchangeIdx = p.indexOf("Exchange")
    assert(filterIdx >= 0 && exchangeIdx >= 0)
    // formatted output lists operators leaves-first: the filter node
    // must appear in the scan pipeline, i.e. the scan carries pushed
    // filters or a Filter precedes the first Exchange
    assert(p.contains("PushedFilters") || filterIdx < exchangeIdx, p.take(2000))
  }

  test("insightGold: dimension joins broadcast, no shuffled dim join") {
    val p = plan(Pipelines.insightGold(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("gmb flatteners: ONE parse per schema (attribute barrier holds) " +
    "and the base scans stay column-pruned") {
    // the round-7 plan carried 22 JsonToStructs for ss_gmb_location —
    // every output column re-parsed the doc with a pruned schema, and
    // codegen CSE could not merge the differently-pruned copies. The
    // barrier projection caps it at the 2 declared parses (full +
    // guard-subtree); a refactor that re-inlines the parse fails here.
    def parses(df: DataFrame): Int = {
      var n = 0
      df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(
        _.foreach {
          case _: org.apache.spark.sql.catalyst.expressions.JsonToStructs =>
            n += 1
          case _ => ()
        }))
      n
    }
    assert(parses(SemiStructured.gmbLocationRoundTrip(spark, sfDir)) <= 2)
    assert(parses(SemiStructured.gmbMediaRoundTrip(spark, sfDir)) <= 1)
    assert(parses(SemiStructured.gmbVomRoundTrip(spark, sfDir)) <= 1)
    assert(parses(SemiStructured.gmbLocalPostsRoundTrip(spark, sfDir)) <= 1)
    // the doc is SYNTHESIZED from customer⨝nation — the scans under
    // all that JSON work must still read only the columns the fixture
    // uses, not the full tables
    val p = plan(SemiStructured.gmbLocationRoundTrip(spark, sfDir))
    val custSchema = p.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("c_custkey"))
      .mkString
    assert(custSchema.nonEmpty, "no pruned customer scan found")
    assert(custSchema.split(",").length <= 5, custSchema)
  }

  test("every declared query plans without error at sf0.001") {
    // catches analysis-time breaks in queries the specs don't
    // individually cover. Queries registered in SparkEntry.eagerWriters
    // execute write/CTAS jobs inside their builders (the write IS the
    // operator) — invoking them here would run jobs and mutate the
    // shared catalog mid-suite, so Verify exercises those end-to-end
    // instead.
    SparkEntry.queries.filterNot { case (n, _) =>
      SparkEntry.eagerWriters(n) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).queryExecution.executedPlan
        catch { case e: Throwable =>
          fail(s"$name failed to plan: ${e.getMessage}")
        }
      }
  }

  test("repetition/gopherQuality: row-local — no hash-partition shuffle") {
    // the row-local design claim, asserted: the only exchange either
    // plan may contain is the final orderBy's range partitioning
    for (df <- Seq(TextAnalysis.repetition(spark, sfDir),
        TextAnalysis.gopherQuality(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("hashpartitioning"), p.take(2000))
    }
  }

  test("labelCentroids: partial aggregation before the one shuffle") {
    val p = plan(Similarity.labelCentroids(spark, sfDir))
    // map-side combine collapses each split to |labels|×|dims| rows
    assert(p.contains("partial_sum") || p.contains("Partial"), p.take(2000))
    // formatted mode lists partitioning in the node detail sections
    val hashExchanges = "hashpartitioning\\(".r.findAllIn(p).size
    assert(hashExchanges == 1, s"$hashExchanges hash exchanges\n${p.take(2000)}")
  }

  test("tokenMixture: one shuffle, keyed by source for the window") {
    val p = plan(TextAnalysis.tokenMixture(spark, sfDir))
    val hashExchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toSeq
    assert(hashExchanges.size == 1, p.take(2000))
    assert(hashExchanges.head.contains("source"), hashExchanges.head)
  }

  test("q5LocalSupplier: dims broadcast, date filter pushed, no pair scan") {
    val p = plan(Relational.q5LocalSupplier(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // region/nation and supplier ride broadcast; the fact chain doesn't
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 2, s"$broadcasts broadcast joins\n${p.take(1500)}")
    // the order-date range reaches the parquet scan
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)") ||
      p.contains("GreaterThanOrEqual(o_orderdate"), p.take(3000))
  }

  test("data-proportional build sides degrade to shuffled joins when " +
    "auto-broadcast is off — no forced hint can OOM the driver") {
    // the 100 TB failure mode, simulated: with the threshold disabled
    // (as if the ID/candidate sets had outgrown it) the plans must fall
    // back to shuffled joins and still produce the same rows — proving
    // no unconditional broadcast() hint remains on a side that grows
    // with the data
    val conf = spark.conf
    val expected = Relational.snapshot(spark, sfDir).count()
    val expectedMh = Dedup.minhashPairs(spark, sfDir).count()
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = plan(Relational.snapshot(spark, sfDir))
      assert(!p.contains("BroadcastHashJoin"), p.take(1500))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(1500))
      assert(p.contains("LeftSemi"), p.take(1500))
      assert(Relational.snapshot(spark, sfDir).count() == expected)
      // the candidate-verify joins (corpus-proportional) must go
      // shuffled; the bounded hot-key hint inside pairCounts may stay
      val pm = plan(Dedup.minhashPairs(spark, sfDir))
      assert(pm.contains("SortMergeJoin") || pm.contains("ShuffledHashJoin"),
        pm.take(2000))
      assert(Dedup.minhashPairs(spark, sfDir).count() == expectedMh)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("join3Revenue: no Expand — order grain pre-aggregated, so the " +
    "distinct-order count never plans a row-duplicating rewrite") {
    val p = plan(Relational.join3Revenue(spark, sfDir))
    assert(!p.contains("Expand"), p.take(2000))
    // lineitem partial-aggregates to order grain before any join
    assert(p.contains("partial"), p.take(2000))
  }

  test("spendStanding: global percent_rank/cume_dist with NO " +
    "single-partition exchange — ranks are bucket-local + offsets") {
    val p = plan(Analytics.spendStanding(spark, sfDir))
    assert(!p.contains("SinglePartition"), p.take(2500))
    // the one data shuffle is the bucket window's hash partitioning
    assert(p.contains("Window"), p.take(1200))
    assert(p.linesIterator.exists(l => l.contains("hashpartitioning(") &&
      l.contains("bkt")), p.take(2500))
  }

  test("curriculumStages: the global length order runs bucket-local " +
    "— no single-partition window exchange anywhere in the plan") {
    val p = plan(graft.operators.Pipelines.curriculumStages(spark, sfDir))
    assert(p.contains("Window"), p.take(1200))
    assert(!p.linesIterator.exists(l => l.contains("Window") &&
      l.contains("SinglePartition")), p.take(2500))
    assert(p.linesIterator.exists(l => l.contains("hashpartitioning(") &&
      l.contains("bkt")), p.take(2500))
  }

  test("spendQuartiles: ntile via the same bucket-rank machinery — " +
    "no single-partition exchange, no built-in global ntile window") {
    val p = plan(Analytics.spendQuartiles(spark, sfDir))
    assert(!p.contains("SinglePartition"), p.take(2500))
    assert(p.linesIterator.exists(l => l.contains("hashpartitioning(") &&
      l.contains("bkt")), p.take(2500))
  }

  test("bradleyTerry: ONE corpus scan feeds the pooled O(langs²) " +
    "pair table; the MM fixpoint leaves NOTHING corpus-sized in the " +
    "output plan") {
    // round-12 pin (verdict ask #4): the causal plane's flagship — the
    // corpus collapses to a constant-cardinality pair-count table in a
    // single pooled groupBy (consecutive-id pairing, no self join);
    // the MM iterations run driver-side on the collected table, so
    // the OUTPUT plan is a local table + sort: no scan, no join, no
    // exchange proportional to anything. A refactor that drags the
    // fixpoint back through the scheduler fails here.
    val df = Learn.bradleyTerry(spark, sfDir)
    val p = plan(df)
    assert(p.contains("LocalTableScan"), p.take(1200))
    assert(!p.contains("Scan parquet"), p.take(1200))
    assert(!p.contains("Join"), p.take(1200))
  }

  test("sprt/groupSeq: cumulative walks ride per-type windows — no " +
    "single-partition window exchange (the st_* discipline)") {
    // round-12 pin: the sequential-testing pair's prefix scans must
    // stay partitioned by event_type; a global-ordered window would
    // serialize the corpus through one task at scale.
    for (df <- Seq(Analytics.sprt(spark, sfDir),
        Analytics.groupSeq(spark, sfDir))) {
      val p = plan(df)
      assert(p.contains("Window"), p.take(1200))
      assert(!p.linesIterator.exists(l => l.contains("Window") &&
        l.contains("SinglePartition")), p.take(2500))
      assert(p.linesIterator.exists(l => l.contains("hashpartitioning(") &&
        l.contains("event_type")), p.take(2500))
    }
  }

  test("psm: the caliper match is an EQUI join on the covariate " +
    "bucket — never a pair scan, constant 3x bounded-side explode") {
    val p = plan(graft.operators.Pipelines.psm(spark, sfDir))
    // (the final 1-row readout crossJoins legitimately plan as tiny
    // broadcast nested loops; the DATA-proportional join must not)
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the caliper join is keyed on the covariate bucket (BHJ at toy
    // sf, SMJ with a bkt exchange at scale — keys are what's pinned)
    assert(p.linesIterator.exists(l => l.contains("keys") &&
      l.contains("bkt")), p.take(2500))
    // the 1-NN winner is one aggregate (min struct), not a window rank
    assert(!p.contains("Window"), p.take(1200))
  }

  test("incremental: candidate joins are equi-joins, never pair scans") {
    val p = plan(Dedup.incremental(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("spanDedup: exactly one span-hash exchange plus the doc reassembly") {
    val p = plan(TextAnalysis.spanDedup(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // span construction stays row-local: the only hash exchanges are
    // the first-occurrence window (md5 partition) and the doc_id
    // reassembly groupBy/join
    val hashParts = p.linesIterator
      .filter(_.contains("hashpartitioning(")).size
    assert(hashParts <= 3, s"$hashParts hash exchanges\n${p.take(1500)}")
  }

  test("kmeans: assignment is row-local — no join, no N x k expansion") {
    val p = plan(Similarity.kmeans(spark, sfDir))
    assert(!p.contains("Join"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("qualityFilter/resample: single-window and shuffle-free shapes") {
    val pq = plan(TextAnalysis.qualityFilter(spark, sfDir))
    // one window sort over the source partition; no join
    assert(pq.contains("Window"), pq.take(800))
    assert(!pq.contains("Join"), pq.take(1200))
    val pr = plan(TextAnalysis.resample(spark, sfDir))
    // epoch explosion is row-local: no exchange except the final sort
    assert(!pr.linesIterator.exists(l => l.contains("hashpartitioning(")),
      pr.take(1500))
  }

  test("runtime bloom filter prunes the fact side when dims can't broadcast") {
    // at 100 TB the date-filtered orders side of q5LocalSupplier
    // outgrows the broadcast threshold and its lineitem join falls
    // back to shuffle — assert Spark's runtime bloom filter then
    // prunes fact rows before the exchange (the injection rule needs
    // a selective creation-side predicate, which the order-date range
    // provides; thresholds lowered so the small SF qualifies)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "creationSideThreshold", "100MB")
      val p = plan(Relational.q5LocalSupplier(spark, sfDir))
      assert(p.contains("might_contain"), p.take(2500))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("typeCooccurrence: the self-joined distinct's exchange is " +
    "computed once and reused") {
    // ReuseExchange matches canonicalized subplans at physical
    // planning; with AQE the reuse happens at stage materialization
    // instead, so pin it on the non-adaptive plan where it is a
    // static, assertable property
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val p = graft.operators.Aggregates
        .typeCooccurrence(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"), p.take(2500))
    } finally saved match {
      case Some(v) => conf.set("spark.sql.adaptive.enabled", v)
      case None => conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("AQE re-plans at runtime: small shuffle partitions coalesce") {
    // the conf is asserted ON elsewhere; this asserts it DOES something:
    // after execution the adaptive plan's shuffle reads must have
    // coalesced the 32 tiny sf0.001 partitions
    val df = Relational.join3Revenue(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AQEShuffleRead"), p.take(1500))
    assert(p.toLowerCase.contains("coalesced"), p.take(1500))
  }

  test("fuzzyMatch: equi join on the block key, never a pair scan") {
    val p = plan(Advanced.fuzzyMatch(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // levenshtein must be a post-join filter, not the join itself
    assert(p.contains("levenshtein"), p.take(2000))
  }

  test("randomProjection: row-local kernel — no exchange before the sort") {
    val p = plan(Similarity.randomProjection(spark, sfDir))
    // exactly one exchange: the final orderBy's range partitioning;
    // the projection itself must not shuffle or join
    assert("Exchange".r.findAllIn(p.linesIterator
      .filter(_.matches("^\\(\\d+\\) .*")).mkString("\n")).size <= 2, p.take(1500))
    assert(!p.contains("Join"), p.take(800))
    assert(p.contains("vector_project") || p.contains("vectorproject"),
      p.take(2000))
  }

  test("quantileRollup: sketches partial-aggregate before the shuffle") {
    val p = plan(Analytics.quantileRollup(spark, sfDir))
    // the custom Aggregator must plan map-side partials (two-phase
    // HashAggregate/ObjectHashAggregate), not a single global agg
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate")
      || p.contains("HashAggregate"), p.take(1200))
    assert(p.contains("partial"), p.take(2000))
  }

  test("funnel: all stage shuffles hash the same key (user_id)") {
    val p = plan(Analytics.funnel(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // stage aggregates arrive as partial+final pairs on user_id
    assert(p.contains("partial"), p.take(2000))
  }

  test("rank-filter top-k plans WindowGroupLimit (partial+final heap " +
    "pruning), so no custom top-k operator is needed") {
    // the one operator we considered hand-building a custom
    // SparkPlan for — per-group top-k without sorting whole
    // partitions — is already planned by Spark's InferWindowGroupLimit:
    // a map-side group-limit prunes to k rows per key BEFORE the
    // exchange, a final one after. Pin it so a conf/refactor can't
    // silently fall back to sort-everything.
    val p = plan(Similarity.hardNegatives(spark, sfDir))
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("mergeCdc: one full-outer join on the merge key, no pair scan") {
    val p = plan(Pipelines.mergeCdc(spark, sfDir))
    assert(p.contains("FullOuter"), p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("gapFill: the spine joins broadcast; events aggregate partially") {
    val p = plan(Analytics.gapFill(spark, sfDir))
    assert(p.contains("partial"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("standardize: one moment shuffle, stats re-enter via broadcast") {
    val p = plan(Similarity.standardize(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("partial"), p.take(2000))
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // one key owns ~95% of the left side — the exact shape salting
    // guards against. With the skew-join thresholds scaled to the
    // small sf, AQE must mark the SMJ skew=true and split the hot
    // partition instead of letting one task drag the stage.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin." +
        "skewedPartitionThresholdInBytes", "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
      // fanOut matters: a skewed REDUCE partition is split along MAP
      // output blocks, so a single-file scan (one map task) is
      // unsplittable no matter how skewed. The right side must be a
      // bare keyed relation: OptimizeSkewedJoin pattern-matches Sort
      // directly over the shuffle stage, and an aggregate in between
      // (e.g. a distinct) silently disqualifies the join.
      val left = graft.Tables.fanOut(graft.Tables.events(spark, sfDir))
        .select(when(col("event_id") % 50 === 0, col("event_id"))
          .otherwise(lit(0L)).as("k"), col("value"))
      val right = spark.range(0, 20000)
        .select(col("id").as("k"), (col("id") + 1).as("tag"))
      val df = left.join(right, "k")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("heavyHitters: candidates re-enter via broadcast, counts partial") {
    val p = plan(TextAnalysis.heavyHitters(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(1500))
    assert(p.contains("partial"), p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  // formatted plans put the file path on a per-scan Location line —
  // counting those counts the table's scans
  private def scansOf(p: String, table: String): Int =
    p.linesIterator.count(l =>
      l.contains("Location") && l.contains(s"$table.parquet"))

  test("q17: decorrelated per-key avg is ONE lineitem scan via a " +
    "key-partitioned window — no self-join double scan") {
    val p = plan(Subqueries.q17SmallQtyRevenue(spark, sfDir))
    val liScans = scansOf(p, "lineitem")
    assert(liScans == 1, s"$liScans lineitem scans\n${p.take(2500)}")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q21: EXISTS/NOT-EXISTS decorrelate to window predicates — one " +
    "lineitem scan, no correlated re-probe joins") {
    val p = plan(Subqueries.q21SoleFailingSupplier(spark, sfDir))
    val liScans = scansOf(p, "lineitem")
    assert(liScans == 1, s"$liScans lineitem scans\n${p.take(2500)}")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // ONE l_orderkey exchange feeds grain aggregate AND window (the
    // explicit ok-repartition satisfies both clusterings)
    val okExchanges = p.linesIterator.count(l =>
      l.contains("hashpartitioning(l_orderkey"))
    assert(okExchanges == 1, s"$okExchanges l_orderkey exchanges")
  }

  test("q2: correlated MIN decorrelates to a key-partitioned window — " +
    "one lineitem scan, dims broadcast, no pair scan") {
    val p = plan(Subqueries.q2MinCostSupplier(spark, sfDir))
    assert(scansOf(p, "lineitem") == 1, p.take(2500))
    assert(p.contains("Window"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q11: global HAVING scalar reads the materialized per-part " +
    "table — zero lineitem re-scans in the final plan") {
    val p = plan(Subqueries.q11ImportantParts(spark, sfDir))
    assert(scansOf(p, "lineitem") == 0, p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(800)) // 1-row cross
    // join plans as BroadcastNestedLoopJoin over a single-row build —
    // constant-size, the blessed scalar re-entry shape
  }

  test("q16: NOT IN plans as a NULL-AWARE anti join (not a plain " +
    "LeftAnti), single COUNT(DISTINCT) plans without Expand") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val qe = Subqueries.q16SupplierCount(spark, sfDir).queryExecution
    val anti = qe.sparkPlan.collect {
      case b: BroadcastHashJoinExec
        if b.joinType.sql.contains("ANTI") => b
    }
    assert(anti.nonEmpty, qe.sparkPlan.toString.take(2000))
    assert(anti.exists(_.isNullAwareAntiJoin),
      s"anti join is not null-aware: ${anti.map(_.verboseString(3))}")
    val p = plan(Subqueries.q16SupplierCount(spark, sfDir))
    assert(!p.contains("Expand"), p.take(2500))
  }

  test("q20: nested IN + correlated scalar — one lineitem scan (grain " +
    "groupBy and dominance window share the exchange), semi join out") {
    val p = plan(Subqueries.q20DominantSupplier(spark, sfDir))
    assert(scansOf(p, "lineitem") == 1, p.take(2500))
    assert(p.contains("Window"), p.take(2000))
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("snapshotDiff: both sides fingerprint from the one materialized " +
    "base projection — zero fact re-scans") {
    val p = plan(Quality.snapshotDiff(spark, sfDir))
    assert(scansOf(p, "orders") == 0, p.take(2500))
    assert(p.contains("FullOuter"), p.take(2000))
  }

  test("q3/q10 top-k: TakeOrderedAndProject (per-partition heap + k-row " +
    "driver merge), never a global sort; all three filters pushed") {
    for (df <- Seq(Relational.q3ShippingPriority(spark, sfDir),
        Relational.q10ReturnedItems(spark, sfDir))) {
      val p = plan(df)
      assert(p.contains("TakeOrderedAndProject"), p.take(1500))
      assert(!p.contains("rangepartitioning"), p.take(2000))
    }
    // the three selective predicates reach their scans
    val p3 = plan(Relational.q3ShippingPriority(spark, sfDir))
    assert(p3.contains("EqualTo(c_mktsegment,BUILDING)"), p3.take(3000))
    assert(p3.contains("LessThan(o_orderdate"), p3.take(3000))
    assert(p3.contains("GreaterThan(l_shipdate"), p3.take(3000))
  }

  test("q19: the OR-of-conjuncts splits per side and pushes THROUGH the " +
    "join — both scans carry their disjunction, pruning pre-join") {
    val p = plan(Relational.q19DisjunctiveRevenue(spark, sfDir))
    val pushedLines = p.linesIterator
      .filter(_.contains("PushedFilters")).toSeq
    // lineitem scan: quantity-range disjunction; part scan: brand/size
    assert(pushedLines.exists(l => l.contains("Or(") &&
      l.contains("l_quantity")), p.take(3000))
    assert(pushedLines.exists(l => l.contains("Or(") &&
      l.contains("p_brand")), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q13: ON-clause predicate keeps the join LeftOuter (a WHERE " +
    "would drop order-less customers) and pushes to the orders scan") {
    val p = plan(Relational.q13OrderHistogram(spark, sfDir))
    assert(p.contains("LeftOuter"), p.take(2000))
    assert(p.contains("Not(EqualTo(o_orderpriority,1-URGENT))"), p.take(3000))
  }

  test("tokenBudgetFill: one source-keyed exchange, running-sum frame, " +
    "no join") {
    val p = plan(TextAnalysis.tokenBudgetFill(spark, sfDir))
    assert(!p.contains("Join"), p.take(1200))
    val hashExchanges = p.linesIterator
      .filter(_.contains("hashpartitioning(")).toSeq
    assert(hashExchanges.size == 1, p.take(2000))
    assert(hashExchanges.head.contains("source"), hashExchanges.head)
  }

  test("dppPrune: the fact scan carries a dynamic-pruning subquery — " +
    "only dim-matching partition directories are read") {
    val p = plan(Advanced.dppPrune(spark, sfDir))
    val factScan = p.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n")
    assert(factScan.contains("dynamicpruningexpression"), p.take(3000))
    // the join's month-derivation also pushed back as STATIC partition
    // filters (year/quarter recomputed from the dir name) — both
    // pruning layers on one scan
    assert(factScan.contains("substring(o_month"), factScan)
  }

  test("q15: the scalar MAX re-enters via a 1-row broadcast cross " +
    "join over the MATERIALIZED revenue table — zero re-scans") {
    val p = plan(Subqueries.q15TopSupplier(spark, sfDir))
    // the per-supplier revenue is checkpointed once at build time;
    // both the max reduction and the winner filter read it, so the
    // final plan touches the lineitem fact zero times (without the
    // materialization Spark re-scans the quarter for the subquery)
    assert(scansOf(p, "lineitem") == 0, p.take(2500))
    assert(p.contains("BroadcastHashJoin Cross") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(2500))
  }

  test("weightedSample: Window-free two-phase aggregate — the A-ES " +
    "top-k rides TopKAgg partials, not a per-group sort") {
    val p = plan(graft.operators.Aggregates.weightedSample(spark, sfDir))
    assert(!p.contains("Window"), p.take(2000))
    // partial + final ObjectHashAggregate = the mergeable buffer shape
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("prefixJaccard: no cartesian product; candidate verify is a " +
    "row-local array_intersect projection, not a third join") {
    val p = plan(graft.operators.Dedup.prefixJaccard(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("array_intersect"), p.take(2000))
  }

  test("prefixJaccard: candidate join broadcasts only while the " +
    "exploded prefix index fits the AQE threshold; beyond it the SAME " +
    "query degrades to a shuffled join with identical rows (the 100 TB " +
    "shape, pinned — round-8 verdict ask #5)") {
    // LIVE node names of the executed plan: recurse through AQE
    // wrappers and materialized query stages, STOP at
    // InMemoryTableScan — a pooled index's InMemoryRelation embeds
    // (and prints) the physical plan it was compiled with under
    // whatever confs were live at cache time, which a string assert
    // would misread as this query's join strategy
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def liveNodes(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => a.nodeName +: liveNodes(a.executedPlan)
      case q: QueryStageExec => q.nodeName +: liveNodes(q.plan)
      case other => other.nodeName +: other.children.flatMap(liveNodes)
    }
    // at test sf AQE sizes the exploded prefix index under the
    // threshold and broadcasts the candidate self-join — planner-sized,
    // never a forced hint
    val df = graft.operators.Dedup.prefixJaccard(spark, sfDir)
    val expected = df.queryExecution.toRdd.count()
    val small = liveNodes(df.queryExecution.executedPlan)
    assert(small.contains("BroadcastHashJoin"), small.mkString("\n"))
    // the scale regime, simulated: with both thresholds off (as if the
    // index outgrew them) every live join must fall back to sort-merge
    // / shuffled-hash — no lurking broadcast() hint on a side that
    // grows with the corpus — and the output must not change
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val df2 = graft.operators.Dedup.prefixJaccard(spark, sfDir)
      assert(df2.queryExecution.toRdd.count() == expected)
      val big = liveNodes(df2.queryExecution.executedPlan)
      assert(!big.contains("BroadcastHashJoin"), big.mkString("\n"))
      assert(big.contains("SortMergeJoin") ||
        big.contains("ShuffledHashJoin"), big.mkString("\n"))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("preferencePairs: one hash aggregate, no window, no self-join " +
    "— argmax and argmin share a single groupBy pass") {
    val p = plan(graft.operators.Pipelines.preferencePairs(spark, sfDir))
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.toLowerCase.contains("join"), p.take(2000))
  }

  test("q9ProductProfit: supplier-nation dim product broadcast at the sf " +
    "where the planner's estimate once compiled SMJ — no fact-side hash " +
    "exchange survives") {
    // the regression only shows past sf0.01 (the size estimate crosses
    // the auto-broadcast threshold), so the pin runs against sf0.1
    val p = plan(Relational.q9ProductProfit(spark, "/root/testdata/sf0.1"))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    // the only hash exchange left is the (n_name, o_year) aggregate's
    // (formatted mode prints partitioning under Arguments:)
    val hashEx = "hashpartitioning\\(".r.findAllIn(p).length
    assert(hashEx == 1, s"$hashEx hash exchanges (want 1: the rollup)\n" +
      p.take(3000))
  }

  test("hybridRrf: both retrieval legs prune via broadcast before any " +
    "aggregation; the fusion join is never a pair scan") {
    val p = plan(TextAnalysis.hybridRrf(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") ||
      // the bounded-probe corpus joins are non-equi (vec_id <> probe)
      // and legitimately BNLJ over a broadcast probe set; a pair scan
      // would be a cartesian with no broadcast side
      p.contains("BroadcastExchange"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("dsirResample: model scoring is a map-side broadcast-join chain " +
    "and the draw is the two-phase TopKAgg — no global sort of the " +
    "corpus, no window") {
    val p = plan(TextAnalysis.dsirResample(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Window "), p.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p.take(3000))
  }

  test("skyline: every window is bucket-partitioned (one hash " +
    "exchange per frontier), no quadratic self-join") {
    val p = plan(Advanced.skyline(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the dominance test is WINDOW arithmetic, not a join: the plan
    // may contain no join at all
    assert(!p.contains("Join"), p.take(2000))
    // one bkt-keyed exchange per frontier branch; the repo-wide audit
    // separately proves neither window is single-partition
    val hashEx = "hashpartitioning\\(".r.findAllIn(p).size
    assert(hashEx == 2, s"$hashEx hash exchanges\n${p.take(2000)}")
  }

  test("streaks: the whole cascade rides ONE user-clustered exchange " +
    "after the distinct — run rollup and summary add none") {
    val p = plan(Analytics.streaks(spark, sfDir))
    // distinct (user,day) + window(user): 2 hash exchanges; the
    // (user, grp) and (user) aggregates reuse the window's
    // partitioning (ClusteredDistribution subset rule)
    val hashEx = "hashpartitioning\\(".r.findAllIn(p).size
    assert(hashEx == 2, s"$hashEx hash exchanges\n${p.take(3000)}")
    assert(p.contains("Window"), p.take(1000))
  }

  test("linkPrediction: deterministic top-N is a TakeOrderedAndProject " +
    "and existing edges leave via a real anti join") {
    val p = plan(Graph.linkPrediction(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("slidingDistinct: the day spine prunes the sketch away — one " +
    "heavy sketch aggregate, not two") {
    val raw = Aggregates.slidingDistinct(spark, sfDir)
      .queryExecution.executedPlan.toString
    // exactly 2 kmv aggs (partial+final) per REAL sketch pass: the
    // corpus day-sketch and the window merge — the semi join's spine
    // branch must compile to a plain distinct (functions=[])
    val objAggs = "ObjectHashAggregate".r.findAllIn(raw).size
    assert(objAggs == 4, s"$objAggs object aggs\n${raw.take(2000)}")
    assert(raw.contains("functions=[], output"), raw.take(3000))
  }

  test("leakageSafeSplit: label/pair inputs come from the shared pool " +
    "and the straddle proof enters as a 1-row broadcast") {
    val p = plan(Dedup.leakageSafeSplit(spark, sfDir))
    // pooled ccLabels/jaccardPairs: the corpus shingle pipeline must
    // NOT be re-planned inside this query
    assert(p.contains("InMemoryTableScan") ||
      p.contains("TableCacheQueryStage"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(2000))
  }

  test("knnGraph: the mutual self-join reads the POOLED directed kNN " +
    "(never re-derives the candidate pair space), and the candidate " +
    "join is an equi join on the cell — no cartesian") {
    Similarity.knnGraph(spark, sfDir).queryExecution.toRdd.count()
    val p = plan(Similarity.knnGraph(spark, sfDir))
    assert(p.contains("InMemoryTableScan") ||
      p.contains("TableCacheQueryStage"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("shardPlan: one per-source window + one hash aggregate; the " +
    "scan reads only (source, doc_id, text)") {
    val p = plan(Multimodal.shardPlan(spark, sfDir))
    assert("Window".r.findAllIn(p).size >= 1)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p.take(1500))
    val schemaLine = p.linesIterator
      .filter(_.contains("ReadSchema")).mkString
    assert(schemaLine.contains("doc_id") && schemaLine.contains("source")
      && !schemaLine.contains("lang"), schemaLine)
  }

  test("profileDrift: four concurrent per-column aggregates union — " +
    "no join, no window, each branch two-phase") {
    val p = plan(Quality.profileDrift(spark, sfDir))
    assert(p.contains("Union"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      p.take(1500))
  }

  test("lateArrivals: the p95 filter-join rides the ranked plan (two " +
    "windows, one events scan branch pair) with no cartesian") {
    val p = plan(Quality.lateArrivals(spark, sfDir))
    assert("Window".r.findAllIn(p).size >= 2, p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("outlierGate: per-(label,dim) moments broadcast back; the gate " +
    "is two aggregations and no window") {
    val p = plan(Similarity.outlierGate(spark, sfDir))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastQueryStage"), p.take(2000))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("nearestJoin: the ±24h band is an EQUI hash join on (user, " +
    "day) — never a range nested loop; argmin partial-aggregates") {
    val p = plan(Advanced.nearestJoin(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("partial_min"), p.take(3000)) // map-side argmin
  }

  test("bitmapDistinct: the word OR-fold partial-aggregates before " +
    "its exchange (one row per occupied word crosses the wire)") {
    val p = plan(Aggregates.bitmapDistinct(spark, sfDir))
    assert(p.contains("partial_bit_or") || p.contains("partial_first") ||
      ("partial".r.findAllIn(p).size >= 2 && p.contains("bit_or")),
      p.take(3000))
    assert(!p.contains("Expand"), p.take(1500)) // not a count_distinct
  }

  test("geo cellJoin: equi hash join on the cell key — never a " +
    "cartesian/BNLJ distance scan") {
    val p = plan(Geo.cellJoin(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("HashJoin"), p.take(1500))
  }

  test("interval algebra: every window partitions by user_id — no " +
    "single-partition (global) window") {
    Seq(Analytics.concurrency(spark, sfDir),
        Analytics.intervalUnion(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("SinglePartition"), p.take(2000))
      assert(p.contains("Window"), p.take(1500))
    }
  }

  test("ohlcBars: ONE aggregate pass, no window, argmins partial") {
    val p = plan(Analytics.ohlcBars(spark, sfDir))
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("partial_min") && p.contains("partial_max"),
      p.take(3000))
  }

  test("funnelWindowed: every stage join is an equi join on user_id " +
    "(bands are filters), no cartesian except the 1-row rollup") {
    val p = plan(Analytics.funnelWindowed(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the rollup's 1-row cross joins plan as BNLJ — demand exactly
    // the two rollup NODES ("(n) BNLJ" detail lines), none in the
    // stage chain; the stage hops must be hash joins
    assert(p.linesIterator.count(
      _.trim.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) <= 2,
      p.take(2500))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(1500))
  }

  test("aqpEstimate: exact, sampled, and stratified counts come off " +
    "ONE events scan (single-scan audit)") {
    val p = plan(Aggregates.aqpEstimate(spark, sfDir))
    assert(scansOf(p, "events") == 1, p.take(2000))
  }

  test("skewGini: rank windows ride the bucketed core (bkt hash " +
    "partitioning), never a single-partition window; joinCard has " +
    "no window at all") {
    val pg = plan(Quality.skewGini(spark, sfDir))
    assert(pg.contains("Window"), pg.take(1500))
    assert(pg.linesIterator.exists(l => l.contains("hashpartitioning(") &&
      l.contains("bkt")), pg.take(2500))
    // the only SinglePartition exchanges are the 1-row rollups — no
    // Window may sit on one (window partition keys always include bkt)
    assert(pg.linesIterator.filter(_.contains("Window"))
      .forall(!_.contains("SinglePartition")), pg.take(2500))
    val pj = plan(Quality.joinCard(spark, sfDir))
    assert(!pj.contains("Window"), pj.take(1500))
  }

  test("idGaps: gap runs via an anti join — no window, no sort " +
    "before the final presentation order") {
    val p = plan(Quality.idGaps(spark, sfDir))
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("Window"), p.take(1500))
  }
}
