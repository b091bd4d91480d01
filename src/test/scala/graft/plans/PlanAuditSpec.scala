package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Analytics, Relational}

/** The plan linter pinned from both sides: the pathological demo must
  * produce EXACTLY the hand-derived findings (any rule firing twice,
  * missing, or renaming its node breaks the driver oracle too), and
  * the engine's own production queries must audit clean of warnings —
  * the linter is only trustworthy if the plans this repo already
  * hand-audited come back green.
  */
class PlanAuditSpec extends SparkSpec {

  test("lintDemo: every planted anti-pattern found, nothing else") {
    val rows = PlanAudit.lintDemo(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expected = Seq(
      ("warn", "cross-product", "BroadcastNestedLoopJoin"),
      ("info", "exchange-count", "plan"),
      ("info", "global-sort", "Sort"),
      ("warn", "global-window", "Window"),
      ("warn", "scala-udf", "Filter"),
      ("info", "unconvertible-predicate", "Filter"),
      ("warn", "unpushed-filter", "Filter")
    ).sortBy(t => (t._2, t._3, t._1))
    assert(rows.toSeq == expected, rows.mkString("\n"))
  }

  test("production queries audit clean: no warn-severity findings") {
    for (q <- Seq(
        Relational.join3Revenue(spark, sfDir),
        Relational.snapshot(spark, sfDir),
        Analytics.topCustomers(spark, sfDir))) {
      val warns = PlanAudit.audit(q).filter(_.severity == "warn")
      assert(warns.isEmpty, warns.mkString("\n"))
    }
  }

  test("top-k via TakeOrderedAndProject is NOT flagged as a global sort") {
    val fs = PlanAudit.audit(Relational.q3ShippingPriority(spark, sfDir))
    assert(!fs.exists(_.rule == "global-sort"), fs.mkString("\n"))
  }

  test("a hinted broadcast of a data-proportional raw side is flagged; " +
    "planner-sized broadcasts are not") {
    import org.apache.spark.sql.functions.col
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "1024") // below any real table's file size
      val forced = graft.Tables.lineitem(spark, sfDir).hint("broadcast")
        .join(graft.Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
      val fs = PlanAudit.audit(forced)
      assert(fs.exists(_.rule == "forced-broadcast"), fs.mkString("\n"))
    } finally spark.conf.set(key, old)
    // at the default threshold the same join (no hint) audits clean
    val sized = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
    assert(!PlanAudit.audit(sized).exists(_.rule == "forced-broadcast"))
  }

  test("repo-wide: every declared query audits free of warn findings " +
    "(documented allowlist only)") {
    // the linter's real job: the whole declared surface, not a demo.
    // Every entry on the allowlist is a shape that is intended AND
    // bounded — each with the reason it does not break at scale.
    val allow: Map[String, Set[String]] = Map(
      // both windows run over DAY-GRAIN aggregate outputs — one row
      // per calendar day (×64 fixed bins for the sketch rollup), so
      // the single partition holds O(days) rows at any data scale;
      // bounded-by-the-calendar is the documented exception the
      // round-4 window audit already carved out
      "st2_sliding_7day" -> Set("global-window"),
      "agg_quantile_rollup" -> Set("global-window"),
      // the backfill rank runs over the day-grain WORK LIST (missing/
      // stale/orphan partitions) — outage-sized, bounded by the
      // calendar at any data scale; same carve-out as above
      "p_backfill_plan" -> Set("global-window"),
      // the cumulative-share window runs over the BRAND aggregate —
      // p_brand is a 25-value domain at any data scale, so the single
      // partition holds a constant-bounded row count (domain-bounded,
      // the same carve-out class as calendar-bounded)
      "agg_pareto" -> Set("global-window"),
      // the remainder rank runs over the STRATUM aggregate —
      // |event types| rows at any data scale (domain-bounded, same
      // carve-out as pareto); apportionment is definitionally a
      // total order over the strata
      "p_pps_alloc" -> Set("global-window"),
      // the [p5,p95] threshold read-off runs over the merged
      // HistSketch BIN table — ≤ 64 rows at any data scale
      // (layout-bounded, a strictly tighter carve-out than
      // domain-bounded); the corpus-sized clamp pass that follows is
      // window-free
      "agg_winsorized" -> Set("global-window"))
    val violations = graft.SparkEntry.queries
      .filterNot { case (n, _) => graft.SparkEntry.eagerWriters(n) }
      .toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val warns =
          try PlanAudit.audit(fn(spark, sfDir))
            .filter(_.severity == "warn")
          catch { case _: Throwable => Nil } // plan errors: other test
        warns.filterNot(w => allow.getOrElse(name, Set.empty)(w.rule))
          .map(w => s"$name: ${w.rule} @ ${w.node}")
      }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("ExecMetrics: shuffle/peak populate on a heavy query, and a " +
    "forced window spill is visible in spillSize (the artifact's " +
    "memory-bound predictor actually fires)") {
    import graft.operators.Analytics
    // known-heavy: per-customer running windows — one exchange, sorts
    val df = Analytics.windowRunning(spark, sfDir)
    df.queryExecution.toRdd.count() // metrics populate from the OWN plan
    val (sh, sp, pk) = ExecMetrics.walk(df)
    assert(sh > 0, s"no shuffle recorded (sh=$sh)")
    assert(pk > 0, s"no peak memory recorded (pk=$pk)")
    // spillSize is environment-dependent (executor memory, thread
    // count) — a constrained runner may legitimately spill here, so no
    // sp == 0 assertion; the forced-spill check below is the one that
    // guards the plumbing
    if (sp != 0) info(s"windowRunning spilled $sp bytes on this runner")
    // force WindowExec's group buffer past its spill thresholds
    // (dynamic SQLConfs) on one 10k-row group and demand the rollup
    // reports it — a query that spills at sf0.1 is memory-bound at
    // 100x, so the artifact's spill column must be LIVE, not
    // vacuously zero because the plumbing reads the wrong plan
    import org.apache.spark.sql.expressions.Window
    val keys = Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "1000",
      "spark.sql.windowExec.buffer.spill.threshold" -> "2000")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val w = Window.partitionBy(lit(1)).orderBy("id")
      val spilled = spark.range(0, 10000)
        .select(col("id"), sum(col("id")).over(w).as("s"))
      spilled.queryExecution.toRdd.count()
      val (_, sp2, _) = ExecMetrics.walk(spilled)
      assert(sp2 > 0, "forced window spill not visible in spillSize")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
