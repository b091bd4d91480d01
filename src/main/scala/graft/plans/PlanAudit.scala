package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec, FilterExec, SortExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan linter — the 100 TB plan-review checklist
  * (cross products, single-partition windows, global sorts, UDFs
  * blocking codegen/pushdown, filters that never reached the scan,
  * unpruned wide scans, Expand row-multipliers) run mechanically over
  * `queryExecution.sparkPlan` and returned as rows. The same checks
  * this project's PlanQualitySpec pins one-by-one, packaged so ANY
  * query can be vetted before it ships to a cluster: audit cost is
  * O(plan nodes), on the driver, and never touches data — the same
  * cost tier as `explain`.
  *
  * Audited pre-AQE (`sparkPlan`, not `executedPlan`): AQE rewrites are
  * runtime-dependent, while a lint must be deterministic at authoring
  * time. Severity is "warn" for shapes that break at scale (a cross
  * product or one-task window is O(n²)/O(n) on a single executor no
  * matter the cluster) and "info" for shapes that are sometimes
  * intended (a global sort as the final output order; a full-width
  * scan of a genuinely-needed schema).
  */
object PlanAudit {

  /** One lint finding. `node` is the offending operator's nodeName,
    * `detail` a human-readable cause — both deterministic functions of
    * the plan so findings can be oracle-checked.
    */
  final case class Finding(severity: String, rule: String, node: String,
      detail: String)

  def audit(df: DataFrame): Seq[Finding] = {
    // shape rules read the strategy output (sparkPlan): no codegen
    // wrappers between Filter and Scan, deterministic at authoring
    // time. Exchanges don't EXIST yet at that layer (EnsureRequirements
    // is a preparation rule), so exchange-level findings read the
    // prepared plan — AQE's initialPlan, which has the exchanges in
    // but no runtime re-planning applied.
    val prepared = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    (auditPlan(df.queryExecution.sparkPlan) ++
      exchangeFindings(prepared, thr))
      .distinct.sortBy(f => (f.rule, f.node, f.severity))
  }

  private def exchangeFindings(prepared: SparkPlan,
      broadcastThreshold: Long): Seq[Finding] = {
    val fs = Seq.newBuilder[Finding]
    prepared.foreach {
      case b: BroadcastExchangeExec =>
        // only when the estimate is trustworthy: a build side that is
        // just scan(+filter/project) has file-size-backed stats. An
        // aggregate below the exchange makes SizeInBytesOnly estimates
        // meaningless (the reduction isn't modeled), and a join
        // inflates them multiplicatively (an 8-row filtered join
        // output estimates as the input product) — skip both
        val simple = !b.child.exists {
          case _: BaseAggregateExec => true
          case _: org.apache.spark.sql.execution.joins.BaseJoinExec => true
          case _: CartesianProductExec => true
          case _ => false
        }
        val scanRooted =
          b.child.exists(_.isInstanceOf[FileSourceScanExec])
        val est = b.child.logicalLink.map(_.stats.sizeInBytes)
        if (simple && scanRooted && broadcastThreshold > 0 &&
            est.exists(_ > BigInt(broadcastThreshold)))
          fs += Finding("warn", "forced-broadcast", b.nodeName,
            s"estimated build ${est.get} B exceeds the " +
              s"$broadcastThreshold B threshold - the planner would " +
              "never choose this; a hint or non-equi join forced it")
      case _ => ()
    }
    // one summary row per plan: its exchange count — the number every
    // scale review starts from (each is a full materialize+network
    // pass over its input).
    val shuffles =
      prepared.collect { case e: ShuffleExchangeExec => e }.size
    val bcasts =
      prepared.collect { case e: BroadcastExchangeExec => e }.size
    fs += Finding("info", "exchange-count", "plan",
      s"$shuffles shuffle + $bcasts broadcast exchanges")
    fs.result()
  }

  def auditPlan(plan: SparkPlan): Seq[Finding] = {
    val fs = Seq.newBuilder[Finding]

    plan.foreach {
      case j: CartesianProductExec =>
        fs += Finding("warn", "cross-product", j.nodeName,
          "O(|L|x|R|) pair space; every executor reads one full side")
      case j: BroadcastNestedLoopJoinExec
          if j.condition.isEmpty &&
            (j.joinType == Cross || j.joinType == Inner) =>
        // a build side that is a GLOBAL aggregate (no grouping keys)
        // is provably one row — the scalar-broadcast pattern Spark
        // itself plans scalar subqueries into. O(n), not O(n^2).
        val build =
          if (j.buildSide == BuildLeft) j.left else j.right
        val scalarBuild = build.exists {
          case a: BaseAggregateExec => a.groupingExpressions.isEmpty
          case _ => false
        }
        if (scalarBuild)
          fs += Finding("info", "scalar-broadcast", j.nodeName,
            "cross join against a provably-1-row global aggregate")
        else
          fs += Finding("warn", "cross-product", j.nodeName,
            "nested-loop join with no condition is a cross product")
      case j: BroadcastNestedLoopJoinExec =>
        fs += Finding("info", "nested-loop-join", j.nodeName,
          "non-equi join condition; O(|L|x|build|) compare per row")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        fs += Finding("warn", "global-window", w.nodeName,
          "empty PARTITION BY funnels every row through one task")
      case e: ExpandExec if e.projections.size > 2 =>
        fs += Finding("info", "expand-multiplier", e.nodeName,
          s"multiplies input x${e.projections.size} before the shuffle")
      case f: FilterExec =>
        f.child match {
          case scan: FileSourceScanExec
              if scan.partitionFilters.isEmpty &&
                scan.metadata.get("PushedFilters").forall(_ == "[]") =>
            // two different diagnoses: a deterministic predicate DID
            // route to the scan (dataFilters) but no part of it is
            // expressible as a source filter (rlike, arithmetic, UDF)
            // — inherent, the reader must see every row; vs a filter
            // the planner never even offered the scan — that one is
            // the authoring bug worth a warning
            if (scan.dataFilters.nonEmpty)
              fs += Finding("info", "unconvertible-predicate", f.nodeName,
                "predicate reached the scan but no part converts to " +
                  "a source filter")
            else
              fs += Finding("warn", "unpushed-filter", f.nodeName,
                "no predicate reached the reader; scan is full then filter")
          case _ => ()
        }
      case scan: FileSourceScanExec
          if scan.requiredSchema.length >= 8 &&
            scan.requiredSchema.length == scan.relation.dataSchema.length =>
        fs += Finding("info", "full-width-scan", scan.nodeName,
          s"reads all ${scan.requiredSchema.length} columns - no pruning")
      case _ => ()
    }

    // global sorts: a range-partitioned total order is legitimate as
    // the query's final output order, but anywhere else it is usually
    // an accidental `orderBy` that a window/limit made redundant.
    // TakeOrderedAndProject (top-k) is the GOOD shape and not flagged.
    plan.foreach {
      case s: SortExec if s.global =>
        fs += Finding("info", "global-sort", s.nodeName,
          "total order = sample + range-shuffle + per-partition sort")
      case _: TakeOrderedAndProjectExec => ()
      case _ => ()
    }

    // expression-level sweep: Scala UDFs execute row-at-a-time outside
    // codegen and are opaque to pushdown/pruning — every built-in or
    // catalyst Expression alternative beats one. Leaf scans are
    // skipped: a non-convertible UDF predicate is mirrored into the
    // scan's dataFilters but EVALUATES at its resident Filter, which
    // is where the sweep reports it.
    val udfNodes = plan.collect {
      case p if p.children.nonEmpty &&
        p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])) => p
    }
    udfNodes.foreach { p =>
      fs += Finding("warn", "scala-udf", p.nodeName,
        "UDF blocks codegen, pushdown and pruning at this node")
    }

    fs.result().distinct.sortBy(f => (f.rule, f.node, f.severity))
  }

  /** Findings as a DataFrame — lets the driver's gate pin the audit of
    * a deliberately pathological plan against a hand-derived oracle
    * (same plan-only contract as [[Lineage.edgesDf]]).
    */
  def auditDf(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    audit(df).map(f => (f.severity, f.rule, f.node))
      .toDF("severity", "rule", "node")
      .orderBy("rule", "node", "severity")
  }

  /** Driver-checked demo: one query that commits every scale sin the
    * linter knows — a Scala-UDF filter (blocks codegen; resident at
    * the scan but unconvertible to a source filter), a
    * non-deterministic filter (never even offered to the scan), a
    * PARTITION-BY-less window, a cross join, a final global sort —
    * audited to rows an oracle can pin. The trigger shapes are
    * sf-invariant (the cross side is the constant 5-row region table,
    * so the planner's nested-loop-broadcast choice never flips; the
    * rand predicate is tautologically true, so row counts never
    * change), which is what makes a VALUES oracle exact at every test
    * scale.
    */
  def lintDemo(s: org.apache.spark.sql.SparkSession, dir: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val isEven = udf((x: Long) => x % 2 == 0)
    val bad = graft.Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .filter(isEven(col("event_id")))
      .withColumn("rk", row_number().over(Window.orderBy(col("event_id"))))
      // filter BEFORE the projection: a non-deterministic predicate
      // cannot be pushed through a Project, so filtering after select
      // would land it above a ProjectExec instead of the scan
      .crossJoin(graft.Tables.region(s, dir)
        // non-deterministic AND always true (ids are non-negative):
        // the planner never offers it to the scan, rows never change.
        // (rand(seed) >= -1 does NOT work — Spark 4 folds rand
        // comparisons outside [0,1) to a literal and the Filter
        // vanishes)
        .filter(monotonically_increasing_id() >= lit(0L))
        .select(col("r_name")))
      .orderBy(col("rk"), col("r_name"))
    auditDf(bad)
  }
}
