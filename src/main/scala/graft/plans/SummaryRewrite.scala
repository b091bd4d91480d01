package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** A registered rollup summary: `summaryPath` holds the fact
  * pre-aggregated at a grain at least as fine as `keys`, with one
  * pre-summed column per coverable measure and a per-group row count.
  * The summary columns must be built with the EXACT aggregation input
  * expressions the rewrite matches (`sum(cast(col as decimal))` for the
  * money measures) so sum-of-sum re-aggregation is algebraically exact.
  *
  * `factPath` is the fact's FULLY-RESOLVED root path (as Spark's file
  * index reports it — use [[SummaryRewrite.resolvedPath]] to capture
  * it), matched by equality at rewrite time. Suffix matching would make
  * one dir's summary silently answer for ANY same-named fact file in
  * the JVM (multi-dir suites run Verify and Bench in one process).
  */
final case class SummaryDef(
    factPath: String,
    summaryPath: String,
    keys: Set[String],
    sums: Map[String, String],
    countCol: String)

/** Catalyst optimizer rule: the aggregate-navigator / materialized-view
  * rewrite. An `Aggregate` directly over a registered fact relation
  * whose grouping keys are covered by a summary's grain and whose
  * aggregate functions are all derivable from the summary's pre-sums
  * (SUM → sum-of-partial-sums, COUNT(*) → sum-of-partial-counts, and
  * anything composed of those, e.g. avg = sum/count) is rewritten to
  * re-aggregate the summary table instead of scanning the fact.
  *
  * This is the 100 TB serving pattern: the fact is petabytes, the
  * summary is megabytes, and repeated dashboard rollups must not
  * re-scan the fact. Paired with the signed-delta incremental refresh
  * (`Pipelines.incrementalAgg`) the summary stays current without full
  * recomputation.
  *
  * Scope is deliberately conservative — the rewrite declines (leaves
  * the plan untouched) whenever it cannot PROVE equivalence:
  *  - any Filter between the Aggregate and the fact scan (the summary
  *    cannot answer predicates below its grain),
  *  - grouping expressions that are not bare covered columns,
  *  - any aggregate call that is not an undistinct, unfiltered SUM of
  *    a covered measure or COUNT(*) (`count(1)`),
  *  - grouping-set/rollup/cube plans (their grouping exprs carry the
  *    internal grouping-id, failing the bare-column check).
  *
  * Exactness: measures are pre-summed as decimal — decimal addition is
  * associative, so re-aggregation is bit-identical to the raw scan
  * (asserted row-for-row in MaterializedViewSpec, and the driver's
  * DuckDB oracle computes the mv query from the RAW fact). The cast
  * back to the original Sum result type bounds precision at 10 more
  * integral digits than the per-group sums — overflow there would
  * have overflowed the raw aggregation's result type too.
  *
  * Disable per session with `spark.graft.summaryRewrite.enabled=false`.
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  private val registry = TrieMap.empty[String, SummaryDef]

  def register(d: SummaryDef): Unit = registry.put(d.factPath, d)
  def clear(): Unit = registry.clear()

  /** The fully-resolved root path of a single-relation DataFrame — the
    * exact string `factOf` will see at rewrite time. Register summaries
    * against THIS, never a hand-written path: resolution (scheme
    * qualification, symlinks, trailing slashes) must match on both
    * sides or the rewrite silently never fires.
    */
  def resolvedPath(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.analyzed.collectFirst {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.head.toString
      }
    }.getOrElse(throw new IllegalArgumentException(
      "not a single file-relation plan"))

  private def enabled: Boolean =
    conf.getConfString("spark.graft.summaryRewrite.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty || !enabled) plan
    else plan.transform {
      case agg: Aggregate =>
        factOf(agg.child).flatMap(rewrite(agg, _)).getOrElse(agg)
    }

  /** The fact relation under the aggregate, looking through
    * attribute-only projections (column pruning) but NOT through
    * filters or joins — those change what the summary would answer.
    */
  private def factOf(plan: LogicalPlan): Option[SummaryDef] = plan match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      factOf(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        // equality on the dir-qualified resolved path — a suffix match
        // ("lineitem.parquet") would let one sfDir's summary answer
        // for every other dir's same-named fact in this JVM
        fs.location.rootPaths.headOption.map(_.toString)
          .flatMap(registry.get)
      case _ => None
    }
    case _ => None
  }

  /** SUM input: the bare measure column or `cast(col as ...)` exactly
    * as the summary's pre-sum was built.
    */
  private def sumInput(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case c: Cast => c.child match {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    case _ => None
  }

  private def rewritableAgg(ae: AggregateExpression, d: SummaryDef): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Sum(inner, _) => sumInput(inner).exists(a => d.sums.contains(a.name))
      // count(1)/count(*) only — count(NULL) is 0 per group, not the
      // group row count the summary's countCol carries
      case Count(Seq(Literal(v, _))) => v != null
      case _ => false
    })

  /** Attributes referenced OUTSIDE any aggregate function — these must
    * all be grouping keys the summary carries.
    */
  private def freeAttrs(e: Expression): Seq[AttributeReference] = e match {
    case _: AggregateExpression => Nil
    case a: AttributeReference => Seq(a)
    case _ => e.children.flatMap(freeAttrs)
  }

  private def rewrite(agg: Aggregate, d: SummaryDef): Option[LogicalPlan] = {
    // 1. every grouping expression is a bare covered key column
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if d.keys.contains(a.name) => a
      case _ => return None
    }
    // 2. every aggregate call is derivable, every free attr is a key
    val feasible = agg.aggregateExpressions.forall { ne =>
      ne.collect { case ae: AggregateExpression => ae }
        .forall(rewritableAgg(_, d)) &&
      freeAttrs(ne).forall(a => d.keys.contains(a.name))
    }
    if (!feasible) return None

    // 3. resolve the summary relation (fresh attribute ids per rewrite)
    val rel = SparkSession.active.read.parquet(d.summaryPath)
      .queryExecution.analyzed
    val sOut = rel.output.map(a => a.name -> a).toMap
    if (!(d.keys ++ d.sums.values + d.countCol).forall(sOut.contains))
      return None
    // summary pre-sum dtype must equal the original Sum's result type,
    // which is what makes the cast-back below exact
    val sumsTyped = agg.aggregateExpressions.flatMap(_.collect {
      case ae @ AggregateExpression(Sum(inner, _), _, _, _, _) =>
        sumInput(inner).map(a => sOut(d.sums(a.name)).dataType == ae.dataType)
    }.flatten)
    if (sumsTyped.exists(!_)) return None

    // 4. rebuild each output expression over the summary, preserving
    //    every output name and exprId so parent operators re-resolve
    def rewriteExpr(e: Expression): Expression = e.transform {
      case ae @ AggregateExpression(s @ Sum(inner, _), _, false, None, _)
          if sumInput(inner).exists(a => d.sums.contains(a.name)) =>
        val sAttr = sOut(d.sums(sumInput(inner).get.name))
        Cast(ae.copy(aggregateFunction = s.copy(child = sAttr)),
          ae.dataType, None)
      case ae @ AggregateExpression(Count(Seq(Literal(v, _))), _, false,
          None, _) if v != null =>
        // a group present in the summary has >= 1 row, so the sum is
        // never null; Coalesce keeps the non-null contract of COUNT
        Coalesce(Seq(ae.copy(aggregateFunction = Sum(sOut(d.countCol))),
          Literal(0L)))
      case a: AttributeReference if d.keys.contains(a.name) => sOut(a.name)
    }
    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if d.keys.contains(a.name) =>
        Alias(sOut(a.name), a.name)(exprId = a.exprId)
      case al: Alias =>
        Alias(rewriteExpr(al.child), al.name)(exprId = al.exprId)
      case _ => return None
    }
    // 5. nothing may still reference the fact
    if (!newAggExprs.forall(_.references.subsetOf(rel.outputSet)))
      return None
    Some(Aggregate(groupAttrs.map(a => sOut(a.name)), newAggExprs, rel))
  }
}
