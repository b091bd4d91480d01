package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extraction — the data-governance question
  * ("which physical columns feed this output column?") answered from
  * the ANALYZED logical plan, so it is exact for whatever Catalyst
  * resolved: no parsing, no regexes, no per-engine dialect. One
  * bottom-up fold: leaf relations seed each attribute with its
  * `table.column` identity; Project/Aggregate/Window aliases union the
  * lineages of every attribute their expression references (an
  * `Expression.references` walk — survives arbitrary nesting, CASE
  * chains, HOF lambdas); Generate (explode) maps generator outputs to
  * the generator's inputs; Union merges positionally, as its output
  * resolution does. Joins/filters/sorts only route attributes, so the
  * child maps pass through unchanged.
  *
  * Scale note: this runs on the PLAN, never the data — O(plan nodes ×
  * expression width) on the driver, the same cost tier as `explain`.
  */
object Lineage {

  /** output column name → the set of "table.column" leaves feeding it.
    * Columns derived only from literals/metadata map to the empty set.
    */
  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val m = attrSources(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty)).toMap
  }

  private def refs(e: Expression,
      m: Map[ExprId, Set[String]]): Set[String] =
    e.references.toSeq.flatMap(a => m.getOrElse(a.exprId, Set.empty)).toSet

  private def named(exprs: Seq[NamedExpression],
      m: Map[ExprId, Set[String]]): Map[ExprId, Set[String]] =
    exprs.map(ne => ne.exprId -> refs(ne, m)).toMap

  private def tableOf(l: LeafNode): String = l match {
    case r: LogicalRelation => r.relation match {
      case h: HadoopFsRelation =>
        val base = h.location.rootPaths.headOption
          .map(_.getName).getOrElse("relation")
        base.replaceAll("\\.(parquet|orc|csv|json|xml)$", "")
      case other => other.getClass.getSimpleName
    }
    case _ => l.nodeName
  }

  private def attrSources(plan: LogicalPlan): Map[ExprId, Set[String]] =
    plan match {
      case l: LeafNode =>
        val t = tableOf(l)
        l.output.map(a => a.exprId -> Set(s"$t.${a.name}")).toMap
      case u: Union =>
        // output column i descends from column i of every child
        val childMaps = u.children.map(attrSources)
        val perChild = u.children.zip(childMaps)
        childMaps.fold(Map.empty[ExprId, Set[String]])(_ ++ _) ++
          u.output.zipWithIndex.map { case (out, i) =>
            out.exprId -> perChild.flatMap { case (c, m) =>
              m.getOrElse(c.output(i).exprId, Set.empty)
            }.toSet
          }.toMap
      case p =>
        val m = p.children.map(attrSources).fold(Map.empty)(_ ++ _)
        p match {
          case Project(exprs, _) => m ++ named(exprs, m)
          case Aggregate(_, exprs, _, _) => m ++ named(exprs, m)
          case w: Window => m ++ named(w.windowExpressions, m)
          case g: Generate =>
            m ++ g.generatorOutput.map(a =>
              a.exprId -> refs(g.generator, m)).toMap
          case e: Expand =>
            // every expand output unions the inputs at its position
            m ++ e.output.zipWithIndex.map { case (a, i) =>
              a.exprId -> e.projections
                .flatMap(row => refs(row(i), m)).toSet
            }.toMap
          case _ => m
        }
    }

  /** Lineage rendered one row per (output, source) edge — the shape a
    * catalog ingests; deterministic ordering for specs/dumps.
    */
  def edges(df: DataFrame): Seq[(String, String)] =
    columnLineage(df).toSeq.flatMap { case (out, srcs) =>
      if (srcs.isEmpty) Seq(out -> "")
      else srcs.toSeq.sorted.map(out -> _)
    }.sortBy(identity)

  /** The edge list as a one-row-per-edge DataFrame — lets the driver's
    * correctness gate pin lineage against a hand-derived oracle. The
    * "query" reads only the PLAN (columnLineage never touches data);
    * the localized edge seq is O(output cols × source cols), driver-side
    * by construction.
    */
  def edgesDf(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    edges(df).toDF("out_col", "src_col").orderBy("out_col", "src_col")
  }
}
