package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.LongType

import graft.warehouse.{FileStats, GraftRelation}

/** Metadata-only aggregates — Delta's `SELECT COUNT(*)` / MIN / MAX
  * optimization as a Catalyst rule over the graft source.
  *
  * A grand-total `SELECT count(*), min(x), max(x) FROM t` over a graft
  * view normally scans the table; when the LIVE version is a physical
  * snapshot whose per-file stats sidecar describes EVERY file (and no
  * policy, pending schema map, or merge-on-read overlay changes what a
  * read returns — [[FileStats.metadataAggregates]] gates all of it),
  * the answer is already sitting in the sidecar: count = Σ per-file
  * rows, min/max = fold of per-file bounds. The rule replaces the
  * whole aggregate with a [[LocalRelation]] holding the one result row
  * — zero tasks, zero bytes scanned, the 100 TB dashboard ping becomes
  * a metadata probe.
  *
  * Matching is deliberately narrow (the wrong-results bar of
  * [[MvRewrite]]): no grouping, every result expression one of
  * {COUNT(non-null literal), MIN(long column), MAX(long column)} with
  * no DISTINCT and no FILTER, the child a bare live-view graft scan
  * (optionally through an attribute-only Project). Long columns only —
  * per-file string bounds fold in java.lang.String order here but the
  * engine compares UTF8String binary order, identical on ASCII,
  * divergent beyond, so strings stay scan-answered. Anything the
  * sidecar cannot answer exactly falls through untouched; output
  * attributes are reused verbatim, so parents resolve unchanged.
  * All-null columns answer NULL, an empty table answers (0, NULL,
  * NULL) — exactly the scan's semantics.
  */
object StatsAggRewrite extends Rule[LogicalPlan] {

  private sealed trait Shape
  private case object CountStar extends Shape
  private final case class MinCol(name: String) extends Shape
  private final case class MaxCol(name: String) extends Shape

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groups, exprs, child, _) if groups.isEmpty =>
      (rootOf(child), shapesOf(exprs)) match {
        case (Some(root), Some(shapes)) =>
          answer(agg, shapes, root).getOrElse(agg)
        case _ => agg
      }
  }

  private def rootOf(plan: LogicalPlan): Option[String] = plan match {
    case LogicalRelation(g: GraftRelation, _, _, _, _)
        if g.servesLiveView => Some(g.tableRoot)
    case Project(ps, child)
        if ps.forall(_.isInstanceOf[AttributeReference]) => rootOf(child)
    case _ => None
  }

  private def shapesOf(exprs: Seq[NamedExpression]): Option[Seq[Shape]] = {
    val shapes = exprs.map {
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) if v != null => Some(CountStar)
          case Min(a: AttributeReference) if a.dataType == LongType =>
            Some(MinCol(a.name))
          case Max(a: AttributeReference) if a.dataType == LongType =>
            Some(MaxCol(a.name))
          case _ => None
        }
      case _ => None
    }
    if (shapes.forall(_.isDefined)) Some(shapes.flatten) else None
  }

  private def answer(agg: Aggregate, shapes: Seq[Shape],
                     root: String): Option[LogicalPlan] = {
    val spark = SparkSession.active
    FileStats.metadataAggregates(spark, root).flatMap { case (n, cols) =>
      def bound(name: String, lo: Boolean): Option[Any] =
        cols.get(name).collect { case ("L", mn, mx) =>
          (if (lo) mn else mx).map(_.toLong).orNull }
      val values = shapes.map {
        case CountStar => Some(n: Any)
        case MinCol(c) => bound(c, lo = true)
        case MaxCol(c) => bound(c, lo = false)
      }
      // a column the sidecar does not fully describe declines the
      // WHOLE rewrite (None from bound), never a partial answer
      if (values.forall(_.isDefined))
        Some(LocalRelation(agg.output,
          Seq(InternalRow.fromSeq(values.map(_.get)))))
      else None
    }
  }
}
