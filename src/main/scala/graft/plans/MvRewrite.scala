package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view query rewrite — the optimizer half of the MV
  * story. The maintenance half already exists (signed-delta fold:
  * `VersionOps`/`MvStream`, q110/q128/q130/q143); this rule makes the
  * maintained table USEFUL without the user knowing it exists: a
  * textbook `SELECT g, sum(x), count(*) FROM base GROUP BY g` over a
  * registered base table is rewritten to a SCAN of the maintained MV —
  * the aggregation (and at 100 TB, the table scan that dominates it)
  * disappears from the plan, replaced by a read of a group-cardinality
  * table. This is the BigQuery/Databricks "automatic MV rewrite"
  * analogue, built from public Catalyst surface only.
  *
  * Matching is deliberately narrow and structural (exactly one
  * grouping attribute; result expressions drawn from {the group key,
  * SUM(column), COUNT(1)/COUNT(*)}; base resolved by the scan's root
  * path) — a rewrite that fires on shapes the MV cannot answer would
  * be a wrong-results bug, so anything else is left untouched.
  * Output attributes keep the ORIGINAL exprIds via aliasing, so
  * parent operators (filters, joins, sorts above the aggregate)
  * resolve against the rewritten subtree unchanged.
  *
  * Freshness is the registration's contract, as in every MV system:
  * [[MvRegistry.register]] resolves the MV's CURRENT version at call
  * time; a writer that advances the MV re-registers (the analogue of
  * a refresh bumping the view's snapshot). Registration is
  * session-scoped state, like `spark.experimental.extraOptimizations`
  * itself; [[MvRegistry.clear]] disables the tier.
  *
  * Injected by [[GraftExtensions]] / [[GraftFunctions.register]]
  * alongside the kernel rewrites; inert while the registry is empty.
  */
object MvRegistry {

  /** One registered rewrite target: aggregate-over-`basePath` with
    * this exact (groupCol, sumCol) shape answers from `mvPlan`, whose
    * output columns are (groupOut, sumOut, cntOut). */
  final case class MvTarget(basePath: String, groupCol: String,
                            sumCol: String, groupOut: String,
                            sumOut: String, cntOut: String,
                            mvPlan: LogicalPlan)

  private val targets = new ConcurrentHashMap[String, MvTarget]()

  /** Register `mv` (a resolved DataFrame of the maintained view —
    * e.g. `VersionedParquet.read(spark, mvRoot)`) as the answer to
    * single-key sum/count aggregates over `basePath`. The MV's
    * analyzed plan is captured NOW — re-register after advancing the
    * view (refresh semantics). */
  def register(basePath: String, groupCol: String, sumCol: String,
               mv: org.apache.spark.sql.DataFrame,
               groupOut: String, sumOut: String, cntOut: String): Unit = {
    val plan = mv.queryExecution.analyzed
    targets.put(normalize(basePath),
      MvTarget(normalize(basePath), groupCol, sumCol,
        groupOut, sumOut, cntOut, plan))
  }

  def clear(): Unit = targets.clear()

  private[plans] def lookup(path: String): Option[MvTarget] =
    Option(targets.get(normalize(path)))

  /** Root paths compare stripped of scheme (`file:`) and trailing
    * slashes — the same table reached via a qualified and an
    * unqualified path is the same table. */
  private[plans] def normalize(p: String): String = {
    val noScheme = p.replaceFirst("^[a-zA-Z0-9.+-]+:(//)?", "")
    noScheme.reverse.dropWhile(_ == '/').reverse
  }
}

object MvRewrite extends Rule[LogicalPlan] {

  import MvRegistry.MvTarget

  /** Root paths of every parquet relation in a (logical) plan — the
    * spec/gate helper proving WHERE a query reads from after the
    * optimizer ran (a rewrite that silently stopped firing would still
    * hash-match, since the MV equals the recompute by contract). */
  def scanPaths(plan: LogicalPlan): Seq[String] = plan.collect {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.map(_.toString)
  }.flatten

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _) =>
      stripped(child) match {
        case Some((path, conds)) =>
          MvRegistry.lookup(path) match {
            case Some(mv)
                // a residual filter is safe ONLY when it references
                // nothing but the group key: such predicates commute
                // with the aggregate (the key passes through), so they
                // re-apply above the MV scan. This is exactly what the
                // optimizer's join-key null elimination pushes under
                // aggregates (isnotnull(g)); anything touching other
                // columns (a filtered base) must NOT answer from the
                // unfiltered view.
                if conds.forall(_.references.toSeq.forall(
                  _.name == mv.groupCol)) =>
              rewrite(agg, g, aggExprs, conds, mv).getOrElse(agg)
            case _ => agg
          }
        case None => agg
      }
  }

  /** The single root path of a column-pruning/filter subtree over one
    * parquet relation, plus the filter conditions encountered on the
    * way down; None for anything else (joins, generates, …). */
  private def stripped(p: LogicalPlan)
      : Option[(String, Seq[Expression])] = p match {
    case Project(projs, child)
        if projs.forall(_.isInstanceOf[AttributeReference]) =>
      stripped(child)
    case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
      stripped(child).map { case (path, cs) => (path, cond +: cs) }
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths match {
        case Seq(one) => Some((one.toString, Nil))
        case _ => None
      }
    case _ => None
  }

  private def mvAttr(mv: MvTarget, name: String): Option[Attribute] =
    mv.mvPlan.output.find(_.name == name)

  /** Cast `a` to `to`'s type when they differ (e.g. an MV storing a
    * wider count), preserving the original output exprId + name. */
  private def out(a: Attribute, to: NamedExpression): NamedExpression = {
    val e: Expression =
      if (a.dataType == to.dataType) a else Cast(a, to.dataType)
    Alias(e, to.name)(exprId = to.exprId)
  }

  private def rewrite(agg: Aggregate, g: AttributeReference,
                      aggExprs: Seq[NamedExpression],
                      conds: Seq[Expression],
                      mv: MvTarget): Option[LogicalPlan] = {
    if (g.name != mv.groupCol) return None
    val (gOut, sOut, cOut) =
      (mvAttr(mv, mv.groupOut), mvAttr(mv, mv.sumOut),
        mvAttr(mv, mv.cntOut)) match {
        case (Some(a), Some(b), Some(c)) => (a, b, c)
        case _ => return None
      }
    val mapped = aggExprs.map {
      case a: AttributeReference if a.name == mv.groupCol =>
        out(gOut, a)
      case al @ Alias(child: AttributeReference, _)
          if child.name == mv.groupCol =>
        out(gOut, al)
      case al @ Alias(
          AggregateExpression(Sum(e: AttributeReference, _), _, false,
            None, _), _) if e.name == mv.sumCol =>
        out(sOut, al)
      case al @ Alias(
          AggregateExpression(Count(Seq(Literal(_, _))), _, false,
            None, _), _) =>
        out(cOut, al)
      case _ => return None
    }
    // group-key-only predicates re-apply above the view, rebound to
    // the MV's group attribute
    val source =
      if (conds.isEmpty) mv.mvPlan
      else {
        val rebound = conds.map(_.transform {
          case a: AttributeReference if a.name == mv.groupCol => gOut
        }).reduce(org.apache.spark.sql.catalyst.expressions.And)
        org.apache.spark.sql.catalyst.plans.logical.Filter(rebound,
          mv.mvPlan)
      }
    Some(Project(mapped, source))
  }
}
