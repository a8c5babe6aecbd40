package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view query rewrite — the optimizer half of the MV
  * story. The maintenance half already exists (signed-delta fold:
  * `VersionOps`/`MvStream`, q110/q128/q130/q143); this rule makes the
  * maintained table USEFUL without the user knowing it exists: a
  * textbook `SELECT keys…, sum(x), count(*) FROM base GROUP BY keys…`
  * over a registered base table — DataFrame API or SQL text alike,
  * the rule sees the same logical plan — is rewritten to a SCAN of
  * the maintained view, so the aggregation (and at 100 TB, the table
  * scan that dominates it) disappears in favor of a group-cardinality
  * read. This is the BigQuery/Databricks "automatic MV rewrite"
  * analogue, built from public Catalyst surface only.
  *
  * Matching is deliberately narrow and structural (grouping on plain
  * attributes that exactly SET-match a registered key list; result
  * expressions drawn from {group keys, SUM(column), COUNT(1)}; base
  * resolved by the scan's root path) — a rewrite that fires on shapes
  * the MV cannot answer would be a wrong-results bug, so anything
  * else is left untouched. Output attributes keep the ORIGINAL
  * exprIds via aliasing, so parent operators (filters, joins, sorts
  * above the aggregate) resolve against the rewritten subtree
  * unchanged.
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

  /** One registered rewrite target: aggregate-over-`basePath` grouped
    * on exactly `groupCols` with SUM(`sumCol`)/COUNT(1) — and, when
    * the view carries them, MIN/MAX(`sumCol`) — results answers from
    * `mvPlan`, whose output columns are (`groupOuts` aligned to
    * `groupCols`, `sumOut`, `cntOut`, optional `minOut`/`maxOut`). */
  final case class MvTarget(basePath: String, groupCols: Seq[String],
                            sumCol: String, groupOuts: Seq[String],
                            sumOut: String, cntOut: String,
                            mvPlan: LogicalPlan,
                            minOut: Option[String] = None,
                            maxOut: Option[String] = None)

  private val targets = new ConcurrentHashMap[(String, String), MvTarget]()

  /** Register `mv` (a resolved DataFrame of the maintained view —
    * e.g. `VersionedParquet.read(spark, mvRoot)`) as the answer to
    * sum/count aggregates over `basePath` grouped on `groupCols`. The
    * MV's analyzed plan is captured NOW — re-register after advancing
    * the view (refresh semantics). Several views may register for one
    * base (different key sets); each key set holds one view. */
  def register(basePath: String, groupCols: Seq[String], sumCol: String,
               mv: org.apache.spark.sql.DataFrame,
               groupOuts: Seq[String], sumOut: String,
               cntOut: String, minOut: Option[String] = None,
               maxOut: Option[String] = None): Unit = {
    require(groupCols.nonEmpty && groupCols.length == groupOuts.length,
      "groupCols and groupOuts must align")
    val plan = mv.queryExecution.analyzed
    targets.put((normalize(basePath), groupCols.sorted.mkString(" ")),
      MvTarget(normalize(basePath), groupCols, sumCol,
        groupOuts, sumOut, cntOut, plan, minOut, maxOut))
  }

  /** Single-key convenience overload. */
  def register(basePath: String, groupCol: String, sumCol: String,
               mv: org.apache.spark.sql.DataFrame,
               groupOut: String, sumOut: String, cntOut: String): Unit =
    register(basePath, Seq(groupCol), sumCol, mv, Seq(groupOut),
      sumOut, cntOut)

  def clear(): Unit = targets.clear()

  private[plans] def lookup(path: String): Seq[MvTarget] = {
    val p = normalize(path)
    targets.values.asScala.filter(_.basePath == p).toSeq
  }

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
    case agg @ Aggregate(groupExprs, aggExprs, child, _)
        if groupExprs.nonEmpty &&
          groupExprs.forall(_.isInstanceOf[AttributeReference]) =>
      val keys = groupExprs.map(_.asInstanceOf[AttributeReference])
      val keyNames = keys.map(_.name).toSet
      stripped(child) match {
        case Some((path, conds)) =>
          // a residual filter is safe ONLY when it is deterministic
          // AND references nothing but the QUERY's group keys: such
          // predicates commute with the aggregate (keys pass through),
          // so they re-apply above the MV scan. This is exactly what
          // the optimizer's join-key null elimination pushes under
          // aggregates (isnotnull(g)); anything touching other columns
          // (a filtered base) must NOT answer from the unfiltered
          // view. A nondeterministic predicate (rand() < 0.5) or one
          // with NO references that is not a pure literal must not be
          // hoisted either: row-level sampling before aggregation is
          // not group-level sampling after it.
          val usable = MvRegistry.lookup(path)
            .filter(mv => conds.forall(c => c.deterministic && (
              c.foldable ||
                (c.references.nonEmpty && c.references.toSeq.forall(a =>
                  mv.groupCols.contains(a.name) &&
                    keyNames.contains(a.name))))))
          // exact key-set match serves directly (no aggregation left);
          // otherwise a FINER view (query keys ⊂ view keys) answers by
          // RE-AGGREGATING group-cardinality rows — sound for SUM and
          // COUNT because both are re-aggregable (sum of sums; count =
          // sum of counts); the classic rollup rewrite
          val exact = usable
            .filter(_.groupCols.sorted == keys.map(_.name).sorted)
            .view.flatMap(mv => rewriteExact(aggExprs, conds, mv))
          val rollup = usable
            .filter(mv => keyNames.subsetOf(mv.groupCols.toSet) &&
              keyNames.size < mv.groupCols.length)
            .view.flatMap(mv => rewriteRollup(keys, aggExprs, conds, mv))
          exact.headOption.orElse(rollup.headOption).getOrElse(agg)
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
    case Filter(cond, child) =>
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

  /** Filter conditions rebound to the view's key attributes, layered
    * over the view plan. */
  private def filteredMv(conds: Seq[Expression],
                         keyOut: Map[String, Attribute],
                         mv: MvTarget): LogicalPlan =
    if (conds.isEmpty) mv.mvPlan
    else {
      val rebound = conds.map(_.transform {
        case a: AttributeReference if keyOut.contains(a.name) =>
          keyOut(a.name)
      }).reduce(And)
      Filter(rebound, mv.mvPlan)
    }

  /** Coarser grouping off a finer view: Aggregate(query keys) over the
    * view, with SUM(x) → SUM(view.sum) and COUNT(1) → SUM(view.cnt).
    * The aggregate survives, but its input is group-cardinality rows
    * instead of the corpus. */
  private def rewriteRollup(keys: Seq[AttributeReference],
                            aggExprs: Seq[NamedExpression],
                            conds: Seq[Expression],
                            mv: MvTarget): Option[LogicalPlan] = {
    val keyOut: Map[String, Attribute] =
      mv.groupCols.zip(mv.groupOuts).flatMap { case (k, o) =>
        mvAttr(mv, o).map(k -> _) }.toMap
    if (keyOut.size != mv.groupCols.length) return None
    val (sOut, cOut) = (mvAttr(mv, mv.sumOut), mvAttr(mv, mv.cntOut)) match {
      case (Some(b), Some(c)) => (b, c)
      case _ => return None
    }
    def reAgg(fn: Attribute => org.apache.spark.sql.catalyst.expressions
        .aggregate.AggregateFunction)(of: Attribute,
        to: NamedExpression): NamedExpression = {
      val agged: Expression = fn(of).toAggregateExpression()
      val e = if (agged.dataType == to.dataType) agged
              else Cast(agged, to.dataType)
      Alias(e, to.name)(exprId = to.exprId)
    }
    val reSum = reAgg(Sum(_)) _
    // min of mins / max of maxes — re-aggregable like sum
    val reMin = reAgg(org.apache.spark.sql.catalyst.expressions
      .aggregate.Min(_)) _
    val reMax = reAgg(org.apache.spark.sql.catalyst.expressions
      .aggregate.Max(_)) _
    val minAttr = mv.minOut.flatMap(mvAttr(mv, _))
    val maxAttr = mv.maxOut.flatMap(mvAttr(mv, _))
    val mapped = aggExprs.map {
      case a: AttributeReference if keyOut.contains(a.name) =>
        out(keyOut(a.name), a)
      case al @ Alias(child: AttributeReference, _)
          if keyOut.contains(child.name) =>
        out(keyOut(child.name), al)
      case al @ Alias(
          AggregateExpression(Sum(e: AttributeReference, _), _, false,
            None, _), _) if e.name == mv.sumCol =>
        reSum(sOut, al)
      case al @ Alias(
          AggregateExpression(Count(Seq(Literal(v, _))), _, false,
            None, _), _) if v != null =>
        // COUNT(NULL) is 0 per group, NOT the view's count(*) — only
        // non-null literals map to the maintained count
        reSum(cOut, al)
      case al @ Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate
            .Min(e: AttributeReference), _, false, None, _), _)
          if e.name == mv.sumCol && minAttr.isDefined =>
        reMin(minAttr.get, al)
      case al @ Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate
            .Max(e: AttributeReference), _, false, None, _), _)
          if e.name == mv.sumCol && maxAttr.isDefined =>
        reMax(maxAttr.get, al)
      case _ => return None
    }
    val groupOuts: Seq[Expression] = keys.map(k => keyOut(k.name))
    Some(Aggregate(groupOuts, mapped, filteredMv(conds, keyOut, mv)))
  }

  private def rewriteExact(aggExprs: Seq[NamedExpression],
                      conds: Seq[Expression],
                      mv: MvTarget): Option[LogicalPlan] = {
    val keyOut: Map[String, Attribute] =
      mv.groupCols.zip(mv.groupOuts).flatMap { case (k, o) =>
        mvAttr(mv, o).map(k -> _) }.toMap
    if (keyOut.size != mv.groupCols.length) return None
    val (sOut, cOut) = (mvAttr(mv, mv.sumOut), mvAttr(mv, mv.cntOut)) match {
      case (Some(b), Some(c)) => (b, c)
      case _ => return None
    }
    val mapped = aggExprs.map {
      case a: AttributeReference if keyOut.contains(a.name) =>
        out(keyOut(a.name), a)
      case al @ Alias(child: AttributeReference, _)
          if keyOut.contains(child.name) =>
        out(keyOut(child.name), al)
      case al @ Alias(
          AggregateExpression(Sum(e: AttributeReference, _), _, false,
            None, _), _) if e.name == mv.sumCol =>
        out(sOut, al)
      case al @ Alias(
          AggregateExpression(Count(Seq(Literal(v, _))), _, false,
            None, _), _) if v != null =>
        // COUNT(NULL) is 0 per group — see rewriteRollup
        out(cOut, al)
      case al @ Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate
            .Min(e: AttributeReference), _, false, None, _), _)
          if e.name == mv.sumCol && mv.minOut.flatMap(mvAttr(mv, _))
            .isDefined =>
        out(mv.minOut.flatMap(mvAttr(mv, _)).get, al)
      case al @ Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate
            .Max(e: AttributeReference), _, false, None, _), _)
          if e.name == mv.sumCol && mv.maxOut.flatMap(mvAttr(mv, _))
            .isDefined =>
        out(mv.maxOut.flatMap(mvAttr(mv, _)).get, al)
      case _ => return None
    }
    // group-key-only predicates re-apply above the view, rebound to
    // the MV's key attributes
    Some(Project(mapped, filteredMv(conds, keyOut, mv)))
  }
}
