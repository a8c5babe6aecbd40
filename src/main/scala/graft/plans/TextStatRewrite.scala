package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Length, Literal, Lower, RegExpExtractAll, RegExpReplace, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{TextKernels, TextStat}

/** Optimizer rule: recognize the declarative regex-counting shapes the
  * text-quality tier is built from and replace them with the single-pass
  * [[TextStat]] kernel — so a SQL/DataFrame user who writes the textbook
  * formulation gets kernel throughput without knowing the kernel exists.
  *
  * Rewrites (exact literal-pattern matches only — anything else is left
  * to the regex engine):
  *  - `length(regexp_replace(lower(s), '[^a-z0-9]', ''))`  → ALNUM_LOWER
  *  - `length(regexp_replace(s, '[a-zA-Z0-9\s]', ''))`     → PUNCT
  *  - `regexp_count(s, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')` → BPE_PIECES
  *
  * Equivalence of each pair is the property TextKernelSpec checks
  * (including the documented per-codepoint-lowercase caveat, which does
  * not affect ALNUM_LOWER counts). The regex forms each run an NFA and
  * materialize a stripped copy of the document per row; the kernel is
  * one forward pass, no allocation, and stays in whole-stage codegen.
  *
  * Injected by [[GraftExtensions]] via `injectOptimizerRule`, so it
  * rides the same deployment as the SQL functions. The rule is
  * idempotent (its output contains none of its input shapes) and purely
  * expression-local, so it is safe anywhere in the operator-optimization
  * batch: it changes no plan structure, nullability, or type.
  */
object TextStatRewrite extends Rule[LogicalPlan] {

  private def lit(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, StringType) => Some(s.toString)
    case _ => None
  }

  private def isOne(e: Expression): Boolean = e match {
    case Literal(v: Int, IntegerType) => v == 1
    case _ => false
  }

  private val AlnumPattern = "[^a-z0-9]"
  private val PunctPattern = "[a-zA-Z0-9\\s]"
  private val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Length(RegExpReplace(Lower(subject), regex, rep, pos))
        if subject.dataType == StringType &&
          lit(regex).contains(AlnumPattern) && lit(rep).contains("") &&
          isOne(pos) =>
        TextStat(subject, TextKernels.AlnumLower)
      case Length(RegExpReplace(subject, regex, rep, pos))
        if subject.dataType == StringType &&
          lit(regex).contains(PunctPattern) && lit(rep).contains("") &&
          isOne(pos) =>
        TextStat(subject, TextKernels.Punct)
      // regexp_count is RuntimeReplaceable: by optimization time it is
      // already size(regexp_extract_all(s, re, 0)) — match that form
      case Size(RegExpExtractAll(subject, regex, idx), _)
        if subject.dataType == StringType &&
          lit(regex).contains(BpePattern) &&
          (idx match { case Literal(v: Int, IntegerType) => v == 0
                       case _ => false }) =>
        TextStat(subject, TextKernels.BpePieces)
    }
}
