package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.VectorDot

/** Optimizer rule: recognize the declarative dot-product idiom
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)`
  *
  * and replace it with the fused [[VectorDot]] kernel. The idiom is the
  * textbook Spark formulation (and what this engine's similarity tier
  * used before the kernel existed) — but higher-order lambdas run
  * INTERPRETED, and the zip materializes an intermediate array per row.
  * The kernel is one static call inside whole-stage codegen.
  *
  * Soundness: the rewrite fires only when every per-element product is
  * computed in DOUBLE — elements are double, or the lambda casts each
  * operand to double (a float×float product in double is exact: 24+24
  * significand bits fit 53). A float-typed multiply would round
  * per-element and the kernel would NOT reproduce it; that shape is
  * left alone. Both fold orders are ascending-index, so sums agree
  * bit-for-bit. The finish lambda must be the identity and the zero
  * literal 0.0 — anything else is not a plain dot product.
  *
  * Injected by [[GraftExtensions]] next to [[TextStatRewrite]].
  */
object VectorDotRewrite extends Rule[LogicalPlan] {

  private def isFloatOrDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** `e` is lambda variable `v` evaluated in double: the variable
    * itself when its own type is double, or a cast of it to double. */
  private def isVarAsDouble(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable =>
        nv.exprId == v.exprId && nv.dataType == DoubleType
      case Cast(nv: NamedLambdaVariable, DoubleType, _, _) =>
        nv.exprId == v.exprId
      case _ => false
    }

  /** `e` IS lambda variable `v` (no cast — the merge must be a plain
    * double add of the accumulator and the element). */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(ml, mr, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(al, ar, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(f: NamedLambdaVariable), _))
        if isFloatOrDoubleArray(a) && isFloatOrDoubleArray(b) &&
          ((isVarAsDouble(ml, x) && isVarAsDouble(mr, y)) ||
            (isVarAsDouble(ml, y) && isVarAsDouble(mr, x))) &&
          ((isVar(al, acc) && isVar(ar, v)) ||
            (isVar(al, v) && isVar(ar, acc))) &&
          fin.exprId == f.exprId =>
        VectorDot(a, b)
    }
}
