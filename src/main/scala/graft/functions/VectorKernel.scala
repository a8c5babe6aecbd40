package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over array columns.
  *
  * The similarity tier's inner loop was `aggregate(zip_with(a, b, ...))`
  * — higher-order lambdas run INTERPRETED (no codegen, no CSE), and the
  * zip materializes an intermediate array per row. This expression is
  * one static call inside whole-stage codegen: a single fused
  * multiply-add loop over the two arrays, no intermediate allocation.
  *
  * Summation order is ascending-index — IDENTICAL to the sequential
  * fold it replaces and to DuckDB's list_sum(list_transform(...)), so
  * every existing oracle still hash-matches bit-for-bit.
  *
  * Elements are assumed non-null (the embedding/matrix columns carry
  * none); extra elements past the shorter length are ignored.
  */
object VectorKernels {
  /** Called from generated code (static forwarder) and nullSafeEval. */
  def dot(a: ArrayData, b: ArrayData, aDouble: Boolean, bDouble: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0.0
    while (i < n) {
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      s += x * y
      i += 1
    }
    s
  }
}

case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot needs array<float|double> children, " +
        s"got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsDouble(left), elemIsDouble(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.dot($a, $b, ${elemIsDouble(left)}, ${elemIsDouble(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      VectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
