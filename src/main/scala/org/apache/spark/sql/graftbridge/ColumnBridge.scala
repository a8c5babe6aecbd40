package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column constructor so graft's
  * custom Catalyst `Expression`s (native codegen kernels) can be used as
  * ordinary `Column`s without registering session-scoped functions.
  * Lives under `org.apache.spark.sql` for access only — the standard
  * pattern for Spark extension libraries; nothing else belongs here.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
