package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Bridge to the session FunctionRegistry (`private[sql]` surface) so
  * graft's SQL functions can be registered on an ALREADY-RUNNING
  * session — the path for sessions not built with
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Same placement
  * rationale as [[ColumnBridge]].
  */
object FunctionBridge {
  def register(spark: SparkSession,
               fn: (FunctionIdentifier, ExpressionInfo,
                 Seq[Expression] => Expression)): Unit = {
    val registry =
      spark.asInstanceOf[ClassicSession].sessionState.functionRegistry
    registry.registerFunction(fn._1, fn._2, fn._3)
  }
}
