package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` access point the DSv1 streaming source needs.
  *
  * `MicroBatchExecution` asserts that the DataFrame a `Source.getBatch`
  * returns carries `isStreaming = true`; the only way to mint such a
  * frame from an arbitrary logical plan is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming = true)`,
  * which is `private[sql]`. Housing this two-line forwarder under
  * `org.apache.spark.sql` is the established pattern for out-of-tree
  * DSv1 streaming sources (Delta Lake's `DeltaSource` lives under
  * `org.apache.spark.sql.delta` for exactly this reason). Nothing else
  * in the repo touches Spark internals through this package.
  */
object StreamShim {

  /** Re-brand a (lazy) batch DataFrame as a streaming micro-batch
    * result. `queryExecution.toRdd` compiles the plan but does not run
    * it — execution still happens when the sink consumes the batch. */
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[
      org.apache.spark.sql.Row]]
    cs.internalCreateDataFrame(cd.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
