package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.warehouse.VersionedParquet

/** Continuously-maintained materialized view — q110's signed-delta
  * incremental aggregate run as a stream: each micro-batch of CDC rows
  * (op = +1 insert / −1 delete) advances the stored per-group aggregate
  * by the batch's signed contributions and publishes the result as ONE
  * new table version through the exactly-once [[VersionedSink]].
  *
  * This fuses the three lakehouse subsystems into the headline feature:
  *  - incremental maintenance (VersionOps.incrementalAgg's fold):
  *    refresh cost is O(batch + groups), never a rescan of history;
  *  - exactly-once publication: a replayed micro-batch (crash between
  *    side effect and checkpoint commit) is skipped by the `_BATCHID`
  *    marker, so the aggregate is never double-advanced;
  *  - time travel: every published version IS the view as of that
  *    batch, so "maintained == from-scratch recompute" is checkable at
  *    EVERY version (MvStreamSpec proves it across a restart).
  *
  * At 100 TB the maintained frame is group-cardinality (not corpus-
  * cardinality) and the per-batch fold is one shuffle of the batch
  * plus a group-keyed full-outer merge — the standard streaming-MV
  * shape (same maintenance algebra as materialized-view logs: count
  * and sum are self-maintainable under insert/delete without history).
  *
  * Deletes that drive a group's count to zero drop the group row —
  * matching the batch q110 semantics (`n_docs > 0`).
  */
object MvStream {

  /** Advance the stored (lang, n_docs, sum_chars) aggregate by one
    * micro-batch of signed CDC rows (lang, n_chars, w ∈ {+1, −1}).
    * Pure fold: used by the streaming sink AND directly testable on
    * batch frames. */
  def maintainFold(current: DataFrame, batch: DataFrame): DataFrame = {
    val cur =
      if (current.columns.contains("n_docs")) current
      else current.sparkSession.createDataFrame(
        current.sparkSession.sparkContext
          .emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "lang STRING, n_docs BIGINT, sum_chars BIGINT"))
    val delta = batch.groupBy("lang")
      .agg(sum("w").as("dn"),
        sum(col("w") * col("n_chars")).cast("long").as("dc"))
    cur.join(delta, Seq("lang"), "full_outer")
      .select(col("lang"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("sum_chars"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .as("sum_chars"))
      .filter(col("n_docs") > 0)
  }

  /** VersionedSink's `fold` signature: the sink hands the live table
    * (or an empty-schema frame before the first commit). */
  private def fold(current: DataFrame, batch: DataFrame): DataFrame =
    maintainFold(current, batch)

  /** Drive a CDC stream (lang, n_chars, w) into a continuously-
    * maintained aggregate at `root`, one published version per
    * micro-batch. `keepVersions` large keeps every version
    * time-travelable for auditing. */
  def run(source: DataFrame, root: String, checkpoint: String,
          keepVersions: Int = 1000): StreamingQuery =
    VersionedSink.run(source, root, checkpoint, fold,
      keepVersions = keepVersions)

  /** From-scratch recompute over a pile of CDC rows — the audit side
    * of "maintained == recompute". */
  def recompute(cdc: DataFrame): DataFrame =
    cdc.groupBy("lang")
      .agg(sum("w").as("n_docs"),
        sum(col("w") * col("n_chars")).cast("long").as("sum_chars"))
      .filter(col("n_docs") > 0)

  /** All published versions of the maintained view, for audits. */
  def versions(spark: SparkSession, root: String): Seq[Long] =
    VersionedParquet.versions(spark, root)
}
