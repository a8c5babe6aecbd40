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

  /** A maintainable view definition: group by `key`, count into
    * `countCol` (= Σw), and for each (valueCol → outName) maintain
    * Σ(w·value). Count and sum are exactly the self-maintainable
    * aggregates under insert/delete without history (avg/ratios derive
    * from them at read time; min/max are NOT self-maintainable under
    * deletes and need the q110 full-recompute path). */
  final case class MvSpec(key: String, weightCol: String,
                          countCol: String, sums: Seq[(String, String)]) {
    private[MvStream] def stateDdl: String =
      (s"$key STRING, $countCol BIGINT" +:
        sums.map { case (_, out) => s"$out BIGINT" }).mkString(", ")
  }

  /** The spec the gate + MvStreamSpec exercise: per-lang doc count and
    * character mass over (lang, n_chars, w) CDC rows. */
  val docStats: MvSpec =
    MvSpec("lang", "w", "n_docs", Seq("n_chars" -> "sum_chars"))

  /** Advance the stored aggregate by one micro-batch of signed CDC
    * rows (w ∈ {+1, −1}). Pure fold — used by the streaming sink AND
    * directly testable on batch frames. Counts and sums are ADDITIVE,
    * so the merge is a union + one group-keyed re-aggregation (the
    * batch partial-aggregates map-side before the single shuffle) —
    * NOT a full-outer join, which Spark can only plan as a two-sided
    * sort-merge on these group-cardinality frames (q128/q156 each
    * carried 6 SMJ before this). Groups whose count retracts to zero
    * drop out (matching q110's `n > 0`). */
  def maintainFold(spec: MvSpec)(current: DataFrame,
                                 batch: DataFrame): DataFrame = {
    val cur =
      if (current.columns.contains(spec.countCol)) current
      else current.sparkSession.createDataFrame(
        current.sparkSession.sparkContext
          .emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(spec.stateDdl))
    val w = col(spec.weightCol)
    val delta = batch.select(
      col(spec.key) +: w.cast("long").as(spec.countCol) +:
        spec.sums.map { case (v, out) =>
          (w * col(v)).cast("long").as(out) }: _*)
    cur.select(col(spec.key) +: col(spec.countCol).cast("long")
        .as(spec.countCol) +:
        spec.sums.map { case (_, out) =>
          col(out).cast("long").as(out) }: _*)
      .unionByName(delta)
      .groupBy(spec.key)
      .agg(sum(spec.countCol).as(spec.countCol),
        spec.sums.map { case (_, out) => sum(out).as(out) }: _*)
      .filter(col(spec.countCol) > 0)
  }

  /** The docStats instance (kept as the module's simple entry point). */
  def maintainFold(current: DataFrame, batch: DataFrame): DataFrame =
    maintainFold(docStats)(current, batch)


  /** Drive a CDC stream into a continuously-maintained aggregate at
    * `root` for any MvSpec, one published version per micro-batch.
    * `keepVersions` large keeps every version time-travelable for
    * auditing. */
  def run(spec: MvSpec, source: DataFrame, root: String,
          checkpoint: String, keepVersions: Int): StreamingQuery =
    VersionedSink.run(source, root, checkpoint, maintainFold(spec) _,
      keepVersions = keepVersions)

  /** The docStats instance over (lang, n_chars, w) CDC rows. */
  def run(source: DataFrame, root: String, checkpoint: String,
          keepVersions: Int = 1000): StreamingQuery =
    run(docStats, source, root, checkpoint, keepVersions)

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
