package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming drift monitoring — the continuous twin of the one-shot
  * χ² gate (q230): events ARRIVE as micro-batches and the monitored
  * contingency cells (dimension, cell, cohort, o) maintain
  * incrementally. Each batch contributes its own cell counts as an
  * APPEND-ONLY increment tranche (event-sourced cells: readers sum
  * increments per cell), exactly-once by `VersionedSink`'s
  * batch-marker rule — increments are sums, so they commute, replay
  * order never matters, and a crash-replayed batch re-applies to
  * nothing.
  *
  * Append-only is deliberate: a fold-in-place upsert would pay a
  * keyed MERGE per micro-batch; the increment log keeps every commit
  * O(cells present in the batch) — cell cardinality, not batch rows —
  * and the log stays bounded by cells × batches, reclaimable by the
  * same compaction tier as any small-file pattern (q140/auto-compact).
  * The χ² readout over the maintained cells is exactly q230's: by
  * construction Σ increments == the one-shot cell counts, so the
  * statistic is bit-identical to a full recompute — which is what the
  * q232 oracle proves.
  */
object DriftStream {

  /** Drive `source` (streaming event rows with `ts` and `event_type`)
    * into the cell-increment log at `cellsRoot`. One increment tranche
    * per non-empty micro-batch, exactly-once. */
  def run(source: DataFrame, cellsRoot: String,
          checkpoint: String, keepVersions: Int = 10): StreamingQuery = {
    val spark = source.sparkSession
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val inc = graft.operators.ProfileOps.eventCells(batch)
        if (inc.limit(1).count() > 0)
          VersionedSink.commitAppend(spark, cellsRoot, batchId, inc,
            keepVersions)
        ()
      }
      .start()
  }

  /** The maintained cell state: increments summed per cell — the
    * frame q230's `chi2Report` consumes. */
  def cells(spark: org.apache.spark.sql.SparkSession,
            cellsRoot: String): DataFrame =
    graft.warehouse.VersionedParquet.read(spark, cellsRoot)
      .groupBy("dimension", "cell", "cohort")
      .agg(sum("o").as("o"))
}
