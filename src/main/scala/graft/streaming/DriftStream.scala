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
  * O(cells present in the batch) — cell cardinality, not batch rows.
  * The read-path debt (the log grows by cells per batch) is bounded
  * by the wired-in FOLD: every `foldEvery` batches the log compacts
  * to its per-cell sums — one row per cell — carrying the batch
  * marker forward, so a year-long monitor's log stays
  * O(cells × foldEvery) = O(cells), never O(cells × batches).
  * Increments are sums, so the fold is readout-identical by
  * construction (sums of sums), which DriftStreamSpec proves against
  * the live readout. The χ² readout over the maintained cells is
  * exactly q230's: by construction Σ increments == the one-shot cell
  * counts, so the statistic is bit-identical to a full recompute —
  * which is what the q232 oracle proves.
  */
object DriftStream {

  /** Drive `source` (streaming event rows with `ts` and `event_type`)
    * into the cell-increment log at `cellsRoot`. One increment tranche
    * per non-empty micro-batch, exactly-once; every `foldEvery`
    * batches the log auto-folds (see [[compactLog]]). */
  def run(source: DataFrame, cellsRoot: String,
          checkpoint: String, keepVersions: Int = 10,
          foldEvery: Int = 64): StreamingQuery = {
    val spark = source.sparkSession
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persisted per batch: the cell-increment aggregate (bounded —
        // one row per populated cell) feeds the emptiness probe AND
        // the append; without the persist the batch's full aggregation
        // ran twice (r16 optimization, guide §1.2)
        val inc = graft.operators.ProfileOps.eventCells(batch).persist()
        try {
          if (inc.limit(1).count() > 0)
            VersionedSink.commitAppend(spark, cellsRoot, batchId, inc,
              keepVersions)
        } finally { inc.unpersist(blocking = false); () }
        // deterministic O(1) trigger on the monotone batch id — runs
        // even when the commit above was a replay no-op (folding is
        // idempotent), so a crash between commit and fold self-heals
        if (foldEvery > 0 && batchId % foldEvery == foldEvery - 1)
          compactLog(spark, cellsRoot, keepVersions)
        ()
      }
      .start()
  }

  /** Fold the increment log: publish the per-cell summed state as ONE
    * tranche — row count drops from cells × tranches to cells — with
    * the live `_BATCHID` marker carried forward, so the exactly-once
    * replay guard survives the rewrite (a replayed pre-fold batch id
    * still refuses). Safe to call any time, from the wired trigger or
    * out of band; a no-op before the first commit. */
  def compactLog(spark: org.apache.spark.sql.SparkSession,
                 cellsRoot: String, keepVersions: Int = 10): Unit =
    VersionedSink.lastBatchId(spark, cellsRoot).foreach { last =>
      graft.warehouse.VersionedParquet.publish(
        cells(spark, cellsRoot)
          .select("cell", "cohort", "o", "dimension"), // tranche order
        cellsRoot, keepVersions = keepVersions,
        markers = Map(VersionedSink.BatchMarker -> last.toString))
    }

  /** The maintained cell state: increments summed per cell — the
    * frame q230's `chi2Report` consumes. */
  def cells(spark: org.apache.spark.sql.SparkSession,
            cellsRoot: String): DataFrame =
    graft.warehouse.VersionedParquet.read(spark, cellsRoot)
      .groupBy("dimension", "cell", "cohort")
      .agg(sum("o").as("o"))
}
