package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.warehouse.VersionedParquet

/** Streaming CDC apply — a change stream continuously maintained into
  * a [[VersionedParquet]] table through merge-on-read writes.
  *
  * Each micro-batch carries keyed change rows: data columns plus an
  * op column (`"U"` upsert / `"D"` delete) and a monotone sequence
  * column ordering changes to the SAME key. The batch collapses to its
  * latest change per key (row_number over the key window — the
  * standard CDC compaction), splits into upserts and delete keys, and
  * lands as ONE `VersionedParquet.merge` version: base files never
  * rewritten, vector + delta + change feed grow by O(batch).
  *
  * Exactly-once: the `_BATCHID` marker commits atomically with the
  * merge version (same discipline as [[VersionedSink]]) — a replayed
  * micro-batch after a crash-before-checkpoint is recognized and
  * skipped, so a change is never applied twice even though
  * `foreachBatch` itself is at-least-once. The first batch of a fresh
  * table publishes its surviving upserts as the physical v0.
  *
  * At 100 TB this is the write path for a continuously-updated serving
  * table: per-batch cost scales with the CHANGE volume (one base scan
  * to locate replaced rows, no rewrite), `compact` collects the delta
  * debt on a schedule, and every micro-batch stays a time-travelable
  * version with a replayable change feed (`VersionedParquet.changes`).
  */
object MorStream {

  /** Collapse a CDC batch to its final effect: the latest change per
    * key (by `seqCol`, ties broken arbitrarily-but-deterministically
    * by preferring deletes) → (upsert rows without op/seq, delete
    * keys). Pure — used by the sink and directly testable. */
  def collapse(batch: DataFrame, keyCols: Seq[String], opCol: String,
               seqCol: String): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).asc)
    val latest = batch
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val upserts = latest.filter(col(opCol) =!= "D").drop(opCol, seqCol)
    val deletes = latest.filter(col(opCol) === "D")
      .select(keyCols.map(col): _*)
    (upserts, deletes)
  }

  /** Apply one micro-batch; returns false iff already committed. */
  private[graft] def commitBatch(spark: SparkSession, root: String,
                                 batchId: Long, batch: DataFrame,
                                 keyCols: Seq[String], opCol: String,
                                 seqCol: String,
                                 keepVersions: Int): Boolean = {
    if (VersionedSink.lastBatchId(spark, root).exists(_ >= batchId)) false
    else {
      val (upserts, deleteKeys) = collapse(batch, keyCols, opCol, seqCol)
      if (VersionedParquet.currentVersion(spark, root).isEmpty)
        VersionedParquet.publish(upserts, root, keepVersions = keepVersions,
          markers = Map(VersionedSink.BatchMarker -> batchId.toString))
      else
        VersionedParquet.merge(spark, root, upserts, deleteKeys, keyCols,
          keepVersions = keepVersions,
          markers = Map(VersionedSink.BatchMarker -> batchId.toString))
      true
    }
  }

  /** Drive a CDC stream into the table at `root`. Caller awaits/stops
    * the returned query. */
  def run(source: DataFrame, root: String, checkpoint: String,
          keyCols: Seq[String], opCol: String = "op",
          seqCol: String = "seq",
          keepVersions: Int = 20): StreamingQuery = {
    val spark = source.sparkSession
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(spark, root, batchId, batch, keyCols, opCol, seqCol,
          keepVersions)
        ()
      }
      .start()
  }
}
