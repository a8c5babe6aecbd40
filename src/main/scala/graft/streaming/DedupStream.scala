package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.DedupOps
import graft.warehouse.VersionedParquet

/** Incremental near-dup detection as a stream: q79's persist-and-probe
  * contract run continuously. Each arriving document drop
  *
  *   1. computes its own MinHash signatures (batch-local and exact — a
  *      signature depends only on its document's shingles),
  *   2. probes its band keys against the STORED index PLUS itself
  *      (self-probe catches within-batch duplicates), appending the
  *      candidate pairs to the output log,
  *   3. folds its signatures into the stored index, so later batches
  *      probe against everything seen.
  *
  * Every pair of near-dup documents is emitted by whichever batch saw
  * the LATER of the two (or the shared batch) — so the union of emitted
  * pairs over all drops equals the full-corpus candidate set, which is
  * exactly what DedupStreamSpec asserts against the batch build. Per
  * batch the probe work is |batch| band keys joined against the index —
  * never a corpus rescan; the index grows by one signature row per new
  * doc (33 longs), the same mergeable-state shape as SketchStream's
  * registers.
  *
  * foreachBatch idempotence: a batch retried after the pairs append
  * but before checkpoint commit re-appends its pairs; the downstream
  * consumer dedups on (id_a, id_b) — candidates are a set by
  * definition. The INDEX is exactly-once two ways over: it lives in a
  * VersionedParquet table committed with the batch-id marker
  * (VersionedSink's guard — a replay of an already-committed batch is
  * skipped outright, and concurrent readers of the index are never
  * disturbed by a fold), and the fold itself stays structurally
  * idempotent (rows for this batch's doc_ids are anti-joined out
  * before the union), which also makes RE-INGESTING a document in a
  * later batch an upsert instead of a duplicate signature row.
  */
object DedupStream {

  /** documents.parquet schema (TESTDATA.md) for the file-source stream. */
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Watch `watchDir` for document drops; maintain the signature index
    * at `indexPath` and append candidate pairs to `pairsPath`. Caller
    * awaits/stops the query. */
  def run(spark: SparkSession, watchDir: String, indexPath: String,
          pairsPath: String, checkpoint: String): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(watchDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Replay of a committed batch: its pairs were appended BEFORE
        // the index publish that recorded the marker, so skipping the
        // whole body repeats nothing and loses nothing.
        if (!VersionedSink.lastBatchId(spark, indexPath).exists(_ >= batchId)) {
          val sigs = DedupOps.signaturesOf(DedupOps.shingleFrameOf(batch))
            .localCheckpoint(true) // computed once: probed, then stored
          val stored =
            if (VersionedParquet.currentVersion(spark, indexPath).isDefined)
              VersionedParquet.read(spark, indexPath)
            else sigs.limit(0)
          val folded = foldIndex(stored, sigs)
          val pairs = DedupOps.candidatesBetween(
            DedupOps.bandKeys(sigs), DedupOps.bandKeys(folded))
          pairs.write.mode("append").parquet(pairsPath)
          VersionedParquet.publish(folded, indexPath,
            markers = Map(VersionedSink.BatchMarker -> batchId.toString))
        }
        ()
      }
      .start()

  /** Retry-safe index fold: drop any stored rows for this batch's docs
    * first, so replaying a batch whose index overwrite already
    * committed reproduces the identical index (idempotent:
    * foldIndex(foldIndex(s, b), b) == foldIndex(s, b)) instead of
    * duplicating signature rows. The batch id set broadcasts — a batch
    * is bounded, the index is not. */
  private[graft] def foldIndex(stored: DataFrame,
                               sigs: DataFrame): DataFrame =
    stored
      .join(org.apache.spark.sql.functions.broadcast(
        sigs.select("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(sigs)

  /** Delete documents from the stored index (retention / right-to-be-
    * forgotten): an anti-join drops their signature rows, so no future
    * probe can pair against them. O(index) rewrite with the deleted-id
    * set broadcast — with a transactional table format this is a
    * DELETE; pairs already emitted are the CONSUMER's deletion
    * obligation (an append-only log cannot unsay them). */
  def deleteDocs(spark: SparkSession, indexPath: String,
                 docIds: Seq[Long]): Unit = {
    import spark.implicits._
    val ids = docIds.toDF("doc_id")
    // carry the batch marker forward: a delete is not a batch commit,
    // and losing the marker would let a replayed old batch re-fold
    val marker = VersionedSink.lastBatchId(spark, indexPath)
      .map(b => Map(VersionedSink.BatchMarker -> b.toString))
      .getOrElse(Map.empty[String, String])
    VersionedParquet.publish(
      VersionedParquet.read(spark, indexPath)
        .join(org.apache.spark.sql.functions.broadcast(ids),
          Seq("doc_id"), "left_anti"),
      indexPath, markers = marker)
  }
}
