package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.warehouse.VersionedParquet

/** Exactly-once streaming sink into a [[VersionedParquet]] table.
  *
  * `foreachBatch` alone is at-least-once: after a crash between the
  * batch's side effect and the checkpoint commit, Structured Streaming
  * REPLAYS the batch with the same batchId — a non-idempotent fold
  * (append, increment) would then double-apply it. This sink makes the
  * fold exactly-once by making the table publication itself carry the
  * batch id:
  *
  *  - each committed micro-batch publishes ONE new table version whose
  *    snapshot directory contains a `_BATCHID` marker, written before
  *    the atomic pointer swap — so "batch b is committed" is exactly
  *    "the live snapshot's marker is >= b" (markers commit atomically
  *    with the version; batchIds are monotone per checkpoint);
  *  - on entry the sink reads the live marker and SKIPS any batchId it
  *    has already committed — the replayed batch becomes a no-op;
  *  - a crash after the parquet write but before the swap leaves an
  *    orphan directory the next publish clobbers, and the fold re-runs
  *    against the OLD live version the pointer still names — no
  *    double-apply, no loss.
  *
  * This is the transactional-sink pattern a commit-log format gives
  * `foreachBatch` (txnVersion/txnAppId idempotent writes), built on the
  * engine's own table format. As a bonus every micro-batch is a
  * time-travelable version: `VersionedParquet.read(root, Some(v))`
  * reproduces the table as of any retained batch.
  *
  * At 100 TB the fold must stay incremental (state ∪ batch, not
  * recompute-from-history) and the table compacts via
  * `VersionedParquet.compact`; the publish cost is one rename beyond
  * the data write regardless of table size.
  */
object VersionedSink {

  val BatchMarker = "_BATCHID"

  /** The last committed micro-batch id, None before the first commit. */
  def lastBatchId(spark: SparkSession, root: String): Option[Long] =
    VersionedParquet.snapshotMarker(spark, root, BatchMarker).map(_.trim.toLong)

  /** Fold one micro-batch into the table; returns false iff the batch
    * was already committed (idempotent replay). `fold(current, batch)`
    * produces the table's next full state from its live state and the
    * new rows — e.g. `_ unionByName _` for append,
    * [[CrmStream.mergeLatest]] for upsert. */
  private[graft] def commitBatch(spark: SparkSession, root: String,
                                 batchId: Long, batch: DataFrame,
                                 fold: (DataFrame, DataFrame) => DataFrame,
                                 keepVersions: Int = 2,
                                 minRetainMillis: Long = 0L): Boolean = {
    if (lastBatchId(spark, root).exists(_ >= batchId)) false
    else {
      val current =
        if (VersionedParquet.currentVersion(spark, root).isDefined)
          VersionedParquet.read(spark, root)
        else batch.limit(0)
      VersionedParquet.publish(fold(current, batch), root,
        keepVersions = keepVersions, minRetainMillis = minRetainMillis,
        markers = Map(BatchMarker -> batchId.toString))
      true
    }
  }

  /** Drive `source` (a streaming DataFrame) into the versioned table at
    * `root`. Caller awaits/stops the query. */
  def run(source: DataFrame, root: String, checkpoint: String,
          fold: (DataFrame, DataFrame) => DataFrame,
          keepVersions: Int = 2,
          minRetainMillis: Long = 0L,
          outputMode: String = "append"): StreamingQuery = {
    val spark = source.sparkSession
    source.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(spark, root, batchId, batch, fold,
          keepVersions, minRetainMillis)
        ()
      }
      .start()
  }

  /** Append one micro-batch as an O(batch) delta version; returns
    * false iff already committed. The general `commitBatch` folds the
    * FULL table state every batch (read → fold → rewrite — O(table)
    * per batch, the right shape only for keyed merges or small state);
    * the insert-only stream, which is most streams, lands through
    * [[VersionedParquet.append]]: only the batch's bytes are written,
    * the base is never rescanned or rewritten, and the `_BATCHID`
    * marker keeps the exactly-once replay guard identical. */
  private[graft] def commitAppend(spark: SparkSession, root: String,
                                  batchId: Long, batch: DataFrame,
                                  keepVersions: Int = 2): Boolean = {
    if (lastBatchId(spark, root).exists(_ >= batchId)) false
    else {
      val markers = Map(BatchMarker -> batchId.toString)
      if (VersionedParquet.currentVersion(spark, root).isEmpty)
        VersionedParquet.publish(batch, root, keepVersions = keepVersions,
          markers = markers)
      else
        VersionedParquet.append(spark, root, batch,
          keepVersions = keepVersions, markers = markers)
      true
    }
  }

  /** Drive an insert-only stream into the table as one APPEND version
    * per micro-batch — per-batch cost O(batch), not O(table); compact
    * collects the delta debt out of band. */
  def runAppend(source: DataFrame, root: String, checkpoint: String,
                keepVersions: Int = 2): StreamingQuery = {
    val spark = source.sparkSession
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitAppend(spark, root, batchId, batch, keepVersions)
        ()
      }
      .start()
  }

  /** Streaming ingest with EXPECTATIONS and a quarantine table (the
    * declarative-pipeline `expect_or_quarantine` pattern): each
    * micro-batch splits by the named CHECK expectations — rows
    * satisfying ALL of them (SQL semantics: a row violates only when
    * an expression is FALSE; NULL passes) land as one O(batch) append
    * version on `root`; violating rows land on `quarantineRoot`
    * wearing `_violated` (comma-joined names of the failed
    * expectations) and `_batch_id`, so bad data is never silently
    * dropped — it is a queryable, replayable table. Each side carries
    * its OWN batch marker, so a crash between the two appends replays
    * the batch with the already-committed side skipping idempotently —
    * exactly-once on both tables. Batches contributing zero rows to a
    * side publish nothing there (the skip re-derives deterministically
    * on replay). */
  def runExpectations(source: DataFrame, root: String,
                      quarantineRoot: String, checkpoint: String,
                      expectations: Seq[(String, String)],
                      keepVersions: Int = 2): StreamingQuery = {
    require(expectations.nonEmpty, "need at least one expectation")
    import org.apache.spark.sql.functions.{concat_ws, expr, lit, not, when}
    val spark = source.sparkSession
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val violates = expectations
          .map { case (_, c) => expr(c) <=> lit(false) }
        val clean = batch.filter(not(violates.reduce(_ || _)))
        val bad = batch.filter(violates.reduce(_ || _))
          .withColumn("_violated", concat_ws(",",
            expectations.map { case (n, c) =>
              when(expr(c) <=> lit(false), lit(n)) }: _*))
          .withColumn("_batch_id", lit(batchId))
        if (clean.limit(1).count() > 0)
          commitAppend(spark, root, batchId, clean, keepVersions)
        if (bad.limit(1).count() > 0)
          commitAppend(spark, quarantineRoot, batchId, bad, keepVersions)
        ()
      }
      .start()
  }
}
