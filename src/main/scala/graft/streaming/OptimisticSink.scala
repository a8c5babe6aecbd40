package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.warehouse.{Optimistic, VersionedParquet}

/** Exactly-once MULTI-STREAM ingestion into one versioned table —
  * [[VersionedSink]]'s idempotence contract generalized from "one
  * writer per table" to "one marker per stream" (the
  * txnAppId/txnVersion pattern a commit-log format gives
  * `foreachBatch`):
  *
  *  - every committed micro-batch is one [[Optimistic.append]] whose
  *    snapshot carries `_BATCHID_<streamId> = batchId`, installed
  *    atomically with the version;
  *  - concurrent streams never block each other: appends rebase over
  *    appends (commit-time conflict detection), so N independent
  *    pipelines drain into the same table serialized only by the
  *    brief commit critical section;
  *  - every OTHER stream's batch marker carries forward UNDER the
  *    commit lock, so "stream s committed batch b" stays readable
  *    from the live snapshot no matter who committed last — that is
  *    exactly what makes the replay check sound per stream;
  *  - a crash-replayed batch (same streamId, same batchId) reads its
  *    own marker ≥ batchId from the live snapshot and becomes a
  *    no-op — exactly-once per stream, at-least-once nowhere.
  *
  * Zombie-instance fencing (two live instances of the SAME stream id)
  * is out of scope, as in [[VersionedSink]]: Structured Streaming
  * already guarantees one active query per checkpoint location.
  */
object OptimisticSink {

  def batchMarker(streamId: String): String = s"_BATCHID_$streamId"

  /** The last batch `streamId` committed, None before its first. */
  def lastBatchId(spark: SparkSession, root: String,
                  streamId: String): Option[Long] =
    VersionedParquet.snapshotMarker(spark, root, batchMarker(streamId))
      .map(_.trim.toLong)

  /** Append one micro-batch exactly-once for `streamId`; returns false
    * iff the batch was already committed (idempotent replay). */
  def appendBatch(spark: SparkSession, root: String, streamId: String,
                  batchId: Long, batch: DataFrame,
                  keepVersions: Int = 2): Boolean =
    if (lastBatchId(spark, root, streamId).exists(_ >= batchId)) false
    else {
      Optimistic.append(spark, root, batch, keepVersions,
        markers = Map(batchMarker(streamId) -> batchId.toString),
        carryMarkerPrefixes = Seq("_BATCHID_"))
      true
    }
}
