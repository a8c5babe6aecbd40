package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.IcebergLite

/** Exactly-once incremental ingest FROM a foreign Iceberg table — the
  * Iceberg twin of [[DeltaSync.sync]], completing the interop matrix
  * (q184/q186/q198 = Delta read/import-sync/export-sync, q212 =
  * Iceberg read/export, this = Iceberg import sync): another team
  * lands data in the open Iceberg format, this keeps a graft
  * versioned mirror advancing snapshot-by-snapshot.
  *
  * Per foreign snapshot, the cheap path applies: a snapshot whose
  * live file set only GREW (Iceberg's append — every prior file
  * carried, new files added) imports as an O(new files) append of
  * exactly those files' rows; a snapshot that removed files
  * (overwrite, compaction, row-delete materialization) republishes
  * the foreign state AT THAT SNAPSHOT — file-level removals are not
  * row-reconstructible without the removed bytes, the same honest
  * fallback as the Delta side. Each foreign snapshot lands as exactly
  * one mirror version, so the mirror's change feed and time travel
  * stay snapshot-aligned with the source.
  *
  * Exactly-once across crashes, with no external state: every mirror
  * commit carries an `_ICEBERG_SYNC` marker naming the foreign
  * snapshot id it imported — markers land inside the snapshot BEFORE
  * the pointer swap, atomic with the commit. Resume reads the newest
  * marker; a foreign history whose synced-to snapshot has EXPIRED
  * (Iceberg snapshot expiration is routine) re-bootstraps from the
  * live snapshot in one loud republish, exactly the Delta gap rule.
  *
  * Scale shape: steady state is one metadata walk (bounded by the
  * snapshot count in metadata.json) + one O(new files) append per
  * foreign snapshot; nothing rescans the mirror.
  */
object IcebergSync {

  private[warehouse] val SYNC_MARKER = "_ICEBERG_SYNC"

  /** The foreign snapshot id the newest mirror commit imported. */
  def lastSynced(spark: SparkSession, mirrorRoot: String): Option[Long] =
    VersionedParquet.versions(spark, mirrorRoot).sorted.reverse.iterator
      .map(v => VersionedParquet.readPointer(spark,
        new Path(new Path(mirrorRoot, VersionedParquet.versionName(v)),
          SYNC_MARKER)))
      .collectFirst { case Some(s) => s.toLong }

  /** One sync result: snapshots applied as appends, as full
    * republishes, and the foreign snapshot the mirror now reflects. */
  final case class Sync(appended: Int, republished: Int, syncedTo: Long)

  /** Advance the mirror to the foreign table's live snapshot.
    * Idempotent: a second call with no new snapshots is a no-op. */
  def sync(spark: SparkSession, icebergLocation: String,
           mirrorRoot: String, keepVersions: Int = 10): Sync = {
    val ids = IcebergLite.snapshotIds(spark, icebergLocation)
    require(ids.nonEmpty, s"no snapshots at $icebergLocation")
    val latest = ids.last
    val from = lastSynced(spark, mirrorRoot)
    if (from.contains(latest)) return Sync(0, 0, latest)
    var appended = 0
    var republished = 0
    def republishAt(id: Long): Unit = {
      VersionedParquet.publish(
        IcebergLite.read(spark, icebergLocation, Some(id)), mirrorRoot,
        keepVersions = keepVersions,
        markers = Map(SYNC_MARKER -> id.toString))
      republished += 1
    }
    // incremental only when the synced-to snapshot is still in the
    // foreign history (not expired) — otherwise the diff chain has no
    // anchor and the honest move is one live republish
    from match {
      case Some(f) if ids.contains(f) =>
        val snap0 = IcebergLite.snapshot(spark, icebergLocation, Some(f))
        var prevFiles = snap0.files.toSet
        var prevDeletes = snap0.posDeleteFiles.toSet ++
          snap0.eqDeletes.map(_.path)
        ids.dropWhile(_ != f).drop(1).foreach { id =>
          val snap = IcebergLite
            .snapshot(spark, icebergLocation, Some(id))
          val files = snap.files.toSet
          val deletes = snap.posDeleteFiles.toSet ++
            snap.eqDeletes.map(_.path)
          val added = files -- prevFiles
          val removed = prevFiles -- files
          // a changed position-delete set falls off the append fast
          // path too: the appended files' rows would land while the
          // snapshot's deletes silently went unapplied — republish
          // through read(), which applies them
          if (removed.nonEmpty || added.isEmpty ||
              deletes != prevDeletes) republishAt(id)
          else {
            VersionedParquet.append(spark, mirrorRoot,
              spark.read.parquet(added.toSeq.sorted: _*),
              keepVersions = keepVersions,
              markers = Map(SYNC_MARKER -> id.toString))
            appended += 1
          }
          prevFiles = files
          prevDeletes = deletes
        }
      case _ => republishAt(latest) // bootstrap, or expired anchor
    }
    Sync(appended, republished,
      lastSynced(spark, mirrorRoot).getOrElse(-1L))
  }
}
