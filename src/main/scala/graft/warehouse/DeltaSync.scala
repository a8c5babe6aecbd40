package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.DeltaLite

/** Exactly-once incremental ingest FROM a foreign Delta table — the
  * continuous half of the import story (q184's DeltaLite.read is the
  * one-shot half): another team lands data in open-format Delta, this
  * keeps a graft versioned mirror advancing commit-by-commit.
  *
  * Per foreign commit, the cheap path applies: an add-only commit
  * (Delta's plain INSERT) imports as an O(changes) append of exactly
  * those files' rows; any commit carrying removes (overwrite, delete,
  * compaction) falls back to republishing the foreign snapshot AT
  * THAT VERSION — a consumer cannot reconstruct row-level deltas from
  * file-level removes without the removed files' contents, so the
  * fallback is the honest contract (and each foreign version still
  * lands as exactly one mirror version, so the mirror's own change
  * feed and time travel stay commit-aligned with the source).
  *
  * Exactly-once across crashes, with no external state: every mirror
  * commit carries a `_DELTA_SYNC` marker naming the foreign version
  * it imported — markers land inside the snapshot BEFORE the pointer
  * swap, so the marker is atomic with the commit. Resuming reads the
  * newest marker and continues at the next foreign version: a crash
  * after a commit resumes past it; a crash mid-stage left nothing
  * visible and re-applies. A foreign log whose early commits were
  * checkpoint-deleted (or any gap after the last sync) re-bootstraps
  * from the live foreign snapshot — correct, just not incremental,
  * and loudly recorded by the returned counters.
  *
  * Scale shape: the steady state is one marker probe + one O(new
  * files) append per foreign commit; nothing rescans the mirror.
  */
object DeltaSync {

  private[warehouse] val SYNC_MARKER = "_DELTA_SYNC"

  /** The foreign version the newest mirror commit imported, if any. */
  def lastSynced(spark: SparkSession, mirrorRoot: String): Option[Long] =
    VersionedParquet.versions(spark, mirrorRoot).sorted.reverse.iterator
      .map(v => VersionedParquet.readPointer(spark,
        new Path(new Path(mirrorRoot, VersionedParquet.versionName(v)),
          SYNC_MARKER)))
      .collectFirst { case Some(s) => s.toLong }

  /** One sync result: commits applied as appends, as full snapshot
    * republishes, and the foreign version the mirror now reflects. */
  final case class Sync(appended: Int, republished: Int, syncedTo: Long)

  /** Advance the mirror to the foreign table's live state. Idempotent:
    * a second call with no new foreign commits is a no-op. */
  def sync(spark: SparkSession, deltaTable: String, mirrorRoot: String,
           keepVersions: Int = 10): Sync = {
    val commits = DeltaLite.commitVersions(spark, deltaTable)
    val latest = DeltaLite.snapshot(spark, deltaTable).version
    val from = lastSynced(spark, mirrorRoot)
    if (from.contains(latest)) return Sync(0, 0, latest)
    var appended = 0
    var republished = 0
    def republishAt(v: Long): Unit = {
      VersionedParquet.publish(
        DeltaLite.read(spark, deltaTable, Some(v)), mirrorRoot,
        keepVersions = keepVersions,
        markers = Map(SYNC_MARKER -> v.toString))
      republished += 1
    }
    val todo = commits.filter(v => from.forall(v > _))
    val contiguous = from match {
      case None => false // no mirror yet — bootstrap
      case Some(f) => todo.headOption.contains(f + 1) &&
        todo.zip(todo.drop(1)).forall { case (a, b) => b == a + 1 }
    }
    if (!contiguous) {
      // bootstrap, or a gap (checkpoint-truncated log / missed
      // versions): the incremental contract is unrecoverable, mirror
      // the live snapshot in one honest republish
      republishAt(latest)
    } else todo.foreach { v =>
      val (adds, removes) = DeltaLite.commitActions(spark, deltaTable, v)
      if (removes.nonEmpty || adds.isEmpty) republishAt(v)
      else {
        val rows = spark.read.option("basePath", deltaTable)
          .parquet(adds.map(f => new Path(deltaTable, f).toString): _*)
        VersionedParquet.append(spark, mirrorRoot, rows,
          keepVersions = keepVersions,
          markers = Map(SYNC_MARKER -> v.toString))
        appended += 1
      }
    }
    Sync(appended, republished,
      lastSynced(spark, mirrorRoot).getOrElse(-1L))
  }
}
