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
      val (adds, removes, hasDv) =
        DeltaLite.commitActions(spark, deltaTable, v)
      // a deletion-vector commit re-adds existing files with rows
      // masked — appending those files' raw rows would resurrect the
      // deleted ones, so it republishes through read() (which applies
      // the DVs), same rule as removes
      if (removes.nonEmpty || adds.isEmpty || hasDv) republishAt(v)
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

  // ── export half: mirror graft commits INTO an open Delta log ───────
  //
  // The reverse direction — another team reads Delta, this keeps a
  // Delta-format mirror advancing commit-by-commit from a graft
  // table's own change feed. Insert-only graft commits export as plain
  // Delta APPEND commits of exactly the insert batch (O(changes));
  // commits carrying deletes/updates (or CDF-absent physical
  // publishes) export as a full-snapshot OVERWRITE at that version —
  // the honest Delta equivalent, each graft version landing as exactly
  // ONE Delta commit so both logs stay commit-aligned. Exactly-once
  // with no external state: every exported commit carries a
  // `commitInfo.graftVersion` action (atomic with the Delta commit
  // file install; protocol readers ignore commitInfo), and resume
  // reads the newest one. A vacuumed-past gap in the graft history
  // re-bootstraps with one overwrite of the live view, loudly counted.

  /** The graft version the newest Delta commit exported, if any. */
  def lastExported(spark: SparkSession, deltaTable: String): Option[Long] =
    DeltaLite.commitVersions(spark, deltaTable).sorted.reverse.iterator
      .flatMap(v => DeltaLite.commitGraftVersion(spark, deltaTable, v))
      .take(1).toSeq.headOption

  /** One export-sync result. */
  final case class ExportSync(appended: Int, overwritten: Int,
                              syncedTo: Long)

  /** Advance the Delta mirror to the graft table's live state.
    * Idempotent: a second call with no new graft commits is a no-op. */
  def exportSync(spark: SparkSession, root: String,
                 deltaTable: String): ExportSync = {
    // same rule as the manifest export: the Delta mirror serves raw
    // bytes to foreign engines, which would bypass every policy
    require(!VersionedParquet.hasPolicies(spark, root),
      s"cannot export-sync $root: row/column policies would be " +
        "bypassed by the foreign Delta readers")
    val live = VersionedParquet.currentVersion(spark, root).getOrElse(
      throw new java.io.IOException(s"no published version under $root"))
    val from = lastExported(spark, deltaTable)
    if (from.contains(live)) return ExportSync(0, 0, live)
    var appended = 0
    var overwritten = 0
    def info(v: Long) = Seq(
      s"""{"commitInfo":{"operation":"GRAFT-EXPORT-SYNC","graftVersion":$v}}""")
    def overwriteAt(v: Long): Unit = {
      DeltaLite.exportCommit(spark,
        VersionedParquet.read(spark, root, Some(v)), deltaTable,
        removePrior = true, extraActions = info(v))
      overwritten += 1
    }
    val vs = VersionedParquet.versions(spark, root).toSet
    val start = from.getOrElse(-1L)
    val contiguous = ((start + 1) to live).forall(vs.contains)
    if (!contiguous) {
      // the graft history this export missed was vacuumed — the
      // incremental contract is unrecoverable; one honest overwrite
      overwriteAt(live)
    } else ((start + 1) to live).foreach { v =>
      val insertBatch: Option[org.apache.spark.sql.DataFrame] =
        if (v == 0) None
        else try {
          val feed = VersionedParquet.changes(spark, root, v - 1, v)
          val types = feed.select("_change_type").distinct()
            .collect().map(_.getString(0)).toSet
          if (types.subsetOf(Set("insert")))
            Some(feed.filter(
              org.apache.spark.sql.functions.col("_change_type") ===
                "insert").drop("_change_type", "_commit_version"))
          else None
        } catch { case _: java.io.IOException => None }
      insertBatch match {
        case Some(rows) =>
          DeltaLite.exportCommit(spark, rows, deltaTable,
            removePrior = false, extraActions = info(v))
          appended += 1
        case None => overwriteAt(v)
      }
    }
    ExportSync(appended, overwritten,
      lastExported(spark, deltaTable).getOrElse(-1L))
  }
}
