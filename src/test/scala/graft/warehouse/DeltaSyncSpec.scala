package graft.warehouse

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DeltaLite

/** DeltaSync contract: bootstrap then commit-by-commit mirroring,
  * add-only commits as appends, remove-carrying commits as honest
  * republishes, idempotent re-sync, and self-healing re-bootstrap
  * when the foreign log has been checkpoint-truncated past the last
  * synced version.
  */
class DeltaSyncSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-dsync-$tag").toString

  private def df(lo: Long, hi: Long) = {
    import spark.implicits._
    (lo until hi).map(i => (i, i * 2L)).toDF("id", "v")
  }

  private def mirrorIds(mirror: String): Seq[Long] =
    VersionedParquet.read(spark, mirror).select("id").orderBy("id")
      .collect().toSeq.map(_.getLong(0))

  test("bootstrap, incremental appends, overwrite republish — mirror tracks exactly") {
    val delta = tmp("flow-d"); val mirror = tmp("flow-m")
    DeltaLite.export(spark, df(0, 30), delta)
    val s1 = DeltaSync.sync(spark, delta, mirror)
    assert(s1 == DeltaSync.Sync(0, 1, 0L))
    assert(mirrorIds(mirror) == (0L until 30L))
    DeltaLite.exportAppend(spark, df(30, 40), delta)
    DeltaLite.exportAppend(spark, df(40, 45), delta)
    val s2 = DeltaSync.sync(spark, delta, mirror)
    assert(s2 == DeltaSync.Sync(2, 0, 2L), "two add-only commits append")
    assert(mirrorIds(mirror) == (0L until 45L))
    // overwrite (removes) → republish path
    DeltaLite.export(spark, df(100, 110), delta)
    val s3 = DeltaSync.sync(spark, delta, mirror)
    assert(s3 == DeltaSync.Sync(0, 1, 3L))
    assert(mirrorIds(mirror) == (100L until 110L))
    // each foreign version is exactly one mirror version
    assert(VersionedParquet.versions(spark, mirror).length == 4)
    // idempotent: nothing new → no-op
    assert(DeltaSync.sync(spark, delta, mirror) ==
      DeltaSync.Sync(0, 0, 3L))
    assert(VersionedParquet.versions(spark, mirror).length == 4)
  }

  test("checkpoint-truncated foreign log: gap re-bootstraps from the live snapshot") {
    val delta = tmp("gap-d"); val mirror = tmp("gap-m")
    DeltaLite.export(spark, df(0, 10), delta)
    DeltaSync.sync(spark, delta, mirror)
    // foreign side: two more commits, checkpoint, retention deletes
    // the JSONs the mirror never saw
    DeltaLite.exportAppend(spark, df(10, 20), delta)
    DeltaLite.exportAppend(spark, df(20, 30), delta)
    DeltaLite.checkpoint(spark, delta)
    (0L to 2L).foreach { v =>
      Files.delete(Paths.get(delta, "_delta_log", f"$v%020d.json")) }
    DeltaLite.exportAppend(spark, df(30, 35), delta)
    val s = DeltaSync.sync(spark, delta, mirror)
    assert(s.republished == 1 && s.appended == 0 && s.syncedTo == 3L,
      "a gap must re-bootstrap, not guess")
    assert(mirrorIds(mirror) == (0L until 35L))
    // and incremental resumes afterwards
    DeltaLite.exportAppend(spark, df(35, 40), delta)
    assert(DeltaSync.sync(spark, delta, mirror) ==
      DeltaSync.Sync(1, 0, 4L))
    assert(mirrorIds(mirror) == (0L until 40L))
  }

  test("resume semantics: the sync marker is atomic with each mirror commit") {
    val delta = tmp("resume-d"); val mirror = tmp("resume-m")
    DeltaLite.export(spark, df(0, 10), delta)
    DeltaSync.sync(spark, delta, mirror)
    assert(DeltaSync.lastSynced(spark, mirror).contains(0L))
    DeltaLite.exportAppend(spark, df(10, 15), delta)
    DeltaSync.sync(spark, delta, mirror)
    assert(DeltaSync.lastSynced(spark, mirror).contains(1L))
    // time travel on the mirror still carries the marker history:
    // version 0 imported foreign 0, version 1 imported foreign 1
    val v0Count = VersionedParquet.read(spark, mirror, Some(0L)).count()
    assert(v0Count == 10L)
  }

  test("export sync: graft commits land as commit-aligned Delta " +
      "versions; insert-only as appends, deletes as overwrites; " +
      "idempotent") {
    import spark.implicits._
    val root = tmp("exp-g"); val delta = tmp("exp-d")
    VersionedParquet.publish(df(0, 30), root, keepVersions = 20)
    val s1 = DeltaSync.exportSync(spark, root, delta)
    assert(s1 == DeltaSync.ExportSync(0, 1, 0L))
    VersionedParquet.append(spark, root, df(30, 40), keepVersions = 20)
    VersionedParquet.delete(spark, root, col("id") % 7 === 0,
      keepVersions = 20)
    val s2 = DeltaSync.exportSync(spark, root, delta)
    assert(s2 == DeltaSync.ExportSync(1, 1, 2L))
    assert(DeltaSync.exportSync(spark, root, delta) ==
      DeltaSync.ExportSync(0, 0, 2L), "idempotent re-sync")
    // commit alignment: Delta version v == graft version v's state
    assert(DeltaLite.read(spark, delta, Some(1L)).count() === 40L)
    assert(DeltaLite.read(spark, delta).select("id").as[Long]
      .collect().sorted.toSeq ===
      (0L until 40L).filter(_ % 7 != 0))
  }

  test("export sync round trip: importing the exported log " +
      "reproduces the source table") {
    import spark.implicits._
    val root = tmp("rt-g"); val delta = tmp("rt-d")
    val back = tmp("rt-m")
    VersionedParquet.publish(df(0, 25), root, keepVersions = 20)
    VersionedParquet.append(spark, root, df(25, 35), keepVersions = 20)
    DeltaSync.exportSync(spark, root, delta)
    DeltaSync.sync(spark, delta, back)
    assert(mirrorIds(back) === (0L until 35L))
  }

  test("export sync: vacuumed-past graft history re-bootstraps with " +
      "one honest overwrite") {
    import spark.implicits._
    val root = tmp("gap-g"); val delta = tmp("gap-d")
    VersionedParquet.publish(df(0, 10), root, keepVersions = 20)
    DeltaSync.exportSync(spark, root, delta)
    // several commits, then vacuum the intermediates away
    VersionedParquet.append(spark, root, df(10, 20), keepVersions = 20)
    VersionedParquet.append(spark, root, df(20, 30), keepVersions = 20)
    VersionedParquet.append(spark, root, df(30, 35), keepVersions = 20)
    VersionedParquet.vacuum(spark, root, keepVersions = 1)
    val s = DeltaSync.exportSync(spark, root, delta)
    assert(s.appended == 0 && s.overwritten == 1 && s.syncedTo == 3L,
      s"gap must re-bootstrap, got $s")
    assert(DeltaLite.read(spark, delta).count() === 35L)
  }
}
