package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** rewriteManifests contract: one metadata-only commit collapses the
  * carried manifest chain to O(live-file-kinds) manifests while
  * preserving ROW AGE — every entry re-lands status=0 with an
  * explicit sequence_number, so equality-delete ordering (the one
  * semantics that depends on sequences) survives compaction exactly.
  * Bounds pruning and time travel survive too; refusals name their
  * gap. */
class ManifestRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-mrw-$tag")
      .toString + "/t"

  private def frame(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private def state(loc: String): Map[Long, Long] =
    IcebergLite.read(spark, loc).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("compaction collapses the manifest chain, read identical, " +
    "time travel intact, snapshotsTable records a replace") {
    val loc = tmp("basic")
    IcebergLite.export(spark, frame((0L until 20L).map(i => (i, i))), loc)
    (1 to 3).foreach(k => IcebergLite.appendManifest(spark,
      frame((k * 100L until k * 100L + 5L).map(i => (i, i))), loc))
    val before = state(loc)
    val preSnap = IcebergLite.snapshot(spark, loc).snapshotId
    assert(IcebergLite.manifestCount(spark, loc) >= 4)
    val s = IcebergLite.rewriteManifests(spark, loc)
    assert(IcebergLite.manifestCount(spark, loc) === 1)
    assert(state(loc) === before)
    // pinned pre-compaction snapshot still serves through the OLD
    // manifests (they stay on disk until expiry)
    assert(IcebergLite.read(spark, loc, Some(preSnap)).count() ===
      before.size.toLong)
    val ops = IcebergLite.snapshotsTable(spark, loc)
      .orderBy("snapshot_id").collect().map(_.getString(3)).toSeq
    assert(ops.last === "replace")
    assert(s === preSnap + 1)
    // appends keep working on the compacted table
    IcebergLite.appendManifest(spark, frame(Seq((999L, 9L))), loc)
    assert(state(loc) === before + (999L -> 9L))
  }

  test("row age survives: pre-compaction equality-delete/re-insert " +
    "resolves identically after the rewrite, and a POST-compaction " +
    "equality delete masks every older row including re-inserts") {
    import spark.implicits._
    val loc = tmp("age")
    IcebergLite.export(spark,
      frame((0L until 10L).map(i => (i, i))), loc)         // seq 1
    IcebergLite.exportEqualityDeletes(spark,
      Seq(3L, 4L).toDF("id"), loc)                          // seq 2
    IcebergLite.appendManifest(spark,
      frame(Seq((3L, 33L))), loc)                           // seq 3
    val before = state(loc)
    assert(before(3L) === 33L && !before.contains(4L))
    IcebergLite.rewriteManifests(spark, loc)
    // the upsert still resolves: the eq-delete (seq 2) must keep
    // masking only the seq-1 copy of id 3, not the seq-3 re-insert
    assert(state(loc) === before,
      "compaction changed delete/data ordering")
    // a NEW eq-delete is newer than every compacted sequence
    IcebergLite.exportEqualityDeletes(spark, Seq(3L).toDF("id"), loc)
    assert(!state(loc).contains(3L))
  }

  test("bounds pruning survives compaction (data_file stats carried)") {
    val loc = tmp("bounds")
    (0 to 3).foreach { k =>
      val rows = (k * 100L until k * 100L + 50L).map(i => (i, i))
      if (k == 0) IcebergLite.export(spark,
        frame(rows).coalesce(1), loc)
      else IcebergLite.appendManifest(spark,
        frame(rows).coalesce(1), loc)
    }
    val (rows0, kept0, total0) =
      IcebergLite.readPruned(spark, loc, "id", 100L, 149L)
    assert(kept0 < total0 && rows0.count() === 50L)
    IcebergLite.rewriteManifests(spark, loc)
    val (rows1, kept1, total1) =
      IcebergLite.readPruned(spark, loc, "id", 100L, 149L)
    assert(total1 === total0 && kept1 === kept0,
      s"pruning degraded: $kept0/$total0 -> $kept1/$total1")
    assert(rows1.count() === 50L)
  }

  test("refusals: v3 tables and empty tables refuse by name") {
    import spark.implicits._
    val loc = tmp("refuse")
    IcebergLite.export(spark, frame(Seq((0L, 0L), (1L, 1L))), loc)
    IcebergLite.exportDeletionVectors(spark, loc,
      Map(IcebergLite.snapshot(spark, loc).files.head -> Array(0L)))
    val e = intercept[java.io.IOException] {
      IcebergLite.rewriteManifests(spark, loc)
    }
    assert(e.getMessage.contains("format-version 3"))
  }
}
