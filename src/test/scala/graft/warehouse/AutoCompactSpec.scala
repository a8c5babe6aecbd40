package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Auto-compaction contract: with `spark.graft.autoCompact = true`, a
  * sustained merge-on-read ingest (20 micro-batches) self-heals — the
  * live version's file count stays bounded instead of growing one
  * delta file per batch, every read is identical to the uncompacted
  * model, and `changes` stays continuous across the automatic
  * compactions (each is an explicitly-empty feed step).
  */
class AutoCompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-ac-$tag")
      .toString + "/t"

  private def withAutoCompact[T](minFiles: Int)(body: => T): T = {
    spark.conf.set("spark.graft.autoCompact", "true")
    spark.conf.set("spark.graft.autoCompact.minDeltaFiles",
      minFiles.toString)
    try body finally {
      spark.conf.unset("spark.graft.autoCompact")
      spark.conf.unset("spark.graft.autoCompact.minDeltaFiles")
    }
  }

  private def liveDataFiles(root: String): Int =
    VersionedParquet.read(spark, root).inputFiles.length

  test("20 micro-batches: bounded live files, identical reads, continuous feed") {
    import spark.implicits._
    val root = tmp("ingest")
    VersionedParquet.publish(
      (0L until 500L).map(i => (i, i * 2)).toDF("id", "n"), root,
      keepVersions = 100)
    var model = (0L until 500L).map(i => i -> (i * 2)).toMap
    withAutoCompact(minFiles = 4) {
      val maxFiles = scala.collection.mutable.ArrayBuffer.empty[Int]
      (1 to 20).foreach { b =>
        // alternating ingest shapes: keyed upserts and blind appends,
        // the two verbs a MorStream sink drives
        if (b % 2 == 0) {
          val rows = Seq((b.toLong, -b.toLong), (10000L + b, b.toLong))
          VersionedParquet.upsert(spark, root,
            rows.toDF("id", "n"), Seq("id"), keepVersions = 100)
          model = model ++ rows
        } else {
          val rows = Seq((20000L + b, b.toLong))
          VersionedParquet.append(spark, root,
            rows.toDF("id", "n"), keepVersions = 100)
          model = model ++ rows
        }
        maxFiles += liveDataFiles(root)
        // byte-identical reads after every batch
        val got = VersionedParquet.read(spark, root)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === model, s"read diverged from model at batch $b")
      }
      // WITHOUT auto-compact 20 batches leave ≥20 delta files layered
      // on the base; the policy must keep the live file count bounded
      // by the compaction target, not the batch count
      assert(maxFiles.max < 20,
        s"auto-compact must bound live files (saw max ${maxFiles.max})")
      // at least one auto-compaction actually fired: some version is a
      // physical snapshot above v0
      val hist = VersionedParquet.versions(spark, root)
      val compactions = hist.filter(v => v > 0 &&
        VersionedParquet.snapshotMarker(spark, root, "_BASE",
          Some(v)).isEmpty)
      assert(compactions.nonEmpty,
        "sustained ingest must have triggered at least one compaction")
      // changes stays CONTINUOUS across the auto-compactions: replay
      // the full feed from v0 and land on the model
      val live = VersionedParquet.currentVersion(spark, root).get
      val feed = VersionedParquet.changes(spark, root, 0L, live)
        .select("id", "n", "_change_type", "_commit_version")
        .collect().sortBy(_.getLong(3))
      var work = VersionedParquet.read(spark, root, Some(0L))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> 1L).toMap
      feed.foreach { r =>
        val k = (r.getLong(0), r.getLong(1))
        if (Seq("update_pre", "delete").contains(r.getString(2))) {
          val left = work.getOrElse(k, 0L) - 1
          assert(left >= 0, s"feed removes absent $k")
          work = if (left == 0) work - k else work + (k -> left)
        } else work = work + (k -> (work.getOrElse(k, 0L) + 1))
      }
      assert(work.keys.map(_._1).toSet === model.keys.toSet &&
        work.forall { case ((id, n), c) => c == 1 && model(id) == n },
        "full-history feed replay must land on the final state")
    }
  }

  test("auto-compact is off by default and the debt grows as before") {
    import spark.implicits._
    val root = tmp("off")
    VersionedParquet.publish(
      (0L until 100L).map(i => (i, i)).toDF("id", "n"), root,
      keepVersions = 100)
    (1 to 6).foreach { b =>
      VersionedParquet.append(spark, root,
        Seq((1000L + b, b.toLong)).toDF("id", "n"), keepVersions = 100)
    }
    // no compaction: every version is still merge-on-read above v0
    val hist = VersionedParquet.versions(spark, root)
    assert(hist.filter(_ > 0).forall(v =>
      VersionedParquet.snapshotMarker(spark, root, "_BASE",
        Some(v)).isDefined),
      "without the flag no write may trigger a materialization")
  }

  test("optimistic commits self-heal through the same policy") {
    import spark.implicits._
    val root = tmp("occ")
    VersionedParquet.publish(
      (0L until 200L).map(i => (i, i)).toDF("id", "n"), root,
      keepVersions = 100)
    withAutoCompact(minFiles = 3) {
      (1 to 8).foreach { b =>
        Optimistic.append(spark, root,
          Seq((5000L + b, b.toLong)).toDF("id", "n"), keepVersions = 100)
      }
      val hist = VersionedParquet.versions(spark, root)
      val compactions = hist.filter(v => v > 0 &&
        VersionedParquet.snapshotMarker(spark, root, "_BASE",
          Some(v)).isEmpty)
      assert(compactions.nonEmpty,
        "optimistic ingest must trigger the auto-compact hook")
      assert(VersionedParquet.read(spark, root).count() === 208L)
    }
  }
}
