package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-level DELETE via deletion vectors (q136's machinery): a delete
  * must move ZERO data bytes — the new version holds only a base
  * pointer and a (file, pos) vector — while reads of it mask the rows
  * exactly, time travel keeps every older version intact, vacuum
  * refuses to hollow out a referenced base, and compaction
  * materializes the vector into a fresh physical snapshot.
  */
class DeletionVectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-dv-$tag").toString

  private def dataFiles(dir: String): Map[String, Long] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(root.getAbsolutePath) ->
        f.length()).toMap
  }

  test("delete rewrites no data file; reads mask exactly; time travel intact") {
    import spark.implicits._
    val root = tmp("basic")
    val rows = (0L until 1000L).map(i => (i, i % 10, s"r$i"))
      .toDF("id", "grp", "s")
    VersionedParquet.publish(rows.repartition(4), root)
    val v0Files = dataFiles(s"$root/v00000000")
    assert(v0Files.nonEmpty)

    VersionedParquet.delete(spark, root, col("grp") === 3)
    // base files untouched, byte for byte; v1 holds no parquet data
    assert(dataFiles(s"$root/v00000000") === v0Files,
      "delete must not rewrite any base data file")
    assert(dataFiles(s"$root/v00000001").keySet
      .forall(p => p.contains("/_dv/") || p.contains("/_cdf/")),
      "a DV version must hold only the vector + change feed")

    val live = VersionedParquet.read(spark, root)
    assert(live.count() === 900)
    assert(live.filter(col("grp") === 3).count() === 0)
    // untouched rows survive with full payload
    assert(live.filter(col("id") === 4).select("s").head().getString(0) === "r4")
    // time travel: v0 still full
    assert(VersionedParquet.read(spark, root, Some(0L)).count() === 1000)
  }

  test("deletes accumulate; each DV version masks exactly its own vector") {
    import spark.implicits._
    val root = tmp("cumulative")
    VersionedParquet.publish(
      (0L until 500L).map(i => (i, i % 7)).toDF("id", "m"),
      root, keepVersions = 10)
    VersionedParquet.delete(spark, root, col("m") === 0, keepVersions = 10)
    // overlapping second delete (m=0 rows match id%2=0 partly): must
    // stay idempotent through the distinct
    VersionedParquet.delete(spark, root, col("id") % 2 === 0,
      keepVersions = 10)
    val expect1 = (0L until 500L).count(_ % 7 != 0)
    val expect2 = (0L until 500L).count(i => i % 7 != 0 && i % 2 != 0)
    assert(VersionedParquet.read(spark, root, Some(1L)).count() === expect1)
    assert(VersionedParquet.read(spark, root, Some(2L)).count() === expect2)
    assert(VersionedParquet.read(spark, root).count() === expect2)
    assert(VersionedParquet.versions(spark, root) === Seq(0L, 1L, 2L))
  }

  test("vacuum never hollows out a referenced base; compact materializes and frees it") {
    import spark.implicits._
    val root = tmp("vacuum")
    VersionedParquet.publish(
      (0L until 300L).map(i => (i, i % 3)).toDF("id", "m"), root)
    VersionedParquet.delete(spark, root, col("m") === 1)
    VersionedParquet.delete(spark, root, col("m") === 2)
    // live = v2 (DV on v0). keepVersions=1 would retire v0 and v1 by
    // count — but v0 is v2's base and must survive.
    val gone = VersionedParquet.vacuum(spark, root, keepVersions = 1)
    assert(gone === Seq(1L), s"only the unreferenced DV v1 may go, got $gone")
    assert(VersionedParquet.read(spark, root).count() === 100)
    // compact: materializes the masked rows into physical v3
    VersionedParquet.compact(spark, root, targetBytes = 1L << 20)
    assert(VersionedParquet.read(spark, root).count() === 100)
    assert(dataFiles(s"$root/v00000003").keys.forall(!_.contains("/_dv/")))
    // v3 no longer references v0: the next vacuum may retire it
    val gone2 = VersionedParquet.vacuum(spark, root, keepVersions = 1)
    assert(gone2.contains(0L),
      s"base must be reclaimable once dereferenced, got $gone2")
    assert(VersionedParquet.read(spark, root).count() === 100)
  }

  test("partitioned base: row identity holds across partition directories") {
    import spark.implicits._
    val root = tmp("partitioned")
    val rows = (0L until 400L).map(i => (i, (i % 4).toString)).toDF("id", "p")
    VersionedParquet.publish(rows.repartition(col("p")), root,
      partitionCols = Seq("p"))
    VersionedParquet.delete(spark, root, col("id") < 100L)
    val live = VersionedParquet.read(spark, root)
    assert(live.count() === 300)
    assert(live.filter(col("id") < 100).count() === 0)
    // every partition still readable, correct residue per partition
    // partition values come back type-inferred (int) — compare as text
    assert(live.groupBy("p").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap ===
      Map("0" -> 75L, "1" -> 75L, "2" -> 75L, "3" -> 75L))
  }

  test("empty-match delete is a readable version, not a corrupt one") {
    import spark.implicits._
    val root = tmp("empty")
    VersionedParquet.publish((0L until 50L).toDF("id"), root)
    VersionedParquet.delete(spark, root, col("id") > 1000L)
    assert(VersionedParquet.read(spark, root).count() === 50)
    VersionedParquet.delete(spark, root, col("id") === 7L)
    assert(VersionedParquet.read(spark, root).count() === 49)
  }
}
