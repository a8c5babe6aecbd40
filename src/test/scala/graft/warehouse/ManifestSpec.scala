package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest export contract: an engine with zero knowledge of the
  * format, reading NOTHING but the manifest's plain file list, sees
  * exactly the live view — zero-copy when raw files already carry the
  * view, materialize-first when they can't (MoR overlay, pending
  * schema map, virtual columns), never silently wrong.
  */
class ManifestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-manifest-$tag").toString

  private def seed(root: String): Unit = {
    import spark.implicits._
    VersionedParquet.publish(
      (0L until 200L).map(i => (i, s"g${i % 4}", i * 2L))
        .toDF("id", "g", "v"), root, keepVersions = 20)
  }

  private def externalRows(manifest: String): Seq[(Long, String, Long)] = {
    val files = VersionedParquet.readManifest(spark, manifest)
    assert(files.nonEmpty)
    spark.read.parquet(files: _*)
      .select("id", "g", "v").orderBy("id")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
  }

  private def liveRows(root: String): Seq[(Long, String, Long)] =
    VersionedParquet.read(spark, root)
      .select("id", "g", "v").orderBy("id")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("physical snapshot exports zero-copy: no version advance, exact rows") {
    val root = tmp("zc"); seed(root)
    val before = VersionedParquet.currentVersion(spark, root).get
    val m = VersionedParquet.generateManifest(spark, root)
    assert(VersionedParquet.currentVersion(spark, root).get == before)
    assert(externalRows(m) == liveRows(root))
    // every named file really lives inside the exported snapshot
    val files = VersionedParquet.readManifest(spark, m)
    assert(files.forall(f => f.contains("/v0000") &&
      new java.io.File(f).isFile))
  }

  test("merge-on-read state materializes first; external read == live view") {
    import spark.implicits._
    val root = tmp("mor"); seed(root)
    VersionedParquet.upsert(spark, root,
      Seq((3L, "g3", 999L), (500L, "gX", 1L)).toDF("id", "g", "v"),
      Seq("id"), keepVersions = 20)
    VersionedParquet.delete(spark, root, col("id") % 7 === 0,
      keepVersions = 20)
    val before = VersionedParquet.currentVersion(spark, root).get
    val expected = liveRows(root)
    val m = VersionedParquet.generateManifest(spark, root, keepVersions = 20)
    assert(VersionedParquet.currentVersion(spark, root).get > before,
      "a MoR live view must materialize before export")
    assert(externalRows(m) == expected)
    assert(liveRows(root) == expected, "materialization is a logical no-op")
  }

  test("pending metadata-only rename materializes; external read speaks the logical schema") {
    val root = tmp("map"); seed(root)
    VersionedParquet.renameColumn(spark, root, "v", "val")
    val m = VersionedParquet.generateManifest(spark, root, keepVersions = 20)
    val files = VersionedParquet.readManifest(spark, m)
    val ext = spark.read.parquet(files: _*)
    assert(ext.columns.toSeq == Seq("id", "g", "val"),
      "external files must carry the post-rename physical schema")
    assert(ext.agg(sum("val")).collect().head.getLong(0) ==
      (0L until 200L).map(_ * 2L).sum)
  }

  test("regeneration after a commit: new manifest serves new state, old manifest still resolves") {
    import spark.implicits._
    val root = tmp("regen"); seed(root)
    val m1 = VersionedParquet.generateManifest(spark, root, keepVersions = 20)
    val rows1 = externalRows(m1)
    VersionedParquet.append(spark, root,
      Seq((900L, "g0", 5L)).toDF("id", "g", "v"), keepVersions = 20)
    val m2 = VersionedParquet.generateManifest(spark, root, keepVersions = 20)
    assert(m1 != m2)
    // the new manifest sees the appended row…
    assert(externalRows(m2).exists(_._1 == 900L))
    // …and the old one still serves its own snapshot (retention window)
    assert(externalRows(m1) == rows1)
  }
}
