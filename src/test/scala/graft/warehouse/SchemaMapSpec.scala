package graft.warehouse

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only DROP / RENAME COLUMN: reads go logical instantly with
  * zero bytes rewritten, DML is fenced until OPTIMIZE materializes the
  * map (writers speak the logical schema; the physical tiers still
  * hold the old one), materialization clears the map so a later
  * re-introduction of the name is never silently eaten, and virtual
  * extension columns drop/rename by editing `_SCHEMA_EXT` alone.
  */
class SchemaMapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-schemamap-$tag").resolve("t")
      .toString

  test("physical DROP: instant logical read, zero bytes moved, DML " +
      "fenced, OPTIMIZE materializes and unfences") {
    val root = freshRoot("drop")
    VersionedParquet.publish(
      Seq((1L, 10L, "x"), (2L, 20L, "y")).toDF("k", "cents", "junk"),
      root, keepVersions = 10)
    val filesBefore = VersionedParquet.read(spark, root).inputFiles.toSet

    VersionedParquet.dropColumn(spark, root, "junk")
    val live = VersionedParquet.read(spark, root)
    assert(live.columns.toSeq === Seq("k", "cents"))
    assert(live.as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L)))
    // the drop rewrote nothing: the scan reads the same files
    assert(live.inputFiles.toSet === filesBefore)
    // pinned reads are logical too (align-to-live contract)
    assert(VersionedParquet.read(spark, root, Some(0L)).columns.toSeq ===
      Seq("k", "cents"))

    // every DML verb is fenced while the map is pending
    val ex = intercept[java.io.IOException] {
      VersionedParquet.append(spark, root,
        Seq((3L, 30L)).toDF("k", "cents"), keepVersions = 10)
    }
    assert(ex.getMessage.contains("pending"))
    intercept[java.io.IOException] {
      VersionedParquet.updateWhere(spark, root, col("k") === 1L,
        Map("cents" -> lit(99L)), keepVersions = 10)
    }
    intercept[java.io.IOException] {
      VersionedParquet.delete(spark, root, col("k") === 1L,
        keepVersions = 10)
    }
    intercept[java.io.IOException] {
      VersionedParquet.upsert(spark, root,
        Seq((1L, 11L)).toDF("k", "cents"), Seq("k"), keepVersions = 10)
    }

    // OPTIMIZE materializes: physical schema is now logical, map gone
    VersionedParquet.compact(spark, root, keepVersions = 10)
    assert(VersionedParquet.schemaMapOps(spark, root).isEmpty)
    assert(spark.read.parquet(
      s"$root/${"v%08d".format(VersionedParquet.currentVersion(spark, root).get)}")
      .columns.toSeq === Seq("k", "cents"))
    // DML flows again
    VersionedParquet.append(spark, root,
      Seq((3L, 30L)).toDF("k", "cents"), keepVersions = 10)
    assert(VersionedParquet.read(spark, root).count() === 3L)

    // re-introducing the dropped name must NOT be eaten by a stale map
    VersionedParquet.addColumn(spark, root, "junk", "STRING", "'fresh'")
    val re = VersionedParquet.read(spark, root)
    assert(re.columns.contains("junk"))
    assert(re.select("junk").distinct().as[String].collect().toSeq ===
      Seq("fresh"))
  }

  test("physical RENAME: logical reads, fence, materialize, then " +
      "writes use the new name") {
    val root = freshRoot("rename")
    VersionedParquet.publish(Seq((1L, 5L), (2L, 7L)).toDF("k", "v"),
      root, keepVersions = 10)
    VersionedParquet.renameColumn(spark, root, "v", "w")
    assert(VersionedParquet.read(spark, root).columns.toSeq ===
      Seq("k", "w"))
    assert(VersionedParquet.read(spark, root).select("w")
      .as[Long].collect().toSet === Set(5L, 7L))
    intercept[java.io.IOException] {
      VersionedParquet.append(spark, root, Seq((3L, 9L)).toDF("k", "w"),
        keepVersions = 10)
    }
    VersionedParquet.compact(spark, root, keepVersions = 10)
    VersionedParquet.append(spark, root, Seq((3L, 9L)).toDF("k", "w"),
      keepVersions = 10)
    assert(VersionedParquet.read(spark, root).select("w")
      .as[Long].collect().toSet === Set(5L, 7L, 9L))
  }

  test("virtual extension columns drop/rename via _SCHEMA_EXT — no " +
      "fence, no map") {
    val root = freshRoot("virt")
    VersionedParquet.publish(Seq((1L, 100L)).toDF("k", "cents"), root,
      keepVersions = 10)
    VersionedParquet.addColumn(spark, root, "band", "STRING",
      "CASE WHEN cents >= 50 THEN 'hi' ELSE 'lo' END")
    VersionedParquet.renameColumn(spark, root, "band", "tier")
    val df = VersionedParquet.read(spark, root)
    assert(df.columns.toSeq === Seq("k", "cents", "tier"))
    assert(df.select("tier").as[String].collect().toSeq === Seq("hi"))
    assert(VersionedParquet.schemaMapOps(spark, root).isEmpty)
    // still writable: nothing physical changed
    VersionedParquet.append(spark, root,
      Seq((2L, 10L)).toDF("k", "cents"), keepVersions = 10)
    VersionedParquet.dropColumn(spark, root, "tier")
    assert(VersionedParquet.read(spark, root).columns.toSeq ===
      Seq("k", "cents"))
    assert(VersionedParquet.schemaMapOps(spark, root).isEmpty)
  }

  test("validation: missing column, name collision, partition column") {
    val root = freshRoot("valid")
    VersionedParquet.publish(
      Seq((1L, "a", 10L)).toDF("k", "p", "cents"), root,
      partitionCols = Seq("p"), keepVersions = 10)
    intercept[IllegalArgumentException] {
      VersionedParquet.dropColumn(spark, root, "nope")
    }
    intercept[IllegalArgumentException] {
      VersionedParquet.renameColumn(spark, root, "cents", "k")
    }
    intercept[IllegalArgumentException] {
      VersionedParquet.dropColumn(spark, root, "p")
    }
    intercept[IllegalArgumentException] {
      VersionedParquet.renameColumn(spark, root, "p", "q")
    }
  }

  test("shallow clone carries a pending map; SQL verbs drive the " +
      "lifecycle") {
    val root = freshRoot("clone-src")
    val dst = freshRoot("clone-dst")
    VersionedParquet.publish(Seq((1L, 5L, "z")).toDF("k", "v", "junk"),
      root, keepVersions = 10)
    VersionedParquet.renameColumn(spark, root, "v", "w")
    VersionedParquet.dropColumn(spark, root, "junk")
    VersionedParquet.shallowClone(spark, root, dst)
    assert(VersionedParquet.read(spark, dst).columns.toSeq ===
      Seq("k", "w"))

    // SQL surface: DROP/RENAME as ALTER statements on a registered
    // table, then OPTIMIZE unfences
    val sroot = freshRoot("sql")
    GraftTables.register("graft_smap_t", sroot, keepVersions = 10)
    VersionedParquet.publish(Seq((1L, 2L, 3L)).toDF("a", "b", "c"),
      sroot, keepVersions = 10)
    GraftSql.sql(spark, "ALTER TABLE graft_smap_t RENAME COLUMN b TO bb")
    GraftSql.sql(spark, "ALTER TABLE graft_smap_t DROP COLUMN c")
    assert(VersionedParquet.read(spark, sroot).columns.toSeq ===
      Seq("a", "bb"))
    intercept[Exception] {
      GraftSql.sql(spark,
        "INSERT INTO graft_smap_t SELECT 9 AS a, 9 AS bb")
    }
    GraftSql.sql(spark, "OPTIMIZE graft_smap_t")
    GraftSql.sql(spark,
      "INSERT INTO graft_smap_t SELECT CAST(9 AS BIGINT) AS a, " +
        "CAST(9 AS BIGINT) AS bb")
    assert(VersionedParquet.read(spark, sroot)
      .as[(Long, Long)].collect().toSet === Set((1L, 2L), (9L, 9L)))
  }
}
