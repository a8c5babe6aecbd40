package graft.warehouse

import java.io.IOException

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DEEP CLONE: a materialized, fully independent copy of the live view
  * — no cross-root base reference (delete the source, the clone still
  * reads), partition layout preserved, and the contracts that outlive
  * materialization (named constraints, generation rules) travel.
  */
class DeepCloneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-deep-$tag")
      .toString + "/t"

  private def rows(root: String): Set[(Long, Long)] = {
    import spark.implicits._
    VersionedParquet.read(spark, root).select("id", "x")
      .as[(Long, Long)].collect().toSet
  }

  test("materialized copy, fully independent of the source") {
    import spark.implicits._
    val src = tmp("src"); val dst = tmp("dst")
    VersionedParquet.publish(
      (0L until 40L).map(i => (i, i)).toDF("id", "x"), src,
      keepVersions = 20)
    VersionedParquet.upsert(spark, src,
      Seq((3L, -3L)).toDF("id", "x"), Seq("id"), keepVersions = 20)
    VersionedParquet.deepClone(spark, src, dst, keepVersions = 20)
    assert(rows(dst) === rows(src), "clone == live view at clone time")
    // diverge both ways
    VersionedParquet.append(spark, dst,
      Seq((100L, 1L)).toDF("id", "x"), keepVersions = 20)
    VersionedParquet.append(spark, src,
      Seq((200L, 2L)).toDF("id", "x"), keepVersions = 20)
    assert(rows(dst).contains((100L, 1L)) && !rows(dst).contains((200L, 2L)))
    assert(rows(src).contains((200L, 2L)) && !rows(src).contains((100L, 1L)))
    // the independence proof: destroy the source root entirely
    val before = rows(dst)
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(
      new org.apache.hadoop.fs.Path(src).toUri.getPath))
    assert(rows(dst) === before,
      "deep clone reads with the source gone (no cross-root base)")
    // a second clone into a non-empty root is refused
    intercept[IOException] {
      VersionedParquet.deepClone(spark, dst, dst, keepVersions = 20)
    }
  }

  test("contracts travel: constraints and generation rules enforce " +
      "on the clone") {
    import spark.implicits._
    val src = tmp("contracts"); val dst = tmp("contracts-dst")
    VersionedParquet.publish(
      (0L until 20L).map(i => (i, i)).toDF("id", "x"), src,
      keepVersions = 20)
    VersionedParquet.addConstraint(spark, src, "x_nonneg", "x >= 0")
    VersionedParquet.addGeneratedColumn(spark, src, "bucket", "BIGINT",
      "x % 4")
    VersionedParquet.deepClone(spark, src, dst, keepVersions = 20)
    // the virtual generated column materialized INTO the copy
    assert(VersionedParquet.read(spark, dst).columns.toSeq ===
      Seq("id", "x", "bucket"))
    assert(VersionedParquet.namedConstraints(spark, dst).nonEmpty)
    assert(VersionedParquet.generationRules(spark, dst).nonEmpty)
    intercept[IOException] {
      VersionedParquet.append(spark, dst,
        Seq((100L, -1L)).toDF("id", "x"), keepVersions = 20)
    }
    VersionedParquet.append(spark, dst,
      Seq((100L, 7L)).toDF("id", "x"), keepVersions = 20)
    assert(VersionedParquet.read(spark, dst)
      .filter(col("id") === 100L).head().getLong(2) === 3L,
      "the generation rule fires on the clone's writes")
  }

  test("partition layout preserved; SQL verbs mint both clone kinds") {
    import spark.implicits._
    val src = tmp("sql-src")
    VersionedParquet.publish(
      (0L until 30L).map(i => (i, i % 3, i * 2)).toDF("id", "p", "x"),
      src, partitionCols = Seq("p"), keepVersions = 20)
    GraftTables.register("deep_spec_src", src, keepVersions = 20)
    val deepLoc = tmp("sql-deep"); val shallowLoc = tmp("sql-shallow")
    try {
      GraftSql.sql(spark, s"CREATE TABLE deep_spec_d USING graft " +
        s"LOCATION '$deepLoc' DEEP CLONE deep_spec_src")
      GraftSql.sql(spark, s"CREATE TABLE deep_spec_s USING graft " +
        s"LOCATION '$shallowLoc' SHALLOW CLONE deep_spec_src")
      assert(VersionedParquet.partitionColsOf(spark, deepLoc) ===
        Seq("p"), "deep clone keeps the Hive layout")
      assert(VersionedParquet.read(spark, deepLoc).count() === 30L)
      assert(VersionedParquet.read(spark, shallowLoc).count() === 30L)
      // the registered names resolve for further SQL
      GraftSql.sql(spark,
        "DELETE FROM deep_spec_d WHERE id < 10")
      assert(VersionedParquet.read(spark, deepLoc).count() === 20L)
      assert(VersionedParquet.read(spark, src).count() === 30L)
    } finally {
      GraftTables.unregister("deep_spec_src")
      GraftTables.unregister("deep_spec_d")
      GraftTables.unregister("deep_spec_s")
    }
  }
}
