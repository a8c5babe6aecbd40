package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout evolution: the declared layout is metadata-only,
  * takes physical effect at the next materialization (and every one
  * after, unprompted), OPTIMIZE never silently flattens an existing
  * Hive layout, and the declaration validates against the schema.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-layout-$tag")
      .toString + "/t"

  private def rows(root: String): Set[(Long, String, Long)] =
    VersionedParquet.read(spark, root).select("id", "g", "x")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet

  test("declaration is metadata-only; OPTIMIZE materializes it and " +
      "every later default OPTIMIZE re-applies it") {
    import spark.implicits._
    val root = tmp("evolve")
    VersionedParquet.publish(
      (0L until 60L).map(i => (i, s"g${i % 3}", i * 10)).toDF("id", "g", "x"),
      root, keepVersions = 20)
    val before = rows(root)
    VersionedParquet.setPartitionLayout(spark, root, Seq("g"))
    assert(VersionedParquet.currentVersion(spark, root).get === 0L,
      "declaration mints no version")
    assert(VersionedParquet.partitionColsOf(spark, root).isEmpty,
      "physical layout unchanged until materialization")
    VersionedParquet.compact(spark, root, keepVersions = 20)
    assert(VersionedParquet.partitionColsOf(spark, root) === Seq("g"))
    assert(rows(root) === before, "byte-equal logical content")
    // append lands on the delta tier; the NEXT default compact must
    // re-apply the declaration unprompted
    VersionedParquet.append(spark, root,
      Seq((100L, "g1", 1L)).toDF("id", "g", "x"), keepVersions = 20)
    VersionedParquet.compact(spark, root, keepVersions = 20)
    assert(VersionedParquet.partitionColsOf(spark, root) === Seq("g"))
    assert(rows(root) === before + ((100L, "g1", 1L)))
    // clearing the declaration: the next compact PRESERVES the
    // existing physical layout (no silent flatten)
    VersionedParquet.setPartitionLayout(spark, root, Nil)
    VersionedParquet.compact(spark, root, keepVersions = 20)
    assert(VersionedParquet.partitionColsOf(spark, root) === Seq("g"))
  }

  test("OPTIMIZE default preserves an existing Hive layout (no " +
      "silent flatten) and the declaration validates its columns") {
    import spark.implicits._
    val root = tmp("preserve")
    VersionedParquet.publish(
      (0L until 40L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "x"),
      root, partitionCols = Seq("g"), keepVersions = 20)
    assert(VersionedParquet.partitionColsOf(spark, root) === Seq("g"))
    VersionedParquet.compact(spark, root, keepVersions = 20)
    assert(VersionedParquet.partitionColsOf(spark, root) === Seq("g"),
      "compact without arguments keeps the table's layout")
    intercept[IllegalArgumentException] {
      VersionedParquet.setPartitionLayout(spark, root, Seq("nope"))
    }
  }

  test("SQL verbs: SET/DROP PARTITION LAYOUT drive the declaration") {
    import spark.implicits._
    val root = tmp("sql")
    VersionedParquet.publish(
      (0L until 30L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "x"),
      root, keepVersions = 20)
    GraftTables.register("t_layout", root)
    try {
      GraftSql.sql(spark,
        "ALTER TABLE t_layout SET PARTITION LAYOUT (g)")
      assert(VersionedParquet.declaredLayout(spark, root) ===
        Some(Seq("g")))
      GraftSql.sql(spark, "OPTIMIZE t_layout")
      assert(VersionedParquet.partitionColsOf(spark, root) === Seq("g"))
      GraftSql.sql(spark, "ALTER TABLE t_layout DROP PARTITION LAYOUT")
      assert(VersionedParquet.declaredLayout(spark, root).isEmpty)
    } finally GraftTables.unregister("t_layout")
  }
}
