package graft.warehouse

import java.io.IOException

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generated columns (GENERATED ALWAYS AS): ALTER adds the column
  * virtual (read-computed), OPTIMIZE makes it physical, and from then
  * on every write path computes it when omitted and validates it when
  * supplied; UPDATE refuses to SET it and recomputes it when a source
  * column changes; rules rename/drop with their column, source columns
  * are fenced, and clones carry the rules.
  */
class GeneratedColumnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-gen-$tag")
      .toString + "/t"

  /** id, x table with `sign` GENERATED ALWAYS AS sign-of-x, already
    * materialized (OPTIMIZE ran). */
  private def genTable(tag: String): String = {
    import spark.implicits._
    val root = tmp(tag)
    VersionedParquet.publish(
      (0L until 50L).map(i => (i, i - 25L)).toDF("id", "x"), root,
      keepVersions = 20)
    VersionedParquet.addGeneratedColumn(spark, root, "sign", "BIGINT",
      "CASE WHEN x >= 0 THEN 1 ELSE -1 END")
    VersionedParquet.compact(spark, root, keepVersions = 20)
    root
  }

  test("virtual phase: read computes, write may not supply, rule " +
      "recorded") {
    import spark.implicits._
    val root = tmp("virtual")
    VersionedParquet.publish(
      (0L until 10L).map(i => (i, i)).toDF("id", "x"), root,
      keepVersions = 20)
    VersionedParquet.addGeneratedColumn(spark, root, "doubled", "BIGINT",
      "x * 2")
    assert(VersionedParquet.generationRules(spark, root) ===
      Seq("doubled" -> "x * 2"))
    val live = VersionedParquet.read(spark, root)
    assert(live.filter(col("id") === 3L).head().getLong(2) === 6L)
    intercept[IOException] {
      VersionedParquet.append(spark, root,
        Seq((100L, 5L, 10L)).toDF("id", "x", "doubled"),
        keepVersions = 20)
    }
    // nondeterministic generation is refused at ALTER time
    intercept[IllegalArgumentException] {
      VersionedParquet.addGeneratedColumn(spark, root, "r", "DOUBLE",
        "rand()")
    }
    // self-reference is refused
    intercept[IllegalArgumentException] {
      VersionedParquet.addGeneratedColumn(spark, root, "y", "BIGINT",
        "y + 1")
    }
  }

  test("physical phase: append computes when omitted, validates when " +
      "supplied") {
    import spark.implicits._
    val root = genTable("append")
    VersionedParquet.append(spark, root,
      Seq((100L, 7L), (101L, -7L)).toDF("id", "x"), keepVersions = 20)
    val live = VersionedParquet.read(spark, root)
    assert(live.filter(col("id") === 100L).head().getLong(2) === 1L)
    assert(live.filter(col("id") === 101L).head().getLong(2) === -1L)
    // supplied-correct lands
    VersionedParquet.append(spark, root,
      Seq((102L, 9L, 1L)).toDF("id", "x", "sign"), keepVersions = 20)
    // supplied-wrong rejects whole batch, version untouched
    val v = VersionedParquet.currentVersion(spark, root)
    val ex = intercept[IOException] {
      VersionedParquet.append(spark, root,
        Seq((103L, 9L, -1L), (104L, 2L, 1L))
          .toDF("id", "x", "sign"), keepVersions = 20)
    }
    assert(ex.getMessage.contains("GENERATED ALWAYS AS"))
    assert(VersionedParquet.currentVersion(spark, root) === v)
  }

  test("merge and optimistic writers compute the rule too") {
    import spark.implicits._
    val root = genTable("merge")
    VersionedParquet.upsert(spark, root,
      Seq((5L, -100L)).toDF("id", "x"), Seq("id"), keepVersions = 20)
    assert(VersionedParquet.read(spark, root)
      .filter(col("id") === 5L).head().getLong(2) === -1L,
      "upsert of a source column recomputes the generated value")
    val c = Optimistic.append(spark, root,
      Seq((200L, 3L)).toDF("id", "x"), keepVersions = 20)
    assert(c.attempts === 1)
    assert(VersionedParquet.read(spark, root)
      .filter(col("id") === 200L).head().getLong(2) === 1L)
    intercept[IOException] {
      Optimistic.upsert(spark, root,
        Seq((6L, 4L, -1L)).toDF("id", "x", "sign"), Seq("id"),
        keepVersions = 20)
    }
  }

  test("UPDATE: SET on generated rejects; source change recomputes") {
    val root = genTable("update")
    intercept[IOException] {
      VersionedParquet.updateWhere(spark, root, col("id") < 5L,
        Map("sign" -> lit(1L)), keepVersions = 20)
    }
    // id 3 has x = -22 (sign -1); flip the source
    VersionedParquet.updateWhere(spark, root, col("id") === 3L,
      Map("x" -> lit(100L)), keepVersions = 20)
    val row = VersionedParquet.read(spark, root)
      .filter(col("id") === 3L).head()
    assert(row.getLong(1) === 100L && row.getLong(2) === 1L,
      "post-image recomputes the generated column")
  }

  test("publish validates supplied rules and computes absent ones") {
    import spark.implicits._
    val root = genTable("publish")
    intercept[IOException] {
      VersionedParquet.publish(
        Seq((1L, 5L, -1L)).toDF("id", "x", "sign"), root,
        keepVersions = 20)
    }
    VersionedParquet.publish(
      Seq((1L, 5L), (2L, -5L)).toDF("id", "x"), root, keepVersions = 20)
    val live = VersionedParquet.read(spark, root)
    assert(live.columns.toSeq === Seq("id", "x", "sign"))
    assert(live.filter(col("id") === 2L).head().getLong(2) === -1L)
  }

  test("rename renames the rule; drop removes it; sources are fenced") {
    import spark.implicits._
    val root = genTable("lifecycle")
    intercept[IllegalArgumentException] {
      VersionedParquet.dropColumn(spark, root, "x")
    }
    intercept[IllegalArgumentException] {
      VersionedParquet.renameColumn(spark, root, "x", "y")
    }
    VersionedParquet.renameColumn(spark, root, "sign", "polarity")
    assert(VersionedParquet.generationRules(spark, root).map(_._1) ===
      Seq("polarity"))
    VersionedParquet.compact(spark, root, keepVersions = 20)
    VersionedParquet.append(spark, root,
      Seq((300L, -2L)).toDF("id", "x"), keepVersions = 20)
    assert(VersionedParquet.read(spark, root)
      .filter(col("id") === 300L).head().getLong(2) === -1L,
      "the renamed rule still fires")
    VersionedParquet.dropColumn(spark, root, "polarity")
    assert(VersionedParquet.generationRules(spark, root).isEmpty,
      "dropping the generated column takes its rule with it")
    VersionedParquet.compact(spark, root, keepVersions = 20)
    VersionedParquet.dropColumn(spark, root, "x")
  }

  test("dropGeneration frees the column; clones carry rules") {
    import spark.implicits._
    val root = genTable("free")
    VersionedParquet.dropGeneration(spark, root, "sign")
    VersionedParquet.append(spark, root,
      Seq((400L, 1L, -1L)).toDF("id", "x", "sign"), keepVersions = 20)
    assert(VersionedParquet.read(spark, root)
      .filter(col("id") === 400L).head().getLong(2) === -1L,
      "without the rule the column is freely writable")
    val src = genTable("clone-src")
    val dst = tmp("clone-dst")
    VersionedParquet.shallowClone(spark, src, dst)
    assert(VersionedParquet.generationRules(spark, dst).nonEmpty)
    VersionedParquet.append(spark, dst,
      Seq((500L, -4L)).toDF("id", "x"), keepVersions = 20)
    assert(VersionedParquet.read(spark, dst)
      .filter(col("id") === 500L).head().getLong(2) === -1L)
  }

  test("SQL surface: GENERATED ALWAYS AS routes through") {
    import spark.implicits._
    val root = tmp("sql")
    VersionedParquet.publish(
      (0L until 10L).map(i => (i, i)).toDF("id", "x"), root,
      keepVersions = 20)
    GraftTables.register("gen_spec_t", root, keepVersions = 20)
    GraftSql.sql(spark, "ALTER TABLE gen_spec_t ADD COLUMN bucket " +
      "BIGINT GENERATED ALWAYS AS (x % 4)")
    assert(VersionedParquet.generationRules(spark, root) ===
      Seq("bucket" -> "x % 4"))
    GraftSql.sql(spark, "OPTIMIZE gen_spec_t")
    GraftSql.sql(spark,
      "INSERT INTO gen_spec_t SELECT 100 AS id, 7 AS x")
    assert(VersionedParquet.read(spark, root)
      .filter(col("id") === 100L).head().getLong(2) === 3L)
    GraftTables.unregister("gen_spec_t")
  }
}
