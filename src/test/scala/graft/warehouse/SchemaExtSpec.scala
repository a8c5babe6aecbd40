package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only ADD COLUMN: the column is readable on EVERY version
  * immediately (default computed at read), zero bytes rewritten,
  * pruned scans see it, OPTIMIZE materializes it, and writes keep
  * their physical-schema contract untouched.
  */
class SchemaExtSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-ext-$tag")
      .toString + "/t"

  private def dataBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
      else if (f.getName.endsWith(".parquet")) f.length() else 0L
    walk(new java.io.File(dir))
  }

  test("add column: readable everywhere at once, no data rewritten") {
    import spark.implicits._
    val root = tmp("add")
    VersionedParquet.publish(
      (0L until 100L).map(i => (i, i * 2)).toDF("id", "x"), root,
      keepVersions = 20)
    VersionedParquet.upsert(spark, root,
      Seq((5L, -5L)).toDF("id", "x"), Seq("id"), keepVersions = 20)
    val bytesBefore = dataBytes(root)
    VersionedParquet.addColumn(spark, root, "tier", "STRING",
      "CASE WHEN x >= 100 THEN 'hi' ELSE 'lo' END")
    assert(dataBytes(root) === bytesBefore,
      "metadata-only: not a byte of data moves")
    val live = VersionedParquet.read(spark, root)
    assert(live.columns.toSeq === Seq("id", "x", "tier"))
    assert(live.filter(col("id") === 60L).head().getString(2) === "hi")
    assert(live.filter(col("id") === 5L).head().getString(2) === "lo",
      "the default sees the MoR image, not the base row")
    // pinned history reads the column too (align-to-live contract)
    val v0 = VersionedParquet.read(spark, root, Some(0L))
    assert(v0.columns.contains("tier"))
    assert(v0.filter(col("id") === 5L).head().getString(2) === "lo")
    // duplicate add fails loudly; broken defaults fail at ALTER time
    intercept[IllegalArgumentException] {
      VersionedParquet.addColumn(spark, root, "tier", "STRING")
    }
    intercept[Exception] {
      VersionedParquet.addColumn(spark, root, "bad", "STRING",
        "no_such_col + 1")
    }
  }

  test("writes stay physical-schema; OPTIMIZE materializes; then writes carry it") {
    import spark.implicits._
    val root = tmp("mat")
    VersionedParquet.publish(
      (0L until 50L).map(i => (i, i)).toDF("id", "x"), root,
      keepVersions = 20)
    VersionedParquet.addColumn(spark, root, "flag", "BIGINT", "x % 2")
    // a write WITHOUT the virtual column still lands (physical contract)
    VersionedParquet.append(spark, root,
      Seq((500L, 3L)).toDF("id", "x"), keepVersions = 20)
    assert(VersionedParquet.read(spark, root)
      .filter(col("id") === 500L).head().getLong(2) === 1L)
    // a write WITH the still-virtual column is rejected with guidance
    val e = intercept[java.io.IOException] {
      VersionedParquet.append(spark, root,
        Seq((501L, 4L, 0L)).toDF("id", "x", "flag"), keepVersions = 20)
    }
    assert(e.getMessage.contains("flag"))
    // OPTIMIZE materializes: the column becomes physical with the
    // read-time values frozen in
    VersionedParquet.compact(spark, root, keepVersions = 20)
    val base = spark.read.parquet(
      s"$root/" + f"v${VersionedParquet.currentVersion(spark, root).get}%08d")
    assert(base.columns.contains("flag"),
      "compact must write the extension column physically")
    // now writes can (and must) carry it
    VersionedParquet.append(spark, root,
      Seq((502L, 7L, 1L)).toDF("id", "x", "flag"), keepVersions = 20)
    val r = VersionedParquet.read(spark, root)
    assert(r.filter(col("id") === 502L).head().getLong(2) === 1L)
    assert(r.count() === 52L)
  }

  test("the SQL verb drives it end-to-end") {
    import spark.implicits._
    val root = tmp("sql")
    VersionedParquet.publish(
      (0L until 30L).map(i => (i, i * 3)).toDF("id", "x"), root,
      keepVersions = 20)
    GraftTables.register("t_alter", root, keepVersions = 20)
    try {
      assert(GraftSql.parseDml(
        "ALTER TABLE t_alter ADD COLUMN score DOUBLE DEFAULT x * 0.5")
        === Some(SqlAddColumn("t_alter", "score", "DOUBLE",
          Some("x * 0.5"))))
      GraftSql.sql(spark,
        "ALTER TABLE t_alter ADD COLUMN score DOUBLE DEFAULT x * 0.5")
      val got = GraftSql.sql(spark,
        "SELECT count(*) FROM t_alter_missing") // falls through: error
      // (the line above must throw — unreachable assert)
      assert(false, s"expected analysis failure, got $got")
    } catch {
      case _: org.apache.spark.sql.AnalysisException => // expected
    } finally {
      val live = VersionedParquet.read(spark, root)
      assert(live.filter(col("id") === 4L).head().getDouble(2) === 6.0)
      GraftTables.clear()
    }
  }
}
