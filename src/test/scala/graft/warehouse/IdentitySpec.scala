package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GENERATED ALWAYS AS IDENTITY contract: writer-assigned contiguous
  * id blocks from a persisted high-water mark; supplied values,
  * UPDATE SET, keyed writes, and id-dropping/duplicating publishes
  * all refuse by name; OPTIMIZE and COPY INTO ride the same
  * machinery. */
class IdentitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-id-$tag")
      .toString + "/t"

  private def freshIdTable(tag: String): String = {
    import spark.implicits._
    val root = tmp(tag)
    VersionedParquet.publish(
      Seq.empty[(Long, Long)].toDF("k", "x"), root, keepVersions = 20)
    VersionedParquet.addIdentityColumn(spark, root, "rid")
    root
  }

  private def rids(root: String): Seq[Long] =
    VersionedParquet.read(spark, root).select("rid").orderBy("rid")
      .collect().toSeq.map(_.getLong(0))

  test("appends take contiguous id blocks; the mark survives across " +
    "batches; ids are globally unique") {
    import spark.implicits._
    val root = freshIdTable("blocks")
    VersionedParquet.append(spark, root,
      (0L until 30L).map(i => (i, i * 2)).toDF("k", "x"),
      keepVersions = 20)
    assert(rids(root) === (0L until 30L))
    VersionedParquet.append(spark, root,
      (100L until 110L).map(i => (i, i)).toDF("k", "x"),
      keepVersions = 20)
    assert(rids(root) === (0L until 40L))
    // the second batch's rows hold exactly the block [30, 40)
    val batch2 = VersionedParquet.read(spark, root)
      .filter(col("k") >= 100).select("rid")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(batch2 === (30L until 40L))
  }

  test("refusals: supplied ids, UPDATE SET, merge/upsert, declaration " +
    "on a non-empty table") {
    import spark.implicits._
    val root = freshIdTable("refuse")
    VersionedParquet.append(spark, root,
      Seq((1L, 1L)).toDF("k", "x"), keepVersions = 20)
    val eSup = intercept[java.io.IOException](
      VersionedParquet.append(spark, root,
        Seq((2L, 2L, 99L)).toDF("k", "x", "rid"), keepVersions = 20))
    assert(eSup.getMessage.contains("GENERATED ALWAYS"),
      s"got: ${eSup.getMessage}")
    val eSet = intercept[java.io.IOException](
      VersionedParquet.updateWhere(spark, root, lit(true),
        Map("rid" -> lit(0L)), keepVersions = 20))
    assert(eSet.getMessage.contains("identity column"),
      s"got: ${eSet.getMessage}")
    val eMerge = intercept[java.io.IOException](
      VersionedParquet.upsert(spark, root,
        Seq((1L, 5L)).toDF("k", "x"), Seq("k"), keepVersions = 20))
    assert(eMerge.getMessage.contains("identity"),
      s"got: ${eMerge.getMessage}")
    val eDecl = intercept[java.io.IOException](
      VersionedParquet.addIdentityColumn(spark, root, "rid2"))
    assert(eDecl.getMessage.contains("empty"),
      s"got: ${eDecl.getMessage}")
  }

  test("UPDATE of a source column carries ids; OPTIMIZE revalidates " +
    "and keeps them; a publish dropping or duplicating ids refuses") {
    import spark.implicits._
    val root = freshIdTable("carry")
    VersionedParquet.append(spark, root,
      (0L until 20L).map(i => (i, i)).toDF("k", "x"), keepVersions = 20)
    VersionedParquet.updateWhere(spark, root, col("k") % 2 === 0,
      Map("x" -> (col("x") + 100)), keepVersions = 20)
    assert(rids(root) === (0L until 20L), "update must carry ids")
    VersionedParquet.compact(spark, root, keepVersions = 20)
    assert(rids(root) === (0L until 20L), "compact must carry ids")
    // publish without the column refuses
    val eDrop = intercept[java.io.IOException](
      VersionedParquet.publish(Seq((1L, 1L)).toDF("k", "x"), root,
        keepVersions = 20))
    assert(eDrop.getMessage.contains("lacks it"),
      s"got: ${eDrop.getMessage}")
    // publish with duplicated ids refuses
    val eDup = intercept[java.io.IOException](
      VersionedParquet.publish(
        Seq((1L, 1L, 5L), (2L, 2L, 5L)).toDF("k", "x", "rid"), root,
        keepVersions = 20))
    assert(eDup.getMessage.contains("duplicated"),
      s"got: ${eDup.getMessage}")
    // publish with an id at/above the mark refuses
    val eHigh = intercept[java.io.IOException](
      VersionedParquet.publish(
        Seq((1L, 1L, 1000L)).toDF("k", "x", "rid"), root,
        keepVersions = 20))
    assert(eHigh.getMessage.contains("high-water"),
      s"got: ${eHigh.getMessage}")
    assert(rids(root) === (0L until 20L), "refused publishes change nothing")
  }

  test("COPY INTO assigns ids through the append path; SQL INSERT " +
    "does too (both activation surfaces)") {
    import spark.implicits._
    val root = freshIdTable("copy")
    GraftTables.register("t_idcopy", root, keepVersions = 20)
    try {
      val landing = java.nio.file.Files
        .createTempDirectory("graft-id-landing").toString
      (0L until 15L).map(i => (i, i)).toDF("k", "x")
        .coalesce(1).write.mode("overwrite").parquet(s"$landing/b1")
      val r = GraftSql.sql(spark,
        s"COPY INTO t_idcopy FROM '$landing' FILEFORMAT = parquet").head()
      assert(r.getAs[Long]("n_rows_inserted") === 15L)
      assert(rids(root) === (0L until 15L))
      spark.range(5).selectExpr("id + 500 AS k", "id AS x")
        .createOrReplaceTempView("idrows")
      GraftSql.sql(spark,
        "INSERT INTO t_idcopy SELECT k, x FROM idrows")
      assert(rids(root) === (0L until 20L))
      // CSV COPY INTO an identity table: the read schema excludes the
      // writer-owned column, so ids are assigned, never read-as-null
      val csvDir = java.nio.file.Files
        .createTempDirectory("graft-id-csv").toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(csvDir, "rows.csv"),
        "k,x\n900,1\n901,2\n".getBytes("UTF-8"))
      val rc = GraftSql.sql(spark,
        s"COPY INTO t_idcopy FROM '$csvDir' FILEFORMAT = csv " +
          "FORMAT_OPTIONS ('header'='true')").head()
      assert(rc.getAs[Long]("n_rows_inserted") === 2L)
      assert(rids(root) === (0L until 22L))
      // the SQL declaration path works end-to-end on a fresh table
      val root2 = tmp("sqldecl")
      VersionedParquet.publish(
        Seq.empty[(Long, Long)].toDF("k", "x"), root2, keepVersions = 20)
      GraftTables.register("t_iddecl", root2, keepVersions = 20)
      GraftSql.sql(spark, "ALTER TABLE t_iddecl ADD COLUMN rid BIGINT " +
        "GENERATED ALWAYS AS IDENTITY")
      GraftSql.sql(spark, "INSERT INTO t_iddecl SELECT k, x FROM idrows")
      assert(rids(root2) === (0L until 5L))
      // DESCRIBE DETAIL surfaces the identity column with its mark
      val det = GraftSql.sql(spark, "DESCRIBE DETAIL t_iddecl").head()
      assert(det.getAs[String]("identity_columns") === "rid:5")
    } finally {
      GraftTables.unregister("t_idcopy")
      GraftTables.unregister("t_iddecl")
    }
  }

  test("COPY INTO parquet refuses files CARRYING the identity column " +
    "(GENERATED ALWAYS is writer-owned — the Delta contract, pinned)") {
    import spark.implicits._
    val root = freshIdTable("copycarry")
    GraftTables.register("t_idcarry", root, keepVersions = 20)
    try {
      val landing = java.nio.file.Files
        .createTempDirectory("graft-id-carry").toString
      // a parquet landing file that already holds rid values — unlike
      // the CSV path (which reads with the writer-owned columns
      // stripped), parquet files carry their own schema, and importing
      // foreign id assignments would break the uniqueness contract
      (0L until 5L).map(i => (i, i, i + 7L)).toDF("k", "x", "rid")
        .coalesce(1).write.parquet(s"$landing/b1")
      val e = intercept[java.io.IOException](GraftSql.sql(spark,
        s"COPY INTO t_idcarry FROM '$landing' FILEFORMAT = parquet"))
      assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"),
        s"got: ${e.getMessage}")
      assert(VersionedParquet.read(spark, root).count() === 0L,
        "the refused load lands nothing")
    } finally GraftTables.unregister("t_idcarry")
  }

  test("publish refuses NULL identity values (count/max skip nulls — " +
    "a null-id frame must not slip past the uniqueness checks)") {
    import spark.implicits._
    val root = freshIdTable("nullid")
    // seed some assigned rows so the high-water mark is live
    VersionedParquet.append(spark, root,
      (0L until 5L).map(i => (i, i)).toDF("k", "x"), keepVersions = 20)
    val withNull = Seq(
      (1L, 1L, java.lang.Long.valueOf(0L)),
      (2L, 2L, null.asInstanceOf[java.lang.Long]))
      .toDF("k", "x", "rid")
    val e = intercept[java.io.IOException](
      VersionedParquet.publish(withNull, root, keepVersions = 20))
    assert(e.getMessage.contains("NULL"), s"got: ${e.getMessage}")
    assert(VersionedParquet.read(spark, root).count() === 5L,
      "the refused publish changes nothing")
  }
}
