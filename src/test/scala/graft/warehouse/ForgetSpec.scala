package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.functions.TextFns

/** Right-to-be-forgotten across derived state: after Forget.forget, no
  * table of the live snapshot holds a forgotten key, surviving rows are
  * bit-untouched, key-less tables re-point without rewrite, and with
  * keepSnapshots=1 no historical manifest resolves the forgotten rows.
  */
class ForgetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("forget purges corpus AND indexes in one atomic snapshot") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-forget").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val postings = docs.select(col("doc_id"),
      posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "term")))
    // a key-less config table: must survive by reference, not rewrite
    val config = spark.range(1).select(lit("minhash_k").as("k"),
      lit(32L).as("v"))
    WarehouseSnapshot.publishAll(
      Seq("docs" -> docs, "postings" -> postings, "config" -> config), root)
    val m0 = WarehouseSnapshot.currentManifest(spark, root).get
    val v0 = WarehouseSnapshot.tableVersions(spark, root, m0)

    val all = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val forgetIds = all.take(5)
    import spark.implicits._
    val keys = forgetIds.toSeq.toDF("doc_id")

    // Materialize the expected post-forget state BEFORE forgetting:
    // keepSnapshots=1 vacuums v0, so pre-forget plans are not re-runnable
    // afterwards (that unreadability is itself asserted below).
    val before = WarehouseSnapshot.readSnapshot(spark, root)
    val beforeDocs = before("docs").count()
    val beforePost = before("postings").count()
    val forgottenPost = before("postings")
      .filter(col("doc_id").isin(forgetIds: _*)).count()
    assert(forgottenPost > 0, "the forgotten docs must have postings")
    val expectedSurvivors = before("docs")
      .filter(!col("doc_id").isin(forgetIds: _*))
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet

    val m1 = Forget.forget(spark, root, keys)
    assert(m1 === m0 + 1, "one forget = one manifest increment")

    val after = WarehouseSnapshot.readSnapshot(spark, root)
    // no forgotten key anywhere in the live snapshot
    assert(after("docs").filter(col("doc_id").isin(forgetIds: _*))
      .count() === 0)
    assert(after("postings").filter(col("doc_id").isin(forgetIds: _*))
      .count() === 0)
    // survivors untouched, row-for-row
    assert(after("docs").count() === beforeDocs - forgetIds.length)
    assert(after("postings").count() === beforePost - forgottenPost)
    val actualSurvivors = after("docs")
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(actualSurvivors === expectedSurvivors)
    // the key-less table was pinned by reference: same version number
    val v1 = WarehouseSnapshot.tableVersions(spark, root, m1)
    assert(v1("config") === v0("config"),
      "key-less tables must re-point, not rewrite")
    assert(v1("docs") === v0("docs") + 1)

    // keepSnapshots=1: the pre-forget manifest is gone — no snapshot
    // resolution can reach the forgotten rows any more
    val stale = intercept[Exception] {
      WarehouseSnapshot.readSnapshot(spark, root, Some(m0))("docs").count()
    }
    assert(stale != null)
  }

  test("forget keeps a purged table's Hive partition layout") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-forget-part").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val postings = docs.select(col("doc_id"), col("lang"),
      posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "term")))
    WarehouseSnapshot.publishAll(
      Seq("docs" -> docs, "postings" -> postings), root,
      partitionCols = Map("postings" -> Seq("lang")))
    val tRoot = s"$root/tables/postings"
    assert(VersionedParquet.partitionColsOf(spark, tRoot) === Seq("lang"))

    import spark.implicits._
    Forget.forget(spark, root, Seq(1L, 2L, 3L).toDF("doc_id"))

    // the republished postings version is still lang-partitioned on disk
    assert(VersionedParquet.partitionColsOf(spark, tRoot) === Seq("lang"),
      "purge-republish must re-apply the original partition layout")
    val v1 = VersionedParquet.currentVersion(spark, tRoot).get
    val dir = new java.io.File(s"$tRoot/v${"%08d".format(v1)}")
    assert(dir.listFiles().exists(_.getName.startsWith("lang=")),
      s"expected lang= partition dirs in $dir")
    // and no forgotten key survives in any partition
    val snap = WarehouseSnapshot.readSnapshot(spark, root)
    assert(snap("postings").filter(col("doc_id").isin(1L, 2L, 3L))
      .count() === 0)
  }

  test("forget with no key-bearing table is a manifest-preserving no-op") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-forget-noop").toString
    val config = spark.range(1).select(lit("k").as("name"), lit(1L).as("v"))
    WarehouseSnapshot.publishAll(Seq("config" -> config), root)
    val m0 = WarehouseSnapshot.currentManifest(spark, root).get
    import spark.implicits._
    val m1 = Forget.forget(spark, root, Seq(1L).toDF("doc_id"))
    assert(m1 === m0, "no table carries the key: live manifest unchanged")
    assert(WarehouseSnapshot.readSnapshot(spark, root)("config")
      .count() === 1)
  }
}
