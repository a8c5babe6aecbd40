package graft.warehouse

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pushed-down filters on the `graft` data source resolve through the
  * file-skipping tier: a SQL-only client's selective predicate reads a
  * slice, not the table — with byte-identical results to the unpruned
  * scan (every filter re-applies above the scan, so pruning is pure
  * IO). Covers range, equality + bloom, IN-envelope, prefix, the
  * conservative no-stats fallback, and filter-shape soundness edges.
  */
class SourcePruneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** 1000 rows in 10 tightly-ranged files on k; s carries a matching
    * string layout ("key000".."key999"); v is unclustered noise. */
  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-srcprune").resolve("t")
      .toString
    val df = spark.range(1000).toDF("k")
      .withColumn("s", format_string("key%03d", col("k")))
      .withColumn("v", (col("k") * 7919) % 1000)
    FileStats.publishClustered(df, r, Seq("k"), Seq("k", "s"),
      nFiles = 10, keepVersions = 10)
    r
  }

  private lazy val bloomRoot: String = {
    val r = Files.createTempDirectory("graft-srcprune-bloom")
      .resolve("t").toString
    // UNSORTED high-cardinality ids: ranges prune nothing, blooms do
    val df = spark.range(1000).toDF("id")
      .withColumn("id", (col("id") * 2654435761L) % 1000000L)
      .withColumn("payload", col("id") % 17)
      .repartition(8)
    VersionedParquet.publish(df, r, keepVersions = 10,
      bloomCols = Seq("id"))
    r
  }

  private def viewOf(r: String, name: String): Unit =
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name " +
      s"USING graft OPTIONS (path '$r')")

  private def runAndAudit(sql: String): (Set[Seq[Any]], (Int, Int)) = {
    GraftRelation.lastPrune = None
    val rows = spark.sql(sql).collect()
      .map(_.toSeq).toSet
    val prune = GraftRelation.lastPrune match {
      case Some((_, kept, total)) => (kept, total)
      case None => (-2, -2) // scan never took the pruning path
    }
    (rows, prune)
  }

  test("range predicate prunes files and matches the unpruned answer") {
    viewOf(root, "sp_t")
    val (rows, (kept, total)) = runAndAudit(
      "SELECT k, s, v FROM sp_t WHERE k BETWEEN 150 AND 249")
    assert(rows === (150L to 249L).map(k =>
      Seq[Any](k, f"key$k%03d", (k * 7919) % 1000)).toSet)
    assert(total === 10 && kept < total && kept >= 1,
      s"expected a pruned slice, got $kept/$total")
  }

  test("string equality and prefix predicates prune via string ranges") {
    viewOf(root, "sp_t2")
    val (rows, (kept, total)) = runAndAudit(
      "SELECT k FROM sp_t2 WHERE s = 'key500'")
    assert(rows === Set(Seq[Any](500L)))
    assert(total === 10 && kept < total)

    val (rows2, (kept2, total2)) = runAndAudit(
      "SELECT count(*) AS n FROM sp_t2 WHERE s LIKE 'key1%'")
    assert(rows2 === Set(Seq[Any](100L)))
    assert(total2 === 10 && kept2 < total2)
  }

  test("IN envelope prunes; a filter on a stat-less column doesn't " +
      "but stays correct") {
    viewOf(root, "sp_t3")
    val (rows, (kept, total)) = runAndAudit(
      "SELECT k FROM sp_t3 WHERE k IN (100, 101, 199)")
    assert(rows === Set(Seq[Any](100L), Seq[Any](101L), Seq[Any](199L)))
    assert(total === 10 && kept < total)

    // v has no stats: the scan keeps everything, the answer is exact
    val (rows2, (kept2, total2)) = runAndAudit(
      "SELECT count(*) AS n FROM sp_t3 WHERE v < 100")
    assert(rows2.head.head.asInstanceOf[Long] ===
      (0L until 1000L).count(k => (k * 7919) % 1000 < 100))
    assert(kept2 === total2)
  }

  test("bloom point lookup prunes an unsorted layout; absent key " +
      "reads nothing") {
    viewOf(bloomRoot, "sp_b")
    val present = (7L * 2654435761L) % 1000000L
    val (rows, (kept, total)) = runAndAudit(
      s"SELECT id, payload FROM sp_b WHERE id = $present")
    assert(rows === Set(Seq[Any](present, present % 17)))
    assert(total === 8 && kept < total,
      s"bloom should prune, got $kept/$total")

    // 1000003 is prime and larger than any residue — never present
    val (rows2, (kept2, _)) = runAndAudit(
      "SELECT id FROM sp_b WHERE id = 1000003")
    assert(rows2.isEmpty && kept2 === 0)
  }

  test("null-semantics filters never prune; disjunctions don't " +
      "over-prune") {
    viewOf(root, "sp_t4")
    val (rows, (kept, total)) = runAndAudit(
      "SELECT count(*) AS n FROM sp_t4 WHERE k IS NOT NULL")
    assert(rows === Set(Seq[Any](1000L)))
    assert(kept === total || (kept, total) === (-2, -2))

    // OR compiles to a single Or filter — unprunable shape, full scan
    val (rows2, _) = runAndAudit(
      "SELECT count(*) AS n FROM sp_t4 WHERE k < 10 OR k > 990")
    assert(rows2 === Set(Seq[Any](19L)))
  }

  test("version-pinned and CDC reads keep the unpruned path") {
    viewOf(root, "sp_t5")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW sp_t5_v0 USING graft " +
      s"OPTIONS (path '$root', versionAsOf '0')")
    GraftRelation.lastPrune = None
    val n = spark.sql("SELECT count(*) AS n FROM sp_t5_v0 WHERE k < 100")
      .collect().head.getLong(0)
    assert(n === 100L)
    assert(GraftRelation.lastPrune.isEmpty)
  }
}
