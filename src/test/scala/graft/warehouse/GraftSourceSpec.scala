package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `format("graft")` data-source contract: reads resolve through the
  * versioned read path (MoR overlay included), version/timestamp pins
  * work from both the DataFrame and the pure-SQL (`USING graft`)
  * entries, and invalid option combinations fail loudly.
  */
class GraftSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val root: String = {
    import spark.implicits._
    val r = java.nio.file.Files.createTempDirectory("graft-src")
      .toString + "/t"
    VersionedParquet.publish(
      (0L until 100L).map(i => (i, s"g${i % 3}", i)).toDF("id", "g", "x"),
      r, keepVersions = 50)
    VersionedParquet.upsert(spark,
      r, Seq((5L, "gx", -5L), (500L, "gx", 1L)).toDF("id", "g", "x"),
      Seq("id"), keepVersions = 50)
    VersionedParquet.delete(spark, r, col("id") === 7L, keepVersions = 50)
    r
  }

  test("live read equals the Scala API, merge-on-read overlay applied") {
    val viaSource = spark.read.format("graft").load(root)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val viaApi = VersionedParquet.read(spark, root)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(viaSource === viaApi)
    assert(!viaSource.exists(_.head == 7L), "deleted row must be masked")
    assert(viaSource.exists(r => r.head == 5L && r(1) == "gx"),
      "upserted image must be served")
  }

  test("versionAsOf and timestampAsOf pin history") {
    val v0 = spark.read.format("graft").option("versionAsOf", 0)
      .load(root)
    assert(v0.count() === 100L)
    assert(v0.filter(col("id") === 7L).count() === 1L,
      "v0 predates the delete")
    val ts1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/v00000001/_SUCCESS")), "UTF-8")
      .trim.toLong
    val atV1 = spark.read.format("graft")
      .option("timestampAsOf", ts1).load(root)
    assert(atV1.count() === 101L, "as-of v1: upsert applied, delete not")
    intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", 0)
        .option("timestampAsOf", ts1).load(root).collect()
    }
  }

  test("pure-SQL view with USING graft serves a SQL-only client") {
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g_src_live " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g_src_v0 " +
      s"USING graft OPTIONS (path '$root', versionAsOf '0')")
    val live = spark.sql(
      "SELECT count(*) AS n, sum(x) AS sx FROM g_src_live").head()
    val api = VersionedParquet.read(spark, root)
      .agg(count(lit(1)), sum("x")).head()
    assert(live.getLong(0) === api.getLong(0) &&
      live.getLong(1) === api.getLong(1))
    assert(spark.sql("SELECT count(*) FROM g_src_v0").head().getLong(0)
      === 100L)
    // column pruning: a single-column projection survives the source
    assert(spark.sql("SELECT g FROM g_src_live WHERE g = 'gx'")
      .collect().map(_.getString(0)).toSeq === Seq("gx", "gx"))
  }

  test("changes view: the row-level feed served to a SQL-only consumer") {
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g_src_feed " +
      s"USING graft OPTIONS (path '$root', changesFrom '0')")
    val byType = spark.sql(
      """SELECT _change_type, count(*) AS n FROM g_src_feed
        |GROUP BY _change_type ORDER BY _change_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // v1: upsert of key 5 (update_pre/post) + insert of 500;
    // v2: delete of key 7
    assert(byType === Map("update_pre" -> 1L, "update_post" -> 1L,
      "insert" -> 1L, "delete" -> 1L))
    // bounded range: only v1's changes
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g_src_feed1 " +
      s"USING graft OPTIONS (path '$root', changesFrom '0', changesTo '1')")
    assert(spark.sql("SELECT count(*) FROM g_src_feed1").head().getLong(0)
      === 3L)
    // a changes view cannot also pin a version
    intercept[Exception] {
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g_src_bad " +
        s"USING graft OPTIONS (path '$root', changesFrom '0', " +
        s"versionAsOf '1')")
      spark.sql("SELECT * FROM g_src_bad").collect()
    }
  }

  test("history view: the commit log as SQL (DESCRIBE HISTORY)") {
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW g_src_hist " +
      s"USING graft OPTIONS (path '$root', history 'true')")
    val hist = spark.sql(
      "SELECT version, commit_millis, domain FROM g_src_hist " +
        "ORDER BY version").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L),
      "all three commits listed")
    assert(hist.forall(r => !r.isNullAt(1) && r.getLong(1) > 0L),
      "every commit carries its stamp")
    assert(hist.map(_.getString(2)).forall(_ == "table"),
      "legacy single-writer commits are whole-table domain")
  }

  test("sizeInBytes: a small graft view auto-broadcasts in a SQL join") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-size")
    val big = work.resolve("big").toString
    (0L until 50000L).map(i => (i % 97, i)).toDF("k", "v")
      .write.parquet(big)
    spark.read.parquet(big).createOrReplaceTempView("size_big")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW size_small " +
      s"USING graft OPTIONS (path '$root')")
    val joined = spark.sql(
      """SELECT b.k, count(*) AS n, sum(s.x) AS sx
        |FROM size_big b JOIN size_small s ON s.id = b.k
        |GROUP BY b.k""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small graft build side must broadcast; got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "a KB-sized graft view must not force a shuffle join")
    assert(joined.agg(sum("n")).head().getLong(0) > 0L)
  }
}
