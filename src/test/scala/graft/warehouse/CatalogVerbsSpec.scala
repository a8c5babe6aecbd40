package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-verb contracts: TBLPROPERTIES (table-level survival across
  * every row-replacing verb, the semantics-bearing vacuum property,
  * loud malformed/absent refusals), SHOW PARTITIONS (listing vs live
  * rows, escaping round trip, MoR fallback, unpartitioned refusal),
  * SHOW CREATE TABLE (DDL reconstructed from the table's own markers),
  * and views (query-time re-resolution, view-on-view, cycle/duplicate
  * refusals, policy enforcement through the view read path).
  */
class CatalogVerbsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-cat-$tag")
      .toString + "/t"

  private def seed(root: String, n: Long = 60L): Unit = {
    import spark.implicits._
    VersionedParquet.publish(
      (0L until n).map(i => (i, s"g${i % 3}", i * 10))
        .toDF("id", "g", "x"), root, keepVersions = 50)
  }

  private def props(name: String): Map[String, String] =
    GraftSql.sql(spark, s"SHOW TBLPROPERTIES $name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("TBLPROPERTIES: set/show/unset round trip; table-level survival " +
    "across TRUNCATE, INSERT OVERWRITE, RESTORE; loud refusals") {
    val root = tmp("props")
    GraftTables.register("t_props", root, keepVersions = 50)
    seed(root)
    GraftSql.sql(spark, "ALTER TABLE t_props SET TBLPROPERTIES (" +
      "'owner'='team-a', 'comment'='has, comma and = sign', 'tier'='gold')")
    assert(props("t_props") === Map("owner" -> "team-a",
      "comment" -> "has, comma and = sign", "tier" -> "gold"))
    // SET upserts: overwrite one, keep the rest
    GraftSql.sql(spark,
      "ALTER TABLE t_props SET TBLPROPERTIES ('tier'='silver')")
    assert(props("t_props")("tier") === "silver")
    // survival across every row-replacing verb
    spark.range(5).selectExpr("id + 900 AS id", "'gz' AS g", "id AS x")
      .createOrReplaceTempView("props_src")
    GraftSql.sql(spark, "TRUNCATE TABLE t_props")
    GraftSql.sql(spark,
      "INSERT OVERWRITE t_props SELECT id, g, x FROM props_src")
    GraftSql.sql(spark, "RESTORE TABLE t_props TO VERSION AS OF 0")
    assert(props("t_props").keySet === Set("owner", "comment", "tier"),
      "properties are table-level: row-replacing verbs must not touch them")
    // unset removes exactly the named key; absent key refuses by name
    GraftSql.sql(spark, "ALTER TABLE t_props UNSET TBLPROPERTIES ('owner')")
    assert(props("t_props").keySet === Set("comment", "tier"))
    val absent = intercept[java.io.IOException] {
      GraftSql.sql(spark,
        "ALTER TABLE t_props UNSET TBLPROPERTIES ('owner')")
    }
    assert(absent.getMessage.contains("owner"))
    // malformed pair list refuses loudly (never silently dropped)
    val malformed = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "ALTER TABLE t_props SET TBLPROPERTIES (bare=pair)")
    }
    assert(malformed.getMessage.toLowerCase.contains("malformed"))
    // tab in a value would tear the pointer format — refused
    val tab = intercept[IllegalArgumentException] {
      VersionedParquet.setProperties(spark, root, Map("k" -> "a\tb"))
    }
    assert(tab.getMessage.contains("tab-free"))
  }

  test("VACUUM honors graft.vacuum.retainVersions; explicit RETAIN " +
    "overrides it; a malformed value refuses") {
    val root = tmp("vacprop")
    GraftTables.register("t_vacprop", root, keepVersions = 50)
    seed(root)
    GraftSql.sql(spark, "ALTER TABLE t_vacprop SET TBLPROPERTIES (" +
      "'graft.vacuum.retainVersions'='2')")
    // physical versions only (INSERT OVERWRITE): a merge-on-read
    // overlay would pin its base past the retention target, which is
    // the overlay contract, not what this test measures
    spark.range(30).selectExpr("id", "'gx' AS g", "id * 2 AS x")
      .createOrReplaceTempView("vac_src")
    (1 to 4).foreach { i =>
      GraftSql.sql(spark,
        s"INSERT OVERWRITE t_vacprop SELECT id, g, x + $i AS x FROM vac_src")
    }
    GraftSql.sql(spark, "VACUUM t_vacprop")
    assert(GraftSql.sql(spark, "DESCRIBE HISTORY t_vacprop").count() === 2L,
      "bare VACUUM must use the property retention")
    GraftSql.sql(spark,
      "INSERT OVERWRITE t_vacprop SELECT id, g, x + 9 AS x FROM vac_src")
    GraftSql.sql(spark, "VACUUM t_vacprop RETAIN 1 VERSIONS")
    assert(GraftSql.sql(spark, "DESCRIBE HISTORY t_vacprop").count() === 1L,
      "an explicit RETAIN clause overrides the property")
    GraftSql.sql(spark, "ALTER TABLE t_vacprop SET TBLPROPERTIES (" +
      "'graft.vacuum.retainVersions'='zero')")
    val bad = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "VACUUM t_vacprop")
    }
    assert(bad.getMessage.contains("graft.vacuum.retainVersions"))
  }

  test("SHOW PARTITIONS: snapshot-listing answer, escaping round trip, " +
    "MoR fallback reflects live rows, unpartitioned refusal") {
    import spark.implicits._
    val root = tmp("parts")
    GraftTables.register("t_parts", root, keepVersions = 50)
    // a partition value carrying a colon exercises the %XX escaping
    // round trip (Spark escapes ':' in partition dir names)
    VersionedParquet.publish(
      (0L until 40L).map(i =>
        (i, if (i % 3 == 0) "a:b" else s"p${i % 3}", i))
        .toDF("id", "part_key", "x"),
      root, partitionCols = Seq("part_key"), keepVersions = 50)
    assert(GraftSql.sql(spark, "SHOW PARTITIONS t_parts")
      .collect().map(_.getString(0)).toSeq ===
      Seq("part_key=a:b", "part_key=p1", "part_key=p2"))
    // MoR delete empties one partition: the fallback must reflect
    // LIVE rows, not the base snapshot's stale directory
    VersionedParquet.delete(spark, root,
      org.apache.spark.sql.functions.col("part_key") === "p1",
      keepVersions = 50)
    assert(GraftSql.sql(spark, "SHOW PARTITIONS t_parts")
      .collect().map(_.getString(0)).toSeq ===
      Seq("part_key=a:b", "part_key=p2"),
      "a merge-on-read snapshot must serve live partitions, not dirs")
    val flatRoot = tmp("flat")
    GraftTables.register("t_flatparts", flatRoot, keepVersions = 5)
    seed(flatRoot, 10L)
    val refused = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "SHOW PARTITIONS t_flatparts")
    }
    assert(refused.getMessage.contains("not a partitioned table"))
  }

  test("SHOW CREATE TABLE: DDL reconstructed from the table's markers " +
    "— identity annotation, generated column, constraint, layout, " +
    "properties") {
    import spark.implicits._
    val root = tmp("ddl")
    GraftTables.register("t_ddl", root, keepVersions = 50)
    VersionedParquet.publish(
      Seq.empty[(Long, String)].toDF("x", "part_key"),
      root, partitionCols = Seq("part_key"), keepVersions = 50)
    GraftSql.sql(spark, "ALTER TABLE t_ddl ADD COLUMN rid BIGINT " +
      "GENERATED ALWAYS AS IDENTITY")
    GraftSql.sql(spark, "ALTER TABLE t_ddl ADD CONSTRAINT x_nonneg " +
      "CHECK (x >= 0)")
    GraftSql.sql(spark,
      "ALTER TABLE t_ddl SET TBLPROPERTIES ('owner'='me')")
    val ddl = GraftSql.sql(spark, "SHOW CREATE TABLE t_ddl")
      .head().getString(1)
    assert(ddl.contains("x BIGINT"), ddl)
    assert(ddl.contains("rid BIGINT GENERATED ALWAYS AS IDENTITY"), ddl)
    assert(ddl.contains("CONSTRAINT x_nonneg CHECK (x >= 0)"), ddl)
    assert(ddl.contains("PARTITIONED BY (part_key)"), ddl)
    assert(ddl.contains("TBLPROPERTIES ('owner'='me')"), ddl)
    assert(!ddl.contains(root),
      "LOCATION is environment, not schema — omitted by design")
  }

  test("views: query-time re-resolution, view-on-view, OR REPLACE, " +
    "duplicate/self/cycle refusals, DROP VIEW") {
    val root = tmp("views")
    GraftTables.register("t_vw", root, keepVersions = 50)
    seed(root)
    GraftSql.sql(spark, "CREATE OR REPLACE VIEW vw_even AS " +
      "SELECT id, x FROM t_vw WHERE id % 2 = 0")
    GraftSql.sql(spark, "CREATE OR REPLACE VIEW vw_sum AS " +
      "SELECT CAST(sum(x) AS BIGINT) AS s FROM vw_even")
    val before = GraftSql.sql(spark, "SELECT s FROM vw_sum")
      .head().getLong(0)
    // the base table changes AFTER both views exist: the stack must
    // serve the post-update data (definition text, not frozen plan)
    GraftSql.sql(spark, "UPDATE t_vw SET x = x + 1 WHERE id % 2 = 0")
    val after = GraftSql.sql(spark, "SELECT s FROM vw_sum")
      .head().getLong(0)
    assert(after === before + 30L,
      "a view must re-resolve against the current table version")
    // duplicate without OR REPLACE refuses; with it, replaces
    val dup = intercept[IllegalStateException] {
      GraftSql.sql(spark, "CREATE VIEW vw_even AS SELECT 1 AS one")
    }
    assert(dup.getMessage.contains("already exists"))
    // self-reference refuses at create
    val self = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "CREATE OR REPLACE VIEW vw_self AS " +
        "SELECT * FROM vw_self")
    }
    assert(self.getMessage.contains("references the view itself"))
    // a cycle minted via OR REPLACE refuses loudly at read
    GraftSql.sql(spark, "CREATE OR REPLACE VIEW vw_a AS " +
      "SELECT id FROM t_vw")
    GraftSql.sql(spark, "CREATE OR REPLACE VIEW vw_b AS " +
      "SELECT id FROM vw_a")
    GraftSql.sql(spark, "CREATE OR REPLACE VIEW vw_a AS " +
      "SELECT id FROM vw_b")
    val cyc = intercept[IllegalStateException] {
      GraftSql.sql(spark, "SELECT count(*) FROM vw_a").collect()
    }
    assert(cyc.getMessage.contains("view cycle"))
    // view name colliding with a registered table refuses
    val clash = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "CREATE VIEW t_vw AS SELECT 1 AS one")
    }
    assert(clash.getMessage.contains("registered TABLE"))
    // DROP removes it from SHOW VIEWS and from resolution
    GraftSql.sql(spark, "DROP VIEW vw_sum")
    assert(GraftSql.sql(spark, "SHOW VIEWS")
      .collect().map(_.getString(0)).forall(_ != "vw_sum"))
    GraftViews.remove("vw_a"); GraftViews.remove("vw_b")
    GraftViews.remove("vw_even")
  }

  test("injected parser: the catalog verbs run through plain " +
    "spark.sql — properties, partitions, DDL, views") {
    import org.apache.spark.sql.functions.col
    val root = tmp("extcat")
    GraftTables.register("t_extcat", root, keepVersions = 50)
    import spark.implicits._
    VersionedParquet.publish(
      (0L until 20L).map(i => (i, s"p${i % 2}", i * 10))
        .toDF("id", "part_key", "x"),
      root, partitionCols = Seq("part_key"), keepVersions = 50)
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .withExtensions(new graft.plans.GraftExtensions())
      .getOrCreate()
    try {
      ext.sql("ALTER TABLE t_extcat SET TBLPROPERTIES ('owner'='ext')")
      assert(ext.sql("SHOW TBLPROPERTIES t_extcat").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq ===
        Seq(("owner", "ext")))
      assert(ext.sql("SHOW PARTITIONS t_extcat").collect()
        .map(_.getString(0)).toSeq ===
        Seq("part_key=p0", "part_key=p1"))
      assert(ext.sql("SHOW CREATE TABLE t_extcat").head().getString(1)
        .contains("PARTITIONED BY (part_key)"))
      // views through the injected parser: create returns the typed
      // row, SELECT resolves through the parse-time materialization
      val created = ext.sql("CREATE OR REPLACE VIEW vw_extcat AS " +
        "SELECT part_key, CAST(sum(x) AS BIGINT) AS s " +
        "FROM t_extcat GROUP BY part_key").head()
      assert(created.getString(0) === "vw_extcat" &&
        created.getInt(1) === 2)
      assert(ext.sql(
        "SELECT s FROM vw_extcat WHERE part_key = 'p0' ").head()
        .getLong(0) === (0L until 20L by 2).map(_ * 10).sum)
      // the view re-resolves after a DML on the base table
      ext.sql("UPDATE t_extcat SET x = x + 1 WHERE part_key = 'p0'")
      assert(ext.sql(
        "SELECT s FROM vw_extcat WHERE part_key = 'p0' ").head()
        .getLong(0) === (0L until 20L by 2).map(_ * 10).sum + 10L)
      assert(ext.sql("SHOW VIEWS").collect().map(_.getString(0))
        .contains("vw_extcat"))
      val dropped = ext.sql("DROP VIEW vw_extcat").head()
      assert(dropped.getString(0) === "vw_extcat")
    } finally {
      GraftViews.remove("vw_extcat")
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("a view over a policy-bearing table serves the MASKED read — " +
    "the view path is a query surface, policies apply") {
    import spark.implicits._
    val root = tmp("vwpol")
    GraftTables.register("t_vwpol", root, keepVersions = 50)
    seed(root)
    GraftSql.sql(spark, "ALTER TABLE t_vwpol ALTER COLUMN g " +
      "SET MASK (CASE WHEN id % 2 = 0 THEN g ELSE 'masked' END)")
    GraftSql.sql(spark, "CREATE OR REPLACE VIEW vw_pol AS " +
      "SELECT g FROM t_vwpol WHERE id < 4")
    val got = GraftSql.sql(spark,
      "SELECT g FROM vw_pol ORDER BY g").collect().map(_.getString(0))
    assert(got.count(_ == "masked") === 2,
      s"odd ids must read masked through the view: ${got.toSeq}")
    GraftViews.remove("vw_pol")
  }
}
