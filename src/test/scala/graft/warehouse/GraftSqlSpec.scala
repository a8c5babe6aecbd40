package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-text DML contract: the four verbs parse iff they target a
  * registered versioned table, route to the SAME writes as the Scala
  * API (twin-table equivalence), and — on a session built with the
  * GraftExtensions parser — execute through plain `spark.sql(...)`.
  */
class GraftSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-sql-$tag")
      .toString + "/t"

  private def seed(root: String): Unit = {
    import spark.implicits._
    VersionedParquet.publish(
      (0L until 100L).map(i => (i, s"g${i % 3}", i * 10))
        .toDF("id", "g", "x"), root, keepVersions = 50)
  }

  private def rows(root: String): Set[(Long, String, Long)] =
    VersionedParquet.read(spark, root).select("id", "g", "x")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet

  test("parse: all four verbs recognized on registered tables only") {
    val root = tmp("parse")
    GraftTables.register("t_parse", root)
    try {
      assert(GraftSql.parseDml("UPDATE t_parse SET x = x + 1 WHERE g = 'g0'")
        === Some(SqlUpdate("t_parse", Seq("x" -> "x + 1"), Some("g = 'g0'"))))
      assert(GraftSql.parseDml("UPDATE t_parse SET x = 5, g = upper(g)")
        === Some(SqlUpdate("t_parse",
          Seq("x" -> "5", "g" -> "upper(g)"), None)))
      assert(GraftSql.parseDml("DELETE FROM t_parse WHERE x < 0")
        === Some(SqlDelete("t_parse", "x < 0")))
      assert(GraftSql.parseDml(
        "INSERT INTO t_parse SELECT id, g, x FROM somewhere")
        === Some(SqlInsert("t_parse", "SELECT id, g, x FROM somewhere")))
      assert(GraftSql.parseDml(
        """MERGE INTO t_parse t USING (SELECT * FROM batch) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        === Some(SqlMerge("t_parse", "SELECT * FROM batch",
          Seq("id"), isDelete = false)))
      assert(GraftSql.parseDml(
        "MERGE INTO t_parse USING (SELECT * FROM d) ON id = id " +
          "WHEN MATCHED THEN DELETE")
        === Some(SqlMerge("t_parse", "SELECT * FROM d",
          Seq("id"), isDelete = true)))
      // the full-sync form: trailing BY SOURCE DELETE
      assert(GraftSql.parseDml(
        """MERGE INTO t_parse t USING (SELECT * FROM batch) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
        === Some(SqlMerge("t_parse", "SELECT * FROM batch",
          Seq("id"), isDelete = false, bySourceDelete = true)))
      // matched-DELETE + BY SOURCE DELETE deletes everything: refuse
      val eAll = intercept[IllegalArgumentException](GraftSql.parseDml(
        "MERGE INTO t_parse USING (SELECT * FROM d) ON id = id " +
          "WHEN MATCHED THEN DELETE " +
          "WHEN NOT MATCHED BY SOURCE THEN DELETE"))
      assert(eAll.getMessage.contains("TRUNCATE"))
      // nested commas/parens in assignments split correctly
      assert(GraftSql.splitAssignments(
        "x = coalesce(a, b), g = concat(g, ',x')")
        === Seq("x" -> "coalesce(a, b)", "g" -> "concat(g, ',x')"))
      // unregistered target → not ours (falls through to Spark)
      assert(GraftSql.parseDml("UPDATE nobody SET x = 1").isEmpty)
      // a merge whose ON clause is not a same-name key equality declines
      assert(GraftSql.parseDml(
        "MERGE INTO t_parse USING (SELECT 1) ON t.id = s.other " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *").isEmpty)
      // maintenance verbs
      assert(GraftSql.parseDml("OPTIMIZE t_parse")
        === Some(SqlOptimize("t_parse")))
      assert(GraftSql.parseDml("VACUUM t_parse RETAIN 5 VERSIONS")
        === Some(SqlVacuum("t_parse", Some(5))))
      assert(GraftSql.parseDml("VACUUM t_parse")
        === Some(SqlVacuum("t_parse", None)))
      // plain queries are never intercepted
      assert(GraftSql.parseDml("SELECT * FROM t_parse").isEmpty)
    } finally GraftTables.clear()
  }

  test("OPTIMIZE and VACUUM as SQL maintain the table") {
    import spark.implicits._
    val root = tmp("maint")
    seed(root)
    GraftTables.register("t_maint", root, keepVersions = 50)
    try {
      (1 to 3).foreach { b =>
        GraftSql.sql(spark,
          s"INSERT INTO t_maint SELECT ${9000 + b}L AS id, 'gi' AS g, " +
            s"${b}L AS x")
      }
      val before = rows(root)
      GraftSql.sql(spark, "OPTIMIZE t_maint")
      // compacted: the live version is physical, content unchanged
      val live = VersionedParquet.currentVersion(spark, root).get
      assert(VersionedParquet.snapshotMarker(spark, root, "_BASE",
        Some(live)).isEmpty, "OPTIMIZE must materialize")
      assert(rows(root) === before)
      GraftSql.sql(spark, "VACUUM t_maint RETAIN 2 VERSIONS")
      // retention window is 2; the retained MoR version's referenced
      // base survives by reference protection (a vacuum contract, not
      // a leak), so at most 3 directories remain
      assert(VersionedParquet.versions(spark, root).length <= 3)
      assert(rows(root) === before)
    } finally GraftTables.clear()
  }

  test("twin tables: every SQL verb lands the same state as the Scala API") {
    import spark.implicits._
    val viaSql = tmp("via-sql"); val viaApi = tmp("via-api")
    seed(viaSql); seed(viaApi)
    GraftTables.register("t_twin", viaSql, keepVersions = 50)
    try {
      // UPDATE
      GraftSql.sql(spark, "UPDATE t_twin SET x = x + 1000 WHERE g = 'g1'")
      VersionedParquet.updateWhere(spark, viaApi, col("g") === "g1",
        Map("x" -> (col("x") + 1000)), keepVersions = 50)
      assert(rows(viaSql) === rows(viaApi), "UPDATE diverged")
      // DELETE
      GraftSql.sql(spark, "DELETE FROM t_twin WHERE x % 7 = 0 AND g = 'g0'")
      VersionedParquet.delete(spark, viaApi,
        col("x") % 7 === 0 && col("g") === "g0", keepVersions = 50)
      assert(rows(viaSql) === rows(viaApi), "DELETE diverged")
      // INSERT INTO (from a SQL source)
      spark.range(5).selectExpr("id + 500 AS id", "'gx' AS g",
        "id AS x").createOrReplaceTempView("ins_batch")
      GraftSql.sql(spark, "INSERT INTO t_twin SELECT * FROM ins_batch")
      VersionedParquet.append(spark, viaApi, spark.table("ins_batch"),
        keepVersions = 50)
      assert(rows(viaSql) === rows(viaApi), "INSERT diverged")
      // MERGE (upsert shape)
      Seq((3L, "gm", -3L), (777L, "gm", 7L)).toDF("id", "g", "x")
        .createOrReplaceTempView("merge_batch")
      GraftSql.sql(spark,
        """MERGE INTO t_twin t USING (SELECT * FROM merge_batch) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      VersionedParquet.upsert(spark, viaApi, spark.table("merge_batch"),
        Seq("id"), keepVersions = 50)
      assert(rows(viaSql) === rows(viaApi), "MERGE diverged")
      // MERGE (delete shape)
      Seq(Tuple1(777L)).toDF("id").createOrReplaceTempView("del_keys")
      GraftSql.sql(spark,
        "MERGE INTO t_twin USING (SELECT id FROM del_keys) ON id = id " +
          "WHEN MATCHED THEN DELETE")
      VersionedParquet.merge(spark, viaApi,
        VersionedParquet.read(spark, viaApi).limit(0),
        spark.table("del_keys"), Seq("id"), keepVersions = 50)
      assert(rows(viaSql) === rows(viaApi), "MERGE DELETE diverged")
      // both histories advanced in lockstep and the SQL table's feed
      // replays (writes share the Scala path, so this is one spot-check)
      assert(VersionedParquet.currentVersion(spark, viaSql) ===
        VersionedParquet.currentVersion(spark, viaApi))
      val feed = VersionedParquet.changes(spark, viaSql, 0L, 5L)
      assert(feed.filter(col("_change_type") === "insert").count() >= 6L)
    } finally GraftTables.clear()
  }

  test("injected parser: plain spark.sql drives the lakehouse end-to-end") {
    val root = tmp("ext")
    seed(root)
    GraftTables.register("t_ext", root, keepVersions = 50)
    // a session built WITH the extension (the cluster-config path):
    // same SparkContext, fresh session state, GraftSqlParser installed
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions is the programmatic twin of the
    // `spark.sql.extensions=graft.plans.GraftExtensions` cluster conf
    // (a static conf, so it can only apply at SparkContext creation —
    // this test shares the suite's context)
    val extSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .withExtensions(new graft.plans.GraftExtensions())
      .getOrCreate()
    try {
      assert(extSession ne prev, "extension session must be fresh")
      extSession.sql("UPDATE t_ext SET x = 0 WHERE id < 10")
      extSession.sql("DELETE FROM t_ext WHERE id = 99")
      val after = VersionedParquet.read(extSession, root)
      assert(after.filter(col("id") < 10 && col("x") =!= 0).count() === 0L)
      assert(after.filter(col("id") === 99).count() === 0L)
      assert(after.count() === 99L)
      // non-DML statements still parse through Spark untouched
      assert(extSession.sql("SELECT 1 + 1 AS two").head().getInt(0) === 2)
      assert(VersionedParquet.currentVersion(extSession, root)
        === Some(2L))
      // DESCRIBE verbs return ROWS through the injected parser
      val hist = extSession.sql("DESCRIBE HISTORY t_ext")
      assert(hist.columns.toSeq ===
        Seq("version", "commit_millis", "domain"))
      assert(hist.select("version").as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect().sorted
        === Array(0L, 1L, 2L))
      val det = extSession.sql("DESCRIBE DETAIL t_ext").head()
      assert(det.getAs[Long]("version") === 2L)
      assert(det.getAs[Long]("num_versions") === 3L)
      assert(det.getAs[String]("location") === root)
    } finally {
      GraftTables.clear()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("GENERATE MANIFEST and EXPORT TO DELTA as SQL: frames back, foreign reads agree") {
    val root = tmp("interop"); seed(root)
    GraftTables.register("t_interop", root, keepVersions = 50)
    try {
      // leave MoR state so GENERATE must materialize
      GraftSql.sql(spark, "UPDATE t_interop SET x = x + 1 WHERE id % 10 = 0")
      val m = GraftSql.sql(spark, "GENERATE MANIFEST FOR TABLE t_interop")
        .head()
      assert(m.schema.fieldNames.toSeq ===
        Seq("manifest_path", "n_files", "version"))
      val files = VersionedParquet.readManifest(spark, m.getString(0))
      assert(files.size.toLong === m.getLong(1) && files.nonEmpty)
      val viaManifest = spark.read.parquet(files: _*)
        .agg(sum("x")).head().getLong(0)
      val delta = java.nio.file.Files
        .createTempDirectory("graft-sql-delta").toString + "/d"
      val x = GraftSql.sql(spark,
        s"EXPORT TABLE t_interop TO DELTA LOCATION '$delta'").head()
      assert(x.getString(0) === delta && x.getLong(1) === 0L)
      val viaDelta = graft.sources.DeltaLite.read(spark, delta)
        .agg(sum("x")).head().getLong(0)
      val live = VersionedParquet.read(spark, root)
        .agg(sum("x")).head().getLong(0)
      assert(viaManifest === live && viaDelta === live)
    } finally GraftTables.unregister("t_interop")
  }

  test("SQL transaction: statement batch commits atomically, run-time failure rolls back") {
    val a = tmp("txn-a"); val b = tmp("txn-b")
    seed(a); seed(b)
    GraftTables.register("t_txn_a", a, keepVersions = 50)
    GraftTables.register("t_txn_b", b, keepVersions = 50)
    try {
      GraftSql.transaction(spark, Seq(
        "DELETE FROM t_txn_a WHERE id < 10",
        "UPDATE t_txn_b SET x = x + 1 WHERE id < 5"))
      assert(VersionedParquet.read(spark, a).count() === 90L)
      assert(VersionedParquet.read(spark, b)
        .filter(col("id") < 5 && col("x") % 10 =!= 1).count() === 0L)
      val vA = VersionedParquet.currentVersion(spark, a).get
      // run-time failure in statement 2 → statement 1's delete revoked
      intercept[Txn.TxnAbortedException] {
        GraftSql.transaction(spark, Seq(
          "DELETE FROM t_txn_a WHERE id < 50",
          "UPDATE t_txn_b SET x = no_such_col + 1"))
      }
      assert(VersionedParquet.currentVersion(spark, a).get === vA)
      assert(VersionedParquet.read(spark, a).count() === 90L)
      // parse failure aborts BEFORE any intent/side effect
      intercept[IllegalArgumentException] {
        GraftSql.transaction(spark, Seq(
          "DELETE FROM t_txn_a WHERE id < 50",
          "COMPLETELY NOT SQL"))
      }
      assert(VersionedParquet.read(spark, a).count() === 90L)
      // DDL rejected: it cannot roll back
      intercept[IllegalArgumentException] {
        GraftSql.transaction(spark, Seq(
          "ALTER TABLE t_txn_a DROP COLUMN g"))
      }
    } finally {
      GraftTables.unregister("t_txn_a")
      GraftTables.unregister("t_txn_b")
    }
  }

  test("governance + branch verbs: SET/DROP ROW FILTER and MASK, " +
      "CREATE/FAST FORWARD/DROP BRANCH as SQL text") {
    import spark.implicits._
    val root = tmp("gov")
    seed(root)
    GraftTables.register("t_gov", root)
    try {
      // WAP as SQL: branch registers as t_gov_branch_fix, plain DML
      // drives it, FAST FORWARD publishes and retires the identifier
      GraftSql.sql(spark, "ALTER TABLE t_gov CREATE BRANCH fix")
      assert(GraftTables.rootOf("t_gov_branch_fix").isDefined)
      GraftSql.sql(spark, "INSERT INTO t_gov_branch_fix " +
        "SELECT 1000 AS id, 'gX' AS g, -5 AS x")
      GraftSql.sql(spark, "DELETE FROM t_gov_branch_fix WHERE x < 0")
      assert(rows(root).size === 100, "main isolated until publish")
      GraftSql.sql(spark, "ALTER TABLE t_gov FAST FORWARD BRANCH fix")
      assert(GraftTables.rootOf("t_gov_branch_fix").isEmpty)
      assert(VersionedParquet.currentVersion(spark, root).get === 1L)
      assert(rows(root).size === 100, "repaired row deleted on branch")
      // governance as SQL: filter + mask enforce through the source
      GraftSql.sql(spark, "ALTER TABLE t_gov SET ROW FILTER (id % 2 = 0)")
      GraftSql.sql(spark,
        "ALTER TABLE t_gov ALTER COLUMN x SET MASK (x % 7)")
      val served = spark.read.format("graft").option("path", root).load()
      assert(served.count() === 50L)
      assert(served.select(max(col("x"))).as[Long].head() < 7L)
      GraftSql.sql(spark, "ALTER TABLE t_gov ALTER COLUMN x DROP MASK")
      GraftSql.sql(spark, "ALTER TABLE t_gov DROP ROW FILTER")
      assert(spark.read.format("graft").option("path", root).load()
        .count() === 100L)
      // a second branch abandoned via DROP BRANCH
      GraftSql.sql(spark, "ALTER TABLE t_gov CREATE BRANCH dead")
      val br = GraftSql.sql(spark, "DESCRIBE BRANCHES t_gov").collect()
      assert(br.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq === Seq(("dead", 1L, 0L)))
      GraftSql.sql(spark, "ALTER TABLE t_gov DROP BRANCH dead")
      assert(GraftSql.sql(spark, "DESCRIBE BRANCHES t_gov").isEmpty)
      assert(!Branch.exists(spark, root, "dead"))
      assert(GraftTables.rootOf("t_gov_branch_dead").isEmpty)
      // ANALYZE … MAINTAIN STATISTICS as SQL: full then incremental
      GraftSql.sql(spark, "ANALYZE TABLE t_gov COMPUTE STATISTICS")
      GraftSql.sql(spark,
        "INSERT INTO t_gov SELECT 2000 AS id, 'gZ' AS g, 9 AS x")
      val maint = GraftSql.sql(spark,
        "ANALYZE TABLE t_gov MAINTAIN STATISTICS")
      assert(maint.select("path").distinct().collect()
        .map(_.getString(0)).toSeq === Seq("incremental"))
      assert(maint.filter(col("colname") === "id")
        .head().getLong(1) === 101L)
    } finally {
      GraftTables.unregister("t_gov")
      GraftTables.unregister("t_gov_branch_fix")
      GraftTables.unregister("t_gov_branch_dead")
    }
  }

  test("inline time travel: FOR VERSION AS OF / FOR TIMESTAMP AS OF on SELECTs") {
    val root = tmp("tt")
    seed(root) // v0: 100 rows
    GraftTables.register("t_tt", root, keepVersions = 50)
    try {
      VersionedParquet.delete(spark, root, col("id") >= 50L,
        keepVersions = 50) // v1: 50 rows
      // versions pin without any temp-view step, through both clauses,
      // in the same statement — and mix with live reads
      val n0 = GraftSql.sql(spark,
        "SELECT count(*) AS n FROM t_tt FOR VERSION AS OF 0")
        .head().getLong(0)
      val n1 = GraftSql.sql(spark,
        "SELECT count(*) AS n FROM t_tt FOR VERSION AS OF 1")
        .head().getLong(0)
      assert(n0 === 100L && n1 === 50L)
      // timestamp pin: the v0 commit stamp (from the history view)
      val hist = spark.read.format("graft")
        .option("path", root).option("history", "true").load()
        .collect().map(r => r.getAs[Long]("version") ->
          r.getAs[Long]("commit_millis")).toMap
      val nT = GraftSql.sql(spark,
        s"SELECT count(*) AS n FROM t_tt FOR TIMESTAMP AS OF '${hist(0L)}'")
        .head().getLong(0)
      assert(nT === 100L)
      // two pins of the SAME table join in one statement (version diff)
      val joined = GraftSql.sql(spark,
        """SELECT count(*) AS gone FROM t_tt FOR VERSION AS OF 0 v0
          |LEFT ANTI JOIN t_tt FOR VERSION AS OF 1 live
          |ON v0.id = live.id""".stripMargin)
      assert(joined.head().getLong(0) === 50L)
      // registered-table miss: text mentioning an unregistered name
      // passes through untouched and fails in Spark's analyzer
      intercept[Exception] {
        GraftSql.sql(spark,
          "SELECT * FROM not_registered FOR VERSION AS OF 0").collect()
      }
      // out-of-range pin fails loudly at issue time
      intercept[Exception] {
        GraftSql.sql(spark,
          "SELECT * FROM t_tt FOR VERSION AS OF 99").collect()
      }
      // the injected parser accepts the same idiom through plain
      // spark.sql — the thrift/notebook path
      val prev = spark
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val extSession = SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      try {
        assert(extSession.sql(
          "SELECT count(*) AS n FROM t_tt FOR VERSION AS OF 0")
          .head().getLong(0) === 100L)
      } finally {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        SparkSession.setDefaultSession(prev)
        SparkSession.setActiveSession(prev)
      }
    } finally GraftTables.unregister("t_tt")
  }

  test("a declared unique key routes SQL UPDATE/DELETE through the " +
    "optimistic path (DmlDomain commits), same results") {
    val root = tmp("keyed")
    seed(root) // ids 0..99
    GraftTables.register("t_keyed", root, keepVersions = 20,
      keyCols = Seq("id"))
    try {
      GraftSql.sql(spark,
        "UPDATE t_keyed SET x = x + 5 WHERE id < 10")
      GraftSql.sql(spark, "DELETE FROM t_keyed WHERE id >= 90")
      val live = VersionedParquet.read(spark, root)
      assert(live.count() === 90L)
      assert(live.filter(col("id") < 10L)
        .agg(sum("x")).head().getLong(0) ===
        (0L until 10L).map(_ * 10 + 5).sum)
      // the commits really took the optimistic path: their domain
      // markers carry the predicate-DML encoding, not whole-table
      val domains = (1L to 2L).map(v =>
        VersionedParquet.readPointer(spark,
          new org.apache.hadoop.fs.Path(
            new org.apache.hadoop.fs.Path(root,
              VersionedParquet.versionName(v)), "_DOMAIN")))
      assert(domains.forall(_.exists(_.startsWith("dml:"))),
        s"keyed SQL DML must commit DmlDomain markers, got $domains")
      // without declared keys the single-writer path still serves
      // (no domain marker = whole-table commit)
      GraftTables.register("t_keyed", root, keepVersions = 20)
      GraftSql.sql(spark, "DELETE FROM t_keyed WHERE id = 0")
      assert(VersionedParquet.read(spark, root).count() === 89L)
      assert(VersionedParquet.readPointer(spark,
        new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(root,
            VersionedParquet.versionName(3L)), "_DOMAIN")).isEmpty)
    } finally GraftTables.unregister("t_keyed")
  }

  test("inline time travel never rewrites string literals or " +
    "comments, and pin views live in a reserved namespace") {
    val root = tmp("ttm")
    seed(root) // v0: 100 rows
    GraftTables.register("t_ttm", root, keepVersions = 50)
    try {
      // literal mention of the idiom is DATA, not a clause: the text
      // must survive byte-for-byte into the result
      val lit0 = GraftSql.sql(spark,
        "SELECT 't_ttm FOR VERSION AS OF 0' AS s").head().getString(0)
      assert(lit0 === "t_ttm FOR VERSION AS OF 0")
      // '' escape inside the literal doesn't end the mask early
      val lit1 = GraftSql.sql(spark,
        "SELECT 'it''s t_ttm FOR VERSION AS OF 0' AS s")
        .head().getString(0)
      assert(lit1 === "it's t_ttm FOR VERSION AS OF 0")
      // commented-out clauses don't rewrite (or create views) either:
      // version 7 doesn't exist, so if either comment WERE rewritten
      // the pin would fail loudly at issue time — the statement only
      // succeeds because comments are masked
      val n = GraftSql.sql(spark,
        """SELECT count(*) AS n -- not t_ttm FOR VERSION AS OF 7
          |FROM t_ttm FOR VERSION AS OF 0 /* nor t_ttm FOR VERSION AS OF 7 */
          |""".stripMargin).head().getLong(0)
      assert(n === 100L)
      // a REAL pin in the same statement as a literal mention: the
      // clause rewrites, the literal doesn't
      val row = GraftSql.sql(spark,
        "SELECT count(*) AS n, 't_ttm FOR VERSION AS OF 7' AS s " +
          "FROM t_ttm FOR VERSION AS OF 0").head()
      assert(row.getLong(0) === 100L &&
        row.getString(1) === "t_ttm FOR VERSION AS OF 7")
      // the generated pin view sits in the reserved graft_tt__
      // namespace — a user temp view named t_ttm__v0 (the old
      // generated shape) is never clobbered
      spark.range(3).toDF("id").createOrReplaceTempView("t_ttm__v0")
      GraftSql.sql(spark,
        "SELECT count(*) AS n FROM t_ttm FOR VERSION AS OF 0").collect()
      assert(spark.table("t_ttm__v0").count() === 3L)
      assert(spark.catalog.tableExists("graft_tt__t_ttm__v0"))
      spark.catalog.dropTempView("t_ttm__v0")
    } finally GraftTables.unregister("t_ttm")
  }

  test("EXPORT TO ICEBERG as SQL: frame back, foreign read agrees, " +
    "policy refusal") {
    val root = tmp("xi")
    seed(root)
    GraftTables.register("t_xi", root, keepVersions = 50)
    try {
      val loc = java.nio.file.Files
        .createTempDirectory("graft-sql-xi-out").toString + "/ice"
      val out = GraftSql.sql(spark,
        s"EXPORT TABLE t_xi TO ICEBERG LOCATION '$loc'").head()
      assert(out.getAs[String]("location") === loc)
      val snapId = out.getAs[Long]("snapshot_id")
      // the way a FOREIGN engine reads it: the protocol walk
      val foreign = graft.sources.IcebergLite.read(spark, loc)
      assert(foreign.count() === 100L)
      // a second export adds a snapshot that REPLACES the live state
      // (prior files land status=2): a foreign reader of the current
      // snapshot sees exactly the post-delete table — no duplicated
      // rows, no resurrected deletes — matching EXPORT TO DELTA. The
      // first snapshot stays pinnable at its full 100 rows.
      GraftSql.sql(spark, "DELETE FROM t_xi WHERE id >= 50")
      GraftSql.sql(spark,
        s"EXPORT TABLE t_xi TO ICEBERG LOCATION '$loc'")
      assert(graft.sources.IcebergLite
        .read(spark, loc, Some(snapId)).count() === 100L)
      assert(graft.sources.IcebergLite.read(spark, loc).count() === 50L)
      assert(graft.sources.IcebergLite
        .snapshotIds(spark, loc).length === 2)
      // governance: a policy-bearing table refuses the export
      VersionedParquet.setRowFilter(spark, root, "id % 2 = 0")
      val e = intercept[Exception] {
        GraftSql.sql(spark,
          s"EXPORT TABLE t_xi TO ICEBERG LOCATION '${loc}2'")
      }
      assert(e.getMessage.contains("ICEBERG"))
      VersionedParquet.dropRowFilter(spark, root)
    } finally GraftTables.unregister("t_xi")
  }

  test("retention verbs: EXPIRE ICEBERG / CHECKPOINT + VACUUM DELTA " +
    "drive the export lifecycle from SQL alone, typed result rows, " +
    "live views untouched") {
    val root = tmp("ret")
    seed(root)
    GraftTables.register("t_ret", root, keepVersions = 50)
    try {
      val ice = java.nio.file.Files
        .createTempDirectory("graft-sql-ret-ice").toString + "/ice"
      val del = java.nio.file.Files
        .createTempDirectory("graft-sql-ret-del").toString + "/del"
      // two export snapshots each side
      GraftSql.sql(spark, s"EXPORT TABLE t_ret TO ICEBERG LOCATION '$ice'")
      GraftSql.sql(spark, s"EXPORT TABLE t_ret TO DELTA LOCATION '$del'")
      GraftSql.sql(spark, "DELETE FROM t_ret WHERE id >= 50")
      GraftSql.sql(spark, s"EXPORT TABLE t_ret TO ICEBERG LOCATION '$ice'")
      GraftSql.sql(spark, s"EXPORT TABLE t_ret TO DELTA LOCATION '$del'")
      // Iceberg expiry through the verb: one snapshot expires, its
      // now-orphaned file sweeps, live view intact
      val er = GraftSql.sql(spark,
        s"EXPIRE ICEBERG LOCATION '$ice' KEEP 1").head()
      assert(er.getAs[Long]("n_expired") === 1L)
      assert(er.getAs[Long]("n_snapshots") === 1L)
      assert(er.getAs[Long]("n_files_deleted") >= 1L)
      assert(graft.sources.IcebergLite.read(spark, ice).count() === 50L)
      // Delta: checkpoint then vacuum through the verbs
      val cr = GraftSql.sql(spark,
        s"CHECKPOINT DELTA LOCATION '$del'").head()
      assert(cr.getAs[Long]("checkpoint_version") === 1L)
      val vr = GraftSql.sql(spark,
        s"VACUUM DELTA LOCATION '$del'").head()
      assert(vr.getAs[Long]("n_files_deleted") >= 1L)
      assert(vr.getAs[Long]("n_commits_truncated") === 2L)
      assert(graft.sources.DeltaLite.read(spark, del).count() === 50L)
      // vacuum without a checkpoint refuses by name (fresh export)
      val del2 = java.nio.file.Files
        .createTempDirectory("graft-sql-ret-del2").toString + "/d2"
      GraftSql.sql(spark, s"EXPORT TABLE t_ret TO DELTA LOCATION '$del2'")
      val e = intercept[Exception](
        GraftSql.sql(spark, s"VACUUM DELTA LOCATION '$del2'"))
      assert(e.getMessage.contains("no checkpoint"))
      // PURGE DELTA: DV-delete two rows, purge rewrites the masked
      // file, and the full retention chain then runs clean
      val f2 = graft.sources.DeltaLite.snapshot(spark, del2).files.head
      graft.sources.DeltaLite.commitDeletionVectors(spark, del2,
        Map(f2 -> Array(0L, 1L)))
      val pr = GraftSql.sql(spark,
        s"PURGE DELTA LOCATION '$del2'").head()
      assert(pr.getAs[Long]("n_files_rewritten") === 1L)
      assert(pr.getAs[Long]("n_rows_purged") === 2L)
      GraftSql.sql(spark, s"CHECKPOINT DELTA LOCATION '$del2'")
      GraftSql.sql(spark, s"VACUUM DELTA LOCATION '$del2'")
      assert(graft.sources.DeltaLite.read(spark, del2).count() === 48L)
    } finally GraftTables.unregister("t_ret")
  }

  test("RESTORE TABLE as SQL: twin-table equivalence, timestamp pin, " +
    "typed row, refusals") {
    val rootSql = tmp("restore-sql")
    val rootApi = tmp("restore-api")
    seed(rootSql); seed(rootApi)
    GraftTables.register("t_restore", rootSql, keepVersions = 50)
    try {
      // identical histories on both tables: v1 update, v2 delete
      GraftSql.sql(spark, "UPDATE t_restore SET x = x + 1 WHERE id < 50")
      GraftSql.sql(spark, "DELETE FROM t_restore WHERE id % 10 = 0")
      VersionedParquet.updateWhere(spark, rootApi, col("id") < 50,
        Map("x" -> (col("x") + 1)), keepVersions = 50)
      VersionedParquet.delete(spark, rootApi, col("id") % 10 === 0,
        keepVersions = 50)
      // SQL restore vs Scala restore: same state, same version count
      val row = GraftSql.sql(spark,
        "RESTORE TABLE t_restore TO VERSION AS OF 0").head()
      assert(row.getAs[String]("table") === "t_restore")
      assert(row.getAs[Long]("restored_to") === 0L)
      assert(row.getAs[Long]("new_version") === 3L)
      VersionedParquet.restore(spark, rootApi, 0L, keepVersions = 50)
      assert(rows(rootSql) === rows(rootApi))
      assert(VersionedParquet.currentVersion(spark, rootSql) === Some(3L))
      // v1/v2 stay time-travelable after the rollback
      assert(VersionedParquet.read(spark, rootSql, Some(2L)).count()
        === 90L)
      // TIMESTAMP AS OF routes through the same resolution as the
      // time-travel read: restore to "now" = the live version = no-op
      // version bump (already at target reports live unchanged)
      val now = System.currentTimeMillis() + 60000
      val row2 = GraftSql.sql(spark,
        s"RESTORE TABLE t_restore TO TIMESTAMP AS OF '$now'").head()
      assert(row2.getAs[Long]("restored_to") === 3L)
      assert(row2.getAs[Long]("new_version") === 3L)
      // refusals: forward restore, pre-table timestamp, unregistered
      val eF = intercept[Exception](GraftSql.sql(spark,
        "RESTORE TABLE t_restore TO VERSION AS OF 99"))
      assert(eF.getMessage.contains("cannot restore"))
      val eT = intercept[Exception](GraftSql.sql(spark,
        "RESTORE TABLE t_restore TO TIMESTAMP AS OF '1999-01-01 00:00:00'"))
      assert(eT.getMessage.contains("no version committed"))
      // unregistered table is NOT ours: falls through to Spark's
      // parser and fails there, never a silent no-op
      assert(GraftSql.parseDml(
        "RESTORE TABLE nobody TO VERSION AS OF 0").isEmpty)
      // transactions keep rejecting non-whitelisted verbs
      val eTx = intercept[IllegalArgumentException](GraftSql.transaction(
        spark, Seq("RESTORE TABLE t_restore TO VERSION AS OF 0")))
      assert(eTx.getMessage.contains("only UPDATE/DELETE/INSERT"))
    } finally GraftTables.unregister("t_restore")
  }

  test("COPY INTO as SQL: incremental file-tracked loads, re-run is a " +
    "no-op, CSV uses the table schema, refusals") {
    import spark.implicits._
    val root = tmp("copy")
    val landing = java.nio.file.Files
      .createTempDirectory("graft-sql-copy-landing").toString
    GraftTables.register("t_copy", root, keepVersions = 50)
    try {
      // schema-only target
      VersionedParquet.publish(
        Seq.empty[(Long, String, Long)].toDF("id", "g", "x"), root,
        keepVersions = 50)
      (0L until 40L).map(i => (i, s"g${i % 3}", i * 10))
        .toDF("id", "g", "x").coalesce(1)
        .write.mode("overwrite").parquet(s"$landing/b1")
      val r1 = GraftSql.sql(spark,
        s"COPY INTO t_copy FROM '$landing' FILEFORMAT = parquet").head()
      assert(r1.getAs[Long]("n_files_loaded") === 1L)
      assert(r1.getAs[Long]("n_rows_inserted") === 40L)
      // re-run: provably a no-op
      val r2 = GraftSql.sql(spark,
        s"COPY INTO t_copy FROM '$landing' FILEFORMAT = parquet").head()
      assert(r2.getAs[Long]("n_files_loaded") === 0L)
      assert(r2.getAs[Long]("n_files_skipped") === 1L)
      assert(VersionedParquet.read(spark, root).count() === 40L)
      // a new arrival loads alone
      (100L until 110L).map(i => (i, "gx", i)).toDF("id", "g", "x")
        .coalesce(1).write.mode("overwrite").parquet(s"$landing/b2")
      val r3 = GraftSql.sql(spark,
        s"COPY INTO t_copy FROM '$landing' FILEFORMAT = parquet").head()
      assert(r3.getAs[Long]("n_files_loaded") === 1L)
      assert(r3.getAs[Long]("n_files_skipped") === 1L)
      assert(VersionedParquet.read(spark, root).count() === 50L)
      // CSV: explicit table schema (never inference), header honored
      val csvDir = java.nio.file.Files
        .createTempDirectory("graft-sql-copy-csv").toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(csvDir, "rows.csv"),
        "id,g,x\n200,gc,1\n201,gc,2\n".getBytes("UTF-8"))
      val r4 = GraftSql.sql(spark,
        s"COPY INTO t_copy FROM '$csvDir' FILEFORMAT = csv " +
          "FORMAT_OPTIONS ('header'='true')").head()
      assert(r4.getAs[Long]("n_rows_inserted") === 2L)
      val gc = VersionedParquet.read(spark, root)
        .filter(col("g") === "gc").select("id", "x")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gc === Set((200L, 1L), (201L, 2L)))
      // FORMAT_OPTIONS values may BE commas/parens-free specials:
      // 'sep'=',' parses (scan for pairs, never split on commas)
      assert(GraftSql.parseDml(
        s"COPY INTO t_copy FROM '$csvDir' FILEFORMAT = csv " +
          "FORMAT_OPTIONS ('header'='true', 'sep'=',')")
        === Some(SqlCopyInto("t_copy", csvDir, "csv",
          Map("header" -> "true", "sep" -> ","))))
      // malformed residue still refuses loudly
      val eOpt = intercept[IllegalArgumentException](GraftSql.parseDml(
        s"COPY INTO t_copy FROM '$csvDir' FILEFORMAT = csv " +
          "FORMAT_OPTIONS ('header'='true', junk)"))
      assert(eOpt.getMessage.contains("malformed FORMAT_OPTIONS"))
      // refusals: unknown format, missing source, unregistered table
      val eF = intercept[Exception](GraftSql.sql(spark,
        s"COPY INTO t_copy FROM '$landing' FILEFORMAT = orc"))
      assert(eF.getMessage.contains("parquet or csv"))
      val eS = intercept[Exception](GraftSql.sql(spark,
        s"COPY INTO t_copy FROM '/nonexistent-xyz' FILEFORMAT = parquet"))
      assert(eS.getMessage.contains("does not exist"))
      assert(GraftSql.parseDml(
        s"COPY INTO nobody FROM '$landing' FILEFORMAT = parquet").isEmpty)
    } finally GraftTables.unregister("t_copy")
  }

  test("COPY INTO serializes under the writer lock: racing runs over " +
    "the same landing dir load each file exactly once") {
    import spark.implicits._
    val root = tmp("copyrace")
    val landing = java.nio.file.Files
      .createTempDirectory("graft-sql-copyrace").toString
    VersionedParquet.publish(
      Seq.empty[(Long, Long)].toDF("k", "x"), root, keepVersions = 50)
    (0L until 200L).map(i => (i, i)).toDF("k", "x")
      .coalesce(1).write.mode("overwrite").parquet(s"$landing/b1")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      import scala.jdk.CollectionConverters._
      val tasks = (1 to 4).map { _ =>
        new java.util.concurrent.Callable[(Int, Int, Long)] {
          def call(): (Int, Int, Long) =
            VersionedParquet.copyInto(spark, root, landing)
        }
      }
      val results = pool.invokeAll(tasks.asJava).asScala.map(_.get())
      // exactly ONE racer loads the file; the rest see it in the log
      assert(results.map(_._1).sum === 1,
        s"loads across racers: ${results.map(_._1)}")
      assert(results.map(_._3).sum === 200L,
        s"rows across racers: ${results.map(_._3)}")
      assert(VersionedParquet.read(spark, root).count() === 200L,
        "a double-load would show here")
      assert(VersionedParquet.currentVersion(spark, root) === Some(1L),
        "exactly one append version")
    } finally pool.shutdown()
  }

  test("INSERT OVERWRITE and TRUNCATE TABLE: wholesale replace and " +
    "empty version, both time-travelable") {
    import spark.implicits._
    val root = tmp("ow")
    seed(root)
    GraftTables.register("t_ow", root, keepVersions = 50)
    try {
      assert(GraftSql.parseDml("TRUNCATE TABLE t_ow")
        === Some(SqlTruncate("t_ow")))
      assert(GraftSql.parseDml(
        "INSERT OVERWRITE TABLE t_ow SELECT * FROM x")
        === Some(SqlInsertOverwrite("t_ow", "SELECT * FROM x")))
      // plain INSERT INTO still parses as an insert, not an overwrite
      assert(GraftSql.parseDml("INSERT INTO t_ow SELECT * FROM x")
        === Some(SqlInsert("t_ow", "SELECT * FROM x")))
      spark.range(5)
        .selectExpr("id", "'z' AS g", "id * 7 AS x")
        .createOrReplaceTempView("ow_rows")
      GraftSql.sql(spark, "INSERT OVERWRITE t_ow SELECT * FROM ow_rows")
      assert(rows(root) === (0L until 5L).map(i => (i, "z", i * 7)).toSet)
      // OVERWRITE replaces rows, never the schema: a column mismatch
      // refuses loudly instead of silently re-schema-ing the table
      val eSch = intercept[java.io.IOException](GraftSql.sql(spark,
        "INSERT OVERWRITE t_ow SELECT id, g AS wrong_name, x FROM ow_rows"))
      assert(eSch.getMessage.contains("INSERT OVERWRITE t_ow rejected"))
      assert(rows(root) === (0L until 5L).map(i => (i, "z", i * 7)).toSet,
        "refused overwrite must change nothing")
      GraftSql.sql(spark, "TRUNCATE TABLE t_ow")
      assert(VersionedParquet.read(spark, root).count() === 0L)
      assert(VersionedParquet.read(spark, root).columns.toSeq
        === Seq("id", "g", "x"), "truncate keeps the schema")
      // every step stays time-travelable (versioned, not destructive)
      assert(VersionedParquet.read(spark, root, Some(0L)).count() === 100L)
      assert(VersionedParquet.read(spark, root, Some(1L)).count() === 5L)
    } finally GraftTables.unregister("t_ow")
  }

  test("RESTORE TABLE through the injected parser returns the typed row") {
    val root = tmp("restore-ext")
    seed(root)
    GraftTables.register("t_rext", root, keepVersions = 50)
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .withExtensions(new graft.plans.GraftExtensions())
      .getOrCreate()
    try {
      extSession.sql("DELETE FROM t_rext WHERE id < 5")
      val r = extSession.sql(
        "RESTORE TABLE t_rext TO VERSION AS OF 0").head()
      assert(r.getAs[String]("table") === "t_rext")
      assert(r.getAs[Long]("restored_to") === 0L)
      assert(r.getAs[Long]("new_version") === 2L)
      assert(VersionedParquet.read(extSession, root).count() === 100L)
    } finally {
      GraftTables.clear()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("COPY INTO ledger survives TRUNCATE (no silent re-load); " +
    "COPY_OPTIONS force is the documented re-ingest escape hatch") {
    import spark.implicits._
    val root = tmp("copyforce")
    val landing = java.nio.file.Files
      .createTempDirectory("graft-sql-copyforce").toString
    GraftTables.register("t_cforce", root, keepVersions = 50)
    try {
      VersionedParquet.publish(
        Seq.empty[(Long, Long)].toDF("k", "x"), root, keepVersions = 50)
      (0L until 30L).map(i => (i, i)).toDF("k", "x")
        .coalesce(1).write.parquet(s"$landing/b1")
      GraftSql.sql(spark,
        s"COPY INTO t_cforce FROM '$landing' FILEFORMAT = parquet")
      assert(VersionedParquet.read(spark, root).count() === 30L)
      GraftSql.sql(spark, "TRUNCATE TABLE t_cforce")
      // the ledger deliberately survives: a scheduled re-run stays a
      // no-op rather than silently double-loading
      val r = GraftSql.sql(spark,
        s"COPY INTO t_cforce FROM '$landing' FILEFORMAT = parquet").head()
      assert(r.getAs[Long]("n_files_loaded") === 0L)
      assert(VersionedParquet.read(spark, root).count() === 0L)
      // force bypasses the ledger — Delta's escape hatch for exactly
      // this truncated-table state
      val rf = GraftSql.sql(spark,
        s"COPY INTO t_cforce FROM '$landing' FILEFORMAT = parquet " +
          "COPY_OPTIONS ('force'='true')").head()
      assert(rf.getAs[Long]("n_files_loaded") === 1L)
      assert(rf.getAs[Long]("n_rows_inserted") === 30L)
      assert(VersionedParquet.read(spark, root).count() === 30L)
      // after the forced run, non-forced stays idempotent
      val r2 = GraftSql.sql(spark,
        s"COPY INTO t_cforce FROM '$landing' FILEFORMAT = parquet").head()
      assert(r2.getAs[Long]("n_files_loaded") === 0L)
      // unknown COPY_OPTIONS refuse loudly
      val eU = intercept[IllegalArgumentException](GraftSql.parseDml(
        s"COPY INTO t_cforce FROM '$landing' FILEFORMAT = parquet " +
          "COPY_OPTIONS ('mergeSchema'='true')"))
      assert(eU.getMessage.contains("unsupported COPY_OPTIONS"))
    } finally GraftTables.unregister("t_cforce")
  }

  test("COPY INTO ledger is segmented parquet: O(new files) per run, " +
    "legacy text ledger migrates, compaction bounds the segment count") {
    import spark.implicits._
    val root = tmp("copyseg")
    val landing = java.nio.file.Files
      .createTempDirectory("graft-sql-copyseg").toString
    GraftTables.register("t_cseg", root, keepVersions = 50)
    try {
      VersionedParquet.publish(
        Seq.empty[(Long, Long)].toDF("k", "x"), root, keepVersions = 50)
      val rootP = new org.apache.hadoop.fs.Path(root)
      val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val logDir = new org.apache.hadoop.fs.Path(rootP,
        VersionedParquet.COPY_LOG_DIR)
      // ── legacy migration: a pre-segmentation text ledger naming b1
      // counts as loaded, folds into a segment on the first write, and
      // the text file retires ──────────────────────────────────────
      (0L until 10L).map(i => (i, i)).toDF("k", "x")
        .coalesce(1).write.parquet(s"$landing/b1")
      val b1Part = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$landing/b1")).toSeq
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
        .map(p => fs.makeQualified(p).toString).head
      VersionedParquet.installPointer(spark, rootP,
        VersionedParquet.COPY_LOG, b1Part)
      (100L until 105L).map(i => (i, i)).toDF("k", "x")
        .coalesce(1).write.parquet(s"$landing/b2")
      val r1 = GraftSql.sql(spark,
        s"COPY INTO t_cseg FROM '$landing' FILEFORMAT = parquet").head()
      assert(r1.getAs[Long]("n_files_loaded") === 1L,
        "only b2 is new; the legacy ledger already names b1")
      assert(r1.getAs[Long]("n_files_skipped") === 1L)
      assert(VersionedParquet.read(spark, root).count() === 5L)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(rootP,
        VersionedParquet.COPY_LOG)),
        "the legacy text ledger retires after folding into a segment")
      val segs1 = VersionedParquet.copyLogSegs(fs, logDir)
      assert(segs1.nonEmpty, "segmented ledger installed")
      val paths1 = spark.read.parquet(segs1.map(_.toString): _*)
        .as[String].collect().toSet
      assert(paths1.contains(b1Part), "legacy entry carried forward")
      // ── compaction: past the threshold the segments merge into one
      // and the union of paths is preserved ────────────────────────
      val synthetic = (0 until VersionedParquet.COPY_LOG_COMPACT_AT + 4)
        .map(i => s"file:/synthetic/ledger-entry-$i.parquet")
      synthetic.zipWithIndex.foreach { case (p, i) =>
        VersionedParquet.writeCopyLogSeg(spark, fs, logDir,
          Seq(p), s"synthetic-$i")
      }
      assert(VersionedParquet.copyLogSegs(fs, logDir).size >
        VersionedParquet.COPY_LOG_COMPACT_AT)
      (200L until 203L).map(i => (i, i)).toDF("k", "x")
        .coalesce(1).write.parquet(s"$landing/b3")
      GraftSql.sql(spark,
        s"COPY INTO t_cseg FROM '$landing' FILEFORMAT = parquet")
      val segsAfter = VersionedParquet.copyLogSegs(fs, logDir)
      assert(segsAfter.size === 1,
        s"compaction merges to one segment, got ${segsAfter.size}")
      val pathsAfter = spark.read.parquet(segsAfter.map(_.toString): _*)
        .as[String].collect().toSet
      assert(synthetic.forall(pathsAfter), "compaction keeps the union")
      assert(pathsAfter.contains(b1Part))
      // idempotency holds across the compacted ledger
      val rAgain = GraftSql.sql(spark,
        s"COPY INTO t_cseg FROM '$landing' FILEFORMAT = parquet").head()
      assert(rAgain.getAs[Long]("n_files_loaded") === 0L)
    } finally GraftTables.unregister("t_cseg")
  }

  test("MERGE full sync (WHEN NOT MATCHED BY SOURCE THEN DELETE): the " +
    "table mirrors the source in one commit; feed records the drops") {
    import spark.implicits._
    val root = tmp("mergesync")
    GraftTables.register("t_msync", root, keepVersions = 50)
    try {
      seed(root) // ids 0..99, g = g0/g1/g2, x = id*10
      // source: ids 0..49 with x bumped, plus fresh ids 200..204;
      // ids 50..99 are GONE and must be deleted by the sync
      ((0L until 50L).map(i => (i, s"g${i % 3}", i * 10 + 1)) ++
        (200L until 205L).map(i => (i, "gn", i)))
        .toDF("id", "g", "x").createOrReplaceTempView("msync_src")
      GraftSql.sql(spark,
        """MERGE INTO t_msync t USING (SELECT * FROM msync_src) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val live = rows(root)
      val want = ((0L until 50L).map(i => (i, s"g${i % 3}", i * 10 + 1)) ++
        (200L until 205L).map(i => (i, "gn", i))).toSet
      assert(live === want, "the table must mirror the source exactly")
      // one commit; the feed records the 50 drops as deletes
      assert(VersionedParquet.currentVersion(spark, root) === Some(1L))
      val dels = VersionedParquet.changes(spark, root, 0L, 1L)
        .filter(col("_change_type") === "delete")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(dels === (50L until 100L).toSet,
        "BY SOURCE drops ride the change feed as ordinary deletes")
      // idempotency: re-running the same sync changes nothing
      GraftSql.sql(spark,
        """MERGE INTO t_msync USING (SELECT * FROM msync_src)
          |ON id = id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      assert(rows(root) === want)
    } finally GraftTables.unregister("t_msync")
  }

  test("MERGE without WHEN NOT MATCHED THEN INSERT is update-only: " +
    "source-only rows do NOT land (Delta's omitted-clause contract)") {
    import spark.implicits._
    val root = tmp("mupdonly")
    GraftTables.register("t_mupd", root, keepVersions = 50)
    try {
      VersionedParquet.publish(
        (0L until 10L).map(i => (i, s"g${i % 2}", i))
          .toDF("id", "g", "x"), root, keepVersions = 50)
      // source: 5 matched (updated x), 5 source-only (must NOT insert)
      (5L until 15L).map(i => (i, "u", i * 100))
        .toDF("id", "g", "x").createOrReplaceTempView("mupd_src")
      GraftSql.sql(spark,
        """MERGE INTO t_mupd USING (SELECT * FROM mupd_src)
          |ON id = id
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      val live = VersionedParquet.read(spark, root)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      val want = (0L until 5L).map(i => (i, s"g${i % 2}", i)).toSet ++
        (5L until 10L).map(i => (i, "u", i * 100)).toSet
      assert(live === want,
        "matched rows update; ids 10-14 must not be inserted")
      // update-only + BY SOURCE DELETE: matched update, source-only
      // dropped, table keys absent from the source deleted
      (3L until 12L).map(i => (i, "v", i)).toDF("id", "g", "x")
        .createOrReplaceTempView("mupd_src2")
      GraftSql.sql(spark,
        """MERGE INTO t_mupd USING (SELECT * FROM mupd_src2)
          |ON id = id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val live2 = VersionedParquet.read(spark, root)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(live2 === (3L until 10L).map(i => (i, "v", i)).toSet,
        "ids 0-2 deleted (not in source), 3-9 updated, 10-11 NOT " +
          "inserted (no INSERT clause)")
    } finally GraftTables.unregister("t_mupd")
  }

  test("MERGE WHEN MATCHED THEN DELETE with an INSERT clause is " +
    "rejected loudly (the old parse silently ignored the INSERT)") {
    val e = intercept[IllegalArgumentException] {
      GraftSql.parseDml(
        """MERGE INTO t USING (SELECT 1 AS id) s ON id = id
          |WHEN MATCHED THEN DELETE
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("not supported"), e.getMessage)
  }

  test("INSERT OVERWRITE and TRUNCATE preserve the table's partition " +
    "layout (rows replace; the physical layout is the table's)") {
    import spark.implicits._
    val root = tmp("ovrpart")
    GraftTables.register("t_ovrp", root, keepVersions = 50)
    try {
      VersionedParquet.publish(
        (0L until 40L).map(i => (i, s"g${i % 4}", i * 2))
          .toDF("id", "g", "x"),
        root, partitionCols = Seq("g"), keepVersions = 50)
      assert(VersionedParquet.partitionColsOf(spark, root) === Seq("g"))
      (1000L until 1020L).map(i => (i, s"g${i % 2}", i))
        .toDF("id", "g", "x").createOrReplaceTempView("ovr_src")
      GraftSql.sql(spark,
        "INSERT OVERWRITE t_ovrp SELECT id, g, x FROM ovr_src")
      assert(VersionedParquet.read(spark, root).count() === 20L)
      assert(VersionedParquet.partitionColsOf(spark, root) === Seq("g"),
        "OVERWRITE replaces rows, not the partition layout")
      GraftSql.sql(spark, "TRUNCATE TABLE t_ovrp")
      assert(VersionedParquet.read(spark, root).count() === 0L)
      // the empty publish lands as one flat schema-carrying file, so
      // the directory tree no longer shows the layout — the marker
      // must: TRUNCATE replaces rows, never the table's partitioning
      assert(VersionedParquet.partitionColsOf(spark, root) === Seq("g"),
        "TRUNCATE must not destroy the partition layout record")
      // and the next row-replacing verb re-materializes it physically
      GraftSql.sql(spark,
        "INSERT OVERWRITE t_ovrp SELECT id, g, x FROM ovr_src")
      assert(VersionedParquet.read(spark, root).count() === 20L)
      assert(VersionedParquet.partitionColsOf(spark, root) === Seq("g"))
      val v = VersionedParquet.currentVersion(spark, root).get
      val snap = new org.apache.hadoop.fs.Path(root, f"v$v%08d")
      val fs = snap.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.listStatus(snap).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith("g=")),
        "INSERT OVERWRITE after TRUNCATE must republish the Hive " +
          "col=value directory layout, not a flat file")
    } finally GraftTables.unregister("t_ovrp")
  }
}
