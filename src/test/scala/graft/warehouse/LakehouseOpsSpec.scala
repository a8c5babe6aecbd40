package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q146-q148 lakehouse write ops, proven at the physical layer the
  * DuckDB hash gate cannot see: shallow clone moves zero data bytes and
  * reads the SOURCE's files; restore is metadata-only and its change
  * feed satisfies the apply invariant through the rollback; dynamic
  * partition overwrite never opens replaced-partition base files and
  * never rewrites carried ones.
  */
class LakehouseOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-lake-$tag").toString

  private def dataFiles(dir: String): Map[String, Long] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(root.getAbsolutePath) ->
        f.length()).toMap
  }

  // ── shallow clone ────────────────────────────────────────────────────

  test("shallow clone copies no base bytes and reads the source's files") {
    import spark.implicits._
    val src = tmp("clone-src")
    val dst = tmp("clone-dst") + "/tbl" // fresh (non-existent) root
    val rows = (0L until 2000L).map(i => (i, i % 7, s"v$i"))
      .toDF("id", "grp", "s")
    VersionedParquet.publish(rows.repartition(4), src, keepVersions = 10)
    VersionedParquet.delete(spark, src, col("id") % 13 === 1,
      keepVersions = 10)
    val srcFilesBefore = dataFiles(src)

    VersionedParquet.shallowClone(spark, src, dst)

    // zero-copy: every input file of the clone's read that carries BASE
    // data (not the `_dv`/`_delta` overlay tiers) lives under the
    // SOURCE root; the clone root holds only overlay parquet
    val cloneRead = VersionedParquet.read(spark, dst)
    val inputs = cloneRead.inputFiles.toSeq
    val baseInputs = inputs.filterNot(f =>
      f.contains("/_dv/") || f.contains("/_delta/"))
    assert(baseInputs.nonEmpty && baseInputs.forall(_.contains(
      new java.io.File(src).getName)),
      s"clone must scan the source's physical files, got: ${inputs.take(3)}")
    val cloneBase = dataFiles(dst).keys.filterNot(f =>
      f.contains("/_dv/") || f.contains("/_delta/") || f.contains("/_cdf/"))
    assert(cloneBase.isEmpty,
      s"clone root holds base parquet — not zero-copy: ${cloneBase.take(3)}")
    // and the masked rows stay masked through the clone
    assert(cloneRead.filter(col("id") % 13 === 1).count() === 0L)

    // divergence: writes on the clone never touch source files
    val ups = (0L until 100L).map(i => (i * 3, 99L, "up")).toDF("id", "grp", "s")
    VersionedParquet.upsert(spark, dst, ups, Seq("id"), keepVersions = 10)
    assert(dataFiles(src) === srcFilesBefore,
      "a clone-side merge must not touch source bytes")
    // compact DETACHES: the clone materializes under its own root
    VersionedParquet.compact(spark, dst)
    val detached = VersionedParquet.read(spark, dst)
    assert(detached.inputFiles.forall(_.contains("tbl")),
      "after compact the clone must serve from its own root")
    assert(dataFiles(src) === srcFilesBefore)
  }

  test("shallow clone refuses a root that already holds a table") {
    import spark.implicits._
    val src = tmp("clone-src2")
    val dst = tmp("clone-dst2")
    VersionedParquet.publish(Seq((1L, "a")).toDF("id", "s"), src)
    VersionedParquet.publish(Seq((2L, "b")).toDF("id", "s"), dst)
    val e = intercept[java.io.IOException](
      VersionedParquet.shallowClone(spark, src, dst))
    assert(e.getMessage.contains("already holds a table"))
  }

  // ── restore ──────────────────────────────────────────────────────────

  test("restore is metadata-only and its feed satisfies the apply invariant") {
    import spark.implicits._
    val root = tmp("restore")
    val rows = (0L until 1500L).map(i => (i, i % 5, i * 10))
      .toDF("id", "grp", "x")
    VersionedParquet.publish(rows.repartition(3), root, keepVersions = 10)
    val baseFiles = dataFiles(root)
    val ups = (0L until 300L).map(i => (i * 5, 9L, -1L)).toDF("id", "grp", "x")
    VersionedParquet.upsert(spark, root, ups, Seq("id"), keepVersions = 10)
    VersionedParquet.delete(spark, root, col("id") % 4 === 2,
      keepVersions = 10)
    val filesBeforeRestore = dataFiles(root)

    VersionedParquet.restore(spark, root, 0L, keepVersions = 10)

    // v3 == v0 as multisets
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("id", "grp", "x").count()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    assert(canon(VersionedParquet.read(spark, root)) ===
      canon(VersionedParquet.read(spark, root, Some(0L))))
    // metadata-only: no pre-existing data file was touched, and the new
    // version dir holds ONLY overlay/feed parquet — no base rewrite
    val after = dataFiles(root)
    filesBeforeRestore.foreach { case (f, len) =>
      assert(after.get(f).contains(len), s"restore rewrote $f") }
    assert(baseFiles.keys.forall(after.contains), "restore lost a base file")
    val v3Base = after.keys.filter(f => f.contains("v00000003") &&
      !f.contains("/_dv/") && !f.contains("/_delta/") &&
      !f.contains("/_cdf/"))
    assert(v3Base.isEmpty,
      s"restore version carries base parquet — not metadata-only: " +
        v3Base.take(3))

    // apply invariant across the rollback step: read(3) ≡
    // read(2) ∖ deletes ⊎ inserts as multisets
    val feed = VersionedParquet.changes(spark, root, 2L, 3L)
    val del = feed.filter(col("_change_type") === "delete")
      .drop("_change_type", "_commit_version")
    val ins = feed.filter(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version")
    val v2 = VersionedParquet.read(spark, root, Some(2L))
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("id", "grp", "x").count()
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2)) -> r.getLong(3)).toMap
    val applied = bag(v2).foldLeft(Map.empty[(Long, Long, Long), Long]) {
      case (m, (k, n)) => m + (k -> n)
    }
    val minus = bag(del).foldLeft(applied) { case (m, (k, n)) =>
      val left = m.getOrElse(k, 0L) - n
      assert(left >= 0, s"feed deletes $k more times than v2 holds it")
      if (left == 0) m - k else m + (k -> left)
    }
    val plus = bag(ins).foldLeft(minus) { case (m, (k, n)) =>
      m + (k -> (m.getOrElse(k, 0L) + n)) }
    assert(plus === bag(VersionedParquet.read(spark, root, Some(3L))),
      "feed must replay v2 into the restored v3 exactly")

    // restoring to a MERGE-ON-READ version (v1) also works
    VersionedParquet.restore(spark, root, 1L, keepVersions = 10)
    assert(canon(VersionedParquet.read(spark, root)) ===
      canon(VersionedParquet.read(spark, root, Some(1L))))
  }

  test("restore withFeed=false marks the step CDF-absent") {
    import spark.implicits._
    val root = tmp("restore-nofeed")
    VersionedParquet.publish(Seq((1L, 10L)).toDF("id", "x"), root,
      keepVersions = 10)
    VersionedParquet.upsert(spark, root,
      Seq((1L, 20L), (2L, 5L)).toDF("id", "x"), Seq("id"),
      keepVersions = 10)
    VersionedParquet.restore(spark, root, 0L, keepVersions = 10,
      withFeed = false)
    val e = intercept[java.io.IOException](
      VersionedParquet.changes(spark, root, 1L, 2L).collect())
    assert(e.getMessage.contains("no change feed"))
  }

  // ── dynamic partition overwrite ──────────────────────────────────────

  test("partition overwrite never opens replaced files, never rewrites carried ones") {
    import spark.implicits._
    val root = tmp("replace")
    val rows = (0L until 3000L).map(i => (i, i % 3, i))
      .toDF("id", "p", "x")
    VersionedParquet.publish(rows, root, partitionCols = Seq("p"),
      keepVersions = 10)
    val before = dataFiles(root)
    val repl = (0L until 10L).map(i => (100000L + i, 1L, -i))
      .toDF("id", "p", "x")
    VersionedParquet.overwritePartitions(spark, root, repl,
      keepVersions = 10)

    // carried partitions byte-identical, replaced base files still on
    // disk (time travel to v0 needs them) but never opened by v1's scan
    val after = dataFiles(root)
    before.foreach { case (f, len) =>
      assert(after.get(f).contains(len), s"overwrite rewrote $f") }
    val v1 = VersionedParquet.read(spark, root)
    val opened = v1.inputFiles.toSeq
    assert(opened.exists(_.contains("p=0")) && opened.exists(_.contains("p=2")),
      "carried partitions must still be served from the base")
    assert(!opened.exists(f => f.contains("p=1") && f.contains("v00000000")),
      "replaced partition's base files must be pruned at list time")
    // content: partition 1 is exactly the replacement batch
    assert(v1.filter(col("p") === 1).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq === (0L until 10L).map(100000L + _))
    assert(v1.filter(col("p") =!= 1).count() === 2000L)
    // time travel: v0 intact
    assert(VersionedParquet.read(spark, root, Some(0L)).count() === 3000L)

    // apply invariant via the feed
    val feed = VersionedParquet.changes(spark, root, 0L, 1L)
    assert(feed.filter(col("_change_type") === "delete").count() === 1000L)
    assert(feed.filter(col("_change_type") === "insert").count() === 10L)
  }

  // ── searched UPDATE ──────────────────────────────────────────────────

  test("updateWhere rewrites no base bytes and its feed replays exactly") {
    import spark.implicits._
    val root = tmp("update")
    val rows = (0L until 2000L).map(i => (i, i % 10, i))
      .toDF("id", "grp", "x")
    VersionedParquet.publish(rows.repartition(4), root, keepVersions = 10)
    val before = dataFiles(root)

    VersionedParquet.updateWhere(spark, root,
      col("grp") === 3, Map("x" -> (col("x") + 1000000L)),
      keepVersions = 10)
    // second update re-touches half the delta-resident rows (the
    // in-place path); note grp = id % 10, so the sub-predicate must
    // stay satisfiable alongside grp = 3
    VersionedParquet.updateWhere(spark, root,
      col("grp") === 3 && col("id") < 1000,
      Map("x" -> (col("x") * 2)), keepVersions = 10)

    val after = dataFiles(root)
    before.foreach { case (f, len) =>
      assert(after.get(f).contains(len), s"updateWhere rewrote $f") }

    def bag(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("id", "grp", "x").count()
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2)) -> r.getLong(3)).toMap
    // semantic check vs a driver-side replay
    val expect = (0L until 2000L).map { i =>
      val x1 = if (i % 10 == 3) i + 1000000L else i
      val x2 = if (i % 10 == 3 && i < 1000) x1 * 2 else x1
      (i, i % 10, x2)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(bag(VersionedParquet.read(spark, root)) === expect)

    // apply invariant for each update step
    for (v <- Seq(0L, 1L)) {
      val feed = VersionedParquet.changes(spark, root, v, v + 1)
      val pre = bag(feed.filter(col("_change_type") === "update_pre")
        .drop("_change_type", "_commit_version"))
      val post = bag(feed.filter(col("_change_type") === "update_post")
        .drop("_change_type", "_commit_version"))
      assert(pre.values.sum === post.values.sum && pre.nonEmpty)
      val cur = bag(VersionedParquet.read(spark, root, Some(v)))
      val applied = pre.foldLeft(cur) { case (m, (k, n)) =>
        val left = m.getOrElse(k, 0L) - n
        assert(left >= 0, s"pre-image $k not present at v$v")
        if (left == 0) m - k else m + (k -> left)
      }
      val plus = post.foldLeft(applied) { case (m, (k, n)) =>
        m + (k -> (m.getOrElse(k, 0L) + n)) }
      assert(plus === bag(VersionedParquet.read(spark, root, Some(v + 1))),
        s"feed must replay v$v into v${v + 1}")
    }
  }

  test("updateWhere: NULL predicate keeps, unknown SET column throws") {
    import spark.implicits._
    val root = tmp("update-null")
    VersionedParquet.publish(
      Seq((1L, Some(5L)), (2L, None), (3L, Some(50L))).toDF("id", "x"),
      root, keepVersions = 10)
    VersionedParquet.updateWhere(spark, root, col("x") > 10,
      Map("x" -> lit(0L)), keepVersions = 10)
    val got = VersionedParquet.read(spark, root)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(5L), 2L -> None, 3L -> Some(0L)),
      "NULL predicate must keep the row unchanged (SQL UPDATE)")
    val e = intercept[java.io.IOException](
      VersionedParquet.updateWhere(spark, root, col("x") > 0,
        Map("nope" -> lit(1L))))
    assert(e.getMessage.contains("cannot add columns"))
  }

  // ── snapshot-tier FK enforcement ─────────────────────────────────────

  test("snapshot FK checks reject orphans atomically; NULLs and pins pass") {
    import spark.implicits._
    val root = tmp("snap-fk")
    val fk = Seq(("fact", "did", "dim", "id"))
    def dim(ids: Long*) = ids.map(i => (i, s"d$i")).toDF("id", "name")
    def fact(rows: (Long, Option[Long])*) =
      rows.map { case (f, d) => (f, d) }.toDF("fid", "did")

    // consistent snapshot commits (a NULL child key passes, SQL FK)
    val m0 = WarehouseSnapshot.publishAll(
      Seq("dim" -> dim(1, 2), "fact" -> fact(10L -> Some(1L),
        11L -> Some(2L), 12L -> None)),
      root, fkChecks = fk)
    assert(WarehouseSnapshot.readSnapshot(spark, root)("fact")
      .count() === 3L)

    // an orphan child key rejects the WHOLE snapshot before the
    // manifest exists; both tables keep resolving the old one
    val e = intercept[java.io.IOException](
      WarehouseSnapshot.publishAll(
        Seq("dim" -> dim(1), "fact" -> fact(20L -> Some(99L))),
        root, fkChecks = fk, keepSnapshots = 10))
    assert(e.getMessage.contains("FK fact.did -> dim.id"))
    val after = WarehouseSnapshot.readSnapshot(spark, root)
    assert(after("dim").count() === 2L && after("fact").count() === 3L,
      "a rejected snapshot must leave the previous one fully live")

    // a PINNED parent participates in the check: new fact against the
    // carried dim version — valid keys pass, orphans still reject
    val dimV = VersionedParquet.currentVersion(spark,
      root + "/tables/dim").get
    WarehouseSnapshot.publishAll(
      Seq("fact" -> fact(30L -> Some(1L))), root,
      pinned = Map("dim" -> dimV), fkChecks = fk, keepSnapshots = 10)
    assert(WarehouseSnapshot.readSnapshot(spark, root)("fact")
      .count() === 1L)
    val e2 = intercept[java.io.IOException](
      WarehouseSnapshot.publishAll(
        Seq("fact" -> fact(31L -> Some(77L))), root,
        pinned = Map("dim" -> dimV), fkChecks = fk, keepSnapshots = 10))
    assert(e2.getMessage.contains("orphan"))
  }

  // ── timestamp time travel ────────────────────────────────────────────

  test("readAsOf resolves the newest version committed at or before the instant") {
    import spark.implicits._
    val root = tmp("asof")
    VersionedParquet.publish(Seq((1L, "a")).toDF("id", "s"), root,
      keepVersions = 10)
    Thread.sleep(1100) // local-fs mtime granularity can be 1s
    val betweenV0V1 = System.currentTimeMillis()
    Thread.sleep(1100)
    VersionedParquet.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      root, keepVersions = 10)

    assert(VersionedParquet.readAsOf(spark, root, betweenV0V1)
      .count() === 1L, "asOf between commits must resolve v0")
    assert(VersionedParquet.readAsOf(spark, root,
      System.currentTimeMillis()).count() === 2L,
      "asOf now must resolve the live version")
    val e = intercept[java.io.IOException](
      VersionedParquet.readAsOf(spark, root, 1000L))
    assert(e.getMessage.contains("no version committed"))
  }

  test("partition overwrite rejects unpartitioned tables and empty batches") {
    import spark.implicits._
    val flat = tmp("replace-flat")
    VersionedParquet.publish(Seq((1L, 2L)).toDF("id", "p"), flat,
      keepVersions = 10)
    val e1 = intercept[java.io.IOException](
      VersionedParquet.overwritePartitions(spark, flat,
        Seq((3L, 4L)).toDF("id", "p")))
    assert(e1.getMessage.contains("not Hive-partitioned"))

    val part = tmp("replace-empty")
    VersionedParquet.publish(Seq((1L, 2L)).toDF("id", "p"), part,
      partitionCols = Seq("p"), keepVersions = 10)
    val e2 = intercept[java.io.IOException](
      VersionedParquet.overwritePartitions(spark, part,
        Seq((1L, 2L)).toDF("id", "p").limit(0)))
    assert(e2.getMessage.contains("zero rows"))
  }
}
