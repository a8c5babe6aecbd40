package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read UPSERT (q137's machinery): a MERGE must move zero
  * base bytes — the new version holds only the grown deletion vector
  * and the cumulative delta parquet — while reads resolve
  * base ∖ vector ∪ delta exactly: matched keys take the incoming
  * values, unmatched keys insert, re-upserted delta keys supersede
  * (never duplicate), deletes reach delta rows the vector cannot,
  * and compaction materializes the whole logical state.
  */
class MergeOnReadSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-mor-$tag").toString

  private def dataFiles(dir: String): Map[String, Long] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(root.getAbsolutePath) ->
        f.length()).toMap
  }

  test("upsert rewrites no base file; updates replace, inserts append") {
    import spark.implicits._
    val root = tmp("basic")
    VersionedParquet.publish(
      (0L until 100L).map(i => (i, i * 10, "base")).toDF("id", "x", "tag")
        .repartition(4), root, keepVersions = 10)
    val v0Files = dataFiles(s"$root/v00000000")

    // 10 updates (ids 0,10,..,90) + 5 inserts (ids 1000..1004)
    val batch = ((0L until 100L by 10L).map(i => (i, i * 10 + 1, "upd")) ++
      (1000L until 1005L).map(i => (i, -1L, "ins"))).toDF("id", "x", "tag")
    VersionedParquet.upsert(spark, root, batch, Seq("id"),
      keepVersions = 10)

    assert(dataFiles(s"$root/v00000000") === v0Files,
      "upsert must not rewrite any base data file")
    assert(dataFiles(s"$root/v00000001").keySet
      .forall(p => p.contains("/_dv/") || p.contains("/_delta/") ||
        p.contains("/_cdf/")),
      "a merge-on-read version holds only vector + delta + change feed")

    val live = VersionedParquet.read(spark, root)
    assert(live.count() === 105)
    assert(live.filter($"tag" === "upd").count() === 10)
    assert(live.filter($"tag" === "ins").count() === 5)
    // matched keys carry the incoming values, exactly once
    assert(live.filter($"id" === 20).collect().toSeq ===
      Seq(org.apache.spark.sql.Row(20L, 201L, "upd")))
    // untouched rows unchanged
    assert(live.filter($"id" === 21).head().getLong(1) === 210)
    // time travel: v0 pristine
    assert(VersionedParquet.read(spark, root, Some(0L))
      .filter($"tag" =!= "base").count() === 0)
  }

  test("chained upserts supersede delta keys; deletes reach the delta") {
    import spark.implicits._
    val root = tmp("chain")
    VersionedParquet.publish(
      (0L until 50L).map(i => (i, 0L)).toDF("id", "n"), root,
      keepVersions = 10)
    // v1: update id 7, insert id 100
    VersionedParquet.upsert(spark, root,
      Seq((7L, 1L), (100L, 1L)).toDF("id", "n"), Seq("id"),
      keepVersions = 10)
    // v2: RE-upsert both (7 was a masked-base update, 100 a delta
    // insert) — each must supersede, not duplicate
    VersionedParquet.upsert(spark, root,
      Seq((7L, 2L), (100L, 2L)).toDF("id", "n"), Seq("id"),
      keepVersions = 10)
    val v2 = VersionedParquet.read(spark, root)
    assert(v2.count() === 51)
    assert(v2.filter($"id" === 7).select("n").as[Long].collect()
      === Array(2L))
    assert(v2.filter($"id" === 100).select("n").as[Long].collect()
      === Array(2L))
    // v3: delete n = 2 — one victim lives in the BASE's replacement
    // (id 7's current row is delta), one is a pure insert; both rows
    // are delta-resident, invisible to the vector
    VersionedParquet.delete(spark, root, col("n") === 2L,
      keepVersions = 10)
    val v3 = VersionedParquet.read(spark, root)
    assert(v3.count() === 49)
    assert(v3.filter($"id".isin(7L, 100L)).count() === 0)
    // every version of the chain still resolves
    assert(VersionedParquet.read(spark, root, Some(1L)).count() === 51)
    assert(VersionedParquet.read(spark, root, Some(2L)).count() === 51)
    assert(VersionedParquet.read(spark, root, Some(0L)).count() === 50)
  }

  test("duplicate keys and new columns are rejected") {
    import spark.implicits._
    val root = tmp("reject")
    VersionedParquet.publish(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    val dup = Seq((1L, "x"), (1L, "y")).toDF("id", "s")
    val e1 = intercept[java.io.IOException] {
      VersionedParquet.upsert(spark, root, dup, Seq("id"))
    }
    assert(e1.getMessage.contains("duplicate keys"))
    val wide = Seq((1L, "x", 9L)).toDF("id", "s", "extra")
    val e2 = intercept[java.io.IOException] {
      VersionedParquet.upsert(spark, root, wide, Seq("id"))
    }
    assert(e2.getMessage.contains("cannot add columns"))
    // failed upserts leave the table untouched
    assert(VersionedParquet.currentVersion(spark, root) === Some(0L))
    assert(VersionedParquet.read(spark, root).count() === 2)
  }

  test("change feed: apply invariant holds per step; physical versions refuse") {
    import spark.implicits._
    val root = tmp("cdf")
    VersionedParquet.publish(
      (0L until 80L).map(i => (i, i)).toDF("id", "n"), root,
      keepVersions = 10)
    // v1: update 0..7, insert 200/201; v2: re-update 0..3 + the insert
    // 200 (delta pre-images), insert 300; v3: delete n >= 500
    VersionedParquet.upsert(spark, root,
      ((0L until 8L).map(i => (i, i + 1000L)) ++
        Seq((200L, 1L), (201L, 2L))).toDF("id", "n"), Seq("id"),
      keepVersions = 10)
    VersionedParquet.upsert(spark, root,
      ((0L until 4L).map(i => (i, i + 5000L)) ++
        Seq((200L, 5001L), (300L, 42L))).toDF("id", "n"), Seq("id"),
      keepVersions = 10)
    VersionedParquet.delete(spark, root, col("n") >= 500L,
      keepVersions = 10)
    for (v <- 0L until 3L) {
      val feed = VersionedParquet.changes(spark, root, v, v + 1)
      val gone = feed
        .filter($"_change_type".isin("update_pre", "delete"))
        .drop("_change_type", "_commit_version")
      val came = feed
        .filter($"_change_type".isin("update_post", "insert"))
        .drop("_change_type", "_commit_version")
      val applied = VersionedParquet.read(spark, root, Some(v))
        .exceptAll(gone).unionAll(came)
      val target = VersionedParquet.read(spark, root, Some(v + 1))
      assert(applied.exceptAll(target).isEmpty &&
        target.exceptAll(applied).isEmpty,
        s"apply invariant broken at step $v -> ${v + 1}")
    }
    // pre-images of a twice-updated key come from the DELTA, not the
    // masked base: id 0's v2 pre-image must be 1000, not 0
    val v2pre = VersionedParquet.changes(spark, root, 1, 2)
      .filter($"_change_type" === "update_pre" && $"id" === 0L)
      .select("n").as[Long].collect()
    assert(v2pre.toSeq === Seq(1000L))
    // a range crossing the physical publish fails loudly
    val e = intercept[java.io.IOException] {
      VersionedParquet.changes(spark, root, -1, 0).collect()
    }
    assert(e.getMessage.contains("no change feed"))
  }

  test("compactSmallFiles packs only the small tier; big files never reopened") {
    import spark.implicits._
    val root = tmp("smallfiles")
    // two-tier layout: partition p=0 is one big file, p=1..4 are small
    val big = (0L until 5000L).map(i => (i, 0, s"payload-$i"))
    val smalls = (1 to 4).flatMap(p =>
      (0L until 50L).map(i => (5000L + p * 100 + i, p, s"s-$p-$i")))
    VersionedParquet.publish(
      (big ++ smalls).toDF("id", "p", "s").repartition(1), root,
      partitionCols = Seq("p"), keepVersions = 10)
    // v1: a delete whose victims live in BOTH tiers
    VersionedParquet.delete(spark, root, col("id") % 10 === 3,
      keepVersions = 10)
    val before = VersionedParquet.read(spark, root)
      .orderBy("id").collect().toSeq
    val baseFiles = dataFiles(s"$root/v00000000")
    val bigLen = baseFiles.collect {
      case (f, len) if f.contains("/p=0/") => len }.max

    // v2: pack everything smaller than the big file
    VersionedParquet.compactSmallFiles(spark, root,
      smallBytes = bigLen, targetBytes = 1L << 20, keepVersions = 10)
    assert(VersionedParquet.read(spark, root).orderBy("id")
      .collect().toSeq === before, "compaction must not change content")
    assert(dataFiles(s"$root/v00000000") === baseFiles,
      "compaction must not touch base files")
    val scanned = VersionedParquet.read(spark, root).inputFiles
      .filter(_.contains("/v00000000/")).toSet
    assert(scanned.forall(_.contains("/p=0/")),
      s"packed small files must never be opened again, scanned $scanned")
    assert(scanned.exists(_.contains("/p=0/")),
      "the big file must still be scanned in place")
    // time travel across the maintenance version
    assert(VersionedParquet.read(spark, root, Some(0L)).count() ===
      (big.size + smalls.size))
    // the feed skips the maintenance version instead of failing
    val feed = VersionedParquet.changes(spark, root, 0L, 2L)
    assert(feed.select("_change_type").distinct().as[String]
      .collect().toSeq === Seq("delete"))

    // v3: a delete AFTER compaction (exclusion manifest must ride along)
    VersionedParquet.delete(spark, root, col("id") % 10 === 7,
      keepVersions = 10)
    val expect3 = before.filterNot(_.getLong(0) % 10 == 7)
    assert(VersionedParquet.read(spark, root).orderBy("id")
      .collect().toSeq === expect3)

    // v4: pack the whole base — the scan then reads delta only
    VersionedParquet.compactSmallFiles(spark, root,
      smallBytes = Long.MaxValue, targetBytes = 1L << 20,
      keepVersions = 10)
    assert(VersionedParquet.read(spark, root).orderBy("id")
      .collect().toSeq === expect3)
    assert(!VersionedParquet.read(spark, root).inputFiles
      .exists(_.contains("/v00000000/")),
      "a fully-packed base must not be scanned at all")
  }

  test("CHECK constraints gate the merge path and survive compaction") {
    import spark.implicits._
    val root = tmp("constraints")
    VersionedParquet.publish(
      (0L until 20L).map(i => (i, i)).toDF("id", "n"), root,
      keepVersions = 10, constraints = Seq("n >= 0"))
    VersionedParquet.upsert(spark, root,
      Seq((3L, 99L)).toDF("id", "n"), Seq("id"), keepVersions = 10)
    val e = intercept[java.io.IOException] {
      VersionedParquet.upsert(spark, root,
        Seq((4L, -5L)).toDF("id", "n"), Seq("id"), keepVersions = 10)
    }
    assert(e.getMessage.contains("merge rejected"))
    assert(VersionedParquet.currentVersion(spark, root) === Some(1L),
      "a rejected merge must leave the table untouched")
    assert(VersionedParquet.read(spark, root)
      .filter($"n" < 0).count() === 0)
    // materialize, then the contract must still hold
    VersionedParquet.compact(spark, root, targetBytes = 1L << 20)
    val e2 = intercept[java.io.IOException] {
      VersionedParquet.upsert(spark, root,
        Seq((5L, -1L)).toDF("id", "n"), Seq("id"), keepVersions = 10)
    }
    assert(e2.getMessage.contains("merge rejected"))
  }

  test("file skipping composes with merge-on-read versions") {
    import spark.implicits._
    val root = tmp("skipmor")
    // range-clustered layout → tight per-file id ranges
    val df = (0L until 4000L).map(i => (i, i * 2)).toDF("id", "n")
    VersionedParquet.publish(df.repartitionByRange(8, col("id")), root,
      keepVersions = 10, statsCols = Seq("id"))
    VersionedParquet.delete(spark, root,
      col("id").between(100L, 199L), keepVersions = 10)
    VersionedParquet.upsert(spark, root,
      Seq((150L, -1L), (250L, -2L), (9999L, -3L)).toDF("id", "n"),
      Seq("id"), keepVersions = 10)
    val (pruned, kept, total) =
      FileStats.skippingRead(spark, root, "id", 0L, 499L)
    assert(kept > 0 && kept < total,
      s"selective range must prune base files ($kept/$total)")
    val got = pruned.filter($"id".between(0L, 499L))
      .orderBy("id").collect().toSeq
    val want = VersionedParquet.read(spark, root)
      .filter($"id".between(0L, 499L)).orderBy("id").collect().toSeq
    assert(got === want, "pruned scan must agree with the full read")
    // the overlay really applied: deleted band gone, delta rows in
    val ids = got.map(_.getLong(0)).toSet
    assert(!ids.contains(120L) && ids.contains(150L) &&
      got.find(_.getLong(0) == 250L).get.getLong(1) === -2L)
  }

  test("compact materializes base ∖ vector ∪ delta into a physical snapshot") {
    import spark.implicits._
    val root = tmp("compact")
    VersionedParquet.publish(
      (0L until 200L).map(i => (i, i)).toDF("id", "n"), root,
      keepVersions = 10)
    VersionedParquet.upsert(spark, root,
      (0L until 10L).map(i => (i, -i)).toDF("id", "n") union
        Seq((999L, 999L)).toDF("id", "n"), Seq("id"), keepVersions = 10)
    VersionedParquet.delete(spark, root, col("id") === 999L,
      keepVersions = 10)
    val logical = VersionedParquet.read(spark, root)
      .orderBy("id").collect().toSeq
    VersionedParquet.compact(spark, root, targetBytes = 1L << 20)
    val files = dataFiles(s"$root/v00000003")
    assert(files.nonEmpty &&
      files.keySet.forall(p => !p.contains("/_dv/") && !p.contains("/_delta/")),
      "compacted snapshot must be physical")
    assert(VersionedParquet.read(spark, root).orderBy("id")
      .collect().toSeq === logical)
  }
}
