package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.OlapOps

/** File-level min/max data skipping (q121's machinery): the z-ordered
  * layout must make a selective scan read STRICTLY fewer files than
  * the table holds — and an unsorted layout of the same data must not
  * prune — while never losing a matching row. This is the proof that
  * q71's layout is load-bearing, not decorative.
  */
class FileStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("z-ordered layout: selective predicate reads strictly fewer files, loses no rows") {
    val root = OlapOps.clusteredOrdersRoot(spark, sf)
    val (df, nRead, nTotal) = FileStats.skippingRead(
      spark, root, "o_custkey", OlapOps.SKIP_LO, OlapOps.SKIP_HI)
    assert(nTotal >= 16, s"expected a multi-file table, got $nTotal")
    assert(nRead < nTotal,
      s"skipping must prune: read $nRead of $nTotal files")
    assert(nRead > 0, "the predicate range is populated")
    // no matching row lost: the skipped scan agrees with the full scan
    val pred = col("o_custkey").between(OlapOps.SKIP_LO, OlapOps.SKIP_HI)
    val skipped = df.filter(pred).count()
    val full = VersionedParquet.read(spark, root).filter(pred).count()
    assert(skipped === full && full > 0)
  }

  test("every skipped file really cannot match; every kept file range overlaps") {
    val root = OlapOps.clusteredOrdersRoot(spark, sf)
    val stats = FileStats.fileStats(spark, root)
      .filter(col("col") === "o_custkey")
      .select("file", "min", "max")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stats.nonEmpty)
    val (lo, hi) = (OlapOps.SKIP_LO, OlapOps.SKIP_HI)
    // recompute per-file truth straight from the parquet
    val v = VersionedParquet.currentVersion(spark, root).get
    val snap = s"$root/v${"%08d".format(v)}"
    stats.foreach { case (f, mn, mx) =>
      val actual = spark.read.parquet(s"$snap/$f")
        .agg(min("o_custkey"), max("o_custkey")).head()
      assert(actual.getLong(0) === mn && actual.getLong(1) === mx,
        s"sidecar stats for $f disagree with the file")
      val kept = mx >= lo && mn <= hi
      val hasMatch = spark.read.parquet(s"$snap/$f")
        .filter(col("o_custkey").between(lo, hi)).limit(1).count() > 0
      if (!kept) assert(!hasMatch, s"skipped file $f holds a matching row")
    }
  }

  test("unsorted layout of the same data cannot prune (the layout IS the feature)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-filestats-unsorted").toString
    val o = graft.sources.Tables.orders(spark, sf)
      .repartition(32) // round-robin: every file spans ~the full range
    VersionedParquet.publish(o, root, statsCols = Seq("o_custkey"))
    val (_, nRead, nTotal) = FileStats.skippingRead(
      spark, root, "o_custkey", OlapOps.SKIP_LO, OlapOps.SKIP_HI)
    assert(nTotal >= 16)
    assert(nRead === nTotal,
      "round-robin files all span the predicate range: nothing prunes")
  }

  test("compaction recomputes the sidecar — skipping survives, never staled") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-filestats-compact").toString
    val o = graft.sources.Tables.orders(spark, sf)
    FileStats.publishClustered(o, root, layout = Seq("o_custkey"),
      statsCols = Seq("o_custkey"), nFiles = 32)
    val preFiles = FileStats.fileStats(spark, root)
      .select("file").distinct().count()
    VersionedParquet.compact(spark, root, targetBytes = 1L << 20)
    // the sidecar on the compacted version describes the NEW files —
    // a carried-forward stale sidecar would name files that no longer
    // exist and skip ranges that moved
    val post = FileStats.fileStats(spark, root)
      .filter(col("col") === "o_custkey")
      .select("file", "min", "max")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(post.nonEmpty, "compact must recompute stats, not drop them")
    val v = VersionedParquet.currentVersion(spark, root).get
    val snap = s"$root/v${"%08d".format(v)}"
    post.foreach { case (f, mn, mx) =>
      val a = spark.read.parquet(s"$snap/$f")
        .agg(min("o_custkey"), max("o_custkey")).head()
      assert(a.getLong(0) === mn && a.getLong(1) === mx,
        s"post-compaction stats for $f disagree with the file")
    }
    assert(post.length.toLong < preFiles, "compaction reduced file count")
    // and the skipped read still agrees with the full read
    val pred = col("o_custkey").between(OlapOps.SKIP_LO, OlapOps.SKIP_HI)
    val (df, nRead, nTotal) = FileStats.skippingRead(
      spark, root, "o_custkey", OlapOps.SKIP_LO, OlapOps.SKIP_HI)
    assert(nTotal === post.length && nRead > 0)
    assert(df.filter(pred).count() ===
      VersionedParquet.read(spark, root).filter(pred).count())
  }

  test("partitioned publish stores snapshot-relative paths that resolve") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-filestats-part").toString
    val o = graft.sources.Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
    VersionedParquet.publish(o, root, partitionCols = Seq("o_year"),
      statsCols = Seq("o_custkey"))
    val stats = FileStats.fileStats(spark, root)
      .filter(col("col") === "o_custkey")
      .select("file", "min", "max")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stats.nonEmpty)
    assert(stats.forall(_._1.contains("o_year=")),
      "partitioned files must store their partition-relative path")
    val v = VersionedParquet.currentVersion(spark, root).get
    val snap = s"$root/v${"%08d".format(v)}"
    stats.foreach { case (f, mn, mx) =>
      val a = spark.read.parquet(s"$snap/$f")
        .agg(min("o_custkey"), max("o_custkey")).head()
      assert(a.getLong(0) === mn && a.getLong(1) === mx)
    }
  }

  test("optimize rewrites an unskippable layout into a skipping one, content unchanged") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-filestats-optimize").toString
    val o = graft.sources.Tables.orders(spark, sf).repartition(32)
    VersionedParquet.publish(o, root, statsCols = Seq("o_custkey"))
    val (_, preRead, preTotal) = FileStats.skippingRead(
      spark, root, "o_custkey", OlapOps.SKIP_LO, OlapOps.SKIP_HI)
    assert(preRead === preTotal, "round-robin layout cannot prune")
    val before = VersionedParquet.read(spark, root)
      .agg(count(lit(1)), sum("o_custkey")).head()

    FileStats.optimize(spark, root, layout = Seq("o_custkey"),
      statsCols = Seq("o_custkey"), nFiles = 32)

    val (df, postRead, postTotal) = FileStats.skippingRead(
      spark, root, "o_custkey", OlapOps.SKIP_LO, OlapOps.SKIP_HI)
    assert(postRead < postTotal, "the optimized layout must prune")
    val after = VersionedParquet.read(spark, root)
      .agg(count(lit(1)), sum("o_custkey")).head()
    assert(before === after, "optimize must not change content")
    val pred = col("o_custkey").between(OlapOps.SKIP_LO, OlapOps.SKIP_HI)
    assert(df.filter(pred).count() ===
      VersionedParquet.read(spark, root).filter(pred).count())
  }

  test("string-column stats: a sorted priority layout prunes on a lexicographic range") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-filestats-str").toString
    val o = graft.sources.Tables.orders(spark, sf)
    FileStats.publishClustered(o, root, layout = Seq("o_orderpriority"),
      statsCols = Seq("o_orderpriority"), nFiles = 16)
    // sorted layout ⇒ most files hold one priority; this range keeps
    // only the 1-URGENT/2-HIGH files
    val (lo, hi) = ("1-URGENT", "2-HIGH")
    val (df, nRead, nTotal) = FileStats.skippingReadString(
      spark, root, "o_orderpriority", lo, hi)
    // 5 distinct priorities ⇒ the range partitioner emits ~one file
    // per value; the range keeps only the two matching files
    assert(nTotal >= 5 && nRead < nTotal && nRead > 0,
      s"string range must prune: $nRead of $nTotal")
    val pred = col("o_orderpriority").between(lo, hi)
    assert(df.filter(pred).count() ===
      VersionedParquet.read(spark, root).filter(pred).count())
    // the string bounds round-trip the hex encoding exactly
    val st = FileStats.fileStats(spark, root)
      .filter(col("col") === "o_orderpriority")
      .select("file", "min_str", "max_str")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(st.nonEmpty && st.forall(_._2.head.isDigit))
    val v = VersionedParquet.currentVersion(spark, root).get
    val snap = s"$root/v${"%08d".format(v)}"
    st.take(4).foreach { case (f, mn, mx) =>
      val a = spark.read.parquet(s"$snap/$f")
        .agg(min("o_orderpriority"), max("o_orderpriority")).head()
      assert(a.getString(0) === mn && a.getString(1) === mx)
    }
  }

  test("generative: skipping == full scan for random data and random ranges") {
    import spark.implicits._
    // adversarial shapes: duplicates, negative values, clustered runs,
    // and query ranges that land on file boundaries — the skipped scan
    // must agree with the full scan for EVERY range, including empty
    // and all-covering ones
    val rnd = new scala.util.Random(8L)
    val root = java.nio.file.Files
      .createTempDirectory("graft-filestats-gen").toString
    val vals = Seq.fill(5000)(rnd.nextInt(2000).toLong - 1000L) ++
      Seq.fill(500)(-1000L) ++ Seq.fill(500)(999L) // heavy boundary ties
    FileStats.publishClustered(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v"),
      root, layout = Seq("v"), statsCols = Seq("v"), nFiles = 16)
    val full = VersionedParquet.read(spark, root)
    (1 to 12).foreach { _ =>
      val a = rnd.nextInt(2400) - 1200L
      val b = a + rnd.nextInt(800)
      val (df, nRead, nTotal) = FileStats.skippingRead(
        spark, root, "v", a, b)
      val pred = col("v").between(a, b)
      assert(df.filter(pred).count() === full.filter(pred).count(),
        s"range [$a,$b] diverged (read $nRead of $nTotal)")
    }
  }

  test("missing sidecar degrades to a full read; all-skipped keeps the schema") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-filestats-degrade").toString
    val o = graft.sources.Tables.orders(spark, sf).limit(100)
    VersionedParquet.publish(o, root) // no statsCols: no sidecar
    val (df, nRead, nTotal) = FileStats.skippingRead(
      spark, root, "o_custkey", 0L, 10L)
    assert(nRead === -1 && nTotal === -1, "sentinel for no-stats fallback")
    assert(df.count() === 100)
    // all-files-skipped: empty frame with the right schema
    val root2 = java.nio.file.Files
      .createTempDirectory("graft-filestats-empty").toString
    VersionedParquet.publish(o, root2, statsCols = Seq("o_custkey"))
    val (df2, nRead2, _) = FileStats.skippingRead(
      spark, root2, "o_custkey", -100L, -50L)
    assert(nRead2 === 0)
    assert(df2.columns.contains("o_custkey") && df2.count() === 0)
  }

  test("bloom tier: point lookups prune an unsorted layout, no false skip on ANY key") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-filestats-bloom").toString
    // long + string keys, hash-scattered so min/max ranges are useless
    val rows = (0L until 1000L).map(i => (i, s"k$i", i % 7)).toDF(
      "id", "name", "grp")
    VersionedParquet.publish(rows.repartition(16, col("id")), root,
      bloomCols = Seq("id", "name"))
    // present long key: pruned read, row found
    val (df, nRead, nTotal) = FileStats.skippingReadPoint(
      spark, root, "id", lit(123L))
    assert(nTotal === 16)
    assert(nRead > 0 && nRead < nTotal,
      s"bloom must prune an unsorted layout: read $nRead of $nTotal")
    assert(df.filter(col("id") === 123L).count() === 1)
    // present string key via the S-typed bloom
    val (dfs, nReadS, _) = FileStats.skippingReadPoint(
      spark, root, "name", lit("k777"))
    assert(nReadS < nTotal && dfs.filter(col("name") === "k777").count() === 1)
    // absent key: (deterministically) near-everything skipped, no rows
    val (dfa, nReadA, _) = FileStats.skippingReadPoint(
      spark, root, "id", lit(-99L))
    assert(nReadA < 4, s"absent key should skip ~all files, read $nReadA")
    assert(dfa.filter(col("id") === -99L).count() === 0)
    // NO false skip on any of the 1000 keys: recompute every key's
    // probe positions in one job with the same shared expression, then
    // check the file that really holds the key is always kept
    val v = VersionedParquet.currentVersion(spark, root).get
    val snap = s"$root/v${"%08d".format(v)}"
    val located = spark.read.parquet(snap)
      .select(input_file_name().as("f"), col("id"),
        FileStats.bloomPos(col("id"), 1).as("p1"),
        FileStats.bloomPos(col("id"), 2).as("p2"))
      .collect()
    val blooms = FileStats.fileStats(spark, root)
      .filter(col("col") === "id" && col("type") === "B")
      .select("file", "min_str").collect()
      .map(r => (r.getString(0), r.getString(1)
        .grouped(16).map(java.lang.Long.parseUnsignedLong(_, 16)).toArray))
      .toMap
    assert(blooms.size === 16)
    located.foreach { r =>
      val file = r.getString(0).split('/').last
      val w = blooms(file)
      def bit(p: Long) = (w(p.toInt >>> 6) >>> (p.toInt & 63) & 1L) == 1L
      assert(bit(r.getLong(2)) && bit(r.getLong(3)),
        s"bloom for $file would falsely skip id ${r.getLong(1)}")
    }
  }

  test("compaction preserves the bloom stat kind and lookups stay correct") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-filestats-bloom-compact").toString
    val rows = (0L until 500L).map(i => (i, i * 3)).toDF("id", "v")
    VersionedParquet.publish(rows.repartition(8, col("id")), root,
      statsCols = Seq("v"), bloomCols = Seq("id"))
    VersionedParquet.compact(spark, root, targetBytes = 4096L)
    val kinds = FileStats.fileStats(spark, root)
      .select("col", "type").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(kinds.contains(("id", "B")) && kinds.contains(("v", "L")),
      s"compaction must recompute both stat kinds, got $kinds")
    val (df, nRead, nTotal) = FileStats.skippingReadPoint(
      spark, root, "id", lit(42L))
    assert(nRead >= 1 && nRead <= nTotal)
    assert(df.filter(col("id") === 42L).count() === 1)
  }
}
