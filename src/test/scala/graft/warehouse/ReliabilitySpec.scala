package graft.warehouse

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SurrogateKey

/** Scale-reliability contracts: the two surrogate-key strategies assign
  * identical keys, and the stage-then-swap write path never corrupts the
  * live table — rerun-safe, failure-safe.
  */
class ReliabilitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    // managed (bucketed) test tables land in a throwaway dir, never the repo
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft-sql-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("zipIndexed surrogate keys are identical to ROW_NUMBER keys") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name")
    val viaWindow = SurrogateKey.rowNumber(cust, "k", Seq(col("c_custkey")))
      .select(col("c_custkey"), col("k").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaZip = SurrogateKey.zipIndexed(cust, "k", Seq(col("c_custkey")))
      .select(col("c_custkey"), col("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaZip.size === viaWindow.size)
    assert(viaZip === viaWindow)
  }

  test("gold dims are identical under reference and scalable key strategies") {
    val now = to_timestamp(lit("2026-01-01 00:00:00"))
    val ref = Gold.build(spark, "/root/reference/datasets", now)
    val scl = Gold.build(spark, "/root/reference/datasets", now, scalableKeys = true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(scl.dimCustomers) === rows(ref.dimCustomers))
    assert(rows(scl.dimProducts) === rows(ref.dimProducts))
  }

  test("bucketed fact tables join with zero shuffle exchanges") {
    val sfDir = "/root/testdata/sf0.001"
    // the warehouse dir persists across JVM runs while the in-memory
    // catalog does not — clear both the table AND any orphan location
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
    }
    Bucketed.write(spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "li_bucketed", "l_orderkey", 8)
    Bucketed.write(spark.read.parquet(s"$sfDir/orders.parquet"),
      "ord_bucketed", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      joined.write.format("noop").mode("overwrite").save()
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val direct = p.collect {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
        }.sum
        val nested = p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            shuffles(a.executedPlan)
        }.sum
        direct + nested
      }
      assert(shuffles(joined.queryExecution.executedPlan) === 0,
        "co-located bucketed join must not exchange either side")
      val plain = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .join(spark.read.parquet(s"$sfDir/orders.parquet"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      assert(joined.count() === plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("atomic overwrite is rerun-safe and a failed write leaves the live table intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-atomic").toString
    val dest = s"$dir/tbl"
    AtomicParquet.overwrite(Seq(1, 2, 3).toDF("x"), dest)
    assert(spark.read.parquet(dest).count() === 3)
    // rerun (truncate-and-reload): new content fully replaces old
    AtomicParquet.overwrite(Seq(4, 5).toDF("x"), dest)
    assert(spark.read.parquet(dest).as[Int].collect().sorted.toSeq === Seq(4, 5))
    // failure mid-write: raise_error fires on the executor during the
    // staging write; the live table must still read the previous rows
    val bad = spark.range(10).select(
      when(col("id") < 5, col("id"))
        .otherwise(raise_error(lit("injected failure"))).as("x"))
    intercept[Exception] { AtomicParquet.overwrite(bad, dest) }
    assert(spark.read.parquet(dest).as[Int].collect().sorted.toSeq === Seq(4, 5))
  }

  test("versioned publish: a concurrent reader never sees a missing or partial table") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-versioned").toString + "/tbl"
    // each version v holds exactly v copies of the value v — so any
    // read that is internally consistent satisfies count == max == min
    def frame(v: Int) = Seq.fill(v)(v).toDF("x")
    VersionedParquet.publish(frame(1), root)
    assert(VersionedParquet.read(spark, root).as[Int].collect().toSeq === Seq(1))

    @volatile var stop = false
    @volatile var failure: Option[String] = None
    val reader = new Thread(() => {
      while (!stop && failure.isEmpty) {
        try {
          val rows = VersionedParquet.read(spark, root).as[Int].collect()
          if (rows.isEmpty || rows.toSet.size != 1 || rows.length != rows.head)
            failure = Some(s"inconsistent read: ${rows.toSeq}")
        } catch {
          case e: Exception => failure = Some(s"reader threw: $e")
        }
      }
    })
    reader.start()
    // minRetainMillis is the production contract under back-to-back
    // publishes: a version younger than the longest possible scan is
    // never retired, so the hammer is deterministically safe — the
    // count-only window (keepVersions - 1 publish intervals) is not,
    // when a loaded host stretches one scan past two publishes.
    try (2 to 8).foreach(v => VersionedParquet.publish(frame(v), root,
      keepVersions = 2, minRetainMillis = 10 * 60 * 1000L))
    finally {
      // stop, then make sure the thread is really gone before the
      // suite moves on: a reader that outlives its join window kept a
      // VersionedParquet.read in flight into JVM shutdown, where
      // Spark's shutdown hook had already stopped the context and the
      // scan died with RejectedExecutionException AFTER the test
      // framework finished (the r16 tests_ok tail noise). Daemonizing
      // is not enough — the read must be interrupted and drained.
      stop = true; reader.join(30000)
      if (reader.isAlive) { reader.interrupt(); reader.join(30000) }
      assert(!reader.isAlive, "hammer reader failed to stop")
    }
    assert(failure.isEmpty, failure.getOrElse(""))
    // the pointer resolves to the last publish; the age guard kept
    // every snapshot (all younger than the retention period)
    assert(VersionedParquet.read(spark, root).as[Int].collect().toSeq ===
      Seq.fill(8)(8))
    assert(VersionedParquet.currentVersion(spark, root) === Some(7L))
    def dirs() = new java.io.File(root).listFiles.filter(_.isDirectory)
      .map(_.getName).filter(_.matches("v\\d{8}")).sorted.toSeq
    assert(dirs() === (0 to 7).map(v => f"v$v%08d"))
    // with the reader drained, age-guarded vacuum still refuses young
    // snapshots; dropping the guard applies the count window
    assert(VersionedParquet.vacuum(spark, root, 2,
      minAgeMillis = 10 * 60 * 1000L) === Nil)
    assert(VersionedParquet.vacuum(spark, root, 2) === (0L to 5L))
    assert(dirs() === Seq("v00000006", "v00000007"))
  }

  test("versioned publish recovers from a crashed (pointer-less) snapshot") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-crash").toString + "/tbl"
    VersionedParquet.publish(Seq(1).toDF("x"), root)
    // simulate a publish that crashed after writing files but before the
    // pointer swap: a garbage v00000001 directory, pointer still at v0
    val stale = new java.io.File(root, "v00000001")
    assert(stale.mkdirs())
    java.nio.file.Files.write(stale.toPath.resolve("junk.parquet"),
      Array[Byte](1, 2, 3))
    assert(VersionedParquet.currentVersion(spark, root) === Some(0L))
    // next publish advances from the POINTER, clobbers the garbage, and
    // the table reads clean before and after
    assert(VersionedParquet.read(spark, root).as[Int].collect().toSeq === Seq(1))
    VersionedParquet.publish(Seq(2, 2).toDF("x"), root)
    assert(VersionedParquet.currentVersion(spark, root) === Some(1L))
    assert(VersionedParquet.read(spark, root).as[Int].collect().toSeq ===
      Seq(2, 2))
  }

  test("pointer loss resolves to the newest complete snapshot") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ptrloss").toString + "/tbl"
    VersionedParquet.publish(Seq(1).toDF("x"), root)
    VersionedParquet.publish(Seq(2, 2).toDF("x"), root)
    // simulate a crash inside the local delete-then-rename window (or a
    // writer death that lost _CURRENT): the pointer is gone, both
    // snapshot dirs are intact
    assert(new java.io.File(root, "_CURRENT").delete())
    // the fallback resolves the newest complete snapshot, so readers
    // never observe "no published version"
    assert(VersionedParquet.currentVersion(spark, root) === Some(1L))
    assert(VersionedParquet.read(spark, root).as[Int].collect().toSeq ===
      Seq(2, 2))
    // and the version sequence stays monotone: the next publish is v2
    VersionedParquet.publish(Seq(3, 3, 3).toDF("x"), root)
    assert(VersionedParquet.currentVersion(spark, root) === Some(2L))
    assert(VersionedParquet.read(spark, root).as[Int].collect().toSeq ===
      Seq(3, 3, 3))
    // an incomplete (no _SUCCESS) higher dir is NOT a fallback target
    val junk = new java.io.File(root, "v00000009")
    assert(junk.mkdirs())
    assert(new java.io.File(root, "_CURRENT").delete())
    assert(VersionedParquet.currentVersion(spark, root) === Some(2L))
  }

  test("time travel pins a version; vacuum respects retention and the live version") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-timetravel").toString + "/tbl"
    (1 to 4).foreach(v =>
      VersionedParquet.publish(Seq.fill(v)(v).toDF("x"), root,
        keepVersions = 10))
    assert(VersionedParquet.versions(spark, root) === Seq(0L, 1L, 2L, 3L))
    // a reader pinned to v1 sees v1's rows even though v3 is live
    assert(VersionedParquet.read(spark, root, Some(1L))
      .as[Int].collect().toSeq === Seq(2, 2))
    assert(VersionedParquet.read(spark, root).as[Int].collect().toSeq ===
      Seq(4, 4, 4, 4))
    // a plan bound to an old version keeps working while a NEW version
    // publishes (read-at-resolve semantics)
    val pinned = VersionedParquet.read(spark, root, Some(2L))
    VersionedParquet.publish(Seq.fill(5)(5).toDF("x"), root, keepVersions = 3)
    assert(pinned.as[Int].collect().toSeq === Seq(3, 3, 3))
    // keepVersions=3 on that publish vacuumed v0/v1 but kept v2..v4
    assert(VersionedParquet.versions(spark, root) === Seq(2L, 3L, 4L))
    // explicit vacuum refuses to delete the live version
    intercept[IllegalArgumentException] {
      VersionedParquet.vacuum(spark, root, 0)
    }
    assert(VersionedParquet.vacuum(spark, root, 1) === Seq(2L, 3L))
    assert(VersionedParquet.versions(spark, root) === Seq(4L))
    // pinning a vacuumed version fails loudly at resolution time
    intercept[java.io.IOException] {
      VersionedParquet.read(spark, root, Some(1L))
    }
  }

  test("warehouse snapshot: a reader joining fact and dims never sees mixed versions") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-snapshot").toString + "/wh"
    // version v tags every row of BOTH tables with v — any join whose
    // two sides disagree on the tag is a torn (mixed-version) snapshot
    def dim(v: Int) = (0 until 10).map(id => (id, v)).toDF("id", "dim_ver")
    def fact(v: Int) =
      (0 until 100).map(i => (i % 10, v)).toDF("id", "fact_ver")
    def snap(v: Int) = Seq("dim" -> dim(v), "fact" -> fact(v))

    WarehouseSnapshot.publishAll(snap(1), root, keepSnapshots = 4)
    def readTags(): Array[(Int, Int)] = {
      val s = WarehouseSnapshot.readSnapshot(spark, root)
      s("fact").join(s("dim"), "id")
        .select("fact_ver", "dim_ver").distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1)))
    }
    readTags() // warm codegen so reader iterations fit the grace window
    @volatile var stop = false
    @volatile var failure: Option[String] = None
    val reader = new Thread(() => {
      while (!stop && failure.isEmpty) {
        try {
          val pairs = readTags()
          if (pairs.length != 1 || pairs.head._1 != pairs.head._2)
            failure = Some(s"torn snapshot: ${pairs.toSeq}")
        } catch {
          case e: Exception => failure = Some(s"reader threw: $e")
        }
      }
    })
    reader.start()
    // minRetainMillis makes the hammer deterministically safe (nothing
    // young enough to hold an in-flight scan is retired — the table-
    // format VACUUM retention-period contract); the count window alone
    // is only keepSnapshots - 1 publish intervals of grace, which a
    // loaded host can shrink below one scan
    try (2 to 8).foreach(v =>
      WarehouseSnapshot.publishAll(snap(v), root, keepSnapshots = 4,
        minRetainMillis = 10 * 60 * 1000L))
    finally {
      // stop, then make sure the thread is really gone before the
      // suite moves on: a reader that outlives its join window kept a
      // VersionedParquet.read in flight into JVM shutdown, where
      // Spark's shutdown hook had already stopped the context and the
      // scan died with RejectedExecutionException AFTER the test
      // framework finished (the r16 tests_ok tail noise). Daemonizing
      // is not enough — the read must be interrupted and drained.
      stop = true; reader.join(30000)
      if (reader.isAlive) { reader.interrupt(); reader.join(30000) }
      assert(!reader.isAlive, "hammer reader failed to stop")
    }
    assert(failure.isEmpty, failure.getOrElse(""))
    assert(WarehouseSnapshot.currentManifest(spark, root) === Some(7L))

    // with the reader drained, a count-window publish applies
    // manifest-driven retention: newest 4 manifests kept, and each
    // table keeps exactly the versions those manifests pin
    WarehouseSnapshot.publishAll(snap(9), root, keepSnapshots = 4)
    assert(WarehouseSnapshot.currentManifest(spark, root) === Some(8L))
    def vdirs(t: String) = new java.io.File(s"$root/tables/$t").listFiles
      .filter(_.isDirectory).map(_.getName).filter(_.matches("v\\d{8}"))
      .sorted.toSeq
    assert(vdirs("dim") === (5 to 8).map(v => f"v$v%08d"))
    assert(vdirs("fact") === (5 to 8).map(v => f"v$v%08d"))
    val manifests = new java.io.File(s"$root/_manifests").listFiles
      .map(_.getName).filter(_.matches("m\\d{8}")).sorted.toSeq
    assert(manifests === (5 to 8).map(m => f"m$m%08d"))

    // snapshot time travel: the previous manifest still reads as a
    // consistent set
    val old = WarehouseSnapshot.readSnapshot(spark, root, at = Some(6L))
    assert(old("dim").select("dim_ver").distinct()
      .as[Int].collect().toSeq === Seq(7))

    // a crashed publishAll (staged table version, manifest pointer
    // never swapped) is invisible: readers keep resolving the complete
    // previous snapshot
    VersionedParquet.publish(fact(99), s"$root/tables/fact",
      keepVersions = Int.MaxValue)
    val s = WarehouseSnapshot.readSnapshot(spark, root)
    assert(s("fact").select("fact_ver").distinct()
      .as[Int].collect().toSeq === Seq(9))
  }

  test("manifest recovery ignores staging and stray files in _manifests") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-manifest-stray").toString + "/wh"
    WarehouseSnapshot.publishAll(Seq("t" -> Seq(1).toDF("x")), root)
    WarehouseSnapshot.publishAll(Seq("t" -> Seq(2).toDF("x")), root)
    // simulate a crash mid-manifest-write (staging temp left behind) and
    // unrelated junk: neither may ever resolve as a manifest
    val mdir = new java.io.File(s"$root/_manifests")
    java.nio.file.Files.write(mdir.toPath.resolve(".m00000099.tmp"),
      "t\tv99".getBytes)
    java.nio.file.Files.write(mdir.toPath.resolve("junk"),
      "torn\tgarbage\nhalf-a-li".getBytes)
    // pointer lost (the very window the disk fallback exists for)
    assert(new java.io.File(root, "_MANIFEST").delete())
    assert(WarehouseSnapshot.currentManifest(spark, root) === Some(1L))
    val snap = WarehouseSnapshot.readSnapshot(spark, root)
    assert(snap("t").as[Int].collect().toSeq === Seq(2))
  }

  test("pinned version read refuses a crash-orphaned snapshot without _SUCCESS") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-orphan-pin").toString + "/tbl"
    VersionedParquet.publish(Seq(1, 2).toDF("x"), root)
    // a parquet write that crashed before its _SUCCESS commit: directory
    // exists, data may be partial
    val orphan = new java.io.File(root, "v00000001")
    assert(orphan.mkdirs())
    java.nio.file.Files.write(
      orphan.toPath.resolve("part-00000.parquet"), Array[Byte](0, 1, 2))
    // versions()/currentVersion already exclude it; the pinned read must
    // fail loudly too, not resolve partial data
    assert(VersionedParquet.versions(spark, root) === Seq(0L))
    val e = intercept[java.io.IOException] {
      VersionedParquet.read(spark, root, Some(1L))
    }
    assert(e.getMessage.contains("incomplete"))
    assert(VersionedParquet.read(spark, root, Some(0L))
      .as[Int].collect().sorted.toSeq === Seq(1, 2))
  }

  test("versioned compaction rewrites small files into few, content unchanged") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact").toString + "/tbl"
    // simulate streaming-append small-file debt: 48 tiny files
    VersionedParquet.publish(
      spark.range(10000).toDF("x").repartition(48), root)
    def parquetFiles(v: Long) =
      new java.io.File(root, f"v$v%08d").listFiles
        .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(0) === 48)
    VersionedParquet.compact(spark, root) // default target >> table size
    assert(VersionedParquet.currentVersion(spark, root) === Some(1L))
    assert(parquetFiles(1) === 1, "compaction must collapse the file debt")
    assert(VersionedParquet.read(spark, root).as[Long].collect().sorted.toSeq
      === (0L until 10000L))

    // a Hive-partitioned table compacts WITHOUT losing its layout
    val proot = Files.createTempDirectory("graft-compact-part").toString + "/tbl"
    val frame = spark.range(1000)
      .select(col("id").as("x"), (col("id") % 4).as("part"))
    VersionedParquet.publish(frame.repartition(32), proot, Seq("part"))
    VersionedParquet.compact(spark, proot, partitionCols = Seq("part"))
    val dirs = new java.io.File(proot, "v00000001").listFiles
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("part=0", "part=1", "part=2", "part=3"),
      "compacted snapshot must keep the partition directories")
    assert(VersionedParquet.read(spark, proot).count() === 1000)
  }

  test("partitioned write path: year predicates prune partitions at the scan") {
    val dir = Files.createTempDirectory("graft-partitioned").toString
    val dest = s"$dir/orders_by_year"
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    AtomicParquet.overwritePartitioned(orders, dest, Seq("o_year"))
    val filtered = spark.read.parquet(dest).filter(col("o_year") === 1995)
    filtered.write.format("noop").mode("overwrite").save()
    val scans = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.metadata.get("PartitionFilters")
        .exists(_.contains("o_year")),
      "the year predicate must prune Hive-style partitions, not filter rows")
    // the pruned scan reads exactly the one year's directory
    assert(scans.head.inputRDDs().map(_.getNumPartitions).sum > 0)
    val expected = orders.filter(col("o_year") === 1995).count()
    assert(filtered.count() === expected)
    // rerun-safety still holds for the partitioned layout
    AtomicParquet.overwritePartitioned(
      orders.filter(col("o_year") === 1996), dest, Seq("o_year"))
    assert(spark.read.parquet(dest).select("o_year").distinct().count() === 1)
  }

  test("CHECK-constrained publish is publish-or-nothing") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-constraints").toString + "/t"
    val checks = Seq("qty >= 0", "code IS NOT NULL")
    VersionedParquet.publish(
      Seq((1L, "a", 5L), (2L, "b", 0L)).toDF("id", "code", "qty"),
      root, constraints = checks)
    assert(VersionedParquet.currentVersion(spark, root) === Some(0L))
    // the accepted contract is recorded atomically with the version
    assert(VersionedParquet.snapshotMarker(spark, root,
      VersionedParquet.CONSTRAINTS_MARKER).map(_.split('\n').toSeq)
      === Some(checks))

    // a violating publish must throw, advance nothing, and leave no
    // staged directory for the recovery scan to mistake for a version
    val ex = intercept[java.io.IOException] {
      VersionedParquet.publish(
        Seq((3L, "c", -1L), (4L, null, 2L)).toDF("id", "code", "qty"),
        root, constraints = checks)
    }
    assert(ex.getMessage.contains("qty >= 0") &&
      ex.getMessage.contains("code IS NOT NULL"))
    assert(VersionedParquet.currentVersion(spark, root) === Some(0L))
    assert(VersionedParquet.read(spark, root).count() === 2,
      "live table untouched by the rejected publish")
    assert(VersionedParquet.versions(spark, root) === Seq(0L),
      "no staged residue becomes a resolvable version")

    // SQL CHECK semantics: NULL passes (only FALSE violates) — a null
    // qty row publishes fine under qty >= 0
    VersionedParquet.publish(
      Seq((5L, "d", null.asInstanceOf[java.lang.Long]))
        .toDF("id", "code", "qty"),
      root, constraints = Seq("qty >= 0"))
    assert(VersionedParquet.currentVersion(spark, root) === Some(1L))
  }

  test("snapshot-or-nothing: one table's CHECK violation rejects the whole manifest") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-snap-check").toString + "/wh"
    def t(v: Long) = Seq((1L, v), (2L, v)).toDF("id", "qty")
    val m0 = WarehouseSnapshot.publishAll(
      Seq("a" -> t(5), "b" -> t(6)), root,
      constraints = Map("b" -> Seq("qty >= 0")))
    // second snapshot: table a is fine, table b violates — the manifest
    // must not advance and BOTH tables must keep resolving from m0
    intercept[java.io.IOException] {
      WarehouseSnapshot.publishAll(
        Seq("a" -> t(7), "b" -> t(-1)), root,
        constraints = Map("b" -> Seq("qty >= 0")))
    }
    assert(WarehouseSnapshot.currentManifest(spark, root) === Some(m0))
    val s = WarehouseSnapshot.readSnapshot(spark, root)
    assert(s("a").select("qty").head().getLong(0) === 5L,
      "table a must still resolve from the old manifest, not the orphan")
    assert(s("b").select("qty").head().getLong(0) === 6L)
    // and a clean retry publishes normally
    val m2 = WarehouseSnapshot.publishAll(
      Seq("a" -> t(7), "b" -> t(8)), root,
      constraints = Map("b" -> Seq("qty >= 0")))
    assert(m2 === m0 + 1)
  }

  test("snapshot time travel aligns across an add-column schema change") {
    import spark.implicits._
    // q120 proves the single-table alignment; this pins the WAREHOUSE
    // tier: a historical manifest resolved with readSnapshot(at=...)
    // must null-fill columns the snapshot predates — live column
    // order, typed nulls — so cross-manifest diffs (the q95 shape, one
    // level up) stay schema-compatible after the warehouse evolves.
    val root = Files.createTempDirectory("graft-snap-evolve").toString + "/wh"
    val d0 = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val m0 = WarehouseSnapshot.publishAll(Seq("docs" -> d0), root,
      keepSnapshots = 4)
    val d1 = Seq((1, "a", 10L), (3, "c", 30L)).toDF("id", "name", "score")
    WarehouseSnapshot.publishAll(Seq("docs" -> d1), root, keepSnapshots = 4)

    val pinned = WarehouseSnapshot.readSnapshot(spark, root, Some(m0))("docs")
    assert(pinned.columns.toSeq === Seq("id", "name", "score"),
      "pinned snapshot must align to the live column order")
    assert(pinned.schema("score").dataType ===
      org.apache.spark.sql.types.LongType, "added column keeps its type")
    val rows = pinned.collect()
    assert(rows.length === 2 && rows.forall(_.isNullAt(2)),
      "columns the snapshot predates read as nulls")
    // and the cross-manifest diff is union-compatible across the change
    val live = WarehouseSnapshot.readSnapshot(spark, root)("docs")
    assert(live.unionByName(pinned).count() === 4)
  }
}
