package graft.warehouse

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Optimistic multi-writer concurrency contract:
  *   - two writers on DISJOINT partitions stage concurrently and both
  *     commit exactly once (no blocking failure, no lost update);
  *   - a CONFLICTING pair resolves loser-retries-and-wins: the loser's
  *     commit attempt detects the intervening commit, re-stages
  *     against the new live version, and lands on attempt 2 with
  *     exactly the state a serial execution would produce;
  *   - appends rebase over anything except whole-table commits;
  *   - maxAttempts exhaustion raises CommitConflictException and the
  *     table is untouched by the loser;
  *   - every optimistic commit leaves the same tier invariants the
  *     single-writer ops guarantee (read ≡ serial replay, CDF apply
  *     invariant, O(changes) metadata).
  */
class OptimisticSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-occ-$tag")
      .toString + "/t"

  private def seed(root: String, parts: Boolean = true): Unit = {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"p${i % 3}", i * 10))
      .toDF("id", "part", "x")
    VersionedParquet.publish(df, root,
      partitionCols = if (parts) Seq("part") else Nil, keepVersions = 20)
  }

  private def state(root: String): Set[(Long, String, Long)] =
    VersionedParquet.read(spark, root).select("id", "part", "x")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet

  private def noHook[T](body: => T): T =
    try body finally Optimistic.afterStage = () => ()

  test("disjoint partition overwrites: both concurrent writers commit exactly once") {
    import spark.implicits._
    val root = tmp("disjoint")
    seed(root)
    val gate = new CountDownLatch(2) // both must have STAGED before either commits
    Optimistic.afterStage = () => {
      gate.countDown(); gate.await(60, TimeUnit.SECONDS); ()
    }
    noHook {
      val pool = Executors.newFixedThreadPool(2)
      val a = pool.submit(() => Optimistic.overwritePartitions(spark, root,
        (0L until 50L).map(i => (i + 1000L, "p0", 7L))
          .toDF("id", "part", "x"), keepVersions = 20))
      val b = pool.submit(() => Optimistic.overwritePartitions(spark, root,
        (0L until 40L).map(i => (i + 2000L, "p2", 9L))
          .toDF("id", "part", "x"), keepVersions = 20))
      val (ca, cb) = (a.get(120, TimeUnit.SECONDS),
        b.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      // both committed, to different versions, each exactly once
      assert(Set(ca.version, cb.version) === Set(1L, 2L))
      // the second to commit rebased over the first (disjoint domains,
      // zero user-visible retries: attempts stays 1 for BOTH)
      assert(ca.attempts === 1 && cb.attempts === 1,
        s"disjoint writers must not retry (got ${ca.attempts}/${cb.attempts})")
      val expected =
        (0L until 300L).filter(i => i % 3 == 1)
          .map(i => (i, s"p${i % 3}", i * 10)).toSet ++
          (0L until 50L).map(i => (i + 1000L, "p0", 7L)) ++
          (0L until 40L).map(i => (i + 2000L, "p2", 9L))
      assert(state(root) === expected,
        "final state must equal both overwrites applied")
    }
  }

  test("conflicting overwrites of the SAME partition: loser retries and wins") {
    import spark.implicits._
    val root = tmp("clash")
    seed(root)
    // deterministic conflict: after the loser stages, a competing
    // overwrite of the SAME partition commits first
    @volatile var fired = false
    Optimistic.afterStage = () => {
      if (!fired) {
        fired = true
        VersionedParquet.overwritePartitions(spark, root,
          (0L until 30L).map(i => (i + 5000L, "p1", 1L))
            .toDF("id", "part", "x"), keepVersions = 20)
      }
    }
    noHook {
      val c = Optimistic.overwritePartitions(spark, root,
        (0L until 20L).map(i => (i + 6000L, "p1", 2L))
          .toDF("id", "part", "x"), keepVersions = 20)
      assert(c.attempts === 2,
        s"the loser must detect the conflict and retry (got ${c.attempts})")
      assert(c.version === 2L)
      // serial order = commit order: the retried overwrite lands LAST,
      // so p1 holds only its rows
      val expected =
        (0L until 300L).filterNot(i => i % 3 == 1)
          .map(i => (i, s"p${i % 3}", i * 10)).toSet ++
          (0L until 20L).map(i => (i + 6000L, "p1", 2L))
      assert(state(root) === expected)
    }
  }

  test("conflicting merges: loser re-stages against the winner's state and wins") {
    import spark.implicits._
    val root = tmp("merge")
    seed(root, parts = false)
    // winner updates key 5 while the loser (updating key 7) is staged
    @volatile var fired = false
    Optimistic.afterStage = () => {
      if (!fired) {
        fired = true
        VersionedParquet.upsert(spark, root,
          Seq((5L, "p2", 555L)).toDF("id", "part", "x"), Seq("id"),
          keepVersions = 20)
      }
    }
    noHook {
      val c = Optimistic.upsert(spark, root,
        Seq((7L, "p1", 777L), (9000L, "p0", 1L)).toDF("id", "part", "x"),
        Seq("id"), keepVersions = 20)
      assert(c.attempts === 2,
        s"any intervening commit conflicts with a merge (got ${c.attempts})")
      val expected =
        (0L until 300L).filterNot(i => i == 5L || i == 7L)
          .map(i => (i, s"p${i % 3}", i * 10)).toSet ++
          Set((5L, "p2", 555L), (7L, "p1", 777L), (9000L, "p0", 1L))
      assert(state(root) === expected,
        "both merges must be applied, serialized by commit order")
      // CDF continuity: the loser's feed was re-staged against the
      // winner's version, so replaying v1+v2 reproduces both writes
      val feed = VersionedParquet.changes(spark, root, 0L, 2L)
      val upserted = feed.filter(col("_change_type").isin(
        "update_post", "insert")).select("id").collect()
        .map(_.getLong(0)).toSet
      assert(upserted === Set(5L, 7L, 9000L))
    }
  }

  test("key-disjoint concurrent merges both commit on their first attempt") {
    import spark.implicits._
    val root = tmp("disjoint-merge")
    seed(root, parts = false)
    val gate = new CountDownLatch(2) // both staged before either commits
    Optimistic.afterStage = () => {
      gate.countDown(); gate.await(60, TimeUnit.SECONDS); ()
    }
    noHook {
      val pool = Executors.newFixedThreadPool(2)
      val a = pool.submit(() => Optimistic.upsert(spark, root,
        (0L until 10L).map(i => (i, "pa", 1000L + i))
          .toDF("id", "part", "x"), Seq("id"), keepVersions = 20))
      val b = pool.submit(() => Optimistic.upsert(spark, root,
        (100L until 110L).map(i => (i, "pb", 2000L + i))
          .toDF("id", "part", "x"), Seq("id"), keepVersions = 20))
      val (ca, cb) = (a.get(120, TimeUnit.SECONDS),
        b.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      assert(Set(ca.version, cb.version) === Set(1L, 2L))
      assert(ca.attempts === 1 && cb.attempts === 1,
        "provably key-disjoint merges must rebase, not re-stage " +
          s"(got ${ca.attempts}/${cb.attempts})")
      val expected =
        (0L until 300L).filterNot(i => i < 10L ||
            (i >= 100L && i < 110L))
          .map(i => (i, s"p${i % 3}", i * 10)).toSet ++
          (0L until 10L).map(i => (i, "pa", 1000L + i)) ++
          (100L until 110L).map(i => (i, "pb", 2000L + i))
      assert(state(root) === expected)
      // the rebased writer's feed stayed exact: full replay works
      val feed = VersionedParquet.changes(spark, root, 0L, 2L)
      assert(feed.filter(col("_change_type") === "update_post")
        .count() === 20L)
    }
  }

  test("overlapping-key concurrent merges: the loser re-stages") {
    import spark.implicits._
    val root = tmp("overlap-merge")
    seed(root, parts = false)
    @volatile var fired = false
    Optimistic.afterStage = () => {
      if (!fired) {
        fired = true // the inner upsert must not recurse into the hook
        Optimistic.upsert(spark, root,
          Seq((5L, "pw", 555L)).toDF("id", "part", "x"), Seq("id"),
          keepVersions = 20)
      }
    }
    noHook {
      val c = Optimistic.upsert(spark, root,
        Seq((5L, "pl", 777L)).toDF("id", "part", "x"), Seq("id"),
        keepVersions = 20)
      assert(c.attempts === 2,
        s"same-key merges must conflict (got ${c.attempts})")
      // commit order wins: the retried merge's image is final
      assert(state(root).contains((5L, "pl", 777L)))
      assert(!state(root).exists(r => r._1 == 5L && r._2 == "pw"))
    }
  }

  test("append rebases over an intervening disjoint overwrite without retrying") {
    import spark.implicits._
    val root = tmp("append-rebase")
    seed(root)
    @volatile var fired = false
    Optimistic.afterStage = () => {
      if (!fired) {
        fired = true
        VersionedParquet.overwritePartitions(spark, root,
          (0L until 10L).map(i => (i + 8000L, "p0", 3L))
            .toDF("id", "part", "x"), keepVersions = 20)
      }
    }
    noHook {
      val c = Optimistic.append(spark, root,
        (0L until 5L).map(i => (i + 7000L, "p1", 4L))
          .toDF("id", "part", "x"), keepVersions = 20)
      assert(c.attempts === 1,
        "an append rebases over a partition overwrite with no retry")
      assert(c.version === 2L)
      val expected =
        (0L until 300L).filterNot(i => i % 3 == 0)
          .map(i => (i, s"p${i % 3}", i * 10)).toSet ++
          (0L until 10L).map(i => (i + 8000L, "p0", 3L)) ++
          (0L until 5L).map(i => (i + 7000L, "p1", 4L))
      assert(state(root) === expected)
    }
  }

  test("append conflicts with a whole-table commit, re-validates, and wins") {
    import spark.implicits._
    val root = tmp("append-table")
    seed(root, parts = false)
    @volatile var fired = false
    Optimistic.afterStage = () => {
      if (!fired) {
        fired = true
        VersionedParquet.delete(spark, root, col("id") < 10L,
          keepVersions = 20)
      }
    }
    noHook {
      val c = Optimistic.append(spark, root,
        Seq((9999L, "p0", 42L)).toDF("id", "part", "x"),
        keepVersions = 20)
      assert(c.attempts === 2,
        "a whole-table commit must force the append to re-validate")
      val expected =
        (10L until 300L).map(i => (i, s"p${i % 3}", i * 10)).toSet +
          ((9999L, "p0", 42L))
      assert(state(root) === expected)
    }
  }

  test("maxAttempts exhaustion raises CommitConflictException, table untouched") {
    import spark.implicits._
    val root = tmp("exhaust")
    seed(root, parts = false)
    // EVERY stage pass is followed by a competing commit → the merge
    // can never land within its attempt budget
    var n = 0L
    Optimistic.afterStage = () => {
      n += 1
      VersionedParquet.upsert(spark, root,
        Seq((n, "px", -n)).toDF("id", "part", "x"), Seq("id"),
        keepVersions = 50)
    }
    noHook {
      val e = intercept[Optimistic.CommitConflictException] {
        Optimistic.upsert(spark, root,
          Seq((250L, "p9", 0L)).toDF("id", "part", "x"), Seq("id"),
          keepVersions = 50, maxAttempts = 2)
      }
      assert(e.getMessage.contains("gave up"))
      // the loser's merge left no trace — key 250 keeps its original
      // image and the staging area is cleaned up
      assert(state(root).contains((250L, "p1", 2500L)))
      assert(VersionedParquet.read(spark, root)
        .filter(col("part") === "p9").count() === 0L,
        "the failed merge must leave no trace")
    }
  }

  test("N concurrent appends all commit; final state is the full multiset") {
    import spark.implicits._
    val root = tmp("n-appends")
    seed(root, parts = false)
    val writers = 4
    val gate = new CountDownLatch(writers)
    Optimistic.afterStage = () => {
      gate.countDown(); gate.await(60, TimeUnit.SECONDS); ()
    }
    noHook {
      val pool = Executors.newFixedThreadPool(writers)
      val futures = (0 until writers).map { w =>
        pool.submit(() => Optimistic.append(spark, root,
          (0L until 25L).map(i => (10000L + w * 100L + i, s"w$w", 1L))
            .toDF("id", "part", "x"), keepVersions = 20))
      }
      val commits = futures.map(_.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      assert(commits.map(_.version).toSet === (1L to writers.toLong).toSet,
        "every writer commits exactly one version")
      assert(commits.forall(_.attempts === 1),
        "appends never conflict with appends")
      val appended = VersionedParquet.read(spark, root)
        .filter(col("id") >= 10000L).count()
      assert(appended === writers * 25L)
      assert(VersionedParquet.read(spark, root).count() === 300L +
        writers * 25L)
    }
  }

  test("optimistic and legacy single-writer ops interleave safely") {
    import spark.implicits._
    val root = tmp("mixed")
    seed(root)
    noHook {
      Optimistic.append(spark, root,
        Seq((20000L, "p0", 1L)).toDF("id", "part", "x"),
        keepVersions = 20)
      VersionedParquet.append(spark, root,
        Seq((20001L, "p1", 2L)).toDF("id", "part", "x"),
        keepVersions = 20)
      val c = Optimistic.overwritePartitions(spark, root,
        Seq((20002L, "p2", 3L)).toDF("id", "part", "x"),
        keepVersions = 20)
      assert(c.version === 3L)
      val expected =
        (0L until 300L).filterNot(_ % 3 == 2)
          .map(i => (i, s"p${i % 3}", i * 10)).toSet ++
          Set((20000L, "p0", 1L), (20001L, "p1", 2L), (20002L, "p2", 3L))
      assert(state(root) === expected)
    }
  }

  test("key-disjoint concurrent UPDATEs both commit on attempt 1") {
    val root = tmp("disjoint-update")
    seed(root, parts = false)
    val gate = new CountDownLatch(2) // both staged before either commits
    Optimistic.afterStage = () => {
      gate.countDown(); gate.await(60, TimeUnit.SECONDS); ()
    }
    noHook {
      val pool = Executors.newFixedThreadPool(2)
      // disjoint predicates on id (the key), disjoint SET targets that
      // neither predicate reads — the provably-composable case
      val a = pool.submit(() => Optimistic.updateWhere(spark, root,
        col("id") < 10L, Map("x" -> lit(111L)), Seq("id"),
        keepVersions = 20))
      val b = pool.submit(() => Optimistic.updateWhere(spark, root,
        col("id") >= 100L && col("id") < 110L,
        Map("part" -> lit("pz")), Seq("id"), keepVersions = 20))
      val (ca, cb) = (a.get(120, TimeUnit.SECONDS),
        b.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      assert(Set(ca.version, cb.version) === Set(1L, 2L))
      assert(ca.attempts === 1 && cb.attempts === 1,
        "provably disjoint predicate UPDATEs must rebase, not " +
          s"re-stage (got ${ca.attempts}/${cb.attempts})")
      val expected =
        (0L until 300L).filterNot(i => i < 10L ||
            (i >= 100L && i < 110L))
          .map(i => (i, s"p${i % 3}", i * 10)).toSet ++
          (0L until 10L).map(i => (i, s"p${i % 3}", 111L)) ++
          (100L until 110L).map(i => (i, "pz", i * 10))
      assert(state(root) === expected,
        "final state must equal both updates applied")
    }
  }

  test("three concurrent disjoint predicate-DML writers (2 UPDATEs + " +
    "1 DELETE) all commit on attempt 1, any commit order") {
    val root = tmp("three-dml")
    seed(root, parts = false)
    val gate = new CountDownLatch(3) // all staged before any commits
    Optimistic.afterStage = () => {
      gate.countDown(); gate.await(60, TimeUnit.SECONDS); ()
    }
    noHook {
      val pool = Executors.newFixedThreadPool(3)
      val a = pool.submit(() => Optimistic.updateWhere(spark, root,
        col("id") < 8L, Map("x" -> lit(1L)), Seq("id"),
        keepVersions = 20))
      val b = pool.submit(() => Optimistic.updateWhere(spark, root,
        col("id") >= 100L && col("id") < 108L,
        Map("part" -> lit("pq")), Seq("id"), keepVersions = 20))
      val c = pool.submit(() => Optimistic.deleteWhere(spark, root,
        col("id") >= 290L, Seq("id"), keepVersions = 20))
      val commits = Seq(a, b, c).map(_.get(180, TimeUnit.SECONDS))
      pool.shutdown()
      assert(commits.map(_.version).toSet === Set(1L, 2L, 3L),
        "each writer mints exactly one version")
      assert(commits.forall(_.attempts === 1),
        "all three provably-disjoint DMLs must rebase " +
          s"(got ${commits.map(_.attempts).mkString("/")})")
      val expected =
        (0L until 290L).filterNot(i => i < 8L ||
            (i >= 100L && i < 108L))
          .map(i => (i, s"p${i % 3}", i * 10)).toSet ++
          (0L until 8L).map(i => (i, s"p${i % 3}", 1L)) ++
          (100L until 108L).map(i => (i, "pq", i * 10))
      assert(state(root) === expected,
        "final state must equal all three DMLs applied")
      // the change feed stayed exact through every rebase: replay
      // counts match the three ops' row masses
      val feed = VersionedParquet.changes(spark, root, 0L, 3L)
      assert(feed.filter(col("_change_type") === "update_post")
        .count() === 16L)
      assert(feed.filter(col("_change_type") === "delete")
        .count() === 10L)
    }
  }

  test("disjoint UPDATE composes with disjoint DELETE; an UPDATE " +
    "whose SET feeds the other's predicate re-stages") {
    val root = tmp("update-delete-mix")
    seed(root, parts = false)
    // 1) disjoint UPDATE then DELETE race: both land, delete re-derives
    @volatile var fired = false
    Optimistic.afterStage = () => {
      if (!fired) {
        fired = true
        Optimistic.updateWhere(spark, root, col("id") < 5L,
          Map("x" -> lit(7L)), Seq("id"), keepVersions = 20)
      }
    }
    noHook {
      val c = Optimistic.deleteWhere(spark, root,
        col("id") >= 290L, Seq("id"), keepVersions = 20)
      assert(c.attempts === 1,
        s"key-disjoint DELETE must rebase over the UPDATE " +
          s"(got ${c.attempts})")
      assert(VersionedParquet.read(spark, root).count() === 290L)
      assert(VersionedParquet.read(spark, root)
        .filter(col("id") < 5L && col("x") === 7L).count() === 5L)
    }
    // 2) cross-column hazard: their SET writes x, my predicate READS
    // x — their post-images could enter my match set, so I must
    // re-stage even though the touched keys are disjoint
    fired = false
    Optimistic.afterStage = () => {
      if (!fired) {
        fired = true
        Optimistic.updateWhere(spark, root, col("id") === 50L,
          Map("x" -> lit(999999L)), Seq("id"), keepVersions = 20)
      }
    }
    noHook {
      val c2 = Optimistic.updateWhere(spark, root,
        col("x") === 999999L && col("id") < 10L,
        Map("part" -> lit("px")), Seq("id"), keepVersions = 20)
      assert(c2.attempts === 2,
        "an intervening SET of my predicate column must force a " +
          s"re-stage (got ${c2.attempts})")
    }
    // 3) UPDATE may not SET its own key column
    noHook {
      val e = intercept[IllegalArgumentException] {
        Optimistic.updateWhere(spark, root, col("id") === 1L,
          Map("id" -> lit(9999L)), Seq("id"), keepVersions = 20)
      }
      assert(e.getMessage.contains("key column"))
    }
  }
}
