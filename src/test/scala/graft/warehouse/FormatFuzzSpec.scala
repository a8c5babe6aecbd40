package graft.warehouse

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-based fuzz over the whole DML matrix: a deterministic random
  * chain of {upsert, deleteWhere, updateWhere, append, restore,
  * compactSmallFiles} runs against both the versioned format and a
  * driver-side reference model. After EVERY step the live read must
  * equal the model, the step's change feed must replay the previous
  * version into the new one as multisets, and at the end every
  * retained version must time-travel to its recorded model state.
  * Single targeted specs prove each op; this proves their
  * COMPOSITIONS — where overlay-carrying bugs (a vector dropped by an
  * append, a delta row resurrected by a restore, an exclusion manifest
  * lost by an update) actually live.
  */
class FormatFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private type Row3 = (Long, Long, Long) // (id, grp, x)

  private def toDf(rows: Seq[Row3]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "grp", "x")
  }

  private def bag(df: DataFrame): Map[Row3, Long] =
    df.groupBy("id", "grp", "x").count()
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2)) -> r.getLong(3)).toMap

  private def modelBag(m: Map[Long, (Long, Long)]): Map[Row3, Long] =
    m.map { case (id, (g, x)) => (id, g, x) -> 1L }

  test("random DML chains: live == model, feeds replay, time travel holds") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-format-fuzz").toString
    val rng = new scala.util.Random(42)
    var nextId = 0L
    def fresh(n: Int): Seq[Long] = {
      val ids = (nextId until nextId + n); nextId += n; ids
    }

    // model state, and its value at every published version
    var model = Map.empty[Long, (Long, Long)]
    val history = mutable.ArrayBuffer.empty[Map[Long, (Long, Long)]]

    val init = fresh(300).map(i => (i, rng.nextInt(7).toLong,
      rng.nextInt(1000).toLong))
    model = init.map { case (i, g, x) => i -> (g, x) }.toMap
    VersionedParquet.publish(toDf(init).repartition(3), root,
      keepVersions = 50)
    history += model

    def stepCheck(): Unit = {
      history += model
      val v = history.length - 1
      // protocol invariant: whatever the episode just wrote, the
      // _PROTOCOL declaration must (a) stay within this build's
      // supported set — our own writers can never strand our own
      // readers — and (b) the read below must pass the gate
      assert(VersionedParquet.readerFeatures(spark, root).toSet
          .subsetOf(VersionedParquet.SupportedReaderFeatures),
        s"v$v declares an unsupported feature: " +
          VersionedParquet.readerFeatures(spark, root))
      assert(bag(VersionedParquet.read(spark, root)) === modelBag(model),
        s"live read diverged from the model at version $v")
      // feed apply invariant v-1 → v (an explicitly-empty feed —
      // compaction — passes trivially)
      val feed = VersionedParquet.changes(spark, root, v - 1L, v.toLong)
        .collect()
      val minus = feed.filter(r => Seq("update_pre", "delete")
        .contains(r.getString(3)))
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val plus = feed.filter(r => Seq("update_post", "insert")
        .contains(r.getString(3)))
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      var work = bag(VersionedParquet.read(spark, root, Some(v - 1L)))
      minus.foreach { k =>
        val left = work.getOrElse(k, 0L) - 1
        assert(left >= 0, s"feed removes $k absent at v${v - 1}")
        work = if (left == 0) work - k else work + (k -> left)
      }
      plus.foreach(k => work = work + (k -> (work.getOrElse(k, 0L) + 1)))
      assert(work === modelBag(model),
        s"feed must replay v${v - 1} into v$v")
    }

    for (step <- 1 to 18) {
      rng.nextInt(6) match {
        case 0 => // keyed upsert: updates + inserts
          val updIds = rng.shuffle(model.keys.toSeq)
            .take(1 + rng.nextInt(30))
          val upd = updIds.map(i => (i, model(i)._1,
            model(i)._2 + 10000 + step))
          val ins = fresh(1 + rng.nextInt(20)).map(i =>
            (i, rng.nextInt(7).toLong, rng.nextInt(1000).toLong))
          VersionedParquet.upsert(spark, root, toDf(upd ++ ins),
            Seq("id"), keepVersions = 50)
          model = model ++ (upd ++ ins).map { case (i, g, x) =>
            i -> (g, x) }
          stepCheck()
        case 1 => // predicate delete
          val p = 2 + rng.nextInt(5); val r = rng.nextInt(p)
          VersionedParquet.delete(spark, root,
            col("x") % p === r, keepVersions = 50)
          model = model.filterNot { case (_, (_, x)) => x % p == r }
          stepCheck()
        case 2 => // searched update
          val g = rng.nextInt(7).toLong; val c = 1 + rng.nextInt(99)
          VersionedParquet.updateWhere(spark, root, col("grp") === g,
            Map("x" -> (col("x") + c)), keepVersions = 50)
          model = model.map { case (i, (gg, x)) =>
            i -> (gg, if (gg == g) x + c else x) }
          stepCheck()
        case 3 => // blind append (fresh ids keep the model keyable)
          val rows = fresh(1 + rng.nextInt(25)).map(i =>
            (i, rng.nextInt(7).toLong, rng.nextInt(1000).toLong))
          VersionedParquet.append(spark, root, toDf(rows),
            keepVersions = 50)
          model = model ++ rows.map { case (i, g, x) => i -> (g, x) }
          stepCheck()
        case 4 if history.length > 1 =>
          // rollback to a random STRICTLY earlier version (restoring
          // to the live version is a documented no-op — no publish)
          val to = rng.nextInt(history.length - 1)
          VersionedParquet.restore(spark, root, to.toLong,
            keepVersions = 50)
          model = history(to)
          stepCheck()
        case 4 => // nothing to roll back to yet
          ()
        case 5 => // physical maintenance: logically a no-op version,
          // unless nothing qualifies (then no version at all)
          val before = VersionedParquet.versions(spark, root).max
          VersionedParquet.compactSmallFiles(spark, root,
            smallBytes = Long.MaxValue, targetBytes = 1L << 20,
            keepVersions = 50)
          if (VersionedParquet.versions(spark, root).max > before)
            stepCheck()
      }
    }

    // every retained version time-travels to its recorded model state
    VersionedParquet.versions(spark, root).foreach { v =>
      assert(bag(VersionedParquet.read(spark, root, Some(v))) ===
        modelBag(history(v.toInt)),
        s"time travel to v$v diverged from recorded history")
    }
  }

  test("interleaved optimistic writers: every commit lands once, feed replays the full history") {
    import java.util.concurrent.{Executors, TimeUnit}
    val root = java.nio.file.Files
      .createTempDirectory("graft-occ-fuzz").toString + "/t"
    val init = (0L until 200L).map(i => (i, i % 7, i * 3))
    VersionedParquet.publish(toDf(init), root, keepVersions = 100)

    // three writers race genuine concurrent chains: two appenders
    // (never conflict) and one keyed upserter (conflicts with every
    // intervening commit — exercises the re-stage/retry path under
    // real contention, not a test-seam window)
    val opsPerWriter = 4
    val pool = Executors.newFixedThreadPool(3)
    val appenderA = pool.submit(() =>
      (0 until opsPerWriter).map { k =>
        Optimistic.append(spark, root,
          toDf((0L until 10L).map(i =>
            (10000L + k * 100L + i, 1L, 1L))), keepVersions = 100)
      })
    val appenderB = pool.submit(() =>
      (0 until opsPerWriter).map { k =>
        Optimistic.append(spark, root,
          toDf((0L until 10L).map(i =>
            (20000L + k * 100L + i, 2L, 2L))), keepVersions = 100)
      })
    val upserter = pool.submit(() =>
      (0 until opsPerWriter).map { k =>
        // updates its OWN keys only (0..49): retries under contention,
        // but its chain is internally serial, so the final value per
        // key is the last op's regardless of global interleaving
        Optimistic.upsert(spark, root,
          toDf((0L until 50L).map(i => (i, i % 7, 100000L + k))),
          Seq("id"), keepVersions = 100, maxAttempts = 50)
      })
    val commits = appenderA.get(300, TimeUnit.SECONDS) ++
      appenderB.get(300, TimeUnit.SECONDS) ++
      upserter.get(300, TimeUnit.SECONDS)
    pool.shutdown()

    // 12 commits, versions 1..12, each exactly once
    assert(commits.map(_.version).sorted === (1L to 12L),
      s"every optimistic op commits exactly one version")
    // final state = init with keys 0..49 at the upserter's LAST value,
    // plus all 80 appended rows
    val expected =
      init.filterNot(_._1 < 50L).map { case (i, g, x) => (i, g, x) -> 1L }
        .toMap ++
        (0L until 50L).map(i => (i, i % 7,
          100000L + opsPerWriter - 1L) -> 1L) ++
        (0 until opsPerWriter).flatMap(k => (0L until 10L).map(i =>
          (10000L + k * 100L + i, 1L, 1L) -> 1L)) ++
        (0 until opsPerWriter).flatMap(k => (0L until 10L).map(i =>
          (20000L + k * 100L + i, 2L, 2L) -> 1L))
    assert(bag(VersionedParquet.read(spark, root)) === expected,
      "final state must equal the serialized (commit-order) history")

    // the change feed is CONTINUOUS across the interleaved history:
    // replaying v0 → v12 reproduces the final state as multisets
    val feed = VersionedParquet.changes(spark, root, 0L, 12L)
      .select("id", "grp", "x", "_change_type", "_commit_version")
      .collect().sortBy(_.getLong(4))
    var work = bag(VersionedParquet.read(spark, root, Some(0L)))
    feed.foreach { r =>
      val k = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (Seq("update_pre", "delete").contains(r.getString(3))) {
        val left = work.getOrElse(k, 0L) - 1
        assert(left >= 0, s"feed removes $k absent at its version")
        work = if (left == 0) work - k else work + (k -> left)
      } else work = work + (k -> (work.getOrElse(k, 0L) + 1))
    }
    assert(work === expected,
      "replaying the concurrent history's feed must land on the final state")
  }

  test("fuzz: random multi-table transactions with injected failures stay all-or-nothing") {
    val rootA = java.nio.file.Files
      .createTempDirectory("graft-txn-fuzz-a").toString + "/a"
    val rootB = java.nio.file.Files
      .createTempDirectory("graft-txn-fuzz-b").toString + "/b"
    val rng = new scala.util.Random(7)
    var nextId = 100000L
    def fresh(n: Int): Seq[Long] = {
      val ids = (nextId until nextId + n); nextId += n; ids
    }
    var mA = (0L until 200L).map(i =>
      i -> (i % 7, (i * 3) % 40)).toMap
    var mB = (1000L until 1100L).map(i =>
      i -> (i % 5, (i * 7) % 40)).toMap
    VersionedParquet.publish(
      toDf(mA.toSeq.map { case (i, (g, x)) => (i, g, x) }), rootA,
      keepVersions = 100)
    VersionedParquet.publish(
      toDf(mB.toSeq.map { case (i, (g, x)) => (i, g, x) }), rootB,
      keepVersions = 100)

    def check(tag: String): Unit = {
      assert(bag(VersionedParquet.read(spark, rootA)) === modelBag(mA),
        s"$tag: table A diverged from the model")
      assert(bag(VersionedParquet.read(spark, rootB)) === modelBag(mB),
        s"$tag: table B diverged from the model")
    }

    for (step <- 0 until 20) {
      rng.nextInt(4) match {
        case 0 =>
          // committed transaction: move a predicate slice A→B
          val r = rng.nextInt(40)
          val moving = mA.toSeq.collect {
            case (i, (g, x)) if x == r => (i, g, x) }
          Txn.commit(spark, Seq(
            Txn.TxnOp(rootA, () => { VersionedParquet.delete(spark,
              rootA, col("x") === r.toLong, keepVersions = 100); () }),
            Txn.TxnOp(rootB, () => { VersionedParquet.append(spark,
              rootB, toDf(moving), keepVersions = 100); () })))
          mA = mA.filterNot { case (_, (_, x)) => x == r }
          mB = mB ++ moving.map { case (i, g, x) => i -> (g, x) }
        case 1 =>
          // failing transaction: B's delete lands, then the second op
          // throws — BOTH must roll back, models unchanged
          val r = rng.nextInt(40)
          intercept[Txn.TxnAbortedException] {
            Txn.commit(spark, Seq(
              Txn.TxnOp(rootB, () => { VersionedParquet.delete(spark,
                rootB, col("x") === r.toLong, keepVersions = 100); () }),
              Txn.TxnOp(rootA, () =>
                throw new RuntimeException(s"boom-$step"))))
          }
        case 2 =>
          // plain single-table upsert on A between transactions
          val upd = mA.keys.toSeq.sorted.take(10)
            .map(i => (i, mA(i)._1, rng.nextInt(40).toLong))
          val ins = fresh(5).map(i =>
            (i, rng.nextInt(7).toLong, rng.nextInt(40).toLong))
          VersionedParquet.upsert(spark, rootA, toDf(upd ++ ins),
            Seq("id"), keepVersions = 100)
          mA = mA ++ (upd ++ ins).map { case (i, g, x) => i -> (g, x) }
        case 3 =>
          // plain append on B
          val rows = fresh(5).map(i =>
            (i, rng.nextInt(5).toLong, rng.nextInt(40).toLong))
          VersionedParquet.append(spark, rootB, toDf(rows),
            keepVersions = 100)
          mB = mB ++ rows.map { case (i, g, x) => i -> (g, x) }
      }
      check(s"step $step")
    }
    // recovery over a quiet pair is a no-op
    Txn.recover(spark, Seq(rootA, rootB))
    check("after final recover")
  }

  test("fuzz: WAP branch episodes — squashed publishes, abandons, and " +
      "races against direct commits keep live, history, and feed exact") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-wap-fuzz").toString + "/t"
    val rng = new scala.util.Random(11)
    var nextId = 0L
    def fresh(n: Int): Seq[Long] = {
      val ids = (nextId until nextId + n); nextId += n; ids
    }
    def randRows(n: Int): Seq[Row3] = fresh(n).map(i =>
      (i, rng.nextInt(5).toLong, rng.nextInt(500).toLong))

    var model = Map.empty[Long, (Long, Long)]
    val history = mutable.ArrayBuffer.empty[Map[Long, (Long, Long)]]
    val init = randRows(200)
    model = init.map { case (i, g, x) => i -> (g, x) }.toMap
    VersionedParquet.publish(toDf(init), root, keepVersions = 50)
    history += model

    def checkLive(tag: String): Unit =
      assert(bag(VersionedParquet.read(spark, root)) === modelBag(model),
        s"live diverged from model after $tag")

    for (step <- 1 to 12) {
      rng.nextInt(3) match {
        case 0 => // direct DML on main
          if (rng.nextBoolean()) {
            val rows = randRows(1 + rng.nextInt(20))
            VersionedParquet.append(spark, root, toDf(rows),
              keepVersions = 50)
            model = model ++ rows.map { case (i, g, x) => i -> (g, x) }
          } else {
            val p = 2 + rng.nextInt(5); val r = rng.nextInt(p)
            VersionedParquet.delete(spark, root, col("x") % p === r,
              keepVersions = 50)
            model = model.filterNot { case (_, (_, x)) => x % p == r }
          }
          history += model
          checkLive(s"direct DML (step $step)")
        case 1 => // WAP episode: 1-3 branch commits, then publish/abandon
          Branch.create(spark, root, "wap")
          val b = Branch.branchRoot(root, "wap")
          var bModel = model
          for (_ <- 0 to rng.nextInt(2)) {
            if (rng.nextBoolean()) {
              val rows = randRows(1 + rng.nextInt(15))
              VersionedParquet.append(spark, b, toDf(rows),
                keepVersions = 50)
              bModel = bModel ++ rows.map { case (i, g, x) =>
                i -> (g, x) }
            } else {
              val p = 2 + rng.nextInt(5); val r = rng.nextInt(p)
              VersionedParquet.delete(spark, b, col("x") % p === r,
                keepVersions = 50)
              bModel = bModel.filterNot { case (_, (_, x)) => x % p == r }
            }
          }
          assert(bag(VersionedParquet.read(spark, root)) ===
            modelBag(model), s"branch writes leaked into main (step $step)")
          if (rng.nextBoolean()) {
            Branch.fastForward(spark, root, "wap")
            model = bModel
            history += model
            checkLive(s"fast-forward (step $step)")
          } else {
            Branch.drop(spark, root, "wap")
            checkLive(s"abandoned branch (step $step)")
          }
        case 2 => // race: main advances behind the branch's back
          Branch.create(spark, root, "late")
          VersionedParquet.append(spark, Branch.branchRoot(root, "late"),
            toDf(randRows(5)), keepVersions = 50)
          val direct = randRows(1 + rng.nextInt(10))
          VersionedParquet.append(spark, root, toDf(direct),
            keepVersions = 50)
          model = model ++ direct.map { case (i, g, x) => i -> (g, x) }
          history += model
          intercept[Optimistic.CommitConflictException] {
            Branch.fastForward(spark, root, "late")
          }
          Branch.drop(spark, root, "late")
          checkLive(s"conflict episode (step $step)")
      }
    }

    // every retained version time-travels to its recorded model state,
    // and the change feed replays each step — squashed FF diffs
    // included — into the next
    val live = history.length - 1
    VersionedParquet.versions(spark, root).foreach { v =>
      assert(bag(VersionedParquet.read(spark, root, Some(v))) ===
        modelBag(history(v.toInt)),
        s"time travel to v$v diverged from recorded history")
    }
    (1 to live).foreach { v =>
      val feed = VersionedParquet.changes(spark, root, v - 1L, v.toLong)
        .collect()
      var work = modelBag(history(v - 1))
      feed.filter(r => Seq("update_pre", "delete").contains(r.getString(3)))
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .foreach { k =>
          val left = work.getOrElse(k, 0L) - 1
          assert(left >= 0, s"feed removes $k absent at v${v - 1}")
          work = if (left == 0) work - k else work + (k -> left)
        }
      feed.filter(r => Seq("update_post", "insert").contains(r.getString(3)))
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .foreach(k => work = work + (k -> (work.getOrElse(k, 0L) + 1)))
      assert(work === modelBag(history(v)),
        s"feed must replay v${v - 1} into v$v (squash included)")
    }
  }
}
