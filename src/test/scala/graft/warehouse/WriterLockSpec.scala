package graft.warehouse

import java.util.concurrent.Executors

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** The single-writer contract is enforced, not assumed: concurrent
  * writers serialize through the `_LOCK` file (atomic
  * create-exclusive), so every batch lands exactly once and the
  * version sequence stays contiguous; a live lock blocks a second
  * writer with a clear error; a dead writer's stale lock is broken by
  * age like a lease expiry.
  */
class WriterLockSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-lock-$tag").toString

  test("8 concurrent merges serialize: contiguous versions, every batch exactly once") {
    import spark.implicits._
    val root = tmp("hammer")
    VersionedParquet.publish(
      (0L until 100L).map(i => (i, -1L)).toDF("id", "v"), root,
      keepVersions = 50)
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    // 8 serialized merges at a few seconds each: the last waiter needs
    // more headroom than the 30s default on a loaded host
    spark.conf.set("spark.graft.lockAcquireMs", "240000")
    try {
      val fs = (0 until 8).map { t =>
        Future {
          VersionedParquet.upsert(spark, root,
            (0L until 10L).map(i => (1000L + t * 10 + i, t.toLong))
              .toDF("id", "v"),
            Seq("id"), keepVersions = 50)
        }
      }
      Await.result(Future.sequence(fs), 5.minutes)
    } finally {
      pool.shutdown()
      spark.conf.unset("spark.graft.lockAcquireMs")
    }
    // every writer got its own version; none clobbered another
    assert(VersionedParquet.versions(spark, root) === (0L to 8L))
    val live = VersionedParquet.read(spark, root)
    assert(live.count() === 180)
    for (t <- 0 until 8)
      assert(live.filter($"v" === t.toLong).count() === 10,
        s"writer $t's batch must land exactly once")
    // no lock left behind
    assert(!new java.io.File(s"$root/_LOCK").exists())
  }

  test("a live lock blocks with a clear error; a stale lock is broken") {
    import spark.implicits._
    val root = tmp("stale")
    VersionedParquet.publish(Seq((1L, 1L)).toDF("id", "v"), root)
    val lock = new java.io.File(s"$root/_LOCK")

    spark.conf.set("spark.graft.lockAcquireMs", "500")
    try {
      // fresh foreign lock → acquisition times out loudly
      assert(lock.createNewFile())
      val e = intercept[java.io.IOException] {
        VersionedParquet.publish(Seq((2L, 2L)).toDF("id", "v"), root)
      }
      assert(e.getMessage.contains("writer lock"))
      assert(VersionedParquet.currentVersion(spark, root) === Some(0L))

      // age the lock past the lease → next writer breaks it and wins
      assert(lock.setLastModified(
        System.currentTimeMillis() - 700000L))
      VersionedParquet.publish(Seq((2L, 2L)).toDF("id", "v"), root)
      assert(VersionedParquet.currentVersion(spark, root) === Some(1L))
      assert(!lock.exists())
    } finally spark.conf.unset("spark.graft.lockAcquireMs")
  }
}
