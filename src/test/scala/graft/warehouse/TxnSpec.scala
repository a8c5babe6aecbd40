package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-table transaction contract: all-or-nothing visibility across
  * tables, presumed-abort crash recovery from the write-ahead intent,
  * and cross-table snapshot isolation for readers.
  */
class TxnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-txn-$tag").toString

  private def seed(root: String, lo: Long, hi: Long): Unit = {
    import spark.implicits._
    VersionedParquet.publish(
      (lo until hi).map(i => (i, i * 10L)).toDF("id", "v"), root,
      keepVersions = 20)
  }

  private def ids(root: String): Seq[Long] =
    VersionedParquet.read(spark, root).select("id").orderBy("id")
      .collect().toSeq.map(_.getLong(0))

  test("move rows A→B commits atomically: both versions land, rows conserved") {
    import spark.implicits._
    val a = tmp("mv-a"); val b = tmp("mv-b")
    seed(a, 0L, 100L); seed(b, 1000L, 1010L)
    val moving = VersionedParquet.read(spark, a)
      .filter(col("id") % 10 === 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    Txn.commit(spark, Seq(
      Txn.TxnOp(a, () => { VersionedParquet.delete(spark, a,
        col("id") % 10 === 3, keepVersions = 20); () }),
      Txn.TxnOp(b, () => { VersionedParquet.append(spark, b,
        moving.toDF("id", "v"), keepVersions = 20); () })))
    assert(ids(a).size == 90)
    assert(ids(b).size == 20)
    assert((ids(a) ++ ids(b)).sorted ==
      ((0L until 100L) ++ (1000L until 1010L)).sorted)
    // intents cleared: live reads and readAll agree
    val all = Txn.readAll(spark, Seq(a, b))
    assert(all(a).count() == 90 && all(b).count() == 20)
  }

  test("failure mid-transaction rolls BOTH tables back to pre-state") {
    import spark.implicits._
    val a = tmp("rb-a"); val b = tmp("rb-b")
    seed(a, 0L, 50L); seed(b, 0L, 10L)
    val vA = VersionedParquet.currentVersion(spark, a).get
    val vB = VersionedParquet.currentVersion(spark, b).get
    val e = intercept[Txn.TxnAbortedException] {
      Txn.commit(spark, Seq(
        Txn.TxnOp(a, () => { VersionedParquet.delete(spark, a,
          col("id") < 25, keepVersions = 20); () }),
        Txn.TxnOp(b, () => throw new RuntimeException("boom"))))
    }
    assert(e.getMessage.contains("rolled back"))
    // table A's already-landed delete was revoked
    assert(VersionedParquet.currentVersion(spark, a).get == vA)
    assert(VersionedParquet.currentVersion(spark, b).get == vB)
    assert(ids(a).size == 50)
    // the orphan snapshot directory is gone — the next write reuses
    // its version number cleanly
    VersionedParquet.append(spark, a,
      Seq((500L, 1L)).toDF("id", "v"), keepVersions = 20)
    assert(ids(a).size == 51)
  }

  test("crash between ops and intent-clear: recovery treats the txn as committed") {
    import spark.implicits._
    val a = tmp("fin-a"); val b = tmp("fin-b")
    seed(a, 0L, 20L); seed(b, 0L, 20L)
    // simulate: both ops committed, crash before intents cleared
    val content = Seq(a, b).sorted
      .map(r => s"$r\t${VersionedParquet.currentVersion(spark, r).get}")
      .mkString("\n")
    Seq(a, b).foreach { r =>
      VersionedParquet.installPointer(spark, new Path(r), Txn.INTENT,
        content) }
    VersionedParquet.append(spark, a,
      Seq((100L, 1L)).toDF("id", "v"), keepVersions = 20)
    VersionedParquet.append(spark, b,
      Seq((200L, 2L)).toDF("id", "v"), keepVersions = 20)
    Txn.recover(spark, Seq(a, b))
    // both appends survive — every participant had advanced
    assert(ids(a).contains(100L))
    assert(ids(b).contains(200L))
  }

  test("crash mid-ops: recovery rolls the advanced participant back") {
    import spark.implicits._
    val a = tmp("torn-a"); val b = tmp("torn-b")
    seed(a, 0L, 20L); seed(b, 0L, 20L)
    val content = Seq(a, b).sorted
      .map(r => s"$r\t${VersionedParquet.currentVersion(spark, r).get}")
      .mkString("\n")
    Seq(a, b).foreach { r =>
      VersionedParquet.installPointer(spark, new Path(r), Txn.INTENT,
        content) }
    // only A's op landed before the "crash"
    VersionedParquet.append(spark, a,
      Seq((100L, 1L)).toDF("id", "v"), keepVersions = 20)
    // a reader BEFORE recovery sees the consistent pre-state
    val pinned = Txn.readAll(spark, Seq(a, b))
    assert(pinned(a).count() == 20 && pinned(b).count() == 20)
    Txn.recover(spark, Seq(a, b))
    assert(!ids(a).contains(100L), "torn transaction must roll back")
    assert(ids(a).size == 20 && ids(b).size == 20)
    // and the next commit works from the recovered state
    Txn.commit(spark, Seq(
      Txn.TxnOp(a, () => { VersionedParquet.append(spark, a,
        Seq((101L, 1L)).toDF("id", "v"), keepVersions = 20); () })))
    assert(ids(a).contains(101L))
  }

  test("commit() self-heals an abandoned TORN predecessor before running") {
    import spark.implicits._
    val a = tmp("heal-a"); val b = tmp("heal-b")
    seed(a, 0L, 10L); seed(b, 0L, 10L)
    // torn predecessor: intent names BOTH tables, only A's op landed
    val content = Seq(a, b).sorted
      .map(r => s"$r\t${VersionedParquet.currentVersion(spark, r).get}")
      .mkString("\n")
    Seq(a, b).foreach { r =>
      VersionedParquet.installPointer(spark, new Path(r), Txn.INTENT,
        content) }
    VersionedParquet.append(spark, a,
      Seq((50L, 1L)).toDF("id", "v"), keepVersions = 20)
    // a commit touching only A still recovers the WHOLE predecessor
    // (each intent copy names all participants): the torn append on A
    // rolls back, then the new op runs
    Txn.commit(spark, Seq(
      Txn.TxnOp(a, () => { VersionedParquet.append(spark, a,
        Seq((60L, 2L)).toDF("id", "v"), keepVersions = 20); () })))
    val got = ids(a)
    assert(!got.contains(50L) && got.contains(60L))
    // b's intent cleared too — live reads resume
    assert(Txn.readAll(spark, Seq(a, b))(b).count() == 10)
  }
}
