package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata checkpointing contract: a long version chain resolves its
  * history (versions(), readAsOf) from the latest `_CHECKPOINT`
  * manifest plus a bounded suffix probe — O(interval) filesystem
  * metadata ops at ANY chain length — with answers IDENTICAL to the
  * listing-based fallback. Vacuum maintains the invariant that every
  * checkpointed version exists, so readers never re-verify the prefix.
  */
class CheckpointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-cp-$tag")
      .toString + "/t"

  /** Build an n-version chain of tiny publishes (v0..v(n-1)). */
  private def chain(root: String, n: Int, keep: Int = 1000): Unit = {
    import spark.implicits._
    (0 until n).foreach { v =>
      VersionedParquet.publish(Seq((v.toLong, v * 10L)).toDF("id", "x"),
        root, keepVersions = keep)
    }
  }

  private def ops[T](body: => T): (T, Long) = {
    val before = VersionedParquet.metaOps.get()
    val r = body
    (r, VersionedParquet.metaOps.get() - before)
  }

  test("100-version chain: versions() and readAsOf resolve in O(interval) metadata ops") {
    val root = tmp("long")
    chain(root, 100)
    // the checkpoint exists and covers (at least) the last interval
    // boundary
    val cp = VersionedParquet.readCheckpoint(spark, root)
    assert(cp.isDefined, "a 100-commit chain must have checkpointed")
    val (through, rows) = cp.get
    assert(through >= 90, s"stale checkpoint: through v$through")
    assert(rows.map(_._1) === (0L until (through + 1)),
      "the manifest must carry every published version up to 'through'")

    // identical answers to ground truth...
    val (vs, nVs) = ops(VersionedParquet.versions(spark, root))
    assert(vs === (0L until 100L), "all 100 versions resolve")
    // ...in far fewer metadata ops than the chain length: one manifest
    // read + suffix probes (≤ interval) + the final absent-dir probe.
    // The listing fallback costs ≥ 100 per-version _SUCCESS probes.
    assert(nVs <= 30, s"versions() cost $nVs metadata ops on a " +
      "100-version chain; checkpoint resolution must be O(interval)")

    // readAsOf: middle of the chain and the far end both resolve
    // identically to a pinned read, in O(interval) ops
    val ts50 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/v00000050/_SUCCESS")), "UTF-8")
      .trim.toLong
    val (asOf, nAsOf) = ops(
      VersionedParquet.readAsOf(spark, root, ts50).collect().toSeq)
    val pinned = VersionedParquet.read(spark, root, Some(50L))
      .collect().toSeq
    assert(asOf.map(_.toSeq).toSet === pinned.map(_.toSeq).toSet,
      "readAsOf(ts of v50) must equal read(version = 50)")
    assert(nAsOf <= 30, s"readAsOf cost $nAsOf metadata ops; " +
      "must be O(interval), not O(versions)")
  }

  test("suffix commits after the checkpoint are visible before the next one") {
    val root = tmp("suffix")
    chain(root, 12) // checkpoint at v9 (interval 10), suffix v10, v11
    val (through, _) = VersionedParquet.readCheckpoint(spark, root).get
    assert(through < 11, "suffix versions exist beyond the checkpoint")
    assert(VersionedParquet.versions(spark, root) === (0L until 12L),
      "suffix versions must resolve without waiting for a checkpoint")
    // readAsOf 'now' resolves the very latest (suffix) version
    val latest = VersionedParquet.readAsOf(spark, root,
      System.currentTimeMillis() + 1000L)
    assert(latest.agg(max(col("id"))).head().getLong(0) === 11L)
  }

  test("vacuum drops retired versions from the manifest (the invariant readers trust)") {
    val root = tmp("vacuum")
    chain(root, 25)
    val deleted = VersionedParquet.vacuum(spark, root, keepVersions = 5)
    assert(deleted.nonEmpty)
    val vs = VersionedParquet.versions(spark, root)
    assert(vs === (20L until 25L),
      s"only the retained window must resolve, got $vs")
    // the manifest agrees with the filesystem — no ghost versions
    val (_, rows) = VersionedParquet.readCheckpoint(spark, root).get
    rows.map(_._1).foreach { v =>
      assert(new java.io.File(s"$root/" + f"v$v%08d").isDirectory,
        s"checkpointed v$v must exist on disk")
    }
    // and a pinned read of a vacuumed version still fails loudly
    intercept[Exception] {
      VersionedParquet.read(spark, root, Some(3L)).collect()
    }
  }

  test("uncheckpointed tables fall back to the listing path unchanged") {
    val root = tmp("fallback")
    chain(root, 4) // below the interval — no checkpoint
    assert(VersionedParquet.readCheckpoint(spark, root).isEmpty)
    assert(VersionedParquet.versions(spark, root) === (0L until 4L))
    val latest = VersionedParquet.readAsOf(spark, root,
      System.currentTimeMillis() + 1000L)
    assert(latest.agg(max(col("id"))).head().getLong(0) === 3L)
  }

  test("checkpoint composes with merge-on-read chains and optimistic commits") {
    import spark.implicits._
    val root = tmp("mor")
    VersionedParquet.publish(
      (0L until 100L).map(i => (i, i * 2)).toDF("id", "x"), root,
      keepVersions = 1000)
    (1 to 12).foreach { k =>
      if (k % 3 == 0)
        Optimistic.append(spark, root,
          Seq((1000L + k, k.toLong)).toDF("id", "x"),
          keepVersions = 1000)
      else
        VersionedParquet.upsert(spark, root,
          Seq((k.toLong, -k.toLong)).toDF("id", "x"), Seq("id"),
          keepVersions = 1000)
    }
    assert(VersionedParquet.versions(spark, root) === (0L to 12L))
    val cp = VersionedParquet.readCheckpoint(spark, root)
    assert(cp.isDefined, "optimistic + MoR commits must checkpoint too")
    // the chain still reads correctly through the checkpointed history
    val live = VersionedParquet.read(spark, root)
    assert(live.count() === 104L)
    assert(live.filter(col("id") === 2L).head().getLong(1) === -2L)
  }
}
