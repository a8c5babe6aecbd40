package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.VersionedParquet

/** Streaming CDC apply through merge-on-read: every published version
  * must equal the sequential apply of the collapsed batch prefix —
  * including versions published after a checkpoint restart — base
  * files must never be rewritten after v0, a re-run with nothing new
  * publishes nothing, and the change feed stays replayable across the
  * streamed versions.
  */
class MorStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType),
    StructField("op", StringType), StructField("seq", LongType)))

  // (id, v, op, seq) — seq orders changes to the same key; within a
  // batch only the latest survives, delete winning seq ties
  private val batches: Seq[Seq[(Long, Long, String, Long)]] = Seq(
    // b0: inserts; id 2 updated twice intra-batch; id 3 net-deleted
    Seq((1L, 10L, "U", 1L), (2L, 20L, "U", 2L), (3L, 30L, "U", 3L),
      (4L, 40L, "U", 4L), (2L, 25L, "U", 5L), (3L, 0L, "D", 6L)),
    // b1: update, delete, insert
    Seq((1L, 11L, "U", 7L), (4L, 0L, "D", 8L), (5L, 50L, "U", 9L)),
    // b2 (after restart): resurrect id 4, update id 5, delete id 2
    Seq((4L, 44L, "U", 10L), (5L, 55L, "U", 11L), (2L, 0L, "D", 12L)),
    // b3: delete of a key that never existed (no-op) + delete id 1
    Seq((6L, 60L, "U", 13L), (6L, 0L, "D", 14L), (1L, 0L, "D", 15L)))

  /** Sequential reference: apply collapsed batches 0..n to a map. */
  private def expectAfter(n: Int): Map[Long, Long] =
    batches.take(n + 1).foldLeft(Map.empty[Long, Long]) { (state, b) =>
      val latest = b.groupBy(_._1).map { case (_, rows) =>
        rows.maxBy(r => (r._4, r._3 == "D"))
      }
      latest.foldLeft(state) { (s, r) =>
        if (r._3 == "D") s - r._1 else s + (r._1 -> r._2)
      }
    }

  test("CDC stream maintains the table across a restart, exactly once") {
    val work = Files.createTempDirectory("graft-morstream")
    val watch = Files.createDirectory(work.resolve("cdc"))
    val root = work.resolve("table").toString
    val checkpoint = work.resolve("chk").toString
    val now = System.currentTimeMillis()
    def drop(i: Int): Unit = {
      val f = watch.resolve(f"b$i%02d.csv")
      Files.write(f, batches(i)
        .map { case (id, v, op, seq) => s"$id,$v,$op,$seq" }
        .mkString("\n").getBytes("UTF-8"))
      f.toFile.setLastModified(now + i * 2000L)
    }
    def source() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").csv(watch.toString)

    def stateAt(version: Long): Map[Long, Long] =
      VersionedParquet.read(spark, root, Some(version))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    def checkAll(): Unit =
      VersionedParquet.versions(spark, root).foreach { v =>
        val b = VersionedParquet
          .snapshotMarker(spark, root, VersionedSink.BatchMarker, Some(v))
          .get.trim.toInt
        assert(stateAt(v) === expectAfter(b),
          s"version $v (batch $b) diverged")
      }

    drop(0); drop(1)
    MorStream.run(source(), root, checkpoint, Seq("id"))
      .awaitTermination()
    assert(VersionedParquet.versions(spark, root).size === 2)
    checkAll()

    def dataFiles(dir: String): Map[String, Long] = {
      val r = new java.io.File(dir)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(r).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    }
    val v0Files = dataFiles(s"$root/v00000000")

    // restart from the same checkpoint: two more batches
    drop(2); drop(3)
    MorStream.run(source(), root, checkpoint, Seq("id"))
      .awaitTermination()
    assert(VersionedParquet.versions(spark, root).size === 4)
    checkAll()
    assert(dataFiles(s"$root/v00000000") === v0Files,
      "streamed merges must never rewrite the base")

    // change feed replay across the streamed merge versions: applying
    // the feed over v1..v3 onto v1's state reproduces the live table
    import spark.implicits._
    val feed = VersionedParquet.changes(spark, root, 1L, 3L)
    val gone = feed.filter($"_change_type".isin("update_pre", "delete"))
      .select("id", "v")
    val came = feed.filter($"_change_type".isin("update_post", "insert"))
      .select("id", "v")
    val applied = VersionedParquet.read(spark, root, Some(1L))
      .exceptAll(gone).unionAll(came)
    val live = VersionedParquet.read(spark, root)
    assert(applied.exceptAll(live).isEmpty && live.exceptAll(applied).isEmpty)

    // nothing new → nothing published (exactly-once)
    MorStream.run(source(), root, checkpoint, Seq("id"))
      .awaitTermination()
    assert(VersionedParquet.versions(spark, root).size === 4)
  }

  test("collapse keeps the latest change per key, delete wins seq ties") {
    import spark.implicits._
    val batch = Seq(
      (1L, 5L, "U", 1L), (1L, 6L, "U", 2L),   // latest update wins
      (2L, 7L, "U", 3L), (2L, 0L, "D", 3L),   // tie → delete wins
      (3L, 9L, "D", 4L), (3L, 8L, "U", 5L)    // later upsert resurrects
    ).toDF("id", "v", "op", "seq")
    val (up, del) = MorStream.collapse(batch, Seq("id"), "op", "seq")
    assert(up.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq === Seq((1L, 6L), (3L, 8L)))
    assert(del.as[Long].collect().toSeq === Seq(2L))
  }
}
