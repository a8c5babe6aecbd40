package graft.warehouse

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** The versioned table as a Structured Streaming SOURCE
  * (`readStream.format("graft")`): the first batch is the snapshot at
  * `startingVersion`, every later batch the committed change feed —
  * offsets are table versions, so a checkpointed restart consumes each
  * version exactly once. Data-rows mode admits only append domains
  * (metadata guard); CDC mode replays the full feed.
  */
class GraftStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select("k", "cents").as[(Long, Long)].collect().toSet

  /** Run the stream to exhaustion into a parquet dir; return its rows. */
  private def drain(root: String, out: String, ckpt: String,
                    options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.readStream.format("graft")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(root)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
  }

  test("tail an append-only table: snapshot first, appends after, " +
      "exactly once across restarts") {
    val work = Files.createTempDirectory("graft-streamsrc")
    val root = work.resolve("t").toString
    val out = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString

    val v0 = Seq((1L, 10L), (2L, 20L)).toDF("k", "cents")
    VersionedParquet.publish(v0, root, keepVersions = 10)

    // batch 1: the initial snapshot (default startingVersion = live)
    assert(rows(drain(root, out, ckpt)) === Set((1L, 10L), (2L, 20L)))

    // two appends, then resume from the checkpoint: ONLY the appended
    // rows arrive (no snapshot replay)
    VersionedParquet.append(spark, root,
      Seq((3L, 30L)).toDF("k", "cents"), keepVersions = 10)
    VersionedParquet.append(spark, root,
      Seq((4L, 40L), (1L, 11L)).toDF("k", "cents"), keepVersions = 10)
    val afterTail = rows(drain(root, out, ckpt))
    assert(afterTail ===
      Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (1L, 11L)))

    // nothing new: a third run must add zero rows (exactly-once)
    assert(rows(drain(root, out, ckpt)) === afterTail)
  }

  test("data-rows mode rejects a non-append version; ignoreChanges " +
      "drops deletes and keeps post-images") {
    val work = Files.createTempDirectory("graft-streamsrc-guard")
    val root = work.resolve("t").toString

    VersionedParquet.publish(Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("k", "cents"), root, keepVersions = 10)
    VersionedParquet.upsert(spark, root,
      Seq((2L, 25L), (4L, 40L)).toDF("k", "cents"), Seq("k"),
      keepVersions = 10)
    VersionedParquet.delete(spark, root, col("k") === 1L,
      keepVersions = 10)

    // from v0, plain mode: the upsert version is a keys-domain commit
    val ex = intercept[StreamingQueryException] {
      drain(root, work.resolve("out1").toString,
        work.resolve("ckpt1").toString,
        Map("startingVersion" -> "0"))
    }
    assert(ex.getMessage.contains("not an append") ||
      Option(ex.getCause).exists(_.getMessage.contains("not an append")))

    // ignoreChanges: snapshot + insert/update_post images, deletes gone
    val got = rows(drain(root, work.resolve("out2").toString,
      work.resolve("ckpt2").toString,
      Map("startingVersion" -> "0", "ignoreChanges" -> "true")))
    assert(got === Set((1L, 10L), (2L, 20L), (3L, 30L), // v0 snapshot
      (2L, 25L), (4L, 40L))) // v1 post-images; v2 delete emits nothing
  }

  test("readChangeFeed streams the full CDC history and matches " +
      "VersionedParquet.changes") {
    val work = Files.createTempDirectory("graft-streamsrc-cdf")
    val root = work.resolve("t").toString

    VersionedParquet.publish(Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("k", "cents"), root, keepVersions = 10)
    VersionedParquet.upsert(spark, root,
      Seq((2L, 25L), (4L, 40L)).toDF("k", "cents"), Seq("k"),
      keepVersions = 10)
    VersionedParquet.delete(spark, root, col("k") === 1L,
      keepVersions = 10)

    val streamed = drain(root, work.resolve("out").toString,
      work.resolve("ckpt").toString,
      Map("startingVersion" -> "0", "readChangeFeed" -> "true"))
      .select("k", "cents", "_change_type", "_commit_version")
      .as[(Long, Long, String, Long)].collect().toSet

    val expected = VersionedParquet.changes(spark, root, 0, 2)
      .select("k", "cents", "_change_type", "_commit_version")
      .as[(Long, Long, String, Long)].collect().toSet ++
      Set((1L, 10L, "insert", 0L), (2L, 20L, "insert", 0L),
        (3L, 30L, "insert", 0L)) // the v0 snapshot as inserts
    assert(streamed === expected)
    // and the live table equals the feed's net effect
    assert(rows(VersionedParquet.read(spark, root)) ===
      Set((2L, 25L), (3L, 30L), (4L, 40L)))
  }

  test("startingVersion pins the snapshot point; later versions tail") {
    val work = Files.createTempDirectory("graft-streamsrc-start")
    val root = work.resolve("t").toString

    VersionedParquet.publish(Seq((1L, 10L)).toDF("k", "cents"), root,
      keepVersions = 10)
    VersionedParquet.append(spark, root,
      Seq((2L, 20L)).toDF("k", "cents"), keepVersions = 10)
    VersionedParquet.append(spark, root,
      Seq((3L, 30L)).toDF("k", "cents"), keepVersions = 10)

    // starting at v1: snapshot(v1) = {1, 2}; tail (1, 2] = {3}
    val got = rows(drain(root, work.resolve("out").toString,
      work.resolve("ckpt").toString, Map("startingVersion" -> "1")))
    assert(got === Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("option validation: CDF excludes ignoreChanges; missing table " +
      "and out-of-range startingVersion fail") {
    val work = Files.createTempDirectory("graft-streamsrc-opts")
    val root = work.resolve("t").toString
    intercept[Exception] { // no published version
      drain(root, work.resolve("o1").toString, work.resolve("c1").toString)
    }
    VersionedParquet.publish(Seq((1L, 10L)).toDF("k", "cents"), root,
      keepVersions = 10)
    intercept[Exception] {
      drain(root, work.resolve("o2").toString, work.resolve("c2").toString,
        Map("startingVersion" -> "9"))
    }
    intercept[Exception] {
      drain(root, work.resolve("o3").toString, work.resolve("c3").toString,
        Map("readChangeFeed" -> "true", "ignoreChanges" -> "true"))
    }
    intercept[Exception] {
      drain(root, work.resolve("o4").toString, work.resolve("c4").toString,
        Map("maxVersionsPerTrigger" -> "0"))
    }
  }

  test("maxVersionsPerTrigger paces catch-up into bounded micro-" +
      "batches, exactly once") {
    val work = Files.createTempDirectory("graft-streamsrc-rate")
    val root = work.resolve("t").toString
    VersionedParquet.publish(Seq((1L, 10L), (2L, 20L)).toDF("k", "cents"),
      root, keepVersions = 20)
    (1L to 6L).foreach(i =>
      VersionedParquet.append(spark, root,
        Seq((100L + i, i)).toDF("k", "cents"), keepVersions = 20))
    // 7 versions behind at stream start (snapshot@0 + feed of v1..v6);
    // cap 2 versions/trigger → the floor advances ≤2 per batch
    val batches =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = spark.readStream.format("graft")
      .option("startingVersion", "0")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "2")
      .load(root)
      .writeStream
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .foreachBatch { (df: DataFrame, id: Long) =>
        val r = df.agg(count(lit(1)), max(col("_commit_version"))).head()
        batches.synchronized {
          batches += ((id, r.getLong(0), r.getLong(1))); () }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val nonEmpty = batches.filter(_._2 > 0).sortBy(_._1)
    // batch 0: snapshot@0 (2 rows, version 0) + v1,v2 → high-water 2;
    // then (2,4], (4,6] — never more than 2 new versions per batch
    assert(nonEmpty.map(_._3) === Seq(2L, 4L, 6L),
      s"per-batch high-water must advance by the cap: $nonEmpty")
    assert(nonEmpty.map(_._2).sum === 8L,
      "snapshot + all six appended rows, exactly once")
  }
}
