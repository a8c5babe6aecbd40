package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.VersionedParquet

/** Streaming expectations with a quarantine table: clean rows land on
  * silver, violating rows land on quarantine wearing the names of the
  * expectations they failed, nothing is dropped, and both sides stay
  * exactly-once across replays — including a crash landing between
  * the two appends.
  */
class ExpectationsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val expectations = Seq(
    "x_nonneg" -> "x >= 0",
    "x_small" -> "x < 100")

  private val schema = StructType(Seq(StructField("x", LongType)))

  test("split, annotate, and stay exactly-once across re-drains") {
    val work = Files.createTempDirectory("graft-expect")
    val watch = Files.createDirectory(work.resolve("landing"))
    val silver = work.resolve("silver").toString
    val quarantine = work.resolve("quarantine").toString
    val ckpt = work.resolve("ckpt").toString

    def drop(name: String, xs: Seq[Long]): Unit =
      Files.write(watch.resolve(name), xs.mkString("\n").getBytes("UTF-8"))
    def source() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .csv(watch.toString)
    def drain(): Unit =
      VersionedSink.runExpectations(source(), silver, quarantine, ckpt,
        expectations, keepVersions = 20).awaitTermination()

    drop("a.csv", Seq(1L, -2L, 3L))
    drop("b.csv", Seq(150L, 4L))
    drain()
    assert(VersionedParquet.read(spark, silver).as[Long].collect()
      .sorted.toSeq === Seq(1L, 3L, 4L))
    val bad = VersionedParquet.read(spark, quarantine)
      .select("x", "_violated").as[(Long, String)].collect().toMap
    assert(bad === Map(-2L -> "x_nonneg", 150L -> "x_small"))
    // a clean-only batch publishes nothing on quarantine
    drop("c.csv", Seq(5L))
    drain()
    assert(VersionedParquet.read(spark, silver).count() === 4L)
    assert(VersionedParquet.read(spark, quarantine).count() === 2L)
    // re-drain with nothing new: both tables unchanged (exactly-once)
    val sv = VersionedParquet.currentVersion(spark, silver)
    val qv = VersionedParquet.currentVersion(spark, quarantine)
    drain()
    assert(VersionedParquet.currentVersion(spark, silver) === sv)
    assert(VersionedParquet.currentVersion(spark, quarantine) === qv)
  }

  test("a crash between the two appends replays without duplicating " +
      "the committed side") {
    val work = Files.createTempDirectory("graft-expect-crash")
    val watch = Files.createDirectory(work.resolve("landing"))
    val silver = work.resolve("silver").toString
    val quarantine = work.resolve("quarantine").toString
    val ckpt = work.resolve("ckpt").toString
    Files.write(watch.resolve("a.csv"), "7\n-8\n9".getBytes("UTF-8"))
    // simulate: silver's half of batch 0 committed, then crash BEFORE
    // the quarantine append and before the checkpoint commit
    VersionedSink.commitAppend(spark, silver, 0L,
      Seq(7L, 9L).toDF("x"), keepVersions = 20)
    // restart: the stream replays batch 0 from scratch
    VersionedSink.runExpectations(
      spark.readStream.schema(schema).csv(watch.toString),
      silver, quarantine, ckpt, expectations, keepVersions = 20)
      .awaitTermination()
    assert(VersionedParquet.read(spark, silver).as[Long].collect()
      .sorted.toSeq === Seq(7L, 9L),
      "the committed side skips the replay — no duplicates")
    assert(VersionedParquet.read(spark, quarantine)
      .select("x").as[Long].collect().toSeq === Seq(-8L),
      "the uncommitted side completes on replay")
  }
}
