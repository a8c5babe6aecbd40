package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.VersionedParquet

/** Continuously-maintained materialized view: the maintained aggregate
  * must equal a from-scratch recompute at EVERY published version —
  * including versions published after a checkpoint restart — and a
  * re-run with nothing new must publish nothing (exactly-once).
  */
class MvStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("lang", StringType), StructField("n_chars", LongType),
    StructField("w", IntegerType)))

  test("maintained view == from-scratch recompute at every version, across a restart") {
    val work = Files.createTempDirectory("graft-mv")
    val watch = Files.createDirectory(work.resolve("cdc"))
    val root = work.resolve("view").toString
    val checkpoint = work.resolve("chk").toString

    // CDC batches: inserts across langs, then deletes that partially —
    // and for one lang completely — retract earlier inserts. One file
    // per micro-batch (maxFilesPerTrigger=1), mtimes force the order.
    val batches = Seq(
      Seq(("en", 100L, 1), ("en", 50L, 1), ("de", 70L, 1)),
      Seq(("fr", 10L, 1), ("en", 30L, 1), ("de", 70L, -1)), // de drops to 0
      Seq(("en", 50L, -1), ("fr", 25L, 1), ("ja", 5L, 1)),
      Seq(("ja", 5L, -1), ("ja", 7L, 1), ("en", 100L, -1)))
    val now = System.currentTimeMillis()
    def drop(i: Int): Unit = {
      val f = watch.resolve(f"b$i%02d.csv")
      Files.write(f, batches(i)
        .map { case (l, c, w) => s"$l,$c,$w" }.mkString("\n")
        .getBytes("UTF-8"))
      f.toFile.setLastModified(now + i * 2000L)
    }
    def source() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").csv(watch.toString)

    def checkAllVersions(): Unit = {
      val vs = MvStream.versions(spark, root)
      // one published version per micro-batch, batchIds 0..n-1
      vs.foreach { v =>
        val b = VersionedParquet
          .snapshotMarker(spark, root, VersionedSink.BatchMarker, Some(v))
          .get.trim.toLong
        // from-scratch recompute over the PREFIX of batches this
        // version covers (file order == batch order by construction)
        val prefix = batches.take(b.toInt + 1).flatten
          .toDF("lang", "n_chars", "w")
        val expect = MvStream.recompute(prefix)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toSet
        val got = VersionedParquet.read(spark, root, Some(v))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toSet
        assert(got === expect, s"version $v (batch $b) diverged")
      }
    }

    // run 1: two batches
    drop(0); drop(1)
    MvStream.run(source(), root, checkpoint).awaitTermination()
    val vs1 = MvStream.versions(spark, root)
    assert(vs1.size === 2, s"one version per micro-batch, got $vs1")
    checkAllVersions()
    // the de group must have dropped out at v1 (count retracted to 0)
    assert(!VersionedParquet.read(spark, root, Some(vs1.max))
      .collect().map(_.getString(0)).contains("de"))

    // restart with the same checkpoint: two more batches continue the
    // maintenance from recovered state — every new version must still
    // equal its prefix recompute
    drop(2); drop(3)
    MvStream.run(source(), root, checkpoint).awaitTermination()
    val vs2 = MvStream.versions(spark, root)
    assert(vs2.size === 4, s"restart continues the version sequence: $vs2")
    checkAllVersions()

    // idempotent re-run: nothing new ⇒ nothing published
    MvStream.run(source(), root, checkpoint).awaitTermination()
    assert(MvStream.versions(spark, root) === vs2,
      "a no-op run must not publish")

    // final state sanity: en = 100+50+30-50-100 = 30 chars over 1 doc;
    // fr = 2 docs; ja = 1 doc (5 retracted, 7 kept); de gone
    val fin = VersionedParquet.read(spark, root)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(fin === Map("en" -> (1L, 30L), "fr" -> (2L, 35L),
      "ja" -> (1L, 7L)))
  }

  test("a generic MvSpec maintains several sums at once") {
    // two maintained sums (chars + tokens) through insert, partial
    // retraction, and a full group retraction — the generic fold must
    // track each sum independently and still drop zero-count groups
    val spec = MvStream.MvSpec("k", "w", "n",
      Seq("chars" -> "sum_chars", "toks" -> "sum_toks"))
    def df(rows: Seq[(String, Long, Long, Int)]) =
      rows.toDF("k", "chars", "toks", "w")
    val b0 = df(Seq(("a", 10L, 3L, 1), ("a", 20L, 5L, 1), ("b", 7L, 2L, 1)))
    val b1 = df(Seq(("a", 10L, 3L, -1), ("b", 7L, 2L, -1), ("c", 1L, 1L, 1)))
    val out = Seq(b0, b1).foldLeft(b0.limit(0))(MvStream.maintainFold(spec))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === Map("a" -> (1L, 20L, 5L), "c" -> (1L, 1L, 1L)),
      "b retracted to zero must drop; both sums advance independently")
  }

  test("a replayed micro-batch never double-advances the aggregate") {
    val work = Files.createTempDirectory("graft-mv-replay")
    val root = work.resolve("view").toString
    val b0 = Seq(("en", 10L, 1), ("en", 20L, 1)).toDF("lang", "n_chars", "w")
    val b1 = Seq(("en", 5L, -1)).toDF("lang", "n_chars", "w")
    def fold = (c: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame) =>
      MvStream.maintainFold(c, b)
    assert(VersionedSink.commitBatch(spark, root, 0L, b0, fold))
    assert(VersionedSink.commitBatch(spark, root, 1L, b1, fold))
    // replay batch 1 (crash-between-side-effect-and-commit shape)
    assert(!VersionedSink.commitBatch(spark, root, 1L, b1, fold))
    val r = VersionedParquet.read(spark, root).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === 1L && r.head.getLong(2) === 25L,
      "10+20-5 applied exactly once")
  }
}
