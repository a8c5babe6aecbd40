package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.VersionedParquet

/** Exactly-once guarantees of the versioned streaming sink: replayed
  * micro-batches are no-ops, a crash before the pointer swap loses
  * nothing and double-applies nothing, and every committed batch is a
  * time-travelable table version.
  */
class VersionedSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val appendFold =
    (current: org.apache.spark.sql.DataFrame,
     batch: org.apache.spark.sql.DataFrame) => current.unionByName(batch)

  test("file-stream drops fold into one versioned table, restart-safe") {
    val work = Files.createTempDirectory("graft-vsink")
    val watch = Files.createDirectory(work.resolve("landing"))
    val root = work.resolve("tbl").toString
    val checkpoint = work.resolve("chk").toString
    val schema = StructType(Seq(StructField("x", LongType)))

    def drop(name: String, xs: Seq[Long]): Unit =
      Files.write(watch.resolve(name), xs.mkString("\n").getBytes("UTF-8"))
    def source() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force multiple micro-batches
      .csv(watch.toString)

    drop("a.csv", Seq(1L, 2L))
    drop("b.csv", Seq(3L))
    VersionedSink.run(source(), root, checkpoint, appendFold)
      .awaitTermination()
    assert(VersionedParquet.read(spark, root).as[Long].collect().sorted
      .toSeq === Seq(1L, 2L, 3L))
    val afterFirst = VersionedSink.lastBatchId(spark, root).get

    // restart with the SAME checkpoint: already-seen files are not
    // re-folded, new drops continue the batchId sequence
    drop("c.csv", Seq(4L, 5L))
    VersionedSink.run(source(), root, checkpoint, appendFold)
      .awaitTermination()
    assert(VersionedParquet.read(spark, root).as[Long].collect().sorted
      .toSeq === (1L to 5L))
    assert(VersionedSink.lastBatchId(spark, root).get > afterFirst)
  }

  test("a replayed batchId is a committed no-op (exactly-once fold)") {
    val root = Files.createTempDirectory("graft-vsink-replay")
      .resolve("tbl").toString
    assert(VersionedSink.commitBatch(spark, root, 0L,
      Seq(10L).toDF("x"), appendFold))
    assert(VersionedSink.commitBatch(spark, root, 1L,
      Seq(11L).toDF("x"), appendFold))
    val versionsBefore = VersionedParquet.versions(spark, root)
    // the at-least-once replay: same batchId, same (or corrupted!)
    // payload — must not touch the table
    assert(!VersionedSink.commitBatch(spark, root, 1L,
      Seq(999L).toDF("x"), appendFold))
    assert(!VersionedSink.commitBatch(spark, root, 0L,
      Seq(999L).toDF("x"), appendFold))
    assert(VersionedParquet.versions(spark, root) === versionsBefore)
    assert(VersionedParquet.read(spark, root).as[Long].collect().sorted
      .toSeq === Seq(10L, 11L))
    assert(VersionedSink.lastBatchId(spark, root) === Some(1L))
  }

  test("crash after data write but before pointer swap: retry applies once") {
    val root = Files.createTempDirectory("graft-vsink-crash")
      .resolve("tbl").toString
    assert(VersionedSink.commitBatch(spark, root, 0L,
      Seq(1L).toDF("x"), appendFold))
    // simulate the crash window: the batch-1 snapshot directory was
    // written (with its marker) but the pointer never moved
    val orphan = new java.io.File(root, "v00000001")
    assert(orphan.mkdirs())
    Files.write(orphan.toPath.resolve("junk.parquet"), Array[Byte](9))
    Files.write(orphan.toPath.resolve(VersionedSink.BatchMarker),
      "1".getBytes("UTF-8"))
    // live marker still says batch 0 → the retry must RUN, clobber the
    // orphan, and commit exactly one application of batch 1
    assert(VersionedSink.lastBatchId(spark, root) === Some(0L))
    assert(VersionedSink.commitBatch(spark, root, 1L,
      Seq(2L).toDF("x"), appendFold))
    assert(VersionedParquet.read(spark, root).as[Long].collect().sorted
      .toSeq === Seq(1L, 2L))
    assert(VersionedSink.lastBatchId(spark, root) === Some(1L))
  }

  test("every committed batch is a time-travelable version") {
    val root = Files.createTempDirectory("graft-vsink-tt")
      .resolve("tbl").toString
    (0L to 3L).foreach(b => assert(VersionedSink.commitBatch(spark, root,
      b, Seq(b).toDF("x"), appendFold, keepVersions = 10)))
    assert(VersionedParquet.versions(spark, root) === Seq(0L, 1L, 2L, 3L))
    // version v is the table as of batch v
    (0L to 3L).foreach { v =>
      assert(VersionedParquet.read(spark, root, Some(v)).as[Long]
        .collect().sorted.toSeq === (0L to v))
      assert(VersionedParquet.snapshotMarker(spark, root,
        VersionedSink.BatchMarker, Some(v)) === Some(v.toString))
    }
  }

  test("append sink: O(batch) versions, base never rewritten, restart-safe") {
    val work = Files.createTempDirectory("graft-vsink-append")
    val watch = Files.createDirectory(work.resolve("landing"))
    val root = work.resolve("tbl").toString
    val checkpoint = work.resolve("chk").toString
    val schema = StructType(Seq(StructField("x", LongType)))
    def drop(name: String, xs: Seq[Long]): Unit =
      Files.write(watch.resolve(name), xs.mkString("\n").getBytes("UTF-8"))
    def source() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .csv(watch.toString)
    def files(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(root)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    }

    drop("a.csv", Seq(1L, 2L))
    drop("b.csv", Seq(3L))
    VersionedSink.runAppend(source(), root, checkpoint, keepVersions = 10)
      .awaitTermination()
    assert(VersionedParquet.read(spark, root).as[Long].collect().sorted
      .toSeq === Seq(1L, 2L, 3L))
    val after2 = files()

    // restart continues; committed batches replay as no-ops; every
    // pre-existing file — INCLUDING batch b's delta — is untouched,
    // so each batch's cost was its own bytes, never a table rewrite
    drop("c.csv", Seq(4L, 5L))
    VersionedSink.runAppend(source(), root, checkpoint, keepVersions = 10)
      .awaitTermination()
    assert(VersionedParquet.read(spark, root).as[Long].collect().sorted
      .toSeq === (1L to 5L))
    val after3 = files()
    after2.foreach { case (f, len) =>
      assert(after3.get(f).contains(len),
        s"append sink rewrote pre-existing $f") }
    // each committed batch is still a time-travelable version with its
    // exactly-once marker
    val vs = VersionedParquet.versions(spark, root)
    assert(vs.size >= 3)
    assert(VersionedParquet.read(spark, root, Some(vs.head)).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("upsert fold: sink state equals batch answer over all data") {
    val root = Files.createTempDirectory("graft-vsink-upsert")
      .resolve("tbl").toString
    // latest-per-key upsert (W1 shape): key, seq, value
    val latest = (cur: org.apache.spark.sql.DataFrame,
                  b: org.apache.spark.sql.DataFrame) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("seq").desc)
      cur.unionByName(b)
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }
    val all = Seq((1L, 1L, "a"), (2L, 1L, "b"), (1L, 2L, "a2"),
      (3L, 1L, "c"), (2L, 3L, "b3"))
    all.zipWithIndex.foreach { case (row, i) =>
      assert(VersionedSink.commitBatch(spark, root, i.toLong,
        Seq(row).toDF("k", "seq", "v"), latest))
    }
    val got = VersionedParquet.read(spark, root)
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a2"), (2L, "b3"), (3L, "c")))
  }
}
