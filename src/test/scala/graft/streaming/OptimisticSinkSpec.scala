package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.VersionedParquet

/** Multi-stream exactly-once: two INDEPENDENT streaming queries drain
  * concurrently into one versioned table through the optimistic
  * commit protocol — neither blocks the other's micro-batches, every
  * batch lands exactly once per stream, each stream's replay check
  * survives the other stream's commits (markers carry forward under
  * the commit lock), and the final table is the exact union.
  */
class OptimisticSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("two concurrent file streams, one table, exactly-once each") {
    val work = Files.createTempDirectory("graft-osink")
    val root = work.resolve("tbl").toString
    // one-time bootstrap: the table exists before any stream writes
    VersionedParquet.publish(Seq.empty[Long].toDF("x"), root,
      keepVersions = 100)
    val schema = StructType(Seq(StructField("x", LongType)))
    def mkStream(tag: String, rows: Seq[Seq[Long]]) = {
      val watch = Files.createDirectory(work.resolve(s"landing-$tag"))
      rows.zipWithIndex.foreach { case (xs, i) =>
        Files.write(watch.resolve(s"$tag-$i.csv"),
          xs.mkString("\n").getBytes("UTF-8")) }
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // several micro-batches
        .csv(watch.toString)
        .writeStream
        .option("checkpointLocation",
          work.resolve(s"chk-$tag").toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                         id: Long) =>
          OptimisticSink.appendBatch(spark, root, tag, id, batch,
            keepVersions = 100); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    val qa = mkStream("sa", Seq(Seq(1L, 2L), Seq(3L), Seq(4L)))
    val qb = mkStream("sb", Seq(Seq(100L), Seq(101L, 102L)))
    qa.awaitTermination(120000); qb.awaitTermination(120000)

    assert(VersionedParquet.read(spark, root).as[Long].collect().sorted
      .toSeq === Seq(1L, 2L, 3L, 4L, 100L, 101L, 102L),
      "both streams' batches land exactly once")
    // both streams' progress is readable from the LIVE snapshot
    assert(OptimisticSink.lastBatchId(spark, root, "sa").get >= 2L)
    assert(OptimisticSink.lastBatchId(spark, root, "sb").get >= 1L)
    // 5 micro-batches = 5 versions above the bootstrap
    assert(VersionedParquet.currentVersion(spark, root) === Some(5L))

    // replay: each stream's already-committed batch is a no-op and
    // does NOT disturb the other stream's marker
    val before = VersionedParquet.currentVersion(spark, root)
    assert(!OptimisticSink.appendBatch(spark, root, "sa", 0L,
      Seq(999L).toDF("x"), keepVersions = 100))
    assert(!OptimisticSink.appendBatch(spark, root, "sb", 1L,
      Seq(998L).toDF("x"), keepVersions = 100))
    assert(VersionedParquet.currentVersion(spark, root) === before)
    assert(VersionedParquet.read(spark, root)
      .filter(col("x") > 900L).count() === 0L)
    // a NEW batch for either stream still lands
    assert(OptimisticSink.appendBatch(spark, root, "sb", 2L,
      Seq(103L).toDF("x"), keepVersions = 100))
    assert(OptimisticSink.lastBatchId(spark, root, "sa").get >= 2L,
      "stream a's marker must survive stream b's commit")
    assert(VersionedParquet.read(spark, root).as[Long].collect().sorted
      .toSeq === Seq(1L, 2L, 3L, 4L, 100L, 101L, 102L, 103L))
  }
}
