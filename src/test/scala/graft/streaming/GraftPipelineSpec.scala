package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.VersionedParquet

/** End-to-end table-to-table streaming: a graft SOURCE tails bronze, a
  * transform runs in the stream, and VersionedSink lands each
  * micro-batch as an exactly-once append version on silver. The
  * composition contract: silver always equals transform(bronze) after
  * a drain, restarts consume only new bronze versions, and a re-drain
  * with nothing new publishes nothing.
  */
class GraftPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def drain(bronze: String, silver: String, ckpt: String): Unit = {
    val src = spark.readStream.format("graft")
      .option("startingVersion", "0").load(bronze)
      .filter(col("k") % 2 === 0)
      .withColumn("dbl", col("cents") * 2)
    val q = VersionedSink.runAppend(src, silver, ckpt, keepVersions = 10)
    q.awaitTermination()
  }

  private def silverRows(silver: String): Set[(Long, Long, Long)] =
    VersionedParquet.read(spark, silver)
      .select("k", "cents", "dbl").as[(Long, Long, Long)]
      .collect().toSet

  test("silver tracks transform(bronze) across drains, exactly once") {
    val work = Files.createTempDirectory("graft-pipeline")
    val bronze = work.resolve("bronze").toString
    val silver = work.resolve("silver").toString
    val ckpt = work.resolve("ckpt").toString

    VersionedParquet.publish(
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("k", "cents"),
      bronze, keepVersions = 10)
    drain(bronze, silver, ckpt)
    assert(silverRows(silver) === Set((2L, 20L, 40L), (4L, 40L, 80L)))
    val silverV1 = VersionedParquet.currentVersion(spark, silver).get

    // two bronze appends, one drain: only the new rows land
    VersionedParquet.append(spark, bronze,
      Seq((5L, 50L), (6L, 60L)).toDF("k", "cents"), keepVersions = 10)
    VersionedParquet.append(spark, bronze,
      Seq((8L, 80L)).toDF("k", "cents"), keepVersions = 10)
    drain(bronze, silver, ckpt)
    assert(silverRows(silver) ===
      Set((2L, 20L, 40L), (4L, 40L, 80L), (6L, 60L, 120L),
        (8L, 80L, 160L)))

    // silver advanced by micro-batch appends, not a rebuild: its
    // version chain grew and the original version is still readable
    val silverV2 = VersionedParquet.currentVersion(spark, silver).get
    assert(silverV2 > silverV1)
    assert(VersionedParquet.read(spark, silver, Some(silverV1))
      .count() === 2L)

    // nothing new: a third drain publishes nothing
    drain(bronze, silver, ckpt)
    assert(VersionedParquet.currentVersion(spark, silver).get === silverV2)
  }
}
