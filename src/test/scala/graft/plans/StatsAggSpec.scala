package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.{FileStats, VersionedParquet}

/** StatsAggRewrite: grand-total COUNT/MIN/MAX over a clean physical
  * graft view folds from the file-stats sidecar (LocalTableScan, no
  * file scan); every shape the sidecar cannot answer exactly falls
  * back to an honest scan — merge-on-read overlay, policies, pinned
  * versions, grouping, unsupported aggregates.
  */
class StatsAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-statsagg-$tag")
      .toString + "/t"

  private def seed(root: String): Unit = {
    import spark.implicits._
    FileStats.publishClustered(
      (0L until 500L).map(i => (i, i * 3L)).toDF("id", "x"),
      root, layout = Seq("id"), statsCols = Seq("id", "x"),
      nFiles = 4, keepVersions = 20)
  }

  private def served(root: String): DataFrame =
    spark.read.format("graft").option("path", root).load()

  private def isMeta(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("LocalTableScan")

  test("clean physical view folds from metadata; values exact") {
    val root = tmp("fold"); seed(root)
    val df = served(root).agg(count(lit(1)).as("n"),
      min("id").as("mn"), max("x").as("mx"))
    assert(isMeta(df), "must answer from the sidecar, not a scan")
    assert(df.collect().head.toSeq === Seq(500L, 0L, 1497L))
  }

  test("fallbacks: overlay, policies, pinned versions, grouping, and " +
      "unsupported aggregates all take the honest scan") {
    import spark.implicits._
    val root = tmp("fallback"); seed(root)
    // grouping and unsupported aggregate shapes: untouched
    assert(!isMeta(served(root).groupBy(col("id") % 2)
      .agg(count(lit(1)))))
    assert(!isMeta(served(root).agg(sum("x"))))
    // pinned version: sidecar describes the live layout only
    val pinned = spark.read.format("graft").option("path", root)
      .option("versionAsOf", "0").load().agg(count(lit(1)).as("n"))
    assert(!isMeta(pinned))
    // merge-on-read overlay: same query, honest scan, exact values
    VersionedParquet.upsert(spark, root,
      Seq((1000L, 7L)).toDF("id", "x"), Seq("id"), keepVersions = 20)
    val after = served(root).agg(count(lit(1)).as("n"),
      max("id").as("mx"))
    assert(!isMeta(after), "overlay must disable the metadata answer")
    assert(after.collect().head.toSeq === Seq(501L, 1000L))
    // policies: a row filter changes the count, a mask the values
    val root2 = tmp("pol"); seed(root2)
    VersionedParquet.setRowFilter(spark, root2, "id % 2 = 0")
    val filtered = served(root2).agg(count(lit(1)).as("n"))
    assert(!isMeta(filtered))
    assert(filtered.collect().head.getLong(0) === 250L)
  }
}
