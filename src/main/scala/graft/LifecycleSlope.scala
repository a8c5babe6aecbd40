package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Lifecycle scale-slope harness — measures the PER-COMMIT cost of the
  * lakehouse DML/maintenance chain (the q136–q158 family's operations)
  * at a given sf, with FIXED-SIZE change batches, so running it at
  * sf0.1 and sf1 (10× table) separates the two cost families:
  *
  *   - ops claimed O(changes) / O(metadata) — append, CDF read,
  *     restore, branch create / fast-forward — must stay FLAT across
  *     the 10× table (slope ≈ 1×);
  *   - ops with an inherent find-matches scan — keyed merge, searched
  *     UPDATE/DELETE — carry one O(live view) term to locate matches
  *     (exactly the shape Delta/Iceberg pay: file skipping reduces,
  *     never removes it) plus O(changes) writes; their slope is
  *     bounded by the scan, reported so the claim is measured, not
  *     argued.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt 'runMain graft.LifecycleSlope'
  * Prints one JSON line {"op": seconds, …}; compare runs across sfs.
  */
object LifecycleSlope {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.warehouse.{Branch, Optimistic, VersionedParquet}
    val work = java.nio.file.Files.createTempDirectory("graft-lifecycle")
    val root = work.resolve("orders").toString
    val o = graft.sources.Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      (col("o_orderkey") % 16).cast("int").as("part"))
    // session warmup (codegen, shuffle, parquet reader)
    spark.range(1000000).selectExpr("id % 7 AS k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      timings(name) = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
      r
    }
    // table build — O(table), expected ~10× at sf1 (the honest floor)
    t("publish_table") {
      VersionedParquet.publish(o, root, keepVersions = 30)
    }
    val nRows = spark.read.parquet(
      new org.apache.hadoop.fs.Path(root, "v00000000").toString).count()
    // FIXED batches: 10k rows / 10k keys at every sf
    val B = 10000L
    val newRows = spark.range(B).select(
      (col("id") + 1000000000L).as("k"),
      (col("id") * 7L).as("cents"),
      (col("id") % 16).cast("int").as("part"))
    t("append_10k") {
      VersionedParquet.append(spark, root, newRows, keepVersions = 30)
    }
    val upserts = o.filter(col("k") < 3L * B && col("k") % 3 === 0)
      .withColumn("cents", col("cents") + 1L)
    t("merge_10k_keys") {
      Optimistic.upsert(spark, root, upserts, Seq("k"), keepVersions = 30)
    }
    t("update_10k_pred") {
      Optimistic.updateWhere(spark, root,
        col("k") >= 6L * B && col("k") < 9L * B && col("k") % 3 === 0,
        Map("cents" -> (col("cents") + 2L)), Seq("k"), keepVersions = 30)
    }
    t("delete_10k_pred") {
      Optimistic.deleteWhere(spark, root,
        col("k") >= 12L * B && col("k") < 15L * B && col("k") % 3 === 0,
        Seq("k"), keepVersions = 30)
    }
    val live = VersionedParquet.currentVersion(spark, root).get
    val nCdf = t("cdf_read_last") {
      VersionedParquet.changes(spark, root, live - 1, live).count()
    }
    // restore splits into its two cost families: the pointer/overlay
    // copy is metadata-only (withFeed=false — must stay FLAT); the
    // optional restore FEED is an explicit full multiset diff of
    // current-vs-target (O(both views) by design — its slope measures
    // the diff, not the restore)
    t("restore_prev_nofeed") {
      VersionedParquet.restore(spark, root, live - 1,
        keepVersions = 30, withFeed = false)
    }
    t("restore_prev_feed") {
      val l = VersionedParquet.currentVersion(spark, root).get
      VersionedParquet.restore(spark, root, l - 2, keepVersions = 30)
    }
    t("branch_create") {
      Branch.create(spark, root, "slope")
    }
    t("branch_append_10k") {
      VersionedParquet.append(spark, Branch.branchRoot(root, "slope"),
        newRows.withColumn("k", col("k") + 2000000000L),
        keepVersions = 30)
    }
    t("branch_fast_forward") {
      Branch.fastForward(spark, root, "slope")
    }
    val qs = timings.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"sf":"$sfDir","rows":$nRows,"cdf_rows":$nCdf,$qs}""")
    spark.stop()
  }
}
