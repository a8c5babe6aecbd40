package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Retention-chain slope harness — the version-chain twin of
  * [[LifecycleSlope]]: where that one scales the DATA 10× with fixed
  * chains, this one scales the VERSION CHAIN 10× (10 vs 100 commits)
  * with fixed per-commit data, to pin the retention verbs' claimed
  * cost shapes by measurement:
  *
  *   - Delta `checkpoint` — O(live state): must stay FLAT across the
  *     10× chain (the live file set is one file either way; the JSON
  *     fold it absorbs is driver-side metadata);
  *   - Delta `vacuum` — O(orphans + walk): ~10× on a 10× orphan set
  *     is the CLAIM, not a regression;
  *   - post-vacuum `read` — O(checkpoint + suffix): FLAT (this is
  *     what the checkpoint is for);
  *   - Iceberg `expireSnapshots` keep=1 — O(expired manifests +
  *     orphans): ~10× on a 10× chain is the claim;
  *   - post-expire `read` — FLAT.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt 'runMain graft.RetentionSlope'
  * Prints one JSON line {"op@chain": seconds, …}; the interesting
  * readout is each op's 100-vs-10 ratio against its claimed shape.
  */
object RetentionSlope {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.{DeltaLite, IcebergLite}
    val o = graft.sources.Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
      .limit(5000).coalesce(1).cache()
    o.count() // materialize the fixed per-commit batch
    spark.range(1000000).selectExpr("id % 7 AS k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save() // session warmup
    val timings =
      scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      timings(name) = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
      r
    }
    Seq(10, 100).foreach { n =>
      val work = java.nio.file.Files
        .createTempDirectory(s"graft-retention-$n")
      // ── Delta: n full-replace commits → n-1 orphan files ─────────
      val dt = work.resolve("delta").toString
      t(s"delta_build_${n}_commits") {
        (0 until n).foreach(_ => DeltaLite.export(spark, o, dt))
      }
      t(s"delta_checkpoint@$n") { DeltaLite.checkpoint(spark, dt) }
      val (dFiles, dCommits) =
        t(s"delta_vacuum@$n") { DeltaLite.vacuum(spark, dt) }
      require(dFiles == n - 1 && dCommits == n,
        s"vacuum@$n swept ($dFiles, $dCommits), expected (${n - 1}, $n)")
      t(s"delta_read_postvacuum@$n") {
        DeltaLite.read(spark, dt).write.format("noop")
          .mode("overwrite").save()
      }
      // ── Iceberg: n overwrite snapshots → expire to the last ──────
      val it = work.resolve("iceberg").toString
      t(s"iceberg_build_${n}_snapshots") {
        (0 until n).foreach(i =>
          IcebergLite.export(spark, o, it, overwrite = i > 0))
      }
      val (nExp, nDel) = t(s"iceberg_expire@$n") {
        IcebergLite.expireSnapshots(spark, it, keepLast = 1)
      }
      require(nExp == n - 1 && nDel == n - 1,
        s"expire@$n removed ($nExp, $nDel), expected ${n - 1} each")
      t(s"iceberg_read_postexpire@$n") {
        IcebergLite.read(spark, it).write.format("noop")
          .mode("overwrite").save()
      }
    }
    val line = timings
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(line)
    spark.stop()
  }
}
