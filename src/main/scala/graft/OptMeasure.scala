package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-16 optimization measurement harness (guide §1: measure first).
  *
  * Runs the named queries exactly as Bench does — fixture = the
  * queries() closure call, serve = noop materialization — but repeats
  * the serve leg so steady-state cost separates from JIT/codegen
  * warm-up, and writes each query's `explain("formatted")` output to
  * `<planDir>/<name>_<tag>.txt` (the committed before/after plan
  * evidence for this round).
  *
  *   sbt 'runMain graft.OptMeasure <sfDir> <tag> <planDir> q102 q225 ...'
  *
  * Env: SPARK_GRAFT_CPUS (default 32 here — this is a local analysis
  * tool, not the driver bench), SPARK_GRAFT_REPEATS (default 3).
  */
object OptMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = args(1)
    val planDir = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same session warmup as Bench: codegen compiler + shuffle + parquet.
    spark.range(1000000).selectExpr("id % 7 AS k")
      .groupBy("k").count().write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet")
      .write.format("noop").mode("overwrite").save()
    new java.io.File(planDir).mkdirs()
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName.getOrElse(n,
        byName(SparkEntry.all.map(_.name).find(_.startsWith(n)).get))
      spark.sparkContext.setJobDescription(s"${q.name} fixture")
      val t0 = System.nanoTime()
      val df = q.fn(spark, sfDir)
      val tFix = (System.nanoTime() - t0) / 1e9
      val serves = (1 to repeats).map { i =>
        spark.sparkContext.setJobDescription(s"${q.name} serve $i")
        val s0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - s0) / 1e9
      }
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$planDir/${q.name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(f"[opt] ${q.name}%-34s fixture=$tFix%7.2f serves=" +
        serves.map(v => f"$v%6.2f").mkString(" "))
    }
    spark.stop()
  }
}
