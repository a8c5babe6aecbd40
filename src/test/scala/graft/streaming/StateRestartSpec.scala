package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.VersionedParquet

/** Custom GroupState survives a checkpoint restart — the last leg of
  * the streaming-state recovery triangle (buffered join state:
  * JoinStreamSpec; sink exactly-once: VersionedSinkSpec; maintained
  * MV: MvStreamSpec). flatMapGroupsWithState counters accumulated in
  * run 1 must continue — not restart from zero — in run 2, proven by
  * final per-user counts equal to the full batch answer while run 2's
  * input contains only the second half of the events.
  */
class StateRestartSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("flatMapGroupsWithState counters continue across a restart") {
    val work = Files.createTempDirectory("graft-state-restart")
    val watch = Files.createDirectory(work.resolve("landing"))
    val root = work.resolve("log").toString
    val checkpoint = work.resolve("chk").toString
    val raw = spark.read.parquet(s"$sf/events.parquet")
    def stage(name: String, pred: org.apache.spark.sql.Column): Unit = {
      val tmp = work.resolve("s" + name).toString
      raw.filter(pred).coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, watch.resolve(name))
    }
    // append-log sink: every Update-mode emission lands as rows, so the
    // table records the running counter trajectory across both runs
    def runOnce(): Unit = {
      val stats = EventStream.userRunningStats(spark,
        EventStream.readEvents(spark, watch.toString)).toDF()
      VersionedSink.run(stats, root, checkpoint,
        (cur, batch) => cur.unionByName(batch),
        outputMode = "update").awaitTermination()
    }

    stage("f0.parquet", col("event_id") % 2 === 0)
    runOnce()
    val afterRun1 = VersionedParquet.read(spark, root)
      .groupBy("user_id").agg(max("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    stage("f1.parquet", col("event_id") % 2 === 1)
    runOnce()
    val trajectory = VersionedParquet.read(spark, root)
      .groupBy("user_id").agg(max("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val expected = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(trajectory === expected,
      "final counters must equal the full-batch counts — run 2 saw only " +
        "half the events, so equality requires recovered GroupState")
    // the restart was load-bearing: some user counted in BOTH halves
    // ended above its run-1 counter (continued, not restarted)
    val continued = expected.keys.filter(u =>
      afterRun1.getOrElse(u, 0L) > 0 &&
        trajectory(u) > afterRun1.getOrElse(u, 0L))
    assert(continued.nonEmpty,
      "users spanning the restart must continue their run-1 counter")
    // and nothing was double-counted: no counter exceeds the batch truth
    assert(trajectory.forall { case (u, n) => n <= expected(u) })
  }
}
