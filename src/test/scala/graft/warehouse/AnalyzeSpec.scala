package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANALYZE contract: exact row/null/min-max accounting, NDV within
  * the 64-register HLL's statistical bound, version-stamped storage
  * whose staleness is visible, column selection, and type gating.
  */
class AnalyzeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-analyze-$tag").toString

  private def seed(root: String): Unit = {
    import spark.implicits._
    // 1000 rows: id unique; g 10 distinct; n nullable (every 4th null)
    VersionedParquet.publish(
      (0L until 1000L).map(i => (i, s"g${i % 10}",
        if (i % 4 == 0) None else Some(i % 100))).toDF("id", "g", "n"),
      root, keepVersions = 20)
  }

  test("exact counts, nulls, min/max; NDV within the HLL bound") {
    val root = tmp("basic"); seed(root)
    val stats = Analyze.table(spark, root).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats.keySet == Set("id", "g", "n"))
    val id = stats("id")
    assert(id.getLong(1) == 1000L && id.getLong(2) == 0L)
    assert(id.getString(4) == "0" && id.getString(5) == "999",
      "string-rendered lexicographic min/max")
    // NDV: 64 registers → ~13% stderr; 3-sigma bound
    assert(math.abs(id.getDouble(3) - 1000.0) / 1000.0 < 0.4,
      s"id ndv ${id.getDouble(3)} too far from 1000")
    val g = stats("g")
    assert(g.getLong(2) == 0L)
    // 10 distinct: linear-counting regime, tight
    assert(math.abs(g.getDouble(3) - 10.0) < 3.0,
      s"g ndv ${g.getDouble(3)} too far from 10")
    val n = stats("n")
    assert(n.getLong(2) == 250L, "every 4th n is null")
  }

  test("stats store version-stamped; a later commit leaves them visibly stale") {
    import spark.implicits._
    val root = tmp("stale"); seed(root)
    Analyze.table(spark, root)
    val (v1, _) = Analyze.stats(spark, root).get
    assert(v1 == 0L)
    VersionedParquet.append(spark, root,
      Seq((5000L, "gX", Some(1L))).toDF("id", "g", "n"),
      keepVersions = 20)
    // stats still describe version 0 — stale but honest
    val (v2, df) = Analyze.stats(spark, root).get
    assert(v2 == 0L)
    assert(df.filter(col("colname") === "id").head().getLong(1) == 1000L)
    // re-analyze stamps the live version
    Analyze.table(spark, root)
    val (v3, df3) = Analyze.stats(spark, root).get
    assert(v3 == 1L)
    assert(df3.filter(col("colname") === "id").head().getLong(1) == 1001L)
  }

  test("FOR COLUMNS subset; unsupported types reject loudly") {
    import spark.implicits._
    val root = tmp("cols")
    VersionedParquet.publish(
      (0L until 50L).map(i => (i, i / 7.0, s"s$i")).toDF("id", "d", "s"),
      root, keepVersions = 20)
    val sub = Analyze.table(spark, root, Seq("id")).collect()
    assert(sub.map(_.getString(0)).toSeq == Seq("id"))
    // default skips the double column rather than mis-hashing it
    val all = Analyze.table(spark, root).collect()
    assert(all.map(_.getString(0)).sorted.toSeq == Seq("id", "s"))
    val e = intercept[IllegalArgumentException] {
      Analyze.table(spark, root, Seq("d"))
    }
    assert(e.getMessage.contains("engine-portable"))
  }

  test("maintain: insert-only ranges merge incrementally and equal a " +
      "full rebuild EXACTLY; deletes force the recompute path") {
    import spark.implicits._
    val root = tmp("maintain"); seed(root)
    Analyze.table(spark, root)
    // nothing advanced → current
    assert(Analyze.maintain(spark, root)._2 == "current")
    VersionedParquet.append(spark, root,
      (1000L until 1300L).map(i => (i, s"g${i % 13}",
        Some(i % 100))).toDF("id", "g", "n"), keepVersions = 20)
    VersionedParquet.append(spark, root,
      (1300L until 1400L).map(i => (i, s"g${i % 13}",
        None: Option[Long])).toDF("id", "g", "n"), keepVersions = 20)
    val (inc, p) = Analyze.maintain(spark, root)
    assert(p == "incremental")
    val incRows = inc.collect().map(_.toSeq).toSet
    // the decisive check: incremental == full rebuild, bit for bit
    // (counts, nulls, min/max AND the HLL NDV estimate)
    val full = Analyze.table(spark, root).collect().map(_.toSeq).toSet
    assert(incRows === full,
      "incremental maintenance must equal a full re-ANALYZE exactly")
    // a delete makes the lattice non-subtractable → honest recompute
    VersionedParquet.delete(spark, root, col("id") % 9 === 0,
      keepVersions = 20)
    val (rec, p2) = Analyze.maintain(spark, root)
    assert(p2 == "recomputed")
    val expected = Analyze.table(spark, root).collect()
      .map(_.toSeq).toSet
    assert(rec.collect().map(_.toSeq).toSet === expected)
    // and the recomputed lattice supports further increments
    VersionedParquet.append(spark, root,
      Seq((5000L, "gX", Some(1L))).toDF("id", "g", "n"),
      keepVersions = 20)
    assert(Analyze.maintain(spark, root)._2 == "incremental")
  }

  test("stats-driven planning: ANALYZE output reaches Catalyst - a " +
    "DV-masked dimension whose file bytes exceed the broadcast " +
    "threshold but whose live rows fit broadcasts WITH stats, " +
    "shuffle-joins without; stale stats are ignored") {
    import spark.implicits._
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val root = tmp("plan"); 
    // 20k rows, then DV-delete 95% - file bytes stay, live rows shrink
    VersionedParquet.publish(
      (0L until 20000L).map(i => (i, s"name-$i-padpadpadpadpad"))
        .toDF("id", "nm"), root, keepVersions = 20)
    VersionedParquet.delete(spark, root, col("id") % 20 =!= 0,
      keepVersions = 20)
    Analyze.table(spark, root)
    val (dim, how) = Analyze.readAnalyzed(spark, root)
    assert(how === "applied")
    val plain = VersionedParquet.read(spark, root)
    val statsSize = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    val plainSize = plain.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(statsSize < plainSize,
      s"live-row estimate $statsSize must undercut file bytes $plainSize")
    val fact = (0L until 50000L).map(i => (i % 20000L, i)).toDF("id", "x")
    val mid = ((statsSize + plainSize) / 2).toString
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", mid)
      // the DV mask itself is a broadcast ANTI join; the planning
      // decision under test is the fact-dim INNER join
      def bhjCount(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.sparkPlan.collect {
          case b: BroadcastHashJoinExec
            if b.joinType == org.apache.spark.sql.catalyst.plans.Inner
          => b }.length
      val withStats = fact.join(dim, "id")
      val without = fact.join(plain, "id")
      assert(bhjCount(withStats) === 1,
        "ANALYZE stats must flip the dimension to a broadcast join")
      assert(bhjCount(without) === 0,
        "without stats the file-size estimate exceeds the threshold")
      // both strategies agree on the answer
      assert(withStats.count() === without.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    // stale: a commit after ANALYZE ignores the stored stats
    VersionedParquet.publish(
      (20000L until 20100L).map(i => (i, s"n$i")).toDF("id", "nm"),
      root, keepVersions = 20)
    val (_, how2) = Analyze.readAnalyzed(spark, root)
    assert(how2 === "stale")
  }

  test("two-sided stats attach: a join of two ANALYZEd tables " +
    "carries each side's OWN rowCount (matched by path, not plan " +
    "position) and the join plans broadcast where file sizes would " +
    "shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
      LogicalRelation}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val rootA = tmp("twoA"); val rootB = tmp("twoB")
    VersionedParquet.publish(
      (0L until 20000L).map(i => (i, s"a-$i-padpadpadpadpad"))
        .toDF("id", "va"), rootA, keepVersions = 20)
    VersionedParquet.delete(spark, rootA, col("id") % 20 =!= 0,
      keepVersions = 20) // 1000 live
    VersionedParquet.publish(
      (0L until 20000L).map(i => (i, s"b-$i-padpadpadpadpad"))
        .toDF("id", "vb"), rootB, keepVersions = 20)
    VersionedParquet.delete(spark, rootB, col("id") % 400 =!= 0,
      keepVersions = 20) // 50 live
    Analyze.table(spark, rootA)
    Analyze.table(spark, rootB)
    val (a, howA) = Analyze.readAnalyzed(spark, rootA)
    val (b, howB) = Analyze.readAnalyzed(spark, rootB)
    assert(howA === "applied" && howB === "applied")
    val joined = a.join(b, "id")
    // each base relation reports ITS OWN live rowCount — the path
    // match must put 1000 on A's scan and 50 on B's, regardless of
    // which relation the planner puts first
    val statsByPath = joined.queryExecution.analyzed.collect {
      case lr: LogicalRelation
          if lr.catalogTable.exists(_.stats.exists(_.rowCount.isDefined)) =>
        val root = lr.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.head.toUri.getPath
        root -> lr.catalogTable.get.stats.get.rowCount.get.toLong
    }
    val forA = statsByPath.filter(_._1.startsWith(rootA)).map(_._2)
    val forB = statsByPath.filter(_._1.startsWith(rootB)).map(_._2)
    assert(forA === Seq(1000L),
      s"A's scan must carry A's rowCount; got $statsByPath")
    assert(forB === Seq(50L),
      s"B's scan must carry B's rowCount; got $statsByPath")
    // strategy: with a threshold both STATS estimates clear but both
    // FILE sizes bust, the analyzed join broadcasts and the plain
    // join cannot
    val sizes = Seq(a, b).map(
      _.queryExecution.optimizedPlan.stats.sizeInBytes)
    val plainA = VersionedParquet.read(spark, rootA)
    val plainB = VersionedParquet.read(spark, rootB)
    val plainSizes = Seq(plainA, plainB).map(
      _.queryExecution.optimizedPlan.stats.sizeInBytes)
    val mid = ((sizes.max + plainSizes.min) / 2).toString
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", mid)
      def bhjInner(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.sparkPlan.collect {
          case j: BroadcastHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.Inner
          => j }.length
      assert(bhjInner(a.join(b, "id")) === 1,
        "two ANALYZEd sides must plan the inner join as broadcast")
      assert(bhjInner(plainA.join(plainB, "id")) === 0,
        "file-size estimates alone must not broadcast here")
      assert(a.join(b, "id").count() ===
        plainA.join(plainB, "id").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
