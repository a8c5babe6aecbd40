package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MV query-rewrite rule's contract: matching aggregates answer
  * from the registered view (scan-path proven), every non-matching
  * shape is left on the base — a rewrite firing on a shape the MV
  * cannot answer (filtered base, different key, an aggregate the view
  * lacks) would be a wrong-results bug, and parent operators must keep
  * resolving because output exprIds survive the swap.
  */
class MvRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val basePath: String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mv-base").toString + "/t"
    (0L until 5000L).map(i => (i, s"g${i % 7}", i % 100))
      .toDF("id", "g", "x")
      .write.parquet(dir)
    dir
  }

  private lazy val mvPath: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mv-view").toString + "/mv"
    spark.read.parquet(basePath).groupBy("g")
      .agg(sum("x").as("sx"), count(lit(1)).as("n"))
      .write.parquet(dir)
    dir
  }

  private def registered[T](body: => T): T = {
    GraftFunctions.register(spark)
    MvRegistry.register(basePath, "g", "x",
      spark.read.parquet(mvPath), "g", "sx", "n")
    try body finally MvRegistry.clear()
  }

  private def scans(df: DataFrame): Seq[String] =
    MvRewrite.scanPaths(df.queryExecution.optimizedPlan)

  private def textbook: DataFrame =
    spark.read.parquet(basePath).groupBy("g")
      .agg(sum("x").as("sx"), count(lit(1)).as("n"))

  test("matching aggregate answers from the view, result identical") {
    registered {
      val q = textbook.orderBy("g")
      assert(scans(q).forall(_.contains("/mv")),
        s"expected the MV scan, got ${scans(q)}")
      val viaMv = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      MvRegistry.clear()
      val direct = textbook.orderBy("g").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(viaMv === direct)
    }
  }

  test("parent operators survive the swap (exprIds preserved)") {
    registered {
      // a filter and a self-join ABOVE the aggregate reference its
      // output attributes; both must resolve against the rewritten
      // subtree and compute correct values
      val q = textbook.filter(col("sx") > 0)
        .join(textbook.select(col("g"), col("n").as("n2")), "g")
        .orderBy("g")
      assert(scans(q).forall(_.contains("/mv")))
      val rows = q.collect()
      assert(rows.length === 7)
      assert(rows.forall(r => r.getLong(2) === r.getLong(3)),
        "both join sides must carry the same per-group count")
    }
  }

  test("group-key-only predicates commute: filtered dashboard answers from the view") {
    registered {
      val q = spark.read.parquet(basePath).filter(col("g") === "g3")
        .groupBy("g").agg(sum("x").as("sx"), count(lit(1)).as("n"))
      assert(scans(q).forall(_.contains("/mv")),
        s"a group-key predicate must re-apply above the MV, got ${scans(q)}")
      val viaMv = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      MvRegistry.clear()
      val direct = spark.read.parquet(basePath).filter(col("g") === "g3")
        .groupBy("g").agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(viaMv === direct)
    }
  }

  test("filtered base is NOT rewritten (the MV cannot answer it)") {
    registered {
      val q = spark.read.parquet(basePath).filter(col("x") > 50)
        .groupBy("g").agg(sum("x").as("sx"), count(lit(1)).as("n"))
      assert(scans(q).forall(_.contains("/t")),
        "a filtered aggregate must keep scanning the base")
    }
  }

  test("different group key / unsupported aggregate are NOT rewritten") {
    registered {
      val byId = spark.read.parquet(basePath).groupBy("id")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
      assert(scans(byId).forall(_.contains("/t")))
      val withAvg = spark.read.parquet(basePath).groupBy("g")
        .agg(sum("x").as("sx"), avg("x").as("ax"))
      assert(scans(withAvg).forall(_.contains("/t")))
      val distinctSum = spark.read.parquet(basePath).groupBy("g")
        .agg(sum_distinct(col("x")).as("sx"), count(lit(1)).as("n"))
      assert(scans(distinctSum).forall(_.contains("/t")))
    }
  }

  test("maintenance round-trip: an advanced view re-registers and answers fresh") {
    import graft.warehouse.VersionedParquet
    import spark.implicits._
    // MV maintained in the versioned format; after the base grows and
    // the view advances by the delta, RE-registration (the refresh
    // analogue) makes the rewrite serve the NEW version — and the
    // query still never mentions the view
    val work = java.nio.file.Files.createTempDirectory("graft-mv-live")
    val base = work.resolve("base").toString
    val mvRoot = work.resolve("mv").toString
    (0L until 1000L).map(i => (i, s"g${i % 5}", i % 10))
      .toDF("id", "g", "x").write.parquet(base)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(sum("x").as("sx"), count(lit(1)).as("n"))
    VersionedParquet.publish(agg(spark.read.parquet(base)), mvRoot,
      keepVersions = 10)
    GraftFunctions.register(spark)
    MvRegistry.register(base, "g", "x",
      VersionedParquet.read(spark, mvRoot), "g", "sx", "n")
    try {
      // base grows; the view advances by the batch's delta (q128's
      // fold shape: merge per-group sums), then re-registers
      val batch = (1000L until 1500L).map(i => (i, s"g${i % 5}", 7L))
        .toDF("id", "g", "x")
      batch.write.mode("append").parquet(base)
      val advanced = VersionedParquet.read(spark, mvRoot)
        .unionByName(agg(batch))
        .groupBy("g").agg(sum("sx").as("sx"), sum("n").as("n"))
      VersionedParquet.publish(advanced, mvRoot, keepVersions = 10)
      MvRegistry.register(base, "g", "x",
        VersionedParquet.read(spark, mvRoot), "g", "sx", "n")

      val q = spark.read.parquet(base).groupBy("g")
        .agg(sum("x").as("sx"), count(lit(1)).as("n")).orderBy("g")
      assert(scans(q).forall(_.contains("/mv")),
        s"refreshed registration must serve the view, got ${scans(q)}")
      val viaMv = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      MvRegistry.clear()
      val direct = spark.read.parquet(base).groupBy("g")
        .agg(sum("x").as("sx"), count(lit(1)).as("n")).orderBy("g")
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(viaMv === direct,
        "the maintained view must answer with the post-batch truth")
    } finally MvRegistry.clear()
  }

  test("key-set dispatch: a two-key view answers two-key queries only") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mv-2key").toString
    val base2 = dir + "/t"
    val mv2 = dir + "/mv"
    (0L until 3000L).map(i => (i, s"g${i % 4}", s"h${i % 3}", i % 50))
      .toDF("id", "g", "h", "x").write.parquet(base2)
    spark.read.parquet(base2).groupBy("g", "h")
      .agg(sum("x").as("sx"), count(lit(1)).as("n"))
      .write.parquet(mv2)
    GraftFunctions.register(spark)
    MvRegistry.register(base2, Seq("g", "h"), "x",
      spark.read.parquet(mv2), Seq("g", "h"), "sx", "n")
    try {
      // two keys, either order → the view (GROUP BY h, g included)
      val hit = spark.read.parquet(base2).groupBy("h", "g")
        .agg(sum("x").as("sx"), count(lit(1)).as("n")).orderBy("g", "h")
      assert(scans(hit).forall(_.contains("/mv")),
        s"key order must not matter, got ${scans(hit)}")
      val viaMv = hit.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
      // one key only → the ROLLUP rewrite: re-aggregate the finer
      // view (sum of sums, count = sum of counts) — the aggregate
      // survives but runs over group-cardinality rows, not the corpus
      val coarse = spark.read.parquet(base2).groupBy("g")
        .agg(sum("x").as("sx"), count(lit(1)).as("n")).orderBy("g")
      assert(scans(coarse).forall(_.contains("/mv")),
        s"a coarser grouping must re-aggregate the view, got ${scans(coarse)}")
      val coarseViaMv = coarse.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // a key the view lacks → decline (nothing to roll up from)
      val miss = spark.read.parquet(base2).groupBy("id")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
      assert(scans(miss).forall(_.contains("/t")),
        "an uncovered key must keep scanning the base")
      MvRegistry.clear()
      val coarseDirect = spark.read.parquet(base2).groupBy("g")
        .agg(sum("x").as("sx"), count(lit(1)).as("n")).orderBy("g")
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(coarseViaMv === coarseDirect,
        "the rollup re-aggregation must equal the direct answer")
      MvRegistry.register(base2, Seq("g", "h"), "x",
        spark.read.parquet(mv2), Seq("g", "h"), "sx", "n")
      val direct = spark.read.parquet(base2).groupBy("h", "g")
        .agg(sum("x").as("sx"), count(lit(1)).as("n")).orderBy("g", "h")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSeq
      assert(viaMv === direct)
    } finally MvRegistry.clear()
  }

  test("min/max serve exactly and roll up; absent stats decline") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mv-minmax").toString
    val baseP = dir + "/t"
    val mvP = dir + "/mv"
    (0L until 3000L).map(i => (i, s"g${i % 4}", s"h${i % 3}", i % 97))
      .toDF("id", "g", "h", "x").write.parquet(baseP)
    spark.read.parquet(baseP).groupBy("g", "h")
      .agg(sum("x").as("sx"), count(lit(1)).as("n"),
        min("x").as("mn"), max("x").as("mx"))
      .write.parquet(mvP)
    GraftFunctions.register(spark)
    MvRegistry.register(baseP, Seq("g", "h"), "x",
      spark.read.parquet(mvP), Seq("g", "h"), "sx", "n",
      minOut = Some("mn"), maxOut = Some("mx"))
    try {
      def all4(keys: String*) = spark.read.parquet(baseP)
        .groupBy(keys.map(col): _*)
        .agg(sum("x").as("sx"), count(lit(1)).as("n"),
          min("x").as("mn"), max("x").as("mx"))
        .orderBy(keys.map(col): _*)
      // exact: straight off the view; rollup: min-of-mins/max-of-maxes.
      // NOTE a Dataset caches its optimized plan, so the no-rewrite
      // baseline must be a FRESH query built after clear()
      for (keys <- Seq(Seq("g", "h"), Seq("g"))) {
        val q = all4(keys: _*)
        assert(scans(q).forall(_.contains("/mv")),
          s"min/max must serve from the view, got ${scans(q)}")
        val viaMv = q.collect().map(_.toSeq).toSeq
        MvRegistry.clear()
        val direct = all4(keys: _*).collect().map(_.toSeq).toSeq
        assert(viaMv === direct)
        MvRegistry.register(baseP, Seq("g", "h"), "x",
          spark.read.parquet(mvP), Seq("g", "h"), "sx", "n",
          minOut = Some("mn"), maxOut = Some("mx"))
      }
      // a view WITHOUT min/max declines a min/max query entirely
      MvRegistry.clear()
      MvRegistry.register(baseP, Seq("g", "h"), "x",
        spark.read.parquet(mvP), Seq("g", "h"), "sx", "n")
      val q = all4("g", "h")
      assert(scans(q).forall(_.contains("/t")),
        "a view lacking the stats must NOT answer a min/max query")
    } finally MvRegistry.clear()
  }

  test("nondeterministic predicate is NOT hoisted above the aggregate") {
    registered {
      // rand() < x under the aggregate is ROW-level sampling; hoisting
      // it above the MV scan would turn it into GROUP-level sampling —
      // the rewrite must decline even though the predicate references
      // no non-key column (empty references)
      val q = spark.read.parquet(basePath).filter(rand(42) < 0.5)
        .groupBy("g").agg(sum("x").as("sx"), count(lit(1)).as("n"))
      assert(scans(q).forall(_.contains("/t")),
        s"a nondeterministic filter must keep scanning the base, " +
          s"got ${scans(q)}")
    }
  }

  test("COUNT(NULL) is zero per group, never the view's count(*)") {
    registered {
      val q = spark.read.parquet(basePath).groupBy("g")
        .agg(sum("x").as("sx"), count(lit(null)).as("n")).orderBy("g")
      val withReg = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      MvRegistry.clear()
      val direct = spark.read.parquet(basePath).groupBy("g")
        .agg(sum("x").as("sx"), count(lit(null)).as("n")).orderBy("g")
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(withReg === direct)
      assert(direct.forall(_._3 == 0L), "COUNT(NULL) must be 0")
    }
  }

  test("unregistered path and cleared registry are untouched") {
    GraftFunctions.register(spark)
    MvRegistry.clear()
    val q = textbook
    assert(scans(q).forall(_.contains("/t")),
      "no registration — no rewrite")
  }
}
