package graft.warehouse

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The result cache's contract: a hit serves the exact recompute bytes
  * with ZERO base-table I/O, any commit to any dependency invalidates
  * by construction (the key embeds the dependency version vector), and
  * eviction only ever touches stale entries — the live one survives.
  */
class ResultCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-rcache-$tag").toString

  private def seed(root: String, n: Long = 100L): Unit = {
    import spark.implicits._
    VersionedParquet.publish(
      (0L until n).map(i => (i, i * 3L)).toDF("id", "v"), root,
      keepVersions = 20)
  }

  private def agg(root: String): DataFrame =
    VersionedParquet.read(spark, root)
      .groupBy((col("id") % 4).as("b"))
      .agg(sum("v").as("s"), count(lit(1)).as("n"))

  test("miss computes once; hit serves identical rows without recompute") {
    val root = tmp("t1"); val cache = tmp("c1"); seed(root)
    val computes = new AtomicInteger(0)
    def q: DataFrame = { computes.incrementAndGet(); agg(root) }
    val a = ResultCache.serve(spark, cache, "q", Seq(root))(q)
    val b = ResultCache.serve(spark, cache, "q", Seq(root))(q)
    assert(!a.hit && b.hit)
    assert(computes.get() == 1)
    assert(a.df.orderBy("b").collect().toSeq ==
      b.df.orderBy("b").collect().toSeq)
    assert(b.df.orderBy("b").collect().toSeq ==
      agg(root).orderBy("b").collect().toSeq)
  }

  test("a hit reads only cache files — zero base-table inputs") {
    val root = tmp("t2"); val cache = tmp("c2"); seed(root)
    ResultCache.serve(spark, cache, "q", Seq(root))(agg(root))
    val hit = ResultCache.serve(spark, cache, "q", Seq(root))(
      fail("hit must not invoke compute"))
    assert(hit.hit)
    val inputs = hit.df.inputFiles
    assert(inputs.nonEmpty)
    val canonicalCache = new java.io.File(cache).getCanonicalPath
    assert(inputs.forall(_.contains(canonicalCache.stripPrefix("/"))),
      s"hit read outside the cache: ${inputs.mkString(",")}")
  }

  test("any commit to a dependency invalidates: new fingerprint, recompute") {
    import spark.implicits._
    val root = tmp("t3"); val cache = tmp("c3"); seed(root)
    val s1 = ResultCache.serve(spark, cache, "q", Seq(root))(agg(root))
    VersionedParquet.upsert(spark, root,
      Seq((1L, 999L)).toDF("id", "v"), Seq("id"), keepVersions = 20)
    val s2 = ResultCache.serve(spark, cache, "q", Seq(root))(agg(root))
    assert(!s1.hit && !s2.hit)
    assert(s1.fingerprint != s2.fingerprint)
    assert(s2.df.orderBy("b").collect().toSeq ==
      agg(root).orderBy("b").collect().toSeq)
    // and the stale entry still serves its own snapshot on re-key
    val s3 = ResultCache.serve(spark, cache, "q", Seq(root))(agg(root))
    assert(s3.hit)
  }

  test("multi-dependency key: a commit to EITHER table invalidates") {
    import spark.implicits._
    val ra = tmp("t4a"); val rb = tmp("t4b"); val cache = tmp("c4")
    seed(ra); seed(rb, 50L)
    def q: DataFrame = {
      val a = VersionedParquet.read(spark, ra)
      val b = VersionedParquet.read(spark, rb)
      a.join(b, Seq("id")).groupBy(lit(0).as("g"))
        .agg(count(lit(1)).as("n"))
    }
    val s1 = ResultCache.serve(spark, cache, "j", Seq(ra, rb))(q)
    val s2 = ResultCache.serve(spark, cache, "j", Seq(ra, rb))(q)
    VersionedParquet.upsert(spark, rb,
      Seq((60L, 1L)).toDF("id", "v"), Seq("id"), keepVersions = 20)
    val s3 = ResultCache.serve(spark, cache, "j", Seq(ra, rb))(q)
    assert(!s1.hit && s2.hit && !s3.hit)
    assert(s3.df.collect().head.getLong(1) == 51L)
  }

  test("distinct query keys never collide") {
    val root = tmp("t5"); val cache = tmp("c5"); seed(root)
    val a = ResultCache.serve(spark, cache, "sum-by-b", Seq(root))(agg(root))
    val b = ResultCache.serve(spark, cache, "count-all", Seq(root))(
      VersionedParquet.read(spark, root).groupBy(lit(0).as("g"))
        .agg(count(lit(1)).as("n")))
    assert(!a.hit && !b.hit)
    assert(ResultCache.entryCount(spark, cache, "sum-by-b") == 1)
    assert(ResultCache.entryCount(spark, cache, "count-all") == 1)
  }

  test("eviction keeps the live entry and at most maxStale stale ones") {
    import spark.implicits._
    val root = tmp("t6"); val cache = tmp("c6"); seed(root)
    for (i <- 0 until 5) {
      ResultCache.serve(spark, cache, "q", Seq(root), maxStale = 2)(agg(root))
      VersionedParquet.upsert(spark, root,
        Seq((2L, 100L + i)).toDF("id", "v"), Seq("id"), keepVersions = 20)
    }
    val last = ResultCache.serve(spark, cache, "q", Seq(root),
      maxStale = 2)(agg(root))
    assert(!last.hit)
    // live + at most 2 stale
    assert(ResultCache.entryCount(spark, cache, "q") <= 3)
    // the live entry survives eviction: immediate re-serve hits
    val again = ResultCache.serve(spark, cache, "q", Seq(root),
      maxStale = 2)(fail("live entry was evicted"))
    assert(again.hit)
    assert(again.df.orderBy("b").collect().toSeq ==
      agg(root).orderBy("b").collect().toSeq)
  }

  test("versionless read-state changes invalidate: a policy or " +
      "metadata-only ALTER mints no version but must not serve stale " +
      "(raw) results") {
    val root = tmp("t-meta"); val cache = tmp("c-meta"); seed(root)
    val computes = new AtomicInteger(0)
    def serve() = ResultCache.serve(spark, cache, "q", Seq(root)) {
      computes.incrementAndGet(); agg(root)
    }
    assert(!serve().hit && serve().hit)
    val v = VersionedParquet.currentVersion(spark, root).get
    // a mask lands — no version minted, but the cached pre-policy
    // result must NOT be served (it holds raw values)
    VersionedParquet.addMaskPolicy(spark, root, "v", "v % 5")
    assert(VersionedParquet.currentVersion(spark, root).get === v)
    val afterPolicy = serve()
    assert(!afterPolicy.hit, "policy change must invalidate the cache")
    assert(computes.get === 2)
    assert(serve().hit, "and the post-policy entry caches normally")
    // metadata-only ADD COLUMN: also versionless, also read-affecting
    VersionedParquet.addColumn(spark, root, "extra", "BIGINT", "7")
    assert(!serve().hit, "metadata-only ALTER must invalidate too")
  }
}
