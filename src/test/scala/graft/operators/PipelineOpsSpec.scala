package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-3 pipeline operators — properties the DuckDB
  * hash-match can't state (cross-row/semantic constraints, determinism
  * across runs), pinned so refactors can't silently break them.
  */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q48 as-of: every purchase appears once; matched click is same-user, at-or-before") {
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase").count()
    val out = run("q48_asof_join").cache()
    assert(out.count() === purchases, "one output row per purchase")
    assert(out.select("purchase_id").distinct().count() === purchases)
    assert(out.filter(col("click_ts") > col("purchase_ts")).count() === 0,
      "a click after the purchase can never match")
    // the matched click really is a click of the same user
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"))
    val wrongUser = out.filter(col("click_id").isNotNull)
      .join(clicks, Seq("click_id"))
      .filter(col("cu") =!= col("user_id")).count()
    assert(wrongUser === 0)
    out.unpersist()
  }

  test("q49 percentiles are monotone: p50 <= p90 <= p99 in every group") {
    val bad = run("q49_percentiles")
      .filter(col("p50_price") > col("p90_price") ||
        col("p90_price") > col("p99_price")).count()
    assert(bad === 0)
  }

  test("q52 sampling: deterministic across runs, bounded per stratum") {
    val a = run("q52_stratified_sample").collect().map(_.toSeq).toSeq
    val b = run("q52_stratified_sample").collect().map(_.toSeq).toSeq
    assert(a === b, "hash-based sampling must be run-to-run identical")
    val over = run("q52_stratified_sample")
      .groupBy("lang").count().filter(col("count") > 20).count()
    assert(over === 0)
  }

  test("q54 groups: both ends of every near-dup pair land in the same group") {
    val comp = run("q54_dedup_groups").select("doc_id", "group_id")
    val pairs = run("q35_ngram_jaccard").select("id_a", "id_b")
    val split = pairs
      .join(comp.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("group_id", "g_a"), "id_a")
      .join(comp.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("group_id", "g_b"), "id_b")
      .filter(col("g_a") =!= col("g_b")).count()
    assert(split === 0, "a pair split across groups breaks transitivity")
    // every group's id is the minimum member id
    val badRoot = comp.groupBy("group_id").agg(min("doc_id").as("m"))
      .filter(col("group_id") =!= col("m")).count()
    assert(badRoot === 0)
  }

  test("q55 quantization: values saturate only at the extremes, error bounded") {
    val out = run("q55_embedding_quantize").cache()
    // the max-abs element always quantizes to ±127
    assert(out.filter(col("maxabs") > 0 && col("n_sat") < 1).count() === 0)
    // per-dim error <= scale/2 ⇒ SSE <= 64 * (maxabs/127)^2 / 4
    val overErr = out.filter(col("recon_sse") >
      lit(64.0 / 4.0) * (col("maxabs") / 127.0) * (col("maxabs") / 127.0)
        + lit(1e-6)).count()
    assert(overErr === 0, "reconstruction error above the rounding bound")
    out.unpersist()
  }

  test("approx_percentile (the 100 TB swap-in for q49) tracks exact percentile") {
    // q49's doc comment names the sketch as the scale path; prove the
    // swap is sound on this data: sketch vs exact within 1% of the
    // group's price range at accuracy 10000.
    val both = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.9)").as("exact"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("approx"),
        (max("o_totalprice") - min("o_totalprice")).as("range"))
    val off = both
      .filter(abs(col("approx") - col("exact")) > col("range") * 0.01)
      .count()
    assert(off === 0, "approx_percentile drifted >1% of range from exact")
  }

  test("q59 estimate: mean |est - exact| within the k=32 sketch's expected error") {
    val err = run("q59_minhash_estimate")
      .agg(avg("abs_err").as("mae")).collect()(0).getDouble(0)
    // stddev of a Binomial(32, j)/32 estimate is <= 0.5/sqrt(32) ≈ 0.088
    assert(err <= 0.12, f"mean absolute estimation error $err%.3f too large")
  }

  test("incremental dedup: new-batch banding against stored signatures = full-batch pairs") {
    // Simulate incremental ingestion: docs with doc_id % 5 == 0 arrive
    // as a NEW batch after the rest of the corpus was already indexed.
    // The previous run's pairs (old self-join) plus the incremental
    // probe (new bands vs the full index) must equal the full-batch
    // candidate set — i.e. stored signatures make re-dedup of the whole
    // corpus unnecessary.
    val sigs = DedupOps.signatureFrame(spark, sf).cache()
    val isNew = col("doc_id") % 5 === 0
    val bandsAll = DedupOps.bandKeys(sigs)
    val bandsOld = DedupOps.bandKeys(sigs.filter(!isNew))
    val bandsNew = DedupOps.bandKeys(sigs.filter(isNew))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairSet(DedupOps.candidatesBetween(bandsAll, bandsAll))
    val previous = pairSet(DedupOps.candidatesBetween(bandsOld, bandsOld))
    val incremental = pairSet(DedupOps.candidatesBetween(bandsNew, bandsAll))
    assert(previous.union(incremental) === full,
      "incremental probe must add exactly the pairs involving new docs")
    assert(incremental.forall { case (a, b) => a % 5 == 0 || b % 5 == 0 })
    sigs.unpersist()
  }

  test("q58 curation: decisions partition the corpus") {
    val bad = run("q58_curation_pipeline")
      .filter(col("n_docs") =!=
        col("n_kept") + col("n_dropped_dup") + col("n_dropped_quality"))
      .count()
    assert(bad === 0)
  }
}
