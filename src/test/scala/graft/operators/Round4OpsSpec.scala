package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns.tokens
import graft.sources.Tables

/** Invariants of the round-4 operators (q67-q72) — cross-row and
  * semantic properties the per-query DuckDB hash-match can't state.
  */
class Round4OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q67 repetition: fractions in (0,1], flag matches thresholds, covers all 3+-token docs") {
    val out = run("q67_repetition").cache()
    assert(out.filter(col("top_bigram_frac") <= 0 || col("top_bigram_frac") > 1 ||
      col("dup_trigram_frac") < 0 || col("dup_trigram_frac") > 1).count() === 0)
    // the flag is a pure function of the two (pre-round) fractions; with
    // thresholds far from the rounding grain, the rounded columns decide
    // identically
    val inconsistent = out.filter(
      (col("repetitive") === 1) =!= (col("top_bigram_frac") > 0.18 ||
        col("dup_trigram_frac") > 0.5)).count()
    assert(inconsistent === 0)
    val eligible = Tables.documents(spark, sf)
      .filter(size(tokens(col("text"))) >= 3).count()
    assert(out.count() === eligible, "one row per doc with >= 3 tokens")
    out.unpersist()
  }

  test("q68 contamination: only train docs, hit count bounded by shingle count") {
    val out = run("q68_contamination").cache()
    assert(out.filter(col("doc_id") % 10 === 0).count() === 0,
      "eval docs must not be reported as contaminated")
    assert(out.filter(col("n_hit") > col("n_sh")).count() === 0)
    assert(out.filter(col("overlap_frac") < 0.2).count() === 0)
    out.unpersist()
  }

  test("q69 packing: token mass and doc count are preserved per language") {
    val out = run("q69_seq_packing").cache()
    val packed = out.groupBy("lang")
      .agg(sum("seq_tokens").as("toks"), sum("n_docs").as("docs"))
    val direct = Tables.documents(spark, sf)
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("toks0"), count(lit(1)).as("docs0"))
    val mismatch = packed.join(direct, "lang")
      .filter(col("toks") =!= col("toks0") || col("docs") =!= col("docs0"))
    assert(mismatch.count() === 0, "packing must neither drop nor duplicate")
    out.unpersist()
  }

  test("q70 HLL: every language within the m=64 sketch's error bound") {
    val out = run("q70_hll_distinct").cache()
    assert(out.count() === 5)
    // 1.04/sqrt(64) ~ 13% standard error; 15% leaves < 1.5 sigma slack,
    // tight enough to catch a construction bug (those err by 2x+)
    assert(out.filter(abs(col("err_pct")) > 15).count() === 0,
      out.collect().mkString(", "))
    out.unpersist()
  }

  test("q70 HLL registers merge: max-combining split sketches = whole-corpus sketch") {
    // The mergeability contract from the doc comment, stated as code:
    // registers built on each half of the corpus, max-merged, must give
    // the exact whole-corpus register values (monoid property of max).
    val sh = DedupOps.shingleHashes(spark, sf)
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("lang"), shiftright(col("h60"), 54).as("bucket"),
        when(col("h60").bitwiseAND(lit((1L << 54) - 1)) === 0, lit(55))
          .otherwise(lit(55) -
            length(bin(col("h60").bitwiseAND(lit((1L << 54) - 1))))).as("rho"))
      .groupBy("lang", "bucket").agg(max("rho").as("r"))
    val whole = regs(sh)
    val merged = regs(sh.filter(col("doc_id") % 2 === 0))
      .unionAll(regs(sh.filter(col("doc_id") % 2 =!= 0)))
      .groupBy("lang", "bucket").agg(max("r").as("r"))
    assert(whole.exceptAll(merged).count() === 0)
    assert(merged.exceptAll(whole).count() === 0)
  }

  test("q71 z-order: partitions the table; buckets are local in BOTH dimensions") {
    val out = run("q71_zorder_layout").cache()
    val total = out.agg(sum("n")).first().getLong(0)
    assert(total === Tables.orders(spark, sf).count())
    val custRange = Tables.orders(spark, sf)
      .agg((max("o_custkey") - min("o_custkey")).as("r")).first().getLong(0)
    // weighted mean span per bucket must beat a single-column sort, which
    // leaves the OTHER column's span at ~the full range in every bucket
    val meanSpan = out.agg((sum(col("custkey_span") * col("n")) /
      sum("n")).as("m")).first().getDouble(0)
    assert(meanSpan < custRange * 0.5,
      s"z-buckets must localize custkey: mean $meanSpan vs range $custRange")
    out.unpersist()
  }

  test("q73 split: every doc lands in exactly one split; proportions near 98/1/1") {
    val out = run("q73_corpus_split").cache()
    val total = out.agg(sum("n_docs")).first().getLong(0)
    assert(total === Tables.documents(spark, sf).count())
    val trainShare = out.filter(col("split") === "train")
      .agg(sum("n_docs")).first().getLong(0).toDouble / total
    assert(trainShare > 0.93 && trainShare < 1.0,
      s"hash split should put ~98% in train, got $trainShare")
    out.unpersist()
  }

  test("q74 bloom: no false negatives — candidates contain every true duplicate") {
    // the one guarantee a Bloom filter makes; a construction bug (wrong
    // word/bit derivation between build and probe) breaks exactly this
    val out = run("q74_bloom_prefilter").first()
    val Seq(nBatch, nCand, nConf, nFp) =
      Seq("n_batch", "n_candidates", "n_confirmed", "n_false_pos")
        .map(c => out.getLong(out.fieldIndex(c)))
    // exact cross-split duplicate count, computed independently
    val fps = Tables.documents(spark, sf).select(col("doc_id"),
      graft.functions.TextFns.wordSetFingerprint(
        graft.functions.TextFns.tokens(col("text"))).as("fp"))
    val trueDups = fps.filter(col("doc_id") % 10 === 0)
      .join(fps.filter(col("doc_id") % 10 =!= 0).select("fp").distinct(),
        Seq("fp"), "left_semi").count()
    assert(nConf === trueDups, "every true duplicate must survive the prefilter")
    assert(nCand === nConf + nFp && nCand <= nBatch)
  }

  test("q75 count-min: estimates never undercount (one-sided error)") {
    val out = run("q75_countmin").cache()
    assert(out.count() === 20)
    assert(out.filter(col("overestimate") < 0).count() === 0,
      "CM sketch collisions can only ADD; an undercount is a construction bug")
    out.unpersist()
  }

  test("q76 chunk plan: slot accounting balances exactly per language") {
    // every chunk slot is content, overlap-duplicate, or padding —
    // n_tokens + dup + pad == n_chunks * window, with nothing negative
    val out = run("q76_chunk_plan").cache()
    val broken = out.filter(
      col("n_tokens") + col("dup_tokens") + col("pad_tokens")
        =!= col("n_chunks") * 128 ||
        col("dup_tokens") < 0 || col("pad_tokens") < 0).count()
    assert(broken === 0)
    val docs = out.agg(sum("n_docs")).first().getLong(0)
    assert(docs === Tables.documents(spark, sf).count())
    out.unpersist()
  }

  test("q72 domain mix: shares sum to 1, weights rebalance toward uniform") {
    val out = run("q72_domain_mix").cache()
    val shareSum = out.agg(sum("token_share")).first().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-3)
    assert(out.filter(col("mix_weight") <= 0).count() === 0)
    assert(out.filter(col("expected_docs_kept") > col("n_docs")).count() === 0,
      "capped weight can never keep more docs than exist")
    out.unpersist()
  }
}
