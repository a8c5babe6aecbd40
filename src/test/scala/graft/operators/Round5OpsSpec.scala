package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Money.cents
import graft.sources.Tables

/** Invariants of the round-5 operators — cross-row and semantic
  * properties the per-query DuckDB hash-match can't state.
  */
class Round5OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  // ── q77: fixed-grid histogram percentile ────────────────────────────────

  test("q77 histogram cells are mergeable: split halves + sum == whole") {
    val o = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_orderpriority").as("prio"),
      cents(col("o_totalprice")).as("c"))
    // the grid (lo, hi) is FIXED across splits — that is the contract
    // that makes the cells mergeable across partitions and batches
    val bounds = o.agg(min("c").as("lo"), max("c").as("hi"))
    def cellsOf(part: org.apache.spark.sql.DataFrame) =
      OlapOps.histCells(part.drop("o_orderkey").crossJoin(broadcast(bounds)))
    val whole = OlapOps.histPercentiles(cellsOf(o))
    val merged = OlapOps.histPercentiles(
      cellsOf(o.filter(col("o_orderkey") % 2 === 0))
        .union(cellsOf(o.filter(col("o_orderkey") % 2 === 1)))
        .groupBy("prio", "lo", "hi", "bin")
        .agg(sum("cnt").as("cnt")))
    assert(whole.exceptAll(merged).count() === 0)
    assert(merged.exceptAll(whole).count() === 0)
  }

  test("q77 reported bin contains the exact rank-target order statistic") {
    // The histogram's guarantee is positional, not interpolated: the
    // reported bin is the one holding the order statistic at rank
    // ceil(p*n) — so the bin's lower edge is within one bin width below
    // that exact statistic. (The q49 interpolated percentile can sit
    // further away when bins are sparsely populated at test scale: with
    // ~3000 rows over 4096 bins the inter-value gap exceeds a bin.)
    import org.apache.spark.sql.expressions.Window
    val hist = run("q77_hist_percentiles").collect()
      .map(r => r.getString(0) -> r).toMap
    val o = Tables.orders(spark, sf).select(
      col("o_orderpriority").as("prio"), cents(col("o_totalprice")).as("c"))
    val bounds = o.agg(min("c").as("lo"), max("c").as("hi")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val binWidthDollars = (hi - lo + 1).toDouble / OlapOps.HIST_BINS / 100.0
    val ranked = o
      .withColumn("rn", row_number().over(Window.partitionBy("prio").orderBy("c")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("prio")))
    Seq(50 -> "p50_est", 90 -> "p90_est", 99 -> "p99_est").foreach {
      case (k, estCol) =>
        val stats = ranked
          .filter(col("rn") ===
            call_function("div", lit(k.toLong) * col("n") + lit(99L), lit(100L)))
          .select("prio", "c").collect()
        assert(stats.length === 5)
        stats.foreach { s =>
          val exact = s.getLong(1).toDouble / 100.0
          val est = hist(s.getString(0)).getAs[Double](estCol)
          // est is the bin's lower edge (integer-floored: up to 1 cent low)
          assert(est - 0.011 <= exact && exact <= est + binWidthDollars + 0.011,
            s"$estCol bin [$est, ${est + binWidthDollars}] misses exact " +
              s"$exact for ${s.getString(0)}")
        }
    }
  }

  // ── q35: df-capped exact Jaccard tier ───────────────────────────────────

  test("q35 df cap collapses hot-shingle join mass and is a no-op at test scale") {
    import spark.implicits._
    // Adversarial corpus: 300 docs share exactly ONE hot 3-gram
    // ("common hot shingle"); every other shingle is unique to its doc.
    val docs = (1 to 300).map(i =>
      (i.toLong, "en", s"common hot shingle u${i}a u${i}b u${i}c u${i}d"))
      .toDF("doc_id", "lang", "text")
    val inv = DedupOps.shingleFrameOf(docs)
    def selfJoinMass(index: org.apache.spark.sql.DataFrame): Long =
      index.select(col("lang"), col("shingle"), col("doc_id").as("id_a"))
        .join(index.select(col("lang"), col("shingle"),
          col("doc_id").as("id_b")), Seq("lang", "shingle"))
        .filter(col("id_a") < col("id_b")).count()
    // uncapped, the one hot key alone squares: 300*299/2 join rows
    assert(selfJoinMass(DedupOps.cappedIndex(inv, 1000000)) === 300L * 299 / 2)
    // capped, the hot key is dropped before the join: zero rows survive
    assert(selfJoinMass(DedupOps.cappedIndex(inv, 256)) === 0)
    assert(DedupOps.jaccardPairsFrom(inv, 256).count() === 0)
    // on the real corpus the cap binds nowhere: pair sets are identical
    val real = DedupOps.shingleFrameOf(Tables.documents(spark, sf))
    val capped = DedupOps.jaccardPairsFrom(real, DedupOps.JACCARD_DF_CAP)
    val uncapped = DedupOps.jaccardPairsFrom(real, Int.MaxValue)
    assert(capped.exceptAll(uncapped).count() === 0)
    assert(uncapped.exceptAll(capped).count() === 0)
  }

  // ── ANN recall on clustered embeddings ──────────────────────────────────

  test("ANN recall@10 on clustered embeddings: LSH and IVF >= 0.9 vs brute force") {
    import spark.implicits._
    // Deterministic clustered corpus: 8 md5-derived centroids, 40 points
    // each; per-dim noise is ~9% of centroid scale, so same-cluster
    // cosine ~0.99 and cross-cluster ~0 — the shape real embedding
    // corpora have, and where an ANN index must not lose neighbors.
    val nClusters = 8
    def h(s: String) = graft.functions.Hashing.md5Long60(s)
    val rows = (0 until nClusters * 40).map { id =>
      val c = id % nClusters
      val emb = (0 until 64).map { i =>
        ((h(s"cl_cent_${c}_$i") % 1000 - 500).toDouble +
          (h(s"cl_pt_${id}_$i") % 101 - 50) * 0.5).toFloat
      }.toArray
      (id.toLong, s"c$c", emb)
    }
    val e = rows.toDF("vec_id", "label", "embedding").cache()
    val brute = SimilarityOps.bruteTopK(e, 0, 10).collect()
    // construction sanity: the query's true neighborhood is its cluster
    assert(brute.forall(_.getString(1) == "c0"))
    assert(brute.forall(_.getDouble(2) > 0.9))
    val bruteIds = brute.map(_.getLong(0)).toSet
    val lshIds = SimilarityOps.lshTopK(e, 0, 10).collect().map(_.getLong(0)).toSet
    val ivfIds = SimilarityOps.ivfTopK(e, 0, 10).collect().map(_.getLong(0)).toSet
    val lshRecall = (lshIds & bruteIds).size / 10.0
    val ivfRecall = (ivfIds & bruteIds).size / 10.0
    info(f"clustered recall@10: LSH=$lshRecall%.2f IVF=$ivfRecall%.2f")
    assert(lshRecall >= 0.9, s"LSH recall $lshRecall below 0.9")
    assert(ivfRecall >= 0.9, s"IVF recall $ivfRecall below 0.9")
    e.unpersist()
  }

  // ── q81/q82: BM25 + sketch-driven heavy hitters ─────────────────────────

  test("q81 BM25: positive scores, at most the 3 query terms hit, in corpus order") {
    val out = run("q81_bm25").collect()
    assert(out.length === 10)
    assert(out.forall(r => r.getAs[Double]("bm25") > 0))
    assert(out.forall { r =>
      val h = r.getAs[Long]("n_terms_hit"); h >= 1 && h <= 3
    })
    val scores = out.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q82 heavy hitters: CMS estimates one-sided, no true hitter missed") {
    import graft.functions.TextFns.tokens
    val out = run("q82_heavy_hitters").collect()
    assert(out.nonEmpty)
    // one-sided error: the min-cell estimate never undercounts
    assert(out.forall(r => r.getAs[Long]("cm_est") >= r.getAs[Long]("exact")))
    // completeness: every token at or above the relative threshold is in
    // the report (est >= exact makes missing one impossible — verify it)
    val tf = Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val total = tf.agg(sum("c")).head().getLong(0)
    val trueHitters = tf.filter(col("c") >= total / 512)
      .collect().map(_.getString(0)).toSet
    val reported = out.map(_.getAs[String]("token")).toSet
    assert(trueHitters.subsetOf(reported),
      s"missing hitters: ${trueHitters -- reported}")
    // and the flag marks exactly the true ones
    assert(out.filter(_.getAs[Int]("true_hitter") == 1)
      .map(_.getAs[String]("token")).toSet === trueHitters)
  }

  // ── HLL small-range correction ──────────────────────────────────────────

  test("HLL linear-counting branch: ~50 distincts inside the error bound") {
    def estimate(n: Int) = SketchOps.estimateOf(SketchOps.registersOf(
      spark.range(n).select(lit("x").as("lang"),
        graft.functions.Hashing.md5Long60(concat(lit("lc_test_"),
          col("id").cast("string"))).as("h60")))).head()
    // 50 distincts << 2.5m: the correction must fire (est differs from
    // the biased raw estimate) and land within linear counting's error
    // (sigma ~ 5 at n=50, m=64 — 15 is 3 sigma)
    val small = estimate(50)
    assert(small.getAs[Double]("est") !== small.getAs[Double]("raw_est"))
    assert(math.abs(small.getAs[Double]("est") - 50) <= 15.0)
    // 5000 distincts >> 2.5m: raw estimator passes through untouched
    val large = estimate(5000)
    assert(large.getAs[Double]("est") === large.getAs[Double]("raw_est"))
    assert(math.abs(large.getAs[Double]("est") - 5000) / 5000.0 <= 0.5)
  }

  // ── q79: incremental dedup through the stored index ─────────────────────

  test("q79 stored-index probe equals the in-memory probe (lossless round trip)") {
    val out = run("q79_incremental_dedup").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sigs = DedupOps.signatureFrame(spark, sf)
    val expect = DedupOps.candidatesBetween(
      DedupOps.bandKeys(sigs.filter(col("doc_id") % 10 === 0)),
      DedupOps.bandKeys(sigs.filter(col("doc_id") % 10 =!= 0)))
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)
    assert(out.toSeq === expect.toSeq)
  }

  // ── q78: real PCM decode ────────────────────────────────────────────────

  test("q78 PCM decode is partition-invariant and header-consistent") {
    import spark.implicits._
    val media = MultimodalOps.pcmAudioTable(spark, sf)
    val a = MultimodalOps.decodePcm(media).collect()
      .map(s => s.item_id -> s).toMap
    val b = MultimodalOps.decodePcm(
      media.repartition(7, col("item_id")).as[MultimodalOps.MediaRow])
      .collect()
    assert(b.nonEmpty)
    // decode reads only the row's bytes — any partitioning gives the
    // same stats
    b.foreach(s => assert(a(s.item_id) === s))
    // the data-chunk length the decoder trusted matches the actual
    // payload length, and the square wave's RMS equals its peak
    val lens = media.collect().map(r => r.item_id -> r.media.length).toMap
    a.values.foreach { s =>
      assert(s.n_samples === (lens(s.item_id) - 44) / 2)
      assert(s.sample_rate === 16000)
      assert(s.rms === s.peak.toDouble)
      assert(s.n_zero_cross > 0)
    }
  }
}
