package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 semantic pins the per-query oracle gate cannot state
  * directly — starting with the χ² helper's degenerate-input guard:
  * `chi2Report` is the reusable monitoring surface (q230's batch
  * report AND DriftStream readouts feed it), so a dimension the
  * critical-value table cannot adjudicate must refuse LOUDLY, never
  * throw a bare array-index error (dfree=0) or NULL its way to a
  * silent "no drift" (dfree>30).
  */
class Round11OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def cells(rows: Seq[(String, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("dimension", "cell", "cohort", "o")
  }

  test("chi2Report refuses degenerate and oversized dimensions " +
    "loudly, and healthy dimensions still adjudicate") {
    // healthy: 2 cells → dfree=1, the usual case
    val ok = ProfileOps.chi2Report(cells(Seq(
      ("d", "a", "ref", 50L), ("d", "a", "cur", 10L),
      ("d", "b", "ref", 50L), ("d", "b", "cur", 90L)))).collect()
    assert(ok.length === 1)
    assert(ok.head.getAs[Long]("dfree") === 1L)
    assert(ok.head.getAs[Int]("drift") === 1) // 50/50 → 10/90 drifts
    // degenerate: single-cell dimension → dfree=0 → loud refusal
    // naming the dimension (not a bare "array indices start at 1")
    val e0 = intercept[Exception] {
      ProfileOps.chi2Report(cells(Seq(
        ("only", "x", "ref", 5L), ("only", "x", "cur", 7L)))).collect()
    }
    assert(e0.getMessage.contains("only") &&
      e0.getMessage.contains("dfree"),
      s"refusal must name the dimension and the rule, got: " +
        e0.getMessage)
    // oversized: 32 cells → dfree=31 past the table → loud refusal,
    // never a NULL crit_ppm reading as drift=0
    val big = (0 until 32).flatMap(i => Seq(
      ("wide", s"c$i", "ref", 5L), ("wide", s"c$i", "cur", 5L)))
    val e1 = intercept[Exception] {
      ProfileOps.chi2Report(cells(big)).collect()
    }
    assert(e1.getMessage.contains("wide") &&
      e1.getMessage.contains("dfree"))
  }

  test("q233: MJPEG frames decode for real — every frame, boundaries " +
    "from stsz, loud failures on tampered tables") {
    val id = 7L // doc_id % 3 == 2 residue not required for the unit leg
    val b = MultimodalOps.mp4MjpegVideo(id)
    // stride 1: EVERY frame decodes, not just the sampled half
    val st = MultimodalOps.decodeMjpegBytes(id, b, stride = 1)
    assert(st.n_frames === 3 + (id % 4).toInt)
    assert(st.n_sampled === st.n_frames)
    assert(st.frames_ok && st.mean_err_lt4 && st.max_err_lt48 &&
      st.psnr_gt28)
    // frames are genuinely distinct compressed payloads: per-frame
    // reference offsets differ, so byte-identical frames would mean
    // the encoder ignored the frame index
    val sizesOff = b.indexOfSlice("stsz".getBytes("US-ASCII"))
    assert(sizesOff > 0)
    // tamper: first stsz entry +1 → size table no longer matches mdat
    val bad = b.clone()
    val firstSize = sizesOff + 4 + 4 + 4 + 4 // ver/flags, fixed, count
    bad(firstSize + 3) = (bad(firstSize + 3) + 1).toByte
    val e = intercept[IllegalArgumentException] {
      MultimodalOps.decodeMjpegBytes(id, bad, 1)
    }
    assert(e.getMessage.contains("mdat"),
      s"size mismatch must be loud, got: ${e.getMessage}")
    // tamper: corrupt a frame's SOI → refused as non-JPEG, not decoded
    val meta = MultimodalOps.parseMp4Bytes(id, b)
    val mdatOff = b.length - meta.mdat_bytes.toInt
    val bad2 = b.clone()
    bad2(mdatOff) = 0
    val e2 = intercept[IllegalArgumentException] {
      MultimodalOps.decodeMjpegBytes(id, bad2, 1)
    }
    assert(e2.getMessage.contains("JPEG"))
  }

  test("q238 property: the epoch shuffle is a pure function of " +
    "(seed, epoch, id) — positions survive any repartitioning") {
    import graft.functions.{Hashing, SurrogateKey}
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id")
    def positions(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val hashed = df.withColumn("h",
        Hashing.md5Long60(concat(lit("42:0:"), col("doc_id"))))
      SurrogateKey.zipIndexed(hashed, "pos", Seq(col("h"), col("doc_id")))
        .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    }
    val base = positions(docs)
    // a task retry / different input partitioning must not move a
    // single position — this is what rand()-ordering cannot give
    assert(positions(docs.repartition(17)) === base)
    assert(positions(docs.repartition(1)) === base)
    // a true permutation: every position 1..n exactly once
    assert(base.values.toSeq.sorted === (1L to base.size.toLong))
    // epochs really reshuffle: epoch 1's order differs from epoch 0's
    val e1 = {
      val hashed = docs.withColumn("h",
        Hashing.md5Long60(concat(lit("42:1:"), col("doc_id"))))
      SurrogateKey.zipIndexed(hashed, "pos", Seq(col("h"), col("doc_id")))
        .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    }
    assert(e1 !== base)
  }

  test("q245 property: the distilled student actually LEARNS — final " +
    "agreement with the teacher beats the majority-class baseline by " +
    "a real margin, and the weights are non-trivial") {
    // The oracle hash gate proves Spark and DuckDB train IDENTICALLY;
    // it cannot state that the training went anywhere. Pin that here:
    // at sf0.001 the teacher labels split 63/37, and the trained
    // student must agree with the teacher well past that floor.
    val out = CurationOps.queries
      .find(_.name == "q245_trained_classifier").get
      .fn(spark, sf).collect()
    assert(out.length === 64) // one row per hash bucket
    val accPpm = out.head.getAs[Long]("acc_ppm")
    val nDocs = out.head.getAs[Long]("n_docs")
    assert(nDocs > 0)
    // majority baseline at sf0.001 is 630_000 ppm; demand a real gap
    assert(accPpm > 700000L,
      s"student accuracy $accPpm ppm did not clear the majority floor")
    // a learner that collapsed to all-one-class has every weight with
    // the same sign; the converged separator must use both directions
    val ws = out.map(_.getAs[Long]("weight"))
    assert(ws.exists(_ > 0L) && ws.exists(_ < 0L))
  }

  test("q246 property: the audio fingerprint is loudness-invariant — " +
    "every planted volume-normalized variant lands in its original's " +
    "near-dup group") {
    val rows = MultimodalOps.queries
      .find(_.name == "q246_audio_fingerprint").get
      .fn(spark, sf).collect()
    val rep = rows.map(r =>
      r.getAs[Long]("item_id") -> r.getAs[Long]("group_rep")).toMap
    val variants = rep.keys.filter(_ >= 10000000L).toSeq
    assert(variants.nonEmpty)
    variants.foreach { v =>
      assert(rep(v) === rep(v - 10000000L),
        s"variant $v not grouped with its original")
    }
    // and the fingerprint is not degenerate: more than one group exists
    assert(rows.map(_.getAs[Long]("group_rep")).distinct.length > 1)
  }

  test("q249 property: the learned principal axis carries variance — " +
    "positive Rayleigh quotient, label clusters separate along it") {
    val rows = ClusterOps.queries
      .find(_.name == "q249_pca_power_iteration").get
      .fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // the axis explains variance (a zero/negative Rayleigh quotient
    // means the iteration collapsed)
    assert(rows.head.getAs[Long]("eigval_est") > 0L)
    // the embeddings are label-clustered; the top PC must separate at
    // least some cluster means — per-label mean projections cannot
    // all coincide
    val means = rows.map(r => r.getAs[Long]("sum_proj").toDouble /
      r.getAs[Long]("n_vecs"))
    assert(means.max - means.min > 1000.0,
      s"label means ${means.toSeq} show no separation along the axis")
    // the axis itself is non-degenerate fixed-point (renormalized to
    // ±1000: at least one component at full scale)
    assert(rows.head.getAs[Long]("v_abs_sum") >= 1000L)
  }

  test("q251 property: the bootstrap interval is a real interval — it " +
    "brackets the point estimate, the replicate weights average to 1, " +
    "and the replicates genuinely vary") {
    val rows = SampleOps.queries
      .find(_.name == "q251_bootstrap_ci").get
      .fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length === 32)
    val h = rows.head
    val (pt, lo, hi) = (h.getAs[Long]("point_mean_milli"),
      h.getAs[Long]("ci_lo_milli"), h.getAs[Long]("ci_hi_milli"))
    assert(lo < pt && pt < hi, s"CI [$lo, $hi] does not bracket $pt")
    // mean-1 weights: every replicate's effective n within ±10% of N
    val n = h.getAs[Long]("n_rows")
    rows.foreach { r =>
      val ne = r.getAs[Long]("n_eff")
      assert(math.abs(ne - n) < n / 10, s"replicate n_eff $ne far from $n")
    }
    // resampling variance exists: not all replicate means coincide
    assert(rows.map(_.getAs[Long]("mean_milli")).distinct.length > 1)
  }
}
