package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-7 operators — cross-row and semantic
  * properties the per-query DuckDB hash-match can't state.
  */
class Round7SemanticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"
  private val N = 6

  // ── q86: span-level exact dedup ─────────────────────────────────────────

  test("q86 spans are maximal, disjoint, >= N tokens, and inside the document") {
    val spans = DedupOps.duplicatedSpans(spark, sf, N).collect()
    assert(spans.nonEmpty)
    val lens = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), x => x =!= lit("")))
          .as("n_toks"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    spans.groupBy(_.getLong(0)).foreach { case (doc, ss) =>
      val sorted = ss.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      sorted.foreach { case (s, e, l) =>
        assert(l === e - s + 1)
        assert(l >= N, s"doc $doc span [$s,$e] shorter than a single gram")
        assert(s >= 0 && e < lens(doc), s"doc $doc span [$s,$e] out of range")
      }
      // maximal merge: consecutive spans must have a gap of >= 2 tokens —
      // a gap of <= 1 means the interval-union window failed to merge
      sorted.sliding(2).foreach {
        case Array((_, e1, _), (s2, _, _)) =>
          assert(s2 > e1 + 1, s"doc $doc unmerged adjacent spans")
        case _ =>
      }
    }
  }

  test("q86 every reported span really is cross-document duplicated text") {
    // semantic ground truth, independent of the SQL oracle: the leading
    // N tokens of every reported span must occur verbatim in >= 2
    // distinct documents
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .toMap
    val spans = DedupOps.duplicatedSpans(spark, sf, N).collect()
    assert(spans.nonEmpty)
    spans.foreach { r =>
      val (doc, s) = (r.getLong(0), r.getLong(1).toInt)
      val gram = docs(doc).slice(s, s + N).mkString(" ")
      val holders = docs.count { case (_, toks) =>
        toks.sliding(N).exists(_.mkString(" ") == gram)
      }
      assert(holders >= 2, s"doc $doc span-head gram '$gram' is unique")
    }
  }

  test("q86 is partition-invariant") {
    val a = DedupOps.duplicatedSpans(spark, sf, N)
      .collect().map(_.toString).sorted.toSeq
    val b = DedupOps.duplicatedSpans(spark, sf, N)
      .repartition(13).collect().map(_.toString).sorted.toSeq
    assert(a === b && a.nonEmpty)
  }

  // ── q87: SemDeDup ───────────────────────────────────────────────────────

  test("q87 kept set has no within-cluster pair at cosine >= tau") {
    val tau = 0.4
    val asg = SimilarityOps.semAssign(spark, sf, k = 8)
      .select("vec_id", "cluster", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val dropped = SimilarityOps.semDedup(spark, sf, k = 8, tau = tau)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(dropped.nonEmpty)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val kept = asg.filterNot(v => dropped(v._1))
    kept.groupBy(_._2).foreach { case (_, vs) =>
      for (i <- vs.indices; j <- (i + 1) until vs.length)
        assert(cos(vs(i)._3, vs(j)._3) < tau,
          s"kept pair ${vs(i)._1},${vs(j)._1} violates the SemDeDup guarantee")
    }
    // and every dropped vector's kept_by really is senior + similar
    val byId = asg.map(v => v._1 -> v).toMap
    SimilarityOps.semDedup(spark, sf, k = 8, tau = tau).collect().foreach { r =>
      val (v, cl, keptBy) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(keptBy < v)
      assert(byId(keptBy)._2 === cl && byId(v)._2 === cl)
      assert(cos(byId(keptBy)._3, byId(v)._3) >= tau - 1e-9)
    }
  }

  // ── q88: single-pass column profile ─────────────────────────────────────

  test("q88 profile matches independently-computed per-column stats") {
    val prof = ProfileOps.profile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet === Set("lang", "n_chars", "source", "text"))
    val d = graft.sources.Tables.documents(spark, sf)
    val nRows = d.count()
    for ((c, isStr) <- Seq("lang" -> true, "n_chars" -> false,
      "source" -> true, "text" -> true)) {
      val m = if (isStr) length(col(c)).cast("long") else col(c).cast("long")
      val want = d.agg(
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long"),
        countDistinct(col(c)), min(m), max(m), round(avg(m), 4)).head()
      val got = prof(c)
      assert(got.getLong(1) === nRows, s"$c n_rows")
      assert(got.getLong(2) === want.getLong(0), s"$c n_null")
      assert(got.getLong(3) === want.getLong(1), s"$c n_distinct")
      assert(got.getLong(4) === want.getLong(2), s"$c min")
      assert(got.getLong(5) === want.getLong(3), s"$c max")
      assert(got.getDouble(6) === want.getDouble(4), s"$c avg")
    }
  }

  test("q88 runs as ONE aggregate over ONE scan (no per-column jobs)") {
    val plan = ProfileOps.profile(spark, sf).queryExecution.executedPlan
      .toString()
    // a single parquet scan feeds the whole profile
    assert("Scan parquet".r.findAllIn(plan).length === 1, plan.take(2000))
  }

  // ── q97: batch ANN retrieval ────────────────────────────────────────────

  test("q97 batch ANN: per-query top-k agrees with the single-query path") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val batch = SimilarityOps.batchLshTopK(e, every = 50, k = 3).collect()
      .groupBy(_.getLong(0))
    assert(batch.nonEmpty)
    batch.foreach { case (qid, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_.getInt(4)).sorted.toSeq === (1 to rows.length))
      // the batch path returns exactly what q40's single-query LSH
      // returns for this query (same tables, same rerank, same ties)
      val single = SimilarityOps.lshTopK(e, qid, 3).collect()
        .map(r => (r.getLong(0), r.getDouble(2)))
      assert(rows.sortBy(_.getInt(4))
        .map(r => (r.getLong(1), r.getDouble(3))).toSeq === single.toSeq,
        s"query $qid batch != single")
    }
    val plan = SimilarityOps.batchLshTopK(e, 50, 3)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"),
      "candidate generation must stay an equi-join for the whole batch")
  }

  // ── q93/q94: classifier + canonical selection ───────────────────────────

  test("q93 scores are partition-invariant (integer dot, no float reduction)") {
    def run() = graft.SparkEntry.queries("q93_quality_classifier")(spark, sf)
    val a = run().collect().map(_.toString).sorted.toSeq
    val b = run().repartition(17).collect().map(_.toString).sorted.toSeq
    assert(a === b && a.nonEmpty)
  }

  test("q94 canonical member maximizes n_chars within its group") {
    val groups = DedupOps.components(spark, sf)
      .join(graft.sources.Tables.documents(spark, sf)
        .select(col("doc_id"), col("n_chars")), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._2)
    val sel = graft.SparkEntry.queries("q94_canonical_selection")(spark, sf)
      .collect()
    assert(sel.nonEmpty && sel.length === groups.size)
    sel.foreach { r =>
      val (gid, n, canon, kept, total) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val members = groups(gid)
      assert(n === members.length)
      assert(kept === members.map(_._3).max,
        s"group $gid kept a non-maximal member")
      assert(members.exists(m => m._1 == canon && m._3 == kept))
      assert(total === members.map(_._3).sum)
    }
  }

  // ── q91/q92: multimodal transforms ──────────────────────────────────────

  test("q91 downsample equals the per-pixel box mean of the decoded image") {
    // independent of the SQL oracle: recompute each 2×2 mean from the
    // decoded byte grid directly and compare every output cell
    for (id <- 0L until 99L by 9L) {
      val (w, h, rows) = MultimodalOps.decodePngBytes(MultimodalOps.encodePng(id))
      val stats = MultimodalOps.downsamplePng(
        MultimodalOps.pngImageTable(spark, sf)
          .filter(org.apache.spark.sql.functions.col("item_id") === id))
        .collect().head
      assert((stats.out_w, stats.out_h) === (w / 2, h / 2))
      var sum = 0L
      for (r <- 0 until h / 2; c <- 0 until w / 2; ch <- 0 until 3)
        sum += ((rows(2 * r)(2 * c * 3 + ch) & 0xff) +
          (rows(2 * r)((2 * c + 1) * 3 + ch) & 0xff) +
          (rows(2 * r + 1)(2 * c * 3 + ch) & 0xff) +
          (rows(2 * r + 1)((2 * c + 1) * 3 + ch) & 0xff)) / 4
      assert(stats.sum_val === sum, s"id=$id")
    }
  }

  test("q92 decimation keeps exactly every 4th sample of the real decode") {
    val media = MultimodalOps.pcmAudioTable(spark, sf)
    val full = MultimodalOps.decodePcm(media).collect()
      .map(s => s.item_id -> s).toMap
    MultimodalOps.decimatePcm(media, stride = 4).collect().foreach { d =>
      val f = full(d.item_id)
      assert(d.n_samples === (f.n_samples + 3) / 4, s"item ${d.item_id}")
      assert(d.sample_rate === f.sample_rate / 4)
      assert(d.peak <= f.peak)
      assert(d.sum_sq <= f.sum_sq)
    }
    // stride 1 is the identity
    val s1 = MultimodalOps.decimatePcm(media, 1).collect()
      .map(_.toString).sorted.toSeq
    assert(s1 === full.values.map(_.toString).toSeq.sorted)
  }

  // ── df-cap count gate ───────────────────────────────────────────────────

  test("cappedIndex falls back to a shuffled anti-join when the hot set exceeds the gate") {
    import spark.implicits._
    // adversarial corpus: EVERY shingle is hot (df=3 > cap=2) — the
    // Zipf assumption is violated wholesale
    val inv = (0 until 300).flatMap(s => Seq(
      ("en", s"sh$s", s.toLong, 10L), ("en", s"sh$s", 1000L + s, 10L),
      ("en", s"sh$s", 2000L + s, 10L)))
      .toDF("lang", "shingle", "doc_id", "n_sh")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // kill size-based auto-broadcast so the plan shows the gate's
      // choice, not the optimizer's size estimate
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val gated = DedupOps.cappedIndex(inv, dfCap = 2, hotBroadcastMax = 10L)
      val forced = DedupOps.cappedIndex(inv, dfCap = 2)
      def broadcasts(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
        }
      assert(gated.collect().isEmpty && forced.collect().isEmpty,
        "every posting is hot: both paths must drop the whole index")
      val gatedPlan = gated.queryExecution.executedPlan.toString()
      assert(!gatedPlan.contains("BroadcastExchange"),
        s"gate must pick the shuffled anti-join:\n${gatedPlan.take(1500)}")
      // and on a sane corpus (hot set under the gate) both paths agree
      val sane = inv.union(Seq(("en", "rare", 9999L, 10L))
        .toDF("lang", "shingle", "doc_id", "n_sh"))
      val a = DedupOps.cappedIndex(sane, 2, hotBroadcastMax = 10000L)
        .collect().map(_.toString).sorted.toSeq
      val b = DedupOps.cappedIndex(sane, 2, hotBroadcastMax = 0L)
        .collect().map(_.toString).sorted.toSeq
      assert(a === b && a.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  // ── q99: large-star/small-star components ───────────────────────────────

  test("q99 star contraction handles a 3000-link chain (label propagation cannot)") {
    import spark.implicits._
    // single chain 0-1-2-...-3000: diameter 3000, far past the q54
    // fixpoint's 50-round cap — the O(log n) path must solve it
    val chain = spark.range(3000)
      .select((col("id") + 1).as("id_a"), col("id").as("id_b"))
    val comp = DedupOps.componentsStar(chain).collect()
    assert(comp.length == 3001)
    assert(comp.forall(_.getLong(1) == 0L), "every node joins component 0")
  }

  test("q99 star components equal a union-find ground truth on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 400
    val edges = Seq.fill(300)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find: the independent oracle
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expect = nodes.map { v =>
      // component min = min over all nodes sharing the root
      val r = find(v.toInt)
      v -> nodes.filter(u => find(u.toInt) == r).min
    }.toMap
    val got = DedupOps.componentsStar(
      edges.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("q99 star components agree with the q54 fixpoint on the near-dup graph") {
    val viaFixpoint = DedupOps.components(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = graft.SparkEntry.queries("q35_ngram_jaccard")(spark, sf)
      .select("id_a", "id_b")
    val viaStar = DedupOps.componentsStar(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStar === viaFixpoint)
  }

  // ── q100: stored-index batch IVF ────────────────────────────────────────

  test("q100 stored IVF: lists land cent_id-partitioned; results are stable across rebuilds") {
    val out1 = graft.SparkEntry.queries("q100_stored_ivf")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(out1.nonEmpty && out1.size % 3 == 0, "k=3 rows per query")
    // the written index really is Hive-partitioned by cent_id (the
    // layout partition pruning needs at scale)
    val listsDir = new java.io.File(graft.sources.Scratch.dir(spark,
      "ivf-lists-" + Integer.toHexString(sf.hashCode)))
    assert(listsDir.listFiles() != null &&
      listsDir.listFiles().exists(_.getName.startsWith("cent_id=")),
      s"expected cent_id= partition dirs in $listsDir")
    // a second run rebuilds + rewrites the index through the atomic
    // writer and must reproduce the identical neighbor lists
    val out2 = graft.SparkEntry.queries("q100_stored_ivf")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(out1 === out2)
  }

  // ── q102: HLL set algebra ───────────────────────────────────────────────

  test("q102 register max-merge equals registers of the concatenated stream") {
    // the mergeability contract the set algebra rests on, asserted
    // EXACTLY: registers(A ++ B) == max-merge(registers(A), registers(B))
    import org.apache.spark.sql.functions.{col, max => smax}
    val sh = DedupOps.shingleHashes(spark, sf)
      .select(col("lang"), col("h60"))
    val a = sh.filter(col("h60") % 2 === 0)
    val b = sh.filter(col("h60") % 2 =!= 0)
    // r is LONG since the BinLength kernel replaced length(bin(w))
    // (r16): read it as such — the contract under test is value
    // equality of the register maps, not the physical int width
    val whole = SketchOps.registersOf(sh)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = SketchOps.registersOf(a).union(SketchOps.registersOf(b))
      .groupBy("lang", "bucket").agg(smax("r").as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole === merged)
  }

  test("q102 union estimate dominates both sides; overlap error is within 4 sigma") {
    val rows = graft.SparkEntry.queries("q102_hll_set_algebra")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (estA, estB, estU) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // structural: union registers >= each side's registers pointwise,
      // so the union estimate dominates both sides
      assert(estU >= math.max(estA, estB) - 0.05,
        s"union must dominate both sides: $r")
      // statistical: inclusion-exclusion error scales with |union|
      // (stderr ~ 1.04/sqrt(64) = 13% per estimate); 4 sigma of the
      // union estimate bounds the overlap error — NOT sub-additivity,
      // which HLL does not guarantee (small overlaps can estimate
      // negative; the query reports them unclamped, by design)
      val overlapEst = r.getDouble(5)
      val exact = r.getLong(6).toDouble
      assert(math.abs(overlapEst - exact) <= 0.52 * estU + 50,
        s"overlap estimate outside 4 sigma: $r")
    }
  }

  // ── q101: MP4 box-tree walk ─────────────────────────────────────────────

  test("q101 MP4 walk recovers the written fields; corrupt trees fail loudly") {
    val payload = "some mdat signal bytes".getBytes("UTF-8")
    val b = MultimodalOps.mp4Video(14L, payload)
    val m = MultimodalOps.parseMp4Bytes(14L, b)
    assert(m.n_boxes == 6 && m.timescale == 600)
    assert(m.duration_ticks == 6000 + (14 % 997) * 13)
    assert(m.track_w == (14 % 4) * 160 + 320 && m.track_h == (14 % 4) * 90 + 180)
    assert(m.mdat_bytes == payload.length)
    // a box whose size overruns its container must throw, not overread
    val bad = b.clone()
    bad(0) = 0x7f.toByte // ftyp size becomes enormous
    intercept[Exception](MultimodalOps.parseMp4Bytes(14L, bad))
    // trailing non-box garbage must throw
    intercept[Exception](
      MultimodalOps.parseMp4Bytes(14L, b ++ Array[Byte](1, 2, 3)))
  }

  // ── q98: real JPEG decode via the JDK codec ─────────────────────────────

  test("q98 JPEG encode is deterministic and decode recovers the formula image") {
    val ids = Seq(2L, 5L, 11L, 23L, 47L)
    for (id <- ids) {
      val b1 = MultimodalOps.encodeJpeg(id)
      val b2 = MultimodalOps.encodeJpeg(id)
      assert(java.util.Arrays.equals(b1, b2), s"encode must be deterministic ($id)")
      assert((b1(0) & 0xff) == 0xff && (b1(1) & 0xff) == 0xd8, "SOI marker")
      val (w, h, px) = MultimodalOps.decodeJpegBytes(b1)
      assert(w == 16 + 2 * (id % 9).toInt && h == 16 + 2 * (id % 7).toInt)
      // fidelity vs the codec-independent formula reference: the same
      // bounds the q98 oracle expects, asserted directly on the pixels
      var absSum = 0L; var maxE = 0
      for (i <- 0 until w * h; ch <- 0 until 3) {
        val got = (px(i) >> (16 - 8 * ch)) & 0xff
        val want = MultimodalOps.jpegPixel(id, i / w, i % w, ch, w, h)
        val e = math.abs(got - want)
        absSum += e; maxE = math.max(maxE, e)
      }
      assert(absSum.toDouble / (3L * w * h) < 4.0, s"mean err too high ($id)")
      assert(maxE < 48, s"max err $maxE too high ($id)")
    }
  }

  test("q98 is partition-invariant and corrupt payloads fail loudly") {
    def run() = graft.SparkEntry.queries("q98_jpeg_decode")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val base = run()
    val reparted = MultimodalOps.decodeJpeg(
      MultimodalOps.jpegImageTable(spark, sf).repartition(13)).toDF()
      .select("item_id", "width", "height", "n_values", "mean_err_lt4",
        "max_err_lt48", "psnr_gt28")
      .orderBy("item_id").collect().map(_.toString).sorted.toSeq
    assert(base === reparted)
    assert(base.nonEmpty && base.forall(_.contains("true,true,true")))
    // not-a-JPEG and truncated-JPEG payloads must throw, not return junk
    intercept[Exception] {
      MultimodalOps.decodeJpegBytes("plainly not a jpeg".getBytes("UTF-8"))
    }
    intercept[Exception] {
      MultimodalOps.decodeJpegBytes(MultimodalOps.encodeJpeg(3L).take(40))
    }
  }
}
