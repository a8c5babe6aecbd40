package graft.warehouse

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing

/** Property tests for the cleansing/hashing kernels (SURVEY.md §5.3).
  *
  * Each property generates one large random sample (fixed seed —
  * deterministic across runs), evaluates the kernel through a real
  * DataFrame, and asserts the invariant row-by-row: one Spark job per
  * property, not per case.
  */
class KernelPropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, rng.Seed(42L)).get

  test("intDateToDate: valid yyyymmdd ints round-trip, junk nulls out") {
    import spark.implicits._
    val valid = for {
      y <- Gen.choose(1900, 2049); m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28)
    } yield y * 10000 + m * 100 + d
    val junk = Gen.oneOf(
      Gen.choose(-99999999, 0),              // non-positive
      Gen.choose(1, 9999999),                // too short
      Gen.choose(100000000, 999999999),      // too long
      valid.map(v => v - (v % 100) + 99))    // day 99: 8 digits, not a date
    val ints = sample(Gen.listOfN(300, Gen.frequency(2 -> valid, 1 -> junk)))
    val out = ints.toDF("i")
      .select(col("i"), Cols.intDateToDate(col("i")).as("d"))
      .collect()
    out.foreach { r =>
      val i = r.getInt(0)
      val s = i.toString
      val parseable = i > 0 && s.length == 8 &&
        s.substring(4, 6).toInt >= 1 && s.substring(4, 6).toInt <= 12 &&
        s.substring(6).toInt >= 1 && s.substring(6).toInt <= 28
      if (parseable)
        assert(Option(r.getDate(1)).map(_.toString.replace("-", "")) === Some(s),
          s"for $i")
      else if (i <= 0 || s.length != 8)
        assert(r.isNullAt(1), s"junk $i must null out")
      else
        // 8-digit positives with an out-of-range month/day (the 'day 99'
        // generator class): try_to_date must null them out, not wrap or
        // overflow into a neighboring month.
        assert(r.isNullAt(1), s"8-digit non-date $i must null out")
    }
  }

  test("sales repair matches the reference's formulas; consistent when price != 0") {
    import spark.implicits._
    val rowGen = for {
      qty <- Gen.choose(1, 50)
      price <- Gen.oneOf(Gen.choose(-500, -1), Gen.const(0), Gen.choose(1, 500))
      truth <- Gen.oneOf(true, false)
      sales <- if (truth) Gen.const(qty * math.abs(price))
               else Gen.oneOf(Gen.const(0), Gen.choose(-1000, 1000))
    } yield (qty, price, sales)
    val rows = sample(Gen.listOfN(500, rowGen))
    val bronze = rows.toDF("sls_quantity", "sls_price", "sls_sales")
      .select(lit("SO1").as("sls_ord_num"), lit("K").as("sls_prd_key"),
        lit(1).as("sls_cust_id"), lit(20200101).as("sls_order_dt"),
        lit(20200102).as("sls_ship_dt"), lit(20200103).as("sls_due_dt"),
        col("sls_sales"), col("sls_quantity"), col("sls_price"))
    val out = Silver.crmSalesDetails(bronze)
      .select("sls_sales", "sls_quantity", "sls_price").collect()
    out.zip(rows).foreach { case (r, (q0, p0, s0)) =>
      val (s, q, p) = (r.getInt(0), r.getInt(1), r.getInt(2))
      // mirror proc_load_silver.sql:144-153 exactly: BOTH repairs read
      // the ORIGINAL columns (same SELECT scope), so a row with price=0
      // and inconsistent sales comes out inconsistent — that is the
      // reference's own semantics (its quality data never hits it)
      val expS = if (s0 <= 0 || s0 != q0 * math.abs(p0)) math.abs(q0 * p0) else s0
      val expP = if (p0 == 0) math.abs(s0.toDouble / q0).toInt
                 else math.abs(p0)
      assert(q === q0)
      assert(s === expS, s"sales for input ($q0, $p0, $s0)")
      assert(p === expP, s"price for input ($q0, $p0, $s0)")
      if (p0 != 0) assert(s == q * p,
        s"nonzero-price rows must come out consistent: ($q0, $p0, $s0)")
    }
  }

  test("window dedup keeps exactly one latest row per non-null key") {
    import spark.implicits._
    val rowGen = for {
      id <- Gen.oneOf(Gen.choose(1, 40).map(Some(_)), Gen.const(None))
      day <- Gen.choose(1, 28)
      key <- Gen.choose(1, 9)
    } yield (id, s"AW$key", "a", "b", "S", "M", Date.valueOf(f"2024-01-$day%02d"))
    val rows = sample(Gen.listOfN(400, rowGen))
    val bronze = rows.toDF("cst_id", "cst_key", "cst_firstname",
      "cst_lastname", "cst_marital_status", "cst_gndr", "cst_create_date")
    val out = Silver.crmCustInfo(bronze).collect()
    val in = rows.filter(_._1.isDefined)
    assert(out.map(_.getInt(0)).distinct.length === out.length, "unique keys")
    assert(out.length === in.map(_._1.get).distinct.length, "one row per key")
    // each kept row carries its key's max (create_date, cst_key) pair
    val best = in.groupBy(_._1.get).map { case (id, rs) =>
      id -> rs.map(t => (t._7.toString, t._2)).max
    }
    out.foreach { r =>
      assert(best(r.getInt(0)) ===
        ((r.getDate(6).toString, r.getString(1))), s"row $r")
    }
  }

  test("Hashing.md5Long60: JVM and Spark expression agree on random strings") {
    import spark.implicits._
    val strs = sample(Gen.listOfN(200,
      Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr))).filter(_.nonEmpty)
    val out = strs.toDF("s")
      .select(col("s"), Hashing.md5Long60(col("s")).as("h")).collect()
    out.foreach { r =>
      assert(r.getLong(1) === Hashing.md5Long60(r.getString(0)),
        s"mismatch for '${r.getString(0)}'")
    }
  }

  test("span dedup finds every injected cross-document passage (generated corpora)") {
    import spark.implicits._
    val N = 6
    // vocabulary of unique background tokens ensures NO accidental
    // duplicated n-gram: background token (d, i) is unique to its slot
    val corpusGen = for {
      nDocs <- Gen.choose(4, 10)
      lens <- Gen.listOfN(nDocs, Gen.choose(N + 2, 40))
      passageLen <- Gen.choose(N, 12)
      holders <- Gen.pick(2, 0 until nDocs)
      offsets <- Gen.listOfN(2, Gen.choose(0.0, 1.0))
    } yield {
      val passage = (0 until passageLen).map(i => s"shared$i")
      val docs = (0 until nDocs).map { d =>
        val base = (0 until lens(d)).map(i => s"bg${d}_$i")
        if (holders.contains(d)) {
          // splice the passage at a document-specific offset
          val at = (offsets(holders.indexOf(d)) * base.length).toInt
          val toks = base.take(at) ++ passage ++ base.drop(at)
          (d.toLong, toks.mkString(" "), at)
        } else (d.toLong, base.mkString(" "), -1)
      }
      (docs, passageLen)
    }
    // 30 generated corpora, one Spark job each (small frames)
    sample(Gen.listOfN(30, corpusGen)).foreach { case (docs, passageLen) =>
      val df = docs.map { case (id, text, _) => (id, text) }
        .toDF("doc_id", "text")
      val spans = graft.operators.DedupOps.duplicatedSpansOf(df, N).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // every injected occurrence must be covered by EXACTLY the
      // passage span: [at, at + passageLen - 1]
      docs.filter(_._3 >= 0).foreach { case (id, _, at) =>
        val mine = spans.filter(_._1 == id)
        assert(mine.length === 1,
          s"doc $id: expected exactly the injected span, got ${mine.toSeq}")
        assert(mine.head._2 === at.toLong &&
          mine.head._3 === (at + passageLen - 1).toLong,
          s"doc $id: span ${mine.head} != injected [$at, ${at + passageLen - 1}]")
      }
      // and no doc without an injection reports anything
      docs.filter(_._3 < 0).foreach { case (id, _, _) =>
        assert(!spans.exists(_._1 == id), s"doc $id: phantom span")
      }
    }
  }

  test("PNG encode/decode round-trips arbitrary pixel grids exactly") {
    import graft.operators.MultimodalOps
    // random dims INCLUDING 1-wide/1-tall edges (the a/b/c neighbor
    // terms of Sub/Up/Average/Paeth all hit their boundary branches)
    // and adversarial content: random, constant, and gradient rows
    val imgGen = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 24)
      mode <- Gen.oneOf(0, 1, 2)
      seed <- Gen.choose(0, 1 << 20)
    } yield {
      val rnd = new scala.util.Random(seed)
      val raw = Array.tabulate(h, w * 3) { (r, i) =>
        (mode match {
          case 0 => rnd.nextInt(256)
          case 1 => 170
          case 2 => (r * 7 + i * 13) % 256
        }).toByte
      }
      raw
    }
    sample(Gen.listOfN(80, imgGen)).foreach { raw =>
      val (w2, h2, rows) =
        MultimodalOps.decodePngBytes(MultimodalOps.encodePngPixels(raw))
      assert((w2, h2) === (raw(0).length / 3, raw.length))
      for (r <- raw.indices)
        assert(java.util.Arrays.equals(rows(r), raw(r)), s"row $r differs")
    }
  }

  test("average hash: brightness-invariant when the clamp never bites " +
      "(the property q196's near-dup detection stands on)") {
    import graft.operators.MultimodalOps
    val imgGen = for {
      w <- Gen.choose(8, 20)
      h <- Gen.choose(8, 20)
      seed <- Gen.choose(0, 1 << 20)
      delta <- Gen.choose(1, 40)
    } yield (w, h, seed, delta)
    sample(Gen.listOfN(40, imgGen)).foreach { case (w, h, seed, delta) =>
      val rnd = new scala.util.Random(seed)
      // pixels capped at 255 - delta - 3: the +delta shift never
      // clamps, and the grayscale floor-div can move the mean by at
      // most 1 — keep a correctness margin by capping below the edge
      val raw = Array.tabulate(h, w * 3)((_, _) =>
        rnd.nextInt(256 - delta - 3).toByte)
      val shifted = raw.map(_.map(b => ((b & 0xff) + delta).toByte))
      val h0 = MultimodalOps.averageHash(
        MultimodalOps.encodePngPixels(raw))
      val h1 = MultimodalOps.averageHash(
        MultimodalOps.encodePngPixels(shifted))
      // unclamped global shift: grays all move by delta, the mean by
      // delta (integer division over 64 identical shifts is exact
      // when every gray moves equally — (g+δ) − mean(g+δ) ≡ g − mean)
      assert(h0 === h1,
        s"avg-hash must be invariant under unclamped shift d=$delta")
    }
  }

  test("PCM decode under header corruption: clamps or fails loudly, never OOB") {
    import graft.operators.MultimodalOps
    // a valid little payload: 8 alternating samples
    def validWav(rate: Int, samples: Seq[Int]): Array[Byte] = {
      val pcm = samples.flatMap(s =>
        Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
      MultimodalOps.wavHeader(rate, pcm.length) ++ pcm
    }
    val base = validWav(16000, Seq(1000, -1000, 1000, -1000, 500, -500, 7, -7))
    val cases: Gen[Array[Byte]] = Gen.oneOf(
      // truncation anywhere — including inside the fmt chunk and header
      Gen.choose(0, base.length - 1).map(base.take),
      // declared data length far beyond the real payload
      Gen.const {
        val b = base.clone()
        b(40) = 0xff.toByte; b(41) = 0xff.toByte
        b(42) = 0xff.toByte; b(43) = 0x7f.toByte
        b
      },
      // zero-length data chunk
      Gen.const {
        val b = base.clone()
        b(40) = 0; b(41) = 0; b(42) = 0; b(43) = 0
        b
      },
      // odd byte count: drop the final byte (torn last sample)
      Gen.const(base.take(base.length - 1)),
      // random single-byte corruption anywhere in the 44-byte header
      for (off <- Gen.choose(0, 43); v <- Gen.choose(0, 255))
        yield { val b = base.clone(); b(off) = v.toByte; b })
    val payloads = sample(Gen.listOfN(500, cases))
    payloads.foreach { b =>
      // the contract: IllegalArgumentException (the loud require) or a
      // successful decode whose sample count fits the REAL payload —
      // anything else (ArrayIndexOutOfBounds, hang, negative count)
      // fails the property
      try {
        val st = MultimodalOps.decodePcmBytes(7L, b)
        assert(st.n_samples >= 0 && 44 + 2 * st.n_samples <= b.length,
          s"decoded past the payload: n=${st.n_samples} len=${b.length}")
      } catch {
        case _: IllegalArgumentException => // loud, expected
      }
    }
  }

  test("raw-video frame decode under mdat corruption: whole frames or loud failure") {
    import graft.operators.MultimodalOps
    val ids = sample(Gen.listOfN(60, Gen.choose(0L, 5000L)))
    ids.foreach { id =>
      val base = MultimodalOps.mp4RawVideo(id)
      val (w, h) = MultimodalOps.rawDims(id)
      val fb = w * h
      val mutations: Seq[Array[Byte]] = Seq(
        base, // untouched — must decode all frames
        base.take(base.length - 1), // torn final frame
        base.take(base.length - fb), // exactly one frame shorter: box
        // sizes now lie about the payload — the walk must fail loudly
        { val b = base.clone(); b(0) = 0x7f.toByte; b }, // ftyp size lies
        base.take(20) // not even a whole box tree
      )
      mutations.foreach { b =>
        try {
          val stats = MultimodalOps.decodeRawFramesBytes(id, b)
          // success ⇒ the payload really held whole frames and every
          // stat is in-range
          assert(stats.nonEmpty)
          assert(stats.forall(s => s.px_min >= 0 && s.px_max <= 255 &&
            s.px_sum >= 0L && s.px_sum <= 255L * fb))
        } catch {
          case _: IllegalArgumentException => // loud, expected
        }
      }
    }
  }

  test("fixed-point PageRank: no Long wraparound under adversarial edge weights (vs BigInt)") {
    import spark.implicits._
    import graft.operators.GraphOps
    // adversarial graph: one edge carries ~2^30 mass (the raw
    // ((r·85)//100·w)//wout form would compute r·0.85·2^30 ≈ 2^60..2^63
    // intermediates and wrap on the heavier nodes); plus a random
    // background graph with weights up to 2^20
    val rnd = new scala.util.Random(11)
    val heavy = Seq((0L, 1L, 1L << 30), (1L, 0L, 1L << 28))
    val background = Seq.fill(60)(
      (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong,
        1L + rnd.nextInt(1 << 20).toLong)).filter { case (a, b, _) => a != b }
    val edges = (heavy ++ background)
      .groupBy(e => (e._1, e._2)).map { case ((s0, d0), es) =>
        (s0, d0, es.map(_._3).sum) }.toSeq
    val iters = 5

    // driver-side BigInt reference: same formula, arbitrary precision —
    // any Long wraparound in the distributed kernel shows up as a diff
    val fracOne = BigInt(GraphOps.FRAC_ONE)
    val wout = edges.groupBy(_._1)
      .map { case (s0, es) => s0 -> BigInt(es.map(_._3).sum) }
    val ew = edges.map { case (s0, d0, w) =>
      (s0, d0, (BigInt(w) * fracOne) / wout(s0)) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var r = nodes.map(_ -> BigInt(1000000000L)).toMap
    for (_ <- 0 until iters) {
      val inc = ew.groupBy(_._2).map { case (d0, es) =>
        d0 -> es.map { case (s0, _, wf) =>
          (r(s0) * 85 / 100 * wf) / fracOne }.sum
      }
      r = nodes.map(n => n -> (BigInt(150000000L) +
        inc.getOrElse(n, BigInt(0)))).toMap
    }

    val got = GraphOps.pagerankRanks(
      edges.toDF("src", "dst", "w"), iters)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got.keySet === r.keySet)
    got.foreach { case (id, v) =>
      assert(BigInt(v) === r(id),
        s"node $id: Long kernel $v != BigInt reference ${r(id)}")
      assert(v > 0L, s"node $id wrapped negative")
    }
  }
}
