package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization semantics the DuckDB hash gate cannot check:
  * the defining ADC identity (asymmetric distance to a CODE equals
  * exact distance to the RECONSTRUCTED vector — if this breaks, "ADC
  * scanning" is not scanning what the math says), and the end-to-end
  * retrieval property: ADC candidates recall most exact neighbors at
  * a fraction of the corpus, far above random.
  */
class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  // one training + encoding pass shared by both tests
  private lazy val fixture: (Map[(Int, Int), Array[Long]],
      Map[Long, Array[Int]], Map[Long, Array[Long]]) = {
    val books = PqOps.codebooks(spark, sf)
    val cents = books.flatMap { case (m, cs) =>
      cs.map { case (cl, c) => (m, cl) -> c } }.toMap
    val enc: Map[Long, Array[Int]] = PqOps.encoded(spark, sf, books)
      .select("vec_id", "m", "cl").collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.map(r => r.getInt(1) -> r.getInt(2))
          .sortBy(_._1).map(_._2) }
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id",
        s"transform(embedding, x -> CAST(round(x*${PqOps.SCALE}) AS BIGINT)) AS e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    (cents, enc, vecs)
  }

  private def d2(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def adc(cents: Map[(Int, Int), Array[Long]],
                  enc: Map[Long, Array[Int]],
                  q: Array[Long], id: Long): Long =
    (0 until PqOps.M).map { m =>
      d2(q.slice(m * PqOps.SUBD, (m + 1) * PqOps.SUBD),
        cents((m, enc(id)(m))))
    }.sum

  test("ADC identity: distance-to-code == distance-to-reconstruction, exactly") {
    val (cents, enc, vecs) = fixture
    val ids = vecs.keys.toSeq.sorted
    def recon(id: Long): Array[Long] =
      (0 until PqOps.M).flatMap(m => cents((m, enc(id)(m)))).toArray
    // every (query, target) pair over a deterministic sample — the
    // identity is algebraic, so ONE violation means a mis-sliced
    // subspace or mis-indexed codebook
    for (q <- ids.take(10); x <- ids.take(50))
      assert(adc(cents, enc, vecs(q), x) === d2(vecs(q), recon(x)),
        s"ADC($q,$x) diverged from the reconstruction distance")
  }

  test("ADC candidates recall exact neighbors far above random") {
    val (cents, enc, vecs) = fixture
    val ids = vecs.keys.toSeq.sorted
    val cand = 100
    val recalls = ids.take(20).map { q =>
      val exact = ids.filter(_ != q)
        .sortBy(x => (d2(vecs(q), vecs(x)), x)).take(10).toSet
      val c = ids.filter(_ != q)
        .sortBy(x => (adc(cents, enc, vecs(q), x), x)).take(cand).toSet
      (exact & c).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    // measured 0.78 mean / 0.50 min at K=16, ITERS=3; random
    // candidates of this size would recall cand/N = 100/500 = 0.20
    val random = cand.toDouble / ids.size
    assert(mean >= 0.55, f"mean recall@10 $mean%.3f below bound")
    assert(recalls.min >= 0.3, f"worst query recall ${recalls.min}%.3f")
    assert(mean > 2 * random,
      f"ADC ($mean%.3f) must beat random candidates ($random%.3f) by 2x")
  }

  test("composed IVF-PQ serving: distributed result equals the driver-side replay") {
    // q159's full pipeline (coarse probe → ADC over stored codes →
    // exact rerank of the shortlist) re-derived here with plain Scala
    // over the collected fixture: if the DataFrame composition drops a
    // candidate list, mis-joins a code, or reranks by the wrong
    // distance, the two disagree.
    val (cents, enc, vecs) = fixture
    val ids = vecs.keys.toSeq.sorted
    val coarse = ids.take(16)
    def nearestCent(x: Long): Long =
      coarse.minBy(c => (d2(vecs(x), vecs(c)), c))
    val queries = ids.filter(_ % 50 == 0)
    val expected = queries.flatMap { q =>
      val probes = coarse.sortBy(c => (d2(vecs(q), vecs(c)), c)).take(4)
        .toSet
      val cand = ids.filter(x => x != q && probes(nearestCent(x)))
      val shortlist = cand
        .sortBy(x => (adc(cents, enc, vecs(q), x), x)).take(10)
      shortlist.sortBy(x => (d2(vecs(q), vecs(x)), x)).take(3)
        .zipWithIndex.map { case (x, i) =>
          (q, i + 1, x, d2(vecs(q), vecs(x))) }
    }.toSet
    val got = graft.SparkEntry.queries("q159_ivf_pq_serving")(spark, sf)
      .select("q_id", "rk", "vec_id", "exact_d2").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected,
      "the distributed IVF-PQ serving path must equal the serial replay")
  }
}
