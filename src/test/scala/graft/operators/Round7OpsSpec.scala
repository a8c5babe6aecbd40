package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 semantic edges, proven generatively:
  *
  *  - the banded interval-overlap join (q113's kernel) equals a brute-
  *    force overlap join on adversarial random intervals — including
  *    zero-length intervals and bounds EXACTLY on band edges, where an
  *    off-by-one in the half-open banding would double-count or miss.
  */
class Round7OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, rng.Seed(7L)).get

  test("banded overlap join == brute force on boundary-adversarial intervals") {
    import spark.implicits._
    val W = 1000L
    // bounds cluster on band edges (multiples of W) and their ±1
    // neighbours — the exact places a banding off-by-one shows up
    // negative band indices included: truncating integer division
    // disagrees with floor exactly there, so a div/floor mixup in the
    // banding shows up as missed overlaps below zero
    val bound: Gen[Long] = for {
      k <- Gen.choose(-20L, 20L)
      jitter <- Gen.oneOf(Gen.oneOf(-1L, 0L, 1L), Gen.choose(2L, W - 2))
    } yield k * W + jitter
    val interval: Gen[(Long, Long, Long)] = for {
      user <- Gen.choose(0L, 5L)
      lo <- bound
      len <- Gen.oneOf(Gen.const(0L), Gen.const(1L), Gen.const(W),
        Gen.choose(0L, 3 * W))
    } yield (user, lo, lo + len)

    val as = sample(Gen.listOfN(300, interval)).zipWithIndex
      .map { case ((u, lo, hi), i) => (i.toLong, u, lo, hi) }
    val bs = sample(Gen.listOfN(300, interval)).zipWithIndex
      .map { case ((u, lo, hi), i) => (1000L + i, u, lo, hi) }

    val aDf = as.toDF("signup_id", "user_id", "a0", "a1")
    val bDf = bs.toDF("b_id", "user_id", "b0", "b1")
    val banded = TemporalOps.overlapJoinBanded(aDf, bDf, W)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val brute = as.map { case (aid, au, a0, a1) =>
      aid -> bs.count { case (_, bu, b0, b1) =>
        bu == au && a0 < b1 && b0 < a1
      }.toLong
    }.toMap

    assert(banded.keySet === brute.keySet, "every A interval reported once")
    val diff = brute.filter { case (k, v) => banded(k) != v }
    assert(diff.isEmpty,
      s"banded != brute force for: ${diff.take(5)}")
    assert(brute.values.sum > 0, "the corpus must contain real overlaps")
  }
}
