package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-6 operators — cross-row and semantic
  * properties the per-query DuckDB hash-match can't state.
  */
class Round6OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  // ── q83: real PNG decode ────────────────────────────────────────────────

  test("q83 PNG round trip: decoded pixels equal the generating formula exactly") {
    // every (row, col, channel) byte — not just the aggregates — must
    // survive encode → deflate → chunk → inflate → unfilter; ids chosen
    // so (w, h) covers the full 8..16 × 6..16 parameter grid
    for (id <- 0L until 99L by 3L) {
      val (w, h, rows) = MultimodalOps.decodePngBytes(MultimodalOps.encodePng(id))
      assert((w, h) === (8 + (id % 9).toInt, 6 + (id % 11).toInt))
      for (r <- 0 until h; c <- 0 until w; ch <- 0 until 3) {
        val expect = ((id * 7 + r * 5 + c * 3 + ch * 11) % 256).toInt
        assert((rows(r)(c * 3 + ch) & 0xff) === expect,
          s"id=$id pixel ($r,$c,$ch)")
      }
    }
  }

  test("q83 PNG decode is partition-invariant") {
    val media = MultimodalOps.pngImageTable(spark, sf)
    val one = MultimodalOps.decodePng(media.repartition(1))
      .collect().map(_.toString).sorted.toSeq
    val many = MultimodalOps.decodePng(media.repartition(13))
      .collect().map(_.toString).sorted.toSeq
    assert(one === many)
    assert(one.nonEmpty)
  }

  test("q83 PNG decode fails loudly on corruption, never silently") {
    val png = MultimodalOps.encodePng(42L)
    // flip one byte inside the first IDAT chunk's data: CRC must catch it
    val idatData = png.length / 2 // lands inside the deflated stream
    val corrupt = png.clone()
    corrupt(idatData) = (corrupt(idatData) ^ 0x5a).toByte
    val e1 = intercept[IllegalArgumentException] {
      MultimodalOps.decodePngBytes(corrupt)
    }
    assert(e1.getMessage.contains("CRC"))
    // truncated payload: chunk walk must not read out of bounds
    intercept[IllegalArgumentException] {
      MultimodalOps.decodePngBytes(png.take(png.length - 7))
    }
    // not a PNG at all
    intercept[IllegalArgumentException] {
      MultimodalOps.decodePngBytes("definitely not a png".getBytes)
    }
  }
}
