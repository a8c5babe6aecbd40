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

  test("q83 PNG decode fails loudly (no hang) when the deflate stream runs dry") {
    // drop the second IDAT chunk wholesale: every remaining chunk keeps
    // a valid CRC, so the walk succeeds, but the inflater runs dry
    // mid-pixel — inflate() returns 0 with needsInput forever, and
    // without the stall exit the decode loop would spin, not fail
    val png = MultimodalOps.encodePng(7L)
    def beInt(off: Int) =
      java.nio.ByteBuffer.wrap(png, off, 4).getInt
    var off = 8
    var idat1End = -1
    var iendStart = -1
    while (iendStart < 0) {
      val len = beInt(off)
      val typ = new String(png, off + 4, 4, "US-ASCII")
      if (typ == "IDAT" && idat1End < 0) idat1End = off + 12 + len
      if (typ == "IEND") iendStart = off
      off += 12 + len
    }
    val oneIdat = png.take(idat1End) ++ png.drop(iendStart)
    val done = new java.util.concurrent.CompletableFuture[Throwable]()
    val t = new Thread(() => done.complete(
      intercept[IllegalArgumentException] {
        MultimodalOps.decodePngBytes(oneIdat)
      }))
    t.setDaemon(true); t.start()
    val e = done.get(10, java.util.concurrent.TimeUnit.SECONDS)
    assert(e.getMessage.contains("truncated pixel stream"))
  }

  test("Scratch dirs share one per-app root under tmpdir (bounded /tmp residue)") {
    val a = graft.sources.Scratch.dir(spark, "spec-tag-a")
    val b = graft.sources.Scratch.dir(spark, "spec-tag-b")
    assert(a !== b)
    val pa = new java.io.File(a).getParentFile
    assert(pa === new java.io.File(b).getParentFile,
      "all tags must live under the single shutdown-hooked root")
    assert(pa.exists() && pa.isDirectory)
    assert(pa.getName ===
      "graft-scratch-" + spark.sparkContext.applicationId)
    assert(pa.getParentFile.getAbsolutePath ===
      new java.io.File(sys.props("java.io.tmpdir")).getAbsolutePath)
  }
}
