package graft.sources

import java.io.IOException
import java.nio.{ByteBuffer, ByteOrder}

/** Deletion-vector byte formats for Delta interop, implemented from
  * the PUBLISHED specs with no Delta/RoaringBitmap jars:
  *
  *   - Z85 (ZeroMQ Base85, RFC 32/Z85): the text encoding Delta uses
  *     for inline DVs and DV-file UUIDs — 4 bytes → 5 chars over a
  *     fixed 85-char alphabet.
  *   - RoaringBitmapArray "portable" serialization (Delta
  *     PROTOCOL.md "Deletion Vector Format" + the RoaringFormatSpec):
  *     magic 1681511377 (int32 LE), number of 32-bit bitmaps
  *     (int64 LE), then each 32-bit bitmap in the standard portable
  *     format — cookie 12346 (no run containers, + int32 container
  *     count) or 12347 (run flag bitset, count−1 in the cookie's high
  *     16 bits), descriptive headers (uint16 key, uint16 card−1),
  *     optional offset header (skipped — containers parse
  *     sequentially), then array (sorted uint16s) / bitmap (1024
  *     uint64 words) / run (uint16 n, then start/length pairs)
  *     containers. Bitmap i's values live at
  *     i·2³² + key·2¹⁶ + low16.
  *
  * The ENCODER emits the no-run-container shape with array/bitmap
  * containers only — always-legal portable output any conforming
  * reader accepts; the DECODER accepts all three container kinds and
  * both cookies. Honesty note (the IcebergLite discipline): no Delta
  * runtime exists in this container, so spec tests read what this
  * encoder wrote; byte layout follows the published spec text, but
  * cross-implementation agreement is asserted against the spec, not
  * a live Delta engine.
  */
object RoaringDv {

  // ── Z85 ────────────────────────────────────────────────────────────

  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Rev: Array[Int] = {
    val r = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => r(c.toInt) = i }
    r
  }

  /** Encode bytes (length padded to a multiple of 4 with zeros — the
    * caller records the true length, e.g. `sizeInBytes`). */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ new Array[Byte](4 - bytes.length % 4)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      var k = 4
      val chunk = new Array[Char](5)
      while (k >= 0) { chunk(k) = Z85.charAt((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  /** Decode to exactly `n` bytes (dropping the zero padding). */
  def z85Decode(s: String, n: Int): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 text length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Rev(c.toInt) else -1
        if (d < 0) throw new IOException(s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      val base = i / 5 * 4
      while (k >= 0) { out(base + k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
      i += 5
    }
    require(n <= out.length, s"z85 payload shorter than declared $n bytes")
    java.util.Arrays.copyOfRange(out, 0, n)
  }

  // ── RoaringBitmapArray portable ────────────────────────────────────

  private val MAGIC = 1681511377
  private val COOKIE_NO_RUN = 12346
  private val COOKIE_RUN = 12347

  /** Decode a serialized RoaringBitmapArray to its sorted values. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt()
    if (magic != MAGIC)
      throw new IOException(s"deletion vector magic $magic != $MAGIC " +
        "— not a portable RoaringBitmapArray; refusing rather than " +
        "misreading positions")
    val nBitmaps = bb.getLong()
    if (nBitmaps < 0 || nBitmaps > Int.MaxValue)
      throw new IOException(s"implausible bitmap count $nBitmaps")
    val out = Array.newBuilder[Long]
    var bi = 0L
    while (bi < nBitmaps) {
      val high = bi << 32
      decodeBitmap32(bb, v => out += (high | (v & 0xffffffffL)))
      bi += 1
    }
    out.result()
  }

  /** One 32-bit roaring bitmap in portable format, values ascending. */
  private def decodeBitmap32(bb: ByteBuffer, emit: Long => Unit): Unit = {
    val cookie = bb.getInt()
    val (nContainers, runFlags: Array[Boolean]) =
      if ((cookie & 0xffff) == COOKIE_RUN) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Boolean](n)
        val bytes = new Array[Byte]((n + 7) / 8)
        bb.get(bytes)
        var i = 0
        while (i < n) {
          flags(i) = (bytes(i / 8) & (1 << (i % 8))) != 0
          i += 1
        }
        (n, flags)
      } else if (cookie == COOKIE_NO_RUN) {
        val n = bb.getInt()
        (n, new Array[Boolean](n))
      } else
        throw new IOException(s"unknown roaring cookie $cookie — " +
          "newer serialization than this reader; refusing")
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = bb.getShort() & 0xffff
      cards(i) = (bb.getShort() & 0xffff) + 1
      i += 1
    }
    // offset header present for cookie 12346 always, and for 12347
    // when >= 4 containers; containers are sequential so we skip it
    if ((cookie & 0xffff) == COOKIE_NO_RUN || nContainers >= 4)
      bb.position(bb.position() + 4 * nContainers)
    i = 0
    while (i < nContainers) {
      val base = keys(i).toLong << 16
      if (runFlags(i)) {
        val nRuns = bb.getShort() & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort() & 0xffff
          val len = bb.getShort() & 0xffff
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var c = 0
        while (c < cards(i)) { emit(base | (bb.getShort() & 0xffff)); c += 1 }
      } else {
        var w = 0
        while (w < 1024) {
          val word = bb.getLong()
          var bit = 0
          while (bit < 64) {
            if ((word & (1L << bit)) != 0) emit(base | (w * 64 + bit))
            bit += 1
          }
          w += 1
        }
      }
      i += 1
    }
  }

  /** Encode sorted distinct non-negative values as a portable
    * RoaringBitmapArray (no-run-container shape; array or bitmap
    * containers by the 4096-cardinality rule). */
  def encode(values: Array[Long]): Array[Byte] = {
    require(values.forall(_ >= 0), "deletion positions must be >= 0")
    val sorted = values.distinct.sorted
    val byHigh = sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val nBitmaps = byHigh.lastOption.map(_._1 + 1).getOrElse(0L)
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le64(v: Long): Unit = { le32(v.toInt); le32((v >> 32).toInt) }
    le32(MAGIC)
    le64(nBitmaps)
    val perHigh = byHigh.toMap
    var hi = 0L
    while (hi < nBitmaps) {
      val vals32 = perHigh.getOrElse(hi, Array.empty[Long])
        .map(v => (v & 0xffffffffL).toInt)
      val byKey = vals32.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      le32(COOKIE_NO_RUN)
      le32(byKey.size)
      byKey.foreach { case (k, vs) => le16(k); le16(vs.length - 1) }
      // offset header (cookie 12346 requires it)
      var off = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, vs) =>
        le32(off)
        off += (if (vs.length <= 4096) 2 * vs.length else 8192)
      }
      byKey.foreach { case (_, vs) =>
        if (vs.length <= 4096) vs.foreach(v => le16(v & 0xffff))
        else {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val low = v & 0xffff
            words(low / 64) |= 1L << (low % 64)
          }
          words.foreach(le64)
        }
      }
      hi += 1
    }
    bos.toByteArray
  }
}
