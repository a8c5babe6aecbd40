package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{QueryDef, Tables}

/** Multimodal-column plumbing for the training-data pipeline tier.
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct — the columnar representation that scales (parquet stores the
  * bytes contiguously; metadata predicates prune without touching
  * payloads). Decode/feature-extraction runs per partition over iterator
  * batches (the Scala analogue of the Python mapInPandas batch shape):
  * the partitioning, schema, and batch plumbing here are real and tested.
  * The audio path is fully real — WAV/PCM decode is pure byte arithmetic
  * (`decodePcm`, q78) — and so is PNG: inflate is JDK-only
  * (java.util.zip.Inflater) and scanline unfiltering is byte arithmetic
  * (`decodePng`, q83) and JPEG: the JDK's javax.imageio carries a full
  * software JPEG codec (`decodeJpeg`, q98) — and RAW video: frames
  * slice straight out of the MP4 mdat (`decodeRawFrames`, q112) — and
  * COMPRESSED video: Motion-JPEG frames decode through the same JDK
  * codec (`decodeMjpeg`, q233). Only INTER-coded entropy decode
  * (H.264/H.265) remains a STUB (no such codec exists in the JDK or
  * this container) — a deterministic hash-based fake, clearly marked.
  */
object MultimodalOps {

  /** A media row: payload + typed metadata. */
  final case class MediaRow(item_id: Long, kind: String, media: Array[Byte],
                            width: Int, height: Int, sample_rate: Int)

  /** Extracted features per item. */
  final case class MediaFeatures(item_id: Long, kind: String, n_bytes: Int,
                                 checksum: Long, features: Array[Float])

  /** Synthesize a media table from `documents` (text bytes as payload) —
    * deterministic stand-in for real image/audio blobs; exercises the
    * exact schema/partitioning a real pipeline would use. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("item_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("media"),
      (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
      (pmod(col("doc_id"), lit(4)) * 90 + 180).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(0)
        .cast("int").as("sample_rate"))

  /** STUB — INTER-coded video entropy decode only (H.264/H.265 motion
    * compensation + CABAC, which genuinely needs a codec library this
    * container lacks). A real deployment swaps this body for the codec;
    * everything around it (schema, iterator batching, partition
    * parallelism) is the production shape. Deterministic: features
    * derive from payload bytes. Every other modality decodes for REAL:
    * audio via `decodePcm` (q78), images via `decodePng` (inflate +
    * unfilter, q83) and `decodeJpeg` (JDK codec, q98), RAW video via
    * `decodeRawFrames` (mdat slicing off tkhd dims, q112), and
    * COMPRESSED video via `decodeMjpeg` (Motion-JPEG frames through
    * the JDK JPEG codec, q233). */
  private def decodeStub(media: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var acc = 1125899906842597L // FNV-ish rolling hash, deterministic
    var i = 0
    while (i < media.length) {
      acc = acc * 31 + (media(i) & 0xff)
      out(math.floorMod(i, dims)) += ((acc >>> 32) % 1000L) / 1000.0f
      i += 1
    }
    out
  }

  /** Per-partition feature extraction over the media table — iterator in,
    * iterator out, no driver involvement; repartition by item_id spreads
    * payload bytes evenly ahead of the CPU-bound decode. The payload
    * checksum is the engine-portable md5 derivation (Hashing.md5Long60),
    * so aggregate views over it are DuckDB-oracle-checkable. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dims: Int = 16,
                      partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val parted =
      if (partitions > 0) media.repartition(partitions, col("item_id")) else media
    parted.select("item_id", "kind", "media").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          val feats = decodeStub(bytes, dims)
          MediaFeatures(id, kind, bytes.length,
            graft.functions.Hashing.md5Long60(bytes), feats)
        }
      }
  }

  /** Resize plumbing for visual media (image/video): the metadata
    * transform is real (target width/height land in the schema, audio
    * rows pass through untouched); the payload transform is a STUB —
    * deterministic byte sampling proportional to the area ratio, standing
    * in for decode→scale→encode (no codecs in this container). Runs per
    * partition over iterator batches like extractFeatures — the exact
    * shape a Pandas-UDF/mapInPandas resize stage has in production. */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.select("item_id", "kind", "media", "width", "height", "sample_rate")
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          if (r.kind == "audio" || r.media.isEmpty)
            r.copy(width = if (r.kind == "audio") r.width else targetW,
              height = if (r.kind == "audio") r.height else targetH)
          else {
            val ratio = math.max(1.0,
              (r.width.toLong * r.height).toDouble / (targetW.toLong * targetH))
            val outLen = math.max(1, math.ceil(r.media.length / ratio).toInt)
            val out = new Array[Byte](outLen)
            var i = 0
            while (i < outLen) { // stub: stride-sample the payload bytes
              out(i) = r.media(math.min(r.media.length - 1, (i * ratio).toInt))
              i += 1
            }
            r.copy(media = out, width = targetW, height = targetH)
          }
        }
      }
  }

  /** Frame sampling plumbing: for video items, emit one row per sampled
    * frame index (every `stride`th of `nFrames`) — the explode shape a
    * real frame-grab would use; payload decode stays stubbed. */
  def sampleFrames(media: DataFrame, nFrames: Int = 16, stride: Int = 4): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("item_id"), col("width"), col("height"),
        explode(sequence(lit(0), lit(nFrames - 1), lit(stride))).as("frame_idx"))

  // ── REAL header codec: byte-level container parsing, no libraries ──────
  // The innermost signal decode stays stubbed (no codecs in the
  // container), but container-header parsing needs none: magic numbers,
  // endianness and field offsets are pure byte arithmetic. Payloads are
  // synthesized with REAL headers (PNG signature + IHDR, RIFF/WAVE fmt
  // chunk, MP4 ftyp box), then q60 recovers the metadata from the BYTES
  // and checks it against the declared columns — if the parser's
  // endianness or offsets were wrong, the match counts would miss the
  // oracle's formula-derived answer.

  private def beInt(v: Int): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def leInt(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def leShort(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def readBeInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def readLeInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private val PNG_SIG = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** PNG signature + IHDR chunk (width/height big-endian at offsets
    * 16/20; 8-bit RGB, no interlace; CRC left zero — parsing only). */
  private[operators] def pngHeader(w: Int, h: Int): Array[Byte] =
    PNG_SIG ++ beInt(13) ++ "IHDR".getBytes("US-ASCII") ++ beInt(w) ++
      beInt(h) ++ Array[Byte](8, 2, 0, 0, 0) ++ beInt(0)

  /** Canonical 44-byte RIFF/WAVE header; sample rate little-endian at
    * offset 24 (PCM mono 16-bit). */
  private[graft] def wavHeader(rate: Int, dataLen: Int): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ leInt(36 + dataLen) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      leInt(16) ++ leShort(1) ++ leShort(1) ++ leInt(rate) ++
      leInt(rate * 2) ++ leShort(2) ++ leShort(16) ++
      "data".getBytes("US-ASCII") ++ leInt(dataLen)

  /** Minimal MP4 `ftyp` box (size 16, brand mp42). */
  private[operators] def mp4Header(): Array[Byte] =
    beInt(16) ++ "ftypmp42".getBytes("US-ASCII") ++ beInt(0)

  /** Media table whose payloads carry REAL container headers ahead of
    * the (stub) signal bytes. */
  def headeredMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].map { r =>
      val hdr = r.kind match {
        case "image" => pngHeader(r.width, r.height)
        case "audio" => wavHeader(r.sample_rate, r.media.length)
        case _ => mp4Header()
      }
      r.copy(media = hdr ++ r.media)
    }
  }

  // ── REAL audio decode: WAV/PCM needs no codec library ─────────────────
  // A WAV payload is a 44-byte header plus raw little-endian int16
  // frames — decoding it is pure byte arithmetic, so the audio path is
  // NOT stubbed: q78's per-item stats come from parsing every sample
  // byte. The synthesized signal is a deterministic square wave whose
  // parameters derive from doc_id, giving every stat an integer
  // closed form the DuckDB oracle states independently — a wrong
  // endianness, sign extension, or data offset in the decoder breaks
  // the hash match.

  /** Square-wave parameters for an audio item: (#samples, amplitude,
    * half-period). All small integers; amp stays within int16. */
  private def waveParams(id: Long): (Int, Int, Int) =
    (64 + (id % 64).toInt, 1000 + (id % 7).toInt * 4000, 4 + (id % 9).toInt)

  /** Audio items whose payloads carry a REAL RIFF/WAVE header plus REAL
    * 16-bit little-endian PCM sample bytes. */
  def pcmAudioTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id")).as[Long].map { id =>
        val (n, amp, p) = waveParams(id)
        val pcm = new Array[Byte](2 * n)
        var i = 0
        while (i < n) {
          val s = if ((i / p) % 2 == 0) amp else -amp
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        MediaRow(id, "audio", wavHeader(16000, 2 * n) ++ pcm, 0, 0, 16000)
      }
  }

  final case class PcmStats(item_id: Long, sample_rate: Int, n_samples: Int,
                            peak: Int, sum_sq: Long, n_zero_cross: Int,
                            rms: Double)

  /** Parse a RIFF/WAVE payload to (sample_rate, sign-extended int16
    * samples). The sample count is clamped to the REAL payload size —
    * a malformed (or negative) data-chunk length can never index past
    * the array; a payload too short for the header fails the require
    * loudly. Shared by the full decode and the decimating
    * frame-sampler. */
  private[graft] def pcmSamples(itemId: Long,
                                b: Array[Byte]): (Int, Array[Int]) = {
    require(b.length >= 44 && b.startsWith("RIFF".getBytes("US-ASCII")) &&
      b.slice(8, 12).sameElements("WAVE".getBytes("US-ASCII")),
      s"item $itemId: not a RIFF/WAVE payload")
    val rate = readLeInt(b, 24)
    val n = math.max(0, math.min(readLeInt(b, 40) / 2, (b.length - 44) / 2))
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((b(45 + 2 * i) << 8) | (b(44 + 2 * i) & 0xff)).toShort.toInt
      i += 1
    }
    (rate, out)
  }

  /** Fold samples into energy / peak / zero-crossing stats. */
  private def pcmStatsOf(itemId: Long, rate: Int,
                         samples: Array[Int]): PcmStats = {
    var i = 0
    var sumSq = 0L
    var peak = 0
    var zc = 0
    var prev = 0
    val n = samples.length
    while (i < n) {
      val s = samples(i)
      sumSq += s.toLong * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && ((s > 0 && prev < 0) || (s < 0 && prev > 0))) zc += 1
      prev = s
      i += 1
    }
    PcmStats(itemId, rate, n, peak, sumSq, zc,
      if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n))
  }

  /** The inner WAV decode: header parse + stats fold (see pcmSamples).
    * Static so KernelPropSpec can fuzz it directly with corrupted
    * headers: any payload either decodes within bounds or fails the
    * require loudly; no input reads out of bounds or hangs. */
  private[graft] def decodePcmBytes(itemId: Long, b: Array[Byte]): PcmStats = {
    val (rate, samples) = pcmSamples(itemId, b)
    pcmStatsOf(itemId, rate, samples)
  }

  /** Loudness-invariant band fingerprint over REAL decoded PCM (q246):
    * `windows` equal time slices, signed sample sum per slice, one bit
    * per adjacent pair (sum strictly rises → 1), packed LSB-first from
    * bit 0 = window 1 vs 0. Window of sample i is (i·W)/n — the same
    * integer boundary the oracle states. Positive gain scales every
    * sum equally, so the comparisons are invariant to volume. */
  private[graft] def pcmBandFingerprint(itemId: Long, b: Array[Byte],
                                        windows: Int): Long = {
    val (_, samples) = pcmSamples(itemId, b)
    val n = samples.length
    require(n >= windows, s"item $itemId: $n samples < $windows windows")
    val sums = new Array[Long](windows)
    var i = 0
    while (i < n) {
      sums((i.toLong * windows / n).toInt) += samples(i)
      i += 1
    }
    var fp = 0L
    var w = 1
    while (w < windows) {
      if (sums(w) > sums(w - 1)) fp |= 1L << (w - 1)
      w += 1
    }
    fp
  }

  /** Decode PCM frames per partition — iterator in, iterator out, the
    * same batch shape as extractFeatures, but with a REAL inner decode
    * (see decodePcmBytes). */
  def decodePcm(media: Dataset[MediaRow]): Dataset[PcmStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(r => decodePcmBytes(r.item_id, r.media))
    }
  }

  /** Temporal frame-sampling — keep every `stride`-th REAL decoded
    * sample, then the same stats fold. This is the decimation shape of
    * video frame-sampling (sample every k-th frame, process the kept
    * ones): per-row byte work, zero shuffle, and the output rate is
    * the input rate / stride. The effective sample rate is reported so
    * downstream consumers see the decimated clock. */
  def decimatePcm(media: Dataset[MediaRow], stride: Int): Dataset[PcmStats] = {
    require(stride >= 1, "stride must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (rate, samples) = pcmSamples(r.item_id, r.media)
        val kept = Array.range(0, samples.length, stride).map(samples)
        pcmStatsOf(r.item_id, rate / stride, kept)
      }
    }
  }

  final case class ResizeStats(item_id: Long, out_w: Int, out_h: Int,
                               n_values: Long, sum_val: Long,
                               weighted_sum: Long, min_val: Int, max_val: Int)

  /** 2×2 box downsample over REAL decoded PNG pixels — the resize of
    * the multimodal brief, on the actual inflated/unfiltered bytes
    * (odd trailing row/column dropped, the floor-dims convention).
    * Integer mean (sum/4) per output value keeps the oracle exact. Per
    * row: decode + one pass over the pixel grid; no shuffle anywhere —
    * the 100 TB shape is pure map-side work behind the parquet scan. */
  def downsamplePng(media: Dataset[MediaRow]): Dataset[ResizeStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (w, h, rows) = decodePngBytes(r.media)
      val (w2, h2) = (w / 2, h / 2)
      var sum = 0L
      var wsum = 0L
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var rr = 0
      while (rr < h2) {
        var cc = 0
        while (cc < w2) {
          var ch = 0
          while (ch < 3) {
            val v = ((rows(2 * rr)(2 * cc * 3 + ch) & 0xff) +
              (rows(2 * rr)((2 * cc + 1) * 3 + ch) & 0xff) +
              (rows(2 * rr + 1)(2 * cc * 3 + ch) & 0xff) +
              (rows(2 * rr + 1)((2 * cc + 1) * 3 + ch) & 0xff)) / 4
            sum += v
            val idx = (rr * w2 + cc) * 3 + ch
            wsum += v.toLong * (1 + idx % 31)
            if (v < mn) mn = v
            if (v > mx) mx = v
            ch += 1
          }
          cc += 1
        }
        rr += 1
      }
      val n = 3L * w2 * h2
      ResizeStats(r.item_id, w2, h2, n, sum, wsum,
        if (n == 0) 0 else mn, if (n == 0) 0 else mx)
    })
  }

  // ── REAL image decode: PNG needs no codec library ──────────────────────
  // A PNG is zlib-deflated, per-scanline-filtered RGB bytes inside
  // CRC-guarded chunks. Inflate ships with the JDK
  // (java.util.zip.Inflater) and the five scanline filters
  // (None/Sub/Up/Average/Paeth) are byte arithmetic — so the image path
  // is NOT stubbed: q83's per-item stats come from inflated, unfiltered
  // pixel bytes. The synthesized pixels follow a closed-form formula of
  // (doc_id, row, col, channel), the encoder cycles the filter type per
  // scanline (r % 5 hits all five), splits the stream across two IDAT
  // chunks, and writes real CRC32s — so a wrong inflate, filter
  // reconstruction, chunk walk, or CRC check breaks the oracle's
  // formula-derived hash match.

  /** Image dimensions for an item: 8..16 × 6..16 (h ≥ 6 guarantees every
    * filter type 0..4 appears via the r % 5 cycle). */
  private def pngParams(id: Long): (Int, Int) =
    (8 + (id % 9).toInt, 6 + (id % 11).toInt)

  /** Closed-form pixel value: the oracle restates this formula in SQL. */
  private def pixelValue(id: Long, r: Int, c: Int, ch: Int): Int =
    ((id * 7 + r * 5 + c * 3 + ch * 11) % 256).toInt

  /** PNG Paeth predictor (per the spec: nearest of left/up/up-left to
    * the linear estimate a + b − c, ties preferring a then b). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** One complete chunk: length + type + data + CRC32 over type‖data. */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val tb = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    beInt(data.length) ++ tb ++ data ++ beInt(crc.getValue.toInt)
  }

  /** Encode a REAL 8-bit RGB PNG for an item: formula pixels, filter
    * type cycling r % 5 (encoding the genuine Sub/Up/Average/Paeth
    * deltas), zlib deflate, and the deflated stream split across TWO
    * IDAT chunks so the decoder's multi-IDAT concatenation is load-
    * bearing. */
  private[operators] def encodePng(id: Long): Array[Byte] = {
    val (w, h) = pngParams(id)
    val raw = Array.ofDim[Byte](h, w * 3)
    for (r <- 0 until h; c <- 0 until w; ch <- 0 until 3)
      raw(r)(c * 3 + ch) = pixelValue(id, r, c, ch).toByte
    encodePngPixels(raw)
  }

  /** Encode an arbitrary 8-bit RGB grid (rows of w*3 bytes) — split
    * from encodePng so KernelPropSpec can round-trip random images,
    * not just the formula family. */
  private[graft] def encodePngPixels(raw: Array[Array[Byte]]): Array[Byte] = {
    val h = raw.length
    val bpl = raw(0).length
    val w = bpl / 3
    val filtered = new Array[Byte](h * (bpl + 1))
    for (r <- 0 until h) {
      val f = r % 5
      filtered(r * (bpl + 1)) = f.toByte
      for (i <- 0 until bpl) {
        val x = raw(r)(i) & 0xff
        val a = if (i >= 3) raw(r)(i - 3) & 0xff else 0
        val b = if (r > 0) raw(r - 1)(i) & 0xff else 0
        val c = if (i >= 3 && r > 0) raw(r - 1)(i - 3) & 0xff else 0
        val enc = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        filtered(r * (bpl + 1) + 1 + i) = (enc & 0xff).toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val z = zout.toByteArray
    val split = z.length / 2
    PNG_SIG ++
      pngChunk("IHDR", beInt(w) ++ beInt(h) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      pngChunk("IDAT", java.util.Arrays.copyOfRange(z, 0, split)) ++
      pngChunk("IDAT", java.util.Arrays.copyOfRange(z, split, z.length)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Image items (doc_id % 3 == 0) whose payloads are REAL PNGs. */
  def pngImageTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id")).as[Long].map { id =>
        val (w, h) = pngParams(id)
        MediaRow(id, "image", encodePng(id), w, h, 0)
      }
  }

  final case class PngStats(item_id: Long, width: Int, height: Int,
                            n_values: Long, sum_val: Long,
                            weighted_sum: Long, min_val: Int, max_val: Int)

  /** Decode a PNG payload: CRC-verified chunk walk, multi-IDAT zlib
    * inflate, and per-scanline unfiltering (the exact inverse of the
    * five filter types). Returns the reconstructed rows. Fails loudly —
    * never silently — on a bad signature, chunk CRC, unsupported
    * format, or truncated pixel stream. */
  private[graft] def decodePngBytes(b: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    require(b.length >= 8 && b.startsWith(PNG_SIG), "not a PNG payload")
    var off = 8
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 12 <= b.length, "truncated chunk header")
      val len = readBeInt(b, off)
      require(len >= 0 && off + 12 + len <= b.length, "chunk overruns payload")
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, off + 4, 4 + len)
      require(crc.getValue.toInt == readBeInt(b, off + 8 + len),
        s"bad CRC for chunk $typ")
      typ match {
        case "IHDR" =>
          w = readBeInt(b, off + 8); h = readBeInt(b, off + 12)
          require(b(off + 16) == 8 && b(off + 17) == 2,
            "only 8-bit RGB supported")
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks: skip
      }
      off += 12 + len
    }
    require(w > 0 && h > 0, "missing or empty IHDR")
    val bpl = w * 3
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val flat = new Array[Byte]((bpl + 1) * h)
    var got = 0
    var stalled = false
    while (got < flat.length && !inflater.finished() && !stalled) {
      val n = inflater.inflate(flat, got, flat.length - got)
      // inflate()==0 with needsInput/needsDictionary means the stream
      // ran dry mid-pixel (truncated/corrupt IDAT) — without this exit
      // the loop spins forever instead of reaching the require below
      if (n == 0 && (inflater.needsInput() || inflater.needsDictionary()))
        stalled = true
      else got += n
    }
    inflater.end()
    require(got == flat.length, "truncated pixel stream")
    val recon = Array.ofDim[Byte](h, bpl)
    for (r <- 0 until h) {
      val f = flat(r * (bpl + 1)) & 0xff
      require(f <= 4, s"unknown filter type $f")
      for (i <- 0 until bpl) {
        val x = flat(r * (bpl + 1) + 1 + i) & 0xff
        val a = if (i >= 3) recon(r)(i - 3) & 0xff else 0
        val b2 = if (r > 0) recon(r - 1)(i) & 0xff else 0
        val c = if (i >= 3 && r > 0) recon(r - 1)(i - 3) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b2
          case 3 => x + (a + b2) / 2
          case 4 => x + paeth(a, b2, c)
        }
        recon(r)(i) = (v & 0xff).toByte
      }
    }
    (w, h, recon)
  }

  /** Per-partition PNG decode → pixel stats, the same iterator batch
    * shape as decodePcm. The weighted sum is position-sensitive
    * (index-dependent weight 1 + idx % 31), so a decode that produced
    * the right multiset of values in the wrong positions still fails
    * the oracle. */
  def decodePng(media: Dataset[MediaRow]): Dataset[PngStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, rows) = decodePngBytes(r.media)
        var sum = 0L; var wsum = 0L
        var mn = 255; var mx = 0
        var idx = 0L
        for (row <- rows; i <- 0 until w * 3) {
          val v = row(i) & 0xff
          sum += v
          wsum += v.toLong * (1 + idx % 31)
          if (v < mn) mn = v
          if (v > mx) mx = v
          idx += 1
        }
        PngStats(r.item_id, w, h, w.toLong * h * 3, sum, wsum, mn, mx)
      }
    }
  }

  // ── REAL JPEG decode: the JDK ships a full codec ───────────────────────
  // javax.imageio (java.desktop, present in the headless JRE) carries a
  // software JPEG encoder/decoder — Huffman, DCT, 4:2:0 chroma
  // subsampling — so the JPEG path is NOT stubbed either: q98 decodes
  // real JPEG bytes. JPEG is LOSSY, so unlike PNG (q83) the oracle
  // cannot restate pixel values; instead the payloads are smooth
  // closed-form gradients (no wraps/edges, so codec error stays small
  // and stable), and the query emits the decoded dimensions (exact,
  // formula-derived) plus error bounds vs the formula reference with
  // ~3x margins — a broken Huffman table, IDCT, or upsampler blows the
  // bounds, while codec-version-level wobble cannot. Encode and decode
  // both run deterministically in-JVM (byte-identical re-encode,
  // KernelPropSpec).

  /** JPEG dims per item: 16..32 × 16..28 (even dims — no subsampling
    * edge column/row, keeping the error bound tight). */
  private def jpegParams(id: Long): (Int, Int) =
    (16 + 2 * (id % 9).toInt, 16 + 2 * (id % 7).toInt)

  /** Smooth reference pixel: two full-range linear ramps + per-channel
    * and per-item offsets, clamped — smooth in (r, c), so JPEG's DCT
    * represents it with small, stable error. */
  private[graft] def jpegPixel(id: Long, r: Int, c: Int, ch: Int,
                               w: Int, h: Int): Int = {
    val v = (c * 255) / (2 * (w - 1)) + (r * 255) / (2 * (h - 1)) +
      ch * 13 + (id % 23).toInt
    math.min(255, v)
  }

  /** Encode the formula image as a REAL JPEG via the JDK codec. */
  private[graft] def encodeJpeg(id: Long): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val (w, h) = jpegParams(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until h; c <- 0 until w) {
      val rgb = (jpegPixel(id, r, c, 0, w, h) << 16) |
        (jpegPixel(id, r, c, 1, w, h) << 8) | jpegPixel(id, r, c, 2, w, h)
      img.setRGB(c, r, rgb)
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", bos),
      "no JPEG writer in this JRE")
    bos.toByteArray
  }

  /** Image items (doc_id % 3 == 2) whose payloads are REAL JPEGs. */
  def jpegImageTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id")).as[Long].map { id =>
        val (w, h) = jpegParams(id)
        MediaRow(id, "image", encodeJpeg(id), w, h, 0)
      }
  }

  final case class JpegStats(item_id: Long, width: Int, height: Int,
                             n_values: Long, mean_err_lt4: Boolean,
                             max_err_lt48: Boolean, psnr_gt28: Boolean)

  /** Decode a JPEG payload with the JDK codec; fails loudly on a
    * non-decodable payload. Returns (w, h, rgb row-major ints). */
  private[graft] def decodeJpegBytes(b: Array[Byte]): (Int, Int, Array[Int]) = {
    System.setProperty("java.awt.headless", "true")
    require(b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      "not a JPEG payload (missing SOI marker)")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val px = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, px, 0, w)
    (w, h, px)
  }

  /** Per-partition JPEG decode → fidelity stats vs the closed-form
    * reference image — same iterator batch shape as decodePcm/decodePng.
    * The reference is computed from the FORMULA (independent of the
    * codec), so a decoder that returns plausible-but-wrong pixels fails
    * the bounds even though the exact values are codec-defined. */
  def decodeJpeg(media: Dataset[MediaRow]): Dataset[JpegStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (w, h, px) = decodeJpegBytes(r.media)
      var absSum = 0L
      var maxErr = 0
      var sqSum = 0.0
      var i = 0
      while (i < w * h) {
        val (rr, cc) = (i / w, i % w)
        var ch = 0
        while (ch < 3) {
          val got = (px(i) >> (16 - 8 * ch)) & 0xff
          val want = jpegPixel(r.item_id, rr, cc, ch, w, h)
          val e = math.abs(got - want)
          absSum += e; sqSum += e.toDouble * e
          if (e > maxErr) maxErr = e
          ch += 1
        }
        i += 1
      }
      val n = 3L * w * h
      val meanErr = absSum.toDouble / n
      val psnr =
        if (sqSum == 0) Double.PositiveInfinity
        else 10.0 * math.log10(255.0 * 255.0 * n / sqSum)
      JpegStats(r.item_id, w, h, n, meanErr < 4.0, maxErr < 48, psnr > 28.0)
    })
  }

  // ── REAL MP4 container parse: the box tree needs no codec ─────────────
  // Frame DECODE stays stubbed (no H.264 codec exists here), but an MP4
  // container is a length-prefixed box tree — pure byte arithmetic, the
  // same ground q60/q78/q83 stand on. The synthesized payloads are
  // structurally real: ftyp + moov(mvhd + trak(tkhd)) + mdat with
  // big-endian sizes, version-0 mvhd timescale/duration, and 16.16
  // fixed-point track dimensions. q101 recovers every field by walking
  // the tree from the BYTES; the oracle restates the synthesis formulas
  // — a wrong size read, a missed container descent, or a fixed-point
  // shift error breaks the hash match.

  private val MP4_MATRIX: Array[Byte] =
    beInt(0x00010000) ++ beInt(0) ++ beInt(0) ++
      beInt(0) ++ beInt(0x00010000) ++ beInt(0) ++
      beInt(0) ++ beInt(0) ++ beInt(0x40000000)

  private def mp4Box(typ: String, body: Array[Byte]): Array[Byte] =
    beInt(8 + body.length) ++ typ.getBytes("US-ASCII") ++ body

  /** Synthesis formulas (restated by the q101 oracle). */
  private def mp4Duration(id: Long): Int = (6000 + (id % 997) * 13).toInt
  private val MP4_TIMESCALE = 600

  /** A structurally-real MP4: ftyp + moov(mvhd + trak(tkhd)) + mdat. */
  private[operators] def mp4Video(id: Long, payload: Array[Byte]): Array[Byte] =
    mp4Video(id, payload,
      ((id % 4) * 160 + 320).toInt, ((id % 4) * 90 + 180).toInt)

  private[operators] def mp4Video(id: Long, payload: Array[Byte],
                                  w: Int, h: Int): Array[Byte] =
    mp4VideoWith(id, payload, w, h, Array.empty)

  /** Shared MP4 assembly; `trakExtra` appends additional boxes inside
    * `trak` (the MJPEG path hangs mdia(minf(stbl(stsz))) there). */
  private def mp4VideoWith(id: Long, payload: Array[Byte],
                           w: Int, h: Int,
                           trakExtra: Array[Byte]): Array[Byte] = {
    val duration = mp4Duration(id)
    val mvhd = mp4Box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ beInt(0) ++ beInt(0) ++
        beInt(MP4_TIMESCALE) ++ beInt(duration) ++ beInt(0x00010000) ++
        Array[Byte](1, 0) ++ new Array[Byte](10) ++ MP4_MATRIX ++
        new Array[Byte](24) ++ beInt(2))
    val tkhd = mp4Box("tkhd",
      Array[Byte](0, 0, 0, 7) ++ beInt(0) ++ beInt(0) ++ beInt(1) ++
        beInt(0) ++ beInt(duration) ++ new Array[Byte](8) ++
        new Array[Byte](8) ++ MP4_MATRIX ++ beInt(w << 16) ++ beInt(h << 16))
    val moov = mp4Box("moov", mvhd ++ mp4Box("trak", tkhd ++ trakExtra))
    val ftyp = mp4Box("ftyp",
      "mp42".getBytes("US-ASCII") ++ beInt(0) ++
        "mp42isom".getBytes("US-ASCII"))
    ftyp ++ moov ++ mp4Box("mdat", payload)
  }

  /** Video items (doc_id % 3 == 2) with REAL MP4 box trees; mdat
    * carries the document bytes (the stand-in signal payload). */
  def mp4VideoTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id"), col("text")).as[(Long, String)].map {
        case (id, text) =>
          MediaRow(id, "video", mp4Video(id, text.getBytes("UTF-8")),
            ((id % 4) * 160 + 320).toInt, ((id % 4) * 90 + 180).toInt, 0)
      }
  }

  final case class Mp4Meta(item_id: Long, n_boxes: Int, timescale: Int,
                           duration_ticks: Long, duration_sec: Double,
                           track_w: Int, track_h: Int, mdat_bytes: Long)

  /** Walk the MP4 box tree: length-prefixed boxes, recursive descent
    * into container boxes (moov/trak/mdia), mvhd timescale/duration,
    * tkhd 16.16 fixed-point dimensions, mdat payload length. Fails
    * loudly on a box that overruns its parent or trailing non-box
    * bytes — never reads out of bounds. */
  private[graft] def parseMp4Bytes(itemId: Long, b: Array[Byte]): Mp4Meta = {
    var nBoxes = 0
    var timescale = 0; var duration = 0L
    var w = 0; var h = 0; var mdat = 0L
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size = readBeInt(b, off)
        val typ = new String(b, off + 4, 4, "US-ASCII")
        require(size >= 8 && off + size <= end,
          s"box $typ overruns its container")
        nBoxes += 1
        typ match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            walk(off + 8, off + size)
          case "mvhd" =>
            timescale = readBeInt(b, off + 20)
            duration = readBeInt(b, off + 24).toLong
          case "tkhd" =>
            w = readBeInt(b, off + size - 8) >>> 16
            h = readBeInt(b, off + size - 4) >>> 16
          case "mdat" => mdat = (size - 8).toLong
          case _ => ()
        }
        off += size
      }
      require(off == end, "trailing bytes are not box-aligned")
    }
    walk(0, b.length)
    require(timescale > 0, "missing mvhd")
    Mp4Meta(itemId, nBoxes, timescale, duration,
      duration.toDouble / timescale, w, h, mdat)
  }

  /** Per-partition MP4 container parse — the decodePcm/decodePng batch
    * shape for the video modality's metadata tier. */
  def parseMp4(media: Dataset[MediaRow]): Dataset[Mp4Meta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => parseMp4Bytes(r.item_id, r.media)))
  }

  // ── RAW (uncompressed) video frame decode — q112 ─────────────────────
  // MP4s whose mdat carries raw 8-bit grayscale frames (the uncompressed
  // video layout) decode to per-frame pixel statistics with NOTHING but
  // byte arithmetic: track dimensions come from the tkhd walk (the
  // bytes, not the metadata columns), the frame count from
  // mdat_len / (w·h), and every 2nd frame is sampled (q92's decimation
  // applied to video). After this, the only remaining stub is
  // compressed-codec frame decode (H.264 etc.), which genuinely needs a
  // codec library this environment lacks.

  /** Synthesis formulas (restated by the q112 oracle). */
  private[graft] def rawDims(id: Long): (Int, Int) =
    ((16 + (id % 4) * 8).toInt, (8 + (id % 3) * 8).toInt)
  private[graft] def rawFrameCount(id: Long): Int = (4 + id % 5).toInt
  private[graft] def rawPixel(id: Long, f: Int, r: Int, c: Int): Int =
    ((id * 7 + f * 31L + r * 13L + c * 5L) % 256).toInt

  /** A structurally-real MP4 whose mdat is raw grayscale frames. */
  private[graft] def mp4RawVideo(id: Long): Array[Byte] = {
    val (w, h) = rawDims(id)
    val nf = rawFrameCount(id)
    val payload = new Array[Byte](w * h * nf)
    var i = 0
    var f = 0
    while (f < nf) {
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) { payload(i) = rawPixel(id, f, r, c).toByte; i += 1; c += 1 }
        r += 1
      }
      f += 1
    }
    mp4Video(id, payload, w, h)
  }

  /** Raw-video items (doc_id % 3 == 2, the video residue class). */
  def rawVideoTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id")).as[Long].map { id =>
        val (w, h) = rawDims(id)
        MediaRow(id, "video", mp4RawVideo(id), w, h, 0)
      }
  }

  final case class FrameStat(item_id: Long, frame_idx: Int, px_sum: Long,
                             px_min: Int, px_max: Int)

  /** Decode every `stride`-th raw frame of one payload to (sum, min,
    * max) pixel stats. Dimensions are READ FROM THE BYTES (tkhd), the
    * mdat located by a top-level box walk (parseMp4Bytes has already
    * validated every box fits); a payload that is not a whole number of
    * w·h-byte frames fails loudly. */
  private[graft] def decodeRawFramesBytes(itemId: Long, b: Array[Byte],
                                          stride: Int = 1): Seq[FrameStat] = {
    val meta = parseMp4Bytes(itemId, b)
    var off = 0
    var mstart = -1
    while (off + 8 <= b.length) {
      val size = readBeInt(b, off)
      if (new String(b, off + 4, 4, "US-ASCII") == "mdat") mstart = off + 8
      off += size
    }
    require(mstart >= 0, "no mdat box")
    val fb = meta.track_w * meta.track_h
    require(fb > 0 && meta.mdat_bytes % fb == 0,
      s"mdat (${meta.mdat_bytes} B) is not whole ${fb}-byte raw frames")
    val nf = (meta.mdat_bytes / fb).toInt
    (0 until nf).filter(_ % stride == 0).map { f =>
      var s = 0L; var mn = 255; var mx = 0
      var i = mstart + f * fb
      val end = i + fb
      while (i < end) {
        val p = b(i) & 0xff
        s += p; if (p < mn) mn = p; if (p > mx) mx = p
        i += 1
      }
      FrameStat(itemId, f, s, mn, mx)
    }
  }

  private[graft] def decodeRawFrames(media: Dataset[MediaRow],
                                     stride: Int = 2): Dataset[FrameStat] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m =>
      decodeRawFramesBytes(m.item_id, m.media, stride)))
  }

  // ── MJPEG-in-MP4: REAL compressed-video frame decode — q233 ──────────
  // Motion-JPEG retires the "compressed video needs a codec library"
  // stub with zero new dependencies: each mdat frame is a REAL JPEG
  // (intra-coded video — the layout DV and security-camera pipelines
  // actually ship), so the JDK codec q98 already exercises (Huffman +
  // IDCT + chroma upsampling) decodes genuine compressed video frames.
  // Frame boundaries come from the spec's stsz sample-size table at
  // its spec position (trak/mdia/minf/stbl); every sampled frame is
  // validated SOI..EOI and fidelity-bounded against the closed-form
  // per-frame reference. After this, the only remaining gap is
  // INTER-coded entropy decode (H.264 etc.) — genuinely library-bound.

  private[graft] def mjpegFrameCount(id: Long): Int = (3 + id % 4).toInt

  /** Per-frame reference pixel: the q98 gradient with a per-frame
    * offset — smooth in (r, c) within each frame, so codec error stays
    * small and stable while frames remain distinguishable. */
  private[graft] def mjpegPixel(id: Long, f: Int, r: Int, c: Int,
                                ch: Int, w: Int, h: Int): Int = {
    val v = (c * 255) / (2 * (w - 1)) + (r * 255) / (2 * (h - 1)) +
      ch * 13 + ((id + 7L * f) % 23).toInt
    math.min(255, v)
  }

  /** Encode one formula frame as a REAL JPEG via the JDK codec. */
  private def encodeMjpegFrame(id: Long, f: Int): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val (w, h) = jpegParams(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until h; c <- 0 until w) {
      val rgb = (mjpegPixel(id, f, r, c, 0, w, h) << 16) |
        (mjpegPixel(id, f, r, c, 1, w, h) << 8) |
        mjpegPixel(id, f, r, c, 2, w, h)
      img.setRGB(c, r, rgb)
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", bos),
      "no JPEG writer in this JRE")
    bos.toByteArray
  }

  /** A structurally-real MJPEG MP4: ftyp + moov(mvhd + trak(tkhd +
    * mdia(minf(stbl(stsz))))) + mdat of concatenated JPEG frames. The
    * stsz box is the spec's per-sample size table (version/flags,
    * sample_size=0 → per-sample entries, sample_count, sizes). */
  private[graft] def mp4MjpegVideo(id: Long): Array[Byte] = {
    val (w, h) = jpegParams(id)
    val frames = (0 until mjpegFrameCount(id)).map(encodeMjpegFrame(id, _))
    val stsz = mp4Box("stsz",
      Array[Byte](0, 0, 0, 0) ++ beInt(0) ++ beInt(frames.length) ++
        frames.toArray.flatMap(fr => beInt(fr.length)))
    val mdia = mp4Box("mdia", mp4Box("minf", mp4Box("stbl", stsz)))
    mp4VideoWith(id, frames.toArray.flatten, w, h, mdia)
  }

  /** MJPEG video items (doc_id % 3 == 2, the video residue class). */
  def mjpegVideoTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id")).as[Long].map { id =>
        val (w, h) = jpegParams(id)
        MediaRow(id, "video", mp4MjpegVideo(id), w, h, 0)
      }
  }

  final case class MjpegStats(item_id: Long, n_frames: Int,
                              n_sampled: Int, width: Int, height: Int,
                              frames_ok: Boolean, mean_err_lt4: Boolean,
                              max_err_lt48: Boolean, psnr_gt28: Boolean)

  /** Decode every `stride`-th MJPEG frame of one payload through the
    * JDK JPEG codec and bound its fidelity vs the per-frame formula
    * reference. Frame boundaries come from the stsz table (validated
    * against the mdat length); each sampled frame must be SOI..EOI
    * delimited and decode to the tkhd track dimensions. Fails loudly
    * on a missing stsz, a size-table/mdat mismatch, or a non-JPEG
    * frame — never guesses boundaries by marker scanning. */
  private[graft] def decodeMjpegBytes(itemId: Long, b: Array[Byte],
                                      stride: Int = 2): MjpegStats = {
    val meta = parseMp4Bytes(itemId, b) // validates the whole box tree
    var mdatOff = -1
    var sizes: Array[Int] = null
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size = readBeInt(b, off)
        new String(b, off + 4, 4, "US-ASCII") match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            walk(off + 8, off + size)
          case "stsz" =>
            require(readBeInt(b, off + 12) == 0,
              "stsz fixed sample_size unsupported — per-frame table expected")
            val n = readBeInt(b, off + 16)
            sizes = Array.tabulate(n)(i => readBeInt(b, off + 20 + 4 * i))
          case "mdat" => mdatOff = off + 8
          case _ => ()
        }
        off += size
      }
    }
    walk(0, b.length)
    require(mdatOff >= 0, "no mdat box")
    require(sizes != null,
      "no stsz sample-size table — cannot split MJPEG frames")
    require(sizes.map(_.toLong).sum == meta.mdat_bytes,
      s"stsz sizes sum ${sizes.map(_.toLong).sum} != mdat " +
        s"${meta.mdat_bytes} bytes")
    var off = mdatOff
    var framesOk = true; var meanOk = true
    var maxOk = true; var psnrOk = true
    var sampled = 0
    var f = 0
    while (f < sizes.length) {
      val sz = sizes(f)
      if (f % stride == 0) {
        require(sz >= 4 && (b(off) & 0xff) == 0xff &&
          (b(off + 1) & 0xff) == 0xd8 &&
          (b(off + sz - 2) & 0xff) == 0xff &&
          (b(off + sz - 1) & 0xff) == 0xd9,
          s"frame $f of item $itemId is not SOI..EOI-delimited JPEG")
        val (w, h, px) =
          decodeJpegBytes(java.util.Arrays.copyOfRange(b, off, off + sz))
        if (w != meta.track_w || h != meta.track_h) framesOk = false
        var absSum = 0L; var maxErr = 0; var sqSum = 0.0
        var i = 0
        while (i < w * h) {
          val (rr, cc) = (i / w, i % w)
          var ch = 0
          while (ch < 3) {
            val got = (px(i) >> (16 - 8 * ch)) & 0xff
            val want = mjpegPixel(itemId, f, rr, cc, ch, w, h)
            val e = math.abs(got - want)
            absSum += e; sqSum += e.toDouble * e
            if (e > maxErr) maxErr = e
            ch += 1
          }
          i += 1
        }
        val n = 3L * w * h
        if (absSum.toDouble / n >= 4.0) meanOk = false
        if (maxErr >= 48) maxOk = false
        val psnr =
          if (sqSum == 0) Double.PositiveInfinity
          else 10.0 * math.log10(255.0 * 255.0 * n / sqSum)
        if (psnr <= 28.0) psnrOk = false
        sampled += 1
      }
      off += sz
      f += 1
    }
    MjpegStats(itemId, sizes.length, sampled, meta.track_w,
      meta.track_h, framesOk, meanOk, maxOk, psnrOk)
  }

  /** Per-partition MJPEG decode — the decodePcm/decodePng/decodeJpeg
    * iterator batch shape applied to compressed video frames. */
  def decodeMjpeg(media: Dataset[MediaRow],
                  stride: Int = 2): Dataset[MjpegStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      decodeMjpegBytes(m.item_id, m.media, stride)))
  }

  // ── REAL GIF decode: LZW through the JDK codec — q236 ────────────────
  // A fourth REAL image codec tier beside PNG (inflate, q83), JPEG
  // (DCT, q98) and MJPEG (q233): GIF's LZW entropy coding, via the
  // JDK's own GIF reader/writer. GIF is LOSSLESS over an indexed
  // palette, so unlike JPEG the oracle restates EXACT pixel values:
  // the synthesized images are 256-gray INDEXED (palette index ==
  // gray value — no writer quantization ambiguity), and the decoded
  // per-image sum/min/max must equal the closed-form formula's. A
  // broken LZW table, interlace mishandling, or palette misread
  // breaks the hash exactly.

  private def gifParams(id: Long): (Int, Int) =
    ((20 + id % 13).toInt, (12 + id % 9).toInt)

  /** Exact grayscale formula (restated by the q236 oracle). */
  private[graft] def gifPixel(id: Long, r: Int, c: Int, w: Int): Int =
    ((c * 255) / (w - 1) + r * 13 + (id % 29).toInt) % 256

  /** Encode the formula image as a REAL GIF via the JDK codec —
    * TYPE_BYTE_INDEXED over an explicit 256-gray palette, so the
    * writer emits the index bytes as-is and LZW is the only
    * transform. */
  private[graft] def encodeGif(id: Long): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val (w, h) = gifParams(id)
    val grays = new Array[Byte](256)
    var gi = 0
    while (gi < 256) { grays(gi) = gi.toByte; gi += 1 }
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays,
      grays)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    for (r <- 0 until h; c <- 0 until w)
      raster.setSample(c, r, 0, gifPixel(id, r, c, w))
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "gif", bos),
      "no GIF writer in this JRE")
    bos.toByteArray
  }

  /** GIF image items (doc_id % 3 == 0, the image residue class). */
  def gifImageTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id")).as[Long].map { id =>
        val (w, h) = gifParams(id)
        MediaRow(id, "image", encodeGif(id), w, h, 0)
      }
  }

  final case class GifStats(item_id: Long, width: Int, height: Int,
                            px_sum: Long, px_min: Int, px_max: Int,
                            gray_exact: Boolean)

  /** Decode one GIF payload through the JDK codec to exact grayscale
    * stats. Fails loudly on a non-GIF payload; `gray_exact` pins that
    * every decoded pixel has R==G==B (the palette really was the
    * 256-gray identity, not a quantized remap). */
  private[graft] def decodeGifBytes(itemId: Long,
                                    b: Array[Byte]): GifStats = {
    System.setProperty("java.awt.headless", "true")
    require(b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F',
      "not a GIF payload (missing GIF signature)")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var s = 0L; var mn = 255; var mx = 0; var gray = true
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val rgb = img.getRGB(c, r)
        val (rr, gg, bb) =
          ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        if (rr != gg || gg != bb) gray = false
        s += bb; if (bb < mn) mn = bb; if (bb > mx) mx = bb
        c += 1
      }
      r += 1
    }
    GifStats(itemId, w, h, s, mn, mx, gray)
  }

  /** Per-partition GIF decode — the standard iterator batch shape. */
  def decodeGif(media: Dataset[MediaRow]): Dataset[GifStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => decodeGifBytes(m.item_id, m.media)))
  }

  final case class ParsedMedia(item_id: Long, declared_kind: String,
                               kind_detected: String, parsed_width: Int,
                               parsed_height: Int, parsed_rate: Int,
                               meta_match: Boolean)

  /** Container sniffing + header field extraction from raw bytes —
    * per-partition, no driver involvement, no codec library. */
  def parseHeaders(spark: SparkSession, media: Dataset[MediaRow]): Dataset[ParsedMedia] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val b = r.media
        val (kind, w, h, rate) =
          if (b.length >= 33 && b.startsWith(PNG_SIG))
            ("image", readBeInt(b, 16), readBeInt(b, 20), 0)
          else if (b.length >= 44 &&
            b.startsWith("RIFF".getBytes("US-ASCII")) &&
            b.slice(8, 12).sameElements("WAVE".getBytes("US-ASCII")))
            ("audio", 0, 0, readLeInt(b, 24))
          else if (b.length >= 12 &&
            b.slice(4, 8).sameElements("ftyp".getBytes("US-ASCII")))
            ("video", 0, 0, 0)
          else ("unknown", 0, 0, 0)
        val ok = kind == r.kind && (kind match {
          case "image" => w == r.width && h == r.height
          case "audio" => rate == r.sample_rate
          case _ => true // video: the ftyp box carries no parsed fields
        })
        ParsedMedia(r.item_id, r.kind, kind, w, h, rate, ok)
      }
    }
  }

  /** Per-kind stats over the extracted features. The mapPartitions decode
    * itself isn't SQL-expressible, but its aggregate outputs are: kind is
    * a pure function of doc_id, n_bytes is the UTF-8 byte length of the
    * payload, and the checksum is the portable md5 derivation — so the
    * oracle reproduces every output column from `documents` directly.
    * (The feature vectors stay ScalaTest-verified: determinism across
    * partitionings in ExtensionSpec.) */
  val queries: Seq[QueryDef] = Seq(
    QueryDef("q45_multimodal_features",
      (s, d) => {
        extractFeatures(s, mediaTable(s, d)).toDF()
          .groupBy("kind")
          .agg(count(lit(1)).as("n_items"),
            sum("n_bytes").as("total_bytes"),
            countDistinct("checksum").as("n_distinct_payloads"))
          .orderBy("kind")
      },
      Some(s"""SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
             |            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |       count(*) AS n_items,
             |       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
             |       count(DISTINCT ${graft.functions.Hashing.md5Long60Sql("text")})
             |         AS n_distinct_payloads
             |FROM documents
             |GROUP BY 1
             |ORDER BY kind""".stripMargin)),

    // ── Header round-trip: metadata recovered from the BYTES ──────────────
    // The oracle derives every expected value from the doc_id formulas
    // (the metadata that was WRITTEN into the headers); Spark's answer
    // comes from PARSING the binary column. A wrong offset, endianness,
    // or magic check yields n_meta_match < n_items (or a wrong detected
    // kind) and breaks the hash match.
    QueryDef("q60_media_headers",
      (s, d) => parseHeaders(s, headeredMedia(s, d)).toDF()
        .groupBy(col("kind_detected"))
        .agg(count(lit(1)).as("n_items"),
          sum(when(col("meta_match"), 1L).otherwise(0L)).as("n_meta_match"),
          min(when(col("kind_detected") === "image", col("parsed_width")))
            .as("min_width"),
          max(when(col("kind_detected") === "image", col("parsed_width")))
            .as("max_width"),
          min(when(col("kind_detected") === "audio", col("parsed_rate")))
            .as("min_rate"))
        .orderBy("kind_detected"),
      Some("""SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
             |            WHEN 1 THEN 'audio' ELSE 'video' END AS kind_detected,
             |       count(*) AS n_items,
             |       count(*) AS n_meta_match,
             |       min(CASE WHEN doc_id % 3 = 0
             |                THEN CAST(doc_id % 4 AS INT) * 160 + 320 END)
             |         AS min_width,
             |       max(CASE WHEN doc_id % 3 = 0
             |                THEN CAST(doc_id % 4 AS INT) * 160 + 320 END)
             |         AS max_width,
             |       min(CASE WHEN doc_id % 3 = 1 THEN 16000 END) AS min_rate
             |FROM documents
             |GROUP BY 1
             |ORDER BY kind_detected""".stripMargin)),

    // ── PCM round-trip: stats recovered from the SAMPLE BYTES ─────────────
    // Spark's answer decodes every int16 frame out of the WAV payload;
    // the oracle re-derives each stat from the synthesis formulas
    // (square wave: n = 64 + id%64 samples, amplitude 1000 + (id%7)*4000,
    // half-period 4 + id%9 → peak = amp, energy = n*amp², crossings =
    // (n-1) div p, rms = amp). The two agree only if the decoder's
    // offsets, endianness and sign extension are right.
    QueryDef("q78_pcm_decode",
      (s, d) => decodePcm(pcmAudioTable(s, d)).toDF()
        .select("item_id", "sample_rate", "n_samples", "peak", "sum_sq",
          "n_zero_cross", "rms")
        .orderBy("item_id"),
      Some("""WITH p AS (
             |  SELECT doc_id,
             |         64 + doc_id % 64 AS n,
             |         1000 + (doc_id % 7) * 4000 AS amp,
             |         4 + doc_id % 9 AS hp
             |  FROM documents WHERE doc_id % 3 = 1)
             |SELECT doc_id AS item_id,
             |       16000 AS sample_rate,
             |       CAST(n AS INT) AS n_samples,
             |       CAST(amp AS INT) AS peak,
             |       CAST(n * amp * amp AS BIGINT) AS sum_sq,
             |       CAST((n - 1) // hp AS INT) AS n_zero_cross,
             |       CAST(amp AS DOUBLE) AS rms
             |FROM p
             |ORDER BY item_id""".stripMargin)),

    // ── PNG round-trip: stats recovered from the PIXEL BYTES ──────────────
    // Spark's answer walks CRC-guarded chunks, concatenates two IDAT
    // chunks, inflates with java.util.zip.Inflater, and inverts the
    // five scanline filters (the encoder cycles r % 5 through all of
    // them); the oracle re-derives every stat from the pixel formula
    // (id*7 + r*5 + c*3 + ch*11) % 256 by expanding the (row, col,
    // channel) grid — it never sees the bytes. The position-weighted
    // sum makes right-values-wrong-places fail too.
    QueryDef("q83_png_decode",
      (s, d) => decodePng(pngImageTable(s, d)).toDF()
        .select("item_id", "width", "height", "n_values", "sum_val",
          "weighted_sum", "min_val", "max_val")
        .orderBy("item_id"),
      Some("""WITH imgs AS (
             |  SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 11 AS h
             |  FROM documents WHERE doc_id % 3 = 0),
             |rows_ AS (SELECT doc_id, w, h, unnest(range(h)) AS r FROM imgs),
             |cols_ AS (SELECT doc_id, w, h, r, unnest(range(w)) AS c FROM rows_),
             |px AS (
             |  SELECT doc_id, w, h,
             |         (doc_id * 7 + r * 5 + c * 3 + ch * 11) % 256 AS v,
             |         ((r * w + c) * 3 + ch) AS idx
             |  FROM (SELECT *, unnest([0, 1, 2]) AS ch FROM cols_))
             |SELECT doc_id AS item_id,
             |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             |       CAST(count(*) AS BIGINT) AS n_values,
             |       CAST(sum(v) AS BIGINT) AS sum_val,
             |       CAST(sum(v * (1 + idx % 31)) AS BIGINT) AS weighted_sum,
             |       CAST(min(v) AS INT) AS min_val,
             |       CAST(max(v) AS INT) AS max_val
             |FROM px
             |GROUP BY 1, 2, 3
             |ORDER BY item_id""".stripMargin)),

    // ── Resize: 2×2 box downsample over REAL decoded pixels ───────────────
    // Spark decodes the PNG for real and box-averages the byte grid;
    // the oracle expands the HALF-size grid and averages the four
    // generator-formula pixels per cell — a wrong stride, offset, or
    // dropped-edge convention in the resize breaks the hash match, and
    // the position-weighted sum catches transposition.
    QueryDef("q91_png_downsample",
      (s, d) => downsamplePng(pngImageTable(s, d)).toDF()
        .select("item_id", "out_w", "out_h", "n_values", "sum_val",
          "weighted_sum", "min_val", "max_val")
        .orderBy("item_id"),
      Some("""WITH imgs AS (
             |  SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 11 AS h
             |  FROM documents WHERE doc_id % 3 = 0),
             |dims AS (SELECT doc_id, w, h, w // 2 AS w2, h // 2 AS h2 FROM imgs),
             |rows_ AS (SELECT doc_id, w, w2, h2, unnest(range(h2)) AS r FROM dims),
             |cols_ AS (SELECT doc_id, w, w2, h2, r, unnest(range(w2)) AS c FROM rows_),
             |px AS (
             |  SELECT doc_id, w2, h2,
             |         ((doc_id * 7 + (2*r) * 5 + (2*c) * 3 + ch * 11) % 256
             |          + (doc_id * 7 + (2*r) * 5 + (2*c+1) * 3 + ch * 11) % 256
             |          + (doc_id * 7 + (2*r+1) * 5 + (2*c) * 3 + ch * 11) % 256
             |          + (doc_id * 7 + (2*r+1) * 5 + (2*c+1) * 3 + ch * 11) % 256
             |         ) // 4 AS v,
             |         ((r * w2 + c) * 3 + ch) AS idx
             |  FROM (SELECT *, unnest([0, 1, 2]) AS ch FROM cols_))
             |SELECT doc_id AS item_id,
             |       CAST(w2 AS INT) AS out_w, CAST(h2 AS INT) AS out_h,
             |       CAST(count(*) AS BIGINT) AS n_values,
             |       CAST(sum(v) AS BIGINT) AS sum_val,
             |       CAST(sum(v * (1 + idx % 31)) AS BIGINT) AS weighted_sum,
             |       CAST(min(v) AS INT) AS min_val,
             |       CAST(max(v) AS INT) AS max_val
             |FROM px
             |GROUP BY 1, 2, 3
             |ORDER BY item_id""".stripMargin)),

    // ── Frame sampling: every 4th REAL decoded sample ─────────────────────
    // The video frame-sample shape (keep every k-th frame) on the one
    // modality whose inner decode is real in this environment. The
    // oracle expands the decimated index grid and re-derives each kept
    // sample's sign from the square-wave formula; zero crossings of
    // the KEPT sequence come from a lag window — stride or phase bugs
    // shift them and break the match.
    QueryDef("q92_audio_frame_sample",
      (s, d) => decimatePcm(pcmAudioTable(s, d), stride = 4).toDF()
        .select("item_id", "sample_rate", "n_samples", "peak", "sum_sq",
          "n_zero_cross", "rms")
        .orderBy("item_id"),
      Some("""WITH p AS (
             |  SELECT doc_id,
             |         64 + doc_id % 64 AS n,
             |         1000 + (doc_id % 7) * 4000 AS amp,
             |         4 + doc_id % 9 AS hp
             |  FROM documents WHERE doc_id % 3 = 1),
             |kept AS (
             |  SELECT doc_id, amp, i,
             |         CASE WHEN ((4 * i) // hp) % 2 = 0 THEN amp
             |              ELSE -amp END AS v
             |  FROM (SELECT doc_id, amp, hp, unnest(range((n + 3) // 4)) AS i
             |        FROM p)),
             |lagged AS (
             |  SELECT doc_id, amp, v,
             |         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
             |  FROM kept)
             |SELECT doc_id AS item_id,
             |       4000 AS sample_rate,
             |       CAST(count(*) AS INT) AS n_samples,
             |       CAST(max(abs(v)) AS INT) AS peak,
             |       CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS sum_sq,
             |       CAST(sum(CASE WHEN pv IS NOT NULL AND pv * v < 0
             |                     THEN 1 ELSE 0 END) AS INT) AS n_zero_cross,
             |       sqrt(sum(CAST(v AS BIGINT) * v) / count(*)) AS rms
             |FROM lagged
             |GROUP BY doc_id
             |ORDER BY item_id""".stripMargin)),

    // ── JPEG round-trip: REAL JDK codec decode, fidelity-bounded ──────────
    // Spark encodes formula gradients to real JPEG bytes and decodes
    // them with javax.imageio (Huffman + IDCT + chroma upsampling —
    // the JDK's software codec, no stub). JPEG is lossy, so the oracle
    // cannot restate pixels; it restates the EXACT decoded dimensions
    // (a wrong SOF parse fails) and expects every fidelity bound to
    // hold (mean |err| < 4, max |err| < 48, PSNR > 28 vs the
    // formula-derived reference — ~3x margins over the measured ~1.3
    // mean error, so only a broken decode can cross them).
    QueryDef("q98_jpeg_decode",
      (s, d) => decodeJpeg(jpegImageTable(s, d)).toDF()
        .select("item_id", "width", "height", "n_values", "mean_err_lt4",
          "max_err_lt48", "psnr_gt28")
        .orderBy("item_id"),
      Some("""SELECT doc_id AS item_id,
             |       CAST(16 + 2 * (doc_id % 9) AS INT) AS width,
             |       CAST(16 + 2 * (doc_id % 7) AS INT) AS height,
             |       CAST(3 * (16 + 2 * (doc_id % 9))
             |              * (16 + 2 * (doc_id % 7)) AS BIGINT) AS n_values,
             |       TRUE AS mean_err_lt4,
             |       TRUE AS max_err_lt48,
             |       TRUE AS psnr_gt28
             |FROM documents
             |WHERE doc_id % 3 = 2
             |ORDER BY item_id""".stripMargin)),

    // ── MP4 box-tree walk: container metadata from the BYTES ─────────────
    // Spark recursively walks length-prefixed boxes (descending into
    // moov/trak), reads the version-0 mvhd clock fields and the tkhd
    // 16.16 fixed-point dimensions, and measures the mdat payload; the
    // oracle restates the synthesis formulas and never sees a byte.
    // duration_sec is the one float column: an exact binary division
    // (ticks / 600.0) both engines compute identically.
    QueryDef("q101_mp4_boxes",
      (s, d) => parseMp4(mp4VideoTable(s, d)).toDF()
        .select("item_id", "n_boxes", "timescale", "duration_ticks",
          "duration_sec", "track_w", "track_h", "mdat_bytes")
        .orderBy("item_id"),
      Some("""SELECT doc_id AS item_id,
             |       6 AS n_boxes,
             |       600 AS timescale,
             |       CAST(6000 + (doc_id % 997) * 13 AS BIGINT)
             |         AS duration_ticks,
             |       CAST(6000 + (doc_id % 997) * 13 AS DOUBLE) / 600.0
             |         AS duration_sec,
             |       CAST((doc_id % 4) * 160 + 320 AS INT) AS track_w,
             |       CAST((doc_id % 4) * 90 + 180 AS INT) AS track_h,
             |       CAST(strlen(text) AS BIGINT) AS mdat_bytes
             |FROM documents
             |WHERE doc_id % 3 = 2
             |ORDER BY item_id""".stripMargin)),

    // ── RAW video frame decode: every 2nd frame's pixel stats ────────────
    // Uncompressed grayscale frames sliced out of a REAL MP4 mdat, with
    // dimensions read from the tkhd bytes and the frame count derived
    // from mdat_len/(w·h). The oracle restates the pixel synthesis
    // formula over the sampled frame grid — a wrong mdat offset, frame
    // stride, row pitch, or sign-extension breaks the hash. All-integer
    // outputs (sum/min/max), so no float can smooth over an off-by-one.
    QueryDef("q112_raw_video_frames",
      (s, d) => decodeRawFrames(rawVideoTable(s, d), stride = 2).toDF()
        .select("item_id", "frame_idx", "px_sum", "px_min", "px_max")
        .orderBy("item_id", "frame_idx"),
      Some("""WITH vids AS (
             |  SELECT doc_id AS item_id,
             |         16 + (doc_id % 4) * 8 AS w,
             |         8 + (doc_id % 3) * 8 AS h,
             |         4 + doc_id % 5 AS nf
             |  FROM documents WHERE doc_id % 3 = 2),
             |frames AS (
             |  SELECT item_id, w, h, CAST(f AS INT) AS frame_idx
             |  FROM (SELECT item_id, w, h, unnest(range(nf)) AS f FROM vids)
             |  WHERE f % 2 = 0),
             |rows_r AS (
             |  SELECT item_id, frame_idx, w, r
             |  FROM (SELECT item_id, frame_idx, w,
             |               unnest(range(h)) AS r FROM frames)),
             |vals AS (
             |  SELECT item_id, frame_idx,
             |         CAST((item_id * 7 + frame_idx * 31 + r * 13 + c * 5)
             |              % 256 AS INT) AS p
             |  FROM (SELECT item_id, frame_idx, r,
             |               unnest(range(w)) AS c FROM rows_r))
             |SELECT item_id, frame_idx,
             |       CAST(sum(p) AS BIGINT) AS px_sum,
             |       CAST(min(p) AS INT) AS px_min,
             |       CAST(max(p) AS INT) AS px_max
             |FROM vals
             |GROUP BY item_id, frame_idx
             |ORDER BY item_id, frame_idx""".stripMargin)),

    // ── Perceptual near-dup image detection (average hash) ───────────────
    // The multimodal×dedup crossover: every image REALLY decodes
    // (CRC-verified inflate + unfilter), nearest-neighbor-samples to
    // an 8×8 grid, grayscales, and thresholds against its own mean —
    // a 64-bit average hash that survives a global brightness shift
    // (threshold-vs-mean cancels it except where the 255 clamp bites,
    // which is exactly what makes the shifted variants NEAR-dups, not
    // exact ones). Candidates come from a 4×16-bit chunk equi-join
    // (pigeonhole: hamming ≤ 3 is guaranteed a shared chunk — q37's
    // SimHash discipline on image bits), then exact bit_count rerank
    // at ≤ 6. The oracle re-derives every hash closed-form from the
    // pixel formula — grid sampling, integer grayscale/mean, bit
    // packing, chunking, and hamming all restated in SQL — so a
    // decoder bug, a sampling off-by-one, or a hash/pack drift
    // anywhere breaks the per-distance pair accounting.
    QueryDef("q196_image_near_dup",
      (s, d) => {
        import s.implicits._
        val base = pngImageTable(s, d)
        val variants = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(3)) === 0 &&
            pmod(col("doc_id"), lit(5)) === 0)
          .select(col("doc_id")).as[Long].map { id =>
            MediaRow(id + 10000000L, "image", encodePngBright(id, 8),
              0, 0, 0)
          }
        val hashes = base.union(variants)
          .map(m => (m.item_id, averageHash(m.media)))
          .toDF("item_id", "h").cache()
        val chunks = hashes.select(col("item_id"), col("h"),
          explode(array((0 until 4).map(k =>
            struct(lit(k).as("k"),
              shiftright(col("h"), 16 * k).bitwiseAND(lit(65535L))
                .as("v"))): _*)).as("c"))
          .select(col("item_id"), col("h"),
            col("c.k").as("k"), col("c.v").as("v"))
        val cand = chunks.as("a")
          .join(chunks.as("b"),
            col("a.k") === col("b.k") && col("a.v") === col("b.v") &&
              col("a.item_id") < col("b.item_id"))
          .select(col("a.item_id").as("ia"), col("b.item_id").as("ib"),
            col("a.h").as("ha"), col("b.h").as("hb"))
          .distinct()
        cand
          .withColumn("hamming",
            bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
          .filter(col("hamming") <= 6)
          .groupBy("hamming")
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("ia")).cast("long").as("sum_a"),
            sum(col("ib")).cast("long").as("sum_b"))
          .orderBy("hamming")
      },
      Some("""WITH ids AS (
             |  SELECT doc_id AS id FROM documents WHERE doc_id % 3 = 0),
             |items AS (
             |  SELECT id AS item_id, id AS src, 0 AS delta FROM ids
             |  UNION ALL
             |  SELECT id + 10000000, id, 8 FROM ids WHERE id % 5 = 0),
             |dims AS (SELECT item_id, src, delta,
             |                8 + src % 9 AS w, 6 + src % 11 AS h
             |         FROM items),
             |grid AS (SELECT *, unnest(range(64)) AS idx FROM dims),
             |g AS (
             |  SELECT item_id, idx,
             |    (least((src*7 + ((idx//8)*h//8)*5 + ((idx%8)*w//8)*3
             |            + 0) % 256 + delta, 255)
             |     + least((src*7 + ((idx//8)*h//8)*5 + ((idx%8)*w//8)*3
             |            + 11) % 256 + delta, 255)
             |     + least((src*7 + ((idx//8)*h//8)*5 + ((idx%8)*w//8)*3
             |            + 22) % 256 + delta, 255)) // 3 AS gray
             |  FROM grid),
             |m AS (SELECT item_id, CAST(sum(gray) AS BIGINT) // 64 AS mean
             |      FROM g GROUP BY 1),
             |hb AS (
             |  SELECT g.item_id,
             |         bit_or(CASE
             |                WHEN gray > mean AND idx = 0
             |                THEN CAST(-9223372036854775808 AS BIGINT)
             |                WHEN gray > mean
             |                THEN CAST(1 AS BIGINT) << (63 - idx)
             |                ELSE CAST(0 AS BIGINT) END) AS hsh
             |  FROM g JOIN m USING (item_id) GROUP BY 1),
             |chv AS (
             |  SELECT item_id, hsh, k,
             |         (hsh >> (16 * k)) & 65535 AS v
             |  FROM (SELECT *, unnest([0, 1, 2, 3]) AS k FROM hb)),
             |cand AS (
             |  SELECT DISTINCT a.item_id AS ia, b.item_id AS ib,
             |         a.hsh AS ha, b.hsh AS hbb
             |  FROM chv a JOIN chv b
             |    ON a.k = b.k AND a.v = b.v AND a.item_id < b.item_id),
             |p AS (
             |  SELECT ia, ib,
             |         CAST(bit_count(xor(ha, hbb)) AS INT) AS hamming
             |  FROM cand)
             |SELECT hamming, count(*) AS n_pairs,
             |       CAST(sum(ia) AS BIGINT) AS sum_a,
             |       CAST(sum(ib) AS BIGINT) AS sum_b
             |FROM p
             |WHERE hamming <= 6
             |GROUP BY 1
             |ORDER BY hamming""".stripMargin)),

    // ── MJPEG-in-MP4: COMPRESSED video frames really decode ──────────────
    // Every 2nd frame of each Motion-JPEG MP4 decodes through the JDK
    // JPEG codec — real compressed-video frame decode, no codec
    // library. Frame boundaries come from the stsz sample table, each
    // sampled frame is SOI..EOI-validated and fidelity-bounded against
    // the per-frame formula reference (q98's bounds). The oracle
    // restates the synthesis formulas: frame count, stride-2 sample
    // count, tkhd dimensions, and all fidelity flags TRUE — a wrong
    // stsz read, mdat offset, frame split, or a broken decode breaks
    // the hash. JPEG byte sizes are codec-defined, so no size column
    // is emitted (the stsz-vs-mdat equality is asserted in-engine).
    QueryDef("q233_mjpeg_frames",
      (s, d) => decodeMjpeg(mjpegVideoTable(s, d), stride = 2).toDF()
        .select("item_id", "n_frames", "n_sampled", "width", "height",
          "frames_ok", "mean_err_lt4", "max_err_lt48", "psnr_gt28")
        .orderBy("item_id"),
      Some("""SELECT doc_id AS item_id,
             |       CAST(3 + doc_id % 4 AS INT) AS n_frames,
             |       CAST((3 + doc_id % 4 + 1) // 2 AS INT) AS n_sampled,
             |       CAST(16 + 2 * (doc_id % 9) AS INT) AS width,
             |       CAST(16 + 2 * (doc_id % 7) AS INT) AS height,
             |       TRUE AS frames_ok,
             |       TRUE AS mean_err_lt4,
             |       TRUE AS max_err_lt48,
             |       TRUE AS psnr_gt28
             |FROM documents
             |WHERE doc_id % 3 = 2
             |ORDER BY item_id""".stripMargin)),

    // ── GIF decode: EXACT pixel stats through real LZW ───────────────────
    // GIF is lossless over its palette, so the oracle restates the
    // exact per-image pixel sum/min/max from the synthesis formula —
    // the strongest decode gate possible (JPEG can only be
    // fidelity-bounded). Encode and decode both run the JDK codec;
    // any LZW/palette/interlace defect shifts a sum and breaks the
    // hash.
    QueryDef("q236_gif_decode",
      (s, d) => decodeGif(gifImageTable(s, d)).toDF()
        .select("item_id", "width", "height", "px_sum", "px_min",
          "px_max", "gray_exact")
        .orderBy("item_id"),
      Some("""WITH imgs AS (
             |  SELECT doc_id AS item_id,
             |         CAST(20 + doc_id % 13 AS INT) AS w,
             |         CAST(12 + doc_id % 9 AS INT) AS h
             |  FROM documents WHERE doc_id % 3 = 0),
             |rows_r AS (
             |  SELECT item_id, w, h, r
             |  FROM (SELECT item_id, w, h, unnest(range(h)) AS r
             |        FROM imgs)),
             |vals AS (
             |  SELECT item_id, w, h,
             |         CAST(((c * 255) // (w - 1) + r * 13
             |               + item_id % 29) % 256 AS INT) AS p
             |  FROM (SELECT item_id, w, h, r, unnest(range(w)) AS c
             |        FROM rows_r))
             |SELECT item_id,
             |       CAST(max(w) AS INT) AS width,
             |       CAST(max(h) AS INT) AS height,
             |       CAST(sum(p) AS BIGINT) AS px_sum,
             |       CAST(min(p) AS INT) AS px_min,
             |       CAST(max(p) AS INT) AS px_max,
             |       TRUE AS gray_exact
             |FROM vals
             |GROUP BY 1
             |ORDER BY item_id""".stripMargin)),

    // ── Audio fingerprint near-dup: loudness-invariant band signature ─────
    // The audio analogue of q196's image aHash: every item's REAL
    // decoded PCM stream folds into a 15-bit fingerprint — 16 equal
    // time windows, signed sample sum per window, one bit per adjacent
    // pair (sum rises → 1). Because every window sum scales by the same
    // positive amplitude, the comparisons — and therefore the
    // fingerprint — are LOUDNESS-INVARIANT: a volume-normalized
    // re-encode of a track fingerprints identically, which is exactly
    // the duplicate class audio dedup must catch (the corpus plants
    // such variants: same wave shape, different gain). Near-dup
    // grouping is fingerprint EQUALITY — a single groupBy/window, never
    // a pairwise join: at 100 TB the cost is one decode pass (per-row
    // byte work, zero shuffle) plus one fp-keyed exchange; group sizes
    // are bounded by true duplicate classes, not corpus size.
    //
    // The oracle re-derives every window sum from the synthesis formula
    // (it never sees the bytes) and replays the bit packing — a wrong
    // window boundary, sign extension, or comparison direction in the
    // decoder breaks the hash.
    QueryDef("q246_audio_fingerprint",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val variants = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(3)) === 1 &&
            pmod(col("doc_id"), lit(5)) === 0)
          .select(col("doc_id")).as[Long].map { id =>
            val (n, _, p) = waveParams(id)
            // same wave shape (n, half-period), different gain
            val amp = 500
            val pcm = new Array[Byte](2 * n)
            var i = 0
            while (i < n) {
              val v = if ((i / p) % 2 == 0) amp else -amp
              pcm(2 * i) = (v & 0xff).toByte
              pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
              i += 1
            }
            MediaRow(id + 10000000L, "audio",
              wavHeader(16000, 2 * n) ++ pcm, 0, 0, 16000)
          }
        val fps = pcmAudioTable(s, d).union(variants)
          .map(r => (r.item_id, pcmBandFingerprint(r.item_id, r.media, 16)))
          .toDF("item_id", "fp")
        val byFp = Window.partitionBy("fp")
        fps
          .withColumn("group_rep", min("item_id").over(byFp))
          .withColumn("group_size", count(lit(1)).over(byFp))
          .orderBy("item_id")
      },
      Some("""WITH p AS (
             |  SELECT doc_id AS item_id,
             |         64 + doc_id % 64 AS n,
             |         1000 + (doc_id % 7) * 4000 AS amp,
             |         4 + doc_id % 9 AS hp
             |  FROM documents WHERE doc_id % 3 = 1
             |  UNION ALL
             |  SELECT doc_id + 10000000,
             |         64 + doc_id % 64, 500, 4 + doc_id % 9
             |  FROM documents WHERE doc_id % 3 = 1 AND doc_id % 5 = 0),
             |sm AS MATERIALIZED (
             |  SELECT item_id, (i * 16) // n AS w,
             |         sum(CASE WHEN (i // hp) % 2 = 0 THEN amp
             |                  ELSE -amp END) AS s
             |  FROM (SELECT item_id, n, amp, hp, unnest(range(n)) AS i
             |        FROM p)
             |  GROUP BY 1, 2),
             |bits AS (
             |  SELECT item_id, w, s,
             |         lag(s) OVER (PARTITION BY item_id ORDER BY w) AS ps
             |  FROM sm),
             |fp AS MATERIALIZED (
             |  SELECT item_id,
             |         CAST(coalesce(sum(CASE WHEN ps IS NOT NULL AND s > ps
             |                    THEN 1 << (w - 1) ELSE 0 END), 0)
             |           AS BIGINT) AS fp
             |  FROM bits GROUP BY 1)
             |SELECT item_id, fp,
             |       min(item_id) OVER (PARTITION BY fp) AS group_rep,
             |       CAST(count(*) OVER (PARTITION BY fp) AS BIGINT)
             |         AS group_size
             |FROM fp
             |ORDER BY item_id""".stripMargin))
  )

  /** 64-bit average hash of a REAL decoded PNG: nearest-neighbor
    * sample to an 8×8 grid (src row = r·h/8, src col = c·w/8),
    * integer grayscale (r+g+b)/3, strict threshold against the
    * integer mean of the 64 grays, MSB-first bit packing (idx r·8+c →
    * bit 63−idx). The oracle restates every step closed-form. */
  private[graft] def averageHash(b: Array[Byte]): Long = {
    val (w, h, rows) = decodePngBytes(b)
    val grays = new Array[Int](64)
    var i = 0
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val sr = r * h / 8; val base = (c * w / 8) * 3
        grays(i) = ((rows(sr)(base) & 0xff) + (rows(sr)(base + 1) & 0xff) +
          (rows(sr)(base + 2) & 0xff)) / 3
        i += 1; c += 1
      }
      r += 1
    }
    val mean = grays.sum / 64
    var hash = 0L
    var j = 0
    while (j < 64) {
      if (grays(j) > mean) hash |= (1L << (63 - j))
      j += 1
    }
    hash
  }

  /** A brightness-shifted variant of the formula image — min(255,
    * v+delta) per sample. The near-dup family for q196: average-hash
    * tolerates the global shift (threshold-vs-mean cancels it) except
    * where the clamp bites, so variants land a small, nonzero hamming
    * distance from their source. */
  private[operators] def encodePngBright(id: Long,
                                         delta: Int): Array[Byte] = {
    val (w, h) = pngParams(id)
    val raw = Array.ofDim[Byte](h, w * 3)
    for (r <- 0 until h; c <- 0 until w; ch <- 0 until 3)
      raw(r)(c * 3 + ch) =
        math.min(255, pixelValue(id, r, c, ch) + delta).toByte
    encodePngPixels(raw)
  }
}
