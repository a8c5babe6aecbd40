package graft.sources

import java.io.IOException
import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import com.fasterxml.jackson.databind.ObjectMapper

/** Puffin container files (the Iceberg sidecar format that carries
  * v3 DELETION VECTORS), implemented from the published Puffin spec
  * with no Iceberg jars — the [[RoaringDv]] discipline applied to
  * the container around the bitmap:
  *
  *   - layout: `Magic, Blob₁…Blobₙ, Footer` where Footer =
  *     `Magic, FooterPayload (UTF-8 JSON), FooterPayloadSize
  *     (int32 LE), Flags (4 bytes), Magic`; Magic = "PFA1"
  *     (0x50 0x46 0x41 0x31);
  *   - FooterPayload JSON: `{"blobs": [{type, fields, snapshot-id,
  *     sequence-number, offset, length, compression-codec?,
  *     properties?}], "properties"?: {...}}`;
  *   - flag bit 0 of byte 0 marks an lz4-compressed payload —
  *     REFUSED (no lz4-frame codec in this environment; guessing a
  *     codec would misparse), as is any other set flag bit;
  *   - the `deletion-vector-v1` blob: `combined length of magic +
  *     vector (int32 BE), magic 0xD1D33964 (stored little-endian —
  *     the same 1681511377 as Delta), the 64-bit RoaringBitmap
  *     "portable" vector, CRC-32 of magic+vector (int32 BE)` —
  *     byte-identical to Delta's DV blob body, so [[RoaringDv]]
  *     decodes the inner bytes.
  *
  * Every structural check refuses loudly (magic at both ends, blob
  * bounds inside the file, declared length vs blob length, CRC) —
  * a masked read serving rows a corrupt DV should have hidden is a
  * silent-loss bug, the worst kind.
  *
  * Honesty note (same as IcebergLite's): no Iceberg v3 runtime
  * exists in this container, so spec tests read what this writer
  * wrote; byte layout follows the published spec text.
  */
object PuffinLite {

  private val Magic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"
  private val mapper = new ObjectMapper()

  final case class BlobMeta(blobType: String, offset: Long,
                            length: Long,
                            properties: Map[String, String])

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Parse a Puffin file's footer → its blob index. */
  def blobs(spark: SparkSession, path: String): Seq[BlobMeta] = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    val len = fs.getFileStatus(p).getLen
    if (len < 20)
      throw new IOException(s"$path is too short (${len} bytes) to " +
        "be a Puffin file — refusing")
    val in = fs.open(p)
    try {
      val head = new Array[Byte](4)
      in.readFully(0, head)
      if (!java.util.Arrays.equals(head, Magic))
        throw new IOException(s"$path does not start with the Puffin " +
          "magic PFA1 — refusing")
      val tail = new Array[Byte](12) // size(4) flags(4) magic(4)
      in.readFully(len - 12, tail)
      if (!java.util.Arrays.equals(tail.slice(8, 12), Magic))
        throw new IOException(s"$path does not end with the Puffin " +
          "magic PFA1 — refusing")
      val flags = tail.slice(4, 8)
      if (flags.exists(_ != 0))
        throw new IOException(s"$path sets Puffin footer flags " +
          s"${flags.map(b => f"$b%02x").mkString(" ")} (payload " +
          "compression or newer features) — refusing rather than " +
          "misparse")
      val payloadSize = ByteBuffer.wrap(tail, 0, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      if (payloadSize < 2 || payloadSize > len - 20)
        throw new IOException(s"$path declares footer payload " +
          s"$payloadSize bytes — outside the file; refusing")
      val payload = new Array[Byte](payloadSize)
      in.readFully(len - 12 - payloadSize, payload)
      val footerMagic = new Array[Byte](4)
      in.readFully(len - 16 - payloadSize, footerMagic)
      if (!java.util.Arrays.equals(footerMagic, Magic))
        throw new IOException(s"$path footer does not open with the " +
          "Puffin magic — truncated or mis-sized payload; refusing")
      val root = mapper.readTree(
        new String(payload, StandardCharsets.UTF_8))
      import scala.jdk.CollectionConverters._
      Option(root.get("blobs")).toSeq
        .flatMap(_.elements().asScala).map { b =>
          val props = Option(b.get("properties")).map(pn =>
            pn.properties().asScala
              .map(e => e.getKey -> e.getValue.asText).toMap)
            .getOrElse(Map.empty[String, String])
          val off = b.get("offset").asLong
          val blen = b.get("length").asLong
          if (off < 4 || off + blen > len - 16 - payloadSize)
            throw new IOException(s"$path blob [$off, ${off + blen}) " +
              "overlaps the header or footer — refusing")
          BlobMeta(b.get("type").asText, off, blen, props)
        }
    } finally in.close()
  }

  /** Read one deletion-vector blob at (offset, length) and decode it
    * to deleted row positions. Validates the declared combined
    * length, the inner DV magic (via [[RoaringDv.decode]]) and the
    * CRC-32 trailer. */
  def readDvPositions(spark: SparkSession, path: String,
                      offset: Long, length: Long): Array[Long] = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    if (length < 12)
      throw new IOException(s"DV blob at $path:$offset declares " +
        s"$length bytes — shorter than length+magic+CRC; refusing")
    val buf = new Array[Byte](length.toInt)
    val in = fs.open(p)
    try {
      // the container must be a Puffin file even on the direct-blob
      // path (manifest offsets into a non-Puffin file are garbage)
      val head = new Array[Byte](4)
      in.readFully(0, head)
      if (!java.util.Arrays.equals(head, Magic))
        throw new IOException(s"$path does not start with the Puffin " +
          "magic PFA1 — refusing")
      in.readFully(offset, buf)
    } finally in.close()
    val bb = ByteBuffer.wrap(buf).order(ByteOrder.BIG_ENDIAN)
    val inner = bb.getInt // combined magic+vector length
    if (inner != length - 8)
      throw new IOException(s"DV blob at $path:$offset declares " +
        s"inner length $inner but the blob spans ${length - 8} — " +
        "refusing a mis-framed vector")
    val body = java.util.Arrays.copyOfRange(buf, 4, 4 + inner)
    val crc = ByteBuffer.wrap(buf, 4 + inner, 4)
      .order(ByteOrder.BIG_ENDIAN).getInt
    val c = new java.util.zip.CRC32()
    c.update(body)
    if ((c.getValue & 0xffffffffL) != (crc & 0xffffffffL))
      throw new IOException(s"DV blob CRC mismatch at $path:$offset " +
        "— refusing a corrupt mask")
    RoaringDv.decode(body) // validates the inner magic
  }

  /** Write a Puffin file carrying one `deletion-vector-v1` blob per
    * (referenced data file → deleted positions). Returns each file's
    * blob placement: (referencedDataFile → (offset, length,
    * cardinality)) for the caller's manifest entries. */
  def writeDvFile(spark: SparkSession, path: String, snapshotId: Long,
                  dvs: Seq[(String, Array[Long])])
      : Map[String, (Long, Long, Long)] = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    val out = fs.create(p, true)
    val placed = Map.newBuilder[String, (Long, Long, Long)]
    val blobMetas = Seq.newBuilder[String]
    try {
      out.write(Magic)
      var pos = 4L
      dvs.foreach { case (dataFile, positions) =>
        val body = RoaringDv.encode(positions) // magic + vector
        val c = new java.util.zip.CRC32()
        c.update(body)
        val blob = ByteBuffer.allocate(body.length + 8)
          .order(ByteOrder.BIG_ENDIAN)
          .putInt(body.length).put(body)
          .putInt((c.getValue & 0xffffffffL).toInt).array()
        out.write(blob)
        placed += dataFile -> ((pos, blob.length.toLong,
          positions.length.toLong))
        blobMetas += s"""{"type": "deletion-vector-v1", "fields": [],
           | "snapshot-id": $snapshotId, "sequence-number": $snapshotId,
           | "offset": $pos, "length": ${blob.length},
           | "properties": {"referenced-data-file": ${mapper
             .writeValueAsString(dataFile)},
           |   "cardinality": "${positions.length}"}}"""
          .stripMargin.replace("\n", "")
        pos += blob.length
      }
      val payload = s"""{"blobs": [${blobMetas.result().mkString(", ")}]}"""
        .getBytes(StandardCharsets.UTF_8)
      out.write(Magic)
      out.write(payload)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(payload.length).putInt(0).array()
      out.write(tail)
      out.write(Magic)
    } finally out.close()
    placed.result()
  }
}
