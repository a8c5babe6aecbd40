package graft.sources

import java.io.IOException

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg PARTITION TRANSFORMS — the spec's "Partition Transforms"
  * table plus the Appendix B 32-bit hash requirements, implemented
  * from the published text (iceberg.apache.org/spec; reference layout
  * at LeoLe128/sql-data-warehouse has no partitioned tables — this is
  * the extension tier's interop surface for the layouts real Iceberg
  * tables overwhelmingly use, `days(ts)` and `bucket(N, id)`).
  *
  * Two evaluation layers, kept in lockstep:
  *   - [[column]]: the transform as a SPARK COLUMN over the source —
  *     what the export writer derives partition tuples with. Everything
  *     except bucket is built-in arithmetic (codegen'd); bucket needs
  *     the spec's murmur3_x86_32, which no Spark builtin computes
  *     (Spark's `hash` is a different murmur3 flavor with seed 42), so
  *     it is a scalar UDF — export-path only, never in a query plan.
  *   - [[literal]]: the same transform on a DRIVER-SIDE literal — what
  *     the scan planner applies to predicate endpoints before
  *     comparing against stored partition tuples.
  *
  * Hash conformance is pinned by the spec's own Appendix B test
  * vectors in Round12Spec (34L → 2017239379, "iceberg" → 1210000089,
  * date 2017-11-16 → -653330422).
  */
object IcebergTransforms {

  /** A parsed transform: "identity" | "bucket" (n) | "truncate" (w) |
    * "day" | "month" | "year" | "void". */
  final case class Transform(name: String, param: Int) {
    override def toString: String = name match {
      case "bucket" => s"bucket[$param]"
      case "truncate" => s"truncate[$param]"
      case other => other
    }
    /** Monotonic transforms prune RANGES; bucket prunes only equality. */
    def monotonic: Boolean = name != "bucket" && name != "void"
  }

  private val Bucket = """bucket\[(\d+)\]""".r
  private val Truncate = """truncate\[(\d+)\]""".r

  /** Parse a spec transform string; unknown names refuse loudly (a
    * guessed transform would silently mis-prune). */
  def parse(s: String): Transform = s match {
    case "identity" => Transform("identity", 0)
    case "void" => Transform("void", 0)
    case "day" | "days" => Transform("day", 0)
    case "month" | "months" => Transform("month", 0)
    case "year" | "years" => Transform("year", 0)
    case Bucket(n) => Transform("bucket", n.toInt)
    case Truncate(w) => Transform("truncate", w.toInt)
    case other => throw new IOException(
      s"unknown Iceberg partition transform '$other' — refusing " +
        "rather than mis-pruning")
  }

  // ── the spec's 32-bit hash (murmur3_x86_32, seed 0) ────────────────

  /** murmur3_x86_32 with seed 0 — implemented from the public
    * algorithm (Appendix B names it as the required hash; Spark's own
    * `hash` function is a different seed/tail variant and CANNOT be
    * reused without breaking cross-engine bucket agreement). */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0 // seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      var k1 = (data(i * 4) & 0xff) | ((data(i * 4 + 1) & 0xff) << 8) |
        ((data(i * 4 + 2) & 0xff) << 16) |
        ((data(i * 4 + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ => ()
    }
    if ((data.length & 3) != 0) {
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Appendix B: int and long hash identically — 8-byte little-endian. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  /** Appendix B: strings hash their UTF-8 bytes. */
  def hashString(s: String): Int =
    murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def bucketOf(hash: Int, n: Int): Int =
    (hash & Integer.MAX_VALUE) % n

  // ── driver-side literal evaluation (prune endpoints) ───────────────

  private def epochMicros(v: Any): Long = v match {
    case i: java.time.Instant =>
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong)
    case t: java.sql.Timestamp =>
      epochMicros(t.toInstant)
    case other => throw new IOException(
      s"cannot read $other (${other.getClass.getName}) as a timestamp")
  }

  private def epochDays(v: Any, dt: DataType): Long = dt match {
    case DateType => v match {
      case d: java.sql.Date => d.toLocalDate.toEpochDay
      case d: java.time.LocalDate => d.toEpochDay
      case other => throw new IOException(s"cannot read $other as a date")
    }
    case TimestampType => Math.floorDiv(epochMicros(v), 86400000000L)
    case other => throw new IOException(
      s"transform 'day' needs a date/timestamp source, got $other")
  }

  private def localDate(v: Any, dt: DataType): java.time.LocalDate =
    java.time.LocalDate.ofEpochDay(epochDays(v, dt))

  /** Evaluate `tr` on a driver-side value of Spark type `dt` — the
    * planner's half; must agree exactly with [[column]]. Null maps to
    * null (every transform is null-preserving per the spec). */
  def literal(tr: Transform, dt: DataType, v: Any): Any =
    if (v == null) null
    else tr.name match {
      case "identity" => v
      case "void" => null
      case "bucket" => dt match {
        case LongType => bucketOf(hashLong(v.toString.toLong), tr.param)
        case IntegerType => bucketOf(hashLong(v.toString.toLong), tr.param)
        case StringType => bucketOf(hashString(v.toString), tr.param)
        case DateType =>
          bucketOf(hashLong(epochDays(v, dt)), tr.param)
        case other => throw new IOException(
          s"bucket transform on $other is not supported — " +
            "long/int/string/date only")
      }
      case "truncate" => dt match {
        case LongType =>
          val x = v.toString.toLong
          x - Math.floorMod(x, tr.param.toLong)
        case IntegerType =>
          val x = v.toString.toInt
          x - Math.floorMod(x, tr.param)
        case StringType =>
          val s = v.toString
          // truncate by CODE POINT (the spec truncates valid UTF-8;
          // a UTF-16 substring could split a surrogate pair)
          if (s.codePointCount(0, s.length) <= tr.param) s
          else s.substring(0, s.offsetByCodePoints(0, tr.param))
        case other => throw new IOException(
          s"truncate transform on $other is not supported")
      }
      case "day" => epochDays(v, dt).toInt
      case "month" =>
        val d = localDate(v, dt)
        (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
      case "year" => localDate(v, dt).getYear - 1970
      case other => throw new IOException(s"unhandled transform $other")
    }

  // ── Spark-column evaluation (export writer) ────────────────────────

  /** The transform as a Spark column over `src` of type `dt` — the
    * export writer's half; must agree exactly with [[literal]].
    * Everything but bucket is built-in (codegen'd) arithmetic; bucket
    * is a scalar UDF over the spec's murmur3 (export path only). */
  def column(tr: Transform, dt: DataType, src: Column): Column =
    tr.name match {
      case "identity" => src
      case "void" => lit(null)
      case "bucket" =>
        val n = tr.param
        dt match {
          case LongType | IntegerType =>
            udf((v: java.lang.Long) =>
              if (v == null) null
              else Int.box(bucketOf(hashLong(v), n)))
              .apply(src.cast("long"))
          case StringType =>
            udf((v: String) =>
              if (v == null) null
              else Int.box(bucketOf(hashString(v), n))).apply(src)
          case DateType =>
            udf((v: java.sql.Date) =>
              if (v == null) null
              else Int.box(bucketOf(hashLong(v.toLocalDate.toEpochDay),
                n))).apply(src)
          case other => throw new IOException(
            s"bucket transform on $other is not supported")
        }
      case "truncate" => dt match {
        case LongType | IntegerType =>
          src - pmod(src, lit(tr.param)).cast(dt)
        case StringType => substring(src, 1, tr.param)
        case other => throw new IOException(
          s"truncate transform on $other is not supported")
      }
      case "day" => dt match {
        case DateType => datediff(src, lit("1970-01-01")).cast("int")
        case TimestampType => utcEpochDay(src)
        case other => throw new IOException(
          s"day transform needs date/timestamp, got $other")
      }
      case "month" => dt match {
        case DateType =>
          ((year(src) - 1970) * 12 + month(src) - 1).cast("int")
        case TimestampType =>
          // spec: timestamp transforms are UTC. year()/month() on a
          // timestamp evaluate in the SESSION zone, so they'd diverge
          // from [[literal]]'s UTC prune endpoints on a non-UTC host
          // — derive from the UTC epoch day instead (same arithmetic
          // as "day", then calendar math on the zone-free DATE).
          val d = date_add(to_date(lit("1970-01-01")), utcEpochDay(src))
          ((year(d) - 1970) * 12 + month(d) - 1).cast("int")
        case other => throw new IOException(
          s"month transform needs date/timestamp, got $other")
      }
      case "year" => dt match {
        case DateType => (year(src) - 1970).cast("int")
        case TimestampType =>
          (year(date_add(to_date(lit("1970-01-01")),
            utcEpochDay(src))) - 1970).cast("int")
        case other => throw new IOException(
          s"year transform needs date/timestamp, got $other")
      }
      case other => throw new IOException(s"unhandled transform $other")
    }

  /** UTC epoch day of a timestamp column — floor division of the
    * epoch micros, matching [[epochDays]] exactly (pmod handles
    * pre-1970 values the way Math.floorDiv does). */
  private def utcEpochDay(src: Column): Column =
    ((unix_micros(src) - pmod(unix_micros(src),
      lit(86400000000L))) / lit(86400000000L)).cast("int")

  /** The Avro/partition-tuple type the transform produces over a
    * source of `dt` — int for bucket/day/month/year, the source type
    * for identity/truncate. */
  def resultAvroType(tr: Transform, dt: DataType): String =
    tr.name match {
      case "bucket" | "day" | "month" | "year" => "int"
      case _ => dt match {
        case LongType => "long"
        case IntegerType => "int"
        case StringType => "string"
        case other => throw new IOException(
          s"identity/truncate partitioning on $other is not supported")
      }
    }

  /** The Iceberg partition FIELD name convention: `<col>` for
    * identity, `<col>_<transform>` otherwise. */
  def fieldName(tr: Transform, src: String): String = tr.name match {
    case "identity" => src
    case "bucket" => s"${src}_bucket"
    case "truncate" => s"${src}_trunc"
    case other => s"${src}_$other"
  }
}
