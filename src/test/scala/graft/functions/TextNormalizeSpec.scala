package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** TextNormalize kernel contract: NFC composition, C0/C1 control
  * strip keeping newline and tab, the ASCII fast path returning the
  * input untouched, and whole-stage-codegen execution agreeing with
  * the interpreted path. (All non-ASCII in this file is written as
  * unicode escapes so the decomposed-vs-composed distinction stays
  * visible in review.) */
class TextNormalizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def norm(s: String): String =
    NormalizeKernels.nfcClean(UTF8String.fromString(s)).toString

  private val eAcuteComposed = "\u00e9"            // precomposed
  private val eAcuteDecomposed = "e\u0301"         // e + COMBINING ACUTE
  private val aRingComposed = "\u00c5"             // precomposed
  private val aRingDecomposed = "A\u030a"          // A + COMBINING RING

  test("NFC composition: decomposed sequences compose") {
    assert(norm(eAcuteDecomposed) === eAcuteComposed)
    assert(norm(aRingDecomposed) === aRingComposed)
    // already-composed text is untouched
    assert(norm("caf" + eAcuteComposed) === "caf" + eAcuteComposed)
  }

  test("control strip: C0/C1 go, newline and tab stay") {
    assert(norm("ab\u0007c") === "abc") // BEL
    assert(norm("a\nb\tc") === "a\nb\tc")
    assert(norm("a\rb") === "ab") // CR normalizes away
    assert(norm("a\r\nb") === "a\nb") // CRLF collapses to LF
    assert(norm("a\u0085b\u009fc") === "abc") // C1 range
    assert(norm("a\u007fb") === "ab") // DEL
    assert(norm("a\u0000b") === "ab") // NUL
  }

  test("ASCII fast path returns the very same UTF8String instance") {
    val in = UTF8String.fromString("plain ascii text, no controls\n")
    assert(NormalizeKernels.nfcClean(in) eq in)
  }

  test("non-Latin text passes through NFC unharmed") {
    val cjk = "\u65e5\u672c\u8a9e"
    assert(norm(cjk) === cjk)
    val emoji = new String(Character.toChars(0x1F600)) // 4-byte cp
    assert(norm(emoji) === emoji)
  }

  test("codegen and interpreted paths agree on a DataFrame") {
    import spark.implicits._
    val rows = Seq(
      eAcuteDecomposed + "\u0007 plusbell",
      "clean", null, aRingDecomposed + "\r\n")
    val df = rows.toDF("s")
      .select(col("s"), TextNormalize(col("s")).as("n"))
    val got = df.collect().map(r =>
      if (r.isNullAt(1)) null else r.getString(1))
    assert(got.toSeq === Seq(
      eAcuteComposed + " plusbell", "clean", null,
      aRingComposed + "\n"))
    // and over many rows (whole-stage codegen path)
    val n = spark.range(10000)
      .select(concat(lit("x " + eAcuteDecomposed),
        col("id").cast("string")).as("s"))
      .select(TextNormalize(col("s")).as("n"))
      .filter(col("n").startsWith("x " + eAcuteComposed)).count()
    assert(n === 10000L)
  }
}
