package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** TextKernels/TextStat correctness: the native single-pass kernel must
  * be row-for-row identical to the regex formulations it replaced (which
  * the DuckDB oracles still state). Checked over the REAL document
  * corpus plus adversarial random strings (ASCII + Latin-1 + CJK +
  * whitespace runs, class boundaries, empty strings).
  */
class TextKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def regexEquivalents(df: org.apache.spark.sql.DataFrame) = df.select(
    TextStat(col("t"), TextKernels.AlnumLower).as("k_alnum"),
    length(regexp_replace(lower(col("t")), "[^a-z0-9]", "")).as("r_alnum"),
    TextStat(col("t"), TextKernels.Punct).as("k_punct"),
    length(regexp_replace(col("t"), "[a-zA-Z0-9\\s]", "")).as("r_punct"),
    TextStat(col("t"), TextKernels.TokenRuns).as("k_toks"),
    size(filter(split(lower(col("t")), "[^a-z0-9]+"), x => x =!= ""))
      .as("r_toks"),
    TextStat(col("t"), TextKernels.BpePieces).as("k_bpe"),
    regexp_count(col("t"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))
      .as("r_bpe"),
    col("t"))

  private def assertAllEqual(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = regexEquivalents(df)
      .filter(col("k_alnum") =!= col("r_alnum") ||
        col("k_punct") =!= col("r_punct") ||
        col("k_toks") =!= col("r_toks") ||
        col("k_bpe") =!= col("r_bpe"))
      .limit(5).collect()
    assert(bad.isEmpty, s"kernel/regex mismatch on: ${bad.mkString("; ")}")
  }

  test("kernel == regex on the real document corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("text").as("t"))
    assertAllEqual(docs)
  }

  test("kernel == regex on adversarial random strings") {
    import spark.implicits._
    val charGen: Gen[String] = Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B').map(_.toString),
      2 -> Gen.oneOf("!?.,;:-_()[]{}@#$%^&*<>\"'".toSeq).map(_.toString),
      1 -> Gen.choose(' ', 'ÿ').map(_.toString), // Latin-1 letters/symbols
      // incl. supplementary-plane strings: the 4-byte UTF-8 decode branch
      // must agree with the regex formulations too
      1 -> Gen.oneOf("你", "好", "é", "ß", "€",
        "😀", "𝕏", "🚀"))
    val strGen = Gen.listOfN(400,
      Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString)))
    val strings = strGen(Gen.Parameters.default, rng.Seed(7L)).get
    assertAllEqual((strings :+ "" :+ "  \t\n " :+ "a1B2 ß-ẞ"
      :+ "emoji 😀 mixed 𝕏 digits7 🚀!").toDF("t"))
  }

  test("TextStat is null-safe and codegen'd (no fallback to interpreted eval)") {
    // spark.range (not a local Seq, which constant-folds to a
    // LocalTableScan via interpreted eval) so the projection actually
    // runs through generated code.
    val df = spark.range(2)
      .select(when(col("id") === 0, "ab 12").otherwise(lit(null)).as("t"))
      .select(TextStat(col("t"), TextKernels.AlnumLower).as("n"))
    assert(df.orderBy(col("n").desc_nulls_last).collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq === Seq(4, -1))
    // the projection stays inside a WholeStageCodegen span
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.exists(_.toString.contains("text_stat")),
      s"TextStat must participate in whole-stage codegen:\n" +
        df.queryExecution.executedPlan)
  }

  test("q30 plan carries no regex expression after the kernel swap") {
    val q30 = graft.SparkEntry.queries("q30_text_quality")(
      spark, "/root/testdata/sf0.01")
    val expanded = q30.queryExecution.analyzed.toString.toLowerCase
    assert(!expanded.contains("regexp_replace"),
      "q30 char-class counting must use the native kernel, not regex")
  }
}
