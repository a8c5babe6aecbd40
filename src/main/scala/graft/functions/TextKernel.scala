package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character/token counting kernel.
  *
  * The text-quality tier's hot path was regex-shaped: two
  * `regexp_replace` passes (each running an NFA AND materialising a
  * stripped copy of the document just to take its length) plus a
  * `regexp_count` and a split — per document, per query. Each of those
  * answers is a simple scan-and-count; this kernel computes it in one
  * forward pass over the code points with zero regex machinery and no
  * intermediate string.
  *
  * Modes (each mirrors a regex the DuckDB oracle still states
  * declaratively — the oracle is unchanged, only Spark's evaluation
  * strategy changes):
  *  - ALNUM_LOWER: codepoints whose lowercase is [a-z0-9]
  *      == length(regexp_replace(lower(s), '[^a-z0-9]', ''))
  *  - PUNCT: codepoints not [a-zA-Z0-9] and not Java-regex \s
  *      == length(regexp_replace(s, '[a-zA-Z0-9\s]', ''))
  *  - TOKEN_RUNS: maximal runs of lowercase-alnum codepoints
  *      == size(filter(split(lower(s), '[^a-z0-9]+'), _ != ''))
  *  - BPE_PIECES: ASCII-letter runs + digit runs + single other
  *      non-space chars
  *      == regexp_count(s, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')
  *
  * Caveat (documented, property-tested in TextKernelSpec): lowercasing
  * is per-codepoint (Character.toLowerCase), while `lower()` uses the
  * full string mapping. The two differ only for exotic expansion cases
  * (e.g. U+0130), where the per-codepoint count still agrees for
  * ALNUM_LOWER; TOKEN_RUNS could differ there. No such codepoint
  * appears in any Latin/CJK corpus this engine targets.
  */
object TextKernels {

  final val AlnumLower = 0
  final val Punct = 1
  final val TokenRuns = 2
  final val BpePieces = 3

  @inline private def isAsciiAlnumLower(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')

  @inline private def isAsciiAlnum(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
      (cp >= '0' && cp <= '9')

  /** Java-regex \s: [ \t\n\x0B\f\r]. */
  @inline private def isJavaSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
      cp == '\f' || cp == '\r'

  /** Called from generated code (static forwarder) and nullSafeEval.
    * Decodes the UTF-8 bytes in place — no java.lang.String copy of the
    * document per call (q30 calls three modes per row; a toString-based
    * loop would copy every document three times). Assumes valid UTF-8
    * (Spark's UTF8String invariant); a truncated trail sequence at the
    * end of the buffer is consumed defensively as a single unit. */
  def count(s: UTF8String, mode: Int): Int = {
    val len = s.numBytes
    var i = 0
    var n = 0
    // run-state: 0 = none, 1 = alnum-lower run (TOKEN_RUNS),
    // 'L' = letter run, 'D' = digit run (BPE_PIECES)
    var run = 0
    while (i < len) {
      val b0 = s.getByte(i) & 0xFF
      var step = 1
      var cp = b0
      if (b0 >= 0x80) {
        if ((b0 & 0xE0) == 0xC0 && i + 1 < len) {
          cp = ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F)
          step = 2
        } else if ((b0 & 0xF0) == 0xE0 && i + 2 < len) {
          cp = ((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
            (s.getByte(i + 2) & 0x3F)
          step = 3
        } else if ((b0 & 0xF8) == 0xF0 && i + 3 < len) {
          cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
            ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F)
          step = 4
        }
      }
      mode match {
        case AlnumLower =>
          if (isAsciiAlnumLower(Character.toLowerCase(cp))) n += 1
        case Punct =>
          if (!isAsciiAlnum(cp) && !isJavaSpace(cp)) n += 1
        case TokenRuns =>
          if (isAsciiAlnumLower(Character.toLowerCase(cp))) {
            if (run == 0) { n += 1; run = 1 }
          } else run = 0
        case BpePieces =>
          if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) {
            if (run != 'L') { n += 1; run = 'L' }
          } else if (cp >= '0' && cp <= '9') {
            if (run != 'D') { n += 1; run = 'D' }
          } else {
            run = 0
            if (!isJavaSpace(cp)) n += 1
          }
        case _ =>
          throw new IllegalArgumentException(s"unknown TextKernels mode $mode")
      }
      i += step
    }
    n
  }
}

/** Native Catalyst expression wrapping TextKernels.count: participates
  * in whole-stage codegen via a single static call — no UDF serialization,
  * no regex, null-safe like any built-in. */
case class TextStat(child: Expression, mode: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stat needs a string child, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "text_stat"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.count(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.count($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): TextStat =
    copy(child = newChild)
}

object TextStat {
  def apply(c: Column, mode: Int): Column =
    ColumnBridge.column(TextStat(ColumnBridge.expression(c), mode))
}
