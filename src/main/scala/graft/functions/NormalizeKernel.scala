package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for ingestion cleaning (the ftfy-lite
  * stage every web-scale corpus pipeline runs before tokenization):
  * NFC canonical composition (decomposed `e` + U+0301 becomes `é`, so
  * byte-identical text dedups byte-identically) followed by a strip
  * of the C0/C1 control characters that crash downstream tokenizers —
  * keeping `\n` and `\t`, the two controls that carry document
  * structure.
  *
  * Fast path: a pure-ASCII scan with no control characters returns
  * the input UTF8String UNTOUCHED (no String round trip) — the
  * overwhelmingly common case in a cleaned corpus, making the kernel
  * ~free on already-clean data. Only strings that need work pay the
  * java.text.Normalizer pass (the JDK's exact Unicode NFC — the same
  * table DuckDB's `nfc_normalize` implements, which is what lets the
  * oracle state this op declaratively). */
object NormalizeKernels {

  @inline private def isStrippedControl(cp: Int): Boolean =
    (cp < 0x20 && cp != '\n' && cp != '\t') || cp == 0x7F ||
      (cp >= 0x80 && cp <= 0x9F)

  /** Called from generated code (static forwarder) and nullSafeEval. */
  def nfcClean(s: UTF8String): UTF8String = {
    // fast path: ASCII without stripped controls is NFC by definition
    val len = s.numBytes
    var i = 0
    var clean = true
    while (clean && i < len) {
      val b = s.getByte(i) & 0xFF
      if (b >= 0x80 || isStrippedControl(b)) clean = false
      i += 1
    }
    if (clean) return s
    val composed = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(composed.length)
    var j = 0
    while (j < composed.length) {
      val cp = composed.codePointAt(j)
      if (!isStrippedControl(cp)) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native Catalyst expression wrapping NormalizeKernels.nfcClean:
  * whole-stage-codegen'd via one static call — no UDF serialization,
  * null-safe like any built-in. */
case class TextNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_normalize needs a string child, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "text_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeKernels.nfcClean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeKernels.nfcClean($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TextNormalize = copy(child = newChild)
}

object TextNormalize {
  def apply(c: Column): Column =
    ColumnBridge.column(TextNormalize(ColumnBridge.expression(c)))
}
