package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the repo's engine-portable 60-bit hash (see
  * [[Hashing]]): the value of
  * `conv(substring(md5(x), 1, 15), 16, 10) :: long`, i.e. the first 60
  * bits of the MD5 digest as a nonnegative long — computed straight
  * from the digest bytes.
  *
  * Why it exists (optimization guide §4 "prefer codegen'd built-ins",
  * round-16 optimization pass): the composed built-in form pays, per
  * row, a 32-char hex encode to UTF8String (md5), a substring slice,
  * and a base-16 string re-parse (conv) — three allocations and two
  * string walks that exist only to move 60 bits from a byte array into
  * a long. This expression digests and bit-packs directly; the MD5
  * itself (the irreducible part — the value is the cross-engine
  * contract, DuckDB re-derives it) is the only remaining work, on a
  * thread-cached MessageDigest instead of a fresh instance per row.
  * Value-identical by construction: first 15 hex chars == first 60
  * bits == (first 8 digest bytes, big-endian) >>> 4. HashKernelSpec
  * pins equality against the composed built-in form on adversarial
  * and random inputs. */
object HashKernels {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from generated code (static forwarder) and nullSafeEval. */
  def md5Long60(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    val hi =
      ((digest(0) & 0xFFL) << 56) | ((digest(1) & 0xFFL) << 48) |
        ((digest(2) & 0xFFL) << 40) | ((digest(3) & 0xFFL) << 32) |
        ((digest(4) & 0xFFL) << 24) | ((digest(5) & 0xFFL) << 16) |
        ((digest(6) & 0xFFL) << 8) | (digest(7) & 0xFFL)
    hi >>> 4
  }
}

object BitKernels {
  /** The value of `length(bin(v))` — the binary-string length Spark's
    * built-in computes by ALLOCATING the base-2 string per row — as
    * two integer ops: 64 − numberOfLeadingZeros(v) for v ≠ 0, and 1
    * for v = 0 (bin(0) = "0"); negative values have bit 63 set, so
    * nlz = 0 gives 64, exactly bin's 64-char rendering. Used by the
    * HLL register rank (rho = 55 − binlen) and the HDR-sketch octave
    * (msb = binlen − 1), where it replaced a per-row string
    * allocation in the corpus-scan hot path (r16 optimization, guide
    * §4 expression choice). The ORACLE SQL keeps length(bin(...)) —
    * the contract is the value, pinned by HashKernelSpec. */
  def binLength(v: Long): Long =
    if (v == 0L) 1L else 64L - java.lang.Long.numberOfLeadingZeros(v)
}

/** Whole-stage-codegen'd `length(bin(v))` twin — see BitKernels. */
case class BinLength(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bin_length needs a long child, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "bin_length"
  override protected def nullSafeEval(input: Any): Any =
    BitKernels.binLength(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BitKernels.binLength($c)")
  override protected def withNewChildInternal(
      newChild: Expression): BinLength = copy(child = newChild)
}

object BinLength {
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      BinLength(org.apache.spark.sql.graftbridge.ColumnBridge
        .expression(c.cast("long"))))
}

/** Whole-stage-codegen'd Catalyst expression wrapping
  * HashKernels.md5Long60 — one static call, null-safe, no UDF
  * serialization. */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long60 needs a string child, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long60"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.md5Long60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.md5Long60($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Long60 = copy(child = newChild)
}
