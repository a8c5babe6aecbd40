package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing: every derivation here is computable by the
  * same formula in Spark, in DuckDB SQL, and in plain JVM code, so the
  * driver's DuckDB oracle can hash-match queries whose semantics depend
  * on hash values (MinHash/SimHash signatures, LSH plane coefficients,
  * payload checksums). Spark-native hashes (xxhash64, hash) are faster
  * but oracle-opaque — use them only where the hash never reaches the
  * compared output.
  *
  * The common primitive is "md5 → first 15 hex chars → base-16 long":
  * a uniform 60-bit nonnegative value, identical in all three engines:
  *   Spark:  conv(substring(md5(x), 1, 15), 16, 10) cast long
  *   DuckDB: CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)
  *   JVM:    java.lang.Long.parseLong(md5hex.take(15), 16)
  */
object Hashing {

  /** Spark column: 60-bit md5-derived hash of a string column. Runs as
    * the native [[Md5Long60]] codegen kernel — value-identical to the
    * composed built-in form `conv(substring(md5(x),1,15),16,10)::long`
    * (HashKernelSpec pins the equality), minus its per-row hex-encode /
    * substring / base-16 re-parse allocations. */
  def md5Long60(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      Md5Long60(org.apache.spark.sql.graftbridge.ColumnBridge
        .expression(c.cast("string"))))

  /** DuckDB SQL fragment for the same value over expression `e`. */
  def md5Long60Sql(e: String): String =
    s"CAST(('0x' || substring(md5($e), 1, 15)) AS BIGINT)"

  /** JVM-side value for a literal string (used to precompute deterministic
    * constants — LSH plane coefficients, hash-mix multipliers — that are
    * then embedded as literals in BOTH the Spark plan and the oracle SQL). */
  def md5Long60(s: String): Long =
    md5Long60(s.getBytes("UTF-8"))

  /** Same over raw bytes (payload checksums). */
  def md5Long60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = d.take(8).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}
