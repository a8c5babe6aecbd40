package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money arithmetic over scaled integers.
  *
  * The testdata money columns (l_extendedprice, o_totalprice, c_acctbal, …)
  * carry 2-decimal values stored as doubles. Summing doubles is
  * order-dependent in the last ulps, and different engines (Spark's
  * partial/final aggregation vs DuckDB's sequential sum) legitimately
  * disagree there — which flips `round()` at half-cent ties and breaks
  * hash-comparison. The fix is the classic warehouse one: convert to
  * integer cents per row (exact — the per-row double is within an ulp of
  * the true cent value, so round() is unambiguous), aggregate in int64
  * (exact, order-independent), and produce the final double by one
  * division of exact integers (bit-identical in every IEEE engine).
  *
  * This is also the right 100 TB design: integer aggregation has no drift,
  * no ulp nondeterminism across retries/partitionings, and codegens to
  * cheap long arithmetic.
  *
  * Overflow headroom: cents×1 sums bound ~2^53 at petabyte scale;
  * revenue is scaled ×10^4 (cents × discount-percent), bounding exact
  * sums to ~9e15 — fine through sf1000; beyond that switch to DECIMAL(38).
  *
  * DuckDB oracle equivalents (mirror these exactly):
  *   cents:   CAST(round(x * 100) AS BIGINT)
  *   revC4:   CAST(round(l_extendedprice*100) AS BIGINT)
  *              * (100 - CAST(round(l_discount*100) AS BIGINT))
  *   sums:    CAST(sum(...) AS BIGINT)   -- DuckDB sum(BIGINT) is HUGEINT
  *   output:  sum_cents / 100.0   |   sum_c4 / 10000.0
  */
object Money {

  /** Per-row 2-decimal double → exact integer cents. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Per-row discount (0.00-0.99) → exact integer percent. */
  def pct(c: Column): Column = round(c * 100).cast("long")

  /** Net revenue ext*(1-disc) in currency×10^4 scaled integers. */
  def revC4(ext: Column, disc: Column): Column =
    cents(ext) * (lit(100L) - pct(disc))

  /** Scaled-int sum → currency double (exact division, bit-stable). */
  def c2(c: Column): Column = c.cast("double") / 100.0
  def c4(c: Column): Column = c.cast("double") / 10000.0

  /** Deterministic integer average: true truncating integer division
    * (Catalyst IntegralDivide via the registered `div` function — exact on
    * the full int64 range, unlike trunc-of-double which loses exactness
    * past 2^53). DuckDB mirror: `a // b` (same truncate-toward-zero
    * semantics, verified on negatives: -7 div 2 = -3 in both). */
  def intDivide(a: Column, b: Column): Column =
    call_function("div", a, b)
}
