package graft.warehouse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression helpers that resolve the T-SQL→Spark semantic traps
  * catalogued in SURVEY.md §2.9. These are expression *compositions* of
  * built-ins — never UDFs — so every use stays inside whole-stage codegen
  * and remains pushdown-friendly.
  */
object Cols {

  /** T1: SQL Server ANSI-padding equality treats 'R ' = 'R' as TRUE; Spark
    * doesn't. All categorical comparisons go through upper(trim(..)) so the
    * code→label CASE ladders (reference proc_load_silver.sql:96-102,
    * 180-185, 200-205) reproduce the reference's outputs on data that
    * genuinely carries trailing blanks ('R ', 'M ', 'F '). */
  def cleanCode(c: Column): Column = upper(trim(c))

  /** Null-or-blank test: SQL Server BULK INSERT materialises empty CSV
    * fields as '' while Spark's CSV reader yields null — `gen IS NULL OR
    * gen = ''` (proc_load_silver.sql:183) must catch both. */
  def nullOrBlank(c: Column): Column = c.isNull || trim(c) === ""

  /** Validated INT-yyyymmdd → DATE (proc_load_silver.sql:132-143): NULL for
    * non-positive or non-8-digit values, else parse. `try_to_date` (not
    * `to_date`) so residual garbage inside a well-formed 8-digit value
    * nulls out instead of raising under ANSI mode. T2: T-SQL LEN on the INT
    * is its digit count → length(cast(c as string)). */
  def intDateToDate(c: Column): Column =
    when(c <= 0 || length(c.cast("string")) =!= 8, lit(null).cast("date"))
      .otherwise(try_to_date(c.cast("string"), "yyyyMMdd"))

  /** T3: T-SQL DATEDIFF(month, a, b) counts *boundary crossings* —
    * (year(b)*12+month(b)) - (year(a)*12+month(a)) — NOT Spark's fractional
    * months_between. DuckDB's datediff('month',...) shares the boundary
    * semantics, keeping the oracle comparable (SURVEY.md §2.8). */
  def monthsDiff(a: Column, b: Column): Column =
    (year(b) * 12 + month(b)) - (year(a) * 12 + month(a))

  /** T3 (years): DATEDIFF(year, a, b) = year(b) - year(a), boundary count. */
  def yearsDiff(a: Column, b: Column): Column = year(b) - year(a)

  /** T8: divide guarded against divide-by-zero via NULLIF — identical
    * behavior in Spark and DuckDB, and safe under ANSI mode. */
  def safeDiv(a: Column, b: Column): Column = a / nullif(b, lit(0))

  /** T6: T-SQL `/` on two INTs is truncating integer division — the KPI
    * ratios (avg_order_value, avg_monthly_spend; 12_report_customers.sql:
    * 99-105) silently rely on it. True IntegralDivide (registered `div`
    * function) — exact over the full int64 range, truncate-toward-zero,
    * NULLIF guard folded in (div by NULL → NULL in both engines). */
  def intDiv(a: Column, b: Column): Column =
    call_function("div", a, nullif(b, lit(0)))
}
