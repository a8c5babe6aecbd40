package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver's TPC-H-ish testdata
  * (TESTDATA.md). One lazy DataFrame per table; Catalyst pushes filters
  * and prunes columns into these scans — verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default. Read it as raw nanos (legacy conf) and floor-convert to
    * microsecond TimestampType — the same truncation DuckDB applies, so
    * oracle timestamps agree. `div` keeps the conversion in exact integer
    * arithmetic (ns values exceed 2^53, double math would corrupt them).
    *
    * NOTE the conf set here is SESSION-WIDE and persists after this call:
    * any later read of a parquet file with nano timestamps in the same
    * session will also see them as raw longs. Our own entry points
    * (Bench/Verify/specs) additionally pin it at session construction;
    * the defensive set here keeps `events` readable from a bare session. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

/** A named query over a testdata dir plus (optionally) its DuckDB oracle
  * SQL. Keeping the Spark definition and the oracle adjacent is what keeps
  * column names/types aligned — the driver's compare hashes by sorted
  * column name (builder prompt), so every computed column is aliased
  * identically on both sides, doubles are rounded identically, and
  * integer widths are cast to match.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
