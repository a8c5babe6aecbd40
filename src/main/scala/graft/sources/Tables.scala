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

  /** Adaptive scan fan-out for the CPU-heavy tables (documents,
    * embeddings, events — regex/hash/fold work per ROW dwarfs scan
    * cost). The testdata parquet files are single row-group, so
    * file-split parallelism is structurally impossible: every scan is
    * one task no matter how maxPartitionBytes is tuned, and a
    * tokenise+md5 pipeline runs on 1 of 32 cores. When the file is
    * small enough that Spark will plan ~one split, one cheap shuffle
    * (these files are <3 MB) hash-repartitions on the table's id key so
    * downstream work uses every core. At 100 TB inputs carry thousands
    * of row groups, the guard is false, and this is a no-op.
    *
    * Deliberately NOT applied to the relational tables: their per-row
    * work is cheap columnar arithmetic, and measured at sf0.1 the added
    * shuffle + 32-task scheduling cost more than the parallelism won
    * (q18 scans lineitem six times — six shuffles); their scale story
    * is real file splits, not a forced exchange. */
  private def fanOut(df: DataFrame, dir: String, name: String, key: String): DataFrame = {
    val sc = df.sparkSession.sparkContext
    // Hadoop FS sizing, not java.io.File: the table may be a DIRECTORY of
    // part files or live on a non-local filesystem — File.length() would
    // report ~0 there and force the shuffle onto arbitrarily large tables.
    val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val bytes =
      try path.getFileSystem(sc.hadoopConfiguration)
        .getContentSummary(path).getLength
      catch { case _: java.io.IOException => return df }
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val plannedSplits = math.max(1L, bytes / math.max(1L, maxSplit))
    if (plannedSplits * 2 < sc.defaultParallelism)
      df.repartition(sc.defaultParallelism,
        org.apache.spark.sql.functions.col(key))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** Normalize an events frame's `ts` to session-zoned microsecond
    * TimestampType, whatever the physical encoding. Testdata generations
    * have shipped `ts` two ways:
    *  - parquet TIMESTAMP(NANOS) — Spark 4 rejects it unless the legacy
    *    conf reads it as raw nano LONGS; floor-convert with `div` (exact
    *    integer arithmetic — ns values exceed 2^53, double math would
    *    corrupt them), the same truncation DuckDB applies;
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) — Spark infers
    *    TIMESTAMP_NTZ; cast to TimestampType (all graft sessions pin
    *    spark.sql.session.timeZone=UTC, so the cast is wall-clock
    *    preserving and agrees with DuckDB's naive read).
    * Dispatching on the OBSERVED type instead of hard-coding one keeps
    * every events consumer (batch queries, streams, specs) correct
    * across regenerations. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** NOTE the conf set here is SESSION-WIDE and persists after this call:
    * any later read of a parquet file with nano timestamps in the same
    * session will also see them as raw longs. Our own entry points
    * (Bench/Verify/specs) additionally pin it at session construction;
    * the defensive set here keeps legacy `events` readable from a bare
    * session. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fanOut(normalizeEventTs(apply(s, d, "events")), d, "events", "event_id")
  }
  def documents(s: SparkSession, d: String): DataFrame =
    fanOut(apply(s, d, "documents"), d, "documents", "doc_id")
  def embeddings(s: SparkSession, d: String): DataFrame =
    fanOut(apply(s, d, "embeddings"), d, "embeddings", "vec_id")
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
