package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Structured Streaming over the events table: the same windowed
  * transforms as the batch forms in graft.operators.EventOps, run through
  * `readStream` with watermarks. Batch/stream parity is the design: one
  * transform function, two execution modes — StreamingSpec proves the
  * memory-sink streaming run reproduces the batch answer.
  *
  * At scale this is the incremental path for the medallion architecture
  * (SURVEY.md §2.10): files land → readStream picks them up → windowed
  * state is bounded by the watermark; `maxFilesPerTrigger` bounds batch
  * size; checkpointLocation makes it exactly-once into a file sink.
  */
object EventStream {

  /** events schema as the streaming source sees it, parameterized by the
    * physical `ts` encoding (testdata generations vary — see
    * [[graft.sources.Tables.normalizeEventTs]]). */
  def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** The physical `ts` type of the parquet files under `path`, observed
    * via a batch-read schema peek (footer metadata only — no data scan).
    * A file stream source needs its schema declared up front, and a
    * declared type that disagrees with the footer corrupts or fails the
    * read, so observe rather than assume. Falls back to the current
    * generation's TIMESTAMP_NTZ when the dir has no files yet. */
  private def physicalTsType(spark: SparkSession, path: String) =
    scala.util.Try(spark.read.parquet(path).schema("ts").dataType)
      .getOrElse(org.apache.spark.sql.types.TimestampNTZType)

  /** Batch read of staged events files with the same ts normalization the
    * stream applies — the spec-side parity comparator. */
  def batchEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventTs(
      spark.read.schema(rawSchema(physicalTsType(spark, path))).parquet(path))
  }

  /** File-based streaming source. Spark's file stream source requires a
    * DIRECTORY to watch (it tails new files), so `path` must be a dir
    * containing events parquet file(s) — stage a copy when the source is
    * a bare file (see ExtensionSpec). */
  def readEvents(spark: SparkSession, path: String,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val reader = spark.readStream
      .schema(rawSchema(physicalTsType(spark, path)))
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    Tables.normalizeEventTs(reader.parquet(path))
  }

  /** Tumbling hourly counts per event type — watermarked so state is
    * dropped one hour past the window end. Works on either a batch or a
    * streaming DataFrame (same expressions). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Session windows (30-min gap) per user — stateful merge handled by
    * Spark's session_window with watermark-bounded state. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** Per-user running statistics carried across micro-batches. */
  final case class UserState(nEvents: Long, firstMs: Long, lastMs: Long)
  final case class UserStats(user_id: Long, n_events: Long,
                             first_ms: Long, last_ms: Long)

  /** Custom streaming state via flatMapGroupsWithState: per-user event
    * count and first/last-seen timestamps, merged incrementally as
    * batches arrive — the shape for stateful logic that windowed
    * aggregates can't express (counters, sessions with custom close
    * rules, cross-batch joins on entity state). Emits the user's updated
    * stats each batch; state is per-key and partitioned by user_id, so
    * it scales horizontally. NoTimeout here because the spec drives a
    * finite file set; production code sets a ProcessingTime/EventTime
    * timeout so idle keys age out of the store. */
  def userRunningStats(spark: SparkSession, events: DataFrame): Dataset[UserStats] = {
    import spark.implicits._
    events.select(col("user_id"), unix_millis(col("ts")).as("ms"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[UserState]) =>
          var s = state.getOption.getOrElse(UserState(0L, Long.MaxValue, Long.MinValue))
          rows.foreach { case (_, ms) =>
            s = UserState(s.nEvents + 1, math.min(s.firstMs, ms), math.max(s.lastMs, ms))
          }
          state.update(s)
          Iterator.single(UserStats(uid, s.nEvents, s.firstMs, s.lastMs))
      }
  }

  /** Streaming exact dedup: one row per event_id. Duplicates arriving
    * within the watermark horizon are dropped by keyed state; the state
    * is EVICTED once the watermark passes it — bounded memory under
    * continuous ingest, the property plain dropDuplicates (which keeps
    * all keys forever) lacks in streaming. Rows older than the watermark
    * are dropped as late data before reaching the operator — also
    * "emitted at most once". Batch form of the same contract:
    * dropDuplicates("event_id"). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type", "ts")

  /** Run a streaming transform to completion against a static file set
    * via the memory sink; returns the collected result table. Output
    * mode per operator class: complete (aggregations), update (stateful
    * per-key updates), append (at-most-once emitters like dedup). */
  private def runToMemoryMode(spark: SparkSession, df: DataFrame,
                              name: String, mode: String): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  def runToMemory(spark: SparkSession, df: DataFrame, name: String): DataFrame =
    runToMemoryMode(spark, df, name, "complete")

  def runToMemoryUpdate(spark: SparkSession, df: DataFrame, name: String): DataFrame =
    runToMemoryMode(spark, df, name, "update")

  def runToMemoryAppend(spark: SparkSession, df: DataFrame, name: String): DataFrame =
    runToMemoryMode(spark, df, name, "append")
}
