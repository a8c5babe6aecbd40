package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

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

  /** events schema as the streaming source sees it (parquet NANOS read as
    * raw longs — same trick as Tables.events). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source. Spark's file stream source requires a
    * DIRECTORY to watch (it tails new files), so `path` must be a dir
    * containing events parquet file(s) — stage a copy when the source is
    * a bare file (see ExtensionSpec). */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  /** Run a streaming transform to completion against a static file set
    * via the memory sink; returns the collected result table. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
