package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.{DedupOps, SketchOps}
import graft.warehouse.AtomicParquet

/** Incremental sketch maintenance: keep per-language HyperLogLog
  * registers up to date as document drops arrive, without ever
  * rescanning the corpus.
  *
  * This is why the sketch tier stores REGISTERS rather than estimates
  * (SketchOps doc): the (lang, bucket) -> max(rho) frame is a
  * commutative monoid, so each micro-batch folds in with one
  * union + groupBy-max against the stored state — O(m · languages)
  * state regardless of corpus size, and the maintained registers are
  * IDENTICAL to a from-scratch batch build over everything seen
  * (SketchStreamSpec proves equality, not approximation). The same
  * shape maintains the q74 Bloom words (bit_or) and q75 CM cells (sum);
  * HLL is the demonstrated instance because register equality is the
  * strictest of the three contracts.
  *
  * The per-batch state swap is AtomicParquet's stage-then-swap — with a
  * transactional table format this body would be a MERGE, same as the
  * CRM incremental path (CrmStream).
  */
object SketchStream {

  /** documents.parquet schema (TESTDATA.md) for the file-source stream. */
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Registers over one batch of documents. */
  private[streaming] def batchRegisters(docs: DataFrame): DataFrame =
    SketchOps.registersOf(DedupOps.shingleFrameOf(docs))

  /** Merge new registers into stored state: union + per-bucket max. */
  private[streaming] def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("lang", "bucket").agg(max("r").as("r"))

  /** Per-language estimates from the maintained state at `regsPath`. */
  def estimates(spark: SparkSession, regsPath: String): DataFrame =
    SketchOps.estimateOf(spark.read.parquet(regsPath))
      .select("lang", "hll_est")

  /** Watch `watchDir` for document parquet drops; maintain the register
    * table at `regsPath`. Caller awaits/stops the query. */
  def run(spark: SparkSession, watchDir: String, regsPath: String,
          checkpoint: String): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(watchDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val incoming = batchRegisters(batch)
        // Existence checked explicitly (not caught): a transient read
        // failure must fail the batch, not silently restart the sketch
        // from this batch's registers alone.
        val p = new org.apache.hadoop.fs.Path(regsPath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val current =
          if (fs.exists(p)) spark.read.parquet(regsPath)
          else incoming.limit(0)
        AtomicParquet.overwrite(mergeRegisters(current, incoming), regsPath)
        ()
      }
      .start()
}
