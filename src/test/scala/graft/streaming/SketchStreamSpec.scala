package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream/batch parity for incremental HLL maintenance: registers
  * folded in over multiple micro-batch arrivals must equal a
  * from-scratch batch build over the whole corpus — exact register
  * equality, not approximate-estimate agreement.
  */
class SketchStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("incrementally maintained HLL registers equal the batch sketch") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    val work = Files.createTempDirectory("graft-sketchstream")
    val watch = Files.createDirectory(work.resolve("landing")).toString
    val regs = work.resolve("hll_regs").toString
    val checkpoint = work.resolve("chk").toString

    // three interleaved slices, arriving as separate drops — every
    // language (and most buckets) spans slices, so the groupBy-max
    // merge is exercised across batches, not just appended
    for (i <- 0 until 3) {
      docs.filter(col("doc_id") % 3 === i)
        .write.mode("append").parquet(s"$watch/drop$i")
      SketchStream.run(spark, s"$watch/*", regs, checkpoint)
        .awaitTermination()
    }

    val streamed = spark.read.parquet(regs)
      .collect().map(_.toSeq).toSet
    val batch = SketchStream.batchRegisters(docs)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch,
      "maintained registers must be bit-identical to the batch build")

    // and therefore the estimates agree with q70's
    val est = SketchStream.estimates(spark, regs)
    val q70 = graft.SparkEntry.queries("q70_hll_distinct")(spark, sf)
      .select("lang", "hll_est")
    assert(est.collect().map(_.toSeq).toSet ===
      q70.collect().map(_.toSeq).toSet)
  }
}
