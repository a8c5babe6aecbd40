package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Stream/batch parity for incremental near-dup detection: the union of
  * candidate pairs emitted across micro-batch arrivals must equal the
  * full-corpus LSH candidate set (q36), and the maintained signature
  * index must equal the batch signature build — exact equality.
  */
class DedupStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("streamed candidate pairs across drops equal the full-batch set") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    val work = Files.createTempDirectory("graft-dedupstream")
    val watch = Files.createDirectory(work.resolve("landing")).toString
    val index = work.resolve("sig_index").toString
    val pairs = work.resolve("pairs").toString
    val checkpoint = work.resolve("chk").toString

    // three interleaved slices: near-dup pairs in this corpus land both
    // within and across slices, so self-probe and index-probe are both
    // exercised
    for (i <- 0 until 3) {
      docs.filter(col("doc_id") % 3 === i)
        .write.mode("append").parquet(s"$watch/drop$i")
      DedupStream.run(spark, s"$watch/*", index, pairs, checkpoint)
        .awaitTermination()
    }

    val streamed = spark.read.parquet(pairs)
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.SparkEntry.queries("q36_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === full,
      "union of per-drop candidates must equal the full-corpus set")

    // the maintained index is bit-identical to the batch signature build
    val maintained = graft.warehouse.VersionedParquet.read(spark, index)
      .collect().map(_.toSeq).toSet
    val batch = DedupOps.signaturesOf(DedupOps.shingleFrameOf(docs))
      .collect().map(_.toSeq).toSet
    assert(maintained === batch)

    // delete propagation: dropping a doc removes its signature row, and
    // a fresh probe of the whole corpus pairs against everyone EXCEPT it
    val victim = streamed.head._1
    DedupStream.deleteDocs(spark, index, Seq(victim))
    val after = graft.warehouse.VersionedParquet.read(spark, index)
    assert(after.filter(col("doc_id") === victim).count() === 0)
    assert(after.count() === maintained.size - 1)
    val probeAll = DedupOps.candidatesBetween(
      DedupOps.bandKeys(DedupOps.signaturesOf(DedupOps.shingleFrameOf(docs))),
      DedupOps.bandKeys(after))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!probeAll.exists(p => p._1 == victim && p._2 == victim),
      "no self pair")
    // pairs where the victim is the INDEX side are gone; pairs between
    // the remaining docs are unaffected
    val expect = full.filterNot(p => p._1 == victim && p._2 == victim)
    assert(probeAll.subsetOf(expect))
    assert(full.filterNot(p => p._1 == victim || p._2 == victim)
      .subsetOf(probeAll))
  }

  test("index fold is idempotent under foreachBatch retry") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sigs = DedupOps.signaturesOf(DedupOps.shingleFrameOf(
      docs.filter(col("doc_id") % 3 === 0)))
    val stored = DedupOps.signaturesOf(DedupOps.shingleFrameOf(
      docs.filter(col("doc_id") % 3 =!= 0)))

    val once = DedupStream.foldIndex(stored, sigs)
    // a retried batch folds into an index that ALREADY contains this
    // batch's rows (overwrite landed, checkpoint commit didn't) — the
    // result must be identical, not doubled
    val twice = DedupStream.foldIndex(once, sigs)
    assert(twice.count() === once.count())
    assert(twice.collect().map(_.toSeq).toSet ===
      once.collect().map(_.toSeq).toSet)
    // no doc_id appears twice after a replay
    assert(twice.groupBy("doc_id").count()
      .filter(col("count") > 1).count() === 0)
  }
}
