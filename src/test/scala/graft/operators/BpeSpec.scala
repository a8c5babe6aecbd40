package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Distributed BPE training vs a sequential reference implementation:
  * same corpus, same tie-break, the merge lists must agree element-for-
  * element and the final symbolizations word-for-word.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Sequential reference BPE (Sennrich et al.): word-frequency table,
    * chars as initial symbols, k rounds of count → argmax → greedy
    * rewrite. */
  private def referenceBpe(wordCounts: Map[String, Long], k: Int)
    : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var syms: Map[String, Vector[String]] =
      wordCounts.map { case (w, _) => w -> w.split("").toVector }
    val merges = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var done = false
    while (round < k && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((w, ss) <- syms; i <- 0 until ss.length - 1)
        counts((ss(i), ss(i + 1))) =
          counts.getOrElse((ss(i), ss(i + 1)), 0L) + wordCounts(w)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((pa, pb), pn) => (-pn, pa, pb) }
        merges += ((a, b, n))
        syms = syms.map { case (w, ss) => w -> greedyMerge(ss, a, b) }
      }
      round += 1
    }
    (merges.result(), syms)
  }

  /** Greedy left-to-right merge — the fold BpeOps.applyMerge mirrors. */
  private def greedyMerge(ss: Vector[String], a: String, b: String)
    : Vector[String] = {
    val out = collection.mutable.ArrayBuffer.empty[String]
    for (s <- ss) {
      if (out.nonEmpty && out.last == a && s == b)
        out(out.length - 1) = a + b
      else out += s
    }
    out.toVector
  }

  test("distributed merges equal the sequential reference, in order") {
    val docs = Tables.documents(spark, sf)
    val k = 12
    val (merges, finalWords) = BpeOps.trainOnDocs(docs, k)

    val wordCounts = BpeOps.wordTable(docs)
      .select("word", "wc").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (refMerges, refSyms) = referenceBpe(wordCounts, k)

    assert(merges.length === refMerges.length)
    assert(merges === refMerges,
      "merge rules (and their weighted counts) must match in learned order")

    val distSyms = finalWords.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(distSyms.keySet === refSyms.keySet)
    val diff = distSyms.keys.filter(w => distSyms(w) != refSyms(w))
    assert(diff.isEmpty,
      s"symbolization differs for: ${diff.take(5).mkString(", ")}")
    // merges actually engaged: some multi-char symbol exists
    assert(distSyms.values.exists(_.exists(_.length > 1)))
  }

  test("pair counts are mergeable across corpus splits") {
    val docs = Tables.documents(spark, sf)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = BpeOps.pairCounts(BpeOps.wordTable(a))
      .unionByName(BpeOps.pairCounts(BpeOps.wordTable(b)))
      .groupBy("a", "b").agg(sum("n").as("n"))
    val whole = BpeOps.pairCounts(BpeOps.wordTable(docs))
    assert(merged.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(merged).count() === 0)
  }

  test("greedy fold is non-overlapping: 'aaa' under (a,a) -> [aa, a]") {
    import spark.implicits._
    val df = Seq(("aaa", 1L)).toDF("word", "wc")
      .withColumn("syms", split(col("word"), ""))
    val (merges, out) = BpeOps.train(df, 1)
    assert(merges.map(m => (m._1, m._2)) === Seq(("a", "a")))
    assert(out.select("syms").as[Seq[String]].head() === Seq("aa", "a"))
  }
}
