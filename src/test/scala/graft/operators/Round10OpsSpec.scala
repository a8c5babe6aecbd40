package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing

/** Semantic properties of the round-10 operators that the per-query
  * oracle gate cannot state directly:
  *
  *  - HLL register maintenance (q227) is SPLIT-INVARIANT: however the
  *    ingest is batched, max-merged registers equal the one-shot build
  *    (associativity/commutativity), and re-applying a batch is a
  *    no-op (idempotence). This is the property that makes the stored
  *    daily sketch safe under replayed/duplicated feeds.
  *  - The prefix filter (q225) is COMPLETE against the unfiltered
  *    inverted-index join at its threshold: every pair the full join
  *    finds at Jaccard >= 0.6, the prefix-filtered path finds too
  *    (the gate proves equality vs DuckDB; this spec pins the
  *    containment against the in-engine q35 path, which runs at
  *    threshold 0.5 — a strictly larger pair set).
  *  - The RRF fusion (q226) ranks by the documented arithmetic: the
  *    fused score of every output row equals 10⁶ div (60+lex) +
  *    10⁶ div (60+vec) over its own rank columns.
  */
class Round10OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("q227 property: register maintenance is split-invariant and idempotent") {
    import graft.sources.Tables
    val hashed = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"),
        Hashing.md5Long60(col("user_id").cast("string")).as("h60"))
      .persist()
    val oneShot = SketchOps.registersOf(hashed, Seq("day"))

    // arbitrary 4-way split on a key unrelated to day or user
    val parts = (0 until 4).map(i =>
      SketchOps.registersOf(
        hashed.filter(abs(col("h60") % 4) === i), Seq("day")))
    val merged = parts.reduce(_ unionByName _)
      .groupBy("day", "bucket").agg(max("r").as("r"))
    assert(merged.except(oneShot).isEmpty && oneShot.except(merged).isEmpty,
      "4-way batched register build must equal the one-shot build")

    // idempotence: folding a batch in twice changes nothing
    val again = merged.unionByName(parts.head)
      .groupBy("day", "bucket").agg(max("r").as("r"))
    assert(again.except(oneShot).isEmpty && oneShot.except(again).isEmpty,
      "re-applying an already-merged batch must be a no-op")
    hashed.unpersist()
  }

  test("q225 property: prefix-filtered pairs at 0.6 are contained in the 0.5 inverted-index pairs") {
    val strict = graft.SparkEntry.queries("q225_prefix_filter_join")(spark, sf)
      .select("id_a", "id_b")
    val loose = graft.SparkEntry.queries("q35_ngram_jaccard")(spark, sf)
      .select("id_a", "id_b")
    assert(strict.except(loose).isEmpty,
      "every Jaccard>=0.6 pair is a Jaccard>=0.5 pair — the two " +
        "independent candidate-generation paths must agree on them")
  }

  test("q226 property: fused scores equal the RRF arithmetic of their own rank columns") {
    val out = graft.SparkEntry.queries("q226_hybrid_retrieval_rrf")(spark, sf)
    val bad = out.withColumn("expect",
        coalesce(expr("1000000 div (60 + cast(lex_rank as bigint))"), lit(0L))
          + coalesce(expr("1000000 div (60 + cast(vec_rank as bigint))"), lit(0L)))
      .filter(col("rrf_micro") =!= col("expect"))
    assert(bad.count() == 0, "rrf_micro must be the documented fusion arithmetic")
    assert(out.count() > 0 && out.count() <= 10)
  }
}
