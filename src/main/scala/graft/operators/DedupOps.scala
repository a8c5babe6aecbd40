package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{QueryDef, Tables}
import graft.functions.TextFns._

/** Deduplication family for the training-data pipeline tier over
  * `documents`: exact (hash group-by), n-gram Jaccard (blocked pair
  * verify — the oracle-checkable exact form), MinHash+LSH banding and
  * SimHash (the 100 TB candidate-generation paths; no SQL oracle — their
  * hash functions are Spark-native — so they're verified by ScalaTest
  * against the exact Jaccard results instead).
  *
  * Scale design: the exact pair query blocks on (lang, shingle-count
  * ratio ≤ 2 — lossless for Jaccard ≥ 0.5) to bound the quadratic
  * pair space; MinHash/LSH replaces it entirely at 100 TB, where
  * candidates come from an equi-join on band keys (shuffle on band
  * hash — linear in corpus size) rather than any pairwise product.
  */
object DedupOps {

  private val TOKS =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
  private val SHINGLES =
    s"list_sort(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)), i -> array_to_string(toks[i:i+2], ' '))))"

  /** doc_id, shingles (word 3-grams, distinct sorted), n_shingles. */
  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), shingles(tokens(col("text"))).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("n_sh", size(col("shingles")))

  /** MinHash signature: k=32 permutations simulated by seeded xxhash64,
    * LSH banding 8 bands × 4 rows.
    *
    * Implementation note: computed by exploding shingles and running k
    * plain `min(xxhash64(seed, shingle))` aggregates — higher-order
    * lambda expressions (transform/aggregate) fall out of whole-stage
    * codegen and run interpreted, which measured ~10× slower here; k
    * codegen'd min-aggregates over the exploded rows keep the whole
    * signature pass inside Tungsten. */
  private def minhashed(s: SparkSession, d: String, k: Int = 32): DataFrame = {
    val exploded = shingled(s, d)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val minAggs = (0 until k).map(i =>
      min(xxhash64(lit(i), col("sh"))).as(s"h$i"))
    exploded.groupBy("doc_id")
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  val queries: Seq[QueryDef] = Seq(

    // ── Exact dedup: hash group-by on normalized text ─────────────────────
    QueryDef("q34_dedup_exact",
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_doc_id"))
        .filter(col("n_copies") > 1)
        .orderBy("text_hash"),
      Some("""SELECT md5(text) AS text_hash, count(*) AS n_copies,
             |       min(doc_id) AS keep_doc_id
             |FROM documents
             |GROUP BY 1
             |HAVING count(*) > 1
             |ORDER BY text_hash""".stripMargin)),

    // ── Near-dup: word-3-gram Jaccard, inverted-index join (exact) ────────
    // Instead of a blocked pairwise product (quadratic), explode shingles
    // and equi-join on the shingle: only pairs that SHARE a shingle ever
    // materialize, and |A∩B| falls out of a count — the shape that scales
    // (shuffle on shingle key, linear in corpus + true-pair mass). The
    // result set is identical to the oracle's pairwise formulation:
    // jac = shared/(n_a + n_b - shared) over distinct shingle sets, and
    // pairs sharing nothing have jac 0 < 0.5 anyway.
    QueryDef("q35_ngram_jaccard",
      (s, d) => {
        val inv = shingled(s, d)
          .select(col("lang"), col("doc_id"), col("n_sh"),
            explode(col("shingles")).as("shingle"))
        val a = inv.select(col("lang"), col("shingle"),
          col("doc_id").as("id_a"), col("n_sh").as("n_a"))
        val b = inv.select(col("lang"), col("shingle"),
          col("doc_id").as("id_b"), col("n_sh").as("n_b"))
        a.join(b, Seq("lang", "shingle"))
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b", "n_a", "n_b")
          .agg(count(lit(1)).as("shared"))
          .select(col("id_a"), col("id_b"),
            (col("shared").cast("double") /
              (col("n_a") + col("n_b") - col("shared"))).as("jac"))
          .filter(col("jac") >= 0.5)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, $TOKS AS toks FROM documents),
             |sh AS (
             |  SELECT doc_id, lang, $SHINGLES AS shingles FROM t),
             |sized AS (
             |  SELECT doc_id, lang, shingles, len(shingles) AS n_sh FROM sh
             |  WHERE len(shingles) > 0)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             |         / len(list_distinct(list_concat(a.shingles, b.shingles)))
             |         AS jac
             |FROM sized a JOIN sized b
             |  ON a.lang = b.lang AND a.doc_id < b.doc_id
             | AND a.n_sh <= b.n_sh * 2 AND b.n_sh <= a.n_sh * 2
             |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             |         / len(list_distinct(list_concat(a.shingles, b.shingles)))
             |      >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),

    // ── MinHash + LSH banding: scale path (candidates via band equi-join) ─
    // No SQL oracle (xxhash64 is Spark-native); DedupSpec asserts recall
    // against q35's exact pairs.
    QueryDef("q36_minhash_lsh",
      (s, d) => {
        val bands = minhashed(s, d).select(col("doc_id"),
            explode(expr("transform(sequence(0, 7), b -> " +
              "named_struct('band', b, 'key', xxhash64(slice(sig, b * 4 + 1, 4))))"))
              .as("bk"))
          .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
        val a = bands.select(col("band"), col("key"), col("doc_id").as("id_a"))
        val b = bands.select(col("band"), col("key"), col("doc_id").as("id_b"))
        a.join(b, Seq("band", "key"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
          .orderBy("id_a", "id_b")
      },
      None),

    // ── SimHash: 64-bit signature, near-dup via chunk-match banding ───────
    // No SQL oracle; ExtensionSpec asserts the planted near-dups collide.
    // Same codegen strategy as minhash: explode shingles, 64 plain sum
    // aggregates (one per bit), assemble the signature from their signs.
    QueryDef("q37_simhash",
      (s, d) => {
        val exploded = shingled(s, d)
          .select(col("doc_id"), explode(col("shingles")).as("sh"))
          .select(col("doc_id"), xxhash64(col("sh")).as("h"))
        val bitSums = (0 until 64).map(b =>
          sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, 1L)
            .otherwise(-1L)).as(s"b$b"))
        val sim = exploded.groupBy("doc_id")
          .agg(bitSums.head, bitSums.tail: _*)
          .select(col("doc_id"),
            (0 until 64).map(b =>
              when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
              .reduce(_ + _).as("simhash"))
        // banding: 8 × 8-bit chunks — the pigeonhole guarantees a clean
        // chunk for hamming ≤ 7 (measured true near-dups reach 9; a
        // flip-free chunk then still exists with ~99.8% probability)
        val chunks = sim.select(col("doc_id"), col("simhash"),
            explode(expr("transform(sequence(0, 7), c -> named_struct(" +
              "'chunk', c, 'key', shiftright(simhash, c * 8) & 255))")).as("ck"))
          .select(col("doc_id"), col("simhash"),
            col("ck.chunk").as("chunk"), col("ck.key").as("key"))
        val a = chunks.select(col("chunk"), col("key"),
          col("doc_id").as("id_a"), col("simhash").as("sim_a"))
        val b = chunks.select(col("chunk"), col("key"),
          col("doc_id").as("id_b"), col("simhash").as("sim_b"))
        a.join(b, Seq("chunk", "key"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
          .distinct()
          .filter(col("hamming") <= 12)
          .orderBy("id_a", "id_b")
      },
      None)
  )
}
