package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Hashing
import graft.functions.TextFns._
import graft.sources.{QueryDef, Tables}

/** Deduplication family for the training-data pipeline tier over
  * `documents`: exact (hash group-by), n-gram Jaccard (inverted-index
  * join — the oracle yardstick), MinHash+LSH banding and SimHash (the
  * 100 TB candidate-generation paths).
  *
  * All signature hashing is md5-derived (Hashing.md5Long60) — identical
  * in Spark and DuckDB — so every query here, including MinHash and
  * SimHash, has a full DuckDB oracle.
  *
  * Scale design:
  *  - One shared, cached shingle frame feeds q35/q36/q37 — the shingle
  *    pipeline (tokenize, 3-gram, explode, md5) runs once per (session,
  *    dir), not once per query, and the per-shingle string is hashed
  *    ONCE; the k=32 MinHash permutations are cheap integer mixes of
  *    that single hash, not k independent string hashes.
  *  - Candidates always come from equi-joins on band/chunk keys (shuffle
  *    on the key — linear in corpus + true-pair mass), never a pairwise
  *    product.
  *  - The exact-Jaccard tier blocks on (lang, shingle) with a size-ratio
  *    guard (lossless for Jaccard >= 0.5: if |A| > 2|B| then
  *    jac <= |B|/|A| < 0.5) AND a document-frequency cap
  *    (JACCARD_DF_CAP): hot shingles ("of the and …") are dropped from
  *    the inverted index before the self-join, so no key can square on
  *    web-scale text; q80 audits the dropped mass. At 100 TB the exact
  *    tier is the audit/oracle path run on samples; MinHash banding is
  *    the full-corpus path.
  */
object DedupOps {

  private val TOKS =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
  private val SHINGLES =
    s"list_sort(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)), i -> array_to_string(toks[i:i+2], ' '))))"

  /** Shared DuckDB CTE prefix: doc_id, lang, n_sh, one row per shingle,
    * plus the 60-bit md5 hash (mirrors `shingleHashes`). Shared with
    * SketchOps (HLL over the same shingle stream). */
  private[operators] val EXPLODED_SQL =
    s"""WITH t AS (SELECT doc_id, lang, $TOKS AS toks FROM documents),
       |sh AS (SELECT doc_id, lang, $SHINGLES AS shingles FROM t),
       |ex AS (
       |  SELECT doc_id, lang, len(shingles) AS n_sh, unnest(shingles) AS shingle
       |  FROM sh WHERE len(shingles) > 0),
       |hashed AS (
       |  SELECT *, ${Hashing.md5Long60Sql("shingle")} AS h60 FROM ex)""".stripMargin

  // Per-(session, dir) LRU caches — see [[FrameCache]] (factored out,
  // shared with GraphOps' co-purchase edge list).
  private def unpersisting = FrameCache.unpersisting

  /** One row per (doc, distinct word-3-gram): doc_id, lang, n_sh,
    * shingle, h60. Cached per (session, dir) and shared by
    * q35/q36/q37/q54/q58/q59 — tokenization, shingling, explode and the
    * md5 are paid once. */
  private val shingleCache = unpersisting

  /** The shingle pipeline over any documents-shaped frame (doc_id,
    * lang, text): one row per (doc, distinct 3-gram) with the 60-bit
    * md5 hash. Unpersisted — `shingleHashes` adds the per-(session,
    * dir) cache; the streaming sketch path applies it to micro-batches.
    *
    * Tokenize ONCE per doc and build the 3-grams with window leads
    * over the exploded token stream: everything downstream of the
    * generator is codegen'd / WindowExec-native. The one-Project
    * higher-order formulation (transform + array_distinct + sort)
    * measured 13x slower — lambda expressions run interpreted, and
    * outside codegen there is no common-subexpression elimination, so
    * filter pushdown re-evaluates the whole shingle pipeline per
    * consumer. Same rows out (verified: identical pair sets). */
  private[graft] def shingleFrameOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("lang"), posexplode(tokens(col("text"))))
    // ONE exchange serves all three windows: hash(doc_id) from the lead
    // window satisfies ClusteredDistribution(doc_id, shingle) for the
    // dedup window (partitioning cols ⊆ clustering cols) and
    // ClusteredDistribution(doc_id) for the count window, so Spark only
    // re-SORTS between them — no second or third shuffle. (The previous
    // dropDuplicates formulation paid a full hash exchange on
    // (doc_id, shingle) plus another on doc_id; PlanSpec pins the
    // single-exchange shape.)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val dedupW = Window.partitionBy("doc_id", "shingle").orderBy("pos")
    toks
      .withColumn("t1", lead("col", 1).over(w))
      .withColumn("t2", lead("col", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("lang"), col("pos"),
        concat_ws(" ", col("col"), col("t1"), col("t2")).as("shingle"))
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("doc_id")))
      .select(col("doc_id"), col("lang"), col("shingle"), col("n_sh"))
      .withColumn("h60", Hashing.md5Long60(col("shingle")))
  }

  private[operators] def shingleHashes(s: SparkSession, d: String): DataFrame =
    shingleCache.getOrBuild(s, d) {
      shingleFrameOf(Tables.documents(s, d))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  // ── MinHash constants: k=32 universal-hash mixes of the one h60 ────────
  // h_i = (A_i * (h60 % 2^30) + B_i) % (2^31 - 1); A_i odd < 2^25, so the
  // product stays < 2^55 — exact in int64 in both engines, no overflow
  // (DuckDB BIGINT overflow errors rather than wrapping). Constants are
  // md5-derived from fixed labels → deterministic and engine-independent.
  private val MINHASH_K = 32
  private val P31 = 2147483647L
  private val H30 = 1073741824L
  private val mixA: IndexedSeq[Long] =
    (0 until MINHASH_K).map(i => (Hashing.md5Long60(s"minhash_a_$i") % (1L << 25)) | 1L)
  private val mixB: IndexedSeq[Long] =
    (0 until MINHASH_K).map(i => Hashing.md5Long60(s"minhash_b_$i") % P31)

  private def mix(i: Int): Column =
    (lit(mixA(i)) * (col("h60") % H30) + lit(mixB(i))) % P31

  /** (doc_id, m0..m31): the MinHash signature frame — one row per doc,
    * k longs. Persisted + LRU-cached: a real pipeline computes
    * signatures once and serves banding, estimation, and incremental
    * re-dedup from them. */
  private val sigCache = unpersisting

  private def signatures(s: SparkSession, d: String): DataFrame =
    sigCache.getOrBuild(s, d) {
      signaturesOf(shingleHashes(s, d))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** (doc_id, m0..m31) signatures over any shingle frame (doc_id, h60) —
    * per-doc min of the k mixes. A signature depends only on its own
    * document's shingles, so batch-local computation is exact; the
    * streaming incremental path (DedupStream) applies this to each
    * arriving micro-batch. */
  private[graft] def signaturesOf(sh: DataFrame): DataFrame = {
    val minAggs = (0 until MINHASH_K).map(i => min(mix(i)).as(s"m$i"))
    sh.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
  }

  /** (doc_id, band, key) LSH band keys from a signature frame (8 bands
    * × 4 rows). Taking the frame as an argument (not rebuilding it) is
    * what makes INCREMENTAL dedup work: a new batch's bands join
    * against the stored corpus bands without recomputing anything for
    * the existing docs — ExtensionSpec proves the incremental union
    * equals the full-batch candidate set. */
  private[graft] def bandKeys(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until 8).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until 4).map(r => col(s"m${b * 4 + r}")): _*)
          .as("key"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Distinct candidate pairs (id_a < id_b) from a probe×index band
    * join. Full-batch: both sides the whole corpus. Incremental: probe =
    * new batch, index = full corpus. */
  private[graft] def candidatesBetween(probe: DataFrame,
                                           index: DataFrame): DataFrame = {
    val a = probe.select(col("band"), col("key"), col("doc_id").as("id_x"))
    val b = index.select(col("band"), col("key"), col("doc_id").as("id_y"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
  }

  /** Distinct LSH candidate pairs (id_a < id_b) from 8 bands × 4 rows —
    * shared by q36 (the listing) and q59 (estimation accuracy). */
  private def lshCandidates(s: SparkSession, d: String): DataFrame = {
    val bands = bandKeys(signatures(s, d))
    candidatesBetween(bands, bands)
  }

  /** Re-export for the incremental-dedup spec. */
  private[operators] def signatureFrame(s: SparkSession, d: String): DataFrame =
    signatures(s, d)

  /** DuckDB CTE chain ending in `sigs(doc_id, m0..m31)` (mirrors
    * `signatures`); extends EXPLODED_SQL. */
  private lazy val SIGS_SQL: String = {
    val minExprs = (0 until MINHASH_K).map(i =>
      s"min((${mixA(i)} * (h60 % $H30) + ${mixB(i)}) % $P31) AS m$i")
      .mkString(",\n       ")
    s"""$EXPLODED_SQL,
       |sigs AS (
       |  SELECT doc_id,
       |       $minExprs
       |  FROM hashed GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB CTEs `bands` + `cand` (mirrors `lshCandidates`); append
    * after SIGS_SQL. */
  private lazy val CAND_SQL: String = {
    val bandSelects = (0 until 8).map { b =>
      val ms = (0 until 4).map(r => s"m${b * 4 + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(',', $ms) AS key FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** Exact near-dup pairs (jaccard >= 0.5) from the inverted-index join —
    * the q35 body, shared with q54/q58's connected components. The pair
    * list is tiny (true near-dup mass) but costs an inverted-index join
    * to produce, so it is persisted and LRU-cached like the shingle
    * frame: the join runs once per (session, dir), not once per
    * consumer. */
  private val pairsCache = unpersisting

  private def jaccardPairs(s: SparkSession, d: String): DataFrame =
    pairsCache.getOrBuild(s, d) {
      computeJaccardPairs(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    }

  private def computeJaccardPairs(s: SparkSession, d: String): DataFrame =
    jaccardPairsFrom(shingleHashes(s, d), JACCARD_DF_CAP)

  /** Document-frequency cap for the exact tier's inverted index: a
    * (lang, shingle) key held by more docs than this is dropped from the
    * index BEFORE the self-join. Non-binding on the test corpora (max df
    * 14 at sf0.1) so q35's independent pairwise oracle still matches;
    * binding on web-scale text, where one stopword shingle ("of the
    * and") would otherwise contribute df² join rows. q80 audits where
    * it binds. */
  final val JACCARD_DF_CAP = 256

  /** The capped inverted index: (lang, shingle, doc_id, n_sh) minus
    * hot-shingle postings. The HOT set is tiny by construction (Zipf:
    * only stopword-grade shingles exceed the cap), so it broadcasts
    * into an anti-join — the index itself never shuffles here. The df
    * aggregation's shuffle carries one row per distinct (lang, shingle)
    * after map-side combine.
    *
    * Count gate: a pathological corpus (every shingle hot — adversarial
    * boilerplate, a broken tokenizer) could make the hot set too large
    * to broadcast safely; rather than force a giant broadcast, the gate
    * counts the hot set (one cheap job over the already-aggregated df
    * frame) and falls back to a shuffled anti-join when it exceeds
    * `hotBroadcastMax`. Same rows either way — only the join strategy
    * moves; Round7OpsSpec pins both paths. */
  private[graft] def cappedIndex(inv0: DataFrame, dfCap: Int,
                                 hotBroadcastMax: Long = 4000000L): DataFrame = {
    val inv = inv0.select("lang", "shingle", "doc_id", "n_sh")
    val hot = inv.groupBy("lang", "shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
      .select("lang", "shingle")
      .cache() // counted once here, probed once by the anti-join
    val hotSide =
      if (hot.count() <= hotBroadcastMax) broadcast(hot) else hot
    inv.join(hotSide, Seq("lang", "shingle"), "left_anti")
  }

  /** Exact-tier pairs over an exploded inverted index, df-capped.
    * Where the cap binds, intersections under-count by the dropped
    * shingles (n_a/n_b stay full-size), so jac never OVERstates — the
    * capped tier can only miss pairs glued together by ultra-common
    * shingles, never invent them. Round5OpsSpec shows the join mass
    * collapsing on an adversarial hot-shingle corpus; q80 reports the
    * dropped mass so the degradation is loud, not silent. */
  private[graft] def jaccardPairsFrom(inv0: DataFrame, dfCap: Int): DataFrame = {
    val kept = cappedIndex(inv0, dfCap)
    val a = kept.select(col("lang"), col("shingle"),
      col("doc_id").as("id_a"), col("n_sh").as("n_a"))
    val b = kept.select(col("lang"), col("shingle"),
      col("doc_id").as("id_b"), col("n_sh").as("n_b"))
    a.join(b, Seq("lang", "shingle"))
      .filter(col("id_a") < col("id_b") &&
        col("n_a") <= col("n_b") * 2 && col("n_b") <= col("n_a") * 2)
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("shared"))
      .select(col("id_a"), col("id_b"),
        (col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared"))).as("jac"))
      .filter(col("jac") >= 0.5)
  }

  /** Connected components of the near-dup pair graph: (doc_id, group_id)
    * for every doc in some pair, group_id = smallest id in its component.
    * Min-label propagation to fixpoint — each round is a full DataFrame
    * job (shuffle join + min aggregate; the driver only coordinates,
    * data never leaves executors), and the round count is the cluster
    * diameter, tiny for dedup graphs (near-dup clusters are dense).
    * localCheckpoint each round cuts exponential lineage growth. Shared
    * by q54 (group listing) and q58 (curation keep-decision). */
  /** Component results are localCheckpointed (already materialized), so
    * caching them is free to hold; q54 and q58 share one fixpoint run
    * per (session, dir) instead of re-iterating. Same locking/LRU
    * discipline as the shingle cache. */
  private val compCache = new FrameCache(_ => ()) // checkpointed; no unpersist

  private[operators] def components(s: SparkSession, d: String): DataFrame =
    compCache.getOrBuild(s, d)(computeComponents(s, d))

  private def computeComponents(s: SparkSession, d: String): DataFrame = {
    val pairs = jaccardPairs(s, d).select("id_a", "id_b")
    val edges = pairs
      .union(pairs.select(col("id_b"), col("id_a")))
      .toDF("src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var comp = edges.select(col("src").as("id")).distinct()
      .withColumn("root", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val viaNeighbors = edges.join(comp, edges("dst") === comp("id"))
        .select(edges("src").as("id"), col("root"))
      val next = comp.union(viaNeighbors)
        .groupBy("id").agg(min("root").as("root"))
        .localCheckpoint(true)
      changed = next
        .join(comp.withColumnRenamed("root", "prev_root"), "id")
        .filter(col("root") =!= col("prev_root")).count()
      comp = next
      rounds += 1
    }
    edges.unpersist(blocking = false)
    // Fail LOUDLY if the round cap truncated propagation: silently
    // returning non-minimal roots is a wrong answer, not a degraded one.
    // Dedup graphs converge in a handful of rounds (dense clusters); a
    // >50-diameter chain means the input isn't a near-dup graph — at
    // that shape switch to large-star/small-star (O(log n) rounds).
    require(changed == 0,
      s"connected components did not converge within $rounds rounds")
    comp.select(col("id").as("doc_id"), col("root").as("group_id"))
  }

  /** Connected components by alternating large-star/small-star rounds —
    * the O(log n)-round scale path (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) that `components`'
    * min-label fixpoint explicitly defers to for high-diameter graphs:
    * label propagation needs diameter rounds (a 100k-link chain = 100k
    * shuffles), star contraction needs O(log n) regardless of shape.
    *
    * Round shape: each star operation is one shuffle (a window min over
    * the neighbor list keyed on the center node) + a projection — no
    * driver-side data, no collect; the per-round edge set never exceeds
    * the input edge count (stars only re-point edges, never multiply
    * them). localCheckpoint between rounds cuts lineage. Convergence =
    * the small-star output equals its input as a set (checked with two
    * anti-joins, not a full sort).
    *
    * Input: pair frame with columns (id_a, id_b). Output: (doc_id,
    * group_id) for every node appearing in some pair, group_id = the
    * component's minimum id — the same contract as `components`. */
  private[graft] def componentsStar(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    // canonical directed edges: (u, v) with u > v, deduped
    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // large-star: per node u (over SYMMETRIC neighbors), connect every
    // strictly larger neighbor to m = min(Γ(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val wU = Window.partitionBy("u")
      sym.withColumn("m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    // small-star: per node u over its SMALLER neighbors Γ⁺(u) (directed
    // u > v), connect every member of Γ⁺(u) ∪ {u} except the min to
    // m = min(Γ⁺(u) ∪ {u})
    def smallStar(e: DataFrame): DataFrame = {
      val wU = Window.partitionBy("u")
      val withMin = e.withColumn("m", min(col("v")).over(wU))
      withMin.select(col("v").as("u"), col("m").as("v"))
        .union(withMin.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    var edges = canon(
      pairs.select(col("id_a").as("u"), col("id_b").as("v")))
      .localCheckpoint(true)
    var cnt = edges.count()
    var rounds = 0
    var converged = cnt == 0
    while (!converged && rounds < 30) {
      val next = canon(smallStar(largeStar(edges))).localCheckpoint(true)
      val nextCnt = next.count()
      // Set equality on the cheap: both sides are DISTINCT sets, so
      // equal counts + (next ∖ edges) = ∅ imply equality — one count
      // (already needed to watch convergence) plus ONE anti-join, and
      // the anti-join is skipped entirely while the edge count is
      // still shrinking toward the star fixpoint.
      converged = nextCnt == cnt &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edges = next
      cnt = nextCnt
      rounds += 1
    }
    require(converged, s"star contraction did not converge in $rounds rounds")
    // fixpoint edges are stars (node -> component min); the min itself
    // appears only on the right, so union its self-row back in
    edges.select(col("u").as("doc_id"), col("v").as("group_id"))
      .union(edges.select(col("v"), col("v")).distinct())
      .distinct()
  }

  /** Span-level exact dedup — the substring-dedup shape of Lee et al.
    * 2021 ("Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499): a token N-gram occurring in >= 2 DISTINCT
    * documents marks its occurrence span as duplicated; per document,
    * overlapping-or-adjacent marked spans merge into maximal regions.
    * Returns (doc_id, span_start, span_end, span_len) with 0-based
    * inclusive TOKEN indexes — the cut list a curation pass feeds to a
    * span-removal rewrite (the q58 curation pipeline consumes doc-level
    * decisions; this is the finer-grained variant the paper argues for:
    * ~depth-1 duplicated passages inside otherwise-unique pages).
    *
    * Scale design:
    *  - N-gram generation is per-row array work (transform over a
    *    sequence) — zero shuffle, stays in whole-stage codegen.
    *  - Cross-document detection is ONE shuffle keyed on the gram:
    *    min(doc_id) != max(doc_id) over the gram's window partition
    *    replaces the usual count(distinct) + semi-join back (which
    *    would shuffle the occurrence stream TWICE on the same key).
    *    Window state is two longs, so even a boilerplate gram shared by
    *    millions of documents costs O(1) memory — the skew cost is
    *    partition residence only, and the q35 df-cap playbook (cap the
    *    occurrence list, AQE skew split) applies unchanged at 100 TB.
    *  - The paper's suffix array finds arbitrary-length duplicates but
    *    needs a global sort; fixed-N gram marking is the standard
    *    distributed approximation — a duplicated run of >= N tokens is
    *    ALWAYS found (every window inside it is duplicated), shorter
    *    ones never. N trades recall floor vs false-mark rate.
    *  - Span merge is the classic interval-union window (running max of
    *    prior ends -> new-group flag -> cumulative group id), all on the
    *    doc_id partitioning: one narrow shuffle, bounded state. */
  private[graft] def duplicatedSpans(spark: SparkSession, dir: String,
                                     n: Int): DataFrame =
    duplicatedSpansOf(Tables.documents(spark, dir), n)

  /** Span marking over any (doc_id, text) frame — see duplicatedSpans;
    * split out so KernelPropSpec can drive generated corpora with
    * known injected passages through it. */
  private[graft] def duplicatedSpansOf(docs: DataFrame, n: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), x => x =!= lit("")).as("toks"))
    val occ = toks
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))))
      .toDF("doc_id", "ts", "gram")
    val perGram = Window.partitionBy("gram")
    val marked = occ
      .withColumn("mn", min("doc_id").over(perGram))
      .withColumn("mx", max("doc_id").over(perGram))
      .filter(col("mn") =!= col("mx"))
      .select(col("doc_id"), col("ts"), (col("ts") + n - 1).as("te"))
    val byStart = Window.partitionBy("doc_id").orderBy("ts")
    val prevEnd = max("te")
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("new_grp",
        when(prevEnd.isNull || col("ts") > prevEnd + 1, 1).otherwise(0))
      .withColumn("gid", sum("new_grp").over(byStart))
      .groupBy("doc_id", "gid")
      .agg(min("ts").cast("long").as("span_start"),
        max("te").cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
      .orderBy("doc_id", "span_start")
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
    // Explode shingles and equi-join on (lang, shingle): only pairs that
    // SHARE a shingle materialize, and |A∩B| falls out of a count. The
    // size-ratio guard right after the join is lossless for jac >= 0.5
    // and bounds the pair mass the aggregate sees (the oracle's pairwise
    // formulation carries the same guard in its join condition).
    QueryDef("q35_ngram_jaccard",
      (s, d) => jaccardPairs(s, d).orderBy("id_a", "id_b"),
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

    // ── MinHash + LSH banding: the scale path, with a full oracle ─────────
    // 32 permutations = integer mixes of the single md5-derived shingle
    // hash; 8 bands × 4 rows; candidates from an equi-join on (band, key).
    QueryDef("q36_minhash_lsh",
      (s, d) => lshCandidates(s, d).orderBy("id_a", "id_b"),
      Some(s"""$SIGS_SQL,
             |$CAND_SQL
             |SELECT id_a, id_b FROM cand
             |ORDER BY id_a, id_b""".stripMargin)),

    // ── MinHash accuracy: signature-match estimate vs exact Jaccard ───────
    // The statistical contract of the sketch, stated as a query: for
    // every LSH candidate pair, E[matching signature components / k] is
    // the true Jaccard. Estimate from the 32-component signatures; exact
    // from the inverted index restricted to the candidates (a candidate
    // that shares no shingle — a pure hash collision — scores exact 0).
    QueryDef("q59_minhash_estimate",
      (s, d) => {
        val cand = lshCandidates(s, d)
        val sigs = signatures(s, d)
        def side(tag: String) = sigs.toDF(sigs.columns.map(c =>
          if (c == "doc_id") s"id_$tag" else s"${tag}_$c"): _*)
        val matches = (0 until MINHASH_K)
          .map(i => when(col(s"a_m$i") === col(s"b_m$i"), 1).otherwise(0))
          .reduce(_ + _)
        val est = cand.join(side("a"), "id_a").join(side("b"), "id_b")
          .select(col("id_a"), col("id_b"),
            (matches.cast("double") / MINHASH_K).as("est_jac"))
        val inv = shingleHashes(s, d)
          .select(col("doc_id"), col("shingle"), col("n_sh"))
        val exact = cand
          .join(inv.select(col("doc_id").as("id_a"), col("shingle"),
            col("n_sh").as("n_a")), "id_a")
          .join(inv.select(col("doc_id").as("id_b"), col("shingle"),
            col("n_sh").as("n_b")), Seq("id_b", "shingle"))
          .groupBy("id_a", "id_b", "n_a", "n_b")
          .agg(count(lit(1)).as("shared"))
          .select(col("id_a"), col("id_b"),
            (col("shared").cast("double") /
              (col("n_a") + col("n_b") - col("shared"))).as("exact_jac"))
        est.join(exact, Seq("id_a", "id_b"), "left")
          .select(col("id_a"), col("id_b"),
            round(col("est_jac"), 6).as("est_jac"),
            round(coalesce(col("exact_jac"), lit(0.0)), 6).as("exact_jac"),
            round(abs(col("est_jac") - coalesce(col("exact_jac"), lit(0.0))), 6)
              .as("abs_err"))
          .orderBy("id_a", "id_b")
      },
      Some {
        val matchSum = (0 until MINHASH_K)
          .map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""$SIGS_SQL,
           |$CAND_SQL,
           |est AS (
           |  SELECT c.id_a, c.id_b,
           |         ($matchSum) / 32.0 AS est_jac
           |  FROM cand c JOIN sigs sa ON sa.doc_id = c.id_a
           |              JOIN sigs sb ON sb.doc_id = c.id_b),
           |exact AS (
           |  SELECT c.id_a, c.id_b,
           |         CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
           |           / len(list_distinct(list_concat(x.shingles, y.shingles)))
           |           AS exact_jac
           |  FROM cand c JOIN sh x ON x.doc_id = c.id_a
           |              JOIN sh y ON y.doc_id = c.id_b)
           |SELECT e.id_a, e.id_b, round(e.est_jac, 6) AS est_jac,
           |       round(coalesce(x.exact_jac, 0), 6) AS exact_jac,
           |       round(abs(e.est_jac - coalesce(x.exact_jac, 0)), 6) AS abs_err
           |FROM est e LEFT JOIN exact x USING (id_a, id_b)
           |ORDER BY id_a, id_b""".stripMargin
      }),

    // ── SimHash: 60-bit signature, near-dup via chunk banding, oracle ─────
    // 60 bit-weight sums over the shared hashed frame; 15 chunks × 4 bits,
    // so any pair with hamming <= 14 shares a clean chunk DETERMINISTICALLY
    // (pigeonhole) — strictly covering the hamming <= 12 output filter.
    QueryDef("q37_simhash",
      (s, d) => {
        val bitSums = (0 until 60).map(b =>
          sum(when(shiftright(col("h60"), b).bitwiseAND(1L) === 1L, 1L)
            .otherwise(-1L)).as(s"b$b"))
        val sim = shingleHashes(s, d)
          .groupBy("doc_id")
          .agg(bitSums.head, bitSums.tail: _*)
          .select(col("doc_id"),
            (0 until 60).map(b =>
              when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
              .reduce(_ + _).as("simhash"))
        val chunkStructs = (0 until 15).map(c =>
          struct(lit(c).as("chunk"),
            shiftright(col("simhash"), c * 4).bitwiseAND(15L).as("key")))
        val chunks = sim
          .select(col("doc_id"), col("simhash"),
            explode(array(chunkStructs: _*)).as("ck"))
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
      Some {
        val bitSums = (0 until 60).map(b =>
          s"sum(CASE WHEN (h60 // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b$b")
          .mkString(",\n       ")
        val simExpr = (0 until 60).map(b =>
          s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
        val chunkSelects = (0 until 15).map(c =>
          s"SELECT doc_id, simhash, $c AS chunk, (simhash // ${1L << (c * 4)}) % 16 AS key FROM sims")
          .mkString("\n  UNION ALL\n  ")
        s"""$EXPLODED_SQL,
           |bits AS (
           |  SELECT doc_id,
           |       $bitSums
           |  FROM hashed GROUP BY doc_id),
           |sims AS (SELECT doc_id, $simExpr AS simhash FROM bits),
           |chunks AS (
           |  $chunkSelects)
           |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
           |FROM chunks a JOIN chunks b
           |  ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id
           |WHERE CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) <= 12
           |ORDER BY id_a, id_b""".stripMargin
      }),

    // ── Connected components: near-dup pairs → dedup GROUPS ───────────────
    // Pairwise output isn't what a dedup pipeline keeps — it keeps one
    // representative per transitive duplicate CLUSTER. Min-label
    // propagation over the pair graph: each round every node adopts the
    // smallest id reachable in one more hop; fixpoint = component minimum.
    // Rounds are full DataFrame jobs (shuffle join + aggregate — the
    // driver only coordinates, data never leaves executors), and the
    // round count is the cluster DIAMETER, which for dedup graphs is
    // tiny (near-dup clusters are dense). The classic large-star/
    // small-star optimization halves rounds on adversarial chains; the
    // shape below is the standard one for bounded-diameter graphs.
    // localCheckpoint each round cuts the exponential lineage growth.
    QueryDef("q54_dedup_groups",
      (s, d) => {
        val comp = components(s, d)
        val sizes = comp.groupBy("group_id").agg(count(lit(1)).as("group_size"))
        comp.join(sizes, "group_id")
          .select(col("doc_id"), col("group_id"), col("group_size"))
          .orderBy("doc_id")
      },
      // Oracle: transitive closure by recursive CTE, component = min
      // reachable id — the declarative statement of the same fixpoint.
      Some(s"""WITH RECURSIVE $COMPONENT_CTES,
             |sizes AS (SELECT group_id, count(*) AS group_size FROM comp
             |          GROUP BY 1)
             |SELECT c.id AS doc_id, c.group_id, s.group_size
             |FROM comp c JOIN sizes s USING (group_id)
             |ORDER BY doc_id""".stripMargin)),

    // ── Benchmark contamination: train docs overlapping an eval set ───────
    // Decontamination for training corpora: a training document sharing
    // a large fraction of its 3-gram shingles with any benchmark/eval
    // document leaks the benchmark into training. Eval set here = every
    // 10th doc_id (a deterministic stand-in for an external benchmark
    // table — the operator takes any id predicate). Shape: the eval
    // side collapses to its DISTINCT shingle set (eval corpora are
    // small — broadcast at 100 TB train scale), then one semi-join-like
    // equi-join on the shingle feeds a per-doc count — linear in train
    // shingle mass, never pairwise in documents. Reuses the cached
    // shingle frame, so the tokenize/shingle/md5 pass is shared with
    // the dedup family.
    QueryDef("q68_contamination",
      (s, d) => {
        val sh = shingleHashes(s, d)
        val evalSet = sh.filter(col("doc_id") % 10 === 0)
          .select("shingle").distinct()
        sh.filter(col("doc_id") % 10 =!= 0)
          .join(broadcast(evalSet), "shingle")
          .groupBy("doc_id", "n_sh")
          .agg(count(lit(1)).as("n_hit"))
          .filter(col("n_hit") / col("n_sh") >= 0.2)
          .select(col("doc_id"), col("n_sh"), col("n_hit"),
            round(col("n_hit") / col("n_sh"), 6).as("overlap_frac"))
          .orderBy("doc_id")
      },
      Some(s"""$EXPLODED_SQL,
             |ev AS (
             |  SELECT DISTINCT shingle FROM hashed WHERE doc_id % 10 = 0),
             |hits AS (
             |  SELECT h.doc_id, h.n_sh, count(*) AS n_hit
             |  FROM hashed h JOIN ev USING (shingle)
             |  WHERE h.doc_id % 10 <> 0
             |  GROUP BY 1, 2)
             |SELECT doc_id, n_sh, n_hit,
             |       round(n_hit / CAST(n_sh AS DOUBLE), 6) AS overlap_frac
             |FROM hits
             |WHERE n_hit / CAST(n_sh AS DOUBLE) >= 0.2
             |ORDER BY doc_id""".stripMargin)),

    // ── Df-cap audit: where (and how hard) the exact tier degrades ────────
    // The capped index (q35) under-counts intersections wherever a
    // shingle's document frequency exceeds JACCARD_DF_CAP. This query
    // makes that degradation measurable per language: how many shingle
    // keys were dropped and how many index postings (join-input rows)
    // they carried. On the test corpora both are zero — the assertion
    // that the cap is a pure scale guard here, not a semantics change.
    QueryDef("q80_jaccard_df_audit",
      (s, d) => shingleHashes(s, d)
        .groupBy("lang", "shingle").agg(count(lit(1)).as("df"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_shingles"),
          max("df").as("max_df"),
          sum(when(col("df") > JACCARD_DF_CAP, 1L).otherwise(0L))
            .as("n_dropped"),
          sum(when(col("df") > JACCARD_DF_CAP, col("df")).otherwise(0L))
            .as("dropped_mass"))
        .orderBy("lang"),
      Some(s"""$EXPLODED_SQL,
             |dfs AS (
             |  SELECT lang, shingle, CAST(count(*) AS BIGINT) AS df
             |  FROM hashed GROUP BY 1, 2)
             |SELECT lang, count(*) AS n_shingles, max(df) AS max_df,
             |       CAST(sum(CASE WHEN df > $JACCARD_DF_CAP THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_dropped,
             |       CAST(sum(CASE WHEN df > $JACCARD_DF_CAP THEN df ELSE 0 END)
             |            AS BIGINT) AS dropped_mass
             |FROM dfs
             |GROUP BY 1
             |ORDER BY lang""".stripMargin)),

    // ── Incremental dedup: persist the signature index, probe a batch ─────
    // The production contract for a growing corpus: MinHash signatures
    // are computed ONCE per document and stored; each new batch probes
    // its band keys against the stored index without touching existing
    // docs' text. Here docs with doc_id % 10 == 0 play the "new batch",
    // the rest are the stored corpus: corpus signatures go to parquet
    // through the stage-and-swap writer, are read BACK, and the batch's
    // band keys join against the re-read index — so the listed pairs
    // prove the whole persist→reload→probe round trip (a signature
    // mangled by the write path would change the candidate set). A
    // MinHash signature depends only on its own document's shingles, so
    // the split is semantically exact, and the oracle states the same
    // cross-side band join over its own sigs CTE.
    QueryDef("q79_incremental_dedup",
      (s, d) => {
        val sigs = signatures(s, d)
        // Run-unique path (Scratch: per-app root, shutdown-hook
        // deleted) keyed by the dataset dir, so two concurrent harness
        // runs over the same data never share an index directory
        // (AtomicParquet is single-writer; a shared path could corrupt
        // a probe mid-query) and finished runs leave no /tmp garbage.
        val indexPath = graft.sources.Scratch.dir(s,
          "sig-index-" + Integer.toHexString(d.hashCode))
        graft.warehouse.AtomicParquet.overwrite(
          sigs.filter(col("doc_id") % 10 =!= 0), indexPath)
        val stored = s.read.parquet(indexPath)
        candidatesBetween(
          bandKeys(sigs.filter(col("doc_id") % 10 === 0)),
          bandKeys(stored))
          .orderBy("id_a", "id_b")
      },
      Some(s"""$SIGS_SQL,
             |$CAND_SQL
             |SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
             |       greatest(a.doc_id, b.doc_id) AS id_b
             |FROM bands a JOIN bands b
             |  ON a.band = b.band AND a.key = b.key
             |WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
             |ORDER BY id_a, id_b""".stripMargin)),

    // ── Span-level exact dedup: duplicated N-gram runs, interval-merged ───
    // N=6 on whitespace tokens: the synthetic corpus carries injected
    // cross-document passages (47 docs share >= 6-token runs at
    // sf0.01), so the output exercises real interval merging, not
    // single-gram spans. The oracle mirrors the min/max-over-gram
    // detection and the interval-union window clause for clause.
    QueryDef("q86_span_dedup",
      (s, d) => duplicatedSpans(s, d, n = 6),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(text, '\s+'),
             |                     x -> x != '') AS toks
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, unnest(range(1, len(toks) - 6 + 2)) AS i, toks
             |  FROM t WHERE len(toks) >= 6),
             |occ AS (
             |  SELECT doc_id, i - 1 AS ts, i + 6 - 2 AS te,
             |         array_to_string(toks[i:i+5], ' ') AS gram
             |  FROM g),
             |marked AS (
             |  SELECT doc_id, ts, te FROM (
             |    SELECT occ.*, min(doc_id) OVER (PARTITION BY gram) AS mn,
             |           max(doc_id) OVER (PARTITION BY gram) AS mx
             |    FROM occ)
             |  WHERE mn <> mx),
             |flagged AS (
             |  SELECT doc_id, ts, te,
             |         max(te) OVER (PARTITION BY doc_id ORDER BY ts
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |           AS prev_te
             |  FROM marked),
             |grp AS (
             |  SELECT doc_id, ts, te,
             |         sum(CASE WHEN prev_te IS NULL OR ts > prev_te + 1
             |                  THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY doc_id ORDER BY ts) AS gid
             |  FROM flagged)
             |SELECT doc_id,
             |       CAST(min(ts) AS BIGINT) AS span_start,
             |       CAST(max(te) AS BIGINT) AS span_end,
             |       CAST(max(te) - min(ts) + 1 AS BIGINT) AS span_len
             |FROM grp GROUP BY doc_id, gid
             |ORDER BY doc_id, span_start""".stripMargin)),

    // ── Canonical selection: the KEEP decision per near-dup group ─────────
    // Dedup ends with a choice, not just groups: per connected
    // component, keep the best member (longest document, doc_id
    // tiebreak) and record what the group cost. This is the
    // representative-selection step every dedup pipeline runs between
    // grouping and the rewrite; composed entirely from q54's components
    // and the documents table. The per-group window is dup-group-sized
    // (tiny by construction); group stats ride the same shuffle.
    QueryDef("q94_canonical_selection",
      (s, d) => {
        val comp = components(s, d)
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val members = comp.join(docs, "doc_id")
        val w = Window.partitionBy("group_id")
          .orderBy(col("n_chars").desc, col("doc_id"))
        members.withColumn("rk", row_number().over(w))
          .groupBy("group_id")
          .agg(count(lit(1)).as("n_members"),
            max(when(col("rk") === 1, col("doc_id"))).as("canonical_doc_id"),
            max(when(col("rk") === 1, col("n_chars"))).as("kept_chars"),
            sum(col("n_chars")).cast("long").as("total_chars"))
          .orderBy("group_id")
      },
      Some(s"""WITH RECURSIVE $COMPONENT_CTES,
             |m AS (
             |  SELECT comp.id AS doc_id, comp.group_id, d.n_chars
             |  FROM comp JOIN documents d ON d.doc_id = comp.id),
             |r AS (
             |  SELECT m.*, row_number() OVER (
             |    PARTITION BY group_id ORDER BY n_chars DESC, doc_id) AS rk
             |  FROM m)
             |SELECT group_id,
             |       count(*) AS n_members,
             |       max(CASE WHEN rk = 1 THEN doc_id END) AS canonical_doc_id,
             |       max(CASE WHEN rk = 1 THEN n_chars END) AS kept_chars,
             |       CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM r
             |GROUP BY group_id
             |ORDER BY group_id""".stripMargin)),

    // ── Star-contraction components on a HIGH-DIAMETER graph ──────────────
    // The q54 fixpoint needs diameter rounds; this query runs the
    // O(log n) large-star/small-star path on the graph shape that
    // breaks label propagation: per-(source, lang) CHAINS (each doc
    // linked to the next id in its bucket — diameter = bucket size,
    // hundreds at sf0.1, unbounded at corpus scale). The oracle is
    // closed-form: a chain's component minimum is its bucket minimum.
    // Buckets with one doc have no edge and so no output row (the
    // same nodes-in-some-pair contract as q54).
    QueryDef("q99_cc_star",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "source", "lang")
        val w = Window.partitionBy("source", "lang").orderBy("doc_id")
        val chain = docs.withColumn("nxt", lead("doc_id", 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(col("nxt").as("id_a"), col("doc_id").as("id_b"))
        componentsStar(chain).orderBy("doc_id")
      },
      Some("""SELECT doc_id, group_id FROM (
             |  SELECT doc_id,
             |         min(doc_id) OVER (PARTITION BY source, lang) AS group_id,
             |         count(*) OVER (PARTITION BY source, lang) AS n_in_bucket
             |  FROM documents)
             |WHERE n_in_bucket > 1
             |ORDER BY doc_id""".stripMargin)),

    // ── Incremental LSH index maintenance via the change feed ────────────
    // The dedup tier meets the lakehouse tier (the q162 discipline for
    // MinHash): documents live in a VERSIONED table, the stored band
    // index advances from the table's own change feed — new docs
    // shingle+sign+band as an O(changes) batch (signatures are doc-
    // local, so incremental == rebuild EXACTLY), deleted docs' band
    // rows anti-join out — never a corpus re-shingle. The oracle
    // recomputes signatures, bands, and candidate pairs from scratch
    // over the FINAL logical doc set, so a feed-missed insert, an
    // unexpunged deleted doc (ghost candidates), or bulk-vs-
    // incremental signature drift all break bucketed counts/sums.
    // (The gate rewrites the small index store wholesale; a production
    // index shards by band-key range so maintenance touches only
    // affected shards — the BAND-ROW COMPUTATION is the O(changes)
    // part either way.)
    QueryDef("q168_lsh_index_maintenance",
      (s, d) => {
        val idx = s.read.parquet(lshIndexPath(s, d))
        candidatesBetween(idx, idx)
          .groupBy((col("id_a") % 5).as("bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            sum("id_a").cast("long").as("sum_a"),
            sum("id_b").cast("long").as("sum_b"))
          .orderBy("bucket")
      },
      Some(s"""${sigsCandSqlOver(
               """SELECT doc_id, lang, text FROM documents
                 |  WHERE doc_id % 7 <> 2
                 |  UNION ALL
                 |  SELECT doc_id + 10000000, lang, text FROM documents
                 |  WHERE doc_id % 13 = 1""".stripMargin)}
             |SELECT id_a % 5 AS bucket, count(*) AS n_pairs,
             |       CAST(sum(id_a) AS BIGINT) AS sum_a,
             |       CAST(sum(id_b) AS BIGINT) AS sum_b
             |FROM cand
             |GROUP BY 1
             |ORDER BY bucket""".stripMargin)),

    // ── AllPairs/PPJoin prefix filtering: exact similarity join without ──
    // an inverted-index self-join on EVERY shingle (Bayardo et al.,
    // WWW'07; Xiao et al., WWW'08). Shingles get a GLOBAL total order —
    // (document frequency ASC, shingle) within the lang block — rarest
    // first; a doc with n distinct shingles enters the index with only
    // its first ℓ(n) = n − ceil(t·n) + 1 shingles in that order.
    // Completeness at Jaccard ≥ t = 0.6: J ≥ t implies the overlap
    // o ≥ t·max(|A|,|B|), so o ≥ ceil(t·n) on EACH side; if the two
    // prefixes were disjoint, the first common shingle in global order
    // would lie outside one doc's prefix, leaving that doc at most
    // ceil(t·n) − 1 suffix positions to hold all o common shingles —
    // contradiction. So every qualifying pair shares a PREFIX shingle.
    // 100 TB shape: join mass is bounded by RARE-shingle df — hot
    // shingles ("of the and …") sort LAST and never enter a prefix, so
    // no key can square; this derives q35/q80's tuned JACCARD_DF_CAP
    // from the threshold instead of a constant, with zero lost pairs.
    // Verification never does all-pairs: the candidate list (id_a, id_b)
    // joins per-doc shingle ARRAYS by id — two hash joins — and exact
    // Jaccard filters. The oracle computes the UNFILTERED all-pairs
    // ground truth at t = 0.6; result equality IS the completeness
    // proof of the prefix filter AND of the 3·max ≤ 5·min size guard
    // (both lossless by the algebra above, verified by the gate).
    QueryDef("q225_prefix_filter_join",
      (s, d) => {
        val t3 = 3 // Jaccard threshold 0.6 as the ratio 3/5: all-integer
        val t5 = 5 // prefix + size-guard arithmetic, no float thresholds
        val sh = shingleHashes(s, d) // (doc_id, lang, shingle, n_sh, …)
        val dfreq = sh.groupBy("lang", "shingle")
          .agg(count(lit(1)).as("df"))
        val ordW = Window.partitionBy("doc_id").orderBy("df", "shingle")
        // ceil(0.6·n) = (3n + 4) div 5 — exact integer ceiling
        val prefix = sh.join(dfreq, Seq("lang", "shingle"))
          .withColumn("rn", row_number().over(ordW))
          .filter(col("rn") <=
            col("n_sh") - expr(s"($t3 * n_sh + ${t5 - 1}) div $t5") + 1)
        // candidate pairs by IN-CELL expansion, not a prefix self-join:
        // the docs sharing a prefix shingle are collected into one cell
        // (bounded by prefix df — hot shingles never enter a prefix)
        // and ordered pairs expand map-side, so the join's exchange +
        // sort of the prefix stream disappears and each qualifying
        // pair emerges once per shared prefix shingle, exactly as the
        // join produced it (r16 optimization, guide §2.4; doc_id is
        // unique per cell, so array_sort gives id_a < id_b by
        // construction).
        // CELL-SIZE GUARD (r17, guide §5): the cell for shingle g holds
        // at most df(g) docs, and its O(cell²) pair expansion lives in
        // ONE task — a pathological prefix shingle must fail LOUDLY
        // before the quadratic explode, not OOM an executor minutes
        // in. The guard is an in-plan assertion (the chi2Report
        // raise_error discipline): cells at or under the cap pass
        // through untouched — same rows, same plan shape, one extra
        // codegen'd conditional — and an over-cap cell names itself.
        // The cap bounds pairs at CAP² = 16M per task, and the
        // structural argument stands: hot shingles sort LAST in the
        // (df, shingle) order and never enter a prefix, so prefix df
        // is small by construction — sf0.1 ground truth (DuckDB, 70k
        // cells): max cell 5 docs, max prefix df 7. A corpus that
        // trips this wants the df-capped MinHash tier (q36), not a
        // bigger buffer. (A df-split dual path — in-cell under the
        // cap, streaming self-join above — was measured and REJECTED:
        // the always-present join legs re-ran the full prefix
        // pipeline even with zero over-cap rows, serve 1.7 → 4.8 s.)
        val CELL_CAP = 4096
        val cand = prefix
          .groupBy("lang", "shingle")
          .agg(array_sort(collect_list(
            struct(col("doc_id"), col("n_sh")))).as("ds0"))
          .withColumn("ds",
            when(size(col("ds0")) <= CELL_CAP, col("ds0"))
              .otherwise(raise_error(format_string(
                s"q225: prefix cell for (%s, %s) holds %d docs — above " +
                  s"the $CELL_CAP in-cell expansion bound; this corpus' " +
                  "prefix df distribution needs the banded MinHash tier",
                col("lang"), col("shingle"), size(col("ds0"))))))
          .select(explode(flatten(transform(col("ds"), (a, i) =>
            transform(slice(col("ds"), i + 2, size(col("ds"))),
              b => struct(a.getField("doc_id").as("id_a"),
                b.getField("doc_id").as("id_b"),
                a.getField("n_sh").as("n_a"),
                b.getField("n_sh").as("n_b")))))).as("p"))
          .filter(col("p.n_b") * t3 <= col("p.n_a") * t5 &&
            col("p.n_a") * t3 <= col("p.n_b") * t5)
          .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
          .distinct()
        val sets = sh.groupBy("doc_id")
          .agg(collect_set("shingle").as("hs"), max("n_sh").as("n"))
        cand
          .join(sets.select(col("doc_id").as("id_a"),
            col("hs").as("hs_a"), col("n").as("n_a")), "id_a")
          .join(sets.select(col("doc_id").as("id_b"),
            col("hs").as("hs_b"), col("n").as("n_b")), "id_b")
          .withColumn("o", size(array_intersect(col("hs_a"), col("hs_b"))))
          .withColumn("jac", col("o").cast("double")
            / (col("n_a") + col("n_b") - col("o")))
          .filter(col("jac") >= 0.6)
          .select(col("id_a"), col("id_b"), col("jac"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, $TOKS AS toks FROM documents),
             |sh AS (SELECT doc_id, lang, $SHINGLES AS shingles FROM t),
             |sized AS (
             |  SELECT doc_id, lang, shingles, len(shingles) AS n_sh FROM sh
             |  WHERE len(shingles) > 0)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             |         / (a.n_sh + b.n_sh
             |            - len(list_intersect(a.shingles, b.shingles))) AS jac
             |FROM sized a JOIN sized b
             |  ON a.lang = b.lang AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             |      / (a.n_sh + b.n_sh
             |         - len(list_intersect(a.shingles, b.shingles))) >= 0.6
             |ORDER BY id_a, id_b""".stripMargin))
  )

  /** q168 scratch table: documents published as v0 of a versioned
    * table, then ONE keyed merge inserting near-dup copies
    * (doc_id + 10⁷, same text) and deleting a doc_id band. Once per
    * session. */
  private def lshTableRoot(s: SparkSession, d: String): String = {
    import graft.warehouse.VersionedParquet
    val root = graft.sources.Scratch.dir(s, "q168-lsh-table")
    if (VersionedParquet.currentVersion(s, root).isEmpty) {
      val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      VersionedParquet.publish(docs, root, keepVersions = 10)
      val inserts = docs.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("lang"),
          col("text"))
      val deletes = docs.filter(col("doc_id") % 7 === 2).select("doc_id")
      VersionedParquet.merge(s, root, inserts, deletes, Seq("doc_id"),
        keepVersions = 10)
    }
    root
  }

  /** The maintained band index: built once per session as v0-rebuild +
    * one feed-driven increment (inserts' bands computed from ONLY the
    * insert batch; deleted ids anti-joined out). */
  private def lshIndexPath(s: SparkSession, d: String): String = {
    import graft.warehouse.VersionedParquet
    val root = lshTableRoot(s, d)
    val idx = graft.sources.Scratch.dir(s, "q168-lsh-index")
    if (!new java.io.File(idx).exists()) {
      // v0 is the documents table published VERBATIM (lshTableRoot
      // publishes docs.select(doc_id, lang, text) as v0), so its band
      // keys are exactly the session-cached signature frame's — read
      // the cache instead of re-running tokenize + shingle + minhash
      // over the versioned copy (r17, guide §1.2; the q213/q35
      // sharing discipline — value-identical because the rows are)
      val idx0 = bandKeys(signatures(s, d))
      val feed = VersionedParquet.changes(s, root, 0, 1)
      val ins = feed.filter(col("_change_type") === "insert")
        .select("doc_id", "lang", "text")
      val delIds = feed.filter(col("_change_type") === "delete")
        .select("doc_id")
      val maintained = idx0
        .join(delIds, Seq("doc_id"), "left_anti")
        .unionByName(bandKeys(signaturesOf(shingleFrameOf(ins))))
      graft.warehouse.AtomicParquet.overwrite(maintained, idx)
    }
    idx
  }

  /** Parameterized DuckDB CTE chain `docs168 → … → cand` over an
    * arbitrary docs-shaped SELECT (mirrors shingle → signatures →
    * bandKeys → candidatesBetween). */
  private def sigsCandSqlOver(docsCte: String): String = {
    val minExprs = (0 until MINHASH_K).map(i =>
      s"min((${mixA(i)} * (h60 % $H30) + ${mixB(i)}) % $P31) AS m$i")
      .mkString(",\n       ")
    val bandSelects = (0 until 8).map { b =>
      val ms = (0 until 4).map(r => s"m${b * 4 + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(',', $ms) AS key FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH docs168 AS (
       |  $docsCte),
       |t AS (SELECT doc_id, lang, $TOKS AS toks FROM docs168),
       |sh AS (SELECT doc_id, lang, $SHINGLES AS shingles FROM t),
       |ex AS (
       |  SELECT doc_id, lang, len(shingles) AS n_sh,
       |         unnest(shingles) AS shingle
       |  FROM sh WHERE len(shingles) > 0),
       |hashed AS (
       |  SELECT *, ${Hashing.md5Long60Sql("shingle")} AS h60 FROM ex),
       |sigs AS (
       |  SELECT doc_id,
       |       $minExprs
       |  FROM hashed GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key
       |   AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** DuckDB CTE chain computing `comp(id, group_id)` — the recursive-CTE
    * mirror of `components`; prepend `WITH RECURSIVE`. Shared by q54 and
    * q58's oracles. */
  private[operators] lazy val COMPONENT_CTES: String =
    s"""t AS (
       |  SELECT doc_id, lang, $TOKS AS toks FROM documents),
       |sh AS (SELECT doc_id, lang, $SHINGLES AS shingles FROM t),
       |sized AS (
       |  SELECT doc_id, lang, shingles, len(shingles) AS n_sh FROM sh
       |  WHERE len(shingles) > 0),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sized a JOIN sized b
       |    ON a.lang = b.lang AND a.doc_id < b.doc_id
       |   AND a.n_sh <= b.n_sh * 2 AND b.n_sh <= a.n_sh * 2
       |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
       |        / len(list_distinct(list_concat(a.shingles, b.shingles)))
       |        >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src AS id, rch.r FROM edges e
       |  JOIN reach rch ON rch.id = e.dst),
       |comp AS (SELECT id, min(r) AS group_id FROM reach GROUP BY id)""".stripMargin
}
