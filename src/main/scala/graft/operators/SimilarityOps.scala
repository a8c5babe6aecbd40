package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.sources.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Baseline: brute-force cosine top-k (q38) — exact, linear scan, the
  * correctness yardstick. Scale path: random-hyperplane LSH (q40) —
  * the query vector hashes to a bucket, candidates come from an
  * equi-join on the bucket key (never a pairwise product), and only the
  * bucket's members pay the exact cosine rerank. Near-dup pairs (q46)
  * block on the label column (metadata blocking) with an exact cosine
  * verify; the label-free variant at 100 TB is q40's band machinery
  * applied pairwise.
  *
  * Hyperplane coefficients are md5-derived integers precomputed on the
  * JVM (Hashing.md5Long60) and embedded as LITERALS in both the Spark
  * plan and the DuckDB oracle — deterministic, engine-independent, and
  * codegen-friendly (the dot products are unrolled multiply-adds inside
  * whole-stage codegen, not interpreted higher-order lambdas, which
  * measured ~10x slower here).
  */
object SimilarityOps {

  /** Per-(session, dir) LRU for q231's synthetic labeled-embedding
    * frame (persisted; eviction unpersists — see [[FrameCache]]). */
  private val q231EmbCache = FrameCache.unpersisting

  /** dot(a, b): native codegen kernel (graft.functions.VectorDot) —
    * ascending-index multiply-add, the same summation order as the
    * interpreted aggregate/zip_with fold it replaced and as the DuckDB
    * mirror: list_sum(list_transform(range(1, 65),
    *   i -> CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE))) */
  private def dot(a: String, b: String) =
    graft.functions.VectorDot(col(a), col(b))

  private def normSq(a: String) = dot(a, a)

  /** cosine(a,b) with the exact same expression shape on both sides. */
  private def cosine(a: String, b: String) =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  private val DIMS = 64

  /** Multi-table LSH layout: L hash tables × B random hyperplanes each.
    * Table t's key is the B-bit sign pattern of planes t*B .. t*B+B-1.
    * A vector is a candidate if it shares ANY table's key with the query
    * (OR-amplification) — the standard recall/candidate-fraction knob.
    * On this near-uniform synthetic corpus (top-10 cosines ~0.3-0.5,
    * i.e. no genuinely close neighbors) the measured recall@10 is ~0.5
    * at ~25% candidate fraction; on clustered data the same machinery
    * concentrates — tighter neighbors → exponentially higher collision
    * probability per table. DEMONSTRATED, not asserted: Round5OpsSpec
    * measures recall@10 = 1.0 for both LSH and IVF on a deterministic
    * 8-cluster corpus (the case that matters for real embeddings). */
  private val TABLES = 16
  private val BITS = 6

  /** Deterministic pseudo-random coefficient row in [-500, 499] (scale
    * is irrelevant for sign tests / distance ratios) — md5-derived, so
    * the oracle recomputes the identical values from the same labels.
    * Single source for q40's hyperplanes AND q62's projection matrix;
    * a derivation change must hit both or oracle parity breaks. */
  private def coefRow(prefix: String, row: Int): IndexedSeq[Double] =
    (0 until DIMS).map(i =>
      (Hashing.md5Long60(s"${prefix}_${row}_$i") % 1000 - 500).toDouble)

  private val planeCoef: IndexedSeq[IndexedSeq[Double]] =
    (0 until TABLES * BITS).map(p => coefRow("plane", p))

  /** The plane matrix as a 96-row DataFrame (p, cs[64]) — broadcast-
    * joined against the vectors, one projection fold per (vector, plane)
    * row. Projections-as-a-join beats unrolling all 96×64 multiply-adds
    * into one Project (which produces a pathological codegen unit), scales
    * embarrassingly (the matrix broadcasts, vectors never shuffle), and
    * mirrors the oracle's CROSS JOIN planes CTE shape exactly. */
  private def planesDF(s: SparkSession): DataFrame = {
    import s.implicits._
    planeCoef.zipWithIndex.map { case (cs, p) => (p, cs) }.toDF("p", "cs")
  }

  /** (vec_id, t, key): table t's B-bit key from the sign pattern of its
    * planes — sign bits summed into the key by one group-by over the
    * projection rows. Works over any embeddings-shaped frame. */
  private def tableKeysOf(e: DataFrame): DataFrame =
    e.crossJoin(broadcast(planesDF(e.sparkSession)))
      .select(col("vec_id"),
        expr(s"p div $BITS").as("t"),
        when(graft.functions.VectorDot(col("embedding"), col("cs")) > 0,
          expr(s"shiftleft(1, p % $BITS)")).otherwise(lit(0)).as("bit"))
      .groupBy("vec_id", "t")
      .agg(sum("bit").as("key"))

  // ── ANN search bodies, parameterized by the vector frame ───────────────
  // The registered queries bind these to Tables.embeddings; the recall
  // spec (Round5OpsSpec) binds them to a deterministic CLUSTERED frame,
  // where the recall story actually matters — on clustered data the
  // same machinery concentrates: recall@10 = 1.0 for both paths there.

  /** Exact brute-force cosine top-k vs `queryId` — the yardstick. */
  private[graft] def bruteTopK(e: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        cosine("embedding", "qvec").as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Multi-table LSH: bucket-key equi-join candidates, exact rerank. */
  private[graft] def lshTopK(e: DataFrame, queryId: Long, k: Int): DataFrame = {
    val keys = tableKeysOf(e)
    val qb = keys.filter(col("vec_id") === queryId)
      .select(col("t"), col("key"))
    val qv = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"))
    keys.join(broadcast(qb), Seq("t", "key"))
      .filter(col("vec_id") =!= queryId)
      .select("vec_id").distinct()  // a vector may collide in several tables
      .join(e, Seq("vec_id"))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("label"),
        cosine("embedding", "qvec").as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** BATCH LSH retrieval: every query vector at once. One band-key
    * equi-join carries ALL queries against the shared hash tables —
    * the production inference shape (a retrieval service scores a
    * batch, not a vector at a time), and the plan q40 cannot show: per
    * query it would broadcast one key set; here candidates come keyed
    * by (q_id, vec_id) from a single join, reranks share one scan, and
    * per-query top-k is a q_id-partitioned window. At scale the query
    * side is a frame, not a broadcast — swap the broadcast hint off
    * and the same plan shuffles on q_id. */
  private[graft] def batchLshTopK(e: DataFrame, every: Long,
                                  k: Int): DataFrame = {
    val keys = tableKeysOf(e)
    val qKeys = keys.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("q_id"), col("t"), col("key"))
    val cand = keys.join(broadcast(qKeys), Seq("t", "key"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()
    val qVecs = e.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    cand.join(e, Seq("vec_id"))
      .join(broadcast(qVecs), Seq("q_id"))
      .select(col("q_id"), col("vec_id"), col("label"),
        cosine("embedding", "qvec").as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .orderBy("q_id", "rk")
  }

  /** Exact batch top-k (brute force) for every query vector — the
    * recall yardstick for q103. Inherently a linear scan per query
    * (that is what makes it the yardstick); the query batch broadcasts
    * so the corpus never shuffles. */
  private[graft] def batchBruteTopK(e: DataFrame, every: Long,
                                    k: Int): DataFrame = {
    val qv = e.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    e.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine("embedding", "qvec").as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "vec_id", "rk")
  }

  /** IVF: sampled coarse centroids, probed lists, exact rerank. */
  private[graft] def ivfTopK(e: DataFrame, queryId: Long, k: Int,
                             nCents: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = e.filter(col("vec_id") =!= queryId).orderBy("vec_id")
      .limit(nCents)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("embedding"), col("cent_id"),
        cosine("embedding", "cvec").as("ccos"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    val assigned = scored.withColumn("rk", row_number().over(wAssign))
    val lists = assigned.filter(col("rk") === 1)
      .select(col("vec_id"), col("label"), col("embedding"), col("cent_id"))
    val probes = assigned
      .filter(col("vec_id") === queryId && col("rk") <= nProbe)
      .select(col("cent_id"))
    val qv = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"))
    lists.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("label"),
        cosine("embedding", "qvec").as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Batch IVF retrieval from a PERSISTED index — the production ANN
    * lifecycle q47 (in-session build) and q97 (batch LSH) each show half
    * of: centroids and cent_id-PARTITIONED posting lists are written to
    * parquet once (the index build), read BACK, and the whole query
    * batch is served from the stored index. The listed neighbors prove
    * the persist→reload→probe round trip — an embedding mangled by the
    * write path, a dropped list partition, or a wrong partition column
    * changes the output. Probing is a broadcast join on cent_id against
    * the partitioned lists (eligible for dynamic partition pruning at
    * scale: only probed lists' files are read); rerank cost is listed
    * members only. */
  private[graft] def storedIvfBatch(s: SparkSession, d: String, every: Long,
                                    k: Int, nCents: Int = 16,
                                    nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(s, d)
    val cents = e.orderBy("vec_id").limit(nCents)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    val lists = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("embedding"), col("cent_id"),
        cosine("embedding", "cvec").as("ccos"))
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("label"), col("embedding"), col("cent_id"))
    val tag = Integer.toHexString(d.hashCode)
    val listsPath = graft.sources.Scratch.dir(s, s"ivf-lists-$tag")
    val centsPath = graft.sources.Scratch.dir(s, s"ivf-cents-$tag")
    graft.warehouse.AtomicParquet.overwritePartitioned(
      lists, listsPath, Seq("cent_id"))
    graft.warehouse.AtomicParquet.overwrite(cents, centsPath)
    val storedLists = s.read.parquet(listsPath)
    val storedCents = s.read.parquet(centsPath)

    val qv = e.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("qcos").desc, col("cent_id"))
    val probes = qv.crossJoin(broadcast(storedCents))
      .select(col("q_id"), col("cent_id"),
        cosine("qvec", "cvec").as("qcos"))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= nProbe)
      .select("q_id", "cent_id")
    val wTop = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    storedLists.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(qv), Seq("q_id"))
      .select(col("q_id"), col("vec_id"), col("label"),
        cosine("embedding", "qvec").as("cos_sim"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("label"), col("cos_sim"),
        col("rk").cast("int").as("rk"))
      .orderBy("q_id", "rk")
  }

  /** SemDeDup cluster assignment: each vector to its nearest of the k
    * seed centroids (k smallest vec_ids — deterministic so the DuckDB
    * oracle mirrors it; production swaps in k-means|| centroids without
    * touching the downstream shape). Returns
    * (vec_id, cluster, embedding, nrm). */
  private[graft] def semAssign(spark: SparkSession, dir: String,
                               k: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        sqrt(normSq("embedding")).as("nrm"))
    val seeds = e.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
        col("nrm").as("cnrm"))
    val scored = e.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"),
        (dot("embedding", "cvec") / (col("nrm") * col("cnrm"))).as("cs"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("cs").desc, col("cid"))
    scored.withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cid").as("cluster"),
        col("embedding"), col("nrm"))
  }

  /** SemDeDup drop list: a vector is dropped when a more senior
    * (smaller vec_id) cell-mate sits at cosine >= tau. See the q87
    * QueryDef for the full design rationale. */
  private[graft] def semDedup(spark: SparkSession, dir: String,
                              k: Int, tau: Double): DataFrame = {
    val asg = semAssign(spark, dir, k)
    val a = asg.select(col("cluster"), col("vec_id").as("keeper"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = asg.select(col("cluster"), col("vec_id").as("dropped"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("cluster"))
      .filter(col("keeper") < col("dropped"))
      .filter((dot("emb_a", "emb_b")
        / (col("nrm_a") * col("nrm_b"))) >= tau)
      .groupBy("cluster", "dropped")
      .agg(min("keeper").as("kept_by"))
      .select(col("dropped").as("vec_id"), col("cluster"), col("kept_by"))
      .orderBy("vec_id")
  }

  /** DuckDB CTEs computing the same (vec_id, table, key) rows: the plane
    * coefficients are recomputed in SQL from the same md5 formula, so no
    * giant literal matrix is embedded. */
  private val KEYS_SQL =
    s"""WITH planes AS (
       |  SELECT p.p AS p, list_transform(range(0, $DIMS), i ->
       |           CAST(CAST(('0x' || substring(md5('plane_' || p.p || '_' || i), 1, 15))
       |                     AS BIGINT) % 1000 - 500 AS DOUBLE)) AS cs
       |  FROM range(0, ${TABLES * BITS}) p(p)),
       |proj AS (
       |  SELECT e.vec_id, e.label, e.embedding, p.p,
       |         CASE WHEN list_sum(list_transform(range(1, ${DIMS + 1}),
       |                i -> CAST(e.embedding[i] AS DOUBLE) * p.cs[i])) > 0
       |              THEN 1 ELSE 0 END AS s
       |  FROM embeddings e CROSS JOIN planes p),
       |keys AS (
       |  SELECT vec_id, label, embedding, p // $BITS AS t,
       |         CAST(sum(s * (1 << (p % $BITS))) AS BIGINT) AS key
       |  FROM proj GROUP BY vec_id, label, embedding, p // $BITS)""".stripMargin

  private val COS_Q =
    """list_sum(list_transform(range(1, 65),
      |         i -> CAST(embedding[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))
      |       / (sqrt(list_sum(list_transform(range(1, 65),
      |            i -> CAST(embedding[i] AS DOUBLE)
      |                 * CAST(embedding[i] AS DOUBLE))))
      |          * sqrt(list_sum(list_transform(range(1, 65),
      |            i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))))""".stripMargin

  val queries: Seq[QueryDef] = Seq(

    // ── Brute-force cosine top-k vs a fixed query vector (vec_id 0) ───────
    QueryDef("q38_cosine_topk",
      (s, d) => bruteTopK(Tables.embeddings(s, d), 0, 10),
      Some(s"""WITH q AS (SELECT embedding AS qvec FROM embeddings
             |           WHERE vec_id = 0)
             |SELECT vec_id, label,
             |       $COS_Q
             |         AS cos_sim
             |FROM embeddings CROSS JOIN q
             |WHERE vec_id != 0
             |ORDER BY cos_sim DESC, vec_id
             |LIMIT 10""".stripMargin)),

    // ── Per-label centroid norm: grouped vector aggregation ───────────────
    // posexplode to (label, dim, value) then per-dimension SUM — exact,
    // order-independent shuffle aggregation with O(1) state per group
    // (unlike collect_list, which buffers every vector of a label in one
    // aggregation buffer and OOMs on a popular label at scale).
    QueryDef("q39_label_centroid",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val dims = e.select(col("label"), posexplode(col("embedding")))
          .groupBy(col("label"), col("pos"))
          .agg(sum(col("col").cast("double")).as("dim_sum"))
        val norms = dims.groupBy("label")
          .agg(sqrt(sum(col("dim_sum") * col("dim_sum"))).as("norm"))
        val counts = e.groupBy("label").agg(count(lit(1)).as("n_vecs"))
        counts.join(norms, Seq("label"))
          .select(col("label"), col("n_vecs"),
            round(col("norm") / col("n_vecs"), 6).as("centroid_norm"))
          .orderBy("label")
      },
      // round(…,6) at output pins the last-ulp difference between Spark's
      // partial/final double sums and DuckDB's sequential sum.
      Some("""WITH dims AS (
             |  SELECT label, i,
             |         sum(CAST(embedding[i] AS DOUBLE)) AS dim_sum
             |  FROM embeddings, range(1, 65) r(i)
             |  GROUP BY label, i),
             |per_label AS (
             |  SELECT label, sqrt(sum(dim_sum * dim_sum)) AS norm
             |  FROM dims GROUP BY label),
             |counts AS (SELECT label, count(*) AS n_vecs FROM embeddings
             |           GROUP BY label)
             |SELECT c.label, c.n_vecs,
             |       round(p.norm / c.n_vecs, 6) AS centroid_norm
             |FROM counts c JOIN per_label p ON c.label = p.label
             |ORDER BY c.label""".stripMargin)),

    // ── Multi-table LSH ANN search: the 100 TB retrieval path ─────────────
    // query vector (vec_id 0) → one B-bit key per hash table → equi-join
    // candidates sharing ANY table key → exact cosine rerank → top-k.
    // Candidates come from the (t, key) equi-join — never a pairwise
    // product; at scale only the colliding bucket members pay the rerank.
    // ExtensionSpec reports recall against q38's brute force.
    QueryDef("q40_ann_lsh",
      (s, d) => lshTopK(Tables.embeddings(s, d), 0, 10),
      Some(s"""$KEYS_SQL,
             |qk AS (SELECT t, key, embedding AS qvec FROM keys
             |       WHERE vec_id = 0),
             |cand AS (
             |  SELECT DISTINCT k.vec_id, k.label, k.embedding, qk.qvec
             |  FROM keys k JOIN qk ON k.t = qk.t AND k.key = qk.key
             |  WHERE k.vec_id != 0)
             |SELECT vec_id, label,
             |       $COS_Q
             |         AS cos_sim
             |FROM cand
             |ORDER BY cos_sim DESC, vec_id
             |LIMIT 10""".stripMargin)),

    // ── IVF ANN search: coarse quantizer + probed lists + exact rerank ────
    // The inverted-file alternative to q40's hash tables: K sampled
    // centroids partition the corpus into lists (one assignment pass —
    // at scale the centroids come from k-means|| instead of sampling,
    // the shape is identical); the query probes its NPROBE nearest
    // lists and only their members pay the exact rerank. Candidate
    // discovery is a broadcast join against K=16 centroids plus an
    // equi-join on list id — never a pairwise product.
    QueryDef("q47_ann_ivf",
      (s, d) => ivfTopK(Tables.embeddings(s, d), 0, 10),
      Some(s"""WITH cents AS (
             |  SELECT vec_id AS cent_id, embedding AS cvec
             |  FROM embeddings WHERE vec_id != 0 ORDER BY vec_id LIMIT 16),
             |scored AS (
             |  SELECT e.vec_id, e.label, e.embedding, c.cent_id,
             |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
             |           list_sum(list_transform(range(1, 65),
             |             i -> CAST(e.embedding[i] AS DOUBLE)
             |                  * CAST(c.cvec[i] AS DOUBLE)))
             |           / (sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(e.embedding[i] AS DOUBLE)
             |                     * CAST(e.embedding[i] AS DOUBLE))))
             |              * sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(c.cvec[i] AS DOUBLE)
             |                     * CAST(c.cvec[i] AS DOUBLE)))))
             |           DESC, c.cent_id) AS rk
             |  FROM embeddings e CROSS JOIN cents c),
             |lists AS (
             |  SELECT vec_id, label, embedding, cent_id FROM scored
             |  WHERE rk = 1),
             |probes AS (
             |  SELECT cent_id FROM scored WHERE vec_id = 0 AND rk <= 4),
             |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
             |SELECT l.vec_id, l.label,
             |       $COS_Q
             |         AS cos_sim
             |FROM lists l JOIN probes p ON l.cent_id = p.cent_id
             |     CROSS JOIN q
             |WHERE l.vec_id != 0
             |ORDER BY cos_sim DESC, vec_id
             |LIMIT 10""".stripMargin)),

    // ── Embedding-cosine near-dup pairs: metadata blocking + exact verify ─
    // Blocking on `label` bounds the pair space to within-block products
    // (the classic dedup blocking shape); each candidate pair pays one
    // exact dot product — per-vector norms are precomputed once, not per
    // pair. At 100 TB with no blocking metadata, the band equi-join of
    // q40's bucket machinery replaces the label join.
    QueryDef("q46_embedding_neardup",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"), col("embedding"),
            sqrt(normSq("embedding")).as("nrm"))
        val a = e.select(col("label"), col("vec_id").as("id_a"),
          col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
        val b = e.select(col("label"), col("vec_id").as("id_b"),
          col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
        a.join(b, Seq("label"))
          .filter(col("id_a") < col("id_b"))
          .select(col("label"), col("id_a"), col("id_b"),
            (dot("emb_a", "emb_b") / (col("nrm_a") * col("nrm_b")))
              .as("cos_sim"))
          .filter(col("cos_sim") >= 0.4)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, embedding,
             |         sqrt(list_sum(list_transform(range(1, 65),
             |           i -> CAST(embedding[i] AS DOUBLE)
             |                * CAST(embedding[i] AS DOUBLE)))) AS nrm
             |  FROM embeddings)
             |SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
             |       list_sum(list_transform(range(1, 65),
             |         i -> CAST(a.embedding[i] AS DOUBLE)
             |              * CAST(b.embedding[i] AS DOUBLE)))
             |         / (a.nrm * b.nrm) AS cos_sim
             |FROM e a JOIN e b
             |  ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE list_sum(list_transform(range(1, 65),
             |         i -> CAST(a.embedding[i] AS DOUBLE)
             |              * CAST(b.embedding[i] AS DOUBLE)))
             |         / (a.nrm * b.nrm) >= 0.4
             |ORDER BY id_a, id_b""".stripMargin)),

    // ── Random-projection dimensionality reduction: 64 → 8 dims ──────────
    // The storage/recall knob between full vectors and LSH bits (JL
    // lemma: pairwise distances survive within ~1/sqrt(k)). Same
    // machinery as q40's hyperplanes: the md5-derived projection matrix
    // is a broadcast 8-row DataFrame, each output dim one fold per
    // (vector, row) — vectors never shuffle until the final group-by.
    // Components round at 6 and the norm derives from the ROUNDED
    // components on both engines, pinning cross-engine ulp drift.
    QueryDef("q62_random_projection",
      (s, d) => {
        import s.implicits._
        val projDims = 8
        val mat = (0 until projDims).map(j => (j, coefRow("proj", j)))
          .toDF("j", "cs")
        val comps = Tables.embeddings(s, d)
          .crossJoin(broadcast(mat))
          .select(col("vec_id"), col("label"), col("j"),
            graft.functions.VectorDot(col("embedding"), col("cs")).as("y"))
        val yAggs = (0 until projDims).map(j =>
          round(sum(when(col("j") === j, col("y"))), 6).as(s"y$j"))
        val wide = comps.groupBy("vec_id", "label")
          .agg(yAggs.head, yAggs.tail: _*)
        wide.select(col("vec_id") +: col("label") +:
            (0 until projDims).map(j => col(s"y$j")) :+
            round(sqrt((0 until projDims).map(j => col(s"y$j") * col(s"y$j"))
              .reduce(_ + _)), 6).as("proj_norm"): _*)
          .orderBy("vec_id")
      },
      Some {
        val projDims = 8
        val ys = (0 until projDims).map(j =>
          s"round(sum(CASE WHEN j = $j THEN y END), 6) AS y$j")
          .mkString(",\n       ")
        val normExpr = (0 until projDims).map(j => s"y$j * y$j").mkString(" + ")
        s"""WITH mat AS (
           |  SELECT j.j AS j, list_transform(range(0, $DIMS), i ->
           |           CAST(CAST(('0x' || substring(md5('proj_' || j.j || '_' || i), 1, 15))
           |                     AS BIGINT) % 1000 - 500 AS DOUBLE)) AS cs
           |  FROM range(0, $projDims) j(j)),
           |comps AS (
           |  SELECT e.vec_id, e.label, m.j,
           |         list_sum(list_transform(range(1, ${DIMS + 1}),
           |           i -> CAST(e.embedding[i] AS DOUBLE) * m.cs[i])) AS y
           |  FROM embeddings e CROSS JOIN mat m),
           |wide AS (
           |  SELECT vec_id, label,
           |       $ys
           |  FROM comps GROUP BY vec_id, label)
           |SELECT vec_id, label, ${(0 until projDims).map("y" + _).mkString(", ")},
           |       round(sqrt($normExpr), 6) AS proj_norm
           |FROM wide
           |ORDER BY vec_id""".stripMargin
      }),

    // ── Int8 scalar quantization: per-vector max-abs scale ────────────────
    // The storage/serving transform for 100 TB embedding corpora: 4x
    // smaller vectors, integer SIMD dot products downstream. Per-row,
    // no shuffle until the output sort; scale = maxabs/127, values
    // round-clamp into [-127, 127] (max-abs scaling saturates only the
    // extremal element, so n_sat doubles as a sanity metric). Output is
    // per-vector audit stats (sum, L1 mass, saturation count, exact
    // reconstruction SSE) rather than the opaque int array.
    QueryDef("q55_embedding_quantize",
      (s, d) => Tables.embeddings(s, d)
        .withColumn("maxabs",
          greatest(array_max(col("embedding")).cast("double"),
            (-array_min(col("embedding"))).cast("double")))
        .withColumn("qv", expr(
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)" +
            " / (nullif(maxabs, 0D) / 127.0)) AS BIGINT))"))
        .select(col("vec_id"), col("label"),
          round(col("maxabs"), 6).as("maxabs"),
          expr("aggregate(qv, 0L, (a, v) -> a + v)").as("q_sum"),
          expr("aggregate(qv, 0L, (a, v) -> a + abs(v))").as("q_l1"),
          expr("CAST(size(filter(qv, v -> abs(v) = 127)) AS INT)").as("n_sat"),
          round(expr(
            "aggregate(zip_with(embedding, qv, (x, v) ->" +
              " (CAST(x AS DOUBLE) - v * (maxabs / 127.0))" +
              " * (CAST(x AS DOUBLE) - v * (maxabs / 127.0))), 0D," +
              " (a, v) -> a + v)"), 6).as("recon_sse"))
        .orderBy("vec_id"),
      Some("""WITH base AS (
             |  SELECT vec_id, label, embedding,
             |         greatest(CAST(list_max(embedding) AS DOUBLE),
             |                  -CAST(list_min(embedding) AS DOUBLE)) AS maxabs
             |  FROM embeddings),
             |q AS (
             |  SELECT vec_id, label, embedding, maxabs,
             |         list_transform(embedding, x ->
             |           CAST(round(CAST(x AS DOUBLE)
             |                / (nullif(maxabs, 0) / 127.0)) AS BIGINT)) AS qv
             |  FROM base)
             |SELECT vec_id, label, round(maxabs, 6) AS maxabs,
             |       CAST(list_sum(qv) AS BIGINT) AS q_sum,
             |       CAST(list_sum(list_transform(qv, v -> abs(v))) AS BIGINT)
             |         AS q_l1,
             |       CAST(len(list_filter(qv, v -> abs(v) = 127)) AS INT)
             |         AS n_sat,
             |       round(list_sum(list_transform(range(1, 65), i ->
             |         (CAST(embedding[i] AS DOUBLE) - qv[i] * (maxabs / 127.0))
             |         * (CAST(embedding[i] AS DOUBLE) - qv[i] * (maxabs / 127.0))
             |       )), 6) AS recon_sse
             |FROM q
             |ORDER BY vec_id""".stripMargin)),

    // ── Batch ANN retrieval: all query vectors through ONE join ───────────
    // Every 50th vector is a query; candidates for ALL of them come
    // from a single (t, key) equi-join against the shared LSH tables,
    // reranks share one scan, and per-query top-3 is a q_id-partitioned
    // window — the batch-inference shape of a retrieval service.
    QueryDef("q97_batch_ann",
      (s, d) => batchLshTopK(Tables.embeddings(s, d), every = 50, k = 3),
      Some(s"""$KEYS_SQL,
             |qk AS (SELECT vec_id AS q_id, t, key FROM keys
             |       WHERE vec_id % 50 = 0),
             |cand AS (
             |  SELECT DISTINCT qk.q_id, k.vec_id, k.label, k.embedding
             |  FROM keys k JOIN qk ON k.t = qk.t AND k.key = qk.key
             |  WHERE k.vec_id != qk.q_id),
             |qv AS (SELECT vec_id AS q_id, embedding AS qvec
             |       FROM embeddings WHERE vec_id % 50 = 0),
             |scored AS (
             |  SELECT c.q_id, c.vec_id, c.label, embedding, qvec,
             |         $COS_Q AS cos_sim
             |  FROM cand c JOIN qv USING (q_id)),
             |ranked AS (
             |  SELECT q_id, vec_id, label, cos_sim,
             |         row_number() OVER (PARTITION BY q_id
             |           ORDER BY cos_sim DESC, vec_id) AS rk
             |  FROM scored)
             |SELECT q_id, vec_id, label, cos_sim, CAST(rk AS INT) AS rk
             |FROM ranked WHERE rk <= 3
             |ORDER BY q_id, rk""".stripMargin)),

    // ── SemDeDup: cluster-blocked semantic drop list ──────────────────────
    // Abbas et al. 2023 (arXiv:2303.09540): partition the corpus into
    // centroid cells, then the quadratic near-dup test runs only WITHIN
    // a cell — the paper's core trick for making semantic dedup
    // tractable. Seeds = the K smallest vec_ids (deterministic, so the
    // oracle mirrors the assignment exactly); a vector is DROPPED when a
    // more senior (smaller vec_id) cell-mate sits at cosine >= tau.
    // Output is the curation decision itself: (vec_id, cluster,
    // kept_by) — ids only, no float column, so the gate is immune to
    // last-ulp summation differences. tau = 0.4 matches q46's threshold
    // convention on this near-uniform synthetic corpus (19 drops at
    // sf0.01, 235 at sf0.1).
    //
    // 100 TB shape: assignment is a broadcast join against K centroids
    // (from k-means||, K sized to cap cell population) + per-row argmax;
    // the within-cell pair join shuffles on cluster id where AQE
    // skew-split handles hot cells. Nothing here is all-pairs: the
    // pair mass is sum of cell sizes squared, controlled by K.
    QueryDef("q87_semdedup",
      (s, d) => semDedup(s, d, k = 8, tau = 0.4),
      Some(s"""WITH e AS (
             |  SELECT vec_id, embedding,
             |         sqrt(list_sum(list_transform(range(1, 65),
             |           i -> CAST(embedding[i] AS DOUBLE)
             |                * CAST(embedding[i] AS DOUBLE)))) AS nrm
             |  FROM embeddings),
             |seeds AS (
             |  SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm
             |  FROM e ORDER BY vec_id LIMIT 8),
             |scored AS (
             |  SELECT e.vec_id, e.embedding, e.nrm, s.cid,
             |         list_sum(list_transform(range(1, 65),
             |           i -> CAST(e.embedding[i] AS DOUBLE)
             |                * CAST(s.cvec[i] AS DOUBLE)))
             |           / (e.nrm * s.cnrm) AS cs
             |  FROM e CROSS JOIN seeds s),
             |asg AS (
             |  SELECT vec_id, embedding, nrm, cid AS cluster FROM (
             |    SELECT scored.*, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY cs DESC, cid) AS rk
             |    FROM scored)
             |  WHERE rk = 1)
             |SELECT b.vec_id AS vec_id, b.cluster AS cluster,
             |       min(a.vec_id) AS kept_by
             |FROM asg a JOIN asg b
             |  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
             |WHERE list_sum(list_transform(range(1, 65),
             |        i -> CAST(a.embedding[i] AS DOUBLE)
             |             * CAST(b.embedding[i] AS DOUBLE)))
             |      / (a.nrm * b.nrm) >= 0.4
             |GROUP BY b.vec_id, b.cluster
             |ORDER BY vec_id""".stripMargin)),

    // ── Stored-index batch IVF: the full ANN serving lifecycle ────────────
    // Build the index (16 centroids + cent_id-partitioned posting
    // lists), PERSIST it through the stage-and-swap writer, read it
    // back, and serve every 50th vector as a query probing its 4
    // nearest stored lists — the persist→reload→probe contract q79
    // established for MinHash signatures, applied to ANN. The oracle
    // restates build and probe declaratively; any corruption in the
    // written index (or a dropped list partition) changes the listed
    // neighbors and breaks the hash match.
    QueryDef("q100_stored_ivf",
      (s, d) => storedIvfBatch(s, d, every = 50, k = 3),
      Some(s"""WITH cents AS (
             |  SELECT vec_id AS cent_id, embedding AS cvec
             |  FROM embeddings ORDER BY vec_id LIMIT 16),
             |ascored AS (
             |  SELECT e.vec_id, e.label, e.embedding, c.cent_id,
             |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
             |           list_sum(list_transform(range(1, 65),
             |             i -> CAST(e.embedding[i] AS DOUBLE)
             |                  * CAST(c.cvec[i] AS DOUBLE)))
             |           / (sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(e.embedding[i] AS DOUBLE)
             |                     * CAST(e.embedding[i] AS DOUBLE))))
             |              * sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(c.cvec[i] AS DOUBLE)
             |                     * CAST(c.cvec[i] AS DOUBLE)))))
             |           DESC, c.cent_id) AS rk
             |  FROM embeddings e CROSS JOIN cents c),
             |lists AS (
             |  SELECT vec_id, label, embedding, cent_id FROM ascored
             |  WHERE rk = 1),
             |qv AS (SELECT vec_id AS q_id, embedding AS qvec
             |       FROM embeddings WHERE vec_id % 50 = 0),
             |qscored AS (
             |  SELECT q.q_id, c.cent_id,
             |         row_number() OVER (PARTITION BY q.q_id ORDER BY
             |           list_sum(list_transform(range(1, 65),
             |             i -> CAST(q.qvec[i] AS DOUBLE)
             |                  * CAST(c.cvec[i] AS DOUBLE)))
             |           / (sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(q.qvec[i] AS DOUBLE)
             |                     * CAST(q.qvec[i] AS DOUBLE))))
             |              * sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(c.cvec[i] AS DOUBLE)
             |                     * CAST(c.cvec[i] AS DOUBLE)))))
             |           DESC, c.cent_id) AS prk
             |  FROM qv q CROSS JOIN cents c),
             |probes AS (SELECT q_id, cent_id FROM qscored WHERE prk <= 4),
             |cscored AS (
             |  SELECT p.q_id, l.vec_id, l.label, l.embedding, q.qvec,
             |         $COS_Q AS cos_sim
             |  FROM lists l JOIN probes p ON l.cent_id = p.cent_id
             |       JOIN qv q ON q.q_id = p.q_id
             |  WHERE l.vec_id != p.q_id),
             |ranked AS (
             |  SELECT q_id, vec_id, label, cos_sim,
             |         row_number() OVER (PARTITION BY q_id
             |           ORDER BY cos_sim DESC, vec_id) AS rk
             |  FROM cscored)
             |SELECT q_id, vec_id, label, cos_sim, CAST(rk AS INT) AS rk
             |FROM ranked WHERE rk <= 3
             |ORDER BY q_id, rk""".stripMargin)),

    // ── ANN recall@10 measured IN the correctness gate ────────────────────
    // The sketch-accuracy pattern of q59 applied to retrieval: for every
    // query vector, the LSH top-10 is scored against the exact
    // brute-force top-10 and per-query recall lands in the output — so
    // the accuracy contract of the ANN path is hash-checked by the
    // oracle, not just spec-asserted. On this near-uniform synthetic
    // corpus recall is the honest mid-range number the q40 comment
    // documents (no genuinely close neighbors to concentrate on);
    // Round5OpsSpec shows recall 1.0 on a clustered corpus, where it
    // matters. Both paths are deterministic (ties broken by vec_id), so
    // the whole evaluation is oracle-expressible.
    QueryDef("q103_ann_recall",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val brute = batchBruteTopK(e, every = 50, k = 10)
        val lsh = batchLshTopK(e, every = 50, k = 10)
          .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
        brute.join(lsh, Seq("q_id", "vec_id"), "left")
          .groupBy("q_id")
          .agg(count(lit(1)).as("k_eval"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .select(col("q_id"), col("k_eval"), col("n_hit"),
            round(col("n_hit").cast("double") / col("k_eval"), 2)
              .as("recall_at_10"))
          .orderBy("q_id")
      },
      Some(s"""$KEYS_SQL,
             |qv AS (SELECT vec_id AS q_id, embedding AS qvec
             |       FROM embeddings WHERE vec_id % 50 = 0),
             |brute AS (
             |  SELECT q.q_id, e.vec_id,
             |         row_number() OVER (PARTITION BY q.q_id ORDER BY
             |           list_sum(list_transform(range(1, 65),
             |             i -> CAST(e.embedding[i] AS DOUBLE)
             |                  * CAST(q.qvec[i] AS DOUBLE)))
             |           / (sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(e.embedding[i] AS DOUBLE)
             |                     * CAST(e.embedding[i] AS DOUBLE))))
             |              * sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(q.qvec[i] AS DOUBLE)
             |                     * CAST(q.qvec[i] AS DOUBLE)))))
             |           DESC, e.vec_id) AS rk
             |  FROM embeddings e CROSS JOIN qv q
             |  WHERE e.vec_id != q.q_id),
             |bt AS (SELECT q_id, vec_id FROM brute WHERE rk <= 10),
             |qk AS (SELECT vec_id AS q_id, t, key FROM keys
             |       WHERE vec_id % 50 = 0),
             |cand AS (
             |  SELECT DISTINCT qk.q_id, k.vec_id, k.embedding
             |  FROM keys k JOIN qk ON k.t = qk.t AND k.key = qk.key
             |  WHERE k.vec_id != qk.q_id),
             |lscored AS (
             |  SELECT c.q_id, c.vec_id,
             |         row_number() OVER (PARTITION BY c.q_id ORDER BY
             |           $COS_Q DESC, c.vec_id) AS rk
             |  FROM cand c JOIN qv ON qv.q_id = c.q_id),
             |lt AS (SELECT q_id, vec_id FROM lscored WHERE rk <= 10)
             |SELECT b.q_id,
             |       CAST(count(*) AS BIGINT) AS k_eval,
             |       CAST(sum(CASE WHEN l.vec_id IS NOT NULL
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             |       round(sum(CASE WHEN l.vec_id IS NOT NULL
             |                      THEN 1 ELSE 0 END)
             |             / CAST(count(*) AS DOUBLE), 2) AS recall_at_10
             |FROM bt b LEFT JOIN lt l
             |  ON l.q_id = b.q_id AND l.vec_id = b.vec_id
             |GROUP BY b.q_id
             |ORDER BY b.q_id""".stripMargin)),

    // ── kNN majority-vote classification ─────────────────────────────────
    // The serving-side classifier on top of the retrieval tier: each
    // query vector takes the majority label of its 10 nearest
    // neighbors (exact cosine here — the yardstick; swap the candidate
    // source for q97/q100's ANN batch path at scale and only the first
    // stage changes). Ties are deterministic twice over: neighbor rank
    // breaks on vec_id, vote rank on label — so the prediction is
    // engine-exact with no float ever output. One broadcast of the
    // 5-query frame; corpus scanned once; per-query state is a top-10
    // window over q_id.
    QueryDef("q117_knn_classify",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"), col("label"),
            cosine("embedding", "qvec").as("cos_sim"))
        val wR = Window.partitionBy("q_id")
          .orderBy(col("cos_sim").desc, col("vec_id"))
        val votes = scored.withColumn("rk", row_number().over(wR))
          .filter(col("rk") <= 10)
          .groupBy("q_id", "label").agg(count(lit(1)).as("n_votes"))
        val wW = Window.partitionBy("q_id")
          .orderBy(col("n_votes").desc, col("label"))
        votes.withColumn("wr", row_number().over(wW))
          .filter(col("wr") === 1)
          .select(col("q_id"), col("label").as("pred_label"),
            col("n_votes"))
          .orderBy("q_id")
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qvec
             |           FROM embeddings WHERE vec_id < 5),
             |scored AS (
             |  SELECT q.q_id, e.vec_id, e.label,
             |         $COS_Q
             |           AS cos_sim
             |  FROM embeddings e CROSS JOIN q
             |  WHERE e.vec_id != q.q_id),
             |ranked AS (
             |  SELECT q_id, label,
             |         row_number() OVER (PARTITION BY q_id
             |           ORDER BY cos_sim DESC, vec_id) AS rk
             |  FROM scored),
             |votes AS (
             |  SELECT q_id, label, count(*) AS n_votes
             |  FROM ranked WHERE rk <= 10 GROUP BY 1, 2),
             |win AS (
             |  SELECT q_id, label AS pred_label,
             |         CAST(n_votes AS BIGINT) AS n_votes,
             |         row_number() OVER (PARTITION BY q_id
             |           ORDER BY n_votes DESC, label) AS wr
             |  FROM votes)
             |SELECT q_id, pred_label, n_votes
             |FROM win WHERE wr = 1
             |ORDER BY q_id""".stripMargin)),

    // ── Per-dimension standardization (feature normalization) ─────────────
    // The preprocessing step every embedding pipeline runs before
    // clustering/quantization: per-dimension corpus mean/std, then
    // z = (x − μ_d)/σ_d per element. Made cross-engine-exact the q173
    // way: elements quantize to integers (round(x·10⁶)) so the
    // per-dimension Σq and Σq² are EXACT integer sums (no
    // float-summation order dependence — the classic nondeterminism of
    // distributed mean/variance), and μ, σ, z are then a fixed dag of
    // correctly-rounded double ops both engines evaluate identically;
    // the gate pins Σ round(z·10³) per dimension, i.e. every
    // standardized element. Shape at 100 TB: one (dim)-keyed partial
    // agg (64 groups), stats broadcast back onto a narrow per-element
    // map — the same two-pass shape a production standardizer uses.
    QueryDef("q176_dim_standardize",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"),
            posexplode(col("embedding")).as(Seq("dim", "x")))
          .withColumn("q",
            round(col("x").cast("double") * 1e6).cast("long"))
        val stats = e.groupBy("dim")
          .agg(count(lit(1)).as("n"), sum("q").as("sq"),
            sum(col("q") * col("q")).as("sqq"))
          .withColumn("mean",
            col("sq").cast("double") / col("n").cast("double"))
          .withColumn("variance",
            (col("sqq").cast("double") -
              col("sq").cast("double") * col("sq").cast("double") /
                col("n").cast("double")) / col("n").cast("double"))
          .withColumn("std", sqrt(col("variance") + lit(1.0)))
        val z = e.join(broadcast(stats.select("dim", "mean", "std")),
            "dim")
          .withColumn("zq", round(
            (col("q").cast("double") - col("mean")) / col("std")
              * lit(1000.0)).cast("long"))
        z.groupBy("dim")
          .agg(count(lit(1)).as("n"), sum("zq").as("zsum"))
          .join(stats.select(col("dim"),
            round(col("mean"), 6).as("mean_r"),
            round(col("std"), 6).as("std_r")), "dim")
          .select("dim", "n", "mean_r", "std_r", "zsum")
          .orderBy("dim")
      },
      Some("""WITH el AS (
             |  SELECT e.vec_id, CAST(t.i - 1 AS INT) AS dim,
             |         CAST(round(CAST(e.embedding[t.i] AS DOUBLE)
             |                    * 1000000.0) AS BIGINT) AS q
             |  FROM embeddings e
             |  CROSS JOIN unnest(generate_series(1, 64)) AS t(i)),
             |st AS (
             |  SELECT dim, count(*) AS n,
             |         CAST(sum(q) AS BIGINT) AS sq,
             |         CAST(sum(q * q) AS BIGINT) AS sqq
             |  FROM el GROUP BY 1),
             |st2 AS (
             |  SELECT dim, n, sq, sqq,
             |         CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             |         sqrt((CAST(sqq AS DOUBLE)
             |                - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
             |                  / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
             |               + 1.0) AS std
             |  FROM st),
             |zs AS (
             |  SELECT el.dim,
             |         CAST(round((CAST(el.q AS DOUBLE) - s.mean) / s.std
             |                    * 1000.0) AS BIGINT) AS zq
             |  FROM el JOIN st2 s ON s.dim = el.dim)
             |SELECT z.dim, count(*) AS n,
             |       round(s.mean, 6) AS mean_r,
             |       round(s.std, 6) AS std_r,
             |       CAST(sum(z.zq) AS BIGINT) AS zsum
             |FROM zs z JOIN st2 s ON s.dim = z.dim
             |GROUP BY z.dim, s.mean, s.std
             |ORDER BY z.dim""".stripMargin)),

    // ── Exact correlation matrix (feature diagnostics) ────────────────────
    // Pearson correlation between the first 8 embedding dimensions —
    // the feature-redundancy diagnostic run before PCA/whitening/
    // feature selection. Cross-engine-exact the q176 way: elements
    // quantize to integers (round(x·10⁶)), every pairwise moment
    // (Σqᵢ, Σqᵢqⱼ, n) is an EXACT integer sum, and the corr formula
    // (n·Sxy − SxSy)/(√(n·Sxx−Sx²)·√(n·Syy−Sy²)) is then a fixed dag
    // of correctly-rounded double ops written identically in both
    // engines. Shape at 100 TB: ONE pass — each row emits its 45
    // moment cells (36 pairs + 8 first moments + 1 count) from a map,
    // the shuffle carries ≤45·partitions partial rows (map-side
    // combine), and the corr assembly joins 8–36-row frames. No
    // row-pair self-join anywhere — the naive el⋈el on vec_id
    // shuffles the whole corpus; the cell emission shuffles nothing
    // but the fixed moment lattice.
    QueryDef("q191_corr_matrix",
      (s, d) => {
        def q(i: Int) = round(
          element_at(col("embedding"), i + 1).cast("double") * 1e6)
          .cast("long")
        val pairCells = for { i <- 0 until 8; j <- i until 8 } yield
          struct(lit(i).as("i"), lit(j).as("j"), (q(i) * q(j)).as("p"))
        val momentCells = (0 until 8).map(i =>
          struct(lit(i).as("i"), lit(-1).as("j"), q(i).as("p")))
        val countCell =
          Seq(struct(lit(-1).as("i"), lit(-1).as("j"), lit(1L).as("p")))
        val cells = Tables.embeddings(s, d)
          .select(explode(array(
            pairCells ++ momentCells ++ countCell: _*)).as("c"))
          .groupBy(col("c.i").as("i"), col("c.j").as("j"))
          .agg(sum("c.p").as("s"))
          .cache()
        val nRow = cells.filter(col("i") === -1)
          .select(col("s").cast("double").as("nd"))
        val m1 = cells.filter(col("j") === -1 && col("i") >= 0)
        val m2 = cells.filter(col("j") >= 0)
        val diag = m2.filter(col("i") === col("j"))
          .select(col("i").as("dd"), col("s").cast("double").as("sdd"))
        val corr = m2
          .join(broadcast(m1.select(col("i"),
            col("s").cast("double").as("sx"))), "i")
          .join(broadcast(m1.select(col("i").as("j"),
            col("s").cast("double").as("sy"))), "j")
          .join(broadcast(diag.select(col("dd").as("i"),
            col("sdd").as("sxx"))), "i")
          .join(broadcast(diag.select(col("dd").as("j"),
            col("sdd").as("syy"))), "j")
          .crossJoin(broadcast(nRow))
          .withColumn("corr_r", round(
            (col("nd") * col("s").cast("double") -
              col("sx") * col("sy")) /
            (sqrt(col("nd") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("nd") * col("syy") - col("sy") * col("sy"))), 6))
        corr.select("i", "j", "corr_r").orderBy("i", "j")
      },
      Some("""WITH el AS (
             |  SELECT e.vec_id, CAST(t.i - 1 AS INT) AS dim,
             |         CAST(round(CAST(e.embedding[t.i] AS DOUBLE)
             |                    * 1000000.0) AS BIGINT) AS q
             |  FROM embeddings e
             |  CROSS JOIN unnest(generate_series(1, 8)) AS t(i)),
             |m1 AS (SELECT dim, CAST(sum(q) AS BIGINT) AS s
             |       FROM el GROUP BY 1),
             |m2 AS (SELECT a.dim AS i, b.dim AS j,
             |              CAST(sum(a.q * b.q) AS BIGINT) AS sxy
             |       FROM el a JOIN el b
             |         ON a.vec_id = b.vec_id AND a.dim <= b.dim
             |       GROUP BY 1, 2),
             |nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd
             |       FROM embeddings)
             |SELECT m.i, m.j,
             |       round((nn.nd * CAST(m.sxy AS DOUBLE)
             |               - CAST(x.s AS DOUBLE) * CAST(y.s AS DOUBLE))
             |         / (sqrt(nn.nd * CAST(dx.sxy AS DOUBLE)
             |                 - CAST(x.s AS DOUBLE) * CAST(x.s AS DOUBLE))
             |            * sqrt(nn.nd * CAST(dy.sxy AS DOUBLE)
             |                 - CAST(y.s AS DOUBLE) * CAST(y.s AS DOUBLE))),
             |         6) AS corr_r
             |FROM m2 m
             |JOIN m1 x ON x.dim = m.i
             |JOIN m1 y ON y.dim = m.j
             |JOIN m2 dx ON dx.i = m.i AND dx.j = m.i
             |JOIN m2 dy ON dy.i = m.j AND dy.j = m.j
             |CROSS JOIN nn
             |ORDER BY 1, 2""".stripMargin)),

    // ── Embedding centroid drift across table versions ───────────────────
    // Input-drift monitoring for a model's feature store: embeddings
    // live in a VERSIONED table (v0 → append a shifted cohort →
    // delete a slice), and the per-label centroid drift between v0
    // and live is the retraining signal. Exact in quantized integer
    // space: per (label, dim), centroid components are integer-mean
    // floor divisions of exact Σq sums, drift = per-label L1 distance
    // Σ_dim |c_live − c_v0| — every step integer, both engines
    // bit-agree. Shape at 100 TB: two (label, dim)-keyed partial aggs
    // (K×64 cells) joined on the cell lattice — the corpus is touched
    // twice and nothing else shuffles.
    QueryDef("q207_centroid_drift",
      (s, d) => {
        import graft.warehouse.VersionedParquet
        val root = driftRoot(s, d)
        def cents(df: org.apache.spark.sql.DataFrame) = df
          .select(col("label"),
            posexplode(col("embedding")).as(Seq("dim", "x")))
          .withColumn("q",
            round(col("x").cast("double") * 1e6).cast("long"))
          .groupBy("label", "dim")
          .agg(count(lit(1)).as("n"), sum("q").as("sq"))
          // integer-mean centroid component; Spark's `div` and
          // DuckDB's `//` both truncate toward zero, so negative
          // sums agree too (verified: −7 // 2 = −3 in both)
          .withColumn("c", expr("sq div n"))
          .select("label", "dim", "c", "n")
        val c0 = cents(VersionedParquet.read(s, root, Some(0L)))
        val cl = cents(VersionedParquet.read(s, root))
        c0.select(col("label"), col("dim"), col("c").as("c0"),
            col("n").as("n0"))
          .join(cl.select(col("label"), col("dim"), col("c").as("c1"),
            col("n").as("n1")), Seq("label", "dim"))
          .groupBy("label")
          .agg(max("n0").as("n_v0"), max("n1").as("n_live"),
            sum(abs(col("c1") - col("c0"))).cast("long").as("l1_drift"))
          .orderBy("label")
      },
      Some("""WITH v0 AS (
             |  SELECT label, embedding FROM embeddings
             |  WHERE vec_id % 5 <> 0),
             |live AS (
             |  SELECT label, embedding FROM embeddings
             |  WHERE (vec_id % 5 <> 0 OR vec_id % 2 = 0)
             |    AND vec_id % 11 <> 3),
             |e0 AS (
             |  SELECT label, CAST(t.i - 1 AS INT) AS dim,
             |         CAST(round(CAST(embedding[t.i] AS DOUBLE)
             |                    * 1000000.0) AS BIGINT) AS q
             |  FROM v0 CROSS JOIN unnest(generate_series(1, 64)) AS t(i)),
             |el AS (
             |  SELECT label, CAST(t.i - 1 AS INT) AS dim,
             |         CAST(round(CAST(embedding[t.i] AS DOUBLE)
             |                    * 1000000.0) AS BIGINT) AS q
             |  FROM live CROSS JOIN unnest(generate_series(1, 64)) AS t(i)),
             |c0 AS (SELECT label, dim,
             |              CAST(sum(q) AS BIGINT) // count(*) AS c,
             |              count(*) AS n
             |       FROM e0 GROUP BY 1, 2),
             |cl AS (SELECT label, dim,
             |              CAST(sum(q) AS BIGINT) // count(*) AS c,
             |              count(*) AS n
             |       FROM el GROUP BY 1, 2)
             |SELECT c0.label, max(c0.n) AS n_v0, max(cl.n) AS n_live,
             |       CAST(sum(abs(cl.c - c0.c)) AS BIGINT) AS l1_drift
             |FROM c0 JOIN cl ON cl.label = c0.label AND cl.dim = c0.dim
             |GROUP BY 1
             |ORDER BY c0.label""".stripMargin)),

    // ── Matryoshka truncated-embedding retrieval (prefix-dim ANN) ────────
    // The MRL serving trick (Kusupati et al. 2022): embeddings trained
    // so a PREFIX of the dimensions is itself a usable embedding —
    // serve cheap retrieval on the first 16 of 64 dims, keep the full
    // vector for rerank. The gate retrieves top-10 by FULL-dim cosine
    // and by 16-dim-prefix cosine for three query vectors and folds
    // the overlap@10 plus both top-1 ids — the quality-vs-cost
    // readout a dimension-budget decision needs (on this synthetic
    // corpus the prefix is NOT MRL-trained, so overlap is the honest
    // baseline number, not a claim). Scale shape: queries broadcast
    // (3 rows), ONE corpus scan computes both similarities, two
    // query-partitioned top-k windows over the scored stream, the
    // overlap join is 10-rows-per-query tiny.
    QueryDef("q221_matryoshka_retrieval",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val qs = e.filter(col("vec_id").isin(0L, 7L, 23L))
          .select(col("vec_id").as("qid"),
            col("embedding").as("qvec"))
        val scored = e.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            cosine("embedding", "qvec").as("cos_full"),
            (graft.functions.VectorDot(
                slice(col("embedding"), 1, 16),
                slice(col("qvec"), 1, 16)) /
              (sqrt(graft.functions.VectorDot(
                  slice(col("embedding"), 1, 16),
                  slice(col("embedding"), 1, 16))) *
                sqrt(graft.functions.VectorDot(
                  slice(col("qvec"), 1, 16),
                  slice(col("qvec"), 1, 16))))).as("cos_16"))
        val wF = Window.partitionBy("qid")
          .orderBy(col("cos_full").desc, col("vec_id"))
        val w16 = Window.partitionBy("qid")
          .orderBy(col("cos_16").desc, col("vec_id"))
        val ranked = scored
          .withColumn("rk_full", row_number().over(wF))
          .withColumn("rk_16", row_number().over(w16))
        val topF = ranked.filter(col("rk_full") <= 10)
          .select(col("qid"), col("vec_id"), col("rk_full"))
        val top16 = ranked.filter(col("rk_16") <= 10)
          .select(col("qid"), col("vec_id"), col("rk_16"))
        topF.join(top16, Seq("qid", "vec_id"), "full_outer")
          .groupBy("qid")
          .agg(sum(when(col("rk_full").isNotNull &&
                col("rk_16").isNotNull, 1L).otherwise(0L))
              .cast("long").as("overlap10"),
            min(when(col("rk_full") === 1, col("vec_id")))
              .as("top1_full"),
            min(when(col("rk_16") === 1, col("vec_id")))
              .as("top1_16"))
          .orderBy("qid")
      },
      Some("""WITH qs AS (
             |  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
             |  WHERE vec_id IN (0, 7, 23)),
             |scored AS (
             |  SELECT q.qid, e.vec_id,
             |    list_sum(list_transform(range(1, 65),
             |      i -> CAST(e.embedding[i] AS DOUBLE)
             |           * CAST(q.qvec[i] AS DOUBLE)))
             |      / (sqrt(list_sum(list_transform(range(1, 65),
             |           i -> CAST(e.embedding[i] AS DOUBLE)
             |                * CAST(e.embedding[i] AS DOUBLE))))
             |         * sqrt(list_sum(list_transform(range(1, 65),
             |           i -> CAST(q.qvec[i] AS DOUBLE)
             |                * CAST(q.qvec[i] AS DOUBLE)))))
             |      AS cos_full,
             |    list_sum(list_transform(range(1, 17),
             |      i -> CAST(e.embedding[i] AS DOUBLE)
             |           * CAST(q.qvec[i] AS DOUBLE)))
             |      / (sqrt(list_sum(list_transform(range(1, 17),
             |           i -> CAST(e.embedding[i] AS DOUBLE)
             |                * CAST(e.embedding[i] AS DOUBLE))))
             |         * sqrt(list_sum(list_transform(range(1, 17),
             |           i -> CAST(q.qvec[i] AS DOUBLE)
             |                * CAST(q.qvec[i] AS DOUBLE)))))
             |      AS cos_16
             |  FROM embeddings e CROSS JOIN qs q
             |  WHERE e.vec_id != q.qid),
             |ranked AS (
             |  SELECT qid, vec_id,
             |         row_number() OVER (PARTITION BY qid
             |           ORDER BY cos_full DESC, vec_id) AS rk_full,
             |         row_number() OVER (PARTITION BY qid
             |           ORDER BY cos_16 DESC, vec_id) AS rk_16
             |  FROM scored),
             |tf AS (SELECT qid, vec_id, rk_full FROM ranked
             |       WHERE rk_full <= 10),
             |t16 AS (SELECT qid, vec_id, rk_16 FROM ranked
             |        WHERE rk_16 <= 10)
             |SELECT qid,
             |       CAST(sum(CASE WHEN tf.rk_full IS NOT NULL
             |                      AND t16.rk_16 IS NOT NULL
             |                     THEN 1 ELSE 0 END) AS BIGINT)
             |         AS overlap10,
             |       min(CASE WHEN tf.rk_full = 1 THEN vec_id END)
             |         AS top1_full,
             |       min(CASE WHEN t16.rk_16 = 1 THEN vec_id END)
             |         AS top1_16
             |FROM tf FULL OUTER JOIN t16 USING (qid, vec_id)
             |GROUP BY 1
             |ORDER BY qid""".stripMargin)),

    // ── Hybrid retrieval: BM25 lexical ∪ dense cosine, RRF fusion ────────
    // The production retrieval stack serves BOTH a term index and a
    // vector index and fuses the rank lists — reciprocal rank fusion
    // (Cormack et al., SIGIR'09): score(d) = Σ_legs 1/(60 + rank_leg(d)),
    // robust to the legs' incomparable score scales because only RANKS
    // cross the fusion boundary. Here the lexical leg is q81's BM25
    // (terms "join vector filter") and the dense leg is q38's cosine
    // against vec_id 0, joined on the shared document id space; the
    // fusion arithmetic is exact-integer (micro-units: 10⁶ div (60+r))
    // so no float threshold crosses engines. Scale shape: each leg is a
    // TakeOrderedAndProject top-20 (distributed heap merge, NO global
    // window over the corpus — the rank window runs over the 20-row
    // top-k frame); the fusion full-outer join touches ≤ 40 rows. At
    // 100 TB the legs are the stored indexes (q107/q192 postings, q100/
    // q159 IVF-PQ) — this query is the fusion contract on top of them.
    QueryDef("q226_hybrid_retrieval_rrf",
      (s, d) => {
        import graft.functions.TextFns.tokens
        val qTerms = Seq("join", "vector", "filter")
        val k1 = 1.2
        val b = 0.75
        val docs = Tables.documents(s, d)
        val toks = docs.select(col("doc_id"),
          explode(tokens(col("text"))).as("term"))
        val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(sum("dl").as("sum_dl"),
          count(lit(1)).as("n_docs"))
        val tf = toks.filter(col("term").isin(qTerms: _*))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val bm25 = tf.join(broadcast(dfreq), "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("avgdl",
            col("sum_dl").cast("double") / col("n_docs"))
          .withColumn("idf",
            log((col("n_docs") - col("df") + lit(0.5))
              / (col("df") + lit(0.5)) + lit(1.0)))
          .withColumn("contrib",
            col("idf") * (col("tf") * lit(k1 + 1))
              / (col("tf") + lit(k1) *
                (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
          .groupBy("doc_id")
          .agg(round(sum("contrib"), 6).as("bm25"))
        val lex = bm25
          .orderBy(col("bm25").desc, col("doc_id")).limit(20)
          .withColumn("lex_rank", row_number()
            .over(Window.orderBy(col("bm25").desc, col("doc_id"))))
          .select(col("doc_id").as("id"), col("lex_rank"))
        val e = Tables.embeddings(s, d)
        val qv = e.filter(col("vec_id") === 0L)
          .select(col("embedding").as("qvec"))
        val vec = e.crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= 0L)
          .select(col("vec_id"), cosine("embedding", "qvec").as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id")).limit(20)
          .withColumn("vec_rank", row_number()
            .over(Window.orderBy(col("cos_sim").desc, col("vec_id"))))
          .select(col("vec_id").as("id"), col("vec_rank"))
        lex.join(vec, Seq("id"), "full_outer")
          .withColumn("rrf_micro",
            (coalesce(expr("1000000 div (60 + cast(lex_rank as bigint))"),
              lit(0L)) +
             coalesce(expr("1000000 div (60 + cast(vec_rank as bigint))"),
              lit(0L))).cast("long"))
          .orderBy(col("rrf_micro").desc, col("id")).limit(10)
          .withColumn("fused_rank", row_number()
            .over(Window.orderBy(col("rrf_micro").desc, col("id"))))
          .select(col("fused_rank"), col("id"), col("lex_rank"),
            col("vec_rank"), col("rrf_micro"))
          .orderBy("fused_rank")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(list_filter(string_split_regex(lower(text),
             |           '[^a-z0-9]+'), x -> x != '')) AS term
             |  FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
             |stats AS (SELECT CAST(sum(dl) AS BIGINT) AS sum_dl,
             |                 count(*) AS n_docs FROM dl),
             |tf AS (
             |  SELECT doc_id, term, count(*) AS tf FROM toks
             |  WHERE term IN ('join', 'vector', 'filter')
             |  GROUP BY 1, 2),
             |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |scored AS (
             |  SELECT tf.doc_id,
             |         ln((stats.n_docs - dfreq.df + CAST(0.5 AS DOUBLE))
             |            / (dfreq.df + CAST(0.5 AS DOUBLE))
             |            + CAST(1 AS DOUBLE))
             |           * (tf.tf * CAST(2.2 AS DOUBLE))
             |           / (tf.tf + CAST(1.2 AS DOUBLE)
             |              * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
             |                 * dl.dl
             |                 / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))
             |           AS contrib
             |  FROM tf JOIN dl USING (doc_id)
             |       JOIN dfreq USING (term)
             |       CROSS JOIN stats),
             |bm AS (SELECT doc_id, round(sum(contrib), 6) AS bm25
             |       FROM scored GROUP BY 1),
             |lex AS (
             |  SELECT id, lex_rank FROM (
             |    SELECT doc_id AS id,
             |           CAST(row_number() OVER (
             |             ORDER BY bm25 DESC, doc_id) AS INT) AS lex_rank
             |    FROM bm) WHERE lex_rank <= 20),
             |q AS (SELECT embedding AS qvec FROM embeddings
             |      WHERE vec_id = 0),
             |cosd AS (
             |  SELECT vec_id,
             |       $COS_Q
             |         AS cos_sim
             |  FROM embeddings CROSS JOIN q
             |  WHERE vec_id != 0),
             |vec AS (
             |  SELECT id, vec_rank FROM (
             |    SELECT vec_id AS id,
             |           CAST(row_number() OVER (
             |             ORDER BY cos_sim DESC, vec_id) AS INT) AS vec_rank
             |    FROM cosd) WHERE vec_rank <= 20),
             |fused AS (
             |  SELECT COALESCE(lex.id, vec.id) AS id, lex_rank, vec_rank,
             |         CAST(COALESCE(1000000 // (60 + lex_rank), 0)
             |            + COALESCE(1000000 // (60 + vec_rank), 0)
             |           AS BIGINT) AS rrf_micro
             |  FROM lex FULL OUTER JOIN vec ON lex.id = vec.id)
             |SELECT * FROM (
             |  SELECT CAST(row_number() OVER (
             |           ORDER BY rrf_micro DESC, id) AS INT) AS fused_rank,
             |         id, lex_rank, vec_rank, rrf_micro
             |  FROM fused)
             |WHERE fused_rank <= 10
             |ORDER BY fused_rank""".stripMargin)),

    // ── Retrieval quality eval: nDCG@10 + MRR of the LSH leg ─────────────
    // q103 measures set recall; a serving decision also needs RANK
    // quality — did the ANN leg put the right neighbors early? Truth =
    // batch brute-force top-10 per query (binary relevance), system =
    // batch LSH top-10; nDCG@10 discounts by 1/log2(r+1) and MRR is
    // the reciprocal first-relevant rank. The discount values are 10
    // PRECOMPUTED double literals both engines index identically (the
    // q70 LC_TABLE discipline — no runtime libm), IDCG is one shared
    // literal, MRR stays exact-integer micro-units, and the ≤ 10-term
    // double DCG sum is round(·, 6)-pinned (q39's ulp rule). Queries
    // whose LSH candidate set is empty are absent on both sides by
    // construction. Scale shape: both legs are the q97/q103 batch
    // plans (one band-key equi-join / one broadcast scan); the eval
    // join touches 10 rows per query.
    QueryDef("q229_retrieval_eval",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val truth = batchBruteTopK(e, every = 50, k = 10)
          .select(col("q_id"), col("vec_id"), col("rk").as("rk_true"))
        val sys = batchLshTopK(e, every = 50, k = 10)
          .select(col("q_id"), col("vec_id"), col("rk").as("rk_sys"))
        val discCol = element_at(array(DISC.map(lit): _*),
          col("rk_sys").cast("int"))
        sys.join(truth, Seq("q_id", "vec_id"), "left")
          .withColumn("rel", when(col("rk_true").isNotNull, 1L)
            .otherwise(0L))
          .groupBy("q_id")
          .agg(sum("rel").as("n_hits"),
            min(when(col("rel") === 1, col("rk_sys"))).as("first_rel"),
            sum(when(col("rel") === 1, discCol).otherwise(lit(0.0)))
              .as("dcg"))
          .select(col("q_id"), col("n_hits"),
            coalesce(expr("1000000 div cast(first_rel as bigint)"),
              lit(0L)).as("rr_micro"),
            round(col("dcg") / lit(IDCG10), 6).as("ndcg_at_10"))
          .orderBy("q_id")
      },
      Some(s"""$KEYS_SQL,
             |qv AS (SELECT vec_id AS q_id, embedding AS qvec
             |       FROM embeddings WHERE vec_id % 50 = 0),
             |brute AS (
             |  SELECT q.q_id, e.vec_id,
             |         row_number() OVER (PARTITION BY q.q_id ORDER BY
             |           list_sum(list_transform(range(1, 65),
             |             i -> CAST(e.embedding[i] AS DOUBLE)
             |                  * CAST(q.qvec[i] AS DOUBLE)))
             |           / (sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(e.embedding[i] AS DOUBLE)
             |                     * CAST(e.embedding[i] AS DOUBLE))))
             |              * sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(q.qvec[i] AS DOUBLE)
             |                     * CAST(q.qvec[i] AS DOUBLE)))))
             |           DESC, e.vec_id) AS rk
             |  FROM embeddings e CROSS JOIN qv q
             |  WHERE e.vec_id != q.q_id),
             |bt AS (SELECT q_id, vec_id, rk AS rk_true FROM brute
             |       WHERE rk <= 10),
             |qk AS (SELECT vec_id AS q_id, t, key FROM keys
             |       WHERE vec_id % 50 = 0),
             |cand AS (
             |  SELECT DISTINCT qk.q_id, k.vec_id, k.embedding
             |  FROM keys k JOIN qk ON k.t = qk.t AND k.key = qk.key
             |  WHERE k.vec_id != qk.q_id),
             |lscored AS (
             |  SELECT c.q_id, c.vec_id,
             |         row_number() OVER (PARTITION BY c.q_id ORDER BY
             |           $COS_Q DESC, c.vec_id) AS rk
             |  FROM cand c JOIN qv ON qv.q_id = c.q_id),
             |lt AS (SELECT q_id, vec_id, rk AS rk_sys FROM lscored
             |       WHERE rk <= 10)
             |SELECT l.q_id,
             |       CAST(sum(CASE WHEN b.rk_true IS NOT NULL
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
             |       CAST(coalesce(1000000 // CAST(min(CASE
             |             WHEN b.rk_true IS NOT NULL THEN l.rk_sys END)
             |           AS BIGINT), 0) AS BIGINT) AS rr_micro,
             |       round(sum(CASE WHEN b.rk_true IS NOT NULL
             |                 THEN [${DISC.mkString(", ")}]
             |                        [CAST(l.rk_sys AS INT)]
             |                 ELSE CAST(0 AS DOUBLE) END)
             |             / $IDCG10, 6) AS ndcg_at_10
             |FROM lt l LEFT JOIN bt b
             |  ON b.q_id = l.q_id AND b.vec_id = l.vec_id
             |GROUP BY l.q_id
             |ORDER BY l.q_id""".stripMargin)),

    // ── Label-noise audit: kNN label disagreement (cleanlab-style) ───────
    // The training-data hygiene pass over a LABELED embedding corpus:
    // a vector whose nearest neighbors mostly carry a DIFFERENT label
    // is a mislabel suspect. The driver corpus's own `label` column is
    // UNCORRELATED with its vectors (near-uniform synthetic geometry —
    // ANY labeling disagrees with neighbors there), so, as with q214's
    // injected PII, the query synthesizes its ground truth IN-ENGINE:
    // each vec_id is redrawn around one of 8 md5-derived cluster
    // centroids (same-cluster cosine ≈ 0.99, cross ≈ 0 — the clustered
    // shape real embedding corpora have; Round5OpsSpec's recall recipe
    // stated as portable integer-float formulas both engines evaluate
    // identically), true label = its cluster, and the OBSERVED label
    // rotates to the next cluster on the vec_id % 19 = 5 slice (~5 %
    // injected mislabels). The audit sees only observed labels; the
    // `injected` marker column is the detection readout (q103's
    // truth-comparison discipline) — on this geometry the flag list IS
    // the injected slice. Every vector is a query, so brute-force kNN
    // would be the n² the ANN tier exists to avoid — neighbors come
    // from the SAME LSH band tables as q40/q97 with BOUNDED bucket
    // lists (see below: candidate mass linear in the corpus even when
    // the geometry collapses clusters into single buckets), exact
    // cosine ranks candidates, the top-5 vote is a per-query window;
    // flag = strict majority
    // disagreement over ≥ 3 evaluable neighbors, all integer votes,
    // deterministic ties. One band equi-join + two hash joins by id +
    // one window: the q97 batch-serving shape, query set = corpus.
    QueryDef("q231_label_noise_audit",
      (s, d) => {
        val emb2 = transform(sequence(lit(0), lit(63)), i =>
          ((Hashing.md5Long60(concat(lit("cl_cent_"),
              (col("vec_id") % 8).cast("string"), lit("_"),
              i.cast("string"))) % 1000 - 500) * 2
            + (Hashing.md5Long60(concat(lit("cl_pt_"),
                col("vec_id").cast("string"), lit("_"),
                i.cast("string"))) % 101 - 50)).cast("float"))
        // persisted via the session LRU cache: the synthetic
        // labeled-embedding frame costs 128 md5 evaluations per vector
        // and is consumed THREE times below (band keys + the query
        // side + the neighbor side of the scoring join) — one
        // derivation instead of three (r16 optimization, guide §1.2;
        // ~vec-count × 64 floats of state). r16 persisted it inline
        // and never unpersisted (the returned plan outlives this
        // function); the FrameCache route bounds the retained state —
        // eviction unpersists, same discipline as DedupOps' shingle
        // frame (r17, guide §5).
        val e = q231EmbCache.getOrBuild(s, d) {
          Tables.embeddings(s, d).select(col("vec_id"),
            emb2.as("embedding"),
            when(col("vec_id") % 19 === 5, ((col("vec_id") % 8) + 1) % 8)
              .otherwise(col("vec_id") % 8).cast("int").as("label"))
            .persist()
        }
        val keys = tableKeysOf(e)
        // Bounded bucket lists — the production bounded-bucket-scan
        // rule: each band bucket INDEXES only its first 16 members
        // (deterministic by vec_id), so candidate mass is ≤ 16·|keys|
        // rows — LINEAR in the corpus even when the geometry collapses
        // whole clusters into one bucket (here it does, by
        // construction: an uncapped bucket self-join would be
        // Σ cluster² — the n² this query exists to avoid). Queries
        // stay uncapped: every vector is audited.
        val bw = Window.partitionBy("t", "key").orderBy("vec_id")
        val indexed = keys
          .withColumn("brn", row_number().over(bw))
          .filter(col("brn") <= 16)
          .select(col("vec_id").as("nid"), col("t"), col("key"))
        val cand = keys.select(col("vec_id").as("qid"), col("t"),
            col("key"))
          .join(indexed, Seq("t", "key"))
          .filter(col("qid") =!= col("nid"))
          .select("qid", "nid").distinct()
        val scored = cand
          .join(e.select(col("vec_id").as("qid"),
            col("embedding").as("qv"), col("label").as("q_label")), "qid")
          .join(e.select(col("vec_id").as("nid"),
            col("embedding").as("nv"), col("label").as("n_label")), "nid")
          .withColumn("cos_sim", cosine("nv", "qv"))
        val w = Window.partitionBy("qid")
          .orderBy(col("cos_sim").desc, col("nid"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .groupBy("qid", "q_label")
          .agg(count(lit(1)).as("n_eval"),
            sum(when(col("n_label") =!= col("q_label"), 1L)
              .otherwise(0L)).as("n_disagree"))
          .filter(col("n_eval") >= 3 &&
            col("n_disagree") * 2 > col("n_eval"))
          .select(col("qid").as("vec_id"), col("q_label").as("label"),
            col("n_eval"), col("n_disagree"),
            when(col("qid") % 19 === 5, 1).otherwise(0).cast("int")
              .as("injected"))
          .orderBy("vec_id")
      },
      Some(s"""WITH labeled AS (
             |  SELECT vec_id,
             |         list_transform(range(0, 64), i ->
             |           CAST((${Hashing.md5Long60Sql(
                          "'cl_cent_' || CAST(vec_id % 8 AS VARCHAR)" +
                            " || '_' || i")}
             |                  % 1000 - 500) * 2
             |                + (${Hashing.md5Long60Sql(
                          "'cl_pt_' || CAST(vec_id AS VARCHAR)" +
                            " || '_' || i")}
             |                   % 101 - 50)
             |             AS FLOAT)) AS embedding,
             |         CAST(CASE WHEN vec_id % 19 = 5
             |                   THEN (vec_id % 8 + 1) % 8
             |                   ELSE vec_id % 8 END AS INT) AS label
             |  FROM embeddings),
             |${KEYS_SQL.stripPrefix("WITH ")
                 .replace("FROM embeddings e", "FROM labeled e")},
             |bkeys AS (
             |  SELECT vec_id, t, key FROM (
             |    SELECT vec_id, t, key,
             |           row_number() OVER (PARTITION BY t, key
             |             ORDER BY vec_id) AS brn
             |    FROM keys) WHERE brn <= 16),
             |cand AS (
             |  SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
             |  FROM keys a JOIN bkeys b ON a.t = b.t AND a.key = b.key
             |  WHERE a.vec_id != b.vec_id),
             |scored AS (
             |  SELECT c.qid, c.nid, qe.label AS q_label,
             |         ne.label AS n_label,
             |         list_sum(list_transform(range(1, 65),
             |           i -> CAST(ne.embedding[i] AS DOUBLE)
             |                * CAST(qe.embedding[i] AS DOUBLE)))
             |           / (sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(ne.embedding[i] AS DOUBLE)
             |                     * CAST(ne.embedding[i] AS DOUBLE))))
             |              * sqrt(list_sum(list_transform(range(1, 65),
             |                i -> CAST(qe.embedding[i] AS DOUBLE)
             |                     * CAST(qe.embedding[i] AS DOUBLE)))))
             |           AS cos_sim
             |  FROM cand c
             |  JOIN labeled qe ON qe.vec_id = c.qid
             |  JOIN labeled ne ON ne.vec_id = c.nid),
             |rk AS (
             |  SELECT *, row_number() OVER (PARTITION BY qid
             |           ORDER BY cos_sim DESC, nid) AS rk
             |  FROM scored),
             |agg AS (
             |  SELECT qid, q_label, count(*) AS n_eval,
             |         sum(CASE WHEN n_label != q_label
             |                  THEN 1 ELSE 0 END) AS n_disagree
             |  FROM rk WHERE rk <= 5 GROUP BY 1, 2)
             |SELECT qid AS vec_id, CAST(q_label AS INT) AS label,
             |       CAST(n_eval AS BIGINT) AS n_eval,
             |       CAST(n_disagree AS BIGINT) AS n_disagree,
             |       CAST(CASE WHEN qid % 19 = 5 THEN 1 ELSE 0 END
             |            AS INT) AS injected
             |FROM agg
             |WHERE n_eval >= 3 AND n_disagree * 2 > n_eval
             |ORDER BY vec_id""".stripMargin)),

    // ── Scalar-quantized coarse scan + exact rescore (SQ8 ANN) ───────────
    // The production serving path between brute force (q38) and a
    // stored IVF index (q100): scan INT8-quantized vectors (4× less
    // memory traffic than fp32, the quantization q55 defines —
    // per-vector symmetric maxabs/127), shortlist top-64 by the
    // EXACT integer dot product of quantized codes (no float — the
    // shortlist is engine-portable by construction), then rescore
    // only the shortlist with the exact fp cosine. The gate proves
    // the shortlist arithmetic AND that rescoring restores exact
    // ranking on the shortlist; q103's recall harness covers the
    // quality story for the index path. Scale: the coarse scan is
    // one codegen'd pass with a distributed top-k
    // (TakeOrderedAndProject) — no shuffle before the 64-row
    // shortlist; rescore touches 64 vectors.
    QueryDef("q239_sq8_rescore_ann",
      (s, d) => {
        val quant = Tables.embeddings(s, d)
          .withColumn("maxabs",
            greatest(array_max(col("embedding")).cast("double"),
              (-array_min(col("embedding"))).cast("double")))
          .withColumn("qv", expr(
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)" +
              " / (nullif(maxabs, 0D) / 127.0)) AS BIGINT))"))
        val q = quant.filter(col("vec_id") === 0)
          .select(col("qv").as("cq"), col("embedding").as("qvec"))
        val shortlist = quant.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("idot", expr(
            "aggregate(zip_with(qv, cq, (a, b) -> a * b), 0L," +
              " (acc, v) -> acc + v)"))
          .orderBy(col("idot").desc, col("vec_id"))
          .limit(64)
        shortlist
          .select(col("vec_id"), col("label"), col("idot"),
            cosine("embedding", "qvec").as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH base AS (
             |  SELECT vec_id, label, embedding,
             |         greatest(CAST(list_max(embedding) AS DOUBLE),
             |                  -CAST(list_min(embedding) AS DOUBLE))
             |           AS maxabs
             |  FROM embeddings),
             |quant AS (
             |  SELECT vec_id, label, embedding,
             |         list_transform(embedding, x ->
             |           CAST(round(CAST(x AS DOUBLE)
             |                / (nullif(maxabs, 0) / 127.0)) AS BIGINT))
             |           AS qv
             |  FROM base),
             |q AS (SELECT qv AS cq, embedding AS qvec FROM quant
             |      WHERE vec_id = 0),
             |coarse AS (
             |  SELECT vec_id, label, embedding, qvec,
             |         CAST(list_sum(list_transform(range(1, 65),
             |           i -> qv[i] * cq[i])) AS BIGINT) AS idot
             |  FROM quant CROSS JOIN q
             |  WHERE vec_id != 0
             |  ORDER BY idot DESC, vec_id
             |  LIMIT 64)
             |SELECT vec_id, label, idot,
             |       $COS_Q
             |         AS cos_sim
             |FROM coarse
             |ORDER BY cos_sim DESC, vec_id
             |LIMIT 10""".stripMargin))
  )

  /** nDCG rank discounts 1/log2(r+1), r = 1..10, and their sum (the
    * ideal DCG at depth 10) — precomputed double literals shared by
    * the Spark plan and the oracle (shortest-decimal round-trip; no
    * runtime libm on either engine). */
  private lazy val DISC: IndexedSeq[Double] =
    (1 to 10).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
  private lazy val IDCG10: Double = DISC.sum


  /** q207 table: versioned embeddings — v0 = vec_id % 5 ≠ 0, append
    * the even-id cohort of the held-out fifth, delete vec_id % 11 = 3.
    * Once per session. */
  private def driftRoot(s: SparkSession, d: String): String = {
    import graft.warehouse.VersionedParquet
    val root = graft.sources.Scratch.dir(s, "q207-embeddings")
    if (VersionedParquet.currentVersion(s, root).isEmpty) {
      val e = Tables.embeddings(s, d)
        .select("vec_id", "label", "embedding")
      VersionedParquet.publish(e.filter(col("vec_id") % 5 =!= 0), root,
        keepVersions = 10)
      VersionedParquet.append(s, root,
        e.filter(col("vec_id") % 5 === 0 && col("vec_id") % 2 === 0),
        keepVersions = 10)
      VersionedParquet.delete(s, root, col("vec_id") % 11 === 3,
        keepVersions = 10)
    }
    root
  }
}
