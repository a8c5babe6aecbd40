package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{QueryDef, Tables}

/** Product quantization — the compression tier under IVF-PQ ANN
  * serving (q47/q100 give the coarse IVF routing; this gives the
  * in-cell compression): the 64-dim embedding splits into M=4
  * subvectors of 16 dims, each subspace trains its own K=16-code
  * codebook by Lloyd's algorithm, and a vector's code is its per-
  * subspace nearest-centroid tuple — 64 floats become M small code
  * ids (16 codes → 4 bits here; 8-bit codes at production K=256), an ~128×
  * compression that lets a 100 TB embedding corpus fit hot storage
  * for asymmetric-distance (ADC) scanning.
  *
  * Exact-integer discipline (q124's, which this reuses structurally):
  * embeddings quantize to `round(x·1000)` longs; distances are
  * integer squared-L2; centroid updates are truncating integer means;
  * ties break to the lowest code — so Spark and the DuckDB oracle
  * agree bit-for-bit and the oracle can unroll every Lloyd round as
  * CTEs, with ALL subspaces trained in the same CTE chain keyed by
  * (m, cl).
  *
  * Scale shape, per round and subspace: assignment is a MAP-SIDE
  * projection against the literal K×16 codebook (zero shuffle);
  * the update is ONE (m, cl, dim)-keyed partial-aggregated shuffle
  * bounded at M·K·16·partitions; only the M·K×16 codebook matrix
  * (a few KB) ever reaches the driver. The defining PQ identity —
  * ADC(q, code(x)) == d2(q, reconstruct(x)) — and ADC top-k recall
  * on the clustered corpus are PqSpec's properties.
  */
object PqOps {

  /** Fixed-point scale, subspace count/width, codes per subspace,
    * Lloyd rounds (gate constants — the oracle unrolls the same). */
  final val SCALE = 1000
  final val M = 4
  final val SUBD = 16
  final val K = 16
  final val ITERS = 3

  /** Embeddings quantized to exact integer micro-units. */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x * SCALE).cast("long")).as("e"))

  /** Integer squared-L2 from subvector column `s` to a literal code. */
  private def d2(cent: Array[Long]): Column =
    aggregate(
      zip_with(col("s"), typedlit(cent.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Nearest-code assignment for one subspace (label-sorted codes);
    * ties to the LOWEST code — q124's discipline. */
  private def assign(v: DataFrame,
                     cents: Seq[(Int, Array[Long])]): DataFrame = {
    val withD = cents.zipWithIndex.foldLeft(v) { case (df, ((_, c), i)) =>
      df.withColumn(s"_d$i", d2(c))
    }
    val ds = cents.indices.map(i => col(s"_d$i"))
    val best = least(ds: _*)
    val labels = typedlit(cents.map(_._1))
    withD
      .withColumn("d2", best)
      .withColumn("cl", element_at(labels,
        array_position(array(ds: _*), best).cast("int")))
      .drop(cents.indices.map(i => s"_d$i"): _*)
  }

  /** Train all M codebooks; returns (m, Seq[(code, centroid)]).
    *
    * Every Lloyd round is ONE Spark job over ALL subspaces: the M
    * per-subspace assignments (map-side, off the same cached scan)
    * union into a single (m, code, dim)-keyed partial-aggregated
    * shuffle, so the corpus is touched once per round — not once per
    * (round, subspace) — and the driver sees one M·K×SUBD matrix per
    * round. At 100 TB that is the difference between ITERS scans and
    * ITERS·M scans. */
  private[graft] def codebooks(s: SparkSession, dir: String)
      : Seq[(Int, Seq[(Int, Array[Long])])] =
    codebooksOf(quantized(s, dir))

  /** [[codebooks]] over an explicit quantized frame (vec_id, e) —
    * the entry the index-maintenance path uses to train on a PINNED
    * snapshot (the codebook freezes at index build; later batches
    * encode against it). */
  private[graft] def codebooksOf(corpus: DataFrame)
      : Seq[(Int, Seq[(Int, Array[Long])])] = {
    val q = corpus.persist()
    try {
      def sub(m: Int): DataFrame = q.select(col("vec_id"),
        slice(col("e"), m * SUBD + 1, SUBD).as("s"))
      // deterministic init: the K lowest vec_ids' subvectors, shared
      // across subspaces (one collect slices all M)
      val seed = q.orderBy("vec_id").limit(K).collect()
      var books: Map[Int, Seq[(Int, Array[Long])]] =
        (0 until M).map { m =>
          m -> seed.zipWithIndex.map { case (r, i) =>
            i -> r.getSeq[Long](1).slice(m * SUBD, (m + 1) * SUBD).toArray
          }.toSeq
        }.toMap
      for (_ <- 1 to ITERS) {
        val assignedAll = (0 until M).map(m =>
          assign(sub(m), books(m))
            .select(lit(m).as("m"), col("cl"), col("s")))
          .reduce(_ unionByName _)
        val rows = assignedAll
          .select(col("m"), col("cl"),
            posexplode(col("s")).as(Seq("pos", "v")))
          .groupBy("m", "cl", "pos")
          .agg(sum("v").as("sm"), count(lit(1)).as("n"))
          .collect()
        books = rows.groupBy(_.getInt(0)).map { case (m, ms) =>
          m -> ms.groupBy(_.getInt(1)).map { case (cl, rs) =>
            cl -> rs.sortBy(_.getInt(2))
              .map(r => r.getLong(3) / r.getLong(4))
          }.toSeq.sortBy(_._1)
        }
      }
      (0 until M).map(m => m -> books(m))
    } finally { q.unpersist(); () }
  }

  /** Encode the corpus: one row per (vec_id, m) with the assigned
    * code and its quantization error. */
  private[graft] def encoded(s: SparkSession, dir: String,
      books: Seq[(Int, Seq[(Int, Array[Long])])]): DataFrame =
    encodedOf(quantized(s, dir), books)

  /** [[encoded]] over an explicit quantized frame — the incremental
    * path encodes ONLY a change-feed batch against the frozen books. */
  private[graft] def encodedOf(corpus: DataFrame,
      books: Seq[(Int, Seq[(Int, Array[Long])])]): DataFrame =
    books.map { case (m, cents) =>
      assign(corpus.select(col("vec_id"),
          slice(col("e"), m * SUBD + 1, SUBD).as("s")), cents)
        .withColumn("m", lit(m))
    }.reduce(_ unionByName _)

  /** The unrolled oracle: subvectors for every (vec_id, m), shared
    * init + ITERS Lloyd rounds keyed (m, cl), final assignment.
    * `trainWhere` restricts the TRAINING corpus (`sub_t`) — the
    * index-maintenance oracle trains on the pinned v0 subset while
    * `fin` still encodes every vector against the frozen books; the
    * default TRUE trains on everything (q150/q159's shape,
    * mathematically identical to the unparameterized original). */
  private def oracleCtes(trainWhere: String): String = {
    def round(k: Int): String =
      s"""a$k AS (
         |  SELECT vec_id, m, s, cl, d2 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |                                 ORDER BY d2, cl) AS rn FROM (
         |      SELECT v.vec_id, v.m, v.s, c.cl,
         |             CAST(list_inner_product(v.s, v.s)
         |                  - 2 * list_inner_product(v.s, c.cent)
         |                  + list_inner_product(c.cent, c.cent)
         |               AS BIGINT) AS d2
         |      FROM sub_t v JOIN c${k - 1} c ON v.m = c.m))
         |  WHERE rn = 1),
         |c$k AS (
         |  SELECT m, cl, list(val ORDER BY i) AS cent FROM (
         |    SELECT m, cl, i,
         |           CAST(sum(s[i]) // count(*) AS BIGINT) AS val
         |    FROM a$k, generate_series(1, $SUBD) t(i)
         |    GROUP BY m, cl, i)
         |  GROUP BY m, cl)""".stripMargin
    s"""WITH v AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(round(x * $SCALE) AS BIGINT)) AS e
       |  FROM embeddings),
       |sub AS (
       |  SELECT vec_id, m, e[m * $SUBD + 1 : (m + 1) * $SUBD] AS s
       |  FROM v, (VALUES (0), (1), (2), (3)) t(m)),
       |sub_t AS (SELECT * FROM sub WHERE $trainWhere),
       |c0 AS (
       |  SELECT m, CAST(rn - 1 AS INT) AS cl, s AS cent FROM (
       |    SELECT m, s, row_number() OVER (PARTITION BY m
       |                                    ORDER BY vec_id) AS rn
       |    FROM sub_t)
       |  WHERE rn <= $K),
       |${(1 to ITERS).map(round).mkString(",\n")},
       |fin AS (
       |  SELECT vec_id, m, cl, d2 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |                                 ORDER BY d2, cl) AS rn FROM (
       |      SELECT v.vec_id, v.m, c.cl,
       |             CAST(list_inner_product(v.s, v.s)
       |                  - 2 * list_inner_product(v.s, c.cent)
       |                  + list_inner_product(c.cent, c.cent)
       |               AS BIGINT) AS d2
       |      FROM sub v JOIN c$ITERS c ON v.m = c.m))
       |  WHERE rn = 1)""".stripMargin
  }

  private val ORACLE_CTES: String = oracleCtes("TRUE")

  /** Quantize an (vec_id, embedding) frame to exact integer units. */
  private def quantize(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x * SCALE).cast("long")).as("e"))

  /** q162 scratch index: the embeddings corpus as a VERSIONED table
    * (v0 = 80%), PQ codebooks trained and frozen on v0, the v0 codes
    * stored; then the table takes an APPEND and the stored index
    * advances INCREMENTALLY — only the change feed's insert rows are
    * encoded against the frozen books and unioned onto the stored
    * codes. O(changes) index maintenance riding the lakehouse CDF,
    * the production contract for an ANN index over a growing corpus
    * (re-encoding 100 TB per batch is not a maintenance strategy).
    * Returns the maintained codes path. Once per session. */
  private def pqIndexPath(s: SparkSession, dir: String): String = {
    import graft.warehouse.{AtomicParquet, VersionedParquet}
    val root = graft.sources.Scratch.dir(s, "q162-pq-table")
    val idx0 = graft.sources.Scratch.dir(s, "q162-pq-codes-v0")
    val idx1 = graft.sources.Scratch.dir(s, "q162-pq-codes-v1")
    if (VersionedParquet.currentVersion(s, root).isEmpty) {
      val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
      VersionedParquet.publish(e.filter(col("vec_id") % 5 =!= 0), root,
        keepVersions = 10)
      val q0 = quantize(VersionedParquet.read(s, root, Some(0L)))
      val books = codebooksOf(q0)
      AtomicParquet.overwrite(
        encodedOf(q0, books).select("vec_id", "m", "cl", "d2"), idx0)
      VersionedParquet.append(s, root,
        e.filter(col("vec_id") % 5 === 0), keepVersions = 10)
      val delta = VersionedParquet.changes(s, root, 0L, 1L)
        .filter(col("_change_type") === "insert")
        .select("vec_id", "embedding")
      AtomicParquet.overwrite(
        s.read.parquet(idx0).unionByName(
          encodedOf(quantize(delta), books)
            .select("vec_id", "m", "cl", "d2")), idx1)
    }
    idx1
  }

  /** q243 scratch: the q162 maintained index driven through a DELETE
    * — vec_id % 15 == 0 rows leave the versioned table (the
    * right-to-be-forgotten event, q116's story applied to vectors),
    * and the stored codes advance by ONE anti-join against the
    * change feed's delete rows: O(changes), the index never
    * re-encodes. Once per session (after pqIndexPath's chain). */
  private def pqForgetPath(s: SparkSession, dir: String): String = {
    import graft.warehouse.{AtomicParquet, VersionedParquet}
    val root = graft.sources.Scratch.dir(s, "q162-pq-table")
    val idx2 = graft.sources.Scratch.dir(s, "q243-pq-codes-v2")
    val idx1 = pqIndexPath(s, dir) // ensures v0 + v1 and stored codes
    if (!VersionedParquet.currentVersion(s, root).exists(_ >= 2L)) {
      VersionedParquet.delete(s, root, col("vec_id") % 15 === 0,
        keepVersions = 10) // v2
      val gone = VersionedParquet.changes(s, root, 1L, 2L)
        .filter(col("_change_type") === "delete")
        .select("vec_id").distinct()
      AtomicParquet.overwrite(
        s.read.parquet(idx1).join(gone, Seq("vec_id"), "left_anti"),
        idx2)
    }
    idx2
  }

  /** Integer squared-L2 between two array<long> columns. */
  private def d2cols(a: String, b: String): Column =
    aggregate(zip_with(col(a), col(b), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  private def d2Sql(a: String, b: String): String =
    s"CAST(list_inner_product($a, $a) - 2 * list_inner_product($a, $b)" +
      s" + list_inner_product($b, $b) AS BIGINT)"

  val queries: Seq[QueryDef] = Seq(

    // ── PQ codebook training + corpus encoding in the gate ───────────────
    // Per (subspace, code): population, membership fingerprint (min
    // vec_id), and total quantization error — the compression-quality
    // dashboard. Every number is exact-integer, so a drifted centroid
    // mean, a wrong tie-break, or a mis-sliced subvector anywhere in
    // training OR encoding breaks the hash against the oracle's
    // identical unrolled rounds.
    QueryDef("q150_product_quantization",
      (s, d) => {
        val books = codebooks(s, d)
        encoded(s, d, books)
          .groupBy(col("m").as("subspace"), col("cl").as("code"))
          .agg(count(lit(1)).as("n_vecs"),
            min("vec_id").as("min_vec_id"),
            sum("d2").cast("long").as("quant_err"))
          .orderBy("subspace", "code")
      },
      Some(s"""$ORACLE_CTES
             |SELECT m AS subspace, cl AS code, count(*) AS n_vecs,
             |       min(vec_id) AS min_vec_id,
             |       CAST(sum(d2) AS BIGINT) AS quant_err
             |FROM fin
             |GROUP BY m, cl
             |ORDER BY subspace, code""".stripMargin)),

    // ── IVF-PQ composed serving: ADC scan over inverted lists ────────────
    // The production ANN stack q100 (stored IVF, exact rerank) and
    // q150 (PQ codebooks) each show half of: candidates come from the
    // probed coarse lists, are scored by ASYMMETRIC DISTANCE — the
    // query's per-(subspace, code) distance table (M·K integer cells,
    // broadcast) summed over each candidate's M stored CODES, never
    // touching the candidate's full vector — and only the ADC top-10
    // shortlist is reranked against true embeddings. At 100 TB the ADC
    // scan reads M bytes per candidate instead of 4·64; the exact scan
    // is confined to 10 rows per query. Everything is exact-integer
    // (SCALE-quantized L2, ties to the lowest id), so the DuckDB
    // oracle unrolls training AND serving and the hash covers the
    // whole pipeline — including a per-row recall flag against the
    // exact top-3 (q103's discipline: the gate measures what ADC
    // loses, not just that it runs).
    QueryDef("q159_ivf_pq_serving",
      (s, d) => {
        import s.implicits._
        val (nc, nProbe, nAdc, topK, every) = (16, 4, 10, 3, 50)
        val books = codebooks(s, d)
        // the quantized corpus and the stored codes feed four serving
        // stages each (lists, probes/cells, rerank, exact ground
        // truth) — persist both so the corpus decodes once
        val codes = encoded(s, d, books).select("vec_id", "m", "cl")
          .persist()
        val q = quantized(s, d).persist()
        val cents = q.orderBy("vec_id").limit(nc)
          .select(col("vec_id").as("cent_id"), col("e").as("ce"))
        val wA = Window.partitionBy("vec_id")
          .orderBy(col("cd2"), col("cent_id"))
        val lists = q.crossJoin(broadcast(cents))
          .withColumn("cd2", d2cols("e", "ce"))
          .withColumn("rk", row_number().over(wA))
          .filter(col("rk") === 1).select("vec_id", "cent_id")
        val qv = q.filter(col("vec_id") % every === 0)
          .select(col("vec_id").as("q_id"), col("e").as("qe"))
        val wP = Window.partitionBy("q_id")
          .orderBy(col("qd2"), col("cent_id"))
        val probes = qv.crossJoin(broadcast(cents))
          .withColumn("qd2", d2cols("qe", "ce"))
          .withColumn("rk", row_number().over(wP))
          .filter(col("rk") <= nProbe).select("q_id", "cent_id")
        // the query's ADC table: one integer cell per (subspace, code)
        val bookDf = books.flatMap { case (m, cs) =>
          cs.map { case (clv, cent) => (m, clv, cent.toSeq) }
        }.toDF("m", "cl", "cent")
        val qSub = (0 until M).map(m => qv.select(col("q_id"),
            lit(m).as("m"), slice(col("qe"), m * SUBD + 1, SUBD).as("qs")))
          .reduce(_ unionByName _)
        val cells = qSub.join(broadcast(bookDf), Seq("m"))
          .withColumn("dc", d2cols("qs", "cent"))
          .select("q_id", "m", "cl", "dc")
        // ADC scan: candidates' codes join the broadcast table
        val cand = lists.join(broadcast(probes), Seq("cent_id"))
          .filter(col("vec_id") =!= col("q_id")).select("q_id", "vec_id")
        val adc = cand.join(codes, Seq("vec_id"))
          .join(broadcast(cells), Seq("q_id", "m", "cl"))
          .groupBy("q_id", "vec_id").agg(sum("dc").as("adc_d2"))
        val wAdc = Window.partitionBy("q_id")
          .orderBy(col("adc_d2"), col("vec_id"))
        val shortlist = adc.withColumn("ark", row_number().over(wAdc))
          .filter(col("ark") <= nAdc)
        // exact rerank of the shortlist only
        val wR = Window.partitionBy("q_id")
          .orderBy(col("exact_d2"), col("vec_id"))
        val served = shortlist.join(q, Seq("vec_id"))
          .join(broadcast(qv), Seq("q_id"))
          .withColumn("exact_d2", d2cols("e", "qe"))
          .withColumn("rk", row_number().over(wR))
          .filter(col("rk") <= topK)
          .select("q_id", "rk", "vec_id", "adc_d2", "exact_d2")
        // recall flag vs the exact top-k over the WHOLE corpus
        val wE = Window.partitionBy("q_id")
          .orderBy(col("ed2"), col("vec_id"))
        val exact3 = q.crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("ed2", d2cols("e", "qe"))
          .withColumn("erk", row_number().over(wE))
          .filter(col("erk") <= topK)
          .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
        served.join(exact3, Seq("q_id", "vec_id"), "left")
          .select(col("q_id"), col("rk").cast("int").as("rk"),
            col("vec_id"), col("adc_d2").cast("long").as("adc_d2"),
            col("exact_d2").cast("long").as("exact_d2"),
            coalesce(col("hit"), lit(0)).cast("int").as("in_exact_top3"))
          .orderBy("q_id", "rk")
      },
      Some(s"""$ORACLE_CTES,
             |cents AS (
             |  SELECT vec_id AS cent_id, e AS ce FROM v
             |  ORDER BY vec_id LIMIT 16),
             |asg AS (
             |  SELECT vec_id, cent_id FROM (
             |    SELECT v.vec_id, c.cent_id,
             |           row_number() OVER (PARTITION BY v.vec_id
             |             ORDER BY ${d2Sql("v.e", "c.ce")}, c.cent_id)
             |             AS rk
             |    FROM v CROSS JOIN cents c)
             |  WHERE rk = 1),
             |qv AS (SELECT vec_id AS q_id, e AS qe FROM v
             |       WHERE vec_id % 50 = 0),
             |probes AS (
             |  SELECT q_id, cent_id FROM (
             |    SELECT q.q_id, c.cent_id,
             |           row_number() OVER (PARTITION BY q.q_id
             |             ORDER BY ${d2Sql("q.qe", "c.ce")}, c.cent_id)
             |             AS rk
             |    FROM qv q CROSS JOIN cents c)
             |  WHERE rk <= 4),
             |cells AS (
             |  SELECT q.q_id, s.m, c.cl,
             |         ${d2Sql("s.s", "c.cent")} AS dc
             |  FROM sub s JOIN qv q ON s.vec_id = q.q_id
             |  JOIN c$ITERS c ON c.m = s.m),
             |cand AS (
             |  SELECT p.q_id, a.vec_id
             |  FROM asg a JOIN probes p ON a.cent_id = p.cent_id
             |  WHERE a.vec_id != p.q_id),
             |adc AS (
             |  SELECT cd.q_id, cd.vec_id, CAST(sum(ce.dc) AS BIGINT)
             |           AS adc_d2
             |  FROM cand cd
             |  JOIN fin f ON f.vec_id = cd.vec_id
             |  JOIN cells ce ON ce.q_id = cd.q_id AND ce.m = f.m
             |               AND ce.cl = f.cl
             |  GROUP BY cd.q_id, cd.vec_id),
             |shortlist AS (
             |  SELECT q_id, vec_id, adc_d2 FROM (
             |    SELECT *, row_number() OVER (PARTITION BY q_id
             |      ORDER BY adc_d2, vec_id) AS ark FROM adc)
             |  WHERE ark <= 10),
             |rerank AS (
             |  SELECT q_id, vec_id, adc_d2, exact_d2,
             |         row_number() OVER (PARTITION BY q_id
             |           ORDER BY exact_d2, vec_id) AS rk
             |  FROM (
             |    SELECT sl.q_id, sl.vec_id, sl.adc_d2,
             |           ${d2Sql("v.e", "q.qe")} AS exact_d2
             |    FROM shortlist sl
             |    JOIN v ON v.vec_id = sl.vec_id
             |    JOIN qv q ON q.q_id = sl.q_id)),
             |exact3 AS (
             |  SELECT q_id, vec_id FROM (
             |    SELECT q.q_id, v.vec_id,
             |           row_number() OVER (PARTITION BY q.q_id
             |             ORDER BY ${d2Sql("v.e", "q.qe")}, v.vec_id)
             |             AS erk
             |    FROM v CROSS JOIN qv q WHERE v.vec_id != q.q_id)
             |  WHERE erk <= 3)
             |SELECT r.q_id, CAST(r.rk AS INT) AS rk, r.vec_id,
             |       r.adc_d2, r.exact_d2,
             |       CAST(CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END
             |         AS INT) AS in_exact_top3
             |FROM rerank r
             |LEFT JOIN exact3 e ON e.q_id = r.q_id AND e.vec_id = r.vec_id
             |WHERE r.rk <= 3
             |ORDER BY r.q_id, r.rk""".stripMargin)),

    // ── Incremental PQ index maintenance via the change feed ─────────────
    // The ANN tier meets the lakehouse tier: the codes index of a
    // VERSIONED embeddings table advances by encoding ONLY the change
    // feed's insert batch against the v0-frozen codebooks — O(changes)
    // per table commit, never a corpus re-encode. The oracle trains on
    // the v0 subset (sub_t) and encodes EVERY vector against those
    // frozen books, so a stale stored index, a feed-missed row, a
    // retrained codebook, or an encode drift between the bulk and
    // incremental paths all break the per-(subspace, code) hash.
    QueryDef("q162_pq_index_maintenance",
      (s, d) => {
        val idx = pqIndexPath(s, d)
        s.read.parquet(idx)
          .groupBy(col("m").as("subspace"), col("cl").as("code"))
          .agg(count(lit(1)).as("n_vecs"),
            min("vec_id").as("min_vec_id"),
            sum("d2").cast("long").as("quant_err"))
          .orderBy("subspace", "code")
      },
      Some(s"""${oracleCtes("vec_id % 5 <> 0")}
             |SELECT m AS subspace, cl AS code, count(*) AS n_vecs,
             |       min(vec_id) AS min_vec_id,
             |       CAST(sum(d2) AS BIGINT) AS quant_err
             |FROM fin
             |GROUP BY m, cl
             |ORDER BY subspace, code""".stripMargin)),

    // ── Index forget: DELETE-maintained stored ANN index ─────────────────
    // The missing half of index maintenance (q162 covers growth):
    // when corpus rows are FORGOTTEN (privacy deletion, q116's
    // contract), the stored vector index must forget them too — and
    // at O(changes), not a re-encode. The versioned embeddings table
    // takes a keyed DELETE; the stored codes advance by one anti-join
    // against the change feed's delete rows. The oracle re-derives
    // the index from scratch over the SURVIVING corpus (books frozen
    // on v0, the q162 contract), so incremental == rebuild IS the
    // hash equality — a leaked code (forgotten vector still
    // servable) or an over-deletion both break it.
    QueryDef("q243_pq_index_forget",
      (s, d) => {
        val idx = pqForgetPath(s, d)
        s.read.parquet(idx)
          .groupBy(col("m").as("subspace"), col("cl").as("code"))
          .agg(count(lit(1)).as("n_vecs"),
            min("vec_id").as("min_vec_id"),
            sum("d2").cast("long").as("quant_err"))
          .orderBy("subspace", "code")
      },
      Some(s"""${oracleCtes("vec_id % 5 <> 0")}
             |SELECT m AS subspace, cl AS code, count(*) AS n_vecs,
             |       min(vec_id) AS min_vec_id,
             |       CAST(sum(d2) AS BIGINT) AS quant_err
             |FROM fin
             |WHERE vec_id % 15 <> 0
             |GROUP BY m, cl
             |ORDER BY subspace, code""".stripMargin))
  )
}
