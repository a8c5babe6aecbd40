package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.functions.TextFns.{tokens, wordSetFingerprint}
import graft.sources.{QueryDef, Tables}

/** Sketch operators: cardinality estimation with an engine-portable
  * HyperLogLog built from first principles (Flajolet et al. 2007).
  *
  * Spark's `approx_count_distinct` is a black-box HLL++ whose estimate
  * no other engine reproduces — useless under a cross-engine oracle. At
  * 100 TB the sketch itself must also be MERGEABLE state you can store
  * per partition/day and union later; exposing the bucket/max-rank
  * representation (rather than a final scalar) is what makes that work:
  * the per-(key, bucket) max is a commutative monoid, so partial
  * sketches combine with one more `max` — the same contract as
  * Spark's partial aggregation.
  *
  * Construction, identical in Spark, DuckDB, and on paper:
  *   h = md5Long60(x) — uniform 60-bit hash (Hashing.scala)
  *   bucket = top 6 bits (m = 64 registers)
  *   rho = position of the highest set bit in the low 54 bits, counted
  *         from the top: 55 - length(bin(w)), or 55 when w = 0
  *   register_j = max(rho) over the bucket's values
  *   E = alpha_64 * m^2 / sum_j 2^(-register_j)
  * The 2^(-r) sum is computed SCALED by 2^55 in exact int64 — every
  * term 2^(55-r) is integral, so both engines sum the same integers in
  * any order; the single final division is one IEEE double op. No
  * RUNTIME transcendental functions → bit-identical estimates
  * everywhere, including below the raw estimator's ~2.5m validity
  * floor: the linear-counting correction's ln() is precomputed into a
  * 64-entry double-literal table both engines index (LC_TABLE).
  */
object SketchOps {

  private val M = 64      // registers (2^6)
  private val WBITS = 54  // 60-bit hash minus 6 bucket bits
  private val RMAX = WBITS + 1
  private val WMASK = (1L << WBITS) - 1
  /** alpha_64 * m^2 * 2^55 — the scaled estimator's numerator; the
    * double literal's shortest decimal form round-trips identically
    * into DuckDB. */
  private val NUM: Double = 0.709 * M * M * (1L << RMAX).toDouble

  /** Small-range (linear counting) correction, engine-portably: when the
    * raw estimate is <= 2.5m and empty registers remain, the unbiased
    * estimator is m*ln(m/V) with V = #empty registers (Flajolet §4).
    * ln() is transcendental — but V has only M possible values, so the
    * M possible corrections are PRECOMPUTED double literals both engines
    * index identically (shortest-decimal round-trip): no runtime libm
    * call whose last ulp could differ between JVM and C++. */
  private val LC_THRESHOLD: Double = 2.5 * M
  private val LC_TABLE: IndexedSeq[Double] =
    (1 to M).map(v => M * math.log(M.toDouble / v))

  /** HLL registers (lang, bucket, r) from any frame carrying (lang,
    * h60). This IS the sketch's stored/mergeable form: registers from
    * disjoint corpus slices combine by groupBy(lang, bucket).max(r) —
    * used by q70 in one pass and by streaming.SketchStream per
    * micro-batch. */
  private[graft] def registersOf(hashed: DataFrame,
                                 keys: Seq[String] = Seq("lang")): DataFrame = {
    val w = col("h60").bitwiseAND(lit(WMASK))
    hashed
      .select(keys.map(col) :+ shiftright(col("h60"), WBITS).as("bucket") :+
        when(w === 0, lit(RMAX))
          .otherwise(lit(RMAX) - graft.functions.BinLength(w)).as("rho"): _*)
      .groupBy(keys.head, keys.tail :+ "bucket": _*).agg(max("rho").as("r"))
  }

  /** Estimate per lang from a register frame: (lang, n_buckets,
    * total_scaled, est, hll_est). The scaled sum stays in exact int64;
    * `est` is the unrounded estimate AFTER the small-range correction
    * (raw HLL above 2.5m, table-looked-up linear counting below). */
  private[graft] def estimateOf(regs: DataFrame,
                                keys: Seq[String] = Seq("lang")): DataFrame =
    regs.groupBy(keys.head, keys.tail: _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(call_function("shiftleft", lit(1L),
          lit(RMAX) - col("r"))).as("sum_scaled"))
      .withColumn("total_scaled",
        col("sum_scaled") + (lit(M.toLong) - col("n_buckets")) * lit(1L << RMAX))
      .withColumn("raw_est", lit(NUM) / col("total_scaled").cast("double"))
      .withColumn("v_empty", lit(M.toLong) - col("n_buckets"))
      .withColumn("est",
        when(col("v_empty") > 0 && col("raw_est") <= lit(LC_THRESHOLD),
          element_at(array(LC_TABLE.map(lit): _*), col("v_empty").cast("int")))
          .otherwise(col("raw_est")))
      .withColumn("hll_est", round(col("est"), 1))

  /** DuckDB CTE text computing the corrected HLL estimate per `key`
    * from a prior CTE `hashed($key, h60)` — the engine-portable SQL
    * twin of registersOf + estimateOf, for oracles outside this file
    * (ANALYZE's q188). Emits CTEs `regs`, `estx`, `corrected`;
    * `corrected($key, n_buckets, est)` is the consumable. */
  private[graft] def hllEstimateSql(key: String): String =
    s"""regs AS (
       |  SELECT $key, h60 >> $WBITS AS bucket,
       |         max(CASE WHEN (h60 & $WMASK) = 0 THEN $RMAX
       |              ELSE $RMAX - length(bin(h60 & $WMASK)) END) AS r
       |  FROM hashed GROUP BY 1, 2),
       |estx AS (
       |  SELECT $key, count(*) AS n_buckets,
       |         CAST(sum(CAST(1 AS BIGINT) << ($RMAX - r)) AS BIGINT)
       |           + ($M - count(*)) * (CAST(1 AS BIGINT) << $RMAX)
       |           AS total_scaled
       |  FROM regs GROUP BY 1),
       |corrected AS (
       |  SELECT $key, n_buckets,
       |         CASE WHEN $M - n_buckets > 0
       |               AND $NUM / CAST(total_scaled AS DOUBLE)
       |                   <= CAST(${LC_THRESHOLD} AS DOUBLE)
       |              THEN [${LC_TABLE.mkString(", ")}]
       |                     [CAST($M - n_buckets AS INT)]
       |              ELSE $NUM / CAST(total_scaled AS DOUBLE) END AS est
       |  FROM estx)""".stripMargin

  val queries: Seq[QueryDef] = Seq(

    // ── HLL distinct-shingle estimate vs exact, per language ──────────────
    // One pass over the cached shingle frame (shared with the dedup
    // family — the hash is already computed): 64-register HLL per lang,
    // reported against the exact count. At sf0.01 distinct shingles per
    // lang ~= thousands >> 2.5m, comfortably in the raw estimator's
    // valid range; the err_pct column IS the sketch's statistical
    // contract, asserted |err| < 15% (3 sigma for m=64) in SketchSpec.
    QueryDef("q70_hll_distinct",
      (s, d) => {
        val sh = DedupOps.shingleHashes(s, d)
        val exact = sh.groupBy("lang")
          .agg(countDistinct("shingle").as("n_exact"))
        val est = estimateOf(registersOf(sh))
        exact.join(est, "lang")
          .withColumn("err_pct",
            round((col("est") - col("n_exact")) / col("n_exact") * 100, 2))
          .select("lang", "n_exact", "n_buckets", "hll_est", "err_pct")
          .orderBy("lang")
      },
      Some(s"""${DedupOps.EXPLODED_SQL},
             |exact AS (
             |  SELECT lang, count(DISTINCT shingle) AS n_exact
             |  FROM hashed GROUP BY 1),
             |regs AS (
             |  SELECT lang, h60 >> $WBITS AS bucket,
             |         max(CASE WHEN (h60 & $WMASK) = 0 THEN $RMAX
             |              ELSE $RMAX - length(bin(h60 & $WMASK)) END) AS r
             |  FROM hashed GROUP BY 1, 2),
             |est AS (
             |  SELECT lang, count(*) AS n_buckets,
             |         CAST(sum(CAST(1 AS BIGINT) << ($RMAX - r)) AS BIGINT)
             |           + ($M - count(*)) * (CAST(1 AS BIGINT) << $RMAX)
             |           AS total_scaled
             |  FROM regs GROUP BY 1),
             |corrected AS (
             |  SELECT lang, n_buckets,
             |         CASE WHEN $M - n_buckets > 0
             |               AND $NUM / CAST(total_scaled AS DOUBLE)
             |                   <= CAST(${LC_THRESHOLD} AS DOUBLE)
             |              THEN [${LC_TABLE.mkString(", ")}]
             |                     [CAST($M - n_buckets AS INT)]
             |              ELSE $NUM / CAST(total_scaled AS DOUBLE) END AS est
             |  FROM est)
             |SELECT lang, n_exact, n_buckets,
             |       round(est, 1) AS hll_est,
             |       round((est - n_exact) / n_exact * 100, 2) AS err_pct
             |FROM exact JOIN corrected USING (lang)
             |ORDER BY lang""".stripMargin)),

    // ── Bloom-filter join prefilter, with measured false-positive rate ────
    // The 100 TB join-reduction pattern: before shipping a huge probe
    // side across the shuffle, test each key against a Bloom filter of
    // the build side (what Spark's runtime row-group filtering and
    // Delta deletion vectors do under the hood) — only candidates pay
    // the exact join. Built portably: a 64-word × 60-bit blocked filter
    // (bit 60+ would overflow DuckDB's checked BIGINT shift), k = 2
    // md5-derived hashes, words combined with the bit_or AGGREGATE — so
    // the filter is itself mergeable partial state, like any Spark
    // partial agg. The query runs new-batch (doc_id % 10 = 0) word-set
    // fingerprints against the corpus filter and reports the funnel:
    // batch size → Bloom candidates → exact-join confirmed duplicates →
    // false positives (the sketch's contract, made visible).
    QueryDef("q74_bloom_prefilter",
      (s, d) => {
        val fps = Tables.documents(s, d)
          .select(col("doc_id"),
            wordSetFingerprint(tokens(col("text"))).as("fp"))
        def h(prefix: String) =
          Hashing.md5Long60(concat(lit(prefix), col("fp")))
        val keyed = fps
          .withColumn("h1", h("bloomA_")).withColumn("h2", h("bloomB_"))
        val corpus = keyed.filter(col("doc_id") % 10 =!= 0)
        val batch = keyed.filter(col("doc_id") % 10 === 0)
        val bloom = corpus
          .select(explode(array(col("h1"), col("h2"))).as("h"))
          .select(pmod(shiftright(col("h"), 6), lit(64L)).as("word"),
            call_function("shiftleft", lit(1L),
              pmod(col("h"), lit(60L)).cast("int")).as("m"))
          .groupBy("word").agg(expr("bit_or(m)").as("bits"))
        def probe(hc: String, w: String, bits: String) = {
          val b = bloom.select(col("word").as(w), col("bits").as(bits))
          (df: org.apache.spark.sql.DataFrame) => df
            .withColumn(w, pmod(shiftright(col(hc), 6), lit(64L)))
            .join(broadcast(b), Seq(w), "left")
            .withColumn(s"pass_$hc",
              coalesce(col(bits).bitwiseAND(
                call_function("shiftleft", lit(1L),
                  pmod(col(hc), lit(60L)).cast("int"))) =!= 0, lit(false)))
        }
        val probed = probe("h2", "w2", "bits2")(probe("h1", "w1", "bits1")(batch))
        val cand = probed.filter(col("pass_h1") && col("pass_h2"))
          .select("doc_id", "fp")
        val confirmed = cand.join(
          corpus.select(col("fp")).distinct(), Seq("fp"), "left_semi")
        cand.agg(count(lit(1)).as("n_candidates")).crossJoin(
            batch.agg(count(lit(1)).as("n_batch")))
          .crossJoin(confirmed.agg(count(lit(1)).as("n_confirmed")))
          .select(col("n_batch"), col("n_candidates"), col("n_confirmed"),
            (col("n_candidates") - col("n_confirmed")).as("n_false_pos"))
      },
      Some {
        val fp = "md5(array_to_string(list_sort(list_distinct(" +
          "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != ''))), ' '))"
        s"""WITH fps AS (
           |  SELECT doc_id, $fp AS fp,
           |         ${Hashing.md5Long60Sql("'bloomA_' || " + fp)} AS h1,
           |         ${Hashing.md5Long60Sql("'bloomB_' || " + fp)} AS h2
           |  FROM documents),
           |corpus AS (SELECT * FROM fps WHERE doc_id % 10 <> 0),
           |batch AS (SELECT * FROM fps WHERE doc_id % 10 = 0),
           |bloom AS (
           |  SELECT (h >> 6) % 64 AS word,
           |         bit_or(CAST(1 AS BIGINT) << CAST(h % 60 AS INT)) AS bits
           |  FROM (SELECT unnest([h1, h2]) AS h FROM corpus)
           |  GROUP BY 1),
           |cand AS (
           |  SELECT b.doc_id, b.fp
           |  FROM batch b
           |  LEFT JOIN bloom w1 ON w1.word = (b.h1 >> 6) % 64
           |  LEFT JOIN bloom w2 ON w2.word = (b.h2 >> 6) % 64
           |  WHERE coalesce((w1.bits & (CAST(1 AS BIGINT)
           |                             << CAST(b.h1 % 60 AS INT))) <> 0, false)
           |    AND coalesce((w2.bits & (CAST(1 AS BIGINT)
           |                             << CAST(b.h2 % 60 AS INT))) <> 0, false)),
           |conf AS (
           |  SELECT count(*) AS n_confirmed
           |  FROM cand WHERE fp IN (SELECT fp FROM corpus))
           |SELECT (SELECT count(*) FROM batch) AS n_batch,
           |       (SELECT count(*) FROM cand) AS n_candidates,
           |       n_confirmed,
           |       (SELECT count(*) FROM cand) - n_confirmed AS n_false_pos
           |FROM conf""".stripMargin
      }),

    // ── Count-Min sketch: point frequency estimates with one-sided error ──
    // The second mergeable sketch: a d=4 × w=64 counter matrix whose
    // cells are plain SUM aggregates — order-independent, partially
    // aggregable, and unionable across partitions/days by cell-wise
    // addition (unlike sampling-based top-k sketches, which depend on
    // arrival order and can never hash-match across engines). Estimate
    // = min over the d cells a key hashes to; CM guarantees est >=
    // exact (collisions only ADD), asserted per-row by SketchSpec. The
    // query reports the 20 most frequent tokens with exact count, CM
    // estimate, and the collision overestimate.
    QueryDef("q75_countmin",
      (s, d) => {
        val D = 4
        val W = 64L
        val tf = Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("c"))
        def bucket(j: Int) = pmod(
          Hashing.md5Long60(concat(lit(s"cms${j}_"), col("token"))), lit(W))
        val cells = tf
          .select(col("c"), explode(array((0 until D).map(j =>
            struct(lit(j).as("j"), bucket(j).as("bucket"))): _*)).as("jb"))
          .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
          .agg(sum("c").as("cell"))
        val top = tf.orderBy(col("c").desc, col("token").asc).limit(20)
        top
          .select(col("token"), col("c"), explode(array((0 until D).map(j =>
            struct(lit(j).as("j"), bucket(j).as("bucket"))): _*)).as("jb"))
          .join(broadcast(cells),
            col("jb.j") === cells("j") && col("jb.bucket") === cells("bucket"))
          .groupBy("token", "c")
          .agg(min("cell").as("cm_est"))
          .select(col("token"), col("c").as("exact"), col("cm_est"),
            (col("cm_est") - col("c")).as("overestimate"))
          .orderBy(col("exact").desc, col("token").asc)
      },
      Some {
        def bucketSql(j: Int) =
          s"${Hashing.md5Long60Sql(s"'cms${j}_' || token")} % 64"
        val cellUnion = (0 until 4).map(j =>
          s"SELECT $j AS j, ${bucketSql(j)} AS bucket, c FROM tf")
          .mkString("\n  UNION ALL\n  ")
        val probeUnion = (0 until 4).map(j =>
          s"SELECT token, c, $j AS j, ${bucketSql(j)} AS bucket FROM top")
          .mkString("\n  UNION ALL\n  ")
        s"""WITH toks AS (
           |  SELECT unnest(list_filter(string_split_regex(lower(text),
           |           '[^a-z0-9]+'), x -> x != '')) AS token
           |  FROM documents),
           |tf AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
           |cells AS (
           |  SELECT j, bucket, CAST(sum(c) AS BIGINT) AS cell
           |  FROM (
           |  $cellUnion)
           |  GROUP BY 1, 2),
           |top AS (SELECT token, c FROM tf
           |        ORDER BY c DESC, token ASC LIMIT 20),
           |probed AS (
           |  $probeUnion)
           |SELECT p.token, p.c AS exact, min(cl.cell) AS cm_est,
           |       min(cl.cell) - p.c AS overestimate
           |FROM probed p JOIN cells cl USING (j, bucket)
           |GROUP BY 1, 2
           |ORDER BY exact DESC, token ASC""".stripMargin
      }),

    // ── Sketch-driven heavy hitters: discover, then verify ────────────────
    // q75 probes KNOWN tokens; this is the production direction: find
    // the heavy hitters FROM the sketch. One pass builds the Count-Min
    // cells from the raw token stream; the term dictionary probes its
    // 4 cells and keeps tokens whose min-cell estimate clears a
    // RELATIVE threshold (total/512 — scale-invariant); only those
    // candidates pay the exact count (semi-join restricted aggregation).
    // CMS error is one-sided (est >= exact always), so NO true heavy
    // hitter can be missed — the report flags the false positives the
    // 4×64 sketch lets through, which is the funnel a 100 TB run
    // monitors to size w.
    QueryDef("q82_heavy_hitters",
      (s, d) => {
        val D = 4
        val W = 64L
        // ONE tokenize pass + ONE token-keyed shuffle: cells, the
        // dictionary probe, and the exact verify all derive from the
        // same tf aggregation (sum of per-term counts == count over the
        // raw stream, so the sketch is identical). At 100 TB the
        // dictionary is a stored term table and the sketch is
        // maintained incrementally (SketchStream-style); the discovery
        // step below still uses ONLY the cells — tf merely prices the
        // verify tier.
        val tf = Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("c"))
        def bucket(j: Int) = pmod(
          Hashing.md5Long60(concat(lit(s"cms${j}_"), col("token"))), lit(W))
        val cells = tf
          .select(col("c"), explode(array((0 until D).map(j =>
            struct(lit(j).as("j"), bucket(j).as("bucket"))): _*)).as("jb"))
          .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
          .agg(sum("c").as("cell"))
        val total = tf.agg(sum("c").as("n_total"))
        val candidates = tf
          .select(col("token"), col("c"), explode(array((0 until D).map(j =>
            struct(lit(j).as("j"), bucket(j).as("bucket"))): _*)).as("jb"))
          .join(broadcast(cells),
            col("jb.j") === cells("j") && col("jb.bucket") === cells("bucket"))
          .groupBy("token", "c").agg(min("cell").as("cm_est"))
          .crossJoin(broadcast(total))
          .filter(col("cm_est") >= call_function("div",
            col("n_total"), lit(512L)))
        candidates
          .select(col("token"), col("cm_est"), col("c").as("exact"),
            (col("c") >= call_function("div",
              col("n_total"), lit(512L))).cast("int").as("true_hitter"))
          .orderBy(col("exact").desc, col("token").asc)
      },
      Some {
        def bucketSql(j: Int) =
          s"${Hashing.md5Long60Sql(s"'cms${j}_' || token")} % 64"
        val cellUnion = (0 until 4).map(j =>
          s"SELECT $j AS j, ${bucketSql(j)} AS bucket, c FROM tf")
          .mkString("\n  UNION ALL\n  ")
        val probeUnion = (0 until 4).map(j =>
          s"SELECT token, c, $j AS j, ${bucketSql(j)} AS bucket FROM tf")
          .mkString("\n  UNION ALL\n  ")
        s"""WITH toks AS (
           |  SELECT unnest(list_filter(string_split_regex(lower(text),
           |           '[^a-z0-9]+'), x -> x != '')) AS token
           |  FROM documents),
           |tf AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
           |cells AS (
           |  SELECT j, bucket, CAST(sum(c) AS BIGINT) AS cell
           |  FROM (
           |  $cellUnion)
           |  GROUP BY 1, 2),
           |total AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM tf),
           |probed AS (
           |  $probeUnion),
           |cand AS (
           |  SELECT p.token, p.c, min(cl.cell) AS cm_est
           |  FROM probed p JOIN cells cl USING (j, bucket)
           |  GROUP BY 1, 2),
           |kept AS (
           |  SELECT c.token, c.cm_est, c.c, t.n_total
           |  FROM cand c CROSS JOIN total t
           |  WHERE c.cm_est >= t.n_total // 512)
           |SELECT token, cm_est, c AS exact,
           |       CAST(c >= n_total // 512 AS INT) AS true_hitter
           |FROM kept
           |ORDER BY exact DESC, token ASC""".stripMargin
      }),

    // ── Sketch-FIRST heavy hitters: the 100 TB funnel, structurally ──────
    // q82 derives its sketch from a tf aggregation that already holds
    // exact counts, so its "only candidates pay the exact count" is
    // notional. Here the funnel is real in the PLAN:
    //   1. cells aggregate straight off the raw token stream — the
    //      shuffle carries 4×64 cell keys (map-side partials collapse
    //      each task to ≤256 rows), never the term dictionary;
    //   2. candidates come from a STORED dictionary (a parquet terms
    //      table, the q79 persist-and-probe pattern — in production
    //      it's maintained incrementally) probing the broadcast cells;
    //   3. ONLY candidates pay an exact count: a broadcast semi-join
    //      restricts the raw stream BEFORE its token-keyed aggregation,
    //      so the exact tier's shuffle carries candidate tokens only.
    // CMS error stays one-sided (est >= exact), so no true hitter is
    // missed; results equal q82's by construction (sum of per-term
    // counts == count over the raw stream).
    QueryDef("q84_sketch_first_hitters",
      (s, d) => {
        val D = 4
        val W = 64L
        val toks = Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("token"))
        // stored dictionary: written once (run-unique Scratch path,
        // like q79's signature index — per-app root, shutdown-hook
        // deleted), re-read as the discovery probe side
        val dictPath = graft.sources.Scratch.dir(s,
          "term-dict-" + Integer.toHexString(d.hashCode))
        graft.warehouse.AtomicParquet.overwrite(toks.distinct(), dictPath)
        val dict = s.read.parquet(dictPath)
        def bucket(j: Int) = pmod(
          Hashing.md5Long60(concat(lit(s"cms${j}_"), col("token"))), lit(W))
        val jb = (j: Int) => struct(lit(j).as("j"), bucket(j).as("bucket"))
        val cells = toks
          .select(explode(array((0 until D).map(jb): _*)).as("jb"))
          .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
          .agg(count(lit(1)).as("cell"))
        // n_total = Σ cells of any one row j (each token instance lands
        // in exactly one bucket per row) — read off the sketch instead
        // of a third full tokenize scan (r16 optimization, guide §1.2)
        val total = cells.filter(col("j") === 0)
          // coalesce: sum over ZERO cells (empty token stream) is NULL
          // where the old toks.agg(count(1)) read 0 — preserve the 0 so
          // downstream ratio arithmetic keeps its divide-by-zero guard
          .agg(coalesce(sum("cell"), lit(0L)).cast("long").as("n_total"))
        val candidates = dict
          .select(col("token"), explode(array((0 until D).map(jb): _*)).as("jb"))
          .join(broadcast(cells),
            col("jb.j") === cells("j") && col("jb.bucket") === cells("bucket"))
          .groupBy("token").agg(min("cell").as("cm_est"))
          .crossJoin(broadcast(total))
          .filter(col("cm_est") >= call_function("div",
            col("n_total"), lit(512L)))
        val exact = toks
          .join(broadcast(candidates.select("token")), Seq("token"), "left_semi")
          .groupBy("token").agg(count(lit(1)).as("exact"))
        candidates.join(exact, Seq("token"))
          .select(col("token"), col("cm_est"), col("exact"),
            (col("exact") >= call_function("div",
              col("n_total"), lit(512L))).cast("int").as("true_hitter"))
          .orderBy(col("exact").desc, col("token").asc)
      },
      Some {
        def bucketSql(j: Int) =
          s"${Hashing.md5Long60Sql(s"'cms${j}_' || token")} % 64"
        val cellUnion = (0 until 4).map(j =>
          s"SELECT $j AS j, ${bucketSql(j)} AS bucket FROM toks")
          .mkString("\n  UNION ALL\n  ")
        val probeUnion = (0 until 4).map(j =>
          s"SELECT token, $j AS j, ${bucketSql(j)} AS bucket FROM dict")
          .mkString("\n  UNION ALL\n  ")
        s"""WITH toks AS (
           |  SELECT unnest(list_filter(string_split_regex(lower(text),
           |           '[^a-z0-9]+'), x -> x != '')) AS token
           |  FROM documents),
           |dict AS (SELECT DISTINCT token FROM toks),
           |cells AS (
           |  SELECT j, bucket, CAST(count(*) AS BIGINT) AS cell
           |  FROM (
           |  $cellUnion)
           |  GROUP BY 1, 2),
           |total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
           |probed AS (
           |  $probeUnion),
           |cand AS (
           |  SELECT p.token, min(cl.cell) AS cm_est
           |  FROM probed p JOIN cells cl USING (j, bucket)
           |  GROUP BY 1),
           |kept AS (
           |  SELECT c.token, c.cm_est, t.n_total
           |  FROM cand c CROSS JOIN total t
           |  WHERE c.cm_est >= t.n_total // 512),
           |exact AS (
           |  SELECT token, count(*) AS exact FROM toks
           |  WHERE token IN (SELECT token FROM kept)
           |  GROUP BY 1)
           |SELECT k.token, k.cm_est, e.exact,
           |       CAST(e.exact >= k.n_total // 512 AS INT) AS true_hitter
           |FROM kept k JOIN exact e USING (token)
           |ORDER BY exact DESC, token ASC""".stripMargin
      }),

    // ── HLL set algebra: segment overlap WITHOUT touching raw data ────────
    // THE reason sketches exist at 100 TB: per-segment registers are
    // tiny mergeable state, so |A ∪ B| comes from a max-merge of two
    // 64-register vectors and |A ∩ B| from inclusion-exclusion — no
    // re-scan of either segment. Per-source registers over the shared
    // shingle stream; all C(20,2) source pairs get est_a/est_b/
    // est_union/est_overlap from register algebra alone, reported
    // against the exact intersection (the shingle-keyed join the sketch
    // path exists to avoid). Register max-merge is associative and
    // commutative — the same state SketchStream folds per micro-batch.
    // Honesty note: inclusion-exclusion error scales with |union|
    // (stderr 1.04/sqrt(m) per estimate), so overlaps much smaller than
    // the union estimate's noise floor can come out NEGATIVE — reported
    // unclamped, with the exact count alongside, because that IS the
    // sketch's contract at m=64; production sizes m to the overlap it
    // must resolve. Round7OpsSpec pins domination (structural) and a
    // 4-sigma error bound (statistical).
    QueryDef("q102_hll_set_algebra",
      (s, d) => {
        val keyed = DedupOps.shingleHashes(s, d)
          .select(col("doc_id"), col("shingle"), col("h60"))
          .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
        val regs = registersOf(keyed, Seq("source"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val est1 = estimateOf(regs, Seq("source"))
          .select(col("source"), col("est"))
        val srcs = regs.select("source").distinct()
        val pairs = srcs.select(col("source").as("src_a"))
          // source-cardinality × source-cardinality (a handful each):
          // broadcast the right side so the pair cross plans as a
          // BroadcastNestedLoopJoin, never a shuffled CartesianProduct
          .crossJoin(broadcast(srcs.select(col("source").as("src_b"))))
          .filter(col("src_a") < col("src_b"))
        // every frame below is bounded by construction — pairs ≤
        // C(sources,2), regs ≤ sources×64 registers, est1 ≤ sources —
        // so each join broadcasts its pair/estimate side instead of
        // letting the post-aggregation size estimates plan ≤64-row
        // SMJs (12 of them before this pass; q157's surgery)
        val uRegs = regs.withColumnRenamed("source", "src_a")
          .join(broadcast(pairs), Seq("src_a"))
          .select("src_a", "src_b", "bucket", "r")
          .union(regs.withColumnRenamed("source", "src_b")
            .join(broadcast(pairs), Seq("src_b"))
            .select("src_a", "src_b", "bucket", "r"))
          .groupBy("src_a", "src_b", "bucket").agg(max("r").as("r"))
        val uEst = estimateOf(uRegs, Seq("src_a", "src_b"))
          .select(col("src_a"), col("src_b"), col("est").as("est_u"))
        // exact intersection WITHOUT the shingle-keyed self-join the
        // r15 shape paid (distinct + join + countDistinct = three
        // exchanges of the full shingle stream): the source set per
        // shingle is tiny (≤ #sources), so ONE collect_set aggregation
        // (map-side partials collapse duplicate (source, shingle)
        // rows) followed by in-cell pair expansion yields each
        // (src_a, src_b, shingle) exactly once — count(*) == the old
        // countDistinct by construction (r16 optimization, guide §2.4
        // "remove shuffles outright": 3 exchanges → 2, no join)
        val exact = keyed
          .groupBy("shingle").agg(array_sort(collect_set("source")).as("ss"))
          .select(explode(flatten(transform(col("ss"), (a, i) =>
            transform(slice(col("ss"), i + 2, size(col("ss"))),
              b => struct(a.as("src_a"), b.as("src_b")))))).as("p"))
          .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
          .agg(count(lit(1)).as("n_exact_overlap"))
        uEst
          .join(broadcast(est1.toDF("src_a", "est_a")), "src_a")
          .join(broadcast(est1.toDF("src_b", "est_b")), "src_b")
          .join(broadcast(exact), Seq("src_a", "src_b"), "left")
          .select(col("src_a"), col("src_b"),
            round(col("est_a"), 1).as("est_a"),
            round(col("est_b"), 1).as("est_b"),
            round(col("est_u"), 1).as("est_union"),
            round(col("est_a") + col("est_b") - col("est_u"), 1)
              .as("est_overlap"),
            coalesce(col("n_exact_overlap"), lit(0L)).as("n_exact_overlap"))
          .orderBy("src_a", "src_b")
      },
      Some {
        def corrected(keys: String, from: String) =
          s"""SELECT $keys, count(*) AS n_buckets,
             |         CAST(sum(CAST(1 AS BIGINT) << ($RMAX - r)) AS BIGINT)
             |           + ($M - count(*)) * (CAST(1 AS BIGINT) << $RMAX)
             |           AS total_scaled
             |  FROM $from GROUP BY ALL""".stripMargin
        def estExpr =
          s"""CASE WHEN $M - n_buckets > 0
             |               AND $NUM / CAST(total_scaled AS DOUBLE)
             |                   <= CAST(${LC_THRESHOLD} AS DOUBLE)
             |              THEN [${LC_TABLE.mkString(", ")}]
             |                     [CAST($M - n_buckets AS INT)]
             |              ELSE $NUM / CAST(total_scaled AS DOUBLE) END""".stripMargin
        s"""${DedupOps.EXPLODED_SQL},
           |keyed AS (
           |  SELECT d.source, h.shingle, h.h60
           |  FROM hashed h JOIN documents d USING (doc_id)),
           |regs AS (
           |  SELECT source, h60 >> $WBITS AS bucket,
           |         max(CASE WHEN (h60 & $WMASK) = 0 THEN $RMAX
           |              ELSE $RMAX - length(bin(h60 & $WMASK)) END) AS r
           |  FROM keyed GROUP BY 1, 2),
           |sc1 AS (
           |  ${corrected("source", "regs")}),
           |est1 AS (
           |  SELECT source, $estExpr AS est
           |  FROM sc1),
           |pairs AS (
           |  SELECT a.source AS src_a, b.source AS src_b
           |  FROM (SELECT DISTINCT source FROM keyed) a
           |  JOIN (SELECT DISTINCT source FROM keyed) b
           |    ON a.source < b.source),
           |uregs AS (
           |  SELECT p.src_a, p.src_b, r.bucket, max(r.r) AS r
           |  FROM pairs p JOIN regs r
           |    ON r.source = p.src_a OR r.source = p.src_b
           |  GROUP BY 1, 2, 3),
           |scu AS (
           |  ${corrected("src_a, src_b", "uregs")}),
           |estu AS (
           |  SELECT src_a, src_b, $estExpr AS est_u
           |  FROM scu),
           |ds AS (SELECT DISTINCT source, shingle FROM keyed),
           |exact AS (
           |  SELECT a.source AS src_a, b.source AS src_b,
           |         count(DISTINCT a.shingle) AS n_exact_overlap
           |  FROM ds a JOIN ds b
           |    ON a.shingle = b.shingle AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT u.src_a, u.src_b,
           |       round(ea.est, 1) AS est_a,
           |       round(eb.est, 1) AS est_b,
           |       round(u.est_u, 1) AS est_union,
           |       round(ea.est + eb.est - u.est_u, 1) AS est_overlap,
           |       CAST(coalesce(x.n_exact_overlap, 0) AS BIGINT)
           |         AS n_exact_overlap
           |FROM estu u
           |JOIN est1 ea ON ea.source = u.src_a
           |JOIN est1 eb ON eb.source = u.src_b
           |LEFT JOIN exact x ON x.src_a = u.src_a AND x.src_b = u.src_b
           |ORDER BY u.src_a, u.src_b""".stripMargin
      }),

    // ── Maintained daily HLL sketch + sliding-window distinct ────────────
    // The sketch tier's answer to "distinct users per trailing 7 days,
    // every day, forever": a STORED per-day register table — (day,
    // bucket, r), ≤ m rows per day however big the day — maintained
    // from the activity table's own change feed (the q162/q168/q178/
    // q192 stored-index discipline applied to sketches). Ingest is
    // three insert batches, the last carrying LATE rows for earlier
    // days (the production late-arrival case), so maintenance genuinely
    // MERGES registers (groupBy max) rather than appending fresh days;
    // max is associative/commutative/idempotent, so incremental ==
    // full-rebuild exactly — and the oracle proves it by recomputing
    // registers from the final table. Windowing never rescans events:
    // each day-sketch row fans out to the ≤ 7 window anchors it serves
    // (D·m rows total — bounded by the calendar, not the corpus) and
    // anchors merge by register max; the estimate is the engine-portable
    // corrected HLL of q70. This is THE 100 TB shape: the corpus is
    // touched once per ingest batch, every (day, window) readout after
    // that is calendar-sized arithmetic.
    QueryDef("q227_sliding_hll_maintenance",
      (s, d) => {
        val regs = s.read.parquet(dailyHllPath(s, d))
        val anchors = regs.select(col("day").as("anchor")).distinct()
        val windowed = regs
          .withColumn("anchor",
            explode(expr("sequence(day, date_add(day, 6))")))
          .join(anchors, Seq("anchor"), "left_semi")
          .groupBy("anchor", "bucket").agg(max("r").as("r"))
        estimateOf(windowed, Seq("anchor"))
          .select(col("anchor").as("window_end"), col("n_buckets"),
            col("hll_est").as("est_users_7d"))
          .orderBy("window_end")
      },
      Some(s"""WITH base AS (
             |  SELECT CAST(ts AS DATE) AS day, user_id FROM events),
             |days AS (SELECT DISTINCT day FROM base),
             |hashed AS (
             |  SELECT d.day AS anchor,
             |         ${Hashing.md5Long60Sql("CAST(b.user_id AS VARCHAR)")}
             |           AS h60
             |  FROM base b JOIN days d ON d.day BETWEEN b.day AND b.day + 6),
             |${hllEstimateSql("anchor")}
             |SELECT anchor AS window_end, n_buckets,
             |       round(est, 1) AS est_users_7d
             |FROM corrected
             |ORDER BY window_end""".stripMargin))
  )

  /** q227 activity table: (day, user_id, event_id) from events,
    * published as three insert batches — days 1–10, days 11–20, then
    * days 21–30 PLUS the held-back late cohort (event_id % 7 = 3) of
    * ALL days. Once per session. */
  private def activityRoot(s: org.apache.spark.sql.SparkSession,
                           d: String): String = {
    import graft.warehouse.VersionedParquet
    val root = graft.sources.Scratch.dir(s, "q227-activity")
    if (VersionedParquet.currentVersion(s, root).isEmpty) {
      val ev = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"),
          col("event_id"))
      val late = col("event_id") % 7 === 3
      val dom = dayofmonth(col("day"))
      VersionedParquet.publish(ev.filter(dom <= 10 && !late), root,
        keepVersions = 10)
      VersionedParquet.append(s, root,
        ev.filter(dom >= 11 && dom <= 20 && !late), keepVersions = 10)
      VersionedParquet.append(s, root,
        ev.filter((dom >= 21) || late), keepVersions = 10)
    }
    root
  }

  /** The maintained per-day register table: v0 rebuild + one register
    * merge per change-feed batch — each increment computes registers
    * from ONLY its batch's rows and folds in by groupBy(day, bucket)
    * max(r). */
  private def dailyHllPath(s: org.apache.spark.sql.SparkSession,
                           d: String): String = {
    import graft.warehouse.VersionedParquet
    val root = activityRoot(s, d)
    val idx = graft.sources.Scratch.dir(s, "q227-daily-hll")
    if (!new java.io.File(idx).exists()) {
      def hashed(rows: DataFrame): DataFrame = rows.select(col("day"),
        Hashing.md5Long60(col("user_id").cast("string")).as("h60"))
      var regs = registersOf(
        hashed(VersionedParquet.read(s, root, Some(0L))), Seq("day"))
      for ((from, to) <- Seq((0L, 1L), (1L, 2L))) {
        val feed = VersionedParquet.changes(s, root, from, to)
          .filter(col("_change_type") === "insert")
        regs = regs.unionByName(registersOf(hashed(feed), Seq("day")))
          .groupBy("day", "bucket").agg(max("r").as("r"))
      }
      graft.warehouse.AtomicParquet.overwrite(regs, idx)
    }
    idx
  }
}
