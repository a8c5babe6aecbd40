package graft.operators

import org.apache.spark.sql.functions._

import graft.sources.QueryDef

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
  * transcendental functions → bit-identical estimates everywhere (the
  * small-range linear-counting correction needs ln(); omitted, and the
  * m=64 raw estimator is documented as biased below ~2.5m = 160).
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
        val w = col("h60").bitwiseAND(lit(WMASK))
        val regs = sh
          .select(col("lang"), shiftright(col("h60"), WBITS).as("bucket"),
            when(w === 0, lit(RMAX))
              .otherwise(lit(RMAX) - length(bin(w))).as("rho"))
          .groupBy("lang", "bucket").agg(max("rho").as("r"))
        val est = regs.groupBy("lang")
          .agg(count(lit(1)).as("n_buckets"),
            sum(call_function("shiftleft", lit(1L),
              lit(RMAX) - col("r"))).as("sum_scaled"))
          .withColumn("total_scaled",
            col("sum_scaled") + (lit(M.toLong) - col("n_buckets")) * lit(1L << RMAX))
          .withColumn("hll_est",
            round(lit(NUM) / col("total_scaled").cast("double"), 1))
        exact.join(est, "lang")
          .withColumn("err_pct",
            round((lit(NUM) / col("total_scaled").cast("double")
              - col("n_exact")) / col("n_exact") * 100, 2))
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
             |  FROM regs GROUP BY 1)
             |SELECT lang, n_exact, n_buckets,
             |       round($NUM / CAST(total_scaled AS DOUBLE), 1) AS hll_est,
             |       round(($NUM / CAST(total_scaled AS DOUBLE) - n_exact)
             |             / n_exact * 100, 2) AS err_pct
             |FROM exact JOIN est USING (lang)
             |ORDER BY lang""".stripMargin))
  )
}
