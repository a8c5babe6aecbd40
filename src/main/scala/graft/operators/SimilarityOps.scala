package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Baseline: brute-force cosine top-k — exact, linear scan, and the
  * correctness yardstick (oracle via DuckDB's list arithmetic with the
  * same double-precision fold order). Scale path: random-hyperplane LSH
  * bucketing — candidates come from an equi-join on bucket signature
  * (no pairwise product), re-ranked exactly; SimilaritySpec measures its
  * recall against brute force. At 100 TB the LSH variant is the only
  * shape that works: bucket join + per-bucket rerank, both linear-ish.
  *
  * All vector math is double-precision expression-level fold (aggregate/
  * zip_with) — codegen'd, no UDF.
  */
object SimilarityOps {

  /** dot(a, b) as a sequential left fold in double precision.
    * DuckDB mirror: list_sum(list_transform(range(1, 65),
    *   i -> CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE))) */
  private def dot(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")

  private def normSq(a: String) = dot(a, a)

  /** cosine(a,b) with the exact same expression shape on both sides. */
  private def cosine(a: String, b: String) =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim):
    * xxhash64 → int in [-500, 499] (scale is irrelevant for sign tests). */
  private val planeCoef = "CAST(pmod(xxhash64(p, i), 1000) - 500 AS DOUBLE)"

  val queries: Seq[QueryDef] = Seq(

    // ── Brute-force cosine top-k vs a fixed query vector (vec_id 0) ───────
    QueryDef("q38_cosine_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qvec"))
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("label"),
            cosine("embedding", "qvec").as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(10)
      },
      Some("""WITH q AS (SELECT embedding AS qvec FROM embeddings
             |           WHERE vec_id = 0)
             |SELECT vec_id, label,
             |       list_sum(list_transform(range(1, 65),
             |         i -> CAST(embedding[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))
             |       / (sqrt(list_sum(list_transform(range(1, 65),
             |            i -> CAST(embedding[i] AS DOUBLE)
             |                 * CAST(embedding[i] AS DOUBLE))))
             |          * sqrt(list_sum(list_transform(range(1, 65),
             |            i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))))
             |         AS cos_sim
             |FROM embeddings CROSS JOIN q
             |WHERE vec_id != 0
             |ORDER BY cos_sim DESC, vec_id
             |LIMIT 10""".stripMargin)),

    // ── Per-label centroid cosine: grouped vector aggregation ─────────────
    QueryDef("q39_label_centroid",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        // mean vector per label via element-wise sum fold, then norm stats
        val summed = e.groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            expr("aggregate(collect_list(embedding), " +
              "array_repeat(0D, 64), (acc, v) -> zip_with(acc, v, " +
              "(x, y) -> x + CAST(y AS DOUBLE)))").as("sumvec"))
        summed.select(col("label"), col("n_vecs"),
            round(expr("sqrt(aggregate(sumvec, 0D, (acc, x) -> acc + x * x))")
              / col("n_vecs"), 6).as("centroid_norm"))
          .orderBy("label")
      },
      // collect_list order varies; the element-wise SUM is order-sensitive
      // in the last ulps, so round(…,6) pins it. DuckDB mirrors with
      // per-dimension unnest aggregation.
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

    // ── LSH-bucketed ANN: the 100 TB path (no oracle; recall-tested) ──────
    QueryDef("q40_ann_lsh",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        // 12-bit random-hyperplane signature, expression-only
        val sig = expr(s"""aggregate(
          transform(sequence(0, 11), p ->
            CASE WHEN aggregate(zip_with(embedding,
                   transform(sequence(0, 63), i -> $planeCoef),
                   (x, c) -> CAST(x AS DOUBLE) * c), 0D, (acc, v) -> acc + v) > 0
                 THEN shiftleft(1, p) ELSE 0 END),
          0, (acc, x) -> acc + x)""")
        val bucketed = e.withColumn("bucket", sig)
        bucketed.groupBy("bucket")
          .agg(count(lit(1)).as("n_vecs"),
            countDistinct("label").as("n_labels"))
          .orderBy("bucket")
      },
      None)
  )
}
