package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{QueryDef, Tables}

/** Iterative graph analytics in the correctness gate: weighted PageRank
  * over the nation-level trade graph (edge src→dst weighted by how many
  * lineitems a customer nation bought from a supplier nation — a real
  * 4-table star derivation, the part that is fact-table-sized).
  *
  * All rank arithmetic is EXACT INTEGER micro-units (r0 = 1e9; each
  * round r' = 0.15e9 + Σ ((r·85)//100·w)//wout over incoming edges):
  * integer sums are order-independent, so five distributed iterations
  * hash-match the DuckDB oracle's five unrolled CTEs bit-for-bit — the
  * q54 recursive-oracle discipline applied to PageRank. (Float
  * PageRank would diverge in the low bits under Spark's unordered
  * partial aggregation.)
  *
  * Scale shape: the edge derivation is the heavy part — broadcast dims
  * onto the fact scan, one shuffle to (src, dst). Each iteration is one
  * bounded-key join (edges ⋈ ranks on src — node-cardinality frame) +
  * one shuffle agg on dst; the node frame never grows and lineage is
  * cut per round like q54/q99. Dangling-node mass leaks by design
  * (standard simplification) — identically on both engines. At larger
  * weight scales the integer products approach 2^63: normalize w
  * per-src (w/wout as a fixed-point fraction) before multiplying —
  * noted here because the gate runs at sf where products stay exact. */
object GraphOps {

  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  private val ITERS = 5

  private[graft] def tradePagerank(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    // fact ⋈ fact on the order key (shuffle/AQE decides), dims broadcast
    val edges = l
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .cache()
    val outw = edges.groupBy("src").agg(sum("w").as("wout"))
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().cache()
    var ranks = nodes.withColumn("r", lit(1000000000L))
    for (_ <- 0 until ITERS) {
      val contribs = edges
        .join(outw, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          idiv(idiv(col("r") * 85, lit(100L)) * col("w"), col("wout")).as("c"))
        .groupBy("id").agg(sum("c").as("inc"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(150000000L) + coalesce(col("inc"), lit(0L))).as("r"))
        .localCheckpoint(false)
    }
    ranks
      .join(broadcast(Tables.nation(s, d).select(
        col("n_nationkey"), col("n_name"))),
        ranks("id") === col("n_nationkey"))
      .select(col("n_name"), col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("n_name"))
  }

  /** The oracle's per-iteration CTE (id, r) from the previous one. */
  private def iterSql(k: Int): String =
    s"""r$k AS (
       |  SELECT n.id,
       |         CAST(150000000 + coalesce(sum(
       |           ((p.r * 85) // 100 * e.w) // o.wout), 0) AS BIGINT) AS r
       |  FROM nodes n
       |  LEFT JOIN edges e ON e.dst = n.id
       |  LEFT JOIN outw o ON o.src = e.src
       |  LEFT JOIN r${k - 1} p ON p.id = e.src
       |  GROUP BY n.id)""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("q111_pagerank",
      (s, d) => tradePagerank(s, d),
      Some(s"""WITH edges AS (
             |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             |         CAST(count(*) AS BIGINT) AS w
             |  FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |  GROUP BY 1, 2),
             |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout
             |         FROM edges GROUP BY 1),
             |nodes AS (SELECT src AS id FROM edges
             |          UNION SELECT dst FROM edges),
             |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes),
             |${(1 to ITERS).map(iterSql).mkString(",\n")}
             |SELECT n_name, r AS rank_micro
             |FROM r$ITERS JOIN nation ON id = n_nationkey
             |ORDER BY rank_micro DESC, n_name""".stripMargin))
  )
}
