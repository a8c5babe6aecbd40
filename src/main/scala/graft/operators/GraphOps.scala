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
  * (standard simplification) — identically on both engines.
  *
  * Overflow safety: the raw form `((r·85)//100·w)//wout` has a product
  * that GROWS WITH THE FACT TABLE (w is a lineitem count — ~2^40 at
  * 100 TB), so at scale `(r·0.85)·w` silently wraps Long. Instead the
  * edge weight is normalized ONCE to a fixed-point fraction
  * `wfrac = (w << 20) // wout  (≤ 2^20 always, since w ≤ wout)` and
  * each round computes `((r·85)//100 · wfrac) >> 20` — the per-term
  * product is now bounded by rank mass alone (r·0.85·2^20 < 2^63 for
  * any r < 2^42, i.e. total graph mass up to ~4×10^12 micro-units),
  * independent of edge weights. `w·2^20` in the one-time normalization
  * stays exact to w < 2^43 ≈ 8×10^12 lineitems. KernelPropSpec proves
  * Long == BigInt on a graph with a single edge carrying ~2^30 mass.
  * Bonus: folding wout into wfrac drops the per-iteration outw join. */
object GraphOps {

  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  private val ITERS = 5

  /** Fixed-point fraction bits for the normalized edge weight. */
  private[graft] val FRAC_BITS = 20
  private[graft] val FRAC_ONE: Long = 1L << FRAC_BITS

  /** The iteration kernel, factored for adversarial-weight specs:
    * `edges` is a pre-aggregated (src, dst, w) frame; returns (id, r)
    * after `iters` damped rounds in exact integer micro-units. */
  private[graft] def pagerankRanks(edges: DataFrame,
                                   iters: Int = ITERS): DataFrame = {
    val outw = edges.groupBy("src").agg(sum("w").as("wout"))
    // one-time fixed-point normalization; the iteration never sees w
    val edgesN = edges.join(outw, "src")
      .select(col("src"), col("dst"),
        idiv(col("w") * FRAC_ONE, col("wout")).as("wfrac"))
      .cache()
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().cache()
    var ranks = nodes.withColumn("r", lit(1000000000L))
    for (_ <- 0 until iters) {
      val contribs = edgesN
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          idiv(idiv(col("r") * 85, lit(100L)) * col("wfrac"),
            lit(FRAC_ONE)).as("c"))
        .groupBy("id").agg(sum("c").as("inc"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(150000000L) + coalesce(col("inc"), lit(0L))).as("r"))
        .localCheckpoint(false)
    }
    ranks
  }

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
    val ranks = pagerankRanks(edges)
    ranks
      .join(broadcast(Tables.nation(s, d).select(
        col("n_nationkey"), col("n_name"))),
        ranks("id") === col("n_nationkey"))
      .select(col("n_name"), col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("n_name"))
  }

  /** The oracle's per-iteration CTE (id, r) from the previous one —
    * mirroring the fixed-point kernel term for term. */
  private def iterSql(k: Int): String =
    s"""r$k AS (
       |  SELECT n.id,
       |         CAST(150000000 + coalesce(sum(
       |           ((p.r * 85) // 100 * e.wfrac) // $FRAC_ONE), 0)
       |           AS BIGINT) AS r
       |  FROM nodes n
       |  LEFT JOIN ew e ON e.dst = n.id
       |  LEFT JOIN r${k - 1} p ON p.id = e.src
       |  GROUP BY n.id)""".stripMargin

  /** Degree-ordered triangle counting over the part co-occurrence
    * graph (parts bought together in one order — the market-basket
    * graph; triangles/clustering are the community-structure signal).
    *
    * The scale-critical trick is the ORIENTATION: every undirected
    * edge is directed from its (degree, id)-smaller endpoint to the
    * larger, which bounds every node's OUT-degree by O(√m) no matter
    * how hot the node (a celebrity part keeps its millions of edges —
    * but as in-edges; it emits almost none). The wedge self-join
    * therefore touches Σ outdeg² ≤ O(m^1.5) candidates worst-case
    * instead of Σ deg² (quadratic in the hot key), which is what makes
    * the classic edge-iterator algorithm survive skew at 100 TB. Each
    * triangle appears under exactly one orientation, so no /3 fixup
    * and no double counting. All joins are equi-joins (orderkey, b,
    * (a,c)); the degree frame is node-cardinality and broadcasts. */
  /** Distinct co-purchase part pairs (x < y) per (session, dir) — the
    * heavy lineitem self-join + distinct that q135 (triangles) and
    * q190 (BFS) both derive. Built once and PERSISTED per (session,
    * dir) via the shared [[FrameCache]] (the q35/q36/q37 discipline):
    * the write-once/join-forever shape — triangle counting and BFS pay
    * the derivation exactly once, and at 100 TB the same frame is what
    * a bucketed edge table would hold. */
  private val pairsCache = FrameCache.unpersisting
  private[graft] def copurchasePairs(s: SparkSession,
                                     d: String): DataFrame =
    pairsCache.getOrBuild(s, d) {
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      l.as("a")
        .join(l.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("x"), col("b.pk").as("y"))
        .distinct()
        .cache()
    }

  // per-(session, dir) caches for the derived frames too: a repeated
  // call must reuse the one persisted copy, not stack a fresh cached
  // copy per invocation (the FrameCache's whole point)
  private val degCache = FrameCache.unpersisting
  private val symEdgesCache = FrameCache.unpersisting

  /** Number of buckets for the persisted oriented-edge tables — must
    * match `spark.sql.shuffle.partitions` (32) so the wedge-closing
    * shuffle_hash probe exchange lands directly on the buckets. */
  private val EDGE_BUCKETS = 32

  // (session, dir) pairs whose oriented-edge tables are already
  // written — the bucketed write happens exactly once per pair
  private val edgesBucketed =
    scala.collection.mutable.Set.empty[(SparkSession, String)]

  /** Persist the oriented co-purchase edge list as BUCKETED+SORTED
    * parquet tables (the q132 write-once/join-forever contract) and
    * return their names (keyed-by-v, keyed-by-u, keyed-by-(u,v)). The
    * oriented edge list is derived once, written three ways — each
    * copy bucketed on the key one leg of the wedge join probes — so
    * the triangle serve leg reads co-located sorted buckets and plans
    * the wedge self-join with ZERO exchange and ZERO sort on the edge
    * side. At 100 TB this moves the O(m) edge shuffle from every
    * session to one write; the O(m^1.5) wedge stream still shuffles
    * once (inherent — it doesn't exist until the join runs). */
  private def orientedEdgeTables(s: SparkSession,
                                 d: String): (String, String, String) = {
    val tag = java.lang.Integer.toHexString(d.hashCode)
    val (tV, tU, tUV) = (s"graft_q135_e_v_$tag", s"graft_q135_e_u_$tag",
      s"graft_q135_e_uv_$tag")
    edgesBucketed.synchronized {
      if (!edgesBucketed((s, d))) {
        val pairs = copurchasePairs(s, d)
        val deg = degreeFrame(s, d)
        // x < y throughout, so a degree tie orients x→y
        val e = pairs
          .join(broadcast(deg.select(col("node").as("x"),
            col("d").as("dx"))), "x")
          .join(broadcast(deg.select(col("node").as("y"),
            col("d").as("dy"))), "y")
          .select(
            when(col("dx") <= col("dy"), col("x")).otherwise(col("y"))
              .as("u"),
            when(col("dx") <= col("dy"), col("y")).otherwise(col("x"))
              .as("v"))
        val eC = e.cache() // three writes, one derivation
        val root = graft.sources.Scratch.dir(s, s"q135-edges-$tag")
        graft.warehouse.Bucketed.write(eC, tV, "v", EDGE_BUCKETS,
          Some(s"$root/e_v"))
        graft.warehouse.Bucketed.write(eC, tU, "u", EDGE_BUCKETS,
          Some(s"$root/e_u"))
        graft.warehouse.Bucketed.writeKeys(eC, tUV, Seq("u", "v"),
          EDGE_BUCKETS, Some(s"$root/e_uv"))
        eC.unpersist(blocking = false)
        edgesBucketed += ((s, d))
        // Warm the wedge kernel ONCE per (session, dir), as part of
        // the one-time build: the first execution of the wedge join
        // pays Janino compilation + JIT of the generated SMJ/SHJ
        // loops + cold bucket-file reads WHILE streaming the full
        // Σ outdeg² candidate mass — measured 3-8× the steady-state
        // serve, with heavy run-to-run variance (2.6-17 s at sf0.1
        // for a 2.2 s steady serve). Repeats hit the codegen cache
        // and the JITted code, so the per-session cost a user
        // actually repeats is the steady state — the same discipline
        // as Bench's session warmup, applied at the one query whose
        // kernel is hot enough for JIT racing to dominate. The
        // recursive call is safe: edgesBucketed now holds the key,
        // so re-entry returns the table names without rebuilding.
        // NOTE (r17 optimization round): a BOUNDED-SLICE warm (the
        // same plan shape over u%16 slice tables, betting on the
        // codegen cache keying on plan structure) was built and
        // measured, paired runs: fixture deltas within host noise
        // (13.2/13.3 slice vs 11.9/13.7 full across four runs) while
        // the real first serve came out COLDER (2.40/3.02 s slice vs
        // 2.03/2.20 s full — the slice misses the JIT profile depth
        // and page-cache warmth of the real bucket files). REVERTED:
        // three extra bucketed writes buy no reliable fixture win and
        // cost serve warmth.
        triangleTop(s, d).write.format("noop").mode("overwrite").save()
      }
    }
    (tV, tU, tUV)
  }

  private def degreeFrame(s: SparkSession, d: String): DataFrame = {
    val pairs = copurchasePairs(s, d)
    degCache.getOrBuild(s, d) {
      pairs.select(col("x").as("node"))
        .unionAll(pairs.select(col("y").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
        .cache()
    }
  }

  private[graft] def triangleTop(s: SparkSession, d: String): DataFrame = {
    val (tV, tU, tUV) = orientedEdgeTables(s, d)
    val deg = degreeFrame(s, d)
    // Wedge join over the bucketed edge tables: the b-join reads the
    // v-bucketed copy against the u-bucketed copy — both sides arrive
    // hash-partitioned AND sorted on b, so the merge join plans with
    // no exchange and no sort (ReliabilitySpec asserts it). The
    // (a, c)-closing join probes the (u,v)-bucketed copy with a
    // shuffle_hash hint: the build side is already partitioned on its
    // keys (bucket count == shuffle partitions), so only the wedge
    // stream — which cannot be pre-partitioned, it is born here —
    // pays an exchange, and it is hashed, never sorted.
    val tri = s.table(tV).select(col("u").as("a"), col("v").as("b"))
      .join(s.table(tU).select(col("u").as("b"), col("v").as("c"))
        .hint("merge"), "b")
      .join(s.table(tUV).select(col("u").as("a"), col("v").as("c"))
        .hint("shuffle_hash"), Seq("a", "c"))
    // one pass over the triangle stream — a unionAll of three
    // projections would re-run the wedge join three times
    val nodeTri = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    nodeTri.join(broadcast(deg), "node")
      .select(col("node"), col("d").as("degree"), col("n_tri"))
      .orderBy(col("n_tri").desc, col("node"))
      .limit(20)
  }

  /** Breadth-first shortest hop-distance from a source node, exact.
    *
    * The iterative-fixpoint BFS (what `WITH RECURSIVE` computes on a
    * single-node engine, re-expressed as bounded Spark rounds): each
    * round is ONE equi-join frontier⋈edges (shuffled on the node key)
    * + distinct + an anti-join against the visited set — every frame
    * node-cardinality-bounded, never path-cardinality (the naive
    * path-enumeration recursion explodes combinatorially on cyclic
    * graphs; frontier-minus-visited is the classic fix and also what
    * makes each round's shuffle O(frontier ⋈ edges), not O(paths)).
    * Lineage is cut per round with an eager `localCheckpoint` (the
    * q54/q99 fixpoint discipline) — a cache alone leaves the logical
    * tree recursive, so each round's plan embeds every prior round's
    * and the EXPLAIN (and analyzer cost) grows exponentially with
    * depth. The one driver-side scalar is the source-node pick
    * (1 row, bounded metadata).
    *
    * Unreached nodes are absent from the result by construction —
    * identical on both engines. */
  private[graft] def bfsFrom(edges: DataFrame, maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    val source: Long = edges.agg(min(col("src"))).head().getLong(0)
    var visited = spark.range(1)
      .select(lit(source).as("node"), lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = visited
    for (k <- 1 to maxDepth) {
      val next = frontier.select(col("node"))
        .join(edges, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(k).as("dist"))
        .localCheckpoint(true) // materialized: lineage cut per round
      visited = visited.unionByName(next).localCheckpoint(true)
      frontier = next
    }
    visited
  }

  /** q190 body: hop distance from the smallest part in the co-purchase
    * graph (q135's pair derivation, symmetrized), capped at 4 hops —
    * "degrees of separation" over the market-basket graph. */
  private def copurchaseBfs(s: SparkSession, d: String): DataFrame = {
    val pairs = copurchasePairs(s, d)
    val edges = symEdgesCache.getOrBuild(s, d) {
      pairs.select(col("x").as("src"), col("y").as("dst"))
        .unionAll(pairs.select(col("y").as("src"), col("x").as("dst")))
        .cache()
    }
    bfsFrom(edges, maxDepth = 4)
      .groupBy("dist")
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("node")).cast("long").as("sum_node"))
      .orderBy("dist")
  }

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
             |ew AS (SELECT e.src, e.dst,
             |              CAST((e.w * $FRAC_ONE) // o.wout AS BIGINT)
             |                AS wfrac
             |       FROM edges e JOIN outw o ON o.src = e.src),
             |nodes AS (SELECT src AS id FROM edges
             |          UNION SELECT dst FROM edges),
             |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes),
             |${(1 to ITERS).map(iterSql).mkString(",\n")}
             |SELECT n_name, r AS rank_micro
             |FROM r$ITERS JOIN nation ON id = n_nationkey
             |ORDER BY rank_micro DESC, n_name""".stripMargin)),

    // ── Triangle counting, degree-ordered (see triangleTop) ──────────────
    // Output: top-20 parts by triangle participation in the
    // co-purchase graph (ties broken by part id — a total order, so
    // LIMIT is deterministic). The oracle mirrors the orientation
    // term for term; a wrong orientation double-counts or drops
    // triangles and breaks the hash.
    QueryDef("q135_triangle_count",
      (s, d) => triangleTop(s, d),
      Some("""WITH l AS (SELECT l_orderkey AS ok, l_partkey AS pk
             |           FROM lineitem),
             |pairs AS (
             |  SELECT DISTINCT a.pk AS x, b.pk AS y
             |  FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
             |deg AS (
             |  SELECT node, CAST(count(*) AS BIGINT) AS d
             |  FROM (SELECT x AS node FROM pairs
             |        UNION ALL SELECT y FROM pairs) t
             |  GROUP BY 1),
             |e AS (
             |  SELECT CASE WHEN dx.d <= dy.d THEN p.x ELSE p.y END AS u,
             |         CASE WHEN dx.d <= dy.d THEN p.y ELSE p.x END AS v
             |  FROM pairs p
             |  JOIN deg dx ON dx.node = p.x
             |  JOIN deg dy ON dy.node = p.y),
             |tri AS (
             |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
             |  FROM e e1
             |  JOIN e e2 ON e2.u = e1.v
             |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
             |nt AS (
             |  SELECT node, CAST(count(*) AS BIGINT) AS n_tri
             |  FROM (SELECT a AS node FROM tri
             |        UNION ALL SELECT b FROM tri
             |        UNION ALL SELECT c FROM tri) t
             |  GROUP BY 1)
             |SELECT nt.node, d.d AS degree, nt.n_tri
             |FROM nt JOIN deg d ON d.node = nt.node
             |ORDER BY n_tri DESC, nt.node
             |LIMIT 20""".stripMargin)),

    // ── BFS shortest hop-distance (see bfsFrom) ──────────────────────────
    // The recursive-query capability: what a single-node engine writes
    // as WITH RECURSIVE, re-expressed as bounded iterative rounds.
    // Output: per hop-distance from the smallest part, node count and
    // id checksum — a node reached at the wrong depth, revisited, or
    // dropped breaks the hash against DuckDB's genuinely recursive
    // evaluation of the same graph.
    QueryDef("q190_bfs_reach",
      (s, d) => copurchaseBfs(s, d),
      Some("""WITH RECURSIVE l AS (
             |  SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |pairs AS (
             |  SELECT DISTINCT a.pk AS x, b.pk AS y
             |  FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
             |edges AS (
             |  SELECT x AS src, y AS dst FROM pairs
             |  UNION ALL SELECT y, x FROM pairs),
             |reach AS (
             |  SELECT (SELECT min(src) FROM edges) AS node, 0 AS d
             |  UNION
             |  SELECT e.dst, r.d + 1
             |  FROM reach r JOIN edges e ON e.src = r.node
             |  WHERE r.d < 4),
             |dist AS (SELECT node, min(d) AS dist FROM reach GROUP BY 1)
             |SELECT dist, count(*) AS n_nodes,
             |       CAST(sum(node) AS BIGINT) AS sum_node
             |FROM dist
             |GROUP BY 1
             |ORDER BY dist""".stripMargin))
  )
}
