package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression tests: the physical plans the engine is
  * designed around, asserted so a refactor can't silently regress them.
  * These are the properties that decide whether a query survives a 100×
  * scale-up — dims broadcast (fact never shuffles for the star join),
  * scans prune columns and push filters, no single-partition windows in
  * benched paths.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  private def planOf(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def collectAll[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] = {
    val here = p.collect(f)
    val inSubqueries = p.subqueriesAll.flatMap(_.collect(f))
    val inAqe = p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .flatMap(inner => collectAll(inner)(f))
    here ++ inSubqueries ++ inAqe
  }

  test("q07 star agg: all dim joins broadcast, no sort-merge join") {
    val p = planOf("q07_star_agg")
    assert(collectAll(p) { case b: BroadcastExchangeExec => b }.nonEmpty,
      "dims must broadcast")
    assert(collectAll(p) { case s: SortMergeJoinExec => s }.isEmpty,
      "no SMJ at dim scale — the only allowed big-big join is lineitem⋈orders")
  }

  test("q123 SMJ fallback: the hinted dim join degrades to sort-merge, q07 stays broadcast") {
    // the same star with the customer dim pinned past the broadcast
    // path: the plan must carry a SortMergeJoin on the customer key —
    // the degradation SURVEY §4.3 promises when a dim outgrows
    // autoBroadcastJoinThreshold — while the normal variant (above)
    // shows none; the correctness gate holds both to the identical
    // oracle, so the two join strategies must agree bit-for-bit
    val p = planOf("q123_star_smj_fallback")
    val smj = collectAll(p) { case s: SortMergeJoinExec => s }
    assert(smj.nonEmpty, "the merge-hinted customer join must be SMJ")
    assert(smj.exists(_.leftKeys.exists(_.toString.contains("custkey"))) ||
      smj.exists(_.rightKeys.exists(_.toString.contains("custkey"))),
      s"SMJ must be on the customer key: ${smj.map(_.simpleStringWithNodeId())}")
  }

  test("q129 DPP: the fact scan's partition filter is a runtime dim subquery") {
    // dynamic partition pruning, not static: no literal year appears in
    // the query, so the only way the fact scan can carry a partition
    // filter is Spark injecting the dim scan's result at runtime
    val scans = collectAll(planOf("q129_dynamic_partition_pruning")) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val fact = scans.filter(_.output.exists(_.name == "o_orderpriority"))
    assert(fact.nonEmpty, "the orders fact scan must be present")
    assert(fact.exists(_.partitionFilters.exists(
        _.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions
          .DynamicPruningExpression]).isDefined)),
      s"fact scan must carry a dynamicpruning partition filter: " +
        fact.map(_.partitionFilters.mkString(";")).mkString(" | "))
  }

  test("q01 scalar agg: scan prunes to exactly the referenced columns") {
    val scans = collectAll(planOf("q01_scalar_agg")) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val read = scans.head.requiredSchema.fieldNames.toSet
    assert(!read.contains("l_orderkey") && read.size <= 5,
      s"q01 must not read unused lineitem columns, read: $read")
  }

  test("q38 query-vector filter is pushed down to the parquet scan") {
    // (q21's LIKE/IN predicates wrap columns in upper(trim(...)) — the
    // T1-trap semantics — so those are legitimately not pushable; the
    // raw-column predicate here must reach the scan, through fanOut's
    // repartition.)
    val scans = collectAll(planOf("q38_cosine_topk")) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(_.contains("vec_id"))),
      "vec_id predicate must reach the parquet scan")
  }

  test("q10 surrogate key: no single-partition window in the plan") {
    val windows = collectAll(planOf("q10_surrogate_key")) {
      case w: WindowExec => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "unpartitioned WindowExec would serialize the dim through one task")
  }

  test("salted join: identical rows to the plain join, shuffle key includes the salt") {
    import spark.implicits._
    import graft.functions.Salt
    // 90% of the left side is one hot key
    val left = spark.range(20000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100).as("k"),
        col("id").as("v"))
    val right = spark.range(100).select(col("id").as("k"), (col("id") * 7).as("w"))
    val plain = left.join(right, Seq("k"))
    val salted = Salt.saltedJoin(left, right, Seq("k"), salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.select("k", "v", "w").except(plain.select("k", "v", "w")).isEmpty)
    // salting targets the non-broadcastable case — force a shuffle join
    // and assert the exchange hashes on (k, __salt), not k alone
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = Salt.saltedJoin(left, right, Seq("k"), salts = 8)
      shuffled.write.format("noop").mode("overwrite").save()
      val exchanges = collectAll(shuffled.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.exists(_.outputPartitioning.toString.contains("__salt")),
        "salt must be part of the shuffle partitioning")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q85 salted skew join: the shuffle hashes on (k, __salt), not k alone") {
    // salting targets the non-broadcastable case — force the shuffle
    // join the query would face at 100 TB and assert the hot key is
    // spread across salt sub-keys
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("q85_salted_skew_join")(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      val exchanges = collectAll(df.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.exists(_.outputPartitioning.toString.contains("__salt")),
        "the join exchange must partition on the salted key")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("shingle pipeline: one exchange serves lead, dedup and count windows") {
    // hash(doc_id) from the lead window satisfies the dedup window's
    // ClusteredDistribution(doc_id, shingle) and the count window's
    // ClusteredDistribution(doc_id) — Spark must only re-sort between
    // them. A second exchange means the dropDuplicates-era triple
    // shuffle crept back.
    // Inspect the STATIC plan: under AQE the exchange hides inside
    // ShuffleQueryStageExec wrappers (leaf nodes `collect` can't enter),
    // and stage reuse across suites makes the adaptive shape
    // order-dependent. The planning property — one exchange serves all
    // three windows — is deterministic in the non-adaptive plan.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // filter the input so the logical plan differs from DedupOps'
      // session-persisted shingle frame — otherwise the CacheManager
      // substitutes InMemoryRelation for the whole subtree (suites share
      // one session via getOrCreate) and there is no exchange to count
      val sh = graft.operators.DedupOps.shingleFrameOf(
        graft.sources.Tables.documents(spark, sf)
          .filter(col("doc_id") % 2 === 0))
      val exchanges = collectAll(sh.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size === 1,
        s"shingle build must shuffle exactly once, saw ${exchanges.size}")
      val windows = collectAll(sh.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(windows.size === 3 && windows.forall(_.partitionSpec.nonEmpty))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q48 as-of join: merge shape — no join operator anywhere in the plan") {
    // The scalable as-of is union + one windowed pass; a join-based plan
    // (per-purchase subquery or theta-join) is the regression to catch.
    val joins = collectAll(planOf("q48_asof_join")) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty,
      s"as-of join must be the union+window merge, found: ${joins.map(_.nodeName)}")
  }

  test("q56 banded range join: interval predicate never becomes a nested loop") {
    val bad = collectAll(planOf("q56_range_join")) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty,
      "banding must turn the interval join into an equi-join on (user, bucket)")
  }

  test("q50 grouping sets: ONE Expand + single aggregate, no multi-scan union") {
    val p = planOf("q50_grouping_sets")
    val expands = collectAll(p) {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expands.size === 1,
      "the 4-set lattice must compute through one Expand, not UNION ALL scans")
    val scans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("orders")) => f
    }
    assert(scans.size === 1, "orders must be scanned exactly once")
  }

  test("q51 pivot: explicit value list keeps it to one scan, no discovery pre-pass") {
    val scans = collectAll(planOf("q51_pivot")) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size === 1,
      "an unlisted pivot would add a distinct values-discovery scan")
  }

  test("q36 candidate generation contains no cartesian/nested-loop join") {
    val p = planOf("q36_minhash_lsh")
    val bad = collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, "LSH candidates must come from equi-joins only")
  }

  test("q71 z-order: scan prunes to the two layout columns, single shuffle agg") {
    val p = planOf("q71_zorder_layout")
    val scans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    scans.foreach(s => assert(
      s.requiredSchema.fieldNames.toSet == Set("o_custkey", "o_orderdate"),
      s"z-key arithmetic must not widen the scan: ${s.requiredSchema}"))
  }

  test("q74 bloom probe joins broadcast the filter, never shuffle the batch") {
    val p = planOf("q74_bloom_prefilter")
    assert(collectAll(p) { case s: SortMergeJoinExec => s }.isEmpty,
      "a 64-row bloom frame must never trigger a sort-merge join")
  }

  test("q68 contamination: eval shingle set broadcasts to the train side") {
    val p = planOf("q68_contamination")
    assert(collectAll(p) { case b: BroadcastExchangeExec => b }.nonEmpty,
      "the distinct eval shingle set is the broadcast side")
  }

  test("q77 histogram percentile: bounded windows, no sort-merge join") {
    val p = planOf("q77_hist_percentiles")
    // the only windows run over the ≤4096-cell frame, partitioned by
    // group — never an unpartitioned whole-corpus window
    val windows = collectAll(p) { case w: WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
    // the 1-row bounds frame attaches via broadcast, not SMJ
    assert(collectAll(p) { case s: SortMergeJoinExec => s }.isEmpty)
  }

  test("q81 bm25: the query-term filter lands before the tf aggregation") {
    val p = planOf("q81_bm25")
    // the IN filter must sit under the first aggregate, so the tf
    // shuffle carries 3 terms, not the corpus dictionary
    val s = p.toString
    val inIdx = s.indexOf(" IN (join,vector,filter)")
    assert(inIdx >= 0, "term IN filter missing from the physical plan")
    assert(collectAll(p) { case s: SortMergeJoinExec => s }.isEmpty,
      "df/stats frames are broadcast-scale; no SMJ expected")
  }

  test("q82 heavy hitters: sketch cells broadcast to dictionary and verify probes") {
    val p = planOf("q82_heavy_hitters")
    assert(collectAll(p) { case b: BroadcastExchangeExec => b }.size >= 2,
      "the 256-cell sketch and the candidate set must broadcast")
    assert(collectAll(p) { case s: SortMergeJoinExec => s }.isEmpty)
  }

  test("q84 sketch-first: the raw stream pays a token shuffle only after the semi-join") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val p = planOf("q84_sketch_first_hitters")
    def sub[A](n: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] = {
      val here = n.collect(f)
      val aqe = n.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        .flatMap(inner => sub(inner)(f))
      here ++ aqe
    }
    // collect on the STREAMED path only: anything arriving through a
    // BroadcastExchange is bounded (256 sketch cells, the 1-row total,
    // the candidate set) and is allowed anywhere
    def streamSide[A](n: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] =
      n match {
        case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => Nil
        case a: AdaptiveSparkPlanExec => streamSide(a.executedPlan)(f)
        case _ =>
          (if (f.isDefinedAt(n)) Seq(f(n)) else Nil) ++
            n.children.flatMap(c => streamSide(c)(f))
      }
    val tokenAggs = collectAll(p) {
      case a: HashAggregateExec
        if a.groupingExpressions.exists(_.name == "token") => a
    }
    assert(tokenAggs.nonEmpty)
    // every token-keyed aggregate whose STREAMED input reads the raw
    // corpus must sit above a LeftSemi broadcast restriction (the
    // candidate filter); token aggregates fed from the stored
    // dictionary need none — i.e. no full-corpus tf is ever built
    tokenAggs.foreach { a =>
      val corpusOnStream = streamSide(a) { case f: FileSourceScanExec => f }
        .exists(_.metadata.get("Location").exists(_.contains("documents")))
      if (corpusOnStream)
        assert(streamSide(a) {
          case j: BroadcastHashJoinExec
            if j.joinType.toString == "LeftSemi" => j
        }.nonEmpty,
          "a token aggregate over the raw stream must be semi-join-restricted")
    }
    // the funnel's semi-join exists, and nothing sort-merges
    assert(collectAll(p) {
      case j: BroadcastHashJoinExec if j.joinType.toString == "LeftSemi" => j
    }.nonEmpty)
    assert(collectAll(p) { case s: SortMergeJoinExec => s }.isEmpty)
  }

  test("q86 span dedup: keyed windows only, no join operator in the plan") {
    val p = planOf("q86_span_dedup")
    // duplicated-gram detection is min/max over a gram-keyed window (one
    // shuffle, O(1) state) — NOT count(distinct)+semi-join-back; span
    // merge rides doc_id-keyed windows. No join may appear at all.
    assert(collectAll(p) {
      case j if j.nodeName.toLowerCase.contains("join") => j
    }.isEmpty, "q86 must be join-free (window detection, window merge)")
    assert(collectAll(p) { case w: WindowExec => w }
      .forall(_.partitionSpec.nonEmpty),
      "no single-partition window may appear at corpus scale")
    // the marked-occurrence stream reaches the merge via the doc_id
    // shuffle; the final groupBy(doc_id, gid) must REUSE that
    // partitioning (hash(doc_id) clusters (doc_id, gid)) — so the query
    // is exactly: ingest fan-out, gram shuffle, doc_id shuffle, output
    // sort, and nothing more (a detect-via-semi-join formulation would
    // add a second gram-keyed exchange)
    val shuffles = collectAll(p) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.length <= 4,
      s"expected fanout + gram + doc_id + final-sort, got ${shuffles.length}")
  }

  test("AQE splits a skewed sort-merge join at runtime (the q85 alternative)") {
    // q85 is the deterministic-plan answer to skew (explicit salt);
    // this proves the RUNTIME answer engages too: with AQE skew-join
    // on, a hot key's oversized shuffle partition is split after the
    // map stage — no code change, no salt column. Together they are
    // the two production paths for a skewed large⋈large join.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "2KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // one key carries ~95% of left rows; pad depends on id so it can't
    // constant-fold out of the shuffle (compressed partition sizes are
    // what the skew detector sees)
    val left = s2.range(60000)
      .selectExpr("CASE WHEN id % 20 = 0 THEN id % 50 ELSE 999999 END AS k",
        "concat(cast(id AS string), repeat('x', 64)) AS pad")
    val right = s2.range(1000000, 1000060)
      .selectExpr("id % 60 AS k", "repeat('y', 8) AS rpad")
      .union(s2.range(0, 1).selectExpr("999999 AS k", "'hot' AS rpad"))
    val joined = left.join(right, "k")
    // drive THIS queryExecution (a write or count() would clone the
    // plan and the inspected AQE tree would stay un-executed/initial)
    assert(joined.collect().length > 0)
    // query stages are leaf nodes — descend into their inner plans
    def deepCollect[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] = {
      val here = if (f.isDefinedAt(p)) Seq(f(p)) else Nil
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(deepCollect(_)(f))
    }
    val finalPlan = joined.queryExecution.executedPlan
    val smjs = deepCollect(finalPlan) { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected an SMJ:\n${finalPlan.treeString.take(1500)}")
    assert(smjs.exists(_.isSkewJoin),
      s"AQE must mark the hot partition skew-split:\n${finalPlan.treeString.take(2000)}")
  }

  test("q87 semdedup: centroids broadcast; pair join shuffles on cluster, not all-pairs") {
    val p = planOf("q87_semdedup")
    // the only nested-loop allowed is the broadcast of the 8 seed
    // centroids; the within-cell pair generation must be an equi-join
    // on the cluster id
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "pair generation must never be a cartesian product")
    assert(collectAll(p) { case b: BroadcastExchangeExec => b }.nonEmpty,
      "seed centroids must broadcast")
    val equiJoins = collectAll(p) {
      case j: SortMergeJoinExec => j.leftKeys.length
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.leftKeys.length
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.leftKeys.length
    }
    assert(equiJoins.exists(_ >= 1),
      "within-cell pairing must key on the cluster id")
  }

  test("q105 trailing RANGE frame: windows stay partitioned by user") {
    val windows = collectAll(planOf("q105_trailing_window")) {
      case w: WindowExec => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "an unpartitioned frame window would serialize the event stream")
  }

  test("q108 winsorize: sketch thresholds broadcast, no sort-merge join") {
    val p = planOf("q108_winsorized")
    assert(collectAll(p) { case b: BroadcastExchangeExec => b }.nonEmpty,
      "the group-cardinality threshold frame must broadcast")
    assert(collectAll(p) { case s: SortMergeJoinExec => s }.isEmpty,
      "clipping must not pay a shuffled join")
  }

  test("q111 pagerank: dims broadcast into the edge derivation, no cartesian") {
    val p = planOf("q111_pagerank")
    assert(collectAll(p) { case b: BroadcastExchangeExec => b }.nonEmpty,
      "customer/supplier/nation dims must broadcast")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "no iteration may degenerate to a cartesian product")
  }

  test("q107 phrase probe prunes the stored postings to its term's bucket") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val p = planOf("q107_phrase_search")
    val postingScans = collectAll(p) {
      case s: FileSourceScanExec
        if s.relation.partitionSchema.fieldNames.contains("term_bucket") => s
    }
    assert(postingScans.nonEmpty, "the stored postings index must be scanned")
    postingScans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        "each postings scan must carry a term_bucket partition predicate")
      // the pruned scan reads exactly one bucket directory of the 1024
      // — never the whole layout; the term equality itself must ALSO
      // survive as a pushed data filter within the bucket
      assert(s.relation.location.listFiles(s.partitionFilters, Nil)
        .length === 1,
        "partition pruning must reduce the scan to the probed term's bucket")
      assert(s.dataFilters.map(_.sql).mkString(" ").contains("term"),
        "the raw-term equality must be pushed into the bucket's scan")
    }
  }

  test("q213 decontamination: benchmark grams broadcast, no corpus self-join") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
      SortMergeJoinExec}
    val p = planOf("q213_decontamination")
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "the benchmark gram set must broadcast into the corpus stream")
    assert(collectAll(p) { case m: SortMergeJoinExec => m }.isEmpty,
      "the corpus gram stream must never pay a shuffled join")
  }

  test("q225 prefix-filter join: equi-joins only — no cartesian, no nested loop") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    val p = planOf("q225_prefix_filter_join")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty,
      "candidate generation must be the prefix equi-join, never all-pairs")
    assert(collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "every join (df attach, prefix self-join, set verification) is an equi-join")
  }

  test("q226/q229/q231: each SMJ is a named corpus-sided leg — nothing else sort-merges") {
    import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftOuter}
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    def keyNames(s: SortMergeJoinExec): Set[String] =
      (s.leftKeys ++ s.rightKeys).collect {
        case a: org.apache.spark.sql.catalyst.expressions.NamedExpression =>
          a.name
      }.toSet
    // q226: the lex and vec rank frames FULL OUTER join on doc id —
    // both sides corpus-cardinality at scale, and a full-outer join
    // cannot broadcast either side, so SMJ is the correct strategy
    val smj226 = collectAll(planOf("q226_hybrid_retrieval_rrf")) {
      case s: SortMergeJoinExec => s
    }
    assert(smj226.nonEmpty && smj226.forall(s =>
        s.joinType == FullOuter && keyNames(s).contains("id")),
      s"q226's only allowed SMJ is the full-outer rank fusion on id: " +
        smj226.map(s => s"${s.joinType} ${keyNames(s)}").mkString(" | "))
    // q229: the graded-relevance labels LEFT OUTER join the retrieved
    // lists on (query, candidate) — both sides scale with the eval
    // workload × corpus, genuinely large⋈large
    val smj229 = collectAll(planOf("q229_retrieval_eval")) {
      case s: SortMergeJoinExec => s
    }
    assert(smj229.nonEmpty && smj229.forall(s =>
        (s.joinType == LeftOuter || s.joinType == Inner) &&
          keyNames(s).contains("q_id")),
      s"q229's only allowed SMJs key on the (q_id, candidate) pair: " +
        smj229.map(s => s"${s.joinType} ${keyNames(s)}").mkString(" | "))
    // q231: the exact verification leg INNER joins bucket member
    // lists on (t, key) — corpus-sided on both sides (the 16-member
    // bucket cap bounds row width, not cardinality)
    val smj231 = collectAll(planOf("q231_label_noise_audit")) {
      case s: SortMergeJoinExec => s
    }
    assert(smj231.nonEmpty && smj231.forall(s =>
        s.joinType == Inner && keyNames(s).contains("t") &&
          keyNames(s).contains("key")),
      s"q231's only allowed SMJ is the exact leg on (t, key): " +
        smj231.map(s => s"${s.joinType} ${keyNames(s)}").mkString(" | "))
    // and none of the three ever degrades to a cartesian
    for (n <- Seq("q226_hybrid_retrieval_rrf", "q229_retrieval_eval",
        "q231_label_noise_audit"))
      assert(collectAll(planOf(n)) {
        case c: CartesianProductExec => c
      }.isEmpty, s"$n must not contain a cartesian product")
  }

  test("q226 hybrid RRF: both legs are distributed top-k, no global corpus window") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val p = planOf("q226_hybrid_retrieval_rrf")
    val topk = collectAll(p) { case t: TakeOrderedAndProjectExec => t }
    assert(topk.size >= 2,
      s"BM25 and cosine legs must each plan as TakeOrderedAndProject " +
        s"(distributed heap merge), found ${topk.size}")
    val windows = collectAll(p) { case w: WindowExec => w }
    // rank windows run over the 20-row top-k frames and the 10-row
    // fusion — never partitioned over the corpus
    assert(windows.nonEmpty, "rank assignment windows expected")
  }

  test("q227 sliding HLL: calendar-sized register algebra, no shuffled join") {
    val p = planOf("q227_sliding_hll_maintenance")
    assert(collectAll(p) { case s: SortMergeJoinExec => s }.isEmpty,
      "the anchor semi-join is broadcast; register merges are aggregates")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty)
  }

  test("q228 k-means|| weights: candidate frame broadcasts, corpus never shuffles on data keys") {
    val p = planOf("q228_kmeans_parallel_init")
    assert(collectAll(p) { case b: BroadcastExchangeExec => b }.nonEmpty,
      "the ~R*l-row candidate frame must broadcast into the weight join")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "no shuffled cartesian anywhere in the init")
  }
}
