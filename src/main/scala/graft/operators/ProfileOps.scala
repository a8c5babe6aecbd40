package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{QueryDef, Tables}
import graft.warehouse.VersionedParquet

/** Single-pass column profiler — the Deequ/Great-Expectations "profile
  * every column before you trust the table" primitive, stated as a
  * query. One aggregate over one scan computes, per column: row count,
  * null count, exact distinct count, and min/max/avg of the column's
  * measure (LENGTH for strings, VALUE for numerics); the wide 1-row
  * aggregate then unpivots to long form with `stack` (driver-free, no
  * second scan).
  *
  * Scale notes:
  *  - Multiple exact count(DISTINCT) in one aggregate plan as a single
  *    Expand (one replica per distinct column) feeding ONE shuffle —
  *    the standard Spark multi-distinct shape. The Expand multiplies
  *    shuffle rows by the number of profiled columns; at 100 TB swap
  *    exact distincts for approx_count_distinct / the q70 HLL sketch
  *    (mergeable across days) and the Expand disappears — the gate
  *    keeps the exact form because the oracle must match bit-for-bit.
  *  - Everything else (null flags, lengths) is narrow per-row work
  *    inside whole-stage codegen; no driver collect, no per-column
  *    scans (the naive profiler runs C scans for C columns).
  */
object ProfileOps {

  /** measure(c): what min/max/avg profile — length for strings, the
    * value itself for numerics. Cast to long so every profiled column
    * lands in one output type. */
  private def measure(c: String, isString: Boolean): Column =
    if (isString) length(col(c)).cast("long") else col(c).cast("long")

  private val COLS: Seq[(String, Boolean)] =
    Seq("lang" -> true, "n_chars" -> false, "source" -> true, "text" -> true)

  private[graft] def profile(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: COLS.flatMap {
      case (c, isStr) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"${c}_nul"),
        countDistinct(col(c)).as(s"${c}_dis"),
        min(measure(c, isStr)).as(s"${c}_min"),
        max(measure(c, isStr)).as(s"${c}_max"),
        round(avg(measure(c, isStr)), 4).as(s"${c}_avg"))
    }
    val wide = d.agg(aggs.head, aggs.tail: _*)
    val stackArgs = COLS.map { case (c, _) =>
      s"'$c', n_rows, ${c}_nul, ${c}_dis, ${c}_min, ${c}_max, ${c}_avg"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${COLS.size}, $stackArgs)" +
        " AS (col_name, n_rows, n_null, n_distinct, min_v, max_v, avg_v)")
      .orderBy("col_name")
  }

  val queries: Seq[QueryDef] = Seq(
    // ── One-pass table profile over `documents` ───────────────────────────
    // The oracle states the same profile as one UNION-ALL branch per
    // column (DuckDB re-scans per branch; the Spark side is the
    // one-scan formulation under test).
    QueryDef("q88_column_profile",
      (s, d) => profile(s, d),
      Some {
        def branch(c: String, m: String) =
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_null,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(min($m) AS BIGINT) AS min_v,
             |  CAST(max($m) AS BIGINT) AS max_v,
             |  round(avg($m), 4) AS avg_v
             |FROM documents""".stripMargin
        Seq(branch("lang", "len(lang)"), branch("n_chars", "n_chars"),
          branch("source", "len(source)"), branch("text", "len(text)"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),

    // ── Data-quality expectations report ─────────────────────────────────
    // The reference's quality-script shape (proc_load_silver's dup-key /
    // orphan / trim checks) over the extension corpus, as ONE scan: row
    // CHECKs (negative lengths, null keys, stored-vs-recomputed length
    // agreement) aggregate alongside the table-level uniqueness check
    // (count − count distinct), then unpivot via map+explode into the
    // (check, n_bad) dashboard rows. The write-path twin is publish's
    // CHECK constraints (publish-or-nothing); this is the read-path
    // audit that reports instead of rejecting — both directions a real
    // warehouse needs. Scale: one pass, no shuffle before the scalar
    // aggregate; countDistinct on the key is the only wide state.
    QueryDef("q131_quality_expectations",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.agg(
            sum(when(col("n_chars") < 0, 1).otherwise(0))
              .cast("long").as("neg_chars"),
            sum(when(col("lang").isNull, 1).otherwise(0))
              .cast("long").as("null_lang"),
            sum(when(length(col("text")) =!= col("n_chars"), 1)
              .otherwise(0)).cast("long").as("len_mismatch"),
            (count(lit(1)) - countDistinct(col("doc_id")))
              .cast("long").as("dup_ids"))
          .select(explode(map(
            lit("dup_ids"), col("dup_ids"),
            lit("len_mismatch"), col("len_mismatch"),
            lit("neg_chars"), col("neg_chars"),
            lit("null_lang"), col("null_lang")))
            .as(Seq("check_name", "n_bad")))
          .orderBy("check_name")
      },
      Some("""WITH a AS (SELECT
             |    CAST(sum(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS neg_chars,
             |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS null_lang,
             |    CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0
             |      END) AS BIGINT) AS len_mismatch,
             |    CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
             |      AS dup_ids
             |  FROM documents)
             |SELECT 'dup_ids' AS check_name, dup_ids AS n_bad FROM a
             |UNION ALL
             |SELECT 'len_mismatch', len_mismatch FROM a
             |UNION ALL
             |SELECT 'neg_chars', neg_chars FROM a
             |UNION ALL
             |SELECT 'null_lang', null_lang FROM a
             |ORDER BY check_name""".stripMargin)),

    // ── Cross-version profile drift (data-quality monitoring) ────────────
    // The nightly readout every ingest pipeline wants: did the LAST
    // batch shift the table's shape? A versioned table moves v0 → live
    // (an appended tranche that nulls one column for part of its rows
    // and skews another), and the gate profiles BOTH pins — per
    // column: row count, null ppm, sum — emitting the per-column
    // drift. Everything integer; the oracle replays both snapshots
    // from raw orders. Scale: one single-pass aggregate per PINNED
    // version (two scans total, each the q88 one-pass shape — never
    // per-column scans), and the drift join runs on the
    // column-cardinality frame. The same composition against stored
    // ANALYZE stats (q188/q194) answers metadata-only when exactness
    // can relax.
    QueryDef("q224_profile_drift",
      (s, d) => {
        val root = driftRoot(s, d)
        def prof(df: DataFrame, tag: String) = {
          val one = df.agg(
            count(lit(1)).as("n"),
            sum(col("c").isNull.cast("long")).as("null_c"),
            coalesce(sum(col("c")), lit(0L)).cast("long").as("sum_c"),
            sum(col("cents").isNull.cast("long")).as("null_cents"),
            sum(col("cents")).cast("long").as("sum_cents"))
          one.select(expr(
            """stack(2,
              |  'c', null_c, sum_c,
              |  'cents', null_cents, sum_cents)
              |  AS (colname, n_nulls, col_sum)""".stripMargin),
            col("n"))
            .select(col("colname"),
              col("n").as(s"n_$tag"),
              // exact integer floor div (the q226/q228 discipline):
              // Column '/' on longs is double division + trunc, which
              // can disagree with the oracle's '//' at quotient
              // boundaries once the numerator passes 2^53
              expr("n_nulls * 1000000 div n").as(s"null_ppm_$tag"),
              col("col_sum").as(s"sum_$tag"))
        }
        val v0 = prof(VersionedParquet.read(s, root, Some(0L)), "v0")
        val live = prof(VersionedParquet.read(s, root), "live")
        v0.join(live, "colname")
          .withColumn("null_ppm_shift",
            (col("null_ppm_live") - col("null_ppm_v0")).cast("long"))
          .select("colname", "n_v0", "n_live", "null_ppm_v0",
            "null_ppm_live", "null_ppm_shift", "sum_v0", "sum_live")
          .orderBy("colname")
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey AS k,
             |         CASE WHEN o_orderkey % 3 = 2
             |                   AND o_custkey % 5 = 0 THEN NULL
             |              ELSE o_custkey END AS c,
             |         CASE WHEN o_orderkey % 3 = 2
             |              THEN CAST(round(o_totalprice * 100)
             |                        AS BIGINT) * 2
             |              ELSE CAST(round(o_totalprice * 100)
             |                        AS BIGINT) END AS cents
             |  FROM orders),
             |v0 AS (SELECT * FROM o WHERE k % 3 <> 2),
             |pv0 AS (
             |  SELECT count(*) AS n,
             |         sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END)
             |           AS null_c,
             |         coalesce(sum(c), 0) AS sum_c,
             |         sum(CASE WHEN cents IS NULL THEN 1 ELSE 0 END)
             |           AS null_cents,
             |         sum(cents) AS sum_cents
             |  FROM v0),
             |plive AS (
             |  SELECT count(*) AS n,
             |         sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END)
             |           AS null_c,
             |         coalesce(sum(c), 0) AS sum_c,
             |         sum(CASE WHEN cents IS NULL THEN 1 ELSE 0 END)
             |           AS null_cents,
             |         sum(cents) AS sum_cents
             |  FROM o),
             |l0 AS (
             |  SELECT 'c' AS colname, n, null_c AS n_nulls,
             |         sum_c AS col_sum FROM pv0
             |  UNION ALL
             |  SELECT 'cents', n, null_cents, sum_cents FROM pv0),
             |ll AS (
             |  SELECT 'c' AS colname, n, null_c AS n_nulls,
             |         sum_c AS col_sum FROM plive
             |  UNION ALL
             |  SELECT 'cents', n, null_cents, sum_cents FROM plive)
             |SELECT l0.colname,
             |       CAST(l0.n AS BIGINT) AS n_v0,
             |       CAST(ll.n AS BIGINT) AS n_live,
             |       CAST(l0.n_nulls * 1000000 // l0.n AS BIGINT)
             |         AS null_ppm_v0,
             |       CAST(ll.n_nulls * 1000000 // ll.n AS BIGINT)
             |         AS null_ppm_live,
             |       CAST(ll.n_nulls * 1000000 // ll.n
             |            - l0.n_nulls * 1000000 // l0.n AS BIGINT)
             |         AS null_ppm_shift,
             |       CAST(l0.col_sum AS BIGINT) AS sum_v0,
             |       CAST(ll.col_sum AS BIGINT) AS sum_live
             |FROM l0 JOIN ll USING (colname)
             |ORDER BY colname""".stripMargin)),

    // ── Two-sample chi-square drift test (per-dimension) ─────────────────
    // q224 reads out WHAT shifted; this decides WHETHER the shift is
    // statistically real — the Evidently/TFX-style monitoring gate. For
    // each monitored dimension (event_type, hour-of-day) the reference
    // cohort (days 1–15) and current cohort (days 16–30) form a 2×k
    // contingency table; the homogeneity statistic
    //   χ² = Σ_cells (O·N − n_s·r_i)² / (n_s·r_i·N)
    // is computed in EXACT scaled integers: each term's micro-units are
    // one Decimal/HUGEINT cross-multiplied integral division (the q228
    // discipline — numerators reach 10³⁰, well inside Decimal(38)/
    // int128; the per-term quotient is ≤ N·10⁶, comfortably long), so
    // no float path crosses engines. The grid COMPLETES missing
    // (cell, cohort) pairs with zero counts — an absent cell is
    // evidence of drift, not a skippable row. The 95th-percentile
    // critical values for df 1..30 are precomputed literals both
    // engines index (the LC_TABLE rule); drift = χ²_ppm > crit_ppm.
    // Scale shape: ONE pass over events collapses to ≤ k·2 cells per
    // dimension (map-side combine); everything after runs on the
    // cell-cardinality frame — windows, grid completion, the χ² fold.
    QueryDef("q230_chi2_drift",
      (s, d) => chi2Report(eventCells(Tables.events(s, d))),
      Some(s"""WITH evsrc AS (SELECT ts, event_type FROM events),
             |$chi2CtesSql
             |SELECT $chi2SelectCols
             |FROM agg a JOIN ks k USING (dimension)
             |ORDER BY a.dimension""".stripMargin)),

    // ── Streaming χ² drift monitor (q230, maintained continuously) ───────
    // Production monitoring never re-scans history per nightly check —
    // events arrive as micro-batches and the contingency cells
    // maintain incrementally (streaming/DriftStream): each drained
    // batch appends its own cell counts as an increment tranche,
    // exactly-once by the batch-marker rule; increments are sums, so
    // they commute and Σ increments == the one-shot cells EXACTLY.
    // The gate runs the production lifecycle: three ingest rounds into
    // a versioned events table, each drained by its OWN stream run off
    // the shared checkpoint (the q223 restart-resume path, one cell
    // commit per round — n_cell_commits = 3 pins it), then the χ²
    // readout over the MAINTAINED cells through the same chi2Report
    // the one-shot gate uses. The oracle recomputes from the full
    // events table: statistic equality IS the incremental == rebuild
    // proof. Per-batch cost is O(batch rows) map-side-combined to
    // cell cardinality; the readout never touches an event row.
    QueryDef("q232_streaming_drift",
      (s, d) => {
        val cellsRoot = driftStreamPath(s, d)
        val nCommits =
          VersionedParquet.versions(s, cellsRoot).length.toLong
        chi2Report(
          graft.streaming.DriftStream.cells(s, cellsRoot),
          extra = Seq(lit(nCommits).as("n_cell_commits")))
      },
      Some(s"""WITH evsrc AS (SELECT ts, event_type FROM events),
             |$chi2CtesSql
             |SELECT $chi2SelectCols,
             |       CAST(3 AS BIGINT) AS n_cell_commits
             |FROM agg a JOIN ks k USING (dimension)
             |ORDER BY a.dimension""".stripMargin))
  )

  /** q232 lifecycle: the events table publishes in three tranches
    * (event_id % 3), each drained by its own DriftStream run off the
    * shared checkpoint into the cell-increment log. Once per session. */
  private def driftStreamPath(s: SparkSession, d: String): String = {
    val evRoot = graft.sources.Scratch.dir(s, "q232-events")
    val cells = graft.sources.Scratch.dir(s, "q232-cells")
    val ckpt = graft.sources.Scratch.dir(s, "q232-ckpt")
    if (VersionedParquet.currentVersion(s, evRoot).isEmpty) {
      val ev = Tables.events(s, d).select("event_id", "ts", "event_type")
      def drain(): Unit = {
        val q = graft.streaming.DriftStream.run(
          s.readStream.format("graft")
            .option("startingVersion", "0")
            .load(evRoot),
          cells, ckpt)
        q.awaitTermination()
      }
      VersionedParquet.publish(ev.filter(col("event_id") % 3 === 0),
        evRoot, keepVersions = 10)
      drain()
      VersionedParquet.append(s, evRoot,
        ev.filter(col("event_id") % 3 === 1), keepVersions = 10)
      drain()
      VersionedParquet.append(s, evRoot,
        ev.filter(col("event_id") % 3 === 2), keepVersions = 10)
      drain()
    }
    cells
  }

  /** The monitored-cell extraction shared by q230 (one-shot) and q232
    * (stream-maintained): raw contingency counts
    * (dimension, cell, cohort, o) over an events-shaped frame —
    * cohort = days 1–15 (ref) vs 16–30 (cur), dimensions = event_type
    * and hour-of-day. One pass, map-side combine to cell cardinality. */
  private[graft] def eventCells(events: DataFrame): DataFrame = {
    val ev = events.select(
      when(dayofmonth(col("ts")) <= 15, lit("ref"))
        .otherwise(lit("cur")).as("cohort"),
      col("event_type"),
      hour(col("ts")).cast("string").as("hr"))
    // ONE pass over the events: pre-aggregate to the joint
    // (cohort, type, hour) grid (≤ types × 24 × 2 cells — map-side
    // combine collapses each partition to that grid), then both
    // dimensions re-aggregate the tiny grid. The previous shape ran
    // one full scan+aggregate PER dimension (r16 optimization, guide
    // §1.2/§2.3); sums of counts are count-identical per cell.
    val pre = ev.groupBy("cohort", "event_type", "hr")
      .agg(count(lit(1)).as("o"))
    def dim(name: String, cell: Column): DataFrame =
      pre.groupBy(cell.as("cell"), col("cohort"))
        .agg(sum("o").cast("long").as("o"))
        .withColumn("dimension", lit(name))
    dim("event_type", col("event_type"))
      .unionByName(dim("hour_of_day", col("hr")))
  }

  /** χ² homogeneity report over a raw cell frame
    * (dimension, cell, cohort, o): grid-completes missing
    * (cell, cohort) pairs with zeros, computes the statistic in exact
    * scaled integers, flags against the df-indexed critical table.
    * `extra` columns ride through to the output (q232's commit-count
    * pin). */
  private[graft] def chi2Report(cells: DataFrame,
                                extra: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // collected once to a LOCAL relation: the cell frame
    // (≤ dimensions × cells × 2 rows — tiny by construction) is
    // consumed twice below (grid derivation + the grid join); without
    // sharing, each consumer re-ran the full upstream aggregation —
    // for q230 a complete events scan, for q232 a re-read of the
    // maintained log. r16 used persist() here but the returned plan
    // outlives this function, so it could never be unpersisted and
    // pinned executor storage for the session; a collect of the tiny
    // grid gives the same single evaluation with zero retained state
    // (r17, guide §1.2 + §5 "unpersist when done").
    val cellsP = cells.sparkSession.createDataFrame(
      java.util.Arrays.asList(cells.collect(): _*), cells.schema)
    val grid = cellsP.select("dimension", "cell").distinct()
      .withColumn("cohort", explode(array(lit("ref"), lit("cur"))))
    val full = grid.join(cellsP, Seq("dimension", "cell", "cohort"),
        "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val tot = full
      .withColumn("n_s",
        sum("o").over(Window.partitionBy("dimension", "cohort")))
      .withColumn("r_i",
        sum("o").over(Window.partitionBy("dimension", "cell")))
      .withColumn("big_n",
        sum("o").over(Window.partitionBy("dimension")))
    val terms = tot
      .withColumn("num", expr(
        """cast(o as decimal(38,0)) * big_n
          | - cast(n_s as decimal(38,0)) * r_i""".stripMargin))
      .withColumn("term_ppm", expr(
        """(num * num * 1000000)
          | div (cast(n_s as decimal(38,0)) * r_i * big_n)""".stripMargin))
    val agg = terms.groupBy("dimension")
      .agg(sum("term_ppm").cast("long").as("chi2_ppm"),
        countDistinct("cell").as("n_cells"))
    val critArr = array(CHI2_95_PPM.map(lit): _*)
    agg
      .withColumn("dfree", (col("n_cells") - 1).cast("long"))
      // dfree guard: a single-cell dimension gives dfree=0 and a raw
      // element_at(arr, 0) THROWS ("SQL array indices start at 1");
      // >30 cells would return NULL crit_ppm, making the drift flag
      // silently 0. Both are refused LOUDLY with the dimension named —
      // this helper is the reusable monitoring surface (DriftStream
      // batches feed it too), so degenerate inputs must not pass as
      // "no drift".
      .withColumn("crit_ppm",
        when(col("dfree").between(1, CHI2_95_PPM.length),
          element_at(critArr, col("dfree").cast("int")))
          .otherwise(raise_error(format_string(
            "chi2Report: dimension '%s' has dfree=%d outside the " +
              s"supported [1, ${CHI2_95_PPM.length}] critical-value " +
              "table (degenerate single-cell dimension or too many " +
              "cells); pre-bucket the dimension or extend CHI2_95_PPM",
            col("dimension"), col("dfree")))))
      .select(Seq(col("dimension"), col("n_cells"), col("dfree"),
        col("chi2_ppm"), col("crit_ppm"),
        when(col("chi2_ppm") > col("crit_ppm"), 1).otherwise(0)
          .cast("int").as("drift")) ++ extra: _*)
      .orderBy("dimension")
  }

  /** The DuckDB twin of eventCells + chi2Report as CTE text: expects a
    * prior CTE `evsrc` (events-shaped), emits through `ks`; the caller
    * writes the final SELECT with `${chi2SelectCols}` (+ extras). */
  private[graft] def chi2CtesSql: String =
    s"""ev AS (
       |  SELECT CASE WHEN EXTRACT(day FROM ts) <= 15
       |              THEN 'ref' ELSE 'cur' END AS cohort,
       |         event_type,
       |         CAST(EXTRACT(hour FROM ts) AS VARCHAR) AS hr
       |  FROM evsrc),
       |cells AS (
       |  SELECT 'event_type' AS dimension, event_type AS cell,
       |         cohort, count(*) AS o
       |  FROM ev GROUP BY 2, 3
       |  UNION ALL
       |  SELECT 'hour_of_day', hr, cohort, count(*)
       |  FROM ev GROUP BY 2, 3),
       |grid AS (
       |  SELECT dc.dimension, dc.cell, c.cohort
       |  FROM (SELECT DISTINCT dimension, cell FROM cells) dc
       |  CROSS JOIN (SELECT unnest(['ref', 'cur']) AS cohort) c),
       |fulld AS (
       |  SELECT g.dimension, g.cell, g.cohort,
       |         coalesce(cl.o, 0) AS o
       |  FROM grid g LEFT JOIN cells cl
       |    USING (dimension, cell, cohort)),
       |tot AS (
       |  SELECT dimension, cell, cohort, o,
       |         sum(o) OVER (PARTITION BY dimension, cohort) AS n_s,
       |         sum(o) OVER (PARTITION BY dimension, cell) AS r_i,
       |         sum(o) OVER (PARTITION BY dimension) AS big_n
       |  FROM fulld),
       |terms AS (
       |  SELECT dimension,
       |         CAST(o AS HUGEINT) * big_n
       |           - CAST(n_s AS HUGEINT) * r_i AS num,
       |         CAST(n_s AS HUGEINT) * r_i * big_n AS den
       |  FROM tot),
       |agg AS (
       |  SELECT dimension,
       |         CAST(sum((num * num * 1000000) // den) AS BIGINT)
       |           AS chi2_ppm
       |  FROM terms GROUP BY 1),
       |ks AS (SELECT dimension, count(DISTINCT cell) AS k
       |       FROM cells GROUP BY 1)""".stripMargin

  /** Final-SELECT column list matching chi2Report's output. */
  private[graft] def chi2SelectCols: String =
    s"""a.dimension,
       |       CAST(k.k AS BIGINT) AS n_cells,
       |       CAST(k.k - 1 AS BIGINT) AS dfree,
       |       a.chi2_ppm,
       |       CAST([${CHI2_95_PPM.mkString(", ")}]
       |              [CAST(k.k - 1 AS INT)] AS BIGINT) AS crit_ppm,
       |       CAST(a.chi2_ppm >
       |            CAST([${CHI2_95_PPM.mkString(", ")}]
       |                   [CAST(k.k - 1 AS INT)] AS BIGINT)
       |            AS INT) AS drift""".stripMargin

  /** χ²₀.₉₅ quantiles for df = 1..30 in micro-units — the standard
    * critical values (e.g. df=1 → 3.841459) embedded as integer
    * literals on both engines (the q70 LC_TABLE no-runtime-special-
    * functions rule; no chi-square CDF evaluated anywhere). */
  private lazy val CHI2_95_PPM: IndexedSeq[Long] = IndexedSeq(
    3841459L, 5991465L, 7814728L, 9487729L, 11070498L, 12591587L,
    14067140L, 15507313L, 16918978L, 18307038L, 19675138L, 21026070L,
    22362032L, 23684791L, 24995790L, 26296228L, 27587112L, 28869299L,
    30143527L, 31410433L, 32670573L, 33924438L, 35172462L, 36415029L,
    37652484L, 38885139L, 40113272L, 41337138L, 42556968L, 43772972L)

  /** q224's versioned table: v0 = the %3≠2 two-thirds of orders
    * (custkey, cents); live appends the %3=2 tranche with custkey
    * nulled on the %5 slice and cents doubled — the drift the profile
    * must surface. Once per session. */
  private def driftRoot(s: SparkSession, d: String): String = {
    import graft.sources.Scratch
    val root = Scratch.dir(s, "q224-drift")
    if (VersionedParquet.currentVersion(s, root).isEmpty) {
      val o = Tables.orders(s, d).select(
        col("o_orderkey").as("k"),
        col("o_custkey").as("c"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      VersionedParquet.publish(o.filter(col("k") % 3 =!= 2), root,
        keepVersions = 10)
      VersionedParquet.append(s, root,
        o.filter(col("k") % 3 === 2)
          .select(col("k"),
            when(col("c") % 5 === 0, lit(null).cast("long"))
              .otherwise(col("c")).as("c"),
            (col("cents") * 2L).as("cents")),
        keepVersions = 10)
    }
    root
  }
}
