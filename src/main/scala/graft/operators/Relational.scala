package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{QueryDef, Tables}
import graft.functions.Money._
import graft.functions.SurrogateKey
import graft.warehouse.Cols.monthsDiff

/** The reference's relational operator inventory (SURVEY.md §2) adapted to
  * the driver's TPC-H-ish tables, each with a DuckDB oracle. Query naming:
  * q<nn>_<operator-family>.
  *
  * Determinism rules (these make bit-exact hash-compare possible):
  *  - money aggregates run over exact integer cents (graft.functions.Money
  *    — per-row conversion is exact, int64 sums are order-independent,
  *    final doubles come from one identical division on both sides);
  *  - `round()` is applied only at the data's own decimal grid (where the
  *    boundary is half a grid step away from every attainable value) —
  *    never to quotients of small integers, which tie at half-cents;
  *  - rank/sort keys use exact measures plus a unique tiebreak;
  *  - explicit ORDER BY on a unique key in both engines;
  *  - integer widths are matched (Spark year() is INT, DuckDB's BIGINT;
  *    Spark count is LONG; DuckDB sum(BIGINT) is HUGEINT → oracle casts).
  *
  * Scale notes: dims (region/nation/part/supplier/customer) are broadcast;
  * lineitem⋈orders is the one genuine big-big join (shuffle/SMJ — correct
  * at 100 TB); windows are either partitioned by a high-cardinality key or
  * run over a pre-aggregated frame of dim cardinality.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  /** Net revenue ext*(1-disc) in currency×10^4 exact scaled integers. */
  private val revC4x = revC4(col("l_extendedprice"), col("l_discount"))
  /** Oracle-side rendering of the same expression. */
  private val REV_C4 =
    "CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))"

  val queries: Seq[QueryDef] = Seq(

    // ── A1: grand-total scalar aggregates ─────────────────────────────────
    QueryDef("q01_scalar_agg",
      (s, d) => li(s, d).agg(
        sum("l_quantity").as("sum_qty"),            // integral doubles: exact
        c2(sum(cents(col("l_extendedprice")))).as("sum_base_price"),
        (sum(pct(col("l_discount"))).cast("double") / 100.0 / count(lit(1)))
          .as("avg_disc"),
        count(lit(1)).as("n_rows")),
      Some(s"""SELECT sum(l_quantity) AS sum_qty,
             |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
             |         / 100.0 AS sum_base_price,
             |       CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT)
             |         / 100.0 / count(*) AS avg_disc,
             |       count(*) AS n_rows
             |FROM lineitem""".stripMargin)),

    // ── A3/A4 + P2: hash group-by with pre-agg filter (TPC-H Q1 shape) ───
    QueryDef("q02_groupby_agg",
      (s, d) => li(s, d)
        .filter(col("l_shipdate").isNotNull)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          c2(sum(cents(col("l_extendedprice")))).as("sum_base_price"),
          c4(sum(revC4x)).as("sum_disc_price"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
             |       sum(l_quantity) AS sum_qty,
             |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
             |         / 100.0 AS sum_base_price,
             |       CAST(sum($REV_C4) AS BIGINT) / 10000.0 AS sum_disc_price,
             |       sum(l_quantity) / count(*) AS avg_qty,
             |       count(*) AS n_items
             |FROM lineitem
             |WHERE l_shipdate IS NOT NULL
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ── A5: group-by expression (year/month roll-up) ──────────────────────
    QueryDef("q03_groupby_expr",
      (s, d) => ord(s, d)
        .groupBy(year(col("o_orderdate")).as("order_year"),
                 month(col("o_orderdate")).as("order_month"))
        .agg(count(lit(1)).as("n_orders"),
             c2(sum(cents(col("o_totalprice")))).as("total_price"))
        .orderBy("order_year", "order_month"),
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
             |       CAST(month(o_orderdate) AS INT) AS order_month,
             |       count(*) AS n_orders,
             |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |         / 100.0 AS total_price
             |FROM orders
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)),

    // ── A2: exact COUNT(DISTINCT) ─────────────────────────────────────────
    QueryDef("q04_count_distinct",
      (s, d) => li(s, d).agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps")),
      Some("""SELECT count(DISTINCT l_orderkey) AS n_orders,
             |       count(DISTINCT l_partkey) AS n_parts,
             |       count(DISTINCT l_suppkey) AS n_supps
             |FROM lineitem""".stripMargin)),

    // ── A6: HAVING (post-aggregation filter) ──────────────────────────────
    QueryDef("q05_having",
      (s, d) => li(s, d)
        .groupBy("l_orderkey").agg(count(lit(1)).as("n_items"))
        .filter(col("n_items") > 6)
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, count(*) AS n_items
             |FROM lineitem
             |GROUP BY l_orderkey
             |HAVING count(*) > 6
             |ORDER BY l_orderkey""".stripMargin)),

    // ── J1: left-join dimension enrichment chain ──────────────────────────
    QueryDef("q06_join_enrich",
      (s, d) => {
        val c = cust(s, d).alias("c")
        val n = Tables.nation(s, d).alias("n")
        val r = Tables.region(s, d).alias("r")
        c.join(broadcast(n), col("c.c_nationkey") === col("n.n_nationkey"), "left")
          .join(broadcast(r), col("n.n_regionkey") === col("r.r_regionkey"), "left")
          .select(col("c.c_custkey"), col("c.c_name"),
            col("n.n_name").as("nation"), col("r.r_name").as("region"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, n_name AS nation, r_name AS region
             |FROM customer
             |LEFT JOIN nation ON n_nationkey = c_nationkey
             |LEFT JOIN region ON r_regionkey = n_regionkey
             |ORDER BY c_custkey""".stripMargin)),

    // ── J3: star join + aggregate (fact ⋈ fact-dim ⋈ dims) ────────────────
    QueryDef("q07_star_agg",
      (s, d) => {
        val l = li(s, d)
        val o = ord(s, d).select("o_orderkey", "o_custkey")
        val c = cust(s, d).select("c_custkey", "c_nationkey")
        val n = Tables.nation(s, d).select("n_nationkey", "n_name")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(c4(sum(revC4x)).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy("nation")
      },
      Some(s"""SELECT n_name AS nation,
             |       CAST(sum($REV_C4) AS BIGINT) / 10000.0 AS revenue,
             |       count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN nation ON n_nationkey = c_nationkey
             |GROUP BY n_name
             |ORDER BY nation""".stripMargin)),

    // ── J4: anti-join + semi-join ─────────────────────────────────────────
    QueryDef("q08_anti_semi_join",
      (s, d) => {
        val neverOrdered = Tables.part(s, d)
          .join(li(s, d).select("l_partkey"),
            col("p_partkey") === col("l_partkey"), "left_anti")
          .agg(count(lit(1)).as("n_parts_never_ordered"))
        val withOrders = cust(s, d)
          .join(ord(s, d).select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n_custs_with_orders"))
        neverOrdered.crossJoin(withOrders)
      },
      Some("""SELECT (SELECT count(*) FROM part
             |        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem))
             |         AS n_parts_never_ordered,
             |       (SELECT count(*) FROM customer
             |        WHERE c_custkey IN (SELECT o_custkey FROM orders))
             |         AS n_custs_with_orders""".stripMargin)),

    // ── W1: ROW_NUMBER dedup — keep latest order per customer ─────────────
    QueryDef("q09_window_dedup",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        ord(s, d).withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("last_orderkey"),
            col("o_orderdate").as("last_orderdate"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, o_orderkey AS last_orderkey,
             |       o_orderdate AS last_orderdate
             |FROM (SELECT *, row_number() OVER (
             |        PARTITION BY o_custkey
             |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |      FROM orders) t
             |WHERE rn = 1
             |ORDER BY o_custkey""".stripMargin)),

    // ── W2: surrogate key over a dimension — scale strategy ───────────────
    // Semantics are ROW_NUMBER OVER (ORDER BY c_custkey) (the oracle), but
    // the plan is the parallel sort + zipWithIndex strategy (SurrogateKey.
    // zipIndexed): identical keys for a total order, no single-partition
    // WindowExec. The reference-tier ROW_NUMBER formulation stays in
    // Gold's default path; ReliabilitySpec asserts both agree.
    QueryDef("q10_surrogate_key",
      (s, d) => SurrogateKey.zipIndexed(
          cust(s, d).select("c_custkey", "c_name"),
          "customer_key", Seq(col("c_custkey")))
        .select(col("customer_key").cast("int").as("customer_key"),
          col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS INT)
             |         AS customer_key,
             |       c_custkey, c_name
             |FROM customer
             |ORDER BY c_custkey""".stripMargin)),

    // ── W3: LEAD validity window (SCD2-style end date) ────────────────────
    QueryDef("q11_scd_validity",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        ord(s, d)
          .withColumn("valid_to",
            lead(col("o_orderdate"), 1).over(w) - expr("INTERVAL 1 DAY"))
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_orderdate").as("valid_from"), col("valid_to"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
             |       lead(o_orderdate) OVER (
             |         PARTITION BY o_custkey
             |         ORDER BY o_orderdate, o_orderkey) - INTERVAL 1 DAY
             |         AS valid_to
             |FROM orders
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ── W4: LAG year-over-year with trend CASE (P7) ───────────────────────
    QueryDef("q12_lag_yoy",
      (s, d) => {
        val yearly = li(s, d)
          .groupBy(col("l_returnflag"), year(col("l_shipdate")).as("ship_year"))
          .agg(c4(sum(revC4x)).as("cur_rev"))
        val w = Window.partitionBy("l_returnflag").orderBy("ship_year")
        val py = lag(col("cur_rev"), 1).over(w)
        yearly.select(
          col("l_returnflag"), col("ship_year"), col("cur_rev"),
          py.as("py_rev"),
          (col("cur_rev") - py).as("diff_py"),
          when(col("cur_rev") - py > 0, "Increase")
            .when(col("cur_rev") - py < 0, "Decrease")
            .otherwise("No Change").as("trend"))
          .orderBy("l_returnflag", "ship_year")
      },
      Some(s"""WITH yearly AS (
             |  SELECT l_returnflag,
             |         CAST(year(l_shipdate) AS INT) AS ship_year,
             |         CAST(sum($REV_C4) AS BIGINT) / 10000.0 AS cur_rev
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT l_returnflag, ship_year, cur_rev,
             |       lag(cur_rev) OVER w AS py_rev,
             |       cur_rev - lag(cur_rev) OVER w AS diff_py,
             |       CASE WHEN cur_rev - lag(cur_rev) OVER w > 0 THEN 'Increase'
             |            WHEN cur_rev - lag(cur_rev) OVER w < 0 THEN 'Decrease'
             |            ELSE 'No Change' END AS trend
             |FROM yearly
             |WINDOW w AS (PARTITION BY l_returnflag ORDER BY ship_year)
             |ORDER BY l_returnflag, ship_year""".stripMargin)),

    // ── W5: ties-aware top-k via RANK over an aggregate ───────────────────
    QueryDef("q13_rank_topk",
      (s, d) => {
        val p = Tables.part(s, d).select("p_partkey", "p_brand")
        val agg = li(s, d)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(c4(sum(revC4x)).as("brand_revenue"))
        agg.withColumn("brand_rank",
            rank().over(Window.orderBy(col("brand_revenue").desc, col("p_brand"))))
          .filter(col("brand_rank") <= 5)
          .orderBy("brand_rank", "p_brand")
      },
      Some(s"""SELECT * FROM (
             |  SELECT p_brand,
             |         CAST(sum($REV_C4) AS BIGINT) / 10000.0 AS brand_revenue,
             |         CAST(rank() OVER (
             |           ORDER BY CAST(sum($REV_C4) AS BIGINT) DESC, p_brand)
             |           AS INT) AS brand_rank
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  GROUP BY p_brand) t
             |WHERE brand_rank <= 5
             |ORDER BY brand_rank, p_brand""".stripMargin)),

    // ── W6: running total / cumulative average over a pre-aggregate ───────
    QueryDef("q14_running_total",
      (s, d) => {
        val yearly = li(s, d)
          .groupBy(year(col("l_shipdate")).as("ship_year"))
          .agg(sum(revC4x).as("rev_c4"))          // exact scaled int
        val w = Window.orderBy("ship_year")
        yearly.select(col("ship_year"), c4(col("rev_c4")).as("year_rev"),
            c4(sum("rev_c4").over(w)).as("running_rev"),
            c4(intDivide(sum("rev_c4").over(w), row_number().over(w)))
              .as("running_avg_rev"))
          .orderBy("ship_year")
      },
      Some(s"""WITH yearly AS (
             |  SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
             |         CAST(sum($REV_C4) AS BIGINT) AS rev_c4
             |  FROM lineitem GROUP BY 1)
             |SELECT ship_year, rev_c4 / 10000.0 AS year_rev,
             |       CAST(sum(rev_c4) OVER w AS BIGINT) / 10000.0 AS running_rev,
             |       (CAST(sum(rev_c4) OVER w AS BIGINT)
             |                  // (row_number() OVER w)) / 10000.0
             |         AS running_avg_rev
             |FROM yearly
             |WINDOW w AS (ORDER BY ship_year)
             |ORDER BY ship_year""".stripMargin)),

    // ── W7: whole-partition aggregate window (diff from partition avg) ────
    QueryDef("q15_partition_window",
      (s, d) => {
        val p = Tables.part(s, d).select("p_partkey", "p_brand")
        val byBrandYear = li(s, d)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), year(col("l_shipdate")).as("ship_year"))
          .agg(sum(revC4x).as("rev_c4"))
        val w = Window.partitionBy("p_brand")
        val avgC4 = intDivide(sum("rev_c4").over(w), count(lit(1)).over(w))
        byBrandYear.select(
            col("p_brand"), col("ship_year"), c4(col("rev_c4")).as("cur_rev"),
            c4(avgC4).as("avg_rev"),
            c4(col("rev_c4") - avgC4).as("diff_avg"))
          .orderBy("p_brand", "ship_year")
      },
      Some(s"""WITH by_brand_year AS (
             |  SELECT p_brand, CAST(year(l_shipdate) AS INT) AS ship_year,
             |         CAST(sum($REV_C4) AS BIGINT) AS rev_c4
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  GROUP BY 1, 2)
             |SELECT p_brand, ship_year, rev_c4 / 10000.0 AS cur_rev,
             |       (CAST(sum(rev_c4) OVER w AS BIGINT)
             |                  // (count(*) OVER w)) / 10000.0 AS avg_rev,
             |       (rev_c4 - (CAST(sum(rev_c4) OVER w AS BIGINT)
             |                  // (count(*) OVER w))) / 10000.0 AS diff_avg
             |FROM by_brand_year
             |WINDOW w AS (PARTITION BY p_brand)
             |ORDER BY p_brand, ship_year""".stripMargin)),

    // ── W8: grand-total window → share of total (part-to-whole) ───────────
    QueryDef("q16_share_of_total",
      (s, d) => {
        val byFlag = li(s, d).groupBy("l_returnflag")
          .agg(sum(revC4x).as("rev_c4"))
        val w = Window.partitionBy()
        val total = sum("rev_c4").over(w)
        byFlag.select(col("l_returnflag"),
            c4(col("rev_c4")).as("flag_rev"),
            c4(total).as("overall_rev"),
            (col("rev_c4").cast("double") / total * 100).as("pct_of_total"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH by_flag AS (
             |  SELECT l_returnflag, CAST(sum($REV_C4) AS BIGINT) AS rev_c4
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag,
             |       rev_c4 / 10000.0 AS flag_rev,
             |       CAST(sum(rev_c4) OVER () AS BIGINT) / 10000.0 AS overall_rev,
             |       CAST(rev_c4 AS DOUBLE)
             |         / CAST(sum(rev_c4) OVER () AS BIGINT) * 100 AS pct_of_total
             |FROM by_flag
             |ORDER BY l_returnflag""".stripMargin)),

    // ── O2: top-k with deterministic tiebreak (TakeOrderedAndProject) ─────
    QueryDef("q17_topk_limit",
      (s, d) => ord(s, d)
        .groupBy("o_custkey")
        .agg(c2(sum(cents(col("o_totalprice")))).as("total_spend"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("total_spend").desc, col("o_custkey"))
        .limit(10),
      Some("""SELECT o_custkey,
             |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |         / 100.0 AS total_spend,
             |       count(*) AS n_orders
             |FROM orders
             |GROUP BY o_custkey
             |ORDER BY total_spend DESC, o_custkey
             |LIMIT 10""".stripMargin)),

    // ── U1: UNION ALL KPI sheet (heterogeneous scalars, unified type) ─────
    QueryDef("q18_union_kpi",
      (s, d) => {
        def m(name: String, df: DataFrame): DataFrame =
          df.select(lit(name).as("measure_name"),
            col("v").cast("double").as("measure_value"))
        Seq(
          m("total_revenue", li(s, d).agg(c4(sum(revC4x)).as("v"))),
          m("total_orders", ord(s, d).agg(count(lit(1)).as("v"))),
          m("total_customers", cust(s, d).agg(count(lit(1)).as("v"))),
          m("total_parts", Tables.part(s, d).agg(count(lit(1)).as("v")))
        ).reduce(_.unionAll(_)).orderBy("measure_name")
      },
      Some(s"""SELECT * FROM (
             |  SELECT 'total_revenue' AS measure_name,
             |         CAST(CAST(sum($REV_C4) AS BIGINT) / 10000.0 AS DOUBLE)
             |           AS measure_value
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'total_orders', CAST(count(*) AS DOUBLE) FROM orders
             |  UNION ALL
             |  SELECT 'total_customers', CAST(count(*) AS DOUBLE) FROM customer
             |  UNION ALL
             |  SELECT 'total_parts', CAST(count(*) AS DOUBLE) FROM part) t
             |ORDER BY measure_name""".stripMargin)),

    // ── P7/P3: searched CASE segmentation with overlap-ordered buckets ────
    QueryDef("q19_case_segmentation",
      (s, d) => cust(s, d)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal").between(0, 1000), "low")
            .when(col("c_acctbal").between(1000, 5000), "mid")
            .otherwise("high").as("balance_segment"))
        .groupBy("balance_segment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("balance_segment"),
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
             |            WHEN c_acctbal BETWEEN 0 AND 1000 THEN 'low'
             |            WHEN c_acctbal BETWEEN 1000 AND 5000 THEN 'mid'
             |            ELSE 'high' END AS balance_segment,
             |       count(*) AS n_customers
             |FROM customer
             |GROUP BY 1
             |ORDER BY balance_segment""".stripMargin)),

    // ── P6: DISTINCT projection ───────────────────────────────────────────
    QueryDef("q20_distinct",
      (s, d) => ord(s, d)
        .select("o_orderstatus", "o_orderpriority").distinct()
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority
             |FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // ── P4/P5 + §2.8 string scalar functions ──────────────────────────────
    QueryDef("q21_string_ops",
      (s, d) => cust(s, d)
        .filter(col("c_name").like("%00042%") ||
          upper(trim(col("c_mktsegment"))).isin("MACHINERY", "HOUSEHOLD"))
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          regexp_replace(col("c_name"), "#", "_").as("name_subst"),
          length(col("c_name")).as("name_len"),
          concat(col("c_mktsegment"), lit(":"), col("c_name")).as("seg_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |       upper(c_name) AS name_upper,
             |       substring(c_name, 1, 8) AS name_prefix,
             |       replace(c_name, '#', '_') AS name_subst,
             |       CAST(length(c_name) AS INT) AS name_len,
             |       concat(c_mktsegment, ':', c_name) AS seg_name
             |FROM customer
             |WHERE c_name LIKE '%00042%'
             |   OR upper(trim(c_mktsegment)) IN ('MACHINERY', 'HOUSEHOLD')
             |ORDER BY c_custkey""".stripMargin)),

    // ── P9: NULLIF / COALESCE null-safe arithmetic ────────────────────────
    // avg of per-row quotients: the sum's ulp noise is far from the round-4
    // boundary (the true mean has a huge-denominator rational value), so
    // rounding here is stable — unlike small-integer-denominator ratios.
    QueryDef("q22_null_safe",
      (s, d) => li(s, d).agg(
        round(avg(col("l_extendedprice") / nullif(col("l_quantity"), lit(0.0))), 4)
          .as("avg_unit_price"),
        count(when(nullif(col("l_discount"), lit(0.0)).isNull, 1)).as("n_zero_disc"),
        (sum(pct(coalesce(nullif(col("l_discount"), lit(0.0)), lit(0.05))))
          .cast("double") / 100.0).as("disc_defaulted")),
      Some("""SELECT round(avg(l_extendedprice / nullif(l_quantity, 0.0)), 4)
             |         AS avg_unit_price,
             |       count(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 END)
             |         AS n_zero_disc,
             |       CAST(sum(CAST(round(
             |           coalesce(nullif(l_discount, 0.0), 0.05)*100) AS BIGINT))
             |         AS BIGINT) / 100.0 AS disc_defaulted
             |FROM lineitem""".stripMargin)),

    // ── §2.8 date functions incl. boundary-count DATEDIFF (trap T3) ───────
    QueryDef("q23_date_functions",
      (s, d) => li(s, d).agg(
          min(col("l_shipdate").cast("date")).as("first_ship"),
          max(col("l_shipdate").cast("date")).as("last_ship"),
          monthsDiff(min("l_shipdate"), max("l_shipdate")).as("ship_range_months"),
          datediff(max(col("l_shipdate")), min(col("l_shipdate"))).as("ship_range_days")),
      Some("""SELECT CAST(min(l_shipdate) AS DATE) AS first_ship,
             |       CAST(max(l_shipdate) AS DATE) AS last_ship,
             |       CAST(date_diff('month', min(l_shipdate), max(l_shipdate)) AS INT)
             |         AS ship_range_months,
             |       CAST(date_diff('day', CAST(min(l_shipdate) AS DATE),
             |                      CAST(max(l_shipdate) AS DATE)) AS INT)
             |         AS ship_range_days
             |FROM lineitem""".stripMargin)),

    // ── A7/J3/P7/T3/T6: customer KPI report (reference 12_report_customers)
    QueryDef("q24_customer_report",
      (s, d) => {
        val perCust = ord(s, d)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("total_orders"),
            sum(cents(col("o_totalprice"))).as("spend_cents"),
            min(col("o_orderdate").cast("date")).as("first_order"),
            max(col("o_orderdate").cast("date")).as("last_order"),
            monthsDiff(min("o_orderdate"), max("o_orderdate")).as("lifespan_months"))
        val c = cust(s, d).select("c_custkey", "c_name")
        perCust.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(
            col("c_custkey"), col("c_name"), col("total_orders"),
            c2(col("spend_cents")).as("total_spend"),
            col("first_order"), col("last_order"), col("lifespan_months"),
            when(col("lifespan_months") >= 12 && col("spend_cents") > 300000 * 100L, "VIP")
              .when(col("lifespan_months") >= 12, "Regular")
              .otherwise("New").as("customer_segment"),
            c2(intDivide(col("spend_cents"), col("total_orders")))
              .as("avg_order_value"))
          .orderBy("c_custkey")
      },
      Some("""WITH per_cust AS (
             |  SELECT o_custkey, count(*) AS total_orders,
             |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |           AS spend_cents,
             |         CAST(min(o_orderdate) AS DATE) AS first_order,
             |         CAST(max(o_orderdate) AS DATE) AS last_order,
             |         CAST(date_diff('month', min(o_orderdate), max(o_orderdate))
             |              AS INT) AS lifespan_months
             |  FROM orders GROUP BY o_custkey)
             |SELECT c_custkey, c_name, total_orders,
             |       spend_cents / 100.0 AS total_spend,
             |       first_order, last_order, lifespan_months,
             |       CASE WHEN lifespan_months >= 12 AND spend_cents > 30000000
             |              THEN 'VIP'
             |            WHEN lifespan_months >= 12 THEN 'Regular'
             |            ELSE 'New' END AS customer_segment,
             |       (spend_cents // total_orders) / 100.0
             |         AS avg_order_value
             |FROM per_cust JOIN customer ON c_custkey = o_custkey
             |ORDER BY c_custkey""".stripMargin)),

    // ── A8/A7: product KPI report (reference 13_report_products) ──────────
    QueryDef("q25_product_report",
      (s, d) => {
        val p = Tables.part(s, d).select("p_partkey", "p_name", "p_brand")
        // aggregate FIRST on the fact key alone, attach descriptors
        // after: the distinct-orders expansion shuffles (partkey,
        // orderkey) pairs only — the p_name/p_brand strings no longer
        // ride every pre-aggregation shuffle row (r16 optimization,
        // guide §2.3 "project before the exchange"); p_partkey is the
        // part PK, so the post-agg broadcast join is row-identical
        li(s, d)
          .groupBy(col("l_partkey").as("p_partkey"))
          .agg(
            sum(revC4x).as("rev_c4"),
            countDistinct("l_orderkey").as("total_orders"),
            sum("l_quantity").as("total_quantity"),
            round(avg(col("l_extendedprice") / nullif(col("l_quantity"), lit(0.0))), 4)
              .as("avg_selling_price"))
          .join(broadcast(p), Seq("p_partkey"))
          .select(
            col("p_partkey"), col("p_name"), col("p_brand"),
            c4(col("rev_c4")).as("total_revenue"),
            col("total_orders"), col("total_quantity"), col("avg_selling_price"),
            when(col("rev_c4") > 400000L * 10000L, "High-Performer")
              .when(col("rev_c4") >= 150000L * 10000L, "Mid-Range")
              .otherwise("Low-Performer").as("product_segment"))
          .orderBy("p_partkey")
      },
      Some(s"""WITH agg AS (
             |  SELECT p_partkey, p_name, p_brand,
             |         CAST(sum($REV_C4) AS BIGINT) AS rev_c4,
             |         count(DISTINCT l_orderkey) AS total_orders,
             |         sum(l_quantity) AS total_quantity,
             |         round(avg(l_extendedprice / nullif(l_quantity, 0.0)), 4)
             |           AS avg_selling_price
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  GROUP BY 1, 2, 3)
             |SELECT p_partkey, p_name, p_brand,
             |       rev_c4 / 10000.0 AS total_revenue,
             |       total_orders, total_quantity, avg_selling_price,
             |       CASE WHEN rev_c4 > 4000000000 THEN 'High-Performer'
             |            WHEN rev_c4 >= 1500000000 THEN 'Mid-Range'
             |            ELSE 'Low-Performer' END AS product_segment
             |FROM agg
             |ORDER BY p_partkey""".stripMargin)),

    // ── A9 extension: ROLLUP hierarchy totals (year → brand → grand) ──────
    // Beyond the reference surface (its KPI sheets build totals with
    // UNION ALL, U1); rollup computes every grain in ONE shuffle with
    // partial aggregation — the scale-correct form of the same report.
    // Exact cents math keeps every grain hash-comparable; null ordering
    // is pinned explicitly (Spark sorts NULLS FIRST by default for ASC,
    // DuckDB NULLS LAST — both sides say NULLS FIRST).
    QueryDef("q29_rollup_kpi",
      (s, d) => {
        val p = Tables.part(s, d).select("p_partkey", "p_brand")
        li(s, d).join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .rollup(year(col("l_shipdate")).as("ship_year"), col("p_brand"))
          .agg(c4(sum(revC4x)).as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("ship_year").asc_nulls_first,
            col("p_brand").asc_nulls_first)
      },
      Some(s"""SELECT CAST(year(l_shipdate) AS INT) AS ship_year, p_brand,
             |       CAST(sum($REV_C4) AS BIGINT) / 10000.0 AS revenue,
             |       count(*) AS n_lines
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |GROUP BY ROLLUP (CAST(year(l_shipdate) AS INT), p_brand)
             |ORDER BY ship_year ASC NULLS FIRST, p_brand ASC NULLS FIRST""".stripMargin)),

    // ── §5: zero-row quality-check contract as counted assertions ─────────
    QueryDef("q26_quality_checks",
      (s, d) => {
        val l = li(s, d)
        def chk(name: String, df: DataFrame): DataFrame =
          df.agg(count(lit(1)).as("n_violations"))
            .select(lit(name).as("check_name"), col("n_violations"))
        Seq(
          chk("lineitem_nonpositive_qty", l.filter(col("l_quantity") <= 0)),
          chk("lineitem_null_keys", l.filter(col("l_orderkey").isNull ||
            col("l_partkey").isNull)),
          chk("lineitem_orphan_orders", l.join(ord(s, d).select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")),
          chk("orders_orphan_customers", ord(s, d).join(
            cust(s, d).select("c_custkey"),
            col("o_custkey") === col("c_custkey"), "left_anti"))
        ).reduce(_.unionAll(_)).orderBy("check_name")
      },
      Some("""SELECT * FROM (
             |  SELECT 'lineitem_nonpositive_qty' AS check_name,
             |         count(*) AS n_violations
             |  FROM lineitem WHERE l_quantity <= 0
             |  UNION ALL
             |  SELECT 'lineitem_null_keys', count(*) FROM lineitem
             |  WHERE l_orderkey IS NULL OR l_partkey IS NULL
             |  UNION ALL
             |  SELECT 'lineitem_orphan_orders', count(*) FROM lineitem
             |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
             |  UNION ALL
             |  SELECT 'orders_orphan_customers', count(*) FROM orders
             |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) t
             |ORDER BY check_name""".stripMargin)),

    // ── Skewed large⋈large join, salted ───────────────────────────────────
    // Every real 100 TB corpus has a hot key somewhere; this registers
    // the mitigation as a correctness-gated query instead of a
    // spec-only mechanism. The key expression deliberately funnels ~30%
    // of lineitem onto one part key (every l_partkey % 10 < 3 collapses
    // to 1); Salt.saltedJoin spreads that key over 16 deterministic
    // sub-keys and replicates the part side 16×, so the shuffle hashes
    // on (k, __salt) and the hot key occupies 16 tasks instead of one
    // (PlanSpec asserts the partitioning with broadcast disabled).
    // Row-identical to the plain equi-join — the oracle states the
    // PLAIN join; quantities are integral doubles, so sums are exact in
    // any order.
    QueryDef("q85_salted_skew_join",
      (s, d) => {
        val skewKey = when(col("l_partkey") % 10 < 3, 1L)
          .otherwise(col("l_partkey"))
        val left = li(s, d).select(skewKey.as("k"),
          col("l_quantity"), col("l_extendedprice"))
        val right = Tables.part(s, d)
          .select(col("p_partkey").as("k"), col("p_brand"))
        graft.functions.Salt.saltedJoin(left, right, Seq("k"), salts = 16)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_rows"),
            sum("l_quantity").as("sum_qty"))
          .orderBy("p_brand")
      },
      Some("""WITH l AS (
             |  SELECT CASE WHEN l_partkey % 10 < 3 THEN 1
             |              ELSE l_partkey END AS k,
             |         l_quantity
             |  FROM lineitem),
             |p AS (SELECT p_partkey AS k, p_brand FROM part)
             |SELECT p_brand, count(*) AS n_rows, sum(l_quantity) AS sum_qty
             |FROM l JOIN p USING (k)
             |GROUP BY 1
             |ORDER BY p_brand""".stripMargin)),

    // ── Star join with the dim past the broadcast threshold ──────────────
    // q07's star with the customer dim pinned to the SORT-MERGE fallback
    // (SURVEY §4.3's promise): when a dim outgrows
    // `autoBroadcastJoinThreshold`, the plan degrades to a shuffled SMJ
    // on the join key and stays correct. The pin is a `merge` join hint
    // — the scoped mechanism that survives re-planning: a conf flip
    // restored q107-style inside this function would silently revert to
    // BHJ when Verify's write or PlanDump re-optimizes the lazy frame
    // outside the scope (hints live in the logical plan; session conf
    // does not). PLANS.md shows SMJ here vs 2 BHJ on q07 itself; the
    // oracle is identical SQL, so broadcast and merge paths must agree
    // bit-for-bit.
    QueryDef("q123_star_smj_fallback",
      (s, d) => {
        val l = li(s, d)
        val o = ord(s, d).select("o_orderkey", "o_custkey")
        val c = cust(s, d).select("c_custkey", "c_nationkey")
        val n = Tables.nation(s, d).select("n_nationkey", "n_name")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(c4(sum(revC4x)).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy("nation")
      },
      Some(s"""SELECT n_name AS nation,
             |       CAST(sum($REV_C4) AS BIGINT) / 10000.0 AS revenue,
             |       count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN nation ON n_nationkey = c_nationkey
             |GROUP BY n_name
             |ORDER BY nation""".stripMargin)),

    // ── Bucketed co-located fact⋈fact join ───────────────────────────────
    // The write-once/join-forever contract (warehouse/Bucketed): both
    // fact tables are written bucketed+sorted by the join key, so the
    // recurring lineitem⋈orders join — which otherwise shuffles BOTH
    // sides every run — reads co-located buckets and plans a sort-merge
    // join with no exchange on either side, and the follow-on group-by
    // on the same key reuses that distribution too (PLANS.md: the only
    // exchange left is the final tiny ORDER BY of the HAVING survivors;
    // ReliabilitySpec asserts the zero-shuffle join directly). At
    // 100 TB this moves terabytes of shuffle from every query to one
    // write. The oracle states the plain join — bucketing must be
    // invisible to results.
    QueryDef("q132_bucketed_join",
      (s, d) => {
        // External scratch paths keep concurrent runs isolated; the
        // in-memory catalog is per-session, so the table NAMES cannot
        // leak across processes.
        val root = graft.sources.Scratch.dir(s, "q132-bucketed")
        graft.warehouse.Bucketed.write(
          li(s, d).select("l_orderkey", "l_quantity"),
          "graft_q132_lineitem", "l_orderkey", 8,
          Some(s"$root/lineitem"))
        graft.warehouse.Bucketed.write(
          ord(s, d).select("o_orderkey"),
          "graft_q132_orders", "o_orderkey", 8,
          Some(s"$root/orders"))
        s.table("graft_q132_lineitem")
          .join(s.table("graft_q132_orders").hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_items"),
            sum("l_quantity").as("sum_qty"))
          .filter(col("n_items") === 7)
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, count(*) AS n_items,
             |       sum(l_quantity) AS sum_qty
             |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |GROUP BY o_orderkey
             |HAVING count(*) = 7
             |ORDER BY o_orderkey""".stripMargin)),

    // ── INTERSECT / EXCEPT set algebra (distinct + bag forms) ────────────
    // The remaining SQL set operators beyond U1's UNION ALL: cohort
    // retention as set algebra over the 1994 vs 1995 customer sets —
    // retained (∩), churned (\), acquired (reverse \), either (∪
    // distinct) — plus the multiplicity-aware bags (INTERSECT ALL /
    // EXCEPT ALL over per-ORDER rows, where a customer with 3 orders in
    // '94 and 1 in '95 contributes min(3,1) and 3−1 rows). Catalyst
    // rewrites the distinct forms to semi/anti joins and the ALL forms
    // to a count-compare generate — all shuffle on the key, no
    // cartesian anywhere. Each branch is summarized to (count, sum) so
    // the hash check is element-sensitive, not just cardinality.
    QueryDef("q133_set_ops",
      (s, d) => {
        val o = ord(s, d)
        def keys(y: Int) = o.filter(year(col("o_orderdate")) === y)
          .select(col("o_custkey").cast("long").as("k"))
        val a = keys(1994); val b = keys(1995)
        def stat(label: String, df: DataFrame): DataFrame =
          df.agg(count(lit(1)).as("n"),
              coalesce(sum("k"), lit(0L)).as("sum_k"))
            .select(lit(label).as("set_op"), col("n"), col("sum_k"))
        Seq(
          stat("1_retained", a.intersect(b)),
          stat("2_churned", a.except(b)),
          stat("3_acquired", b.except(a)),
          stat("4_either", a.union(b).distinct()),
          stat("5_bag_intersect", a.intersectAll(b)),
          stat("6_bag_except", a.exceptAll(b))
        ).reduce(_.unionAll(_)).orderBy("set_op")
      },
      Some("""WITH a AS (SELECT CAST(o_custkey AS BIGINT) AS k FROM orders
             |           WHERE year(o_orderdate) = 1994),
             |     b AS (SELECT CAST(o_custkey AS BIGINT) AS k FROM orders
             |           WHERE year(o_orderdate) = 1995)
             |SELECT * FROM (
             |  SELECT '1_retained' AS set_op, count(*) AS n,
             |         CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k
             |  FROM (SELECT k FROM a INTERSECT SELECT k FROM b) t
             |  UNION ALL
             |  SELECT '2_churned', count(*),
             |         CAST(coalesce(sum(k), 0) AS BIGINT)
             |  FROM (SELECT k FROM a EXCEPT SELECT k FROM b) t
             |  UNION ALL
             |  SELECT '3_acquired', count(*),
             |         CAST(coalesce(sum(k), 0) AS BIGINT)
             |  FROM (SELECT k FROM b EXCEPT SELECT k FROM a) t
             |  UNION ALL
             |  SELECT '4_either', count(*),
             |         CAST(coalesce(sum(k), 0) AS BIGINT)
             |  FROM (SELECT k FROM a UNION SELECT k FROM b) t
             |  UNION ALL
             |  SELECT '5_bag_intersect', count(*),
             |         CAST(coalesce(sum(k), 0) AS BIGINT)
             |  FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) t
             |  UNION ALL
             |  SELECT '6_bag_except', count(*),
             |         CAST(coalesce(sum(k), 0) AS BIGINT)
             |  FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) t) u
             |ORDER BY set_op""".stripMargin)),

    // ── NTILE / PERCENT_RANK / CUME_DIST (distribution windows) ──────────
    // The remaining SQL-standard window family: quartile bucketing and
    // relative-position stats per market segment. Determinism: the
    // window orders on exact integer cents + the unique customer key,
    // so rank == row_number; percent_rank = (rank−1)/(n−1) and
    // cume_dist = rank/n are then single IEEE divisions of identical
    // integers on both engines — bit-equal doubles with NO rounding
    // (per the module's round() rule). NTILE's uneven-split rule
    // (first n mod k buckets get the extra row) is SQL-standard on
    // both sides. One segment-keyed shuffle; the window partitions by
    // a dim-cardinality key over a column-pruned scan.
    QueryDef("q125_distribution_windows",
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("bal_cents"), col("c_custkey"))
        cust(s, d)
          .select(col("c_mktsegment"), col("c_custkey"),
            cents(col("c_acctbal")).as("bal_cents"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .groupBy("c_mktsegment", "quartile")
          .agg(count(lit(1)).as("n_cust"),
            min("bal_cents").as("min_bal"),
            max("bal_cents").as("max_bal"),
            sum("bal_cents").cast("long").as("sum_bal"),
            max("pr").as("max_pr"),
            max("cd").as("max_cd"))
          .orderBy("c_mktsegment", "quartile")
      },
      Some("""WITH b AS (
             |  SELECT c_mktsegment, c_custkey,
             |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
             |  FROM customer),
             |w AS (
             |  SELECT c_mktsegment, bal_cents,
             |         ntile(4) OVER win AS quartile,
             |         percent_rank() OVER win AS pr,
             |         cume_dist() OVER win AS cd
             |  FROM b WINDOW win AS (PARTITION BY c_mktsegment
             |                        ORDER BY bal_cents, c_custkey))
             |SELECT c_mktsegment, quartile,
             |       count(*) AS n_cust,
             |       min(bal_cents) AS min_bal,
             |       max(bal_cents) AS max_bal,
             |       CAST(sum(bal_cents) AS BIGINT) AS sum_bal,
             |       max(pr) AS max_pr,
             |       max(cd) AS max_cd
             |FROM w
             |GROUP BY c_mktsegment, quartile
             |ORDER BY c_mktsegment, quartile""".stripMargin)),

    // ── FULL OUTER reconciliation ────────────────────────────────────────
    // The compare-two-systems report: per-customer '94 vs '95 order
    // counts full-outer joined, every customer classified both /
    // only_1994 / only_1995, branch totals summarized. Pins the one
    // join type the inventory lacked, plus its null-semantics edges:
    // the using-join coalesced key and COALESCE on the absent side's
    // count (a dropped null → count would land in the wrong branch and
    // break all three sums). One key-partitioned shuffle pair — the
    // reconciliation itself adds no extra exchange over the aggs.
    QueryDef("q141_full_outer_reconcile",
      (s, d) => {
        val o = ord(s, d)
        def side(y: Int, n: String) =
          o.filter(year(col("o_orderdate")) === y)
            .groupBy("o_custkey").agg(count(lit(1)).as(n))
        side(1994, "n94").join(side(1995, "n95"),
            Seq("o_custkey"), "full_outer")
          .select(
            when(col("n94").isNotNull && col("n95").isNotNull, "both")
              .when(col("n94").isNotNull, "only_1994")
              .otherwise("only_1995").as("status"),
            coalesce(col("n94"), lit(0L)).as("n94"),
            coalesce(col("n95"), lit(0L)).as("n95"))
          .groupBy("status")
          .agg(count(lit(1)).as("n_cust"),
            sum("n94").cast("long").as("sum_orders_94"),
            sum("n95").cast("long").as("sum_orders_95"))
          .orderBy("status")
      },
      Some("""WITH a AS (
             |  SELECT o_custkey, count(*) AS n94 FROM orders
             |  WHERE year(o_orderdate) = 1994 GROUP BY 1),
             |b AS (
             |  SELECT o_custkey, count(*) AS n95 FROM orders
             |  WHERE year(o_orderdate) = 1995 GROUP BY 1),
             |j AS (
             |  SELECT CASE
             |           WHEN a.n94 IS NOT NULL AND b.n95 IS NOT NULL
             |             THEN 'both'
             |           WHEN a.n94 IS NOT NULL THEN 'only_1994'
             |           ELSE 'only_1995' END AS status,
             |         coalesce(a.n94, 0) AS n94,
             |         coalesce(b.n95, 0) AS n95
             |  FROM a FULL OUTER JOIN b USING (o_custkey))
             |SELECT status, count(*) AS n_cust,
             |       CAST(sum(n94) AS BIGINT) AS sum_orders_94,
             |       CAST(sum(n95) AS BIGINT) AS sum_orders_95
             |FROM j GROUP BY status ORDER BY status""".stripMargin)),

    // ── CUBE: the full 2^k grain lattice in one pass ─────────────────────
    // Completes the multi-grain family (q50 GROUPING SETS picks grains
    // explicitly, q29 ROLLUP walks the hierarchy): CUBE materializes all
    // four (year, status) grains — the OLAP dashboard contract where
    // every drill-down and margin total must agree with the detail grid.
    // Same scale shape as its siblings: ONE Expand (4× the input, bounded
    // by the lattice size, never the table) feeding ONE partial-aggregated
    // shuffle — not four scans UNION ALLed. grouping() indicators
    // disambiguate subtotal-NULL from data-NULL; cents math and pinned
    // NULLS FIRST keep every grain hash-comparable.
    QueryDef("q144_cube_lattice",
      (s, d) =>
        ord(s, d)
          // computed dims pre-project so grouping() can name them
          .withColumn("order_year", year(col("o_orderdate")).cast("int"))
          .cube(col("order_year"), col("o_orderstatus"))
          .agg(grouping(col("order_year")).cast("int").as("g_year"),
            grouping(col("o_orderstatus")).cast("int").as("g_status"),
            count(lit(1)).as("n_orders"),
            c2(sum(cents(col("o_totalprice")))).as("total_price"))
          .orderBy(col("order_year").asc_nulls_first,
            col("o_orderstatus").asc_nulls_first),
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
             |       o_orderstatus,
             |       CAST(GROUPING(CAST(year(o_orderdate) AS INT)) AS INT)
             |         AS g_year,
             |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
             |       count(*) AS n_orders,
             |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |         / 100.0 AS total_price
             |FROM orders
             |GROUP BY CUBE (CAST(year(o_orderdate) AS INT), o_orderstatus)
             |ORDER BY order_year ASC NULLS FIRST,
             |         o_orderstatus ASC NULLS FIRST""".stripMargin)),

    // ── FIRST_VALUE / LAST_VALUE / NTH_VALUE (value-picking windows) ─────
    // The remaining window family after ranks (q13), offsets (q11/q12),
    // frames (q14/q105) and distributions (q125): pick the poorest,
    // richest, and 3rd-poorest customer per segment straight off the
    // ordered window. The frame is the classic trap: LAST_VALUE over the
    // DEFAULT frame (RANGE … CURRENT ROW) returns the CURRENT row, so
    // both sides pin ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    // FOLLOWING explicitly. Ordering is exact cents + the unique key —
    // every picked value is deterministic; the per-segment collapse (all
    // rows in a segment carry identical picks, min==max) keeps the
    // output dim-cardinality. One segment-keyed shuffle, pruned scan.
    QueryDef("q145_value_windows",
      (s, d) => {
        val wFull = Window.partitionBy("c_mktsegment")
          .orderBy(col("bal_cents"), col("c_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        cust(s, d)
          .select(col("c_mktsegment"), col("c_custkey"),
            cents(col("c_acctbal")).as("bal_cents"))
          .withColumn("poorest_key", first(col("c_custkey")).over(wFull))
          .withColumn("richest_key", last(col("c_custkey")).over(wFull))
          .withColumn("third_key",
            nth_value(col("c_custkey"), 3).over(wFull))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"),
            min("poorest_key").as("poorest_key"),
            min("richest_key").as("richest_key"),
            min("third_key").as("third_key"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH b AS (
             |  SELECT c_mktsegment, c_custkey,
             |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
             |  FROM customer),
             |w AS (
             |  SELECT c_mktsegment,
             |         first_value(c_custkey) OVER win AS poorest_key,
             |         last_value(c_custkey) OVER win AS richest_key,
             |         nth_value(c_custkey, 3) OVER win AS third_key
             |  FROM b WINDOW win AS (
             |    PARTITION BY c_mktsegment ORDER BY bal_cents, c_custkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             |SELECT c_mktsegment, count(*) AS n_cust,
             |       min(poorest_key) AS poorest_key,
             |       min(richest_key) AS richest_key,
             |       min(third_key) AS third_key
             |FROM w GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ── Hierarchical share-of-parent rollup (region → nation) ────────────
    // The BI drill-down staple the plain rollup lacks: each nation's
    // revenue as a share of its REGION, and each region's share of the
    // grand total — both in integer parts-per-million (million-scaled
    // floor div of exact c4 revenue sums; no float reaches the
    // output). One star aggregate to (region, nation) cells, then
    // both shares come from windows over the 25-row CELL frame —
    // the parent totals never re-scan the fact table.
    QueryDef("q209_share_of_parent",
      (s, d) => {
        val l = li(s, d)
        val o = ord(s, d).select("o_orderkey", "o_custkey")
        val c = cust(s, d).select("c_custkey", "c_nationkey")
        val n = Tables.nation(s, d)
          .select("n_nationkey", "n_name", "n_regionkey")
        val r = Tables.region(s, d).select("r_regionkey", "r_name")
        val cells = l
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
          .agg(sum(revC4x).as("rev"))
        // shares in DECIMAL(38,0): rev·10⁶ exceeds int64 once a
        // parent's c4-revenue sum passes ~9·10¹² (sf0.1 regions are
        // already at ~3·10¹³) — the widened div floors exactly and
        // the ppm result always fits back in a long
        cells
          .withColumn("nation_share_ppm", expr(
            "CAST((CAST(rev AS DECIMAL(38,0)) * 1000000) div " +
              "sum(CAST(rev AS DECIMAL(38,0))) " +
              "over (partition by region) AS BIGINT)"))
          .withColumn("region_share_ppm", expr(
            "CAST((sum(CAST(rev AS DECIMAL(38,0))) " +
              "over (partition by region) * 1000000) div " +
              "sum(CAST(rev AS DECIMAL(38,0))) over () AS BIGINT)"))
          .select(col("region"), col("nation"),
            (col("rev") / 10000.0).as("revenue"),
            col("nation_share_ppm"), col("region_share_ppm"))
          .orderBy("region", "nation")
      },
      Some(s"""WITH cells AS (
             |  SELECT r_name AS region, n_name AS nation,
             |         CAST(sum($REV_C4) AS BIGINT) AS rev
             |  FROM lineitem
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation ON n_nationkey = c_nationkey
             |  JOIN region ON r_regionkey = n_regionkey
             |  GROUP BY 1, 2)
             |SELECT region, nation, rev / 10000.0 AS revenue,
             |       CAST(CAST(rev AS HUGEINT) * 1000000 //
             |            sum(CAST(rev AS HUGEINT))
             |              OVER (PARTITION BY region) AS BIGINT)
             |         AS nation_share_ppm,
             |       CAST(sum(CAST(rev AS HUGEINT))
             |              OVER (PARTITION BY region) * 1000000 //
             |            sum(CAST(rev AS HUGEINT)) OVER () AS BIGINT)
             |         AS region_share_ppm
             |FROM cells
             |ORDER BY region, nation""".stripMargin))
  )
}
