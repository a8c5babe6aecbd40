package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Cols._

/** The reference's 13 analysis scripts (scripts/analysis/01..11) as named,
  * lazy DataFrame definitions over the gold star schema (SURVEY.md §2.3-2.7
  * operator families A*, W*, O*, U*, P*). Every def is a pure function of
  * the gold DataFrames plus an injectable clock (trap T4).
  *
  * Scale notes per query are inline; the recurring pattern — aggregate
  * FIRST (shrinking to dim-cardinality), window/rank SECOND — is the
  * reference's own structure and exactly what keeps the unpartitioned
  * windows cheap at 100 TB.
  */
object Analysis {

  // ── 02: dimensions exploration (P6 distinct) ────────────────────────────
  def distinctCountries(dimCustomers: DataFrame): DataFrame =
    dimCustomers.select("country").distinct().orderBy("country")

  def distinctProductTaxonomy(dimProducts: DataFrame): DataFrame =
    dimProducts.select("category", "subcategory", "product_name").distinct()
      .orderBy("category", "subcategory", "product_name")

  // ── 03: date range exploration (A1 scalar min/max + T3 datediff) ────────
  def orderDateRange(factSales: DataFrame): DataFrame =
    factSales.agg(
      min("order_date").as("first_order_date"),
      max("order_date").as("last_order_date"),
      monthsDiff(min("order_date"), max("order_date")).as("order_range_months"))

  def customerAgeRange(dimCustomers: DataFrame, now: Column): DataFrame =
    dimCustomers.agg(
      min("birthdate").as("oldest_birthdate"),
      yearsDiff(min("birthdate"), now).as("oldest_age"),
      max("birthdate").as("youngest_birthdate"),
      yearsDiff(max("birthdate"), now).as("youngest_age"))

  // ── 04: measures exploration (A1/A2 scalars + U1 union-all KPI sheet) ───
  def keyMeasures(factSales: DataFrame, dimProducts: DataFrame,
                  dimCustomers: DataFrame): DataFrame = {
    // U1 / trap T5: T-SQL implicitly unifies INT and FLOAT measure columns;
    // Spark union requires an explicit common type — cast all to double.
    def m(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("measure_name"),
        col("v").cast("double").as("measure_value"))
    Seq(
      m("Total Sales", factSales.agg(sum("sales_amount").as("v"))),
      m("Total Quantity", factSales.agg(sum("quantity").as("v"))),
      m("Average Price", factSales.agg(avg("price").as("v"))),
      m("Total Orders", factSales.agg(countDistinct("order_number").as("v"))),
      m("Total Products", dimProducts.agg(countDistinct("product_name").as("v"))),
      m("Total Customers", dimCustomers.agg(count("customer_key").as("v")))
    ).reduce(_.unionAll(_))
  }

  // ── 05: magnitude analysis (A3/A4 group-by, J3 join+agg) ────────────────
  def customersByCountry(dimCustomers: DataFrame): DataFrame =
    dimCustomers.groupBy("country")
      .agg(count("customer_key").as("total_customers"))
      .orderBy(col("total_customers").desc)

  def customersByGender(dimCustomers: DataFrame): DataFrame =
    dimCustomers.groupBy("gender")
      .agg(count("customer_key").as("total_customers"))
      .orderBy(col("total_customers").desc)

  def productsByCategory(dimProducts: DataFrame): DataFrame =
    dimProducts.groupBy("category")
      .agg(count("product_key").as("total_products"))
      .orderBy(col("total_products").desc)

  def avgCostByCategory(dimProducts: DataFrame): DataFrame =
    dimProducts.groupBy("category")
      // T-SQL AVG over INT is integer-valued; keep reference semantics.
      .agg(avg("cost").cast("long").as("avg_cost"))
      .orderBy(col("avg_cost").desc)

  def revenueByCategory(factSales: DataFrame, dimProducts: DataFrame): DataFrame =
    factSales.join(broadcast(dimProducts.select("product_key", "category")),
        Seq("product_key"), "left")
      .groupBy("category").agg(sum("sales_amount").as("total_revenue"))
      .orderBy(col("total_revenue").desc)

  def revenueByCustomer(factSales: DataFrame, dimCustomers: DataFrame): DataFrame =
    factSales.join(broadcast(dimCustomers.select("customer_key", "first_name", "last_name")),
        Seq("customer_key"), "left")
      .groupBy("customer_key", "first_name", "last_name")
      .agg(sum("sales_amount").as("total_revenue"))
      .orderBy(col("total_revenue").desc)

  def itemsByCountry(factSales: DataFrame, dimCustomers: DataFrame): DataFrame =
    factSales.join(broadcast(dimCustomers.select("customer_key", "country")),
        Seq("customer_key"), "left")
      .groupBy("country").agg(sum("quantity").as("total_sold_items"))
      .orderBy(col("total_sold_items").desc)

  // ── 06: ranking analysis (O2 top-k, W5 ties-aware rank) ─────────────────
  /** TOP n by revenue — Spark plans TakeOrderedAndProject (true top-k, no
    * full sort). Aggregate first: the sort runs over ≤|products| rows. */
  def topProductsByRevenue(factSales: DataFrame, dimProducts: DataFrame,
                           n: Int = 5, ascending: Boolean = false): DataFrame = {
    val agg = factSales
      .join(broadcast(dimProducts.select("product_key", "product_name")),
        Seq("product_key"), "left")
      .groupBy("product_name").agg(sum("sales_amount").as("total_revenue"))
    agg.orderBy(if (ascending) col("total_revenue").asc else col("total_revenue").desc)
      .limit(n)
  }

  /** Ties-aware top-5: RANK() over the aggregate, filter rank<=5 (W5). */
  def topProductsRanked(factSales: DataFrame, dimProducts: DataFrame, n: Int = 5): DataFrame =
    factSales
      .join(broadcast(dimProducts.select("product_key", "product_name")),
        Seq("product_key"), "left")
      .groupBy("product_name").agg(sum("sales_amount").as("total_revenue"))
      .withColumn("rank_products",
        rank().over(Window.orderBy(col("total_revenue").desc)))
      .filter(col("rank_products") <= n)

  def topCustomersByRevenue(factSales: DataFrame, dimCustomers: DataFrame, n: Int = 10): DataFrame =
    factSales.join(broadcast(dimCustomers.select("customer_key", "first_name", "last_name")),
        Seq("customer_key"), "left")
      .groupBy("customer_key", "first_name", "last_name")
      .agg(sum("sales_amount").as("total_revenue"))
      .orderBy(col("total_revenue").desc).limit(n)

  def bottomCustomersByOrders(factSales: DataFrame, dimCustomers: DataFrame, n: Int = 3): DataFrame =
    factSales.join(broadcast(dimCustomers.select("customer_key", "first_name", "last_name")),
        Seq("customer_key"), "left")
      .groupBy("customer_key", "first_name", "last_name")
      .agg(countDistinct("order_number").as("total_orders"))
      .orderBy(col("total_orders").asc).limit(n)

  // ── 07: change over time (A5 group-by-expression) ───────────────────────
  def salesByYearMonth(factSales: DataFrame): DataFrame =
    factSales.filter(col("order_date").isNotNull)
      .groupBy(year(col("order_date")).as("order_year"),
               month(col("order_date")).as("order_month"))
      .agg(sum("sales_amount").as("total_sales"),
           countDistinct("customer_key").as("total_customers"),
           sum("quantity").as("total_quantity"))
      .orderBy("order_year", "order_month")

  def salesByMonthTrunc(factSales: DataFrame): DataFrame =
    factSales.filter(col("order_date").isNotNull)
      .groupBy(date_trunc("month", col("order_date")).cast("date").as("order_date"))
      .agg(sum("sales_amount").as("total_sales"),
           countDistinct("customer_key").as("total_customers"),
           sum("quantity").as("total_quantity"))
      .orderBy("order_date")

  def salesByYearMonthLabel(factSales: DataFrame): DataFrame =
    factSales.filter(col("order_date").isNotNull)
      .groupBy(date_format(col("order_date"), "yyyy-MMM").as("order_date"))
      .agg(sum("sales_amount").as("total_sales"),
           countDistinct("customer_key").as("total_customers"),
           sum("quantity").as("total_quantity"))
      .orderBy("order_date")

  // ── 08: cumulative analysis (W6 running totals over pre-aggregate) ──────
  /** Pre-aggregate to yearly grain, then running SUM/AVG with the default
    * RANGE UNBOUNDED PRECEDING..CURRENT ROW frame — identical to T-SQL's
    * default. The window is unpartitioned but runs over ≤|years| rows. */
  def cumulativeYearlySales(factSales: DataFrame): DataFrame = {
    val yearly = factSales.filter(col("order_date").isNotNull)
      .groupBy(date_trunc("year", col("order_date")).cast("date").as("order_date"))
      .agg(sum("sales_amount").as("total_sales"),
           avg("price").as("avg_price"))
    val w = Window.orderBy("order_date")
    yearly.select(
      col("order_date"), col("total_sales"),
      sum("total_sales").over(w).as("running_total_sales"),
      avg("avg_price").over(w).as("moving_average_price"))
  }

  // ── 09: performance analysis (W4 lag YoY, W7 partition-avg) ─────────────
  def yoyProductPerformance(factSales: DataFrame, dimProducts: DataFrame): DataFrame = {
    val yearly = factSales.filter(col("order_date").isNotNull)
      .join(broadcast(dimProducts.select("product_key", "product_name")),
        Seq("product_key"), "left")
      .groupBy(year(col("order_date")).as("order_year"), col("product_name"))
      .agg(sum("sales_amount").as("current_sales"))
    val byProduct = Window.partitionBy("product_name")
    val byYear = byProduct.orderBy("order_year")
    val avgSales = avg("current_sales").over(byProduct)
    val pySales = lag("current_sales", 1).over(byYear)
    yearly.select(
      col("order_year"), col("product_name"), col("current_sales"),
      avgSales.as("avg_sales"),
      (col("current_sales") - avgSales).as("diff_avg"),
      when(col("current_sales") - avgSales > 0, "Above Avg")
        .when(col("current_sales") - avgSales < 0, "Below Avg")
        .otherwise("Avg").as("avg_change"),
      pySales.as("py_sales"),
      (col("current_sales") - pySales).as("diff_py"),
      when(col("current_sales") - pySales > 0, "Increase")
        .when(col("current_sales") - pySales < 0, "Decrease")
        .otherwise("No Change").as("py_change")
    ).orderBy("product_name", "order_year")
  }

  // ── 10: segmentation (P7 CASE buckets + A6) ─────────────────────────────
  /** Cost-range buckets; CASE order preserved — the reference's WHEN
    * branches overlap at 500/1000 and first-match wins (P3 note). */
  def productCostSegments(dimProducts: DataFrame): DataFrame =
    dimProducts.select(col("product_key"),
        when(col("cost") < 100, "Below 100")
          .when(col("cost").between(100, 500), "100-500")
          .when(col("cost").between(500, 1000), "500-1000")
          .otherwise("Above 1000").as("cost_range"))
      .groupBy("cost_range").agg(count("product_key").as("total_products"))
      .orderBy(col("total_products").desc)

  def customerSpendSegments(factSales: DataFrame, dimCustomers: DataFrame): DataFrame = {
    val spending = factSales
      .join(broadcast(dimCustomers.select("customer_key")), Seq("customer_key"), "left")
      .groupBy("customer_key")
      .agg(sum("sales_amount").as("total_spending"),
           monthsDiff(min("order_date"), max("order_date")).as("lifespan"))
    spending.select(col("customer_key"),
        when(col("lifespan") >= 12 && col("total_spending") > 5000, "VIP")
          .when(col("lifespan") >= 12 && col("total_spending") <= 5000, "Regular")
          .otherwise("New").as("customer_segment"))
      .groupBy("customer_segment").agg(count("customer_key").as("total_customers"))
      .orderBy(col("total_customers").desc)
  }

  // ── 11: part-to-whole (W8 grand-total window) ───────────────────────────
  def categoryShareOfSales(factSales: DataFrame, dimProducts: DataFrame): DataFrame = {
    val catSales = factSales
      .join(broadcast(dimProducts.select("product_key", "category")),
        Seq("product_key"), "left")
      .groupBy("category").agg(sum("sales_amount").as("total_sales"))
    // Grand-total window over the tiny aggregate (≤|categories| rows).
    val w = Window.partitionBy()
    catSales.select(
      col("category"), col("total_sales"),
      sum("total_sales").over(w).as("overall_sales"),
      round(col("total_sales").cast("double") / sum("total_sales").over(w) * 100, 2)
        .as("percentage_of_total"))
      .orderBy(col("total_sales").desc)
  }
}
