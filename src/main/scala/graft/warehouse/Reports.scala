package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Cols._

/** The two KPI report views (reference: scripts/analysis/
  * 12_report_customers.sql, 13_report_products.sql) — multi-CTE pipelines
  * rendered as composed lazy DataFrames (SURVEY.md §3.2). `now` is a
  * parameter (trap T4). KPI ratio semantics follow the reference's integer
  * division (trap T6) via Cols.intDiv.
  *
  * Known reference bug, resolved per SURVEY.md §3.2: 12_report_customers
  * .sql:96-97 is missing a comma, silently aliasing `total_products` as
  * `lifespan` and dropping the real lifespan; the documented intent (both
  * columns) is implemented.
  */
object Reports {

  /** gold.report_customers: per-customer KPIs — orders, sales, quantity,
    * distinct products, lifespan (months, boundary-count T3), recency, age
    * group, VIP/Regular/New segment, avg order value, avg monthly spend. */
  def reportCustomers(factSales: DataFrame, dimCustomers: DataFrame,
                      now: Column): DataFrame = {
    val base = factSales.alias("f")
      .join(broadcast(dimCustomers.alias("c")),
        col("c.customer_key") === col("f.customer_key"), "left")
      .filter(col("f.order_date").isNotNull)
      .select(
        col("f.order_number"), col("f.product_key"), col("f.order_date"),
        col("f.sales_amount"), col("f.quantity"),
        col("c.customer_key"), col("c.customer_number"),
        concat(col("c.first_name"), lit(" "), col("c.last_name")).as("customer_name"),
        yearsDiff(col("c.birthdate"), now).as("age"))

    val agg = base.groupBy("customer_key", "customer_number", "customer_name", "age")
      .agg(
        countDistinct("order_number").as("total_orders"),
        sum("sales_amount").as("total_sales"),
        sum("quantity").as("total_quantity"),
        countDistinct("product_key").as("total_products"),
        max("order_date").as("last_order_date"),
        monthsDiff(min("order_date"), max("order_date")).as("lifespan"))

    agg.select(
      col("customer_key"), col("customer_number"), col("customer_name"), col("age"),
      when(col("age") < 20, "Under 20")
        .when(col("age").between(20, 29), "20-29")
        .when(col("age").between(30, 39), "30-39")
        .when(col("age").between(40, 49), "40-49")
        .otherwise("50 and above").as("age_group"),
      when(col("lifespan") >= 12 && col("total_sales") > 5000, "VIP")
        .when(col("lifespan") >= 12 && col("total_sales") <= 5000, "Regular")
        .otherwise("New").as("customer_segment"),
      col("last_order_date"),
      monthsDiff(col("last_order_date"), now).as("recency"),
      col("total_orders"), col("total_sales"), col("total_quantity"),
      col("total_products"), col("lifespan"),
      when(col("total_sales") === 0, 0)
        .otherwise(intDiv(col("total_sales"), col("total_orders"))).as("avg_order_value"),
      when(col("lifespan") === 0, col("total_sales"))
        .otherwise(intDiv(col("total_sales"), col("lifespan"))).as("avg_monthly_spend"))
  }

  /** gold.report_products: per-product KPIs — recency, High/Mid/Low
    * performer segment, lifespan, orders, customers, sales, quantity, avg
    * selling price (NULLIF-guarded, A8), avg order / monthly revenue. */
  def reportProducts(factSales: DataFrame, dimProducts: DataFrame,
                     now: Column): DataFrame = {
    val base = factSales.alias("f")
      .join(broadcast(dimProducts.alias("p")),
        col("p.product_key") === col("f.product_key"), "left")
      .filter(col("f.order_date").isNotNull)
      .select(
        col("f.order_number"), col("f.order_date"), col("f.customer_key"),
        col("f.sales_amount"), col("f.quantity"),
        col("p.product_key"), col("p.product_name"), col("p.category"),
        col("p.subcategory"), col("p.cost"))

    val agg = base.groupBy("product_key", "product_name", "category", "subcategory", "cost")
      .agg(
        monthsDiff(min("order_date"), max("order_date")).as("lifespan"),
        max("order_date").as("last_sale_date"),
        countDistinct("order_number").as("total_orders"),
        countDistinct("customer_key").as("total_customers"),
        sum("sales_amount").as("total_sales"),
        sum("quantity").as("total_quantity"),
        round(avg(col("sales_amount").cast("double") / nullif(col("quantity"), lit(0))), 1)
          .as("avg_selling_price"))

    agg.select(
      col("product_key"), col("product_name"), col("category"),
      col("subcategory"), col("cost"), col("last_sale_date"),
      monthsDiff(col("last_sale_date"), now).as("recency_in_months"),
      when(col("total_sales") > 50000, "High-Performer")
        .when(col("total_sales") >= 10000, "Mid-Range")
        .otherwise("Low-Performer").as("product_segment"),
      col("lifespan"), col("total_orders"), col("total_sales"),
      col("total_quantity"), col("total_customers"), col("avg_selling_price"),
      when(col("total_orders") === 0, 0)
        .otherwise(intDiv(col("total_sales"), col("total_orders"))).as("avg_order_revenue"),
      when(col("lifespan") === 0, col("total_sales"))
        .otherwise(intDiv(col("total_sales"), col("lifespan"))).as("avg_monthly_revenue"))
  }
}
