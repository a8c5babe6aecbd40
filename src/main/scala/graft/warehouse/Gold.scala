package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SurrogateKey

/** Gold layer: the star schema, as lazy DataFrame definitions — exactly
  * the reference's CREATE VIEW semantics (scripts/gold/load_gold.sql; S5,
  * J1-J2, W2 in SURVEY.md §2). Canonical column names per SURVEY.md §1.3
  * (`sales_amount`, `birthdate`, `category`/`subcategory`) — the names the
  * analysis scripts and data catalog actually use.
  *
  * Scale notes: both dims are small (≤ tens of k rows) → explicit
  * `broadcast()` keeps the fact side shuffle-free for the star join; at
  * 100 TB the fact never shuffles for these joins. Surrogate keys have
  * two strategies behind one switch (SurrogateKey, SURVEY.md §7.4):
  * the reference's ROW_NUMBER unpartitioned window (default — exact
  * T-SQL formulation, single-partition exchange, fine for dims) and the
  * parallel sort+zipWithIndex variant (`scalableKeys = true`) that
  * assigns IDENTICAL keys with no single-partition stage — the swap-in
  * when a dimension outgrows one partition. WarehouseSpec asserts the
  * two paths agree row-for-row.
  */
object Gold {

  /** Prepend a contiguous 1-based surrogate key in the total order of
    * `order` (int-typed, matching the reference's schema contract). */
  private def withKey(df: DataFrame, keyName: String, order: Seq[Column],
                      scalable: Boolean): DataFrame = {
    val keyed =
      if (scalable)
        SurrogateKey.zipIndexed(df, keyName, order)
          .withColumn(keyName, col(keyName).cast("int"))
      else SurrogateKey.rowNumber(df, keyName, order)
    keyed.select(col(keyName) +: df.columns.map(col): _*)
  }

  /** gold.dim_customers (load_gold.sql:22-41): CRM customers enriched by
    * two left joins to ERP demographics + location on cst_key = cid; CRM
    * is the gender master, ERP the fallback (COALESCE); ROW_NUMBER over
    * cst_id is the surrogate key (unique after silver dedup, trap T10). */
  def dimCustomers(custInfo: DataFrame, erpCust: DataFrame, erpLoc: DataFrame,
                   scalableKeys: Boolean = false): DataFrame = {
    val ci = custInfo.alias("ci")
    val ca = erpCust.alias("ca")
    val la = erpLoc.alias("la")
    val base = ci.join(broadcast(ca), col("ca.cid") === col("ci.cst_key"), "left")
      .join(broadcast(la), col("la.cid") === col("ci.cst_key"), "left")
      .select(
        col("ci.cst_id").as("customer_id"),
        col("ci.cst_key").as("customer_number"),
        col("ci.cst_firstname").as("first_name"),
        col("ci.cst_lastname").as("last_name"),
        when(col("ci.cst_gndr") =!= "N/A", col("ci.cst_gndr"))
          .otherwise(coalesce(col("ca.gen"), lit("N/A"))).as("gender"),
        col("ci.cst_marital_status").as("marital_status"),
        col("ca.bdate").as("birthdate"),
        col("la.cntry").as("country"),
        col("ci.cst_create_date").as("create_date")
      )
    withKey(base, "customer_key", Seq(col("customer_id")), scalableKeys)
  }

  /** gold.dim_products (load_gold.sql:49-65): current product versions
    * only (prd_end_dt IS NULL), enriched with category labels; surrogate
    * key ordered by (prd_start_dt, prd_key) — a unique pair, so the key is
    * deterministic (trap T10). */
  def dimProducts(prdInfo: DataFrame, pxCat: DataFrame,
                  scalableKeys: Boolean = false): DataFrame = {
    val pr = prdInfo.alias("pr")
    val pcg = pxCat.alias("pcg")
    val base = pr.filter(col("prd_end_dt").isNull)
      .join(broadcast(pcg), col("pcg.id") === col("pr.cat_id"), "left")
      .select(
        col("pr.prd_id").as("product_id"),
        col("pr.prd_key").as("product_number"),
        col("pr.prd_nm").as("product_name"),
        col("pr.cat_id").as("category_id"),
        col("pcg.cat").as("category"),
        col("pcg.subcat").as("subcategory"),
        col("pr.prd_cost").as("cost"),
        col("pr.prd_line").as("product_line"),
        col("pr.prd_start_dt").as("start_date"),
        col("pcg.maintenance").as("maintenance")
      )
    withKey(base, "product_key",
      Seq(col("start_date"), col("product_number")), scalableKeys)
  }

  /** gold.fact_sales (load_gold.sql:73-88): sales enriched with surrogate
    * keys by left-joining the two dim *views* on business keys (view-on-
    * view stacking — lazy DataFrames compose identically). Dims are
    * broadcast: the fact side never shuffles. */
  def factSales(salesDetails: DataFrame, dimCustomers: DataFrame, dimProducts: DataFrame): DataFrame = {
    val sd = salesDetails.alias("sd")
    val dc = dimCustomers.select("customer_key", "customer_id").alias("dc")
    val dp = dimProducts.select("product_key", "product_number").alias("dp")
    sd.join(broadcast(dc), col("dc.customer_id") === col("sd.sls_cust_id"), "left")
      .join(broadcast(dp), col("dp.product_number") === col("sd.sls_prd_key"), "left")
      .select(
        col("sd.sls_ord_num").as("order_number"),
        col("dp.product_key"),
        col("dc.customer_key"),
        col("sd.sls_order_dt").as("order_date"),
        col("sd.sls_ship_dt").as("shipping_date"),
        col("sd.sls_due_dt").as("due_date"),
        col("sd.sls_sales").as("sales_amount"),
        col("sd.sls_quantity").as("quantity"),
        col("sd.sls_price").as("price")
      )
  }

  /** The full bronze→silver→gold stack over a reference-datasets dir, as
    * one lazily-composed bundle (no data moves until an action). */
  case class Star(dimCustomers: DataFrame, dimProducts: DataFrame, factSales: DataFrame)

  def build(spark: org.apache.spark.sql.SparkSession, datasetsDir: String,
            now: org.apache.spark.sql.Column = current_timestamp(),
            scalableKeys: Boolean = false): Star = {
    val ci = Silver.crmCustInfo(Bronze.crmCustInfo(spark, datasetsDir))
    val pi = Silver.crmPrdInfo(Bronze.crmPrdInfo(spark, datasetsDir))
    val sd = Silver.crmSalesDetails(Bronze.crmSalesDetails(spark, datasetsDir))
    val ca = Silver.erpCustAz12(Bronze.erpCustAz12(spark, datasetsDir), now)
    val la = Silver.erpLocA101(Bronze.erpLocA101(spark, datasetsDir))
    val px = Silver.erpPxCatG1v2(Bronze.erpPxCatG1v2(spark, datasetsDir))
    val dc = dimCustomers(ci, ca, la, scalableKeys)
    val dp = dimProducts(pi, px, scalableKeys)
    Star(dc, dp, factSales(sd, dc, dp))
  }
}
