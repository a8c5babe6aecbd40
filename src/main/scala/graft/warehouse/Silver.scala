package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Cols._

/** Silver layer: six pure DataFrame→DataFrame cleansing transforms
  * (reference: scripts/silver/proc_load_silver.sql — S4, P7-P9, W1, W3 in
  * SURVEY.md §2). Each takes its bronze input(s) as parameters so the same
  * code runs on reference CSVs or any adapter; `now` is injected (trap T4)
  * so results are deterministic and oracle-pinnable.
  *
  * Scale notes: the only shuffles are the two partitioned windows (by
  * cst_id / prd_key) — both hash-partition on a high-cardinality key and
  * would scale linearly on a real cluster; everything else is narrow.
  */
object Silver {

  /** bronze.crm_cust_info → silver.crm_cust_info
    * (proc_load_silver.sql:41-71): drop null ids, keep the most recent row
    * per cst_id (ROW_NUMBER dedup, W1 — cst_key added as a deterministic
    * tiebreak, trap T9), trim names, map marital/gender codes (trap T1:
    * comparisons via cleanCode). */
  def crmCustInfo(bronze: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cst_id"))
      .orderBy(col("cst_create_date").desc, col("cst_key").desc)
    bronze
      .filter(col("cst_id").isNotNull)
      .withColumn("flag_last", row_number().over(w))
      .filter(col("flag_last") === 1)
      .select(
        col("cst_id"),
        col("cst_key"),
        trim(col("cst_firstname")).as("cst_firstname"),
        trim(col("cst_lastname")).as("cst_lastname"),
        when(cleanCode(col("cst_marital_status")) === "M", "Married")
          .when(cleanCode(col("cst_marital_status")) === "S", "Single")
          .otherwise("N/A").as("cst_marital_status"),
        when(cleanCode(col("cst_gndr")) === "F", "Female")
          .when(cleanCode(col("cst_gndr")) === "M", "Male")
          .otherwise("N/A").as("cst_gndr"),
        col("cst_create_date")
      )
  }

  /** bronze.crm_prd_info → silver.crm_prd_info
    * (proc_load_silver.sql:81-107): split the composite product key into
    * cat_id (first 5 chars, '-'→'_') and prd_key (from char 7), default
    * null cost to 0, map product-line codes, and derive the SCD2-style
    * validity window: prd_end_dt = day before the next version's start
    * (LEAD - 1 day, W3/trap T7); NULL marks the current version. */
  def crmPrdInfo(bronze: DataFrame): DataFrame = {
    // T-SQL window expressions see the FROM-scope column, so the LEAD
    // partitions by the ORIGINAL composite prd_key, not the stripped alias.
    val w = Window.partitionBy(col("prd_key")).orderBy(col("prd_start_dt"))
    bronze
      .withColumn("prd_start_date", col("prd_start_dt").cast("date"))
      .withColumn("prd_end_dt_new",
        date_sub(lead(col("prd_start_date"), 1).over(w), 1))
      .select(
        col("prd_id"),
        expr("substring(prd_key, 7)").as("prd_key"),
        regexp_replace(substring(col("prd_key"), 1, 5), "-", "_").as("cat_id"),
        col("prd_nm"),
        coalesce(col("prd_cost"), lit(0)).as("prd_cost"),
        when(cleanCode(col("prd_line")) === "M", "Mountain")
          .when(cleanCode(col("prd_line")) === "R", "Road")
          .when(cleanCode(col("prd_line")) === "S", "Other Sales")
          .when(cleanCode(col("prd_line")) === "T", "Touring")
          .otherwise("N/A").as("prd_line"),
        col("prd_start_date").as("prd_start_dt"),
        col("prd_end_dt_new").as("prd_end_dt")
      )
  }

  /** bronze.crm_sales_details → silver.crm_sales_details
    * (proc_load_silver.sql:117-154): validate INT-yyyymmdd dates (→ NULL
    * when non-positive / not 8 digits), repair sls_sales when missing,
    * non-positive, or inconsistent with qty*|price| (recompute as
    * |qty*price|), and derive price from sales/qty when price is null/0
    * (negatives → |price|). Trap T8: the derivation divide is NULLIF-
    * guarded. */
  def crmSalesDetails(bronze: DataFrame): DataFrame = {
    val sales = col("sls_sales")
    val qty = col("sls_quantity")
    val price = col("sls_price")
    bronze.select(
      col("sls_ord_num"),
      col("sls_prd_key"),
      col("sls_cust_id"),
      intDateToDate(col("sls_order_dt")).as("sls_order_dt"),
      intDateToDate(col("sls_ship_dt")).as("sls_ship_dt"),
      intDateToDate(col("sls_due_dt")).as("sls_due_dt"),
      when(sales <= 0 || sales.isNull || sales =!= qty * abs(price),
        abs(qty * price)).otherwise(sales).as("sls_sales"),
      qty.as("sls_quantity"),
      when(price === 0 || price.isNull, abs(safeDiv(sales, qty)).cast("int"))
        .when(price < 0, abs(price))
        .otherwise(price).as("sls_price")
    )
  }

  /** bronze.erp_cust_az12 → silver.erp_cust_az12
    * (proc_load_silver.sql:167-186): strip the 'NAS' CID prefix, null out
    * future birthdates (against injected `now`, trap T4), standardise
    * gender (trap T1 trailing blanks; blank/NULL → 'N/A'). */
  def erpCustAz12(bronze: DataFrame, now: Column = current_timestamp()): DataFrame =
    bronze.select(
      when(col("cid").like("NAS%"), expr("substring(cid, 4)"))
        .otherwise(col("cid")).as("cid"),
      when(col("bdate") > now.cast("date"), lit(null).cast("date"))
        .otherwise(col("bdate")).as("bdate"),
      when(cleanCode(col("gen")) === "F", "Female")
        .when(cleanCode(col("gen")) === "M", "Male")
        .when(nullOrBlank(col("gen")), "N/A")
        .otherwise(trim(col("gen"))).as("gen")
    )

  /** bronze.erp_loc_a101 → silver.erp_loc_a101
    * (proc_load_silver.sql:195-206): normalise CID ('-' removed) and
    * country codes (DE→Germany, US/USA→United States, blank/NULL→'N/A').
    * The ELSE branch trims — the raw data carries trailing CR/spaces the
    * reference's ANSI-padding comparison hid (trap T1). */
  def erpLocA101(bronze: DataFrame): DataFrame =
    bronze.select(
      regexp_replace(col("cid"), "-", "").as("cid"),
      when(cleanCode(col("cntry")) === "DE", "Germany")
        .when(cleanCode(col("cntry")).isin("US", "USA"), "United States")
        .when(nullOrBlank(col("cntry")), "N/A")
        .otherwise(trim(col("cntry"))).as("cntry")
    )

  /** bronze.erp_px_cat_g1v2 → silver.erp_px_cat_g1v2
    * (proc_load_silver.sql:215-225): pass-through projection. */
  def erpPxCatG1v2(bronze: DataFrame): DataFrame =
    bronze.select("id", "cat", "subcat", "maintenance")

  /** Every silver table carries a DATETIME2 audit column defaulted to load
    * time (reference: ddl_silver.sql:24,41,59,70,82,95). Injected `now`
    * keeps it deterministic in tests. */
  def withAudit(df: DataFrame, now: Column = current_timestamp()): DataFrame =
    df.withColumn("dwh_create_date", now)
}
