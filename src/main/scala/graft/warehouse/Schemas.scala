package graft.warehouse

import org.apache.spark.sql.types._

/** Explicit schema-on-write StructTypes for the six bronze tables.
  *
  * The reference declares fixed DDL schemas and coerces CSV data at load
  * (reference: scripts/bronze/ddl_bronze.sql:12-89); we mirror that with
  * explicit StructTypes — never `inferSchema` (SURVEY.md §1.2-1.3, S1).
  *
  * Deliberate deltas from the reference DDL, per SURVEY.md §1.3:
  *  - `sls_ord_num` is StringType (bronze DDL says INT at ddl_bronze.sql:46,
  *    but the data is alphanumeric 'SO43697' — a reference bug; silver DDL
  *    at ddl_silver.sql:50 agrees with StringType).
  *  - misspelled bronze columns use the canonical names the silver proc
  *    reads (`cst_marital_status`, `prd_start_dt`/`prd_end_dt`, `subcat`).
  */
object Schemas {

  /** datasets/cust_info.csv → bronze.crm_cust_info (ddl_bronze.sql:16-24). */
  val crmCustInfo: StructType = StructType(Seq(
    StructField("cst_id", IntegerType),
    StructField("cst_key", StringType),
    StructField("cst_firstname", StringType),
    StructField("cst_lastname", StringType),
    StructField("cst_marital_status", StringType),
    StructField("cst_gndr", StringType),
    StructField("cst_create_date", DateType)
  ))

  /** datasets/prd_info.csv → bronze.crm_prd_info (ddl_bronze.sql:30-38).
    * prd_start_dt/prd_end_dt are DATETIME in the reference; the data holds
    * date-resolution values, read as timestamp then treated as dates. */
  val crmPrdInfo: StructType = StructType(Seq(
    StructField("prd_id", IntegerType),
    StructField("prd_key", StringType),
    StructField("prd_nm", StringType),
    StructField("prd_cost", IntegerType),
    StructField("prd_line", StringType),
    StructField("prd_start_dt", TimestampType),
    StructField("prd_end_dt", TimestampType)
  ))

  /** datasets/sales_details.csv → bronze.crm_sales_details
    * (ddl_bronze.sql:44-54). Dates arrive as INT yyyymmdd. */
  val crmSalesDetails: StructType = StructType(Seq(
    StructField("sls_ord_num", StringType),
    StructField("sls_prd_key", StringType),
    StructField("sls_cust_id", IntegerType),
    StructField("sls_order_dt", IntegerType),
    StructField("sls_ship_dt", IntegerType),
    StructField("sls_due_dt", IntegerType),
    StructField("sls_sales", IntegerType),
    StructField("sls_quantity", IntegerType),
    StructField("sls_price", IntegerType)
  ))

  /** datasets/CUST_AZ12.csv → bronze.erp_cust_az12 (ddl_bronze.sql:60-64). */
  val erpCustAz12: StructType = StructType(Seq(
    StructField("cid", StringType),
    StructField("bdate", DateType),
    StructField("gen", StringType)
  ))

  /** datasets/LOC_A101.csv → bronze.erp_loc_a101 (ddl_bronze.sql:70-73). */
  val erpLocA101: StructType = StructType(Seq(
    StructField("cid", StringType),
    StructField("cntry", StringType)
  ))

  /** datasets/PX_CAT_G1V2.csv → bronze.erp_px_cat_g1v2
    * (ddl_bronze.sql:79-88). */
  val erpPxCatG1v2: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("cat", StringType),
    StructField("subcat", StringType),
    StructField("maintenance", StringType)
  ))
}
