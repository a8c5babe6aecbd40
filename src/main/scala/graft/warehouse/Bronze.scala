package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bronze layer: raw header-skipping CSV ingestion with fixed schemas.
  *
  * Mirrors the reference's `BULK INSERT ... FIRSTROW=2, FIELDTERMINATOR=','`
  * loads (reference: scripts/bronze/load_bronze.sql:37-43 and siblings, S1
  * in SURVEY.md §2.1). `header=true` replaces FIRSTROW=2; the explicit
  * StructType replaces DDL coercion. `TABLOCK` has no Spark meaning — the
  * parallel splittable CSV scan is the default.
  *
  * At 100 TB scale these reads parallelise by file split; no driver-side
  * work happens here — each reader returns a lazy DataFrame.
  */
object Bronze {

  private def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  def crmCustInfo(spark: SparkSession, dir: String): DataFrame =
    csv(spark, s"$dir/cust_info.csv", Schemas.crmCustInfo)

  def crmPrdInfo(spark: SparkSession, dir: String): DataFrame =
    csv(spark, s"$dir/prd_info.csv", Schemas.crmPrdInfo)

  def crmSalesDetails(spark: SparkSession, dir: String): DataFrame =
    csv(spark, s"$dir/sales_details.csv", Schemas.crmSalesDetails)

  def erpCustAz12(spark: SparkSession, dir: String): DataFrame =
    csv(spark, s"$dir/CUST_AZ12.csv", Schemas.erpCustAz12)

  def erpLocA101(spark: SparkSession, dir: String): DataFrame =
    csv(spark, s"$dir/LOC_A101.csv", Schemas.erpLocA101)

  def erpPxCatG1v2(spark: SparkSession, dir: String): DataFrame =
    csv(spark, s"$dir/PX_CAT_G1V2.csv", Schemas.erpPxCatG1v2)

  /** All six bronze tables keyed by their reference table name. */
  def all(spark: SparkSession, dir: String): Map[String, DataFrame] = Map(
    "crm_cust_info"    -> crmCustInfo(spark, dir),
    "crm_prd_info"     -> crmPrdInfo(spark, dir),
    "crm_sales_details" -> crmSalesDetails(spark, dir),
    "erp_cust_az12"    -> erpCustAz12(spark, dir),
    "erp_loc_a101"     -> erpLocA101(spark, dir),
    "erp_px_cat_g1v2"  -> erpPxCatG1v2(spark, dir)
  )
}
