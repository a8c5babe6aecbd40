package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_timestamp

/** ETL orchestration: the reference's two stored procedures
  * (bronze.load_bronze, silver.load_silver — S3/S8 in SURVEY.md §2.1) as a
  * Scala function with per-stage timing and error trapping. Writes are
  * versioned-snapshot parquet with an atomic pointer swap
  * (VersionedParquet) — the truncate-and-reload full refresh, rerun-safe
  * AND reader-safe: a failed load never corrupts the live table, and a
  * concurrent reader never sees it missing mid-publish.
  *
  * The reference's duration PRINTs have a reversed-argument bug producing
  * negative seconds (proc_load_silver.sql:73); not reproduced.
  */
object Pipeline {

  final case class StageTiming(stage: String, seconds: Double)

  private def timed[A](stage: String, log: StageTiming => Unit)(f: => A): A = {
    val t0 = System.nanoTime()
    try f
    finally log(StageTiming(stage, (System.nanoTime() - t0) / 1e9))
  }

  /** Full warehouse build: reference CSVs → bronze parquet → silver
    * parquet; gold stays lazy (views). Returns per-stage timings. */
  def run(spark: SparkSession, datasetsDir: String, warehouseDir: String,
          now: Column = current_timestamp()): Seq[StageTiming] = {
    val timings = scala.collection.mutable.ArrayBuffer.empty[StageTiming]
    val log = (t: StageTiming) => { timings += t; () }

    timed("bronze", log) {
      Bronze.all(spark, datasetsDir).foreach { case (name, df) =>
        VersionedParquet.publish(df, s"$warehouseDir/bronze/$name")
      }
    }

    def bronzeTbl(name: String): DataFrame =
      VersionedParquet.read(spark, s"$warehouseDir/bronze/$name")

    timed("silver", log) {
      val silver: Map[String, DataFrame] = Map(
        "crm_cust_info" -> Silver.crmCustInfo(bronzeTbl("crm_cust_info")),
        "crm_prd_info" -> Silver.crmPrdInfo(bronzeTbl("crm_prd_info")),
        "crm_sales_details" -> Silver.crmSalesDetails(bronzeTbl("crm_sales_details")),
        "erp_cust_az12" -> Silver.erpCustAz12(bronzeTbl("erp_cust_az12"), now),
        "erp_loc_a101" -> Silver.erpLocA101(bronzeTbl("erp_loc_a101")),
        "erp_px_cat_g1v2" -> Silver.erpPxCatG1v2(bronzeTbl("erp_px_cat_g1v2"))
      )
      silver.foreach { case (name, df) =>
        VersionedParquet.publish(Silver.withAudit(df, now),
          s"$warehouseDir/silver/$name")
      }
    }
    timings.toSeq
  }

  /** Gold star over the persisted silver layer (views — lazy, no write). */
  def goldFromWarehouse(spark: SparkSession, warehouseDir: String): Gold.Star = {
    def silverTbl(name: String): DataFrame =
      VersionedParquet.read(spark, s"$warehouseDir/silver/$name")
    val dc = Gold.dimCustomers(silverTbl("crm_cust_info"),
      silverTbl("erp_cust_az12"), silverTbl("erp_loc_a101"))
    val dp = Gold.dimProducts(silverTbl("crm_prd_info"), silverTbl("erp_px_cat_g1v2"))
    Gold.Star(dc, dp, Gold.factSales(silverTbl("crm_sales_details"), dc, dp))
  }
}
