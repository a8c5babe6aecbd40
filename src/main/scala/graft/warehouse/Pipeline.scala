package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_timestamp

/** ETL orchestration: the reference's two stored procedures
  * (bronze.load_bronze, silver.load_silver — S3/S8 in SURVEY.md §2.1) as a
  * Scala function with per-stage timing and error trapping. Each layer
  * publishes as ONE atomic warehouse snapshot (WarehouseSnapshot): the
  * truncate-and-reload full refresh, rerun-safe AND reader-safe — a
  * failed load never corrupts any live table, and a concurrent reader
  * joining across the layer's tables resolves one manifest, never a
  * mixed set mid-refresh (the reference reloads the whole layer inside
  * a single procedure, proc_load_silver.sql:23-244, which gives its
  * readers the same whole-set semantics implicitly).
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
      // 15-min age guard: a refresh racing long scans must not retire a
      // snapshot an in-flight reader resolved (see VersionedParquet)
      WarehouseSnapshot.publishAll(Bronze.all(spark, datasetsDir).toSeq,
        s"$warehouseDir/bronze", minRetainMillis = 15 * 60 * 1000L)
    }

    // one consistent bronze snapshot feeds the whole silver build
    val bronze = WarehouseSnapshot.readSnapshot(spark, s"$warehouseDir/bronze")

    timed("silver", log) {
      val silver: Seq[(String, DataFrame)] = Seq(
        "crm_cust_info" -> Silver.crmCustInfo(bronze("crm_cust_info")),
        "crm_prd_info" -> Silver.crmPrdInfo(bronze("crm_prd_info")),
        "crm_sales_details" -> Silver.crmSalesDetails(bronze("crm_sales_details")),
        "erp_cust_az12" -> Silver.erpCustAz12(bronze("erp_cust_az12"), now),
        "erp_loc_a101" -> Silver.erpLocA101(bronze("erp_loc_a101")),
        "erp_px_cat_g1v2" -> Silver.erpPxCatG1v2(bronze("erp_px_cat_g1v2"))
      )
      WarehouseSnapshot.publishAll(
        silver.map { case (n, df) => n -> Silver.withAudit(df, now) },
        s"$warehouseDir/silver", minRetainMillis = 15 * 60 * 1000L)
    }
    timings.toSeq
  }

  /** Gold star over the persisted silver layer (views — lazy, no
    * write). All three frames pin ONE silver manifest: a warehouse
    * refresh racing this build can never mix silver versions into the
    * star. */
  def goldFromWarehouse(spark: SparkSession, warehouseDir: String): Gold.Star = {
    val silver = WarehouseSnapshot.readSnapshot(spark, s"$warehouseDir/silver")
    val dc = Gold.dimCustomers(silver("crm_cust_info"),
      silver("erp_cust_az12"), silver("erp_loc_a101"))
    val dp = Gold.dimProducts(silver("crm_prd_info"), silver("erp_px_cat_g1v2"))
    Gold.Star(dc, dp, Gold.factSales(silver("crm_sales_details"), dc, dp))
  }
}
