package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI entry: full warehouse build + analysis over a reference-shaped
  * datasets directory.
  *
  *   sbt "runMain graft.warehouse.WarehouseMain <datasetsDir> <warehouseDir>"
  *
  * Runs bronze→silver ETL (parquet, truncate-and-reload), builds the gold
  * star lazily, runs the quality-check contract, and prints headline
  * analysis results — the reference's end-to-end flow (SURVEY.md §3.1).
  */
object WarehouseMain {
  def main(args: Array[String]): Unit = {
    val datasetsDir = if (args.length > 0) args(0) else "/root/reference/datasets"
    val warehouseDir = if (args.length > 1) args(1) else "/tmp/graft-warehouse"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-warehouse")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val timings = Pipeline.run(spark, datasetsDir, warehouseDir)
    timings.foreach(t => println(f">> ${t.stage}%-8s ${t.seconds}%.2fs"))

    val star = Pipeline.goldFromWarehouse(spark, warehouseDir)
    val now = current_timestamp()

    println(s"dim_customers: ${star.dimCustomers.count()} rows")
    println(s"dim_products:  ${star.dimProducts.count()} rows")
    println(s"fact_sales:    ${star.factSales.count()} rows")

    val violations = Seq(
      "dup customer keys" -> Quality.dupSurrogates(star.dimCustomers, "customer_key"),
      "dup product keys" -> Quality.dupSurrogates(star.dimProducts, "product_key"),
      "fact orphans" -> Quality.factOrphans(star.factSales, star.dimCustomers, star.dimProducts)
    )
    violations.foreach { case (name, df) =>
      val n = df.count()
      println(s"quality: $name = $n ${if (n == 0) "OK" else "VIOLATION"}")
    }

    println("-- key measures --")
    Analysis.keyMeasures(star.factSales, star.dimProducts, star.dimCustomers).show(truncate = false)
    println("-- revenue by category --")
    Analysis.revenueByCategory(star.factSales, star.dimProducts).show(truncate = false)
    println("-- top 5 products (ties-aware) --")
    Analysis.topProductsRanked(star.factSales, star.dimProducts).show(truncate = false)
    println("-- customer segments --")
    Analysis.customerSpendSegments(star.factSales, star.dimCustomers).show(truncate = false)
    println("-- report_customers sample --")
    Reports.reportCustomers(star.factSales, star.dimCustomers, now)
      .orderBy(col("total_sales").desc).show(5, truncate = false)

    spark.stop()
  }
}
