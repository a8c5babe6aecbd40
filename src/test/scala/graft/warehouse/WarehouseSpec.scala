package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end warehouse build over the reference CSVs, asserted with the
  * reference's own quality-check contract (tests/quality_check_silver.sql,
  * tests/quality_check_gold.sql — "zero rows = pass") plus measured-count
  * sanity checks from SURVEY.md §1.4.
  */
class WarehouseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val datasets = "/root/reference/datasets"
  // Pinned clock (trap T4) — all age/recency/future-birthdate logic is
  // deterministic under test.
  private lazy val now = lit("2026-01-01 00:00:00").cast("timestamp")

  private lazy val bronzeCust = Bronze.crmCustInfo(spark, datasets)
  private lazy val silverCust = Silver.crmCustInfo(bronzeCust)
  private lazy val silverPrd = Silver.crmPrdInfo(Bronze.crmPrdInfo(spark, datasets))
  private lazy val silverSales = Silver.crmSalesDetails(Bronze.crmSalesDetails(spark, datasets))
  private lazy val silverErpCust = Silver.erpCustAz12(Bronze.erpCustAz12(spark, datasets), now)
  private lazy val silverErpLoc = Silver.erpLocA101(Bronze.erpLocA101(spark, datasets))
  private lazy val star = Gold.build(spark, datasets, now)

  private def domainOf(df: org.apache.spark.sql.DataFrame, c: String): Set[String] =
    Quality.domain(df, c).collect().map(r => Option(r.getString(0)).getOrElse("<null>")).toSet

  test("bronze reads the measured row counts") {
    assert(bronzeCust.count() === 18494L)
    assert(Bronze.crmPrdInfo(spark, datasets).count() === 397L)
    assert(Bronze.crmSalesDetails(spark, datasets).count() === 60398L)
    assert(Bronze.erpCustAz12(spark, datasets).count() === 18484L)
    assert(Bronze.erpLocA101(spark, datasets).count() === 18484L)
    assert(Bronze.erpPxCatG1v2(spark, datasets).count() === 37L)
  }

  test("silver cust: dedup keeps exactly one latest row per non-null key") {
    assert(Quality.dupOrNullKeys(silverCust, "cst_id").count() === 0L)
    val expected = bronzeCust.filter(col("cst_id").isNotNull)
      .select("cst_id").distinct().count()
    assert(silverCust.count() === expected)
  }

  test("silver cust: names trimmed, codes mapped to full labels") {
    assert(Quality.untrimmed(silverCust, "cst_firstname", "cst_lastname").count() === 0L)
    assert(domainOf(silverCust, "cst_gndr").subsetOf(Set("Female", "Male", "N/A")))
    assert(domainOf(silverCust, "cst_marital_status").subsetOf(Set("Married", "Single", "N/A")))
  }

  test("silver prd: keys split, costs defaulted, lines mapped, windows valid") {
    assert(Quality.dupOrNullKeys(silverPrd, "prd_id").count() === 0L)
    assert(Quality.badCost(silverPrd).count() === 0L)
    assert(Quality.invalidValidityWindow(silverPrd).count() === 0L)
    assert(domainOf(silverPrd, "prd_line")
      .subsetOf(Set("Mountain", "Road", "Other Sales", "Touring", "N/A")))
    // cat_id joins the ERP category table: every cat_id format AA_BB.
    val badCat = silverPrd.filter(!col("cat_id").rlike("^[A-Z]{2}_[A-Z]{2}$")).count()
    assert(badCat === 0L)
  }

  test("silver sales: repair invariant holds on all 60,398 rows") {
    assert(silverSales.count() === 60398L)
    assert(Quality.inconsistentSales(silverSales).count() === 0L)
  }

  test("silver erp cust: NAS stripped, future birthdates nulled, gender clean") {
    assert(silverErpCust.filter(col("cid").like("NAS%")).count() === 0L)
    // The transform nulls FUTURE birthdates only; the 1925 lower bound is a
    // human-review audit in the reference (it flags 17 real rows there too).
    assert(silverErpCust.filter(col("bdate") > now.cast("date")).count() === 0L)
    assert(Quality.badBirthdate(silverErpCust, now).count() === 17L)
    assert(domainOf(silverErpCust, "gen").subsetOf(Set("Female", "Male", "N/A")))
  }

  test("silver erp loc: cids dashless, countries standardized") {
    assert(silverErpLoc.filter(col("cid").contains("-")).count() === 0L)
    val d = domainOf(silverErpLoc, "cntry")
    assert(d === Set("Australia", "Canada", "France", "Germany",
      "United Kingdom", "United States", "N/A"))
  }

  test("gold: surrogate keys unique and dense") {
    assert(Quality.dupSurrogates(star.dimCustomers, "customer_key").count() === 0L)
    assert(Quality.dupSurrogates(star.dimProducts, "product_key").count() === 0L)
    val n = star.dimCustomers.count()
    val mx = star.dimCustomers.agg(max("customer_key")).head().getInt(0)
    assert(mx.toLong === n)
  }

  test("gold: fact preserves every sales row; joins resolve") {
    assert(star.factSales.count() === 60398L)
    // Referential integrity (quality_check_gold.sql:39-45): fact rows with
    // unresolved dim keys. The reference data yields zero.
    val orphans = star.factSales.filter(
      col("customer_key").isNull || col("product_key").isNull).count()
    assert(orphans === 0L)
  }

  test("analysis: measures + segmentation smoke with exact shape") {
    val m = Analysis.keyMeasures(star.factSales, star.dimProducts, star.dimCustomers)
    assert(m.count() === 6L)
    val seg = Analysis.customerSpendSegments(star.factSales, star.dimCustomers).collect()
    assert(seg.map(_.getString(0)).toSet.subsetOf(Set("VIP", "Regular", "New")))
    val rc = Reports.reportCustomers(star.factSales, star.dimCustomers, now)
    val rp = Reports.reportProducts(star.factSales, star.dimProducts, now)
    assert(rc.count() > 0L && rp.count() > 0L)
    // Report has BOTH total_products and lifespan (reference 12:96-97 bug fixed).
    assert(rc.columns.contains("total_products") && rc.columns.contains("lifespan"))
  }
}
