package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks as zero-row DataFrames (reference: tests/
  * quality_check_silver.sql, tests/quality_check_gold.sql — SURVEY.md §5).
  * The contract is the reference's: each def returns the *violations*; an
  * empty result means the check passes. ScalaTest asserts count == 0.
  */
object Quality {

  /** No duplicate / null primary keys (A6 HAVING pattern):
    * quality_check_silver.sql:23-26 and siblings. */
  def dupOrNullKeys(df: DataFrame, key: String): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("duplicate_count"))
      .filter(col("duplicate_count") > 1 || col(key).isNull)

  /** No leading/trailing whitespace in a string column
    * (quality_check_silver.sql:34-38 — LIKE ' %' generalised to any
    * untrimmed value, which is the check's intent). */
  def untrimmed(df: DataFrame, cols: String*): DataFrame =
    df.filter(cols.map(c => col(c) =!= trim(col(c))).reduce(_ || _))

  /** Categorical domain audit: the distinct values of a code column
    * (quality_check_silver.sql:41-47 — human-reviewed, returned for
    * assertion against the expected label set). */
  def domain(df: DataFrame, c: String): DataFrame = df.select(c).distinct()

  /** Negative-or-null cost check (quality_check_silver.sql:77-81). */
  def badCost(silverPrd: DataFrame): DataFrame =
    silverPrd.filter(col("prd_cost").isNull || col("prd_cost") < 0)

  /** SCD validity windows must not invert (quality_check_silver.sql). */
  def invalidValidityWindow(silverPrd: DataFrame): DataFrame =
    silverPrd.filter(col("prd_end_dt") < col("prd_start_dt"))

  /** Ship date must fall inside [order, due] (quality_check_silver.sql:
    * 120-122). NULL-date rows pass, as in T-SQL ternary logic. */
  def shipOutsideWindow(silverSales: DataFrame): DataFrame =
    silverSales.filter(!col("sls_ship_dt").between(col("sls_order_dt"), col("sls_due_dt")))

  /** Cross-field consistency: sales = quantity * price, all positive and
    * non-null (quality_check_silver.sql:126-140). */
  def inconsistentSales(silverSales: DataFrame): DataFrame =
    silverSales.filter(
      col("sls_sales") =!= col("sls_quantity") * col("sls_price") ||
      col("sls_sales").isNull || col("sls_price").isNull || col("sls_quantity").isNull ||
      col("sls_sales") <= 0 || col("sls_price") <= 0 || col("sls_quantity") <= 0)

  /** Birthdates must lie in [1925-01-01, now] (quality_check_silver.sql:
    * 184-188). */
  def badBirthdate(silverErpCust: DataFrame, now: org.apache.spark.sql.Column): DataFrame =
    silverErpCust.filter(col("bdate") < lit("1925-01-01").cast("date") ||
      col("bdate") > now.cast("date"))

  /** Gold surrogate keys unique (quality_check_gold.sql:20-35). */
  def dupSurrogates(dim: DataFrame, key: String): DataFrame =
    dim.groupBy(key).agg(count(lit(1)).as("duplicate_count"))
      .filter(col("duplicate_count") > 1)

  /** Referential integrity: fact rows whose dim keys resolve to nothing
    * (quality_check_gold.sql:39-45) — expressed as the idiomatic left-anti
    * join per dim (J4), unioned. */
  def factOrphans(factSales: DataFrame, dimCustomers: DataFrame,
                  dimProducts: DataFrame): DataFrame = {
    val noCust = factSales.join(dimCustomers.select("customer_key"),
      Seq("customer_key"), "left_anti")
    val noProd = factSales.join(dimProducts.select("product_key"),
      Seq("product_key"), "left_anti")
    noCust.unionByName(noProd)
  }
}
