package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Surrogate-key assignment strategies (SURVEY.md §2.5 W2, §7.4).
  *
  * Both produce contiguous 1-based keys in the total order given by
  * `order` (which must be a deterministic total order — unique key
  * columns — or the assignment itself is nondeterministic, trap T10).
  */
object SurrogateKey {

  /** Reference-tier: ROW_NUMBER over an unpartitioned window — the
    * reference's exact formulation (load_gold.sql:24,51). Serializes
    * through a single partition; fine for dimension tables (<= millions
    * of rows), wrong for facts. */
  def rowNumber(df: DataFrame, keyName: String, order: Seq[Column]): DataFrame =
    df.withColumn(keyName, row_number().over(Window.orderBy(order: _*)))

  /** Scale-tier: total sort (range partitioning — parallel) followed by
    * RDD zipWithIndex, which numbers rows per partition and offsets by
    * the preceding partitions' sizes (one extra count job, no
    * single-partition exchange). For a total order this yields keys
    * IDENTICAL to `rowNumber` — asserted by ExtensionSpec — while every
    * stage stays parallel; this is the swap-in for dims that outgrow one
    * partition. (One of the two deliberate RDD uses in this codebase:
    * per-partition index arithmetic is genuinely imperative.) */
  def zipIndexed(df: DataFrame, keyName: String, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema.add(keyName, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, schema)
  }
}
