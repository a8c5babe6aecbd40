package graft.warehouse

import org.apache.spark.sql.DataFrame

/** Bucketed table writes for recurring big⋈big equi-joins.
  *
  * A fact⋈fact join (lineitem⋈orders) shuffles both sides on the join
  * key EVERY run. Writing both tables bucketed (and sorted) by that key
  * moves the shuffle to write time, once: every subsequent join reads
  * co-located buckets and plans a sort-merge join with NO exchange on
  * either side (ReliabilitySpec asserts the plan). At 100 TB this is
  * the difference between re-shuffling terabytes per query and never
  * shuffling them again — the same contract Hive/Iceberg bucketing or
  * Delta liquid clustering provides, expressed with Spark's built-in
  * bucketed parquet tables.
  *
  * Bucket counts must match across the joined tables; pick a count
  * sized so one bucket of the bigger table fits an executor core's
  * working set (e.g. ~128-512 MB per bucket at the target SF).
  */
object Bucketed {

  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
