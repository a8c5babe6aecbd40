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

  /** Write `df` bucketed (and sorted within buckets) by `key`.
    *
    * The pre-write `repartition(buckets, key)` uses the same
    * murmur3-pmod placement as the bucket spec, so each task holds
    * exactly one bucket and each bucket lands in ONE file — without it
    * every write task emits a sliver of every bucket (tasks × buckets
    * small files), and Spark only trusts the per-bucket `sortBy` order
    * at read time when a bucket is a single file (multi-file buckets
    * force a re-sort under sort-merge join).
    *
    * `path` makes the table external at that location (run-isolated
    * scratch for gate queries); without it the files land under
    * `spark.sql.warehouse.dir`.
    */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
            path: Option[String] = None): Unit =
    writeKeys(df, table, Seq(key), buckets, path)

  /** Composite-key form of [[write]]: bucketed AND sorted by all of
    * `keys`, for recurring joins on a multi-column equi-key (the
    * wedge-closing (a, c) join of triangle counting is the canonical
    * case). Same single-file-per-bucket discipline. */
  def writeKeys(df: DataFrame, table: String, keys: Seq[String],
                buckets: Int, path: Option[String] = None): Unit = {
    require(keys.nonEmpty, "bucketed write needs at least one key")
    val w = df
      .repartition(buckets, keys.map(df.col): _*)
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
