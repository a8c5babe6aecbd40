package graft.warehouse

import java.io.IOException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Rerun-safe truncate-and-reload: stage-then-swap parquet overwrite.
  *
  * `df.write.mode("overwrite")` deletes the destination BEFORE writing,
  * so a mid-write failure leaves a half-written (or empty) table — at
  * 100 TB that turns one failed load into an outage. BASELINE's stated
  * approach is "Spark SQL + Delta/Iceberg tables"; those jars are not in
  * this environment, so this is the documented degradation: write to a
  * staging directory (failure here leaves the live table untouched),
  * then swap via filesystem renames (atomic metadata ops on HDFS-like
  * filesystems; on object stores use a real table format instead).
  *
  * Layout note for the 100 TB write path: callers append
  * `.partitionBy(cols)` semantics by pre-partitioning `df` — the swap is
  * whole-table, matching the reference's truncate-and-reload contract
  * (load_bronze.sql:35); incremental MERGE belongs to a table format.
  *
  * Concurrency contract: SINGLE WRITER, NO CONCURRENT READERS of the
  * live path. The dest→old / staging→dest rename pair is atomic per
  * rename but not as a unit — a reader listing `dest` between the two
  * renames sees the table briefly absent. That makes this the right
  * tool only for single-owner read-modify-write state (the streaming
  * register/CRM state files, the q79 signature index). Tables with
  * concurrent readers publish through [[VersionedParquet]] instead —
  * versioned snapshots plus an atomic pointer swap (the warehouse
  * pipeline does).
  */
object AtomicParquet {

  def overwrite(df: DataFrame, dest: String): Unit =
    overwritePartitioned(df, dest, Nil)

  /** Same stage-then-swap contract with a Hive-style partition layout
    * (`dest/col=value/…`) — the 100 TB write shape: a reader's partition
    * predicates prune whole directories from the listing before any
    * data is touched (PlanSpec-style check in ReliabilitySpec), and
    * downstream engines can address single partitions for backfills. */
  def overwritePartitioned(df: DataFrame, dest: String,
                           partitionCols: Seq[String]): Unit = {
    val fs = new Path(dest)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val destPath = new Path(dest)
    val staging = new Path(dest + ".__staging__")
    val old = new Path(dest + ".__old__")
    fs.delete(staging, true)
    fs.delete(old, true)
    // Failure in the write lands here with dest untouched.
    val writer = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(staging.toString)
    if (fs.exists(destPath) && !fs.rename(destPath, old))
      throw new IOException(s"could not retire current table at $dest")
    if (!fs.rename(staging, destPath)) {
      // restore the retired table before failing — and say so loudly if
      // even the restore fails (the previous data then sits in __old__)
      if (fs.exists(old) && !fs.rename(old, destPath))
        throw new IOException(
          s"could not publish staged table to $dest AND could not restore " +
            s"the previous table — data preserved at $old")
      throw new IOException(s"could not publish staged table to $dest")
    }
    fs.delete(old, true)
  }
}
