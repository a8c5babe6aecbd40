package graft.warehouse

import java.io.IOException
import java.nio.charset.StandardCharsets
import java.util.EnumSet

import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader-safe table publication: versioned directories + an atomically
  * swapped pointer file — the single-table essence of a transactional
  * format's commit log (Delta/Iceberg jars are absent from this
  * environment; this is the honest minimal replacement).
  *
  * Layout:
  * {{{
  *   root/_CURRENT        // pointer: the live version's directory name
  *   root/v00000007/...   // immutable parquet snapshots
  *   root/v00000008/...
  * }}}
  *
  * `publish` writes the new snapshot to a FRESH directory (never touching
  * the live one), then swaps the pointer with a rename-with-overwrite —
  * a single atomic metadata op, so a concurrent reader resolves either
  * the old pointer or the new one, never a missing or half-written
  * table (ReliabilitySpec hammers a reader through concurrent
  * publishes). Old snapshots are retired only AFTER the pointer moves,
  * and the latest `keepVersions` are retained so in-flight scans that
  * already resolved an old version finish against intact files — the
  * same grace window a table format's VACUUM respects.
  *
  * Failure modes: a crash before the pointer swap leaves a garbage
  * `v*` directory that the next publish overwrites (version numbers
  * advance from the POINTER, not the directory listing); a crash after
  * the swap is a completed publish. The pointer write itself goes
  * through a temp file + atomic rename, so `_CURRENT` is never
  * observed empty or partial.
  *
  * Concurrency contract: single writer (like AtomicParquet), but
  * readers are now fully concurrent-safe. At 100 TB the pointer swap
  * stays O(1) — cost is one rename regardless of table size.
  */
object VersionedParquet {

  private val POINTER = "_CURRENT"

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** ALL pointer I/O goes through FileContext, whose local
    * implementation is the RAW filesystem: the checksummed
    * LocalFileSystem keeps a `.crc` side file per file, and a
    * rename-with-overwrite of the data file is NOT atomic with respect
    * to its side file — a concurrent reader could open the new pointer
    * against the stale checksum and throw (caught by the
    * ReliabilitySpec hammer). Raw create/rename/open has no side files,
    * so the pointer swap is one genuinely atomic metadata op. */
  private def fcOf(spark: SparkSession, p: Path) =
    FileContext.getFileContext(p.toUri,
      spark.sparkContext.hadoopConfiguration)

  private def versionName(n: Long) = f"v$n%08d"

  /** The live version number, from the pointer file (None before the
    * first publish). */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val pointer = new Path(root, POINTER)
    val fc = fcOf(spark, pointer)
    if (!fc.util.exists(pointer)) None
    else {
      val in = fc.open(pointer)
      try {
        // read to EOF: a single read() may return short on remote
        // filesystems, and a truncated pointer parse would resolve the
        // wrong version
        val buf = new Array[Byte](64)
        var off = 0
        var r = in.read(buf, off, buf.length - off)
        while (r > 0 && off < buf.length) {
          off += r
          r = in.read(buf, off, buf.length - off)
        }
        Some(new String(buf, 0, off, StandardCharsets.UTF_8).trim.drop(1).toLong)
      } finally in.close()
    }
  }

  /** Publish `df` as the table's next version; returns the snapshot
    * directory. The live table is readable throughout. */
  def publish(df: DataFrame, root: String, partitionCols: Seq[String] = Nil,
              keepVersions: Int = 2): String = {
    require(keepVersions >= 1, "must retain at least the live version")
    val spark = df.sparkSession
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val next = currentVersion(spark, root).getOrElse(-1L) + 1
    val snapshot = new Path(rootPath, versionName(next))
    fs.delete(snapshot, true) // leftover from a crashed publish, if any
    val writer = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(snapshot.toString)
    // Atomic pointer swap: temp file + rename-with-overwrite (one
    // metadata op — POSIX rename on local/HDFS). FileContext.rename
    // supports OVERWRITE where FileSystem.rename would refuse, and its
    // raw local implementation keeps no checksum side files (see fcOf).
    val tmp = new Path(rootPath, s".$POINTER.tmp")
    val fc = fcOf(spark, rootPath)
    val out = fc.create(tmp,
      EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(versionName(next).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    try fc.rename(tmp, new Path(rootPath, POINTER), Options.Rename.OVERWRITE)
    catch {
      case e: IOException =>
        throw new IOException(s"could not swap pointer for $root; live " +
          s"table unchanged, staged snapshot at $snapshot", e)
    }
    // Retire snapshots beyond the retention window (pointer already
    // moved; only versions older than the last `keepVersions` go).
    val cutoff = next - keepVersions + 1
    fs.listStatus(rootPath).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.matches("v\\d{8}") &&
        name.drop(1).toLong < cutoff)
        fs.delete(st.getPath, true)
    }
    snapshot.toString
  }

  /** Read the live version. The returned plan is bound to the resolved
    * snapshot directory, so a publish racing this read never changes
    * (or deletes, within the retention window) the files under it. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IOException(s"no published version under $root"))
    spark.read.parquet(new Path(root, versionName(v)).toString)
  }

  /** Reader-safe compaction — the OPTIMIZE analogue. Streaming appends
    * (e.g. a candidate-pair log) accrue small-file debt that kills scan
    * throughput at 100 TB (one task + one open per tiny file); this
    * rewrites the live snapshot into ~`targetBytes` files and publishes
    * the result as a NEW version through the same pointer swap, so
    * readers are never disturbed and a crash mid-compaction leaves the
    * live table untouched. Returns the new snapshot directory. */
  def compact(spark: SparkSession, root: String,
              targetBytes: Long = 128L << 20,
              partitionCols: Seq[String] = Nil): String = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IOException(s"nothing to compact under $root"))
    val snapshot = new Path(root, versionName(v))
    val fs = fsOf(spark, snapshot)
    val totalBytes = fs.getContentSummary(snapshot).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // For a Hive-partitioned table pass its partitionCols so the
    // compacted snapshot keeps the pruning layout (repartitioning by
    // the partition columns keeps one writer task per directory).
    val df = read(spark, root)
    val arranged =
      if (partitionCols.nonEmpty)
        df.repartition(nFiles, partitionCols.map(df.col): _*)
      else df.repartition(nFiles)
    publish(arranged, root, partitionCols)
  }
}
