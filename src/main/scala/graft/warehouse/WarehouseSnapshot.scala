package graft.warehouse

import java.io.IOException
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse-level atomic snapshots: ONE pointer covering EVERY table,
  * so a reader joining fact and dims never observes mixed versions —
  * the multi-table half of a transactional format's commit log
  * (VersionedParquet is the single-table half).
  *
  * The reference reloads its whole silver layer as one procedure
  * (reference scripts/silver/proc_load_silver.sql:23-244 truncates and
  * reloads the full table set inside a single batch), which implicitly
  * gives downstream readers a consistent set; per-table pointer swaps
  * alone cannot — during a refresh a reader could resolve table A at v5
  * and table B at v4.
  *
  * Layout:
  * {{{
  *   root/_MANIFEST                // pointer: live manifest name
  *   root/_manifests/m00000003     // immutable: "<table>\t<vNNNNNNNN>" lines
  *   root/tables/<name>/...        // one VersionedParquet root per table
  * }}}
  *
  * `publishAll` stages every table as a NEW per-table version (old
  * versions untouched and still live), writes an immutable manifest
  * naming the exact version of every table, then swaps the manifest
  * pointer — the only step a reader can observe, and it is a single
  * atomic rename. A crash anywhere before the swap leaves the previous
  * snapshot fully intact; after the swap the publish is complete.
  *
  * `readSnapshot` resolves the manifest pointer ONCE and pins every
  * table to that manifest's versions, so all frames it returns are
  * mutually consistent no matter how many publishes race the read.
  *
  * Retention is manifest-driven: the newest `keepSnapshots` manifests
  * are retained, and each table keeps every version any retained
  * manifest references — never trusting per-table version counting,
  * which would break if a table were also published standalone.
  *
  * Concurrency contract: single writer, fully concurrent readers —
  * same as VersionedParquet, and the pointer swap stays O(1) in table
  * count and table size.
  */
object WarehouseSnapshot {

  private val POINTER = "_MANIFEST"
  private val MANIFEST_DIR = "_manifests"

  private def manifestName(n: Long) = f"m$n%08d"

  private def fcOf(spark: SparkSession, p: Path) =
    FileContext.getFileContext(p.toUri,
      spark.sparkContext.hadoopConfiguration)

  private def tableRoot(root: String, name: String) = s"$root/tables/$name"

  /** Highest manifest file on disk — the recovery source of truth when
    * the pointer is missing (same crash-window argument as
    * VersionedParquet.latestCompleteVersion: manifest files are written
    * complete BEFORE the pointer swap, so the newest one is the
    * snapshot the lost swap was installing). */
  private def latestManifestOnDisk(spark: SparkSession,
                                   root: String): Option[Long] = {
    val dir = new Path(root, MANIFEST_DIR)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName).filter(_.matches("m\\d{8}"))
      .map(_.drop(1).toLong).sorted.lastOption
  }

  /** The live manifest number (None before the first publishAll). */
  def currentManifest(spark: SparkSession, root: String): Option[Long] =
    VersionedParquet.readPointer(spark, new Path(root, POINTER))
      .map(_.drop(1).toLong)
      .orElse(latestManifestOnDisk(spark, root))

  /** The table→version map a manifest pins. */
  def tableVersions(spark: SparkSession, root: String,
                    manifest: Long): Map[String, Long] = {
    val p = new Path(new Path(root, MANIFEST_DIR), manifestName(manifest))
    val fc = fcOf(spark, p)
    if (!fc.util.exists(p))
      throw new IOException(s"manifest $manifest of $root does not exist " +
        "(never published, or vacuumed past retention)")
    val in = fc.open(p)
    val content =
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var r = in.read(buf)
        while (r > 0) { out.write(buf, 0, r); r = in.read(buf) }
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
    content.split('\n').filter(_.nonEmpty).map { line =>
      val Array(name, v) = line.split('\t')
      name -> v.drop(1).toLong
    }.toMap
  }

  /** Publish every table as one atomic warehouse snapshot; returns the
    * new manifest number. Readers resolve either the whole previous
    * snapshot or the whole new one — never a mix.
    *
    * `minRetainMillis`: time guard on retention, same contract as
    * [[VersionedParquet.publish]] — a table version (or manifest)
    * younger than this is never retired even outside the
    * `keepSnapshots` count window, so in-flight scans survive
    * back-to-back refreshes whose count window is shorter than one
    * scan. */
  /** `pinned`: tables carried into the new manifest BY REFERENCE — the
    * named existing version is re-pointed without any rewrite (the
    * incremental-refresh / forget case: a 100-table snapshot where one
    * table changed republishes one table, not a hundred). Pinned
    * versions must be complete published versions of their table.
    *
    * `fkChecks`: cross-table referential integrity enforced at the
    * MANIFEST tier — each (childTable, childCol, parentTable,
    * parentCol) is validated over the STAGED versions (fresh or
    * pinned alike) after staging and before the manifest is written,
    * so an orphan key rejects the whole snapshot and readers keep the
    * previous one in full. SQL FK semantics: a NULL child key passes.
    * This is the write-path twin of the read-side RI quality checks
    * (q26 / the reference's quality_checks scripts): at 100 TB you
    * want the commit to refuse the inconsistency, not a dashboard to
    * report it the morning after. Cost: one key-projected anti-join
    * per FK over staged data. */
  def publishAll(tables: Seq[(String, DataFrame)], root: String,
                 partitionCols: Map[String, Seq[String]] = Map.empty,
                 keepSnapshots: Int = 2, minRetainMillis: Long = 0L,
                 pinned: Map[String, Long] = Map.empty,
                 constraints: Map[String, Seq[String]] = Map.empty,
                 fkChecks: Seq[(String, String, String, String)] = Nil)
      : Long = {
    require(tables.nonEmpty, "a snapshot must cover at least one table")
    require(keepSnapshots >= 1, "must retain at least the live snapshot")
    require(tables.map(_._1).toSet.intersect(pinned.keySet).isEmpty,
      "a table cannot be both freshly published and pinned")
    val spark = tables.head._2.sparkSession
    val rootPath = new Path(root)

    // 1. Stage: publish each table as a fresh per-table version. Old
    //    versions stay live and intact — retention here is manifest-
    //    driven (step 4), so per-table publish must not retire anything
    //    a retained manifest might still reference. Pinned tables skip
    //    staging entirely: their version is validated and re-pointed.
    //    Per-table CHECK `constraints` enforce snapshot-or-nothing at
    //    the MANIFEST tier: any table's violation throws before the
    //    manifest is written, so readers keep resolving the old
    //    snapshot in full — tables staged before the failure are
    //    orphan versions no manifest names (invisible, retired by the
    //    next publish's retention).
    val published = tables.map { case (name, df) =>
      VersionedParquet.publish(df, tableRoot(root, name),
        partitionCols.getOrElse(name, Nil), keepVersions = Int.MaxValue,
        constraints = constraints.getOrElse(name, Nil))
      name -> VersionedParquet.currentVersion(spark, tableRoot(root, name)).get
    } ++ pinned.toSeq.sortBy(_._1).map { case (name, v) =>
      require(VersionedParquet.versions(spark, tableRoot(root, name))
          .contains(v),
        s"pinned version $v of $name is not a complete published version")
      name -> v
    }

    // 1b. Cross-table FK validation over the STAGED versions: any
    //     orphan rejects the snapshot before the manifest exists —
    //     staged versions become unnamed orphans (same rejection path
    //     as a CHECK violation), the live snapshot stays intact.
    if (fkChecks.nonEmpty) {
      import org.apache.spark.sql.functions.col
      val stagedVersion = published.toMap
      def staged(name: String): DataFrame = {
        val v = stagedVersion.getOrElse(name, throw new IOException(
          s"FK check references table '$name' absent from this snapshot"))
        VersionedParquet.read(spark, tableRoot(root, name), Some(v))
      }
      fkChecks.foreach { case (child, childCol, parent, parentCol) =>
        val orphans = staged(child).select(col(childCol))
          .filter(col(childCol).isNotNull) // SQL FK: NULL child passes
          .join(staged(parent).select(col(parentCol).as(childCol))
            .distinct(), Seq(childCol), "left_anti")
          .count()
        if (orphans > 0)
          throw new IOException("snapshot rejected: FK " +
            s"$child.$childCol -> $parent.$parentCol violated " +
            s"($orphans orphan rows); $root keeps its previous snapshot")
      }
    }

    // 2. Write the immutable manifest file (complete before the pointer
    //    can name it). Temp-file + atomic rename — latestManifestOnDisk
    //    treats the highest manifest as recovery truth when the pointer
    //    is lost, so a crash mid-manifest-write must never leave a torn
    //    manifest at a resolvable name (the `.m*.tmp` staging name is
    //    excluded by the m\d{8} pattern).
    val next = currentManifest(spark, root).getOrElse(-1L) + 1
    VersionedParquet.installPointer(spark, new Path(rootPath, MANIFEST_DIR),
      manifestName(next),
      published.map { case (n, v) => s"$n\t${f"v$v%08d"}" }.mkString("\n"))

    // 3. The one observable step: atomic manifest-pointer swap.
    try VersionedParquet.installPointer(spark, rootPath, POINTER,
      manifestName(next))
    catch {
      case e: IOException =>
        throw new IOException(s"could not swap manifest pointer for " +
          s"$root; live snapshot unchanged, staged manifest $next", e)
    }

    // 4. Manifest-driven retention: keep the newest `keepSnapshots`
    //    manifests and every table version any of them references.
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cutoff = next - keepSnapshots + 1
    val mDir = new Path(rootPath, MANIFEST_DIR)
    val youngest = System.currentTimeMillis() - minRetainMillis
    val (retired, retained) = fs.listStatus(mDir).toSeq
      .filter(st => st.getPath.getName.matches("m\\d{8}"))
      .partition(st => st.getPath.getName.drop(1).toLong < cutoff &&
        st.getModificationTime <= youngest)
    val pins: Map[String, Seq[Long]] = retained
      .map(_.getPath.getName.drop(1).toLong)
      .flatMap(m => tableVersions(spark, root, m).toSeq)
      .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2) }
    published.foreach { case (name, live) =>
      val minPinned = pins.getOrElse(name, Seq(live)).min
      VersionedParquet.vacuum(spark, tableRoot(root, name),
        keepVersions = (live - minPinned + 1).toInt, minRetainMillis)
    }
    retired.foreach(st => fs.delete(st.getPath, false))
    next
  }

  /** Resolve one consistent snapshot: every table pinned to the SAME
    * manifest. `at` pins a historical manifest (snapshot time travel).
    * Plans stay bound to their resolved snapshot dirs, so publishes
    * racing downstream consumption never mix versions into a join. */
  def readSnapshot(spark: SparkSession, root: String,
                   at: Option[Long] = None): Map[String, DataFrame] = {
    val m = at.orElse(currentManifest(spark, root)).getOrElse(
      throw new IOException(s"no published snapshot under $root"))
    tableVersions(spark, root, m).map { case (name, v) =>
      name -> VersionedParquet.read(spark, tableRoot(root, name), Some(v))
    }
  }
}
