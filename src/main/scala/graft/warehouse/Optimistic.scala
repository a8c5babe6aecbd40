package graft.warehouse

import java.io.IOException

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import VersionedParquet._

/** Optimistic multi-writer concurrency for the versioned format — the
  * Delta/Iceberg commit-protocol analogue, replacing "one writer at a
  * time" with "stage concurrently, validate at commit".
  *
  * The single-writer lock (`VersionedParquet.withWriterLock`)
  * serializes the ENTIRE operation: a second writer blocks for the
  * full duration of the first one's data write, which at 100 TB with
  * many independent pipelines (the reference's six silver loads,
  * `proc_load_silver.sql:39-225`, are exactly this shape) is an
  * availability ceiling. Here the expensive work — aligning, CHECK
  * validation, writing data files, computing merge tiers — happens
  * with NO table lock, into a private staging area `root/_txn/<id>`.
  * Only the commit itself takes the lock, and holds it for a
  * critical section sized O(overlay metadata), not O(data write).
  *
  * Commit-time conflict detection: every commit records its WRITE
  * DOMAIN in the snapshot (`_DOMAIN` marker — `append`,
  * `partitions\n<p>…`, or absent = whole table). A committing writer
  * whose read version is no longer live intersects its own domain
  * with every intervening commit's:
  *
  *   - disjoint (two appends; partition overwrites of disjoint
  *     partitions; an append under someone's partition overwrite) →
  *     the commit REBASES onto the live version and succeeds — both
  *     writers commit exactly once, serialized only for the brief
  *     critical section;
  *   - overlapping (same partition overwritten twice, a keyed merge
  *     racing anything, any whole-table commit in between) → the
  *     loser's attempt raises a conflict INTERNALLY, re-stages
  *     against the new live version, and retries — loser retries and
  *     wins, the winner's work untouched. After `maxAttempts`
  *     genuine conflicts the caller gets [[CommitConflictException]]
  *     with the staged input intact for its own retry policy.
  *
  * The committed history is always equivalent to SOME serial order —
  * the commit order: an append's rows land after every intervening
  * commit (blind INSERT is order-insensitive up to multiset
  * equality); a rebased partition overwrite recomputes its carried
  * tiers (delta/vector/feed) against the live version under the
  * lock, so disjoint writers compose exactly as if run back to back.
  * A keyed MERGE declares the key set it touched (a Bloom
  * fingerprint) and rebases over provably key-disjoint merges and
  * predicate DML; searched UPDATE/DELETE ([[updateWhere]] /
  * [[deleteWhere]]) additionally declare their predicate's read
  * columns and SET's written columns, rebasing only when the
  * interveners could not have changed their match set. Anything
  * less provable re-stages — the textbook optimistic-transaction
  * retry.
  *
  * Crash safety is unchanged from the single-writer path: staged
  * work lives outside the `v*` namespace (invisible to readers,
  * `versions()`, and time travel), `_SUCCESS` lands last inside the
  * snapshot, and the pointer swap is the one atomic publish step. A
  * writer that dies mid-stage leaves an orphan `_txn` dir that
  * never becomes visible; `cleanupTxns` sweeps them by age.
  */
object Optimistic {

  /** A successful optimistic commit: the published snapshot path and
    * version, and how many stage attempts it took (`attempts > 1`
    * means at least one conflict was detected and retried). */
  final case class Commit(path: String, version: Long, attempts: Int)

  /** Raised when `maxAttempts` consecutive commit attempts each found
    * a conflicting intervening commit. The staged input is the
    * caller's own rows, so retrying the operation is always safe. */
  final class CommitConflictException(msg: String) extends IOException(msg)

  /** A commit's declared write domain (see `_DOMAIN` marker). A keyed
    * merge declares the KEY SET it touched as a 1024-bit Bloom
    * fingerprint (k = 1): empty bit-intersection PROVES the key sets
    * disjoint (a Bloom has no false negatives), so two concurrent
    * merges on provably-disjoint keys rebase instead of re-staging;
    * a spurious bit collision only costs a conservative retry. */
  private[warehouse] sealed trait Domain
  private[warehouse] case object AppendDomain extends Domain
  private[warehouse] final case class PartitionsDomain(parts: Set[String])
    extends Domain
  private[warehouse] final case class KeysDomain(cols: Seq[String],
    words: Array[Long]) extends Domain
  /** Predicate DML (searched UPDATE/DELETE): the touched-key Bloom of
    * [[KeysDomain]] PLUS the predicate's referenced columns and the
    * SET's written columns — the extra facts that make predicate
    * rebase sound: two predicate DMLs compose iff their touched keys
    * are provably disjoint AND neither's SET writes a column the
    * other's predicate reads (otherwise the intervener could move
    * rows into/out of my match set, making my staged match stale).
    * `setCols` empty = DELETE (removes rows, writes no column). */
  private[warehouse] final case class DmlDomain(cols: Seq[String],
    words: Array[Long], predCols: Set[String], setCols: Set[String])
    extends Domain
  private[warehouse] case object TableDomain extends Domain

  private[warehouse] val KEY_BLOOM_BITS = 1024

  /** Bounded exponential backoff between a detected conflict and the
    * loser's re-stage: 50 ms doubling to a 1.6 s cap, plus a small
    * per-thread jitter so N losers of the same commit don't re-stage
    * in lockstep and collide again at the next lock. Without this,
    * three contending writers each burn a full Spark re-stage per
    * conflict round (q158 measured ~2× its own earlier wall time on
    * pure re-stage churn); with it, losers yield the window the
    * winner's vacuum/compaction needs and usually succeed on the
    * next attempt. Semantics unchanged — the retry COUNT and conflict
    * rules are exactly as before, only the spacing moves. */
  private def conflictBackoff(attempt: Int): Unit = {
    val base = math.min(1600L, 50L << math.min(attempt - 1, 5))
    val jitter = (Thread.currentThread().getId * 37 + attempt * 13) % 50
    try Thread.sleep(base + jitter)
    catch { case _: InterruptedException =>
      Thread.currentThread().interrupt() }
  }

  /** Whether MY commit (staged against an older version) may NOT
    * rebase over THEIR intervening commit. Asymmetric on purpose:
    * the question is always "is my-commit-last a valid serial order,
    * given what I staged" —
    *   - an append rebases over appends and partition overwrites (my
    *     rows are new rows, landing last is exactly blind-INSERT
    *     semantics) but not over a whole-table commit (schema /
    *     constraints / base may have changed — re-validate);
    *   - a partition overwrite rebases over overwrites of DISJOINT
    *     partitions only; an intervening append may have placed rows
    *     into my partitions, making my staged replace-set stale —
    *     conflict, retry against the new version (Delta's
    *     ConcurrentAppendException);
    *   - a whole-table commit (merge/update/restore/compact, and any
    *     legacy commit without a domain marker) conflicts with
    *     everything, both ways. */
  private def bloomHit(w1: Array[Long], w2: Array[Long]): Boolean =
    w1.zip(w2).exists { case (a, b) => (a & b) != 0L }

  private[warehouse] def conflicts(mine: Domain, theirs: Domain): Boolean =
    (mine, theirs) match {
      case (AppendDomain, AppendDomain) => false
      case (AppendDomain, PartitionsDomain(_)) => false
      // an append lands last over a keyed merge unchanged: the merge
      // touched existing keys, the append adds new ROWS — blind
      // INSERT semantics either way (same for predicate DML)
      case (AppendDomain, KeysDomain(_, _)) => false
      case (AppendDomain, DmlDomain(_, _, _, _)) => false
      case (PartitionsDomain(p), PartitionsDomain(q)) =>
        p.intersect(q).nonEmpty
      case (KeysDomain(c1, w1), KeysDomain(c2, w2)) =>
        c1 != c2 || bloomHit(w1, w2)
      // my keyed merge over their predicate DML: their touched rows
      // are provably not my keys, so my staged keyed rows (and my
      // base scan) are untouched — rebase
      case (KeysDomain(c1, w1), DmlDomain(c2, w2, _, _)) =>
        c1 != c2 || bloomHit(w1, w2)
      // my predicate DML over theirs: sound iff (a) the touched row
      // sets are provably disjoint (Bloom — no false negatives) AND
      // (b) their SET wrote no column my predicate reads — else their
      // post-images could enter/leave my match set and my staged
      // match would be stale. A DELETE writes no columns (setCols
      // empty), so rows it removed beyond my own match set cannot
      // affect me; rows in BOTH match sets trip the Bloom.
      case (DmlDomain(c1, w1, p1, _), DmlDomain(c2, w2, _, s2)) =>
        c1 != c2 || bloomHit(w1, w2) || p1.intersect(s2).nonEmpty
      // NOT symmetric: my predicate DML over their keyed MERGE stays
      // a conflict (falls through) — a merge replaces whole rows and
      // may INSERT new ones, either of which can change my match set.
      case _ => true
    }

  private[warehouse] def domainOf(spark: SparkSession, root: String,
                                  v: Long): Domain =
    readPointer(spark,
      new Path(new Path(root, versionName(v)), DOMAIN_MARKER)) match {
      case Some("append") => AppendDomain
      case Some(s) if s.startsWith("partitions") =>
        PartitionsDomain(s.split('\n').drop(1).filter(_.nonEmpty).toSet)
      case Some(s) if s.startsWith("keys:") =>
        s.split(':') match {
          case Array(_, cols, hex) => KeysDomain(
            cols.split(',').toSeq,
            hex.grouped(16)
              .map(java.lang.Long.parseUnsignedLong(_, 16)).toArray)
          case _ => TableDomain
        }
      case Some(s) if s.startsWith("dml:") =>
        // split with limit -1: predCols/setCols may be empty strings
        s.split(":", -1) match {
          case Array(_, cols, hex, pred, set) => DmlDomain(
            cols.split(',').toSeq,
            hex.grouped(16)
              .map(java.lang.Long.parseUnsignedLong(_, 16)).toArray,
            pred.split(',').filter(_.nonEmpty).toSet,
            set.split(',').filter(_.nonEmpty).toSet)
          case _ => TableDomain
        }
      case _ => TableDomain
    }

  private def encodeDomain(d: Domain): Option[String] = d match {
    case AppendDomain => Some("append")
    case PartitionsDomain(p) =>
      Some(("partitions" +: p.toSeq.sorted).mkString("\n"))
    case KeysDomain(cols, words) => Some("keys:" + cols.mkString(",") +
      ":" + words.map(w => f"$w%016x").mkString)
    case DmlDomain(cols, words, pred, set) =>
      Some("dml:" + cols.mkString(",") + ":" +
        words.map(w => f"$w%016x").mkString + ":" +
        pred.toSeq.sorted.mkString(",") + ":" +
        set.toSeq.sorted.mkString(","))
    case TableDomain => None
  }

  /** Test seam: runs after each stage pass, before the commit critical
    * section — specs inject a competing commit here to open a
    * deterministic conflict window (a real race's timing, made
    * reproducible). No-op in production. */
  @volatile private[warehouse] var afterStage: () => Unit = () => ()

  private val TXN_DIR = "_txn"

  private def newTxnDir(spark: SparkSession, root: String): Path = {
    val p = new Path(new Path(root, TXN_DIR),
      java.util.UUID.randomUUID.toString)
    fsOf(spark, p).mkdirs(p)
    p
  }

  /** Sweep orphan staging dirs older than `olderThanMillis` (crashed
    * writers). Never touches live staging younger than the cutoff. */
  def cleanupTxns(spark: SparkSession, root: String,
                  olderThanMillis: Long = 3600000L): Int = {
    val dir = new Path(root, TXN_DIR)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) 0
    else {
      val cutoff = System.currentTimeMillis() - olderThanMillis
      val old = fs.listStatus(dir).filter(_.getModificationTime < cutoff)
      old.foreach(st => fs.delete(st.getPath, true))
      old.length
    }
  }

  /** Copy every parquet data file under `from` into `to`, prefixing
    * names to avoid collisions with files staged by this writer. Pure
    * filesystem ops — no Spark job — so a commit critical section
    * carrying forward a delta tier costs O(overlay bytes) copy, never
    * a recompute. */
  private def copyParquetFiles(spark: SparkSession, from: Path, to: Path,
                               prefix: String): Unit = {
    val fs = fsOf(spark, from)
    if (!fs.exists(from)) return
    fs.mkdirs(to)
    fs.listStatus(from).foreach { st =>
      if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          st.getLen > 0)
        FileUtil.copy(fs, st.getPath, fs,
          new Path(to, prefix + st.getPath.getName), false,
          spark.sparkContext.hadoopConfiguration)
    }
  }

  private def moveParquetFiles(spark: SparkSession, from: Path, to: Path,
                               prefix: String): Unit = {
    val fs = fsOf(spark, from)
    if (!fs.exists(from)) return
    fs.mkdirs(to)
    fs.listStatus(from).foreach { st =>
      if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          st.getLen > 0)
        fs.rename(st.getPath, new Path(to, prefix + st.getPath.getName))
    }
  }

  /** Align `rows` to the base schema of version `v` and enforce the
    * table's CHECK contract — the stage-side half of every write's
    * validation, shared with the single-writer ops' semantics. */
  private def alignAndValidate(spark: SparkSession, root: String, v: Long,
                               rows: DataFrame, op: String): DataFrame = {
    val base = baseNameOf(spark, root, v)
    val baseDir = new Path(root, base)
    val baseSchema = spark.read.parquet(baseDir.toString).schema
    val baseCols = baseSchema.fieldNames.toSeq
    val gen = VersionedParquet.applyGeneration(spark, root, baseSchema,
      rows, op)
    val extra = gen.columns.filterNot(baseCols.contains)
    if (extra.nonEmpty)
      throw new IOException(s"$op cannot add columns " +
        s"${extra.mkString(",")} to $root; publish a new schema instead")
    val aligned = gen.select(baseCols.map(gen(_)): _*)
    VersionedParquet.enforceConstraints(spark, aligned,
      VersionedParquet.effectiveConstraints(spark, root, base), op,
      s"$root unchanged")
    aligned
  }

  /** First conflicting intervening version in (`readVersion`, `live`],
    * or None when every intervener's domain is disjoint from `mine`. */
  private def firstConflict(spark: SparkSession, root: String,
                            mine: Domain, readVersion: Long,
                            live: Long): Option[Long] =
    (readVersion + 1 to live).find(v =>
      conflicts(mine, domainOf(spark, root, v)))

  /** The table's named-constraint contract, raw. Captured at stage
    * time and re-checked under the commit lock: `ALTER TABLE ADD/DROP
    * CONSTRAINT` mints no version, so it is invisible to
    * [[firstConflict]] — without this check a writer validated against
    * the old contract could commit rows violating a constraint added
    * concurrently. A changed contract forces a re-stage (which
    * re-validates); addConstraint itself holds the writer lock, so the
    * contract cannot move during a commit critical section. */
  private def contractOf(spark: SparkSession, root: String): Option[String] =
    readPointer(spark, new Path(root, VersionedParquet.CONSTRAINTS_EXT))

  // ------------------------------------------------------------------
  // APPEND — stage rows unlocked; commit is pure file metadata.
  // ------------------------------------------------------------------

  /** Optimistic blind APPEND: `rows` are aligned, CHECK-validated, and
    * written to staging with NO table lock; the commit critical
    * section is file copies of the live overlay plus marker writes —
    * no Spark job, O(overlay bytes). Concurrent appends and disjoint
    * partition overwrites all commit exactly once (appends rebase over
    * both); an intervening whole-table commit re-validates and
    * retries. Semantics identical to `VersionedParquet.append`. */
  def append(spark: SparkSession, root: String, rows: DataFrame,
             keepVersions: Int = 2,
             markers: Map[String, String] = Map.empty,
             maxAttempts: Int = 5,
             carryMarkerPrefixes: Seq[String] = Nil): Commit = {
    import org.apache.spark.sql.functions.lit
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    VersionedParquet.requireNoPendingSchemaMapGuard(spark, root)
    var readVersion = currentVersion(spark, root).getOrElse(
      throw new IOException(s"no published version under $root"))
    var attempts = 0
    var lastConflict: Option[Long] = None
    val txn = newTxnDir(spark, root)
    try {
      while (attempts < maxAttempts) {
        attempts += 1
        // STAGE (no lock): align + validate against the read version's
        // base, materialize the rows and their feed entries once
        fs.delete(new Path(txn, "_rows"), true)
        fs.delete(new Path(txn, CDF_DIR), true)
        val aligned = alignAndValidate(spark, root, readVersion, rows,
          "append")
        val stagedContract = contractOf(spark, root)
        aligned.write.parquet(new Path(txn, "_rows").toString)
        spark.read.parquet(new Path(txn, "_rows").toString)
          .withColumn("_change_type", lit("insert"))
          .write.parquet(new Path(txn, CDF_DIR).toString)
        afterStage()
        // COMMIT (lock held for metadata only)
        val committed = withWriterLock(spark, root) {
          val live = currentVersion(spark, root).get
          val clash = firstConflict(spark, root, AppendDomain,
            readVersion, live)
            .orElse(if (contractOf(spark, root) != stagedContract)
              Some(live) else None) // constraint added/dropped → re-validate
          if (clash.isDefined) {
            lastConflict = clash
            readVersion = live
            None // release lock, re-stage, retry
          } else {
            val next = live + 1
            val liveDir = new Path(rootPath, versionName(live))
            val base = baseNameOf(spark, root, live)
            val snapshot = new Path(rootPath, versionName(next))
            fs.delete(snapshot, true)
            // overlay carries forward by file copy, my rows move in
            val dvDst = new Path(snapshot, DV_DIR)
            fs.mkdirs(dvDst)
            if (base != versionName(live))
              copyParquetFiles(spark, new Path(liveDir, DV_DIR), dvDst,
                s"c$live-")
            val deltaDst = new Path(snapshot, DELTA_DIR)
            fs.mkdirs(deltaDst)
            copyParquetFiles(spark, new Path(liveDir, DELTA_DIR),
              deltaDst, s"c$live-")
            moveParquetFiles(spark, new Path(txn, "_rows"), deltaDst,
              "txn-")
            moveParquetFiles(spark, new Path(txn, CDF_DIR),
              new Path(snapshot, CDF_DIR), "txn-")
            readPointer(spark, new Path(liveDir, EXCLUDE_MARKER))
              .foreach(m =>
                installPointer(spark, snapshot, EXCLUDE_MARKER, m))
            // matching live markers carry forward UNDER the commit
            // lock (read-then-commit races would drop a concurrent
            // stream's batch marker); the caller's own markers land
            // after, so a same-named marker overrides its carried copy
            carryMarkerPrefixes.foreach { p =>
              fs.listStatus(liveDir)
                .filter(st => st.isFile &&
                  st.getPath.getName.startsWith(p))
                .foreach(st => readPointer(spark, st.getPath).foreach(c =>
                  installPointer(spark, snapshot, st.getPath.getName, c)))
            }
            (markers + (BASE_MARKER -> base) +
              (DOMAIN_MARKER -> "append")).foreach {
              case (name, content) =>
                installPointer(spark, snapshot, name, content) }
            sealCommit(spark, snapshot)
            swapPointer(spark, rootPath, next)
            vacuumLocked(spark, root, keepVersions, 0L)
            Some(Commit(snapshot.toString, next, attempts))
          }
        }
        committed.foreach { c =>
          autoCompactHook(spark, root, keepVersions) // self-heal outside the critical section
          return c
        }
        // reached only on conflict: yield before re-staging (no sleep
        // after the final attempt — the throw below follows directly)
        if (attempts < maxAttempts) conflictBackoff(attempts)
      }
      throw new CommitConflictException(s"append to $root gave up " +
        s"after $attempts attempts; last conflicting commit: " +
        s"v${lastConflict.getOrElse(-1L)}")
    } finally fs.delete(txn, true)
  }

  // ------------------------------------------------------------------
  // PARTITION OVERWRITE — stage rows unlocked; commit recomputes the
  // carried overlay against the LIVE version (O(changes + overlay)).
  // ------------------------------------------------------------------

  /** Optimistic dynamic partition overwrite: the incoming rows (often
    * the product of an expensive upstream query) AND the full tier
    * assembly are staged with NO table lock against the read version;
    * an uncontended commit is pure directory renames. When intervening
    * commits exist, the commit validates they touched DISJOINT
    * partitions and reassembles the tiers against the live state
    * under the lock — O(changes + overlay), reusing the staged rows
    * (the upstream query never re-executes). Two writers overwriting
    * disjoint partitions both commit exactly once; overlapping
    * writers resolve loser-retries-and-wins. Semantics identical to
    * `VersionedParquet.overwritePartitions`. */
  def overwritePartitions(spark: SparkSession, root: String,
                          df: DataFrame, keepVersions: Int = 2,
                          maxAttempts: Int = 5): Commit = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    VersionedParquet.requireNoPendingSchemaMapGuard(spark, root)
    var readVersion = currentVersion(spark, root).getOrElse(
      throw new IOException(s"no published version under $root"))
    var attempts = 0
    var lastConflict: Option[Long] = None
    val txn = newTxnDir(spark, root)
    try {
      while (attempts < maxAttempts) {
        attempts += 1
        // STAGE (no lock)
        fs.delete(new Path(txn, "_rows"), true)
        val aligned = alignAndValidate(spark, root, readVersion, df,
          "overwritePartitions")
        val stagedContract = contractOf(spark, root)
        val baseDir = new Path(rootPath, baseNameOf(spark, root,
          readVersion))
        val partCols = partitionColsOfDir(spark, baseDir)
        if (partCols.isEmpty)
          throw new IOException(s"$root's base is not Hive-partitioned; " +
            "dynamic partition overwrite needs a partitioned layout")
        aligned.write.parquet(new Path(txn, "_rows").toString)
        val staged = spark.read.parquet(new Path(txn, "_rows").toString)
        // touched partitions: driver-bounded by partition count
        val touched = staged.select(partCols.map(col): _*).distinct()
          .collect().toSeq
        if (touched.isEmpty)
          throw new IOException("overwritePartitions got zero rows: an " +
            "empty overwrite set is ambiguous; use delete() instead")
        val canonical = touched.map(r =>
          partCols.zipWithIndex.map { case (c, i) =>
            s"$c=${r.get(i)}" }.mkString("/")).toSet
        val mine = PartitionsDomain(canonical)
        val touchedPred = touched.map(r =>
          partCols.zipWithIndex.map { case (c, i) =>
            col(c) <=> lit(r.get(i)) }.reduce(_ && _)).reduce(_ || _)
        // tier assembly against a given version, into a given dir —
        // the STAGE phase runs it against readVersion with no lock;
        // the REBASE path re-runs it against the live version inside
        // the critical section (its inputs are the staged rows, so
        // the caller's expensive upstream query never re-executes)
        def assembleTiers(vs: Long, outDir: Path): (String, String) = {
          val vsDir = new Path(rootPath, versionName(vs))
          val vsBase = baseNameOf(spark, root, vs)
          val baseData = spark.read.parquet(
            new Path(rootPath, vsBase).toString)
          val touchedFiles = baseData.filter(touchedPred)
            .withColumn("_f", relFile).select("_f").distinct()
            .collect().map(_.getString(0)).toSet
          val priorExcl = readPointer(spark,
            new Path(vsDir, EXCLUDE_MARKER))
            .map(_.split('\n').filter(_.nonEmpty).toSet)
            .getOrElse(Set.empty[String])
          // all three tiers read only the pre-overwrite (vs) state and
          // the staged rows, and land in disjoint dirs of a
          // not-yet-visible snapshot — submitted concurrently, the
          // assembly pays one job latency instead of three (guide §2.6)
          val current = dataFrameOf(spark, root, vs)
          val dvPrior =
            if (vsBase == versionName(vs)) emptyDv(spark)
            else spark.read.schema("_file STRING, _pos BIGINT")
              .parquet(new Path(vsDir, DV_DIR).toString)
          val newlyExcluded = touchedFiles -- priorExcl
          val priorDelta = new Path(vsDir, DELTA_DIR)
          val carried =
            if (hasParquetData(spark, priorDelta))
              spark.read.parquet(priorDelta.toString)
                .filter(coalesce(touchedPred, lit(false)) === false)
            else staged.limit(0)
          VersionedParquet.inParallel(
            () => current.filter(touchedPred)
              .withColumn("_change_type", lit("delete"))
              .unionByName(staged.withColumn("_change_type",
                lit("insert")))
              .write.mode("overwrite")
              .parquet(new Path(outDir, CDF_DIR).toString),
            () => dvPrior.filter(!col("_file").isin(newlyExcluded.toSeq: _*))
              .write.mode("overwrite")
              .parquet(new Path(outDir, DV_DIR).toString),
            () => carried.unionByName(staged)
              .write.mode("overwrite")
              .parquet(new Path(outDir, DELTA_DIR).toString))
          ((priorExcl ++ touchedFiles).toSeq.sorted.mkString("\n"),
            vsBase)
        }
        // STAGE the tiers against readVersion — no lock held
        Seq(DV_DIR, DELTA_DIR, CDF_DIR).foreach(dd =>
          fs.delete(new Path(txn, dd), true))
        val (stagedExcl, stagedBase) = assembleTiers(readVersion, txn)
        afterStage()
        // COMMIT: renames when still live; in-lock reassembly against
        // the live version when every intervener is disjoint
        val committed = withWriterLock(spark, root) {
          val live = currentVersion(spark, root).get
          val clash =
            (if (live == readVersion) None
             else firstConflict(spark, root, mine, readVersion, live))
            .orElse(if (contractOf(spark, root) != stagedContract)
              Some(live) else None) // constraint added/dropped → re-validate
          if (clash.isDefined) {
            lastConflict = clash
            readVersion = live
            None
          } else {
            val next = live + 1
            val snapshot = new Path(rootPath, versionName(next))
            fs.delete(snapshot, true)
            fs.mkdirs(snapshot)
            val (exclContent, base) =
              if (live == readVersion) {
                Seq(DV_DIR, DELTA_DIR, CDF_DIR).foreach { dd =>
                  fs.rename(new Path(txn, dd), new Path(snapshot, dd)) }
                (stagedExcl, stagedBase)
              } else assembleTiers(live, snapshot)
            installPointer(spark, snapshot, EXCLUDE_MARKER, exclContent)
            installPointer(spark, snapshot, BASE_MARKER, base)
            encodeDomain(mine).foreach(d =>
              installPointer(spark, snapshot, DOMAIN_MARKER, d))
            sealCommit(spark, snapshot)
            swapPointer(spark, rootPath, next)
            vacuumLocked(spark, root, keepVersions, 0L)
            Some(Commit(snapshot.toString, next, attempts))
          }
        }
        committed.foreach { c =>
          autoCompactHook(spark, root, keepVersions) // self-heal outside the critical section
          return c
        }
        // reached only on conflict: yield before re-staging (no sleep
        // after the final attempt — the throw below follows directly)
        if (attempts < maxAttempts) conflictBackoff(attempts)
      }
      throw new CommitConflictException(s"overwritePartitions on $root " +
        s"gave up after $attempts attempts; last conflicting commit: " +
        s"v${lastConflict.getOrElse(-1L)}")
    } finally fs.delete(txn, true)
  }

  // ------------------------------------------------------------------
  // MERGE — full tiers staged unlocked against the read version;
  // commit is pure renames when still live, else re-stage and retry.
  // ------------------------------------------------------------------

  /** Optimistic keyed MERGE (matched ⇒ update, unmatched ⇒ insert,
    * `deleteKeys` ⇒ remove). The expensive half — joining the batch
    * against the live state to build the vector, delta, and feed —
    * runs with NO table lock against the writer's read version; the
    * commit is three directory renames plus markers when that version
    * is still live. The commit declares its touched-key set as a
    * Bloom fingerprint ([[KeysDomain]]): when every intervening
    * commit is a PROVABLY key-disjoint merge, the commit REBASES —
    * the staged base scan, batch rows, and change feed stay exact
    * (merges never touch the base, theirs never touched my keys), so
    * only the cumulative vector/delta carry re-derives from the live
    * version, O(overlay) under the lock, and both merges commit on
    * their first attempt. Any other intervener (overlapping keys, an
    * append that may collide with my key decisions, a whole-table
    * commit) conflicts: the loser re-stages against the new live
    * version and retries — the textbook optimistic transaction.
    * Semantics identical to `VersionedParquet.merge`. */
  def merge(spark: SparkSession, root: String, upserts: DataFrame,
            deleteKeys: DataFrame, keyCols: Seq[String],
            keepVersions: Int = 2,
            markers: Map[String, String] = Map.empty,
            maxAttempts: Int = 5): Commit =
    optimisticDml(spark, root, keyCols, keepVersions, markers,
      maxAttempts, "merge", _ => (upserts, deleteKeys),
      KeysDomain(_, _))

  /** The shared stage/commit/rebase loop behind [[merge]],
    * [[updateWhere]] and [[deleteWhere]]. `batchOf(readVersion)`
    * produces the (upserts, deleteKeys) batch AGAINST that version —
    * a constant pair for merge, a predicate evaluation over the live
    * view for searched DML (so a re-stage after a conflict re-matches
    * against the NEW live state, which is what serializability
    * demands). `mkDomain` decorates the touched-key Bloom into the
    * commit's declared domain. */
  private def optimisticDml(spark: SparkSession, root: String,
            keyCols: Seq[String], keepVersions: Int,
            markers: Map[String, String], maxAttempts: Int,
            verb: String,
            batchOf: Long => (DataFrame, DataFrame),
            mkDomain: (Seq[String], Array[Long]) => Domain): Commit = {
    import org.apache.spark.sql.functions.{col, count, lit, when}
    require(keyCols.nonEmpty, s"$verb needs at least one key column")
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    VersionedParquet.requireNoPendingSchemaMapGuard(spark, root)
    var readVersion = currentVersion(spark, root).getOrElse(
      throw new IOException(s"no published version under $root"))
    var attempts = 0
    var lastConflict: Option[Long] = None
    val txn = newTxnDir(spark, root)
    try {
      while (attempts < maxAttempts) {
        attempts += 1
        // STAGE (no lock): the full merge assembly against readVersion
        Seq(DV_DIR, DELTA_DIR, CDF_DIR, "_hits", "_rows", "_keys")
          .foreach(d => fs.delete(new Path(txn, d), true))
        val v = readVersion
        val (upserts, deleteKeys) = batchOf(v)
        val base = baseNameOf(spark, root, v)
        val baseData = spark.read.parquet(
          new Path(rootPath, base).toString)
        // persisted per attempt (released in the finally below): the
        // aligned batch and the touched-key union feed every check,
        // staging write, and the feed assembly — for the searched
        // UPDATE/DELETE verbs each un-persisted evaluation re-ran the
        // full live-view scan the predicate matched against, ~6 times
        // per attempt (r17, guide §1.2; the mergeLocked discipline
        // applied to the optimistic path)
        val aligned = alignAndValidate(spark, root, v, upserts, verb)
          .persist()
        val stagedContract = contractOf(spark, root)
        val upKeys = aligned.select(keyCols.map(col): _*).distinct()
        val delKeys = deleteKeys
          .select(keyCols.map(deleteKeys(_)): _*).distinct()
        val touched = upKeys.union(delKeys).persist()
        var preAndDelP: Option[org.apache.spark.sql.DataFrame] = None
        try {
        // the two nondeterminism gates are independent counts over the
        // persisted batch — one job latency instead of two (guide §2.6)
        VersionedParquet.inParallel(
          () => if (aligned.groupBy(keyCols.map(col): _*)
              .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).limit(1)
              .count() > 0)
            throw new IOException(s"$verb batch has duplicate keys on (" +
              keyCols.mkString(",") + s"); $verb is nondeterministic"),
          () => if (upKeys.join(delKeys, keyCols, "left_semi").limit(1)
              .count() > 0)
            throw new IOException(s"$verb batch upserts AND deletes the " +
              s"same key on (${keyCols.mkString(",")})"))
        val hits = baseData
          .withColumn("_file", relFile)
          .withColumn("_pos", col("_metadata.row_index"))
          .join(touched, keyCols, "left_semi")
          .select("_file", "_pos")
        val verDir = new Path(rootPath, versionName(v))
        // hits, rows, and keys stage separately for the REBASE path
        // (they stay valid over key-disjoint interveners: the base is
        // untouched by merges and my keys by theirs); the combined
        // tiers stage for the rename-only fast path. The three staging
        // writes and the domain-fingerprint collect are independent —
        // submitted concurrently, the stage pays one job latency
        // instead of four (guide §2.6)
        @volatile var keyBits: Array[Long] = null
        VersionedParquet.inParallel(
          // key-set Bloom fingerprint (k = 1): the commit's declared
          // domain, and the disjointness proof for concurrent merges
          () => keyBits = touched.select(
              org.apache.spark.sql.functions.pmod(
                org.apache.spark.sql.functions.xxhash64(
                  keyCols.map(col): _*),
                lit(KEY_BLOOM_BITS.toLong)).as("p"))
            .distinct().collect().map(_.getLong(0)),
          () => hits.write.parquet(new Path(txn, "_hits").toString),
          () => aligned.write.parquet(new Path(txn, "_rows").toString),
          () => touched.write.parquet(new Path(txn, "_keys").toString))
        val keyWords = new Array[Long](KEY_BLOOM_BITS / 64)
        keyBits.foreach(p =>
          keyWords(p.toInt >>> 6) |= 1L << (p.toInt & 63))
        val mine = mkDomain(keyCols, keyWords)
        val prior =
          if (base == versionName(v)) hits.limit(0)
          else spark.read.schema("_file STRING, _pos BIGINT")
            .parquet(new Path(verDir, DV_DIR).toString)
        val priorDelta = new Path(verDir, DELTA_DIR)
        val carried =
          if (hasParquetData(spark, priorDelta))
            spark.read.parquet(priorDelta.toString)
              .join(touched, keyCols, "left_anti")
          else aligned.limit(0)
        val current = dataFrameOf(spark, root, v)
        val taggedKeys = upKeys
          .withColumn("_change_type", lit("update_pre"))
          .unionByName(delKeys.withColumn("_change_type", lit("delete")))
        // persisted: the matched-key set derives FROM the O(changes)
        // pre-image frame (update_pre keys == upserted keys that exist
        // in `current`), so the assembled current view is scanned ONCE
        // per attempt for the feed instead of twice (the r16
        // mergeLocked rewrite applied here; guide §1.2)
        val preAndDel = current.join(taggedKeys, keyCols, "inner")
          .persist()
        preAndDelP = Some(preAndDel)
        val matched = preAndDel
          .filter(col("_change_type") === lit("update_pre"))
          .select(keyCols.map(col): _*).distinct()
          .withColumn("_m", lit(1))
        val postAndIns = aligned.join(matched, keyCols, "left")
          .withColumn("_change_type",
            when(col("_m") === 1, lit("update_post"))
              .otherwise(lit("insert")))
          .drop("_m")
        // the combined tiers are independent writes into the staging
        // dir — one job latency instead of three (guide §2.6); DV
        // reads the already-staged _hits, delta and feed read only
        // persisted frames
        VersionedParquet.inParallel(
          () => prior.union(
              spark.read.parquet(new Path(txn, "_hits").toString))
            .distinct()
            .write.parquet(new Path(txn, DV_DIR).toString),
          () => carried.unionByName(aligned)
            .write.parquet(new Path(txn, DELTA_DIR).toString),
          () => preAndDel.unionByName(postAndIns)
            .write.parquet(new Path(txn, CDF_DIR).toString))
        val excl = readPointer(spark, new Path(verDir, EXCLUDE_MARKER))
        afterStage()
        // COMMIT. Fast path (still live): renames only. Rebase path
        // (every intervener a PROVABLY key-disjoint merge): the base
        // is untouched and my keys are untouched, so the staged base
        // scan (_hits), batch rows, and change feed stay exact — only
        // the cumulative vector/delta carry re-derives from the LIVE
        // version, O(overlay) under the lock, no re-stage. Anything
        // else: re-stage against the new live version.
        val committed = withWriterLock(spark, root) {
          val live = currentVersion(spark, root).get
          val clash =
            (if (live == readVersion) None
             else firstConflict(spark, root, mine, readVersion, live))
            .orElse(if (contractOf(spark, root) != stagedContract)
              Some(live) else None) // constraint added/dropped → re-validate
          if (clash.isDefined) {
            lastConflict = clash
            readVersion = live
            None // re-stage against the new live version
          } else {
            val next = live + 1
            val liveDir = new Path(rootPath, versionName(live))
            val snapshot = new Path(rootPath, versionName(next))
            fs.delete(snapshot, true)
            fs.mkdirs(snapshot)
            if (live == readVersion) {
              Seq(DV_DIR, DELTA_DIR, CDF_DIR).foreach { d =>
                fs.rename(new Path(txn, d), new Path(snapshot, d)) }
              excl.foreach(m =>
                installPointer(spark, snapshot, EXCLUDE_MARKER, m))
            } else {
              // REBASE: vector = live's vector ∪ staged hits (file
              // ops); delta = live's delta ∖ my keys ∪ my rows (one
              // O(overlay) job); feed = staged as-is
              val dvDst = new Path(snapshot, DV_DIR)
              fs.mkdirs(dvDst)
              copyParquetFiles(spark, new Path(liveDir, DV_DIR), dvDst,
                s"c$live-")
              moveParquetFiles(spark, new Path(txn, "_hits"), dvDst,
                "txn-")
              val myRows = spark.read.parquet(
                new Path(txn, "_rows").toString)
              val myKeys = spark.read.parquet(
                new Path(txn, "_keys").toString)
              val liveDelta = new Path(liveDir, DELTA_DIR)
              val carriedLive =
                if (hasParquetData(spark, liveDelta))
                  spark.read.parquet(liveDelta.toString)
                    .join(myKeys, keyCols, "left_anti")
                else myRows.limit(0)
              carriedLive.unionByName(myRows)
                .write.parquet(new Path(snapshot, DELTA_DIR).toString)
              fs.rename(new Path(txn, CDF_DIR),
                new Path(snapshot, CDF_DIR))
              readPointer(spark, new Path(liveDir, EXCLUDE_MARKER))
                .foreach(m =>
                  installPointer(spark, snapshot, EXCLUDE_MARKER, m))
            }
            (markers + (BASE_MARKER -> base)).foreach {
              case (name, content) =>
                installPointer(spark, snapshot, name, content) }
            encodeDomain(mine).foreach(dm =>
              installPointer(spark, snapshot, DOMAIN_MARKER, dm))
            sealCommit(spark, snapshot)
            swapPointer(spark, rootPath, next)
            vacuumLocked(spark, root, keepVersions, 0L)
            Some(Commit(snapshot.toString, next, attempts))
          }
        }
        committed.foreach { c =>
          autoCompactHook(spark, root, keepVersions) // self-heal outside the critical section
          return c
        }
        } finally {
          // per-attempt release (a conflict loops with fresh frames;
          // the `return` above passes through here too): a retry loop
          // must not stack one persisted batch per attempt
          preAndDelP.foreach(_.unpersist(blocking = false))
          touched.unpersist(blocking = false)
          aligned.unpersist(blocking = false)
        }
        // reached only on conflict: yield before re-staging (no sleep
        // after the final attempt — the throw below follows directly)
        if (attempts < maxAttempts) conflictBackoff(attempts)
      }
      throw new CommitConflictException(s"$verb into $root gave up " +
        s"after $attempts attempts; last conflicting commit: " +
        s"v${lastConflict.getOrElse(-1L)}")
    } finally fs.delete(txn, true)
  }

  /** Optimistic keyed upsert — [[merge]] with no delete clause. */
  def upsert(spark: SparkSession, root: String, updates: DataFrame,
             keyCols: Seq[String], keepVersions: Int = 2,
             markers: Map[String, String] = Map.empty,
             maxAttempts: Int = 5): Commit =
    merge(spark, root, updates, updates.limit(0).select(
      keyCols.map(org.apache.spark.sql.functions.col): _*),
      keyCols, keepVersions, markers, maxAttempts)

  /** Columns a predicate Column actually references, resolved against
    * the live view (via the analyzed Filter node). Falls back to ALL
    * columns — which degrades to conservative conflicts, never to a
    * missed one — when no Filter survives analysis (e.g. a constant
    * predicate). */
  private def referencedCols(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column): Set[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val v = currentVersion(spark, root).getOrElse(
      throw new IOException(s"no published version under $root"))
    val live = dataFrameOf(spark, root, v)
    live.filter(predicate).queryExecution.analyzed.collectFirst {
      case f: Filter => f.condition.references.map(_.name).toSet
    }.getOrElse(live.columns.toSet)
  }

  /** Optimistic searched UPDATE: stage the matched rows' post-images
    * with NO table lock, commit through the same conflict/rebase
    * protocol as [[merge]], declared as a [[DmlDomain]] — the
    * touched-key Bloom plus the predicate's read columns and the
    * SET's written columns. Two UPDATEs whose touched keys are
    * provably disjoint and whose SETs stay out of each other's
    * predicates BOTH commit on their first attempt (rebase, no
    * re-stage) — where `VersionedParquet.updateWhere` serializes on
    * the writer lock and a whole-table domain would conflict.
    *
    * `keyCols` must be a unique key of the matched rows (validated
    * per attempt) and may not be SET — the touched-key domain would
    * be unsound if key values moved. On conflict the batch
    * RE-DERIVES against the new live version (predicate semantics,
    * not a stale row list); generated columns recompute through the
    * same alignment path as merge rows. */
  def updateWhere(spark: SparkSession, root: String,
                  predicate: org.apache.spark.sql.Column,
                  sets: Map[String, org.apache.spark.sql.Column],
                  keyCols: Seq[String], keepVersions: Int = 2,
                  markers: Map[String, String] = Map.empty,
                  maxAttempts: Int = 5): Commit = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    require(sets.nonEmpty, "UPDATE needs at least one SET column")
    val keyOverlap = sets.keys
      .filter(s => keyCols.exists(_.equalsIgnoreCase(s)))
    require(keyOverlap.isEmpty, "UPDATE cannot SET key column(s) " +
      s"${keyOverlap.mkString(",")} — the touched-key domain would " +
      "be unsound under moved keys")
    // generated columns: SET refused (the rule owns the value); all
    // generated columns count as WRITTEN for conflict purposes — they
    // recompute whenever their sources change
    val genNames = generationRules(spark, root).map(_._1)
    val setGen = sets.keys
      .filter(k => genNames.exists(_.equalsIgnoreCase(k)))
    if (setGen.nonEmpty)
      throw new IOException("UPDATE cannot SET generated column(s) " +
        s"${setGen.mkString(",")}; the GENERATED ALWAYS AS rule owns " +
        "their value")
    val predCols = referencedCols(spark, root, predicate)
    val setCols = sets.keySet ++ genNames
    val matched = coalesce(predicate, lit(false)) === true
    optimisticDml(spark, root, keyCols, keepVersions, markers,
      maxAttempts, "UPDATE", v => {
        val current = dataFrameOf(spark, root, v)
        val post = sets.foldLeft(current.filter(matched)) {
          case (d, (c, e)) => d.withColumn(c, e)
        }
        (post, post.limit(0).select(keyCols.map(col): _*))
      }, DmlDomain(_, _, predCols, setCols))
  }

  /** Optimistic searched DELETE — [[updateWhere]]'s removal twin:
    * the matched rows' keys stage as the delete set, the domain is a
    * [[DmlDomain]] with EMPTY written columns (a delete changes no
    * values, so it can never move rows into a concurrent predicate's
    * match set — disjoint-key DELETEs compose with disjoint-key
    * UPDATEs and with each other on first attempts). */
  def deleteWhere(spark: SparkSession, root: String,
                  predicate: org.apache.spark.sql.Column,
                  keyCols: Seq[String], keepVersions: Int = 2,
                  markers: Map[String, String] = Map.empty,
                  maxAttempts: Int = 5): Commit = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit}
    val predCols = referencedCols(spark, root, predicate)
    val matched = coalesce(predicate, lit(false)) === true
    optimisticDml(spark, root, keyCols, keepVersions, markers,
      maxAttempts, "DELETE", v => {
        val current = dataFrameOf(spark, root, v)
        val m = current.filter(matched)
        // keyCols must be a unique key of the matched rows: deleting
        // BY KEY a key whose other rows the predicate did not match
        // would remove more than the predicate said
        if (m.groupBy(keyCols.map(col): _*)
            .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
            .limit(1).count() > 0)
          throw new IOException("DELETE matched duplicate keys on (" +
            keyCols.mkString(",") + ") — keyCols must be a unique " +
            "key of the matched rows")
        (m.limit(0), m.select(keyCols.map(col): _*))
      }, DmlDomain(_, _, predCols, Set.empty))
  }
}
