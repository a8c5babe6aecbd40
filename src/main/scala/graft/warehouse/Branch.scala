package graft.warehouse

import java.io.IOException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish branching over the versioned format — the
  * Iceberg/Nessie WAP pattern (`wap.branch` / Nessie named refs) on
  * graft tables.
  *
  * A branch is a zero-copy fork of the table's live version: writes
  * land on the branch (ordinary versioned commits under the branch
  * root, every tier O(changes)), readers of MAIN never see them, an
  * audit step validates the branch head (the table's own named CHECK
  * constraints plus any ad-hoc expectations), and `fastForward`
  * publishes the branch's entire chain as ONE main commit — a squash,
  * with a net change feed so `changes` stays continuous across the
  * publish. At 100 TB this is the ingestion-quality gate: a bad batch
  * is audited and repaired (or the branch dropped) without main ever
  * serving a wrong row, and the publish moves zero BASE bytes — only
  * the branch's overlay tiers (deletion vector + delta, O(changes))
  * copy, since they reference main's own physical base.
  *
  * Concurrency contract (the WAP invariant): `fastForward` re-checks
  * under main's writer lock that main still sits at the branch's fork
  * version AND that main's table-level contracts (schema extensions,
  * pending maps, named constraints, generation rules — which version
  * no commit, q171/q172) are byte-identical to their fork-time copies.
  * Either drift raises [[Optimistic.CommitConflictException]] — the
  * branch's work stays intact for a re-branch-and-replay, exactly the
  * optimistic loser-retries rule of `Optimistic`.
  *
  * Retention caveat (inherited from [[VersionedParquet.shallowClone]],
  * which `create` builds on): the branch references main's physical
  * base, so main must not vacuum the forked base away while the
  * branch lives. WAP branches are short-lived by design; a long-lived
  * branch should `compact` under its own root to detach.
  */
object Branch {

  import VersionedParquet.{CDF_DIR, CONSTRAINTS_EXT,
    SCHEMA_EXT, SCHEMA_GEN, SCHEMA_MAP, commitStamp, currentVersion,
    dataFrameOf, fsOf, installPointer, readPointer, sealCommit,
    stageLogicalCopy, swapPointer, versionName, withWriterLock}

  /** Fork-version marker inside the branch root. */
  private val FORK = "_FORK"
  /** Fork-time copies of main's table-level contract markers, for
    * drift detection at fast-forward (ALTERs mint no version, so the
    * pointer check alone cannot see them). An absent marker is
    * recorded as absent — presence drift is drift too. Access
    * policies travel and drift-check like the other versionless
    * contracts: a governed table's branch serves governed, and a
    * policy landing on main mid-branch conflicts rather than being
    * silently clobbered by the fork-time copy at publish. */
  private val META_MARKERS =
    Seq(SCHEMA_EXT, SCHEMA_MAP, CONSTRAINTS_EXT, SCHEMA_GEN,
      VersionedParquet.POLICIES_EXT)

  /** Branch roots live INSIDE the main root — `_branch_<name>` does
    * not match the `v\d{8}` version-directory pattern, so main's
    * version resolution, vacuum, and checkpoint walks never see it. */
  def branchRoot(root: String, name: String): String = {
    require(name.matches("[A-Za-z0-9_-]+"), s"bad branch name: $name")
    new Path(root, s"_branch_$name").toString
  }

  def exists(spark: SparkSession, root: String, name: String): Boolean =
    currentVersion(spark, branchRoot(root, name)).isDefined

  /** Fork a branch off main's live version. Zero-copy: the branch's
    * v0 is a merge-on-read snapshot referencing main's physical base
    * by absolute path (shallow-clone mechanics), and main's contract
    * markers travel so branch writes enforce the same CHECK /
    * generation rules. Returns the branch root. */
  def create(spark: SparkSession, root: String, name: String): String = {
    val bRoot = branchRoot(root, name)
    if (exists(spark, root, name))
      throw new IOException(s"branch $name already exists under $root")
    // Take MAIN's writer lock for the fork-point read: the fork
    // version and the fork-time contract copies must be one atomic
    // observation (a concurrent commit/ALTER between the two reads
    // would let fast-forward's drift check validate against a torn
    // snapshot of main).
    withWriterLock(spark, root) {
      val v = currentVersion(spark, root).getOrElse(
        throw new IOException(s"no published version under $root"))
      val bPath = new Path(bRoot)
      val fs = fsOf(spark, bPath)
      fs.delete(bPath, true)
      val snapshot = new Path(bPath, versionName(0L))
      val absBase = fsOf(spark, new Path(root)).makeQualified(
        new Path(root, VersionedParquet.baseNameOf(spark, root, v))).toString
      stageLogicalCopy(spark, root, v, snapshot, absBase)
      META_MARKERS.foreach { m =>
        readPointer(spark, new Path(root, m)).foreach { txt =>
          installPointer(spark, bPath, m, txt)
          installPointer(spark, bPath, s"$FORK$m", txt)
        }
      }
      installPointer(spark, bPath, FORK, versionName(v))
      sealCommit(spark, snapshot)
      swapPointer(spark, bPath, 0L)
      bRoot
    }
  }

  /** The branch's fork version on main. */
  def forkVersion(spark: SparkSession, root: String, name: String): Long =
    readPointer(spark, new Path(branchRoot(root, name), FORK))
      .map(_.drop(1).toLong)
      .getOrElse(throw new IOException(s"no branch $name under $root"))

  /** Read the branch head (ordinary versioned read of the branch
    * root — time travel within the branch works too). */
  def read(spark: SparkSession, root: String, name: String): DataFrame =
    VersionedParquet.read(spark, branchRoot(root, name))

  /** Audit the branch head against ad-hoc expectations
    * (name → boolean SQL predicate over the table's columns): returns
    * the violating rows, each wearing `_violated` = comma-joined names
    * of the expectations it failed — empty frame means the branch is
    * publishable. The table's own named CHECK constraints need no
    * audit call: they travelled at `create` and every branch WRITE
    * already enforced them. */
  def audit(spark: SparkSession, root: String, name: String,
            expectations: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.functions.{array_compact, array_join,
      col, expr, lit, when}
    val head = read(spark, root, name)
    val tags = expectations.map { case (n, pred) =>
      when(!expr(pred), lit(n)) }
    head
      .withColumn("_violated",
        array_join(array_compact(
          org.apache.spark.sql.functions.array(tags: _*)), ","))
      .filter(col("_violated") =!= "")
  }

  /** Publish the branch as main's next version — the WAP "publish".
    *
    * One SQUASHED commit: however many versions the branch accrued,
    * main advances by exactly one, whose tiers are a logical copy of
    * the branch head (zero BASE bytes move when the branch still
    * references main's own physical base — only the O(changes)
    * overlay tiers copy; a branch that compacted/detached
    * materializes honestly).
    * The commit's change feed is the net row diff main→branch, so
    * downstream CDF consumers replay through the publish.
    *
    * Conflict rule: raises [[Optimistic.CommitConflictException]] when
    * main advanced past the fork version, or any table-level contract
    * marker drifted since fork (versionless ALTERs). Branch-side DDL
    * travels: the branch's contract markers are installed onto main as
    * part of the publish. Drops the branch afterwards unless
    * `dropAfter = false`. Returns main's new version. */
  def fastForward(spark: SparkSession, root: String, name: String,
                  withFeed: Boolean = true,
                  dropAfter: Boolean = true): Long = {
    val bRoot = branchRoot(root, name)
    val bPath = new Path(bRoot)
    withWriterLock(spark, root) {
      val v = currentVersion(spark, root).getOrElse(
        throw new IOException(s"no published version under $root"))
      val fork = forkVersion(spark, root, name)
      if (v != fork)
        throw new Optimistic.CommitConflictException(
          s"main $root advanced to v$v past branch $name's fork v$fork; " +
          "re-branch from the live head and replay")
      META_MARKERS.foreach { m =>
        val now = readPointer(spark, new Path(root, m))
        val atFork = readPointer(spark, new Path(bPath, s"$FORK$m"))
        if (now != atFork)
          throw new Optimistic.CommitConflictException(
            s"main $root's $m contract changed since branch $name forked; " +
            "re-branch and replay")
      }
      val bv = currentVersion(spark, bRoot).getOrElse(
        throw new IOException(s"branch $name has no published version"))
      val next = v + 1
      val rootPath = new Path(root)
      val fs = fsOf(spark, rootPath)
      val snapshot = new Path(rootPath, versionName(next))
      fs.delete(snapshot, true)
      // Resolve the branch head's base: when it is (an absolute path
      // to) one of MAIN's physical snapshots — the zero-copy case —
      // stage main-relative so vacuum's reference protection and every
      // reader treat it exactly like a restore's logical copy.
      val bBase = VersionedParquet.baseNameOf(spark, bRoot, bv)
      val mainQualified = fsOf(spark, rootPath)
      val relOnMain = Option(new Path(bBase).getName)
        .filter(_.matches("v\\d{8}"))
        .filter(seg => mainQualified.makeQualified(
          new Path(root, seg)).toString ==
          mainQualified.makeQualified(new Path(bBase)).toString)
      relOnMain match {
        case Some(rel) =>
          stageLogicalCopy(spark, bRoot, bv, snapshot, rel)
        case None =>
          // branch detached (compacted under its own root): the bytes
          // live under the branch dir we are about to drop, so the
          // publish must own them — one honest materializing write.
          dataFrameOf(spark, bRoot, bv).write.mode("overwrite")
            .parquet(snapshot.toString)
      }
      if (withFeed)
        // the feed is the net multiset diff branch-head − main@fork.
        // Main is FROZEN at the branch's fork (checked above), so the
        // net is exactly the branch's own accumulated feeds over
        // (0, bv] — replayed at O(changes) with dir = +1; a feed-less
        // branch commit (physical publish / compaction without the
        // empty marker) falls back to the two-view diff (the old
        // unconditional shape). See writeNetDiffFeed for the
        // telescoping argument.
        VersionedParquet.writeNetDiffFeed(spark,
          dataFrameOf(spark, root, v),
          dataFrameOf(spark, bRoot, bv),
          Some((bRoot, 0L, bv, 1L)),
          new Path(snapshot, CDF_DIR))
      // branch DDL travels: install the branch's live contract markers
      // (drift-checked above, so main's copies are still fork-time).
      // Main's current marker contents are captured FIRST so a failed
      // pointer swap can put them back — without the restore, a swap
      // failure would leave main's contracts already replaced (e.g. a
      // policy dropped on the branch leaving main permanently
      // ungoverned) while the old data is still live. The markers are
      // installed immediately before the swap to keep the
      // new-contracts-over-old-data window as narrow as the versionless
      // marker design allows; a crash inside the window is repaired by
      // the restore below or by re-running the fast-forward.
      val savedMarkers: Seq[(String, Option[String])] =
        META_MARKERS.map(m => m -> readPointer(spark, new Path(root, m)))
      META_MARKERS.foreach { m =>
        readPointer(spark, new Path(bPath, m)) match {
          case Some(txt) => installPointer(spark, rootPath, m, txt)
          case None => fs.delete(new Path(rootPath, m), false); ()
        }
      }
      sealCommit(spark, snapshot)
      try swapPointer(spark, rootPath, next)
      catch {
        case e: IOException =>
          // Undo the contract install so the error's claim is true:
          // data pointer AND contracts both back at pre-publish state.
          savedMarkers.foreach {
            case (m, Some(txt)) => installPointer(spark, rootPath, m, txt)
            case (m, None) => fs.delete(new Path(rootPath, m), false); ()
          }
          throw new IOException(s"could not swap pointer for $root; " +
            s"live table unchanged (contract markers restored), " +
            s"staged publish at $snapshot", e)
      }
      if (dropAfter) drop(spark, root, name)
      next
    }
  }

  /** Abandon the branch: delete its directory outright. Main is
    * untouched (the branch only ever referenced main's bytes, never
    * owned them). */
  def drop(spark: SparkSession, root: String, name: String): Unit = {
    val bPath = new Path(branchRoot(root, name))
    fsOf(spark, bPath).delete(bPath, true)
    ()
  }
}
