package graft.warehouse

import java.io.IOException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import VersionedParquet._

/** Multi-table atomic transactions over the versioned format.
  *
  * A lakehouse pipeline routinely needs "move rows from A to B" or
  * "land the fact AND its aggregate together" — two single-table
  * commits leave a window where a reader sees the delete but not the
  * insert (or neither table, or both half-updated after a crash).
  * Single-table formats stop at per-table atomicity; this is the
  * coordinated-commit tier on top: write-ahead INTENT + per-table
  * version pointers give all-or-nothing VISIBILITY and crash
  * recovery, the classic presumed-abort two-phase commit shrunk to
  * pointer metadata.
  *
  * Protocol (all under the participants' writer locks, taken in
  * sorted-root order so concurrent transactions never deadlock; the
  * locks are reentrant, so each op's own lock acquisition nests):
  *
  *   1. record every participant's PRE-transaction live version in an
  *      `_TXN_INTENT` marker installed in EVERY participant root
  *      (each copy names all participants — any single survivor can
  *      recover the whole transaction);
  *   2. run the staged ops — each is an ordinary versioned commit
  *      (append/upsert/delete/publish…), individually atomic;
  *   3. clear the intents — the transaction is now durable.
  *
  * A failure or crash anywhere inside step 2 leaves intents behind;
  * [[recover]] applies presumed-abort: if EVERY participant advanced
  * past its pre-version the transaction had finished (the crash hit
  * the window between step 2 and 3) and the intents simply clear;
  * otherwise every advanced participant ROLLS BACK — pointer restored
  * to the pre-version, orphaned snapshot directories removed — so the
  * group lands all-or-nothing. [[commit]] runs recovery first, so an
  * abandoned transaction never blocks the next one.
  *
  * Readers get cross-table snapshot isolation from [[readAll]]: while
  * an intent is visible (a transaction mid-commit, or crashed and not
  * yet recovered), every participant resolves to its PRE-transaction
  * version — a reader never observes table A's delete without table
  * B's insert, no matter how the commit interleaves.
  *
  * Contract: ops are DML (they mint versions); DDL (constraint /
  * schema markers live outside the version namespace) belongs outside
  * transactions. Scale shape: the transaction adds O(participants)
  * pointer writes around the ops the caller was going to run anyway —
  * data-write cost is unchanged, and the lock window is the ops' own.
  */
object Txn {

  /** One staged operation: the table root it commits to and the
    * action (an ordinary versioned-format write against that root). */
  final case class TxnOp(root: String, run: () => Unit)

  private[warehouse] val INTENT = "_TXN_INTENT"

  /** Raised when recovery rolled a torn transaction back (informative
    * wrapper over the underlying failure where one exists). */
  final class TxnAbortedException(msg: String, cause: Throwable)
    extends IOException(msg, cause)

  private def intentPath(root: String) = new Path(root, INTENT)

  private def readIntent(spark: SparkSession,
                         root: String): Option[Seq[(String, Long)]] =
    readPointer(spark, intentPath(root)).map(_.split('\n')
      .filter(_.nonEmpty).toSeq.map { l =>
        val i = l.lastIndexOf('\t')
        (l.substring(0, i), l.substring(i + 1).toLong)
      })

  private def clearIntent(spark: SparkSession, root: String): Unit = {
    val p = intentPath(root)
    fsOf(spark, p).delete(p, false); ()
  }

  /** Restore `root` to `pre`: pointer back, orphan version
    * directories (version > pre) removed. A reader pinned to a
    * revoked version may fail mid-scan — the same contract as vacuum
    * passing the retention window, and only reachable through a
    * torn-transaction recovery. */
  private def rollbackOne(spark: SparkSession, root: String,
                          pre: Long): Unit = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    if (!fs.exists(rootPath)) return
    val orphans = fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d{8}"))
      .filter(_.getPath.getName.drop(1).toLong > pre)
    if (pre >= 0L) installPointer(spark, rootPath, POINTER, versionName(pre))
    else fs.delete(new Path(rootPath, POINTER), false)
    orphans.foreach(st => fs.delete(st.getPath, true))
  }

  private def lockedAll[T](spark: SparkSession, roots: Seq[String])
                          (body: => T): T =
    roots.toList match {
      case Nil => body
      case h :: t => withWriterLock(spark, h)(lockedAll(spark, t)(body))
    }

  /** Apply presumed-abort recovery to any intent visible on `roots`:
    * a transaction whose every participant advanced is finished
    * (clear intents); anything else rolls all participants back.
    * Idempotent; a no-op when no intent exists. */
  def recover(spark: SparkSession, roots: Seq[String]): Unit =
    lockedAll(spark, roots.distinct.sorted)(recoverLocked(spark, roots))

  private def recoverLocked(spark: SparkSession,
                            roots: Seq[String]): Unit = {
    val intents = roots.distinct.flatMap(r => readIntent(spark, r))
    intents.distinct.foreach { participants =>
      // an intent read off OUR roots may name participants we hold no
      // lock on yet — take theirs too before touching their pointers
      // (reentrant, so already-held locks nest; a cross-ordering
      // deadlock degrades to the lock-acquire timeout, never a hang)
      val others = participants.map(_._1)
        .filterNot(roots.contains).distinct.sorted
      lockedAll(spark, others) {
        val done = participants.forall { case (r, pre) =>
          currentVersion(spark, r).getOrElse(-1L) > pre }
        if (!done)
          participants.foreach { case (r, pre) =>
            rollbackOne(spark, r, pre) }
        participants.foreach { case (r, _) => clearIntent(spark, r) }
      }
    }
  }

  /** Commit `ops` atomically across their tables: either every op's
    * version lands, or (failure anywhere) every table rolls back to
    * its pre-transaction version. */
  def commit(spark: SparkSession, ops: Seq[TxnOp]): Unit = {
    require(ops.nonEmpty, "empty transaction")
    val roots = ops.map(_.root).distinct
    lockedAll(spark, roots.sorted) {
      // an abandoned predecessor must never block or corrupt this one
      recoverLocked(spark, roots)
      val pres = roots.sorted.map(r =>
        r -> currentVersion(spark, r).getOrElse(-1L))
      val content = pres.map { case (r, v) => s"$r\t$v" }.mkString("\n")
      roots.foreach(r =>
        installPointer(spark, new Path(r), INTENT, content))
      try ops.foreach(_.run())
      catch {
        case e: Throwable =>
          pres.foreach { case (r, pre) => rollbackOne(spark, r, pre) }
          roots.foreach(r => clearIntent(spark, r))
          throw new TxnAbortedException(
            s"transaction rolled back (${roots.mkString(", ")}): " +
              e.getMessage, e)
      }
      roots.foreach(r => clearIntent(spark, r))
    }
  }

  /** Cross-table snapshot reads: every root resolves to a state no
    * in-flight (or torn) transaction has partially published — the
    * pre-transaction version while an intent is visible, the live
    * version otherwise. */
  def readAll(spark: SparkSession,
              roots: Seq[String]): Map[String, DataFrame] = {
    val pinned: Map[String, Long] =
      roots.flatMap(r => readIntent(spark, r)).flatten.toMap
    roots.map { r =>
      pinned.get(r) match {
        case Some(pre) if pre >= 0L =>
          r -> VersionedParquet.read(spark, r, Some(pre))
        case Some(_) =>
          throw new IOException(s"$r was created by an in-flight " +
            "transaction and has no committed pre-version to read")
        case None => r -> VersionedParquet.read(spark, r)
      }
    }.toMap
  }
}
