package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic two-writer race harnesses for the correctness gate —
  * the `afterStage` seam (a real race's timing, made reproducible)
  * lives in this package, so the q235 gate drives it through here.
  */
object OccHarness {

  /** The two racing writers' key sets — literal keys (present at
    * every sf), few enough that the 1024-bit k=1 Bloom stays sparse:
    * disjointness is PROVABLE, so the race resolves by rebase. (A
    * 15k-key update saturates the Bloom and conservatively re-stages
    * — correct, just not the property this gate pins.) */
  val KeysA: Seq[Long] = Seq(3L, 13L, 23L, 33L, 43L)
  val KeysB: Seq[Long] = Seq(6L, 16L, 26L, 36L, 46L)

  /** Race two provably-disjoint searched UPDATEs: writer B commits
    * INSIDE writer A's stage-to-commit window (the textbook conflict
    * window), so A's commit finds an intervening version. With the
    * [[Optimistic.DmlDomain]] rebase, BOTH land on attempt 1 — A
    * rebases over B instead of re-staging — and the final version
    * count proves the intervener existed (A staged at v, B minted
    * v+1, A landed v+2 without a retry).
    *
    * Returns (aAttempts, bAttempts, aVersion, bVersion). */
  def raceDisjointUpdates(spark: SparkSession, root: String)
      : (Int, Int, Long, Long) = {
    @volatile var b: Option[Optimistic.Commit] = None
    @volatile var fired = false // B's own stage must not recurse
    val prev = Optimistic.afterStage
    Optimistic.afterStage = () => {
      if (!fired) {
        fired = true
        b = Some(Optimistic.updateWhere(spark, root,
          col("k").isin(KeysB: _*),
          Map("cents" -> (col("cents") + 11L)), Seq("k"),
          keepVersions = 10))
      }
    }
    try {
      val a = Optimistic.updateWhere(spark, root,
        col("k").isin(KeysA: _*),
        Map("cents" -> (col("cents") + 7L)), Seq("k"),
        keepVersions = 10)
      val bc = b.getOrElse(throw new IllegalStateException(
        "the injected writer never fired"))
      (a.attempts, bc.attempts, a.version, bc.version)
    } finally Optimistic.afterStage = prev
  }
}
