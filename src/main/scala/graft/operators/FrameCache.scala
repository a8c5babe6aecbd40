package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lock-guarded, access-ordered LRU of per-(session, dir) frames:
  * concurrent callers can't double-build (and leak a persisted copy),
  * eviction drops the least-recently-USED entry (never one in active
  * rotation) and runs `onEvict` (unpersist for persisted frames). The
  * bound keeps a long-lived session iterating many dirs from pinning
  * one frame per dir forever. For lazily-persisted frames the lock
  * only guards plan construction (microseconds); eagerly-built frames
  * (fixpoints that must run jobs) hold it for the build — acceptable,
  * nothing else contends for that lock during a build.
  *
  * Shared by the dedup family (shingles, signatures, pairs,
  * components — DedupOps) and the graph family (the co-purchase edge
  * list q135/q190 both derive — GraphOps): the write-once /
  * join-forever frames each query family pays for exactly once per
  * (session, dir). */
private[operators] final class FrameCache(onEvict: DataFrame => Unit) {
  private val MAX_CACHED = 4
  private val m =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](8, 0.75f, true)
  def getOrBuild(s: SparkSession, d: String)(build: => DataFrame): DataFrame =
    m.synchronized {
      val cached = m.get((s, d))
      if (cached != null) return cached
      // build BEFORE evicting: a throwing build (bad dir) must not
      // drain healthy cached frames one victim per retry
      val built = build
      if (m.size >= MAX_CACHED) {
        val it = m.entrySet().iterator() // head = least recently used
        onEvict(it.next().getValue)
        it.remove()
      }
      m.put((s, d), built)
      built
    }
}

private[operators] object FrameCache {
  /** A cache whose evictions unpersist the dropped frame. */
  def unpersisting: FrameCache =
    new FrameCache(_.unpersist(blocking = false))
}
