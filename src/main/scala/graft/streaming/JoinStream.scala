package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL JOIN — the Structured Streaming primitive the
  * streaming tier lacked: two live streams joined on key + time range,
  * with watermarks bounding the buffered state on both sides.
  *
  * The attribution query every event pipeline runs: each purchase
  * matched to the same user's clicks in the preceding hour. Batch form:
  * q56's banded range join / q48's as-of are the one-shot shapes; this
  * is the continuous one. Spark buffers each side's rows in keyed state
  * and evicts them once the OTHER side's watermark passes the last
  * instant they could still match — the time bounds below are
  * two-sided precisely so that eviction applies to both stores
  * (an unbounded side would grow forever under continuous ingest).
  *
  * The same function runs on batch frames (watermarks are a no-op
  * there), so batch/stream parity is one transform executed two ways —
  * JoinStreamSpec proves the micro-batched streaming run emits exactly
  * the batch join's pairs, each exactly once, across file-at-a-time
  * triggers that split matching clicks and purchases into different
  * micro-batches.
  */
object JoinStream {

  /** Inner interval join: purchases ⋈ clicks of the same user with
    * click_ts ∈ [purchase_ts − 1 hour, purchase_ts]. Inner joins emit
    * eagerly on match (no watermark wait); the watermarks exist to
    * EVICT — click state older than 2 h + 1 h window and purchase
    * state older than 2 h can never match a future row and is dropped.
    * At 1000 executors the state store is partitioned by user_id like
    * any keyed shuffle; skewed users salt exactly as in q85. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame =
    joined(clicks, purchases, "inner")

  /** LEFT OUTER variant: every purchase emits — matched pairs eagerly,
    * UNMATCHED purchases with null click columns only once the click
    * watermark passes purchase_ts (before that, a matching click could
    * still arrive, so emitting the null row early would be wrong; this
    * deferred emission is the subtle half of outer stream-stream join
    * semantics, and JoinStreamSpec pins it: null rows appear exactly
    * for unmatched purchases older than final-watermark, never for the
    * tail the stream hasn't finalized). */
  def clickToPurchaseOuter(clicks: DataFrame, purchases: DataFrame): DataFrame =
    joined(clicks, purchases, "left_outer")

  private def joined(clicks: DataFrame, purchases: DataFrame,
                     how: String): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    p.join(c,
        col("c_user_id") === col("user_id") &&
          col("click_ts") >= col("purchase_ts") - expr("interval 1 hour") &&
          col("click_ts") <= col("purchase_ts"),
        how)
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))
  }
}
