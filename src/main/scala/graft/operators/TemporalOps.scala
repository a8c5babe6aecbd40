package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{QueryDef, Tables}

/** Temporal joins over the `events` table — the two join shapes Spark
  * lacks as built-ins and a 100 TB event pipeline needs constantly:
  *
  *  - AS-OF join (q48): for each purchase, the most recent click by the
  *    same user at-or-before the purchase. Implemented the scalable way:
  *    UNION both sides, ONE shuffle on the join key, one ordered window
  *    pass carrying the last click forward. No join blowup, no
  *    per-row subquery — cost is sort-within-partition, O(n log n),
  *    and the shape streams (it is exactly how a stateful streaming
  *    as-of join holds its state).
  *  - Banded RANGE join (q49 family, here q56): events within a fixed
  *    interval after each signup. A naive theta-join (ts BETWEEN a AND b)
  *    forces BroadcastNestedLoopJoin at scale; banding floor-buckets
  *    both sides by the interval width so candidates come from an
  *    EQUI-join on (key, bucket) — each probe row checks exactly two
  *    buckets, the exact predicate then filters within candidates.
  *    Linear in input + true-match mass, shuffle on (user, bucket).
  */
object TemporalOps {

  /** Banded interval-overlap join (q113's kernel): `a` carries
    * (signup_id, user_id, a0, a1), `b` (b_id, user_id, b0, b1), both
    * half-open [lo, hi) in exact integer micros. Each side explodes to
    * every W-wide band it touches; true overlaps collide in at least
    * one shared band; countDistinct collapses multi-band duplicates;
    * the exact predicate verifies. Returns (signup_id, n_overlap) with
    * zero-overlap rows retained. Factored out so Round7OpsSpec can run
    * it against a brute-force oracle on adversarial boundary-aligned
    * intervals. */
  private[graft] def overlapJoinBanded(a: org.apache.spark.sql.DataFrame,
                                       b: org.apache.spark.sql.DataFrame,
                                       w: Long): org.apache.spark.sql.DataFrame = {
    // Exact integer FLOOR division (Spark's `div` truncates toward
    // zero, which for negative bounds shifts the band DOWN a slot and
    // silently misses overlaps; `floor(x / w)` on doubles would lose
    // exactness past 2^53). floor = trunc − 1 when the remainder is
    // negative (w > 0), so the banding invariant holds on all inputs.
    def floorDiv(c: org.apache.spark.sql.Column) =
      call_function("div", c, lit(w)) -
        when(c % w < 0, lit(1L)).otherwise(lit(0L))
    def banded(df: org.apache.spark.sql.DataFrame, lo: String, hi: String) =
      df.withColumn("band", explode(sequence(
        floorDiv(col(lo)), floorDiv(col(hi)))))
    val hits = banded(a, "a0", "a1").join(banded(b, "b0", "b1"),
        Seq("user_id", "band"))
      .filter(col("a0") < col("b1") && col("b0") < col("a1"))
      .groupBy("signup_id")
      .agg(countDistinct("b_id").as("n_overlap"))
    a.select("signup_id").join(hits, Seq("signup_id"), "left")
      .select(col("signup_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .orderBy("signup_id")
  }

  /** 5-minute band width in microseconds (events carry micros). */
  private val BAND_US = 300000000L

  val queries: Seq[QueryDef] = Seq(

    // ── AS-OF join: last click at-or-before each purchase, per user ───────
    QueryDef("q48_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        // Tag both sides and union: clicks sort BEFORE purchases at the
        // same timestamp (is_click DESC) so an exactly-simultaneous click
        // still counts as "at or before"; among equal-ts clicks the
        // largest event_id wins (event_id ASC + last()).
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(1).as("is_click"),
            col("event_id"), col("value"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(0).as("is_click"),
            col("event_id"), col("value"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("is_click").desc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val lastClick = last(
          when(col("is_click") === 1,
            struct(col("ts").as("click_ts"), col("event_id").as("click_id"),
              col("value").as("click_value"))),
          ignoreNulls = true).over(w)
        clicks.unionByName(purchases)
          .withColumn("lc", lastClick)
          .filter(col("is_click") === 0)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"),
            col("lc.click_id").as("click_id"),
            col("lc.click_ts").as("click_ts"),
            col("lc.click_value").as("click_value"),
            round((unix_micros(col("ts")) - unix_micros(col("lc.click_ts")))
              / lit(1000000.0), 6).as("secs_since_click"))
          .orderBy("purchase_id")
      },
      // Oracle states the same semantics the declarative (quadratic) way:
      // all prior clicks per purchase, keep rank 1 by (ts, id) DESC.
      Some("""WITH c AS (SELECT user_id, ts AS click_ts, event_id AS click_id,
             |                  value AS click_value
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
             |      FROM events WHERE event_type = 'purchase'),
             |j AS (SELECT p.purchase_id, p.user_id, p.purchase_ts,
             |             c.click_id, c.click_ts, c.click_value,
             |             row_number() OVER (PARTITION BY p.purchase_id
             |               ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
             |      FROM p LEFT JOIN c ON c.user_id = p.user_id
             |                        AND c.click_ts <= p.purchase_ts)
             |SELECT purchase_id, user_id, purchase_ts, click_id, click_ts,
             |       click_value,
             |       round(date_diff('microsecond', click_ts, purchase_ts)
             |             / 1000000.0, 6) AS secs_since_click
             |FROM j WHERE rn = 1
             |ORDER BY purchase_id""".stripMargin)),

    // ── Banded range join: events within 5 min after each signup ──────────
    QueryDef("q56_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id"),
            col("ts").as("s_ts"))
        // Window (s_ts, s_ts + 5min] spans at most two 5-min-wide bands:
        // probe side explodes to both, build side lands in exactly one —
        // every true match collides in an equi-join, nothing is counted
        // twice (bands partition the build side).
        val probe = signups
          .withColumn("b0",
            call_function("div", unix_micros(col("s_ts")), lit(BAND_US)))
          .withColumn("bucket", explode(array(col("b0"), col("b0") + 1)))
          .drop("b0")
        val build = ev
          .select(col("user_id"), col("ts").as("e_ts"),
            col("event_id").as("e_id"))
          .withColumn("bucket",
            call_function("div", unix_micros(col("e_ts")), lit(BAND_US)))
        val hits = probe.join(build, Seq("user_id", "bucket"))
          .filter(col("e_ts") > col("s_ts") &&
            unix_micros(col("e_ts")) <= unix_micros(col("s_ts")) + BAND_US)
          .groupBy("signup_id").agg(count(lit(1)).as("n_follow"))
        signups.join(hits, Seq("signup_id"), "left")
          .select(col("signup_id"), col("user_id"),
            coalesce(col("n_follow"), lit(0L)).as("n_follow"))
          .orderBy("signup_id")
      },
      Some("""WITH s AS (SELECT event_id AS signup_id, user_id, ts AS s_ts
             |           FROM events WHERE event_type = 'signup')
             |SELECT s.signup_id, s.user_id,
             |       CAST(count(e.event_id) AS BIGINT) AS n_follow
             |FROM s LEFT JOIN events e
             |  ON e.user_id = s.user_id AND e.ts > s.s_ts
             | AND date_diff('microsecond', s.s_ts, e.ts) <= 300000000
             |GROUP BY 1, 2
             |ORDER BY signup_id""".stripMargin)),

    // ── Interval-OVERLAP join: interval × interval, banded both sides ────
    // q56 joins points into intervals (build lands in exactly one band);
    // here BOTH sides are intervals — signup activity windows
    // [ts, ts+10m) against purchase attention windows [ts−5m, ts+5m) —
    // so both sides explode to every band they touch, true overlaps
    // collide in at least one shared band (a half-open overlap
    // intersects some band both cover), and the same pair can collide
    // in several: the countDistinct collapses band duplicates. Shape:
    // equi-join on (user, band) + exact overlap verify — linear in
    // input + match mass, never a theta nested loop. Bands are exact
    // integer micros (10-min grid), so banding can't disagree between
    // engines — the oracle skips bands entirely and states the pure
    // overlap predicate.
    QueryDef("q113_interval_overlap",
      (s, d) => {
        val W = 600000000L // 10-min bands, micros
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val a = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id"),
            col("us").as("a0"), (col("us") + W).as("a1"))
        val b = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("b_id"), col("user_id"),
            (col("us") - W / 2).as("b0"), (col("us") + W / 2).as("b1"))
        overlapJoinBanded(a, b, W)
      },
      Some("""WITH a AS (
             |  SELECT event_id AS signup_id, user_id,
             |         epoch_ns(ts) // 1000 AS a0,
             |         epoch_ns(ts) // 1000 + 600000000 AS a1
             |  FROM events WHERE event_type = 'signup'),
             |b AS (
             |  SELECT event_id AS b_id, user_id,
             |         epoch_ns(ts) // 1000 - 300000000 AS b0,
             |         epoch_ns(ts) // 1000 + 300000000 AS b1
             |  FROM events WHERE event_type = 'purchase')
             |SELECT a.signup_id,
             |       CAST(count(b.b_id) AS BIGINT) AS n_overlap
             |FROM a LEFT JOIN b
             |  ON b.user_id = a.user_id AND a.a0 < b.b1 AND b.b0 < a.a1
             |GROUP BY 1
             |ORDER BY signup_id""".stripMargin))
  )
}
