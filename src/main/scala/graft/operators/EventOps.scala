package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{QueryDef, Tables}
import graft.functions.Money.{c2, cents, intDivide}

/** Event-stream operators over the `events` table, in batch-equivalent
  * form: tumbling / sliding / session windows and JSON property
  * extraction. The same transforms run under Structured Streaming
  * (readStream → identical exprs → writeStream) — StreamingSpec proves
  * that with a memory-sink run; these batch forms are the oracle-checked
  * semantics.
  *
  * Session windows use Spark's `session_window` (gap-based merge);
  * the DuckDB oracle reproduces it with the classic gaps-and-islands
  * construction (new session when ts - lag(ts) >= gap — mirroring
  * Spark's half-open [start, last + gap) semantics).
  */
object EventOps {

  val queries: Seq[QueryDef] = Seq(

    // ── Tumbling window aggregate (1 hour) ────────────────────────────────
    QueryDef("q41_tumbling_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             c2(sum(cents(col("value")))).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
             |       event_type, count(*) AS n_events,
             |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100.0
             |         AS sum_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY window_start, event_type""".stripMargin)),

    // ── Sliding window aggregate (1 hour every 30 min) ────────────────────
    QueryDef("q42_sliding_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
             c2(intDivide(sum(cents(col("value"))), count(lit(1)))).as("avg_value"))
        .select(col("w.start").as("window_start"), col("n_events"),
          col("avg_value"))
        .orderBy("window_start"),
      // every event belongs to two 30-min-aligned windows: the one
      // starting at its 30-min bucket and the one 30 min earlier
      Some("""WITH assigned AS (
             |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start,
             |         CAST(round(value*100) AS BIGINT) AS vc
             |  FROM events
             |  UNION ALL
             |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE,
             |         CAST(round(value*100) AS BIGINT)
             |  FROM events)
             |SELECT window_start, count(*) AS n_events,
             |       (CAST(sum(vc) AS BIGINT) // count(*))
             |         / 100.0 AS avg_value
             |FROM assigned
             |GROUP BY 1
             |ORDER BY window_start""".stripMargin)),

    // ── Session window (30-minute inactivity gap) per user ────────────────
    QueryDef("q43_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             c2(sum(cents(col("value")))).as("sum_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start"),
      Some("""WITH flagged AS (
             |  SELECT user_id, ts, value,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
             |              THEN 1 ELSE 0 END AS is_new
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |sessions AS (
             |  SELECT user_id, ts, value,
             |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts)
             |           AS session_id
             |  FROM flagged)
             |SELECT user_id, min(ts) AS session_start,
             |       count(*) AS n_events,
             |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100.0
             |         AS sum_value
             |FROM sessions
             |GROUP BY user_id, session_id
             |ORDER BY user_id, session_start""".stripMargin)),

    // ── JSON property extraction + aggregate ──────────────────────────────
    QueryDef("q44_json_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
             sum("k").as("sum_k"),
             min("k").as("min_k"),
             max("k").as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n_events,
             |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT))
             |            AS BIGINT) AS sum_k,
             |       min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
             |       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ── Funnel analysis: strictly-ordered stage progression per user ──────
    // signup → first click within 6 h of it → first purchase within 6 h
    // of that click (conversion windows differentiate the stages).
    // Three key-local aggregates chained by time predicates: each stage
    // is one shuffle on user_id and the frames shrink monotonically (a
    // user must clear stage n to appear in stage n+1) — the scalable
    // funnel shape, no window over a user's whole event history and no
    // per-stage self-join explosion.
    QueryDef("q61_funnel",
      (s, d) => {
        val winUs = 6L * 3600 * 1000000 // 6-hour conversion window, micros
        val ev = Tables.events(s, d)
        def firstOf(tpe: String) = ev.filter(col("event_type") === tpe)
        def within(a: String, b: String) =
          col(a) > col(b) &&
            unix_micros(col(a)) <= unix_micros(col(b)) + winUs
        val su = firstOf("signup").groupBy("user_id")
          .agg(min("ts").as("s_ts"))
        val cl = firstOf("click").join(su, "user_id")
          .filter(within("ts", "s_ts"))
          .groupBy("user_id").agg(min("ts").as("c_ts"))
        val pu = firstOf("purchase").join(cl, "user_id")
          .filter(within("ts", "c_ts"))
          .groupBy("user_id").agg(min("ts").as("p_ts"))
        val staged = su
          .join(cl.select(col("user_id"), lit(1).as("clicked")), Seq("user_id"), "left")
          .join(pu.select(col("user_id"), lit(1).as("purchased")), Seq("user_id"), "left")
          .select(col("user_id"),
            (lit(1) + coalesce(col("clicked"), lit(0)) +
              coalesce(col("purchased"), lit(0))).as("funnel_stage"))
        staged.groupBy("funnel_stage")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("funnel_stage")
      },
      Some("""WITH su AS (
             |  SELECT user_id, min(ts) AS s_ts FROM events
             |  WHERE event_type = 'signup' GROUP BY user_id),
             |cl AS (
             |  SELECT e.user_id, min(e.ts) AS c_ts
             |  FROM events e JOIN su ON su.user_id = e.user_id
             |  WHERE e.event_type = 'click' AND e.ts > su.s_ts
             |    AND date_diff('microsecond', su.s_ts, e.ts) <= 21600000000
             |  GROUP BY e.user_id),
             |pu AS (
             |  SELECT e.user_id, min(e.ts) AS p_ts
             |  FROM events e JOIN cl ON cl.user_id = e.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > cl.c_ts
             |    AND date_diff('microsecond', cl.c_ts, e.ts) <= 21600000000
             |  GROUP BY e.user_id),
             |staged AS (
             |  SELECT su.user_id,
             |         1 + (CASE WHEN cl.user_id IS NULL THEN 0 ELSE 1 END)
             |           + (CASE WHEN pu.user_id IS NULL THEN 0 ELSE 1 END)
             |           AS funnel_stage
             |  FROM su LEFT JOIN cl ON cl.user_id = su.user_id
             |          LEFT JOIN pu ON pu.user_id = su.user_id)
             |SELECT funnel_stage, count(*) AS n_users
             |FROM staged GROUP BY funnel_stage
             |ORDER BY funnel_stage""".stripMargin)),

    // ── Retention cohorts: users active N days after their first day ──────
    // Cohort = each user's first active day; the triangle counts how
    // many of a cohort's users were active again exactly N days later.
    // Two key-local aggregates + one equi-join back to the activity
    // stream — the cohort frame is user-cardinality (broadcastable at
    // dim scale, shuffle-join beyond), activity stays on its own key.
    QueryDef("q64_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
        val activity = ev
          .select(col("user_id"), col("ts").cast("date").as("day"))
          .distinct()
        val cohorts = activity.groupBy("user_id")
          .agg(min("day").as("cohort_day"))
        activity.join(cohorts, "user_id")
          .select(col("cohort_day"),
            datediff(col("day"), col("cohort_day")).as("day_offset"))
          .filter(col("day_offset").isin(0, 1, 7, 14))
          .groupBy("cohort_day", "day_offset")
          .agg(count(lit(1)).as("n_active"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH activity AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |cohorts AS (
             |  SELECT user_id, min(day) AS cohort_day FROM activity
             |  GROUP BY user_id)
             |SELECT c.cohort_day,
             |       CAST(date_diff('day', c.cohort_day, a.day) AS INT)
             |         AS day_offset,
             |       count(*) AS n_active
             |FROM activity a JOIN cohorts c USING (user_id)
             |WHERE date_diff('day', c.cohort_day, a.day) IN (0, 1, 7, 14)
             |GROUP BY 1, 2
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // ── Gap-fill resample: per-user hourly grid, forward-filled ──────────
    // The time-series regularization a feature pipeline runs before
    // training: each user's latest in-hour observation lands on an
    // hourly tick grid spanning their first..last event hour, and empty
    // hours carry the last observation forward (is_observed marks
    // which). Shapes: in-hour "latest" is a (user, hour) window; the
    // grid is sequence+explode (per-row generation, no shuffle); the
    // fill is ONE last-ignoreNulls running window on the user
    // partitioning — so the whole resample costs one shuffle on
    // user_id. Values ride in exact cents; ordering ties break on
    // epoch MICROS on both engines (Spark's ts is micro-truncated
    // nanos) then event_id, so "latest" is engine-deterministic.
    QueryDef("q104_gap_fill",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            date_trunc("hour", col("ts")).as("tick"),
            unix_micros(col("ts")).as("us"),
            col("event_id"), cents(col("value")).as("vc"))
        // latest-observation-per-hour as a MAX_BY aggregation, not a
        // ROW_NUMBER window: the window shuffled and sorted every raw
        // event; max_by's partial aggregation collapses each map
        // partition to one candidate per (user, tick) before the
        // exchange (r16 optimization, guide §2.3 "aggregate before you
        // shuffle"). Identical row choice: rk=1 under (us DESC,
        // event_id DESC) == max of the (us, event_id) struct, and
        // event_id breaks us-ties deterministically exactly as before.
        val obs = ev.groupBy("user_id", "tick")
          .agg(max_by(col("vc"),
            struct(col("us"), col("event_id"))).as("vc"))
          .select("user_id", "tick", "vc")
        val grid = obs.groupBy("user_id")
          .agg(min("tick").as("h0"), max("tick").as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"),
              expr("interval 1 hour"))).as("tick"))
        val wFill = Window.partitionBy("user_id").orderBy("tick")
          .rowsBetween(Window.unboundedPreceding, 0)
        grid.join(obs, Seq("user_id", "tick"), "left")
          .withColumn("fvc", last("vc", ignoreNulls = true).over(wFill))
          .select(col("user_id"), col("tick"),
            c2(col("fvc")).as("value"),
            col("vc").isNotNull.as("is_observed"))
          .orderBy("user_id", "tick")
      },
      Some("""WITH hourly AS (
             |  SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS tick,
             |         CAST(round(value*100) AS BIGINT) AS vc,
             |         row_number() OVER (
             |           PARTITION BY user_id, time_bucket(INTERVAL 1 HOUR, ts)
             |           ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC)
             |           AS rk
             |  FROM events),
             |obs AS (SELECT user_id, tick, vc FROM hourly WHERE rk = 1),
             |span AS (SELECT user_id, min(tick) AS h0, max(tick) AS h1
             |         FROM obs GROUP BY 1),
             |grid AS (
             |  SELECT user_id,
             |         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS tick
             |  FROM span),
             |joined AS (
             |  SELECT g.user_id, g.tick, o.vc
             |  FROM grid g LEFT JOIN obs o
             |    ON o.user_id = g.user_id AND o.tick = g.tick)
             |SELECT user_id, tick,
             |       last_value(vc IGNORE NULLS) OVER (
             |         PARTITION BY user_id ORDER BY tick
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |         / 100.0 AS value,
             |       vc IS NOT NULL AS is_observed
             |FROM joined
             |ORDER BY user_id, tick""".stripMargin)),

    // ── Trailing RANGE-frame window: activity in the hour before each
    // purchase ────────────────────────────────────────────────────────
    // The value-based window frame the inventory lacked: q14 is a
    // ROWS-based running total and q41/q42 bucket time into fixed
    // windows, but a feature pipeline wants "state of the user over the
    // trailing hour AT each event" — a frame bounded by the ORDER
    // value, not by row counts or grid ticks. One shuffle on user_id;
    // the frame is computed over the user's full event stream, then
    // only purchase rows are kept (the features describe the moment of
    // purchase, but the window sees every event type). Micros ordering
    // keeps frame bounds exact integers; peers at the same timestamp
    // are in-frame on both engines (RANGE semantics), so ties cannot
    // diverge. Sums ride in cents — bigint end-to-end, no float drift.
    QueryDef("q105_trailing_window",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), cents(col("value")).as("vc"))
        val tw = Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(-3600000000L, 0)
        ev.withColumn("roll_n", count(lit(1)).over(tw))
          .withColumn("roll_sum_c", sum("vc").over(tw))
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("roll_n"),
            c2(col("roll_sum_c")).as("roll_value"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH w AS (
             |  SELECT user_id, event_id, event_type,
             |         count(*) OVER tw AS roll_n,
             |         sum(CAST(round(value*100) AS BIGINT)) OVER tw
             |           AS roll_sum_c
             |  FROM events
             |  WINDOW tw AS (
             |    PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000
             |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id, roll_n, roll_sum_c / 100.0
             |         AS roll_value
             |FROM w
             |WHERE event_type = 'purchase'
             |ORDER BY user_id, event_id""".stripMargin)),

    // ── Click attribution: the stream-stream join's batch form, gated ────
    // The SAME transform that runs as a live stream-stream interval join
    // (streaming/JoinStream.clickToPurchase — watermarked, two-sided
    // eviction) executed in batch mode and aggregated per purchase.
    // This closes the chain: JoinStreamSpec proves the micro-batched
    // STREAMING run emits exactly these pairs (exactly once, across
    // batch-splitting triggers), and this gate row proves the BATCH
    // form matches the DuckDB oracle — so the streaming operator's
    // semantics are pinned end-to-end, which no spec-only streaming
    // path gets. Inner join: purchases with no preceding click drop on
    // both engines.
    QueryDef("q115_click_attribution",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.streaming.JoinStream.clickToPurchase(ev, ev)
          .groupBy("purchase_id")
          .agg(count(lit(1)).as("n_clicks_1h"),
            max("click_id").as("max_click_id"))
          .orderBy("purchase_id")
      },
      Some("""WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, event_id AS purchase_id,
             |             ts AS purchase_ts
             |      FROM events WHERE event_type = 'purchase')
             |SELECT p.purchase_id,
             |       count(*) AS n_clicks_1h,
             |       max(c.click_id) AS max_click_id
             |FROM p JOIN c ON c.user_id = p.user_id
             |  AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
             |  AND c.click_ts <= p.purchase_ts
             |GROUP BY 1
             |ORDER BY purchase_id""".stripMargin)),

    // ── Exponentially-decayed activity score (recency feature) ───────────
    // The standard feature-store recency signal: each user's score at
    // their LAST event halves per step back through their history —
    // score = Σ_{j=0..15} (value_cents[t−j] >> (j+1)). Defined as a
    // TRUNCATED per-term floor sum (not the recursive float EWMA),
    // which makes it exact integer arithmetic both engines evaluate
    // identically — the q111 fixed-point discipline applied to decay —
    // AND window-expressible: 16 lag terms over one (user, ts) window,
    // so one shuffle, no per-row recursion, no state. Top-20 most
    // recently-active spenders, ties on user_id.
    QueryDef("q199_decayed_activity",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val wLast = Window.partitionBy("user_id")
          .orderBy(col("us").desc, col("event_id").desc)
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), cents(col("value")).as("vc"))
        val score = (shiftright(col("vc"), 1) +: (1 until 16).map(j =>
          shiftright(lag(col("vc"), j, 0L).over(w), j + 1)))
          .reduce(_ + _)
        ev.withColumn("score", score)
          .withColumn("rn", row_number().over(wLast))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id").as("last_event"),
            col("score"))
          .orderBy(col("score").desc, col("user_id"))
          .limit(20)
      },
      Some(s"""WITH e AS (
             |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
             |         CAST(round(value * 100) AS BIGINT) AS vc
             |  FROM events),
             |l AS (
             |  SELECT user_id, event_id,
             |         (vc >> 1)
             |         + ${(1 until 16).map(j =>
                  s"(coalesce(lag(vc, $j) OVER w, 0) >> ${j + 1})")
                  .mkString("\n             |         + ")} AS score,
             |         row_number() OVER (PARTITION BY user_id
             |           ORDER BY us DESC, event_id DESC) AS rn
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
             |SELECT user_id, event_id AS last_event, score
             |FROM l WHERE rn = 1
             |ORDER BY score DESC, user_id
             |LIMIT 20""".stripMargin)),

    // ── Exact OLS trend per event type (metric regression) ───────────────
    // The metric-trend question every dashboard asks ("is spend per
    // event rising?") answered as a least-squares slope — made
    // cross-engine-exact the q191 way: x = whole minutes since the
    // group's first event (integer floor), y = value cents, and every
    // moment (n, Σx, Σy, Σxy, Σx²) is an EXACT int64 sum (per-term
    // magnitudes bounded: x ≲ 10⁶ minutes, x² ≲ 10¹², Σ over 10⁶ rows
    // stays < 2⁶³) — the slope (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is then a
    // fixed dag of correctly-rounded double ops shared with the
    // oracle. Shape at 100 TB: one min-per-group agg broadcast back,
    // one 5-group moment agg with map-side partials — two passes, no
    // window, no sort. */
    QueryDef("q201_ols_trend",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), unix_micros(col("ts")).as("us"),
            cents(col("value")).as("vc"))
        val mn = ev.groupBy("event_type").agg(min("us").as("mn"))
        val m = ev.join(broadcast(mn), "event_type")
          .withColumn("x", expr("(us - mn) div 60000000"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("vc")).as("sy"),
            sum(col("x") * col("vc")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
        m.select(col("event_type"), col("n"),
            round((col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")),
              6).as("slope_r"),
            round(col("sy").cast("double") / col("n").cast("double"), 2)
              .as("mean_cents"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (
             |  SELECT event_type, epoch_ns(ts) // 1000 AS us,
             |         CAST(round(value * 100) AS BIGINT) AS vc
             |  FROM events),
             |mn AS (SELECT event_type, min(us) AS mn FROM e GROUP BY 1),
             |x AS (SELECT e.event_type, (e.us - mn.mn) // 60000000 AS x,
             |             e.vc
             |      FROM e JOIN mn ON mn.event_type = e.event_type),
             |m AS (
             |  SELECT event_type, count(*) AS n,
             |         CAST(sum(x) AS BIGINT) AS sx,
             |         CAST(sum(vc) AS BIGINT) AS sy,
             |         CAST(sum(x * vc) AS BIGINT) AS sxy,
             |         CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM x GROUP BY 1)
             |SELECT event_type, n,
             |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             |         6) AS slope_r,
             |       round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 2)
             |         AS mean_cents
             |FROM m
             |ORDER BY event_type""".stripMargin)),

    // ── Event-transition matrix (user-journey analysis) ──────────────────
    // The Markov view of the clickstream: per (previous type → type)
    // transition, occurrence count, distinct users, and the
    // row-normalized transition share in integer parts-per-million
    // (million-scaled floor div — no float reaches the output, the
    // q127 discipline). One lag window over each user's timeline (the
    // same (user, ts) shuffle every sessionization op pays), then a
    // 25-cell aggregate; the normalizing window runs over the CELL
    // frame, never the corpus.
    QueryDef("q204_event_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val ev = Tables.events(s, d).select(col("user_id"),
          col("event_id"), unix_micros(col("ts")).as("us"),
          col("event_type"))
        val cells = ev
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("next"))
          .agg(count(lit(1)).as("n"),
            countDistinct("user_id").as("n_users"))
        cells
          .withColumn("share_ppm",
            expr("n * 1000000 div sum(n) over (partition by prev)"))
          .orderBy("prev", "next")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
             |         event_type,
             |         lag(event_type) OVER (PARTITION BY user_id
             |           ORDER BY epoch_ns(ts) // 1000, event_id) AS prev
             |  FROM events),
             |cells AS (
             |  SELECT prev, event_type AS next, count(*) AS n,
             |         count(DISTINCT user_id) AS n_users
             |  FROM e WHERE prev IS NOT NULL
             |  GROUP BY 1, 2)
             |SELECT prev, next, n, n_users,
             |       CAST(n * 1000000 //
             |            sum(n) OVER (PARTITION BY prev) AS BIGINT)
             |         AS share_ppm
             |FROM cells
             |ORDER BY prev, next""".stripMargin)),

    // ── Top user journeys (opening event-type paths) ─────────────────────
    // q204's matrix aggregates one step; this keeps the SEQUENCE: each
    // user's first five event types join into a path string, and the
    // most common openings rank with deterministic ties. The sequence
    // is rebuilt per user via sort_array over (us, event_id, type)
    // structs — a TOTAL order, so the grouped collect is deterministic
    // without a window pre-sort (collect_list order alone is not);
    // one user-keyed shuffle, then a path-cardinality aggregate.
    QueryDef("q205_top_journeys",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"),
          col("event_id"), unix_micros(col("ts")).as("us"),
          col("event_type"))
        ev.groupBy("user_id")
          .agg(array_join(
            transform(
              slice(sort_array(collect_list(struct(col("us"),
                col("event_id"), col("event_type")))), 1, 5),
              x => x.getField("event_type")), ">").as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("n_users"),
            sum("user_id").cast("long").as("sum_users"))
          .orderBy(col("n_users").desc, col("path"))
          .limit(20)
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |         epoch_ns(ts) // 1000 AS us, event_id,
             |         row_number() OVER (PARTITION BY user_id
             |           ORDER BY epoch_ns(ts) // 1000, event_id) AS rn
             |  FROM events),
             |p AS (
             |  SELECT user_id,
             |         string_agg(event_type, '>'
             |           ORDER BY us, event_id) AS path
             |  FROM e WHERE rn <= 5
             |  GROUP BY 1)
             |SELECT path, count(*) AS n_users,
             |       CAST(sum(user_id) AS BIGINT) AS sum_users
             |FROM p
             |GROUP BY 1
             |ORDER BY n_users DESC, path
             |LIMIT 20""".stripMargin)),

    // ── CUSUM drift detection per metric (monitoring staple) ─────────────
    // The sequential change-point statistic no window expresses:
    // cusum_i = max(0, cusum_{i−1} + x_i − k) over each event type's
    // DAILY cents totals, k = the type's integer-mean baseline. All
    // integer arithmetic, so the fold is bit-deterministic; the oracle
    // is DuckDB's genuinely recursive evaluation of the same chain.
    // Execution shape: the daily aggregate is the only corpus-sized
    // work (one (type, day) shuffle); the fold runs as mapGroups over
    // K≈5 groups of ≤days-many rows — inherently sequential per group,
    // group count tiny, which is the one shape where a typed fold
    // beats any relational encoding (the recursive CTE the oracle
    // runs is single-node; this stays distributed up to the fold).
    QueryDef("q206_cusum_drift",
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            cents(col("value")).as("vc"))
          .groupBy("event_type", "day")
          .agg(sum("vc").as("x"))
          .as[(String, Long, Long)]
        daily.groupByKey(_._1)
          .mapGroups { (t, it) =>
            val days = it.toSeq.sortBy(_._2)
            val k = days.map(_._3).sum / days.length // integer baseline
            var cusum = 0L
            var maxC = 0L
            var maxDay = Long.MaxValue
            days.foreach { case (_, day, x) =>
              cusum = math.max(0L, cusum + x - k)
              if (cusum > maxC) { maxC = cusum; maxDay = day }
            }
            (t, days.length.toLong, k, maxC,
              if (maxC == 0L) -1L else maxDay, cusum)
          }
          .toDF("event_type", "n_days", "baseline", "max_cusum",
            "peak_day", "final_cusum")
          .orderBy("event_type")
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT event_type AS t,
             |         (epoch_ns(ts) // 1000) // 86400000000 AS day,
             |         CAST(sum(CAST(round(value * 100) AS BIGINT))
             |           AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |idx AS (
             |  SELECT t, day, x,
             |         row_number() OVER (PARTITION BY t
             |                            ORDER BY day) AS rn
             |  FROM d),
             |k AS (SELECT t, CAST(sum(x) AS BIGINT) // count(*) AS k,
             |             count(*) AS n FROM idx GROUP BY 1),
             |c AS (
             |  SELECT i.t, i.rn, i.day,
             |         greatest(CAST(0 AS BIGINT), i.x - k.k) AS cusum
             |  FROM idx i JOIN k ON k.t = i.t WHERE i.rn = 1
             |  UNION ALL
             |  SELECT i.t, i.rn, i.day,
             |         greatest(CAST(0 AS BIGINT), c.cusum + i.x - k.k)
             |  FROM c
             |  JOIN idx i ON i.t = c.t AND i.rn = c.rn + 1
             |  JOIN k ON k.t = i.t),
             |lastrn AS (SELECT t, max(rn) AS mrn FROM idx GROUP BY 1),
             |m AS (
             |  SELECT c.t, max(c.cusum) AS max_cusum,
             |         max(CASE WHEN c.rn = l.mrn
             |                  THEN c.cusum END) AS final_cusum
             |  FROM c JOIN lastrn l ON l.t = c.t GROUP BY 1),
             |pk AS (
             |  SELECT c.t, min(c.day) AS peak_day
             |  FROM c JOIN m ON m.t = c.t AND c.cusum = m.max_cusum
             |  GROUP BY 1)
             |SELECT k.t AS event_type, k.n AS n_days, k.k AS baseline,
             |       CASE WHEN m.max_cusum = 0 THEN CAST(-1 AS BIGINT)
             |            ELSE pk.peak_day END AS peak_day,
             |       m.max_cusum, m.final_cusum
             |FROM k JOIN m ON m.t = k.t JOIN pk ON pk.t = k.t
             |ORDER BY event_type""".stripMargin)),

    // ── Cohort LTV curves (cumulative value by week offset) ──────────────
    // The revenue twin of q64's retention matrix: users cohort by
    // their FIRST event week, value cents accumulate per (cohort,
    // week-offset), and the curve reports running cumulative cents
    // plus the per-user average (integer division — truncating in
    // both engines, sums nonnegative). Two user-keyed aggs (cohort
    // assignment broadcast back, the same shape q64 pays) and a
    // cumulative window over the cohort×offset CELL frame only.
    QueryDef("q208_cohort_ltv",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk"),
          cents(col("value")).as("vc"))
        val cohorts = ev.groupBy("user_id").agg(min("wk").as("cwk"))
        val sizes = cohorts.groupBy("cwk")
          .agg(countDistinct("user_id").as("cohort_size"))
        val cells = ev.join(broadcast(cohorts), "user_id")
          .groupBy(col("cwk"), (col("wk") - col("cwk")).as("wk_offset"))
          .agg(sum("vc").as("cents"),
            countDistinct("user_id").as("n_active"))
        val cum = Window.partitionBy("cwk").orderBy("wk_offset")
        cells
          .withColumn("cum_cents", sum("cents").over(cum))
          .join(broadcast(sizes), "cwk")
          .withColumn("avg_ltv_cents",
            expr("cum_cents div cohort_size"))
          .select(col("cwk").as("cohort_week"), col("wk_offset"),
            col("n_active"), col("cum_cents").cast("long").as("cum_cents"),
            col("cohort_size"), col("avg_ltv_cents"))
          .orderBy("cohort_week", "wk_offset")
      },
      Some("""WITH e AS (
             |  SELECT user_id,
             |         (epoch_ns(ts) // 1000) // 604800000000 AS wk,
             |         CAST(round(value * 100) AS BIGINT) AS vc
             |  FROM events),
             |cohorts AS (SELECT user_id, min(wk) AS cwk
             |            FROM e GROUP BY 1),
             |sizes AS (SELECT cwk, count(DISTINCT user_id)
             |            AS cohort_size
             |          FROM cohorts GROUP BY 1),
             |cells AS (
             |  SELECT c.cwk, e.wk - c.cwk AS wk_offset,
             |         CAST(sum(e.vc) AS BIGINT) AS cents,
             |         count(DISTINCT e.user_id) AS n_active
             |  FROM e JOIN cohorts c ON c.user_id = e.user_id
             |  GROUP BY 1, 2),
             |cum AS (
             |  SELECT cwk, wk_offset, n_active,
             |         CAST(sum(cents) OVER (PARTITION BY cwk
             |           ORDER BY wk_offset) AS BIGINT) AS cum_cents
             |  FROM cells)
             |SELECT cum.cwk AS cohort_week, wk_offset, n_active,
             |       cum_cents, s.cohort_size,
             |       CAST(cum_cents // s.cohort_size AS BIGINT)
             |         AS avg_ltv_cents
             |FROM cum JOIN sizes s ON s.cwk = cum.cwk
             |ORDER BY cohort_week, wk_offset""".stripMargin)),

    // ── Longest active-day streak per user (gaps and islands) ────────────
    // The engagement metric behind every "7-day streak" badge, by the
    // classic island construction: distinct active days per user,
    // day − row_number() is constant exactly within a run of
    // consecutive days (the island key), islands aggregate to streak
    // lengths, users keep their longest. All integer, one (user)
    // window over the DISTINCT-day frame (≤ days per user, not
    // events), top-20 with deterministic ties.
    QueryDef("q210_active_streaks",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("day")
        val days = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        days
          .withColumn("island", col("day") - row_number().over(w))
          .groupBy("user_id", "island")
          .agg(count(lit(1)).as("len"), min("day").as("streak_start"))
          .groupBy("user_id")
          .agg(max("len").as("longest_streak"),
            count(lit(1)).as("n_streaks"),
            min("streak_start").as("first_day"))
          .orderBy(col("longest_streak").desc, col("user_id"))
          .limit(20)
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id,
             |         (epoch_ns(ts) // 1000) // 86400000000 AS day
             |  FROM events),
             |isl AS (
             |  SELECT user_id, day,
             |         day - row_number() OVER (PARTITION BY user_id
             |                                  ORDER BY day) AS island
             |  FROM days),
             |runs AS (
             |  SELECT user_id, island, count(*) AS len,
             |         min(day) AS streak_start
             |  FROM isl GROUP BY 1, 2)
             |SELECT user_id, max(len) AS longest_streak,
             |       count(*) AS n_streaks,
             |       CAST(min(streak_start) AS BIGINT) AS first_day
             |FROM runs
             |GROUP BY 1
             |ORDER BY longest_streak DESC, user_id
             |LIMIT 20""".stripMargin))
  )
}
