package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Stream-stream interval join parity: the micro-batched streaming run
  * must emit exactly the batch join's (purchase, click) pairs, each
  * exactly once — even when file-at-a-time triggers deliver matching
  * clicks and purchases in different micro-batches, so matches can only
  * come from the watermark-bounded buffered state.
  */
class JoinStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  /** Raw events plus a derived `__us` long column (event time in micros,
    * whatever the physical ts encoding — see Tables.normalizeEventTs) for
    * quantile/range staging. Filters run on `__us`; the write drops it so
    * staged files keep the ORIGINAL physical schema readEvents detects. */
  private def rawWithUs(): org.apache.spark.sql.DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val us = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    raw.withColumn("__us", us)
  }

  /** Stage events as FOUR time-range files (event-time ordered, with
    * increasing modification times so the file source replays them
    * oldest-first) so maxFilesPerTrigger=1 forces four micro-batches per
    * side. Time-ordering matters: a random split would deliver rows
    * older than the advanced watermark, which the engine correctly
    * DROPS as late data — the realistic ingest shape is time-ordered
    * file arrival, and boundary matches (click in file k, purchase in
    * file k+1) still cross micro-batches through buffered state. Files
    * are staged RAW (original physical ts encoding) so their schema is
    * what readEvents detects. */
  private lazy val eventsDir: String = {
    import java.nio.file.Files
    val raw = rawWithUs()
    val Array(b1, b2, b3) =
      raw.stat.approxQuantile("__us", Array(0.25, 0.5, 0.75), 0.0)
    val scratch = Files.createTempDirectory("graft-join-stage")
    val watched = Files.createTempDirectory("graft-join-stream")
    val bounds = Seq(
      (Long.MinValue, b1.toLong), (b1.toLong, b2.toLong),
      (b2.toLong, b3.toLong), (b3.toLong, Long.MaxValue))
    val now = System.currentTimeMillis()
    bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
      val tmp = scratch.resolve(s"stage$i").toString
      raw.filter(col("__us") >= lo && col("__us") < hi).drop("__us")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = watched.resolve(s"f$i.parquet")
      Files.move(part.toPath, dest)
      dest.toFile.setLastModified(now + i * 2000L)
    }
    watched.toString
  }

  test("streaming interval join == batch interval join, exactly once") {
    val batchEv = EventStream.batchEvents(spark, eventsDir)
    val expected = JoinStream
      .clickToPurchase(batchEv, batchEv)
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val clicks = EventStream.readEvents(spark, eventsDir,
      maxFilesPerTrigger = Some(1))
    val purchases = EventStream.readEvents(spark, eventsDir,
      maxFilesPerTrigger = Some(1))
    val streamed = EventStream.runToMemoryAppend(spark,
      JoinStream.clickToPurchase(clicks, purchases), "join_stream")
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    assert(expected.nonEmpty, "the batch join must find pairs at sf0.01")
    assert(streamed.length === expected.length,
      "every pair exactly once — no duplicates, no losses")
    assert(streamed.toSet === expected.toSet)
  }

  test("left-outer: unmatched purchases emit nulls only past the watermark") {
    val batchEv = EventStream.batchEvents(spark, eventsDir)
    val outerBatch = JoinStream.clickToPurchaseOuter(batchEv, batchEv)
    val batchPairs = outerBatch.filter(col("click_id").isNotNull)
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchUnmatched = outerBatch.filter(col("click_id").isNull)
      .select(col("purchase_id"), unix_micros(col("purchase_ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxUs = batchEv.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val cutoff = maxUs - 2L * 3600 * 1000000

    val clicks = EventStream.readEvents(spark, eventsDir,
      maxFilesPerTrigger = Some(1))
    val purchases = EventStream.readEvents(spark, eventsDir,
      maxFilesPerTrigger = Some(1))
    val streamed = EventStream.runToMemoryAppend(spark,
      JoinStream.clickToPurchaseOuter(clicks, purchases), "join_outer")
      .select("purchase_id", "click_id").collect()
    val streamedPairs = streamed.filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamedNulls = streamed.filter(_.isNullAt(1))
      .map(_.getLong(0)).toSet

    assert(streamedPairs === batchPairs,
      "matched pairs must equal the batch inner join, exactly once")
    // Null rows bracket the watermark boundary without pinning Spark's
    // internal eviction formula (it offsets the final watermark,
    // max − 2 h, by up to the 1 h join window): nothing from the
    // unfinalized tail may emit, and everything clearly finalized
    // (older than watermark − 1 h) must have.
    val unmatchedUs = batchUnmatched.toMap
    assert(streamedNulls.subsetOf(unmatchedUs.keySet),
      "a null row must correspond to a batch-unmatched purchase")
    val tail = streamedNulls.filter(id => unmatchedUs(id) > cutoff)
    assert(tail.isEmpty,
      s"unfinalized purchases emitted null rows: ${tail.take(5)}")
    val clearlyOld = batchUnmatched
      .filter(_._2 < cutoff - 3600L * 1000000).map(_._1).toSet
    val missing = clearlyOld -- streamedNulls
    assert(missing.isEmpty,
      s"finalized purchases never emitted: ${missing.take(5)}")
    assert(batchUnmatched.nonEmpty && streamedNulls.nonEmpty,
      "the corpus must exercise the outer path")
    assert(streamedNulls.size < batchUnmatched.length,
      "the unfinalized tail (last 2h) must NOT have emitted")
  }

  test("join state survives a restart: cross-run matches land exactly once in the versioned sink") {
    import graft.warehouse.VersionedParquet
    // Two time halves staged into a watched dir ACROSS two separate
    // query runs sharing one checkpoint: clicks from run 1 can only
    // match purchases arriving in run 2 if the join's buffered state is
    // recovered from the checkpoint — and the versioned sink must hold
    // every batch-join pair exactly once afterwards.
    val work = java.nio.file.Files.createTempDirectory("graft-join-restart")
    val watch = java.nio.file.Files.createDirectory(work.resolve("landing"))
    val root = work.resolve("tbl").toString
    val checkpoint = work.resolve("chk").toString
    val raw = rawWithUs()
    // Choose the split INSIDE a real click→purchase window (median such
    // purchase): the click lands before the restart, its purchase
    // after — so a recovered-state match is guaranteed to exist.
    val fullEv = Tables.normalizeEventTs(raw.drop("__us"))
    val strictPairs = JoinStream.clickToPurchase(fullEv, fullEv)
      .filter(unix_micros(col("click_ts")) <
        unix_micros(col("purchase_ts")))
    val pus = strictPairs.select(unix_micros(col("purchase_ts")).as("p"))
      .orderBy("p").collect().map(_.getLong(0))
    assert(pus.nonEmpty, "corpus must contain strict click<purchase pairs")
    val midUs = pus(pus.length / 2)
    def stage(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = work.resolve("s" + name).toString
      df.drop("__us").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, watch.resolve(name))
    }
    def joinedPairs(ev: org.apache.spark.sql.DataFrame) =
      JoinStream.clickToPurchase(ev, ev)
        .select("purchase_id", "click_id")

    stage("f0.parquet", raw.filter(col("__us") < midUs))
    def runOnce(): Unit = {
      val ev = EventStream.readEvents(spark, watch.toString)
      VersionedSink.run(joinedPairs(ev), root, checkpoint,
        (cur, batch) => cur.unionByName(batch)).awaitTermination()
    }
    runOnce()
    val afterFirst = VersionedParquet.read(spark, root).count()

    stage("f1.parquet", raw.filter(col("__us") >= midUs))
    runOnce()

    val landed = VersionedParquet.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batchEv = EventStream.batchEvents(spark, watch.toString)
    val expected = joinedPairs(batchEv)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(landed.length === expected.length, "exactly once, no replays")
    assert(landed.toSet === expected.toSet)
    // the restart was load-bearing: pairs whose click arrived BEFORE
    // the restart and purchase AFTER can only exist if the join's
    // buffered click state was recovered from the checkpoint
    val crossRun = JoinStream.clickToPurchase(batchEv, batchEv)
      .filter(unix_micros(col("click_ts")) < midUs &&
        unix_micros(col("purchase_ts")) >= midUs)
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(crossRun.nonEmpty,
      "the time split must produce cross-run matches (1h window spans it)")
    assert(crossRun.subsetOf(landed.toSet),
      "cross-restart matches prove the recovered join state")
    assert(landed.length > afterFirst)
  }

  test("left-outer restart: deferred nulls emit exactly once, never twice, across recovery") {
    import graft.warehouse.VersionedParquet
    // The inner-join restart proof (above) shows buffered MATCH state
    // recovers; this pins the subtler outer-join contract: a purchase
    // still unfinalized at shutdown (watermark hadn't passed it, so its
    // null row was deferred) must emit that null row EXACTLY once after
    // restart — not twice (state replayed but emission not deduped),
    // not zero times (deferral lost), and never alongside a match (a
    // cross-run click must cancel the null). The run boundary is placed
    // at the median strict-pair purchase, squarely inside a live join
    // window, so run 1 ends with a populated unfinalized tail.
    val work = java.nio.file.Files.createTempDirectory("graft-outer-restart")
    val watch = java.nio.file.Files.createDirectory(work.resolve("landing"))
    val root = work.resolve("tbl").toString
    val checkpoint = work.resolve("chk").toString
    val raw = rawWithUs()
    val fullEv = Tables.normalizeEventTs(raw.drop("__us"))
    val pus = JoinStream.clickToPurchase(fullEv, fullEv)
      .filter(unix_micros(col("click_ts")) < unix_micros(col("purchase_ts")))
      .select(unix_micros(col("purchase_ts")).as("p"))
      .orderBy("p").collect().map(_.getLong(0))
    val midUs = pus(pus.length / 2)
    def stage(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = work.resolve("s" + name).toString
      df.drop("__us").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, watch.resolve(name))
    }
    def runOnce(): Unit = {
      val ev = EventStream.readEvents(spark, watch.toString)
      VersionedSink.run(
        JoinStream.clickToPurchaseOuter(ev, ev)
          .select("purchase_id", "click_id",
            "purchase_ts"),
        root, checkpoint,
        (cur, batch) => cur.unionByName(batch)).awaitTermination()
    }
    stage("f0.parquet", raw.filter(col("__us") < midUs))
    runOnce()
    val nulls1 = VersionedParquet.read(spark, root)
      .filter(col("click_id").isNull)
      .select("purchase_id").collect().map(_.getLong(0)).toSet

    stage("f1.parquet", raw.filter(col("__us") >= midUs))
    runOnce()
    val fin = VersionedParquet.read(spark, root).collect()
    val matched = fin.filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1)))
    val nullRows = fin.filter(_.isNullAt(1))
      .map(r => (r.getLong(0), r.getTimestamp(2).getTime * 1000))

    // 1. matched side: still the exact batch inner join, exactly once
    val batchEv = EventStream.batchEvents(spark, watch.toString)
    val expectPairs = JoinStream.clickToPurchase(batchEv, batchEv)
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(matched.length === expectPairs.length &&
      matched.toSet === expectPairs.toSet,
      "matched pairs exactly once across the restart")

    // 2. exactly-once nulls: no purchase's null row lands twice, and a
    // null never coexists with a match for the same purchase
    assert(nullRows.map(_._1).distinct.length === nullRows.length,
      "a deferred null row must never emit twice across recovery")
    val matchedIds = matched.map(_._1).toSet
    assert(nullRows.forall(n => !matchedIds(n._1)),
      "a cross-run click must cancel the pending null, not join it")

    // 3. nulls are genuine: every one is batch-unmatched, and every
    // clearly-finalized batch-unmatched purchase did emit
    val outerBatch = JoinStream.clickToPurchaseOuter(batchEv, batchEv)
    val unmatched = outerBatch.filter(col("click_id").isNull)
      .select(col("purchase_id"), unix_micros(col("purchase_ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(nullRows.forall(n => unmatched.contains(n._1)),
      "every null row must be batch-unmatched")
    val maxUs = batchEv.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val cutoff = maxUs - 2L * 3600 * 1000000
    val clearlyOld = unmatched.filter(_._2 < cutoff - 3600L * 1000000).keySet
    assert((clearlyOld -- nullRows.map(_._1).toSet).isEmpty,
      "every finalized unmatched purchase must have emitted its null")

    // 4. the restart was load-bearing for deferral: nulls that belong
    // to run-1-era purchases (ts < mid) but were NOT yet emitted when
    // run 1 shut down can only exist via recovered outer-join state
    val deferred = nullRows
      .filter { case (id, us) => us < midUs && !nulls1(id) }
    assert(deferred.nonEmpty,
      "the split must leave unfinalized run-1 purchases whose nulls " +
        "emit only after recovery")
  }

  test("interval bounds are two-sided so both state stores evict") {
    // A click AFTER the purchase or more than an hour before it never
    // matches — the conditions that make watermark eviction legal on
    // both sides are also the join's semantics.
    val ev = Tables.events(spark, sf)
    val pairs = JoinStream.clickToPurchase(ev, ev)
      .select("purchase_ts", "click_ts").collect()
    assert(pairs.forall { r =>
      val p = r.getTimestamp(0).getTime; val c = r.getTimestamp(1).getTime
      c <= p && c >= p - 3600 * 1000L
    })
  }
}
