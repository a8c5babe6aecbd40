package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Extension-tier correctness: the non-SQL-expressible scale paths
  * (MinHash+LSH, SimHash, ANN buckets, multimodal decode, streaming) are
  * verified here against their exact / batch counterparts — the oracle
  * role the driver's DuckDB check can't play for them.
  */
class ExtensionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  /** The file stream source watches a directory; stage the events file
    * into one. */
  private lazy val eventsDir: String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft-events-stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("minhash LSH candidates cover every exact-jaccard near-dup pair (recall)") {
    val exact = run("q35_ngram_jaccard")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = run("q36_minhash_lsh")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "exact pair set should not be empty at sf0.01")
    val missed = exact -- cands
    assert(missed.isEmpty, s"LSH missed true near-dup pairs: $missed")
    // candidate set stays a filter, not the whole quadratic pair space
    val nDocs = run("q34_dedup_exact").sparkSession
      .read.parquet(s"$sf/documents.parquet").count()
    assert(cands.size < nDocs * (nDocs - 1) / 4,
      s"LSH candidates (${cands.size}) degenerated toward all-pairs")
  }

  test("simhash banding finds the planted near-dups with small hamming distance") {
    val exact = run("q35_ngram_jaccard")
      .filter(col("jac") >= 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = run("q37_simhash")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact -- sim
    assert(missed.isEmpty, s"simhash missed strong near-dups: $missed")
  }

  test("ANN LSH search: exact rerank, recall vs brute force reported") {
    val topk = run("q38_cosine_topk").collect()
    assert(topk.length === 10)
    val bruteScores = topk.map(_.getAs[Double]("cos_sim"))
    assert(bruteScores.sameElements(bruteScores.sorted.reverse), "top-k sorted desc")
    val brute = topk.map(r => r.getLong(0) -> r.getAs[Double]("cos_sim")).toMap

    val ann = run("q40_ann_lsh").collect()
    assert(ann.nonEmpty && ann.length <= 10)
    val annScores = ann.map(_.getAs[Double]("cos_sim"))
    assert(annScores.sameElements(annScores.sorted.reverse), "ANN top-k sorted desc")
    // the rerank is EXACT cosine: every id ANN shares with brute force
    // must carry the identical score
    ann.foreach { r =>
      brute.get(r.getLong(0)).foreach(c => assert(c === r.getAs[Double]("cos_sim")))
    }
    val recall = ann.map(_.getLong(0)).count(brute.contains) / 10.0
    info(f"ANN recall@10 vs brute force: $recall%.2f (near-uniform corpus; " +
      "see SimilarityOps TABLES/BITS note)")
    assert(recall >= 0.2, "multi-table LSH should recover some true neighbors")
  }

  test("IVF ANN search: exact rerank, recall vs brute force reported") {
    val brute = run("q38_cosine_topk").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("cos_sim")).toMap
    val ivf = run("q47_ann_ivf").collect()
    assert(ivf.nonEmpty && ivf.length <= 10)
    ivf.foreach { r =>
      brute.get(r.getLong(0)).foreach(c => assert(c === r.getAs[Double]("cos_sim")))
    }
    val recall = ivf.map(_.getLong(0)).count(brute.contains) / 10.0
    info(f"IVF recall@10 vs brute force: $recall%.2f (K=16 lists, nprobe=4)")
  }

  test("embedding near-dup pairs agree with brute-force within-label pairs") {
    val nd = run("q46_embedding_neardup").collect()
    assert(nd.nonEmpty, "sf0.01 has same-label pairs above the 0.4 threshold")
    assert(nd.forall(_.getAs[Double]("cos_sim") >= 0.4))
    // symmetric, deduped, ordered pairs
    val pairs = nd.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length === pairs.length)
  }

  test("multimodal feature extraction is deterministic and partition-shaped") {
    val media = MultimodalOps.mediaTable(spark, sf)
    val f1 = MultimodalOps.extractFeatures(spark, media, dims = 16, partitions = 4)
      .collect().sortBy(_.item_id)
    val f2 = MultimodalOps.extractFeatures(spark, media, dims = 16, partitions = 7)
      .collect().sortBy(_.item_id)
    assert(f1.length === 500)
    // same features regardless of partitioning → decode is pure per-row
    assert(f1.zip(f2).forall { case (a, b) =>
      a.checksum == b.checksum && a.features.sameElements(b.features) })
    assert(f1.forall(_.features.length === 16))
    val frames = MultimodalOps.sampleFrames(media).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Int]("frame_idx") % 4 === 0))

    // resize: metadata lands, audio passes through, payload shrinks with
    // the area ratio, and the transform is deterministic
    val origLen = media.select("item_id", "media").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).length).toMap
    val resized = MultimodalOps.resize(spark, media, 160, 90).collect()
    assert(resized.length === 500)
    resized.foreach { r =>
      if (r.kind == "audio") assert(r.sample_rate === 16000)
      else {
        assert(r.width === 160 && r.height === 90)
        assert(r.media.length <= origLen(r.item_id),
          "downscale must not grow the payload")
      }
    }
    val resized2 = MultimodalOps.resize(spark, media, 160, 90).collect()
      .sortBy(_.item_id)
    assert(resized.sortBy(_.item_id).zip(resized2).forall {
      case (a, b) => a.media.sameElements(b.media)
    })
  }

  test("streaming tumbling counts equal the batch answer (stream/batch parity)") {
    val streamed = EventStream.runToMemory(spark,
      EventStream.tumblingCounts(EventStream.readEvents(spark, eventsDir)), "tumbling_mem")
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStream.tumblingCounts(graft.sources.Tables.events(spark, sf))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("flatMapGroupsWithState user stats merge across micro-batches to the batch answer") {
    import java.nio.file.Files
    // stage the events as TWO parquet files; maxFilesPerTrigger=1 forces
    // two stateful micro-batches, so per-key state genuinely merges
    val dir = Files.createTempDirectory("graft-stateful").toString
    val raw = spark.read.parquet(s"$sf/events.parquet")
    raw.filter(col("event_id") % 2 === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/half1")
    raw.filter(col("event_id") % 2 === 1)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/half2")
    val watch = Files.createDirectory(java.nio.file.Paths.get(s"$dir/watch"))
    Seq("half1", "half2").zipWithIndex.foreach { case (h, i) =>
      val part = new java.io.File(s"$dir/$h").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, watch.resolve(s"chunk$i.parquet"))
    }

    val stats = EventStream.userRunningStats(spark,
      EventStream.readEvents(spark, watch.toString, maxFilesPerTrigger = Some(1)))
    val updates = EventStream.runToMemoryUpdate(spark, stats.toDF(), "user_stats_mem")
      .collect()
    // update mode emits one row per user per touching batch — the final
    // state is the max-count row per user
    val finalByUser = updates.groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.maxBy(_.getLong(1)) }
    val expected = graft.sources.Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n"), min(unix_millis(col("ts"))).as("f"),
        max(unix_millis(col("ts"))).as("l"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(finalByUser.size === expected.size)
    finalByUser.foreach { case (u, r) =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === expected(u), s"user $u")
    }
  }

  test("streaming dedup: duplicate files across micro-batches emit each event once") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // the SAME events file staged twice + maxFilesPerTrigger=1 → two
    // micro-batches of full duplicates; keyed state (or the watermark's
    // late-data drop) must suppress every second copy
    val dir = Files.createTempDirectory("graft-dedup-stream")
    Seq("a", "b").foreach(n =>
      Files.copy(Paths.get(s"$sf/events.parquet"),
        dir.resolve(s"$n.parquet"), StandardCopyOption.REPLACE_EXISTING))
    val streamed = EventStream.runToMemoryAppend(spark,
      EventStream.dedupEvents(EventStream.readEvents(spark, dir.toString,
        maxFilesPerTrigger = Some(1))), "dedup_mem")
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(streamed.length === streamed.distinct.length,
      "an event_id was emitted more than once")
    val batch = graft.sources.Tables.events(spark, sf)
      .select("event_id").distinct().count()
    assert(streamed.length.toLong === batch,
      "streaming dedup must cover every distinct event exactly once")
  }

  test("streaming session windows equal the batch answer") {
    val streamed = EventStream.runToMemory(spark,
      EventStream.userSessions(EventStream.readEvents(spark, eventsDir)), "sessions_mem")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = EventStream.userSessions(graft.sources.Tables.events(spark, sf))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }
}
