package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.TextFns.{shingles, tokens}
import graft.functions.Hashing

/** Streaming decontamination — the quarantine-on-ingest twin of the
  * batch passes (q213 one-shot, q222 stored-index): documents ARRIVE
  * continuously, and any doc sharing an n-gram with the benchmark set
  * must never reach the training silver — it lands in a quarantine
  * table instead, annotated with its leak count, both sides
  * exactly-once across restarts.
  *
  * This is the join-shaped quarantine `VersionedSink.runExpectations`
  * cannot express: an expectation is a row-local predicate, but
  * contamination is EXISTS(gram ∈ benchmark) — each micro-batch
  * explodes to its gram hashes and semi-joins the benchmark gram set
  * (a BROADCAST frame: benchmarks are small by nature, however big
  * the stream). Per batch the cost is O(batch grams); the corpus is
  * never rescanned, the benchmark never re-derived.
  *
  * Exactly-once is `VersionedSink.commitAppend`'s batch-marker rule:
  * each side's table records the last applied micro-batch id
  * atomically with the version, so a replayed batch after a crash
  * re-applies to NEITHER side (a doc can never be both served and
  * quarantined, or double-counted in either).
  */
object DeconStream {

  /** Drive `source` (streaming doc rows with `doc_id` and `text`)
    * through the contamination gate: clean docs append to
    * `silverRoot`, contaminated docs — annotated with
    * `_n_leaked_ngrams` — to `quarantineRoot`. `benchGramHashes` is a
    * (h: long) frame of the benchmark's n-gram hashes (gram size
    * `n`), broadcast into every batch. */
  def run(source: DataFrame, silverRoot: String, quarantineRoot: String,
          checkpoint: String, benchGramHashes: DataFrame, n: Int = 3,
          keepVersions: Int = 10): StreamingQuery = {
    val spark = source.sparkSession
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persisted per batch: the batch rows feed the gram explode,
        // the quarantine/silver splits, and each side's commit (which
        // evaluates its rows for the constraint check, delta, and
        // feed) — without the persist every consumer re-read the
        // batch's source files, ~5 scans per micro-batch (r17, guide
        // §1.2; a micro-batch is bounded by construction, so the
        // cached footprint is too)
        val batchP = batch.persist()
        val grams = batchP
          .select(col("doc_id"),
            explode(shingles(tokens(col("text")), n)).as("g"))
          .select(col("doc_id"), Hashing.md5Long60(col("g")).as("h"))
        // persisted per batch: `leaks` (bounded — one row per
        // contaminated doc in THIS batch) feeds the probes and both
        // appends below; without the persist each consumer re-ran the
        // batch's full gram explode + join + aggregate, quadrupling
        // the per-batch cost (r16 optimization, guide §1.2 — this was
        // most of q223's fixture time). Exactly-once semantics and
        // the quarantine-first ordering are untouched: the same rows,
        // computed once.
        val leaks = grams
          .join(broadcast(benchGramHashes.select("h")), Seq("h"))
          .groupBy("doc_id")
          .agg(countDistinct(col("h")).as("_n_leaked_ngrams"))
          .persist()
        try {
          // the quarantine emptiness probe reads the TINY persisted
          // leak set instead of join-probing the batch: every leaks
          // doc_id comes from this batch, so `bad` is non-empty iff
          // `leaks` is (r17 — one cheap count in place of a join job;
          // this count also materializes the persist)
          val nLeaked = leaks.limit(1).count()
          val bad = batchP.join(leaks, Seq("doc_id"))
          val clean = batchP.join(leaks.select("doc_id"), Seq("doc_id"),
            "left_anti")
          // quarantine commits FIRST: a crash between the two appends
          // then re-runs the batch — the quarantine side skips (marker),
          // the silver side applies — and no contaminated doc can ever
          // have reached silver in the window
          if (nLeaked > 0)
            VersionedSink.commitAppend(spark, quarantineRoot, batchId,
              bad, keepVersions)
          if (clean.limit(1).count() > 0)
            VersionedSink.commitAppend(spark, silverRoot, batchId, clean,
              keepVersions)
        } finally {
          leaks.unpersist(blocking = false)
          batchP.unpersist(blocking = false)
          ()
        }
        ()
      }
      .start()
  }
}
