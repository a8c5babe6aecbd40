package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.VersionedParquet

/** Exactly-once and incremental==rebuild for the streaming drift
  * monitor's cell-increment log:
  *
  *  - a drained stream re-run with NO new data commits nothing (the
  *    checkpoint remembers; no empty increment tranches);
  *  - a direct replay of an already-applied batch id is refused by
  *    the batch marker (crash-replay safety);
  *  - after multiple ingest rounds, summed increments equal the
  *    one-shot cell recompute over the full event set — exact frame
  *    equality, the property that makes the q232 χ² identical to a
  *    full rescan.
  */
class DriftStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("cell increments: exactly-once across re-drains and replays; sum == rebuild") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "ts", "event_type")
    val work = Files.createTempDirectory("graft-driftstream")
    val evRoot = work.resolve("events").toString
    val cells = work.resolve("cells").toString
    val ckpt = work.resolve("ckpt").toString

    def drain(): Unit =
      DriftStream.run(
        spark.readStream.format("graft").option("startingVersion", "0")
          .load(evRoot),
        cells, ckpt).awaitTermination()

    VersionedParquet.publish(ev.filter(col("event_id") % 2 === 0),
      evRoot, keepVersions = 10)
    drain()
    val v1 = VersionedParquet.versions(spark, cells).length
    assert(v1 === 1, "first drain commits exactly one increment tranche")

    // re-drain with no new data: the checkpoint yields no batch
    drain()
    assert(VersionedParquet.versions(spark, cells).length === v1,
      "a no-new-data re-run must commit nothing")

    // crash-replay: re-applying an already-applied batch id is refused
    val inc = graft.operators.ProfileOps.eventCells(
      VersionedParquet.read(spark, evRoot))
    assert(!VersionedSink.commitAppend(spark, cells, 0L, inc),
      "the batch marker must refuse an already-applied batch id")
    assert(VersionedParquet.versions(spark, cells).length === v1)

    VersionedParquet.append(spark, evRoot,
      ev.filter(col("event_id") % 2 === 1), keepVersions = 10)
    drain()
    assert(VersionedParquet.versions(spark, cells).length === 2)

    val maintained = DriftStream.cells(spark, cells)
      .collect().map(_.toSeq).toSet
    val rebuild = graft.operators.ProfileOps.eventCells(ev)
      .select("dimension", "cell", "cohort", "o")
      .collect().map(_.toSeq).toSet
    assert(maintained === rebuild,
      "summed increments must equal the one-shot cell recompute")

    // FOLD: compacting N tranches to per-cell sums is readout-identical,
    // shrinks the log to one row per cell, and keeps the replay guard
    val rowsBefore = VersionedParquet.read(spark, cells).count()
    DriftStream.compactLog(spark, cells)
    val folded = VersionedParquet.read(spark, cells)
    assert(folded.count() ===
      folded.select("dimension", "cell", "cohort").distinct().count(),
      "the folded log must hold exactly one row per cell")
    assert(folded.count() < rowsBefore,
      "two tranches share cells, so folding must shrink the log")
    assert(DriftStream.cells(spark, cells)
      .collect().map(_.toSeq).toSet === rebuild,
      "readout must be identical after the fold")
    // the batch marker carried forward: a pre-fold batch id still
    // refuses, so crash replay cannot double-apply across a fold
    assert(!VersionedSink.commitAppend(spark, cells, 1L, inc),
      "the fold must carry the batch marker forward")
    // folding again is a harmless no-op state-wise
    DriftStream.compactLog(spark, cells)
    assert(DriftStream.cells(spark, cells)
      .collect().map(_.toSeq).toSet === rebuild)
  }
}
