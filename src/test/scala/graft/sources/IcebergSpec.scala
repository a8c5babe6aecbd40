package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IcebergLite contract: metadata.json → manifest-list Avro →
  * manifest Avro → parquet files, time travel on snapshot ids, and
  * the refusal matrix (format-version, delete manifests, foreign file
  * formats) — each refusal naming its feature. Fixtures come from
  * IcebergLite's own exporter (no Iceberg runtime exists in this
  * container — see the scaladoc honesty note); the refusal tests
  * hand-mutate the metadata the way a NEWER Iceberg writer would. */
class IcebergSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-iceberg-$tag")
      .toString + "/t"

  private def frame(n: Int, tag: String) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"$tag$i", i * 1.5))
      .toDF("id", "name", "score")
  }

  test("export → read round trip, snapshots append, time travel " +
    "lands on snapshot boundaries") {
    val loc = tmp("roundtrip")
    val s1 = IcebergLite.export(spark, frame(100, "a"), loc)
    val live1 = IcebergLite.read(spark, loc)
    assert(live1.count() === 100L)
    assert(live1.columns.toSeq === Seq("id", "name", "score"))
    val s2 = IcebergLite.export(spark, frame(40, "b"), loc)
    assert(s1 != s2)
    // live = snapshot 2 carries BOTH file sets (full-state snapshots)
    assert(IcebergLite.read(spark, loc).count() === 140L)
    // pinned reads: each snapshot serves exactly its own state
    assert(IcebergLite.read(spark, loc, Some(s1)).count() === 100L)
    assert(IcebergLite.read(spark, loc, Some(s2)).count() === 140L)
    assert(IcebergLite.snapshotIds(spark, loc) === Seq(s1, s2))
    // values, not just counts: the round trip is byte-faithful
    val names = IcebergLite.read(spark, loc, Some(s1))
      .filter(col("id") < 3).orderBy("id")
      .select("name").collect().map(_.getString(0)).toSeq
    assert(names === Seq("a0", "a1", "a2"))
  }

  test("missing snapshot id and absent table refuse with context") {
    val loc = tmp("missing")
    IcebergLite.export(spark, frame(5, "x"), loc)
    val e = intercept[java.io.IOException] {
      IcebergLite.read(spark, loc, Some(999L))
    }
    assert(e.getMessage.contains("999"))
    intercept[java.io.IOException] {
      IcebergLite.read(spark, tmp("never-created"))
    }
  }

  test("format-version above 3 refuses, naming the version (v3 is " +
    "readable since the Puffin DV work — IcebergV3Spec)") {
    val loc = tmp("fv")
    IcebergLite.export(spark, frame(5, "x"), loc)
    val metaP = new Path(loc, "metadata/v1.metadata.json")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val txt = {
      val in = fs.open(metaP)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val out = fs.create(metaP, true)
    try out.write(txt.replace("\"format-version\": 1",
      "\"format-version\": 4").getBytes("UTF-8"))
    finally out.close()
    val e = intercept[java.io.IOException] {
      IcebergLite.read(spark, loc)
    }
    assert(e.getMessage.contains("format-version 4"),
      s"refusal must name the version, got: ${e.getMessage}")
  }

  test("v2 position deletes: delete snapshot applies at scan, prior " +
    "snapshot pins, append-export refuses, overwrite clears") {
    import org.apache.spark.sql.functions.col
    val loc = tmp("posdel")
    val s1 = IcebergLite.export(spark, frame(50, "a"), loc)
    val files = IcebergLite.snapshot(spark, loc).files
    val dels = spark.read.parquet(files: _*)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") % 5 === 0)
      .select("file_path", "pos")
    assert(dels.count() === 10L)
    val s2 = IcebergLite.exportPositionDeletes(spark, dels, loc)
    // live view: deletes applied, EXACTLY the predicate's rows gone
    assert(IcebergLite.read(spark, loc).count() === 40L)
    assert(IcebergLite.read(spark, loc)
      .filter(col("id") % 5 === 0).count() === 0L)
    // snapshot isolation: pre-delete snapshot still serves all rows
    assert(IcebergLite.read(spark, loc, Some(s1)).count() === 50L)
    assert(IcebergLite.read(spark, loc, Some(s2)).count() === 40L)
    // append-export over live deletes refuses loudly (carried files
    // would resurrect the deleted rows)
    val e = intercept[Exception] {
      IcebergLite.export(spark, frame(5, "b"), loc)
    }
    assert(e.getMessage.contains("row-level deletes"))
    // overwrite export REPLACES the state: deletes moot, new rows only
    IcebergLite.export(spark, frame(7, "c"), loc, overwrite = true)
    assert(IcebergLite.read(spark, loc).count() === 7L)
    // hint-less resolution still lands on the newest (v3) metadata
    val hint = new Path(loc, "metadata/version-hint.text")
    hint.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(hint, false)
    assert(IcebergLite.read(spark, loc).count() === 7L)
  }

  test("v2 equality deletes: matching rows in OLDER files mask, " +
    "post-delete appends survive, pinned snapshots isolate") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val loc = tmp("eqdel2")
    val s1 = IcebergLite.export(spark, frame(30, "a"), loc) // ids 0..29
    val s2 = IcebergLite.exportEqualityDeletes(spark,
      Seq(0L, 5L, 10L).toDF("id"), loc)
    assert(IcebergLite.read(spark, loc).count() === 27L)
    assert(IcebergLite.read(spark, loc)
      .filter(col("id").isin(0L, 5L, 10L)).count() === 0L)
    // snapshot isolation: the pre-delete snapshot serves every row
    assert(IcebergLite.read(spark, loc, Some(s1)).count() === 30L)
    assert(IcebergLite.read(spark, loc, Some(s2)).count() === 27L)
    // the upsert pattern: a row re-inserted AFTER the delete has a
    // NEWER sequence, so the delete does not touch it
    IcebergLite.appendManifest(spark,
      Seq((5L, "new5", 9.9)).toDF("id", "name", "score"), loc)
    assert(IcebergLite.read(spark, loc).count() === 28L)
    val row5 = IcebergLite.read(spark, loc)
      .filter(col("id") === 5L).collect()
    assert(row5.length === 1 && row5.head.getAs[String]("name") === "new5")
    // the full-state append-export still refuses over live deletes
    // (it would re-manifest old files as new, resurrecting rows)
    val e = intercept[Exception] {
      IcebergLite.export(spark, frame(3, "x"), loc)
    }
    assert(e.getMessage.contains("row-level deletes"))
  }

  test("a malformed equality-delete file (no equality_ids) refuses") {
    import org.apache.spark.sql.functions.col
    val loc = tmp("eqdel")
    IcebergLite.export(spark, frame(20, "a"), loc)
    val files = IcebergLite.snapshot(spark, loc).files
    val dels = spark.read.parquet(files: _*)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("pos"))
      .limit(3)
    IcebergLite.exportPositionDeletes(spark, dels, loc)
    // flip the delete file's content field 1 → 2 (equality deletes)
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader,
      GenericDatumWriter, GenericRecord}
    import scala.jdk.CollectionConverters._
    val manP = new java.io.File(s"$loc/metadata/manifest-del-2.avro")
    assert(manP.exists())
    val r = new DataFileReader[GenericRecord](manP,
      new GenericDatumReader[GenericRecord]())
    val (schema, recs) =
      try (r.getSchema, r.iterator().asScala.toVector)
      finally r.close()
    recs.foreach(_.get("data_file").asInstanceOf[GenericRecord]
      .put("content", 2))
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, manP)
    try recs.foreach(w.append) finally w.close()
    new java.io.File(manP.getParent,
      s".${manP.getName}.crc").delete()
    val e = intercept[java.io.IOException] {
      IcebergLite.read(spark, loc)
    }
    assert(e.getMessage.contains("equality_ids"),
      s"refusal must name the missing field, got: ${e.getMessage}")
  }

  test("a malformed v2 delete manifest refuses rather than " +
    "resurrecting rows") {
    val loc = tmp("deletes")
    IcebergLite.export(spark, frame(5, "x"), loc)
    // flip the manifest_file content field to 1 (deletes) the way a
    // v2 writer with row-level deletes would
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader,
      GenericDatumWriter, GenericRecord}
    import scala.jdk.CollectionConverters._
    val listP = new java.io.File(
      s"$loc/metadata/snap-1-manifest-list.avro")
    val r = new DataFileReader[GenericRecord](listP,
      new GenericDatumReader[GenericRecord]())
    val (schema, recs) =
      try (r.getSchema, r.iterator().asScala.toVector)
      finally r.close()
    recs.foreach(_.put("content", 1))
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, listP)
    try recs.foreach(w.append) finally w.close()
    // the direct rewrite bypassed Hadoop's ChecksumFileSystem — drop
    // the stale .crc sidecar so the reader sees the mutation, not a
    // checksum mismatch
    new java.io.File(listP.getParent,
      s".${listP.getName}.crc").delete()
    val e = intercept[java.io.IOException] {
      IcebergLite.read(spark, loc)
    }
    assert(e.getMessage.contains("DELETE manifest"),
      s"refusal must name the feature, got: ${e.getMessage}")
  }

  test("no version hint: the NUMERICALLY-latest metadata file " +
    "resolves (v10 beats v9 despite lexical order)") {
    val loc = tmp("nohint")
    IcebergLite.export(spark, frame(7, "x"), loc)
    IcebergLite.export(spark, frame(3, "y"), loc)
    val fs = new Path(loc).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // Simulate a table past 10 versions: v9 carries STALE (v1) state,
    // v10 the live (v2) state. Lexical sort picks "v9.metadata.json"
    // (> "v10..."), silently serving 7 rows; numeric resolution must
    // pick v10 and serve all 10.
    val meta = new Path(loc, "metadata")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new Path(meta, "v1.metadata.json"), fs,
      new Path(meta, "v9.metadata.json"), false,
      spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new Path(meta, "v2.metadata.json"), fs,
      new Path(meta, "v10.metadata.json"), false,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(meta, "version-hint.text"), false)
    assert(IcebergLite.read(spark, loc).count() === 10L)
  }

  test("iceberg schema json round-trips the primitive types") {
    import org.apache.spark.sql.types._
    val s = IcebergLite.schemaFromIceberg(
      """{"type": "struct", "fields": [
        |  {"id": 1, "name": "a", "required": true, "type": "long"},
        |  {"id": 2, "name": "b", "required": false, "type": "string"},
        |  {"id": 3, "name": "c", "required": false,
        |   "type": "decimal(10, 2)"}
        |]}""".stripMargin)
    // names/types/nullability round-trip, and each field carries its
    // Iceberg id as parquet field-id metadata (the rename-evolution
    // resolution hook)
    assert(s.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ===
      Seq(("a", LongType, false), ("b", StringType, true),
        ("c", DecimalType(10, 2), true)))
    assert(s.fields.map(_.metadata.getLong("parquet.field.id")).toSeq ===
      Seq(1L, 2L, 3L))
  }

  test("overwrite export: prior files land status=2, the snapshot " +
    "replaces the table, earlier snapshots still pin") {
    val loc = tmp("ow")
    val s1 = IcebergLite.export(spark, frame(50, "a"), loc)
    val s2 = IcebergLite.export(spark, frame(20, "b"), loc,
      overwrite = true)
    assert(IcebergLite.read(spark, loc).count() === 20L)
    assert(IcebergLite.read(spark, loc, Some(s1)).count() === 50L)
    assert(IcebergLite.read(spark, loc, Some(s2)).count() === 20L)
  }

  test("IcebergSync: append fast path, overwrite republish, " +
    "idempotency, expired-anchor re-bootstrap") {
    import graft.warehouse.{IcebergSync, VersionedParquet}
    val loc = tmp("sync")
    val mirror = tmp("sync-mirror")
    IcebergLite.export(spark, frame(30, "a"), loc)
    val s1 = IcebergSync.sync(spark, loc, mirror)
    assert(s1.republished === 1 && s1.appended === 0) // bootstrap
    assert(VersionedParquet.read(spark, mirror).count() === 30L)
    IcebergLite.export(spark, frame(10, "b"), loc)
    val s2 = IcebergSync.sync(spark, loc, mirror)
    assert(s2.appended === 1 && s2.republished === 0) // grown file set
    assert(VersionedParquet.read(spark, mirror).count() === 40L)
    IcebergLite.export(spark, frame(5, "c"), loc, overwrite = true)
    val s3 = IcebergSync.sync(spark, loc, mirror)
    assert(s3.republished === 1 && s3.appended === 0) // removal fallback
    assert(VersionedParquet.read(spark, mirror).count() === 5L)
    // idempotent: nothing new, nothing applied
    val s4 = IcebergSync.sync(spark, loc, mirror)
    assert(s4.appended === 0 && s4.republished === 0)
    // snapshot-aligned: one mirror version per foreign snapshot
    assert(VersionedParquet.versions(spark, mirror).length === 3)
    // expired anchor: a mirror whose synced-to id vanished from the
    // foreign history re-bootstraps with ONE loud republish
    val loc2 = tmp("sync2")
    IcebergLite.export(spark, frame(8, "x"), loc2)
    IcebergLite.export(spark, frame(4, "y"), loc2)
    val mirror2 = tmp("sync2-mirror")
    // hand-install a marker naming a snapshot id that never existed
    import spark.implicits._
    VersionedParquet.publish(Seq((1L, "z0", 0.0))
      .toDF("id", "name", "score"), mirror2, keepVersions = 10,
      markers = Map("_ICEBERG_SYNC" -> "777"))
    val s5 = IcebergSync.sync(spark, loc2, mirror2)
    assert(s5.republished === 1 && s5.appended === 0)
    assert(VersionedParquet.read(spark, mirror2).count() === 12L)
  }

  test("manifest column bounds: written from footers, read back, and " +
    "readPruned opens only overlapping files — zero on a miss, all " +
    "on a boundless column, refusals name their gap") {
    import spark.implicits._
    val loc = tmp("bounds")
    // three disjoint single-file ranges: [0,10), [10,20), [20,30)
    IcebergLite.export(spark,
      (0L until 10L).map(i => (i, s"a$i")).toDF("id", "name")
        .coalesce(1), loc)
    IcebergLite.appendManifest(spark,
      (10L until 20L).map(i => (i, s"b$i")).toDF("id", "name")
        .coalesce(1), loc)
    IcebergLite.appendManifest(spark,
      (20L until 30L).map(i => (i, s"c$i")).toDF("id", "name")
        .coalesce(1), loc)
    val snap = IcebergLite.snapshot(spark, loc)
    assert(snap.files.length === 3)
    // every file carries decodable bounds for field 1 (id)
    snap.files.foreach { f =>
      val b = snap.bounds(f)(1)
      assert(IcebergLite.leLong(b._1) >= 0L &&
        IcebergLite.leLong(b._2) <= 29L &&
        IcebergLite.leLong(b._1) <= IcebergLite.leLong(b._2))
    }
    // overlap: [8, 12] spans exactly two files
    val (rows, scanned, total) =
      IcebergLite.readPruned(spark, loc, "id", 8L, 12L)
    assert((scanned, total) === ((2, 3)))
    assert(rows.select("id").as[Long].collect().sorted.toSeq ===
      (8L to 12L))
    // miss: an empty plan still serves the declared schema, 0 files
    val (none, s0, _) = IcebergLite.readPruned(spark, loc, "id",
      100L, 200L)
    assert(s0 === 0 && none.count() === 0L &&
      none.columns.toSeq === Seq("id", "name"))
    // refusals name the gap: string column, unknown column
    val e1 = intercept[IllegalArgumentException](
      IcebergLite.readPruned(spark, loc, "name", 0L, 1L))
    assert(e1.getMessage.contains("int/long only"))
    val e2 = intercept[IllegalArgumentException](
      IcebergLite.readPruned(spark, loc, "nope", 0L, 1L))
    assert(e2.getMessage.contains("not in the"))
    // delete-bearing snapshot prunes SOUNDLY (the r12 upgrade from
    // the old named refusal): the deleted row is masked out of the
    // pruned scan exactly as the full read masks it
    val files = IcebergLite.snapshot(spark, loc).files
    val dels = spark.read.parquet(files: _*)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") === 5L).select("file_path", "pos")
    IcebergLite.exportPositionDeletes(spark, dels, loc)
    val (masked, _, _) = IcebergLite.readPruned(spark, loc, "id", 0L, 30L)
    import spark.implicits._
    assert(!masked.select("id").as[Long].collect().contains(5L))
  }

  test("expireSnapshots: manifest-reuse appends keep SHARED files " +
    "alive, delete files of kept snapshots survive, the current " +
    "snapshot refuses to expire, and expiry is idempotent") {
    val loc = tmp("expire")
    // append chain: snap2/snap3 REUSE snap1's manifest — expiring
    // snap1 must not delete files the kept snapshots still serve
    IcebergLite.export(spark, frame(10, "a"), loc)
    IcebergLite.appendManifest(spark, frame(5, "b"), loc)
    IcebergLite.appendManifest(spark, frame(3, "c"), loc)
    // plus a position-delete snapshot: its delete FILE must survive
    val dels = {
      val files = IcebergLite.snapshot(spark, loc).files
      spark.read.parquet(files: _*)
        .select(col("_metadata.file_path").as("file_path"),
          col("_metadata.row_index").as("pos"), col("id"))
        .filter(col("id") === 0L).select("file_path", "pos")
    }
    IcebergLite.exportPositionDeletes(spark, dels, loc)
    val liveBefore = IcebergLite.read(spark, loc).count()
    val (expired, deleted) =
      IcebergLite.expireSnapshots(spark, loc, keepLast = 2)
    assert(expired === 2)
    assert(deleted === 0) // every data file is still reachable (reuse)
    assert(IcebergLite.snapshotIds(spark, loc).length === 2)
    // the live view is untouched — including the delete application
    assert(IcebergLite.read(spark, loc).count() === liveBefore)
    // idempotent: nothing left to expire at keepLast = 2
    assert(IcebergLite.expireSnapshots(spark, loc, 2) === ((0, 0)))
    // current snapshot cannot expire (keepLast >= 1 enforced too)
    intercept[IllegalArgumentException](
      IcebergLite.expireSnapshots(spark, loc, 0))
  }

  test("rename evolution: metadata-only, id-resolved over old files, " +
    "pinned snapshots serve the renamed schema, id-less files refuse " +
    "to rename but still read by name") {
    val loc = tmp("rename")
    val s1 = IcebergLite.export(spark, frame(10, "a"), loc)
    IcebergLite.renameColumn(spark, loc, "score", "quality")
    // the old file (parquet column 'score') serves 'quality'
    val live = IcebergLite.read(spark, loc)
    assert(live.columns.toSeq === Seq("id", "name", "quality"))
    assert(live.filter(col("quality").isNull).count() === 0L)
    // time travel serves the TABLE schema (current names) too
    assert(IcebergLite.read(spark, loc, Some(s1)).columns
      .contains("quality"))
    // refusals: missing source, colliding target
    intercept[IllegalArgumentException](
      IcebergLite.renameColumn(spark, loc, "nope", "x"))
    intercept[IllegalArgumentException](
      IcebergLite.renameColumn(spark, loc, "quality", "id"))
    // an ID-LESS data file (foreign writer without field ids): read
    // falls back to name resolution; rename refuses by name
    val loc2 = tmp("rename-idless")
    IcebergLite.export(spark, frame(6, "b"), loc2)
    val f = new Path(IcebergLite.snapshot(spark, loc2).files.head)
    val raw = spark.read.parquet(f.toString)
    // strip schema metadata: the session-wide fieldId read/write flags
    // (set by IcebergLite's own paths) would otherwise carry the ids
    // straight through the rewrite
    val plain = raw.select(raw.schema.fields.map(fl =>
      col(fl.name).as(fl.name,
        org.apache.spark.sql.types.Metadata.empty)).toSeq: _*)
    val tmpDir = tmp("idless-rewrite")
    plain.coalesce(1).write.mode("overwrite").parquet(tmpDir)
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rewritten = fs.listStatus(new Path(tmpDir)).toSeq
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.delete(f, false)
    org.apache.hadoop.fs.FileUtil.copy(fs, rewritten, fs, f, false,
      spark.sparkContext.hadoopConfiguration)
    assert(IcebergLite.read(spark, loc2).count() === 6L) // name path
    val e = intercept[java.io.IOException](
      IcebergLite.renameColumn(spark, loc2, "score", "quality"))
    assert(e.getMessage.contains("no parquet field ids"))
  }

  test("partitioned export: tuples round-trip through the manifest, " +
    "pruning opens only matching files, a fresh-table guard and a " +
    "non-identity transform refuse by name") {
    import spark.implicits._
    val loc = tmp("part")
    val df = (0L until 60L).map(i => (i, s"n$i", i % 3))
      .toDF("id", "name", "p").coalesce(1)
    IcebergLite.exportPartitioned(spark, df, loc, Seq("p"))
    val snap = IcebergLite.snapshot(spark, loc)
    assert(snap.files.length === 3)
    // every file's manifest tuple equals its rows' actual value
    snap.files.foreach { f =>
      val declared = snap.partitionValues(f)("p")
      val actual = spark.read.parquet(f).select("p").distinct()
        .collect().map(_.getLong(0).toString).toSeq
      assert(actual === Seq(declared))
    }
    val (rows, scanned, total) =
      IcebergLite.readPartitionPruned(spark, loc, Map("p" -> "1"))
    assert((scanned, total) === ((1, 3)))
    assert(rows.count() === 20L)
    // the plain read still serves everything (partition cols in-file)
    assert(IcebergLite.read(spark, loc).count() === 60L)
    // fresh-table guard
    intercept[java.io.IOException](
      IcebergLite.exportPartitioned(spark, df, loc, Seq("p")))
    // an UNKNOWN transform refuses at snapshot resolution, by name
    // (known non-identity transforms — bucket/truncate/day/month/year
    // — now parse and prune; see Round12Spec)
    val metaP = new Path(loc, "metadata/v1.metadata.json")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val txt = {
      val in = fs.open(metaP)
      try scala.io.Source.fromInputStream(in).mkString finally in.close()
    }
    val out = fs.create(metaP, true)
    try out.write(txt.replace("\"identity\"", "\"zorder[16]\"")
      .getBytes("UTF-8"))
    finally out.close()
    val e = intercept[java.io.IOException](IcebergLite.snapshot(spark, loc))
    assert(e.getMessage.contains("zorder[16]"))
  }

  test("equality-delete ordering fingerprint: a seq-stripped manifest " +
    "list reads via the snapshot-id proxy ONLY for genuinely " +
    "self-written tables — the all-zeros uuid alone (spoofable) no " +
    "longer qualifies once the deterministic id==seq pattern breaks") {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.Schema
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumReader,
      GenericDatumWriter, GenericRecord}
    import spark.implicits._
    val loc = tmp("seqfp")
    IcebergLite.export(spark,
      (0L until 10L).map(i => (i, s"u$i")).toDF("id", "name")
        .coalesce(1), loc)
    IcebergLite.exportEqualityDeletes(spark, Seq(3L).toDF("id"), loc)
    val before = IcebergLite.read(spark, loc).select("id")
      .as[Long].collect().sorted.toSeq
    assert(before === (0L until 10L).filterNot(_ == 3L))
    // strip sequence_number/min_sequence_number from the CURRENT
    // manifest list, the way a pre-v2 writer would have laid it out
    val metaDir = new java.io.File(new java.net.URI(
      new Path(loc, "metadata").toUri.toString match {
        case u if u.startsWith("file:") => u
        case u => "file://" + u
      }).getPath)
    val listFile = metaDir.listFiles
      .filter(_.getName.matches("snap-2.*manifest-list.*\\.avro"))
      .maxBy(_.getName)
    val rdr = new DataFileReader[GenericRecord](listFile,
      new GenericDatumReader[GenericRecord]())
    val origSchema = rdr.getSchema
    val rows = rdr.iterator().asScala.toVector
    rdr.close()
    val keptFields = origSchema.getFields.asScala
      .filterNot(f => f.name == "sequence_number" ||
        f.name == "min_sequence_number")
      .map(f => new Schema.Field(f.name, f.schema, f.doc, f.defaultVal))
    val reduced = Schema.createRecord(origSchema.getName,
      origSchema.getDoc, origSchema.getNamespace, false,
      keptFields.toList.asJava)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](reduced))
    w.create(reduced, listFile)
    rows.foreach { r =>
      val c = new GenericData.Record(reduced)
      reduced.getFields.asScala.foreach(f =>
        c.put(f.name, r.get(f.name)))
      w.append(c)
    }
    w.close()
    // the raw rewrite invalidates Hadoop LocalFileSystem's checksum
    // sidecar — drop it so the read sees the new bytes
    new java.io.File(listFile.getParentFile,
      "." + listFile.getName + ".crc").delete()
    // genuinely self-written (zeros uuid + id==seq + increasing ids):
    // the added_snapshot_id proxy is provably the sequence order
    val proxied = IcebergLite.read(spark, loc).select("id")
      .as[Long].collect().sorted.toSeq
    assert(proxied === before)
    // now break the deterministic pattern the way a spoofed/foreign
    // table would: a snapshot whose sequence-number != id
    val metaP = new Path(loc, "metadata/v2.metadata.json")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val txt = {
      val in = fs.open(metaP)
      try scala.io.Source.fromInputStream(in).mkString finally in.close()
    }
    val seqRe = "\"sequence-number\"\\s*:\\s*2".r
    assert(seqRe.findFirstIn(txt).nonEmpty,
      "fixture expects the eq-delete snapshot at sequence-number 2")
    val out = fs.create(metaP, true)
    try out.write(seqRe.replaceAllIn(txt,
      "\"sequence-number\": 7").getBytes("UTF-8"))
    finally out.close()
    val e = intercept[java.io.IOException](
      IcebergLite.read(spark, loc).collect())
    assert(e.getMessage.contains("sequence_number"),
      s"must refuse on unprovable ordering, got: ${e.getMessage}")
  }

  test("snapshot-less metadata: expireSnapshots and " +
    "exportPositionDeletes refuse by name, no NPE") {
    val loc = tmp("headless")
    IcebergLite.export(spark, frame(5, "x"), loc)
    IcebergLite.export(spark, frame(5, "y"), loc)
    // hand-drop the head the way a corrupt/foreign metadata file
    // would: snapshots remain listed but no current-snapshot-id
    val metaP = new Path(loc, "metadata/v2.metadata.json")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val txt = {
      val in = fs.open(metaP)
      try scala.io.Source.fromInputStream(in).mkString finally in.close()
    }
    assert(txt.contains("\"current-snapshot-id\": 2"))
    val out = fs.create(metaP, true)
    try out.write(txt.replace("\"current-snapshot-id\": 2",
      "\"current-snapshot-id\": null").getBytes("UTF-8"))
    finally out.close()
    val e1 = intercept[java.io.IOException](
      IcebergLite.expireSnapshots(spark, loc, keepLast = 1))
    assert(e1.getMessage.contains("current-snapshot-id"),
      s"expire refusal must name the field, got: ${e1.getMessage}")
    import spark.implicits._
    val dels = Seq(("somefile.parquet", 0L)).toDF("file_path", "pos")
    val e2 = intercept[java.io.IOException](
      IcebergLite.exportPositionDeletes(spark, dels, loc))
    assert(e2.getMessage.contains("current-snapshot-id"),
      s"pos-delete refusal must name the field, got: ${e2.getMessage}")
  }
}
