package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DeltaLite's protocol contract: fold adds/removes in commit order,
  * resolve from checkpoints, read foreign (hand-written, partitioned)
  * logs, time-travel by capping the fold, and refuse protocol
  * features it cannot faithfully read.
  */
class DeltaLiteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-dlite-$tag").toString

  private def df(lo: Long, hi: Long) = {
    import spark.implicits._
    (lo until hi).map(i => (i, i * 2L)).toDF("id", "v")
  }

  private def idsOf(table: String, asOf: Option[Long] = None): Seq[Long] =
    DeltaLite.read(spark, table, asOf).select("id").orderBy("id")
      .collect().toSeq.map(_.getLong(0))

  test("export → read roundtrip; overwrite folds removes; time travel caps the fold") {
    val t = tmp("rt")
    assert(DeltaLite.export(spark, df(0, 50), t) == 0L)
    assert(idsOf(t) == (0L until 50L))
    assert(DeltaLite.export(spark, df(100, 130), t) == 1L)
    // live = the overwrite only — every v0 file removed
    assert(idsOf(t) == (100L until 130L))
    // v0 still resolves (files stay on disk, Delta's vacuum contract)
    assert(idsOf(t, Some(0L)) == (0L until 50L))
    val snap = DeltaLite.snapshot(spark, t)
    assert(snap.version == 1L && snap.schema.isDefined)
  }

  test("checkpoint: resolves from one parquet + JSON suffix, old commits deletable") {
    val t = tmp("cp")
    DeltaLite.export(spark, df(0, 20), t)
    DeltaLite.export(spark, df(20, 40), t) // overwrite
    assert(DeltaLite.checkpoint(spark, t) == 1L)
    // a real Delta log-retention pass: the checkpointed commits go
    Files.delete(Paths.get(t, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(t, "_delta_log", f"${1L}%020d.json"))
    assert(idsOf(t) == (20L until 40L))
    // post-checkpoint commits fold as a suffix on top
    DeltaLite.export(spark, df(40, 45), t)
    assert(idsOf(t) == (40L until 45L))
    assert(DeltaLite.snapshot(spark, t).version == 2L)
  }

  test("foreign hand-written partitioned log: directory inference resolves the partition column") {
    import spark.implicits._
    val t = tmp("foreign")
    // another engine wrote: Hive-layout files + its own log
    val data = (0L until 40L).map(i => (i, (i % 2).toString))
      .toDF("id", "p")
    val staging = s"$t/.stage"
    data.write.partitionBy("p").parquet(staging)
    val files = Files.walk(Paths.get(staging)).iterator()
    val rel = scala.collection.mutable.ArrayBuffer.empty[String]
    files.forEachRemaining { f =>
      val name = f.getFileName.toString
      if (name.endsWith(".parquet") && Files.size(f) > 0) {
        val dest = f.getParent.getFileName.toString + "/" + name
        Files.createDirectories(Paths.get(t, f.getParent.getFileName.toString))
        Files.move(f, Paths.get(t, dest))
        rel += dest
      }
    }
    val schemaJson = spark.read.parquet(s"$t/${rel.head}").schema
      .add("p", "string").json
      .replace("\\", "\\\\").replace("\"", "\\\"")
    val actions = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":["p"],"configuration":{},"createdTime":0}}""") ++
      rel.map(r =>
        s"""{"add":{"path":"$r","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    Files.createDirectories(Paths.get(t, "_delta_log"))
    Files.write(Paths.get(t, "_delta_log", f"${0L}%020d.json"),
      actions.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val got = DeltaLite.read(spark, t)
    assert(got.columns.contains("p"), "partition column must resolve")
    assert(got.count() == 40L)
    assert(got.filter(col("p") === "1").count() == 20L)
    assert(DeltaLite.snapshot(spark, t).partitionColumns == Seq("p"))
  }

  test("column mapping (name mode): physical parquet names resolve " +
    "to logical columns; id mode and foreign v3 features refuse") {
    import spark.implicits._
    // the table another engine wrote with columnMapping=name: parquet
    // carries PHYSICAL names, the log schema maps them to logical
    val t = tmp("colmap")
    (0L until 25L).map(i => (i, i * 3L))
      .toDF("col-9f1a", "col-2b7c") // physical names
      .write.parquet(s"$t/.stage")
    val rel = Files.list(Paths.get(t, ".stage")).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq
    rel.foreach(n => Files.move(Paths.get(t, ".stage", n), Paths.get(t, n)))
    def fld(logical: String, phys: String, id: Int) =
      s"""{\\"name\\":\\"$logical\\",\\"type\\":\\"long\\",""" +
        s"""\\"nullable\\":true,\\"metadata\\":{""" +
        s"""\\"delta.columnMapping.physicalName\\":\\"$phys\\",""" +
        s"""\\"delta.columnMapping.id\\":$id}}"""
    val schemaJson = s"""{\\"type\\":\\"struct\\",\\"fields\\":[""" +
      fld("id", "col-9f1a", 1) + "," + fld("v", "col-2b7c", 2) + "]}"
    def meta(mode: String) =
      s"""{"metaData":{"id":"x","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":"$schemaJson",""" +
        s""""partitionColumns":[],"configuration":{""" +
        s""""delta.columnMapping.mode":"$mode",""" +
        s""""delta.columnMapping.maxColumnId":"2"},"createdTime":0}}"""
    val adds = rel.map(r =>
      s"""{"add":{"path":"$r","partitionValues":{},"size":1,""" +
        s""""modificationTime":0,"dataChange":true}}""")
    Files.createDirectories(Paths.get(t, "_delta_log"))
    Files.write(Paths.get(t, "_delta_log", f"${0L}%020d.json"),
      (Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        meta("name")) ++ adds)
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
    val got = DeltaLite.read(spark, t)
    assert(got.columns.toSeq === Seq("id", "v"),
      s"logical names must come back, got ${got.columns.toSeq}")
    assert(got.count() === 25L)
    assert(got.agg(sum("v")).head().getLong(0) === (0L until 25L).map(_ * 3L).sum)
    // the v3 table-features shape with ONLY columnMapping also reads
    Files.write(Paths.get(t, "_delta_log", f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping"],""" +
        """"writerFeatures":["columnMapping"]}}""")
        .getBytes(StandardCharsets.UTF_8))
    assert(DeltaLite.read(spark, t).columns.toSeq === Seq("id", "v"))
    // an unimplemented v3 reader feature refuses, naming it
    // (v2Checkpoint graduated to implemented — DeltaV2CheckpointSpec —
    // so typeWidening stands in as the not-yet-implemented feature)
    Files.write(Paths.get(t, "_delta_log", f"${2L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping","typeWidening"]}}""")
        .getBytes(StandardCharsets.UTF_8))
    val e = intercept[java.io.IOException] { DeltaLite.read(spark, t) }
    assert(e.getMessage.contains("typeWidening"))
    Files.delete(Paths.get(t, "_delta_log", f"${2L}%020d.json"))
    // id-mode over ID-LESS files refuses, naming the mode (these
    // parquet files carry no field ids, so id resolution is
    // impossible; matching by position would be a misread)
    Files.write(Paths.get(t, "_delta_log", f"${2L}%020d.json"),
      meta("id").getBytes(StandardCharsets.UTF_8))
    val e2 = intercept[java.io.IOException] { DeltaLite.read(spark, t) }
    assert(e2.getMessage.contains("'id'"))
  }

  test("minReaderVersion > 1 refuses loudly instead of misreading") {
    val t = tmp("refuse")
    Files.createDirectories(Paths.get(t, "_delta_log"))
    Files.write(Paths.get(t, "_delta_log", f"${0L}%020d.json"),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}"""
        .getBytes(StandardCharsets.UTF_8))
    val e = intercept[java.io.IOException] { DeltaLite.read(spark, t) }
    assert(e.getMessage.contains("minReaderVersion 3"))
  }

  test("deletion vectors: inline and file blobs mask rows at scan, " +
    "time travel serves the pre-DV state, corruption refuses") {
    import spark.implicits._
    val t = tmp("dv")
    DeltaLite.export(spark, df(0, 100), t) // v0
    val snap0 = DeltaLite.snapshot(spark, t)
    // map each live file to the ordinals of its odd-id rows — the
    // same hidden-row-identity derivation an engine's DELETE does
    val targets = spark.read
      .parquet(snap0.files.map(f => s"$t/$f"): _*)
      .select(col("_metadata.file_path").as("p"),
        col("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") % 2 === 1)
      .collect()
      .groupBy(r => {
        val abs = r.getString(0).replaceFirst("^file:/+", "/")
        snap0.files.find(f =>
          abs == new org.apache.hadoop.fs.Path(t, f).toUri.getPath).get
      })
      .map { case (f, rs) => f -> rs.map(_.getLong(1)) }
    val v1 = DeltaLite.commitDeletionVectors(spark, t, targets)
    // inline path exercised (50 odd ids encode well under 512 B)
    assert(DeltaLite.snapshot(spark, t).deletionVectors.values
      .forall(_.storageType == "i"))
    assert(idsOf(t) === (0L until 100L).filter(_ % 2 == 0))
    // time travel: the pre-DV version still serves every row
    assert(idsOf(t, Some(0L)) === (0L until 100L))
    assert(DeltaLite.snapshot(spark, t).version === v1)
    // FILE-based DV: force the blob path with a tiny inline threshold
    val t2 = tmp("dv-file")
    DeltaLite.export(spark, df(0, 9000), t2)
    val s2 = DeltaLite.snapshot(spark, t2)
    val targets2 = spark.read
      .parquet(s2.files.map(f => s"$t2/$f"): _*)
      .select(col("_metadata.file_path").as("p"),
        col("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") % 3 === 0)
      .collect()
      .groupBy(r => {
        val abs = r.getString(0).replaceFirst("^file:/+", "/")
        s2.files.find(f =>
          abs == new org.apache.hadoop.fs.Path(t2, f).toUri.getPath).get
      })
      .map { case (f, rs) => f -> rs.map(_.getLong(1)) }
    DeltaLite.commitDeletionVectors(spark, t2, targets2,
      inlineThreshold = 0)
    val dvs2 = DeltaLite.snapshot(spark, t2).deletionVectors
    assert(dvs2.nonEmpty && dvs2.values.forall(_.storageType == "u"))
    assert(DeltaLite.read(spark, t2).count() === 6000L)
    assert(DeltaLite.read(spark, t2)
      .filter(col("id") % 3 === 0).count() === 0L)
    // corrupt the blob: CRC check refuses loudly
    val bin = Files.list(Paths.get(t2)).iterator().asScala
      .find(_.getFileName.toString.startsWith("deletion_vector_")).get
    val bytes = Files.readAllBytes(bin)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) + 1).toByte
    Files.write(bin, bytes)
    Files.deleteIfExists(
      bin.getParent.resolve("." + bin.getFileName + ".crc"))
    val e = intercept[java.io.IOException] {
      DeltaLite.read(spark, t2).count()
    }
    assert(e.getMessage.toLowerCase.contains("checksum") ||
      e.getMessage.contains("magic"),
      s"corruption must refuse loudly, got: ${e.getMessage}")
  }

  test("RoaringDv: portable roundtrip across container kinds, run " +
    "containers decode, z85 roundtrip") {
    // array containers + a >4096-dense block (bitmap container) + a
    // second 32-bit bitmap (high bits) in one array
    val dense = (10000L until 15000L)         // bitmap container
    val sparse = Seq(1L, 7L, 65540L, 131072L) // array containers
    val high = Seq((1L << 32) + 5L, (1L << 32) + 99L) // bitmap #2
    val vals = (dense ++ sparse ++ high).toArray
    val decoded = RoaringDv.decode(RoaringDv.encode(vals))
    assert(decoded.toSeq === vals.distinct.sorted.toSeq)
    // hand-crafted RUN container (cookie 12347): values 100..200 of
    // key 0 — the encoder never emits runs, so this pins the decoder
    // against the spec's third container kind
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff); bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    le32(1681511377); le32(1); le32(0) // magic, nBitmaps (int64 LE)
    le32(12347 | (0 << 16)) // run cookie, 1 container
    bos.write(1)            // run-flag bitset: container 0 is a run
    le16(0); le16(100)      // key 0, cardinality-1 = 100
    le16(1); le16(100); le16(100) // 1 run: start 100, length 100
    val run = RoaringDv.decode(bos.toByteArray)
    assert(run.toSeq === (100L to 200L).toSeq)
    // z85: arbitrary bytes roundtrip at any length
    for (n <- Seq(1, 4, 5, 16, 33)) {
      val b = Array.tabulate(n)(i => ((i * 37 + 11) % 251).toByte)
      assert(RoaringDv.z85Decode(RoaringDv.z85Encode(b), n).toSeq === b.toSeq)
    }
  }

  test("re-add after remove wins (compaction shape)") {
    import spark.implicits._
    val t = tmp("readd")
    DeltaLite.export(spark, df(0, 10), t)
    val v0Files = DeltaLite.snapshot(spark, t).files
    DeltaLite.export(spark, df(10, 20), t) // removes v0 files
    // a third commit re-adds one v0 file (e.g. a clone/restore shape)
    val logP = Paths.get(t, "_delta_log", f"${2L}%020d.json")
    Files.write(logP,
      s"""{"add":{"path":"${v0Files.head}","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
        .getBytes(StandardCharsets.UTF_8))
    val got = idsOf(t)
    assert(got.size > 10 && (10L until 20L).forall(got.contains))
  }

  test("add-action stats: written from footers, folded from the log, " +
    "readPruned opens only overlapping files; removes drop stats; " +
    "refusals name their gap") {
    import spark.implicits._
    val t = tmp("stats")
    DeltaLite.exportAppend(spark, df(0, 10).coalesce(1), t)
    DeltaLite.exportAppend(spark, df(10, 20).coalesce(1), t)
    DeltaLite.exportAppend(spark, df(20, 30).coalesce(1), t)
    val snap = DeltaLite.snapshot(spark, t)
    assert(snap.files.length === 3)
    snap.files.foreach { f =>
      val st = snap.stats(f)
      assert(st.numRecords === 10L)
      assert(st.mins("id") <= st.maxs("id"))
    }
    val (rows, scanned, total) =
      DeltaLite.readPruned(spark, t, "id", 8L, 12L)
    assert((scanned, total) === ((2, 3)))
    assert(rows.select("id").as[Long].collect().sorted.toSeq ===
      (8L to 12L))
    // miss: zero files planned, schema still served
    val (none, s0, _) = DeltaLite.readPruned(spark, t, "id", 100L, 200L)
    assert(s0 === 0 && none.count() === 0L &&
      none.columns.toSeq === Seq("id", "v"))
    // an OVERWRITE's removes drop the removed files' stats
    DeltaLite.export(spark, df(50, 60).coalesce(1), t)
    val snap2 = DeltaLite.snapshot(spark, t)
    assert(snap2.files.length === 1 &&
      snap2.stats.keySet === snap2.files.toSet)
    // refusals: wrong type, unknown column
    val e1 = intercept[IllegalArgumentException](
      DeltaLite.readPruned(spark, t, "nope", 0L, 1L))
    assert(e1.getMessage.contains("not in the"))
  }

  test("stats survive log compaction: a checkpoint carries them, and " +
    "pruning still plans 2 of 3 files with every pre-checkpoint JSON " +
    "commit deleted; DV-bearing checkpoints carry the masks") {
    import spark.implicits._
    val t = tmp("cpstats")
    DeltaLite.exportAppend(spark, df(0, 10).coalesce(1), t)
    DeltaLite.exportAppend(spark, df(10, 20).coalesce(1), t)
    DeltaLite.exportAppend(spark, df(20, 30).coalesce(1), t)
    val cpV = DeltaLite.checkpoint(spark, t)
    // Delta's retention contract: checkpointed JSON commits may vanish
    (0L to cpV).foreach { v =>
      Files.deleteIfExists(
        Paths.get(t, "_delta_log", f"$v%020d.json"))
    }
    val (rows, scanned, total) =
      DeltaLite.readPruned(spark, t, "id", 8L, 12L)
    assert((scanned, total) === ((2, 3)))
    assert(rows.count() === 5L)
    // a DV-bearing checkpoint RE-EMITS the descriptors (dropping them
    // would resurrect every masked row for checkpoint-first readers):
    // with every JSON commit gone, the masked view must still serve
    val t2 = tmp("cpdv")
    DeltaLite.export(spark, df(0, 20).coalesce(1), t2)
    val f0 = DeltaLite.snapshot(spark, t2).files.head
    DeltaLite.commitDeletionVectors(spark, t2, Map(f0 -> Array(0L, 1L)))
    val cpV2 = DeltaLite.checkpoint(spark, t2)
    (0L to cpV2).foreach { v =>
      Files.deleteIfExists(Paths.get(t2, "_delta_log", f"$v%020d.json"))
    }
    val masked = DeltaLite.read(spark, t2)
    assert(masked.count() === 18L)
    assert(masked.select("id").as[Long].collect().min === 2L)
    // and the checkpoint is protocol-complete: the v3 deletionVectors
    // gate survives log truncation
    assert(DeltaLite.snapshot(spark, t2).protocol.minReader === 3)
  }

  test("rename evolution: metadata-only commit, appends stay " +
    "PHYSICALLY consistent (old parquet name), logical reads serve " +
    "the new name over both generations, refusals fire") {
    val t = tmp("rename")
    DeltaLite.export(spark, df(0, 10).coalesce(1), t)
    val filesBefore = DeltaLite.snapshot(spark, t).files.toSet
    DeltaLite.renameColumn(spark, t, "v", "score")
    // metadata-only: the file set is untouched
    assert(DeltaLite.snapshot(spark, t).files.toSet === filesBefore)
    // append under the NEW logical name
    import spark.implicits._
    DeltaLite.exportAppend(spark,
      (10L until 15L).map(i => (i, i * 3L)).toDF("id", "score")
        .coalesce(1), t)
    val live = DeltaLite.read(spark, t)
    assert(live.columns.toSeq === Seq("id", "score"))
    assert(live.count() === 15L &&
      live.filter(col("score").isNull).count() === 0L)
    // the appended FILE carries the original physical name 'v'
    val newFile = (DeltaLite.snapshot(spark, t).files.toSet --
      filesBefore).head
    val phys = spark.read.parquet(
      new org.apache.hadoop.fs.Path(t, newFile).toString).columns.toSeq
    assert(phys === Seq("id", "v"))
    // refusals: missing source, collision
    intercept[IllegalArgumentException](
      DeltaLite.renameColumn(spark, t, "nope", "x"))
    intercept[IllegalArgumentException](
      DeltaLite.renameColumn(spark, t, "score", "id"))
  }

  test("partitioned export: Hive layout + per-add partitionValues, " +
    "pruning opens only matching files, reads reconstruct the " +
    "partition column, fresh-table guard fires") {
    import spark.implicits._
    val t = tmp("part")
    val src = (0L until 60L).map(i => (i, i % 3)).toDF("id", "p")
      .coalesce(1)
    DeltaLite.exportPartitioned(spark, src, t, Seq("p"))
    val snap = DeltaLite.snapshot(spark, t)
    assert(snap.files.length === 3)
    assert(snap.partitionColumns === Seq("p"))
    // partitionValues in the log equal the Hive dir the file lives in
    snap.files.foreach { f =>
      assert(f.startsWith(s"p=${snap.partitionValues(f)("p")}/"))
    }
    val (rows, scanned, total) =
      DeltaLite.readPartitionPruned(spark, t, Map("p" -> "1"))
    assert((scanned, total) === ((1, 3)))
    assert(rows.count() === 20L)
    // the partition column is reconstructed (it is NOT in the files)
    assert(rows.columns.contains("p"))
    assert(DeltaLite.read(spark, t).count() === 60L)
    // zero-match plan serves schema, opens nothing
    val (none, s0, _) =
      DeltaLite.readPartitionPruned(spark, t, Map("p" -> "9"))
    assert(s0 === 0 && none.count() === 0L)
    intercept[java.io.IOException](
      DeltaLite.exportPartitioned(spark, src, t, Seq("p")))
  }

  test("vacuum: refuses without a checkpoint, sweeps only orphans, " +
    "the live view and its pruning stats survive, truncated versions " +
    "refuse to pin") {
    val t = tmp("vac")
    DeltaLite.export(spark, df(0, 10).coalesce(1), t)
    DeltaLite.export(spark, df(10, 30).coalesce(1), t)
    // no checkpoint yet → refusal names the gap
    val e = intercept[java.io.IOException](DeltaLite.vacuum(spark, t))
    assert(e.getMessage.contains("no checkpoint"))
    DeltaLite.checkpoint(spark, t)
    val (files, commits) = DeltaLite.vacuum(spark, t)
    assert(files === 1 && commits === 2)
    assert(idsOf(t) === (10L until 30L))
    // stats pruning still plans from the checkpointed stats
    val (_, scanned, total) = DeltaLite.readPruned(spark, t, "id", 0L, 5L)
    assert((scanned, total) === ((0, 1)))
    // truncated version refuses to pin
    intercept[java.io.IOException](DeltaLite.read(spark, t, Some(0L)))
    // idempotent: nothing left to sweep
    assert(DeltaLite.vacuum(spark, t) === ((0, 0)))
  }

  test("rename + checkpoint + vacuum keeps column mapping: the " +
    "checkpoint persists metaData.configuration, so a reader starting " +
    "from it still maps physical names to logical ones") {
    val t = tmp("cpmap")
    DeltaLite.export(spark, df(0, 10).coalesce(1), t)
    DeltaLite.renameColumn(spark, t, "v", "score")
    DeltaLite.exportAppend(spark,
      { import spark.implicits._
        (10L until 15L).map(i => (i, i * 2L)).toDF("id", "score")
          .coalesce(1) }, t)
    DeltaLite.checkpoint(spark, t)
    val (_, nTrunc) = DeltaLite.vacuum(spark, t)
    assert(nTrunc >= 1)
    // the ADVICE regression: before the fix the checkpoint dropped
    // configuration, the fold saw mode "none", and the read served
    // the PRE-rename physical column name silently
    val snap = DeltaLite.snapshot(spark, t)
    assert(snap.columnMappingMode === "name")
    assert(snap.protocol.minReader === 2)
    val live = DeltaLite.read(spark, t)
    assert(live.columns.toSeq === Seq("id", "score"))
    assert(live.count() === 15L &&
      live.filter(col("score").isNull).count() === 0L)
  }

  test("re-adding a DV-bearing file MERGES positions: a second " +
    "deletion-vector commit on the same file keeps the first " +
    "commit's masked rows masked") {
    import spark.implicits._
    val t = tmp("dvmerge")
    DeltaLite.export(spark, df(0, 20).coalesce(1), t)
    val f0 = DeltaLite.snapshot(spark, t).files.head
    DeltaLite.commitDeletionVectors(spark, t, Map(f0 -> Array(0L, 1L)))
    DeltaLite.commitDeletionVectors(spark, t, Map(f0 -> Array(5L)))
    val ids = DeltaLite.read(spark, t).select("id").as[Long]
      .collect().sorted.toSeq
    // rows 0, 1 (first commit) AND 5 (second) are all masked
    assert(ids === (0L until 20L).filterNot(Set(0L, 1L, 5L)))
    assert(DeltaLite.snapshot(spark, t)
      .deletionVectors(f0).cardinality === 3L)
  }

  test("purge + vacuum lifecycle on a DV-bearing table: purge " +
    "rewrites masked files (dataChange false), vacuum sweeps the " +
    "orphaned DV blobs, the live view never changes, and time " +
    "travel past the horizon refuses") {
    import spark.implicits._
    val t = tmp("dvpurge")
    DeltaLite.export(spark, df(0, 20).coalesce(1), t)
    val f0 = DeltaLite.snapshot(spark, t).files.head
    // big-enough position set to force a FILE blob (storageType u)
    DeltaLite.commitDeletionVectors(spark, t,
      Map(f0 -> (0L until 8L).toArray), inlineThreshold = 4)
    assert(DeltaLite.snapshot(spark, t)
      .deletionVectors(f0).storageType === "u")
    val before = DeltaLite.read(spark, t).select("id").as[Long]
      .collect().sorted.toSeq
    assert(before === (8L until 20L))
    val (nRewritten, nRows) = DeltaLite.purgeDeletionVectors(spark, t)
    assert((nRewritten, nRows) === ((1, 8L)))
    assert(DeltaLite.snapshot(spark, t).deletionVectors.isEmpty)
    DeltaLite.checkpoint(spark, t)
    val (nDel, nTrunc) = DeltaLite.vacuum(spark, t)
    // swept: the pre-purge data file AND the orphaned DV blob
    assert(nDel === 2 && nTrunc >= 1)
    assert(!Files.list(Paths.get(t)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("deletion_vector_")))
    val after = DeltaLite.read(spark, t).select("id").as[Long]
      .collect().sorted.toSeq
    assert(after === before)
    intercept[java.io.IOException](
      DeltaLite.read(spark, t, Some(0L)).count())
    // idempotent: purging a DV-less table is a no-op
    assert(DeltaLite.purgeDeletionVectors(spark, t) === ((0, 0L)))
  }

  test("id-mode column mapping: created fresh with parquet field ids, " +
    "reads resolve BY ID, a metadata-only rename serves files " +
    "written before and after it, retrofitting refuses") {
    import spark.implicits._
    val t = tmp("idmode")
    DeltaLite.createIdMapped(spark, df(0, 10).coalesce(1), t)
    val snap = DeltaLite.snapshot(spark, t)
    assert(snap.columnMappingMode === "id")
    // files carry PHYSICAL names + field ids
    val f0 = spark.read.parquet(
      new org.apache.hadoop.fs.Path(t, snap.files.head).toString)
    assert(f0.columns.toSeq === Seq("col-1", "col-2"))
    // logical read resolves by field id
    val got = DeltaLite.read(spark, t)
    assert(got.columns.toSeq === Seq("id", "v"))
    assert(got.count() === 10L)
    // metadata-only rename keeps mode id; append under the new name
    DeltaLite.renameColumn(spark, t, "v", "score")
    assert(DeltaLite.snapshot(spark, t).columnMappingMode === "id")
    DeltaLite.exportAppend(spark,
      (10L until 15L).map(i => (i, i * 2L)).toDF("id", "score")
        .coalesce(1), t)
    val live = DeltaLite.read(spark, t)
    assert(live.columns.toSeq === Seq("id", "score"))
    assert(live.count() === 15L &&
      live.filter(col("score").isNull).count() === 0L)
    assert(live.agg(sum("score")).head().getLong(0) ===
      (0L until 15L).map(_ * 2L).sum)
    // mixed pre/post-rename file set: the appended file also stores
    // the PHYSICAL name col-2, so the physical schema never forks
    val newest = DeltaLite.snapshot(spark, t).files
      .filterNot(snap.files.toSet).head
    assert(spark.read.parquet(
      new org.apache.hadoop.fs.Path(t, newest).toString)
      .columns.toSeq === Seq("col-1", "col-2"))
    // id-mode survives checkpoint + vacuum (configuration persists)
    DeltaLite.checkpoint(spark, t)
    DeltaLite.vacuum(spark, t)
    assert(DeltaLite.read(spark, t).columns.toSeq === Seq("id", "score"))
    // retrofitting an existing table refuses
    intercept[java.io.IOException](
      DeltaLite.createIdMapped(spark, df(0, 3), t))
  }

  test("stats pruning over a DV-bearing snapshot masks exactly like " +
    "the full read: raw-row stats over-keep, kept vectors apply") {
    import spark.implicits._
    val t = tmp("prunedv")
    (0L until 3L).foreach(b =>
      DeltaLite.exportAppend(spark, df(b * 10, (b + 1) * 10)
        .coalesce(1), t))
    val snap = DeltaLite.snapshot(spark, t)
    val deletes = snap.files.map { f =>
      val pos = spark.read.parquet(
          new org.apache.hadoop.fs.Path(t, f).toString)
        .select(col("_metadata.row_index").as("p"), col("id"))
        .filter(col("id") % 4 === 1)
        .select("p").as[Long].collect()
      f -> pos
    }.toMap
    DeltaLite.commitDeletionVectors(spark, t, deletes)
    val (rows, scanned, total) = DeltaLite.readPruned(spark, t, "id",
      12L, 25L)
    assert((scanned, total) === ((2, 3)))
    val got = rows.select("id").as[Long].collect().sorted.toSeq
    assert(got === (12L to 25L).filterNot(_ % 4 == 1))
    assert(got === DeltaLite.read(spark, t)
      .filter(col("id").between(12L, 25L))
      .select("id").as[Long].collect().sorted.toSeq)
  }
}
