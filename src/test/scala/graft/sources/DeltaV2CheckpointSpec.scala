package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Delta V2 CHECKPOINT read (the `v2Checkpoint` table feature —
  * UUID-named top-level file carrying checkpointMetadata + sidecar
  * actions, add/remove rows in `_delta_log/_sidecars/` parquet) plus
  * the MULTI-PART legacy layout. Fixtures transform this writer's own
  * classic checkpoint into the foreign layouts byte-for-byte the way
  * a modern Delta writer lays them out, then delete the classic file
  * AND the pre-checkpoint JSON commits, so resolution is provably
  * through the new layout. Refusals: missing multi-part pieces
  * (row loss), checkpointMetadata/version mismatch, unknown reader
  * features still refuse by name. */
class DeltaV2CheckpointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-dv2cp-$tag").toString

  private def df(lo: Long, hi: Long) = {
    import spark.implicits._
    (lo until hi).map(i => (i, i * 2L)).toDF("id", "v")
  }

  private def ids(table: String): Seq[Long] =
    DeltaLite.read(spark, table).select("id").orderBy("id")
      .collect().toSeq.map(_.getLong(0))

  /** Move the single part file of a one-partition parquet write to
    * `dest`, dropping Spark's _SUCCESS/crc noise. */
  private def placeSingleParquet(stagingDir: String, dest: Path): Unit = {
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(stagingDir)).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    assert(part.length == 1, s"expected one part, got $part")
    fs.delete(dest, false)
    assert(fs.rename(part.head, dest))
    fs.delete(new Path(stagingDir), true)
  }

  /** The v2 protocol row every modern v2-checkpoint table declares. */
  private def protoRow = spark.range(1).select(struct(
    lit(3).as("minReaderVersion"), lit(7).as("minWriterVersion"),
    array(lit("v2Checkpoint")).as("readerFeatures"),
    array(lit("v2Checkpoint")).as("writerFeatures")).as("protocol"))

  /** Transform `table`'s classic checkpoint at `cv` into a v2
    * UUID-named top-level + one sidecar, delete the classic file and
    * every JSON commit ≤ cv. */
  private def toV2Checkpoint(table: String, cv: Long,
                             declareVersion: Option[Long] = None): Unit = {
    val logDir = new Path(table, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val classic = new Path(logDir, f"$cv%020d.checkpoint.parquet")
    val cp = spark.read.parquet(classic.toString)
    // sidecar: the file actions (this writer's checkpoints carry only
    // live adds; a remove column, when present, rides along)
    val sideName = "3c6a1f2e-aaaa-bbbb-cccc-000000000001.parquet"
    val sideStage = s"$table/.side-stage"
    val fileCols = Seq("add", "remove").filter(cp.columns.contains)
    cp.select(fileCols.map(col): _*)
      .filter(fileCols.map(c => col(c).isNotNull).reduce(_ || _))
      .coalesce(1).write.mode("overwrite").parquet(sideStage)
    val sideDest = new Path(new Path(logDir, "_sidecars"), sideName)
    placeSingleParquet(sideStage, sideDest)
    val sideLen = fs.getFileStatus(sideDest).getLen
    // top-level: protocol (v2-featured) + metaData + checkpointMetadata
    // + the sidecar pointer
    val metaRows = cp.select("metaData").filter(col("metaData").isNotNull)
    val cpmRow = spark.range(1).select(struct(
      lit(declareVersion.getOrElse(cv)).as("version"))
      .as("checkpointMetadata"))
    val sideRow = spark.range(1).select(struct(
      lit(sideName).as("path"),
      lit(sideLen).as("sizeInBytes")).as("sidecar"))
    val top = protoRow
      .unionByName(metaRows, allowMissingColumns = true)
      .unionByName(cpmRow, allowMissingColumns = true)
      .unionByName(sideRow, allowMissingColumns = true)
    val topStage = s"$table/.top-stage"
    top.coalesce(1).write.mode("overwrite").parquet(topStage)
    placeSingleParquet(topStage, new Path(logDir,
      f"$cv%020d.checkpoint.3c6a1f2e-aaaa-bbbb-cccc-000000000002.parquet"))
    fs.delete(classic, false)
    (0L to cv).foreach(v =>
      fs.delete(new Path(logDir, f"$v%020d.json"), false))
  }

  test("v2 UUID checkpoint with sidecar resolves: DV masks survive, " +
    "post-checkpoint commits fold on top, classic file and old " +
    "commits gone") {
    val t = tmp("v2")
    DeltaLite.export(spark, df(0, 40), t)
    DeltaLite.exportAppend(spark, df(40, 60), t)
    // live DVs must survive the sidecar round trip
    val snap = DeltaLite.snapshot(spark, t)
    val rel = snap.files.head
    val abs = new Path(t, rel).toString
    val positions = spark.read.parquet(abs)
      .select(col("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") % 10 === 0).collect()
    DeltaLite.commitDeletionVectors(spark, t,
      Map(rel -> positions.map(_.getLong(0))))
    val expected = ids(t)
    val cv = DeltaLite.checkpoint(spark, t)
    toV2Checkpoint(t, cv)
    assert(ids(t) === expected,
      "v2-checkpoint resolution must serve the same masked rows")
    // the fold continues over post-checkpoint JSON commits
    DeltaLite.exportAppend(spark, df(100, 110), t)
    assert(ids(t) === expected ++ (100L until 110L))
  }

  test("v2 checkpoint with a JSON top-level file resolves the same " +
    "way (the spec allows either encoding for the checkpoint file)") {
    val t = tmp("v2json")
    DeltaLite.export(spark, df(0, 25), t)
    val expected = ids(t)
    val cv = DeltaLite.checkpoint(spark, t)
    val logDir = new Path(t, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val classic = new Path(logDir, f"$cv%020d.checkpoint.parquet")
    val cp = spark.read.parquet(classic.toString)
    // sidecar parquet as in the parquet-top-level test
    val sideName = "3c6a1f2e-aaaa-bbbb-cccc-00000000000a.parquet"
    val stage = s"$t/.side-stage"
    cp.select("add").filter(col("add").isNotNull)
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val sideDest = new Path(new Path(logDir, "_sidecars"), sideName)
    placeSingleParquet(stage, sideDest)
    // JSON top-level: line-JSON actions, exactly a commit file's shape
    val metaLine = new String(Files.readAllBytes(Paths.get(t,
      "_delta_log", f"${0L}%020d.json"))).split('\n')
      .find(_.contains("\"metaData\"")).get
    val topLines = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],""" +
        """"writerFeatures":["v2Checkpoint"]}}""",
      metaLine,
      s"""{"checkpointMetadata":{"version":$cv}}""",
      s"""{"sidecar":{"path":"$sideName","sizeInBytes":${fs
        .getFileStatus(sideDest).getLen}}}""")
    Files.write(Paths.get(t, "_delta_log",
      f"$cv%020d.checkpoint.3c6a1f2e-aaaa-bbbb-cccc-00000000000b.json"),
      topLines.mkString("\n").getBytes("UTF-8"))
    fs.delete(classic, false)
    (0L to cv).foreach(v =>
      fs.delete(new Path(logDir, f"$v%020d.json"), false))
    assert(ids(t) === expected)
  }

  test("checkpointMetadata version mismatch refuses") {
    val t = tmp("vmm")
    DeltaLite.export(spark, df(0, 10), t)
    val cv = DeltaLite.checkpoint(spark, t)
    toV2Checkpoint(t, cv, declareVersion = Some(cv + 7))
    val e = intercept[java.io.IOException] { ids(t) }
    assert(e.getMessage.contains("mismatched checkpoint"),
      s"got: ${e.getMessage}")
  }

  test("multi-part checkpoint resolves; a missing part refuses by " +
    "count instead of silently dropping rows") {
    val t = tmp("mp")
    DeltaLite.export(spark, df(0, 30), t)
    DeltaLite.exportAppend(spark, df(30, 50), t)
    val expected = ids(t)
    val cv = DeltaLite.checkpoint(spark, t)
    val logDir = new Path(t, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val classic = new Path(logDir, f"$cv%020d.checkpoint.parquet")
    val cp = spark.read.parquet(classic.toString)
    // part 1: non-file actions + adds with even hash; part 2: the rest
    val keyed = cp.withColumn("_slot",
      when(col("add").isNotNull, pmod(hash(col("add.path")), lit(2)))
        .otherwise(lit(0)))
    Seq(0, 1).foreach { slot =>
      val stage = s"$t/.mp-stage-$slot"
      keyed.filter(col("_slot") === slot).drop("_slot")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      placeSingleParquet(stage, new Path(logDir,
        f"$cv%020d.checkpoint.${slot + 1}%010d.${2}%010d.parquet"))
    }
    fs.delete(classic, false)
    (0L to cv).foreach(v =>
      fs.delete(new Path(logDir, f"$v%020d.json"), false))
    // _last_checkpoint declares the part count
    val lcp = new Path(logDir, "_last_checkpoint")
    val out = fs.create(lcp, true)
    try out.write(s"""{"version":$cv,"parts":2}""".getBytes("UTF-8"))
    finally out.close()
    assert(ids(t) === expected)
    // delete one part: the reader must refuse, not serve half a table
    fs.delete(new Path(logDir,
      f"$cv%020d.checkpoint.${2}%010d.${2}%010d.parquet"), false)
    val e = intercept[java.io.IOException] { ids(t) }
    assert(e.getMessage.contains("parts"), s"got: ${e.getMessage}")
  }

  test("timestampNtz reader feature: a foreign v3 table with a " +
    "TIMESTAMP_NTZ column reads value-faithfully (no zone " +
    "adjustment) instead of refusing") {
    import org.apache.spark.sql.types.TimestampNTZType
    val t = tmp("ntz")
    // data file: one NTZ column written by Spark itself
    val data = spark.sql(
      """SELECT id, timestamp_ntz'2024-06-01 12:34:56' + make_interval(0,0,0,0,0,0,id) AS ts
        |FROM range(5)""".stripMargin)
    data.coalesce(1).write.mode("overwrite").parquet(s"$t/.stage")
    val fs = new Path(t).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(s"$t/.stage")).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, new Path(t, "part-ntz-0.parquet"))
    fs.delete(new Path(s"$t/.stage"), true)
    val size = fs.getFileStatus(new Path(t, "part-ntz-0.parquet")).getLen
    // foreign log: v3 protocol requiring timestampNtz, NTZ schema
    val schemaStr =
      """{\"type\":\"struct\",\"fields\":[""" +
        """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},""" +
        """{\"name\":\"ts\",\"type\":\"timestamp_ntz\",\"nullable\":true,\"metadata\":{}}]}"""
    Files.createDirectories(Paths.get(t, "_delta_log"))
    Files.write(Paths.get(t, "_delta_log", f"${0L}%020d.json"),
      (Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["timestampNtz"],""" +
          """"writerFeatures":["timestampNtz"]}}""",
        s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":[],"configuration":{},"createdTime":0}}""",
        s"""{"add":{"path":"part-ntz-0.parquet","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}""")
        .mkString("\n") + "\n").getBytes("UTF-8"))
    val got = DeltaLite.read(spark, t)
    assert(got.schema("ts").dataType === TimestampNTZType,
      s"ts must come back NTZ, got ${got.schema("ts").dataType}")
    // value-faithful under a non-UTC wall clock: NTZ never shifts
    val first = got.orderBy("id").select("ts").head().
      getAs[java.time.LocalDateTime](0)
    assert(first === java.time.LocalDateTime.of(2024, 6, 1, 12, 34, 56),
      s"got $first")
    assert(got.count() === 5L)
  }

  test("JSON v2 checkpoint keeps a STRUCT-inferred configuration: a " +
    "column-mapped table served only from the JSON checkpoint still " +
    "resolves LOGICAL column names") {
    val t = tmp("v2jsoncfg")
    // id-mode column mapping: data files carry physical names
    // (col-1, col-2); only delta.columnMapping.mode=id in metaData
    // configuration makes the reader serve logical names
    DeltaLite.createIdMapped(spark, df(0, 12), t)
    val expected = ids(t)
    val cv = DeltaLite.checkpoint(spark, t)
    val logDir = new Path(t, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val classic = new Path(logDir, f"$cv%020d.checkpoint.parquet")
    val cp = spark.read.parquet(classic.toString)
    val sideName = "3c6a1f2e-aaaa-bbbb-cccc-00000000000c.parquet"
    val stage = s"$t/.side-stage"
    cp.select("add").filter(col("add").isNotNull)
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val sideDest = new Path(new Path(logDir, "_sidecars"), sideName)
    placeSingleParquet(stage, sideDest)
    // JSON top-level: spark.read.json infers the non-empty
    // configuration object as a StructType, not a MapType — the
    // reader must extract it anyway (or the mapping mode is lost and
    // physical names leak out)
    val metaLine = new String(Files.readAllBytes(Paths.get(t,
      "_delta_log", f"${0L}%020d.json"))).split('\n')
      .find(_.contains("\"metaData\"")).get
    assert(metaLine.contains("delta.columnMapping.mode"))
    val topLines = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint","columnMapping"],""" +
        """"writerFeatures":["v2Checkpoint","columnMapping"]}}""",
      metaLine,
      s"""{"checkpointMetadata":{"version":$cv}}""",
      s"""{"sidecar":{"path":"$sideName","sizeInBytes":${fs
        .getFileStatus(sideDest).getLen}}}""")
    Files.write(Paths.get(t, "_delta_log",
      f"$cv%020d.checkpoint.3c6a1f2e-aaaa-bbbb-cccc-00000000000d.json"),
      topLines.mkString("\n").getBytes("UTF-8"))
    fs.delete(classic, false)
    (0L to cv).foreach(v =>
      fs.delete(new Path(logDir, f"$v%020d.json"), false))
    val got = DeltaLite.read(spark, t)
    assert(got.columns.toSeq === Seq("id", "v"),
      s"logical names must survive, got ${got.columns.toSeq}")
    assert(ids(t) === expected)
  }

  test("multi-part checkpoint: the part total declared in FILENAMES " +
    "backstops a _last_checkpoint without \"parts\" — a missing part " +
    "still refuses instead of silently dropping rows") {
    val t = tmp("mpfn")
    DeltaLite.export(spark, df(0, 30), t)
    DeltaLite.exportAppend(spark, df(30, 50), t)
    val expected = ids(t)
    val cv = DeltaLite.checkpoint(spark, t)
    val logDir = new Path(t, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val classic = new Path(logDir, f"$cv%020d.checkpoint.parquet")
    val cp = spark.read.parquet(classic.toString)
    val keyed = cp.withColumn("_slot",
      when(col("add").isNotNull, pmod(hash(col("add.path")), lit(2)))
        .otherwise(lit(0)))
    Seq(0, 1).foreach { slot =>
      val stage = s"$t/.mp-stage-$slot"
      keyed.filter(col("_slot") === slot).drop("_slot")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      placeSingleParquet(stage, new Path(logDir,
        f"$cv%020d.checkpoint.${slot + 1}%010d.${2}%010d.parquet"))
    }
    fs.delete(classic, false)
    (0L to cv).foreach(v =>
      fs.delete(new Path(logDir, f"$v%020d.json"), false))
    // a stale/minimal _last_checkpoint WITHOUT "parts" (the exact
    // case the filename total guards)
    val lcp = new Path(logDir, "_last_checkpoint")
    val out = fs.create(lcp, true)
    try out.write(s"""{"version":$cv}""".getBytes("UTF-8"))
    finally out.close()
    assert(ids(t) === expected)
    fs.delete(new Path(logDir,
      f"$cv%020d.checkpoint.${2}%010d.${2}%010d.parquet"), false)
    val e = intercept[java.io.IOException] { ids(t) }
    assert(e.getMessage.contains("parts"), s"got: ${e.getMessage}")
    // and a part total DISAGREEING across filenames refuses too
    // (mixed checkpoint generations) — content irrelevant, the total
    // check fires first
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new Path(logDir, f"$cv%020d.checkpoint.${1}%010d.${2}%010d.parquet"),
      fs,
      new Path(logDir, f"$cv%020d.checkpoint.${2}%010d.${3}%010d.parquet"),
      false, spark.sparkContext.hadoopConfiguration)
    val e2 = intercept[java.io.IOException] { ids(t) }
    assert(e2.getMessage.contains("disagree"), s"got: ${e2.getMessage}")
  }

  test("unknown reader features still refuse by name next to " +
    "v2Checkpoint") {
    val t = tmp("feat")
    DeltaLite.export(spark, df(0, 5), t)
    val logDir = Paths.get(t, "_delta_log")
    val commit = logDir.resolve(f"${1L}%020d.json")
    Files.write(commit,
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint","futureFeature"],""" +
        """"writerFeatures":["v2Checkpoint","futureFeature"]}}""" + "\n")
        .getBytes("UTF-8"))
    Files.deleteIfExists(logDir.resolve(
      "." + commit.getFileName + ".crc"))
    val e = intercept[java.io.IOException] { ids(t) }
    assert(e.getMessage.contains("futureFeature"),
      s"got: ${e.getMessage}")
  }

  test("v2 checkpoint WRITE mode: native v2Layout lays out UUID top " +
    "+ sidecar, declares the feature, survives vacuum, folds later " +
    "commits") {
    val t = tmp("v2write")
    DeltaLite.export(spark, df(0, 40), t)
    DeltaLite.exportAppend(spark, df(40, 60), t)
    val snap = DeltaLite.snapshot(spark, t)
    val rel = snap.files.head
    val positions = spark.read.parquet(new Path(t, rel).toString)
      .select(col("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") % 7 === 0).collect()
    DeltaLite.commitDeletionVectors(spark, t,
      Map(rel -> positions.map(_.getLong(0))))
    val expected = ids(t)
    val cv = DeltaLite.checkpoint(spark, t, v2Layout = true)
    val logDir = new Path(t, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // layout: no classic file, one UUID top, non-empty _sidecars
    assert(!fs.exists(new Path(logDir,
      f"$cv%020d.checkpoint.parquet")),
      "v2Layout must not write a classic checkpoint")
    val tops = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(f"$cv%020d.checkpoint.") &&
        n.endsWith(".parquet"))
    assert(tops.length === 1, s"expected one UUID top, got $tops")
    assert(fs.listStatus(new Path(logDir, "_sidecars")).nonEmpty,
      "sidecar parquet missing")
    // the top-level file declares the v2Checkpoint feature + version
    val top = spark.read.parquet(
      new Path(logDir, tops.head).toString)
    assert(top.select("checkpointMetadata.version").na.drop()
      .collect().map(_.getLong(0)).toSeq === Seq(cv))
    assert(top.select("protocol.readerFeatures").na.drop()
      .collect().flatMap(_.getSeq[String](0)).contains("v2Checkpoint"))
    // resolution through the new layout after vacuum truncates the log
    val (_, truncated) = DeltaLite.vacuum(spark, t)
    assert(truncated > 0, "vacuum should truncate pre-checkpoint commits")
    assert(ids(t) === expected,
      "v2-layout checkpoint must serve the same masked rows after vacuum")
    // DV masks survived the sidecar round trip
    assert(DeltaLite.snapshot(spark, t).deletionVectors.nonEmpty)
    // the fold continues over post-checkpoint JSON commits
    DeltaLite.exportAppend(spark, df(100, 110), t)
    assert(ids(t) === expected ++ (100L until 110L))
    // and a SECOND v2 checkpoint over the grown state round-trips too
    val cv2 = DeltaLite.checkpoint(spark, t, v2Layout = true)
    assert(cv2 > cv)
    DeltaLite.vacuum(spark, t)
    assert(ids(t) === expected ++ (100L until 110L))
  }

  test("v2 checkpoint WRITE mode over a DeltaSync export: the mirror " +
    "checkpoints v2, vacuums, and still serves the graft table's rows") {
    import graft.warehouse.{DeltaSync, VersionedParquet}
    import spark.implicits._
    val root = tmp("v2sync-graft") + "/t"
    val mirror = tmp("v2sync-delta")
    VersionedParquet.publish(
      (0L until 50L).map(i => (i, i * 3L)).toDF("id", "v"), root,
      keepVersions = 10)
    VersionedParquet.delete(spark, root, col("id") % 5 === 0,
      keepVersions = 10)
    DeltaSync.exportSync(spark, root, mirror)
    val expected = VersionedParquet.read(spark, root)
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ids(mirror) === expected, "export-sync must mirror the table")
    DeltaLite.checkpoint(spark, mirror, v2Layout = true)
    DeltaLite.vacuum(spark, mirror)
    assert(ids(mirror) === expected,
      "v2-checkpointed + vacuumed mirror must still serve the rows")
    // incremental sync continues over the v2 checkpoint
    VersionedParquet.append(spark, root,
      (100L until 110L).map(i => (i, i)).toDF("id", "v"),
      keepVersions = 10)
    DeltaSync.exportSync(spark, root, mirror)
    assert(ids(mirror) === expected ++ (100L until 110L))
  }

  test("v2 checkpoint WRITE on a LEGACY column-mapped table: the " +
    "protocol upgrade enumerates the implied columnMapping feature, " +
    "so a feature-honoring reader keeps serving logical names") {
    import java.nio.charset.StandardCharsets
    // the table another engine wrote with columnMapping=name under a
    // LEGACY protocol (minReader=2/minWriter=5: features implied by
    // the version numbers, no feature lists anywhere)
    val t = tmp("v2colmap")
    spark.range(0, 25).selectExpr("id AS `col-9f1a`",
      "id * 3 AS `col-2b7c`") // physical names
      .coalesce(1).write.parquet(s"$t/.stage")
    val rel = Files.list(Paths.get(t, ".stage")).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq
    rel.foreach(n =>
      Files.move(Paths.get(t, ".stage", n), Paths.get(t, n)))
    def fld(logical: String, phys: String, fid: Int) =
      s"""{\\"name\\":\\"$logical\\",\\"type\\":\\"long\\",""" +
        s"""\\"nullable\\":true,\\"metadata\\":{""" +
        s"""\\"delta.columnMapping.physicalName\\":\\"$phys\\",""" +
        s"""\\"delta.columnMapping.id\\":$fid}}"""
    val schemaJson = s"""{\\"type\\":\\"struct\\",\\"fields\\":[""" +
      fld("id", "col-9f1a", 1) + "," + fld("v", "col-2b7c", 2) + "]}"
    val meta =
      s"""{"metaData":{"id":"x","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":"$schemaJson",""" +
        s""""partitionColumns":[],"configuration":{""" +
        s""""delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"2"},"createdTime":0}}"""
    val adds = rel.map(r =>
      s"""{"add":{"path":"$r","partitionValues":{},"size":1,""" +
        s""""modificationTime":0,"dataChange":true}}""")
    Files.createDirectories(Paths.get(t, "_delta_log"))
    Files.write(Paths.get(t, "_delta_log", f"${0L}%020d.json"),
      (Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        meta) ++ adds)
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
    assert(ids(t) === (0L until 25L), "fixture sanity")
    val cv = DeltaLite.checkpoint(spark, t, v2Layout = true)
    val logDir = new Path(t, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tops = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(f"$cv%020d.checkpoint.") &&
        n.endsWith(".parquet"))
    assert(tops.length === 1)
    val proto = spark.read.parquet(new Path(logDir, tops.head).toString)
      .select("protocol.readerFeatures", "protocol.writerFeatures")
      .na.drop().head()
    // the whole point: upgrading the legacy protocol to table-features
    // must ENUMERATE what the legacy version numbers implied — a list
    // carrying only v2Checkpoint would tell a feature-honoring foreign
    // reader "no mapping here" and serve physical names after vacuum
    assert(proto.getSeq[String](0).contains("columnMapping"),
      s"readerFeatures must carry columnMapping: ${proto.getSeq[String](0)}")
    assert(proto.getSeq[String](0).contains("v2Checkpoint"))
    assert(proto.getSeq[String](1).contains("columnMapping"),
      s"writerFeatures must carry columnMapping: ${proto.getSeq[String](1)}")
    // after vacuum truncates the JSON commits, resolution runs through
    // the checkpoint alone — logical names must still come back
    DeltaLite.vacuum(spark, t)
    val got = DeltaLite.read(spark, t)
    assert(got.columns.toSeq === Seq("id", "v"),
      s"logical names after vacuum, got ${got.columns.toSeq}")
    assert(ids(t) === (0L until 25L))
  }
}
