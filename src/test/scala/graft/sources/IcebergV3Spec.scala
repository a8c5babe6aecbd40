package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg v3 PUFFIN DELETION VECTORS: the read path (blob locate →
  * CRC/magic-checked decode → (file, pos) anti-join), the minimal DV
  * writer (v3 upgrade + merge-on-rewrite), the narrowed v3 refusal
  * matrix, and the Puffin container's structural edges — every
  * corruption refuses loudly rather than serving rows a mask should
  * have hidden. Fixtures come from this repo's own writers (no
  * Iceberg v3 runtime exists in this container); corruption tests
  * flip bytes the way a broken copy would. */
class IcebergV3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-icev3-$tag")
      .toString + "/t"

  private def frame(n: Int, tag: String) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"$tag$i")).toDF("id", "name")
  }

  /** Overwrite a file OUT-OF-BAND (simulating a broken copy) — the
    * Hadoop local FS keeps a `.name.crc` sidecar that would trip its
    * own checksum before the refusal under test fires; drop it. */
  private def mutate(p: java.nio.file.Path, bytes: Array[Byte]): Unit = {
    Files.write(p, bytes, StandardOpenOption.TRUNCATE_EXISTING)
    Files.deleteIfExists(p.resolveSibling("." + p.getFileName + ".crc"))
  }

  /** (file → positions of ids satisfying pred), via the raw scan. */
  private def positionsOf(loc: String,
                          pred: Long => Boolean): Map[String, Array[Long]] = {
    val files = IcebergLite.snapshot(spark, loc).files
    spark.read.parquet(files: _*)
      .select(col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("pos"), col("id"))
      .collect()
      .filter(r => pred(r.getLong(2)))
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(1)).sorted }
  }

  test("v3 DV commit: masked read, snapshot isolation, metadata at " +
    "format-version 3, filesTable lists the puffin blob") {
    val loc = tmp("dv")
    val s1 = IcebergLite.export(spark, frame(50, "a"), loc)
    val dels = positionsOf(loc, _ % 5 == 0)
    val s2 = IcebergLite.exportDeletionVectors(spark, loc, dels)
    val live = IcebergLite.read(spark, loc)
    assert(live.count() === 40L)
    assert(live.filter(col("id") % 5 === 0).count() === 0L)
    // pre-DV snapshot still serves every row
    assert(IcebergLite.read(spark, loc, Some(s1)).count() === 50L)
    assert(IcebergLite.read(spark, loc, Some(s2)).count() === 40L)
    // the table really is v3 now
    val hint = new String(Files.readAllBytes(Paths.get(
      s"$loc/metadata/version-hint.text"))).trim
    val metaTxt = new String(Files.readAllBytes(Paths.get(
      s"$loc/metadata/v$hint.metadata.json")))
    assert("\"format-version\"\\s*:\\s*3".r.findFirstIn(metaTxt).nonEmpty,
      "metadata must declare format-version 3")
    // planning metadata: one content=1 PUFFIN row per DV
    val ft = IcebergLite.filesTable(spark, loc)
      .filter(col("content") === 1).collect()
    assert(ft.length === dels.size)
    assert(ft.forall(_.getString(1).endsWith(".puffin")))
  }

  test("DV merge: a second commit against the same file unions the " +
    "positions; the reader resolves the carried superseded entry by " +
    "sequence") {
    val loc = tmp("dvmerge")
    IcebergLite.export(spark, frame(30, "a"), loc)
    IcebergLite.exportDeletionVectors(spark, loc,
      positionsOf(loc, _ % 3 == 0))
    assert(IcebergLite.read(spark, loc).count() === 20L)
    // second DV on the same file: % 4 rows go too (merge, not replace)
    IcebergLite.exportDeletionVectors(spark, loc,
      positionsOf(loc, _ % 4 == 0))
    val live = IcebergLite.read(spark, loc)
    assert(live.filter(col("id") % 3 === 0 || col("id") % 4 === 0)
      .count() === 0L)
    assert(live.count() === 30L - (0 until 30).count(i =>
      i % 3 == 0 || i % 4 == 0))
    // both DV entries are in the carried manifests; snapshot() must
    // have kept only the newest per referenced file
    val snap = IcebergLite.snapshot(spark, loc)
    assert(snap.dvs.length === snap.dvs.map(_.referencedDataFile)
      .distinct.length)
  }

  test("v3 refusal matrix is narrowed, not dropped: v4 refuses, " +
    "initial-default refuses, v2 writers refuse v3 tables") {
    val loc = tmp("refuse")
    IcebergLite.export(spark, frame(10, "a"), loc)
    IcebergLite.exportDeletionVectors(spark, loc,
      positionsOf(loc, _ == 0L))
    // append is a LEGAL v3 write: it lands AND the metadata stays v3
    // (no silent downgrade — the downgrade was the old refusal's
    // whole reason)
    IcebergLite.appendManifest(spark, frame(3, "b"), loc)
    val metaDir0 = Paths.get(loc, "metadata")
    val hint0 = new String(Files.readAllBytes(
      metaDir0.resolve("version-hint.text"))).trim
    val meta0 = new String(Files.readAllBytes(
      metaDir0.resolve(s"v$hint0.metadata.json")))
    assert("\"format-version\"\\s*:\\s*3".r.findFirstIn(meta0).nonEmpty,
      "v3 append must re-emit v3 metadata")
    assert(IcebergLite.read(spark, loc).count() === 12L,
      "10 - 1 DV-deleted + 3 appended")
    // pos-delete FILES and full-state overwrite still refuse by name
    val e2 = intercept[Exception] {
      import spark.implicits._
      IcebergLite.exportPositionDeletes(spark,
        Seq(("x", 0L)).toDF("file_path", "pos"), loc)
    }
    assert(e2.getMessage.contains("deletion vectors"))
    val e3 = intercept[Exception] {
      IcebergLite.export(spark, frame(3, "c"), loc, overwrite = true)
    }
    assert(e3.getMessage.contains("downgrade"))
    // hand-mutate to v4: read refuses naming the version
    val metaDir = Paths.get(loc, "metadata")
    val hint = new String(Files.readAllBytes(
      metaDir.resolve("version-hint.text"))).trim
    val metaP = metaDir.resolve(s"v$hint.metadata.json")
    val txt = new String(Files.readAllBytes(metaP))
    val bumped = "\"format-version\"\\s*:\\s*3".r
      .replaceAllIn(txt, "\"format-version\": 4")
    assert(bumped != txt, "fixture mutation missed format-version")
    mutate(metaP, bumped.getBytes)
    val e4 = intercept[java.io.IOException] {
      IcebergLite.read(spark, loc)
    }
    assert(e4.getMessage.contains("format-version 4"))
    // a v3 schema field with an initial-default refuses by name
    // (the DV commit rewrote metadata with jackson-compact schema
    // JSON; assert the injection actually landed)
    val injected = "\"name\"\\s*:\\s*\"name\"".r.replaceAllIn(txt,
      "\"name\":\"name\",\"initial-default\":\"zz\"")
    assert(injected != txt, "fixture injection missed the schema field")
    mutate(metaP, injected.getBytes)
    val e5 = intercept[java.io.IOException] {
      IcebergLite.read(spark, loc)
    }
    assert(e5.getMessage.contains("initial-default"),
      s"got: ${e5.getMessage}")
  }

  test("v2-to-v3 upgrade seeds next-row-id past the pre-existing " +
    "data rows (ids reserved for rows written before lineage)") {
    val loc = tmp("seedrows")
    IcebergLite.export(spark, frame(10, "a"), loc) // v2: 10 data rows
    IcebergLite.exportDeletionVectors(spark, loc,
      positionsOf(loc, _ == 1L)) // first v3 stamp
    val metaDir = Paths.get(loc, "metadata")
    val hint = new String(Files.readAllBytes(
      metaDir.resolve("version-hint.text"))).trim
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(new String(Files.readAllBytes(
      metaDir.resolve(s"v$hint.metadata.json"))))
    // a zero seed would hand the next append the SAME id range a
    // conformant reader derives for the 10 pre-existing rows
    assert(meta.get("next-row-id").asLong === 10L,
      "the upgrade must reserve ids for pre-existing data rows")
    val snaps = meta.get("snapshots").elements()
    var last: com.fasterxml.jackson.databind.JsonNode = null
    while (snaps.hasNext) last = snaps.next()
    assert(last.get("first-row-id").asLong === 10L,
      "the upgrade snapshot starts AFTER the reserved range")
    // and the counter keeps advancing normally from the seed
    IcebergLite.appendManifest(spark, frame(3, "b"), loc)
    val after = mapper.readTree(new String(Files.readAllBytes(
      metaDir.resolve(s"v${new String(Files.readAllBytes(
        metaDir.resolve("version-hint.text"))).trim}.metadata.json"))))
    assert(after.get("next-row-id").asLong === 13L)
  }

  test("v3 writes preserve foreign metadata state and carry row " +
    "lineage: unknown fields survive, next-row-id advances by added " +
    "rows, delete snapshots advance nothing") {
    val loc = tmp("lineage")
    IcebergLite.export(spark, frame(10, "a"), loc)
    IcebergLite.exportDeletionVectors(spark, loc,
      positionsOf(loc, _ == 1L)) // upgrades the table to v3
    // a FOREIGN v3 writer's state: row lineage counters plus a field
    // this writer has never heard of — both must carry forward
    // verbatim through our appends (the regenerating-template bug
    // dropped exactly this)
    val metaDir = Paths.get(loc, "metadata")
    def hint() = new String(Files.readAllBytes(
      metaDir.resolve("version-hint.text"))).trim
    def metaTxt() = new String(Files.readAllBytes(
      metaDir.resolve(s"v${hint()}.metadata.json")))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val pre = mapper.readTree(metaTxt())
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    pre.put("next-row-id", 1000L)
    pre.set[com.fasterxml.jackson.databind.node.ObjectNode](
      "statistics", mapper.readTree("""[{"snapshot-id": 1,
        "statistics-path": "/nowhere.puffin"}]"""))
    mutate(metaDir.resolve(s"v${hint()}.metadata.json"),
      mapper.writeValueAsString(pre).getBytes)
    // append 3 data rows: first-row-id = the prior next-row-id, the
    // table counter advances by the rows added
    IcebergLite.appendManifest(spark, frame(3, "b"), loc)
    val after = mapper.readTree(metaTxt())
    assert(after.get("next-row-id").asLong === 1003L,
      "next-row-id must advance by the appended row count")
    assert(after.get("statistics") != null &&
      after.get("statistics").isArray,
      "a foreign v3-only field must carry forward verbatim")
    val snaps = after.get("snapshots").elements()
    var lastSnap: com.fasterxml.jackson.databind.JsonNode = null
    while (snaps.hasNext) lastSnap = snaps.next()
    assert(lastSnap.get("first-row-id").asLong === 1000L,
      "the append snapshot is assigned the prior next-row-id")
    assert(lastSnap.get("summary").get("added-rows").asText === "3")
    // an equality-delete snapshot adds no data rows: first-row-id is
    // assigned, the counter stays put
    import spark.implicits._
    IcebergLite.exportEqualityDeletes(spark,
      Seq(0L).toDF("id"), loc)
    val afterDel = mapper.readTree(metaTxt())
    assert(afterDel.get("next-row-id").asLong === 1003L,
      "delete snapshots advance nothing")
    val snaps2 = afterDel.get("snapshots").elements()
    var lastDel: com.fasterxml.jackson.databind.JsonNode = null
    while (snaps2.hasNext) lastDel = snaps2.next()
    assert(lastDel.get("first-row-id").asLong === 1003L)
    assert(lastDel.get("summary").get("added-rows").asText === "0")
    // and the data still reads right through it all (the eq-delete of
    // id 0 hits the base file AND the earlier append — both sequence
    // below the delete)
    assert(IcebergLite.read(spark, loc).count() === 10L,
      "10 - 1 DV + 3 appended - 2 eq-deleted (base id0 + appended id0)")
  }

  test("a v3-written table round-trips through EVERY repo read path: " +
    "plain, pruned, time-travel, metadata tables, sync (the in-repo " +
    "conformance net — no foreign v3 runtime exists in this sandbox)") {
    val loc = tmp("roundtrip")
    IcebergLite.export(spark, frame(30, "a"), loc)
    val s1 = IcebergLite.snapshot(spark, loc).snapshotId
    IcebergLite.exportDeletionVectors(spark, loc,
      positionsOf(loc, _ % 5 == 0)) // → v3 with Puffin DVs
    IcebergLite.appendManifest(spark, frame(6, "b"), loc)
    import spark.implicits._
    IcebergLite.exportEqualityDeletes(spark, Seq(1L, 2L).toDF("id"), loc)
    // plain read: 30 - 6 DV'd - (2 eq-deleted from the base + matching
    // appended ids 1,2) = the model below
    val model = ((0L until 30L).filterNot(_ % 5 == 0) ++
      (0L until 6L)).diff(Seq(1L, 2L, 1L, 2L))
    val live = IcebergLite.read(spark, loc).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(live.toSeq === model.sorted,
      s"plain read: got ${live.length} rows")
    // pruned read: min/max bounds + delete application must agree
    val pruned = IcebergLite.readPruned(spark, loc, "id", 0L, 4L)._1
      .select("id").collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === model.filter(i => i >= 0 && i <= 4).sorted)
    // time travel to the pre-DV snapshot
    assert(IcebergLite.read(spark, loc, Some(s1)).count() === 30L)
    // metadata tables enumerate data, DV (puffin) and delete files
    val ft = IcebergLite.filesTable(spark, loc)
    assert(ft.filter(col("content") === 0).count() >= 2,
      "data files from both appends")
    assert(ft.filter(col("content") === 1).count() >= 1,
      "the DV / delete files surface in the files table")
    assert(IcebergLite.snapshotsTable(spark, loc).count() >= 4)
    assert(IcebergLite.snapshotIds(spark, loc).nonEmpty)
    // sync: the v3 table ingests into a graft mirror through the same
    // protocol walk (IcebergSync is a READ consumer of the v3 state)
    val mirror = tmp("roundtrip-mirror")
    graft.warehouse.IcebergSync.sync(spark, loc, mirror)
    val mirrored = graft.warehouse.VersionedParquet.read(spark, mirror)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(mirrored.toSeq === model.sorted,
      "the synced mirror must carry exactly the v3 table's live rows")
  }

  test("puffin structural edges: corrupt head magic, corrupt CRC, " +
    "compressed-footer flag, and blob out of bounds all refuse") {
    val loc = tmp("corrupt")
    IcebergLite.export(spark, frame(20, "a"), loc)
    IcebergLite.exportDeletionVectors(spark, loc,
      positionsOf(loc, _ < 5L))
    val snap = IcebergLite.snapshot(spark, loc)
    val dv = snap.dvs.head
    val puffin = Paths.get(new Path(dv.puffinPath).toUri.getPath)
    val orig = Files.readAllBytes(puffin)
    def restore(): Unit = mutate(puffin, orig)
    // 1. head magic
    val b1 = orig.clone(); b1(0) = 'X'
    mutate(puffin, b1)
    val e1 = intercept[Exception] {
      IcebergLite.read(spark, loc).count()
    }
    assert(e1.getMessage.contains("magic"))
    restore()
    // 2. one bit of the bitmap flips → CRC catches it
    val b2 = orig.clone()
    b2(dv.offset.toInt + 8) = (b2(dv.offset.toInt + 8) ^ 0x40).toByte
    mutate(puffin, b2)
    val e2 = intercept[Exception] {
      IcebergLite.read(spark, loc).count()
    }
    assert(e2.getMessage.toLowerCase.contains("crc") ||
      e2.getMessage.contains("magic"))
    restore()
    // 3. compressed-footer flag set → footer parsing refuses (the
    // manifest-driven read path never consults the footer — the
    // blob index does)
    val b3 = orig.clone()
    b3(b3.length - 8) = 1 // first flag byte, bit 0
    mutate(puffin, b3)
    val e3 = intercept[Exception] {
      PuffinLite.blobs(spark, dv.puffinPath)
    }
    assert(e3.getMessage.contains("flags"))
    restore()
    // 4. a blob that points past the blob region refuses via the
    // footer's bounds check
    val e4 = intercept[Exception] {
      PuffinLite.readDvPositions(spark, dv.puffinPath,
        dv.offset, 4L) // shorter than length+magic+CRC
    }
    assert(e4.getMessage.contains("shorter"))
    // sanity after all restores: the mask still serves
    assert(IcebergLite.read(spark, loc).count() === 15L)
  }

  test("bounds-pruned scan over a v3 DV-bearing table masks exactly " +
    "like the full read (q263 discipline applied to DVs)") {
    import spark.implicits._
    val loc = tmp("dvprune")
    // 4 range-disjoint files so the manifest bounds actually prune
    val df = (0L until 400L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartitionByRange(4, col("id"))
    IcebergLite.export(spark, df, loc)
    IcebergLite.exportDeletionVectors(spark, loc,
      positionsOf(loc, _ % 10 == 3))
    val (rows, scanned, total) =
      IcebergLite.readPruned(spark, loc, "id", 100L, 199L)
    assert(total === 4 && scanned < total,
      s"expected a pruned plan, scanned $scanned of $total")
    // pruned == full-read filter, DV mask applied to the kept subset
    val full = IcebergLite.read(spark, loc)
      .filter(col("id") >= 100L && col("id") <= 199L)
    assert(rows.count() === full.count())
    assert(rows.filter(col("id") % 10 === 3).count() === 0L)
    assert(rows.count() === 90L)
  }

  test("puffin writer/reader agree on the blob index") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-puffin").toString
    val p = s"$dir/x.puffin"
    val placed = PuffinLite.writeDvFile(spark, p, 7L,
      Seq("f1" -> Array(1L, 5L, 1000000L), "f2" -> Array(0L)))
    val metas = PuffinLite.blobs(spark, p)
    assert(metas.length === 2)
    assert(metas.forall(_.blobType == "deletion-vector-v1"))
    assert(metas.map(_.properties("referenced-data-file")).toSet ===
      Set("f1", "f2"))
    val (off, len, card) = placed("f1")
    assert(card === 3L)
    assert(PuffinLite.readDvPositions(spark, p, off, len).toSeq ===
      Seq(1L, 5L, 1000000L))
  }
}
