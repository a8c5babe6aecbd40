package graft.sources

import java.io.IOException
import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Protocol-minimal reader for Delta Lake transaction logs — the
  * import half of the interop story (q181's manifest export is the
  * export half): consume tables that OTHER engines wrote in the open
  * Delta format (delta.io PROTOCOL.md), without the Delta jars.
  *
  * What it speaks, per the published protocol:
  *   - `_delta_log/%020d.json` commits — JSON-lines actions; `add`
  *     and `remove` fold in commit order (later action on a path
  *     wins) to the live file set; `metaData` carries the schema
  *     (Delta's `schemaString` IS Spark's StructType JSON) and the
  *     partition columns; `protocol` gates what we may read.
  *   - parquet checkpoints — `_last_checkpoint` names a compacted
  *     state (`add`/`remove` as nested structs in one parquet); the
  *     reader starts from it and folds only the JSON suffix, so a
  *     10⁴-commit table costs one parquet read + a handful of JSON
  *     lines, not a full log walk.
  *   - time travel — `asOf` caps the folded commit range.
  *
  * Column mapping (NAME mode, reader version 2 or the v3
  * `columnMapping` table feature) is READ: parquet files carry
  * physical names from the schema's
  * `delta.columnMapping.physicalName` field metadata and the frame
  * comes back with logical names. DELETION VECTORS (the v3
  * `deletionVectors` feature) are READ too: each live file's DV —
  * inline z85 or a CRC-trailed `deletion_vector_<uuid>.bin` blob,
  * RoaringBitmapArray portable format, decoded by [[RoaringDv]] with
  * no Delta/Roaring jars — applies at scan as a (file, row_index)
  * anti-join, the same mechanism as the in-house `_dv` tier and
  * IcebergLite's position deletes. What it refuses, loudly:
  * `minReaderVersion` above 2 except a v3 whose readerFeatures are
  * all implemented, ID-mode column mapping (field-id resolution),
  * corrupt DV blobs (magic/size/CRC/cardinality mismatches) — each
  * refusal names the feature; Delta's own compatibility rule is
  * exactly this check. Partitioned tables resolve through Spark's
  * directory inference (Delta lays partitioned files out in
  * Hive-style `col=value/` directories) anchored at the table root
  * via `basePath`.
  *
  * Scale shape: the log fold is O(commits since checkpoint) driver
  * metadata — the same bound Delta's own reader has — and the data
  * read is an ordinary pruned parquet scan over the live files.
  */
object DeltaLite {

  /** A deletion-vector descriptor, verbatim from `add.deletionVector`
    * (PROTOCOL.md): storage type "i" inline z85 / "u" table-relative
    * UUID file / "p" absolute path, the encoded payload or path, the
    * blob offset inside a DV file, its byte size, and the deleted-row
    * count. */
  final case class Dv(storageType: String, pathOrInlineDv: String,
                      offset: Option[Long], sizeInBytes: Int,
                      cardinality: Long)

  /** A resolved table state: live data files (table-relative),
    * partition columns, declared schema, the version folded to, the
    * column-mapping mode ("none" | "name" | "id" — from
    * `delta.columnMapping.mode`), and each live file's deletion
    * vector (absent key = no rows masked). */
  /** Per-file statistics from an add action's `stats` JSON — numeric
    * (int/long) min/max only, the kinds the pruning planner compares;
    * other column types stay in the JSON for foreign readers but are
    * not folded here. */
  final case class AddStats(numRecords: Long,
                            mins: Map[String, Long],
                            maxs: Map[String, Long],
                            json: String)

  /** The last protocol action folded: (minReaderVersion,
    * minWriterVersion, readerFeatures, writerFeatures) — carried so
    * checkpoint() can re-emit it (a checkpoint without the protocol
    * action is spec-invalid for foreign readers). */
  final case class Protocol(minReader: Int, minWriter: Int,
                            readerFeatures: Seq[String],
                            writerFeatures: Seq[String])

  final case class Snapshot(files: Seq[String],
                            partitionColumns: Seq[String],
                            schema: Option[StructType],
                            version: Long,
                            columnMappingMode: String = "none",
                            deletionVectors: Map[String, Dv] = Map.empty,
                            stats: Map[String, AddStats] = Map.empty,
                            partitionValues: Map[String,
                              Map[String, String]] = Map.empty,
                            configuration: Map[String, String] =
                              Map.empty,
                            protocol: Protocol = Protocol(1, 2, Nil, Nil),
                            sizes: Map[String, Long] = Map.empty)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def readText(spark: SparkSession, p: Path): String = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var r = in.read(buf)
      while (r > 0) { out.write(buf, 0, r); r = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Fold the log to the live state at `asOf` (default: latest). */
  def snapshot(spark: SparkSession, table: String,
               asOf: Option[Long] = None): Snapshot = {
    val logDir = new Path(table, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir))
      throw new IOException(s"$table has no _delta_log — not a Delta table")
    val commits = fs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("\\d{20}\\.json") =>
        n.take(20).toLong -> n }
      .filter { case (v, _) => asOf.forall(v <= _) }
      .sortBy(_._1)
    if (commits.isEmpty && asOf.isDefined)
      throw new IOException(s"$table has no commit at or before " +
        s"version ${asOf.get}")
    // parquet checkpoint: start the fold there when one applies
    val lastCp = Option(new Path(logDir, "_last_checkpoint"))
      .filter(fs.exists(_))
      .map(p => mapper.readTree(readText(spark, p)))
    val checkpoint: Option[Long] = lastCp
      .map(_.get("version").asLong)
      .filter(v => asOf.forall(v <= _))
    // multi-part checkpoints declare their part count — a missing
    // part would silently drop its add/remove rows
    val cpParts: Option[Int] = lastCp
      .flatMap(n => Option(n.get("parts"))).map(_.asInt)
    val live = mutable.LinkedHashMap.empty[String, Option[Dv]]
    val fileStats = mutable.LinkedHashMap.empty[String, AddStats]
    val filePartVals =
      mutable.LinkedHashMap.empty[String, Map[String, String]]
    val fileSizes = mutable.LinkedHashMap.empty[String, Long]
    var partCols: Seq[String] = Nil
    var schema: Option[StructType] = None
    var configuration: Map[String, String] = Map.empty
    var protocol: Protocol = Protocol(1, 2, Nil, Nil)
    def mappingMode: String =
      configuration.getOrElse("delta.columnMapping.mode", "none")
    // reader versions: 1 = base, 2 = column mapping, 3 = table
    // features (accept iff every readerFeature is one we implement).
    // Anything else is a silent-misread hazard — Delta's own
    // compatibility rule is this check. Applied to protocol actions
    // from BOTH the JSON commits and the checkpoint.
    def checkProtocol(p: Protocol): Unit = {
      if (p.minReader == 3) {
        // timestampNtz needs no read-path logic of its own: the
        // schemaString types the column TIMESTAMP_NTZ and Spark's
        // parquet reader speaks isAdjustedToUTC=false natively — the
        // feature flag exists because OLD readers would misread the
        // values as zone-adjusted, which this one does not.
        val unsupported = p.readerFeatures.toSet --
          Set("columnMapping", "deletionVectors", "v2Checkpoint",
            "timestampNtz")
        if (unsupported.nonEmpty)
          throw new IOException(s"$table requires Delta reader " +
            s"features ${unsupported.mkString(", ")} — this " +
            "reader implements columnMapping, deletionVectors, " +
            "v2Checkpoint and timestampNtz only and refuses rather " +
            "than misread")
      } else if (p.minReader > 2)
        throw new IOException(s"$table requires Delta " +
          s"minReaderVersion ${p.minReader}; this reader speaks " +
          "versions 1-2 (base + column mapping) and refuses rather " +
          "than misread")
    }
    checkpoint.foreach { cv =>
      // Three checkpoint layouts, resolved in spec order: CLASSIC
      // (n.checkpoint.parquet), MULTI-PART (n.checkpoint.%010d-of-
      // %010d.parquet — all parts union), and V2 UUID-named
      // (n.checkpoint.<uuid>.{parquet|json} — the top-level file
      // carries checkpointMetadata + sidecar actions; add/remove
      // live in _delta_log/_sidecars/ parquet files). V2 is the
      // v2Checkpoint table feature checkProtocol accepts above.
      val classic = new Path(logDir, f"$cv%020d.checkpoint.parquet")
      val df: DataFrame =
        if (fs.exists(classic)) spark.read.parquet(classic.toString)
        else {
          val prefix = f"$cv%020d.checkpoint."
          val cands = fs.listStatus(logDir).toSeq.map(_.getPath)
            .filter(_.getName.startsWith(prefix))
          if (cands.isEmpty)
            throw new IOException(s"$table: _last_checkpoint names " +
              s"version $cv but no checkpoint file exists — the log " +
              "cannot be resolved; refusing")
          val multiPart =
            """\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet""".r
          val parts = cands.filter(p =>
            multiPart.pattern.matcher(p.getName).matches)
          val top: DataFrame =
            if (parts.nonEmpty) {
              // each part's filename declares the total (%010d.%010d),
              // so a missing part is detectable even when
              // _last_checkpoint is stale/corrupt or lacks "parts" —
              // a silently dropped part silently drops its add/remove
              // rows, which is exactly the row-loss class this guards
              val declaredTotals = parts.map(_.getName
                .split("\\.")(3).toInt).distinct
              if (declaredTotals.length != 1)
                throw new IOException(s"$table: checkpoint part files " +
                  "disagree on the part total (" +
                  s"${declaredTotals.sorted.mkString(", ")}) — mixed " +
                  "checkpoint generations; refusing")
              val need = cpParts.getOrElse(declaredTotals.head)
              if (parts.length != need ||
                  declaredTotals.head != need)
                throw new IOException(s"$table: checkpoint declares " +
                  s"$need parts (filenames say ${declaredTotals.head}) " +
                  s"but ${parts.length} exist — a missing part " +
                  "silently drops its rows; refusing")
              spark.read.parquet(parts.sortBy(_.getName)
                .map(_.toString): _*)
            }
            else {
              // v2: each UUID names one COMPLETE checkpoint — any
              // one serves; take the lexically last for determinism
              val v2 = cands.filter(p =>
                p.getName.endsWith(".parquet") ||
                  p.getName.endsWith(".json")).sortBy(_.getName)
              val pick = v2.lastOption.getOrElse(
                throw new IOException(s"$table: checkpoint files " +
                  s"${cands.map(_.getName).mkString(", ")} match no " +
                  "known layout (classic, multi-part, v2 uuid); " +
                  "refusing"))
              if (pick.getName.endsWith(".json"))
                spark.read.json(pick.toString)
              else spark.read.parquet(pick.toString)
            }
          if (!top.columns.contains("sidecar")) top
          else {
            // sanity: the top-level file must declare the version
            // _last_checkpoint promised
            if (top.columns.contains("checkpointMetadata")) {
              val declared = top.select("checkpointMetadata.version")
                .na.drop().collect().map(_.getLong(0))
              if (declared.nonEmpty && !declared.contains(cv))
                throw new IOException(s"$table: v2 checkpoint " +
                  s"declares version ${declared.mkString(", ")} but " +
                  s"_last_checkpoint names $cv — refusing a " +
                  "mismatched checkpoint")
            }
            val sideDir = new Path(logDir, "_sidecars")
            val sides = top.select("sidecar.path").na.drop()
              .collect().map(_.getString(0)).toSeq.map { rel =>
                val p = new Path(rel)
                if (p.isAbsolute) p else new Path(sideDir, rel)
              }
            sides.map(p => spark.read.parquet(p.toString))
              .foldLeft(top)((a, b) =>
                a.unionByName(b, allowMissingColumns = true))
          }
        }
      val names = df.columns.toSet
      if (names.contains("protocol"))
        df.select("protocol")
          .filter(org.apache.spark.sql.functions.col("protocol")
            .isNotNull).collect()
          .foreach { r =>
            val pr = r.getStruct(0)
            if (pr != null && !pr.isNullAt(
                pr.fieldIndex("minReaderVersion"))) {
              val fields = pr.schema.fieldNames.toSet
              def feats(f: String): Seq[String] =
                if (fields.contains(f) && !pr.isNullAt(pr.fieldIndex(f)))
                  pr.getSeq[String](pr.fieldIndex(f))
                else Nil
              // a JSON-encoded v2 checkpoint infers these as LONG,
              // a parquet one stores INT — accept both
              def intOf(f: String): Int =
                pr.get(pr.fieldIndex(f)) match {
                  case i: Int => i
                  case l: Long => l.toInt
                  case other => other.toString.toInt
                }
              protocol = Protocol(
                intOf("minReaderVersion"),
                if (fields.contains("minWriterVersion") &&
                    !pr.isNullAt(pr.fieldIndex("minWriterVersion")))
                  intOf("minWriterVersion") else 2,
                feats("readerFeatures"), feats("writerFeatures"))
              checkProtocol(protocol)
            }
          }
      if (names.contains("metaData")) {
        df.select("metaData.partitionColumns", "metaData.schemaString")
          .collect().foreach { r =>
            if (!r.isNullAt(0)) partCols = r.getSeq[String](0)
            if (!r.isNullAt(1)) schema = Some(
              DataType.fromJson(r.getString(1)).asInstanceOf[StructType])
          }
        val metaStruct = df.schema("metaData").dataType
          .asInstanceOf[StructType]
        // a JSON-encoded v2 checkpoint infers the configuration
        // object as a STRUCT (one field per key), a parquet one
        // stores a MAP — read both; skipping the struct form would
        // silently drop table config (e.g. columnMapping.mode) and
        // serve physical column names
        if (metaStruct.fieldNames.contains("configuration"))
          metaStruct("configuration").dataType match {
            case _: org.apache.spark.sql.types.MapType =>
              df.select("metaData.configuration").na.drop().collect()
                .foreach { r =>
                  configuration = r.getMap[String, String](0).toMap
                }
            case st: StructType if st.fields.nonEmpty =>
              df.select("metaData.configuration").na.drop().collect()
                .foreach { r =>
                  val s = r.getStruct(0)
                  configuration = st.fieldNames.zipWithIndex.flatMap {
                    case (k, i) =>
                      if (s.isNullAt(i)) None
                      else Some(k -> String.valueOf(s.get(i)))
                  }.toMap
                }
            case _ => // empty struct: no configuration to carry
          }
      }
      val adds =
        if (names.contains("add"))
          df.select("add.path").na.drop().collect().map(_.getString(0))
        else Array.empty[String]
      // a checkpointed add may carry a deletion vector; IGNORING it
      // would resurrect its masked rows on the very first read
      val cpDvs: Map[String, Dv] =
        if (names.contains("add") && df.schema("add").dataType
            .asInstanceOf[StructType].fieldNames.contains("deletionVector"))
          df.select("add.path", "add.deletionVector.storageType",
            "add.deletionVector.pathOrInlineDv",
            "add.deletionVector.offset", "add.deletionVector.sizeInBytes",
            "add.deletionVector.cardinality")
            .collect().flatMap { r =>
              if (r.isNullAt(0) || r.isNullAt(1)) None
              else Some(r.getString(0) -> Dv(r.getString(1),
                r.getString(2),
                if (r.isNullAt(3)) None else Some(r.getLong(3)),
                r.getInt(4), r.getLong(5)))
            }.toMap
        else Map.empty
      val removes =
        if (names.contains("remove"))
          df.select("remove.path").na.drop().collect().map(_.getString(0))
        else Array.empty[String]
      // checkpointed adds may carry `stats` — dropping them would
      // silently degrade file skipping to scan-everything after the
      // first checkpoint
      val addFields =
        if (names.contains("add")) df.schema("add").dataType
          .asInstanceOf[StructType].fieldNames.toSet
        else Set.empty[String]
      if (addFields.contains("stats"))
        df.select("add.path", "add.stats").collect().foreach { r =>
          if (!r.isNullAt(0) && !r.isNullAt(1))
            fileStats.put(r.getString(0), parseAddStats(r.getString(1)))
        }
      // per-add partitionValues survive the checkpoint (dropping them
      // would silently degrade partition pruning to scan-everything)
      if (addFields.contains("partitionValues"))
        df.select("add.path", "add.partitionValues").collect()
          .foreach { r =>
            if (!r.isNullAt(0) && !r.isNullAt(1)) {
              val pv = r.getMap[String, String](1).toMap
              if (pv.nonEmpty) filePartVals.put(r.getString(0), pv)
            }
          }
      if (addFields.contains("size"))
        df.select("add.path", "add.size").collect().foreach { r =>
          if (!r.isNullAt(0) && !r.isNullAt(1))
            fileSizes.put(r.getString(0), r.getLong(1))
        }
      adds.foreach(p => live.put(p, cpDvs.get(p)))
      removes.foreach(live.remove)
    }
    commits.filter { case (v, _) => checkpoint.forall(v > _) }
      .foreach { case (_, name) =>
        readText(spark, new Path(logDir, name)).split('\n')
          .filter(_.trim.nonEmpty).foreach { line =>
            val a = mapper.readTree(line)
            if (a.has("protocol")) {
              val p = a.get("protocol")
              val mrv = p.get("minReaderVersion").asInt
              def feats(f: String): Option[Seq[String]] =
                Option(p.get(f)).filterNot(_.isNull)
                  .map(_.elements().asScala.map(_.asText).toSeq)
              // v3 REQUIRES the feature list; absent = malformed, and
              // guessing what the writer needed would be a misread
              if (mrv == 3 && feats("readerFeatures").isEmpty)
                throw new IOException(s"$table declares Delta " +
                  s"minReaderVersion 3 with no readerFeatures — " +
                  "malformed protocol action; refusing rather than " +
                  "guessing the required features")
              protocol = Protocol(mrv,
                Option(p.get("minWriterVersion")).filterNot(_.isNull)
                  .map(_.asInt).getOrElse(2),
                feats("readerFeatures").getOrElse(Nil),
                feats("writerFeatures").getOrElse(Nil))
              checkProtocol(protocol)
            }
            if (a.has("metaData")) {
              val m = a.get("metaData")
              if (m.has("configuration") && !m.get("configuration").isNull)
                configuration = m.get("configuration").fields().asScala
                  .map(e => e.getKey -> e.getValue.asText).toMap
              if (m.has("partitionColumns")) {
                val it = m.get("partitionColumns").elements()
                val cols = mutable.ArrayBuffer.empty[String]
                while (it.hasNext) cols += it.next().asText()
                partCols = cols.toSeq
              }
              if (m.has("schemaString") && !m.get("schemaString").isNull)
                schema = Some(DataType.fromJson(
                  m.get("schemaString").asText).asInstanceOf[StructType])
            }
            if (a.has("add")) {
              val ad = a.get("add")
              val dv = Option(ad.get("deletionVector"))
                .filterNot(_.isNull).map { d =>
                  Dv(d.get("storageType").asText,
                    d.get("pathOrInlineDv").asText,
                    Option(d.get("offset")).filterNot(_.isNull)
                      .map(_.asLong),
                    d.get("sizeInBytes").asInt,
                    d.get("cardinality").asLong)
                }
              val path = ad.get("path").asText
              live.put(path, dv)
              // `stats` is a JSON STRING per the spec; fold the
              // numeric min/max (the pruning planner's inputs)
              Option(ad.get("stats")).filterNot(_.isNull)
                .foreach(s =>
                  fileStats.put(path, parseAddStats(s.asText)))
              // partitionValues feed the partition-pruning planner
              Option(ad.get("partitionValues")).filterNot(_.isNull)
                .map(n => n.fields().asScala
                  .map(e => e.getKey -> e.getValue.asText).toMap)
                .filter(_.nonEmpty)
                .foreach(pv => filePartVals.put(path, pv))
              Option(ad.get("size")).filterNot(_.isNull)
                .foreach(sz => fileSizes.put(path, sz.asLong))
            }
            if (a.has("remove")) {
              val p = a.get("remove").get("path").asText
              live.remove(p)
              fileStats.remove(p)
              filePartVals.remove(p)
              fileSizes.remove(p)
            }
          }
      }
    val version = (commits.map(_._1) ++ checkpoint).maxOption.getOrElse(
      throw new IOException(s"$table has an empty _delta_log"))
    Snapshot(live.keys.toSeq, partCols, schema, version, mappingMode,
      live.collect { case (p, Some(dv)) => p -> dv }.toMap,
      fileStats.filter { case (p, _) => live.contains(p) }.toMap,
      filePartVals.filter { case (p, _) => live.contains(p) }.toMap,
      configuration, protocol,
      fileSizes.filter { case (p, _) => live.contains(p) }.toMap)
  }

  /** One add action's `stats` JSON → folded numeric min/max plus the
    * raw text (carried so checkpoints can re-emit it verbatim). */
  private def parseAddStats(text: String): AddStats = {
    val st = mapper.readTree(text)
    def numeric(node: String): Map[String, Long] =
      Option(st.get(node)).map { n =>
        n.fields().asScala
          .filter(_.getValue.isIntegralNumber)
          .map(e => e.getKey -> e.getValue.asLong)
          .toMap
      }.getOrElse(Map.empty)
    AddStats(
      Option(st.get("numRecords")).map(_.asLong).getOrElse(0L),
      numeric("minValues"), numeric("maxValues"), text)
  }

  /** Read the table's live state (or `asOf` a pinned version) as a
    * DataFrame — an ordinary parquet scan over the live file set,
    * partition columns resolved from the Hive-style directory layout
    * Delta writes them in. Column mapping in NAME mode resolves
    * through the schema's `delta.columnMapping.physicalName` field
    * metadata: the parquet files (and partition directories) carry
    * physical names, the returned frame the logical ones. ID mode
    * resolves the spec-correct way — BY PARQUET FIELD ID: the read
    * schema carries each logical field's `delta.columnMapping.id` as
    * `parquet.field.id` metadata and Spark's field-id matching picks
    * the column regardless of its physical name (so a rename serves
    * the new name over files written before OR after it). Id-mode
    * files without field ids refuse loudly (they cannot be
    * id-resolved; matching by position would be a misread). */
  def read(spark: SparkSession, table: String,
           asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val snap = snapshot(spark, table, asOf)
    if (snap.files.isEmpty) {
      val s = snap.schema.getOrElse(throw new IOException(
        s"$table is empty and its log declares no schema"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    } else {
      val raw =
        if (snap.columnMappingMode != "id")
          spark.read.option("basePath", table)
            .parquet(snap.files.map(f =>
              new Path(table, f).toString): _*)
        else {
          val sch = snap.schema.getOrElse(throw new IOException(
            s"$table declares id-mode column mapping but no schema — " +
              "cannot resolve field ids"))
          if (snap.partitionColumns.nonEmpty)
            throw new IOException(s"$table combines id-mode column " +
              "mapping with partition columns — directory-inferred " +
              "columns cannot be id-resolved; refusing rather than " +
              "misread")
          val head = new Path(table, snap.files.head)
          if (!IcebergLite.parquetHasFieldIds(spark, head))
            throw new IOException(s"$table uses column mapping mode " +
              s"'id' but data file ${snap.files.head} carries no " +
              "parquet field ids — id resolution is impossible and " +
              "matching by position would be a misread; refusing")
          val readSchema = StructType(sch.fields.map { f =>
            if (!f.metadata.contains("delta.columnMapping.id"))
              throw new IOException(s"$table: id-mode schema field " +
                s"${f.name} carries no delta.columnMapping.id — " +
                "malformed metaData; refusing")
            StructField(f.name, f.dataType, f.nullable,
              new org.apache.spark.sql.types.MetadataBuilder()
                .putLong("parquet.field.id",
                  f.metadata.getLong("delta.columnMapping.id"))
                .build())
          })
          spark.conf.set("spark.sql.parquet.fieldId.read.enabled",
            "true")
          spark.read.schema(readSchema).option("basePath", table)
            .parquet(snap.files.map(f =>
              new Path(table, f).toString): _*)
        }
      // deletion vectors apply FIRST (they need the hidden parquet
      // row identity, which a projection would drop): decode each
      // live file's DV to its deleted ordinals — bounded metadata,
      // the same driver-side materialization Delta's own planner
      // does per file — and anti-join on (file, row_index), the
      // IcebergLite position-delete mechanism
      val masked =
        if (snap.deletionVectors.isEmpty) raw
        else {
          import spark.implicits._
          import org.apache.spark.sql.functions.regexp_replace
          val delRows = snap.deletionVectors.toSeq.flatMap {
            case (rel, dv) =>
              val positions = RoaringDv.decode(dvBytes(spark, table, dv))
              if (positions.length != dv.cardinality)
                throw new IOException(s"$table: deletion vector for " +
                  s"$rel decodes ${positions.length} positions but " +
                  s"declares cardinality ${dv.cardinality} — refusing " +
                  "a corrupt mask")
              val abs = new Path(table, rel).toUri.getPath
              positions.map(p => (abs, p))
          }
          val dels = delRows.toDF("_del_path", "_del_pos")
          val cols = raw.columns.toSeq
          raw
            .withColumn("_scan_path", regexp_replace(
              col("_metadata.file_path"), "^file:/+", "/"))
            .withColumn("_scan_pos", col("_metadata.row_index"))
            .join(dels,
              col("_scan_path") === col("_del_path") &&
                col("_scan_pos") === col("_del_pos"),
              "left_anti")
            .select(cols.map(c => col(s"`$c`")): _*)
        }
      if (snap.columnMappingMode != "name") masked
      else {
        val sch = snap.schema.getOrElse(throw new IOException(
          s"$table declares column mapping but no schema — cannot " +
            "resolve physical names"))
        masked.select(sch.fields.toSeq.map { f =>
          val phys =
            if (f.metadata.contains("delta.columnMapping.physicalName"))
              f.metadata.getString("delta.columnMapping.physicalName")
            else f.name
          col(s"`$phys`").as(f.name)
        }: _*)
      }
    }
  }

  /** Resolve a DV descriptor to its serialized bitmap bytes: inline
    * z85 ("i"), a table-relative UUID file ("u" — optional z85 path
    * prefix + 20-char z85 UUID → `deletion_vector_<uuid>.bin`), or an
    * absolute path ("p"). File blobs are length-prefixed (int32 BE)
    * and CRC-32-trailed per the DV file format; both are verified. */
  /** The on-disk blob path a "u"/"p" DV descriptor names. */
  private def dvBlobPath(table: String, dv: Dv): Path =
    if (dv.storageType == "p") new Path(dv.pathOrInlineDv)
    else {
      val s = dv.pathOrInlineDv
      if (s.length < 20)
        throw new IOException(s"malformed DV file reference '$s'")
      val prefix = s.dropRight(20)
      val uuidBytes = RoaringDv.z85Decode(s.takeRight(20), 16)
      val bb = java.nio.ByteBuffer.wrap(uuidBytes)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(table, name)
      else new Path(new Path(table, prefix), name)
    }

  private def dvBytes(spark: SparkSession, table: String,
                      dv: Dv): Array[Byte] = dv.storageType match {
    case "i" => RoaringDv.z85Decode(dv.pathOrInlineDv, dv.sizeInBytes)
    case "u" | "p" =>
      val p = dvBlobPath(table, dv)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      try {
        val off = dv.offset.getOrElse(1L)
        in.seek(off)
        val size = in.readInt() // big-endian length prefix
        if (size != dv.sizeInBytes)
          throw new IOException(s"DV blob at $p:$off declares $size " +
            s"bytes, descriptor says ${dv.sizeInBytes} — refusing")
        val buf = new Array[Byte](size)
        in.readFully(buf)
        val crc = in.readInt()
        val c = new java.util.zip.CRC32()
        c.update(buf)
        if ((c.getValue & 0xffffffffL) != (crc & 0xffffffffL))
          throw new IOException(s"DV checksum mismatch at $p:$off — " +
            "refusing a corrupt mask")
        buf
      } finally in.close()
    case other =>
      throw new IOException(s"unknown DV storage type '$other' — " +
        "newer Delta than this reader; refusing")
  }

  /** Commit DELETION VECTORS against live files — the rows-masked,
    * no-rewrite DELETE every modern engine writes: each (file →
    * deleted ordinals) re-adds the file with a DV descriptor (inline
    * z85 when small, a CRC-trailed `deletion_vector_<uuid>.bin` blob
    * otherwise), plus the protocol upgrade to reader-version-3
    * `deletionVectors`. Returns the committed version. */
  def commitDeletionVectors(spark: SparkSession, table: String,
                            deletes: Map[String, Array[Long]],
                            inlineThreshold: Int = 512): Long = {
    val snap = snapshot(spark, table)
    val missing = deletes.keySet -- snap.files.toSet
    if (missing.nonEmpty)
      throw new IOException("cannot attach deletion vectors to " +
        s"non-live files: ${missing.mkString(", ")}")
    val version = snap.version + 1
    val fs = new Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the v3 upgrade must PRESERVE features the table already needs:
    // a name/id-mapped table whose protocol dropped columnMapping here
    // would misread in every feature-honoring foreign engine
    val rf = (snap.protocol.readerFeatures.toSet + "deletionVectors" ++
      (if (snap.columnMappingMode != "none") Set("columnMapping")
       else Set.empty[String])).toSeq.sorted
    val wf = (snap.protocol.writerFeatures.toSet + "deletionVectors" ++
      (if (snap.columnMappingMode != "none") Set("columnMapping")
       else Set.empty[String])).toSeq.sorted
    val actions = Seq(
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        s""""readerFeatures":[${rf.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""writerFeatures":[${wf.map("\"" + _ + "\"").mkString(",")}]}}""") ++
      deletes.toSeq.sortBy(_._1).map { case (rel, newPositions) =>
        // the log fold keeps only the LATEST add per path, so a file
        // that already carries a DV must have its existing positions
        // MERGED in — a descriptor built from the new positions alone
        // would silently resurrect the previously masked rows
        val positions = snap.deletionVectors.get(rel) match {
          case Some(old) =>
            (RoaringDv.decode(dvBytes(spark, table, old)) ++
              newPositions).distinct.sorted
          case None => newPositions
        }
        val bytes = RoaringDv.encode(positions)
        val dvJson =
          if (bytes.length <= inlineThreshold)
            s"""{"storageType":"i","pathOrInlineDv":"${RoaringDv
              .z85Encode(bytes)}","sizeInBytes":${bytes.length},""" +
              s""""cardinality":${positions.distinct.length}}"""
          else {
            val uuid = java.util.UUID.nameUUIDFromBytes(
              (rel + ":" + version).getBytes(StandardCharsets.UTF_8))
            val bb = java.nio.ByteBuffer.allocate(16)
            bb.putLong(uuid.getMostSignificantBits)
            bb.putLong(uuid.getLeastSignificantBits)
            val out = fs.create(
              new Path(table, s"deletion_vector_$uuid.bin"), true)
            try {
              out.write(1) // DV file format version
              out.writeInt(bytes.length)
              out.write(bytes)
              val c = new java.util.zip.CRC32()
              c.update(bytes)
              out.writeInt(c.getValue.toInt)
            } finally out.close()
            s"""{"storageType":"u","pathOrInlineDv":"${RoaringDv
              .z85Encode(bb.array())}","offset":1,""" +
              s""""sizeInBytes":${bytes.length},""" +
              s""""cardinality":${positions.distinct.length}}"""
          }
        s"""{"add":{"path":"${esc(rel)}","partitionValues":{},""" +
          s""""size":1,"modificationTime":0,"dataChange":false,""" +
          s""""deletionVector":$dvJson}}"""
      }
    writeCommitFile(spark, table, version, actions)
    version
  }

  // ── writer half: full-snapshot export in the open format ───────────

  private def esc(s: String) =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def writeCommitFile(spark: SparkSession, table: String,
                              version: Long,
                              actions: Seq[String]): Unit = {
    val logDir = new Path(table, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, f".$version%020d.json.tmp")
    val out = fs.create(tmp, true)
    try out.write((actions.mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new Path(logDir, f"$version%020d.json")))
      throw new IOException(s"could not commit version $version to $table")
  }

  /** The commit versions visible in the log (the JSON files; a
    * checkpoint may have absorbed earlier ones). */
  def commitVersions(spark: SparkSession, table: String): Seq[Long] = {
    val logDir = new Path(table, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir)) Nil
    else fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .collect { case n if n.matches("\\d{20}\\.json") => n.take(20).toLong }
      .sorted
  }

  /** One commit's actions as (added paths, removed paths) — the unit
    * an incremental consumer applies. */
  /** (adds, removes, hasDeletionVectors) for one commit. A
    * DV-carrying add RE-adds an existing file with rows masked — it
    * is NOT a pure append (the incremental-sync fast path must fall
    * back to a republish or it would re-ingest the file's full
    * rows). */
  def commitActions(spark: SparkSession, table: String,
                    version: Long): (Seq[String], Seq[String], Boolean) = {
    val p = new Path(new Path(table, "_delta_log"), f"$version%020d.json")
    val adds = mutable.ArrayBuffer.empty[String]
    val removes = mutable.ArrayBuffer.empty[String]
    var hasDv = false
    readText(spark, p).split('\n').filter(_.trim.nonEmpty).foreach { l =>
      val a = mapper.readTree(l)
      if (a.has("add")) {
        adds += a.get("add").get("path").asText
        if (a.get("add").has("deletionVector") &&
            !a.get("add").get("deletionVector").isNull) hasDv = true
      }
      if (a.has("remove")) removes += a.get("remove").get("path").asText
    }
    (adds.toSeq, removes.toSeq, hasDv)
  }

  /** DESCRIBE HISTORY — Delta's own commit-audit surface: one row per
    * commit still visible in the log (a checkpoint may have absorbed
    * earlier ones; they read as history truncation, exactly Delta's
    * retention contract), newest first — (version, operation
    * classified from the action mix, n_adds, n_removes, has_dv,
    * is_checkpointed). Driver metadata only: one JSON read per
    * commit, no data file touched. */
  def history(spark: SparkSession, table: String): DataFrame = {
    val logDir = new Path(table, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cpV: Option[Long] = {
      val p = new Path(logDir, "_last_checkpoint")
      if (fs.exists(p))
        Some(mapper.readTree(readText(spark, p)).get("version").asLong)
      else None
    }
    val rows = commitVersions(spark, table).map { v =>
      val (adds, removes, hasDv) = commitActions(spark, table, v)
      val op =
        if (hasDv) "DELETE (deletion vectors)"
        else if (v == 0L) "CREATE TABLE AS"
        else if (adds.nonEmpty && removes.nonEmpty) "OVERWRITE"
        else if (adds.nonEmpty) "WRITE (append)"
        else if (removes.nonEmpty) "DELETE"
        else "SET METADATA"
      (v, op, adds.length.toLong, removes.length.toLong, hasDv,
        cpV.exists(v <= _))
    }.sortBy(-_._1)
    import spark.implicits._
    rows.toDF("version", "operation", "n_adds", "n_removes",
      "has_dv", "is_checkpointed")
  }

  /** Export `df` as the NEXT full snapshot of a Delta-format table
    * (protocol v1): stage the data files, then commit `remove` for
    * every previously-live file + `add` for the new ones — the same
    * shape Delta itself writes for an INSERT OVERWRITE. Commit 0
    * additionally carries `protocol` and `metaData` (schemaString =
    * the Spark schema JSON, which IS Delta's schema encoding). The
    * table stays readable by any real Delta reader, and removed files
    * stay on disk for time travel (Delta's own VACUUM contract).
    * Returns the committed version. */
  def export(spark: SparkSession, df: DataFrame, table: String): Long =
    exportCommit(spark, df, table, removePrior = true)

  /** Export `df` as an APPEND commit — add actions only, the shape
    * Delta writes for a plain INSERT. Returns the committed version. */
  def exportAppend(spark: SparkSession, df: DataFrame,
                   table: String): Long =
    exportCommit(spark, df, table, removePrior = false)

  /** `commitInfo.graftVersion` of one commit, if present — the
    * export-sync watermark (commitInfo is a standard Delta action
    * every protocol reader tolerates and ignores). */
  def commitGraftVersion(spark: SparkSession, table: String,
                         version: Long): Option[Long] = {
    val p = new Path(new Path(table, "_delta_log"), f"$version%020d.json")
    readText(spark, p).split('\n').filter(_.trim.nonEmpty)
      .flatMap { l =>
        val a = mapper.readTree(l)
        if (a.has("commitInfo") && a.get("commitInfo").has("graftVersion"))
          Some(a.get("commitInfo").get("graftVersion").asLong)
        else None
      }.headOption
  }

  private[graft] def exportCommit(spark: SparkSession, df0: DataFrame,
                           table: String, removePrior: Boolean,
                           extraActions: Seq[String] = Nil): Long = {
    val tableP = new Path(table)
    val fs = tableP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasLog = fs.exists(new Path(table, "_delta_log"))
    val prior = if (hasLog) Some(snapshot(spark, table)) else None
    val version = prior.map(_.version + 1L).getOrElse(0L)
    // a column-mapped table stores PHYSICAL names in its files: map
    // the caller's logical columns through the schema's physicalName
    // metadata before writing (an append after RENAME writes the
    // renamed column under its original physical name). Id-mode files
    // additionally carry parquet field ids (the resolution key), so
    // the written schema pins each field's delta.columnMapping.id as
    // parquet.field.id metadata.
    val df = prior match {
      case Some(p) if p.columnMappingMode == "name" ||
          p.columnMappingMode == "id" =>
        import org.apache.spark.sql.functions.col
        val sch = p.schema.getOrElse(throw new IOException(
          s"$table declares column mapping but no schema"))
        if (p.columnMappingMode == "id")
          spark.conf.set("spark.sql.parquet.fieldId.write.enabled",
            "true")
        df0.select(sch.fields.toSeq.map { f =>
          val phys =
            if (f.metadata.contains("delta.columnMapping.physicalName"))
              f.metadata.getString("delta.columnMapping.physicalName")
            else f.name
          if (p.columnMappingMode == "id") {
            val md = new org.apache.spark.sql.types.MetadataBuilder()
              .putLong("parquet.field.id",
                f.metadata.getLong("delta.columnMapping.id")).build()
            col(s"`${f.name}`").as(phys, md)
          } else col(s"`${f.name}`").as(phys)
        }: _*)
      case _ => df0
    }
    val staging = new Path(table, s".staging-$version")
    fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)
    val named = fs.listStatus(staging).toSeq
      .filter(st => st.getPath.getName.endsWith(".parquet") &&
        st.getLen > 0)
      .sortBy(_.getPath.getName)
      .zipWithIndex.map { case (st, i) =>
        val name = f"part-$version%05d-$i%05d.parquet"
        // a crashed prior ATTEMPT at this version (staged files placed,
        // commit file never written) leaves same-named debris; the
        // retry owns the slot — no committed version can have used it,
        // or `version` would have advanced past it
        fs.delete(new Path(tableP, name), false)
        if (!fs.rename(st.getPath, new Path(tableP, name)))
          throw new IOException(s"could not place $name in $table")
        name -> st.getLen
      }
    fs.delete(staging, true)
    val head =
      if (version == 0L) Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"graft-export","format":{"provider":"parquet","options":{}},"schemaString":"${esc(df.schema.json)}","partitionColumns":[],"configuration":{},"createdTime":0}}""")
      else Nil
    val removes =
      if (!removePrior) Nil
      else prior.toSeq.flatMap(_.files).map(p =>
        s"""{"remove":{"path":"${esc(p)}","deletionTimestamp":0,"dataChange":true}}""")
    val adds = named.map { case (n, sz) =>
      val stats = footerStatsJson(spark, new Path(tableP, n))
      s"""{"add":{"path":"${esc(n)}","partitionValues":{},"size":$sz,"modificationTime":0,"dataChange":true,"stats":"${esc(stats)}"}}""" }
    writeCommitFile(spark, table, version,
      extraActions ++ head ++ removes ++ adds)
    version
  }

  /** The add action's `stats` JSON from the placed file's parquet
    * FOOTER (no data read): numRecords plus minValues/maxValues for
    * top-level int/long/string columns — what lets a planner (ours in
    * readPruned, or a foreign engine's) skip the file on a predicate.
    * Columns without usable footer stats are simply absent (legal;
    * pruning treats absence as "cannot skip"). Cost: one footer open
    * per NEW file per commit — O(commit), never O(table); Delta's own
    * writers fold the same stats inline during the write, which a
    * custom FileCommitProtocol could match if commit-time footer
    * reads ever dominate (they are ~10 ms driver-side each). */
  private def footerStatsJson(spark: SparkSession, p: Path): String = {
    import org.apache.parquet.column.statistics._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(p, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val root = mapper.createObjectNode()
      root.put("numRecords", r.getRecordCount)
      val mins = root.putObject("minValues")
      val maxs = root.putObject("maxValues")
      val longMin = mutable.LinkedHashMap.empty[String, Long]
      val longMax = mutable.LinkedHashMap.empty[String, Long]
      val strMin = mutable.LinkedHashMap.empty[String, String]
      val strMax = mutable.LinkedHashMap.empty[String, String]
      r.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          if (c.getPath.size() == 1) {
            val name = c.getPath.toDotString
            val st = c.getStatistics
            if (st != null && !st.isEmpty && st.hasNonNullValue)
              st match {
                case s: IntStatistics =>
                  longMin(name) = math.min(
                    longMin.getOrElse(name, Long.MaxValue), s.getMin)
                  longMax(name) = math.max(
                    longMax.getOrElse(name, Long.MinValue), s.getMax)
                case s: LongStatistics =>
                  longMin(name) = math.min(
                    longMin.getOrElse(name, Long.MaxValue), s.getMin)
                  longMax(name) = math.max(
                    longMax.getOrElse(name, Long.MinValue), s.getMax)
                case s: BinaryStatistics =>
                  val (mn, mx) = (s.minAsString(), s.maxAsString())
                  strMin(name) = strMin.get(name)
                    .map(v => if (v <= mn) v else mn).getOrElse(mn)
                  strMax(name) = strMax.get(name)
                    .map(v => if (v >= mx) v else mx).getOrElse(mx)
                case _ => () // other types: omit
              }
          }
        }
      }
      longMin.foreach { case (k, v) => mins.put(k, v) }
      longMax.foreach { case (k, v) => maxs.put(k, v) }
      strMin.foreach { case (k, v) => mins.put(k, v) }
      strMax.foreach { case (k, v) => maxs.put(k, v) }
      mapper.writeValueAsString(root)
    } finally r.close()
  }

  /** Scan with FILE SKIPPING on the log's per-file stats: plan the
    * live files whose [min, max] for `column` overlaps [lo, hi], read
    * ONLY those, apply the exact predicate on top. Returns (rows,
    * filesScanned, filesTotal). A file without stats for the column
    * is kept (conservative). The Delta twin of IcebergLite.readPruned
    * — same contract, same refusals: DV-bearing snapshots and mapped
    * columns refuse loudly rather than risk a wrong plan. */
  def readPruned(spark: SparkSession, table: String, column: String,
                 lo: Long, hi: Long): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.col
    val snap = snapshot(spark, table)
    require(snap.columnMappingMode == "none",
      s"readPruned at $table: column mapping mode " +
        s"'${snap.columnMappingMode}' — stats pruning resolves " +
        "logical names only on unmapped tables")
    val schema = snap.schema.getOrElse(throw new IOException(
      s"$table declares no schema — cannot type-check the predicate"))
    require(schema.fieldNames.contains(column),
      s"readPruned: column $column not in the table schema at $table")
    require(schema(column).dataType == org.apache.spark.sql.types
        .LongType || schema(column).dataType == org.apache.spark.sql
        .types.IntegerType,
      s"readPruned: column $column is ${schema(column).dataType} — " +
        "stats pruning implemented for int/long only")
    val kept = snap.files.filter { f =>
      snap.stats.get(f) match {
        case Some(st) =>
          (st.mins.get(column), st.maxs.get(column)) match {
            case (Some(mn), Some(mx)) => mx >= lo && mn <= hi
            case _ => true // no stats for the column → cannot skip
          }
        case None => true
      }
    }
    val pred = col(column) >= lo && col(column) <= hi
    val rows =
      if (kept.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else maskKeptDvs(spark, table, snap, kept,
        spark.read.option("basePath", table)
          .parquet(kept.map(f => new Path(table, f).toString): _*))
        .filter(pred)
    (rows, kept.size, snap.files.size)
  }

  /** Apply the KEPT files' deletion vectors over a (possibly pruned)
    * scan. DV masking is PER-FILE (each descriptor names ordinals of
    * one file), so a pruned scan masks exactly like the full read —
    * and the stored stats/partitionValues describe RAW rows (masked
    * included), so pruning can only over-keep, never lose a live
    * row. */
  private def maskKeptDvs(spark: SparkSession, table: String,
                          snap: Snapshot, kept: Seq[String],
                          raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_replace}
    val keptDvs = snap.deletionVectors.filter {
      case (p, _) => kept.contains(p) }
    if (keptDvs.isEmpty) raw
    else {
      import spark.implicits._
      val delRows = keptDvs.toSeq.flatMap { case (rel, dv) =>
        val positions = RoaringDv.decode(dvBytes(spark, table, dv))
        val abs = new Path(table, rel).toUri.getPath
        positions.map(p => (abs, p))
      }.toDF("_del_path", "_del_pos")
      val cols = raw.columns.toSeq
      raw
        .withColumn("_scan_path", regexp_replace(
          col("_metadata.file_path"), "^file:/+", "/"))
        .withColumn("_scan_pos", col("_metadata.row_index"))
        .join(delRows,
          col("_scan_path") === col("_del_path") &&
            col("_scan_pos") === col("_del_pos"),
          "left_anti")
        .select(cols.map(c => col(s"`$c`")): _*)
    }
  }

  /** Export a frame as a PARTITIONED Delta table (fresh tables only):
    * Hive-layout directories plus per-add `partitionValues` — what
    * Delta's own writers emit and what lets any planner prune whole
    * files from the log alone (readPartitionPruned here; foreign
    * engines via their own Delta readers). Partition columns leave
    * the data files (the Hive layout carries them); `basePath` reads
    * reconstruct them. */
  def exportPartitioned(spark: SparkSession, df: DataFrame,
                        table: String, partCols: Seq[String]): Long = {
    require(partCols.nonEmpty, "partCols must be non-empty")
    partCols.foreach(c => require(df.schema.fieldNames.contains(c),
      s"partition column $c not in the frame"))
    val tableP = new Path(table)
    val fs = tableP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(table, "_delta_log")))
      throw new IOException(s"exportPartitioned writes FRESH tables " +
        s"only; $table already has a _delta_log")
    val staging = new Path(table, ".staging-0")
    fs.delete(staging, true)
    df.write.partitionBy(partCols: _*).mode("overwrite")
      .parquet(staging.toString)
    def leaves(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) leaves(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet") && st.getLen > 0)
          Seq(st.getPath)
        else Nil
      }
    val stagingUri = staging.toUri.getPath
    val moved = leaves(staging).map { p =>
      val rel = p.toUri.getPath.stripPrefix(stagingUri)
        .stripPrefix("/")
      val dest = new Path(tableP, rel)
      fs.mkdirs(dest.getParent)
      fs.delete(dest, false)
      if (!fs.rename(p, dest))
        throw new IOException(s"could not place $rel in $table")
      rel
    }
    fs.delete(staging, true)
    val head = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"graft-export","format":{"provider":"parquet","options":{}},"schemaString":"${esc(
        df.schema.json)}","partitionColumns":[${partCols.map(c =>
        "\"" + esc(c) + "\"").mkString(",")}],"configuration":{},"createdTime":0}}""")
    val adds = moved.map { rel =>
      val pv = rel.split('/').dropRight(1).map { seg =>
        val kv = seg.split("=", 2)
        s""""${esc(kv(0))}":"${esc(kv(1))}""""
      }.mkString(",")
      val p = new Path(tableP, rel)
      val stats = footerStatsJson(spark, p)
      val sz = fs.getFileStatus(p).getLen
      s"""{"add":{"path":"${esc(rel)}","partitionValues":{$pv},"size":$sz,"modificationTime":0,"dataChange":true,"stats":"${esc(stats)}"}}"""
    }
    writeCommitFile(spark, table, 0L, head ++ adds)
    0L
  }

  /** Scan with PARTITION PRUNING from the log's per-add
    * partitionValues: keep the live files whose values match every
    * filter, read only those (basePath reconstructs the partition
    * columns from the Hive layout), apply the exact predicate on top.
    * Returns (rows, filesScanned, filesTotal) — the Delta twin of
    * IcebergLite.readPartitionPruned, same conservative-keep rules;
    * DV-bearing snapshots mask the kept files' vectors over the
    * pruned scan (per-file soundness — see maskKeptDvs). */
  def readPartitionPruned(spark: SparkSession, table: String,
                          filters: Map[String, String])
    : (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.col
    require(filters.nonEmpty, "filters must be non-empty")
    val snap = snapshot(spark, table)
    require(snap.columnMappingMode == "none",
      s"readPartitionPruned at $table: column mapping " +
        s"'${snap.columnMappingMode}' not supported here")
    val schema = snap.schema.getOrElse(throw new IOException(
      s"$table declares no schema"))
    filters.keys.foreach(c => require(schema.fieldNames.contains(c),
      s"readPartitionPruned: column $c not in the table schema"))
    val kept = snap.files.filter { f =>
      snap.partitionValues.get(f) match {
        case Some(pv) => filters.forall { case (c, v) =>
          pv.get(c).forall(_ == v) }
        case None => true
      }
    }
    val pred = filters.map { case (c, v) =>
      col(s"`$c`").cast("string") === v }.reduce(_ && _)
    val rows =
      if (kept.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else maskKeptDvs(spark, table, snap, kept,
        spark.read.option("basePath", table)
          .parquet(kept.map(f => new Path(table, f).toString): _*))
        .filter(pred)
    (rows, kept.size, snap.files.size)
  }

  /** VACUUM to the current snapshot — the Delta twin of
    * IcebergLite.expireSnapshots and the second half of the
    * checkpoint's log-retention contract: physically delete every
    * data file the CURRENT snapshot does not serve (the aggressive
    * retention-0 form; Delta's timed retention generalizes it) and
    * truncate the JSON commits a checkpoint already covers. Refuses
    * without a checkpoint (truncating the log with no checkpoint
    * bricks the table). DV-bearing snapshots sweep safely: the
    * checkpoint re-emits live DV descriptors (see checkpoint()), so
    * vacuum keeps every blob a LIVE descriptor references and deletes
    * only unreferenced `deletion_vector_*.bin` orphans alongside the
    * dead parquet. Time travel past the horizon refuses loudly
    * afterward — the documented Delta contract, not data loss: the
    * live view is untouched. Returns (dataFilesDeleted,
    * commitsTruncated) — DV-blob orphans count as data files. */
  def vacuum(spark: SparkSession, table: String): (Int, Int) = {
    val tableP = new Path(table)
    val fs = tableP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, "_delta_log")
    val cpP = new Path(logDir, "_last_checkpoint")
    if (!fs.exists(cpP))
      throw new IOException(s"cannot vacuum $table: no checkpoint — " +
        "truncating the log without one leaves the table unreadable; " +
        "checkpoint() first")
    val cpV = mapper.readTree(readText(spark, cpP)).get("version").asLong
    val snap = snapshot(spark, table)
    val live = snap.files.toSet
    // blobs a live DV references (table-relative), pinned against the
    // sweep; inline ("i") DVs reference no file, absolute ("p") paths
    // live outside the walk
    val tableUri = tableP.toUri.getPath
    val liveBlobs: Set[String] = snap.deletionVectors.values.collect {
      case dv if dv.storageType == "u" =>
        dvBlobPath(table, dv).toUri.getPath
          .stripPrefix(tableUri).stripPrefix("/")
    }.toSet
    def walk(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name == "_delta_log" || name.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else if (name.endsWith(".parquet") ||
          name.startsWith("deletion_vector_")) Seq(st.getPath)
        else Nil
      }
    var filesDeleted = 0
    walk(tableP).foreach { p =>
      val rel = p.toUri.getPath.stripPrefix(tableUri).stripPrefix("/")
      val keep =
        if (p.getName.startsWith("deletion_vector_"))
          liveBlobs.contains(rel)
        else live.contains(rel)
      if (!keep && fs.delete(p, false)) filesDeleted += 1
    }
    var commitsTruncated = 0
    (0L to cpV).foreach { v =>
      if (fs.delete(new Path(logDir, f"$v%020d.json"), false))
        commitsTruncated += 1
    }
    (filesDeleted, commitsTruncated)
  }

  /** PURGE deletion vectors — Delta's own REORG TABLE ... APPLY
    * (PURGE) path and the pre-step that lets retention run on a
    * DV-bearing table: every DV-carrying live file is rewritten with
    * its masked rows physically dropped, then one commit removes the
    * old files and adds the rewrites WITHOUT descriptors
    * (`dataChange: false` — the logical content is unchanged). The
    * orphaned DV blobs stay on disk for time travel until vacuum
    * sweeps them. Returns (filesRewritten, rowsPurged). */
  def purgeDeletionVectors(spark: SparkSession,
                           table: String): (Int, Long) = {
    import org.apache.spark.sql.functions.{col, regexp_replace}
    val snap = snapshot(spark, table)
    if (snap.deletionVectors.isEmpty) return (0, 0L)
    val targets = snap.deletionVectors.keys.toSeq.sorted
    val withParts = targets.filter(p =>
      snap.partitionValues.get(p).exists(_.nonEmpty))
    if (withParts.nonEmpty)
      throw new IOException(s"cannot purge DVs at $table: files " +
        s"${withParts.mkString(", ")} carry partition values — " +
        "partitioned DV purge is not implemented; refusing rather " +
        "than dropping partition tuples from the rewritten adds")
    val rowsPurged = snap.deletionVectors.values.map(_.cardinality).sum
    val tableP = new Path(table)
    val fs = tableP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // rewrite = the same (file, row_index) anti-join the read path
    // applies, restricted to the DV-bearing files, WITHOUT the
    // logical-name mapping (files store physical names; the rewrite
    // must too, or mapped tables would fork their physical schema)
    import spark.implicits._
    val delRows = snap.deletionVectors.toSeq.flatMap { case (rel, dv) =>
      val positions = RoaringDv.decode(dvBytes(spark, table, dv))
      val abs = new Path(table, rel).toUri.getPath
      positions.map(p => (abs, p))
    }.toDF("_del_path", "_del_pos")
    val raw = spark.read.option("basePath", table)
      .parquet(targets.map(f => new Path(table, f).toString): _*)
    val cols = raw.columns.toSeq
    val masked = raw
      .withColumn("_scan_path", regexp_replace(
        col("_metadata.file_path"), "^file:/+", "/"))
      .withColumn("_scan_pos", col("_metadata.row_index"))
      .join(delRows,
        col("_scan_path") === col("_del_path") &&
          col("_scan_pos") === col("_del_pos"),
        "left_anti")
      .select(cols.map(c => col(s"`$c`")): _*)
    // id-mode tables resolve columns BY PARQUET FIELD ID; the raw
    // read above strips the ids, and a rewrite without them would
    // brick every later read() (which refuses id-less files rather
    // than misread by position). Re-stamp each physical column's
    // delta.columnMapping.id as parquet.field.id and write with
    // field ids enabled — the exportCommit append contract.
    val rewritten =
      if (snap.columnMappingMode != "id") masked
      else {
        val sch = snap.schema.getOrElse(throw new IOException(
          s"$table declares id-mode column mapping but no schema — " +
            "cannot re-stamp field ids; refusing purge"))
        val idByPhys = sch.fields.map { f =>
          val phys =
            if (f.metadata.contains("delta.columnMapping.physicalName"))
              f.metadata.getString("delta.columnMapping.physicalName")
            else f.name
          phys -> f.metadata.getLong("delta.columnMapping.id")
        }.toMap
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled",
          "true")
        masked.select(cols.map { c =>
          val id = idByPhys.getOrElse(c, throw new IOException(
            s"$table: rewritten column $c has no " +
              "delta.columnMapping.id in the schema — cannot " +
              "re-stamp field ids; refusing purge"))
          val md = new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("parquet.field.id", id).build()
          col(s"`$c`").as(c, md)
        }: _*)
      }
    val version = snap.version + 1
    val staging = new Path(table, s".staging-$version")
    fs.delete(staging, true)
    rewritten.write.mode("overwrite").parquet(staging.toString)
    val named = fs.listStatus(staging).toSeq
      .filter(st => st.getPath.getName.endsWith(".parquet") &&
        st.getLen > 0)
      .sortBy(_.getPath.getName)
      .zipWithIndex.map { case (st, i) =>
        val name = f"part-$version%05d-purged-$i%05d.parquet"
        fs.delete(new Path(tableP, name), false)
        if (!fs.rename(st.getPath, new Path(tableP, name)))
          throw new IOException(s"could not place $name in $table")
        name -> st.getLen
      }
    fs.delete(staging, true)
    val removes = targets.map(p =>
      s"""{"remove":{"path":"${esc(p)}","deletionTimestamp":0,"dataChange":false}}""")
    val adds = named.map { case (n, sz) =>
      val stats = footerStatsJson(spark, new Path(tableP, n))
      s"""{"add":{"path":"${esc(n)}","partitionValues":{},"size":$sz,"modificationTime":0,"dataChange":false,"stats":"${esc(stats)}"}}"""
    }
    writeCommitFile(spark, table, version, removes ++ adds)
    (targets.size, rowsPurged)
  }

  /** Rename a column — METADATA ONLY, Delta's column-mapping rule:
    * the table upgrades to name-mode mapping (minReaderVersion 2),
    * every field pins its CURRENT physical name and a mapping id, and
    * only the renamed field's LOGICAL name changes; no data file is
    * touched. Existing files keep serving through the physicalName
    * resolution the read path already speaks (q240), and appends
    * write the renamed column under its original physical name.
    * Returns the committed version. */
  def renameColumn(spark: SparkSession, table: String,
                   from: String, to: String): Long = {
    import org.apache.spark.sql.types.{MetadataBuilder, StructField}
    val snap = snapshot(spark, table)
    val schema = snap.schema.getOrElse(throw new IOException(
      s"$table declares no schema — cannot rename"))
    require(schema.fieldNames.contains(from),
      s"renameColumn: no column $from at $table")
    require(!schema.fieldNames.contains(to),
      s"renameColumn: column $to already exists at $table")
    // an already-mapped table keeps its mode (id stays id); an
    // unmapped one upgrades to name mode
    val mode =
      if (snap.columnMappingMode == "id") "id" else "name"
    val newFields = schema.fields.zipWithIndex.map { case (f, i) =>
      val phys =
        if (f.metadata.contains("delta.columnMapping.physicalName"))
          f.metadata.getString("delta.columnMapping.physicalName")
        else f.name
      val id =
        if (f.metadata.contains("delta.columnMapping.id"))
          f.metadata.getLong("delta.columnMapping.id")
        else (i + 1).toLong
      StructField(if (f.name == from) to else f.name, f.dataType,
        f.nullable, new MetadataBuilder().withMetadata(f.metadata)
          .putString("delta.columnMapping.physicalName", phys)
          .putLong("delta.columnMapping.id", id).build())
    }
    val version = snap.version + 1
    val maxId = newFields.length
    val actions = Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"graft-export","format":{"provider":"parquet","options":{}},"schemaString":"${esc(
        org.apache.spark.sql.types.StructType(newFields).json)}","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"$mode","delta.columnMapping.maxColumnId":"$maxId"},"createdTime":0}}""")
    writeCommitFile(spark, table, version, actions)
    version
  }

  /** Create a FRESH id-mode column-mapped table from `df` — Delta's
    * own rule (id mode is set at table creation; upgrading an
    * existing table would leave id-less files unresolvable): each
    * logical field pins a mapping id (ordinal+1) and a physical name
    * (`col-<id>`), the data files carry the physical names AND
    * parquet field ids, and the commit declares
    * delta.columnMapping.mode=id at minReaderVersion 2. Reads resolve
    * BY FIELD ID (see read()), so renames serve files written before
    * and after them. Returns version 0. */
  def createIdMapped(spark: SparkSession, df: DataFrame,
                     table: String): Long = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.MetadataBuilder
    val tableP = new Path(table)
    val fs = tableP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(table, "_delta_log")))
      throw new IOException(s"createIdMapped writes FRESH tables " +
        s"only; $table already has a _delta_log (id-mode cannot be " +
        "retrofitted onto id-less files)")
    val logical = StructType(df.schema.fields.zipWithIndex.map {
      case (f, i) =>
        StructField(f.name, f.dataType, f.nullable,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", s"col-${i + 1}")
            .putLong("delta.columnMapping.id", (i + 1).toLong).build())
    })
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val phys = df.select(df.schema.fields.zipWithIndex.map {
      case (f, i) =>
        val md = new MetadataBuilder()
          .putLong("parquet.field.id", (i + 1).toLong).build()
        col(s"`${f.name}`").as(s"col-${i + 1}", md)
    }.toSeq: _*)
    val staging = new Path(table, ".staging-0")
    fs.delete(staging, true)
    phys.write.mode("overwrite").parquet(staging.toString)
    val named = fs.listStatus(staging).toSeq
      .filter(st => st.getPath.getName.endsWith(".parquet") &&
        st.getLen > 0)
      .sortBy(_.getPath.getName)
      .zipWithIndex.map { case (st, i) =>
        val name = f"part-00000-$i%05d.parquet"
        fs.delete(new Path(tableP, name), false)
        if (!fs.rename(st.getPath, new Path(tableP, name)))
          throw new IOException(s"could not place $name in $table")
        name -> st.getLen
      }
    fs.delete(staging, true)
    val maxId = df.schema.fields.length
    val head = Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"graft-export","format":{"provider":"parquet","options":{}},"schemaString":"${esc(
        logical.json)}","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"$maxId"},"createdTime":0}}""")
    val adds = named.map { case (n, sz) =>
      val stats = footerStatsJson(spark, new Path(tableP, n))
      s"""{"add":{"path":"${esc(n)}","partitionValues":{},"size":$sz,"modificationTime":0,"dataChange":true,"stats":"${esc(stats)}"}}""" }
    writeCommitFile(spark, table, 0L, head ++ adds)
    0L
  }

  /** Write a parquet checkpoint of the current state plus the
    * `_last_checkpoint` pointer — so readers resolve from ONE parquet
    * + the JSON suffix instead of walking every commit (and old JSON
    * commits become deletable, Delta's log-retention contract).
    *
    * `v2Layout = true` emits the spec's V2 checkpoint instead: a
    * UUID-named top-level file (`n.checkpoint.<uuid>.parquet`)
    * carrying checkpointMetadata + protocol + metaData + sidecar
    * actions, with the add rows in a sidecar parquet under
    * `_delta_log/_sidecars/` — and the protocol row lists the
    * `v2Checkpoint` table feature the layout requires (readers that
    * do not speak it must refuse rather than miss the sidecars).
    * Default unchanged: classic layout. */
  def checkpoint(spark: SparkSession, table: String,
                 v2Layout: Boolean = false): Long = {
    import org.apache.spark.sql.Row
    val snap = snapshot(spark, table)
    val logDir = new Path(table, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schemaJson = snap.schema.map(_.json).getOrElse(
      throw new IOException(s"$table's log declares no metaData schema; " +
        "cannot checkpoint"))
    // The checkpoint is the ONLY state a reader sees once vacuum
    // truncates the JSON commits, so it must carry everything the
    // fold needs AND everything the spec requires of foreign readers:
    // the protocol action (version gating), the FULL metaData
    // (configuration included — dropping it silently cleared
    // delta.columnMapping.mode, serving physical column names after
    // rename+checkpoint+vacuum), and per-add partitionValues / size /
    // dataChange / stats / deletionVector (dropping DVs would
    // resurrect every masked row for readers that start here).
    val dvType = StructType(Seq(
      StructField("storageType", org.apache.spark.sql.types.StringType),
      StructField("pathOrInlineDv",
        org.apache.spark.sql.types.StringType),
      StructField("offset", org.apache.spark.sql.types.LongType),
      StructField("sizeInBytes", org.apache.spark.sql.types.IntegerType),
      StructField("cardinality", org.apache.spark.sql.types.LongType)))
    val strMap = org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType)
    val strArr = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType)
    val cpSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion",
          org.apache.spark.sql.types.IntegerType),
        StructField("minWriterVersion",
          org.apache.spark.sql.types.IntegerType),
        StructField("readerFeatures", strArr),
        StructField("writerFeatures", strArr)))),
      StructField("metaData", StructType(Seq(
        StructField("id", org.apache.spark.sql.types.StringType),
        StructField("format", StructType(Seq(
          StructField("provider",
            org.apache.spark.sql.types.StringType),
          StructField("options", strMap)))),
        StructField("schemaString",
          org.apache.spark.sql.types.StringType),
        StructField("partitionColumns", strArr),
        StructField("configuration", strMap),
        StructField("createdTime",
          org.apache.spark.sql.types.LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", org.apache.spark.sql.types.StringType),
        StructField("partitionValues", strMap),
        StructField("size", org.apache.spark.sql.types.LongType),
        StructField("modificationTime",
          org.apache.spark.sql.types.LongType),
        StructField("dataChange",
          org.apache.spark.sql.types.BooleanType),
        StructField("stats", org.apache.spark.sql.types.StringType),
        StructField("deletionVector", dvType))))))
    // v3 features only when the state still NEEDS them: a protocol
    // pinned at deletionVectors stays (live DVs re-emit), but a purged
    // table re-checkpoints at the floor its content requires. A v2
    // checkpoint REQUIRES the table-features protocol with the
    // v2Checkpoint feature listed — the spec's gate against readers
    // that would read the top-level file and miss the sidecars.
    val pr = snap.protocol
    // Upgrading a LEGACY protocol (minReader < 3: features implied by
    // the version numbers, lists absent) to table-features must
    // ENUMERATE what those numbers implied — the same hazard
    // commitDeletionVectors guards: a name/id-mapped (minReader=2)
    // table whose new feature list carried only v2Checkpoint would
    // serve physical column names in every feature-honoring foreign
    // reader once vacuum truncates the JSON history.
    val impliedReader: Seq[String] =
      if (pr.minReader >= 3) Nil // explicit lists already authoritative
      else if (snap.columnMappingMode != "none") Seq("columnMapping")
      else Nil
    val impliedWriter: Seq[String] =
      if (pr.minWriter >= 7) Nil // explicit lists already authoritative
      else (if (pr.minWriter >= 2) Seq("appendOnly", "invariants")
            else Nil) ++
        (if (pr.minWriter >= 3) Seq("checkConstraints") else Nil) ++
        (if (pr.minWriter >= 4) Seq("changeDataFeed", "generatedColumns")
         else Nil) ++
        (if (pr.minWriter >= 5 || snap.columnMappingMode != "none")
           Seq("columnMapping") else Nil) ++
        (if (pr.minWriter >= 6) Seq("identityColumns") else Nil)
    val featRow =
      if (v2Layout)
        Row(3, math.max(pr.minWriter, 7),
          (pr.readerFeatures ++ impliedReader :+ "v2Checkpoint")
            .distinct.sorted,
          (pr.writerFeatures ++ impliedWriter :+ "v2Checkpoint")
            .distinct.sorted)
      else if (pr.minReader >= 3)
        Row(3, math.max(pr.minWriter, 7),
          pr.readerFeatures, pr.writerFeatures)
      else Row(pr.minReader, pr.minWriter, null, null)
    val metaInner = Row("graft-export",
      Row("parquet", Map.empty[String, String]), schemaJson,
      snap.partitionColumns, snap.configuration, 0L)
    val protoRow = Row(featRow, null, null)
    val metaRow = Row(null, metaInner, null)
    def sizeOf(p: String): Long =
      snap.sizes.getOrElse(p,
        fs.getFileStatus(new Path(table, p)).getLen)
    val addRows = snap.files.map { p =>
      val dvRow = snap.deletionVectors.get(p).map(d =>
        Row(d.storageType, d.pathOrInlineDv,
          d.offset.map(java.lang.Long.valueOf).orNull,
          d.sizeInBytes, d.cardinality)).orNull
      Row(null, null, Row(p,
        snap.partitionValues.getOrElse(p, Map.empty[String, String]),
        sizeOf(p), 0L, false,
        snap.stats.get(p).map(_.json).orNull, dvRow))
    }
    // one staged single-file parquet write, renamed into place
    def writeOne(rows: Seq[Row], schema: StructType, dest: Path,
                 tag: String): Unit = {
      val staging = new Path(logDir, s".cp-staging-$tag-${snap.version}")
      fs.delete(staging, true)
      spark.createDataFrame(rows.asJava, schema)
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = fs.listStatus(staging).toSeq
        .find(st => st.getPath.getName.endsWith(".parquet") &&
          st.getLen > 0)
        .getOrElse(throw new IOException(
          s"checkpoint write produced no file ($tag)"))
      fs.delete(dest, false)
      fs.mkdirs(dest.getParent)
      if (!fs.rename(part.getPath, dest))
        throw new IOException(s"could not install checkpoint $dest")
      fs.delete(staging, true)
    }
    if (v2Layout) {
      // sidecar first (the top-level file records its size), then the
      // UUID-named top with checkpointMetadata + sidecar actions
      val uuid = java.util.UUID.randomUUID().toString
      val sideName = s"$uuid.parquet"
      val sideDest = new Path(new Path(logDir, "_sidecars"), sideName)
      writeOne(addRows.map(r => Row(r.get(2))),
        StructType(Seq(cpSchema("add"))), sideDest, "side")
      val sideLen = fs.getFileStatus(sideDest).getLen
      val topSchema = StructType(Seq(
        StructField("checkpointMetadata", StructType(Seq(
          StructField("version", org.apache.spark.sql.types.LongType)))),
        cpSchema("protocol"), cpSchema("metaData"),
        StructField("sidecar", StructType(Seq(
          StructField("path", org.apache.spark.sql.types.StringType),
          StructField("sizeInBytes", org.apache.spark.sql.types.LongType),
          StructField("modificationTime",
            org.apache.spark.sql.types.LongType))))))
      val topRows = Seq(
        Row(Row(snap.version), null, null, null),
        Row(null, featRow, null, null),
        Row(null, null, metaInner, null),
        Row(null, null, null, Row(sideName, sideLen, 0L)))
      writeOne(topRows, topSchema,
        new Path(logDir,
          f"${snap.version}%020d.checkpoint.$uuid.parquet"), "top")
    } else
      writeOne(Seq(protoRow, metaRow) ++ addRows, cpSchema,
        new Path(logDir, f"${snap.version}%020d.checkpoint.parquet"),
        "classic")
    val tmp = new Path(logDir, "._last_checkpoint.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"version":${snap.version},"size":${snap.files.size}}"""
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(new Path(logDir, "_last_checkpoint"), false)
    if (!fs.rename(tmp, new Path(logDir, "_last_checkpoint")))
      throw new IOException(s"could not install _last_checkpoint")
    snap.version
  }
}
