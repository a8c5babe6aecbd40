package graft.sources

import java.io.IOException
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Protocol-minimal Iceberg interop — the Iceberg twin of
  * [[DeltaLite]], completing the "Delta/Iceberg" interop pair: read
  * tables in the open Apache Iceberg table format (the published spec
  * at iceberg.apache.org/spec — metadata.json → manifest list →
  * manifests → data files) and export graft tables INTO that format
  * for foreign engines, without the Iceberg jars. Manifests are Avro
  * container files; the environment ships Avro core (a Hadoop
  * dependency), so they parse with `GenericDatumReader` against the
  * writer schema embedded in each file — no codegen, no Iceberg
  * classes.
  *
  * What the READ side speaks, per the spec:
  *   - `metadata/version-hint.text` → `v<N>.metadata.json` (falling
  *     back to the lexically-latest `*.metadata.json` when no hint —
  *     object-store layouts without a hint file are legal);
  *   - `format-version` 1 or 2; anything newer refuses loudly —
  *     the same compatibility rule [[DeltaLite]] applies via
  *     `minReaderVersion`, and the one this format's own `_PROTOCOL`
  *     marker applies to graft tables;
  *   - the current snapshot (or an explicit `snapshotId` — time
  *     travel lands on snapshot boundaries), its `manifest-list`
  *     Avro, each manifest's live entries (`status != 2`), their
  *     `data_file.file_path`s;
  *   - v2 POSITION deletes: DELETE manifests (`content=1`) listing
  *     position-delete files (`data_file.content=1`) apply at scan
  *     as a (file, pos) anti-join against the hidden parquet row
  *     identity — the same mechanism as the in-house `_dv` path;
  *   - v2 EQUALITY deletes (`data_file.content=2`): anti-joins on
  *     the `equality_ids` columns, applied only to data files with
  *     an OLDER sequence (manifest `added_snapshot_id` ordering) —
  *     so the streaming-upsert pattern (delete-by-key then re-insert)
  *     resolves exactly;
  *   - refusals, each naming the feature: compaction-preserved
  *     EXPLICIT per-entry sequence numbers (they break the
  *     snapshot-id ordering proxy), malformed manifests (a file kind
  *     in the wrong manifest, equality files without equality_ids),
  *     non-parquet data files, unknown entry status.
  *
  * What the WRITE side emits: format-version 1 metadata with an
  * unpartitioned spec — every export appends ONE snapshot whose
  * single manifest lists the full live file set (`status = 1` added /
  * `status = 0` existing), so foreign readers time-travel across
  * exports on snapshot boundaries. Data files are ordinary parquet
  * written by Spark; metadata versions are append-only with
  * `version-hint.text` swapped last (the spec's commit order for
  * file-system tables).
  *
  * Honesty note: no Iceberg implementation exists in this container,
  * so the spec tests necessarily read tables this exporter wrote —
  * field names, ids, and layout follow the published spec (manifest
  * entry/`data_file` field ids 0-4/100-104, snapshot JSON keys), but
  * cross-implementation agreement is asserted against the spec text,
  * not a live Iceberg runtime.
  */
object IcebergLite {

  /** A resolved Iceberg table state: live data files (absolute),
    * live position-delete files (v2; empty for v1 tables), the
    * snapshot id, and the table's declared schema JSON. */
  /** One partition-spec field: the partition FIELD name (the tuple
    * key), the SOURCE column name, and the parsed transform. */
  final case class SpecField(name: String, source: String,
                             transform: IcebergTransforms.Transform)

  final case class Snapshot(files: Seq[String], snapshotId: Long,
                            schemaJson: String,
                            posDeleteFiles: Seq[String] = Nil,
                            dataFileSeq: Map[String, Long] = Map.empty,
                            eqDeletes: Seq[EqDelete] = Nil,
                            bounds: Map[String,
                              Map[Int, (Array[Byte], Array[Byte])]] =
                              Map.empty,
                            partitionValues: Map[String,
                              Map[String, String]] = Map.empty,
                            specFields: Seq[SpecField] = Nil,
                            dvs: Seq[DvRef] = Nil)

  /** One equality-delete file (v2 `data_file.content=2`): its parquet
    * path, the EQUALITY COLUMNS (resolved from `equality_ids` via the
    * table schema), and the sequence proxy (its manifest's
    * `added_snapshot_id`) — a matching row in a data file with an
    * OLDER sequence is deleted. */
  final case class EqDelete(path: String, cols: Seq[String], seq: Long)

  /** One v3 DELETION VECTOR (a `deletion-vector-v1` blob in a Puffin
    * file, listed by a delete manifest as content=1 +
    * file_format=PUFFIN): where the blob lives, which data file it
    * masks, and the sequence it was added at (resolution when a
    * table's carried manifests list superseded DVs for the same data
    * file: highest sequence wins — a DV must contain every position
    * of the one it replaces, per the spec's merge invariant). */
  final case class DvRef(puffinPath: String, offset: Long, length: Long,
                         referencedDataFile: String, seq: Long)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // ── shared text/FS helpers ─────────────────────────────────────────

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readText(spark: SparkSession, p: Path): String = {
    val in = fsOf(spark, p).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var r = in.read(buf)
      while (r > 0) { out.write(buf, 0, r); r = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeText(spark: SparkSession, p: Path,
                        text: String): Unit = {
    val fs = fsOf(spark, p)
    val out = fs.create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  // ── READ: metadata.json → manifest list → manifests → files ───────

  private def metadataPath(spark: SparkSession, location: String): Path = {
    val meta = new Path(location, "metadata")
    val fs = fsOf(spark, meta)
    val hint = new Path(meta, "version-hint.text")
    if (fs.exists(hint)) {
      val v = readText(spark, hint).trim.toLong
      new Path(meta, s"v$v.metadata.json")
    } else {
      // Resolve "latest" by NUMERIC version, not lexical sort: this
      // writer names files v1, v2, … v10 unpadded, so lexically
      // "v9.metadata.json" > "v10.metadata.json" and any hint-less
      // table with ≥10 versions would silently resolve stale metadata.
      // Real Iceberg zero-pads (00010-<uuid>.metadata.json); accept
      // both shapes by extracting the leading integer run.
      val VNum = """(?:v)?0*(\d+)[-.].*""".r
      val candidates =
        if (!fs.exists(meta)) Seq.empty
        else fs.listStatus(meta).toSeq.map(_.getPath.getName)
          .filter(_.endsWith(".metadata.json"))
      if (candidates.isEmpty)
        throw new IOException(s"no Iceberg metadata under $location " +
          "(missing metadata/*.metadata.json)")
      val latest = candidates.maxBy {
        case VNum(n) => n.toLong
        case _       => -1L // unparseable names lose to any versioned one
      }
      new Path(meta, latest)
    }
  }

  /** Read one Avro container file into generic records. Manifests are
    * bounded metadata (one record per data file / per manifest), so
    * the driver-side materialization is O(files-metadata), the same
    * bound Iceberg's own planner has. */
  private def avroRecords(spark: SparkSession,
                          p: Path): Seq[GenericRecord] = {
    // DataFileReader needs a SeekableInput; copy locally (manifests
    // are small metadata files) to stay FS-agnostic
    val fs = fsOf(spark, p)
    val tmp = java.io.File.createTempFile("iceberg-manifest", ".avro")
    try {
      val in = fs.open(p)
      try {
        val out = new java.io.FileOutputStream(tmp)
        try {
          val buf = new Array[Byte](65536)
          var r = in.read(buf)
          while (r > 0) { out.write(buf, 0, r); r = in.read(buf) }
        } finally out.close()
      } finally in.close()
      val reader = new DataFileReader[GenericRecord](tmp,
        new GenericDatumReader[GenericRecord]())
      try reader.iterator().asScala.toVector
      finally reader.close()
    } finally { tmp.delete(); () }
  }

  private def str(r: GenericRecord, field: String): Option[String] =
    Option(r.get(field)).map(_.toString)

  /** Exact row count from the parquet FOOTER — zero Spark jobs. The
    * export paths previously ran `spark.read.parquet(f).count()` per
    * file (one full Spark job each), which at many-file tables made
    * manifest writing O(files) jobs; the footer already carries the
    * exact count. */
  private def parquetRowCount(spark: SparkSession, p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(p, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Per-file column bounds from the parquet FOOTER (no data read):
    * field id → (lower, upper) in the spec's single-value binary
    * serialization (Appendix D — int 4-byte LE, long 8-byte LE,
    * string UTF-8). Row-group statistics merge across blocks; a
    * column with no usable stats (unsupported type, all-null, or
    * stats absent) is simply omitted — bounds are optional per
    * column, and a missing entry makes scan pruning CONSERVATIVE,
    * never wrong. */
  private def parquetColumnBounds(spark: SparkSession, p: Path)
    : Map[Int, (Array[Byte], Array[Byte])] = {
    import org.apache.parquet.column.statistics._
    def le(n: Long, width: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putLong(0, n).array().take(width)
    // accumulate TYPED min/max per field id across row groups, then
    // serialize once — merging at the byte level would be wrong for
    // signed little-endian values
    val longB = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    val intCols = scala.collection.mutable.Set.empty[Int]
    val binB =
      scala.collection.mutable.Map.empty[Int, (Array[Byte], Array[Byte])]
    def lexMin(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (java.util.Arrays.compareUnsigned(a, b) <= 0) a else b
    def lexMax(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (java.util.Arrays.compareUnsigned(a, b) >= 0) a else b
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(p, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      // bounds key by the file's OWN parquet field ids when present
      // (foreign/evolved files may have non-consecutive ids); the
      // ordinal+1 fallback matches this writer's schema JSON for
      // id-less legacy files
      val msgType = r.getFooter.getFileMetaData.getSchema
      r.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.zipWithIndex.foreach { case (c, i) =>
          val fieldId: Int = {
            val name = c.getPath.toDotString
            val idOpt =
              if (c.getPath.size() == 1 && msgType.containsField(name))
                msgType.getFields.asScala.find(_.getName == name)
                  .flatMap(f => Option(f.getId))
              else None
            idOpt.map(_.intValue).getOrElse(i + 1)
          }
          val st = c.getStatistics
          if (c.getPath.size() == 1 && st != null && !st.isEmpty &&
              st.hasNonNullValue) st match {
            case s: IntStatistics =>
              intCols += fieldId
              val (lo, hi) = longB.getOrElse(fieldId,
                (Long.MaxValue, Long.MinValue))
              longB(fieldId) = (math.min(lo, s.getMin.toLong),
                math.max(hi, s.getMax.toLong))
            case s: LongStatistics =>
              val (lo, hi) = longB.getOrElse(fieldId,
                (Long.MaxValue, Long.MinValue))
              longB(fieldId) = (math.min(lo, s.getMin),
                math.max(hi, s.getMax))
            case s: BinaryStatistics =>
              val (mn, mx) = (s.getMin.getBytes.clone(),
                s.getMax.getBytes.clone())
              val (lo, hi) = binB.getOrElse(fieldId, (mn, mx))
              binB(fieldId) = (lexMin(lo, mn), lexMax(hi, mx))
            case _ => () // other types: omit bounds (conservative)
          }
        }
      }
      longB.map { case (f, (lo, hi)) =>
        val w = if (intCols(f)) 4 else 8
        f -> (le(lo, w), le(hi, w))
      }.toMap ++ binB.toMap
    } finally r.close()
  }

  /** Does this parquet file's footer schema carry field ids? One
    * footer read — the probe that picks id- vs name-based column
    * resolution at scan planning. */
  private[sources] def parquetHasFieldIds(spark: SparkSession, p: Path): Boolean = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(p, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.getFields.asScala
      .forall(_.getId != null)
    finally r.close()
  }

  /** Little-endian signed decode of a 4- or 8-byte bound payload. */
  private[graft] def leLong(b: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(b)
    if (b.length == 4) buf.getInt(0).toLong else buf.getLong(0)
  }

  /** Field access tolerant of WRITER schemas that predate (or simply
    * lack) the field — `GenericData.Record.get` THROWS on names not
    * in the schema, so every speculative v2-field read goes through
    * here. */
  private def fieldOpt(r: GenericRecord, field: String): Option[AnyRef] =
    if (r.getSchema.getField(field) == null) None
    else Option(r.get(field))

  private def long0(r: GenericRecord, field: String): Long =
    Option(r.get(field)).map(_.toString.toLong).getOrElse(0L)

  /** Resolve the table state at `snapshotId` (default: current). */
  def snapshot(spark: SparkSession, location: String,
               snapshotId: Option[Long] = None): Snapshot = {
    val metaP = metadataPath(spark, location)
    val meta = mapper.readTree(readText(spark, metaP))
    val fv = meta.get("format-version").asInt
    if (fv > 3)
      throw new IOException(s"cannot read Iceberg table at $location: " +
        s"format-version $fv exceeds the supported 1-3 — refusing " +
        "rather than misreading newer semantics")
    // v3 reads are supported for its most consequential feature —
    // Puffin DELETION VECTORS (collected in the manifest walk below);
    // the v3 features this reader does NOT implement refuse by name
    // rather than misread: a column default would have to be
    // SYNTHESIZED for files written before the column existed
    // (serving null instead is a misread), so any schema field
    // carrying one refuses here. Row lineage adds hidden metadata
    // columns only — ignoring it for data-column reads is sound.
    if (fv >= 3) {
      val schemaNode = Option(meta.get("schemas"))
        .filter(_.elements().hasNext)
        .map(_.elements().asScala.toSeq.last)
        .orElse(Option(meta.get("schema")))
      schemaNode.toSeq.flatMap(s =>
        Option(s.get("fields")).toSeq.flatMap(_.elements().asScala))
        .foreach { f =>
          if (f.has("initial-default") && !f.get("initial-default").isNull)
            throw new IOException(s"cannot read Iceberg table at " +
              s"$location: v3 field '${f.get("name").asText}' carries " +
              "an initial-default — default-value synthesis is not " +
              "implemented; refusing rather than serving null for it")
        }
    }
    val snaps = meta.get("snapshots")
    if (snaps == null || !snaps.elements().hasNext)
      throw new IOException(s"Iceberg table at $location has no snapshots")
    val wanted = snapshotId.getOrElse(
      Option(meta.get("current-snapshot-id")).filterNot(_.isNull)
        .map(_.asLong).getOrElse(throw new IOException(
          s"Iceberg table at $location declares no " +
            "current-snapshot-id — nothing to read")))
    val snap = snaps.elements().asScala
      .find(_.get("snapshot-id").asLong == wanted)
      .getOrElse(throw new IOException(
        s"snapshot $wanted not found at $location (expired or never " +
          "committed); available: " + snaps.elements().asScala
            .map(_.get("snapshot-id").asLong).mkString(", ")))
    val manifestListPath = new Path(snap.get("manifest-list").asText)
    val schemaJson =
      Option(meta.get("schemas")).filter(_.elements().hasNext)
        .map(_.elements().asScala.toSeq.last.toString)
        .orElse(Option(meta.get("schema")).map(_.toString))
        .getOrElse("{}")
    val dataFiles = Seq.newBuilder[String]
    val deleteFiles = Seq.newBuilder[String]
    val dvRefs = Seq.newBuilder[DvRef]
    val dataSeqs = Map.newBuilder[String, Long]
    val eqDels = Seq.newBuilder[EqDelete]
    val fileBounds =
      Map.newBuilder[String, Map[Int, (Array[Byte], Array[Byte])]]
    val partValues = Map.newBuilder[String, Map[String, String]]
    val idToName: Map[Int, String] = fieldIdToName(schemaJson)
    // partition spec: KNOWN transforms parse into specFields (the
    // planner's pruning inputs — identity, bucket[N], truncate[W],
    // day/month/year, void); an UNKNOWN transform would be silently
    // mis-pruned, so it refuses by name at parse
    val specFields: Seq[SpecField] =
      Option(meta.get("partition-specs"))
        .map(_.elements().asScala.toSeq).getOrElse(Nil)
        .find(sp => Option(meta.get("default-spec-id"))
          .forall(_.asInt == sp.get("spec-id").asInt))
        .map { sp =>
          sp.get("fields").elements().asScala.toSeq.map { f =>
            val tr =
              try IcebergTransforms.parse(f.get("transform").asText)
              catch { case e: IOException => throw new IOException(
                s"cannot read Iceberg table at $location: " +
                  e.getMessage) }
            val src = Option(f.get("source-id")).map(_.asInt)
              .flatMap(idToName.get)
              .getOrElse(f.get("name").asText)
            SpecField(f.get("name").asText, src, tr)
          }
        }.getOrElse(Nil)
    // Sequence ordering (the input to equality-delete application):
    // the spec's source of truth is the manifest-list's
    // `sequence_number` (field-id 515), inherited by entries whose own
    // sequence_number is null; an entry's EXPLICIT sequence_number
    // (compaction-preserved row age) overrides. Real v2 writers leave
    // entry numbers null and use RANDOM snapshot ids, so the old
    // added_snapshot_id proxy silently mis-ordered foreign deletes —
    // now the proxy is only a fallback for manifests that carry no
    // sequence_number at all, and a table that BOTH lacks the field
    // and carries equality deletes refuses (ordering unprovable).
    var seqUnproven = false
    // Self-written tables are recognizable (the export writer stamps
    // a fixed all-zeros table-uuid) and use DETERMINISTIC, strictly
    // increasing snapshot ids (`snapId = nextV`), so for them the
    // added_snapshot_id proxy IS the sequence order — pre-
    // sequence_number exports from this writer stay readable instead
    // of regressing to the foreign-writer refusal below.
    // The all-zeros uuid alone is spoofable (a foreign/hand-edited
    // table could carry it with RANDOM snapshot ids, and trusting the
    // added_snapshot_id proxy would then mis-order deletes), so also
    // require the writer's deterministic commit pattern: every
    // snapshot's id equals its sequence-number (`snapId = nextV`) and
    // ids are strictly increasing across the snapshot list.
    val selfWritten = Option(meta.get("table-uuid"))
      .exists(_.asText == "00000000-0000-0000-0000-000000000000") && {
      val ids = Option(meta.get("snapshots")).toSeq
        .flatMap(_.elements().asScala)
        .map(s => (s.get("snapshot-id").asLong,
          Option(s.get("sequence-number")).filterNot(_.isNull)
            .map(_.asLong)))
      ids.forall { case (id, seq) => seq.forall(_ == id) } &&
        ids.map(_._1).sliding(2).forall(w =>
          w.length < 2 || w(0) < w(1))
    }
    avroRecords(spark, manifestListPath).foreach { mf =>
      // v2 manifest_file carries `content`: 0 = data, 1 = deletes.
      // Delete manifests are READ (position deletes anti-join at scan
      // — see read()); an UNKNOWN content would be misread, so refuse.
      val content = long0(mf, "content")
      if (content > 1L)
        throw new IOException(s"cannot read Iceberg table at " +
          s"$location: snapshot $wanted carries a manifest with " +
          s"unknown content=$content — newer Iceberg than this reader")
      val mPath = new Path(str(mf, "manifest_path").getOrElse(
        throw new IOException("manifest_file entry missing manifest_path")))
      val mSeqOpt = fieldOpt(mf, "sequence_number")
        .map(_.toString.toLong)
      if (mSeqOpt.isEmpty && !selfWritten) seqUnproven = true
      val mSeq = mSeqOpt.getOrElse(long0(mf, "added_snapshot_id"))
      avroRecords(spark, mPath).foreach { entry =>
        val status = long0(entry, "status") // 0 existing, 1 added, 2 deleted
        if (status > 2)
          throw new IOException(s"unknown manifest entry status " +
            s"$status in $mPath — newer Iceberg than this reader")
        // data sequence number: the entry's own when explicit (spec:
        // existing entries keep the sequence of the commit that added
        // them), else inherited from its manifest
        val entrySeq = fieldOpt(entry, "sequence_number")
          .map(_.toString.toLong).getOrElse(mSeq)
        if (status != 2L) {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val fmt = str(df, "file_format").getOrElse("PARQUET")
          val isPuffinDv = fmt.equalsIgnoreCase("PUFFIN") &&
            content == 1L && long0(df, "content") == 1L
          if (!fmt.equalsIgnoreCase("PARQUET") && !isPuffinDv)
            throw new IOException(s"cannot read Iceberg data file " +
              s"format $fmt — parquet (and Puffin deletion vectors) " +
              "only; refusing rather than skipping files (silent " +
              "row loss)")
          val p = str(df, "file_path")
          // v2 data_file.content: 0 data, 1 position deletes,
          // 2 equality deletes. Equality deletes need the table's
          // equality-field evaluation semantics — refuse loudly
          // (narrowed from the former all-deletes refusal); a file
          // kind crossed into the wrong manifest would be misapplied,
          // so that refuses too rather than guessing.
          val fileKind = long0(df, "content")
          (content, fileKind) match {
            case (0L, 0L) =>
              p.foreach { path => dataFiles += path
                dataSeqs += path -> entrySeq
                val bs = entryBounds(df)
                if (bs.nonEmpty) fileBounds += path -> bs
                Option(df.get("partition"))
                  .collect { case r: GenericRecord
                    if !r.getSchema.getFields.isEmpty =>
                      r.getSchema.getFields.asScala.map(f =>
                        f.name -> Option(r.get(f.name))
                          .map(_.toString).orNull).toMap
                  }.foreach(pv => partValues += path -> pv) }
            case (1L, 1L) if isPuffinDv =>
              // v3 deletion vector: a Puffin blob slice referencing
              // ONE data file — all three locator fields required
              def need(field: String): Long =
                fieldOpt(df, field).map(_.toString.toLong)
                  .getOrElse(throw new IOException(
                    s"Puffin DV entry in $mPath lacks $field — " +
                      "cannot locate the blob; refusing"))
              val refFile = fieldOpt(df, "referenced_data_file")
                .map(_.toString).getOrElse(throw new IOException(
                  s"Puffin DV entry in $mPath lacks " +
                    "referenced_data_file — a DV that could mask any " +
                    "file is unapplicable; refusing"))
              p.foreach(path => dvRefs += DvRef(path,
                need("content_offset"), need("content_size_in_bytes"),
                refFile, entrySeq))
            case (1L, 1L) => p.foreach(deleteFiles += _)
            case (1L, 2L) =>
              val ids = fieldOpt(entry.get("data_file")
                  .asInstanceOf[GenericRecord], "equality_ids")
                .collect { case l: java.util.List[_] =>
                  l.asScala.map(_.toString.toInt).toSeq }
                .getOrElse(Seq.empty)
              if (ids.isEmpty)
                throw new IOException(s"equality delete file in " +
                  s"$mPath declares no equality_ids — cannot " +
                  "evaluate; refusing")
              val cols = ids.map(id => idToName.getOrElse(id,
                throw new IOException(s"equality_ids field $id not " +
                  s"in the table schema at $location — refusing")))
              p.foreach(path => eqDels += EqDelete(path, cols, entrySeq))
            case _ =>
              throw new IOException(s"malformed Iceberg DELETE " +
                s"manifest at $location: manifest content=$content " +
                s"lists a file with content=$fileKind — refusing " +
                "rather than resurrecting or dropping rows")
          }
        }
      }
    }
    val eqd = eqDels.result().distinct
    if (eqd.nonEmpty && seqUnproven)
      throw new IOException(s"cannot read Iceberg table at $location: " +
        "snapshot carries equality deletes but its manifest list " +
        "declares no sequence_number field — delete/data ordering by " +
        "added_snapshot_id alone is unprovable for foreign writers " +
        "(random snapshot ids); refusing rather than resurrecting or " +
        "over-deleting rows")
    // DV resolution: at most one LIVE deletion vector per data file.
    // Carried manifests can still list a superseded DV (this writer
    // carries prior manifests verbatim; real compactions rewrite
    // them), so the HIGHEST-sequence DV per referenced file wins —
    // sound because the spec requires a replacement DV to contain
    // every position of the one it replaces. Two distinct DVs at the
    // SAME sequence are unresolvable and refuse.
    val dvsResolved = dvRefs.result().distinct
      .groupBy(_.referencedDataFile).map { case (ref, refs) =>
        val maxSeq = refs.map(_.seq).max
        val atMax = refs.filter(_.seq == maxSeq)
        if (atMax.length > 1)
          throw new IOException(s"cannot read Iceberg table at " +
            s"$location: data file $ref carries ${atMax.length} " +
            s"deletion vectors at sequence $maxSeq — resolution is " +
            "unprovable; refusing rather than under- or over-deleting")
        atMax.head
      }.toSeq.sortBy(_.referencedDataFile)
    Snapshot(dataFiles.result().distinct, wanted, schemaJson,
      deleteFiles.result().distinct, dataSeqs.result(),
      eqd, fileBounds.result(),
      partValues.result(), specFields, dvsResolved)
  }

  /** Decode a data_file's optional lower_bounds/upper_bounds k_v
    * arrays (spec map<int, binary>, field-ids 125/128) → field id →
    * (lower, upper). Only ids present in BOTH maps land — a one-sided
    * bound cannot adjudicate an overlap test. */
  private def entryBounds(df: GenericRecord)
    : Map[Int, (Array[Byte], Array[Byte])] = {
    def parse(field: String): Map[Int, Array[Byte]] =
      fieldOpt(df, field).collect { case l: java.util.List[_] =>
        l.asScala.collect { case r: GenericRecord =>
          val v = r.get("value") match {
            case bb: java.nio.ByteBuffer =>
              val d = bb.duplicate()
              val a = new Array[Byte](d.remaining()); d.get(a); a
            case ar: Array[Byte] => ar
            case other => other.toString.getBytes(StandardCharsets.UTF_8)
          }
          r.get("key").toString.toInt -> v
        }.toMap
      }.getOrElse(Map.empty)
    val lo = parse("lower_bounds")
    val hi = parse("upper_bounds")
    lo.keySet.intersect(hi.keySet).iterator
      .map(k => k -> (lo(k), hi(k))).toMap
  }

  /** Field id → name from the Iceberg schema JSON (top level — the
    * only level equality_ids may reference in this reader). */
  private def fieldIdToName(schemaJson: String): Map[Int, String] = {
    val node = mapper.readTree(schemaJson)
    Option(node.get("fields")).map(_.elements().asScala.toSeq)
      .getOrElse(Nil)
      .flatMap(f => Option(f.get("id"))
        .map(id => id.asInt -> f.get("name").asText))
      .toMap
  }

  /** Normalize a file URI for (file, pos) matching: delete files may
    * store `file:/x`, `file:///x`, or a bare `/x` for the same file
    * depending on the writer's qualification. */
  private def normPath(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.regexp_replace(c, "^file:/+", "/")

  /** The resolved live (or pinned) view as a DataFrame. Position
    * deletes (v2) apply at scan as an anti-join of the hidden
    * parquet (`_metadata.file_path`, `_metadata.row_index`) identity
    * against the delete files' (file_path, pos) pairs — the same
    * mechanism as the in-house `_dv` deletion-vector read path
    * (VersionedParquet), so delete application is O(data + deletes),
    * never a rewrite. Delete sets are small relative to data (they
    * exist to AVOID rewrites), so AQE broadcasts the build side. */
  def read(spark: SparkSession, location: String,
           snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val s = snapshot(spark, location, snapshotId)
    if (s.files.isEmpty) {
      // schema-only empty state: serve zero rows with the declared
      // column names/types parsed from the Iceberg schema JSON
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaFromIceberg(s.schemaJson))
    } else {
      // Column resolution: Iceberg's rule is BY FIELD ID, which is
      // what makes renames serve the new name over old files. Probe
      // one footer (bounded metadata): id-bearing files → id
      // resolution via the schema's parquet.field.id metadata;
      // id-less files (legacy exports, foreign writers without ids)
      // → name resolution, the only resolution an id-less file
      // supports (renameColumn refuses on such tables, so the name
      // path can never serve a renamed schema wrongly).
      val data =
        if (parquetHasFieldIds(spark, new Path(s.files.head))) {
          spark.conf.set("spark.sql.parquet.fieldId.read.enabled",
            "true")
          spark.read.schema(schemaFromIceberg(s.schemaJson))
            .parquet(s.files: _*)
        } else spark.read.parquet(s.files: _*)
      maskDeletes(spark, s, data)
    }
  }

  /** Apply a snapshot's row-level deletes to a scan of (any subset
    * of) its data files. Both tiers are PER-FILE sound, so a pruned
    * scan masks exactly like a full one: position deletes name (file,
    * pos) pairs — pairs for unread files simply never match — and
    * equality deletes compare each row against the delete rows with a
    * NEWER sequence than the row's own file. */
  private def maskDeletes(spark: SparkSession, s: Snapshot,
                          data: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val cols = data.columns.toSeq
    // v3 deletion vectors decode driver-side (bounded: one bitmap per
    // masked file, the same materialization the DeltaLite DV path
    // does) and join through the same (file, pos) anti-join as
    // position-delete files — a superseded DV never reaches here
    // (snapshot() resolved highest-sequence-per-file), and a v2
    // position delete alongside a DV for the same file is a no-op
    // union (the spec requires the DV to contain it).
    val dvPairs: Seq[(String, Long)] = s.dvs.flatMap { dv =>
      val ref = new Path(dv.referencedDataFile).toUri.getPath
      PuffinLite.readDvPositions(spark, dv.puffinPath, dv.offset,
        dv.length).map(p => (ref, p))
    }
    val posMasked =
      if (s.posDeleteFiles.isEmpty && dvPairs.isEmpty) data
      else {
        import spark.implicits._
        val fileDels = if (s.posDeleteFiles.isEmpty) None else Some(
          spark.read.parquet(s.posDeleteFiles: _*)
            .select(normPath(col("file_path")).as("_del_path"),
              col("pos").cast("long").as("_del_pos")))
        val dvDels = if (dvPairs.isEmpty) None else Some(
          dvPairs.toDF("_del_path", "_del_pos"))
        val dels = (fileDels.toSeq ++ dvDels.toSeq).reduce(_ union _)
        data
          .withColumn("_scan_path",
            normPath(col("_metadata.file_path")))
          .withColumn("_scan_pos", col("_metadata.row_index"))
          .join(dels,
            col("_scan_path") === col("_del_path") &&
              col("_scan_pos") === col("_del_pos"),
            "left_anti")
          .select(cols.map(col): _*)
      }
    if (s.eqDeletes.isEmpty) posMasked
    else {
      // EQUALITY deletes: a row is deleted when a delete file with
      // a NEWER sequence matches it on the delete's equality
      // columns. Sequence resolves from the manifest list's
      // sequence_number (entry override honored; the fold refuses
      // tables where ordering is unprovable). One anti-join per
      // delete file — delete files are few (they exist to batch
      // deletes), each a broadcast-sized key set.
      import org.apache.spark.sql.functions.{broadcast, lit}
      import spark.implicits._
      val seqDf = s.dataFileSeq.toSeq
        .map { case (p, sq) => (new Path(p).toUri.getPath, sq) }
        .toDF("_sp", "_seq")
      val withSeq = posMasked
        .withColumn("_scan_path",
          normPath(col("_metadata.file_path")))
        .join(broadcast(seqDf), col("_scan_path") === col("_sp"),
          "left")
      val masked = s.eqDeletes.foldLeft(withSeq) { case (df, ed) =>
        val delRows = spark.read.parquet(ed.path)
          .select(ed.cols.map(c => col(c).as(s"_eq_$c")): _*)
          .distinct()
        val cond = ed.cols.map(c => df(c) <=> delRows(s"_eq_$c"))
          .reduce(_ && _) && df("_seq") < lit(ed.seq)
        df.join(delRows, cond, "left_anti")
      }
      masked.select(cols.map(col): _*)
    }
  }

  /** Scan with FILE SKIPPING on the manifests' column bounds: plan
    * the live files whose [lower, upper] range for `column` overlaps
    * [lo, hi], read ONLY those, apply the exact predicate on top.
    * Returns (rows, filesScanned, filesTotal) so callers can assert
    * pruning happened. A file with no stored bounds for the column is
    * kept (conservative — skipping it would lose rows); a column id
    * absent from the schema refuses. Integer/long columns only — the
    * two the single-value decode understands; anything else refuses
    * rather than comparing bytes with the wrong collation.
    *
    * Delete-bearing snapshots prune SOUNDLY: the stored bounds
    * describe a file's RAW rows (masked included), so the overlap
    * test can only over-keep, never skip a live row, and the same
    * per-file delete masking the full read applies runs over the
    * kept subset — position pairs for unread files simply never
    * match, and equality deletes compare per row against its own
    * file's sequence.
    *
    * This is the planner-side half of what the manifests' bounds are
    * FOR at 100 TB: a predicate touching one day of a year-long table
    * opens 1/365 of the files, and the decision costs one manifest
    * walk — no parquet footer, no data page. */
  def readPruned(spark: SparkSession, location: String, column: String,
                 lo: Long, hi: Long): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.col
    val s = snapshot(spark, location)
    val schema = schemaFromIceberg(s.schemaJson)
    val idx = schema.fieldNames.indexOf(column)
    require(idx >= 0, s"readPruned: column $column not in the " +
      s"table schema at $location")
    require(schema(idx).dataType == LongType ||
        schema(idx).dataType == IntegerType,
      s"readPruned: column $column is ${schema(idx).dataType} — " +
        "bounds pruning implemented for int/long only")
    // stored bounds are keyed by the REAL Iceberg field id (carried on
    // the StructField as parquet.field.id metadata) — ordinal+1 only
    // coincides for self-written tables; a foreign/evolved schema with
    // non-consecutive ids would hit ANOTHER column's bounds and skip
    // files wrongly (silent row loss)
    val fieldId =
      if (schema(idx).metadata.contains("parquet.field.id"))
        schema(idx).metadata.getLong("parquet.field.id").toInt
      else idx + 1
    val kept = s.files.filter { f =>
      s.bounds.get(f).flatMap(_.get(fieldId)) match {
        case Some((bLo, bHi)) => leLong(bHi) >= lo && leLong(bLo) <= hi
        case None => true // no bounds recorded → cannot skip
      }
    }
    val pred = col(column) >= lo && col(column) <= hi
    val rows =
      if (kept.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else maskDeletes(spark, s, spark.read.parquet(kept: _*))
        .filter(pred)
    (rows, kept.size, s.files.size)
  }

  /** Expire all but the last `keepLast` snapshots — the retention
    * maintenance every long-lived Iceberg table needs (Iceberg's own
    * `expireSnapshots` contract): the snapshot list shrinks in a NEW
    * metadata version (history is append-only; the hint swaps last,
    * the spec's commit order), and files reachable ONLY through
    * expired snapshots are physically deleted — data files, delete
    * files, manifests, manifest lists. Reachability is computed the
    * safe way: a file mentioned by any KEPT snapshot's manifests with
    * a live status (or any delete-file entry) survives; status=2
    * tombstone mentions do not pin a file (readers skip them by
    * spec). Returns (snapshotsExpired, filesDeleted — data/delete
    * files only, manifests not counted).
    *
    * Refuses when the CURRENT snapshot would expire: that is not
    * retention, that is data loss. */
  def expireSnapshots(spark: SparkSession, location: String,
                      keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val metaP = metadataPath(spark, location)
    val fs = fsOf(spark, metaP)
    val meta = mapper.readTree(readText(spark, metaP))
    val snapsNode = Option(meta.get("snapshots"))
      .getOrElse(throw new IOException(
        s"Iceberg table at $location has no snapshots"))
    val snaps = snapsNode.elements().asScala.toSeq
    if (snaps.length <= keepLast) return (0, 0)
    val current = Option(meta.get("current-snapshot-id"))
      .filterNot(_.isNull).map(_.asLong)
      .getOrElse(throw new IOException(
        s"Iceberg table at $location declares no current-snapshot-id " +
          "— refusing to expire snapshots against an unknown head"))
    val (removed, kept) = snaps.splitAt(snaps.length - keepLast)
    if (!kept.exists(_.get("snapshot-id").asLong == current))
      throw new IOException(s"refusing to expire the CURRENT snapshot " +
        s"$current at $location — that is data loss, not retention")
    // one snapshot's reachable paths: (its manifest-list + manifests,
    // the data/delete files its live entries mention)
    def reach(snap: com.fasterxml.jackson.databind.JsonNode,
              liveOnly: Boolean): (Set[String], Set[String]) = {
      val listP = new Path(snap.get("manifest-list").asText)
      val metaPaths = Set.newBuilder[String]
      val filePaths = Set.newBuilder[String]
      metaPaths += listP.toString
      avroRecords(spark, listP).foreach { mf =>
        val mPath = str(mf, "manifest_path").getOrElse(
          throw new IOException("manifest_file missing manifest_path"))
        metaPaths += mPath
        avroRecords(spark, new Path(mPath)).foreach { entry =>
          val status = long0(entry, "status")
          if (!liveOnly || status != 2L) {
            val df = entry.get("data_file").asInstanceOf[GenericRecord]
            str(df, "file_path").foreach(filePaths += _)
          }
        }
      }
      (metaPaths.result(), filePaths.result())
    }
    val (keptMeta, keptFiles) = kept.map(reach(_, liveOnly = true))
      .reduce((a, b) => (a._1 ++ b._1, a._2 ++ b._2))
    val (remMeta, remFiles) = removed.map(reach(_, liveOnly = false))
      .reduce((a, b) => (a._1 ++ b._1, a._2 ++ b._2))
    // commit FIRST (new metadata without the expired snapshots, hint
    // swapped last), delete after — a crash between the two leaks
    // orphan files (re-running expiry cannot resurrect a misread)
    val newMeta = meta.deepCopy[com.fasterxml.jackson.databind.node
      .ObjectNode]
    val arr = mapper.createArrayNode()
    kept.foreach(arr.add)
    newMeta.set[com.fasterxml.jackson.databind.JsonNode]("snapshots", arr)
    val curV = "^v(\\d+)\\.metadata\\.json$".r
      .findFirstMatchIn(metaP.getName).map(_.group(1).toLong)
      .getOrElse(throw new IOException(
        s"cannot parse metadata version from ${metaP.getName}"))
    val metaDir = metaP.getParent
    writeText(spark, new Path(metaDir, s"v${curV + 1}.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(newMeta))
    writeText(spark, new Path(metaDir, "version-hint.text"),
      (curV + 1).toString)
    var deletedData = 0
    (remFiles -- keptFiles).foreach { p =>
      if (fs.delete(new Path(p), false)) deletedData += 1
    }
    (remMeta -- keptMeta).foreach(p => fs.delete(new Path(p), false))
    (removed.length, deletedData)
  }

  /** Rename a column — METADATA ONLY, the Iceberg evolution rule: the
    * field keeps its id, only the schema JSON's name changes (new
    * metadata version, hint swapped last); no data file is touched,
    * and readers serve the NEW name over OLD files because resolution
    * is by field id. Refuses when any live data file lacks parquet
    * field ids (an id-less file cannot be id-resolved, so the rename
    * would silently drop its column), when the source column is
    * missing, or when the target name is taken. */
  def renameColumn(spark: SparkSession, location: String,
                   from: String, to: String): Unit = {
    val metaP = metadataPath(spark, location)
    val meta = mapper.readTree(readText(spark, metaP))
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    val schemaNode = Option(meta.get("schema")).getOrElse(
      throw new IOException(s"no schema in ${metaP.getName}"))
    val fields = schemaNode.get("fields").elements().asScala.toSeq
    require(fields.exists(_.get("name").asText == from),
      s"renameColumn: no column $from at $location")
    require(!fields.exists(_.get("name").asText == to),
      s"renameColumn: column $to already exists at $location")
    val live = snapshot(spark, location)
    live.files.foreach { f =>
      if (!parquetHasFieldIds(spark, new Path(f)))
        throw new IOException(s"cannot rename $from at $location: " +
          s"data file $f carries no parquet field ids — an id-less " +
          "file cannot be resolved by field id after a rename " +
          "(silent column loss); rewrite the file first")
    }
    fields.foreach {
      case f: com.fasterxml.jackson.databind.node.ObjectNode
        if f.get("name").asText == from => f.put("name", to)
      case _ => ()
    }
    // foreign metadata may carry a "schemas" list (readers prefer its
    // last entry) — rename there too or the read would serve stale
    Option(meta.get("schemas")).filter(_.elements().hasNext).foreach {
      ss =>
        ss.elements().asScala.toSeq.lastOption.foreach { last =>
          last.get("fields").elements().asScala.foreach {
            case f: com.fasterxml.jackson.databind.node.ObjectNode
              if f.get("name").asText == from => f.put("name", to)
            case _ => ()
          }
        }
    }
    val curV = "^v(\\d+)\\.metadata\\.json$".r
      .findFirstMatchIn(metaP.getName).map(_.group(1).toLong)
      .getOrElse(throw new IOException(
        s"cannot parse metadata version from ${metaP.getName}"))
    val metaDir = metaP.getParent
    writeText(spark, new Path(metaDir, s"v${curV + 1}.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(meta))
    writeText(spark, new Path(metaDir, "version-hint.text"),
      (curV + 1).toString)
  }

  /** All snapshot ids, commit order (the time-travel catalog). */
  def snapshotIds(spark: SparkSession, location: String): Seq[Long] = {
    val meta = mapper.readTree(readText(spark,
      metadataPath(spark, location)))
    Option(meta.get("snapshots")).map(_.elements().asScala
      .map(_.get("snapshot-id").asLong).toSeq).getOrElse(Nil)
  }

  /** The `snapshots` METADATA TABLE — Iceberg's own
    * `SELECT * FROM t.snapshots` introspection surface: one row per
    * snapshot in commit order — (snapshot_id, sequence_number,
    * timestamp_ms, operation, manifest_list, is_current). Driver
    * metadata only (the snapshot list is bounded by retention). */
  def snapshotsTable(spark: SparkSession, location: String): DataFrame = {
    val meta = mapper.readTree(readText(spark,
      metadataPath(spark, location)))
    val current = Option(meta.get("current-snapshot-id"))
      .filterNot(_.isNull).map(_.asLong).getOrElse(-1L)
    val rows = Option(meta.get("snapshots"))
      .map(_.elements().asScala.toSeq).getOrElse(Nil).map { sn =>
        val id = sn.get("snapshot-id").asLong
        (id,
          Option(sn.get("sequence-number")).map(_.asLong).getOrElse(id),
          Option(sn.get("timestamp-ms")).map(_.asLong).getOrElse(0L),
          Option(sn.get("summary")).flatMap(su =>
            Option(su.get("operation")).map(_.asText))
            .getOrElse("append"),
          sn.get("manifest-list").asText,
          id == current)
      }
    import spark.implicits._
    rows.toDF("snapshot_id", "sequence_number", "timestamp_ms",
      "operation", "manifest_list", "is_current")
  }

  /** The `files` METADATA TABLE — Iceberg's `SELECT * FROM t.files`:
    * one row per LIVE file of the current (or pinned) snapshot, data
    * and delete files alike — (content: 0 data / 1 position deletes /
    * 2 equality deletes, file_path, record_count, file_size_in_bytes,
    * sequence_number). One manifest walk, no data file opened —
    * exactly the planning metadata a 100 TB operator inspects before
    * touching a byte. */
  def filesTable(spark: SparkSession, location: String,
                 snapshotId: Option[Long] = None): DataFrame = {
    val metaP = metadataPath(spark, location)
    val meta = mapper.readTree(readText(spark, metaP))
    import spark.implicits._
    val currentOpt = Option(meta.get("current-snapshot-id"))
      .filterNot(_.isNull).map(_.asLong)
    val wantedOpt = snapshotId.orElse(currentOpt)
    if (wantedOpt.isEmpty)
      // a freshly created table with no committed snapshot has an
      // EMPTY file inventory, not a crash
      return Seq.empty[(Int, String, Long, Long, Long)]
        .toDF("content", "file_path", "record_count",
          "file_size_in_bytes", "sequence_number")
    val wanted = wantedOpt.get
    val snapNode = Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala)
      .find(_.get("snapshot-id").asLong == wanted)
      .getOrElse(throw new IOException(
        s"snapshot $wanted not found at $location"))
    val rows = Seq.newBuilder[(Int, String, Long, Long, Long, String)]
    avroRecords(spark,
      new Path(snapNode.get("manifest-list").asText)).foreach { mf =>
      val mSeq = fieldOpt(mf, "sequence_number")
        .map(_.toString.toLong)
        .getOrElse(long0(mf, "added_snapshot_id"))
      val mPath = new Path(str(mf, "manifest_path").getOrElse(
        throw new IOException("manifest_file missing manifest_path")))
      avroRecords(spark, mPath).foreach { entry =>
        if (long0(entry, "status") != 2L) {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val entrySeq = fieldOpt(entry, "sequence_number")
            .map(_.toString.toLong).getOrElse(mSeq)
          // referenced_data_file distinguishes v3 DV blobs that share
          // one puffin file (without it, the distinct below would
          // collapse same-cardinality blobs into one row)
          rows += ((long0(df, "content").toInt,
            str(df, "file_path").getOrElse(""),
            long0(df, "record_count"),
            long0(df, "file_size_in_bytes"), entrySeq,
            fieldOpt(df, "referenced_data_file")
              .map(_.toString).orNull))
        }
      }
    }
    import spark.implicits._
    rows.result().distinct.toDF("content", "file_path", "record_count",
      "file_size_in_bytes", "sequence_number", "referenced_data_file")
  }

  // ── Iceberg schema JSON ↔ Spark types (primitives we emit) ─────────

  private def icebergType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case StringType => "string"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IOException(
      s"no Iceberg mapping for Spark type $other — export refused " +
        "rather than emitting a schema foreign readers would misread")
  }

  private def sparkType(s: String): DataType = s match {
    case "long" => LongType
    case "int" => IntegerType
    case "string" => StringType
    case "double" => DoubleType
    case "float" => FloatType
    case "boolean" => BooleanType
    case "date" => DateType
    case "timestamptz" | "timestamp" => TimestampType
    case "binary" => BinaryType
    case d if d.startsWith("decimal") =>
      val Array(p, sc) = d.stripPrefix("decimal(").stripSuffix(")")
        .split(',').map(_.trim.toInt)
      DecimalType(p, sc)
    case other => throw new IOException(
      s"unsupported Iceberg type $other in table schema")
  }

  private[graft] def schemaFromIceberg(json: String): StructType = {
    val node = mapper.readTree(json)
    val fields = Option(node.get("fields"))
      .map(_.elements().asScala.toSeq).getOrElse(Nil)
    StructType(fields.map { f =>
      // carry the Iceberg field id as parquet field-id metadata: scans
      // that pass this schema resolve columns BY ID (the Iceberg
      // column-resolution rule), which is what makes renames serve the
      // new name over old files
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", f.get("id").asLong).build()
      StructField(f.get("name").asText,
        sparkType(f.get("type").asText),
        nullable = !Option(f.get("required")).exists(_.asBoolean),
        metadata = md)
    })
  }

  /** Stamp ordinal field ids (the ids icebergSchemaJson assigns) onto
    * a frame so Spark writes parquet `field_id` metadata — the hook
    * that makes exported files rename-evolvable. Requires
    * `spark.sql.parquet.fieldId.write.enabled` (set by the writers). */
  private def withFieldIds(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(df.schema.fields.zipWithIndex.map { case (f, i) =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).putLong("parquet.field.id", i + 1L)
        .build()
      col(s"`${f.name}`").as(f.name, md)
    }.toSeq: _*)
  }

  private def icebergSchemaJson(schema: StructType): String = {
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id": ${i + 1}, "name": ${mapper.writeValueAsString(f.name)}, """ +
        s""""required": ${!f.nullable}, "type": "${icebergType(f.dataType)}"}"""
    }
    s"""{"type": "struct", "schema-id": 0, "fields": [${fields.mkString(", ")}]}"""
  }

  // ── WRITE: export a frame as one appended Iceberg snapshot ─────────

  // Manifest entry / data_file Avro schemas per the spec's v1 manifest
  // layout (field ids in the "field-id" props are the spec's: status=0,
  // snapshot_id=1, data_file=2; file_path=100, file_format=101,
  // record_count=103, file_size_in_bytes=104). The `partition` struct
  // is empty — exports are unpartitioned (spec-id 0 with no fields).
  private val manifestEntrySchema: Schema = new Schema.Parser().parse(
    """{"type": "record", "name": "manifest_entry", "fields": [
      |  {"name": "status", "type": "int", "field-id": 0},
      |  {"name": "snapshot_id", "type": ["null", "long"],
      |   "default": null, "field-id": 1},
      |  {"name": "data_file", "field-id": 2, "type":
      |    {"type": "record", "name": "r2", "fields": [
      |      {"name": "content", "type": "int", "default": 0,
      |       "field-id": 134},
      |      {"name": "file_path", "type": "string", "field-id": 100},
      |      {"name": "file_format", "type": "string", "field-id": 101},
      |      {"name": "partition", "field-id": 102, "type":
      |        {"type": "record", "name": "r102", "fields": []}},
      |      {"name": "record_count", "type": "long", "field-id": 103},
      |      {"name": "file_size_in_bytes", "type": "long",
      |       "field-id": 104},
      |      {"name": "equality_ids", "type": ["null",
      |       {"type": "array", "items": "int"}], "default": null,
      |       "field-id": 135},
      |      {"name": "lower_bounds", "type": ["null",
      |       {"type": "array", "logicalType": "map", "items":
      |        {"type": "record", "name": "k126_v127", "fields": [
      |          {"name": "key", "type": "int", "field-id": 126},
      |          {"name": "value", "type": "bytes", "field-id": 127}
      |        ]}}], "default": null, "field-id": 125},
      |      {"name": "upper_bounds", "type": ["null",
      |       {"type": "array", "logicalType": "map", "items":
      |        {"type": "record", "name": "k129_v130", "fields": [
      |          {"name": "key", "type": "int", "field-id": 129},
      |          {"name": "value", "type": "bytes", "field-id": 130}
      |        ]}}], "default": null, "field-id": 128}
      |    ]}}
      |]}""".stripMargin)

  private val manifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type": "record", "name": "manifest_file", "fields": [
      |  {"name": "manifest_path", "type": "string", "field-id": 500},
      |  {"name": "manifest_length", "type": "long", "field-id": 501},
      |  {"name": "partition_spec_id", "type": "int", "field-id": 502},
      |  {"name": "content", "type": "int", "field-id": 517,
      |   "default": 0},
      |  {"name": "sequence_number", "type": ["null", "long"],
      |   "default": null, "field-id": 515},
      |  {"name": "min_sequence_number", "type": ["null", "long"],
      |   "default": null, "field-id": 516},
      |  {"name": "added_snapshot_id", "type": "long", "field-id": 503}
      |]}""".stripMargin)

  /** Attach column bounds to a data_file record as the spec's k_v
    * map arrays (lower_bounds 125, upper_bounds 128) — what lets a
    * planner (ours in readPruned, or a foreign engine's) skip whole
    * files on a predicate without opening them. */
  private def putBounds(dataFile: GenericRecord,
      bounds: Map[Int, (Array[Byte], Array[Byte])]): Unit =
    if (bounds.nonEmpty) {
      def kv(field: String,
             pick: ((Array[Byte], Array[Byte])) => Array[Byte]): Unit = {
        val arrSchema = dataFile.getSchema.getField(field).schema()
          .getTypes.asScala.find(_.getType != Schema.Type.NULL).get
        val recSchema = arrSchema.getElementType
        val list = new java.util.ArrayList[GenericRecord]()
        bounds.toSeq.sortBy(_._1).foreach { case (k, v) =>
          val rec = new GenericData.Record(recSchema)
          rec.put("key", k)
          rec.put("value", java.nio.ByteBuffer.wrap(pick(v)))
          list.add(rec)
        }
        dataFile.put(field, list)
      }
      kv("lower_bounds", _._1)
      kv("upper_bounds", _._2)
    }

  private def writeAvro(spark: SparkSession, p: Path, schema: Schema,
                        records: Seq[GenericRecord]): Long = {
    val tmp = java.io.File.createTempFile("iceberg-out", ".avro")
    try {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, tmp)
      try records.foreach(w.append) finally w.close()
      val fs = fsOf(spark, p)
      val out = fs.create(p, true)
      try out.write(java.nio.file.Files.readAllBytes(tmp.toPath))
      finally out.close()
      tmp.length()
    } finally { tmp.delete(); () }
  }

  /** Export `df` as the NEXT snapshot of the Iceberg table at
    * `location` (creating the table on first call). Each export is a
    * full-state snapshot: in append mode (default) the manifest lists
    * every live file (new files `status=1`, carried files `status=0`);
    * with `overwrite = true` the prior live files land as `status=2`
    * (deleted) entries — the spec's v1 existing/added/deleted
    * tracking — so the snapshot REPLACES the table the way INSERT
    * OVERWRITE does, while earlier snapshots stay pinnable. Either
    * way the Iceberg side time-travels across exports on snapshot
    * boundaries — the same commit-aligned story as the Delta export
    * sync (q198). Returns the new snapshot id. Metadata versions are
    * append-only; the `version-hint.text` swap is the last write
    * (spec commit order for file-system tables). */
  def export(spark: SparkSession, df: DataFrame,
             location: String, overwrite: Boolean = false): Long = {
    val loc = new Path(location)
    val fs = fsOf(spark, loc)
    val metaDir = new Path(loc, "metadata")
    fs.mkdirs(metaDir)
    val hint = new Path(metaDir, "version-hint.text")
    val (prevVersion, prevSnaps, prevFiles) =
      if (!fs.exists(hint)) (0L, Seq.empty[String], Seq.empty[String])
      else {
        val v = readText(spark, hint).trim.toLong
        val meta = mapper.readTree(readText(spark,
          new Path(metaDir, s"v$v.metadata.json")))
        val snapsJson = Option(meta.get("snapshots"))
          .map(_.elements().asScala.map(_.toString).toSeq).getOrElse(Nil)
        val live = snapshot(spark, location)
        // Carrying prior files in APPEND mode would resurrect the
        // rows their position deletes removed (the carried entries
        // reference whole files; the new single data manifest drops
        // the delete manifests). Overwrite mode is fine: prior files
        // land status=2, deletes become moot with their targets.
        require((live.posDeleteFiles.isEmpty &&
            live.eqDeletes.isEmpty && live.dvs.isEmpty) || overwrite,
          s"cannot append-export over $location: the live snapshot " +
            "carries row-level deletes; export with overwrite = true " +
            "(full replace), or append via appendManifest (which " +
            "preserves the delete manifests and sequence order)")
        // a v1-metadata rewrite of a v3 table is a downgrade even in
        // overwrite mode (v3-only table state would be dropped)
        require(!Option(meta.get("format-version")).exists(_.asInt > 2),
          s"cannot export over $location: table is format-version 3 " +
            "and this writer emits v1 metadata — refusing the downgrade")
        (v, snapsJson, live.files)
      }
    val nextV = prevVersion + 1
    val snapId = nextV // deterministic, strictly increasing
    // data: one new parquet dir per snapshot; previous snapshots'
    // files are immutable, so carrying them is a metadata-only listing
    val dataDir = new Path(loc, s"data/snap-$snapId")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    withFieldIds(df).write.mode("overwrite").parquet(dataDir.toString)
    val newFiles = fs.listStatus(dataDir).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
      .map(p => fs.makeQualified(p))
    def entry(path: Path, status: Int): GenericRecord = {
      val st = fs.getFileStatus(path)
      val dataFile = new GenericData.Record(
        manifestEntrySchema.getField("data_file").schema())
      dataFile.put("content", 0) // data file (v2 field; v1 readers skip)
      dataFile.put("file_path", path.toString)
      dataFile.put("file_format", "PARQUET")
      dataFile.put("partition", new GenericData.Record(
        dataFile.getSchema.getField("partition").schema()))
      // record_count is per-file spec metadata; 0 is not spec-legal
      // for real counts, but foreign planners treat it as a hint —
      // we emit the exact parquet footer count to stay honest
      dataFile.put("record_count",
        parquetRowCount(spark, path))
      dataFile.put("file_size_in_bytes", st.getLen)
      putBounds(dataFile, parquetColumnBounds(spark, path))
      val e = new GenericData.Record(manifestEntrySchema)
      e.put("status", status)
      e.put("snapshot_id", snapId)
      e.put("data_file", dataFile)
      e
    }
    val entries =
      prevFiles.map(f => entry(new Path(f), if (overwrite) 2 else 0)) ++
        newFiles.map(f => entry(f, 1))
    val manifestP = new Path(metaDir, s"manifest-$snapId.avro")
    val mLen = writeAvro(spark, manifestP, manifestEntrySchema, entries)
    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", fs.makeQualified(manifestP).toString)
    mf.put("manifest_length", mLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 0)
    mf.put("sequence_number", java.lang.Long.valueOf(snapId))
    mf.put("min_sequence_number", java.lang.Long.valueOf(snapId))
    mf.put("added_snapshot_id", snapId)
    val listP = new Path(metaDir, s"snap-$snapId-manifest-list.avro")
    writeAvro(spark, listP, manifestFileSchema, Seq(mf))
    val now = System.currentTimeMillis()
    val snapJson =
      s"""{"snapshot-id": $snapId, "timestamp-ms": $now, """ +
        s""""manifest-list": ${mapper.writeValueAsString(
          fs.makeQualified(listP).toString)}, """ +
        s""""summary": {"operation": "append"}}"""
    val allSnaps = prevSnaps :+ snapJson
    val metaJson =
      s"""{
         |  "format-version": 1,
         |  "table-uuid": "00000000-0000-0000-0000-${"%012d".format(0)}",
         |  "location": ${mapper.writeValueAsString(location)},
         |  "last-updated-ms": $now,
         |  "last-column-id": ${df.schema.fields.length},
         |  "schema": ${icebergSchemaJson(df.schema)},
         |  "partition-spec": [],
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "default-spec-id": 0,
         |  "current-snapshot-id": $snapId,
         |  "snapshots": [${allSnaps.mkString(", ")}]
         |}""".stripMargin
    writeText(spark, new Path(metaDir, s"v$nextV.metadata.json"), metaJson)
    writeText(spark, hint, nextV.toString) // the commit: hint swaps last
    snapId
  }

  /** The manifest-entry Avro schema for an identity-PARTITIONED table:
    * the static schema with the r102 partition struct populated — one
    * optional field per partition column (spec field-ids 1000+i). */
  private def partitionedEntrySchema(parts: Seq[(String, String)])
    : Schema = {
    val pf = parts.zipWithIndex.map { case ((c, t), i) =>
      s"""{"name": ${mapper.writeValueAsString(c)},
         | "type": ["null", "$t"], "default": null,
         | "field-id": ${1000 + i}}""".stripMargin
    }.mkString(",\n")
    new Schema.Parser().parse(
      manifestEntrySchema.toString
        .replace(""""name":"r102","fields":[]""",
          s""""name":"r102","fields":[$pf]"""))
  }

  /** Export a frame as an identity-PARTITIONED Iceberg table: the
    * manifest carries each file's partition TUPLE (the spec's r102
    * struct, field-ids 1000+i) and the metadata declares the identity
    * spec — what lets any planner (ours in readPartitionPruned, or a
    * foreign engine's) prune whole files by partition value from one
    * manifest walk, before the column-bounds tier even runs. One data
    * directory per partition tuple (driver-enumerated; identity
    * partition cardinality is bounded by design — that is what makes
    * a column a partition column). Fresh tables only; partition
    * columns stay in the data files (identity transform), so reads
    * need no reconstruction. */
  def exportPartitioned(spark: SparkSession, df: DataFrame,
                        location: String,
                        partCols: Seq[String]): Long =
    exportTransformPartitioned(spark, df, location,
      partCols.map(c => c -> "identity"))

  /** Export a frame as a TRANSFORM-partitioned Iceberg table — the
    * layouts real Iceberg tables overwhelmingly use (`days(ts)`,
    * `bucket(N, id)`, `truncate(W, s)`): each spec entry is
    * (sourceColumn, transform string). The partition tuple holds the
    * TRANSFORMED value (spec partition field names `<col>_<tr>`,
    * field-ids 1000+i); source columns stay in the data files, so
    * reads need no reconstruction; one data directory per tuple
    * (transform cardinality is bounded by design — that is what makes
    * a transform a partition function). Fresh tables only. */
  /** Write `withPt` (the data columns plus the transformed-tuple
    * columns `_pt_0.._pt_{n-1}`) into ONE data directory per distinct
    * tuple — `dirFor(ti)` for `tuples(ti)` — with ONE Spark job over
    * the input. Rows are tagged with their tuple index by a null-safe
    * broadcast join against the collected tuple table, written
    * `partitionBy` that index into a staging dir, and the index dirs
    * renamed into the per-tuple layout. The previous shape ran one
    * filter+write JOB PER TUPLE, each re-scanning the full input — a
    * 30-day `days(ts)` export paid 30 input scans (r17, guide
    * §1.2/§6 "don't re-read what one pass can split"). File contents
    * are unchanged: field ids ride the data columns exactly as
    * before, and the partition index column never lands in the files
    * (partitionBy excludes it). */
  private def writeTuplePartitioned(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, withPt: DataFrame,
      dataCols: Seq[String], nPt: Int,
      tuples: Array[org.apache.spark.sql.Row], stagingRoot: Path,
      dirFor: Int => Path): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val ptNames = (0 until nPt).map(i => s"_pt_$i")
    val tupleSchema = StructType(
      ptNames.map(n => withPt.schema(n)) :+
        StructField("_ti", IntegerType, nullable = false))
    val tdf = spark.createDataFrame(
      java.util.Arrays.asList(tuples.zipWithIndex.map { case (t, ti) =>
        org.apache.spark.sql.Row.fromSeq(t.toSeq :+ ti) }: _*),
      tupleSchema)
    val cond = ptNames.map(n => withPt(s"`$n`") <=> tdf(s"`$n`"))
      .reduce(_ && _)
    // field ids over the data columns, same ids (1..n by position) as
    // withFieldIds assigned under the old per-tuple writes; _ti rides
    // last and is excluded from the data files by partitionBy
    val joined = withPt.join(broadcast(tdf), cond)
      .select(dataCols.map(c => withPt(s"`$c`")) :+ tdf("_ti"): _*)
    val tagged = joined.select(dataCols.zipWithIndex.map { case (c, i) =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(joined.schema(c).metadata)
        .putLong("parquet.field.id", i + 1L).build()
      col(s"`$c`").as(c, md)
    } :+ col("_ti"): _*)
    fs.delete(stagingRoot, true)
    tagged.write.mode("overwrite").partitionBy("_ti")
      .parquet(stagingRoot.toString)
    tuples.indices.foreach { ti =>
      val src = new Path(stagingRoot, s"_ti=$ti")
      val dst = dirFor(ti)
      if (!fs.exists(src))
        throw new IOException(s"partitioned export lost tuple $ti: " +
          s"no staged dir at $src")
      fs.mkdirs(dst.getParent)
      fs.delete(dst, true)
      if (!fs.rename(src, dst))
        throw new IOException(s"could not install partition dir $dst")
    }
    fs.delete(stagingRoot, true)
  }

  def exportTransformPartitioned(spark: SparkSession, df: DataFrame,
                                 location: String,
                                 specs: Seq[(String, String)]): Long = {
    require(specs.nonEmpty, "specs must be non-empty")
    val loc = new Path(location)
    val fs = fsOf(spark, loc)
    val metaDir = new Path(loc, "metadata")
    if (fs.exists(new Path(metaDir, "version-hint.text")))
      throw new IOException(s"exportPartitioned writes FRESH tables " +
        s"only; $location already has Iceberg metadata")
    fs.mkdirs(metaDir)
    specs.foreach { case (c, _) =>
      require(df.schema.fieldNames.contains(c),
        s"partition source column $c not in the frame") }
    val parsed = specs.map { case (c, t) =>
      val tr = IcebergTransforms.parse(t)
      if (tr.name == "void")
        throw new IOException("void is not a partitioning export " +
          "transform (every row would land in one null partition)")
      (c, tr, df.schema(c).dataType)
    }
    val pFields = parsed.map { case (c, tr, dt) =>
      (IcebergTransforms.fieldName(tr, c), c, tr,
        IcebergTransforms.resultAvroType(tr, dt))
    }
    val entrySchema =
      partitionedEntrySchema(pFields.map(f => (f._1, f._4)))
    val snapId = 1L
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    import org.apache.spark.sql.functions.{col, lit}
    // the transformed tuple, as derived columns (built-in arithmetic
    // except bucket's spec-murmur3 UDF — export path only)
    val ptCols = parsed.zipWithIndex.map { case ((c, tr, dt), i) =>
      IcebergTransforms.column(tr, dt, col(s"`$c`")).as(s"_pt_$i")
    }
    val withPt = df.select(df.columns.map(c =>
      col(s"`$c`")).toSeq ++ ptCols: _*)
    val tuples = withPt
      .select((0 until parsed.length).map(i => col(s"_pt_$i")): _*)
      .distinct().collect()
    // all tuples land in ONE job (null-safe index join + partitionBy
    // staging + renames — see writeTuplePartitioned) instead of one
    // filter+write job per tuple re-scanning the input each time
    writeTuplePartitioned(spark, fs, withPt, df.columns.toSeq,
      parsed.length, tuples, new Path(loc, ".pt-staging"),
      ti => new Path(loc, s"data/part-$ti"))
    val entries = tuples.zipWithIndex.flatMap { case (t, ti) =>
      val dataDir = new Path(loc, s"data/part-$ti")
      fs.listStatus(dataDir).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
        .map(p => fs.makeQualified(p)).map { path =>
          val st = fs.getFileStatus(path)
          val dfRec = new GenericData.Record(
            entrySchema.getField("data_file").schema())
          dfRec.put("content", 0)
          dfRec.put("file_path", path.toString)
          dfRec.put("file_format", "PARQUET")
          val pRec = new GenericData.Record(
            dfRec.getSchema.getField("partition").schema())
          pFields.zipWithIndex.foreach { case ((name, _, _, _), i) =>
            pRec.put(name, t.get(i))
          }
          dfRec.put("partition", pRec)
          dfRec.put("record_count", parquetRowCount(spark, path))
          dfRec.put("file_size_in_bytes", st.getLen)
          putBounds(dfRec, parquetColumnBounds(spark, path))
          val e = new GenericData.Record(entrySchema)
          e.put("status", 1)
          e.put("snapshot_id", snapId)
          e.put("data_file", dfRec)
          e
        }
    }
    val manifestP = new Path(metaDir, s"manifest-$snapId.avro")
    val mLen = writeAvro(spark, manifestP, entrySchema, entries.toSeq)
    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", fs.makeQualified(manifestP).toString)
    mf.put("manifest_length", mLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 0)
    mf.put("sequence_number", java.lang.Long.valueOf(snapId))
    mf.put("min_sequence_number", java.lang.Long.valueOf(snapId))
    mf.put("added_snapshot_id", snapId)
    val listP = new Path(metaDir, s"snap-$snapId-manifest-list.avro")
    writeAvro(spark, listP, manifestFileSchema, Seq(mf))
    val now = System.currentTimeMillis()
    val specFields = pFields.zipWithIndex.map {
      case ((name, src, tr, _), i) =>
        s"""{"name": ${mapper.writeValueAsString(name)},
           | "transform": ${mapper.writeValueAsString(tr.toString)},
           | "source-id": ${df.schema.fieldNames.indexOf(src) + 1},
           | "field-id": ${1000 + i}}""".stripMargin
    }.mkString(", ")
    val snapJson =
      s"""{"snapshot-id": $snapId, "timestamp-ms": $now, """ +
        s""""manifest-list": ${mapper.writeValueAsString(
          fs.makeQualified(listP).toString)}, """ +
        s""""summary": {"operation": "append"}}"""
    val metaJson =
      s"""{
         |  "format-version": 1,
         |  "table-uuid": "00000000-0000-0000-0000-${"%012d".format(0)}",
         |  "location": ${mapper.writeValueAsString(location)},
         |  "last-updated-ms": $now,
         |  "last-column-id": ${df.schema.fields.length},
         |  "schema": ${icebergSchemaJson(df.schema)},
         |  "partition-spec": [$specFields],
         |  "partition-specs": [{"spec-id": 0, "fields": [$specFields]}],
         |  "default-spec-id": 0,
         |  "current-snapshot-id": $snapId,
         |  "snapshots": [$snapJson]
         |}""".stripMargin
    writeText(spark, new Path(metaDir, "v1.metadata.json"), metaJson)
    writeText(spark, new Path(metaDir, "version-hint.text"), "1")
    snapId
  }

  /** Scan with PARTITION PRUNING from the manifests' partition
    * tuples: keep the live files whose identity-partition values
    * match every filter (stringified equality — the identity
    * transform preserves the value), read only those, apply the exact
    * predicate on top. Files without a partition value for a filtered
    * column are kept (conservative). Returns (rows, filesScanned,
    * filesTotal). Delete-bearing snapshots mask the kept subset
    * through both delete tiers — the same per-file soundness as
    * readPruned. */
  def readPartitionPruned(spark: SparkSession, location: String,
                          filters: Map[String, String])
    : (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.col
    require(filters.nonEmpty, "filters must be non-empty")
    val s = snapshot(spark, location)
    val schema = schemaFromIceberg(s.schemaJson)
    filters.keys.foreach(c => require(schema.fieldNames.contains(c),
      s"readPartitionPruned: column $c not in the table schema"))
    val kept = s.files.filter { f =>
      s.partitionValues.get(f) match {
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
      else {
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        maskDeletes(spark, s,
          spark.read.schema(schema).parquet(kept: _*)).filter(pred)
      }
    (rows, kept.size, s.files.size)
  }

  /** Scan with TRANSFORM-AWARE partition pruning: for a range
    * predicate `lo <= column <= hi` on a SOURCE column, evaluate the
    * spec's transforms on the endpoints and keep only files whose
    * stored partition tuple can hold a matching row — `days(ts)` and
    * `truncate` prune ranges (monotonic transforms), `bucket` prunes
    * equality (lo == hi; a range spans buckets arbitrarily, so it
    * keeps everything — correct, just unpruned). The exact predicate
    * applies on top. Files without a tuple for the field keep
    * (conservative). Returns (rows, filesScanned, filesTotal).
    * Delete-bearing snapshots mask the kept subset through both
    * delete tiers — the same per-file soundness as readPruned.
    * This is what the transform spec is FOR at 100 TB: a
    * one-day predicate on a `days(ts)` table opens 1/365 of the
    * files from one manifest walk. */
  def readTransformPruned(spark: SparkSession, location: String,
                          column: String, lo: Any, hi: Any)
    : (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val s = snapshot(spark, location)
    val schema = schemaFromIceberg(s.schemaJson)
    require(schema.fieldNames.contains(column),
      s"readTransformPruned: column $column not in the table schema")
    val dt = schema(column).dataType
    val fields = s.specFields.filter(_.source == column)
    require(fields.nonEmpty, s"readTransformPruned: no partition-spec " +
      s"field sources $column at $location — nothing to prune on")
    def cmp(stored: String, v: Any): Int = v match {
      case n: Int => stored.toLong.compare(n.toLong)
      case n: Long => stored.toLong.compare(n)
      case other => stored.compare(other.toString)
    }
    val kept = s.files.filter { f =>
      s.partitionValues.get(f) match {
        case None => true // no tuple recorded → cannot skip
        case Some(pv) => fields.forall { sf =>
          pv.get(sf.name) match {
            case None => true
            case Some(null) => false // null tuple cannot hold lo..hi
            case Some(v) =>
              if (sf.transform.monotonic) {
                val tLo = IcebergTransforms.literal(sf.transform, dt, lo)
                val tHi = IcebergTransforms.literal(sf.transform, dt, hi)
                cmp(v, tLo) >= 0 && cmp(v, tHi) <= 0
              } else if (lo == hi)
                cmp(v, IcebergTransforms.literal(
                  sf.transform, dt, lo)) == 0
              else true // a range spans buckets arbitrarily
          }
        }
      }
    }
    val pred = col(column) >= lit(lo) && col(column) <= lit(hi)
    val rows =
      if (kept.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        maskDeletes(spark, s,
          spark.read.schema(schema).parquet(kept: _*)).filter(pred)
      }
    (rows, kept.size, s.files.size)
  }

  /** Append a POSITION-DELETE snapshot (spec v2 row-level deletes):
    * logically delete the given (`file_path` STRING, `pos` LONG) rows
    * of the CURRENT snapshot without rewriting any data file. The
    * delete rows land as a spec-shaped position-delete parquet; a
    * DELETE manifest (content=1) lists it with `data_file.content=1`;
    * the new manifest list REUSES the prior snapshot's manifests
    * unchanged and appends the delete manifest — manifest reuse is
    * how Iceberg itself keeps a delete commit O(deletes), and it is
    * what makes earlier snapshots stay pinnable for free. The table
    * metadata upgrades to format-version 2 (the spec's own v1→v2
    * upgrade path when row-level deletes first land), carrying
    * `last-sequence-number`. Returns the new snapshot id. */
  def exportPositionDeletes(spark: SparkSession, deletes: DataFrame,
                            location: String): Long = {
    val loc = new Path(location)
    val fs = fsOf(spark, loc)
    val metaDir = new Path(loc, "metadata")
    val hint = new Path(metaDir, "version-hint.text")
    if (!fs.exists(hint))
      throw new IOException(s"no Iceberg table at $location to " +
        "delete from — export data first")
    val v = readText(spark, hint).trim.toLong
    val meta = mapper.readTree(readText(spark,
      new Path(metaDir, s"v$v.metadata.json")))
    // v3 forbids NEW position-delete files (deletion vectors replace
    // them); committing one anyway would make the table malformed
    if (Option(meta.get("format-version")).exists(_.asInt > 2))
      throw new IOException(s"cannot add position-delete files to " +
        s"$location: format-version 3 tables take deletion vectors " +
        "(exportDeletionVectors), not position-delete files")
    val prevSnaps = Option(meta.get("snapshots"))
      .map(_.elements().asScala.map(_.toString).toSeq).getOrElse(Nil)
    val currentSnapId = Option(meta.get("current-snapshot-id"))
      .filterNot(_.isNull).map(_.asLong)
      .getOrElse(throw new IOException(
        s"Iceberg table at $location declares no current-snapshot-id " +
          "— position-delete files need a snapshot to delete against"))
    // the carried manifests' entries hold partition tuples against the
    // PRIOR spec — erasing it would silently downgrade every later
    // prune to scan-everything; carry it verbatim
    val priorSpec = Option(meta.get("partition-spec"))
      .map(_.toString).getOrElse("[]")
    val priorSpecs = Option(meta.get("partition-specs"))
      .map(_.toString).getOrElse("""[{"spec-id": 0, "fields": []}]""")
    val priorSpecId = Option(meta.get("default-spec-id"))
      .map(_.asInt).getOrElse(0)

    val prevListPath = new Path(
      Option(meta.get("snapshots")).toSeq
        .flatMap(_.elements().asScala)
        .find(_.get("snapshot-id").asLong == currentSnapId)
        .getOrElse(throw new IOException(
          s"current snapshot $currentSnapId not in metadata"))
        .get("manifest-list").asText)
    val nextV = v + 1
    val snapId = nextV
    // spec position-delete layout: parquet with file_path (the data
    // file URI) + pos (row ordinal within that file), sorted
    val delDir = new Path(loc, s"data/deletes-$snapId")
    deletes
      .select(deletes("file_path").cast("string").as("file_path"),
        deletes("pos").cast("long").as("pos"))
      .sort("file_path", "pos")
      .write.mode("overwrite").parquet(delDir.toString)
    val delFiles = fs.listStatus(delDir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(p => fs.makeQualified(p))
    def delEntry(path: Path): GenericRecord = {
      val st = fs.getFileStatus(path)
      val dataFile = new GenericData.Record(
        manifestEntrySchema.getField("data_file").schema())
      dataFile.put("content", 1) // position-delete file
      dataFile.put("file_path", path.toString)
      dataFile.put("file_format", "PARQUET")
      dataFile.put("partition", new GenericData.Record(
        dataFile.getSchema.getField("partition").schema()))
      dataFile.put("record_count",
        parquetRowCount(spark, path))
      dataFile.put("file_size_in_bytes", st.getLen)
      val e = new GenericData.Record(manifestEntrySchema)
      e.put("status", 1)
      e.put("snapshot_id", snapId)
      e.put("data_file", dataFile)
      e
    }
    val delManifestP = new Path(metaDir, s"manifest-del-$snapId.avro")
    val dLen = writeAvro(spark, delManifestP, manifestEntrySchema,
      delFiles.map(delEntry))
    // manifest list = prior snapshot's manifests (reused byte-for-byte
    // as entries re-emitted through our manifest_file schema) + the
    // new delete manifest
    val carried = avroRecords(spark, prevListPath).map { r =>
      val c = new GenericData.Record(manifestFileSchema)
      c.put("manifest_path", str(r, "manifest_path").orNull)
      c.put("manifest_length", long0(r, "manifest_length"))
      c.put("partition_spec_id", long0(r, "partition_spec_id").toInt)
      c.put("content", long0(r, "content").toInt)
      val cSeq = fieldOpt(r, "sequence_number")
        .map(_.toString.toLong).getOrElse(long0(r, "added_snapshot_id"))
      c.put("sequence_number", java.lang.Long.valueOf(cSeq))
      c.put("min_sequence_number",
        java.lang.Long.valueOf(fieldOpt(r, "min_sequence_number")
          .map(_.toString.toLong).getOrElse(cSeq)))
      c.put("added_snapshot_id", long0(r, "added_snapshot_id"))
      c
    }
    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", fs.makeQualified(delManifestP).toString)
    mf.put("manifest_length", dLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 1) // DELETE manifest
    mf.put("sequence_number", java.lang.Long.valueOf(snapId))
    mf.put("min_sequence_number", java.lang.Long.valueOf(snapId))
    mf.put("added_snapshot_id", snapId)
    val listP = new Path(metaDir, s"snap-$snapId-manifest-list.avro")
    writeAvro(spark, listP, manifestFileSchema, carried :+ mf)
    val now = System.currentTimeMillis()
    val schemaJson =
      Option(meta.get("schemas")).filter(_.elements().hasNext)
        .map(_.elements().asScala.toSeq.last.toString)
        .orElse(Option(meta.get("schema")).map(_.toString))
        .getOrElse("{}")
    val snapJson =
      s"""{"snapshot-id": $snapId, "sequence-number": $snapId, """ +
        s""""timestamp-ms": $now, "manifest-list": ${mapper
          .writeValueAsString(fs.makeQualified(listP).toString)}, """ +
        s""""summary": {"operation": "delete"}}"""
    val allSnaps = prevSnaps :+ snapJson
    val metaJson =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "00000000-0000-0000-0000-${"%012d".format(0)}",
         |  "location": ${mapper.writeValueAsString(location)},
         |  "last-sequence-number": $snapId,
         |  "last-updated-ms": $now,
         |  "last-column-id": ${Option(meta.get("last-column-id"))
           .map(_.asInt).getOrElse(0)},
         |  "schema": $schemaJson,
         |  "partition-spec": $priorSpec,
         |  "partition-specs": $priorSpecs,
         |  "default-spec-id": $priorSpecId,
         |  "current-snapshot-id": $snapId,
         |  "snapshots": [${allSnaps.mkString(", ")}]
         |}""".stripMargin
    writeText(spark, new Path(metaDir, s"v$nextV.metadata.json"),
      metaJson)
    writeText(spark, hint, nextV.toString) // the commit: hint swaps last
    snapId
  }

  /** Append an EQUALITY-DELETE snapshot (spec v2): logically delete
    * every row matching any row of `deletes` on ITS columns (which
    * must be a subset of the table schema — they become the file's
    * `equality_ids`), for data files with an OLDER sequence. No data
    * file is rewritten; the new manifest list reuses the prior
    * manifests and appends one DELETE manifest whose `data_file`
    * carries `content=2` + the equality ids. Returns the snapshot
    * id. */
  def exportEqualityDeletes(spark: SparkSession, deletes: DataFrame,
                            location: String): Long =
    appendDeltaSnapshot(spark, location, "delete") {
      (fs, loc, metaDir, snapId, schemaJson) =>
        val idByName = fieldIdToName(schemaJson).map(_.swap)
        val ids = deletes.columns.toSeq.map(c =>
          idByName.getOrElse(c, throw new IOException(
            s"equality column $c is not in the table schema at " +
              s"$location")))
        val delDir = new Path(loc, s"data/eq-deletes-$snapId")
        deletes.distinct().write.mode("overwrite")
          .parquet(delDir.toString)
        val delFiles = fs.listStatus(delDir).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
          .map(p => fs.makeQualified(p))
        delFiles.map { path =>
          val st = fs.getFileStatus(path)
          val dataFile = new GenericData.Record(
            manifestEntrySchema.getField("data_file").schema())
          dataFile.put("content", 2) // equality-delete file
          dataFile.put("file_path", path.toString)
          dataFile.put("file_format", "PARQUET")
          dataFile.put("partition", new GenericData.Record(
            dataFile.getSchema.getField("partition").schema()))
          dataFile.put("record_count",
            parquetRowCount(spark, path))
          dataFile.put("file_size_in_bytes", st.getLen)
          dataFile.put("equality_ids", ids.map(Int.box).asJava)
          val e = new GenericData.Record(manifestEntrySchema)
          e.put("status", 1)
          e.put("snapshot_id", snapId)
          e.put("data_file", dataFile)
          e
        }
    }

  /** Manifest-entry schema for DELETION-VECTOR entries: the v2 entry
    * plus v3's DV locator fields (referenced_data_file 143,
    * content_offset 144, content_size_in_bytes 145). A separate
    * schema so v2 manifests never carry dead nullable columns. */
  private val dvManifestEntrySchema: Schema = new Schema.Parser().parse(
    """{"type": "record", "name": "manifest_entry", "fields": [
      |  {"name": "status", "type": "int", "field-id": 0},
      |  {"name": "snapshot_id", "type": ["null", "long"],
      |   "default": null, "field-id": 1},
      |  {"name": "data_file", "field-id": 2, "type":
      |    {"type": "record", "name": "r2", "fields": [
      |      {"name": "content", "type": "int", "default": 0,
      |       "field-id": 134},
      |      {"name": "file_path", "type": "string", "field-id": 100},
      |      {"name": "file_format", "type": "string", "field-id": 101},
      |      {"name": "partition", "field-id": 102, "type":
      |        {"type": "record", "name": "r102", "fields": []}},
      |      {"name": "record_count", "type": "long", "field-id": 103},
      |      {"name": "file_size_in_bytes", "type": "long",
      |       "field-id": 104},
      |      {"name": "referenced_data_file", "type": ["null", "string"],
      |       "default": null, "field-id": 143},
      |      {"name": "content_offset", "type": ["null", "long"],
      |       "default": null, "field-id": 144},
      |      {"name": "content_size_in_bytes", "type": ["null", "long"],
      |       "default": null, "field-id": 145}
      |    ]}}
      |]}""".stripMargin)

  /** Commit DELETION VECTORS — Iceberg v3's replacement for
    * position-delete files: each (data file → deleted positions)
    * becomes a `deletion-vector-v1` blob in ONE Puffin file
    * ([[PuffinLite]]), listed by a delete manifest whose entries
    * carry the v3 locator fields, and the table's metadata advances
    * to format-version 3 (a one-way upgrade; after it, appends and
    * equality deletes keep working — they re-emit v3 metadata — while
    * position-delete FILES and rewriteManifests refuse by name, per
    * the v3 spec and this writer's locator-field honesty).
    * A file that already carries a DV gets the MERGE the
    * spec requires: new blob = old positions ∪ new (the reader
    * resolves superseded carried entries by highest sequence).
    * Returns the new snapshot id. */
  def exportDeletionVectors(spark: SparkSession, location: String,
                            deletes: Map[String, Array[Long]]): Long = {
    val live = snapshot(spark, location)
    val byNorm = live.files
      .map(f => new Path(f).toUri.getPath -> f).toMap
    val resolved = deletes.map { case (f, pos) =>
      val norm = new Path(f).toUri.getPath
      byNorm.getOrElse(norm, throw new IOException(
        s"cannot attach a deletion vector to $f — not a live data " +
          s"file of $location")) -> pos
    }
    val merged = resolved.toSeq.sortBy(_._1).map { case (f, pos) =>
      val normF = new Path(f).toUri.getPath
      val prior = live.dvs
        .find(d => new Path(d.referencedDataFile).toUri.getPath == normF)
        .map(d => PuffinLite.readDvPositions(spark, d.puffinPath,
          d.offset, d.length))
        .getOrElse(Array.empty[Long])
      f -> (prior ++ pos).distinct.sorted
    }
    appendDeltaSnapshot(spark, location, "delete",
      dvManifestEntrySchema, formatVersion = 3) {
      (fs, loc, metaDir, snapId, _) =>
        val puffinP = fs.makeQualified(
          new Path(loc, s"data/dv-$snapId.puffin"))
        val placed = PuffinLite.writeDvFile(spark, puffinP.toString,
          snapId, merged)
        val fileLen = fs.getFileStatus(puffinP).getLen
        merged.map { case (dataFile, _) =>
          val (off, blen, card) = placed(dataFile)
          val df = new GenericData.Record(
            dvManifestEntrySchema.getField("data_file").schema())
          df.put("content", 1) // position deletes (DV flavor)
          df.put("file_path", puffinP.toString)
          df.put("file_format", "PUFFIN")
          df.put("partition", new GenericData.Record(
            df.getSchema.getField("partition").schema()))
          df.put("record_count", card) // spec: cardinality
          df.put("file_size_in_bytes", fileLen)
          df.put("referenced_data_file", dataFile)
          df.put("content_offset", java.lang.Long.valueOf(off))
          df.put("content_size_in_bytes", java.lang.Long.valueOf(blen))
          val e = new GenericData.Record(dvManifestEntrySchema)
          e.put("status", 1)
          e.put("snapshot_id", snapId)
          e.put("data_file", df)
          e
        }
    }
  }

  /** Manifest count of the current (or pinned) snapshot — the number
    * a planner's metadata walk opens; what [[rewriteManifests]]
    * resets to O(1). Driver metadata: one manifest-list read. */
  def manifestCount(spark: SparkSession, location: String,
                    snapshotId: Option[Long] = None): Int = {
    val meta = mapper.readTree(readText(spark,
      metadataPath(spark, location)))
    val wanted = snapshotId.orElse(
      Option(meta.get("current-snapshot-id")).filterNot(_.isNull)
        .map(_.asLong)).getOrElse(return 0)
    val snapNode = Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala)
      .find(_.get("snapshot-id").asLong == wanted)
      .getOrElse(throw new IOException(
        s"snapshot $wanted not found at $location"))
    avroRecords(spark,
      new Path(snapNode.get("manifest-list").asText)).length
  }

  /** REWRITE MANIFESTS — Iceberg's manifest-compaction maintenance
    * op (`rewrite_manifests`): every live entry of the current
    * snapshot lands in ONE data manifest (+ ONE delete manifest when
    * row-level deletes exist), each entry `status = 0` (existing)
    * with an EXPLICIT entry-level `sequence_number` pinning its
    * resolved data sequence — the spec's compaction-preserved row
    * age, which keeps equality-delete ordering exact across the
    * rewrite (this reader honors entry sequences over the manifest's;
    * so do foreign engines). Data files are untouched; old manifests
    * stay on disk for time travel until snapshot expiry sweeps them.
    *
    * Why it exists at 100 TB: every append carries the prior
    * manifest list forward, so a long-lived table's planning walk
    * grows O(commits); compaction resets it to O(live files) in one
    * metadata-only commit.
    *
    * Refusals (each named): v3 tables (DV manifests carry locator
    * fields this rewrite does not re-derive), manifests whose
    * DATA_FILE sub-schemas differ (blind cross-schema copying would
    * scramble position-written Avro fields; entry-level variance —
    * e.g. a prior rewrite's sequence_number field — is remapped by
    * name and safe), mixed partition-spec ids (one merged manifest
    * can declare only one). Returns the new snapshot id. */
  def rewriteManifests(spark: SparkSession, location: String): Long = {
    val loc = new Path(location)
    val fs = fsOf(spark, loc)
    val metaDir = new Path(loc, "metadata")
    val hint = new Path(metaDir, "version-hint.text")
    if (!fs.exists(hint))
      throw new IOException(s"no Iceberg table at $location")
    val v = readText(spark, hint).trim.toLong
    val meta = mapper.readTree(readText(spark,
      new Path(metaDir, s"v$v.metadata.json")))
    if (Option(meta.get("format-version")).exists(_.asInt > 2))
      throw new IOException(s"cannot rewrite manifests at $location: " +
        "format-version 3 manifests carry deletion-vector locator " +
        "fields this rewrite does not re-derive; refusing")
    val currentSnapId = Option(meta.get("current-snapshot-id"))
      .filterNot(_.isNull).map(_.asLong).getOrElse(
        throw new IOException(s"$location has no current snapshot"))
    val prevSnaps = Option(meta.get("snapshots"))
      .map(_.elements().asScala.map(_.toString).toSeq).getOrElse(Nil)
    val listPath = new Path(Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala)
      .find(_.get("snapshot-id").asLong == currentSnapId)
      .getOrElse(throw new IOException(
        s"current snapshot $currentSnapId not in metadata"))
      .get("manifest-list").asText)
    // collect every live entry with its resolved sequence, split by
    // manifest kind
    final case class LiveEntry(entry: GenericRecord, seq: Long,
                               content: Long)
    val entries = Seq.newBuilder[LiveEntry]
    var specIds = Set.empty[Long]
    avroRecords(spark, listPath).foreach { mf =>
      val content = long0(mf, "content")
      specIds += long0(mf, "partition_spec_id")
      val mSeq = fieldOpt(mf, "sequence_number")
        .map(_.toString.toLong).getOrElse(long0(mf, "added_snapshot_id"))
      val mPath = new Path(str(mf, "manifest_path").getOrElse(
        throw new IOException("manifest_file entry missing manifest_path")))
      avroRecords(spark, mPath).foreach { e =>
        if (long0(e, "status") != 2L) {
          val seq = fieldOpt(e, "sequence_number")
            .map(_.toString.toLong).getOrElse(mSeq)
          entries += LiveEntry(e, seq, content)
        }
      }
    }
    val all = entries.result()
    if (all.isEmpty)
      throw new IOException(s"cannot rewrite manifests at $location: " +
        "no live entries — nothing to compact")
    if (specIds.size > 1)
      throw new IOException(s"cannot rewrite manifests at $location: " +
        s"manifests span partition-spec ids ${specIds.mkString(", ")} " +
        "— one merged manifest can declare only one; refusing")
    // The positional-write hazard is the DATA_FILE sub-record: a
    // data_file value carried by reference into a manifest whose
    // data_file schema differs would scramble position-written Avro
    // fields — those must agree exactly. ENTRY-level variance is
    // expected and safe (a prior rewrite's own manifests carry
    // sequence_number, later appends' don't): the four entry fields
    // are re-put BY NAME into the canonical schema below, never
    // copied blind.
    val dfSchemaStrs = all.map(
      _.entry.getSchema.getField("data_file").schema().toString).distinct
    if (dfSchemaStrs.length > 1)
      throw new IOException(s"cannot rewrite manifests at $location: " +
        "data_file schemas differ across manifests — a blind " +
        "cross-schema copy would scramble position-written Avro " +
        "fields; refusing")
    // the merged entry schema: prefer one that already carries the
    // entry-level sequence_number (the carrier of preserved row age)
    val oldSchema = all.map(_.entry.getSchema)
      .find(_.getField("sequence_number") != null)
      .getOrElse(all.head.entry.getSchema)
    val newEntrySchema =
      if (oldSchema.getField("sequence_number") != null) oldSchema
      else {
        import scala.jdk.CollectionConverters._
        val copied = oldSchema.getFields.asScala.map(f =>
          new Schema.Field(f, f.schema())).toSeq
        val seqField = new Schema.Field("sequence_number",
          Schema.createUnion(Schema.create(Schema.Type.NULL),
            Schema.create(Schema.Type.LONG)),
          null, Schema.Field.NULL_DEFAULT_VALUE)
        Schema.createRecord(oldSchema.getName, null,
          oldSchema.getNamespace, false,
          (copied :+ seqField).asJava)
      }
    def compacted(kind: Long): Seq[GenericRecord] =
      all.filter(_.content == kind).map { le =>
        val r = new GenericData.Record(newEntrySchema)
        r.put("status", 0) // existing
        r.put("snapshot_id", le.entry.get("snapshot_id"))
        r.put("sequence_number", java.lang.Long.valueOf(le.seq))
        r.put("data_file", le.entry.get("data_file"))
        r
      }
    val snapId = v + 1
    val specId = specIds.headOption.getOrElse(0L).toInt
    val newManifests = Seq(0L, 1L).flatMap { kind =>
      val recs = compacted(kind)
      if (recs.isEmpty) None
      else {
        val p = new Path(metaDir,
          s"manifest-${if (kind == 1L) "del-" else ""}rw-$snapId.avro")
        val len = writeAvro(spark, p, newEntrySchema, recs)
        val mf = new GenericData.Record(manifestFileSchema)
        mf.put("manifest_path", fs.makeQualified(p).toString)
        mf.put("manifest_length", len)
        mf.put("partition_spec_id", specId)
        mf.put("content", kind.toInt)
        mf.put("sequence_number", java.lang.Long.valueOf(snapId))
        mf.put("min_sequence_number", java.lang.Long.valueOf(
          recs.map(r => r.get("sequence_number")
            .asInstanceOf[java.lang.Long].longValue()).min))
        mf.put("added_snapshot_id", snapId)
        Some(mf)
      }
    }
    val newListP = new Path(metaDir, s"snap-$snapId-manifest-list.avro")
    writeAvro(spark, newListP, manifestFileSchema, newManifests)
    val now = System.currentTimeMillis()
    val snapJson =
      s"""{"snapshot-id": $snapId, "sequence-number": $snapId, """ +
        s""""timestamp-ms": $now, "manifest-list": ${mapper
          .writeValueAsString(fs.makeQualified(newListP).toString)}, """ +
        s""""summary": {"operation": "replace"}}"""
    val newMeta = meta
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    newMeta.put("current-snapshot-id", snapId)
    newMeta.put("last-sequence-number", snapId)
    newMeta.put("last-updated-ms", now)
    val snapsArr = mapper.createArrayNode()
    (prevSnaps :+ snapJson).foreach(s =>
      snapsArr.add(mapper.readTree(s)))
    newMeta.set("snapshots", snapsArr)
    writeText(spark, new Path(metaDir, s"v${v + 1}.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsString(newMeta))
    writeText(spark, hint, (v + 1).toString)
    snapId
  }

  /** Append a DATA snapshot the spec way: prior manifests (data AND
    * delete) carry unchanged — so earlier files keep their original
    * sequence and live row-level deletes keep applying to them only —
    * plus ONE new data manifest listing just `df`'s files (which,
    * being newer than every delete, are untouched by them). This is
    * the correct post-delete append; the full-state `export` refuses
    * that case. Returns the snapshot id. */
  def appendManifest(spark: SparkSession, df: DataFrame,
                     location: String): Long =
    appendDeltaSnapshot(spark, location, "append") {
      (fs, loc, metaDir, snapId, _) =>
        val dataDir = new Path(loc, s"data/snap-$snapId")
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled",
          "true")
        withFieldIds(df).write.mode("overwrite").parquet(dataDir.toString)
        fs.listStatus(dataDir).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
          .map(p => fs.makeQualified(p))
          .map { path =>
            val st = fs.getFileStatus(path)
            val dataFile = new GenericData.Record(
              manifestEntrySchema.getField("data_file").schema())
            dataFile.put("content", 0)
            dataFile.put("file_path", path.toString)
            dataFile.put("file_format", "PARQUET")
            dataFile.put("partition", new GenericData.Record(
              dataFile.getSchema.getField("partition").schema()))
            dataFile.put("record_count",
              parquetRowCount(spark, path))
            dataFile.put("file_size_in_bytes", st.getLen)
            putBounds(dataFile, parquetColumnBounds(spark, path))
            val e = new GenericData.Record(manifestEntrySchema)
            e.put("status", 1)
            e.put("snapshot_id", snapId)
            e.put("data_file", dataFile)
            e
          }
    }

  /** Append a DATA snapshot to a TRANSFORM-partitioned table with the
    * new files' partition tuples computed against the table's OWN
    * spec (the plain appendManifest leaves appended files tuple-less
    * — correct but unprunable): prior manifests carry verbatim, one
    * new manifest lists the appended files with their transformed
    * tuples and footer bounds, and the prior spec carries through the
    * metadata. One data directory per tuple, so a one-day append to a
    * `days(ts)` table adds exactly that day's prunable file. Returns
    * the snapshot id. */
  def appendTransformPartitioned(spark: SparkSession, df: DataFrame,
                                 location: String): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    val snap0 = snapshot(spark, location)
    require(snap0.specFields.nonEmpty,
      s"appendTransformPartitioned at $location: the table declares " +
        "no partition spec — appendManifest serves unpartitioned " +
        "appends")
    val tschema = schemaFromIceberg(snap0.schemaJson)
    val parsed = snap0.specFields.map { sf =>
      require(df.schema.fieldNames.contains(sf.source),
        s"partition source column ${sf.source} not in the frame")
      (sf, tschema(sf.source).dataType)
    }
    val entrySchema = partitionedEntrySchema(parsed.map { case (sf, dt) =>
      (sf.name, IcebergTransforms.resultAvroType(sf.transform, dt)) })
    appendDeltaSnapshot(spark, location, "append", entrySchema) {
      (fs, loc, metaDir, snapId, _) =>
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        val ptCols = parsed.zipWithIndex.map { case ((sf, dt), i) =>
          IcebergTransforms.column(sf.transform, dt,
            col(s"`${sf.source}`")).as(s"_pt_$i")
        }
        val withPt = df.select(df.columns.map(c =>
          col(s"`$c`")).toSeq ++ ptCols: _*)
        val tuples = withPt
          .select(parsed.indices.map(i => col(s"_pt_$i")): _*)
          .distinct().collect()
        // one job for every tuple (see writeTuplePartitioned), not one
        // filter+write job per tuple re-scanning the append batch
        writeTuplePartitioned(spark, fs, withPt, df.columns.toSeq,
          parsed.length, tuples, new Path(loc, ".pt-staging"),
          ti => new Path(loc, s"data/snap-$snapId-part-$ti"))
        tuples.zipWithIndex.flatMap { case (t, ti) =>
          val dataDir = new Path(loc, s"data/snap-$snapId-part-$ti")
          fs.listStatus(dataDir).toSeq.map(_.getPath)
            .filter(_.getName.endsWith(".parquet"))
            .map(p => fs.makeQualified(p)).map { path =>
              val st = fs.getFileStatus(path)
              val dfRec = new GenericData.Record(
                entrySchema.getField("data_file").schema())
              dfRec.put("content", 0)
              dfRec.put("file_path", path.toString)
              dfRec.put("file_format", "PARQUET")
              val pRec = new GenericData.Record(
                dfRec.getSchema.getField("partition").schema())
              parsed.zipWithIndex.foreach { case ((sf, _), i) =>
                pRec.put(sf.name, t.get(i))
              }
              dfRec.put("partition", pRec)
              dfRec.put("record_count", parquetRowCount(spark, path))
              dfRec.put("file_size_in_bytes", st.getLen)
              putBounds(dfRec, parquetColumnBounds(spark, path))
              val e = new GenericData.Record(entrySchema)
              e.put("status", 1)
              e.put("snapshot_id", snapId)
              e.put("data_file", dfRec)
              e
            }
        }.toSeq
    }
  }

  /** Shared manifest-reuse snapshot append: carry the prior
    * snapshot's manifest list verbatim, add ONE new manifest built by
    * `entriesOf` (content 1 if its entries are delete files, 0
    * otherwise), write the next metadata by MUTATING the prior tree
    * (unknown/foreign fields carry forward verbatim), swap the hint
    * last. On v3 tables the write also maintains row lineage:
    * `next-row-id` advances by the snapshot's added data rows and the
    * snapshot records its `first-row-id` (spec v3 §Row Lineage).
    *
    * HONESTY NOTE (the RoaringDv discipline, write side): no Iceberg
    * v3 runtime, jar, or installable engine exists in this sandbox,
    * so v3 metadata this writer RE-EMITS is verified against the
    * published spec and the in-repo conformance net (IcebergV3Spec's
    * carry-forward + lineage + every-read-path round trip, the
    * FormatFuzzSpec v3 op chains) — not against a foreign v3 reader.
    * Field-level lineage inheritance (per-manifest `first_row_id`
    * assignment at read time) is NOT implemented; this writer records
    * lineage at the snapshot/table level only, and anything it cannot
    * preserve is carried verbatim from the prior metadata rather than
    * regenerated. A byte-level disagreement with a real v3 engine
    * would not surface here; the refusal gates (format-version > 3,
    * initial-defaults, unknown DV storage) keep the failure loud
    * rather than silent. */
  private def appendDeltaSnapshot(spark: SparkSession, location: String,
      operation: String,
      entrySchema: Schema = manifestEntrySchema,
      formatVersion: Int = 2)(
      entriesOf: (org.apache.hadoop.fs.FileSystem, Path, Path, Long,
        String) => Seq[GenericRecord]): Long = {
    val loc = new Path(location)
    val fs = fsOf(spark, loc)
    val metaDir = new Path(loc, "metadata")
    val hint = new Path(metaDir, "version-hint.text")
    if (!fs.exists(hint))
      throw new IOException(s"no Iceberg table at $location")
    val v = readText(spark, hint).trim.toLong
    val meta = mapper.readTree(readText(spark,
      new Path(metaDir, s"v$v.metadata.json")))
    // never DOWNGRADE: a delta snapshot on a v3 table re-emits v3
    // metadata (append and equality-delete are both legal v3 writes —
    // the carried DV manifests keep applying to their older files);
    // anything newer than v3 refuses, matching the read gate
    val priorFv = Option(meta.get("format-version"))
      .map(_.asInt).getOrElse(1)
    if (priorFv > 3)
      throw new IOException(s"cannot write to $location: " +
        s"format-version $priorFv exceeds the supported 1-3; refusing " +
        "rather than corrupt")
    val effFv = math.max(formatVersion, priorFv)
    val prevSnaps = Option(meta.get("snapshots"))
      .map(_.elements().asScala.map(_.toString).toSeq).getOrElse(Nil)
    val currentSnapId = Option(meta.get("current-snapshot-id"))
      .filterNot(_.isNull).map(_.asLong)
      .getOrElse(throw new IOException(
        s"Iceberg table at $location declares no current-snapshot-id " +
          "— cannot locate the manifest list to carry forward"))
    // the carried manifests' entries hold partition tuples against the
    // PRIOR spec — the deepCopy below carries partition-spec(s) /
    // default-spec-id (and everything else this writer does not own)
    // forward verbatim, so later prunes keep working
    val prevListPath = new Path(
      Option(meta.get("snapshots")).toSeq
        .flatMap(_.elements().asScala)
        .find(_.get("snapshot-id").asLong == currentSnapId)
        .getOrElse(throw new IOException(
          s"current snapshot $currentSnapId not in metadata"))
        .get("manifest-list").asText)
    val nextV = v + 1
    val snapId = nextV
    val schemaJson =
      Option(meta.get("schemas")).filter(_.elements().hasNext)
        .map(_.elements().asScala.toSeq.last.toString)
        .orElse(Option(meta.get("schema")).map(_.toString))
        .getOrElse("{}")
    val entries = entriesOf(fs, loc, metaDir, snapId, schemaJson)
    val isDelete = entries.exists(e =>
      long0(e.get("data_file").asInstanceOf[GenericRecord],
        "content") != 0L)
    val manifestP = new Path(metaDir,
      s"manifest-${if (isDelete) "del-" else ""}$snapId.avro")
    val mLen = writeAvro(spark, manifestP, entrySchema, entries)
    val carried = avroRecords(spark, prevListPath).map { r =>
      val c = new GenericData.Record(manifestFileSchema)
      c.put("manifest_path", str(r, "manifest_path").orNull)
      c.put("manifest_length", long0(r, "manifest_length"))
      c.put("partition_spec_id", long0(r, "partition_spec_id").toInt)
      c.put("content", long0(r, "content").toInt)
      val cSeq = fieldOpt(r, "sequence_number")
        .map(_.toString.toLong).getOrElse(long0(r, "added_snapshot_id"))
      c.put("sequence_number", java.lang.Long.valueOf(cSeq))
      c.put("min_sequence_number",
        java.lang.Long.valueOf(fieldOpt(r, "min_sequence_number")
          .map(_.toString.toLong).getOrElse(cSeq)))
      c.put("added_snapshot_id", long0(r, "added_snapshot_id"))
      c
    }
    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", fs.makeQualified(manifestP).toString)
    mf.put("manifest_length", mLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", if (isDelete) 1 else 0)
    mf.put("sequence_number", java.lang.Long.valueOf(snapId))
    mf.put("min_sequence_number", java.lang.Long.valueOf(snapId))
    mf.put("added_snapshot_id", snapId)
    val listP = new Path(metaDir, s"snap-$snapId-manifest-list.avro")
    writeAvro(spark, listP, manifestFileSchema, carried :+ mf)
    val now = System.currentTimeMillis()
    // Build the new metadata by MUTATING the parsed prior tree (the
    // rewriteManifests path's discipline): every field this writer
    // does not own — table-uuid, schemas, partition-specs, sort
    // orders, properties, refs, and any v3-only or future state a
    // FOREIGN writer left — carries forward verbatim instead of being
    // dropped by a fixed template. A regenerating template silently
    // erased exactly the fields a conformant v3 reader requires.
    val snapNode = mapper.createObjectNode()
    snapNode.put("snapshot-id", snapId)
    snapNode.put("sequence-number", snapId)
    snapNode.put("timestamp-ms", now)
    snapNode.put("manifest-list",
      fs.makeQualified(listP).toString)
    val summaryNode = mapper.createObjectNode()
    summaryNode.put("operation", operation)
    val finalFv = math.max(2, effFv)
    if (finalFv >= 3) {
      // v3 row lineage: every snapshot is assigned a first-row-id and
      // the table's next-row-id advances by the rows it added (delete
      // snapshots add 0 and leave it unchanged) — spec-required in v3.
      // SEEDING RULE (first v3 stamp on an upgraded v1/v2 table): the
      // pre-existing live data rows were written before lineage and
      // hold no assigned ids, but a conformant v3 reader derives ids
      // for them by manifest inheritance — so the counter must START
      // past them. Seed next-row-id to the carried manifests' total
      // data-row count (record_count over non-deleted data entries;
      // an over-reservation from DV-masked rows is safe — ids need
      // only be unique, not dense). Seeding from 0 would hand the new
      // snapshot's rows the SAME id range a reader derives for the
      // pre-existing ones. The manifest-level first_row_id fields
      // themselves remain unwritten (see the honesty note above).
      val nextRowId = Option(meta.get("next-row-id"))
        .filterNot(_.isNull).map(_.asLong).getOrElse {
          carried.iterator.map { m =>
            if (long0(m, "content") != 0L) 0L // delete manifests: no data rows
            else avroRecords(spark,
                new Path(str(m, "manifest_path").getOrElse(""))).iterator
              .filter(e => long0(e, "status") != 2L) // skip DELETED entries
              .map { e =>
                val dfr = e.get("data_file").asInstanceOf[GenericRecord]
                if (long0(dfr, "content") == 0L) long0(dfr, "record_count")
                else 0L
              }.sum
          }.sum
        }
      val addedDataRows = entries.iterator.map { e =>
        val dfr = e.get("data_file").asInstanceOf[GenericRecord]
        if (long0(dfr, "content") == 0L) long0(dfr, "record_count")
        else 0L
      }.sum
      snapNode.put("first-row-id", nextRowId)
      summaryNode.put("added-rows", addedDataRows.toString)
      snapNode.set[com.fasterxml.jackson.databind.node.ObjectNode](
        "summary", summaryNode)
      val newMeta = meta
        .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
      newMeta.put("next-row-id", nextRowId + addedDataRows)
      finishDeltaMeta(spark, newMeta, finalFv, snapId, now, snapNode,
        prevSnaps, metaDir, nextV, hint)
    } else {
      snapNode.set[com.fasterxml.jackson.databind.node.ObjectNode](
        "summary", summaryNode)
      val newMeta = meta
        .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
      finishDeltaMeta(spark, newMeta, finalFv, snapId, now, snapNode,
        prevSnaps, metaDir, nextV, hint)
    }
    snapId
  }

  /** Shared tail of appendDeltaSnapshot: stamp the writer-owned
    * fields, append the snapshot, write vN+1, swap the hint last. */
  private def finishDeltaMeta(spark: SparkSession,
      newMeta: com.fasterxml.jackson.databind.node.ObjectNode,
      finalFv: Int, snapId: Long, now: Long,
      snapNode: com.fasterxml.jackson.databind.JsonNode,
      prevSnaps: Seq[String], metaDir: Path, nextV: Long,
      hint: Path): Unit = {
    newMeta.put("format-version", finalFv)
    newMeta.put("last-sequence-number", snapId)
    newMeta.put("last-updated-ms", now)
    newMeta.put("current-snapshot-id", snapId)
    val snapsArr = mapper.createArrayNode()
    prevSnaps.foreach(s => snapsArr.add(mapper.readTree(s)))
    snapsArr.add(snapNode)
    newMeta.set[com.fasterxml.jackson.databind.node.ObjectNode](
      "snapshots", snapsArr)
    writeText(spark, new Path(metaDir, s"v$nextV.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsString(newMeta))
    writeText(spark, hint, nextV.toString) // the commit: hint swaps last
  }
}
