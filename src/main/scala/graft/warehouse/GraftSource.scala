package graft.warehouse

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset,
  SerializedOffset}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  Filter, PrunedFilteredScan, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** `format("graft")` — the versioned table format as a registered
  * Spark data source, so READS need no Scala import either (the DML
  * verbs of [[GraftSql]] cover writes):
  *
  * {{{
  *   spark.read.format("graft").load(root)                     // live
  *   spark.read.format("graft")
  *     .option("versionAsOf", 3).load(root)                    // pinned
  *   spark.read.format("graft")
  *     .option("timestampAsOf", millis).load(root)             // as-of
  * }}}
  *
  * and — the SQL-only client's path — a pure-SQL view:
  *
  * {{{
  *   CREATE TEMPORARY VIEW t USING graft
  *   OPTIONS (path '/lake/t', versionAsOf '3')
  * }}}
  *
  * The relation resolves through [[VersionedParquet.read]] /
  * [[VersionedParquet.readAsOf]], so the merge-on-read overlay
  * (vector ∖, delta ∪), exclusion manifests, schema alignment, and
  * checkpointed time travel all apply identically to the Scala path.
  * Column pruning pushes into the underlying parquet scans
  * ([[PrunedFilteredScan]]); filters are re-applied by Spark above the
  * scan (declared unhandled — the overlay's anti-join must see the
  * same rows the filters do), with pushdown still reaching the
  * parquet reader through the pruned projection's own plan. */
class GraftSource extends RelationProvider with DataSourceRegister
    with StreamSourceProvider {
  override def shortName(): String = "graft"

  // ── streaming: the table as a Structured Streaming SOURCE ──────────
  //
  //   spark.readStream.format("graft").load(root)              // tail
  //   …option("startingVersion", 0)…                           // replay
  //   …option("readChangeFeed", "true")…                       // CDC rows
  //   …option("ignoreChanges", "true")…                        // see below
  //
  // Offsets are TABLE VERSIONS — the natural exactly-once unit: a
  // micro-batch covers the half-open version range (start, end], its
  // rows come straight from the committed change feed, and a restart
  // resumes from the checkpointed version. The first batch serves the
  // snapshot AT `startingVersion` (default: the live version when the
  // stream starts, Delta's semantics) as inserts, then every later
  // batch is `VersionedParquet.changes` — O(changes) per batch, never
  // a table rescan, which at 100 TB is the only viable tail.
  //
  // Default (data-rows) mode emits plain data columns and REQUIRES the
  // tailed range to be append-only: versions whose committed write
  // domain (`Optimistic.domainOf` — metadata, no data read) is not an
  // append fail the batch loudly unless `ignoreChanges` is set, in
  // which case inserts + post-update images flow and deletes are
  // dropped (Delta's `ignoreChanges` contract). CDC mode
  // (`readChangeFeed`) emits `_change_type` / `_commit_version` and
  // accepts everything. Physical republishes (RESTORE, physical
  // publish) carry no feed, so tailing across one fails loudly — same
  // contract as `changes` itself.
  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), GraftStreamSource.schemaFor(ctx.sparkSession, parameters))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    GraftStreamSource(ctx.sparkSession, parameters)

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft source needs a path (OPTIONS (path '...'))"))
    val version = parameters.get("versionAsOf").map(_.toLong)
    val asOf = parameters.get("timestampAsOf").map(_.toLong)
    // CDC view: OPTIONS (changesFrom '0' [, changesTo '3']) serves the
    // row-level change feed in (from, to] — Delta's table_changes for
    // SQL-only consumers; `to` defaults to the live version
    val chFrom = parameters.get("changesFrom").map(_.toLong)
    val chTo = parameters.get("changesTo").map(_.toLong)
    // OPTIONS (history 'true'): the commit log as a frame — version,
    // commit millis, write domain — the DESCRIBE HISTORY analogue
    val history = parameters.get("history").exists(_.toBoolean)
    require(version.isEmpty || asOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    require(chFrom.isDefined || chTo.isEmpty,
      "changesTo needs changesFrom")
    require(chFrom.isEmpty || (version.isEmpty && asOf.isEmpty),
      "a changes view cannot also pin a version/timestamp")
    require(!history || (version.isEmpty && asOf.isEmpty &&
      chFrom.isEmpty), "a history view takes no other option")
    new GraftRelation(ctx, root, version, asOf, chFrom, chTo, history)
  }
}

private[graft] class GraftRelation(ctx: SQLContext, root: String,
    version: Option[Long], asOf: Option[Long],
    chFrom: Option[Long] = None, chTo: Option[Long] = None,
    history: Boolean = false)
    extends BaseRelation with PrunedFilteredScan {

  /** The table root — the [[graft.plans.StatsAggRewrite]] hook. */
  private[graft] def tableRoot: String = root

  /** True iff this relation serves the LIVE data view (no pin, no CDC,
    * no history) — the only shape whose stats sidecar describes what a
    * query over it reads. */
  private[graft] def servesLiveView: Boolean =
    !history && version.isEmpty && asOf.isEmpty && chFrom.isEmpty

  private def spark: SparkSession = ctx.sparkSession

  private def historyFrame: DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = VersionedParquet.versions(spark, root).map { v =>
      val ts = VersionedParquet.snapshotMarker(spark, root, "_SUCCESS",
        Some(v)).filter(s => s.nonEmpty && s.forall(_.isDigit))
        .map(_.toLong)
      val domain = Optimistic.domainOf(spark, root, v) match {
        case Optimistic.AppendDomain => "append"
        case Optimistic.PartitionsDomain(p) =>
          s"partitions(${p.toSeq.sorted.mkString(";")})"
        case Optimistic.KeysDomain(cols, _) =>
          s"keys(${cols.mkString(",")})"
        case Optimistic.TableDomain => "table"
      }
      org.apache.spark.sql.Row(v, ts.map(java.lang.Long.valueOf).orNull,
        domain)
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "version BIGINT, commit_millis BIGINT, domain STRING"))
  }

  private def frame: DataFrame =
    if (history) historyFrame
    else (chFrom, asOf) match {
      case (Some(from), _) =>
        // CDF + policies don't compose: pre/post images leak raw
        // history around a mask, and a row filter cannot soundly drop
        // half an update pair. Same restriction as the Delta product.
        require(!VersionedParquet.hasPolicies(spark, root),
          s"change feed is not served on a table with row/column " +
            s"policies ($root); drop the policies or read the table view")
        val to = chTo.orElse(VersionedParquet.currentVersion(spark, root))
          .getOrElse(throw new java.io.IOException(
            s"no published version under $root"))
        VersionedParquet.changes(spark, root, from, to)
      case (None, Some(ts)) => VersionedParquet.applyPolicies(spark, root,
        VersionedParquet.readAsOf(spark, root, ts))
      case _ => VersionedParquet.applyPolicies(spark, root,
        VersionedParquet.read(spark, root, version))
    }

  override def sqlContext: SQLContext = ctx
  override lazy val schema: StructType = frame.schema

  /** Size estimate for the optimizer's broadcast decision: the actual
    * bytes of the files this relation's frame scans (base minus
    * exclusions plus overlay tiers), instead of BaseRelation's
    * default "unknown = never broadcast" — so a small graft view on
    * the build side of a join auto-broadcasts exactly like a parquet
    * table would (the BHJ-vs-SMJ decision is THE join cost cliff at
    * scale). Parquet is compressed, so this under-states in-memory
    * row width the same way Spark's own file-scan sizing does. One
    * bounded file-status listing per relation instance, computed
    * lazily at planning time; any failure falls back to the safe
    * default. */
  override lazy val sizeInBytes: Long =
    try {
      val files = frame.inputFiles
      if (files.isEmpty) super.sizeInBytes
      else {
        val conf = spark.sparkContext.hadoopConfiguration
        files.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(conf).getFileStatus(p).getLen
        }.sum
      }
    } catch { case scala.util.control.NonFatal(_) => super.sizeInBytes }

  // every filter re-applies above the scan — the MoR overlay must see
  // unfiltered rows for its (file, pos) anti-join to be sound
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    // one instantiation per scan: `frame` is a def (each call resolves
    // the CURRENT version fresh), so projection must bind to the same
    // instance it selects from. Live table reads with pushed-down
    // filters resolve THROUGH the file-skipping tier: prunable
    // conjuncts (ranges, equality + bloom, IN envelopes, prefixes)
    // drop files whose stats cannot match before the scan ever lists
    // them — the SQL-only client gets the same slice-not-table scan
    // as FileStats.skippingRead, and since every filter is re-applied
    // above (unhandledFilters), pruning is a pure IO optimization.
    // Pinned/CDC/history frames keep the plain path: skipping stats
    // describe the live physical layout.
    // Policy-bearing tables take the plain path: the skipping tier
    // serves RAW rows and prunes by RAW column stats, but the pushed
    // filters reference the MASKED output — pruning with them against
    // raw stats is unsound, and the raw frame must never escape.
    val f =
      if (history || chFrom.isDefined || asOf.isDefined ||
          version.isDefined || filters.isEmpty ||
          VersionedParquet.hasPolicies(spark, root)) frame
      else {
        val (df, kept, total) = FileStats.skippingReadFilters(
          spark, root, None, filters.toSeq, schema)
        GraftRelation.lastPrune = Some((root, kept, total))
        df
      }
    val pruned =
      if (requiredColumns.isEmpty) f
      else f.select(requiredColumns.map(f.col).toSeq: _*)
    pruned.rdd
  }
}

private[warehouse] object GraftRelation {
  /** Last pruned-scan audit `(root, filesRead, filesTotal)` — a
    * debug/spec observability hook (driver-side, volatile), NOT an
    * API: concurrent scans race on it harmlessly. −1/−1 means the
    * scan had filters but no stats sidecar to prune with. */
  @volatile private[warehouse] var lastPrune: Option[(String, Int, Int)] =
    None
}

private[warehouse] object GraftStreamSource {
  val CHANGE_TYPE = "_change_type"
  val COMMIT_VERSION = "_commit_version"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft stream source needs a path"))

  /** Data schema of the live table (+ CDC columns in feed mode).
    * Resolved ONCE per stream start; tailing across a schema change is
    * rejected batch-side (the strict select below), not silently
    * widened — materialize the evolution (OPTIMIZE) and restart the
    * stream instead. */
  def schemaFor(spark: SparkSession,
      parameters: Map[String, String]): StructType = {
    val data = VersionedParquet.read(spark, rootOf(parameters)).schema
    if (parameters.get("readChangeFeed").exists(_.toBoolean))
      StructType(data.fields.toSeq :+
        StructField(CHANGE_TYPE, StringType, nullable = false) :+
        StructField(COMMIT_VERSION, LongType, nullable = false))
    else data
  }

  def apply(spark: SparkSession,
      parameters: Map[String, String]): GraftStreamSource = {
    val root = rootOf(parameters)
    // Same restriction as the batch CDC view: a stream replays raw
    // history (inserts and change images) around any mask/filter.
    require(!VersionedParquet.hasPolicies(spark, root),
      s"streaming reads are not served on a table with row/column " +
        s"policies ($root)")
    val cdf = parameters.get("readChangeFeed").exists(_.toBoolean)
    val ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean)
    require(!(cdf && ignoreChanges),
      "readChangeFeed already surfaces every change; ignoreChanges is a " +
        "data-rows-mode option")
    val live = VersionedParquet.currentVersion(spark, root).getOrElse(
      throw new java.io.IOException(
        s"no published version under $root — publish v0 before tailing"))
    val starting = parameters.get("startingVersion").map(_.toLong)
      .getOrElse(live)
    require(starting >= 0 && starting <= live,
      s"startingVersion $starting outside published range [0, $live]")
    val maxVersions = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    require(maxVersions.forall(_ > 0),
      s"maxVersionsPerTrigger must be positive, got $maxVersions")
    new GraftStreamSource(spark, root, starting, cdf, ignoreChanges,
      maxVersions, schemaFor(spark, parameters))
  }
}

/** The versioned table as a DSv1 streaming `Source` — see the contract
  * on [[GraftSource.sourceSchema]]. One instance per running stream;
  * all state is the checkpoint's offsets (versions), so the source
  * itself is stateless across restarts. */
private[warehouse] class GraftStreamSource(spark: SparkSession,
    root: String, startingVersion: Long, cdf: Boolean,
    ignoreChanges: Boolean, maxVersionsPerTrigger: Option[Long],
    override val schema: StructType)
    extends Source {
  import GraftStreamSource.{CHANGE_TYPE, COMMIT_VERSION}
  import org.apache.spark.sql.functions.{col, lit}

  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalStateException(
      s"unexpected offset type ${other.getClass}")
  }

  /** High-water mark of versions already handed to the engine — the
    * rate-limit floor. Fresh streams start at `startingVersion`; on a
    * checkpointed restart the engine replays the last committed batch
    * through [[getBatch]] BEFORE the first [[getOffset]] (the DSv1
    * re-initialization contract), which advances the floor to the
    * checkpoint, so a capped offset can never regress below it (a
    * regressed offset would make the next batch replay committed
    * versions — duplicates). */
  @volatile private var servedThrough: Long = startingVersion

  /** Latest committed version — the next batch's upper bound, capped
    * at `maxVersionsPerTrigger` versions past the served floor so a
    * catch-up stream (a restart 10⁴ commits behind at 100 TB) drains
    * in bounded micro-batches instead of one unbounded replay. */
  override def getOffset: Option[V1Offset] =
    VersionedParquet.currentVersion(spark, root).map { live =>
      LongOffset(maxVersionsPerTrigger
        .fold(live)(m => math.min(live, servedThrough + m)))
    }

  /** Data-rows mode admits a version iff its committed write domain
    * proves append-only — a METADATA check, no data scanned. Updates /
    * deletes / keyed merges / whole-table domains fail loudly (or pass
    * filtered when `ignoreChanges`). Conservative by design: a merge
    * that happened to match zero rows still needs `ignoreChanges`. */
  private def guardAppendOnly(v: Long): Unit = {
    val domain = Optimistic.domainOf(spark, root, v)
    if (domain != Optimistic.AppendDomain && !ignoreChanges)
      throw new IllegalStateException(
        s"version $v of $root is not an append (domain $domain); " +
          "stream with readChangeFeed to consume updates/deletes, or " +
          "ignoreChanges to drop them")
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val to = versionOf(end)
    servedThrough = math.max(servedThrough,
      math.max(to, start.map(versionOf).getOrElse(startingVersion)))
    val frame = start.map(versionOf) match {
      case Some(from) if from >= to => // restart replay of a done range
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema)
      case Some(from) => feed(from, to)
      case None => // first batch: snapshot AT startingVersion + tail
        val snap0 = VersionedParquet.read(spark, root, Some(startingVersion))
        val snap =
          if (cdf) snap0.withColumn(CHANGE_TYPE, lit("insert"))
            .withColumn(COMMIT_VERSION, lit(startingVersion))
          else snap0
        if (to > startingVersion) snap.unionByName(feed(startingVersion, to))
        else snap
    }
    // strict column binding: the batch must produce exactly the schema
    // resolved at stream start — a mid-stream schema change errors here
    org.apache.spark.sql.graft.StreamShim.asStreaming(spark,
      frame.select(schema.fieldNames.toSeq.map(col): _*))
  }

  private def feed(from: Long, to: Long): DataFrame = {
    if (!cdf) (from + 1 to to).foreach(guardAppendOnly)
    val ch = VersionedParquet.changes(spark, root, from, to)
    if (cdf) ch
    else if (ignoreChanges)
      ch.filter(col(CHANGE_TYPE).isin("insert", "update_post"))
        .drop(CHANGE_TYPE, COMMIT_VERSION)
    else ch.drop(CHANGE_TYPE, COMMIT_VERSION)
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"GraftStreamSource[$root, starting=$startingVersion, cdf=$cdf]"
}
