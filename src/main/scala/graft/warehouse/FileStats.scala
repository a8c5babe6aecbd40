package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-level min/max data skipping over the versioned table format —
  * the add-file stats half of a transactional format's metadata (what
  * Delta writes per AddFile and Iceberg per manifest entry). Directory-
  * level partition pruning (q107) skips whole partitions; THIS tier
  * skips individual files inside a table/partition using per-file
  * min/max of clustered columns, which is what makes a z-ordered
  * layout (q71) load-bearing: sorted layout ⇒ tight per-file ranges ⇒
  * a selective predicate reads a slice, not the table.
  *
  * Mechanics: `publishClustered` range-partitions + sorts by the
  * layout key and publishes through [[VersionedParquet.publish]] with
  * `statsCols` — publish scans the freshly-written snapshot (column-
  * pruned to the stats columns) grouped by `input_file_name()` and
  * writes a `_FILESTATS` sidecar marker BEFORE the pointer swap, so
  * stats commit atomically with the version they describe. (A native
  * writer would fold this into parquet-footer accumulators instead of
  * a second scan; the second scan here reads only the stats columns.)
  *
  * `skippingRead` consults the sidecar before listing files: files
  * whose [min,max] cannot intersect the predicate range are never
  * handed to the scan at all — strictly fewer tasks and bytes, the
  * difference between scanning a table and scanning a slice at 100 TB.
  * A missing sidecar (older version, or stats never requested)
  * degrades to the full snapshot read. Stats columns must be integral
  * (min/max serialize as longs); the exact predicate is re-applied on
  * the surviving files, so skipping is a pure optimization and any
  * overlap bug surfaces as a correctness diff (q121's oracle).
  */
object FileStats {

  /** Publish `df` clustered by `layout` into ~`nFiles` files with
    * per-file min/max stats on `statsCols`; returns the snapshot dir.
    * Range partitioning + in-file sort give each file a tight range on
    * the leading layout column — the layout skipping feeds on. */
  def publishClustered(df: DataFrame, root: String, layout: Seq[String],
                       statsCols: Seq[String], nFiles: Int,
                       keepVersions: Int = 2): String = {
    val arranged = df
      .repartitionByRange(nFiles, layout.map(df.col): _*)
      .sortWithinPartitions(layout.map(df.col): _*)
    VersionedParquet.publish(arranged, root, keepVersions = keepVersions,
      statsCols = statsCols)
  }

  /** OPTIMIZE-ZORDER analogue: rewrite the LIVE version clustered by
    * `layout` with fresh per-file stats on `statsCols`, published as a
    * new version through the same reader-safe pointer swap — in-flight
    * scans finish on the old layout, new scans skip on the new one.
    * Content is unchanged (same rows, better files); a crash mid-
    * optimize leaves the live version untouched. */
  def optimize(spark: SparkSession, root: String, layout: Seq[String],
               statsCols: Seq[String], nFiles: Int): String =
    publishClustered(VersionedParquet.read(spark, root), root,
      layout, statsCols, nFiles)

  /** The `OPTIMIZE t ZORDER BY (cols…)` implementation: recluster the
    * live table so every named column gets tight per-file ranges. One
    * column clusters directly; several interleave 16 bits each
    * (Morton order — the q71/q121 layout) so range predicates on ANY
    * of them prune files, which is the whole point of Z-ORDER over a
    * lexicographic sort. Stats (range kind; stats-able types only) are
    * recomputed on the named columns; file count is sized from the
    * base's bytes like `compact`. Multi-column interleave needs
    * integral columns (bit masking); reject anything else loudly. */
  def zorderOptimize(spark: SparkSession, root: String,
                     cols: Seq[String], targetBytes: Long = 128L << 20,
                     keepVersions: Int = 2): String = {
    require(cols.nonEmpty, "ZORDER BY needs at least one column")
    import org.apache.spark.sql.functions.{call_function, lit, shiftright}
    val df = VersionedParquet.read(spark, root)
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"ZORDER column $c does not exist on $root"))
    val integral = cols.forall(c => schema(c).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    })
    require(cols.size == 1 || integral,
      "multi-column ZORDER BY needs integral columns (bit interleave)")
    val statsable = cols.filter(c => schema(c).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.StringType => true
      case _ => false
    })
    val snapshot = new org.apache.hadoop.fs.Path(root,
      VersionedParquet.baseNameOf(spark, root,
        VersionedParquet.currentVersion(spark, root).getOrElse(
          throw new java.io.IOException(s"no published version under $root"))))
    val bytes = snapshot.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
      .getContentSummary(snapshot).getLength
    val nFiles = math.max(1,
      math.ceil(bytes.toDouble / targetBytes).toInt)
    if (cols.size == 1)
      publishClustered(df, root, cols, statsable, nFiles,
        keepVersions = keepVersions)
    else {
      // 16-bit Morton interleave of the masked columns: bit i of
      // column j lands at position i * nCols + j
      val n = cols.size
      val z = (0 until 16).flatMap { i =>
        cols.zipWithIndex.map { case (c, j) =>
          call_function("shiftleft",
            shiftright(df(c).cast("long").bitwiseAND(lit(65535L)), i)
              .bitwiseAND(lit(1L)),
            lit(i * n + j))
        }
      }.reduce(_ + _)
      val keyed = df.withColumn("_zorder_key", z)
      val arranged = keyed
        .repartitionByRange(nFiles, keyed("_zorder_key"))
        .sortWithinPartitions(keyed("_zorder_key"))
        .drop("_zorder_key")
      VersionedParquet.publish(arranged, root,
        keepVersions = keepVersions, statsCols = statsable)
    }
  }

  /** One column's [min, max] on one file: long range for integral
    * columns, lexicographic string range for string columns. A file
    * may additionally carry a [[BloomStat]] for point-lookup skipping
    * — `mightContain` defaults to true (range stats can never rule a
    * point OUT beyond their range test, and a bloom can never rule a
    * RANGE out), so each stat kind only answers the question it can. */
  sealed trait Range { def overlapsLong(lo: Long, hi: Long): Boolean
                       def overlapsStr(lo: String, hi: String): Boolean
                       def mightContain(p1: Int, p2: Int): Boolean = true }
  final case class LongRange(mn: Long, mx: Long) extends Range {
    def overlapsLong(lo: Long, hi: Long): Boolean = mx >= lo && mn <= hi
    def overlapsStr(lo: String, hi: String): Boolean = true // not typed
  }
  final case class StrRange(mn: String, mx: String) extends Range {
    def overlapsLong(lo: Long, hi: Long): Boolean = true // not typed
    def overlapsStr(lo: String, hi: String): Boolean =
      mx >= lo && mn <= hi
  }

  /** Per-file Bloom filter (BLOOM_BITS bits, 2 hashes) over one
    * column's values — point-lookup skipping that needs NO sorted
    * layout: any file whose filter lacks either probe bit cannot
    * contain the value. Ranges answer range predicates; this answers
    * equality on high-cardinality keys where min/max is useless. */
  final case class BloomStat(words: Array[Long]) extends Range {
    def overlapsLong(lo: Long, hi: Long): Boolean = true // not a range
    def overlapsStr(lo: String, hi: String): Boolean = true
    private def bit(p: Int): Boolean =
      (words(p >>> 6) >>> (p & 63) & 1L) == 1L
    override def mightContain(p1: Int, p2: Int): Boolean = bit(p1) && bit(p2)
  }

  /** Bloom geometry + the shared position expression. Both the publish
    * side (per-row positions folded into per-file filters) and the
    * probe side (positions of one literal) build positions from THIS
    * expression, so write/read consistency is structural: pmod of
    * Spark's codegen'd xxhash64 with a small distinguishing seed. */
  final val BLOOM_BITS = 1024
  private[warehouse] def bloomPos(c: org.apache.spark.sql.Column,
                                  seed: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    pmod(xxhash64(lit(seed), c), lit(BLOOM_BITS))
  }

  /** Fold a set of bit positions into the fixed-width word array. */
  private[warehouse] def bloomWords(positions: Iterable[Long]): Array[Long] = {
    val w = new Array[Long](BLOOM_BITS / 64)
    positions.foreach { p => w(p.toInt >>> 6) |= 1L << (p.toInt & 63) }
    w
  }

  private def unhex(h: String): String =
    new String(h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
      "UTF-8")

  /** The stats sidecar directory inside a snapshot — parquet rows
    * `(file, n, col, kind, lo, hi)`, written EXECUTOR-side at publish
    * (kind L = long range, S = hex-encoded string range, P = sorted
    * 4-hex-digit bloom positions). Underscore-prefixed so data scans
    * never list it. */
  private[warehouse] val STATS_DIR = "_filestats"

  /** One raw sidecar row, engine-neutral strings. */
  private[warehouse] final case class StatRow(file: String, n: Long,
      col: String, kind: String, lo: String, hi: String)

  /** Load a snapshot's per-file stats rows: the parquet sidecar when
    * present, else the legacy `_FILESTATS` text marker (pre-round-9
    * snapshots); None when the version carries no stats.
    *
    * DRIVER-MEMORY BOUND: this collect is O(files × stats columns) —
    * the same bound Delta pays replaying AddFile stats from its log.
    * Tiny strings per row, so ~10⁶ files ≈ tens of MB; the PUBLISH
    * side no longer collects anything (the sidecar is built and
    * written executor-side). If the bound ever bites, push the
    * pruning predicate into a filter over the sidecar scan and
    * collect only surviving file names. */
  /** Per-snapshot sidecar memo: a snapshot's stats are written ONCE,
    * before its pointer swap, and never mutated — so the loaded rows
    * are cacheable by construction (vacuum deletes whole snapshot
    * dirs; a stale entry for a deleted snapshot can only be reached
    * by a read that fails at resolution anyway). Without this, every
    * skipping probe re-runs a small Spark job to read the parquet
    * sidecar — measured as the q134 ~1 s/probe drag after the
    * sidecar moved from a text marker to executor-written parquet.
    * Bounded: cleared wholesale past 64 snapshots. */
  private val statRowsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Seq[StatRow]]]()

  private[warehouse] def loadStatRows(spark: SparkSession,
      snapshot: String): Option[Seq[StatRow]] = {
    val cached = statRowsMemo.get(snapshot)
    if (cached != null) return cached
    val dir = new org.apache.hadoop.fs.Path(snapshot, STATS_DIR)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val loaded: Option[Seq[StatRow]] =
      if (fs.exists(dir))
        Some(spark.read.parquet(dir.toString).collect().toSeq.map(r =>
          StatRow(r.getString(0), r.getLong(1), r.getString(2),
            r.getString(3), r.getString(4), r.getString(5))))
      else VersionedParquet.readPointer(spark,
        new org.apache.hadoop.fs.Path(snapshot,
          VersionedParquet.STATS_MARKER)).map(content =>
        content.split('\n').filter(_.nonEmpty).toSeq.map { line =>
          val Array(f, n, c, t, lo, hi) = line.split('\t')
          StatRow(f, n.toLong, c, t, lo, hi)
        })
    // only memoize PRESENT stats: an absent sidecar may be a snapshot
    // still being staged (publish writes stats before _SUCCESS, but a
    // racing reader could probe between); None stays uncached so the
    // next probe re-checks
    if (loaded.isDefined) {
      if (statRowsMemo.size > 64) statRowsMemo.clear()
      statRowsMemo.put(snapshot, loaded)
    }
    loaded
  }

  /** Sidecar rows → per-file per-column [[Range]] map. A row with a
    * null bound (an all-null file) contributes no stat — the file
    * stays listed and is conservatively read. */
  private def toRanges(rows: Seq[StatRow])
      : Map[String, Map[String, Range]] =
    rows.groupBy(_.file).map { case (f, rs) =>
      f -> rs.flatMap { r =>
        (r.kind, Option(r.lo), Option(r.hi)) match {
          case ("S", Some(lo), Some(hi)) =>
            Some(r.col -> StrRange(unhex(lo), unhex(hi)))
          case ("L", Some(lo), Some(hi)) =>
            Some(r.col -> LongRange(lo.toLong, hi.toLong))
          case ("B", Some(lo), _) => Some(s"${r.col}#bloom" -> BloomStat(
            lo.grouped(16)
              .map(java.lang.Long.parseUnsignedLong(_, 16)).toArray))
          case ("P", Some(lo), _) => Some(s"${r.col}#bloom" -> BloomStat(
            bloomWords(lo.grouped(4)
              .map(Integer.parseInt(_, 16).toLong).toSeq)))
          case _ => None
        }
      }.toMap
    }

  /** Read the live (or pinned) version scanning ONLY files whose
    * [min,max] range on `column` can intersect `[lo, hi]`. Returns the
    * frame plus (files read, files total) for skipping audits. The
    * caller still applies the exact predicate — skipping must never be
    * trusted for row-level filtering. */
  def skippingRead(spark: SparkSession, root: String, column: String,
                   lo: Long, hi: Long, version: Option[Long] = None)
      : (DataFrame, Int, Int) =
    skippingReadWhere(spark, root, version,
      _.get(column).forall(_.overlapsLong(lo, hi)))

  /** String-range variant: files whose lexicographic [min, max] on
    * `column` cannot intersect `[lo, hi]` are skipped — the term-prefix
    * / key-range scan over a sorted string layout. */
  def skippingReadString(spark: SparkSession, root: String, column: String,
                         lo: String, hi: String,
                         version: Option[Long] = None)
      : (DataFrame, Int, Int) =
    skippingReadWhere(spark, root, version,
      _.get(column).forall(_.overlapsStr(lo, hi)))

  /** Point-lookup variant over a per-file Bloom filter on `column`
    * (published via `bloomCols`): files whose filter lacks either
    * probe bit cannot contain `value` and are never listed. Needs no
    * sorted layout — this is the skipping tier for equality on
    * high-cardinality keys, where min/max ranges prune nothing. The
    * probe positions come from a one-row Spark job over the SAME
    * expression the publish side folded per row, so the two sides can
    * never drift. Files without a bloom entry are conservatively read. */
  def skippingReadPoint(spark: SparkSession, root: String, column: String,
                        value: org.apache.spark.sql.Column,
                        version: Option[Long] = None)
      : (DataFrame, Int, Int) = {
    val probe = spark.range(1)
      .select(bloomPos(value, 1).as("p1"), bloomPos(value, 2).as("p2"))
      .head()
    val (p1, p2) = (probe.getLong(0).toInt, probe.getLong(1).toInt)
    skippingReadWhere(spark, root, version,
      _.get(s"$column#bloom").forall(_.mightContain(p1, p2)))
  }

  /** Conservative per-file pruning predicate derived from ONE pushed-
    * down `sources.Filter`, or None when the filter can't prune (wrong
    * shape, un-stats-able type, null semantics). Soundness contract: a
    * returned predicate may only reject a file when NO row of it can
    * satisfy the filter — equality/range tests never match NULL rows,
    * so null-blind min/max ranges (publish ignores nulls) stay sound;
    * IsNull/IsNotNull/EqualNullSafe prune nothing. The exact predicate
    * is always re-applied above the scan, so a too-loose keep is just
    * wasted IO, never wrong rows. */
  private[warehouse] def pruneFor(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      filter: org.apache.spark.sql.sources.Filter)
      : Option[Map[String, Range] => Boolean] = {
    import org.apache.spark.sql.sources._
    def fieldType(c: String) = schema.fields.find(_.name == c).map(_.dataType)
    def isStr(c: String) = fieldType(c)
      .exists(_.isInstanceOf[org.apache.spark.sql.types.StringType])
    def isIntegral(c: String) = fieldType(c).exists {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    def longOf(v: Any): Option[Long] = v match {
      case n: Byte => Some(n.toLong)
      case n: Short => Some(n.toLong)
      case n: Int => Some(n.toLong)
      case n: Long => Some(n)
      case _ => None
    }
    // bloom probe positions of one literal — cast to the COLUMN's type
    // first: xxhash64 is type-sensitive, and the publish side folded
    // positions of the column expression itself
    def probes(c: String, v: Any): (Int, Int) = {
      import org.apache.spark.sql.functions.lit
      val t = fieldType(c).get
      val row = spark.range(1).select(
        bloomPos(lit(v).cast(t), 1), bloomPos(lit(v).cast(t), 2)).head()
      (row.getLong(0).toInt, row.getLong(1).toInt)
    }
    filter match {
      case EqualTo(c, v) if isIntegral(c) && longOf(v).isDefined =>
        val x = longOf(v).get
        val (p1, p2) = probes(c, v)
        Some(cols => cols.get(c).forall(_.overlapsLong(x, x)) &&
          cols.get(s"$c#bloom").forall(_.mightContain(p1, p2)))
      case EqualTo(c, v: String) if isStr(c) =>
        val (p1, p2) = probes(c, v)
        Some(cols => cols.get(c).forall(_.overlapsStr(v, v)) &&
          cols.get(s"$c#bloom").forall(_.mightContain(p1, p2)))
      case GreaterThan(c, v) if isIntegral(c) && longOf(v).isDefined =>
        // inclusive lower bound is conservative for the strict case
        val x = longOf(v).get
        Some(cols => cols.get(c).forall(_.overlapsLong(x, Long.MaxValue)))
      case GreaterThanOrEqual(c, v) if isIntegral(c) && longOf(v).isDefined =>
        val x = longOf(v).get
        Some(cols => cols.get(c).forall(_.overlapsLong(x, Long.MaxValue)))
      case LessThan(c, v) if isIntegral(c) && longOf(v).isDefined =>
        val x = longOf(v).get
        Some(cols => cols.get(c).forall(_.overlapsLong(Long.MinValue, x)))
      case LessThanOrEqual(c, v) if isIntegral(c) && longOf(v).isDefined =>
        val x = longOf(v).get
        Some(cols => cols.get(c).forall(_.overlapsLong(Long.MinValue, x)))
      case In(c, vs) if vs.nonEmpty && isIntegral(c) &&
          vs.forall(longOf(_).isDefined) =>
        // envelope of the value set — conservative, no per-value probes
        val xs = vs.map(longOf(_).get)
        Some(cols => cols.get(c).forall(_.overlapsLong(xs.min, xs.max)))
      case In(c, vs) if vs.nonEmpty && isStr(c) &&
          vs.forall(_.isInstanceOf[String]) =>
        val xs = vs.map(_.asInstanceOf[String])
        Some(cols => cols.get(c).forall(_.overlapsStr(xs.min, xs.max)))
      case StringStartsWith(c, p) if isStr(c) && p.nonEmpty =>
        // matches lie in [p, succ(p)); when the last char can't be
        // incremented, keep only the lower-bound test
        val last = p.last
        if (last == Char.MaxValue)
          Some(cols => cols.get(c).forall {
            case StrRange(_, mx) => mx >= p
            case _ => true
          })
        else {
          val succ = p.init + (last + 1).toChar
          Some(cols => cols.get(c).forall {
            case StrRange(mn, mx) => mx >= p && mn < succ
            case _ => true
          })
        }
      case And(l, r) =>
        (pruneFor(spark, schema, l), pruneFor(spark, schema, r)) match {
          case (Some(a), Some(b)) => Some(cols => a(cols) && b(cols))
          case (a, b) => a.orElse(b)
        }
      case _ => None
    }
  }

  /** [[skippingRead]] driven by a pushed-down filter array (the graft
    * data source's scan path): every prunable conjunct must keep a
    * file for it to be listed. Returns the full read (audit counts −1)
    * when nothing prunes. */
  private[warehouse] def skippingReadFilters(spark: SparkSession,
      root: String, version: Option[Long],
      filters: Seq[org.apache.spark.sql.sources.Filter],
      schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, Int, Int) = {
    val preds = filters.flatMap(pruneFor(spark, schema, _))
    if (preds.isEmpty) (VersionedParquet.read(spark, root, version), -1, -1)
    else skippingReadWhere(spark, root, version,
      cols => preds.forall(_(cols)))
  }

  private def skippingReadWhere(spark: SparkSession, root: String,
                                version: Option[Long],
                                keepFile: Map[String, Range] => Boolean)
      : (DataFrame, Int, Int) = {
    val v = version.orElse(VersionedParquet.currentVersion(spark, root))
      .getOrElse(throw new java.io.IOException(
        s"no published version under $root"))
    // merge-on-read aware: the stats sidecar lives on the PHYSICAL
    // base snapshot (a DV/merge version holds only metadata), pruning
    // composes with the exclusion manifest, and the surviving scan
    // gets the version's vector + delta overlaid — the delta tier is
    // always read in full (it has no per-file stats and is small by
    // construction; the caller applies the exact predicate anyway)
    val baseName = VersionedParquet.baseNameOf(spark, root, v)
    val isMor = baseName != f"v$v%08d"
    val snapshot = s"$root/$baseName"
    loadStatRows(spark, snapshot) match {
      case None => (VersionedParquet.read(spark, root, Some(v)), -1, -1)
      case Some(rows) =>
        val stats = toRanges(rows)
        val excluded = VersionedParquet.excludedFilesOf(spark, root, v)
        val listed = stats.view.filterKeys(f => !excluded(f)).toMap
        val total = listed.size
        val keep = listed.collect {
          case (f, cols) if keepFile(cols) => f
        }.toSeq.sorted
        // schema from the snapshot dir so an all-files-skipped read
        // still resolves columns (empty frame, right schema)
        val schema = spark.read.parquet(snapshot).schema
        val base =
          if (keep.isEmpty) None
          else Some(spark.read.schema(schema)
            .option("basePath", snapshot)
            .parquet(keep.map(f => s"$snapshot/$f"): _*))
        val df =
          if (isMor) VersionedParquet.morOverlay(spark, root, v, base, schema)
          else base.getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
        // metadata-only added columns stay readable on pruned scans
        (VersionedParquet.applySchemaExt(spark, root, df),
          keep.size, total)
    }
  }

  /** The per-file stats frame for a published version — the metadata
    * table a format exposes as `describe detail` / `add_files`. Bloom
    * stats surface uniformly as type B with word-hex in `min_str`,
    * whatever the storage generation (legacy word-hex marker or the
    * position-list parquet sidecar). */
  def fileStats(spark: SparkSession, root: String,
                version: Option[Long] = None): DataFrame = {
    import scala.jdk.CollectionConverters._
    val v = version.orElse(VersionedParquet.currentVersion(spark, root))
      .getOrElse(throw new java.io.IOException(
        s"no published version under $root"))
    val baseName = VersionedParquet.baseNameOf(spark, root, v)
    val rows = loadStatRows(spark, s"$root/$baseName")
      .getOrElse(Nil).map { r =>
        r.kind match {
          case "S" => org.apache.spark.sql.Row(r.file, r.n, r.col, "S",
            null, null, unhex(r.lo), unhex(r.hi))
          case "B" =>
            org.apache.spark.sql.Row(r.file, r.n, r.col, "B",
              null, null, r.lo, null)
          case "P" =>
            val words = bloomWords(r.lo.grouped(4)
              .map(Integer.parseInt(_, 16).toLong).toSeq)
            org.apache.spark.sql.Row(r.file, r.n, r.col, "B", null, null,
              words.map(w => f"$w%016x").mkString, null)
          case _ => org.apache.spark.sql.Row(r.file, r.n, r.col, "L",
            java.lang.Long.valueOf(r.lo), java.lang.Long.valueOf(r.hi),
            null, null)
        }
      }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "file STRING, n_rows BIGINT, col STRING, type STRING, " +
          "min BIGINT, max BIGINT, min_str STRING, max_str STRING"))
  }

  /** Metadata-only aggregate state for the LIVE view, when the sidecar
    * can answer for it EXACTLY: total row count plus, per stats
    * column, (kind, folded min, folded max). None whenever any row the
    * view serves is not described by the sidecar — merge-on-read
    * overlay (vector/delta/exclusions), pending schema map, access
    * policies (row filter changes the count; masks change values), or
    * simply no sidecar. All-null files contribute their n but no
    * bounds, exactly like Min/Max ignore nulls. This is the state the
    * [[graft.plans.StatsAggRewrite]] optimizer rule folds
    * `SELECT min(x), max(x), count(*)` queries from — Delta's
    * metadata-only COUNT(*)/MIN/MAX optimization. */
  private[graft] def metadataAggregates(spark: SparkSession, root: String)
      : Option[(Long, Map[String, (String, Option[String], Option[String])])] = {
    val vOpt = VersionedParquet.currentVersion(spark, root)
    if (vOpt.isEmpty) return None
    if (VersionedParquet.hasPolicies(spark, root)) return None
    if (VersionedParquet.schemaMapOps(spark, root).nonEmpty) return None
    val snapshot = new org.apache.hadoop.fs.Path(root,
      VersionedParquet.versionName(vOpt.get))
    if (VersionedParquet.readPointer(spark,
        new org.apache.hadoop.fs.Path(snapshot,
          VersionedParquet.BASE_MARKER)).isDefined) return None
    loadStatRows(spark, snapshot.toString).flatMap { rows =>
      val allFiles = VersionedParquet.listDataFiles(spark, snapshot)
        .map(_._1).toSet
      val byFile = rows.groupBy(_.file)
      // every data file must be described, or a file the sidecar never
      // saw could hold the true min/max/rows
      if (byFile.keySet != allFiles) None
      else {
        val n = byFile.valuesIterator.map(_.head.n).sum
        val perCol = rows.groupBy(_.col).flatMap { case (c, rs) =>
          if (rs.map(_.file).toSet != allFiles) None
          else rs.map(_.kind).distinct match {
            // long ranges only: string per-file bounds compare in
            // java.lang.String order here but UTF8String BINARY order
            // in the engine — identical on ASCII, divergent beyond,
            // so strings stay scan-answered
            case Seq("L") =>
              val los = rs.flatMap(r => Option(r.lo)).map(_.toLong)
              val his = rs.flatMap(r => Option(r.hi)).map(_.toLong)
              Some(c -> ("L",
                if (los.isEmpty) None else Some(los.min.toString),
                if (his.isEmpty) None else Some(his.max.toString)))
            case _ => None // bloom/string/mixed stats: no ranges
          }
        }
        Some((n, perCol))
      }
    }
  }
}
