package graft.warehouse

import java.io.IOException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hashing
import graft.operators.SketchOps

/** ANALYZE TABLE — one-pass, engine-portable column statistics, with
  * O(changes) incremental maintenance from the change feed.
  *
  * The warehouse staple behind query planning and data validation:
  * per column, row count, null count, an NDV estimate, and min/max.
  * All of it folds into ONE scan of the table: the scan melts the
  * analyzed columns to (column, value) pairs and aggregates to a
  * BOUNDED intermediate — (column, hll-bucket) cells, at most
  * columns × 65 rows regardless of table size — from which the
  * per-column row/null/min/max totals and the 64-register HLL NDV
  * estimate both fold. Nothing driver-side ever sees a data row, and
  * a 100 TB ANALYZE is exactly one pass + a K-row shuffle.
  *
  * The cell lattice is MERGEABLE for inserts — counts add, HLL
  * registers max-merge, min/max extend — so [[maintain]] advances
  * stored stats from the table's own CDF when every commit since the
  * last ANALYZE is insert-only: one pass over the INSERT BATCHES, not
  * the table, and the result is EXACTLY what a full re-ANALYZE would
  * produce (the merges are exact, not approximations of each other).
  * Deletes/updates make the lattice non-subtractable (registers and
  * min/max cannot un-see a value), so those ranges recompute honestly
  * — the same insert-only discipline DeltaSync applies to its mirror
  * paths.
  *
  * The NDV sketch is [[SketchOps]]' engine-portable HLL (md5-derived
  * 60-bit hash, 64 registers, precomputed linear-counting table), so
  * the estimate is bit-reproducible in DuckDB SQL — the q188/q194
  * gates pin every stat exactly, not "approximately".
  *
  * Supported columns are integers and strings (values hash and
  * render identically across engines; floating-point rendering does
  * not). min/max are reported on the STRING rendering
  * (lexicographic) — byte-comparable and engine-identical; numeric
  * range pruning has the per-file `FileStats` tier.
  *
  * Stats are stored version-stamped: a `_TABLE_STATS` marker (the
  * folded numbers) plus a `_TABLE_STATS_CELLS` marker (the mergeable
  * lattice [[maintain]] folds from) inside the analyzed snapshot
  * directory (atomic temp+rename install), so `DESCRIBE STATS` also
  * reports WHICH version the numbers describe — stale stats are
  * visible, never silently trusted.
  */
object Analyze {

  private[warehouse] val STATS_MARKER = "_TABLE_STATS"
  private[warehouse] val CELLS_MARKER = "_TABLE_STATS_CELLS"

  private def supportedCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == ShortType || f.dataType == ByteType ||
        f.dataType == StringType => f.name
    }.toSeq

  /** The one-pass kernel: (column, bucket) cells over `df`'s `cols` —
    * nulls pool in bucket −1 (they have no hash), value rows in their
    * HLL bucket with the register maximum, per-cell count and min/max
    * carried. ≤ |cols| × 65 rows regardless of |df|. */
  private def cellsOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val melted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("kv"))
      .select(col("kv.c").as("colname"), col("kv.v").as("v"))
    val h60 = Hashing.md5Long60(col("v"))
    melted
      .select(col("colname"), col("v"),
        when(col("v").isNull, lit(-1L))
          .otherwise(shiftright(h60, 54)).as("bucket"),
        when(col("v").isNull, lit(null).cast("long"))
          .otherwise(when(h60.bitwiseAND(lit((1L << 54) - 1)) === 0,
            lit(55)).otherwise(lit(55) - graft.functions.BinLength(
            h60.bitwiseAND(lit((1L << 54) - 1))))).as("rho"))
      .groupBy("colname", "bucket")
      .agg(count(lit(1)).as("n"), max(col("rho")).as("r"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }

  /** Fold a cell lattice to the per-column stats frame
    * (colname, n_rows, n_nulls, ndv_est, min_s, max_s). */
  private def statsOf(cells: DataFrame): DataFrame = {
    val base = cells.groupBy("colname")
      .agg(sum(col("n")).as("n_rows"),
        sum(when(col("bucket") === -1L, col("n")).otherwise(0L))
          .as("n_nulls"),
        min(col("min_v")).as("min_s"), max(col("max_v")).as("max_s"))
    val est = SketchOps.estimateOf(
      cells.filter(col("bucket") >= 0L).select("colname", "bucket", "r"),
      Seq("colname"))
      .select(col("colname"), col("hll_est").as("ndv_est"))
    base.join(est, Seq("colname"), "left")
      .select(col("colname"), col("n_rows"), col("n_nulls"),
        coalesce(col("ndv_est"), lit(0.0)).as("ndv_est"),
        col("min_s"), col("max_s"))
      .orderBy("colname")
  }

  // min/max are arbitrary user strings (tabs/newlines possible) —
  // base64 keeps the TSV markers torn-proof; "-" marks NULL
  private def enc(x: String): String =
    if (x == null) "-"
    else java.util.Base64.getEncoder.encodeToString(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private def dec(x: String): String =
    if (x == "-") null
    else new String(java.util.Base64.getDecoder.decode(x),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Install both markers at version `v`: the folded stats and the
    * mergeable cell lattice they folded from. Bounded driver state —
    * one row per column resp. per (column, bucket) cell. */
  private def writeMarkers(spark: SparkSession, root: String, v: Long,
                           statsRows: Array[Row],
                           cellRows: Array[Row]): Unit = {
    val verDir = new Path(root, VersionedParquet.versionName(v))
    val statsTxt = statsRows.map { r =>
      Seq(r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        enc(r.getString(4)), enc(r.getString(5))).mkString("\t")
    }.mkString("\n")
    val cellsTxt = cellRows.map { r =>
      Seq(r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) "-" else r.getLong(3).toString,
        enc(r.getString(4)), enc(r.getString(5))).mkString("\t")
    }.mkString("\n")
    VersionedParquet.installPointer(spark, verDir, STATS_MARKER, statsTxt)
    VersionedParquet.installPointer(spark, verDir, CELLS_MARKER, cellsTxt)
  }

  /** Compute (and store) stats for `columns` (default: every
    * supported column) of the LIVE version. Returns the stats frame:
    * (colname, n_rows, n_nulls, ndv_est, min_s, max_s). */
  def table(spark: SparkSession, root: String,
            columns: Seq[String] = Nil): DataFrame = {
    val v = VersionedParquet.currentVersion(spark, root).getOrElse(
      throw new IOException(s"nothing to analyze under $root"))
    val df = VersionedParquet.read(spark, root)
    val ok = supportedCols(df)
    val cols = if (columns.nonEmpty) columns else ok
    val bad = cols.filterNot(ok.contains)
    require(bad.isEmpty, s"cannot analyze ${bad.mkString(",")}: only " +
      "integer and string columns have engine-portable stats")
    val cells = cellsOf(df, cols)
      .persist() // bounded: |columns| × 65 rows, read by both folds
    val out = statsOf(cells)
    val rows = out.collect() // bounded: one row per analyzed column
    val cellRows = cells.collect()
    cells.unpersist()
    writeMarkers(spark, root, v, rows, cellRows)
    out
  }

  /** Advance stored stats to the live version from the change feed.
    *
    * Returns (stats frame, path): `"current"` — stats already
    * describe the live version, nothing to do; `"incremental"` —
    * every commit since the analyzed version is insert-only, so the
    * stored cell lattice merged with one pass over the INSERT BATCHES
    * (exactly equal to a full re-ANALYZE, at O(changes) cost);
    * `"recomputed"` — the range carries deletes/updates (or a
    * CDF-absent physical publish, or a schema change), so the table
    * re-analyzes honestly. */
  def maintain(spark: SparkSession,
               root: String): (DataFrame, String) = {
    val live = VersionedParquet.currentVersion(spark, root).getOrElse(
      throw new IOException(s"nothing to analyze under $root"))
    storedCells(spark, root) match {
      case None => (table(spark, root), "recomputed")
      case Some((vS, _, _)) if vS == live =>
        (stats(spark, root).get._2
          .select("colname", "n_rows", "n_nulls", "ndv_est",
            "min_s", "max_s"), "current")
      case Some((vS, cellsStored, colnames)) =>
        val insertsOnly =
          try {
            val feed = VersionedParquet.changes(spark, root, vS, live)
            val types = feed.select("_change_type").distinct()
              .collect().map(_.getString(0)).toSet
            // The schema gate is two-sided: every stored column must
            // still exist in the feed, AND no NEW supported column may
            // have appeared on the live frame — a column added since
            // the last ANALYZE has history the feed's tail can't see,
            // so merging would re-stamp stats at the live version
            // silently missing it (the docstring promises the result
            // is exactly a full re-ANALYZE; only the recompute path
            // can keep that promise after a widening schema change).
            val liveSupported =
              supportedCols(VersionedParquet.read(spark, root))
            if (types.subsetOf(Set("insert")) &&
                colnames.forall(feed.columns.contains) &&
                liveSupported.forall(colnames.contains))
              Some(feed.filter(col("_change_type") === "insert"))
            else None
          } catch { case _: IOException => None }
        insertsOnly match {
          case None => (table(spark, root), "recomputed")
          case Some(ins) =>
            val merged = cellsStored
              .unionByName(cellsOf(ins, colnames))
              .groupBy("colname", "bucket")
              .agg(sum("n").as("n"), max("r").as("r"),
                min("min_v").as("min_v"), max("max_v").as("max_v"))
              .persist()
            val out = statsOf(merged)
            val rows = out.collect()
            val cellRows = merged.collect()
            merged.unpersist()
            writeMarkers(spark, root, live, rows, cellRows)
            (out, "incremental")
        }
    }
  }

  /** The latest stored cell lattice: (version, cells frame, analyzed
    * column names) — None if the table was never analyzed with the
    * cell sidecar. */
  private def storedCells(spark: SparkSession, root: String)
      : Option[(Long, DataFrame, Seq[String])] = {
    val versions = VersionedParquet.versions(spark, root).sorted.reverse
    versions.iterator.map { v =>
      v -> VersionedParquet.readPointer(spark,
        new Path(new Path(root, VersionedParquet.versionName(v)),
          CELLS_MARKER))
    }.collectFirst { case (v, Some(content)) =>
      import spark.implicits._
      val rows = content.split('\n').filter(_.nonEmpty).toSeq.map { l =>
        val p = l.split('\t')
        (p(0), p(1).toLong, p(2).toLong,
          if (p(3) == "-") None else Some(p(3).toLong),
          dec(p(4)), dec(p(5)))
      }
      val df = rows.toDF("colname", "bucket", "n", "r_opt",
          "min_v", "max_v")
        .withColumn("r", col("r_opt")).drop("r_opt")
      (v, df, rows.map(_._1).distinct)
    }
  }

  /** Read the LIVE table with its stored ANALYZE statistics exposed
    * to Catalyst — the planning half of ANALYZE (q188 computes the
    * numbers; this is where they reach broadcast-vs-SMJ decisions).
    * Returns (frame, how): `"applied"` — the stats describe the live
    * version, so the base relation reports rowCount and a
    * rowCount-derived sizeInBytes instead of the file-size fallback
    * (a DV-masked table's files overstate its live rows — exactly the
    * case where the fallback mis-plans); `"stale"` — stats exist but
    * describe an older version, IGNORED (a stale row count could
    * under-plan a grown table; the honest fallback wins);
    * `"absent"` — never analyzed; `"unapplied"` — live stats exist
    * but no scan matched the analyzed root (the bridge reports
    * whether the rewrite landed; see StatsBridge). */
  def readAnalyzed(spark: SparkSession,
                   root: String): (DataFrame, String) = {
    val df = VersionedParquet.read(spark, root)
    val live = VersionedParquet.currentVersion(spark, root)
    stats(spark, root) match {
      case Some((v, st)) if live.contains(v) =>
        val top = st.agg(max("n_rows")).head()
        val rowCount = if (top.isNullAt(0)) 0L else top.getLong(0)
        // EstimationUtils' own row-size model: per-field default size
        // plus the 8-byte row overhead — the same arithmetic CBO uses
        // when it derives size from a row count
        val rowSize = df.schema.fields.map(_.dataType.defaultSize)
          .sum + 8
        val name = new Path(root).getName
        // match the base relation BY PATH (not pre-order position):
        // a join of two analyzed tables gets each side's own stats,
        // and an auxiliary scan planned leftmost can't steal them
        val rootP = new Path(root)
        val qualified = rootP
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .makeQualified(rootP).toString
        val (framed, landed) =
          org.apache.spark.sql.graftbridge.StatsBridge.withTableStats(
            df, name, BigInt(rowCount) * rowSize,
            Some(BigInt(rowCount)), Some(qualified))
        // "unapplied" over a false "applied": the stats exist and are
        // live, but no scan matched the analyzed root (path
        // normalization/symlink drift) — the caller must not believe
        // the planner saw them
        (framed, if (landed) "applied" else "unapplied")
      case Some(_) => (df, "stale")
      case None => (df, "absent")
    }
  }

  /** The stored stats, with the version they describe — None if the
    * table was never analyzed. Walks from the live version down so a
    * post-ANALYZE commit still surfaces the last (now stale) stats
    * with their honest version stamp. */
  def stats(spark: SparkSession,
            root: String): Option[(Long, DataFrame)] = {
    val versions = VersionedParquet.versions(spark, root).sorted.reverse
    versions.iterator.map { v =>
      v -> VersionedParquet.readPointer(spark,
        new Path(new Path(root, VersionedParquet.versionName(v)),
          STATS_MARKER))
    }.collectFirst { case (v, Some(content)) =>
      import spark.implicits._
      val rows = content.split('\n').filter(_.nonEmpty).toSeq.map { l =>
        val p = l.split('\t')
        (p(0), p(1).toLong, p(2).toLong, p(3).toDouble, dec(p(4)),
          dec(p(5)))
      }
      v -> rows.toDF("colname", "n_rows", "n_nulls", "ndv_est",
        "min_s", "max_s")
    }
  }
}
