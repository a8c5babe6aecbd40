package graft.warehouse

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  Filter, PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types.StructType

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
class GraftSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft"

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

private[warehouse] class GraftRelation(ctx: SQLContext, root: String,
    version: Option[Long], asOf: Option[Long],
    chFrom: Option[Long] = None, chTo: Option[Long] = None,
    history: Boolean = false)
    extends BaseRelation with PrunedFilteredScan {

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
        val to = chTo.orElse(VersionedParquet.currentVersion(spark, root))
          .getOrElse(throw new java.io.IOException(
            s"no published version under $root"))
        VersionedParquet.changes(spark, root, from, to)
      case (None, Some(ts)) => VersionedParquet.readAsOf(spark, root, ts)
      case _ => VersionedParquet.read(spark, root, version)
    }

  override def sqlContext: SQLContext = ctx
  override lazy val schema: StructType = frame.schema

  // every filter re-applies above the scan — the MoR overlay must see
  // unfiltered rows for its (file, pos) anti-join to be sound
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    // one instantiation per scan: `frame` is a def (each call resolves
    // the CURRENT version fresh), so projection must bind to the same
    // instance it selects from
    val f = frame
    val pruned =
      if (requiredColumns.isEmpty) f
      else f.select(requiredColumns.map(f.col).toSeq: _*)
    pruned.rdd
  }
}
