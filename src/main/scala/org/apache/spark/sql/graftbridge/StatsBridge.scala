package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStatistics,
  CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.classic.{Dataset,
  SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Bridge that exposes table-level statistics to Catalyst's planner
  * (`private[sql]` surface — same placement rationale as
  * [[FunctionBridge]]): rewrites the frame's base [[LogicalRelation]]
  * with a [[CatalogTable]] carrying [[CatalogStatistics]], which
  * `LogicalRelation.computeStats` prefers over the file-size fallback.
  *
  * Why it matters: a versioned table with deletion-vector masks (or
  * any masked/filtered scan) keeps its file bytes on disk while its
  * LIVE row set shrinks — the planner's file-size estimate then
  * overstates the relation and a broadcast-able dimension gets
  * planned as a shuffle join. ANALYZE output (exact live row counts)
  * is the honest estimate; this bridge is how it reaches
  * broadcast-vs-SMJ decisions.
  */
object StatsBridge {

  /** Return `df` with `sizeInBytes`/`rowCount` attached to the base
    * scan. With `rootPath` set, the target resolves BY PATH: among
    * the [[LogicalRelation]]s whose file-scan roots live under
    * `rootPath`, the LARGEST (by its own file-size estimate) is the
    * base snapshot by construction — auxiliary scans under the same
    * root (the `_dv` mask sidecar, delta overlays) and OTHER tables
    * in a join keep their own honest estimates, so two ANALYZEd
    * tables joined together each carry their own stats after two
    * calls, each landing on its own base scan. Without `rootPath`
    * the FIRST pre-order relation is assumed to be the base scan
    * (legacy behavior — position-dependent; prefer the path form).
    *
    * Returns the frame plus whether the stats actually LANDED on a
    * scan — a path-normalization or symlink mismatch between the
    * analyzed root and the scan's rootPaths would otherwise lose the
    * stats silently while the caller reports them applied. */
  def withTableStats(df: DataFrame, tableName: String,
                     sizeInBytes: BigInt,
                     rowCount: Option[BigInt],
                     rootPath: Option[String] = None)
      : (DataFrame, Boolean) = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    val stats = CatalogStatistics(sizeInBytes, rowCount)
    val wantPath = rootPath.map(p => new Path(p).toUri.getPath)
    def underRoot(lr: LogicalRelation): Boolean = lr.relation match {
      case fsRel: HadoopFsRelation =>
        val roots = fsRel.location.rootPaths
        roots.nonEmpty && roots.forall { r =>
          val p = r.toUri.getPath
          wantPath.exists(w => p == w || p.startsWith(w + "/"))
        }
      case _ => false
    }
    val analyzed = df.queryExecution.analyzed
    // resolve the target: path-matched largest scan, or first pre-order
    val target: Option[LogicalRelation] = wantPath match {
      case Some(_) =>
        val matched = analyzed.collect {
          case lr: LogicalRelation if underRoot(lr) => lr
        }
        if (matched.isEmpty) None
        else Some(matched.maxBy(_.relation.sizeInBytes))
      case None => analyzed.collectFirst { case lr: LogicalRelation => lr }
    }
    val plan = analyzed.transform {
      case lr: LogicalRelation if target.exists(_ eq lr) =>
        val ct = lr.catalogTable.getOrElse(
          CatalogTable(
            identifier = TableIdentifier(tableName),
            tableType = CatalogTableType.EXTERNAL,
            storage = CatalogStorageFormat.empty,
            schema = lr.schema,
            provider = Some("parquet")))
        lr.copy(catalogTable = Some(ct.copy(stats = Some(stats))))
    }
    (Dataset.ofRows(spark, plan), target.nonEmpty)
  }
}
