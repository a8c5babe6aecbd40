package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStatistics,
  CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.classic.{Dataset,
  SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Bridge that exposes table-level statistics to Catalyst's planner
  * (`private[sql]` surface — same placement rationale as
  * [[FunctionBridge]]): rewrites the frame's BASE [[LogicalRelation]]
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

  /** Return `df` with `sizeInBytes`/`rowCount` attached to its FIRST
    * (pre-order) LogicalRelation — the base scan; auxiliary scans in
    * the same plan (deletion-vector files, delta overlays) keep their
    * own honest file-size estimates. */
  def withTableStats(df: DataFrame, tableName: String,
                     sizeInBytes: BigInt,
                     rowCount: Option[BigInt]): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    val stats = CatalogStatistics(sizeInBytes, rowCount)
    var applied = false
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !applied =>
        applied = true
        val ct = lr.catalogTable.getOrElse(
          CatalogTable(
            identifier = TableIdentifier(tableName),
            tableType = CatalogTableType.EXTERNAL,
            storage = CatalogStorageFormat.empty,
            schema = lr.schema,
            provider = Some("parquet")))
        lr.copy(catalogTable = Some(ct.copy(stats = Some(stats))))
    }
    Dataset.ofRows(spark, plan)
  }
}
