package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Right-to-be-forgotten across DERIVED state — the deletion a privacy
  * request actually requires: a document must disappear not only from
  * the corpus table but from every index built over it (the q79 MinHash
  * signature index, the q107 postings, feature tables), and a reader
  * joining corpus⋈index must never observe the half-forgotten state.
  *
  * Mechanism: resolve ONE consistent snapshot (WarehouseSnapshot), anti-
  * join every table that carries the key, and republish the whole set
  * under the NEXT manifest — one atomic pointer swap, so consumers see
  * pre-forget or post-forget, never a mix. 100 TB shape: each purge is a
  * key join (the forget set is request-sized — AQE broadcasts it);
  * partitioned tables prune to partitions that contain the keys; tables
  * without the key column republish by reference (same version — the
  * manifest re-points, no rewrite). Historical manifests still hold the
  * data until `keepSnapshots`+vacuum retire them — retention policy IS
  * the deletion deadline, which is why it is a parameter here.
  *
  * ForgetSpec proves: post-forget, no table in the live snapshot holds a
  * forgotten key, surviving rows are untouched, the purge is one
  * manifest increment, and `keepSnapshots = 1` leaves no historical
  * manifest resolving the forgotten rows.
  */
object Forget {

  /** Purge `keys` (a 1-column frame named `keyCol`) from every table of
    * the live snapshot at `root`; returns the new manifest number.
    * Tables that don't carry the key column are pinned into the new
    * manifest by reference — zero rewrite. */
  def forget(spark: SparkSession, root: String, keys: DataFrame,
             keyCol: String = "doc_id", keepSnapshots: Int = 1): Long = {
    val manifest = WarehouseSnapshot.currentManifest(spark, root).getOrElse(
      throw new java.io.IOException(s"no published snapshot under $root"))
    val versions = WarehouseSnapshot.tableVersions(spark, root, manifest)
    val snapshot = WarehouseSnapshot.readSnapshot(spark, root, Some(manifest))
    val (touched, untouched) = snapshot.toSeq.sortBy(_._1)
      .partition(_._2.columns.contains(keyCol))
    // Nothing in the snapshot carries the key column: the purge is a
    // no-op by construction — return the live manifest rather than
    // tripping publishAll's empty-tables require or churning a new
    // manifest that pins identical versions.
    if (touched.isEmpty) return manifest
    val purged = touched.map { case (name, df) =>
      name -> df.join(keys, Seq(keyCol), "left_anti")
    }
    // Re-apply each purged table's Hive partition layout (recovered
    // from the live snapshot's directory structure) so a partitioned
    // table — term-partitioned postings, say — keeps its pruning
    // layout across the purge-republish.
    val layouts = touched.flatMap { case (name, _) =>
      val cols = VersionedParquet.partitionColsOf(spark,
        s"$root/tables/$name", Some(versions(name)))
      if (cols.nonEmpty) Some(name -> cols) else None
    }.toMap
    WarehouseSnapshot.publishAll(purged, root,
      partitionCols = layouts,
      keepSnapshots = keepSnapshots,
      pinned = untouched.map { case (name, _) => name -> versions(name) }.toMap)
  }
}
