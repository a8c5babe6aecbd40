package graft.warehouse

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Hashing

/** Version-keyed query-result cache (the warehouse "result cache").
  *
  * Interactive dashboards re-run the same aggregate against tables
  * that change a few times a day; at 100 TB each re-run is a full
  * scan-and-shuffle for bytes that have not moved. Warehouses solve
  * this with a result cache keyed by (query, data version): a hit
  * serves O(result) bytes with ZERO base-table I/O, and any commit to
  * a dependency invalidates BY CONSTRUCTION because the cache key
  * embeds the dependency version vector — there is no TTL, no
  * staleness window, and no explicit invalidation call to forget.
  *
  * Key = md5(queryKey ++ (root, liveVersion) per dependency), where
  * liveVersion comes from [[VersionedParquet.currentVersion]] — the
  * committed pointer, never directory mtime. Entries live at
  * `cacheRoot/<keyHash>/<fingerprint>/` as plain parquet published
  * with [[AtomicParquet]]'s stage-then-swap, so a crashed fill never
  * leaves a half-entry (`_SUCCESS` is the visibility gate) and two
  * racing fills of the same fingerprint both write the same
  * deterministic bytes (last swap wins, readers see either complete
  * copy).
  *
  * Contract: `compute` must be a DETERMINISTIC function of the
  * dependencies' live versions — the same discipline every oracle
  * query in this repo already obeys. Nondeterministic queries (rand,
  * now()) must not be served through the cache.
  *
  * Eviction is per-queryKey and only ever deletes STALE entries
  * (fingerprint != the live one), keeping at most `maxStale` of them
  * for time-travel re-serves; a reader that raced eviction on a stale
  * snapshot simply recomputes. The live entry is never deleted.
  *
  * Scale shape: the cache stores results (group-cardinality-sized),
  * not inputs; a hit is one directory probe + an O(result) parquet
  * read; a miss adds one O(result) write after the query the caller
  * was going to run anyway.
  */
object ResultCache {

  /** A served result: the frame, whether it came from cache, and the
    * version-vector fingerprint it is stored under. */
  final case class Served(df: DataFrame, hit: Boolean, fingerprint: String)

  /** The cache key for `queryKey` against the CURRENT committed
    * versions of `deps` (each a [[VersionedParquet]] table root). An
    * unversioned/absent dependency participates as version -1 so a
    * later first publish still invalidates.
    *
    * The version pointer alone is NOT the whole read state: the
    * versionless table-level markers that change what a read RETURNS —
    * access policies (row filter / masks), metadata-only ADD COLUMN,
    * pending drop/rename maps, generation rules — mint no version, so
    * their content digests into the vector too. Without this, a result
    * computed before `SET MASK` would keep serving RAW values from the
    * cache after the policy landed (a governance hole, not just
    * staleness). */
  def fingerprint(spark: SparkSession, queryKey: String,
                  deps: Seq[String]): String = {
    val vec = deps.sorted.map { root =>
      val v = VersionedParquet.currentVersion(spark, root).getOrElse(-1L)
      val meta = Seq(VersionedParquet.POLICIES_EXT,
          VersionedParquet.SCHEMA_EXT, VersionedParquet.SCHEMA_MAP,
          VersionedParquet.SCHEMA_GEN)
        // Digest each marker as "<name>=<len>:<content>", joined with
        // newlines: boundaries are unambiguous by construction, so no
        // (marker, content) shuffle — nor marker content that happens
        // to contain a delimiter byte — can make two distinct states
        // collide and validate a stale cached result after a
        // policy/schema change.
        .map { m =>
          val c = VersionedParquet
            .readPointer(spark, new Path(root, m)).getOrElse("")
          s"$m=${c.length}:$c"
        }
        .mkString("\n")
      val metaFp = java.lang.Long.toUnsignedString(
        Hashing.md5Long60(meta.getBytes(StandardCharsets.UTF_8)), 16)
      s"${new Path(root).getName}@$v#$metaFp"
    }
    java.lang.Long.toUnsignedString(
      Hashing.md5Long60((queryKey + "|" + vec.mkString(","))
        .getBytes(StandardCharsets.UTF_8)), 16)
  }

  /** Serve `queryKey` from the cache, computing and filling on a miss.
    * `deps` are the versioned-table roots the query reads; the entry
    * is valid exactly while every dependency's live version is
    * unchanged. */
  def serve(spark: SparkSession, cacheRoot: String, queryKey: String,
            deps: Seq[String], maxStale: Int = 2)
           (compute: => DataFrame): Served = {
    val fp = fingerprint(spark, queryKey, deps)
    val keyDir = new Path(cacheRoot,
      java.lang.Long.toUnsignedString(Hashing.md5Long60(
        queryKey.getBytes(StandardCharsets.UTF_8)), 16))
    val fs = keyDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entry = new Path(keyDir, fp)
    if (fs.exists(new Path(entry, "_SUCCESS")))
      return Served(spark.read.parquet(entry.toString), hit = true, fp)
    val result = compute
    AtomicParquet.overwrite(result, entry.toString)
    evictStale(fs, keyDir, fp, maxStale)
    Served(spark.read.parquet(entry.toString), hit = false, fp)
  }

  /** Drop all but the newest `maxStale` NON-live entries under one
    * queryKey (ordered by fingerprint name — arbitrary but stable;
    * staleness, not recency, is the correctness property: a stale
    * entry can only ever be re-served by an explicit time-travel
    * caller, and such a caller recomputes if it loses the race). */
  private def evictStale(fs: org.apache.hadoop.fs.FileSystem,
                         keyDir: Path, liveFp: String,
                         maxStale: Int): Unit = {
    if (!fs.exists(keyDir)) return
    val stale = fs.listStatus(keyDir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName != liveFp)
      .map(_.getPath).sortBy(_.getName)
    stale.dropRight(maxStale).foreach(p => fs.delete(p, true))
  }

  /** Number of complete entries currently stored for `queryKey`. */
  def entryCount(spark: SparkSession, cacheRoot: String,
                 queryKey: String): Int = {
    val keyDir = new Path(cacheRoot,
      java.lang.Long.toUnsignedString(Hashing.md5Long60(
        queryKey.getBytes(StandardCharsets.UTF_8)), 16))
    val fs = keyDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(keyDir)) 0
    else fs.listStatus(keyDir).count(s => s.isDirectory &&
      fs.exists(new Path(s.getPath, "_SUCCESS")))
  }
}
