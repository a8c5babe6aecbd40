package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.QueryDef
import graft.operators.{BpeOps, CatalogOps, ClusterOps, CurationOps, DedupOps, EventOps, GraphOps, MultimodalOps, OlapOps, PqOps, ProfileOps, Relational, SampleOps, SimilarityOps, SketchOps, SqlSurfaceOps, TemporalOps, TextOps, VersionOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family in SURVEY.md §2 registers one or more QueryDefs
  * (Spark definition + DuckDB oracle, kept adjacent so names/types stay
  * aligned). `queries`/`oracleSql` are derived views of that single list.
  */
object SparkEntry {

  /** All registered query definitions, in inventory order. */
  def all: Seq[QueryDef] =
    Relational.queries ++ CatalogOps.queries ++ OlapOps.queries ++
      TextOps.queries ++ DedupOps.queries ++ SimilarityOps.queries ++
      EventOps.queries ++ TemporalOps.queries ++ SampleOps.queries ++
      CurationOps.queries ++ SketchOps.queries ++ MultimodalOps.queries ++
      ProfileOps.queries ++ SqlSurfaceOps.queries ++ VersionOps.queries ++
      BpeOps.queries ++ GraphOps.queries ++ ClusterOps.queries ++
      PqOps.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star-join revenue-by-nation aggregate (J3) — exercises scan,
    * broadcast joins, shuffle agg, and sort in one plan. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_star_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
