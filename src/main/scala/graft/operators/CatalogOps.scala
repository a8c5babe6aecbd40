package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{QueryDef, Tables}

/** S7 catalog introspection (reference
  * scripts/analysis/01_database_exploration.sql:16-30): list the
  * warehouse's tables, and the columns/types of each, AS QUERIES —
  * rendered from `spark.catalog` metadata after registering the testdata
  * tables as views, exactly what a user exploring the warehouse runs
  * first.
  *
  * The DuckDB oracle derives the same rows from its own introspection
  * (`DESCRIBE SELECT * FROM t`), with both engines' type names folded to
  * a shared vocabulary (int/bigint/double/string/date/timestamp/
  * array<float>) — the comparison checks real catalog agreement, not a
  * hardcoded schema list.
  */
object CatalogOps {

  /** Fold an engine type name into the shared vocabulary (Spark side:
    * catalog dataType strings are already lowercase simpleString forms —
    * only `integer` needs folding to `int`). */
  private def normalize(dt: String): String = dt.toLowerCase match {
    case "integer" => "int"
    case "timestamp_ntz" => "timestamp" // tz-less parquet micros; DuckDB's TIMESTAMP is also tz-less
    case t => t
  }

  /** DuckDB-side normalization of DESCRIBE's column_type. */
  private val NORM_SQL =
    """CASE column_type WHEN 'INTEGER' THEN 'int'
      |            WHEN 'BIGINT' THEN 'bigint'
      |            WHEN 'VARCHAR' THEN 'string'
      |            WHEN 'DOUBLE' THEN 'double'
      |            WHEN 'FLOAT' THEN 'float'
      |            WHEN 'TIMESTAMP' THEN 'timestamp'
      |            WHEN 'TIMESTAMP_NS' THEN 'timestamp'
      |            WHEN 'DATE' THEN 'date'
      |            WHEN 'FLOAT[]' THEN 'array<float>'
      |            ELSE lower(column_type) END""".stripMargin

  private def describeUnion(select: String): String =
    Tables.names.sorted.map(t =>
      s"SELECT '$t' AS table_name, $select FROM (DESCRIBE SELECT * FROM $t)")
      .mkString("\n  UNION ALL\n  ")

  /** Register every testdata table as a temp view (events through its
    * normalizing reader so the nano timestamp surfaces as `timestamp` —
    * the same folding DuckDB applies when it reads the file). */
  private def registerAll(s: SparkSession, d: String): Unit =
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(s, d) else Tables(s, d, n)
      df.createOrReplaceTempView(n)
    }

  val queries: Seq[QueryDef] = Seq(

    // ── S7a: list tables with their column counts ─────────────────────────
    QueryDef("q27_catalog_tables",
      (s, d) => {
        registerAll(s, d)
        import s.implicits._
        // collect() on the catalog's local dataset stays driver-side;
        // .count() would schedule one (trivial) Spark job per table —
        // measured 3x slower for a pure-metadata listing.
        Tables.names.sorted
          .map(n => (n, s.catalog.listColumns(n).collect().length.toLong))
          .toDF("table_name", "n_columns")
          .orderBy("table_name")
      },
      Some(s"""WITH cols AS (
             |  ${describeUnion("column_name")})
             |SELECT table_name, count(*) AS n_columns
             |FROM cols GROUP BY 1 ORDER BY table_name""".stripMargin)),

    // ── S7b: list columns + normalized types of every table ───────────────
    QueryDef("q28_catalog_columns",
      (s, d) => {
        registerAll(s, d)
        import s.implicits._
        Tables.names.sorted
          .flatMap(n => s.catalog.listColumns(n).collect()
            .map(c => (n, c.name, normalize(c.dataType))))
          .toDF("table_name", "column_name", "data_type")
          .orderBy("table_name", "column_name")
      },
      Some(s"""WITH cols AS (
             |  ${describeUnion("column_name, column_type")})
             |SELECT table_name, column_name,
             |       $NORM_SQL AS data_type
             |FROM cols
             |ORDER BY table_name, column_name""".stripMargin))
  )
}
