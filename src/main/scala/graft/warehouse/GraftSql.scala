package graft.warehouse

import java.io.IOException
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types.StructType

/** SQL-text surface for the lakehouse DML verbs — so a SQL-only client
  * (thrift server, notebook SQL cell) can drive UPDATE / DELETE /
  * INSERT INTO / MERGE against versioned tables without touching the
  * Scala API, the way q89/q90/q152 already prove for queries, kernels,
  * and the MV rewrite tier.
  *
  * Tables are REGISTERED by name → root path ([[GraftTables]]), the
  * session-scoped analogue of a catalog entry. Two activation paths,
  * one implementation:
  *
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` injects
  *    [[GraftSqlParser]], which intercepts the four DML verbs when
  *    (and only when) the target is a registered versioned table —
  *    every other statement delegates to Spark's parser untouched.
  *    The intercepted statement becomes a [[GraftDmlCommand]], an
  *    eagerly-executed command node, so plain `spark.sql("UPDATE …")`
  *    commits a new table version.
  *  - [[GraftSql.sql]] is the runtime entry for sessions built
  *    without the extension (the driver-built gate session): same
  *    parse, same routing, falling back to `spark.sql` for
  *    non-DML text.
  *
  * Each verb routes to the corresponding versioned-format write —
  * UPDATE → `updateWhere`, DELETE → `delete`, INSERT INTO →
  * `append`, MERGE → `merge`/`upsert`, plus the maintenance verbs
  * OPTIMIZE → `compact`, `VACUUM [RETAIN n VERSIONS]` → `vacuum`,
  * `RESTORE TABLE … TO VERSION|TIMESTAMP AS OF` → `restore`, and
  * `COPY INTO … FILEFORMAT = parquet|csv` → `copyInto` (idempotent
  * file-tracked ingestion) — so SQL callers get the same
  * O(changes) merge-on-read commits, CHECK enforcement, change feed,
  * and locking as Scala callers; nothing is reimplemented. The
  * supported MERGE shape is the upsert/delete idiom
  * (`WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`,
  * or `WHEN MATCHED THEN DELETE`), plus the full-sync form — the
  * upsert idiom with a trailing `WHEN NOT MATCHED BY SOURCE THEN
  * DELETE` (Delta's three-way merge: table rows absent from the
  * source are removed, so one statement makes the table exactly
  * mirror the source while keeping per-row change-feed history) —
  * plus the EXPLICIT-assignment form: `WHEN MATCHED THEN UPDATE SET
  * c = expr, …` with optional `WHEN NOT MATCHED THEN INSERT (cols)
  * VALUES (exprs)`, where expressions may reference both sides
  * through the statement's aliases (`t.cents + s.delta`). The change
  * set is computed from the live table INSIDE the writer lock
  * ([[VersionedParquet.mergeCompute]]), so the matched/unmatched
  * split can never race a concurrent commit. Omitting the INSERT
  * clause means source-only rows do not land (Delta's contract) in
  * both forms.
  */
object GraftTables {
  private val tables =
    new ConcurrentHashMap[String, (String, Int, Seq[String])]()

  /** Register `name` as the SQL identifier of the versioned table at
    * `root`. `keepVersions` is the retention every SQL-issued write
    * uses (a table-level policy, like a catalog property).
    * `keyCols`, when given, declare a UNIQUE KEY of the table — the
    * catalog property that routes SQL UPDATE/DELETE through the
    * OPTIMISTIC predicate-DML path (Optimistic.updateWhere /
    * deleteWhere): concurrent disjoint writers compose by rebase
    * instead of serializing on the writer lock. Without keys the
    * single-writer path serves, exactly as before. */
  def register(name: String, root: String, keepVersions: Int = 10,
               keyCols: Seq[String] = Nil): Unit =
    tables.put(name.toLowerCase, (root, keepVersions, keyCols))

  def rootOf(name: String): Option[(String, Int)] =
    Option(tables.get(name.toLowerCase)).map(t => (t._1, t._2))

  /** The declared unique key of `name`, empty when none declared. */
  def keysOf(name: String): Seq[String] =
    Option(tables.get(name.toLowerCase)).map(_._3).getOrElse(Nil)

  /** Every registered table name (lowercased), sorted — bounded
    * catalog metadata. */
  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    tables.keySet().asScala.toSeq.sorted
  }

  /** Forget the SQL identifier (DROP TABLE): metadata-only — the data
    * at the root is untouched and can be re-registered. */
  def unregister(name: String): Unit = { tables.remove(name.toLowerCase); () }

  def clear(): Unit = tables.clear()
}

/** Named SQL views over the GraftSql surface — the session-scoped
  * analogue of catalog views, exactly as [[GraftTables]] is for
  * tables. A view stores its DEFINITION TEXT, not a frozen plan:
  * every statement that references it re-resolves the definition
  * through [[GraftSql.sql]] right before running (see
  * `materializeViews`), so a view always serves the CURRENT version
  * of the tables under it — the semantics CREATE VIEW promises and a
  * create-time `createOrReplaceTempView` of a DataFrame would break
  * (it would freeze MoR overlays and registry state at creation).
  * Views may stack on views; resolution is cycle-guarded and refuses
  * loudly. */
object GraftViews {
  private val views = new ConcurrentHashMap[String, String]()

  private[warehouse] def put(name: String, definition: String): Unit =
    views.put(name.toLowerCase, definition)

  def definitionOf(name: String): Option[String] =
    Option(views.get(name.toLowerCase))

  private[warehouse] def remove(name: String): Boolean =
    views.remove(name.toLowerCase) != null

  /** (name, definition) pairs, name-sorted — the SHOW VIEWS frame. */
  def all: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    views.asScala.toSeq.sortBy(_._1)
  }

  def clear(): Unit = views.clear()
}

/** One parsed DML statement against a registered table. Predicates,
  * assignments, and source queries stay SQL TEXT — they re-enter the
  * engine through `expr(...)` / `spark.sql(...)`, so resolution,
  * typing, and codegen are Spark's own. */
private[graft] sealed trait GraftDml { def table: String }
private[graft] final case class SqlUpdate(table: String,
    sets: Seq[(String, String)], where: Option[String]) extends GraftDml
private[graft] final case class SqlDelete(table: String,
    where: String) extends GraftDml
private[graft] final case class SqlInsert(table: String,
    query: String) extends GraftDml
private[graft] final case class SqlMerge(table: String, source: String,
    keyCols: Seq[String], isDelete: Boolean,
    bySourceDelete: Boolean = false,
    insertUnmatched: Boolean = true) extends GraftDml
// MERGE with explicit per-column assignments: UPDATE SET c = expr, …
// and optional INSERT (cols) VALUES (exprs); expressions resolve over
// the aliased join of both sides (`t`.`s` default when no alias given).
private[graft] final case class SqlMergeAssign(table: String,
    tableAlias: String, source: String, sourceAlias: String,
    keyCols: Seq[String], sets: Seq[(String, String)],
    insert: Option[(Seq[String], Seq[String])]) extends GraftDml
private[graft] final case class SqlOptimize(table: String,
    zorder: Seq[String] = Nil) extends GraftDml
private[graft] final case class SqlCreateTable(table: String,
    location: String, query: String,
    partitionBy: Seq[String] = Nil) extends GraftDml
private[graft] final case class SqlDropTable(table: String)
    extends GraftDml
private[graft] final case class SqlVacuum(table: String,
    retain: Option[Int]) extends GraftDml
private[graft] final case class SqlAddColumn(table: String, col: String,
    typeDdl: String, default: Option[String]) extends GraftDml
private[graft] final case class SqlDropColumn(table: String,
    col: String) extends GraftDml
private[graft] final case class SqlRenameColumn(table: String,
    from: String, to: String) extends GraftDml
private[graft] final case class SqlAddConstraint(table: String,
    name: String, check: String) extends GraftDml
private[graft] final case class SqlDropConstraint(table: String,
    name: String) extends GraftDml
private[graft] final case class SqlAddGenerated(table: String,
    col: String, typeDdl: String, genExpr: String) extends GraftDml
private[graft] final case class SqlDescribe(table: String,
    kind: String) extends GraftDml // kind: "history" | "detail"
private[graft] final case class SqlClone(table: String, location: String,
    deep: Boolean, source: String) extends GraftDml
private[graft] final case class SqlGenerate(table: String)
    extends GraftDml // GENERATE MANIFEST (symlink_format_manifest)
private[graft] final case class SqlAnalyze(table: String,
    cols: Seq[String]) extends GraftDml // ANALYZE TABLE … COMPUTE STATISTICS
private[graft] final case class SqlDescribeStats(table: String)
    extends GraftDml // DESCRIBE STATS
private[graft] final case class SqlExportDelta(table: String,
    location: String) extends GraftDml // EXPORT ... TO DELTA
private[graft] final case class SqlExportIceberg(table: String,
    location: String) extends GraftDml // EXPORT ... TO ICEBERG
// Retention maintenance on EXPORT LOCATIONS (no registered table —
// the SQL-only client's half of q250/q257): EXPIRE ICEBERG keeps the
// last K snapshots and sweeps orphans; CHECKPOINT/VACUUM DELTA seal
// the log and sweep it. `table` is empty by construction.
private[graft] final case class SqlExpireIceberg(location: String,
    keep: Int) extends GraftDml { val table = "" }
private[graft] final case class SqlCheckpointDelta(location: String)
    extends GraftDml { val table = "" }
private[graft] final case class SqlVacuumDelta(location: String)
    extends GraftDml { val table = "" }
private[graft] final case class SqlPurgeDelta(location: String)
    extends GraftDml { val table = "" }
private[graft] final case class SqlSetRowFilter(table: String,
    filter: String) extends GraftDml // ALTER TABLE … SET ROW FILTER
private[graft] final case class SqlDropRowFilter(table: String)
    extends GraftDml
private[graft] final case class SqlSetMask(table: String, col: String,
    mask: String) extends GraftDml // ALTER COLUMN … SET MASK
private[graft] final case class SqlDropMask(table: String,
    col: String) extends GraftDml
private[graft] final case class SqlCreateBranch(table: String,
    branch: String) extends GraftDml // ALTER TABLE … CREATE BRANCH
private[graft] final case class SqlFastForward(table: String,
    branch: String) extends GraftDml
private[graft] final case class SqlDropBranch(table: String,
    branch: String) extends GraftDml
private[graft] final case class SqlSetLayout(table: String,
    cols: Seq[String]) extends GraftDml // ALTER TABLE … SET PARTITION LAYOUT
private[graft] final case class SqlDropLayout(table: String)
    extends GraftDml
private[graft] final case class SqlMaintainStats(table: String)
    extends GraftDml // ANALYZE TABLE … MAINTAIN STATISTICS
private[graft] final case class SqlDescribeBranches(table: String)
    extends GraftDml
// RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS OF '…' —
// Delta's own rollback verb, routed to the metadata-only restore
// (q147): exactly one of the two pins is set.
private[graft] final case class SqlRestore(table: String,
    toVersion: Option[Long], toMillis: Option[Long]) extends GraftDml
// COPY INTO t FROM '…' FILEFORMAT = parquet|csv [FORMAT_OPTIONS
// ('k'='v', …)] [COPY_OPTIONS ('force'='true')] — idempotent
// file-tracked bulk ingestion; force reloads regardless of the log
// (Delta's escape hatch after a TRUNCATE/RESTORE emptied the table
// but the log still remembers the files).
private[graft] final case class SqlCopyInto(table: String, src: String,
    format: String, options: Map[String, String],
    force: Boolean = false) extends GraftDml
// ALTER TABLE t ADD COLUMN c BIGINT GENERATED ALWAYS AS IDENTITY —
// writer-assigned monotonic unique ids (empty-table declaration).
private[graft] final case class SqlAddIdentity(table: String,
    col: String) extends GraftDml
// INSERT OVERWRITE [TABLE] t SELECT … — wholesale versioned replace
// (the reference's truncate-and-reload, minus the data loss: the old
// version stays time-travelable).
private[graft] final case class SqlInsertOverwrite(table: String,
    query: String) extends GraftDml
// TRUNCATE TABLE t — a new EMPTY version in the table's schema.
private[graft] final case class SqlTruncate(table: String)
    extends GraftDml
// ALTER TABLE t SET TBLPROPERTIES ('k'='v', …) — upsert into the
// table-level property map (VersionedParquet._TBLPROPERTIES).
private[graft] final case class SqlSetProps(table: String,
    props: Map[String, String]) extends GraftDml
// ALTER TABLE t UNSET TBLPROPERTIES ('k', …) — absent keys refuse.
private[graft] final case class SqlUnsetProps(table: String,
    keys: Seq[String]) extends GraftDml
// SHOW TBLPROPERTIES t — (key, value) rows, key-sorted.
private[graft] final case class SqlShowProps(table: String)
    extends GraftDml
// SHOW PARTITIONS t — one row per live partition in Hive path form
// (`prio=1-URGENT`, nested cols `/`-joined); refuses on an
// unpartitioned table (Delta's own contract).
private[graft] final case class SqlShowPartitions(table: String)
    extends GraftDml
// SHOW CREATE TABLE t — the reconstructed DDL (columns, identity,
// partition layout, named constraints, properties).
private[graft] final case class SqlShowCreate(table: String)
    extends GraftDml
// CREATE [OR REPLACE] VIEW v AS SELECT … / DROP VIEW v / SHOW VIEWS —
// the GraftViews registry verbs; `table` is the view name (never a
// registered table — creation refuses the collision).
private[graft] final case class SqlCreateView(table: String,
    orReplace: Boolean, query: String) extends GraftDml
private[graft] final case class SqlDropView(table: String)
    extends GraftDml
private[graft] final case class SqlShowViews() extends GraftDml {
  val table = ""
}

object GraftSql {

  /** Recognize one of the DML/maintenance verbs against a REGISTERED
    * table; None for everything else (the caller falls through to
    * Spark). Matching is shape-first, registry-second: an UPDATE
    * against an unregistered name is NOT ours — it falls through and
    * fails in Spark's analyzer like any unknown table. Keyword
    * detection is textual: a string literal containing ` WHERE ` /
    * ` AND ` inside an assignment or ON clause mis-splits — the
    * mis-split reaches `expr(...)`, which fails LOUDLY at parse time
    * (never silent wrong results). */
  private[graft] def parseDml(text: String): Option[GraftDml] = {
    val t = text.trim.stripSuffix(";").trim
    val U = """(?is)UPDATE\s+([A-Za-z_][\w]*)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?""".r
    val D = """(?is)DELETE\s+FROM\s+([A-Za-z_][\w]*)\s+WHERE\s+(.+)""".r
    val I = """(?is)INSERT\s+INTO\s+([A-Za-z_][\w]*)\s+(SELECT\b.+|VALUES\b.+|TABLE\b.+)""".r
    val M = ("""(?is)MERGE\s+INTO\s+([A-Za-z_][\w]*)(?:\s+(?:AS\s+)?[\w]+)?""" +
      """\s+USING\s+\((.+)\)(?:\s+(?:AS\s+)?[\w]+)?\s+ON\s+(.+?)""" +
      """\s+WHEN\s+MATCHED\s+THEN\s+(UPDATE\s+SET\s+\*|DELETE)""" +
      """(\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*)?""" +
      """(\s+WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+DELETE)?\s*""").r
    // explicit-assignment MERGE (aliases CAPTURED — the assignment and
    // VALUES expressions resolve through them); `SET *` stays with M
    val MA = ("""(?is)MERGE\s+INTO\s+([A-Za-z_][\w]*)(?:\s+(?:AS\s+)?([\w]+))?""" +
      """\s+USING\s+\((.+)\)(?:\s+(?:AS\s+)?([\w]+))?\s+ON\s+(.+?)""" +
      """\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+((?!\*).+?)""" +
      """(?:\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*\(([^)]+)\)""" +
      """\s*VALUES\s*\((.+)\))?\s*""").r
    // maintenance verbs (Delta's OPTIMIZE / VACUUM surface)
    val O = """(?is)OPTIMIZE\s+([A-Za-z_][\w]*)(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?""".r
    val CT = ("""(?is)CREATE\s+TABLE\s+([A-Za-z_][\w]*)\s+(?:USING\s+graft\s+)?""" +
      """LOCATION\s+'([^']+)'""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?\s+AS\s+(SELECT\b.+)""").r
    val CL = ("""(?is)CREATE\s+TABLE\s+([A-Za-z_][\w]*)\s+(?:USING\s+graft\s+)?""" +
      """LOCATION\s+'([^']+)'\s+(SHALLOW|DEEP)\s+CLONE\s+([A-Za-z_][\w]*)""").r
    val DT = """(?is)DROP\s+TABLE\s+([A-Za-z_][\w]*)""".r
    val V = """(?is)VACUUM\s+([A-Za-z_][\w]*)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?""".r
    val A = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+ADD\s+COLUMN\s+""" +
      """([A-Za-z_][\w]*)\s+([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)""" +
      """(?:\s+DEFAULT\s+(.+))?""").r
    val AD = """(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+DROP\s+COLUMN\s+([A-Za-z_][\w]*)""".r
    val AR = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+RENAME\s+COLUMN\s+""" +
      """([A-Za-z_][\w]*)\s+TO\s+([A-Za-z_][\w]*)""").r
    val AC = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+ADD\s+CONSTRAINT\s+""" +
      """([A-Za-z_][\w]*)\s+CHECK\s*\((.+)\)""").r
    val AG = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+ADD\s+COLUMN\s+""" +
      """([A-Za-z_][\w]*)\s+([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)""" +
      """\s+GENERATED\s+ALWAYS\s+AS\s*\((.+)\)""").r
    val DC = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+DROP\s+""" +
      """CONSTRAINT\s+([A-Za-z_][\w]*)""").r
    val DH = """(?is)DESCRIBE\s+HISTORY\s+([A-Za-z_][\w]*)""".r
    val DD = """(?is)DESCRIBE\s+DETAIL\s+([A-Za-z_][\w]*)""".r
    // interop verbs: Delta's own GENERATE syntax, plus a full-snapshot
    // export into the open Delta log format
    val GM = ("""(?is)GENERATE\s+(?:symlink_format_manifest|MANIFEST)""" +
      """\s+FOR\s+TABLE\s+([A-Za-z_][\w]*)""").r
    val XD = ("""(?is)EXPORT\s+TABLE\s+([A-Za-z_][\w]*)\s+TO\s+DELTA""" +
      """\s+LOCATION\s+'([^']+)'""").r
    val XI = ("""(?is)EXPORT\s+TABLE\s+([A-Za-z_][\w]*)\s+TO\s+ICEBERG""" +
      """\s+LOCATION\s+'([^']+)'""").r
    val EI = ("""(?is)EXPIRE\s+ICEBERG\s+LOCATION\s+'([^']+)'""" +
      """\s+KEEP\s+(\d+)""").r
    val CD = """(?is)CHECKPOINT\s+DELTA\s+LOCATION\s+'([^']+)'""".r
    val VD = """(?is)VACUUM\s+DELTA\s+LOCATION\s+'([^']+)'""".r
    val PU = """(?is)PURGE\s+DELTA\s+LOCATION\s+'([^']+)'""".r
    val AN = ("""(?is)ANALYZE\s+TABLE\s+([A-Za-z_][\w]*)\s+COMPUTE\s+""" +
      """STATISTICS(?:\s+FOR\s+COLUMNS\s*\(([^)]+)\))?""").r
    val DS = """(?is)DESCRIBE\s+STATS\s+([A-Za-z_][\w]*)""".r
    // governance verbs (row filters / column masks) and WAP branching
    val RF = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+SET\s+ROW\s+""" +
      """FILTER\s*\((.+)\)""").r
    val RFD = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+DROP\s+ROW\s+""" +
      """FILTER""").r
    val MK = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+ALTER\s+""" +
      """COLUMN\s+([A-Za-z_][\w]*)\s+SET\s+MASK\s*\((.+)\)""").r
    val MKD = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+ALTER\s+""" +
      """COLUMN\s+([A-Za-z_][\w]*)\s+DROP\s+MASK""").r
    val CB = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+CREATE\s+""" +
      """BRANCH\s+([A-Za-z0-9_-]+)""").r
    val FF = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+FAST\s+""" +
      """FORWARD\s+BRANCH\s+([A-Za-z0-9_-]+)""").r
    val DB = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+DROP\s+""" +
      """BRANCH\s+([A-Za-z0-9_-]+)""").r
    val PL = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+SET\s+""" +
      """PARTITION\s+LAYOUT\s*\(([^)]+)\)""").r
    val PLD = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+DROP\s+""" +
      """PARTITION\s+LAYOUT""").r
    val AM = ("""(?is)ANALYZE\s+TABLE\s+([A-Za-z_][\w]*)\s+MAINTAIN\s+""" +
      """STATISTICS""").r
    val DBR = """(?is)DESCRIBE\s+BRANCHES\s+([A-Za-z_][\w]*)""".r
    // RESTORE TABLE (Delta's rollback verb; timestamps accept epoch
    // millis or any java.sql.Timestamp-parsable literal, the same
    // rule as the inline time-travel rewrite)
    val RSV = ("""(?is)RESTORE\s+TABLE\s+([A-Za-z_][\w]*)\s+TO\s+""" +
      """VERSION\s+AS\s+OF\s+(\d+)""").r
    val RST = ("""(?is)RESTORE\s+TABLE\s+([A-Za-z_][\w]*)\s+TO\s+""" +
      """TIMESTAMP\s+AS\s+OF\s+'([^']+)'""").r
    // COPY INTO (Delta's incremental-ingestion verb)
    val CP = ("""(?is)COPY\s+INTO\s+([A-Za-z_][\w]*)\s+FROM\s+""" +
      """'([^']+)'\s+FILEFORMAT\s*=\s*([A-Za-z]+)""" +
      """(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?""" +
      """(?:\s+COPY_OPTIONS\s*\(([^)]*)\))?""").r
    def optMap(raw: String): Map[String, String] =
      if (raw == null || raw.trim.isEmpty) Map.empty
      else {
        // scan for 'k'='v' pairs instead of splitting on commas: a
        // value may BE a comma ('sep'=',' is the most ordinary CSV
        // option there is)
        val pair = """'([^']*)'\s*=\s*'([^']*)'""".r
        val pairs = pair.findAllMatchIn(raw)
          .map(m => m.group(1) -> m.group(2)).toSeq
        // everything between pairs must be commas/space — anything
        // else is a malformed entry, refused loudly (never silently
        // dropped)
        val residue = pair.replaceAllIn(raw, "").replace(",", "").trim
        if (residue.nonEmpty)
          throw new IllegalArgumentException(
            s"malformed FORMAT_OPTIONS near '$residue' — use 'k'='v', …")
        pairs.toMap
      }
    val AI = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+ADD\s+""" +
      """COLUMN\s+([A-Za-z_][\w]*)\s+BIGINT\s+GENERATED\s+ALWAYS\s+""" +
      """AS\s+IDENTITY""").r
    val IO = ("""(?is)INSERT\s+OVERWRITE\s+(?:TABLE\s+)?""" +
      """([A-Za-z_][\w]*)\s+(SELECT\b.+)""").r
    val TR = """(?is)TRUNCATE\s+TABLE\s+([A-Za-z_][\w]*)""".r
    // table properties + catalog SHOW verbs
    val STP = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+SET\s+""" +
      """TBLPROPERTIES\s*\(([^)]*)\)""").r
    val UTP = ("""(?is)ALTER\s+TABLE\s+([A-Za-z_][\w]*)\s+UNSET\s+""" +
      """TBLPROPERTIES\s*\(([^)]*)\)""").r
    val SHP = """(?is)SHOW\s+TBLPROPERTIES\s+([A-Za-z_][\w]*)""".r
    val SPT = """(?is)SHOW\s+PARTITIONS\s+([A-Za-z_][\w]*)""".r
    val SCR = """(?is)SHOW\s+CREATE\s+TABLE\s+([A-Za-z_][\w]*)""".r
    // views (the GraftViews registry verbs)
    val CVW = ("""(?is)CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+""" +
      """([A-Za-z_][\w]*)\s+AS\s+(SELECT\b.+)""").r
    val DVW = """(?is)DROP\s+VIEW\s+([A-Za-z_][\w]*)""".r
    val SVW = """(?is)SHOW\s+VIEWS""".r
    val dml = t match {
      case STP(table, raw) => Some(SqlSetProps(table, optMap(raw)))
      case UTP(table, raw) =>
        val key = """'([^']*)'""".r
        val keys = key.findAllMatchIn(raw).map(_.group(1)).toSeq
        val residue = key.replaceAllIn(raw, "").replace(",", "").trim
        if (residue.nonEmpty)
          throw new IllegalArgumentException(
            s"malformed UNSET TBLPROPERTIES near '$residue' — " +
              "use ('k1', 'k2', …)")
        Some(SqlUnsetProps(table, keys))
      case SHP(table) => Some(SqlShowProps(table))
      case SPT(table) => Some(SqlShowPartitions(table))
      case SCR(table) => Some(SqlShowCreate(table))
      case CVW(orReplace, name, query) =>
        Some(SqlCreateView(name, orReplace != null, query.trim))
      case DVW(name) => Some(SqlDropView(name))
      case SVW() => Some(SqlShowViews())
      case CP(table, src, fmt, raw, copyRaw) =>
        val copyOpts = optMap(copyRaw)
        val unknown = copyOpts.keySet.map(_.toLowerCase) - "force"
        if (unknown.nonEmpty)
          throw new IllegalArgumentException(
            s"unsupported COPY_OPTIONS ${unknown.mkString(", ")} — " +
              "only 'force' is supported")
        val force = copyOpts.collectFirst {
          case (k, v) if k.equalsIgnoreCase("force") =>
            v.equalsIgnoreCase("true")
        }.getOrElse(false)
        Some(SqlCopyInto(table, src, fmt.toLowerCase, optMap(raw),
          force))
      case AI(table, colName) => Some(SqlAddIdentity(table, colName))
      case IO(table, query) => Some(SqlInsertOverwrite(table, query.trim))
      case TR(table) => Some(SqlTruncate(table))
      case RSV(table, v) => Some(SqlRestore(table, Some(v.toLong), None))
      case RST(table, raw) =>
        val millis =
          if (raw.nonEmpty && raw.forall(_.isDigit)) raw.toLong
          else java.sql.Timestamp.valueOf(raw).getTime
        Some(SqlRestore(table, None, Some(millis)))
      case AM(table) => Some(SqlMaintainStats(table))
      case DBR(table) => Some(SqlDescribeBranches(table))
      case PL(table, cols) => Some(SqlSetLayout(table,
        cols.split(",").map(_.trim).toSeq.filter(_.nonEmpty)))
      case PLD(table) => Some(SqlDropLayout(table))
      case RF(table, f) => Some(SqlSetRowFilter(table, f.trim))
      case RFD(table) => Some(SqlDropRowFilter(table))
      case MK(table, c, m) => Some(SqlSetMask(table, c, m.trim))
      case MKD(table, c) => Some(SqlDropMask(table, c))
      case CB(table, b) => Some(SqlCreateBranch(table, b))
      case FF(table, b) => Some(SqlFastForward(table, b))
      case DB(table, b) => Some(SqlDropBranch(table, b))
      case M(table, source, on, matched, insertClause, bySource) =>
        val isDel = matched.trim.equalsIgnoreCase("DELETE")
        if (isDel && bySource != null)
          throw new IllegalArgumentException(
            "MERGE: WHEN MATCHED THEN DELETE cannot combine with WHEN " +
              "NOT MATCHED BY SOURCE THEN DELETE — that statement " +
              "deletes every row; use TRUNCATE TABLE if that is meant")
        // WHEN MATCHED THEN DELETE pairs the source's keys with the
        // table's rows; an INSERT clause on top would need the matched/
        // unmatched split resolved in one commit, which this executor
        // expresses as two statements — refuse rather than silently
        // ignore the clause (the old behavior)
        if (isDel && insertClause != null)
          throw new IllegalArgumentException(
            "MERGE: WHEN MATCHED THEN DELETE with WHEN NOT MATCHED " +
              "THEN INSERT is not supported as one statement here; " +
              "run the MERGE-delete, then INSERT INTO for the new rows")
        keyColsOf(on).map(keys => SqlMerge(table, source, keys, isDel,
          bySourceDelete = bySource != null,
          // Delta's contract: no INSERT clause means source-only rows
          // are NOT inserted — matched rows update, nothing else lands
          insertUnmatched = isDel || insertClause != null))
      case MA(table, tA, source, sA, on, setsTxt, insCols, insVals) =>
        val sets = splitAssignments(setsTxt).map { case (c, e) =>
          (c.replaceFirst("^[\\w]+\\.", ""), e) }
        val insert = Option(insCols).map { cs =>
          val cols = cs.split(",").map(
            _.trim.replaceFirst("^[\\w]+\\.", "")).toSeq
          val vals = splitTopLevel(insVals).map(_.trim)
          require(cols.size == vals.size, s"MERGE INSERT names " +
            s"${cols.size} column(s) but VALUES carries ${vals.size}")
          (cols, vals)
        }
        keyColsOf(on).map(keys => SqlMergeAssign(table,
          Option(tA).getOrElse("t"), source, Option(sA).getOrElse("s"),
          keys, sets, insert))
      case U(table, sets, where) =>
        Some(SqlUpdate(table, splitAssignments(sets),
          Option(where).map(_.trim)))
      case D(table, where) => Some(SqlDelete(table, where.trim))
      case I(table, query) => Some(SqlInsert(table, query.trim))
      case CL(table, loc, kind, source) =>
        Some(SqlClone(table, loc, kind.equalsIgnoreCase("DEEP"), source))
      case CT(table, loc, pby, query) =>
        Some(SqlCreateTable(table, loc, query.trim,
          if (pby == null) Nil
          else pby.split(",").map(_.trim).toSeq.filter(_.nonEmpty)))
      case DT(table) => Some(SqlDropTable(table))
      case O(table, zcols) => Some(SqlOptimize(table,
        Option(zcols).map(_.split(",").map(_.trim).toSeq
          .filter(_.nonEmpty)).getOrElse(Nil)))
      case V(table, retain) =>
        Some(SqlVacuum(table, Option(retain).map(_.toInt)))
      case AG(table, colName, typeDdl, genExpr) =>
        Some(SqlAddGenerated(table, colName, typeDdl.trim, genExpr.trim))
      case A(table, colName, typeDdl, default) =>
        Some(SqlAddColumn(table, colName, typeDdl.trim,
          Option(default).map(_.trim)))
      case AD(table, colName) => Some(SqlDropColumn(table, colName))
      case AR(table, from, to) => Some(SqlRenameColumn(table, from, to))
      case AC(table, name, check) =>
        Some(SqlAddConstraint(table, name, check.trim))
      case DC(table, name) => Some(SqlDropConstraint(table, name))
      case DH(table) => Some(SqlDescribe(table, "history"))
      case DD(table) => Some(SqlDescribe(table, "detail"))
      case GM(table) => Some(SqlGenerate(table))
      case XD(table, loc) => Some(SqlExportDelta(table, loc))
      case XI(table, loc) => Some(SqlExportIceberg(table, loc))
      case EI(loc, keep) => Some(SqlExpireIceberg(loc, keep.toInt))
      case CD(loc) => Some(SqlCheckpointDelta(loc))
      case VD(loc) => Some(SqlVacuumDelta(loc))
      case PU(loc) => Some(SqlPurgeDelta(loc))
      case AN(table, cols) => Some(SqlAnalyze(table,
        Option(cols).map(_.split(",").map(_.trim).toSeq
          .filter(_.nonEmpty)).getOrElse(Nil)))
      case DS(table) => Some(SqlDescribeStats(table))
      case _ => None
    }
    dml.filter {
      case _: SqlCreateTable => true // registers itself at exec
      case c: SqlClone => GraftTables.rootOf(c.source).isDefined
      case _: SqlExpireIceberg | _: SqlCheckpointDelta |
           _: SqlVacuumDelta | _: SqlPurgeDelta =>
        true // location verbs: no table
      case _: SqlCreateView | _: SqlShowViews =>
        true // view registry verbs: no table
      case v: SqlDropView => GraftViews.definitionOf(v.table).isDefined
      case d => GraftTables.rootOf(d.table).isDefined
    }
  }

  /** `t.k1 = s.k1 AND t.k2 = s.k2` → Seq(k1, k2). Requires each
    * equality to name the SAME column on both sides (the upsert key
    * contract); anything else declines the statement. */
  private def keyColsOf(on: String): Option[Seq[String]] = {
    val eq = """(?i)\s*(?:[\w]+\.)?([\w]+)\s*=\s*(?:[\w]+\.)?([\w]+)\s*""".r
    val parts = on.split("(?i)\\s+AND\\s+").toSeq
    val keys = parts.map {
      case eq(a, b) if a.equalsIgnoreCase(b) => Some(a)
      case _ => None
    }
    if (keys.forall(_.isDefined)) Some(keys.flatten) else None
  }

  /** Split on top-level commas (parens and quotes respected — an
    * expression like `coalesce(a, b)` must not split inside the
    * call). Shared by assignment lists and MERGE's VALUES tuple. */
  private[graft] def splitTopLevel(s: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var start = 0
    s.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case ',' if !inStr && depth == 0 =>
          parts += s.substring(start, i); start = i + 1
        case _ => ()
      }
    }
    parts += s.substring(start)
    parts.result()
  }

  /** Split `a = e1, b = e2` on top-level commas. */
  private[graft] def splitAssignments(s: String): Seq[(String, String)] =
    splitTopLevel(s).map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"malformed assignment '$a'")
      (a.substring(0, i).trim, a.substring(i + 1).trim)
    }

  /** Execute one parsed DML against its registered table; returns the
    * published snapshot path. */
  private[graft] def exec(spark: SparkSession, dml: GraftDml): String = {
    dml match {
      case SqlCreateTable(table, loc, query, pby) =>
        // CTAS: the SQL-only client mints a table — fresh location,
        // register the identifier, publish the query result as v0
        // (PARTITIONED BY lays out Hive col=value dirs, the layout
        // every later INSERT OVERWRITE/TRUNCATE/compact preserves)
        require(GraftTables.rootOf(table).isEmpty,
          s"table $table is already registered")
        require(VersionedParquet.currentVersion(spark, loc).isEmpty,
          s"$loc already holds a versioned table")
        val result = spark.sql(query)
        pby.foreach(c => require(result.columns.exists(_.equalsIgnoreCase(c)),
          s"PARTITIONED BY column $c is not produced by the SELECT"))
        GraftTables.register(table, loc)
        return VersionedParquet.publish(result, loc,
          partitionCols = pby, keepVersions = 10)
      case SqlClone(table, loc, deep, source) =>
        // CLONE mints a table too: fresh location, registered source
        require(GraftTables.rootOf(table).isEmpty,
          s"table $table is already registered")
        val (srcRoot, keep) = GraftTables.rootOf(source).getOrElse(
          throw new IllegalStateException(
            s"clone source $source is not registered"))
        val out =
          if (deep) VersionedParquet.deepClone(spark, srcRoot, loc, keep)
          else VersionedParquet.shallowClone(spark, srcRoot, loc)
        GraftTables.register(table, loc, keep)
        return out
      case x: SqlExpireIceberg =>
        expireIcebergFrame(spark, x); return x.location
      case x: SqlCheckpointDelta =>
        checkpointDeltaFrame(spark, x); return x.location
      case x: SqlVacuumDelta =>
        vacuumDeltaFrame(spark, x); return x.location
      case x: SqlPurgeDelta =>
        purgeDeltaFrame(spark, x); return x.location
      case _ => ()
    }
    val (root, keep) = GraftTables.rootOf(dml.table).getOrElse(
      throw new IllegalStateException(
        s"table ${dml.table} is not registered"))
    dml match {
      case SqlUpdate(t, sets, where) =>
        // a declared unique key routes searched DML through the
        // optimistic path — concurrent disjoint UPDATEs compose
        val keys = GraftTables.keysOf(t)
        if (keys.nonEmpty)
          Optimistic.updateWhere(spark, root,
            where.map(expr).getOrElse(lit(true)),
            sets.map { case (c, e) => c -> expr(e) }.toMap,
            keys, keepVersions = keep).path
        else
          VersionedParquet.updateWhere(spark, root,
            where.map(expr).getOrElse(lit(true)),
            sets.map { case (c, e) => c -> expr(e) }.toMap,
            keepVersions = keep)
      case SqlDelete(t, where) =>
        val keys = GraftTables.keysOf(t)
        if (keys.nonEmpty)
          Optimistic.deleteWhere(spark, root, expr(where), keys,
            keepVersions = keep).path
        else
          VersionedParquet.delete(spark, root, expr(where),
            keepVersions = keep)
      case SqlInsert(_, query) =>
        VersionedParquet.append(spark, root, spark.sql(query),
          keepVersions = keep)
      case SqlMerge(_, source, keys, isDelete, bySourceDelete,
                    insertUnmatched) =>
        val src = spark.sql(source)
        if (isDelete)
          // WHEN MATCHED THEN DELETE: no upserts — an empty frame in
          // the TABLE's schema (the source may carry only key columns)
          VersionedParquet.merge(spark, root,
            VersionedParquet.read(spark, root).limit(0), src, keys,
            keepVersions = keep)
        else
          // full sync (bySourceDelete): upsert the source AND delete
          // every table key the source no longer carries, in one merge
          // commit — so the change feed records the drops as ordinary
          // deletes and the table mirrors the source exactly after.
          // Both the delete set and the update-only matched filter
          // resolve INSIDE the locked merge against the same version
          // the merge applies to — a plan-time read here could race a
          // concurrent commit and drop/keep the wrong rows.
          VersionedParquet.merge(spark, root, src,
            src.limit(0).select(keys.map(src(_)): _*), keys,
            keepVersions = keep,
            bySourceDelete = bySourceDelete,
            updateOnly = !insertUnmatched)
      case m: SqlMergeAssign =>
        import org.apache.spark.sql.functions.{col, expr, lit}
        val src = spark.sql(m.source)
        m.sets.foreach { case (c, _) =>
          require(!m.keyCols.exists(_.equalsIgnoreCase(c)),
            s"MERGE cannot UPDATE SET key column $c — the ON keys " +
              "identify the row being updated") }
        // the matched/unmatched split resolves against the LOCKED
        // live frame — a read here could race a concurrent commit
        VersionedParquet.mergeCompute(spark, root, m.keyCols,
          keepVersions = keep) { current =>
          val tCols = current.columns.toSeq
          val tTypes = current.schema
            .map(f => f.name.toLowerCase -> f.dataType).toMap
          m.insert.foreach { case (cols, _) =>
            cols.foreach(c => require(
              tCols.exists(_.equalsIgnoreCase(c)),
              s"MERGE INSERT names unknown column $c"))
            m.keyCols.foreach(k => require(
              cols.exists(_.equalsIgnoreCase(k)),
              s"MERGE INSERT must assign ON key column $k — an " +
                "unkeyed insert row has no merge identity")) }
          val t = current.alias(m.tableAlias)
          val sF = src.alias(m.sourceAlias)
          val cond = m.keyCols.map(k =>
            col(s"${m.tableAlias}.$k") === col(s"${m.sourceAlias}.$k"))
            .reduce(_ && _)
          // matched rows: the target row with assigned columns
          // replaced; expressions see BOTH sides through the aliases
          val updates = t.join(sF, cond, "inner").select(tCols.map { c =>
            m.sets.find(_._1.equalsIgnoreCase(c))
              .map { case (_, e) =>
                expr(e).cast(tTypes(c.toLowerCase)).as(c) }
              .getOrElse(col(s"${m.tableAlias}.$c").as(c))
          }: _*)
          val inserts = m.insert match {
            case None => updates.limit(0)
            case Some((cols, vals)) =>
              // source rows with no matching target key; unassigned
              // columns land NULL (Delta's INSERT-list contract)
              sF.join(t, cond, "left_anti").select(tCols.map { c =>
                cols.indexWhere(_.equalsIgnoreCase(c)) match {
                  case -1 => lit(null).cast(tTypes(c.toLowerCase)).as(c)
                  case i => expr(vals(i))
                    .cast(tTypes(c.toLowerCase)).as(c)
                }
              }: _*)
          }
          (updates.unionByName(inserts),
            current.limit(0).select(m.keyCols.map(current(_)): _*))
        }
      case SqlOptimize(_, Nil) =>
        VersionedParquet.compact(spark, root, keepVersions = keep)
      case SqlOptimize(_, zcols) =>
        FileStats.zorderOptimize(spark, root, zcols, keepVersions = keep)
      case SqlDropTable(table) =>
        GraftTables.unregister(table)
        root
      case SqlVacuum(_, retain) =>
        // retention resolution order: explicit RETAIN clause, then the
        // table's `graft.vacuum.retainVersions` property (the
        // catalog-level policy TBLPROPERTIES carries), then the
        // registration default — a malformed property value refuses
        // loudly instead of silently vacuuming at the default
        val propRetain = VersionedParquet.propertiesOf(spark, root)
          .get("graft.vacuum.retainVersions").map { v =>
            require(v.forall(_.isDigit) && v.nonEmpty && v.toInt > 0,
              s"graft.vacuum.retainVersions must be a positive " +
                s"integer, got '$v'")
            v.toInt
          }
        VersionedParquet.vacuum(spark, root,
          retain.orElse(propRetain).getOrElse(keep))
          .mkString(",")
      case SqlAddColumn(_, colName, typeDdl, default) =>
        VersionedParquet.addColumn(spark, root, colName, typeDdl,
          default.getOrElse("NULL"))
        root
      case SqlDropColumn(_, colName) =>
        VersionedParquet.dropColumn(spark, root, colName)
        root
      case SqlRenameColumn(_, from, to) =>
        VersionedParquet.renameColumn(spark, root, from, to)
        root
      case SqlAddConstraint(_, name, check) =>
        VersionedParquet.addConstraint(spark, root, name, check)
        root
      case SqlDropConstraint(_, name) =>
        VersionedParquet.dropConstraint(spark, root, name)
        root
      case SqlAddGenerated(_, colName, typeDdl, genExpr) =>
        VersionedParquet.addGeneratedColumn(spark, root, colName, typeDdl,
          genExpr)
        root
      case SqlSetProps(_, props) =>
        VersionedParquet.setProperties(spark, root, props)
        root
      case SqlUnsetProps(_, keys) =>
        VersionedParquet.unsetProperties(spark, root, keys)
        root
      case _: SqlShowProps | _: SqlShowPartitions | _: SqlShowCreate =>
        root // side-effect free; routed in sql()
      case _: SqlCreateView | _: SqlDropView | _: SqlShowViews =>
        throw new IllegalStateException(
          "view verbs route through GraftSql.sql / the parser commands")
      case _: SqlDescribe => root // side-effect free; routed in sql()
      case g: SqlGenerate => generateFrame(spark, g); root
      case x: SqlExportDelta => exportDeltaFrame(spark, x); root
      case x: SqlExportIceberg => exportIcebergFrame(spark, x); root
      case a: SqlAnalyze => analyzeFrame(spark, a); root
      case _: SqlDescribeStats => root // side-effect free; routed in sql()
      case SqlSetRowFilter(_, f) =>
        VersionedParquet.setRowFilter(spark, root, f); root
      case SqlDropRowFilter(_) =>
        VersionedParquet.dropRowFilter(spark, root); root
      case SqlSetMask(_, c, m) =>
        VersionedParquet.addMaskPolicy(spark, root, c, m); root
      case SqlDropMask(_, c) =>
        VersionedParquet.dropMaskPolicy(spark, root, c); root
      // WAP branching: CREATE BRANCH registers `<table>_branch_<name>`
      // so every DML verb drives the branch through the same machinery;
      // FAST FORWARD / DROP retire the identifier with the branch
      case SqlCreateBranch(tbl, b) =>
        val bRoot = Branch.create(spark, root, b)
        GraftTables.register(s"${tbl}_branch_$b", bRoot, keep)
        bRoot
      case SqlFastForward(tbl, b) =>
        Branch.fastForward(spark, root, b)
        GraftTables.unregister(s"${tbl}_branch_$b")
        root
      case SqlDropBranch(tbl, b) =>
        Branch.drop(spark, root, b)
        GraftTables.unregister(s"${tbl}_branch_$b")
        root
      case SqlSetLayout(_, cols) =>
        VersionedParquet.setPartitionLayout(spark, root, cols); root
      case SqlDropLayout(_) =>
        VersionedParquet.setPartitionLayout(spark, root, Nil); root
      case _: SqlMaintainStats =>
        Analyze.maintain(spark, root); root
      case _: SqlDescribeBranches => root // side-effect free; in sql()
      case r: SqlRestore => restoreExec(spark, r)._3
      case c: SqlCopyInto =>
        VersionedParquet.copyInto(spark, root, c.src, c.format,
          c.options, keep, force = c.force)
        root
      case SqlAddIdentity(_, colName) =>
        VersionedParquet.addIdentityColumn(spark, root, colName,
          keepVersions = keep)
        root
      case SqlInsertOverwrite(t, query) =>
        // the verb REPLACES rows, never the schema: the SELECT must
        // produce exactly the table's columns (any order), aligned
        // here — a typo'd alias or dropped column refuses loudly
        // instead of silently re-schema-ing the table (INSERT INTO's
        // own contract, applied to the overwrite)
        val incoming = spark.sql(query)
        val want = VersionedParquet.read(spark, root).columns.toSeq
        val haveCols = incoming.columns.toSeq
        if (haveCols.sorted != want.sorted)
          throw new IOException(s"INSERT OVERWRITE $t rejected: the " +
            s"SELECT produces columns ${haveCols.mkString(", ")} but " +
            s"the table has ${want.mkString(", ")}; OVERWRITE " +
            "replaces rows, not the schema — use a new publish for " +
            "schema changes")
        // both verbs replace ROWS only — the table's physical layout
        // (Hive partition dirs) carries through, same resolution
        // compact/OPTIMIZE uses; dropping it would silently degrade
        // partition pruning and DESCRIBE DETAIL on every later read
        VersionedParquet.publish(
          incoming.select(want.map(incoming(_)): _*), root,
          partitionCols = VersionedParquet.partitionColsOf(spark, root),
          keepVersions = keep)
      case _: SqlTruncate =>
        VersionedParquet.publish(
          VersionedParquet.read(spark, root).limit(0), root,
          partitionCols = VersionedParquet.partitionColsOf(spark, root),
          keepVersions = keep)
    }
  }

  /** `COPY INTO t FROM '…' FILEFORMAT = …` — one typed row:
    * (table, n_files_loaded, n_files_skipped, n_rows_inserted). */
  private[graft] def copyFrame(spark: SparkSession,
                               c: SqlCopyInto): DataFrame = {
    val (root, keep) = GraftTables.rootOf(c.table).getOrElse(
      throw new IllegalStateException(
        s"table ${c.table} is not registered"))
    val (nLoaded, nSkipped, nRows) = VersionedParquet.copyInto(
      spark, root, c.src, c.format, c.options, keep, force = c.force)
    import spark.implicits._
    Seq((c.table, nLoaded.toLong, nSkipped.toLong, nRows))
      .toDF("table", "n_files_loaded", "n_files_skipped",
        "n_rows_inserted")
  }

  /** Resolve and run one RESTORE TABLE statement: returns
    * (restored-to version, the new live version it landed as, the
    * snapshot path). Timestamp pins resolve through the exact
    * time-travel rules (`versionAsOf`); a no-op restore (already at
    * the target) reports the live version unchanged — the same
    * contract as the Scala API it routes to. */
  private def restoreExec(spark: SparkSession,
                          r: SqlRestore): (Long, Long, String) = {
    val (root, keep) = GraftTables.rootOf(r.table).getOrElse(
      throw new IllegalStateException(
        s"table ${r.table} is not registered"))
    val target = r.toVersion.getOrElse(
      VersionedParquet.versionAsOf(spark, root, r.toMillis.get))
    val path = VersionedParquet.restore(spark, root, target,
      keepVersions = keep)
    val live = VersionedParquet.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no live version under $root " +
        "after restore"))
    (target, live, path)
  }

  /** `RESTORE TABLE t TO VERSION|TIMESTAMP AS OF …` — one typed row:
    * (table, restored_to, new_version). */
  private[graft] def restoreFrame(spark: SparkSession,
                                  r: SqlRestore): DataFrame = {
    val (target, live, _) = restoreExec(spark, r)
    import spark.implicits._
    Seq((r.table, target, live))
      .toDF("table", "restored_to", "new_version")
  }

  /** Runtime SQL entry: DML against registered tables routes to the
    * versioned format; everything else is plain `spark.sql`. The
    * same statements work via `spark.sql(...)` directly on sessions
    * built with `spark.sql.extensions=graft.plans.GraftExtensions`
    * (see [[GraftSqlParser]]). */
  def sql(spark: SparkSession, text: String): DataFrame =
    parseDml(text) match {
      case Some(d: SqlDescribe) => describeFrame(spark, d)
      case Some(g: SqlGenerate) => generateFrame(spark, g)
      case Some(x: SqlExportDelta) => exportDeltaFrame(spark, x)
      case Some(x: SqlExportIceberg) => exportIcebergFrame(spark, x)
      case Some(x: SqlExpireIceberg) => expireIcebergFrame(spark, x)
      case Some(x: SqlCheckpointDelta) => checkpointDeltaFrame(spark, x)
      case Some(x: SqlVacuumDelta) => vacuumDeltaFrame(spark, x)
      case Some(x: SqlPurgeDelta) => purgeDeltaFrame(spark, x)
      case Some(a: SqlAnalyze) => analyzeFrame(spark, a)
      case Some(ds: SqlDescribeStats) => statsFrame(spark, ds)
      case Some(m: SqlMaintainStats) => maintainFrame(spark, m)
      case Some(b: SqlDescribeBranches) => branchesFrame(spark, b)
      case Some(r: SqlRestore) => restoreFrame(spark, r)
      case Some(c: SqlCopyInto) => copyFrame(spark, c)
      case Some(p: SqlShowProps) => showPropsFrame(spark, p)
      case Some(p: SqlShowPartitions) => showPartitionsFrame(spark, p)
      case Some(p: SqlShowCreate) => showCreateFrame(spark, p)
      case Some(v: SqlCreateView) => createViewFrame(spark, v)
      case Some(v: SqlDropView) => dropViewFrame(spark, v)
      case Some(_: SqlShowViews) => showViewsFrame(spark)
      case Some(dml) => exec(spark, dml); spark.emptyDataFrame
      // same inline time-travel rewrite as the injected parser, so the
      // library-call path (`GraftSql.sql`) and the parser-extension
      // path accept identical statements; registered views the
      // statement references re-materialize first (query-time
      // resolution — the CREATE VIEW contract)
      case None =>
        materializeViews(spark, text)
        spark.sql(rewriteTimeTravel(spark, text))
    }

  /** Stats surfaces serve raw per-column min/max (actual data values,
    * e.g. a masked column's real ids) and counts that include
    * filter-withheld rows — on a policy-bearing table they would be a
    * governance side channel through the very SQL surface that
    * enforces the policies. Same refusal matrix as CDF, streaming,
    * manifest export and Delta export: refuse loudly, name the path. */
  private def requireNoPolicies(spark: SparkSession, root: String,
                                table: String, verb: String): Unit =
    require(!VersionedParquet.hasPolicies(spark, root),
      s"cannot $verb $table: row/column policies are active and " +
        "column stats (raw min/max, unfiltered counts) would bypass " +
        "them; drop the policies first or query the governed data")

  /** `ANALYZE TABLE t MAINTAIN STATISTICS` — advance stored stats
    * from the change feed (q194's `Analyze.maintain`); returns the
    * fresh stats with the path taken and the version they describe. */
  private[graft] def maintainFrame(spark: SparkSession,
                                   m: SqlMaintainStats): DataFrame = {
    val (root, _) = GraftTables.rootOf(m.table).getOrElse(
      throw new IllegalStateException(
        s"table ${m.table} is not registered"))
    requireNoPolicies(spark, root, m.table, "MAINTAIN STATISTICS on")
    val (df, path) = Analyze.maintain(spark, root)
    val v = VersionedParquet.currentVersion(spark, root).getOrElse(-1L)
    df.withColumn("path", org.apache.spark.sql.functions.lit(path))
      .withColumn("version", org.apache.spark.sql.functions.lit(v))
      .orderBy("colname")
  }

  /** `DESCRIBE BRANCHES t` — one row per live branch: name, fork
    * version, branch head version. */
  private[graft] def branchesFrame(spark: SparkSession,
                                   b: SqlDescribeBranches): DataFrame = {
    val (root, _) = GraftTables.rootOf(b.table).getOrElse(
      throw new IllegalStateException(
        s"table ${b.table} is not registered"))
    import scala.jdk.CollectionConverters._
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows =
      if (!fs.exists(rootPath)) Seq.empty[Row]
      else fs.listStatus(rootPath).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("_branch_"))
        .map(_.stripPrefix("_branch_")).sorted
        .flatMap { name =>
          val bRoot = Branch.branchRoot(root, name)
          VersionedParquet.currentVersion(spark, bRoot).map { head =>
            Row(name, Branch.forkVersion(spark, root, name), head)
          }
        }
    spark.createDataFrame(rows.asJava,
      StructType.fromDDL(
        "branch STRING, fork_version BIGINT, head_version BIGINT"))
  }

  private def rootOrFail(table: String): (String, Int) =
    GraftTables.rootOf(table).getOrElse(
      throw new IllegalStateException(s"table $table is not registered"))

  /** `SHOW TBLPROPERTIES t` — (key, value) rows, key-sorted. */
  private[graft] def showPropsFrame(spark: SparkSession,
                                    p: SqlShowProps): DataFrame = {
    val (root, _) = rootOrFail(p.table)
    import spark.implicits._
    VersionedParquet.propertiesOf(spark, root).toSeq.sortBy(_._1)
      .toDF("key", "value")
  }

  /** Spark's partition-dir escaping in reverse (%XX sequences) — the
    * dir-listing and scan-fallback paths must agree on the value
    * text. */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb.append(((Character.digit(s.charAt(i + 1), 16) << 4) +
          Character.digit(s.charAt(i + 2), 16)).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `SHOW PARTITIONS t` — one row per LIVE partition, Hive path form
    * (`prio=1-URGENT`, nested levels `/`-joined), sorted. Metadata
    * first: when the current snapshot lays its data out as col=value
    * directories (every partitioned COW publish), the answer is a
    * directory LISTING — no data scan, the property that matters at
    * 100 TB. A snapshot without the physical layout (merge-on-read
    * overlay, the flat empty publish TRUNCATE lands) falls back to a
    * distinct scan of the partition columns, which is also what makes
    * the result reflect live ROWS, not stale directories. Refuses on
    * an unpartitioned table (Delta's own contract). */
  private[graft] def showPartitionsFrame(spark: SparkSession,
                                         p: SqlShowPartitions): DataFrame = {
    val (root, _) = rootOrFail(p.table)
    val pcols = VersionedParquet.partitionColsOf(spark, root)
    require(pcols.nonEmpty,
      s"SHOW PARTITIONS ${p.table}: not a partitioned table")
    val v = VersionedParquet.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    val snap = new org.apache.hadoop.fs.Path(root, f"v$v%08d")
    val fs = snap.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // walk col=value levels; Nil the moment a level is missing its
    // directories (flat/MoR snapshot) → scan fallback below
    def walk(dir: org.apache.hadoop.fs.Path,
             cols: Seq[String]): Option[Seq[String]] = cols match {
      case Nil => Some(Seq(""))
      case c +: rest =>
        val kids = fs.listStatus(dir).toSeq.filter(st =>
          st.isDirectory && st.getPath.getName.startsWith(s"$c="))
        if (kids.isEmpty) None
        else {
          val sub = kids.map { st =>
            walk(st.getPath, rest).map(_.map { tail =>
              val seg = s"$c=" +
                unescapePathName(st.getPath.getName.drop(c.length + 1))
              if (tail.isEmpty) seg else s"$seg/$tail"
            })
          }
          if (sub.exists(_.isEmpty)) None else Some(sub.flatMap(_.get))
        }
    }
    import spark.implicits._
    val listed =
      if (fs.exists(snap)) walk(snap, pcols) else None
    val parts = listed.getOrElse {
      import org.apache.spark.sql.functions.{col => fcol}
      VersionedParquet.read(spark, root)
        .select(pcols.map(fcol): _*).distinct().collect().toSeq
        .map(r => pcols.zipWithIndex
          .map { case (c, i) => s"$c=${r.get(i)}" }.mkString("/"))
    }
    parts.sorted.toDF("partition")
  }

  /** `SHOW CREATE TABLE t` — the reconstructed DDL: columns (with
    * identity/generated annotations), partition layout, named CHECK
    * constraints, properties. LOCATION is deliberately omitted — it
    * is environment, not schema (DESCRIBE DETAIL serves it), and the
    * DDL stays portable across warehouses. One row: (tbl, ddl). */
  private[graft] def showCreateFrame(spark: SparkSession,
                                     p: SqlShowCreate): DataFrame = {
    val (root, _) = rootOrFail(p.table)
    val idCols = VersionedParquet.identityRules(spark, root)
      .map(_._1.toLowerCase).toSet
    val genRules = VersionedParquet.generationRules(spark, root)
      .map { case (c, e) => c.toLowerCase -> e }.toMap
    val cols = VersionedParquet.read(spark, root).schema.fields.map { f =>
      val base = s"  ${f.name} ${f.dataType.sql}"
      if (idCols.contains(f.name.toLowerCase))
        s"$base GENERATED ALWAYS AS IDENTITY"
      else genRules.get(f.name.toLowerCase)
        .map(e => s"$base GENERATED ALWAYS AS ($e)").getOrElse(base)
    }
    val cons = VersionedParquet.namedConstraints(spark, root)
      .map { case (n, c) => s"  CONSTRAINT $n CHECK ($c)" }
    val pcols = VersionedParquet.partitionColsOf(spark, root)
    val props = VersionedParquet.propertiesOf(spark, root)
    val ddl = s"CREATE TABLE ${p.table} (\n" +
      (cols ++ cons).mkString(",\n") + "\n) USING graft" +
      (if (pcols.nonEmpty) s"\nPARTITIONED BY (${pcols.mkString(", ")})"
       else "") +
      (if (props.nonEmpty)
        "\nTBLPROPERTIES (" + props.toSeq.sortBy(_._1)
          .map { case (k, v) => s"'$k'='$v'" }.mkString(", ") + ")"
       else "")
    import spark.implicits._
    Seq((p.table, ddl)).toDF("tbl", "ddl")
  }

  // ── views ───────────────────────────────────────────────────────────

  /** True iff `name` appears as a whole word in `text` (how a FROM
    * clause references a view). */
  private def referencesWord(text: String, name: String): Boolean =
    java.util.regex.Pattern
      .compile("(?i)\\b" + java.util.regex.Pattern.quote(name) + "\\b")
      .matcher(text).find()

  // On a parser-extension session, `spark.sql(defn)` below re-enters
  // GraftSqlParser.parsePlan, which calls materializeViews again with
  // a FRESH seen-set — on a registry cycle that resets the guard and
  // loops forever. The thread-local makes the re-entrant call a no-op:
  // the outer materialization already handled the nesting.
  private val materializing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  /** Re-materialize every registered view the statement references as
    * a Spark temp view, nested views first, cycle-guarded — called
    * right before the statement runs, so a view always resolves
    * against the CURRENT versions of the tables under it. Plan
    * construction only: no jobs run here. */
  private[graft] def materializeViews(spark: SparkSession,
                                      text: String): Unit = {
    if (materializing.get) return
    materializing.set(true)
    try materializeViewsRec(spark, text, Set.empty)
    finally materializing.set(false)
  }

  private def materializeViewsRec(spark: SparkSession, text: String,
                                  seen: Set[String]): Unit =
    GraftViews.all.foreach { case (name, defn) =>
      if (referencesWord(text, name)) {
        if (seen.contains(name))
          throw new IllegalStateException(
            s"view cycle through $name — a view cannot reference " +
              "itself, directly or transitively")
        materializeViewsRec(spark, defn, seen + name)
        spark.sql(rewriteTimeTravel(spark, pinTables(spark, defn)))
          .createOrReplaceTempView(name)
      }
    }

  /** A view definition references registered TABLES by their SQL
    * names; Spark's resolver needs those pinned as graft-source temp
    * views (the policy-enforcing serving path — a view is a query
    * surface, so masked/filtered reads apply exactly as they would on
    * the table itself). Returns `text` unchanged — the pins are the
    * side effect. */
  private def pinTables(spark: SparkSession, text: String): String = {
    GraftTables.names.foreach { t =>
      if (referencesWord(text, t))
        GraftTables.rootOf(t).foreach { case (root, _) =>
          spark.read.format("graft").load(root)
            .createOrReplaceTempView(t)
        }
    }
    text
  }

  /** `CREATE [OR REPLACE] VIEW v AS SELECT …` — validates the
    * definition resolves NOW (loud at create, not first read), then
    * registers it. One typed row: (view, n_cols, replaced). */
  private[graft] def createViewFrame(spark: SparkSession,
                                     v: SqlCreateView): DataFrame = {
    require(GraftTables.rootOf(v.table).isEmpty,
      s"CREATE VIEW ${v.table}: a registered TABLE already holds " +
        "that name")
    val existed = GraftViews.definitionOf(v.table).isDefined
    if (existed && !v.orReplace)
      throw new IllegalStateException(s"view ${v.table} already " +
        "exists — use CREATE OR REPLACE VIEW")
    require(!referencesWord(v.query, v.table),
      s"CREATE VIEW ${v.table}: the definition references the view " +
        "itself")
    materializeViews(spark, v.query)
    val nCols = spark.sql(rewriteTimeTravel(spark, pinTables(spark, v.query)))
      .schema.fields.length
    GraftViews.put(v.table, v.query)
    import spark.implicits._
    Seq((v.table, nCols, existed)).toDF("view", "n_cols", "replaced")
  }

  /** `DROP VIEW v` — unregisters the view and drops its last
    * materialized temp view. One typed row: (view, dropped). */
  private[graft] def dropViewFrame(spark: SparkSession,
                                   v: SqlDropView): DataFrame = {
    val removed = GraftViews.remove(v.table)
    if (!removed)
      throw new IllegalStateException(s"view ${v.table} does not exist")
    spark.catalog.dropTempView(v.table)
    import spark.implicits._
    Seq((v.table, removed)).toDF("view", "dropped")
  }

  /** `SHOW VIEWS` — (view, definition) rows, name-sorted. */
  private[graft] def showViewsFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    GraftViews.all.toDF("view", "definition")
  }

  /** `ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS (…)]` — one
    * scan, stats stored version-stamped (see [[Analyze]]); returns
    * the fresh stats with the analyzed version. */
  private[graft] def analyzeFrame(spark: SparkSession,
                                  a: SqlAnalyze): DataFrame = {
    val (root, _) = GraftTables.rootOf(a.table).getOrElse(
      throw new IllegalStateException(
        s"table ${a.table} is not registered"))
    requireNoPolicies(spark, root, a.table, "ANALYZE")
    val v = VersionedParquet.currentVersion(spark, root).getOrElse(-1L)
    Analyze.table(spark, root, a.cols)
      .withColumn("version", org.apache.spark.sql.functions.lit(v))
  }

  /** `DESCRIBE STATS t` — the stored stats with the version stamp
    * they describe (possibly behind the live version: staleness is
    * visible, never silently trusted). */
  private[graft] def statsFrame(spark: SparkSession,
                                ds: SqlDescribeStats): DataFrame = {
    val (root, _) = GraftTables.rootOf(ds.table).getOrElse(
      throw new IllegalStateException(
        s"table ${ds.table} is not registered"))
    requireNoPolicies(spark, root, ds.table, "DESCRIBE STATS on")
    val (v, df) = Analyze.stats(spark, root).getOrElse(
      throw new IllegalStateException(
        s"table ${ds.table} was never analyzed; run ANALYZE TABLE " +
          s"${ds.table} COMPUTE STATISTICS"))
    df.withColumn("version", org.apache.spark.sql.functions.lit(v))
      .orderBy("colname")
  }

  /** A multi-statement SQL transaction: every statement must be a
    * recognized DML/maintenance verb against a registered table, and
    * the group commits atomically through [[Txn]] — all the verbs'
    * versions land, or (failure anywhere, including a statement whose
    * predicate/source fails to resolve at run time) every touched
    * table rolls back to its pre-transaction version. The SQL-only
    * client's `BEGIN; …; COMMIT` — statements are passed as the batch,
    * the transaction bracket is the call itself.
    *
    * Statements parse UP FRONT (a typo aborts before any intent is
    * written); side effects happen inside the transaction's ops in
    * statement order. DDL (ALTER/constraints) is rejected — it lives
    * outside the version namespace, so it cannot roll back. */
  def transaction(spark: SparkSession, statements: Seq[String]): Unit = {
    require(statements.nonEmpty, "empty transaction")
    val dmls = statements.map { text =>
      parseDml(text).getOrElse(throw new IllegalArgumentException(
        "transaction statements must be graft DML against registered " +
          s"tables; not recognized: $text"))
    }
    dmls.foreach {
      case _: SqlUpdate | _: SqlDelete | _: SqlInsert | _: SqlMerge |
           _: SqlMergeAssign | _: SqlOptimize => ()
      case other => throw new IllegalArgumentException(
        s"only UPDATE/DELETE/INSERT/MERGE/OPTIMIZE can run inside a " +
          s"transaction; got: ${other.getClass.getSimpleName}")
    }
    Txn.commit(spark, dmls.map(d =>
      Txn.TxnOp(GraftTables.rootOf(d.table).getOrElse(
        throw new IllegalStateException(
          s"table ${d.table} is not registered"))._1,
        () => { exec(spark, d); () })))
  }

  /** `GENERATE MANIFEST FOR TABLE t` — q181's export surfaced to the
    * SQL-only client (Delta's own GENERATE verb); returns where the
    * manifest landed and what it names. */
  private[graft] def generateFrame(spark: SparkSession,
                                   g: SqlGenerate): DataFrame = {
    val (root, keep) = GraftTables.rootOf(g.table).getOrElse(
      throw new IllegalStateException(
        s"table ${g.table} is not registered"))
    val m = VersionedParquet.generateManifest(spark, root,
      partitionCols = VersionedParquet.partitionColsOf(spark, root),
      keepVersions = keep)
    val files = VersionedParquet.readManifest(spark, m)
    import spark.implicits._
    Seq((m, files.size.toLong,
      VersionedParquet.currentVersion(spark, root).getOrElse(-1L)))
      .toDF("manifest_path", "n_files", "version")
  }

  /** `EXPORT TABLE t TO DELTA LOCATION '…'` — full-snapshot export of
    * the live view into the open Delta log format (q184's writer
    * half); repeated exports append overwrite commits, so the Delta
    * side time-travels across them. */
  private[graft] def exportDeltaFrame(spark: SparkSession,
                                      x: SqlExportDelta): DataFrame = {
    val (root, _) = GraftTables.rootOf(x.table).getOrElse(
      throw new IllegalStateException(
        s"table ${x.table} is not registered"))
    require(!VersionedParquet.hasPolicies(spark, root),
      s"cannot EXPORT ${x.table} TO DELTA: row/column policies would " +
        "be bypassed by the foreign readers")
    val v = graft.sources.DeltaLite.export(spark,
      VersionedParquet.read(spark, root), x.location)
    val snap = graft.sources.DeltaLite.snapshot(spark, x.location)
    import spark.implicits._
    Seq((x.location, v, snap.files.size.toLong))
      .toDF("location", "delta_version", "n_files")
  }

  /** `EXPORT TABLE t TO ICEBERG LOCATION '…'` — full-snapshot export
    * of the live view as the next Iceberg snapshot (q212's writer
    * half); repeated exports append snapshots, so the Iceberg side
    * time-travels across them on snapshot boundaries. Same policy
    * refusal as the Delta export: a foreign reader sees raw files. */
  /** `EXPIRE ICEBERG LOCATION '…' KEEP n` — retention on an exported
    * Iceberg table (q250's expireSnapshots through the verb surface):
    * returns (location, n_expired, n_files_deleted, n_snapshots). */
  private[graft] def expireIcebergFrame(spark: SparkSession,
                                        x: SqlExpireIceberg): DataFrame = {
    val (expired, deleted) = graft.sources.IcebergLite
      .expireSnapshots(spark, x.location, x.keep)
    val left = graft.sources.IcebergLite
      .snapshotIds(spark, x.location).length.toLong
    import spark.implicits._
    Seq((x.location, expired.toLong, deleted.toLong, left))
      .toDF("location", "n_expired", "n_files_deleted", "n_snapshots")
  }

  /** `CHECKPOINT DELTA LOCATION '…'` — seal the export's log (q257's
    * first half): returns (location, checkpoint_version). */
  private[graft] def checkpointDeltaFrame(spark: SparkSession,
                                          x: SqlCheckpointDelta)
    : DataFrame = {
    val v = graft.sources.DeltaLite.checkpoint(spark, x.location)
    import spark.implicits._
    Seq((x.location, v)).toDF("location", "checkpoint_version")
  }

  /** `VACUUM DELTA LOCATION '…'` — sweep the export (q257 through the
    * verb surface): returns (location, n_files_deleted,
    * n_commits_truncated). */
  private[graft] def vacuumDeltaFrame(spark: SparkSession,
                                      x: SqlVacuumDelta): DataFrame = {
    val (files, commits) = graft.sources.DeltaLite.vacuum(spark, x.location)
    import spark.implicits._
    Seq((x.location, files.toLong, commits.toLong))
      .toDF("location", "n_files_deleted", "n_commits_truncated")
  }

  /** `PURGE DELTA LOCATION '…'` — rewrite every DV-masked file with
    * its deleted rows physically dropped (Delta's REORG … APPLY
    * (PURGE)), the pre-step that lets CHECKPOINT/VACUUM retire the
    * masks' blobs: returns (location, n_files_rewritten,
    * n_rows_purged). */
  private[graft] def purgeDeltaFrame(spark: SparkSession,
                                     x: SqlPurgeDelta): DataFrame = {
    val (files, rows) =
      graft.sources.DeltaLite.purgeDeletionVectors(spark, x.location)
    import spark.implicits._
    Seq((x.location, files.toLong, rows))
      .toDF("location", "n_files_rewritten", "n_rows_purged")
  }

  private[graft] def exportIcebergFrame(spark: SparkSession,
                                        x: SqlExportIceberg): DataFrame = {
    val (root, _) = GraftTables.rootOf(x.table).getOrElse(
      throw new IllegalStateException(
        s"table ${x.table} is not registered"))
    require(!VersionedParquet.hasPolicies(spark, root),
      s"cannot EXPORT ${x.table} TO ICEBERG: row/column policies " +
        "would be bypassed by the foreign readers")
    // overwrite = true: each export snapshot REPLACES the live table
    // state (prior files land as status=2 deleted entries) while
    // earlier snapshots stay pinnable — matching EXPORT TO DELTA's
    // removePrior semantics. Append mode here would leave every prior
    // export's files live, so a foreign reader of the current snapshot
    // would see duplicated and resurrected-deleted rows.
    val snapId = graft.sources.IcebergLite.export(spark,
      VersionedParquet.read(spark, root), x.location, overwrite = true)
    val snap = graft.sources.IcebergLite.snapshot(spark, x.location)
    import spark.implicits._
    Seq((x.location, snapId, snap.files.size.toLong))
      .toDF("location", "snapshot_id", "n_files")
  }

  /** DESCRIBE HISTORY / DESCRIBE DETAIL as frames — the SQL-only
    * client's introspection surface. HISTORY is the graft source's
    * commit-log view (version, commit_millis, domain — one metadata
    * row per version, never a data scan); DETAIL is one row of
    * table-level metadata: location, live version, version count,
    * partition layout, named CHECK constraints, generated columns,
    * and still-virtual extension columns. */
  private[graft] def describeFrame(spark: SparkSession,
                                   d: SqlDescribe): DataFrame = {
    val (root, _) = GraftTables.rootOf(d.table).getOrElse(
      throw new IllegalStateException(
        s"table ${d.table} is not registered"))
    if (d.kind == "history")
      spark.read.format("graft").option("history", "true").load(root)
    else {
      import spark.implicits._
      val live = VersionedParquet.currentVersion(spark, root)
        .getOrElse(-1L)
      val nVersions = VersionedParquet.versions(spark, root).length.toLong
      Seq((root, live, nVersions,
        VersionedParquet.partitionColsOf(spark, root).mkString(","),
        VersionedParquet.namedConstraints(spark, root).map(_._1)
          .mkString(","),
        VersionedParquet.generationRules(spark, root).map(_._1)
          .mkString(","),
        VersionedParquet.schemaExtensions(spark, root).map(_._1)
          .mkString(","),
        // identity columns with their high-water marks (col:next) —
        // the introspection a SQL-only client needs to know which
        // columns the writer owns and where the id block stands
        VersionedParquet.identityRules(spark, root)
          .map { case (n, next) => s"$n:$next" }.mkString(",")))
        .toDF("location", "version", "num_versions", "partition_columns",
          "constraints", "generated_columns", "extension_columns",
          "identity_columns")
    }
  }

  /** SQL inline time travel: rewrite `t FOR VERSION AS OF 3` /
    * `t FOR TIMESTAMP AS OF '…'` (with `t` a REGISTERED graft table)
    * into a reference to a pinned temp view resolving through the same
    * `versionAsOf`/`timestampAsOf` GraftSource read path as
    * `CREATE TEMPORARY VIEW … USING graft OPTIONS (versionAsOf …)`
    * (q161's idiom) — so SQL clients pin versions inline, the Delta
    * way, without the explicit view step. Names NOT in the registry
    * pass through untouched and meet Spark's analyzer as usual; a pin
    * outside the published range fails loudly at issue time through
    * the read path's own validation. The pinned view name is
    * deterministic per (table, pin), so repeated queries reuse it and
    * `t FOR VERSION AS OF 2` in two statements is one view. Timestamps
    * accept epoch millis or any `java.sql.Timestamp`-parsable literal
    * (`'2026-01-01 00:00:00'`). */
  private[graft] def rewriteTimeTravel(text: String): String =
    rewriteTimeTravel(SparkSession.active, text)

  /** Positions inside single-quoted string literals ('' escapes),
    * double-quoted identifiers, `--` line comments, and bracketed
    * comments — the regions a raw-text rewriter must never touch
    * (a table name followed by `FOR VERSION AS OF n` INSIDE a string
    * literal is data, and rewriting it would corrupt an INSERT). */
  private def maskedRegions(text: String): Array[Boolean] = {
    val m = new Array[Boolean](text.length)
    var i = 0
    while (i < text.length) {
      text.charAt(i) match {
        case '\'' | '"' =>
          val quote = text.charAt(i)
          m(i) = true; i += 1
          var done = false
          while (i < text.length && !done) {
            m(i) = true
            if (text.charAt(i) == quote) {
              // '' inside a literal is an escaped quote, not a close
              if (i + 1 < text.length && text.charAt(i + 1) == quote) {
                m(i + 1) = true; i += 1
              } else done = true
            }
            i += 1
          }
        case '-' if i + 1 < text.length && text.charAt(i + 1) == '-' =>
          while (i < text.length && text.charAt(i) != '\n') {
            m(i) = true; i += 1
          }
        case '/' if i + 1 < text.length && text.charAt(i + 1) == '*' =>
          m(i) = true; m(i + 1) = true; i += 2
          while (i < text.length &&
              !(text.charAt(i - 1) == '*' && text.charAt(i) == '/')) {
            m(i) = true; i += 1
          }
          if (i < text.length) { m(i) = true; i += 1 }
        case _ => i += 1
      }
    }
    m
  }

  private[graft] def rewriteTimeTravel(spark: SparkSession,
                                       text: String): String = {
    if (!text.toUpperCase.contains(" AS OF")) return text
    val V = """(?i)\b([A-Za-z_][\w]*)\s+FOR\s+VERSION\s+AS\s+OF\s+(\d+)""".r
    val T =
      """(?i)\b([A-Za-z_][\w]*)\s+FOR\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'""".r
    // A match whose TABLE NAME starts inside a string literal or a
    // comment is data/commentary, not a time-travel clause — leave it
    // byte-for-byte alone. (The T pattern's trailing quoted timestamp
    // is of course itself a literal; only the match START is tested.)
    val masked = maskedRegions(text)
    def q(s: String) = java.util.regex.Matcher.quoteReplacement(s)
    def pin(table: String, opt: String, value: String,
            tag: String): Option[String] =
      GraftTables.rootOf(table).map { case (root, _) =>
        // Reserved namespace: a generated pin view can never clobber a
        // user temp view named after the table (the old ${table}__v0
        // shape was a plausible user name). Deterministic per
        // (table, pin), so repeated statements reuse one view.
        val view = s"graft_tt__${table}__$tag"
        spark.read.format("graft")
          .option("path", root).option(opt, value).load()
          .createOrReplaceTempView(view)
        view
      }
    val v1 = V.replaceAllIn(text, m =>
      if (masked(m.start)) q(m.matched)
      else q(pin(m.group(1), "versionAsOf", m.group(2), s"v${m.group(2)}")
        .getOrElse(m.matched)))
    // Re-mask: V replacements shift positions, so the mask must be
    // recomputed against v1's text before the T pass.
    val masked1 = maskedRegions(v1)
    T.replaceAllIn(v1, { m =>
      if (masked1(m.start)) q(m.matched)
      else {
        val raw = m.group(2)
        val millis =
          if (raw.nonEmpty && raw.forall(_.isDigit)) raw.toLong
          else java.sql.Timestamp.valueOf(raw).getTime
        q(pin(m.group(1), "timestampAsOf", millis.toString, s"t$millis")
          .getOrElse(m.matched))
      }
    })
  }
}

/** The eagerly-executed command node the injected parser emits — DML
  * side effects happen at `spark.sql` time, like every SQL command. */
private[graft] final case class GraftDmlCommand(dml: GraftDml)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    GraftSql.exec(session, dml)
    Seq.empty
  }
}

/** DESCRIBE HISTORY / DETAIL through the injected parser: a command
  * WITH output rows, so plain `spark.sql("DESCRIBE HISTORY t")`
  * returns the frame. */
private[graft] final case class GraftDescribeCommand(dml: SqlDescribe)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[Attribute] =
    if (dml.kind == "history") Seq(
      AttributeReference("version", LongType)(),
      AttributeReference("commit_millis", LongType)(),
      AttributeReference("domain", StringType)())
    else Seq(
      AttributeReference("location", StringType)(),
      AttributeReference("version", LongType)(),
      AttributeReference("num_versions", LongType)(),
      AttributeReference("partition_columns", StringType)(),
      AttributeReference("constraints", StringType)(),
      AttributeReference("generated_columns", StringType)(),
      AttributeReference("extension_columns", StringType)(),
      AttributeReference("identity_columns", StringType)())
  override def run(session: SparkSession): Seq[Row] =
    GraftSql.describeFrame(session, dml).collect().toSeq
}

/** GENERATE MANIFEST through the injected parser — a command with
  * output rows (manifest path, file count, exported version). */
private[graft] final case class GraftGenerateCommand(dml: SqlGenerate)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("manifest_path", StringType)(),
    AttributeReference("n_files", LongType)(),
    AttributeReference("version", LongType)())
  override def run(session: SparkSession): Seq[Row] =
    GraftSql.generateFrame(session, dml).collect().toSeq
}

/** ANALYZE / DESCRIBE STATS through the injected parser — commands
  * with output rows, sharing the stats schema. */
private[graft] final case class GraftStatsCommand(table: String,
    analyzeCols: Option[Seq[String]]) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("colname", StringType)(),
    AttributeReference("n_rows", LongType)(),
    AttributeReference("n_nulls", LongType)(),
    AttributeReference("ndv_est", DoubleType)(),
    AttributeReference("min_s", StringType)(),
    AttributeReference("max_s", StringType)(),
    AttributeReference("version", LongType)())
  override def run(session: SparkSession): Seq[Row] = (analyzeCols match {
    case Some(cols) => GraftSql.analyzeFrame(session,
      SqlAnalyze(table, cols))
    case None => GraftSql.statsFrame(session, SqlDescribeStats(table))
  }).collect().toSeq
}

/** EXPORT TABLE … TO DELTA through the injected parser. */
private[graft] final case class GraftExportDeltaCommand(
    dml: SqlExportDelta) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType)(),
    AttributeReference("delta_version", LongType)(),
    AttributeReference("n_files", LongType)())
  override def run(session: SparkSession): Seq[Row] =
    GraftSql.exportDeltaFrame(session, dml).collect().toSeq
}

/** EXPORT TABLE … TO ICEBERG through the injected parser. */
private[graft] final case class GraftExportIcebergCommand(
    dml: SqlExportIceberg) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType)(),
    AttributeReference("snapshot_id", LongType)(),
    AttributeReference("n_files", LongType)())
  override def run(session: SparkSession): Seq[Row] =
    GraftSql.exportIcebergFrame(session, dml).collect().toSeq
}

/** RESTORE TABLE through the injected parser — a command with output
  * rows (table, restored_to, new_version), so plain
  * `spark.sql("RESTORE TABLE t TO VERSION AS OF 2")` both rolls the
  * table back and returns what it did. */
private[graft] final case class GraftRestoreCommand(dml: SqlRestore)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType)(),
    AttributeReference("restored_to", LongType)(),
    AttributeReference("new_version", LongType)())
  override def run(session: SparkSession): Seq[Row] =
    GraftSql.restoreFrame(session, dml).collect().toSeq
}

/** COPY INTO through the injected parser — a command with output rows
  * (table, n_files_loaded, n_files_skipped, n_rows_inserted), so
  * plain `spark.sql("COPY INTO t FROM '…' FILEFORMAT = parquet")`
  * both ingests and reports what it did. */
private[graft] final case class GraftCopyCommand(dml: SqlCopyInto)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType)(),
    AttributeReference("n_files_loaded", LongType)(),
    AttributeReference("n_files_skipped", LongType)(),
    AttributeReference("n_rows_inserted", LongType)())
  override def run(session: SparkSession): Seq[Row] =
    GraftSql.copyFrame(session, dml).collect().toSeq
}

/** SHOW TBLPROPERTIES / SHOW PARTITIONS / SHOW CREATE TABLE / the
  * view verbs through the injected parser — one command class, the
  * output schema fixed per verb at construction. */
private[graft] final case class GraftCatalogCommand(dml: GraftDml)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{BooleanType, IntegerType, StringType}
  override val output: Seq[Attribute] = dml match {
    case _: SqlShowProps => Seq(
      AttributeReference("key", StringType)(),
      AttributeReference("value", StringType)())
    case _: SqlShowPartitions => Seq(
      AttributeReference("partition", StringType)())
    case _: SqlShowCreate => Seq(
      AttributeReference("tbl", StringType)(),
      AttributeReference("ddl", StringType)())
    case _: SqlCreateView => Seq(
      AttributeReference("view", StringType)(),
      AttributeReference("n_cols", IntegerType)(),
      AttributeReference("replaced", BooleanType)())
    case _: SqlDropView => Seq(
      AttributeReference("view", StringType)(),
      AttributeReference("dropped", BooleanType)())
    case _: SqlShowViews => Seq(
      AttributeReference("view", StringType)(),
      AttributeReference("definition", StringType)())
    case other => throw new IllegalStateException(
      s"GraftCatalogCommand cannot serve ${other.getClass.getSimpleName}")
  }
  override def run(session: SparkSession): Seq[Row] = (dml match {
    case p: SqlShowProps => GraftSql.showPropsFrame(session, p)
    case p: SqlShowPartitions => GraftSql.showPartitionsFrame(session, p)
    case p: SqlShowCreate => GraftSql.showCreateFrame(session, p)
    case v: SqlCreateView => GraftSql.createViewFrame(session, v)
    case v: SqlDropView => GraftSql.dropViewFrame(session, v)
    case _: SqlShowViews => GraftSql.showViewsFrame(session)
    case other => throw new IllegalStateException(
      s"GraftCatalogCommand cannot serve ${other.getClass.getSimpleName}")
  }).collect().toSeq
}

/** Parser extension: intercepts the four DML verbs against registered
  * versioned tables, rewrites inline time-travel clauses on anything
  * else, and delegates every other statement — and every other parser
  * duty — to Spark's own parser. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSql.parseDml(sqlText) match {
      case Some(d: SqlDescribe) => GraftDescribeCommand(d)
      case Some(g: SqlGenerate) => GraftGenerateCommand(g)
      case Some(x: SqlExportDelta) => GraftExportDeltaCommand(x)
      case Some(x: SqlExportIceberg) => GraftExportIcebergCommand(x)
      case Some(a: SqlAnalyze) => GraftStatsCommand(a.table, Some(a.cols))
      case Some(ds: SqlDescribeStats) => GraftStatsCommand(ds.table, None)
      case Some(r: SqlRestore) => GraftRestoreCommand(r)
      case Some(c: SqlCopyInto) => GraftCopyCommand(c)
      case Some(x @ (_: SqlShowProps | _: SqlShowPartitions |
                     _: SqlShowCreate | _: SqlCreateView |
                     _: SqlDropView | _: SqlShowViews)) =>
        GraftCatalogCommand(x)
      case Some(dml) => GraftDmlCommand(dml)
      case None =>
        // registered views the statement references re-materialize
        // before Spark parses it (plan construction only, no jobs) —
        // the extension path serves SELECT-through-view exactly like
        // the runtime path
        SparkSession.getActiveSession
          .foreach(s => GraftSql.materializeViews(s, sqlText))
        delegate.parsePlan(GraftSql.rewriteTimeTravel(sqlText))
    }
  @throws[ParseException]
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  @throws[ParseException]
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  @throws[ParseException]
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  @throws[ParseException]
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  @throws[ParseException]
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(GraftSql.rewriteTimeTravel(sqlText))
  @throws[ParseException]
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  @throws[ParseException]
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  @throws[ParseException]
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
