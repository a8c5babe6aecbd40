package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface: both activation paths resolve the same
  * native expressions, SQL answers match the DataFrame API, and codegen
  * stays on (the injected functions are the kernels, not UDF shims).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  // Build the session THROUGH the extension class. In production the
  // same class rides `spark.sql.extensions=graft.plans.GraftExtensions`
  // — a STATIC conf, read from the SparkContext's conf at first-context
  // creation, so inside a suite JVM whose context another suite already
  // built it is silently ignored; `withExtensions` is the documented
  // programmatic equivalent and applies at session construction
  // unconditionally. Clear the shared active session so this builder
  // really constructs one.
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("extension-built session resolves graft_* functions from SQL") {
    val r = spark.sql(
      "SELECT graft_token_count('one two, three!') AS t," +
        " graft_alnum_count('a1 B2 !') AS a," +
        " graft_punct_count('a, b. c!') AS p," +
        " graft_bpe_count('abc12 def!') AS b").head()
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === 4)
    assert(r.getInt(2) === 3)
    assert(r.getInt(3) === 4) // 'abc' + '12' + 'def' + '!'
    assert(spark.sql(
      "SELECT graft_vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0) === 11.0)
  }

  test("runtime registration serves sessions not built with the extension") {
    val bare = spark.newSession()
    GraftFunctions.register(bare)
    assert(bare.sql("SELECT graft_token_count('x y z') AS t")
      .head().getInt(0) === 3)
    // the rewrite rules ride extraOptimizations on the live session:
    // textbook SQL (no graft function named) still plans as the kernel
    bare.range(5).selectExpr("cast(id AS string) AS text")
      .createOrReplaceTempView("bare_t")
    assert(bare.sql(
      "SELECT length(regexp_replace(lower(text), '[^a-z0-9]', '')) FROM bare_t")
      .queryExecution.optimizedPlan.toString().contains("text_stat"))
  }

  test("SQL path and DataFrame path are the same expression (codegen on)") {
    import spark.implicits._
    // spark.range (not a local Seq) so ConvertToLocalRelation can't fold
    // the projection away — we need a physical stage to inspect
    val df = spark.range(200).select($"id",
      org.apache.spark.sql.functions.concat_ws(" ",
        org.apache.spark.sql.functions.lit("Hello, wörld"),
        $"id".cast("string"),
        org.apache.spark.sql.functions.lit("a#b#c 123xyz!")).as("text"))
    df.createOrReplaceTempView("xt")
    val sqlRows = spark.sql(
      "SELECT id, graft_token_count(text) t, graft_alnum_count(text) a, " +
        "graft_punct_count(text) p, graft_bpe_count(text) b FROM xt")
    val dfRows = df.select($"id",
      graft.functions.TextStat($"text", graft.functions.TextKernels.TokenRuns).as("t"),
      graft.functions.TextStat($"text", graft.functions.TextKernels.AlnumLower).as("a"),
      graft.functions.TextStat($"text", graft.functions.TextKernels.Punct).as("p"),
      graft.functions.TextStat($"text", graft.functions.TextKernels.BpePieces).as("b"))
    assert(sqlRows.collect().map(_.toString).sorted.toSeq ===
      dfRows.collect().map(_.toString).sorted.toSeq)
    // the SQL-resolved projection still runs inside whole-stage codegen
    // (prints as the `*(1)` stage prefix; assert on the node type)
    assert(sqlRows.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty)
  }

  test("optimizer rule rewrites textbook regex counts to the kernel") {
    import spark.implicits._
    val df = spark.range(50).select(
      org.apache.spark.sql.functions.concat_ws(" ",
        org.apache.spark.sql.functions.lit("Ab1 ?!"),
        $"id".cast("string")).as("text"))
    df.createOrReplaceTempView("rt")
    // NB Spark SQL string literals are backslash-escaped: the regex \s
    // is written '\\s' in query text
    val rewritten = spark.sql(
      """SELECT length(regexp_replace(lower(text), '[^a-z0-9]', '')) a,
        |       length(regexp_replace(text, '[a-zA-Z0-9\\s]', '')) p,
        |       regexp_count(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]') b
        |FROM rt""".stripMargin)
    val plan = rewritten.queryExecution.optimizedPlan.toString()
    assert("text_stat".r.findAllIn(plan).length === 3,
      s"all three shapes must rewrite to the kernel:\n$plan")
    // answers equal an independent Java-regex evaluation of the same
    // textbook formulas (the exact strings the SQL names)
    val texts = (0 until 50).map(i => s"Ab1 ?! $i")
    val expect = texts.map { t =>
      (t.toLowerCase.replaceAll("[^a-z0-9]", "").length,
        t.replaceAll("[a-zA-Z0-9\\s]", "").length,
        "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r.findAllIn(t).length)
    }.sorted
    assert(rewritten.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted.toSeq ===
      expect)
    // an unrelated regex is left to the regex engine
    assert(!spark.sql(
      "SELECT length(regexp_replace(text, '[0-9]', '')) FROM rt")
      .queryExecution.optimizedPlan.toString().contains("text_stat"))
  }

  test("optimizer rule rewrites the aggregate/zip_with dot idiom to vector_dot") {
    spark.range(10).selectExpr(
      "transform(sequence(1, 4), i -> CAST(i * id AS DOUBLE)) AS a",
      "transform(sequence(1, 4), i -> CAST(i + id AS DOUBLE)) AS b")
      .createOrReplaceTempView("vt")
    val q = spark.sql(
      "SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0D," +
        " (acc, v) -> acc + v) AS d FROM vt")
    assert(q.queryExecution.optimizedPlan.toString().contains("vector_dot"),
      q.queryExecution.optimizedPlan.toString())
    // values match the interpreted fold it replaced
    val got = q.collect().map(_.getDouble(0)).sorted.toSeq
    val expect = (0 until 10).map { id =>
      (1 to 4).map(i => (i * id).toDouble * (i + id)).sum
    }.sorted
    assert(got === expect)
    // a non-dot aggregate (different zero) is left alone
    assert(!spark.sql(
      "SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 1D," +
        " (acc, v) -> acc + v) FROM vt")
      .queryExecution.optimizedPlan.toString().contains("vector_dot"))
    // a FLOAT-typed multiply (per-element rounding) must NOT rewrite
    spark.range(3).selectExpr(
      "transform(sequence(1, 4), i -> CAST(i * id AS FLOAT)) AS a",
      "transform(sequence(1, 4), i -> CAST(i + id AS FLOAT)) AS b")
      .createOrReplaceTempView("ft")
    assert(!spark.sql(
      "SELECT aggregate(zip_with(a, b, (x, y) -> CAST(x * y AS DOUBLE))," +
        " 0D, (acc, v) -> acc + v) FROM ft")
      .queryExecution.optimizedPlan.toString().contains("vector_dot"))
  }

  test("wrong arity fails at analysis with the function's own message") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_token_count('a', 'b')").head()
    }
    assert(e.getMessage.contains("graft_token_count expects 1 argument"))
  }
}
