package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VectorDot must be BIT-IDENTICAL to the interpreted fold it replaced
  * (same ascending-index summation order), and must run inside
  * whole-stage codegen.
  */
class VectorKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("kernel dot == interpreted aggregate/zip_with fold, bit for bit") {
    // pseudo-random float vectors incl. negatives/small magnitudes,
    // derived from the row id — deterministic, runs through real codegen
    val df = spark.range(2000).select(
      expr("transform(sequence(0, 63), i -> " +
        "CAST(sin(id * 64 + i) AS FLOAT))").as("a"),
      expr("transform(sequence(0, 63), i -> " +
        "CAST(cos(id * 64 + i) * 3.7 AS FLOAT))").as("b"))
    val compared = df.select(
      VectorDot(col("a"), col("b")).as("kernel"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE)" +
        " * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)").as("fold"))
    // exact equality — same order, same arithmetic, no tolerance needed
    assert(compared.filter(col("kernel") =!= col("fold")).count() === 0)
  }

  test("float x double (projection matrix) agrees with the fold too") {
    val df = spark.range(500).select(
      expr("transform(sequence(0, 63), i -> " +
        "CAST(sin(id + i) AS FLOAT))").as("a"),
      expr("transform(sequence(0, 63), i -> cos(id - i) * 250.0)").as("c"))
    val compared = df.select(
      VectorDot(col("a"), col("c")).as("kernel"),
      expr("aggregate(zip_with(a, c, (x, y) -> CAST(x AS DOUBLE) * y)," +
        " 0D, (acc, v) -> acc + v)").as("fold"))
    assert(compared.filter(col("kernel") =!= col("fold")).count() === 0)
  }

  test("VectorDot participates in whole-stage codegen") {
    val df = spark.range(4).select(
      expr("transform(sequence(0, 7), i -> CAST(i AS FLOAT))").as("a"))
      .select(VectorDot(col("a"), col("a")).as("d"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.exists(_.toString.contains("vector_dot")),
      s"vector_dot must codegen:\n${df.queryExecution.executedPlan}")
    // 0+1+...+49 as squares: sum i^2 for 0..7 = 140
    assert(df.collect().head.getDouble(0) === 140.0)
  }
}
