package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish branching (Branch): zero-copy fork, isolated
  * branch writes, audit, squashed fast-forward with a net change feed,
  * optimistic conflict detection (version AND versionless-contract
  * drift), branch DDL travel, and the detached-branch materialize
  * path.
  */
class BranchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-branch-$tag")
      .toString + "/t"

  private def rows(root: String): Set[(Long, Long)] = {
    import spark.implicits._
    VersionedParquet.read(spark, root).select("id", "x")
      .as[(Long, Long)].collect().toSet
  }

  private def seed(root: String, n: Long = 40L): Unit = {
    import spark.implicits._
    VersionedParquet.publish(
      (0L until n).map(i => (i, i)).toDF("id", "x"), root,
      keepVersions = 20)
  }

  test("isolation + squashed publish: main never sees branch writes " +
      "until fastForward, which advances main by exactly one version") {
    import spark.implicits._
    val root = tmp("iso")
    seed(root)
    val v0Rows = rows(root)
    Branch.create(spark, root, "wap")
    val b = Branch.branchRoot(root, "wap")
    // two separate branch commits — the publish must still squash
    VersionedParquet.append(spark, b,
      Seq((100L, 1L)).toDF("id", "x"), keepVersions = 20)
    VersionedParquet.delete(spark, b, col("id") === 3L, keepVersions = 20)
    assert(rows(root) === v0Rows, "main is isolated from branch writes")
    assert(rows(b) === v0Rows + ((100L, 1L)) - ((3L, 3L)))
    val v = Branch.fastForward(spark, root, "wap")
    assert(v === 1L, "two branch commits squash into one main version")
    assert(rows(root) === v0Rows + ((100L, 1L)) - ((3L, 3L)))
    assert(!Branch.exists(spark, root, "wap"), "published branch dropped")
  }

  test("zero-copy publish: the fast-forwarded version references " +
      "main's own physical base relatively, no base bytes rewritten") {
    import spark.implicits._
    val root = tmp("zerocopy")
    seed(root)
    Branch.create(spark, root, "wap")
    VersionedParquet.append(spark, Branch.branchRoot(root, "wap"),
      Seq((100L, 1L)).toDF("id", "x"), keepVersions = 20)
    val baseFiles = VersionedParquet
      .listDataFiles(spark, new Path(root, "v00000000")).toMap
    Branch.fastForward(spark, root, "wap")
    val marker = VersionedParquet.readPointer(spark,
      new Path(new Path(root, "v00000001"), "_BASE"))
    assert(marker === Some("v00000000"),
      "published version is a main-relative logical copy")
    val after = VersionedParquet
      .listDataFiles(spark, new Path(root, "v00000000")).toMap
    assert(after === baseFiles, "base files untouched by the publish")
  }

  test("change feed continuity: the publish carries the net diff and " +
      "the apply invariant holds") {
    import spark.implicits._
    val root = tmp("cdf")
    seed(root)
    Branch.create(spark, root, "wap")
    val b = Branch.branchRoot(root, "wap")
    VersionedParquet.append(spark, b,
      Seq((100L, 1L), (101L, 2L)).toDF("id", "x"), keepVersions = 20)
    VersionedParquet.delete(spark, b, col("id") === 5L, keepVersions = 20)
    Branch.fastForward(spark, root, "wap")
    val feed = VersionedParquet.changes(spark, root, 0L, 1L)
    val ins = feed.filter(col("_change_type") === "insert")
      .select("id", "x").as[(Long, Long)].collect().toSet
    val del = feed.filter(col("_change_type") === "delete")
      .select("id", "x").as[(Long, Long)].collect().toSet
    assert(ins === Set((100L, 1L), (101L, 2L)))
    assert(del === Set((5L, 5L)))
  }

  test("conflicts: main advancing past the fork, and versionless " +
      "contract drift, both reject with the branch intact") {
    import spark.implicits._
    val root = tmp("conflict")
    seed(root)
    Branch.create(spark, root, "late")
    VersionedParquet.append(spark, Branch.branchRoot(root, "late"),
      Seq((100L, 1L)).toDF("id", "x"), keepVersions = 20)
    // main advances behind the branch's back
    VersionedParquet.append(spark, root,
      Seq((200L, 2L)).toDF("id", "x"), keepVersions = 20)
    intercept[Optimistic.CommitConflictException] {
      Branch.fastForward(spark, root, "late")
    }
    assert(Branch.exists(spark, root, "late"),
      "loser's work intact for re-branch")
    assert(rows(Branch.branchRoot(root, "late")).contains((100L, 1L)))
    Branch.drop(spark, root, "late")
    // contract drift: an ALTER mints no version, must still conflict
    Branch.create(spark, root, "ddl")
    VersionedParquet.addConstraint(spark, root, "x_small", "x < 10000")
    intercept[Optimistic.CommitConflictException] {
      Branch.fastForward(spark, root, "ddl")
    }
    Branch.drop(spark, root, "ddl")
  }

  test("branch DDL travels: a constraint added ON the branch enforces " +
      "on main after the publish") {
    import spark.implicits._
    val root = tmp("ddl-travel")
    seed(root)
    Branch.create(spark, root, "wap")
    val b = Branch.branchRoot(root, "wap")
    VersionedParquet.addConstraint(spark, b, "x_nonneg", "x >= 0")
    VersionedParquet.append(spark, b,
      Seq((100L, 1L)).toDF("id", "x"), keepVersions = 20)
    Branch.fastForward(spark, root, "wap")
    assert(VersionedParquet.namedConstraints(spark, root)
      .exists(_._1 == "x_nonneg"))
    intercept[java.io.IOException] {
      VersionedParquet.append(spark, root,
        Seq((101L, -1L)).toDF("id", "x"), keepVersions = 20)
    }
  }

  test("audit: violating rows wear the failed expectation names; " +
      "repaired branch audits clean") {
    import spark.implicits._
    val root = tmp("audit")
    seed(root)
    Branch.create(spark, root, "wap")
    val b = Branch.branchRoot(root, "wap")
    VersionedParquet.append(spark, b,
      Seq((100L, -1L), (101L, 5L)).toDF("id", "x"), keepVersions = 20)
    val bad = Branch.audit(spark, root, "wap",
      Seq("x_nonneg" -> "x >= 0", "id_small" -> "id < 101"))
    val tagged = bad.select("id", "_violated").as[(Long, String)]
      .collect().toMap
    assert(tagged === Map(100L -> "x_nonneg", 101L -> "id_small"))
    VersionedParquet.delete(spark, b, col("x") < 0 || col("id") >= 101L,
      keepVersions = 20)
    assert(Branch.audit(spark, root, "wap",
      Seq("x_nonneg" -> "x >= 0", "id_small" -> "id < 101")).isEmpty)
  }

  test("streaming WAP: a stream lands exactly-once on the branch, " +
      "main stays isolated until the squashed publish") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val work = java.nio.file.Files.createTempDirectory("graft-branch-stream")
    val watch = java.nio.file.Files.createDirectory(work.resolve("landing"))
    val root = work.resolve("tbl").toString
    val checkpoint = work.resolve("chk").toString
    VersionedParquet.publish(
      (0L until 30L).map(i => (i, i)).toDF("id", "x"), root,
      keepVersions = 20)
    Branch.create(spark, root, "ingest")
    val b = Branch.branchRoot(root, "ingest")
    def drop(name: String, xs: Seq[Long]): Unit =
      java.nio.file.Files.write(watch.resolve(name),
        xs.map(i => s"$i,$i").mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("x", LongType)))
    def source() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .csv(watch.toString)
    drop("a.csv", Seq(100L, 101L))
    drop("b.csv", Seq(102L))
    graft.streaming.VersionedSink
      .runAppend(source(), b, checkpoint, keepVersions = 20)
      .awaitTermination()
    assert(rows(root) === (0L until 30L).map(i => (i, i)).toSet,
      "main is isolated while the stream lands on the branch")
    // restart the stream with the same checkpoint: exactly-once
    drop("c.csv", Seq(103L))
    graft.streaming.VersionedSink
      .runAppend(source(), b, checkpoint, keepVersions = 20)
      .awaitTermination()
    assert(Branch.audit(spark, root, "ingest",
      Seq("x_nonneg" -> "x >= 0")).isEmpty)
    Branch.fastForward(spark, root, "ingest")
    assert(rows(root) === ((0L until 30L) ++ (100L to 103L))
      .map(i => (i, i)).toSet,
      "the squashed publish carries every streamed batch exactly once")
    assert(VersionedParquet.currentVersion(spark, root).get === 1L)
  }

  test("detached branch (compacted under its own root) publishes via " +
      "honest materialization and survives the branch drop") {
    import spark.implicits._
    val root = tmp("detach")
    seed(root)
    Branch.create(spark, root, "wap")
    val b = Branch.branchRoot(root, "wap")
    VersionedParquet.append(spark, b,
      Seq((100L, 1L)).toDF("id", "x"), keepVersions = 20)
    VersionedParquet.compact(spark, b, keepVersions = 20)
    val expected = rows(b)
    Branch.fastForward(spark, root, "wap")
    assert(!Branch.exists(spark, root, "wap"))
    assert(rows(root) === expected,
      "materialized publish owns its bytes after the branch dir is gone")
  }
}
