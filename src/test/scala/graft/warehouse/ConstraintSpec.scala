package graft.warehouse

import java.io.IOException

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Named CHECK constraints (ALTER TABLE ADD/DROP CONSTRAINT): ADD
  * validates the live data first and is rejected un-recorded when it
  * fails; once recorded, the constraint binds every write path —
  * append, merge, UPDATE, partition overwrite, optimistic commits,
  * and full publishes — composing with the per-version publish
  * constraints; DROP re-opens the contract; clones carry it; and a
  * column a constraint references cannot be dropped or renamed until
  * the constraint goes.
  */
class ConstraintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-constraint-$tag")
      .toString + "/t"

  private def freshTable(tag: String): String = {
    import spark.implicits._
    val root = tmp(tag)
    VersionedParquet.publish(
      (0L until 100L).map(i => (i, i * 2)).toDF("id", "x"), root,
      keepVersions = 20)
    root
  }

  test("ADD validates existing data: reject is not recorded") {
    val root = freshTable("validate")
    val ex = intercept[IOException] {
      VersionedParquet.addConstraint(spark, root, "x_small", "x < 100")
    }
    assert(ex.getMessage.contains("x_small"))
    assert(VersionedParquet.namedConstraints(spark, root).isEmpty,
      "a failed ADD must not be recorded")
    // …and therefore doesn't bind later writes
    import spark.implicits._
    VersionedParquet.append(spark, root,
      Seq((200L, 400L)).toDF("id", "x"), keepVersions = 20)
    assert(VersionedParquet.read(spark, root).count() === 101)
  }

  test("a recorded constraint binds append / merge / UPDATE") {
    import spark.implicits._
    val root = freshTable("binds")
    VersionedParquet.addConstraint(spark, root, "x_nonneg", "x >= 0")
    assert(VersionedParquet.namedConstraints(spark, root) ===
      Seq("x_nonneg" -> "x >= 0"))
    val v = VersionedParquet.currentVersion(spark, root)
    intercept[IOException] {
      VersionedParquet.append(spark, root,
        Seq((200L, -1L)).toDF("id", "x"), keepVersions = 20)
    }
    intercept[IOException] {
      VersionedParquet.upsert(spark, root,
        Seq((5L, -7L)).toDF("id", "x"), Seq("id"), keepVersions = 20)
    }
    intercept[IOException] {
      VersionedParquet.updateWhere(spark, root, col("id") < 10L,
        Map("x" -> (col("x") - lit(1000L))), keepVersions = 20)
    }
    assert(VersionedParquet.currentVersion(spark, root) === v,
      "every rejected write leaves the version sequence untouched")
    // NULL passes (SQL CHECK semantics) and clean writes land
    VersionedParquet.append(spark, root,
      Seq((201L, Some(8L)), (202L, None))
        .toDF("id", "x"), keepVersions = 20)
    assert(VersionedParquet.read(spark, root).count() === 102)
  }

  test("composes with per-version publish constraints (union)") {
    import spark.implicits._
    val root = tmp("compose")
    VersionedParquet.publish(
      (1L until 50L).map(i => (i, i)).toDF("id", "x"), root,
      keepVersions = 20, constraints = Seq("id > 0"))
    VersionedParquet.addConstraint(spark, root, "x_cap", "x <= 1000")
    // violates the PUBLISH-recorded constraint only
    intercept[IOException] {
      VersionedParquet.append(spark, root,
        Seq((0L, 5L)).toDF("id", "x"), keepVersions = 20)
    }
    // violates the NAMED constraint only
    intercept[IOException] {
      VersionedParquet.append(spark, root,
        Seq((60L, 2000L)).toDF("id", "x"), keepVersions = 20)
    }
    VersionedParquet.append(spark, root,
      Seq((60L, 900L)).toDF("id", "x"), keepVersions = 20)
    assert(VersionedParquet.read(spark, root).count() === 50)
  }

  test("binds full publishes and survives RESTORE") {
    import spark.implicits._
    val root = freshTable("publish")
    VersionedParquet.addConstraint(spark, root, "x_nonneg", "x >= 0")
    intercept[IOException] {
      VersionedParquet.publish(
        Seq((1L, -1L)).toDF("id", "x"), root, keepVersions = 20)
    }
    VersionedParquet.publish(
      Seq((1L, 1L)).toDF("id", "x"), root, keepVersions = 20)
    VersionedParquet.restore(spark, root, 0L, keepVersions = 20)
    assert(VersionedParquet.namedConstraints(spark, root).nonEmpty,
      "the contract is table-level metadata; RESTORE rolls data, " +
        "not the contract")
    intercept[IOException] {
      VersionedParquet.append(spark, root,
        Seq((300L, -5L)).toDF("id", "x"), keepVersions = 20)
    }
  }

  test("optimistic writers enforce the named contract") {
    import spark.implicits._
    val root = freshTable("occ")
    VersionedParquet.addConstraint(spark, root, "x_nonneg", "x >= 0")
    intercept[IOException] {
      Optimistic.append(spark, root,
        Seq((300L, -1L)).toDF("id", "x"), keepVersions = 20)
    }
    intercept[IOException] {
      Optimistic.upsert(spark, root,
        Seq((5L, -1L)).toDF("id", "x"), Seq("id"), keepVersions = 20)
    }
    val c = Optimistic.append(spark, root,
      Seq((300L, 1L)).toDF("id", "x"), keepVersions = 20)
    assert(c.version === 1L)
  }

  test("a constraint added mid-flight forces the optimistic writer " +
      "to re-validate") {
    import spark.implicits._
    val root = freshTable("occ-race")
    // the competing ADD lands in the stage→commit window
    Optimistic.afterStage = () =>
      if (VersionedParquet.namedConstraints(spark, root).isEmpty)
        VersionedParquet.addConstraint(spark, root, "x_nonneg", "x >= 0")
    try {
      // violating rows: first stage validated against the OLD contract,
      // the commit detects the contract moved, the re-stage rejects
      intercept[IOException] {
        Optimistic.append(spark, root,
          Seq((300L, -1L)).toDF("id", "x"), keepVersions = 20)
      }
      assert(VersionedParquet.currentVersion(spark, root).contains(0L),
        "the violating append must not have committed")
    } finally Optimistic.afterStage = () => ()
    // clean rows sail through the same window
    Optimistic.afterStage = () =>
      if (VersionedParquet.namedConstraints(spark, root).size < 2)
        VersionedParquet.addConstraint(spark, root, "id_pos", "id >= 0")
    try {
      val c = Optimistic.append(spark, root,
        Seq((301L, 5L)).toDF("id", "x"), keepVersions = 20)
      assert(c.attempts === 2, "contract movement costs one retry")
    } finally Optimistic.afterStage = () => ()
  }

  test("DROP re-opens; names are checked") {
    import spark.implicits._
    val root = freshTable("drop")
    VersionedParquet.addConstraint(spark, root, "x_nonneg", "x >= 0")
    intercept[IllegalArgumentException] {
      VersionedParquet.addConstraint(spark, root, "x_nonneg", "x > 5")
    }
    intercept[IllegalArgumentException] {
      VersionedParquet.dropConstraint(spark, root, "nope")
    }
    VersionedParquet.dropConstraint(spark, root, "x_nonneg")
    VersionedParquet.append(spark, root,
      Seq((300L, -1L)).toDF("id", "x"), keepVersions = 20)
    assert(VersionedParquet.read(spark, root)
      .filter(col("x") < 0).count() === 1)
  }

  test("shallow clones carry the contract") {
    import spark.implicits._
    val root = freshTable("clone-src")
    VersionedParquet.addConstraint(spark, root, "x_nonneg", "x >= 0")
    val dst = tmp("clone-dst")
    VersionedParquet.shallowClone(spark, root, dst)
    assert(VersionedParquet.namedConstraints(spark, dst) ===
      Seq("x_nonneg" -> "x >= 0"))
    intercept[IOException] {
      VersionedParquet.append(spark, dst,
        Seq((300L, -1L)).toDF("id", "x"), keepVersions = 20)
    }
  }

  test("referenced columns are fenced from DROP/RENAME COLUMN") {
    val root = freshTable("fence")
    VersionedParquet.addConstraint(spark, root, "x_nonneg", "x >= 0")
    intercept[IllegalArgumentException] {
      VersionedParquet.dropColumn(spark, root, "x")
    }
    intercept[IllegalArgumentException] {
      VersionedParquet.renameColumn(spark, root, "x", "y")
    }
    VersionedParquet.dropConstraint(spark, root, "x_nonneg")
    VersionedParquet.renameColumn(spark, root, "x", "y")
    assert(VersionedParquet.read(spark, root).columns.toSeq ===
      Seq("id", "y"))
  }

  test("constraints bind to physical columns only") {
    val root = freshTable("virtual")
    VersionedParquet.addColumn(spark, root, "tier", "STRING",
      "CASE WHEN x >= 100 THEN 'hi' ELSE 'lo' END")
    intercept[IllegalArgumentException] {
      VersionedParquet.addConstraint(spark, root, "tier_set",
        "tier IN ('hi','lo')")
    }
    VersionedParquet.compact(spark, root, keepVersions = 20)
    VersionedParquet.addConstraint(spark, root, "tier_set",
      "tier IN ('hi','lo')")
    assert(VersionedParquet.namedConstraints(spark, root).nonEmpty)
  }

  test("SQL surface: ALTER TABLE ADD/DROP CONSTRAINT route through") {
    import spark.implicits._
    val root = freshTable("sql")
    GraftTables.register("constraint_spec_t", root, keepVersions = 20)
    GraftSql.sql(spark, "ALTER TABLE constraint_spec_t " +
      "ADD CONSTRAINT x_nonneg CHECK (x >= 0)")
    assert(VersionedParquet.namedConstraints(spark, root) ===
      Seq("x_nonneg" -> "x >= 0"))
    intercept[IOException] {
      GraftSql.sql(spark,
        "UPDATE constraint_spec_t SET x = -1 WHERE id < 5")
    }
    GraftSql.sql(spark,
      "ALTER TABLE constraint_spec_t DROP CONSTRAINT x_nonneg")
    GraftSql.sql(spark,
      "UPDATE constraint_spec_t SET x = -1 WHERE id < 5")
    assert(VersionedParquet.read(spark, root)
      .filter(col("x") === -1L).count() === 5)
    GraftTables.unregister("constraint_spec_t")
  }
}
