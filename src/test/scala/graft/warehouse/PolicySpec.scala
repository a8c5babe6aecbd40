package graft.warehouse

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-filter / column-mask policies: enforced by the graft data
  * source on every read path it serves (live, pinned, pruned), raw at
  * the engine tier by design, validated at add time (type-preserving,
  * deterministic), masks evaluate over the RAW row, and the leaky
  * surfaces (CDF view, streaming) refuse policy-bearing tables.
  */
class PolicySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-policy-$tag")
      .toString + "/t"

  private def seed(root: String): Unit = {
    import spark.implicits._
    VersionedParquet.publish(
      (0L until 40L).map(i => (i, i * 10L, s"p$i")).toDF("id", "x", "p"),
      root, keepVersions = 20)
  }

  private def served(root: String) =
    spark.read.format("graft").option("path", root).load()

  test("mask + row filter enforce at the source; the engine tier " +
      "stays raw; drop restores") {
    import spark.implicits._
    val root = tmp("enforce")
    seed(root)
    VersionedParquet.setRowFilter(spark, root, "id % 4 <> 1")
    VersionedParquet.addMaskPolicy(spark, root, "x", "x % 7")
    VersionedParquet.addMaskPolicy(spark, root, "p", "'***'")
    val out = served(root).select("id", "x", "p")
      .as[(Long, Long, String)].collect().toSet
    assert(out === (0L until 40L).filter(_ % 4 != 1)
      .map(i => (i, (i * 10) % 7, "***")).toSet)
    // raw tier: maintenance and the owner see real bytes
    val raw = VersionedParquet.read(spark, root)
      .select("id", "x", "p").as[(Long, Long, String)].collect().toSet
    assert(raw === (0L until 40L).map(i => (i, i * 10, s"p$i")).toSet)
    VersionedParquet.dropMaskPolicy(spark, root, "p")
    VersionedParquet.dropMaskPolicy(spark, root, "x")
    VersionedParquet.dropRowFilter(spark, root)
    assert(served(root).select("id", "x", "p")
      .as[(Long, Long, String)].collect().toSet === raw)
  }

  test("add-time validation: type drift, nondeterminism, unknown " +
      "column, non-boolean filter all refuse") {
    val root = tmp("validate")
    seed(root)
    intercept[IllegalArgumentException] {
      VersionedParquet.addMaskPolicy(spark, root, "x", "'redacted'")
    }
    intercept[IllegalArgumentException] {
      VersionedParquet.addMaskPolicy(spark, root, "x",
        "cast(rand() * 100 as bigint)")
    }
    intercept[IllegalArgumentException] {
      VersionedParquet.addMaskPolicy(spark, root, "nope", "0")
    }
    intercept[IllegalArgumentException] {
      VersionedParquet.setRowFilter(spark, root, "id + 1")
    }
    assert(!VersionedParquet.hasPolicies(spark, root))
  }

  test("masks evaluate over the RAW row, never another mask's output") {
    import spark.implicits._
    val root = tmp("raw-row")
    seed(root)
    VersionedParquet.addMaskPolicy(spark, root, "x", "id + 1")
    VersionedParquet.addMaskPolicy(spark, root, "id", "cast(0 as bigint)")
    val out = served(root).select("id", "x")
      .as[(Long, Long)].collect().toSet
    assert(out === (0L until 40L).map(i => (0L, i + 1)).toSet,
      "x's mask sees the raw id, not the zeroed one")
  }

  test("pinned version reads are masked too; CDF and streaming refuse") {
    import spark.implicits._
    val root = tmp("surfaces")
    seed(root)
    VersionedParquet.append(spark, root,
      Seq((100L, 1000L, "p100")).toDF("id", "x", "p"), keepVersions = 20)
    VersionedParquet.addMaskPolicy(spark, root, "x", "cast(-1 as bigint)")
    val pinned = spark.read.format("graft").option("path", root)
      .option("versionAsOf", "0").load()
    assert(pinned.select("x").distinct().as[Long].collect().toSeq ===
      Seq(-1L), "policy applies at read time, to pinned history too")
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("path", root)
        .option("changesFrom", "0").load().collect()
    }
    intercept[IllegalArgumentException] {
      graft.warehouse.GraftStreamSource(spark,
        Map("path" -> root))
    }
  }

  test("raw-byte export surfaces refuse policy-bearing tables; " +
      "clones stay governed") {
    import spark.implicits._
    val root = tmp("export")
    seed(root)
    VersionedParquet.addMaskPolicy(spark, root, "x", "x % 7")
    intercept[IllegalArgumentException] {
      VersionedParquet.generateManifest(spark, root)
    }
    intercept[IllegalArgumentException] {
      DeltaSync.exportSync(spark, root, tmp("export-delta"))
    }
    GraftTables.register("t_pol_export", root)
    try intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"EXPORT TABLE t_pol_export TO DELTA " +
        s"LOCATION '${tmp("export-delta2")}'")
    } finally GraftTables.unregister("t_pol_export")
    // clones carry the policy: the governed view stays governed
    val shallow = tmp("export-shallow")
    VersionedParquet.shallowClone(spark, root, shallow)
    assert(VersionedParquet.maskPolicies(spark, shallow).nonEmpty)
    assert(served(shallow).select(max(col("x"))).as[Long].head() < 7L)
    val deep = tmp("export-deep")
    VersionedParquet.deepClone(spark, root, deep)
    assert(VersionedParquet.maskPolicies(spark, deep).nonEmpty)
    assert(served(deep).select(max(col("x"))).as[Long].head() < 7L)
  }

  test("branches of governed tables serve governed; branch-side " +
      "policy changes travel at publish, main-side drift conflicts") {
    import spark.implicits._
    val root = tmp("branch")
    seed(root)
    VersionedParquet.addMaskPolicy(spark, root, "x", "x % 7")
    Branch.create(spark, root, "wap")
    val b = Branch.branchRoot(root, "wap")
    assert(served(b).select(max(col("x"))).as[Long].head() < 7L,
      "the branch view is governed like main")
    // policy dropped ON the branch travels at publish
    VersionedParquet.dropMaskPolicy(spark, b, "x")
    Branch.fastForward(spark, root, "wap")
    assert(VersionedParquet.maskPolicies(spark, root).isEmpty)
    // main-side policy drift mid-branch conflicts
    Branch.create(spark, root, "late")
    VersionedParquet.setRowFilter(spark, root, "id % 2 = 0")
    intercept[Optimistic.CommitConflictException] {
      Branch.fastForward(spark, root, "late")
    }
    Branch.drop(spark, root, "late")
  }

  test("fuzz: random policy lifecycle interleaved with DML — the " +
      "served view equals filter+mask over the raw model every step") {
    import spark.implicits._
    val root = tmp("fuzz")
    val rng = new scala.util.Random(13)
    var nextId = 0L
    def fresh(n: Int): Seq[Long] = {
      val ids = (nextId until nextId + n); nextId += n; ids
    }
    var model = fresh(100).map(i => i -> (i * 10L)).toMap
    VersionedParquet.publish(
      model.toSeq.map { case (i, x) => (i, x) }.toDF("id", "x"),
      root, keepVersions = 30)
    // the policy state the model applies alongside the table's
    var filterMod: Option[Int] = None // row filter: id % m == 0
    var maskMod: Option[Int] = None   // mask: x % m

    def servedSet(): Set[(Long, Long)] =
      spark.read.format("graft").option("path", root).load()
        .select("id", "x").as[(Long, Long)].collect().toSet
    def expected(): Set[(Long, Long)] =
      model.toSeq
        .filter { case (i, _) => filterMod.forall(m => i % m == 0) }
        .map { case (i, x) => (i, maskMod.map(m => x % m).getOrElse(x)) }
        .toSet

    for (step <- 1 to 14) {
      rng.nextInt(4) match {
        case 0 => // DML under whatever policies are in force
          if (rng.nextBoolean()) {
            val rows = fresh(1 + rng.nextInt(15)).map(i =>
              (i, rng.nextInt(900).toLong))
            VersionedParquet.append(spark, root, rows.toDF("id", "x"),
              keepVersions = 30)
            model = model ++ rows
          } else {
            val p = 3 + rng.nextInt(4); val r = rng.nextInt(p)
            VersionedParquet.delete(spark, root, col("x") % p === r,
              keepVersions = 30)
            model = model.filterNot { case (_, x) => x % p == r }
          }
        case 1 => // set/replace the row filter
          val m = 2 + rng.nextInt(4)
          VersionedParquet.setRowFilter(spark, root, s"id % $m = 0")
          filterMod = Some(m)
        case 2 => // set/replace the mask
          val m = 3 + rng.nextInt(7)
          VersionedParquet.addMaskPolicy(spark, root, "x", s"x % $m")
          maskMod = Some(m)
        case 3 => // drop whatever exists
          if (filterMod.isDefined && rng.nextBoolean()) {
            VersionedParquet.dropRowFilter(spark, root); filterMod = None
          } else if (maskMod.isDefined) {
            VersionedParquet.dropMaskPolicy(spark, root, "x")
            maskMod = None
          }
      }
      assert(servedSet() === expected(), s"serving diverged at step " +
        s"$step (filter=$filterMod mask=$maskMod)")
      // the engine tier always sees raw regardless of policy state
      assert(VersionedParquet.read(spark, root).select("id", "x")
        .as[(Long, Long)].collect().toSet ===
        model.toSeq.map { case (i, x) => (i, x) }.toSet,
        s"raw tier diverged at step $step")
    }
  }

  test("filters on masked columns answer over masked values (the " +
      "skipping tier is bypassed, not consulted unsoundly)") {
    import spark.implicits._
    val root = tmp("skip")
    seed(root)
    // raw x = id*10; mask maps everything to x % 100 ∈ [0, 90]
    VersionedParquet.addMaskPolicy(spark, root, "x", "x % 100")
    val hits = served(root).filter(col("x") === 90L)
      .select("id").as[Long].collect().toSet
    assert(hits === (0L until 40L).filter(i => (i * 10) % 100 == 90).toSet,
      "predicate evaluated over masked values")
  }
}
