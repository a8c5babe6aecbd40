package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Format protocol / reader feature gate (`_PROTOCOL`): the
  * `DeltaLite` `minReaderVersion` discipline applied to the graft
  * format itself. Every commit declares the reader-required features
  * of the retained chain; reads refuse loudly — naming the feature —
  * when the marker lists something this build does not implement, so
  * an older/foreign graft reader can never silently serve un-deleted,
  * un-masked, or un-mapped rows from a feature-bearing table. */
class ProtocolSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-proto-$tag")
      .toString + "/t"

  private def seed(root: String, keep: Int = 10): Unit = {
    import spark.implicits._
    VersionedParquet.publish(
      (0L until 100L).map(i => (i, s"g${i % 3}", i * 10))
        .toDF("id", "g", "x"), root, keepVersions = keep)
  }

  private def features(root: String): Seq[String] =
    VersionedParquet.readerFeatures(spark, root)

  test("plain table declares nothing; feature tiers declare themselves " +
    "in the same commit that writes them") {
    val root = tmp("declare")
    seed(root)
    // a plain physical publish needs no special reader: no marker
    assert(features(root).isEmpty)
    // a deletion-vector commit declares dv + the logical base ref
    VersionedParquet.delete(spark, root, col("id") >= 90L,
      keepVersions = 10)
    assert(features(root).contains("deletion-vectors"))
    assert(features(root).contains("logical-base"))
    // an upsert layers the delta tier — declared too
    import spark.implicits._
    VersionedParquet.upsert(spark, root,
      Seq((1L, "gZ", 999L)).toDF("id", "g", "x"), Seq("id"),
      keepVersions = 10)
    assert(features(root).contains("delta-overlay"))
    // every declared feature is one this build supports — our own
    // writers can never strand our own readers
    assert(features(root).toSet.subsetOf(
      VersionedParquet.SupportedReaderFeatures))
    // compact back to physical: the chain still RETAINS dv versions,
    // so the declaration must stay until they vacuum away
    VersionedParquet.compact(spark, root, keepVersions = 10)
    assert(features(root).contains("deletion-vectors"))
    // vacuum down to the physical head: nothing left to declare
    VersionedParquet.vacuum(spark, root, keepVersions = 1,
      minAgeMillis = 0L)
    assert(features(root).isEmpty,
      s"expected no features after vacuum, got ${features(root)}")
  }

  test("versionless DDL moves the marker without a commit: policies " +
    "and schema extensions declare immediately, clearing undeclares") {
    val root = tmp("versionless")
    seed(root)
    assert(features(root).isEmpty)
    VersionedParquet.setRowFilter(spark, root, "id % 7 <> 3")
    assert(features(root) === Seq("policies"))
    VersionedParquet.addColumn(spark, root, "bonus", "bigint", "x + 1")
    assert(features(root).contains("schema-extensions"))
    VersionedParquet.dropColumn(spark, root, "bonus") // still virtual
    VersionedParquet.dropRowFilter(spark, root)
    assert(features(root).isEmpty)
    // a physical drop is a read-time schema map — declared
    VersionedParquet.dropColumn(spark, root, "g")
    assert(features(root) === Seq("schema-map"))
  }

  test("unknown required feature refuses the read, naming it; " +
    "readAsOf and the graft source refuse identically") {
    val root = tmp("unknown")
    seed(root)
    assert(VersionedParquet.read(spark, root).count() === 100L)
    // a future graft writes a feature this build has never heard of
    VersionedParquet.installPointer(spark, new Path(root), "_PROTOCOL",
      "deletion-vectors\ncolumn-encryption/1")
    val e = intercept[java.io.IOException] {
      VersionedParquet.read(spark, root).count()
    }
    assert(e.getMessage.contains("column-encryption/1"),
      s"refusal must NAME the unknown feature, got: ${e.getMessage}")
    assert(!e.getMessage.contains("deletion-vectors\n"),
      "supported features are not part of the refusal")
    val e2 = intercept[java.io.IOException] {
      VersionedParquet.readAsOf(spark, root, System.currentTimeMillis())
    }
    assert(e2.getMessage.contains("column-encryption/1"))
    val e3 = intercept[Exception] {
      spark.read.format("graft").load(root).count()
    }
    assert(e3.getMessage.contains("column-encryption/1"))
    // the next commit recomputes honestly and un-strands the table
    import spark.implicits._
    VersionedParquet.append(spark, root,
      Seq((100L, "g0", 0L)).toDF("id", "g", "x"), keepVersions = 10)
    assert(VersionedParquet.read(spark, root).count() === 101L)
  }

  test("legacy tables (no marker) read exactly as before") {
    val root = tmp("legacy")
    seed(root)
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root, "_PROTOCOL"), false) // simulate pre-gate table
    assert(features(root).isEmpty)
    assert(VersionedParquet.read(spark, root).count() === 100L)
  }

  test("clones and branches carry the declaration") {
    val root = tmp("carry")
    seed(root)
    VersionedParquet.setRowFilter(spark, root, "id % 7 <> 3")
    VersionedParquet.delete(spark, root, col("id") >= 90L,
      keepVersions = 10)
    val sc = tmp("carry-shallow")
    VersionedParquet.shallowClone(spark, root, sc)
    assert(features(sc).contains("policies"))
    assert(features(sc).contains("logical-base"),
      "a shallow clone reads through a base reference and must say so")
    val dc = tmp("carry-deep")
    VersionedParquet.deepClone(spark, root, dc)
    assert(features(dc).contains("policies"))
    assert(!features(dc).contains("logical-base"),
      "a deep clone is physical; it must not over-declare")
    val bRoot = Branch.create(spark, root, "wip")
    assert(features(bRoot).contains("policies"))
    assert(features(bRoot).contains("logical-base"))
    Branch.drop(spark, root, "wip")
  }

  test("optimistic concurrent writers leave a consistent declaration") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val root = tmp("concurrent")
    seed(root, keep = 20)
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    try {
      import spark.implicits._
      // three concurrent appends (disjoint domains — all rebase) while
      // the protocol marker is refreshed inside every commit's lock
      val fs = (0 until 3).map { i =>
        Future {
          Optimistic.append(spark, root,
            Seq((1000L + i, s"w$i", i.toLong)).toDF("id", "g", "x"),
            keepVersions = 20)
        }
      }
      fs.foreach(Await.result(_, 120.seconds))
      // optimistic appends commit as merge-on-read overlays (base ref
      // + delta tier), so the racing commits must have declared
      // exactly the features they wrote — all supported, marker never
      // corrupted by the interleaving
      assert(features(root).contains("delta-overlay"),
        s"MoR appends must declare the overlay, got ${features(root)}")
      assert(features(root).toSet.subsetOf(
        VersionedParquet.SupportedReaderFeatures),
        s"declaration must stay within supported: ${features(root)}")
      assert(VersionedParquet.read(spark, root).count() === 103L)
      // materialize + vacuum to the physical head: declaration clears
      VersionedParquet.compact(spark, root, keepVersions = 20)
      VersionedParquet.vacuum(spark, root, keepVersions = 1,
        minAgeMillis = 0L)
      assert(features(root).isEmpty,
        s"physical head declares nothing, got ${features(root)}")
    } finally pool.shutdown()
  }
}
