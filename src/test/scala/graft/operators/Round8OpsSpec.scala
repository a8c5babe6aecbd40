package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 semantic properties the DuckDB hash gate cannot check:
  *
  *  - k-means (q124): the final assignment is OPTIMAL — every vector
  *    sits with the centroid a brute-force Scala recompute says is
  *    nearest (lowest label on ties), with the exact distance; and the
  *    whole run is deterministic and partition-invariant (no float, no
  *    hash order, no partitioning artifact reaches the result).
  */
class Round8OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("k-means final assignment is nearest-centroid optimal vs brute force") {
    val fin = ClusterOps.kmeans(spark, sf)
      .select("vec_id", "e", "cl", "d2").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray,
        r.getInt(2), r.getLong(3)))
    // Determinism first: a second full run must be bit-identical.
    val fin2 = ClusterOps.kmeans(spark, sf)
      .select("vec_id", "e", "cl", "d2").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray,
        r.getInt(2), r.getLong(3)))
    assert(fin.map(t => (t._1, t._3, t._4)).toSeq.sortBy(_._1) ===
      fin2.map(t => (t._1, t._3, t._4)).toSeq.sortBy(_._1),
      "two full runs must agree exactly — no nondeterminism anywhere")

    // Brute-force re-derivation of the final centroids: replay the
    // operator's own definition in plain Scala from the raw table.
    def dist2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x * ClusterOps.SCALE)
          .cast("long")).as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    var cents: Seq[(Int, Array[Long])] =
      raw.take(ClusterOps.K).zipWithIndex.map { case ((_, e), i) => i -> e }
    def assignAll(cs: Seq[(Int, Array[Long])]) =
      raw.map { case (id, e) =>
        val (cl, d) = cs.map { case (c, ce) => (c, dist2(e, ce)) }
          .minBy { case (c, dd) => (dd, c) }
        (id, e, cl, d)
      }
    for (_ <- 1 to ClusterOps.ITERS) {
      val assigned = assignAll(cents)
      cents = assigned.groupBy(_._3).map { case (cl, rows) =>
        val n = rows.length
        cl -> Array.tabulate(rows.head._2.length)(i =>
          rows.map(_._2(i)).sum / n)
      }.toSeq.sortBy(_._1)
    }
    val expect = assignAll(cents).map(t => (t._1, t._3, t._4))
    assert(fin.map(t => (t._1, t._3, t._4)).toSeq.sortBy(_._1) ===
      expect.toSeq.sortBy(_._1),
      "distributed run must equal the sequential Lloyd reference")

    // and the reference's own optimality: every vector's recorded d2
    // is the minimum over the final centroid set
    val byCl = cents.toMap
    fin.foreach { case (id, e, cl, d) =>
      val best = cents.map { case (c, ce) => dist2(e, ce) }.min
      assert(d === best && dist2(e, byCl(cl)) === d,
        s"vec $id not optimally assigned")
    }
  }

  test("k-means is partition-invariant") {
    // same corpus forced through a different partitioning must yield
    // the identical per-cluster aggregate (the gate's output shape)
    val base = ClusterOps.kmeans(spark, sf)
      .groupBy("cl").agg(count(lit(1)).as("n"), sum("d2").as("i"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val p = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val alt = ClusterOps.kmeans(spark, sf)
        .groupBy("cl").agg(count(lit(1)).as("n"), sum("d2").as("i"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(alt === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", p)
  }

  test("max maintenance: targeted repair == recompute over random delete chains") {
    import spark.implicits._
    // 40 keys × values; 6 successive random-but-seeded delete batches,
    // mixing the three repair cases per step: deletes strictly below a
    // group's max (state kept), deletes felling the max (group
    // repaired), and full-group deletion (group drops out).
    val rnd = new scala.util.Random(8143)
    var rows = (0 until 40).flatMap(k =>
      (0 until rnd.nextInt(20) + 1).map(i =>
        (k.toLong, rnd.nextInt(1000).toLong, s"$k-$i")))
    var state = rows.toDF("k", "v", "id")
      .groupBy("k").agg(max($"v").as("mx"))
    for (step <- 0 until 6) {
      val victims = rows.filter { case (k, v, _) =>
        (k + v + step) % 3 == 0 || (step == 3 && k < 5) }
      val survivors = rows.filterNot(victims.contains)
      state = VersionOps.maintainMaxAfterDelete(
        survivors.toDF("k", "v", "id"), state,
        victims.toDF("k", "v", "id"), "k", "v")
      val expect = survivors.groupBy(_._1)
        .map { case (k, rs) => (k, rs.map(_._2).max) }.toSet
      val got = state.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expect, s"state diverged from recompute at step $step")
      rows = survivors
    }
  }
}
