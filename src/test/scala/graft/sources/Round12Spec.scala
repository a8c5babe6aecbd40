package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 interop surfaces: Iceberg partition transforms (spec
  * Appendix B hash conformance, bucket/truncate/day/month/year export
  * + transform-aware pruning) and the sequence-number ordering
  * contract for equality deletes.
  */
class Round12Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-r12-$tag").toString

  test("bucket hash conforms to the Iceberg spec's Appendix B test " +
    "vectors (murmur3_x86_32, seed 0, little-endian longs, UTF-8 " +
    "strings, ints hashed as longs)") {
    import IcebergTransforms._
    assert(hashLong(34L) === 2017239379)
    assert(hashLong(34L) === hashLong(34)) // int widens to long
    assert(hashString("iceberg") === 1210000089)
    // date 2017-11-16 = epoch day 17486, hashed as a long
    assert(java.time.LocalDate.of(2017, 11, 16).toEpochDay === 17486L)
    assert(hashLong(17486L) === -653330422)
    // timestamp 2017-11-16T22:31:08 UTC in micros
    val micros = java.time.Instant.parse("2017-11-16T22:31:08Z")
      .getEpochSecond * 1000000L
    assert(hashLong(micros) === -2047944441)
  }

  test("transform literal/column agreement: every transform computes " +
    "the same value driver-side and as a Spark column") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val longs = Seq(-7L, -1L, 0L, 1L, 9L, 10L, 34L, 12345678L)
    val strs = Seq("", "a", "iceberg", "héllo wörld")
    val ts = Seq("2024-01-01T00:00:00Z", "2024-01-15T23:59:59Z",
      "1969-12-31T12:00:00Z", "2017-11-16T22:31:08Z")
      .map(java.time.Instant.parse)
    def check[T](tr: String, dt: DataType, vals: Seq[T]): Unit = {
      val t = IcebergTransforms.parse(tr)
      val df = vals.map(Tuple1(_)) match {
        case v: Seq[Tuple1[Long]] @unchecked if dt == LongType =>
          v.map(_._1.asInstanceOf[Long]).toDF("v")
        case v: Seq[Tuple1[String]] @unchecked if dt == StringType =>
          v.map(_._1.asInstanceOf[String]).toDF("v")
        case v => v.map(_._1.asInstanceOf[java.time.Instant]).toDF("v")
      }
      val got = df.select(
          IcebergTransforms.column(t, dt, col("v")).as("t"))
        .collect().map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq
      val want = vals.map(v => IcebergTransforms.literal(t, dt, v))
      assert(got.map(String.valueOf) === want.map(String.valueOf),
        s"transform $tr over $dt")
    }
    check("bucket[4]", LongType, longs)
    check("truncate[10]", LongType, longs)
    check("identity", LongType, longs)
    check("bucket[7]", StringType, strs)
    check("truncate[3]", StringType, strs)
    check("day", TimestampType, ts)
    check("month", TimestampType, ts)
    check("year", TimestampType, ts)
  }

  test("bucket[N] export + pruning: equality predicates open exactly " +
    "the matching bucket's files; ranges keep everything (correct, " +
    "unpruned); rows round-trip") {
    import spark.implicits._
    val loc = tmp("bucket")
    val df = (0L until 400L).map(i => (i, i * 3L)).toDF("id", "v")
      .coalesce(1)
    IcebergLite.exportTransformPartitioned(spark, df, loc,
      Seq("id" -> "bucket[4]"))
    val snap = IcebergLite.snapshot(spark, loc)
    assert(snap.files.length === 4)
    assert(snap.specFields.map(f =>
      (f.name, f.source, f.transform.toString)) ===
      Seq(("id_bucket", "id", "bucket[4]")))
    // every stored tuple matches the spec hash of its rows
    snap.files.foreach { f =>
      val declared = snap.partitionValues(f)("id_bucket").toInt
      val actual = spark.read.parquet(f).select("id").as[Long]
        .collect().map(v => (IcebergTransforms.hashLong(v) &
          Int.MaxValue) % 4).distinct.toSeq
      assert(actual === Seq(declared))
    }
    // equality: 1 of 4 files
    val (rows, scanned, total) =
      IcebergLite.readTransformPruned(spark, loc, "id", 34L, 34L)
    assert((scanned, total) === ((1, 4)))
    assert(rows.select("v").as[Long].collect().toSeq === Seq(102L))
    // a genuine range cannot bucket-prune: all files kept, rows exact
    val (r2, s2, _) =
      IcebergLite.readTransformPruned(spark, loc, "id", 10L, 12L)
    assert(s2 === 4 && r2.count() === 3L)
    // the full read is untouched by partitioning
    assert(IcebergLite.read(spark, loc).count() === 400L)
  }

  test("day(ts) export + pruning: a one-day predicate opens exactly " +
    "that day's file; truncate[W] prunes long ranges") {
    import spark.implicits._
    val loc = tmp("day")
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    val rows = (0 until 240).map { i =>
      (i.toLong, base.plusSeconds(i * 3600L)) // 10 days, hourly
    }
    val df = rows.toDF("id", "ts").coalesce(1)
    IcebergLite.exportTransformPartitioned(spark, df, loc,
      Seq("ts" -> "day"))
    val snap = IcebergLite.snapshot(spark, loc)
    assert(snap.files.length === 10)
    val (hit, scanned, total) = IcebergLite.readTransformPruned(
      spark, loc, "ts",
      java.time.Instant.parse("2024-03-04T00:00:00Z"),
      java.time.Instant.parse("2024-03-04T23:59:59Z"))
    assert((scanned, total) === ((1, 10)))
    assert(hit.count() === 24L)
    // a 3-day range opens 3 files
    val (h2, s2, _) = IcebergLite.readTransformPruned(
      spark, loc, "ts",
      java.time.Instant.parse("2024-03-04T00:00:00Z"),
      java.time.Instant.parse("2024-03-06T23:59:59Z"))
    assert(s2 === 3 && h2.count() === 72L)
    // truncate[100] on longs: 0..399 → 4 width-100 ranges
    val loc2 = tmp("trunc")
    IcebergLite.exportTransformPartitioned(spark,
      (0L until 400L).map(i => (i, i * 2L)).toDF("k", "w").coalesce(1),
      loc2, Seq("k" -> "truncate[100]"))
    val (h3, s3, t3) =
      IcebergLite.readTransformPruned(spark, loc2, "k", 150L, 249L)
    assert((s3, t3) === ((2, 4)))
    assert(h3.count() === 100L)
  }

  test("equality-delete ordering: the manifest list's sequence_number " +
    "orders deletes (self-written tables carry it); stripping it " +
    "from a delete-bearing table refuses rather than misorder") {
    import spark.implicits._
    val loc = tmp("eqseq")
    IcebergLite.export(spark,
      (0L until 20L).map(i => (i, s"u$i")).toDF("id", "name")
        .coalesce(1), loc)
    IcebergLite.exportEqualityDeletes(spark,
      Seq(3L, 4L).toDF("id"), loc)
    // re-insert id=3 AFTER the delete: it must survive (newer seq)
    IcebergLite.appendManifest(spark,
      Seq((3L, "u3b")).toDF("id", "name"), loc)
    val got = IcebergLite.read(spark, loc).select("id").as[Long]
      .collect().sorted.toSeq
    assert(got === ((0L until 20L).filterNot(Set(3L, 4L)) :+ 3L).sorted)
    // the fold resolved sequences from the manifest list's
    // sequence_number field, not the snapshot-id proxy
    val snap = IcebergLite.snapshot(spark, loc)
    assert(snap.eqDeletes.map(_.seq) === Seq(2L))
  }

  test("transform-partitioned APPEND: new files land with computed " +
    "tuples and prune alongside the originals; the partition spec " +
    "survives manifest-reuse commits; plain appends stay " +
    "conservative, not wrong") {
    import spark.implicits._
    val loc = tmp("append")
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    def day(d: Int, ids: Range) = ids.map { i =>
      (i.toLong, base.plusSeconds(d * 86400L + (i % 24) * 3600L))
    }.toDF("id", "ts").coalesce(1)
    IcebergLite.exportTransformPartitioned(spark, day(0, 0 until 48),
      loc, Seq("ts" -> "day"))
    // spec-aware append: day 5's rows arrive later
    IcebergLite.appendTransformPartitioned(spark, day(5, 100 until 124),
      loc)
    val snap = IcebergLite.snapshot(spark, loc)
    assert(snap.specFields.map(_.transform.toString) === Seq("day"))
    assert(snap.files.length === 2)
    // the appended day prunes to exactly its own file
    val (hit, scanned, total) = IcebergLite.readTransformPruned(
      spark, loc, "ts",
      java.time.Instant.parse("2024-03-06T00:00:00Z"),
      java.time.Instant.parse("2024-03-06T23:59:59Z"))
    assert((scanned, total) === ((1, 2)))
    assert(hit.count() === 24L)
    // a PLAIN append carries the spec but no tuple: its file keeps
    // conservatively, and every row still serves
    IcebergLite.appendManifest(spark, day(9, 200 until 212), loc)
    val snap2 = IcebergLite.snapshot(spark, loc)
    assert(snap2.specFields.nonEmpty,
      "manifest-reuse commits must carry the partition spec")
    val (h2, s2, t2) = IcebergLite.readTransformPruned(
      spark, loc, "ts",
      java.time.Instant.parse("2024-03-06T00:00:00Z"),
      java.time.Instant.parse("2024-03-06T23:59:59Z"))
    // day-5 file + the tuple-less day-9 file (conservative keep)
    assert((s2, t2) === ((2, 3)))
    assert(h2.count() === 24L)
    assert(IcebergLite.read(spark, loc).count() === 84L)
    // a position delete masks through the TRANSFORM-pruned scan too
    // (per-file soundness — same contract as readPruned)
    val delPos = spark.read.parquet(snap2.files: _*)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("pos"), col("id"))
      .filter(col("id") === 103L).select("file_path", "pos")
    IcebergLite.exportPositionDeletes(spark, delPos, loc)
    val (h3, s3, _) = IcebergLite.readTransformPruned(
      spark, loc, "ts",
      java.time.Instant.parse("2024-03-06T00:00:00Z"),
      java.time.Instant.parse("2024-03-06T23:59:59Z"))
    assert(s3 === 2 && h3.count() === 23L)
    assert(!h3.select("id").as[Long].collect().contains(103L))
    // appending to an unpartitioned table refuses by name
    val loc2 = tmp("append-unpart")
    IcebergLite.export(spark, day(0, 0 until 5), loc2)
    val e = intercept[IllegalArgumentException](
      IcebergLite.appendTransformPartitioned(spark,
        day(1, 10 until 15), loc2))
    assert(e.getMessage.contains("no partition spec"))
  }

  test("bounds pruning over delete-bearing snapshots masks exactly " +
    "like the full read (position + equality tiers), and a pruned-" +
    "away range stays empty") {
    import spark.implicits._
    val loc = tmp("prunedel")
    // 4 one-file range buckets of 25 keys each
    (0L until 4L).foreach { b =>
      val part = (b * 25 until (b + 1) * 25).map(i => (i, i * 2L))
        .toDF("k", "v").coalesce(1)
      if (b == 0) IcebergLite.export(spark, part, loc)
      else IcebergLite.appendManifest(spark, part, loc)
    }
    val files = IcebergLite.snapshot(spark, loc).files
    val delPos = spark.read.parquet(files: _*)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("pos"), col("k"))
      .filter(col("k") % 10 === 3).select("file_path", "pos")
    IcebergLite.exportPositionDeletes(spark, delPos, loc)
    IcebergLite.exportEqualityDeletes(spark, Seq(30L, 31L).toDF("k"), loc)
    val (rows, scanned, total) =
      IcebergLite.readPruned(spark, loc, "k", 26L, 60L)
    assert((scanned, total) === ((2, 4)))
    val got = rows.select("k").as[Long].collect().sorted.toSeq
    val full = IcebergLite.read(spark, loc)
      .filter(col("k").between(26L, 60L))
      .select("k").as[Long].collect().sorted.toSeq
    assert(got === full)
    assert(got === (26L to 60L)
      .filterNot(k => k % 10 == 3 || k == 30L || k == 31L))
    // a fully-pruned range is empty without touching a delete join
    val (none, s0, _) = IcebergLite.readPruned(spark, loc, "k", 500L, 600L)
    assert(s0 === 0 && none.count() === 0L)
  }
}
