package graft.sources

import scala.collection.mutable
import scala.util.Random

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Conformance FUZZER for the open-format stacks: random op chains
  * {overwrite, append, position/equality delete, deletion vector,
  * rename, checkpoint, purge, vacuum, expire} driven through
  * [[DeltaLite]] and [[IcebergLite]], each step re-read through the
  * full protocol walk and checked live==model (a driver-side
  * id→value map that applies the op's SPEC semantics). The r11 class
  * of soundness gap — checkpoint-dropped configuration, delete
  * ordering, DV replace-vs-merge — lived exactly in op-chain
  * interactions no single-scenario spec exercised; random chains
  * with a deterministic seed walk that interaction space every
  * build. Chain ends additionally audit TIME TRAVEL: every recorded
  * (version → model) pair still resolves (unless retention
  * legitimately dropped it).
  */
class FormatFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-fuzz-$tag").toString

  /** Rows as (id, v); ids are unique-forever per chain unless an op
    * deliberately re-inserts (the upsert pattern). */
  private def frame(rows: Seq[(Long, Long)], idName: String = "id",
                    vName: String = "v"): DataFrame = {
    import spark.implicits._
    rows.toDF(idName, vName)
  }

  /** Collected live state as id→v, resolving the value column by
    * POSITION (column 0 = id, column 1 = value) so renames don't
    * change the read. */
  private def liveMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def checkState(tag: String, df: DataFrame,
                         model: Map[Long, Long],
                         idName: String, vName: String): Unit = {
    assert(df.columns.toSeq == Seq(idName, vName),
      s"$tag: schema ${df.columns.toSeq} != ${Seq(idName, vName)}")
    val live = liveMap(df)
    assert(live == model,
      s"$tag: live != model; only-live=${(live.toSet -- model.toSet).take(5)} " +
        s"only-model=${(model.toSet -- live.toSet).take(5)}")
  }

  // ── Delta chains ───────────────────────────────────────────────────

  private def deltaChain(chainId: Int, idMapped: Boolean): Unit = {
    val rnd = new Random(0xC0FFEE + chainId)
    val t = tmp(s"delta$chainId")
    var nextId = 0L
    def fresh(n: Int): Seq[(Long, Long)] = {
      val rows = (nextId until nextId + n).map(i => (i, rnd.nextLong(1000)))
      nextId += n
      rows
    }
    var vName = "v"
    var model: Map[Long, Long] = fresh(5 + rnd.nextInt(10)).toMap
    if (idMapped)
      DeltaLite.createIdMapped(spark, frame(model.toSeq.sortBy(_._1)), t)
    else
      DeltaLite.export(spark, frame(model.toSeq.sortBy(_._1)), t)
    // version → (model, vName) for the time-travel audit
    val history = mutable.ArrayBuffer[(Long, Map[Long, Long], String)]()
    var vacuumed = false
    def version = DeltaLite.snapshot(spark, t).version
    history += ((version, model, vName))
    val nOps = 4 + rnd.nextInt(3)
    (0 until nOps).foreach { step =>
      val tag = s"delta chain $chainId (idMapped=$idMapped) step $step"
      rnd.nextInt(7) match {
        case 0 => // overwrite (fresh tables only for id-mapped create)
          val rows = fresh(3 + rnd.nextInt(8))
          DeltaLite.export(spark, frame(rows, "id", vName), t)
          model = rows.toMap
        case 1 => // append
          val rows = fresh(3 + rnd.nextInt(8))
          DeltaLite.exportAppend(spark, frame(rows, "id", vName), t)
          model = model ++ rows
        case 2 => // deletion vector on one live file
          val snap = DeltaLite.snapshot(spark, t)
          val rel = snap.files(rnd.nextInt(snap.files.length))
          val abs = new Path(t, rel).toString
          // physical column name of id (id-mapped files store col-1)
          val physId = snap.schema.flatMap(_.fields.headOption).map { f =>
            if (f.metadata.contains("delta.columnMapping.physicalName"))
              f.metadata.getString("delta.columnMapping.physicalName")
            else f.name
          }.getOrElse("id")
          val inFile = spark.read.parquet(abs)
            .select(col("_metadata.row_index").as("pos"),
              col(s"`$physId`").as("id"))
            .collect().map(r => r.getLong(0) -> r.getLong(1))
          if (inFile.nonEmpty) {
            val chosen = inFile.filter(_ => rnd.nextBoolean())
            if (chosen.nonEmpty) {
              DeltaLite.commitDeletionVectors(spark, t,
                Map(rel -> chosen.map(_._1)),
                inlineThreshold = if (rnd.nextBoolean()) 512 else 0)
              model = model -- chosen.map(_._2)
            }
          }
        case 3 => // rename the value column (metadata only)
          val to = s"v$step"
          DeltaLite.renameColumn(spark, t, vName, to)
          vName = to
        case 4 => // checkpoint: no semantic change (layout drawn
          // randomly — classic or the v2 UUID/sidecar layout)
          DeltaLite.checkpoint(spark, t, v2Layout = rnd.nextBoolean())
        case 5 => // purge DVs: rows identical, descriptors gone
          DeltaLite.purgeDeletionVectors(spark, t)
          assert(DeltaLite.snapshot(spark, t).deletionVectors.isEmpty,
            s"$tag: purge left descriptors")
        case 6 => // checkpoint + vacuum: live state unchanged,
          // history before the checkpoint legitimately gone
          DeltaLite.checkpoint(spark, t, v2Layout = rnd.nextBoolean())
          DeltaLite.vacuum(spark, t)
          vacuumed = true
      }
      checkState(tag, DeltaLite.read(spark, t), model, "id", vName)
      history += ((version, model, vName))
    }
    // time-travel audit: every recorded version still serves its
    // recorded state (vacuum legitimately drops pre-checkpoint
    // history, so only the live tail is audited after one)
    if (!vacuumed) history.groupBy(_._1).foreach {
      case (v, states) =>
        val (_, m, vn) = states.last // last model recorded AT v
        checkState(s"delta chain $chainId time-travel v$v",
          DeltaLite.read(spark, t, Some(v)), m, "id", vn)
    }
  }

  test("delta: 60 random op chains, live==model after every op") {
    (0 until 60).foreach(i => deltaChain(i, idMapped = false))
  }

  test("delta id-mapped: 40 random op chains (field-id resolution " +
    "preserved across append/DV/rename/purge)") {
    (100 until 140).foreach(i => deltaChain(i, idMapped = true))
  }

  // ── Iceberg chains ─────────────────────────────────────────────────

  private def icebergChain(chainId: Int): Unit = {
    val rnd = new Random(0x1CEB00 + chainId)
    val loc = tmp(s"ice$chainId")
    var nextId = 0L
    def fresh(n: Int): Seq[(Long, Long)] = {
      val rows = (nextId until nextId + n).map(i => (i, rnd.nextLong(1000)))
      nextId += n
      rows
    }
    var vName = "v"
    // ROW-level model: live (file_path, pos) → (id, v). Position
    // deletes must target LIVE rows — a raw-file row already masked
    // by an earlier equality delete is not the live copy of its id
    // (the upsert pattern leaves both in the files), so an id→v map
    // alone can't model pos-delete choice.
    val live = mutable.Map[(String, Long), (Long, Long)]()
    // manifests store qualified paths; _metadata.file_path may differ
    // in slash count — the ingested-set compares normalized
    def norm(p: String): String = new Path(p).toUri.getPath
    val ingested = mutable.Set[String]()
    def ingest(files: Seq[String]): Unit = {
      val newF = files.filterNot(f => ingested.contains(norm(f)))
      if (newF.nonEmpty) {
        newF.foreach(f => ingested += norm(f))
        spark.read.parquet(newF: _*)
          .select(col("_metadata.file_path").as("fp"),
            col("_metadata.row_index").as("pos"),
            col("id"), col(s"`$vName`").as("v"))
          .collect().foreach { r =>
            live((r.getString(0), r.getLong(1))) =
              (r.getLong(2), r.getLong(3))
          }
      }
    }
    def model: Map[Long, Long] = live.values.toMap
    val first = fresh(5 + rnd.nextInt(10))
    IcebergLite.export(spark, frame(first), loc)
    ingest(IcebergLite.snapshot(spark, loc).files)
    val history = mutable.ArrayBuffer[(Long, Map[Long, Long], String)]()
    def snapId = IcebergLite.snapshot(spark, loc).snapshotId
    history += ((snapId, model, vName))
    var expired = false
    val debug = sys.env.contains("FUZZ_DEBUG")
    val nOps = 4 + rnd.nextInt(3)
    (0 until nOps).foreach { step =>
      val tag = s"iceberg chain $chainId step $step"
      val op = rnd.nextInt(8)
      if (debug) println(s"FUZZ $tag op=$op model=$model")
      op match {
        case 0 => // overwrite replaces everything, deletes moot
          val rows = fresh(3 + rnd.nextInt(8))
          IcebergLite.export(spark, frame(rows, "id", vName), loc,
            overwrite = true)
          live.clear()
          ingested.clear()
          ingest(IcebergLite.snapshot(spark, loc).files)
        case 1 => // append delta snapshot
          val rows = fresh(3 + rnd.nextInt(8))
          IcebergLite.appendManifest(spark, frame(rows, "id", vName), loc)
          ingest(IcebergLite.snapshot(spark, loc).files)
        case 2 => // position deletes against LIVE rows
          val chosen = live.keys.toSeq.sortBy(k => (k._1, k._2))
            .filter(_ => rnd.nextInt(3) == 0)
          if (chosen.nonEmpty) {
            import spark.implicits._
            IcebergLite.exportPositionDeletes(spark,
              chosen.toDF("file_path", "pos"), loc)
            chosen.foreach(live.remove)
          }
        case 3 => // equality deletes by id — the upsert delete half;
          // only OLDER-sequence rows mask, so a later append of the
          // same id survives (case 1 after this re-adds freely)
          if (live.nonEmpty) {
            val ids = model.keys.toSeq.sorted.filter(_ => rnd.nextBoolean())
            if (ids.nonEmpty) {
              import spark.implicits._
              IcebergLite.exportEqualityDeletes(spark,
                ids.toDF("id"), loc)
              live.filterInPlace { case (_, (id, _)) => !ids.contains(id) }
            }
          }
        case 4 => // upsert: eq-delete then re-insert same ids, new values
          if (live.nonEmpty) {
            val ids = model.keys.toSeq.sorted.take(1 + rnd.nextInt(3))
            import spark.implicits._
            IcebergLite.exportEqualityDeletes(spark, ids.toDF("id"), loc)
            live.filterInPlace { case (_, (id, _)) => !ids.contains(id) }
            val rows = ids.map(i => (i, rnd.nextLong(1000)))
            IcebergLite.appendManifest(spark,
              frame(rows, "id", vName), loc)
            ingest(IcebergLite.snapshot(spark, loc).files)
          }
        case 5 => // rename the value column (metadata only)
          val to = s"v$step"
          IcebergLite.renameColumn(spark, loc, vName, to)
          vName = to
        case 6 => // retention: expire all but the latest snapshots
          val keep = 1 + rnd.nextInt(2)
          IcebergLite.expireSnapshots(spark, loc, keep)
          expired = true
        case 7 => // manifest compaction: pure metadata, rows identical
          IcebergLite.rewriteManifests(spark, loc)
          assert(IcebergLite.manifestCount(spark, loc) <= 2,
            s"$tag: rewriteManifests left more than data+delete")
      }
      checkState(tag, IcebergLite.read(spark, loc), model, "id", vName)
      history += ((snapId, model, vName))
    }
    // time-travel audit: rows must match each snapshot's recorded
    // state; column NAMES follow the CURRENT metadata (this reader
    // serves the live schema for historical snapshots — renames are
    // metadata-wide, unlike Delta's log-fold-capped schema), so the
    // final vName applies to every snapshot.
    if (!expired) history.groupBy(_._1).foreach {
      case (s, states) =>
        val (_, m, _) = states.last
        checkState(s"iceberg chain $chainId time-travel snap $s",
          IcebergLite.read(spark, loc, Some(s)), m, "id", vName)
    }
  }

  test("iceberg: 100 random op chains, live==model after every op") {
    (0 until 100).foreach(icebergChain)
  }

  // ── Iceberg v3 deletion-vector chains ──────────────────────────────

  /** v3 chains: the full op alphabet {append, position delete,
    * equality delete, upsert, rewriteManifests, Puffin DV commit,
    * expire} interleaved in one chain. The chain starts v2; the first
    * DV commit upgrades it (one-way). POST-upgrade, append / equality
    * delete / upsert stay ACTIVE (v3-legal writes re-emitting v3
    * metadata), while position-delete FILES and rewriteManifests must
    * REFUSE BY NAME with the table untouched — so both the live v3
    * write matrix and the refusal matrix are fuzzed. The decisive
    * interaction class (the r11 lesson): pre-upgrade eq/pos delete
    * files and DVs must keep masking exactly their rows across later
    * v3 appends, eq-deletes, further DV merges, and snapshot expiry;
    * every step re-reads through the full protocol walk and checks
    * live==model. Chains that never drew a DV op take a forced DV
    * commit + expire at the end, so every chain is v3-bearing by
    * construction. */
  private def icebergV3Chain(chainId: Int): Unit = {
    val rnd = new Random(0xD511 + chainId)
    val loc = tmp(s"icev3-$chainId")
    var nextId = 0L
    def fresh(n: Int): Seq[(Long, Long)] = {
      val rows = (nextId until nextId + n).map(i => (i, rnd.nextLong(1000)))
      nextId += n
      rows
    }
    // row-level model, as the v2 chains: live (file_path, pos) → (id, v)
    val live = mutable.Map[(String, Long), (Long, Long)]()
    def norm(p: String): String = new Path(p).toUri.getPath
    val ingested = mutable.Set[String]()
    def ingest(files: Seq[String]): Unit = {
      val newF = files.filterNot(f => ingested.contains(norm(f)))
      if (newF.nonEmpty) {
        newF.foreach(f => ingested += norm(f))
        spark.read.parquet(newF: _*)
          .select(col("_metadata.file_path").as("fp"),
            col("_metadata.row_index").as("pos"),
            col("id"), col("v"))
          .collect().foreach { r =>
            live((r.getString(0), r.getLong(1))) =
              (r.getLong(2), r.getLong(3))
          }
      }
    }
    def model: Map[Long, Long] = live.values.toMap
    IcebergLite.export(spark, frame(fresh(10 + rnd.nextInt(20))), loc)
    ingest(IcebergLite.snapshot(spark, loc).files)
    var upgraded = false
    def check(tag: String): Unit =
      checkState(tag, IcebergLite.read(spark, loc), model, "id", "v")
    // a post-upgrade v2-only writer must refuse by name AND leave the
    // table byte-identical in effect (same live read)
    def refusesByName(tag: String, frag: String)(op: => Any): Unit = {
      val e = intercept[Exception](op)
      assert(e.getMessage != null && e.getMessage.contains(frag),
        s"$tag: expected refusal naming '$frag', got: ${e.getMessage}")
      check(s"$tag post-refusal")
    }
    def dvCommit(tag: String): Unit = {
      val chosen = live.keys.toSeq.sortBy(k => (k._1, k._2))
        .filter(_ => rnd.nextInt(3) == 0)
      if (chosen.nonEmpty) {
        IcebergLite.exportDeletionVectors(spark, loc,
          chosen.groupBy(_._1).map { case (f, ks) =>
            f -> ks.map(_._2).toArray
          })
        chosen.foreach(live.remove)
        upgraded = true
      }
    }
    val nOps = 5 + rnd.nextInt(3)
    (0 until nOps).foreach { step =>
      val tag = s"iceberg v3 chain $chainId step $step upgraded=$upgraded"
      rnd.nextInt(7) match {
        case 0 => // append: v3-legal — stays active after the upgrade
          val rows = fresh(3 + rnd.nextInt(6))
          IcebergLite.appendManifest(spark, frame(rows), loc)
          ingest(IcebergLite.snapshot(spark, loc).files)
        case 1 => // position deletes: v3 forbids new pos-delete FILES
          val chosen = live.keys.toSeq.sortBy(k => (k._1, k._2))
            .filter(_ => rnd.nextInt(3) == 0)
          if (chosen.nonEmpty) {
            import spark.implicits._
            if (upgraded)
              refusesByName(tag, "deletion vectors")(
                IcebergLite.exportPositionDeletes(spark,
                  chosen.toDF("file_path", "pos"), loc))
            else {
              IcebergLite.exportPositionDeletes(spark,
                chosen.toDF("file_path", "pos"), loc)
              chosen.foreach(live.remove)
            }
          }
        case 2 => // equality deletes by id (older-sequence masking;
          // v3-legal — masks DV survivors and pre-upgrade rows alike)
          if (live.nonEmpty) {
            val ids = model.keys.toSeq.sorted.filter(_ => rnd.nextBoolean())
            if (ids.nonEmpty) {
              import spark.implicits._
              IcebergLite.exportEqualityDeletes(spark, ids.toDF("id"), loc)
              live.filterInPlace { case (_, (id, _)) =>
                !ids.contains(id)
              }
            }
          }
        case 3 => // upsert (eq-delete + append) — active in both phases
          if (live.nonEmpty) {
            val ids = model.keys.toSeq.sorted.take(1 + rnd.nextInt(3))
            import spark.implicits._
            IcebergLite.exportEqualityDeletes(spark, ids.toDF("id"), loc)
            live.filterInPlace { case (_, (id, _)) => !ids.contains(id) }
            val rows = ids.map(i => (i, rnd.nextLong(1000)))
            IcebergLite.appendManifest(spark, frame(rows), loc)
            ingest(IcebergLite.snapshot(spark, loc).files)
          }
        case 4 => // manifest compaction: metadata-only pre-upgrade,
          // locator-field refusal after
          if (upgraded)
            refusesByName(tag, "cannot rewrite manifests")(
              IcebergLite.rewriteManifests(spark, loc))
          else
            IcebergLite.rewriteManifests(spark, loc)
        case 5 => // Puffin DV commit — first one upgrades to v3;
          // later ones MERGE into the standing DV per file
          dvCommit(tag)
        case 6 => // retention: current snapshot must keep serving
          IcebergLite.expireSnapshots(spark, loc, 1 + rnd.nextInt(2))
      }
      check(tag)
    }
    // every chain ends v3-bearing: force the upgrade if the draw
    // never took it (re-seeding rows first if the chain deleted
    // everything), then an expire over the DV-bearing history
    if (!upgraded && live.isEmpty) {
      IcebergLite.appendManifest(spark, frame(fresh(5)), loc)
      ingest(IcebergLite.snapshot(spark, loc).files)
    }
    while (!upgraded)
      dvCommit(s"iceberg v3 chain $chainId forced-upgrade")
    check(s"iceberg v3 chain $chainId post-upgrade")
    IcebergLite.expireSnapshots(spark, loc, 1)
    check(s"iceberg v3 chain $chainId post-expire")
  }

  test("iceberg v3: 100 interleaved chains (append/eq/pos-delete/" +
    "upsert/rewriteManifests/puffin-DV/expire), live==model after " +
    "every op, v2-only writers refuse by name post-upgrade") {
    (0 until 100).foreach(icebergV3Chain)
  }
}
