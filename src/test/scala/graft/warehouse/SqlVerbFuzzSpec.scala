package graft.warehouse

import scala.collection.mutable
import scala.util.Random

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Conformance FUZZER for the SQL verb surface: random statement
  * chains over {COPY INTO (incremental / no-op / forced), INSERT
  * INTO, INSERT OVERWRITE, TRUNCATE TABLE, UPDATE, DELETE, MERGE
  * (upsert / full-sync / update-only / explicit-assignment),
  * RESTORE, OPTIMIZE, VACUUM, ALTER ADD IDENTITY, SET/UNSET
  * TBLPROPERTIES} driven through
  * [[GraftSql.sql]] against a registered versioned table, with a
  * driver-side model applying each verb's SPEC semantics. Live==model
  * after every step; chain ends audit TIME TRAVEL (every recorded
  * version still resolves to its recorded state) and the CHANGE FEED
  * (the apply invariant `read(v') ≡ read(v) ∖ {pre, delete} ⊎ {post,
  * insert}` over every recorded version pair whose range carries a
  * feed — physical publishes refuse loudly and are skipped, which is
  * their contract).
  *
  * The r12 and r14 format fuzzers each caught a real bug that the
  * directed specs missed — soundness gaps live in op INTERLEAVINGS
  * (a restore underneath a copy ledger, a merge after an overwrite,
  * an identity column added mid-chain). This walks that interaction
  * space for the DML/ingestion verbs with a deterministic seed.
  */
class SqlVerbFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-sqlfuzz-$tag")
      .toString

  /** Model row: id → (g, x). The id is unique-forever per chain (a
    * fresh-id counter), so a map is a faithful multiset. */
  private type Model = Map[Long, (String, Long)]

  private def frame(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "g", "x")
  }

  private def liveModel(root: String): Model =
    VersionedParquet.read(spark, root).select("id", "g", "x")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  /** One chain: seeded random verb walk, live==model per step, time
    * travel + change feed audit at the end. Returns the op trace for
    * the failure message. */
  private def runChain(chainId: Int, steps: Int): Unit = {
    val rnd = new Random(0xC0FFEE + chainId)
    val name = s"t_fz$chainId"
    val dir = tmp(s"c$chainId")
    val root = s"$dir/t"
    val landing = s"$dir/landing"
    new java.io.File(landing).mkdirs()
    GraftTables.register(name, root, keepVersions = 60)
    val trace = mutable.ListBuffer.empty[String]
    var nextId = 1000L // fresh-id counter; seeds use 0..19
    var model: Model =
      (0L until 20L).map(i => i -> (s"g${i % 3}", i * 10)).toMap
    VersionedParquet.publish(frame(
      model.toSeq.map { case (id, (g, x)) => (id, g, x) }), root,
      keepVersions = 60)
    // landing-file ledger mirror: path → rows it carries
    val landingRows = mutable.Map.empty[String, Seq[(Long, String, Long)]]
    var landingSeq = 0
    var identityCol: Option[String] = None
    // TBLPROPERTIES model: table-level, so RESTORE/TRUNCATE/OVERWRITE
    // must never touch it — live==model per step proves that
    val propsModel = mutable.Map.empty[String, String]
    // version → model at that version (the restore / time-travel pool;
    // cleared at ALTER ADD IDENTITY because pre-identity snapshots
    // restore to a pre-identity schema)
    val history = mutable.LinkedHashMap.empty[Long, Model]
    def ver(): Long =
      VersionedParquet.currentVersion(spark, root).getOrElse(
        fail(s"chain $chainId: no live version"))
    def record(): Unit = history(ver()) = model
    record()

    def freshRows(n: Int): Seq[(Long, String, Long)] =
      (0 until n).map { _ =>
        val id = nextId; nextId += 1
        (id, s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toLong)
      }

    def check(tag: String): Unit = {
      val live = liveModel(root)
      assert(live == model,
        s"chain $chainId after [$tag] (trace: ${trace.mkString(" → ")}): " +
          s"live≠model only-live=${(live.toSet -- model.toSet).take(5)} " +
          s"only-model=${(model.toSet -- live.toSet).take(5)}")
      identityCol.foreach { c =>
        val idv = VersionedParquet.read(spark, root)
          .select(c).collect().map(r => Option(r.get(0)))
        assert(idv.forall(_.isDefined),
          s"chain $chainId [$tag]: identity column $c carries NULLs")
        assert(idv.flatten.distinct.length == idv.length,
          s"chain $chainId [$tag]: identity column $c carries dupes")
      }
      val liveProps = GraftSql.sql(spark, s"SHOW TBLPROPERTIES $name")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(liveProps == propsModel.toMap,
        s"chain $chainId after [$tag]: TBLPROPERTIES live=$liveProps " +
          s"≠ model=$propsModel (trace: ${trace.mkString(" → ")})")
    }

    def copyInto(forceAfterTruncate: Boolean): String = {
      if (forceAfterTruncate) {
        // the verb's documented escape hatch: ledger remembers, table
        // is empty, force re-ingests every landing file
        val r = GraftSql.sql(spark,
          s"COPY INTO $name FROM '$landing' FILEFORMAT = parquet " +
            "COPY_OPTIONS ('force'='true')").head()
        val allRows = landingRows.values.flatten.toSeq
        assert(r.getLong(1) == landingRows.size.toLong,
          s"chain $chainId: force loaded ${r.getLong(1)} files, " +
            s"expected ${landingRows.size}")
        model = model ++ allRows.map(t => t._1 -> (t._2, t._3))
        "copy_force"
      } else if (rnd.nextBoolean() || landingRows.isEmpty) {
        // land 1-2 new files, ingest — only they load
        val nf = 1 + rnd.nextInt(2)
        val newFiles = (0 until nf).map { _ =>
          val rows = freshRows(1 + rnd.nextInt(3))
          val p = s"$landing/f$landingSeq"; landingSeq += 1
          frame(rows).coalesce(1).write.parquet(p)
          landingRows(p) = rows
          rows
        }
        val before = landingRows.size - nf
        val r = GraftSql.sql(spark,
          s"COPY INTO $name FROM '$landing' FILEFORMAT = parquet").head()
        assert(r.getLong(1) == nf.toLong && r.getLong(2) == before.toLong,
          s"chain $chainId: copy loaded ${r.getLong(1)}/skipped " +
            s"${r.getLong(2)} (expected $nf/$before)")
        model = model ++
          newFiles.flatten.map(t => t._1 -> (t._2, t._3))
        "copy_new"
      } else {
        // nothing new landed: the re-run must be a 0-loaded no-op
        val r = GraftSql.sql(spark,
          s"COPY INTO $name FROM '$landing' FILEFORMAT = parquet").head()
        assert(r.getLong(1) == 0L,
          s"chain $chainId: idempotent re-run loaded ${r.getLong(1)}")
        "copy_noop"
      }
    }

    def step(): String = {
      val preIdentity = identityCol.isEmpty
      val choice = rnd.nextInt(if (preIdentity) 16 else 8)
      (preIdentity, choice) match {
        case (true, 13) | (false, 7) => // SET/UNSET TBLPROPERTIES
          if (propsModel.nonEmpty && rnd.nextBoolean()) {
            val k = propsModel.keys.toSeq.sorted.apply(
              rnd.nextInt(propsModel.size))
            GraftSql.sql(spark,
              s"ALTER TABLE $name UNSET TBLPROPERTIES ('$k')")
            propsModel.remove(k)
            s"unset_prop($k)"
          } else {
            val k = s"p${rnd.nextInt(4)}"
            val v = s"v${rnd.nextInt(100)}"
            GraftSql.sql(spark,
              s"ALTER TABLE $name SET TBLPROPERTIES ('$k'='$v')")
            propsModel(k) = v
            s"set_prop($k=$v)"
          }
        case (true, 14) => // MERGE without INSERT: update-only, strays
          // in the source must NOT land (Delta's omitted-clause rule)
          val matched = rnd.shuffle(model.keys.toSeq)
            .take(1 + rnd.nextInt(3))
            .map(id => (id, s"u${rnd.nextInt(3)}",
              rnd.nextInt(1000).toLong))
          val src = matched ++ freshRows(1 + rnd.nextInt(2))
          frame(src).createOrReplaceTempView("fz_uo")
          GraftSql.sql(spark,
            s"""MERGE INTO $name t USING (SELECT * FROM fz_uo) s
               |ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
          model = model ++ matched.map(t => t._1 -> (t._2, t._3))
          s"merge_update_only(${matched.size}+${src.size - matched.size})"
        case (true, 15) => // explicit-assignment MERGE: both-side refs
          val matched = rnd.shuffle(model.keys.toSeq)
            .take(rnd.nextInt(3))
          val delta = 1L + rnd.nextInt(50)
          val fresh = freshRows(1 + rnd.nextInt(2))
          val src = matched.map(id => (id, "z", delta)) ++ fresh
          frame(src).createOrReplaceTempView("fz_asg")
          GraftSql.sql(spark,
            s"""MERGE INTO $name t USING (SELECT * FROM fz_asg) s
               |ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET x = t.x + s.x
               |WHEN NOT MATCHED THEN INSERT (id, g, x)
               |VALUES (s.id, s.g, s.x)""".stripMargin)
          model = model.map { case (id, (g, x)) =>
            if (matched.contains(id)) id -> (g, x + delta)
            else id -> (g, x)
          } ++ fresh.map(t => t._1 -> (t._2, t._3))
          s"merge_assign(${matched.size}+${fresh.size})"
        case (true, 0) | (false, 0) => // UPDATE arithmetic, pred on id
          val (m, k) = (2 + rnd.nextInt(3), rnd.nextInt(50).toLong)
          val r = rnd.nextInt(m)
          GraftSql.sql(spark,
            s"UPDATE $name SET x = x + $k WHERE id % $m = $r")
          model = model.map { case (id, (g, x)) =>
            id -> (g, if (id % m == r) x + k else x) }
          s"update(x+$k where id%$m=$r)"
        case (true, 1) | (false, 1) => // UPDATE string + pred on x
          val t = rnd.nextInt(500).toLong
          GraftSql.sql(spark,
            s"UPDATE $name SET g = upper(g) WHERE x < $t")
          model = model.map { case (id, (g, x)) =>
            id -> (if (x < t) g.toUpperCase else g, x) }
          s"update(g=upper where x<$t)"
        case (true, 2) | (false, 2) => // DELETE
          val t = rnd.nextInt(800).toLong
          GraftSql.sql(spark, s"DELETE FROM $name WHERE x > $t")
          model = model.filter { case (_, (_, x)) => x <= t }
          s"delete(x>$t)"
        case (true, 3) | (false, 3) => // OPTIMIZE: physical only
          GraftSql.sql(spark, s"OPTIMIZE $name")
          "optimize"
        case (true, 4) | (false, 4) => // VACUUM far above chain depth
          GraftSql.sql(spark, s"VACUUM $name RETAIN 55 VERSIONS")
          "vacuum"
        case (true, 5) | (false, 5) => // RESTORE to a recorded version
          if (history.size < 2) "restore_skipped"
          else {
            val vs = history.keys.toSeq
            val v = vs(rnd.nextInt(vs.size))
            GraftSql.sql(spark,
              s"RESTORE TABLE $name TO VERSION AS OF $v")
            model = history(v)
            s"restore($v)"
          }
        case (true, 6) | (false, 6) => // INSERT INTO (append; identity ok)
          val rows = freshRows(1 + rnd.nextInt(4))
          frame(rows).createOrReplaceTempView("fz_ins")
          GraftSql.sql(spark,
            s"INSERT INTO $name SELECT id, g, x FROM fz_ins")
          model = model ++ rows.map(t => t._1 -> (t._2, t._3))
          s"insert(${rows.size})"
        case (true, 7) => // MERGE upsert: half existing, half fresh
          val existing = rnd.shuffle(model.keys.toSeq)
            .take(rnd.nextInt(3))
            .map(id => (id, s"m${rnd.nextInt(3)}",
              rnd.nextInt(1000).toLong))
          val merged = existing ++ freshRows(1 + rnd.nextInt(3))
          frame(merged).createOrReplaceTempView("fz_mrg")
          GraftSql.sql(spark,
            s"""MERGE INTO $name t USING (SELECT * FROM fz_mrg) s
               |ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          model = model ++ merged.map(t => t._1 -> (t._2, t._3))
          s"merge(${merged.size})"
        case (true, 8) => // INSERT OVERWRITE: wholesale row replace
          val rows = freshRows(3 + rnd.nextInt(5))
          frame(rows).createOrReplaceTempView("fz_ovr")
          GraftSql.sql(spark,
            s"INSERT OVERWRITE $name SELECT id, g, x FROM fz_ovr")
          model = rows.map(t => t._1 -> (t._2, t._3)).toMap
          s"overwrite(${rows.size})"
        case (true, 9) => // TRUNCATE (ledger survives — its contract)
          GraftSql.sql(spark, s"TRUNCATE TABLE $name")
          model = Map.empty
          // maybe follow with the forced re-ingest the ledger
          // semantics exist to make explicit
          if (landingRows.nonEmpty && rnd.nextBoolean()) {
            val tag = copyInto(forceAfterTruncate = true)
            s"truncate→$tag"
          } else "truncate"
        case (true, 10) => copyInto(forceAfterTruncate = false)
        case (true, 12) => // full-sync MERGE: table := source exactly
          val kept = rnd.shuffle(model.toSeq).take(model.size / 2)
            .map { case (id, (g, x)) =>
              if (rnd.nextBoolean()) (id, g, x + 11) else (id, g, x) }
          val synced = kept ++ freshRows(1 + rnd.nextInt(3))
          frame(synced).createOrReplaceTempView("fz_sync")
          GraftSql.sql(spark,
            s"""MERGE INTO $name t USING (SELECT * FROM fz_sync) s
               |ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *
               |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
          model = synced.map(t => t._1 -> (t._2, t._3)).toMap
          s"merge_sync(${synced.size})"
        case (true, 11) =>
          // ALTER ADD IDENTITY, at most once per chain — the verb's
          // CREATE-time contract requires an empty table, so the op
          // is the truncate→alter→repopulate sequence a user runs
          GraftSql.sql(spark, s"TRUNCATE TABLE $name")
          model = Map.empty
          GraftSql.sql(spark, s"ALTER TABLE $name ADD COLUMN rid " +
            "BIGINT GENERATED ALWAYS AS IDENTITY")
          identityCol = Some("rid")
          // pre-identity snapshots restore to a pre-identity world;
          // keep the audit pool consistent by starting it fresh
          history.clear()
          val rows = freshRows(2 + rnd.nextInt(3))
          frame(rows).createOrReplaceTempView("fz_idseed")
          GraftSql.sql(spark,
            s"INSERT INTO $name SELECT id, g, x FROM fz_idseed")
          model = rows.map(t => t._1 -> (t._2, t._3)).toMap
          "alter_identity"
        case _ => "noop"
      }
    }

    (1 to steps).foreach { _ =>
      val tag = step()
      trace += tag
      check(tag)
      record()
    }

    // ── chain-end TIME TRAVEL audit ────────────────────────────────
    history.foreach { case (v, m) =>
      val at = VersionedParquet.read(spark, root, Some(v))
        .select("id", "g", "x").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(at == m,
        s"chain $chainId: time travel to v$v diverged from the " +
          s"recorded state (trace: ${trace.mkString(" → ")})")
    }

    // ── chain-end CHANGE FEED audit: apply invariant over every
    // recorded consecutive pair whose range carries a feed ──────────
    val versions = history.keys.toSeq.sorted
    versions.sliding(2).foreach {
      case Seq(v0, v1) if v0 < v1 =>
        val feed =
          try Some(VersionedParquet.changes(spark, root, v0, v1)
            .select("id", "g", "x", "_change_type").collect())
          catch {
            // physical publishes (overwrite/truncate/restore/compact)
            // record no feed and refuse loudly — their contract
            case e: java.io.IOException
              if e.getMessage.contains("no change feed") => None
          }
        feed.foreach { rows =>
          def bag(m: Model) = m.toSeq
            .map { case (id, (g, x)) => (id, g, x) }
            .groupBy(identity).view.mapValues(_.size).toMap
          val removed = rows.filter(r =>
            Set("update_pre", "delete")(r.getString(3)))
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          val added = rows.filter(r =>
            Set("update_post", "insert")(r.getString(3)))
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          val replayed = mutable.Map.empty[(Long, String, Long), Int] ++
            bag(history(v0))
          removed.foreach { k =>
            val n = replayed.getOrElse(k, 0)
            assert(n > 0, s"chain $chainId: feed ($v0,$v1] removes " +
              s"$k absent from v$v0 (trace: ${trace.mkString(" → ")})")
            if (n == 1) replayed.remove(k) else replayed(k) = n - 1
          }
          added.foreach { k =>
            replayed(k) = replayed.getOrElse(k, 0) + 1
          }
          assert(replayed.toMap == bag(history(v1)),
            s"chain $chainId: feed replay ($v0,$v1] ≠ recorded v$v1 " +
              s"(trace: ${trace.mkString(" → ")})")
        }
      case _ => ()
    }
  }

  test("110 random SQL verb chains hold live==model per step, " +
    "time-travel and change-feed audits at chain end") {
    (1 to 110).foreach { c => runChain(c, steps = 8 + c % 5) }
  }
}
