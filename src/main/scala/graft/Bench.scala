package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * The measured action is `write.format("noop")` — a full materialization
  * of every output row through the real plan. (`.count()` would let
  * Catalyst prune computed columns and eliminate final sorts, silently
  * under-measuring projection-heavy queries.)
  *
  * Attribution note: the dedup family (q35/q36/q37/q54/q58/q59) shares
  * session-cached intermediates (DedupOps: shingle frame, exact pairs,
  * MinHash signatures, components) — whichever consumer runs first
  * absorbs each build, later ones read the caches. The TOTAL is honest —
  * every shared stage is real work paid once per session — but the
  * per-query splits within the family are order-dependent. Queries
  * therefore run in INVENTORY order (SparkEntry.all, stable across
  * rounds), not Map-iteration order, so per-query numbers compare
  * round-over-round: the shingle build lands on q35, signatures on
  * q36, components on q54 — every round.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like every other entry point (Verify/PlanDump/specs):
      // the Iceberg time transforms' writer half must agree with the
      // planner's UTC prune endpoints, and a session-zone-dependent
      // bench would time different plans on a non-UTC host
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm one-time session machinery (codegen compiler, shuffle system,
    // parquet reader) so the first measured query doesn't absorb ~4-6 s
    // of session startup that belongs to no query.
    spark.range(1000000).selectExpr("id % 7 AS k")
      .groupBy("k").count().write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet")
      .write.format("noop").mode("overwrite").save()
    // Fixed CPU probe, timed AFTER warmup: a constant amount of codegen'd
    // arithmetic whose duration depends only on how much CPU the host is
    // actually granting this VM. This machine throttles hard after
    // sustained load (measured: the same suite 92 s cold vs 346 s hot,
    // with a 32-thread run showing a load average of ~3) — probe_sec in
    // the JSON makes a throttled snapshot self-identifying instead of
    // reading as a code regression. Compare across rounds: the probe is
    // identical work every run (~0.5 s on a cold host).
    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 200000000L, 1, cpus.toInt)
        .selectExpr("sum(id % 97)").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Single-thread probe: the parallel probe above misses NEIGHBOR
    // load (external tenants holding a few cores leave 30+ threads for
    // the 32-task probe, but slow every single-threaded phase — driver
    // planning, Janino codegen compilation — and that tax lands on all
    // ~130 queries). A pure-JVM xorshift loop is immune to Spark and
    // IO: compare round-over-round (~0.35 s on a quiet core). The host
    // loadavg lands in the JSON for the same reason — round 8 measured
    // the same build at 183 s with loadavg ~0 and 254 s with loadavg
    // 4.5 and BOTH parallel probes clean.
    def probe1(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L; var i = 0
      while (i < 300000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
      }
      if (x == 42) println("") // keep the loop live
      (System.nanoTime() - t0) / 1e9
    }
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").getLines()
        .next().split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // IO probe: 64 × 64 KB fsync'd file writes + reads + deletes under
    // java.io.tmpdir — the same filesystem the scratch-heavy fixtures
    // (deep clone's copies, ANALYZE's passes, the lakehouse lifecycle
    // chains) write through. fsync per file makes it measure DISK
    // latency, not the page cache; a shared-disk contention window
    // that the CPU probes are blind to (r11's q175/q188 flags carried
    // "IO-attributed, unfalsified") shows here as a multi-× reading.
    // Calibrated on this host: quiet floor 0.09–0.12 s over repeated
    // runs; contended shared disk measures well past 0.5 s.
    def probeIo(): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft-ioprobe")
      val payload = new Array[Byte](65536)
      java.util.Arrays.fill(payload, 0x5a.toByte)
      val t0 = System.nanoTime()
      var i = 0
      while (i < 64) {
        val ch = java.nio.channels.FileChannel.open(
          dir.resolve(s"f$i.bin"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.SYNC)
        try ch.write(java.nio.ByteBuffer.wrap(payload))
        finally ch.close()
        i += 1
      }
      var sum = 0L
      i = 0
      while (i < 64) {
        sum += java.nio.file.Files
          .readAllBytes(dir.resolve(s"f$i.bin")).length
        i += 1
      }
      i = 0
      while (i < 64) {
        java.nio.file.Files.delete(dir.resolve(s"f$i.bin")); i += 1
      }
      java.nio.file.Files.delete(dir)
      if (sum == 42) println("") // keep the reads live
      (System.nanoTime() - t0) / 1e9
    }
    val load0 = loadavg()
    val probe1Sec = probe1()
    val probeIoSec = probeIo()
    // Committed clean-host reference (cfdbf41's snapshot: 0.429 start /
    // 0.252 end). A probe > 2× this means the host is throttled and the
    // suite timings will read as a phantom code regression (r7's driver
    // snapshot: probes 1.607/1.102, total 3× the clean run). Gate:
    // retry once after a cooldown so a transient spike clears; if the
    // host is still hot, run anyway but (a) tag the JSON "hot_host":
    // true and (b) never overwrite BENCH_LAST.json's clean snapshot
    // with throttled numbers.
    val RefProbeSec = 0.43
    var probeSec = probe()
    if (probeSec > 2 * RefProbeSec) {
      System.err.println(f"BENCH hot host: probe $probeSec%.3f s > 2x ref " +
        f"$RefProbeSec%.3f s; cooling down 60 s and retrying")
      Thread.sleep(60000)
      probeSec = probe()
    }
    // A query that throws records the sentinel -1 (and lands in "errors")
    // instead of a normal-looking duration — a failed query must not be
    // mistaken for a fast one.
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    // Iteration aid: SPARK_GRAFT_ONLY="q35,q37" (prefix match) restricts
    // the run to a subset — full runs leave it unset. Filtered runs still
    // execute in inventory order, so shared-cache attribution (see above)
    // behaves the same within the subset.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(prefixes) =>
        SparkEntry.all.filter(q => prefixes.exists(q.name.startsWith))
      case None => SparkEntry.all
    }
    // Per-query GC attribution: a multi-second spike whose gc share is
    // most of the delta is a JVM pause, not a plan regression — recorded
    // so round-over-round comparisons stop chasing GC noise (sum of
    // collection-time deltas across all collector beans).
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }
    // MID-RUN steal detection: the start/end probes bracket the run but
    // are blind to a 1-minute CPU-steal window in the middle — this
    // session's same-commit runs each flagged a DIFFERENT consecutive
    // query cluster 2-4× slow while both end probes read clean. A
    // single-thread probe every 32 queries (~5 s total overhead on a
    // ~530 s suite) records the worst mid-run reading; hot_host folds
    // it in below, so a stolen window can no longer ship a "clean"
    // baseline with poisoned entries.
    var probe1Max = 0.0
    var probeIoMax = 0.0
    val results = selected.zipWithIndex.map { case (q, qi) =>
      if (qi > 0 && qi % 32 == 0) {
        probe1Max = math.max(probe1Max, probe1())
        probeIoMax = math.max(probeIoMax, probeIo())
      }
      val (name, fn) = (q.name, q.fn)
      // Two-component timing: FIXTURE = the queries() closure call
      // (lifecycle builds — streaming checkpoint chains, OCC commit
      // histories, lakehouse exports — run eagerly inside it; plan
      // construction is microseconds by comparison), SERVE = the
      // noop materialization of the returned frame (the read path a
      // user actually repeats). The regression gate keys on SERVE
      // when the committed baseline carries it: a serve regression
      // must not hide inside fixture noise, and fixture jitter
      // (scratch-disk variance) must not pollute the regressed list.
      val g0 = gcMillis
      val t0 = System.nanoTime()
      var tFix = 0.0
      val ok =
        try {
          val df = fn(spark, sfDir)
          tFix = (System.nanoTime() - t0) / 1e9
          df.write.format("noop").mode("overwrite").save(); true
        }
        catch {
          case e: Throwable =>
            System.err.println(s"BENCH ERROR $name: ${e.getClass.getName}: ${e.getMessage}")
            errors += name
            false
        }
      val tAll = (System.nanoTime() - t0) / 1e9
      (name, if (ok) tAll else -1.0, (gcMillis - g0) / 1e3,
        if (ok) tFix else -1.0, if (ok) tAll - tFix else -1.0)
    }
    def r3(v: Double) = math.rint(v * 1000) / 1000 // 3 decimals: keeps the line short
    val qs = results.map { case (k, v, _, _, _) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val gcs = results.filter(_._3 >= 0.05)
      .map { case (k, _, g, _, _) => s"\"" + k + "\":" + r3(g) }
      .mkString("{", ",", "}")
    val fixJson = results
      .map { case (k, _, _, f, _) => s"\"" + k + "\":" + r3(f) }
      .mkString("{", ",", "}")
    val serveJson = results
      .map { case (k, _, _, _, sv) => s"\"" + k + "\":" + r3(sv) }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Per-query regression gate vs the committed clean snapshot
    // (BENCH_LAST.json): any query ≥2× slower AND ≥1 s absolute delta
    // is named in "regressed" with both timings — a real per-query
    // plan regression can no longer ship silently inside a healthy
    // total (round 8's q37/q49/q53/q59 lesson). The baseline is only
    // ever written by a clean full run (see below), so the compare is
    // clean-vs-current; on a hot host the flags measure the throttle,
    // which "hot_host": true already marks.
    def prevMap(field: String): Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_LAST.json")), "UTF-8")
        (s""""$field":\\{([^}]*)\\}""").r.findFirstMatchIn(txt)
          .map(_.group(1).split(",").toSeq.flatMap { kv =>
            kv.split(":") match {
              case Array(k, v) =>
                v.toDoubleOption.map(
                  k.trim.stripPrefix("\"").stripSuffix("\"") -> _)
              case _ => None
            }
          }.toMap).getOrElse(Map.empty)
      } catch { case _: Throwable => Map.empty }
    val prev: Map[String, Double] = prevMap("queries")
    // serve-keyed compare when the committed baseline carries the
    // split (older baselines: total vs total, the pre-split rule)
    val prevServe: Map[String, Double] = prevMap("serve_sec")
    val regressedEntries = results.collect {
      case (k, v, _, _, sv)
        if v > 0 && (prevServe.get(k) match {
          case Some(p) => p > 0 && sv >= 2 * p && sv - p >= 1.0
          case None => prev.get(k).exists(p =>
            p > 0 && v >= 2 * p && v - p >= 1.0)
        }) =>
        val (pv, nv) =
          if (prevServe.contains(k)) (prevServe(k), sv) else (prev(k), v)
        "\"" + k + "\":{\"prev\":" + r3(pv) + ",\"now\":" + r3(nv) + "}"
    }
    val regressed = regressedEntries.mkString("{", ",", "}")
    // Second probe AFTER the suite: throttling on this host intensifies
    // as sustained load drains CPU credit, so start/end probes bracket
    // how much CPU the run actually had (end >> start = the later
    // queries ran starved; both ~0.5 s = trust the totals as-is).
    val probeEndSec = probe()
    val probe1EndSec = probe1()
    val probeIoEndSec = probeIo()
    val loadEnd = loadavg()
    // Single-thread probe ceiling, calibrated to MEASUREMENT (see the
    // baseline-gate comment below): quiet floor 0.55–0.64 s, loaded
    // ≥ 1.1 s; 2× this (0.75 s) separates the populations with margin.
    val Ref1Sec = 0.375
    // IO probe ceiling, calibrated the same way: quiet floor measured
    // 0.09-0.12 s (5 consecutive runs on an idle host); the 2x rule on
    // 0.225 puts the gate at 0.45 s - far above quiet-host variance,
    // far below a contended-disk reading. This closes the r11 gap
    // where q175/q188's shared-disk attribution was unfalsifiable: a
    // run whose IO probes stay under the ceiling CANNOT blame its
    // slow scratch-heavy fixtures on the disk.
    val RefIoSec = 0.225
    // hot_host folds in the single-thread probes too (r10's end-of-round
    // run persisted hot_host:false with probe1_end 0.817 past the 0.75
    // gate — the field keyed on the 32-thread probes only, so a loaded
    // run's "regressed" list shipped labeled clean). Same 2× rule as the
    // baseline gate below: any probe past its calibrated ceiling marks
    // the run's numbers as measuring the host, not the code.
    val hotHost = probeSec > 2 * RefProbeSec || probeEndSec > 2 * RefProbeSec ||
      probe1Sec >= 2 * Ref1Sec || probe1EndSec >= 2 * Ref1Sec ||
      probe1Max >= 2 * Ref1Sec ||
      probeIoSec >= 2 * RefIoSec || probeIoEndSec >= 2 * RefIoSec ||
      probeIoMax >= 2 * RefIoSec
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","probe_sec":${r3(probeSec)},"probe_end_sec":${r3(probeEndSec)},"probe1_sec":${r3(probe1Sec)},"probe1_end_sec":${r3(probe1EndSec)},"probe1_max_sec":${r3(probe1Max)},"probe_io_sec":${r3(probeIoSec)},"probe_io_end_sec":${r3(probeIoEndSec)},"probe_io_max_sec":${r3(probeIoMax)},"load_start":${r3(load0)},"load_end":${r3(loadEnd)},"hot_host":$hotHost,"regressed":$regressed,"queries":$qs,"fixture_sec":$fixJson,"serve_sec":$serveJson,"gc_sec":$gcs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // UNCONDITIONAL full-evidence copy: the driver's stdout tail capture
    // (~2000 chars) has repeatedly truncated the full line — round 9's
    // "regressed" list was literally cut out of BENCH_r09.json. This file
    // is the complete result object for EVERY run (filtered, hot-host,
    // clean alike), so the evidence survives regardless of capture
    // behavior; BENCH_LAST.json below remains the clean-gated baseline.
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: java.io.IOException => () }
    // Also land the full line in the repo: round snapshots have truncated
    // the head of the stdout capture before, which made totals
    // unrecoverable — this copy is complete by construction. Filtered
    // runs never overwrite the committed full-run snapshot, and a
    // hot-host run never overwrites a clean one (its numbers measure
    // the throttle, not the code).
    // The committed baseline feeds the per-query regression gate, so
    // it must only ever be CLEAN numbers: require the single-thread
    // probe healthy too (neighbor load slows every driver-side phase
    // ~2× without tripping the 32-thread probe — a baseline written
    // then would mask real regressions behind an inflated floor).
    // Threshold calibrated to MEASUREMENT, not aspiration: the round-10
    // idle-host run (load 0.14 before start, 32-thread probes 0.407 /
    // 0.183 — both well clean) measured probe1 at 0.573 start / 0.559
    // end, and r8's own clean snapshot carried 0.638 — this host's
    // genuine quiet single-thread floor is 0.55–0.64 s, so the earlier
    // 0.5 s gate could NEVER pass and the baseline could never advance.
    // Loaded sessions measure probe1 ≥ 1.1 s, so 0.75 s separates the
    // two populations with margin on both sides. (Ref1Sec is declared
    // above, next to hotHost, which now folds the same gate in.)
    // the baseline is an sf0.1 artifact: a slope run at another sf
    // (sf1 via SPARK_GRAFT_SF_DIR) must never overwrite it — its
    // numbers would flag every query of the next honest run
    val defaultSf = sfDir == "/root/testdata/sf0.1"
    val cleanBaseline = !hotHost && defaultSf
    if (only.isEmpty && cleanBaseline)
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LAST.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: java.io.IOException => () } // read-only cwd: stdout still has it
    spark.stop()
    // LAST stdout line, printed after spark.stop() so nothing follows
    // it but sbt's own one-line epilogue: a COMPACT copy that fits the
    // driver's 2000-char tail capture (rounds 4-6 all landed
    // parsed:null because the full line above is ~3000 chars and the
    // capture kept only its tail). Keys are shortened to their qNN
    // prefix and timings to 2 decimals; full detail stays in the full
    // line and BENCH_LAST.json.
    def r2(v: Double) = math.rint(v * 100) / 100
    val shortQs = results
      .map { case (k, v, _, _, _) =>
        "\"" + k.takeWhile(_ != '_') + "\":" + r2(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","probe_sec":${r3(probeSec)},"probe_end_sec":${r3(probeEndSec)},"probe1_sec":${r3(probe1Sec)},"load_start":${r3(load0)},"load_end":${r3(loadEnd)},"hot_host":$hotHost,"regressed_n":${regressedEntries.length},"queries":$shortQs,"errors":$errJson,"sf":"$sfDir"}""")
  }
}
