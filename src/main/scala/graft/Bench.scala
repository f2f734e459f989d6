package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract → BENCH_r{N}.json).
  *
  * Each query is forced to FULL evaluation with
  * `agg(bit_xor(xxhash64(struct(allCols))))` — a `.count()` would let
  * Catalyst prune projection-only work and time just the scan (bit_xor, not
  * sum: ANSI mode overflows on summed hashes). Failures are recorded in a
  * `failed` list and printed to stderr, never silently swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Udfs.register(spark)

    /** Evaluate every output column of every row: hash each row, sum hashes. */
    def forceEval(name: String, dir: String): Unit = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect()
    }

    // JVM+codegen warmup on the smallest SF so timings measure the plan,
    // not first-query classloading.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      try forceEval(n, "/root/testdata/sf0.001")
      catch { case e: Throwable => System.err.println(s"[bench/warmup] $n: ${e.getMessage}") }
    }

    // CPU calibration: a fixed, I/O-free, deterministic workload
    // (xxhash64 over an in-memory 1B-row range, all cores) timed before
    // and after the query sweep. Round-over-round comparisons divide by
    // this number to cancel host-speed drift — the round-13 "1.58×
    // regression" was a slow sandbox window, not code, and cost a full
    // adjudication pass (round-13 verdict task 2). min-of-runs: noise
    // only ever adds time.
    def calibrationRun(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 1000000000L, 1L, cpus.toInt)
        .agg(bit_xor(xxhash64(col("id")))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    calibrationRun() // codegen warmup for the calibration plan itself

    // PRE-FLIGHT CONTENTION GATE (r19 — r18 verdict, What's wrong #2):
    // the shipped artifact is the arbiter of record, and r18's ran on a
    // decaying host (min_total 123 s vs the same tree's 90 s idle
    // rerun). Waiting out a transient spike costs minutes; shipping a
    // 20%-inflated artifact costs an adjudication pass. Signal: the CPU
    // share OUR calibration job achieves — external load steals cores
    // from the 32-way xxhash range scan, so achieved-concurrency / cpus
    // is an absolute, self-referential idleness meter (calibration time
    // alone cannot distinguish "host busy" from "host slow": a loaded
    // box measures slow against itself too). Wait (bounded by
    // SPARK_GRAFT_CAL_WAIT_SECS, default 300) until the share clears
    // SPARK_GRAFT_CAL_MIN_SHARE (default 0.8) or the budget runs out —
    // then proceed and ship the numbers honestly either way.
    val osBean = try {
      Some(java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean])
    } catch { case _: Throwable => None }
    // pure-JVM spin probe, NOT the Spark calibration job: `cpus` plain
    // threads busy-looping for ~0.8 s achieve ~1.0 share on an idle
    // host (no scheduler phases, no driver time diluting the window —
    // the Spark job measures ~0.5 even idle), and proportionally less
    // when external load steals cores. Returns achieved-CPU / cpus.
    def cpuShareProbe(ms: Long = 800L): Double = osBean.map { b =>
      val nThreads = cpus.toInt
      val cpu0 = b.getProcessCpuTime
      val t0 = System.nanoTime()
      val sink = new java.util.concurrent.atomic.AtomicLong()
      val threads = (1 to nThreads).map { _ =>
        new Thread(() => {
          var x = 1234567L
          while (System.nanoTime() - t0 < ms * 1000000L) {
            var i = 0
            while (i < 10000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
          }
          sink.addAndGet(x): Unit
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      ((b.getProcessCpuTime - cpu0) / 1e9) / wall / nThreads
    }.getOrElse(1.0)
    val calWaitBudgetMs =
      sys.env.getOrElse("SPARK_GRAFT_CAL_WAIT_SECS", "300").toLong * 1000L
    val calMinShare =
      sys.env.getOrElse("SPARK_GRAFT_CAL_MIN_SHARE", "0.85").toDouble
    val gateStart = System.currentTimeMillis()
    var gateWaits = 0
    var calShare = cpuShareProbe()
    while (calShare < calMinShare &&
           System.currentTimeMillis() - gateStart < calWaitBudgetMs) {
      gateWaits += 1
      System.err.println(f"[bench] pre-flight: spin-probe CPU share $calShare%.2f " +
        f"< $calMinShare%.2f (host contended) — waiting 20 s (wait #$gateWaits)")
      Thread.sleep(20000)
      calShare = cpuShareProbe()
    }

    // SECOND gate: the spin probe catches CPU contention, but a
    // co-tenant/VM-level slowdown throttles the memory-touching Spark
    // calibration while register-bound spinning still reads ~1.0
    // (observed: share 0.97 with calibration 20% off the same host's
    // best minutes earlier). Persist the host's best observed
    // calibration across runs (/tmp — host-local, not repo state) and
    // wait, within the SAME bounded budget, while the current sample
    // is >15% worse than that best. A genuinely slower host exhausts
    // the budget once and proceeds; the artifact ships
    // norm_min_total either way.
    val calFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_CAL_HISTORY", "/tmp/graft_bench_cal.txt"))
    val histBest: Option[Double] = try {
      Some(new String(java.nio.file.Files.readAllBytes(calFile), "UTF-8").trim.toDouble)
    } catch { case _: Throwable => None }
    var calibrationPre = (1 to 3).map(_ => calibrationRun()).min
    while (histBest.exists(h => calibrationPre > h * 1.15) &&
           System.currentTimeMillis() - gateStart < calWaitBudgetMs) {
      gateWaits += 1
      System.err.println(f"[bench] pre-flight: calibration $calibrationPre%.3f > " +
        f"1.15x host best ${histBest.get}%.3f — waiting 20 s (wait #$gateWaits)")
      Thread.sleep(20000)
      calibrationPre = math.min(calibrationPre, calibrationRun())
    }

    // Median-of-3 per query (round-4 verdict: a single shot let one
    // contention spike misbrand agg_q1 as a 5x regression). The headline
    // per-query number is the median; all runs ship in `runs` for audit.
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = names.map { name =>
      val runs = (1 to runsPer).map { _ =>
        // Reclaim lazily-cleaned state between runs: localCheckpoint RDDs
        // and broadcasts are released by the ContextCleaner only when GC
        // collects their weak refs — without this, back-to-back runs
        // accumulate block-manager state and later runs measure memory
        // pressure, not the plan (observed: cosine_topk 0.9 s → 3.6 s).
        // getPersistentRDDs + blocking unpersist removes checkpoint blocks
        // SYNCHRONOUSLY — the async cleaner path still left gigabytes of
        // earlier queries' blocks in flight when the next timing started
        // (observed: cosine_topk 1.1 s isolated vs 3.4 s after minhash).
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        // streaming runs leave their state-store providers (and their
        // in-memory version maps) loaded after query.stop(); across
        // repeated runs that heap pressure bleeds into whatever query
        // times next (observed: codec_parquet 2.4 s isolated vs 4.4 s
        // after the stream_win_* triples)
        org.apache.spark.sql.graftshim.StateStoreReset.unloadAll()
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        try forceEval(name, sfDir)
        catch { case e: Throwable =>
          if (!failed.contains(name)) failed += name
          System.err.println(s"[bench] FAILED $name: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> (runs(runs.length / 2), runs)
    }
    val qs = results.map { case (k, (med, _)) => "\"" + k + "\":" + f"$med%.3f" }
      .mkString("{", ",", "}")
    val allRuns = results.map { case (k, (_, rs)) =>
      "\"" + k + "\":" + rs.map(r => f"$r%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // Sandbox contention windows can outlast all runsPer runs of one query
    // (observed: the same plan timed 2 s and 19 s minutes apart with zero
    // code change) — the per-query MIN is the noise-floor-robust cost of
    // the plan, since contention only ever adds time. Median stays the
    // headline; min is the regression-triage signal.
    val mins = results.map { case (k, (_, rs)) =>
      "\"" + k + "\":" + f"${rs.min}%.3f"
    }.mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2._1).sum
    val minTotal = results.map(_._2._2.min).sum
    // calibration re-measured AFTER the sweep too: if the host slowed
    // mid-run, the min of both windows is still the host's honest speed
    val calibrationPost = (1 to 3).map(_ => calibrationRun()).min
    val calibration = math.min(calibrationPre, calibrationPost)
    // update the host-best record for the next run's gate
    try {
      val newBest = math.min(calibration, histBest.getOrElse(Double.MaxValue))
      java.nio.file.Files.write(calFile, f"$newBest%.4f".getBytes("UTF-8")): Unit
    } catch { case _: Throwable => () }
    val note = "full-eval bit_xor(xxhash64(struct(*))) per query; per-query value " +
      s"is the median of $runsPer runs (all runs in `runs`, per-query min in `mins`); " +
      "`calibration` = min xxhash64-over-range(1e9) wall (CPU-only, pre+post sweep) — " +
      "divide totals by it before comparing rounds"
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"runs":$allRuns,"mins":$mins,"min_total":$minTotal%.3f,"calibration":$calibration%.3f,"calibration_pre":$calibrationPre%.3f,"calibration_post":$calibrationPost%.3f,"norm_min_total":${minTotal / calibration}%.2f,"cal_gate_waits":$gateWaits,"cal_gate_share":$calShare%.2f,"failed":$fl,"note":"${ProbeJson.jstr(note)}","sf":"${ProbeJson.jstr(sfDir)}"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
