package graft

import org.apache.spark.sql.SparkSession
import graft.gen.Corpus

/** Benchmark main. Two parts, CAMPAIGN FIRST (the scaling criterion is
  * the hard signal; the per-query sweep is informative and runs on
  * whatever budget is left):
  *
  *  1. crawl-throughput protocol (BASELINE.md): the same crawl job on the
  *     same synthetic corpus at two parallelism levels — local[N] and
  *     local[4N] — reporting URLs scheduled+deduped per second at each and
  *     the scaling efficiency (throughput_4N / throughput_N) / 4.
  *  2. per-query wall-clock over SPARK_GRAFT_SF_DIR (driver contract),
  *     budget-guarded per query (skipped queries are counted, never
  *     silently absent).
  *
  * Both parts are WINDOW-NORMALIZED: a pure-JVM probe (serial mix loop =
  * CPU-steal detector; parallel streaming sum over a shared 768 MB array
  * = memory-bus detector) runs before each part and its over-model
  * ratios land in the JSON ("probe" / "queries_probe") — so a slow
  * co-tenant window self-identifies in the artifact instead of reading
  * as a regression (this box swings 2-4× between minutes).
  *
  * The campaign is WALL-CLOCK BUDGETED: it picks the largest corpus size
  * whose projected 1-core + 4-core pair fits the remaining budget (reps
  * are cut before size), re-projects from the walls it actually measures
  * before launching each further child, and ALWAYS prints the final JSON
  * line with whatever samples completed — a truncated campaign degrades to
  * fewer reps, never to a missing hard signal (the round-3 failure mode:
  * a fixed 2-rep 2.4M default exceeded the driver's bench budget and the
  * whole report was lost to a timeout).
  *
  * Three guards keep that promise on a co-tenant VM whose speed can swing
  * 2-3× between windows:
  *   - the corpus-build wall doubles as a live window probe: projections
  *     are rescaled by measured/model ("slow_factor" in the JSON) and the
  *     rung is re-picked (smaller corpus rebuilt) if the planned one no
  *     longer fits this window;
  *   - every child runs under a hard deadline (remaining budget minus a
  *     tail reserve) and is force-killed on overrun — a kill is a failed
  *     sample, never a lost report;
  *   - the final JSON also prints from a JVM shutdown hook, so even a
  *     harness SIGTERM mid-child emits the report with the samples
  *     completed so far.
  *
  * Prints ONE JSON line. Knobs (env):
  *   SPARK_GRAFT_CPUS          parallelism for part 1 + corpus build (default 32)
  *   SPARK_GRAFT_BENCH_BUDGET  total wall budget in seconds for this main,
  *                             queries + campaign (default 2100 — the
  *                             round-3 driver kill landed between ~38 and
  *                             ~47 min after process start, so 2100 in-main
  *                             + sbt startup stays under a 40-min timeout)
  *   SPARK_GRAFT_BENCH_PAGES   corpus size; 0 = auto-pick largest that fits
  *                             the budget (default 0)
  *   SPARK_GRAFT_BENCH_LEVELS  comma-separated core counts (default "1,4")
  *   SPARK_GRAFT_BENCH_WAVES   timed waves per sample (default 2)
  *   SPARK_GRAFT_BENCH_REPS    max samples per level (default 3; the budget
  *                             usually cuts earlier, cheapest level first)
  *   SPARK_GRAFT_BENCH_BONUS   one extra high-thread level sampled ONCE if
  *                             budget remains after the rep loop (default 8;
  *                             "" disables) — keeps the bus-bound regime
  *                             visible without funding it from rep budget
  *   SPARK_GRAFT_BENCH_BODY    per-page body bytes (default 16000)
  *   SPARK_GRAFT_BENCH_SEEDSTEP seed every Nth page (default 2)
  *   SPARK_GRAFT_BENCH_CRAWL   "0" to skip the crawl campaign
  *   SPARK_GRAFT_BENCH_QUERIES "0" to skip the per-query bench
  *   SPARK_GRAFT_SHUFFLE_MULT  crawl-child shuffle partitions = cores×this
  *                             (default 4; same multiplier at every level)
  *   SPARK_GRAFT_CONC_WRITERS  crawl-child concurrent partitioned-output
  *                             writers (default 8; 0 = sort-based writer)
  *   SPARK_GRAFT_WARM_DIV      crawl-child warmup seed-set divisor
  *                             (default 8; the wallModel calibration
  *                             assumes the default — changing it shifts
  *                             every projected child wall)
  *   SPARK_GRAFT_MAX_PART_BYTES crawl-child scan-split size (default 8m,
  *                             identical at every level; see
  *                             CrawlBenchChild)
  *   SPARK_GRAFT_READER_BATCH  crawl-child vectorized-reader batch rows
  *                             (default 4096; A/B notes in CrawlBenchChild)
  *   SPARK_GRAFT_PARQUET_CODEC crawl-child wave-write codec (default snappy)
  *   SPARK_GRAFT_AQE           "true" to enable AQE in crawl children
  *                             (default false; measured 3-6% slower)
  *   SPARK_GRAFT_BENCH_PAGES   pin the corpus rung, bypassing the
  *                             budget-driven pick (default 0 = pick)
  *   SPARK_GRAFT_BENCH_CORPUS_CACHE corpus cache root (default
  *                             /tmp/zenospark-bench-corpus-cache)
  */
object Bench {

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"zenospark-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One crawl sample: work done, timed wall secs, total child wall secs
    * (JVM + corpus read + warmup + timed waves — what the budget pays),
    * per-phase wall decomposition, task-time accounting from the child's
    * Spark listener.
    */
  final case class CrawlSample(work: Long, secs: Double, childWall: Double,
                               phases: Map[String, Double],
                               util: Map[String, Double] = Map.empty,
                               driver: Map[String, Double] = Map.empty)

  /** Live child process, visible to the shutdown hook so a SIGTERM from
    * the harness kills the in-flight child before the hook prints the
    * best-effort JSON.
    */
  @volatile private var liveChild: Option[Process] = None

  /** One crawl measurement in a FRESH forked JVM (JIT/GC isolation between
    * parallelism levels). `deadlineSecs` is a HARD wall cap: a child that
    * outlives it (a co-tenant window can inflate multi-core walls 3× over
    * the model) is killed and reported as a failed sample — the campaign
    * must reach its final JSON inside the harness budget no matter how
    * slow the box turns.
    */
  private def crawlRun(cores: Int, corpusDir: String, spec: Corpus.Spec,
                       waves: Int, deadlineSecs: Double = Double.MaxValue): CrawlSample = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("-Xmx") || a.startsWith("-D"))
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq(
      // honest N-core-executor emulation: bound the JVM's perceived CPUs
      // so GC threads / common pools don't silently lend the low-core run
      // the whole machine
      s"-XX:ActiveProcessorCount=$cores",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.CrawlBenchChild",
      corpusDir, cores.toString, waves.toString,
      spec.nPages.toString, spec.nHosts.toString, spec.bodyBytes.toString,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SEEDSTEP", "2"))
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val tChild = System.nanoTime()
    val proc = pb.start()
    liveChild = Some(proc)
    // drain on a daemon thread: a blocking readAllBytes would defeat the
    // deadline (EOF only arrives when the child exits)
    val buf = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => {
      try proc.getInputStream.transferTo(buf) catch { case _: Exception => () }
    }, "bench-child-drain")
    drain.setDaemon(true)
    drain.start()
    val finished = proc.waitFor(
      math.max(1L, (deadlineSecs * 1000).toLong), java.util.concurrent.TimeUnit.MILLISECONDS)
    if (!finished) {
      System.err.println(f"BENCH_DEADLINE cores=$cores killed after $deadlineSecs%.0fs")
      proc.descendants().forEach(h => { h.destroyForcibly(); () })
      proc.destroyForcibly()
      proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
    }
    drain.join(2000)
    liveChild = None
    val out = buf.toString("UTF-8")
    val childWall = (System.nanoTime() - tChild) / 1e9
    def kvLine(tag: String): Map[String, Double] =
      out.linesIterator.find(_.startsWith(tag)).map { line =>
        line.split(" ").drop(1).flatMap(_.split("=") match {
          case Array(k, v) => Some(k -> v.toDouble)
          case _ => None
        }).toMap
      }.getOrElse(Map.empty)
    out.linesIterator.find(_.startsWith("CRAWL_RESULT")) match {
      case Some(line) =>
        val parts = line.split(" ")
        CrawlSample(parts(1).toLong, parts(2).toDouble, childWall,
          kvLine("CRAWL_PHASES"), kvLine("CRAWL_UTIL"), kvLine("CRAWL_DRIVER"))
      case None =>
        System.err.println(s"crawl child failed:\n${out.takeRight(2000)}")
        CrawlSample(0L, 1.0, childWall, Map.empty)
    }
  }

  /** Scale-path twins of the fixture-pinned operators: same functions, run
    * at sfDir size so BENCH keeps measuring them at scale (their
    * correctness queries run on the committed fixtures for SF-independent
    * oracle pins).
    */
  private val benchOnlyQueries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    def sf(s: SparkSession, dir: String, name: String) =
      s.read.parquet(s"$dir/$name.parquet")
    Map(
      "bench_minhash_sf" -> ((s, dir) =>
        graft.functions.Dedup.minhashSignatures(sf(s, dir, "documents"), k = 16)),
      "bench_simhash_sf" -> ((s, dir) =>
        graft.functions.Dedup.simhash(sf(s, dir, "documents"))),
      "bench_fingerprints_sf" -> ((s, dir) =>
        graft.functions.Dedup.fingerprints(sf(s, dir, "documents"))),
      "bench_ann_lsh_sf" -> ((s, dir) =>
        graft.functions.Similarity.cosineLshBuckets(sf(s, dir, "embeddings"),
            nBits = 12, dim = 64)
          .groupBy(col("lsh_bucket")).agg(count(lit(1)).as("n_vectors"))),
      "bench_ann_ivf_sf" -> ((s, dir) => {
        val e = sf(s, dir, "embeddings")
        graft.functions.Similarity.ivfTopK(e,
          e.filter(col("vec_id") < 10), k = 5, nCells = 8, nProbe = 3)
      }))
  }

  /** Pure-JVM window probe, no Spark: (serialSecs, parallelSecs).
    * Deterministic fixed work — serial = 4×10^8 splitmix rounds (CPU
    * steal shows up directly); parallel = `threads` threads each
    * streaming-summing its slice of a shared 768 MB long array ×16
    * passes (the shared memory bus is what co-tenant windows actually
    * take away; round-3/4 task-time accounting showed 2-4× run-time
    * inflation on identical work). ~3 s total in a clean window.
    */
  def windowProbe(threads: Int): (Double, Double) = {
    def mixLoop(iters: Long): Long = {
      var x = 0x9e3779b97f4a7c15L
      var i = 0L
      while (i < iters) {
        x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
        i += 1
      }
      x
    }
    val sink = new java.util.concurrent.atomic.AtomicLong
    sink.addAndGet(mixLoop(20000000L)) // JIT warmup, untimed
    val t0 = System.nanoTime()
    sink.addAndGet(mixLoop(400000000L))
    val ser = (System.nanoTime() - t0) / 1e9
    val n = 96 << 20 // 96M longs = 768 MB, far past any cache
    val arr = new Array[Long](n)
    java.util.Arrays.fill(arr, 0x0123456789abcdefL)
    val per = n / threads
    def sweep(passes: Int): Unit = {
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var s = 0L
          val end = if (t == threads - 1) n else (t + 1) * per
          var pass = 0
          while (pass < passes) {
            var k = t * per
            while (k < end) { s += arr(k); k += 1 }
            pass += 1
          }
          sink.addAndGet(s)
          ()
        }, s"bench-probe-$t")
      }
      ts.foreach(_.start())
      ts.foreach(_.join())
    }
    sweep(2) // warmup pass (thread spin-up + JIT), untimed
    val t1 = System.nanoTime()
    sweep(64)
    val par = (System.nanoTime() - t1) / 1e9
    if (sink.get == 42L) System.err.println("") // keep the loops live
    (ser, par)
  }

  /** Clean-window probe calibration on this box (round 5, ProbeMain over
    * idle minutes): serial ≈ 0.65 s, parallel ≈ 0.32-0.41 s at 32
    * threads / 64 passes. Over-model ratios ≳1.4 mean a slow co-tenant
    * window (the parallel leg has a ±20% noise band of its own — the
    * half-damping below keeps that from moving the rung pick).
    */
  val ProbeSerModel = 0.65
  val ProbeParModel = 0.38

  /** Measured child-wall model for the default campaign config (16 KB
    * bodies, seed step 2, 2 timed waves + 1/8 warmup, shuffle multiplier 4
    * + concurrent partitioned-output writers), calibrated on this box
    * against the ROUND-5-FINAL binary (fused single-pass wave log; clean-
    * window children at the cached 2.4M rung: 1-core wall 866.7 s, 4-core
    * 297 s — see BENCH/BASELINE.md round-5 section; the round-4 model
    * priced the 2.4M pair at 2050 s and could never fit the default 2100 s
    * budget). Values are TOTAL child wall
    * seconds (JVM + warmup + timed), deliberately ~10% above the
    * calibration measurements so a projection error truncates reps instead
    * of overrunning the budget (children are deadline-killed regardless).
    * Linear interpolation between rungs.
    */
  private val wallModel: Seq[(Long, Map[Int, Double], Double)] = Seq(
    // (pages, level -> child wall secs, corpus build secs) — 2 timed waves.
    // Recalibrated to the round-5-FINAL binary (fused single-pass wave log
    // + pre-exchange candidate pruning) in verified-clean windows (probe
    // 0.90-0.94× model on both sides): 2.4M 1-core child wall 866.7 s
    // (timed 697.0), 4-core 297 s (timed 199.6); corpus build 82 s at 32
    // cores post-reboot. Lower rungs scaled by the same ~0.75× observed
    // wall ratio vs the prior calibration.
    (2400000L, Map(1 -> 950.0, 2 -> 540.0, 4 -> 330.0, 8 -> 260.0, 32 -> 260.0), 160.0),
    (1200000L, Map(1 -> 490.0, 2 -> 290.0, 4 -> 185.0, 8 -> 140.0, 32 -> 140.0), 95.0),
    // small rungs carry a ~25-30 s fixed child floor (JVM + session +
    // corpus read + warmup), a larger fraction at high core counts —
    // round-5 measured 300k: 1-core 191 s, 4-core 108 s (pre-fuse binary)
    (600000L, Map(1 -> 265.0, 2 -> 170.0, 4 -> 120.0, 8 -> 95.0, 32 -> 95.0), 60.0),
    (300000L, Map(1 -> 165.0, 2 -> 115.0, 4 -> 95.0, 8 -> 80.0, 32 -> 80.0), 45.0))

  private def projWall(pages: Long, level: Int): Double = {
    val sorted = wallModel.sortBy(_._1)
    def at(p: (Long, Map[Int, Double], Double)): Double =
      p._2.getOrElse(level, p._2(p._2.keys.filter(_ <= level).maxOption.getOrElse(p._2.keys.min)))
    val below = sorted.filter(_._1 <= pages).lastOption
    val above = sorted.find(_._1 >= pages)
    (below, above) match {
      case (Some(b), Some(a)) if a._1 == b._1 => at(b)
      case (Some(b), Some(a)) =>
        at(b) + (at(a) - at(b)) * (pages - b._1).toDouble / (a._1 - b._1)
      case (Some(b), None) => at(b) * pages.toDouble / b._1 // extrapolate up
      case (None, Some(a)) => at(a) * pages.toDouble / a._1 // extrapolate down
      case _ => Double.MaxValue
    }
  }
  private def projBuild(pages: Long): Double = {
    val sorted = wallModel.sortBy(_._1)
    val below = sorted.filter(_._1 <= pages).lastOption
    val above = sorted.find(_._1 >= pages)
    (below, above) match {
      case (Some(b), Some(a)) if a._1 == b._1 => b._3
      case (Some(b), Some(a)) =>
        b._3 + (a._3 - b._3) * (pages - b._1).toDouble / (a._1 - b._1)
      case (Some(b), None) => b._3 * pages.toDouble / b._1
      case (None, Some(a)) => a._3
      case _ => Double.MaxValue
    }
  }

  def main(args: Array[String]): Unit = {
    val tMain = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - tMain) / 1e9
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "2100").toDouble

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val pagesEnv = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "0").toLong
    val doCrawl = sys.env.getOrElse("SPARK_GRAFT_BENCH_CRAWL", "1") != "0"
    val doQueries = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES", "1") != "0"

    // ---- window probe (before the campaign: seeds the rung pick) ----
    var (probeSer, probePar) = windowProbe(cpus)
    def factorOf(ser: Double, par: Double): Double =
      math.max(ser / ProbeSerModel, par / ProbeParModel)
    var probeFactor = factorOf(probeSer, probePar)
    System.err.println(f"BENCH_PROBE serial=$probeSer%.2f parallel=$probePar%.2f " +
      f"factor=$probeFactor%.2f")
    // the co-tenant pressure oscillates on a ~minute period while the
    // probe samples ~3 s, and the rung decision it seeds is high-stakes
    // (the 2.4M pair of record vs a sub-rung). When the first reading is
    // marginal — slow enough to demote the rung, not a sustained-storm
    // reading — wait out one oscillation and keep the better reading
    // (observed: 1.62 and 1.09 sixty seconds apart). Costs ≤75 s of a
    // budget whose pair projection leaves ~400 s spare.
    if (probeFactor > 1.15 && probeFactor < 2.2) {
      Thread.sleep(75000)
      val (s2, p2) = windowProbe(cpus)
      System.err.println(f"BENCH_PROBE_RETRY serial=$s2%.2f parallel=$p2%.2f " +
        f"factor=${factorOf(s2, p2)}%.2f")
      if (factorOf(s2, p2) < probeFactor) {
        probeSer = s2; probePar = p2; probeFactor = factorOf(s2, p2)
      }
    }
    def probeJson(ser: Double, par: Double): String =
      f"""{"serial_secs":$ser%.2f,"parallel_secs":$par%.2f,""" +
        f""""serial_over_model":${ser / ProbeSerModel}%.2f,""" +
        f""""parallel_over_model":${par / ProbeParModel}%.2f}"""

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    @volatile var queriesSkipped = -1 // -1 = sweep never started
    @volatile var queriesProbe = "" // probe re-run before the sweep

    // ---- part 1: crawl scaling protocol (BASELINE.md), budget-aware ----
    // All campaign state lives where emitJson can see it: the final JSON
    // line is printed exactly once — by the normal path, or by a JVM
    // shutdown hook if the harness SIGTERMs the bench mid-child — so the
    // hard signal survives a kill with whatever samples completed.
    val levels = sys.env.getOrElse("SPARK_GRAFT_BENCH_LEVELS", "1,4")
      .split(",").map(_.trim.toInt).filter(c => c >= 1 && c <= cpus).toSeq
    val bonus = sys.env.getOrElse("SPARK_GRAFT_BENCH_BONUS", "8")
    val samples = scala.collection.mutable.ArrayBuffer.empty[(Int, CrawlSample)]
    @volatile var benchPages = 0L
    @volatile var crawlError = "" // non-empty => campaign-level failure note
    // seeded from the window probe (damped by half like the build probe:
    // the 32-thread probe is more bus-bound than a 1/4-core child), so a
    // cache-hit campaign — which never runs the build probe — still
    // re-picks its rung when launched into a slow window
    @volatile var slowFactor = 1.0 + math.max(0.0, probeFactor - 1.0) * 0.5
    // 2 timed waves: same per-wave work at every level (the efficiency
    // ratio is per-work normalized), ~1/3 cheaper samples than 3 waves —
    // which roughly doubles the reps a budget can fund, and best-of-reps
    // is the only defense against this VM's 2-4× co-tenant windows
    val waves = sys.env.getOrElse("SPARK_GRAFT_BENCH_WAVES", "2").toInt

    def assembleCrawlJson(): String = {
      if (!doCrawl) return ""
      if (crawlError.nonEmpty) return s""","crawl":{"error":"$crawlError"}"""
      val snap = samples.synchronized { samples.toList }
      if (snap.isEmpty) return ""","crawl":{"error":"no samples completed"}"""
      def best(cores: Int): CrawlSample =
        snap.collect { case (c, r) if c == cores => r }.minBy(_.secs)
      def tp(cores: Int): Double = { val b = best(cores); b.work / b.secs }
      def eff(lo: Int, hi: Int): Double = (tp(hi) / tp(lo)) / (hi.toDouble / lo)
      def has(c: Int): Boolean = snap.exists(_._1 == c)
      val reported = (levels ++ bonus.toIntOption.filter(c =>
        has(c) && !levels.contains(c))).distinct
      val levelJson = reported.filter(has).map { c =>
        val b = best(c)
        val phases = b.phases.toSeq.sortBy(_._1)
          .map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
        val util = b.util.toSeq.sortBy(_._1)
          .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
        // driver-serial floor of the best rep: timed wall minus Σ job wall
        // (Catalyst optimize + codegen compile + commit + manifest IO) —
        // the component of the wall that parallelism cannot shrink
        val driver = b.driver.toSeq.sortBy(_._1)
          .map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
        val all = snap.collect { case (`c`, r) => f"${r.secs}%.1f" }
          .mkString("[", ",", "]")
        // best child wall over the calibrated model: >1.2 means even the
        // best rep ran in a slow co-tenant window (cache hits skip the
        // build probe, so slow_factor alone can read 1.0 in a slow run)
        val wom = b.childWall / projWall(benchPages, c)
        f""""$c":{"best_secs":${b.secs}%.1f,"urls_per_sec":${b.work / b.secs}%.1f,""" +
          f""""wall_over_model":$wom%.2f,""" +
          f""""samples_secs":$all,"phases":$phases,"task_time":$util,""" +
          f""""driver":$driver}"""
      }.mkString("{", ",", "}")
      // every adjacent-4× pair present in the level set is an N→4N
      // efficiency measurement
      val pairs = levels.filter(c => levels.contains(c * 4) && has(c) && has(c * 4))
      val effJson = pairs
        .map(c => f""""${c}_to_${c * 4}":${eff(c, c * 4)}%.3f""")
        .mkString("{", ",", "}")
      val lowCores = levels.find(c => levels.contains(c * 4)).getOrElse(levels.head)
      val hiCores = if (levels.contains(lowCores * 4)) lowCores * 4 else levels.last
      val nReps = levels.map(c => snap.count(_._1 == c)).min
      val pairJson =
        if (has(lowCores) && has(hiCores) && lowCores != hiCores)
          f""""cores_hi":$hiCores,"cores_lo":$lowCores,""" +
            f""""urls_per_sec_hi":${tp(hiCores)}%.1f,"urls_per_sec_lo":${tp(lowCores)}%.1f,""" +
            f""""work_hi":${best(hiCores).work},"secs_hi":${best(hiCores).secs}%.1f,""" +
            f""""secs_lo":${best(lowCores).secs}%.1f,""" +
            f""""scaling_efficiency":${eff(lowCores, hiCores)}%.3f,"""
        else """"pair":"incomplete","""
      f""","crawl":{"pages":$benchPages,"waves":$waves,"reps":$nReps,""" +
        f""""budget_secs":$budget%.0f,"slow_factor":$slowFactor%.2f,""" +
        pairJson +
        f""""efficiencies":$effJson,""" +
        f""""levels":$levelJson}"""
    }

    val printed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def emitJson(): Unit = if (printed.compareAndSet(false, true)) {
      val (qs, total) = results.synchronized {
        (results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
          .mkString("{", ",", "}"), results.values.sum)
      }
      val crawl = try assembleCrawlJson() catch {
        case e: Exception => s""","crawl":{"error":"assembly: ${e.getClass.getSimpleName}"}"""
      }
      val skipped = if (queriesSkipped >= 0) s""","queries_skipped":$queriesSkipped""" else ""
      val qProbe = if (queriesProbe.nonEmpty) s""","queries_probe":$queriesProbe""" else ""
      println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$skipped,""" +
        s""""probe":${probeJson(probeSer, probePar)}$qProbe,"sf":"$sfDir"$crawl}""")
      System.out.flush()
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      liveChild.foreach { p =>
        p.descendants().forEach(h => { h.destroyForcibly(); () })
        p.destroyForcibly()
      }
      emitJson()
    }, "bench-emit-on-term"))

    if (doCrawl) {
      // 3 reps: with the round-5-final walls (1c 867 + 3×4c 297 ≈ 1760 s)
      // a 4th 4-core rep would eat the query sweep's entire residue for a
      // marginal best-of gain — 3 draws at the volatile level already
      // bracket the window
      val maxReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
      val safety = 0.93 // projections must underfill the budget slightly
      val reserve = 45.0 // tail room for JSON assembly + temp cleanup
      def remaining: Double = budget - elapsed - reserve

      def specFor(pages: Long) = Corpus.Spec(nPages = pages,
        nHosts = math.max(64, (pages / 50).toInt),
        bodyBytes = sys.env.getOrElse("SPARK_GRAFT_BENCH_BODY", "16000").toInt)

      // the corpus is DETERMINISTIC (seeded) per spec, so it is cached on
      // disk across bench runs keyed by the spec: a cache hit spends the
      // whole remaining budget on samples instead of a ~300 s rebuild
      // (rungs are a small fixed set, ≈12 GB ceiling). The OK stamp is
      // written only after a verified build — a killed build leaves no
      // stamp and is rebuilt from scratch (Corpus.write overwrites).
      val cacheRoot = sys.env.getOrElse("SPARK_GRAFT_BENCH_CORPUS_CACHE",
        "/tmp/zenospark-bench-corpus-cache")
      def corpusDirFor(s: Corpus.Spec): String =
        s"$cacheRoot/p${s.nPages}_h${s.nHosts}_b${s.bodyBytes}"
      def stamped(dir: String): Boolean =
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/CORPUS_OK"))

      // size selection: largest rung whose build (zero if cached) + ONE
      // sample per level fits what's left of the budget (reps are
      // opportunistic extras, cut before size is); explicit
      // SPARK_GRAFT_BENCH_PAGES overrides
      def pairCost(pages: Long): Double = {
        val build = if (stamped(corpusDirFor(specFor(pages)))) 0.0 else projBuild(pages)
        (build + levels.map(l => projWall(pages, l)).sum) * slowFactor
      }
      def pickPages(): Long = wallModel.map(_._1).sortBy(-_.toLong)
        .find(p => pairCost(p) <= remaining * safety)
        .getOrElse(wallModel.map(_._1).min)
      benchPages = if (pagesEnv > 0) pagesEnv else pickPages()
      System.err.println(f"BENCH_PLAN pages=$benchPages budget=$budget%.0f " +
        f"elapsed=$elapsed%.1f projected_pair=${pairCost(benchPages)}%.1f")
      var spec = specFor(benchPages)
      // returns true on success; on a cache MISS the measured build wall
      // doubles as a live window probe (see below)
      def ensureCorpus(s: Corpus.Spec): Boolean = {
        val dir = corpusDirFor(s)
        if (stamped(dir)) { System.err.println(s"BENCH_BUILD pages=${s.nPages} cached"); return true }
        graft.tools.FsUtil.deleteRecursively(dir)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        val b = crawlRun(cpus, dir, s, 0, remaining)
        System.err.println(f"BENCH_BUILD pages=${s.nPages} wall=${b.childWall}%.1f")
        val ok = java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$dir/web_bucketspec.json"))
        if (ok) {
          java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/CORPUS_OK"),
            Array.emptyByteArray)
          // a fresh build is also a window probe: a co-tenant window can
          // run this VM 2-3× slower than the calibrated model. The 32-core
          // build is MORE bus-bound than the 1/4-core children, so damp
          // the ratio by half rather than applying it raw (a raw 2.5×
          // build ratio was observed alongside only ~1.3× child walls).
          val ratio = b.childWall / projBuild(s.nPages)
          slowFactor = math.max(slowFactor, 1.0 + math.max(0.0, ratio - 1.0) * 0.5)
        }
        ok
      }

      var corpusOk = ensureCorpus(spec)
      if (corpusOk && pagesEnv == 0 && slowFactor > 1.25 && pickPages() < benchPages) {
        val drop = pickPages()
        System.err.println(f"BENCH_RESCALE slow_factor=$slowFactor%.2f " +
          f"pages=$benchPages -> $drop (window too slow for planned rung)")
        benchPages = drop
        spec = specFor(drop)
        corpusOk = ensureCorpus(spec)
      }
      var corpusDir = corpusDirFor(spec)

      if (!corpusOk) {
        // a failed corpus build must not silently hand the 1-core child a
        // single-threaded rebuild — abort the campaign, keep the JSON line
        System.err.println("BENCH_ERROR corpus build failed; campaign skipped")
        crawlError = "corpus build failed"
      } else {
        // best-of-N per level with the levels INTERLEAVED (lo,hi,lo,hi,…):
        // this box is a VM with sustained multi-minute CPU-steal windows, so
        // running all reps of one level back-to-back lets a single bad
        // window poison that level's best; interleaving decorrelates, and
        // min wall-clock per level is the steal-free estimate.
        // Before each child: project its wall from the walls ACTUALLY
        // measured this campaign (fallback: the slowdown-scaled model) and
        // skip the child if it would overrun the budget. Every child runs
        // under a hard deadline (= remaining budget): a kill surfaces as a
        // failed sample, never as a lost report.
        def measuredWall(c: Int): Double = {
          val ws = samples.collect { case (`c`, r) => r.childWall }
          // MIN of the measured walls, not max: with best-of-reps
          // semantics and hard per-child deadlines, a slow draw must not
          // veto the next draw at the same level — the next draw in a
          // recovered window is exactly the sample the pair needs, and the
          // worst case of optimism is a deadline-killed child that only
          // costs the informative query sweep, never the signal
          if (ws.nonEmpty) ws.min * 1.05
          else {
            // no samples at this level yet: scale the model by the window
            // actually observed on the levels that HAVE run (the best
            // live estimate — a slow window seen by the cheap 4-core
            // child predicts the 1-core child's inflation far better
            // than the start-of-campaign probe)
            val observed = samples.groupBy(_._1).map { case (c2, ss) =>
              ss.map(_._2.childWall).min / projWall(benchPages, c2)
            }
            val window = if (observed.nonEmpty) observed.max else slowFactor
            projWall(benchPages, c) * window
          }
        }
        def runSample(c: Int, tag: String, rep: Int): Unit = {
          val r = crawlRun(c, corpusDir, spec, waves, remaining)
          if (r.work > 0 && r.secs > 0) {
            samples.synchronized { samples += c -> r }
            System.err.println(
              f"$tag rep=$rep cores=$c work=${r.work} secs=${r.secs}%.1f " +
                f"child_wall=${r.childWall}%.1f urls_per_sec=${r.work / r.secs}%.1f " +
                f"elapsed=$elapsed%.1f")
          } else System.err.println(
            f"$tag rep=$rep cores=$c FAILED child_wall=${r.childWall}%.1f elapsed=$elapsed%.1f")
        }
        var sampling = true
        while (sampling) {
          var rep = 1
          var continue = true
          while (continue && rep <= maxReps) {
            var ranAny = false
            // rep 1 runs the EXPENSIVE level first: every level's first
            // sample is mandatory for the pair, and the 1-core anchor is
            // both the budget hog and the least window-sensitive (observed
            // spread 1.2-1.4× vs 3.7× at 4 cores). Cheapest-first here let
            // one slow 4-core draw inflate the window estimate and starve
            // the 1-core child of its own pre-reserved budget — the
            // campaign then voided a completable 2.4M pair into a small
            // rung. Reps ≥2 go cheapest-first: extra budget flows to the
            // cheap multi-core level, which is the high-variance one, so
            // best-of-reps converges where it matters most.
            val order = if (rep == 1) levels.sortBy(-measuredWall(_))
                        else levels.sortBy(measuredWall)
            order.foreach { c =>
              val nHave = samples.count(_._1 == c)
              // `remaining` already carries the tail reserve and every child
              // is deadline-killed at the budget edge, so the fits-check can
              // spend the true residue instead of stacking a second safety
              // margin on top (which silently wasted ~400 s of clean-window
              // budget that a 4-core rep could have used)
              // a level whose ONLY draws were slow-window draws may still
              // retry if a clean-window child (model wall) fits: best-of
              // semantics want the recovered-window sample, the deadline
              // bounds the downside, and the residue would otherwise fund
              // only the informative query sweep
              val fits = math.min(measuredWall(c),
                projWall(benchPages, c) * 1.05) <= remaining
              // rep 1 runs whenever meaningful time remains AND the
              // window-informed projection is not hopeless (launching a
              // child projected 2× over budget burns the whole residue on
              // a guaranteed deadline-kill — the rung-drop below spends it
              // on a completable pair instead); later reps only if the
              // projection fits outright
              val plausible = measuredWall(c) <= remaining * 1.15
              if (nHave < rep &&
                  ((rep == 1 && remaining > 120 && plausible) || (rep > 1 && fits))) {
                runSample(c, "BENCH_PROGRESS", rep)
                ranAny = true
              }
            }
            if (!ranAny) continue = false
            rep += 1
          }
          // pair incomplete at this rung (a level never landed a sample —
          // skipped as hopeless, or deadline-killed by a slow window):
          // drop to the largest rung the remaining budget can complete and
          // resample. Samples from the old rung are different work and are
          // voided; an efficiency number only ever compares identical work.
          val unsampled = levels.filterNot(c => samples.exists(_._1 == c))
          if (unsampled.nonEmpty && pagesEnv == 0 && remaining > 120) {
            samples.synchronized {
              if (samples.nonEmpty) {
                val observed = samples.groupBy(_._1).map { case (c2, ss) =>
                  ss.map(_._2.childWall).min / projWall(benchPages, c2) }
                slowFactor = math.max(slowFactor, observed.max)
              }
              samples.clear()
            }
            val drop = pickPages()
            if (drop < benchPages) {
              System.err.println(f"BENCH_RUNG_DROP pages=$benchPages -> $drop " +
                f"slow_factor=$slowFactor%.2f remaining=$remaining%.0f")
              benchPages = drop
              spec = specFor(drop)
              corpusOk = ensureCorpus(spec)
              corpusDir = corpusDirFor(spec)
              if (!corpusOk) { crawlError = "corpus build failed"; sampling = false }
            } else sampling = false // no smaller rung fits either — stop
          } else sampling = false
        }

        // opportunistic high-thread absolute point (regressions in the
        // bus-bound regime stay visible when budget allows; never funded
        // at the expense of the N→4N rep loop above)
        bonus.toIntOption.filter(c => c > 1 && c <= cpus && !levels.contains(c))
          .foreach { c =>
            if (projWall(benchPages, c) * slowFactor <= remaining)
              runSample(c, "BENCH_BONUS", 0)
          }
      }
      // the corpus stays on disk: it is the spec-keyed cache that lets the
      // NEXT bench run (same deterministic spec) skip the build entirely;
      // the rung set bounds the cache at ≈12 GB. Per-run crawl stores are
      // deleted by each child itself.
    }

    // ---- part 2: per-query sweep on the remaining budget. Re-probe the
    //      window first so a slow sweep self-identifies in the JSON (the
    //      r04 artifact recorded a 30× text_quality with no way to tell
    //      window from regression). Queries that no longer fit are
    //      skipped and counted — the campaign above is the criterion, the
    //      sweep is informative. ----
    if (doQueries) {
      val (ser2, par2) = windowProbe(cpus)
      queriesProbe = probeJson(ser2, par2)
      System.err.println(f"BENCH_QUERIES_PROBE serial=$ser2%.2f parallel=$par2%.2f " +
        f"elapsed=$elapsed%.1f")
      val spark = newSession(cpus)
      queriesSkipped = 0
      val qReserve = 20.0
      def qRemaining: Double = budget - elapsed - qReserve
      // measured r02-r04: the crawl fixture + the deliberately-uncapped
      // jaccard twins run 20-130 s in slow windows; everything else is
      // seconds
      val expensive = Set("crawl_2waves", "dedup_ngram_jaccard", "dedup_jaccard_capped")
      (SparkEntry.queries ++ benchOnlyQueries).toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val need = if (expensive(name)) 240.0 else 45.0
        if (qRemaining > need) {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
          catch { case _: Throwable =>
            try fn(spark, sfDir).count()
            catch { case _: Throwable => () }
          }
          results.synchronized { results(name) = (System.nanoTime() - t0) / 1e9 }
        } else queriesSkipped += 1
      }
      spark.stop()
    }

    emitJson()
  }
}
