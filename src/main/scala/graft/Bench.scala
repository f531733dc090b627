package graft

import org.apache.spark.sql.SparkSession
import graft.conf.ZenoConf
import graft.gen.Corpus
import graft.loop.CrawlLoop

/** Benchmark main. Two parts:
  *
  *  1. per-query wall-clock over SPARK_GRAFT_SF_DIR (driver contract)
  *  2. crawl-throughput protocol (BASELINE.md): the same crawl job on the
  *     same synthetic corpus at two parallelism levels — local[N] and
  *     local[4N] — reporting URLs scheduled+deduped per second at each and
  *     the scaling efficiency (throughput_4N / throughput_N) / 4.
  *
  * Prints ONE JSON line. Knobs (env):
  *   SPARK_GRAFT_CPUS          high parallelism level (default 32)
  *   SPARK_GRAFT_BENCH_PAGES   corpus size for the crawl bench (default 120000)
  *   SPARK_GRAFT_BENCH_CRAWL   "0" to skip the crawl bench
  */
object Bench {

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"zenospark-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One crawl run; returns (urls scheduled+deduped, seconds). */
  private def crawlRun(cores: Int, corpusDir: String, spec: Corpus.Spec,
                       waves: Int): (Long, Double) = {
    val spark = newSession(cores)
    try {
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$corpusDir/pages")))
        Corpus.write(spark, corpusDir, spec)
      val work = java.nio.file.Files.createTempDirectory(s"bench-crawl-$cores").toString
      val conf = ZenoConf(maxHops = 4, wavePeriodSeconds = 1.0) // budget 50/host/wave
      val loop = new CrawlLoop(spark, conf, work, corpusDir, Corpus.robotsMap(spec))
      // large Common-Crawl-style seed set: every 4th corpus page — the
      // metric is frontier scheduling+dedupe throughput, so the frontier
      // must be deep from wave 1
      val seeds = (0L until spec.nPages by 4).map { i =>
        val (h, j) = Corpus.locate(i, spec)
        Corpus.pageUrl(h, j)
      }
      loop.init(seeds)
      val t0 = System.nanoTime()
      val counters = loop.run(waves)
      val secs = (System.nanoTime() - t0) / 1e9
      // scheduled = claimed through the priority queue; deduped = candidate
      // URLs pushed through the J1/J2/J3 dedupe path (queued + dropped)
      val work_ = counters.map(c => c.claimed + c.queued + c.deduped).sum
      (work_, secs)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "120000").toLong
    val doCrawl = sys.env.getOrElse("SPARK_GRAFT_BENCH_CRAWL", "1") != "0"

    // ---- part 1: driver-contract query bench ----
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES", "1") != "0") {
      val spark = newSession(cpus)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable =>
          try fn(spark, sfDir).count()
          catch { case _: Throwable => () }
        }
        results(name) = (System.nanoTime() - t0) / 1e9
      }
      spark.stop()
    }

    // ---- part 2: crawl scaling protocol ----
    var crawlJson = ""
    if (doCrawl) {
      val spec = Corpus.Spec(nPages = benchPages, nHosts = math.max(64, (benchPages / 50).toInt))
      val corpusDir = java.nio.file.Files.createTempDirectory("bench-corpus").toString
      val waves = 3
      val lowCores = math.max(2, cpus / 4)
      // untimed warmup: builds the corpus, warms JIT + page cache so the
      // two timed runs see identical conditions
      crawlRun(cpus, corpusDir, spec, 1)
      val (workLo, secsLo) = crawlRun(lowCores, corpusDir, spec, waves)
      val (workHi, secsHi) = crawlRun(cpus, corpusDir, spec, waves)
      val tpHi = workHi / secsHi
      val tpLo = workLo / secsLo
      val eff = (tpHi / tpLo) / (cpus.toDouble / lowCores)
      crawlJson =
        f""","crawl":{"pages":$benchPages,"waves":$waves,""" +
          f""""cores_hi":$cpus,"cores_lo":$lowCores,""" +
          f""""urls_per_sec_hi":${tpHi}%.1f,"urls_per_sec_lo":${tpLo}%.1f,""" +
          f""""work_hi":$workHi,"secs_hi":$secsHi%.1f,"secs_lo":$secsLo%.1f,""" +
          f""""scaling_efficiency":$eff%.3f}"""
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$crawlJson}""")
  }
}
