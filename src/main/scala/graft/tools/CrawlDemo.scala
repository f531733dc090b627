package graft.tools

import org.apache.spark.sql.SparkSession
import graft.conf.ZenoConf
import graft.gen.Corpus
import graft.loop.CrawlLoop

/** CLI surface for the full crawl engine: generate a deterministic corpus,
  * seed the frontier, run waves, print per-wave counters. Re-running with
  * the same workDir resumes from the last committed snapshot.
  *
  * Usage: runMain graft.tools.CrawlDemo <workDir> [nSeeds] [maxWaves] [cores] [nPages] [nHosts] [warcOutDir]
  * (a non-empty warcOutDir archives the crawl's fetched pages as rotated
  * WARC files through graft.warc — the S10 sink over the job's lineage)
  */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val workDir = if (args.length > 0) args(0) else "/tmp/zenospark-demo"
    val nSeeds = if (args.length > 1) args(1).toInt else 5
    val maxWaves = if (args.length > 2) args(2).toInt else 5
    val cores = if (args.length > 3) args(3).toInt else 8
    val nPages = if (args.length > 4) args(4).toLong else 2000L
    val nHosts = if (args.length > 5) args(5).toInt else 20

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("zenospark-crawl-demo")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      // one crawl wave compiles ~113 whole-stage-codegen units; the
      // STATIC default cache (100 entries) evicts them before the next
      // wave re-requests the (value-stable, see spark/LongParam) sources
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spec = Corpus.Spec(nPages = nPages, nHosts = nHosts)
    val corpusDir = s"$workDir/corpus"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$corpusDir/pages"))) {
      println(s"generating corpus: ${spec.nPages} pages / ${spec.nHosts} hosts → $corpusDir")
      Corpus.write(spark, corpusDir, spec)
    }

    val conf = ZenoConf(maxHops = 3, wavePeriodSeconds = 0.2) // budget 10/host/wave
    val loop = new CrawlLoop(spark, conf, s"$workDir/store", corpusDir,
      Corpus.robotsMap(spec))
    val seeds = (0 until math.min(nSeeds, spec.nHosts)).map(h => Corpus.urlOf(h, 0))
    loop.init(seeds)
    println(s"seeds: ${seeds.mkString(", ")}")

    val t0 = System.nanoTime()
    val counters = loop.run(maxWaves)
    val secs = (System.nanoTime() - t0) / 1e9
    counters.foreach { c =>
      println(f"wave ${c.wave}%3d: claimed=${c.claimed}%6d fetched=${c.fetched}%6d " +
        f"failed=${c.failed}%5d deduped=${c.deduped}%6d excluded=${c.excluded}%6d " +
        f"queued=${c.queued}%6d seeds_done=${c.seeds_finished}%4d")
    }
    val scheduled = counters.map(_.claimed).sum + counters.map(_.queued).sum
    println(f"total: ${counters.length} waves in $secs%.1f s — " +
      f"${scheduled / math.max(secs, 1e-9)}%.0f urls scheduled+deduped/s")
    val frontierLeft = loop.frontier.count()
    println(s"frontier remaining: $frontierLeft, seen: ${loop.seen.count()}")
    // optional 7th arg: archive the crawl's fetched pages as WARC (S10)
    if (args.length > 6 && args(6).nonEmpty) {
      val warcCounters = graft.warc.Warc.archiveCrawl(
        spark, s"$workDir/store", s"$corpusDir/pages", args(6),
        options = Map("operator" -> "crawl-demo"))
      println(warcCounters.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString("warc: ", " ", ""))
    }
    spark.stop()
  }
}
