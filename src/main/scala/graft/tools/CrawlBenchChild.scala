package graft.tools

import org.apache.spark.sql.SparkSession
import graft.conf.ZenoConf
import graft.gen.Corpus
import graft.loop.CrawlLoop

/** One timed crawl in a fresh JVM (spawned by graft.Bench) so JIT/GC state
  * never bleeds between the N-core and 4N-core measurements.
  * Prints CRAWL_PHASES <phase>=<secs>... (per-phase wall decomposition of
  * the timed waves) and exactly one line: CRAWL_RESULT <work> <secs>
  *
  * args: corpusDir cores waves nPages nHosts
  */
object CrawlBenchChild {
  def main(args: Array[String]): Unit = {
    val Array(corpusDir, coresS, wavesS, nPagesS, nHostsS) = args.take(5)
    val bodyBytes = if (args.length > 5) args(5).toInt else 12000
    val seedStep = if (args.length > 6) args(6).toInt else 4
    val cores = coresS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"zenospark-bench-child-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      // AQE default OFF for the crawl: the wave DAG already fixes its join
      // strategies (explicit broadcast()/shuffle_hash hints) and handles
      // skew below the exchange (WindowGroupLimit), so adaptive re-planning
      // only adds per-stage driver serial — measured 3-6% slower at BOTH 2
      // and 8 cores (4 interleaved pairs, round 3)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val spec = Corpus.Spec(nPages = nPagesS.toLong, nHosts = nHostsS.toInt, bodyBytes = bodyBytes)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$corpusDir/pages")))
      Corpus.write(spark, corpusDir, spec)

    // budget 150/host/wave = the reference's token-bucket burst capacity
    // (rate-limit-capacity 150, cmd/get.go:114)
    val conf = ZenoConf(maxHops = 4, wavePeriodSeconds = 3.0)
    val seeds = (0L until spec.nPages by seedStep.toLong).map { i =>
      val (h, j) = Corpus.locate(i, spec)
      Corpus.pageUrl(h, j)
    }

    // in-JVM warmup: one wave on a throwaway store (JIT + page cache)
    val warmDir = java.nio.file.Files.createTempDirectory("bench-warm").toString
    val warmLoop = new CrawlLoop(spark, conf, warmDir, corpusDir, Corpus.robotsMap(spec))
    warmLoop.init(seeds)
    warmLoop.run(1)

    val work = java.nio.file.Files.createTempDirectory(s"bench-crawl-$cores").toString
    val loop = new CrawlLoop(spark, conf, work, corpusDir, Corpus.robotsMap(spec))
    loop.init(seeds)
    val t0 = System.nanoTime()
    val counters = loop.run(wavesS.toInt)
    val secs = (System.nanoTime() - t0) / 1e9
    val workDone = counters.map(c => c.claimed + c.queued + c.deduped).sum
    val phases = loop.phaseSums.toSeq.sortBy(_._1)
      .map { case (p, s) => f"$p=$s%.2f" }.mkString(" ")
    println(s"CRAWL_PHASES $phases")
    println(f"CRAWL_RESULT $workDone $secs%.3f")
    spark.stop()
    // the per-run crawl stores are ~GB-sized and a campaign forks many
    // children — delete them or the box's /tmp fills mid-campaign (the
    // shared corpus dir is the only thing worth keeping warm)
    Seq(warmDir, work).foreach { d =>
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          val cs = try { val it = s.iterator(); val b = Seq.newBuilder[java.nio.file.Path]
            while (it.hasNext) b += it.next(); b.result() } finally s.close()
          cs.foreach(rm)
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      try rm(java.nio.file.Paths.get(d))
      catch { case _: Exception => () }
    }
  }
}
