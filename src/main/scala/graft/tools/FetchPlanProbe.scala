package graft.tools

import org.apache.spark.sql.SparkSession
import graft.conf.ZenoConf
import graft.gen.Corpus
import graft.loop.CrawlLoop
import graft.frontier.FrontierStore
import graft.wave.Wave

/** One-off: print the executed fetch-join plan over a (possibly bucketed)
  * corpus dir, to verify which side the ShuffledHashJoin builds.
  * Usage: runMain graft.tools.FetchPlanProbe <corpusDir> <nPages> <nHosts>
  */
object FetchPlanProbe {
  def main(args: Array[String]): Unit = {
    val Array(corpusDir, nPagesS, nHostsS) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spec = Corpus.Spec(nPages = nPagesS.toLong, nHosts = nHostsS.toInt, bodyBytes = 16000)
    val conf = ZenoConf(maxHops = 4, wavePeriodSeconds = 3.0)
    val seeds = (0L until spec.nPages by 2L).take(100000).map { i =>
      val (h, j) = Corpus.locate(i, spec)
      Corpus.pageUrl(h, j)
    }
    val work = java.nio.file.Files.createTempDirectory("probe").toString
    val loop = new CrawlLoop(spark, conf, work, corpusDir, Corpus.robotsMap(spec))
    loop.init(seeds)
    val snap = loop.store.latest.get
    val frontier = loop.store.readFrontier(spark, snap)
    val seen = loop.store.readTable(spark, snap.seen, FrontierStore.seenDdl)
    val host = loop.store.readTable(spark, snap.hostState, FrontierStore.hostStateDdl)
    val logs = Wave.run(spark, conf, 1, frontier, seen, host, loop.web,
      Corpus.robotsMap(spec), None, checkSeenAtClaim = true)
    val plan = logs.unified.queryExecution.executedPlan.toString
    // print only join/exchange/scan lines to keep it readable
    plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
        l.contains("Window")).foreach(println)
    // the fused log must run each UDF once per row: CollapseProject must
    // not have duplicated the extractor (8-arg, takes html) or the
    // canonicalizer (produces the c struct) expressions
    println(s"UDF_CALLS total=${"UDF\\(".r.findAllIn(plan).size} " +
      s"extract=${"UDF\\([^)]*html".r.findAllIn(plan).size} " +
      s"generate=${plan.linesIterator.count(_.contains("posexplode"))}")
    spark.stop()
  }
}
