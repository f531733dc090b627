package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.loop.CrawlLoop

/** Pins the seeds_finished counter wave by wave. The counter is computed
  * from the pre-aggregated seedcnt DELTA (CrawlLoop.scala seeds-finished
  * phase) — an invariant-dependent optimization (a seed's live-row sum can
  * reach 0 only on a wave that claimed it, and every claimed seed leaves a
  * row in the aggregated delta); this test covers the tricky cases:
  *   - a seed finishing immediately (wave 1),
  *   - a seed whose wave-1 claims are EXACTLY cancelled by enqueues
  *     (delta row with cnt 0 — present but not finished),
  *   - seeds finishing on later waves via asset and redirect children
  *     (which inherit the parent seed, unlike outlinks which root new
  *     seed trees).
  */
class SeedsFinishedSpec extends AnyFunSuite {
  import EngineSpec._

  test("seeds_finished per wave: immediate, asset-delayed, redirect-chain") {
    val corpus = tmpDir("corpus")
    val imgHtml =
      """<html><body><img src="/i1.png"><img src="/i2.png"></body></html>"""
    writeCorpus(corpus, Seq(
      // s1: two asset children → finishes wave 2 (claims 1, enqueues 2 in w1)
      ("http://s1.com/", imgHtml, "text/html", 200, ""),
      ("http://s1.com/i1.png", "x", "image/png", 200, ""),
      ("http://s1.com/i2.png", "x", "image/png", 200, ""),
      // s2: leaf → finishes wave 1
      page("http://s2.com/", Nil),
      // s3: redirect chain (redirect children inherit the seed): each wave
      // claims 1 and enqueues 1 — the delta is exactly 0 until the chain
      // ends at v3 in wave 3
      redirect("http://s3.com/", "http://s3.com/v2"),
      redirect("http://s3.com/v2", "http://s3.com/v3"),
      page("http://s3.com/v3", Nil)))
    val conf = testConf.copy(disableAssetsCapture = false)
    val loop = new CrawlLoop(spark, conf, tmpDir("store"), corpus, Map.empty)
    loop.init(Seq("http://s1.com/", "http://s2.com/", "http://s3.com/"))
    val counters = loop.run(5)
    assert(counters.length == 3, s"crawl drains in 3 waves: $counters")
    assert(counters.map(c => c.wave -> c.seeds_finished).toMap ==
      Map(1 -> 1L, 2 -> 1L, 3 -> 1L),
      s"s2 finishes w1, s1 w2, s3 w3: $counters")
    assert(counters.map(_.seeds_finished).sum == 3)

    // independent ground truth: recompute per-wave finishes from the
    // committed snapshots' live frontier views (the thing the incremental
    // delta path is standing in for)
    val store = loop.store
    val perWave = store.history.filter(s => s.wave >= 0 && !s.isCompaction)
      .sortBy(_.version)
    def liveSeeds(s: store.Snapshot): Set[String] =
      store.readFrontier(spark, s).select("seed_id")
        .collect().map(_.getString(0)).toSet
    val views = perWave.map(s => s.wave -> liveSeeds(s))
    val groundTruth = views.sliding(2).collect {
      case Seq((_, before), (w, after)) => w -> (before -- after).size.toLong
    }.toMap
    counters.foreach { c =>
      assert(groundTruth(c.wave) == c.seeds_finished,
        s"wave ${c.wave}: incremental ${c.seeds_finished} vs snapshot-derived ${groundTruth(c.wave)}")
    }
  }
}
