package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.metrics.source.CodegenMetrics
import graft.conf.ZenoConf
import graft.gen.Corpus
import graft.loop.CrawlLoop

/** Pins the cross-wave codegen-reuse property the bench child and any
  * long-lived crawl depend on: once one 2-wave crawl has compiled the
  * wave-1 and steady-state plan shapes, a second crawl over the same
  * corpus layout compiles (almost) nothing — per-wave constants travel
  * through `LongParam` references (value-stable generated source) and the
  * session's codegen class cache is sized past the ~113-unit working set
  * (see EngineSpec's `spark.sql.codegen.cache.maxEntries`). Before those
  * two fixes, EVERY wave re-Janino-compiled every whole-stage unit
  * (measured 226 compiles / 2 waves at the 2.4M bench rung).
  *
  * Slack: the background compactor may plan/compile a handful of units
  * concurrently, so the assertion is "far below a full recompile", not
  * exactly zero.
  */
class CodegenStabilitySpec extends AnyFunSuite {

  test("a second same-shape crawl reuses the first crawl's compiled classes") {
    val spark = EngineSpec.spark
    val spec = Corpus.Spec(nPages = 400, nHosts = 20, bodyBytes = 2000)
    val corpus = EngineSpec.tmpDir("cgstab-corpus")
    Corpus.write(spark, corpus, spec)
    val seeds = (0L until spec.nPages by 2L).map { i =>
      val (h, j) = Corpus.locate(i, spec)
      Corpus.pageUrl(h, j)
    }
    val conf = ZenoConf(maxHops = 4, wavePeriodSeconds = 3.0)

    def crawl2waves(): Unit = {
      val loop = new CrawlLoop(spark, conf, EngineSpec.tmpDir("cgstab-work"),
        corpus, Corpus.robotsMap(spec))
      loop.init(seeds)
      loop.run(2)
    }

    crawl2waves() // compiles wave-1 + steady-state shapes
    val before = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    crawl2waves() // must be (almost) all cache hits
    val delta = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - before
    assert(delta < 12,
      s"second crawl compiled $delta codegen units — cross-wave class " +
        "reuse is broken (per-wave literal in a plan, or the codegen " +
        "cache is undersized)")
  }
}
