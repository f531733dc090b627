package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.loop.{CrawlLoop, SeedList}

/** E2E scenarios mirroring the reference e2e suite: domains-crawl hop
  * reset, get-list ingestion, nxdomain (all-fail), plus the SURVEY §5
  * property tests (dedupe commutativity across partitionings, hop
  * monotonicity).
  */
class E2eScenariosSpec extends AnyFunSuite {
  import EngineSpec._

  test("domains-crawl: matching outlinks get hop reset to 0") {
    val corpus = tmpDir("corpus")
    writeCorpus(corpus, Seq(
      page("http://a.com/", Seq("http://watched.org/x", "http://other.net/y")),
      page("http://watched.org/x", Nil),
      page("http://other.net/y", Nil)))
    val conf = testConf.copy(domainsCrawl = Seq("watched.org"), maxHops = 5)
    val loop = new CrawlLoop(spark, conf, tmpDir("store"), corpus, Map.empty)
    loop.init(Seq("http://a.com/"))
    loop.run(1)
    val rows = loop.frontier.select("url_canon", "hops")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows("http://watched.org/x") == 0, "domains-crawl match resets hops")
    assert(rows("http://other.net/y") == 1, "non-matching outlink gets hops+1")
  }

  test("domains-crawl bypasses the hop gate (outlinks.go:151-163)") {
    val corpus = tmpDir("corpus")
    writeCorpus(corpus, Seq(
      page("http://watched.org/a", Seq("/b")),
      page("http://watched.org/b", Nil)))
    // maxHops=0: normally NO outlinks are ever extracted
    val conf = testConf.copy(maxHops = 0, domainsCrawl = Seq("watched.org"))
    val loop = new CrawlLoop(spark, conf, tmpDir("store"), corpus, Map.empty)
    loop.init(Seq("http://watched.org/a"))
    val counters = loop.run(3)
    assert(counters.map(_.claimed).sum == 2, "outlink crawled despite maxHops=0")
  }

  test("get-list: seed file with comments and blanks") {
    val f = java.nio.file.Files.createTempFile("seeds", ".txt")
    java.nio.file.Files.write(f,
      "# comment\n\nhttp://a.com/\n  http://b.com/  \n#x\nhttp://a.com/\n".getBytes)
    val seeds = SeedList.read(spark, f.toString).collect().toSeq
    assert(seeds == Seq("http://a.com/", "http://b.com/", "http://a.com/"))
    // feeding them into init dedupes
    val corpus = tmpDir("corpus")
    writeCorpus(corpus, Seq(page("http://a.com/", Nil), page("http://b.com/", Nil)))
    val loop = new CrawlLoop(spark, testConf, tmpDir("store"), corpus, Map.empty)
    loop.init(seeds)
    assert(loop.frontier.count() == 2)
  }

  test("nxdomain: unfetchable seed fails and finishes") {
    val corpus = tmpDir("corpus")
    writeCorpus(corpus, Seq(page("http://exists.com/", Nil)))
    val loop = new CrawlLoop(spark, testConf, tmpDir("store"), corpus, Map.empty)
    loop.init(Seq("http://exists.com/", "http://nxdomain.invalid.example/"))
    val counters = loop.run(3)
    assert(counters.map(_.failed).sum == 1)
    assert(counters.map(_.fetched).sum == 1)
    assert(loop.frontier.count() == 0, "both seeds terminal")
  }

  test("robots: longest-prefix rule wins") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val rules = Map("a.com" -> Seq(("/", false), ("/public/", true)))
    val udf = graft.spark.Udfs.robotsAllow(rules)
    val got = Seq(
      ("a.com", "/private/x"), ("a.com", "/public/y"), ("a.com", "/"),
      ("b.com", "/anything")).toDF("host", "path")
      .select(col("host"), col("path"), udf(col("host"), col("path")).as("allow"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(!got(("a.com", "/private/x")), "blanket disallow")
    assert(got(("a.com", "/public/y")), "longer allow prefix wins")
    assert(!got(("a.com", "/")))
    assert(got(("b.com", "/anything")), "unknown host: allow-all default")
  }

  test("property: dedupe invariant under repartitioning") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (s"http://h${i % 7}.com/p${i % 40}", s"k${i % 3}"))
      .toDF("url_canon", "kind")
    def dedupe(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"url_canon").orderBy($"kind")))
        .filter($"rn" === 1).drop("rn")
        .collect().map(_.toString).sorted.toSeq
    val a = dedupe(rows.repartition(1))
    val b = dedupe(rows.repartition(16))
    val c = dedupe(rows.repartition(5, $"kind"))
    assert(a == b && b == c, "dedupe result independent of partitioning")
  }

  test("property: hop monotonicity across the crawl") {
    val corpus = tmpDir("corpus")
    val pages = (0 until 15).map { i =>
      page(s"http://h${i % 3}.com/p$i", Seq(s"http://h${(i + 1) % 3}.com/p${(i + 2) % 15}"))
    }
    writeCorpus(corpus, pages)
    val loop = new CrawlLoop(spark, testConf, tmpDir("store"), corpus, Map.empty)
    loop.init(Seq("http://h0.com/p0"))
    loop.run(6)
    // every URL's hop in the seen log equals BFS depth order: hops never
    // exceed wave index (a URL claimed in wave w has hops ≤ w-1)
    val logs = (1 to 6).flatMap { w =>
      val p = s"${loop.store.workDir}/data/w${"%05d".format(w)}-log"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        spark.read.parquet(p).filter(col("row_type") === "claimed")
          .select("hops").collect().map(_.getInt(0) -> w)
      else Nil
    }
    logs.foreach { case (hops, wave) =>
      assert(hops <= wave - 1, s"hops $hops claimed in wave $wave")
    }
  }
}
