package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.conf.ZenoConf

/** The native PathOf / FilterTest / RobotsAllow expressions must be
  * value-identical to the scalar-UDF bodies they replaced, including the
  * non-null-intolerant contracts (null href → ""/false, null host →
  * true, null path → "/"). Pinned against the former UDF logic kept
  * verbatim, evaluated driver-side, plus Filters.test (the canonical
  * engine implementation) for the filter.
  */
class WaveExprsSpec extends AnyFunSuite {
  private lazy val spark = graft.engine.EngineSpec.spark

  // the former Udfs.pathOf body, verbatim
  private def refPathOf(href: String): String = {
    if (href == null) ""
    else {
      val i = href.indexOf("://")
      if (i < 0) ""
      else {
        val rest = href.substring(i + 3)
        val slash = rest.indexOf('/')
        if (slash < 0) ""
        else {
          val p = rest.substring(slash)
          val q = p.indexOf('?')
          if (q >= 0) p.substring(0, q) else p
        }
      }
    }
  }

  // the former Udfs.robotsAllow body, verbatim
  private def refRobots(rules: Map[String, Seq[(String, Boolean)]],
                        host: String, path: String): Boolean = {
    if (host == null) true
    else rules.get(host) match {
      case None => true
      case Some(hostRules) =>
        val p = if (path == null) "/" else path
        var bestLen = -1
        var bestAllow = true
        val it = hostRules.iterator
        while (it.hasNext) {
          val (prefix, allow) = it.next()
          if (p.startsWith(prefix) &&
              (prefix.length > bestLen ||
                (prefix.length == bestLen && allow && !bestAllow))) {
            bestLen = prefix.length
            bestAllow = allow
          }
        }
        bestLen < 0 || bestAllow
    }
  }

  private val urls = Seq(
    "http://example.com/a/b?q=1", "https://example.com/", "http://example.com",
    "http://example.com/path?", "ftp://h/p", "no-scheme", "://x/y", "",
    "http://example.com/ünï/çödé?日本=語", "http://h/a?b?c", null)

  test("PathOf equals the former UDF body on edge URLs") {
    import spark.implicits._
    val df = urls.zipWithIndex.map { case (u, i) => (i, Option(u)) }.toDF("i", "href")
    val got = df.select($"i", Udfs.pathOf($"href").as("p")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    urls.zipWithIndex.foreach { case (u, i) =>
      assert(got(i) == refPathOf(u), s"url=$u")
    }
  }

  test("FilterTest equals Filters.test + UDF null contract") {
    import spark.implicits._
    val conf = ZenoConf(
      includeHosts = Seq("example"), includeStrings = Seq("/keep/"),
      excludeHosts = Seq("flaky."), excludeStrings = Seq("/private/"),
      exclusionRegexes = Seq(".*\\.pdf$"))
    val filters = new graft.canon.Filters(conf)
    val cases = Seq(
      ("http://example.com/x", "example.com"),
      ("http://other.org/keep/x", "other.org"),     // include via string
      ("http://other.org/x", "other.org"),          // include miss
      ("http://flaky.example.net/x", "flaky.example.net"), // exclude host
      ("http://example.com/private/x", "example.com"),     // exclude string
      ("http://example.com/doc.pdf", "example.com"),        // regex
      (null, "example.com"),                         // null href → false
      ("http://example.com/x", null))                // null host → ""
    val df = cases.zipWithIndex
      .map { case ((h, o), i) => (i, Option(h), Option(o)) }.toDF("i", "href", "host")
    val t = Udfs.filterTest(conf)
    val got = df.select($"i", t($"href", $"host").as("keep")).collect()
      .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    cases.zipWithIndex.foreach { case ((h, o), i) =>
      val expect = h != null && filters.test(h, if (o == null) "" else o)
      assert(got(i) == expect, s"href=$h host=$o")
    }
    // archive.org default exclusion rides defaultExcludedHosts
    val d2 = Seq((0, Some("http://archive.org/x"), Some("archive.org"))).toDF("i", "href", "host")
    assert(!d2.select(t($"href", $"host")).collect()(0).getBoolean(0))
  }

  test("RobotsAllow equals the former UDF body incl. tie-breaks and nulls") {
    import spark.implicits._
    val rules = Map(
      "h1" -> Seq(("/", true), ("/private", false), ("/private/open", true)),
      "h2" -> Seq(("/a", false), ("/a", true)), // equal length: allow wins
      "h3" -> Seq(("/x", false)))
    val cases = Seq(
      ("h1", "/private/open/file"), ("h1", "/private/secret"), ("h1", "/pub"),
      ("h2", "/a/b"), ("h3", "/y"), ("h3", "/x/1"), ("h4", "/anything"),
      (null, "/x"), ("h1", null))
    val df = cases.zipWithIndex
      .map { case ((h, p), i) => (i, Option(h), Option(p)) }.toDF("i", "host", "path")
    val allow = Udfs.robotsAllow(rules)
    val got = df.select($"i", allow($"host", $"path").as("a")).collect()
      .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    cases.zipWithIndex.foreach { case ((h, p), i) =>
      assert(got(i) == refRobots(rules, h, p), s"host=$h path=$p")
    }
  }

  test("domainsMatch with no patterns folds to constant false") {
    import spark.implicits._
    val m = Udfs.domainsMatch(ZenoConf())
    val df = Seq(("http://a.com/x", "a.com")).toDF("href", "host")
    val rows = df.select(m($"href", $"host").as("d")).collect()
    assert(!rows(0).getBoolean(0))
    // non-empty patterns still go through the matcher UDF
    val m2 = Udfs.domainsMatch(ZenoConf(domainsCrawl = Seq("a.com")))
    assert(df.select(m2($"href", $"host")).collect()(0).getBoolean(0))
  }
}
