package graft.canon

import org.scalatest.funsuite.AnyFunSuite
import graft.conf.ZenoConf

/** Pins for the round-1 review findings on matcher/normalizer edges. */
class AdviceFixesSpec extends AnyFunSuite {

  test("DomainsMatcher: parent pattern found between sibling subdomain patterns") {
    // binary-search regression: with [example.com, a.example.com,
    // b.example.com] the probe for c.example.com landed between the
    // subdomain entries and never tested com.example.
    val m = new DomainsMatcher(Seq("example.com", "a.example.com", "b.example.com"))
    assert(m.matches("http://c.example.com/x", "c.example.com"))
    assert(m.matches("http://x.a.example.com/", "x.a.example.com"))
    assert(m.matches("http://example.com/", "example.com"))
    assert(!m.matches("http://notexample.com/", "notexample.com"))
    assert(!m.matches("http://example.org/", "example.org"))
    // label-boundary safety: badexample.com must not match example.com
    assert(!m.matches("http://badexample.com/", "badexample.com"))
  }

  test("reverseHost: the full upstream table (reversehost_test.go:12-50)") {
    val table = Seq(
      "www.google.com" -> "com.google.www",
      "a.b.c.d.e" -> "e.d.c.b.a",
      "example.com" -> "com.example",
      "localhost" -> "localhost",
      "example.com." -> "com.example",
      "WWW.GOOGLE.COM" -> "com.google.www",
      "Sub.ExAmPlE.CoM" -> "com.example.sub",
      "www.google.com:443" -> "com.google.www:443",
      "example.com:80" -> "com.example:80",
      "svc.env.example.org:8443" -> "org.example.env.svc:8443",
      "127.0.0.1" -> "127.0.0.1",
      "127.0.0.1:8080" -> "127.0.0.1:8080",
      "[2001:db8::1]:443" -> "[2001:db8::1]:443",
      "[::1]:80" -> "[::1]:80",
      "www.xn--bcher-kva.example" -> "example.xn--bcher-kva.www",
      "xn--fsqu00a.xn--0zwm56d" -> "xn--0zwm56d.xn--fsqu00a",
      "www.bücher.example" -> "example.bücher.www",
      "a:b:c.example.com" -> "com.example.a:b:c")
    table.foreach { case (in, want) =>
      assert(Canon.reverseHost(in) == want, s"reverseHost($in)")
    }
    // beyond the table: 999.* is not an IP literal → labels reverse
    assert(Canon.reverseHost("999.123.1.1") == "1.1.123.999")
  }

  test("DomainsMatcher: the full upstream Match table (domainscrawl_test.go:177-262)") {
    def m(elements: String*)(rawURL: String): Boolean = {
      val host = {
        val i = rawURL.indexOf("://")
        if (i < 0) ""
        else rawURL.substring(i + 3).takeWhile(c => c != '/' && c != '?' && c != '#')
      }
      new DomainsMatcher(elements).matches(rawURL, host)
    }
    assert(m("example.com")("https://example.com"))
    assert(m("example.com")("https://sub.example.com"))
    assert(m("https://example.org/path?query=1")("https://example.org/path?query=1"))
    assert(!m("https://example.org/path?query=1")(
      "https://example.org/path?query=completely-different"))
    assert(m("example.org")("https://example.org/path?query=1"))
    // greedy match: a full-URL pattern without path/query/fragment matches
    // the (sub)domain of its host (domainscrawl.go:152-160)
    assert(m("https://example.org")("https://example.org/path?query=1"))
    assert(m("""^https?://(www\.)?example\.net/.*""")("https://example.net/"))
    assert(m("""^https?://(www\.)?example\.net/.*""")("http://www.example.net/resource"))
    assert(!m("example.com")("https://different.com"))
    assert(!m("https://another-example.com")("https://example.com/path"))
    assert(!m("""^https?://(www\.)?example\.com/.*""")("https://example.net/"))
    assert(!m("""^https?://(www\.)?example\.net/only-one-path$""")(
      "https://example.net/?query=1"))
    // classification parity: 'example.com/path' is a REGEX (not a naive
    // domain — contains '/'), 'example' too (no dot)
    assert(m("example.com/path")("https://x.org/example.com/path"))
    assert(m("example")("https://an-example.org/"))
  }

  test("surt_host native expression matches Canon.reverseHost") {
    val spark = graft.engine.EngineSpec.spark
    import spark.implicits._
    val hosts = Seq("www.google.com", "example.com:8080", "192.168.1.1",
      "a.b.c.d.e", "WWW.X.ORG.")
    val out = hosts.toDF("h")
      .select(graft.spark.SurtHost(org.apache.spark.sql.functions.col("h")))
      .collect().map(_.getString(0))
    assert(out.toSeq == hosts.map(Canon.reverseHost))
  }

  test("robots: equal-length prefix tie prefers allow") {
    val rules = Map("h.com" -> Seq(("/a/", false), ("/a/", true)))
    val allow = graft.spark.Udfs.robotsAllow(rules)
    val spark = graft.engine.EngineSpec.spark
    import spark.implicits._
    val r = Seq(("h.com", "/a/x")).toDF("host", "path")
      .select(allow(org.apache.spark.sql.functions.col("host"),
        org.apache.spark.sql.functions.col("path")))
      .collect().head.getBoolean(0)
    assert(r, "allow wins the equal-length tie")
  }
}
