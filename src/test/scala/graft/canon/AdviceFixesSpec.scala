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

  test("reverseHost: ports, IP literals, trailing dots, case (reversehost.go:11-55)") {
    assert(Canon.reverseHost("www.google.com") == "com.google.www")
    assert(Canon.reverseHost("example.com:8080") == "com.example:8080")
    assert(Canon.reverseHost("WWW.Example.COM.") == "com.example.www")
    assert(Canon.reverseHost("192.168.1.1") == "192.168.1.1")
    assert(Canon.reverseHost("192.168.1.1:8443") == "192.168.1.1:8443")
    assert(Canon.reverseHost("[::1]:443") == "[::1]:443")
    assert(Canon.reverseHost("single") == "single")
    // 999.1.1.1 is NOT an IP literal → labels reverse
    assert(Canon.reverseHost("999.123.1.1") == "1.1.123.999")
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
