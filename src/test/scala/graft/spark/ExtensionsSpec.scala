package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.canon.Canon

/** SQL-facing function registration via SparkSessionExtensions. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = graft.engine.EngineSpec.spark
    ZenoExtensions.register(s)
    s
  }

  test("fnv64a callable from SQL") {
    val got = spark.sql("SELECT fnv64a('http://example.com/') AS h")
      .first().getLong(0)
    assert(got == Canon.fnv64a("http://example.com/"))
  }

  test("surt_host callable from SQL and matches Canon.reverseHost") {
    val hosts = Seq("www.google.com", "example.com", "com", "a.b.c.d.e")
    hosts.foreach { h =>
      val got = spark.sql(s"SELECT surt_host('$h') AS s").first().getString(0)
      assert(got == Canon.reverseHost(h), h)
    }
  }

  test("null safety through SQL") {
    val r = spark.sql("SELECT fnv64a(CAST(NULL AS STRING)) AS h, " +
      "surt_host(CAST(NULL AS STRING)) AS s").first()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("zeno_canonicalize / zeno_host callable from SQL") {
    val r = spark.sql(
      "SELECT zeno_canonicalize('HTTP://Example.COM:80/a/../b?z=1&a=2', CAST(NULL AS STRING)) AS c, " +
        "zeno_host('http://Sub.Example.org/x') AS h").first()
    assert(r.getString(0) == graft.canon.Canon
      .canonicalize("HTTP://Example.COM:80/a/../b?z=1&a=2", None, graft.conf.ZenoConf.default)
      .toOption.get.href)
    assert(r.getString(1) == "sub.example.org")
    // rejects return NULL, usable in SQL filters
    val bad = spark.sql("SELECT zeno_canonicalize('javascript:void(0)', CAST(NULL AS STRING)) AS c").first()
    assert(bad.isNullAt(0))
  }
}
