package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** E6 charset handling, pinned to the reference's non-UTF-8 e2e fixtures
  * (/root/reference/e2e/test/nonutf8encoding/): a GBK page's extracted
  * URLs get their QUERY re-encoded in GBK ('世界=再见' →
  * '%CA%C0%BD%E7=%D4%D9%BC%FB'), the path stays UTF-8.
  */
class CharsetSpec extends AnyFunSuite {
  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"/root/reference/e2e/test/nonutf8encoding/testdata/$name"))

  test("detect: content-type charset wins") {
    val (name, certain) = Charsets.detect(fixture("gbk_raw.html").take(1024),
      "text/html; charset=gbk")
    assert(name == "gbk" && certain)
  }
  test("detect: meta charset prescan") {
    val (name, _) = Charsets.detect(fixture("gbk_meta_charset.html").take(1024),
      "text/html")
    assert(name == "gbk")
  }
  test("detect: BOM beats everything") {
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "<html>".getBytes
    assert(Charsets.detect(bom, "text/html; charset=gbk")._1 == "utf-8")
  }
  test("detect: default windows-1252") {
    assert(Charsets.detect("<html></html>".getBytes, "text/html")._1 == "windows-1252")
  }

  test("GBK page: query re-encoded in source charset (reference e2e golden)") {
    val p = PageInput("http://ex.com/raw", "text/html; charset=gbk",
      bodyBytes = fixture("gbk_raw.html"))
    val r = Extract.page(p)
    val all = r.assets ++ r.outlinks
    assert(all.nonEmpty)
    val withQuery = all.filter(_.contains("?"))
    assert(withQuery.nonEmpty, s"expected query URLs in $all")
    // the e2e server requires exactly this GBK-encoded query
    assert(withQuery.forall(_.endsWith("%CA%C0%BD%E7=%D4%D9%BC%FB")),
      s"queries must be GBK-encoded: $withQuery")
    // the path keeps UTF-8 chars (encoded later by canonicalization)
    assert(all.exists(_.contains("1111你好")), all)
  }

  test("GBK meta-declared page behaves identically") {
    val p = PageInput("http://ex.com/meta_decl", "text/html",
      bodyBytes = fixture("gbk_meta_charset.html"))
    val r = Extract.page(p)
    val withQuery = (r.assets ++ r.outlinks).filter(_.contains("?"))
    assert(withQuery.nonEmpty)
    assert(withQuery.forall(_.endsWith("%CA%C0%BD%E7=%D4%D9%BC%FB")), withQuery)
  }

  test("UTF-8 page: queries untouched") {
    val html = """<html><body><a href="/p?q=hello world">x</a></body></html>"""
    val p = PageInput("http://ex.com/", "text/html; charset=utf-8",
      bodyBytes = html.getBytes("UTF-8"))
    val r = Extract.page(p)
    assert(r.outlinks == Seq("http://ex.com/p?q=hello world"))
  }
}
