package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Remaining upstream extractor goldens over the reference's committed
  * fixtures: the RSS 2.0 feed (xml_test.go:147-158 — 212 URLs with three
  * pinned positions) and the gzipped font-awesome stylesheet
  * (css_test.go:229-259 — 18 links, 0 at-imports).
  */
class UpstreamGoldensSpec extends AnyFunSuite {
  private val fixtures =
    "/root/reference/internal/pkg/postprocessor/extractor/testdata"

  private def read(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$fixtures/$name"))

  private def gunzip(bytes: Array[Byte]): String = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  test("rss 2.0 feed: 212 URLs with the reference's pinned positions") {
    val body = new String(read("rss2.0.xml"), java.nio.charset.StandardCharsets.UTF_8)
    val Some((assets, outlinks)) = Xml.extract(body): @unchecked
    val urls = assets ++ outlinks
    assert(urls.length == 212, s"want 212 got ${urls.length}")
    assert(urls(0) ==
      "https://blog.archive.org/wp-content/uploads/2023/03/ia-logo-sq-150x150.png")
    assert(urls(11) ==
      "https://blog.archive.org/wp-content/uploads/2025/03/Vanishing-Culture-Prelinger-3.png")
    assert(urls(211) ==
      "https://blog.archive.org/2025/02/06/update-on-the-2024-2025-end-of-term-web-archive/feed/")
  }

  test("font-awesome css: 18 links, 0 at-imports") {
    val css = gunzip(read("font-awesome-all.css.gz"))
    val (links, atImports) = Css.extract(css, inline = false)
    assert(links.length == 18, s"want 18 got ${links.length}")
    assert(atImports.isEmpty)
  }
}
