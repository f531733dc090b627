package graft.canon

import org.scalatest.funsuite.AnyFunSuite
import graft.conf.ZenoConf

/** Canonicalization contract, mirroring the reference unit tables:
  * /root/reference/internal/pkg/preprocessor/url_test.go:11-100 and
  * /root/reference/internal/pkg/preprocessor/exclusion_test.go:10-83.
  */
class CanonSpec extends AnyFunSuite {

  private def ok(raw: String, parent: String = null): String =
    Canon.canonicalize(raw, Option(parent)) match {
      case Right(c) => c.href
      case Left(r)  => fail(s"expected success for $raw, got reject ${r.code}")
    }
  private def rejected(raw: String, parent: String = null): Boolean =
    Canon.canonicalize(raw, Option(parent)).isLeft

  test("valid absolute URL") {
    assert(ok("https://example.com/path") == "https://example.com/path")
  }
  test("valid relative URL with parent") {
    assert(ok("/path", "https://example.com") == "https://example.com/path")
  }
  test("invalid URL") { assert(rejected("://invalid-url")) }
  test("valid URL without scheme") {
    assert(ok("www.google.com") == "http://www.google.com/")
  }
  test("FTP url rejected") { assert(rejected("ftp://ftp.example.com")) }
  test("valid URL with path without scheme") {
    assert(ok("www.google.com/dogs") == "http://www.google.com/dogs")
  }
  test("URL with leading and trailing quotes") {
    assert(ok("\"https://example.com/path\"") == "https://example.com/path")
  }
  test("relative URL with quotes") {
    assert(ok("'/path'", "https://example.com") == "https://example.com/path")
  }
  test("relative URL without parent rejected") { assert(rejected("/path")) }
  test("path loop - repeated segments") {
    assert(rejected("https://example.com/fonts/fonts/fonts/fonts/file.woff2"))
  }
  test("path loop - crawler trap pattern (deep path)") {
    assert(rejected(
      "https://lms.example.com/theme/styles.php/all/DataTables/images/DataTables/fonts/DataTables/fonts/DataTables/images/sort.png"))
  }
  test("acceptable repetition") {
    assert(ok("https://example.com/a/b/a/file.css") == "https://example.com/a/b/a/file.css")
  }
  test("URL exceeding 4000 chars rejected") {
    assert(rejected("https://example.com/" + "a" * 3985))
  }
  test("URL at exactly 4000 chars accepted") {
    val u = "https://example.com/" + "a" * 3980
    assert(ok(u) == u)
  }
  test("localhost rejected") { assert(rejected("http://localhost/x")) }
  test("127.0.0.1 rejected") { assert(rejected("http://127.0.0.1/x")) }
  test("no-TLD host rejected") { assert(rejected("http://intranet/x")) }
  test("fragment stripped") {
    assert(ok("https://example.com/a#frag") == "https://example.com/a")
  }
  test("javascript scheme rejected") { assert(rejected("javascript:void(0)")) }
  test("mailto rejected") { assert(rejected("mailto:a@b.com")) }

  // relative resolution shapes
  test("relative path resolves against parent dir") {
    assert(ok("img/x.png", "https://example.com/a/b.html") ==
      "https://example.com/a/img/x.png")
  }
  test("dot-dot resolution") {
    assert(ok("../up.css", "https://example.com/a/b/c.html") ==
      "https://example.com/a/up.css")
  }
  test("protocol-relative") {
    assert(ok("//cdn.example.com/x.js", "https://example.com/p") ==
      "https://cdn.example.com/x.js")
  }
  test("query-only relative") {
    assert(ok("?page=2", "https://example.com/list") ==
      "https://example.com/list?page=2")
  }
  test("scheme+host lowered, default port stripped") {
    assert(ok("HTTPS://EXAMPLE.COM:443/A") == "https://example.com/A")
    assert(ok("http://example.com:80/") == "http://example.com/")
    assert(ok("http://example.com:8080/") == "http://example.com:8080/")
  }

  // IDNA cases, mirroring /root/reference/pkg/models/url_test.go:9-126
  test("unicode host → punycode") {
    assert(Canon.canonicalize("http://見.香港/x", None).toOption.get.host ==
      "xn--nw2a.xn--j6w193g")
  }
  test("punycode host preserved (url_test.go:9-20)") {
    val u = "https://xn----8sbddjhbicfsohgbg1aeo.xn--p1ia/pic/file/map_of_sarlat.pdf"
    assert(ok(u) == u)
  }
  test("punycode host with port preserved (url_test.go:22-33)") {
    val u = "https://xn----8sbddjhbicfsohgbg1aeo.xn--p1ia:8080/pic/file/map_of_sarlat.pdf"
    assert(ok(u) == u)
  }
  test("unicode host+port → IDNA (url_test.go:35-46)") {
    assert(ok("https://о-змладйвеклблнозеж.xn--p1ia:8080/pic/file/map_of_sarlat.pdf") ==
      "https://xn----8sbddjhbicfsohgbg1aeo.xn--p1ia:8080/pic/file/map_of_sarlat.pdf")
  }
  test("unicode host and path → IDNA + UTF-8 percent path (url_test.go:48-59)") {
    assert(ok("http://παράδειγμα.δοκιμή/Αρχική_σελίδα") ==
      "http://xn--hxajbheg2az3al.xn--jxalpdlp/%CE%91%CF%81%CF%87%CE%B9%CE%BA%CE%AE_%CF%83%CE%B5%CE%BB%CE%AF%CE%B4%CE%B1")
  }
  test("IPv6 literal host ± port (url_test.go:74-97)") {
    assert(ok("https://[2600:4040:23c7:a620:3642:ebaa:ab23:735e]/test") ==
      "https://[2600:4040:23c7:a620:3642:ebaa:ab23:735e]/test")
    assert(ok("https://[2600:4040:23c7:a620:3642:ebaa:ab23:735e]:8080/test") ==
      "https://[2600:4040:23c7:a620:3642:ebaa:ab23:735e]:8080/test")
  }
  test("unicode + embedded URL in query → QueryEscape (url_test.go:99-112)") {
    assert(ok("https://www.youtube.com/watch/0HBwC_wIFF4?t=18363石神視点【Minecraft】平日もど真ん中なんだから早く寝なきゃ【石神のぞみ／にじさんじ所属】https://www.youtube.com/watch/L30uAR9X8Uw?t=10100【倉持エン足中") ==
      "https://www.youtube.com/watch/0HBwC_wIFF4?t=18363%E7%9F%B3%E7%A5%9E%E8%A6%96%E7%82%B9%E3%80%90Minecraft%E3%80%91%E5%B9%B3%E6%97%A5%E3%82%82%E3%81%A9%E7%9C%9F%E3%82%93%E4%B8%AD%E3%81%AA%E3%82%93%E3%81%A0%E3%81%8B%E3%82%89%E6%97%A9%E3%81%8F%E5%AF%9D%E3%81%AA%E3%81%8D%E3%82%83%E3%80%90%E7%9F%B3%E7%A5%9E%E3%81%AE%E3%81%9E%E3%81%BF%EF%BC%8F%E3%81%AB%E3%81%98%E3%81%95%E3%82%93%E3%81%98%E6%89%80%E5%B1%9E%E3%80%91https%3A%2F%2Fwww.youtube.com%2Fwatch%2FL30uAR9X8Uw%3Ft%3D10100%E3%80%90%E5%80%89%E6%8C%81%E3%82%A8%E3%83%B3%E8%B6%B3%E4%B8%AD")
  }
  test("reddit styles host: full signed query untouched (url_test.go:115-126)") {
    val u = "https://styles.redditmedia.com/t5_7wkhw/styles/profileIcon_8w6r6fr3rh2d1.jpeg?width=64&height=64&frame=1&auto=webp&crop=64:64,smart&s=6d8ab9b89c9b846c9eb65622db9ced4992dc0905"
    assert(ok(u) == u)
  }
  test("query re-encode order-preserving") {
    assert(ok("https://example.com/s?b=2&a=1") == "https://example.com/s?b=2&a=1")
  }
  test("space in query → plus (Go QueryEscape)") {
    assert(ok("https://example.com/s?q=a b") == "https://example.com/s?q=a+b")
  }
  test("reddit preview host query untouched") {
    val u = "https://preview.redd.it/x.jpg?width=640&s=Ab%2Bc 1"
    assert(ok(u) == "https://preview.redd.it/x.jpg?width=640&s=Ab%2Bc 1")
  }
  test("space in path percent-encoded") {
    assert(ok("https://example.com/a b/c") == "https://example.com/a%20b/c")
  }

  test("fnv64a matches Go hash/fnv golden values") {
    // goldens computed from the FNV-1a spec constants
    assert(Canon.fnv64a("") == 0xcbf29ce484222325L)
    assert(Canon.fnv64a("a") == 0xaf63dc4c8601ec8cL)
    assert(Canon.fnv64a("hello") == 0xa430d84680aabd0bL)
    assert(Canon.fnv64a("http://example.com/") == 0x32522fc5fdfe06f1L)
  }

  test("reverseHost SURT") {
    assert(Canon.reverseHost("www.google.com") == "com.google.www")
    assert(Canon.reverseHost("example.com") == "com.example")
    assert(Canon.reverseHost("com") == "com")
  }

  test("bad protocols filtered") {
    for (p <- Seq("data:text/html;x", "file:///etc/passwd", "javascript:alert(1)",
                  "mailto:x@y.z", "sms:123", "tel:456", "MAILTO:X@Y.Z"))
      assert(Canon.hasBadProtocol(p), p)
    assert(!Canon.hasBadProtocol("https://example.com"))
  }

  test("exclusion regexes from reference table") {
    val conf = ZenoConf(exclusionRegexes = Seq(
      "(?i)^https?://(www\\.)?archive-it\\.org.*",
      "(?i)^https?://(www\\.)?x\\.com.*",
      "^https?://127\\.0\\.",
      "^https?://192\\.168\\.",
      "(?i)https?://[^/]+/wp-admin/",
      "(?i)^(mailto|sms|tel|data|javascript):"
    ), defaultExcludedHosts = Nil)
    val f = new Filters(conf)
    def excluded(u: String) = !f.test(u, "")
    assert(excluded("http://127.0.0.1/details/testitem"))
    assert(excluded("https://x.com/loukoumi07/status/1922747849671934061"))
    assert(excluded("https://foo.com/wp-admin/something"))
    assert(!excluded("https://archive.org/details/testitem"))
    assert(!excluded("https://something.org/details/wp-admintestitem"))
  }

  test("default exclude hosts archive.org / archive-it.org") {
    val f = new Filters(ZenoConf())
    assert(!f.test("https://archive.org/details/x", "archive.org"))
    assert(!f.test("https://web.archive-it.org/x", "web.archive-it.org"))
    assert(f.test("https://example.com/x", "example.com"))
  }

  test("include filters: host OR url-substring must match") {
    val f = new Filters(ZenoConf(includeHosts = Seq("example.com")))
    assert(f.test("https://sub.example.com/x", "sub.example.com"))
    assert(!f.test("https://other.org/x", "other.org"))
  }

  test("domains-crawl matcher kinds") {
    val m = new DomainsMatcher(Seq("example.com", "https://exact.org/page", "^https://re\\.org/\\d+$"))
    assert(m.matches("https://example.com/x", "example.com"))
    assert(m.matches("https://deep.sub.example.com/x", "deep.sub.example.com"))
    assert(!m.matches("https://notexample.com/x", "notexample.com"))
    assert(m.matches("https://exact.org/page", "exact.org"))
    assert(!m.matches("https://exact.org/other", "exact.org"))
    assert(m.matches("https://re.org/123", "re.org"))
    assert(!m.matches("https://re.org/abc", "re.org"))
  }

  test("path loop: query pair repetition") {
    assert(Canon.hasPathLoop("/a", "feature=x&feature=x&feature=x&feature=x"))
    assert(!Canon.hasPathLoop("/a", "feature=x&feature=x&feature=x"))
  }
}

class CanonPropsSpec extends AnyFunSuite {
  test("canonicalization is idempotent (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ019 %20+./?&=~é中-_#"
    def randStr(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val urls =
      (1 to 300).map(_ => s"https://example.com/${randStr(rnd.nextInt(20))}") ++
      (1 to 300).map(_ => s"http://sub.test.org/a/b?q=${randStr(rnd.nextInt(15))}") ++
      (1 to 300).map(_ => s"https://h.io/${randStr(5)}/${randStr(5)}?x=1&y=${randStr(8)}")
    urls.foreach { u =>
      Canon.canonicalize(u, None) match {
        case Right(c1) =>
          Canon.canonicalize(c1.href, None) match {
            case Right(c2) => assert(c1.href == c2.href, s"not idempotent: $u → ${c1.href} → ${c2.href}")
            case Left(r)   => fail(s"canon output rejected on re-canon: ${c1.href} (${r.code}) from $u")
          }
        case Left(_) => // rejection is fine
      }
    }
  }
}
