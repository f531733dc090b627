package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.conf.ZenoConf

/** Extractor contract mirroring the reference unit tables:
  * html_test.go, css_test.go, json_test.go, xml_test.go,
  * link_header_test.go, utils_test.go, outlinks_test.go (golden counts).
  */
class HtmlExtractSpec extends AnyFunSuite {
  private val conf = ZenoConf()
  private def outlinks(html: String, url: String = "http://ex.com") =
    Html.outlinks(HtmlScanner.scan(html), url, conf)
  private def assets(html: String, url: String = "http://ex.com") =
    Html.assets(HtmlScanner.scan(html), url, conf)._1

  test("HTML outlinks: a/onclick/ondblclick/iframe/area = 7") {
    val html = """
	<html><head></head><body>
    <a href="http://example.com">ex</a>
    <a href="http://archive.org">ar</a>
    <p>test</p>
    <a href="https://web.archive.org">wa</a>
    <a onclick="window.location='http://foo.com'">click me</a>
    <a ondblclick="window.location='https://bar.com'">double click me</a>
    <iframe title="Internet Archive" src="https://web.archive.org"></iframe>
    <img src="world-map.jpg" usemap="#worldmap" alt="World Map">
    <map name="worldmap">
      <area shape="rect" coords="34,44,270,350" href="https://example.com/usa" alt="USA">
    </map>
    </body></html>"""
    assert(outlinks(html).length == 7)
  }

  test("audio/video/embed assets = 3, embed resolved") {
    val html = """
    <html><body>
      <video src="http://f1.com"></video>
      <p>test</p>
      <audio src="http://f2.com"></audio>
      <embed type="video/mp4" src="/videos/flower.mp4" width="250" height="200" />
    </body></html>"""
    val a = assets(html)
    assert(a.length == 3)
    assert(a.contains("http://ex.com/videos/flower.mp4"))
  }

  test("[data-item], [style], [data-preview] assets = 3") {
    val html = """
    <html><body>
     <div style="background: url('http://something.com/data.jpg')"></div>
     <div data-preview="http://archive.org">...</div>
     <p>test</p>
     <div data-item='{"id": 123, "name": "Sample Item", "image": "https://example.com/image.jpg"}'>
       Click here for details
     </div>
    </body></html>"""
    val a = assets(html)
    assert(a.length == 3, a)
  }

  test("link/meta assets order + meta refresh variants") {
    val html = """
    <html><head>
      <link rel="stylesheet" href="http://ex.com/styles/styles.7f7c9ce840c7e527.css">
      <link rel="alternate" href="http://ex.com/styles/styles.7f7c9ce840c7e527.css">
      <link foo="123" bar="456">
      <meta href="https://a1.com">
      <meta content="something">
      <meta http-equiv="Refresh" content="0; url=https://refr1.com">
      <meta http-equiv="REFRESH" content="0; url=HTTP://UPPER.COM/PAGE2.HTML">
      <meta http-equiv="Refresh" content="https://refr2.com">
      <meta http-equiv="refresh" content="5">
      <meta http-equiv="Refresh" content="0; url='https://quote.tld/1'">
      <meta http-equiv='Refresh' content='0; url=  "https://quote.tld/2" '>
    </head><body>experiment</body></html>"""
    val a = assets(html)
    assert(a == Seq(
      "http://ex.com/styles/styles.7f7c9ce840c7e527.css",
      "https://a1.com",
      "https://refr1.com",
      "http://UPPER.COM/PAGE2.HTML",
      "https://refr2.com",
      "https://quote.tld/1",
      "https://quote.tld/2"), a)
  }

  test("srcset splitting, src-before-srcset order = 5") {
    val html = """
    <html><body>
    <img srcset="http://ex.com/a.jpg 480w, http://ex.com/b.jpg 800w"
        sizes="(max-width: 600px) 480px, 800px"
      src="http://ex.com/c.jpg" />
    <picture>
    <source media="(min-width: 0px)" sizes="95vw" srcset="https://example.com/5.jpg?w=460 460w, http://example.com/img/media/6/5.jpg 340w"/>
    </picture>
    </body></html>"""
    val a = assets(html)
    assert(a.length == 5, a)
    assert(a(0) == "http://ex.com/c.jpg")
    assert(a(1) == "http://ex.com/a.jpg")
    assert(a(2) == "http://ex.com/b.jpg")
  }

  test("uppercase tags and attrs") {
    val html = """<HTML><BODY><A HREF="https://a.com/a.html">text</A></BODY></HTML>"""
    assert(outlinks(html).length == 1)
  }

  test("CSS in style tag + inline style = 3 assets (@import excluded)") {
    val html = """<html><head>
      <style type="text/css">
      #head{ background:transparent url(http://g.org/images/logo.jpg); }
      #footer{ background-image:url(http://m.gr/genbg?a=2&amp;b=1); }
      @import 'http://foo.org/common.css';
      </style></head>
    <body><div style="background: url(http://n.ua/img/bg.png);"></body></html>"""
    val (a, ai) = Html.assets(HtmlScanner.scan(html), "http://ex.com", conf)
    assert(a.length == 3, a)
    assert(ai == Seq("http://foo.org/common.css"))
  }

  test("div data-src mp3") {
    val html = """<!doctype html><html lang="en"><body>
      <div data-src="https://example.com/audio.mp3"></div></body></html>"""
    val a = assets(html)
    assert(a.length == 1 && a.head.toLowerCase.contains(".mp3"))
  }

  test("base tag governs relative resolution") {
    val tags = HtmlScanner.scan(
      """<html><head><base href="http://example.com/something/" target="_blank"></head>
         <body><a href="page2.html">x</a></body></html>""")
    assert(Html.baseOf(tags, "https://example.com/something/page.html")
      .contains("http://example.com/something/"))
    val o = Html.outlinks(tags, "https://example.com/something/page.html", conf)
    assert(o == Seq("http://example.com/something/page2.html"))
  }

  test("base tag with bad scheme rejected") {
    val tags = HtmlScanner.scan("""<base href="javascript:void(0)">""")
    assert(Html.baseOf(tags, "https://e.com/x").isEmpty)
  }
}

class CssExtractSpec extends AnyFunSuite {
  private def check(css: String, links: Seq[String], atImports: Seq[String] = Nil,
                    inline: Boolean = false): Unit = {
    val (l, ai) = Css.extract(css, inline)
    assert(l == links, s"links mismatch: got $l")
    assert(ai == atImports, s"atImports mismatch: got $ai")
  }

  test("string url") {
    check("""background-image: url("https://example.com/image.png");""",
      Seq("https://example.com/image.png"), inline = true)
  }
  test("multiple string urls with spaces") {
    check("""background-image: url(  "//example.com/image1.png"), url("//example.com/image2.png"  ); ccc: {--foo: url(  "//example.com/image3.png"   );}""",
      Seq("//example.com/image1.png", "//example.com/image2.png", "//example.com/image3.png"),
      inline = true)
  }
  test("single quotes") {
    check("""background-image: url('//example.com/image.png');""",
      Seq("//example.com/image.png"), inline = true)
  }
  test("no quotes") {
    check("""background-image: url(//example.com/image.png);""",
      Seq("//example.com/image.png"), inline = true)
  }
  test("escaped hex chars") {
    check("""background-image: url(   //\ example.com/imag\E9.png  );""",
      Seq("// example.com/imagé.png"), inline = true)
  }
  test("escaped hex followed by space") {
    check("""background-image: url(   //\ example.com/imag\E9 .png  );""",
      Seq("// example.com/imagé.png"), inline = true)
  }
  test("escaped non-hex in string") {
    check("background-image: url(\"//example.com/image\\.png\");",
      Seq("//example.com/image.png"), inline = true)
  }
  test("escaped newline in string") {
    check("background-image: url(\"//example.com/image\\\n.png\");",
      Seq("//example.com/image.png"), inline = true)
  }
  test("early escape EOF") {
    check("background-image: url(\"//example.com/image\\",
      Seq("//example.com/image"), inline = true)
  }
  test("non-ascii urls") {
    check("""background-image: url("//example.com/你好.png"), url("//example.com/世界.png");""",
      Seq("//example.com/你好.png", "//example.com/世界.png"), inline = true)
  }
  test("font-face inline") {
    check("""  font-family: "Trickster";
          src: local("Trickster"),
            url("trickster-COLRv1.otf") format("opentype") tech(color-COLRv1),
            url("trickster-outline.otf") format("opentype"),
            url("trickster-outline.woff") format("woff");""",
      Seq("trickster-COLRv1.otf", "trickster-outline.otf", "trickster-outline.woff"),
      inline = true)
  }
  test("font-face block") {
    check("""@font-face {
          font-family: "Trickster";
          src: local("Trickster"),
            url("trickster-COLRv1.otf") format("opentype") tech(color-COLRv1),
            url("trickster-outline.otf") format("opentype"),
            url("trickster-outline.woff") format("woff");
          }""",
      Seq("trickster-COLRv1.otf", "trickster-outline.otf", "trickster-outline.woff"))
  }
  test("bare declaration url") {
    check("""url("https://example.com/style.css");""", Seq("https://example.com/style.css"))
    check("""url("https://example.com/style.css");""", Seq("https://example.com/style.css"), inline = true)
  }
  test("@import placement rules") {
    check("""
      /* comment A */
      @charset "UTF-8";
      /* comment B */
      @layer any;
      @layer default, theme, components;
      @import "1.css";
      @import url("2.css");
      @import url("3.css") print;
      @import url("4.css") print, screen;
      @import "5.css" screen;
      /* comment C */
      @import url("6.css") screen and (orientation: landscape);
      @import url("7.css") supports(display: grid) screen and (max-width: 400px);
      @import url("8.css") supports((not (display: grid)) and (display: flex))
      screen and (max-width: 400px);
      @import url("9.css")
      supports((selector(h2 > p)) and (font-tech(color-COLRv1)));
      @layer IBreakAfterImports;
      @import url("invalid.css");
      div { background-image: url("image.png"); }""",
      Seq("image.png"),
      (1 to 9).map(i => s"$i.css"))
  }
  test("@import after layer block is invalid") {
    check("""
      @layer reset { audio[controls] { display: abc; } }
      @import "1.css";
      a { background-image: url("image.png"); }""",
      Seq("image.png"), Nil)
  }
  test("complex css with escaped idents") {
    check("""
      @charset "UTF-8";
      @import "1.css";
      @import uRl("2.css" );
      @import url( "3.css") print;
      @import url(  "4.css"  ) print, screen;
      @import "5.css" screen;
      @import url("6.css") screen and (orientation: landscape);
      @import url("7.css") supports(display: grid) screen and (max-width: 400px);
      @import url("8.css") supports((not (display: grid)) and (display: flex))
      screen and (max-width: 400px);
      @import url("9.css")
      supports((selector(h2 > p)) and (font-tech(color-COLRv1)));
      @layer IBreakAfterImports;
      @import url("invalid.css");
      div {
        background-image: url("image1.png");
        background-image: uRl(  image2.png  );
        background-image: u\72 l(  i\(mage3.png  );
      }""",
      Seq("image1.png", "image2.png", "i(mage3.png"),
      (1 to 9).map(i => s"$i.css"))
  }
  test("inline css disables @import") {
    check("""@import "x.css"; div { background: url("a.png"); }""",
      Seq("a.png"), Nil, inline = true)
  }
}

class JsonExtractSpec extends AnyFunSuite {
  private def check(body: String, wantAssets: Seq[String], wantOutlinks: Seq[String]): Unit = {
    val got = Json.extract(body)
    assert(got.isDefined, s"expected parse of $body")
    val (a, o) = got.get
    assert(a.sorted == wantAssets.sorted, s"assets: got $a")
    assert(o.sorted == wantOutlinks.sorted, s"outlinks: got $o")
  }

  test("escaped slashes, php = asset") {
    check("""{"ajaxurl":"http:\/\/fakeurl.invalid\/wp-admin\/admin-ajax.php","days":"Days","ajax_nonce":"c35d389da5"}""",
      Seq("http://fakeurl.invalid/wp-admin/admin-ajax.php"), Nil)
  }
  test("nested urls") {
    check("""{"url": "https://example.com", "nested": {"link": "http://test.com"}}""",
      Nil, Seq("https://example.com", "http://test.com"))
  }
  test("invalid json") { assert(Json.extract("""{"url": "https://example.com"""").isEmpty) }
  test("no urls") { check("""{"key": "value", "number": 42}""", Nil, Nil) }
  test("array of urls") {
    check("""{"links": ["https://example1.com", "https://example2.com"]}""",
      Nil, Seq("https://example1.com", "https://example2.com"))
  }
  test("json in json string") {
    check("""{"dic": "{\"url\": \"https://example1.com\"}", "array": "[\"https://example2.com\"]"}""",
      Nil, Seq("https://example1.com", "https://example2.com"))
  }
  test("urls in free text") {
    check("""{"body": "Check this link https://example.com and also http://test.com"}""",
      Nil, Seq("https://example.com", "http://test.com"))
  }
  test("isValidUrl table") {
    assert(Json.isValidUrl("https://example.com"))
    assert(Json.isValidUrl("http://example.com/some path"))
    assert(Json.isValidUrl("http://example.com/some?query=param&another=param"))
    assert(Json.isValidUrl("example.com/path/to/resource"))
    assert(!Json.isValidUrl("not a url"))
    assert(!Json.isValidUrl(""))
    assert(!Json.isValidUrl("Days"))
    assert(Json.isValidUrl("example.com?query=param"))
  }
}

class XmlExtractSpec extends AnyFunSuite {
  private def all(body: String): Seq[String] =
    Xml.extract(body).map { case (a, o) => a ++ o }.getOrElse(fail("expected Some"))

  test("sitemap urlset") {
    val body = """<?xml version="1.0" encoding="UTF-8"?>
      <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        <url><loc>https://example.com/page1</loc></url>
        <url><loc>https://example.com/page2</loc></url>
      </urlset>"""
    assert(all(body).sorted == Seq("http://www.sitemaps.org/schemas/sitemap/0.9",
      "https://example.com/page1", "https://example.com/page2").sorted)
    assert(Xml.isSitemap(body))
    assert(Xml.extractSitemap(body).length == 3)
  }
  test("no urls") {
    assert(all("""<?xml version="1.0" encoding="UTF-8"?></urlset>""").isEmpty)
  }
  test("not xml but tolerant") {
    assert(all("""<html><body>Not XML</body></html>""").isEmpty)
  }
  test("nested elements") {
    assert(all("""<root><level1><level2><url>https://example.com/nested</url></level2></level1></root>""") ==
      Seq("https://example.com/nested"))
  }
  test("attributes") {
    assert(all("""<root><element url="https://example.com/attr"></element></root>""") ==
      Seq("https://example.com/attr"))
  }
  test("mixed content via strict regex") {
    assert(all("""<root><element>Text before URL https://example.com/mixed Text after URL</element></root>""") ==
      Seq("https://example.com/mixed"))
  }
  test("empty body errors") { assert(Xml.extract("").isEmpty) }
  test("rss 2.0 reference fixture") {
    val body = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/internal/pkg/postprocessor/extractor/testdata/rss2.0.xml")), "UTF-8")
    val urls = all(body)
    assert(urls.nonEmpty)
    assert(urls.forall(_.startsWith("http")))
  }
}

class MiscExtractSpec extends AnyFunSuite {
  test("link header: multiple urls") {
    assert(LinkHeader.extract(
      """<https://one.example.com>; rel="preconnect", <https://two.example.com>; rel="preload"""") ==
      Seq("https://one.example.com", "https://two.example.com"))
  }
  test("link header: next/prev with query") {
    assert(LinkHeader.extract(
      """<https://t.com/api?max_id=1&exclude_replies=true>; rel="next", <https://t.com/api?min_id=2>; rel="prev"""") ==
      Seq("https://t.com/api?max_id=1&exclude_replies=true", "https://t.com/api?min_id=2"))
  }
  test("link header: empty and malformed") {
    assert(LinkHeader.extract("") == Nil)
    assert(LinkHeader.extract("""https://one.example.com>;; rel=preconnect";""") ==
      Seq("https://one.example.com"))
  }

  test("hasFileExtension table") {
    val cases = Seq(
      "http://example.com/image.jpg" -> true,
      "https://example.org/dog.png?foo=bar" -> true,
      "https://test.com/cat.gif#section1" -> true,
      "http://example.com/foo" -> false,
      "http://example.com/foo.txt/" -> false,
      "http://example.com/data.txt/archive" -> false,
      "http://example.net/backups/data.tar.gz?version=2" -> true,
      "https://example.com/.htaccess" -> true,
      "http://example.org/name." -> false,
      "file.zip" -> true,
      "https://example.io/some.dir/my.file.name.txt" -> true,
      "https://example.com/paramCheck?this=that" -> false,
      "http://example.com/dir/subdir/.hidden/" -> false,
      "http://example.com/dir.withdot/filename" -> false,
      "http://example.com/test.db#backup" -> true,
      "thisIsJustAString" -> false,
      "http://example.com/foo.bar.baz.qux?stuff=1" -> true,
      "http://example.com/data.zip?path=/etc/passwd" -> true,
      "https://example.com" -> false,
      "https://example.com/" -> false)
    cases.foreach { case (in, want) =>
      assert(Util.hasFileExtension(in) == want, in)
    }
  }

  test("m3u8 media playlist") {
    val body = """#EXTM3U
#EXT-X-TARGETDURATION:10
#EXTINF:9.009,
http://media.example.com/first.ts
#EXTINF:9.009,
http://media.example.com/second.ts
#EXT-X-ENDLIST"""
    assert(M3u8.extract(body) ==
      Seq("http://media.example.com/first.ts", "http://media.example.com/second.ts"))
  }
  test("m3u8 master playlist with alternatives") {
    val body = """#EXTM3U
#EXT-X-MEDIA:TYPE=AUDIO,GROUP-ID="aac",NAME="English",URI="audio/en.m3u8"
#EXT-X-STREAM-INF:BANDWIDTH=1280000,AUDIO="aac"
low/video.m3u8
#EXT-X-STREAM-INF:BANDWIDTH=2560000,AUDIO="aac"
high/video.m3u8"""
    assert(M3u8.extract(body).toSet ==
      Set("audio/en.m3u8", "low/video.m3u8", "high/video.m3u8"))
  }
  test("not a playlist") { assert(M3u8.extract("<html></html>") == Nil) }

  test("text links: loose mode word scan") {
    val links = TextLinks.extract(
      "see https://example.com/a and http://foo.org/b?x=1 but not ftp://bad.com or http://nope")
    assert(links == Seq("https://example.com/a", "http://foo.org/b?x=1"))
  }
  test("text links: dedupe preserves order") {
    assert(TextLinks.extract("http://b.com/1 http://a.com/2 http://b.com/1") ==
      Seq("http://b.com/1", "http://a.com/2"))
  }

  test("golden: wikipedia text loose count = 430, strict = 433") {
    val body = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/internal/pkg/postprocessor/testdata/wikipedia_IA.txt")), "UTF-8")
    assert(TextLinks.extract(body, strict = false).length == 430)
    assert(TextLinks.extract(body, strict = true).length == 433)
  }
  test("golden: byte-identical extracted link list (md5 over the ordered list)") {
    // the input_hint invariant: extraction from the text column must be
    // byte-identical run to run and engine to engine — pinned as an md5
    // over the newline-joined ordered loose-mode link list from the
    // reference's wikipedia fixture (independently computed)
    val body = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/internal/pkg/postprocessor/testdata/wikipedia_IA.txt")), "UTF-8")
    val links = TextLinks.extract(body, strict = false)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(links.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md5 == "4bf5e99cf98d7645fbbd7f1a2b3f9b7e", s"md5=$md5")
  }

  test("golden: wikidata long-line html loose count = 72") {
    val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(
      "/root/reference/internal/pkg/postprocessor/testdata/Q27536592.html.gz"))
    val body = new String(in.readAllBytes(), "UTF-8")
    in.close()
    assert(TextLinks.extract(body, strict = false).length == 72)
  }

  test("script content JSON scrape") {
    assert(Script.extractFromScriptContent(
      """var config = {"cdn": "https://cdn.example.com/app.js", "n": 1};""") ==
      Seq("https://cdn.example.com/app.js"))
  }

  test("s3 legacy listing with marker pagination") {
    val body = """<?xml version="1.0" encoding="UTF-8"?>
      <ListBucketResult><Name>bucket</Name>
        <Contents><Key>photos/a.jpg</Key><Size>100</Size></Contents>
        <Contents><Key>photos/b.jpg</Key><Size>200</Size></Contents>
      </ListBucketResult>"""
    val out = ObjectStorage.extract("https://bucket.s3.amazonaws.com/?prefix=photos", "AmazonS3", body)
    assert(out.contains("https://bucket.s3.amazonaws.com/photos/a.jpg"))
    assert(out.contains("https://bucket.s3.amazonaws.com/photos/b.jpg"))
    assert(out.exists(_.contains("marker=photos%2Fb.jpg")))
  }
  test("s3 v2 listing with continuation token") {
    val body = """<ListBucketResult>
        <Contents><Key>x.bin</Key><Size>5</Size></Contents>
        <IsTruncated>true</IsTruncated>
        <NextContinuationToken>tok123</NextContinuationToken>
      </ListBucketResult>"""
    val out = ObjectStorage.extract("https://b.s3.amazonaws.com/?list-type=2", "AmazonS3", body)
    assert(out.contains("https://b.s3.amazonaws.com/x.bin"))
    assert(out.exists(_.contains("continuation-token=tok123")))
  }
}

class DispatchSpec extends AnyFunSuite {
  test("html page: outlinks + assets + aggressive text scan merged") {
    val p = PageInput(
      url = "http://site.com/index.html",
      contentType = "text/html",
      body = """<html><body>
        <a href="/next.html">next</a>
        <img src="/img/logo.png">
        <p>plain http://textlink.com/found here</p>
        <a href="mailto:x@y.com">mail</a>
      </body></html>""")
    val r = Extract.page(p)
    assert(r.outlinks.contains("http://site.com/next.html"))
    assert(r.outlinks.contains("http://textlink.com/found"))
    assert(r.assets.contains("http://site.com/img/logo.png"))
    assert(!r.outlinks.exists(_.startsWith("mailto:")))
  }
  test("json page") {
    val r = Extract.page(PageInput("http://api.com/x", "application/json",
      body = """{"a": "https://example.com/data.js", "b": "https://example.com/page"}"""))
    assert(r.assets == Seq("https://example.com/data.js"))
    assert(r.outlinks == Seq("https://example.com/page"))
  }
  test("sitemap page: everything is outlink") {
    val r = Extract.page(PageInput("http://s.com/sitemap.xml", "application/xml",
      body = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        <url><loc>https://s.com/p1</loc></url></urlset>"""))
    assert(r.outlinks.contains("https://s.com/p1"))
    assert(r.assets.isEmpty)
  }
  test("css page yields assets + at-imports") {
    val r = Extract.page(PageInput("http://s.com/main.css", "text/css",
      body = """@import "base.css"; body { background: url("bg.png"); }"""))
    assert(r.assets == Seq("bg.png"))
    assert(r.atImports == Seq("base.css"))
  }
  test("max outlinks truncation") {
    val body = "<html><body>" +
      (1 to 10).map(i => s"""<a href="http://o$i.com/p">x</a>""").mkString + "</body></html>"
    val r = Extract.page(PageInput("http://s.com/", "text/html", body = body),
      ZenoConf(maxOutlinks = 3))
    assert(r.outlinks.length == 3)
  }
  test("link header extracted for any content type") {
    val r = Extract.page(PageInput("http://s.com/f.bin", "application/octet-stream",
      linkHeader = """<https://s.com/next>; rel="next""""))
    assert(r.outlinks == Seq("https://s.com/next"))
  }
}
