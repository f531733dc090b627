package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.conf.ZenoConf

/** E12 (PDF) + E18 (site-specific) extractor conformance, pinned to the
  * reference's own tests:
  *  - github_test.go cases (sitespecific/github/github_test.go:5-28)
  *  - pdf_test.go goldens: 19 outlinks from the developer-portal PDF,
  *    corrupt PDF errors with 0 (pdf_test.go:22-53 + the testdata PDFs)
  *  - truthsocial/reddit/ina URL matchers + JSON-derived synthesis
  */
class SiteSpecificSpec extends AnyFunSuite {

  // ---------- github raw-asset classifier ----------
  test("github.shouldConsiderAsAsset matches the reference test table") {
    val yes = Seq(
      "https://avatars.githubusercontent.com/u/12345",
      "https://github.githubassets.com/some-asset",
      "https://github.com/user-attachments/file",
      "https://github.com/user-or-org/repo/assets/image",
      "https://private-user-images.githubusercontent.com/image")
    val no = Seq(
      "https://example.com/image.png",
      "https://notgithub.com/image.png",
      "Seconds",
      "https://github.com/internetarchive",
      "https://github.com/internetarchive/zeno")
    yes.foreach(u => assert(SiteSpecific.Github.shouldConsiderAsAsset(u), u))
    no.foreach(u => assert(!SiteSpecific.Github.shouldConsiderAsAsset(u), u))
  }

  test("github assets classified by the JSON extractor split") {
    val body =
      """{"avatar":"https://avatars.githubusercontent.com/u/99",
        |"page":"https://example.com/about/team"}""".stripMargin
    val Some((assets, outlinks)) = Json.extract(body): @unchecked
    assert(assets.contains("https://avatars.githubusercontent.com/u/99"))
    assert(outlinks.contains("https://example.com/about/team"))
  }

  // ---------- reddit post API ----------
  test("reddit post API outlinks = www + old permalinks") {
    val body =
      """{"kind":"Listing","data":{"children":[
        |  {"kind":"t3","data":{"permalink":"/r/test/comments/abc/title/"}}]}}""".stripMargin
    assert(SiteSpecific.Reddit.isPostApiUrl(
      "https://www.reddit.com/api/info.json?id=t3_abc"))
    assert(SiteSpecific.Reddit.postApiOutlinks(body) == Seq(
      "https://www.reddit.com/r/test/comments/abc/title/",
      "https://old.reddit.com/r/test/comments/abc/title/"))
    assert(SiteSpecific.Reddit.postApiOutlinks("""{"data":{"children":[]}}""").isEmpty)
    assert(SiteSpecific.Reddit.postApiOutlinks("not json").isEmpty)
  }

  test("reddit post API via the full dispatch") {
    val body =
      """{"kind":"Listing","data":{"children":[
        |  {"kind":"t3","data":{"permalink":"/r/test/comments/xyz/t/"}}]}}""".stripMargin
    val r = Extract.page(PageInput(
      "https://www.reddit.com/api/info.json?id=t3_xyz",
      "application/json", body = body), ZenoConf(maxHops = 3))
    assert(r.outlinks.contains("https://www.reddit.com/r/test/comments/xyz/t/"))
    assert(r.outlinks.contains("https://old.reddit.com/r/test/comments/xyz/t/"))
  }

  // ---------- truthsocial ----------
  test("truthsocial matchers + asset/outlink synthesis") {
    val ts = SiteSpecific.TruthSocial
    assert(ts.isPostUrl("https://truthsocial.com/@user_1/posts/123456"))
    assert(ts.isStatusesUrl("https://truthsocial.com/api/v1/statuses/123456"))
    assert(ts.isAccountUrl("https://truthsocial.com/@someone"))
    assert(ts.isAccountLookupUrl("https://truthsocial.com/api/v1/accounts/lookup?acct=someone"))

    assert(ts.postAssets("https://truthsocial.com/@user/posts/9876") ==
      Seq("https://truthsocial.com/api/v1/statuses/9876"))

    val statusJson =
      """{"id":"1","media_attachments":[
        |  {"id":"m1","type":"video","external_video_id":"vidA"},
        |  {"id":"m2","type":"image","external_video_id":""}]}""".stripMargin
    assert(ts.statusVideoAssets(statusJson) ==
      Seq("https://truthsocial.com/api/v1/truth/videos/vidA"))

    val accountJson = """{"id":"107780257626128497","username":"x"}"""
    val links = ts.accountOutlinks(accountJson)
    assert(links.size == 3 && links.forall(_.startsWith(
      "https://truthsocial.com/api/v1/accounts/107780257626128497/statuses?")))
    assert(ts.accountOutlinks("<html></html>").isEmpty) // parse failure → none

    // quirk preserved from account.go:85-107: the lookup extractor derives
    // the username with the @-profile regex, which a lookup URL never
    // matches — yields nothing
    assert(ts.accountLookupOutlinks(
      "https://truthsocial.com/api/v1/accounts/lookup?acct=someone").isEmpty)
  }

  test("truthsocial statuses API through the asset dispatch") {
    val statusJson =
      """{"id":"1","media_attachments":[
        |  {"id":"m1","type":"video","external_video_id":"vid9"}]}""".stripMargin
    val r = Extract.page(PageInput(
      "https://truthsocial.com/api/v1/statuses/5555",
      "application/json", body = statusJson), ZenoConf(maxHops = 3))
    assert(r.assets.contains("https://truthsocial.com/api/v1/truth/videos/vid9"))
  }

  test("reddit asset quirk: amp; stripped + query-unescaped (assets_test.go:89-109)") {
    val html = """<html><img src="http://reddit.com/asset?a=1&b=2&amp;c=3"></html>"""
    val r = Extract.page(PageInput("https://reddit.com/", "text/html", body = html),
      ZenoConf(maxHops = 3))
    assert(r.assets.contains("http://reddit.com/asset?a=1&b=2&c=3"),
      s"got ${r.assets}")
    // non-reddit pages keep the raw form
    val r2 = Extract.page(PageInput("https://other.com/", "text/html",
      body = """<html><img src="http://x.com/a?p=1&amp;q=2"></html>"""),
      ZenoConf(maxHops = 3))
    assert(r2.assets.exists(_.contains("amp;")) || r2.assets.exists(_.contains("&q=")),
      s"got ${r2.assets}")
  }

  // ---------- INA ----------
  test("ina partner-API media assets") {
    assert(SiteSpecific.Ina.isApiUrl("https://apipartner.ina.fr/asset/123"))
    assert(!SiteSpecific.Ina.isApiUrl("https://apipartner.ina.fr/playerConfigurations.json"))
    val body =
      """{"id":"1","resourceUrl":"https://cdn.ina.fr/video.mp4",
        |"resourceThumbnail":"https://cdn.ina.fr/thumb.jpg",
        |"embedUrl":"/player/embed/1","uri":"https://www.ina.fr/v/1"}""".stripMargin
    assert(SiteSpecific.Ina.apiMediaAssets(body) == Seq(
      "https://cdn.ina.fr/video.mp4", "https://cdn.ina.fr/thumb.jpg",
      "https://player.ina.fr/player/embed/1", "https://www.ina.fr/v/1"))
  }

  // ---------- request decoration (preprocessor chain) ----------
  test("request prep: matcher order and header/cookie payloads") {
    assert(RequestPrep.forUrl("https://www.npr.org/2024/story").exists(p =>
      p.site == "npr" && p.headers("Referer") == "https://www.npr.org/"))
    val reddit = RequestPrep.forUrl("https://www.reddit.com/r/space/").get
    assert(reddit.site == "reddit" && reddit.cookies("over18") == "1")
    assert(RequestPrep.forUrl("https://www.tiktok.com/@user").exists(_.site == "tiktok"))
    assert(RequestPrep.forUrl("https://truthsocial.com/api/v1/statuses/1")
      .exists(_.site == "truthsocial-status"))
    assert(RequestPrep.forUrl("https://truthsocial.com/api/v1/accounts/42/statuses")
      .exists(_.site == "truthsocial-accounts"))
    assert(RequestPrep.forUrl("https://example.com/").isEmpty)
  }

  // ---------- PDF (E12) ----------
  private val pdfFixtureDir =
    "/root/reference/internal/pkg/postprocessor/extractor/testdata"

  test("pdf: 19 outlinks from the developer-portal fixture (reference golden)") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$pdfFixtureDir/InternetArchiveDeveloperPortal.pdf"))
    val Right(uris) = Pdf.outlinks(bytes): @unchecked
    assert(uris.size == 19, s"want 19 got ${uris.size}")
    assert(uris.contains("https://archive.org/developers/index-apis.html"))
    assert(uris.contains(
      "https://iipc.github.io/warc-specifications/specifications/warc-format/warc-1.1/"))
  }

  test("pdf: corrupt file errors with 0 outlinks (reference golden)") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$pdfFixtureDir/corrupt.pdf"))
    assert(Pdf.outlinks(bytes).isLeft)
    assert(Pdf.outlinks("hello world".getBytes).isLeft)
    assert(Pdf.outlinks(null).isLeft)
  }

  test("pdf through the full dispatch") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$pdfFixtureDir/InternetArchiveDeveloperPortal.pdf"))
    val r = Extract.page(PageInput("https://example.com/doc.pdf",
      "application/pdf", bodyBytes = bytes), ZenoConf(maxHops = 3))
    assert(r.outlinks.count(_ == "https://archive.org/about/") == 2)
  }

  // ---------- facebook embed synthesis (facebook.go:11-22) ----------
  test("facebook post detection + embed URL generation") {
    import SiteSpecific.Facebook
    assert(Facebook.isPostUrl("https://www.facebook.com/zuck/posts/10102577175875681"))
    assert(!Facebook.isPostUrl(
      "https://www.facebook.com/plugins/post.php?href=x")) // no self-loop
    assert(!Facebook.isPostUrl("https://www.facebook.com/zuck"))
    assert(!Facebook.isPostUrl("https://example.com/posts/1"))
    assert(!Facebook.isPostUrl("https://m.facebook.com/zuck/posts/1")) // www only
    // QueryEscape semantics: ':' '/' → %XX uppercase
    assert(Facebook.embedUrl("https://www.facebook.com/zuck/posts/101") ==
      "https://www.facebook.com/plugins/post.php?href=" +
        "https%3A%2F%2Fwww.facebook.com%2Fzuck%2Fposts%2F101&show_text=true")
  }

  test("pdf literal-string escapes and hex strings") {
    assert(Pdf.scanUris("/URI (https://a.example/\\(x\\)/y)") ==
      Seq("https://a.example/(x)/y"))
    assert(Pdf.scanUris("/URI (https://a.example/a(b)c)") ==
      Seq("https://a.example/a(b)c")) // balanced nesting
    assert(Pdf.scanUris("/URI <68747470733A2F2F622E6578616D706C652F>") ==
      Seq("https://b.example/"))
    assert(Pdf.scanUris("/URIX (https://nope.example/)").isEmpty)
  }
}
