package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** F10 — request-build projection: preprocessor dispatch (first Match
  * wins, sitespecific.go:27-33) and header merge semantics
  * (preprocessor.go:303-318: UA set first, site-specific Apply may
  * override it).
  */
class RequestBuildSpec extends AnyFunSuite {
  import RequestBuild._

  test("preprocessor dispatch matches the reference chain") {
    assert(preprocessorFor("https://www.npr.org/2024/03/story") == "npr")
    assert(preprocessorFor("https://old.reddit.com/r/pics/comments/abc") == "reddit")
    assert(preprocessorFor("https://www.tiktok.com/@u/video/1") == "tiktok")
    assert(preprocessorFor("https://truthsocial.com/api/v1/statuses/123") == "ts_status")
    assert(preprocessorFor("https://truthsocial.com/api/v1/truth/videos/Abc9") == "ts_status")
    assert(preprocessorFor("https://truthsocial.com/api/v1/accounts/lookup?acct=bob1") == "ts_status")
    assert(preprocessorFor("https://truthsocial.com/api/v1/accounts/bob") == "ts_accounts")
    // no API-regex match: a plain truthsocial post page takes the default
    assert(preprocessorFor("https://truthsocial.com/@bob/posts/123") == "default")
    assert(preprocessorFor("http://host0.example.com/page/1") == "default")
    assert(preprocessorFor(null) == "default")
  }

  test("first Match wins: a reddit-hosted URL mentioning npr.org/ goes to npr") {
    assert(preprocessorFor("https://www.reddit.com/r/npr.org/comments/x1") == "npr")
  }

  test("header merge: UA override vs UA passthrough") {
    def ua(url: String): String =
      headersFor(url).collect { case ("User-Agent", v) => v }.head
    // npr and reddit do not set a UA → configured UA survives
    assert(ua("https://www.npr.org/x") == DefaultUserAgent)
    assert(ua("https://reddit.com/x") == DefaultUserAgent)
    // tiktok / truthsocial set their own
    assert(ua("https://www.tiktok.com/x").contains("Edg/99"))
    assert(ua("https://truthsocial.com/api/v1/statuses/1").contains("Firefox/134.0"))
    // exactly ONE UA header after the merge
    assert(headersFor("https://www.tiktok.com/x").count(_._1 == "User-Agent") == 1)
    // default: the UA is the whole request decoration
    assert(headersFor("http://a.example.com/") == Seq("User-Agent" -> DefaultUserAgent))
  }

  test("reddit cookies land as one Cookie header in AddCookie order") {
    val cookie = headersFor("https://reddit.com/r/x")
      .collect { case ("Cookie", v) => v }.head
    assert(cookie.startsWith("eu_cookie_v2=3; over18=1; _options="))
    val headers = headersFor("https://reddit.com/r/x")
    assert(headers.map(_._1) == Seq("User-Agent", "Cookie"))
  }

  test("header counts per preprocessor (pins the full Apply surface)") {
    val counts = Map("npr" -> 14, "reddit" -> 2, "tiktok" -> 13,
      "ts_status" -> 10, "ts_accounts" -> 9, "default" -> 1)
    val urls = Map(
      "npr" -> "https://www.npr.org/x", "reddit" -> "https://reddit.com/x",
      "tiktok" -> "https://tiktok.com/x",
      "ts_status" -> "https://truthsocial.com/api/v1/statuses/1",
      "ts_accounts" -> "https://truthsocial.com/api/v1/accounts/bob",
      "default" -> "http://a.example.com/")
    urls.foreach { case (p, u) =>
      assert(preprocessorFor(u) == p)
      assert(headersFor(u).size == counts(p), s"$p header count")
      assert(headersFor(u).map(_._1).distinct.size == counts(p), s"$p names unique")
    }
  }
}
