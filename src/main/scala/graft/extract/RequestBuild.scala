package graft.extract

import scala.util.matching.Regex

/** F10 — request build as a pure projection (reference:
  * internal/pkg/preprocessor/preprocessor.go:303-318 and
  * internal/pkg/preprocessor/sitespecific/sitespecific.go:18-33).
  *
  * The reference builds a GET request per fresh item, sets the configured
  * User-Agent (config.go:348 default), then runs the FIRST matching
  * site-specific preprocessor, which may override headers (including the
  * UA) or add cookies. There is no live HTTP here, so the operator is the
  * data it would send: `(url) → (method, preprocessor, headers)` — a
  * deterministic, codegen-friendly projection that downstream fetch
  * stages (or a WARC writer) would consume as columns.
  *
  * Preprocessor chain order and match rules mirror sitespecific.go:18-24:
  * npr → reddit → tiktok → truthsocial-status → truthsocial-accounts,
  * first Match wins.
  */
object RequestBuild {

  /** Reference default UA (config.go:348) minus the build-dependent
    * version suffixes, so the projection is deterministic.
    */
  val DefaultUserAgent: String =
    "Mozilla/5.0 (compatible; archive.org_bot +http://archive.org/details/archive.org_bot) Zeno"

  val Method = "GET"

  // truthsocial matchers (sitespecific/truthsocial/truthsocial.go:13-18)
  private val tsStatus: Regex = "^https?://truthsocial\\.com/api/v1/statuses/(\\d+)".r
  private val tsVideo: Regex = "^https?://truthsocial\\.com/api/v1/truth/videos/[a-zA-Z0-9]+$".r
  private val tsAccounts: Regex = "^https?://truthsocial\\.com/api/v1/accounts/([^/]+)".r
  private val tsLookup: Regex = "^https?://truthsocial\\.com/api/v1/accounts/lookup\\?acct=[a-zA-Z0-9]+$".r

  /** First matching preprocessor name, or "default". */
  def preprocessorFor(url: String): String =
    if (url == null) "default"
    else if (url.contains("npr.org/")) "npr" // npr/npr.go:13-15
    else if (url.contains("reddit.com")) "reddit" // reddit/reddit.go:13-15
    else if (url.contains("tiktok.com/")) "tiktok" // tiktok/tiktok.go:13-15
    // truthsocial status preproc = video | lookup | status (truthsocial.go:33-35)
    else if (tsVideo.findFirstIn(url).isDefined ||
      tsLookup.findFirstIn(url).isDefined ||
      tsStatus.findFirstIn(url).isDefined) "ts_status"
    else if (tsAccounts.findFirstIn(url).isDefined) "ts_accounts"
    else "default"

  // Header sets as APPLIED over the base request (UA first, then the
  // preprocessor's Header.Set calls — which override UA where they set
  // one). Values verbatim from the reference Apply bodies.
  private val nprHeaders = Seq(
    "Accept" -> "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
    "Accept-Language" -> "fr,fr-FR;q=0.8,en-US;q=0.5,en;q=0.3",
    "Referer" -> "https://www.npr.org/",
    "Connection" -> "keep-alive",
    "Upgrade-Insecure-Requests" -> "1",
    "Sec-Fetch-Dest" -> "document",
    "Sec-Fetch-Mode" -> "navigate",
    "Sec-Fetch-Site" -> "same-origin",
    "Sec-Fetch-User" -> "?1",
    "Priority" -> "u=0, i",
    "Pragma" -> "no-cache",
    "Cache-Control" -> "no-cache",
    "TE" -> "trailers")

  // reddit adds three cookies via AddCookie (reddit.go:17-54); on a fresh
  // request that is one Cookie header with the pairs in add order
  val redditCookiePairs: Seq[(String, String)] = Seq(
    "eu_cookie_v2" -> "3",
    "over18" -> "1",
    "_options" -> "%7B%22pref_quarantine_optin%22%3A%20true%2C%20%22pref_gated_sr_optin%22%3A%20true%7D")
  private val redditHeaders = Seq(
    "Cookie" -> redditCookiePairs.map { case (k, v) => s"$k=$v" }.mkString("; "))

  private val tiktokHeaders = Seq(
    "Authority" -> "www.tiktok.com",
    "Sec-Ch-Ua" -> "\" Not A;Brand\";v=\"99\", \"Chromium\";v=\"99\", \"Microsoft Edge\";v=\"99\"",
    "Sec-Ch-Ua-Mobile" -> "?0",
    "Sec-Ch-Ua-Platform" -> "\"Linux\"",
    "Dnt" -> "1",
    "Upgrade-Insecure-Requests" -> "1",
    "User-Agent" -> ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) " +
      "Chrome/99.0.4844.74 Safari/537.36 Edg/99.0.1150.52"),
    "Accept" -> ("text/html,application/xhtml+xml,application/xml;q=0.9,image/webp,image/apng," +
      "*/*;q=0.8,application/signed-exchange;v=b3;q=0.9"),
    "Sec-Fetch-Site" -> "none",
    "Sec-Fetch-Mode" -> "navigate",
    "Sec-Fetch-User" -> "?1",
    "Sec-Fetch-Dest" -> "document",
    "Accept-Language" -> "en-US,en;q=0.9,fr;q=0.8")

  private val tsStatusHeaders = Seq(
    "User-Agent" -> "Mozilla/5.0 (X11; Linux x86_64; rv:134.0) Gecko/20100101 Firefox/134.0",
    "Accept" -> "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
    "Accept-Language" -> "en-US;q=0.5,en;q=0.3",
    "Accept-Encoding" -> "gzip, deflate, br, zstd",
    "Upgrade-Insecure-Requests" -> "1",
    "Sec-Fetch-Dest" -> "document",
    "Sec-Fetch-Mode" -> "navigate",
    "Sec-Fetch-Site" -> "none",
    "Sec-Fetch-User" -> "?1",
    "Connection" -> "keep-alive")

  private val tsAccountsHeaders = Seq(
    "User-Agent" -> "Mozilla/5.0 (X11; Linux x86_64; rv:134.0) Gecko/20100101 Firefox/134.0",
    "Accept" -> "application/json, text/plain, */*",
    "Accept-Language" -> "en-US;q=0.5,en;q=0.3",
    "Accept-Encoding" -> "gzip, deflate, br, zstd",
    "Sec-Fetch-Dest" -> "empty",
    "Sec-Fetch-Mode" -> "cors",
    "Sec-Fetch-Site" -> "same-origin",
    "Connection" -> "keep-alive",
    "TE" -> "trailers")

  /** Raw per-preprocessor Apply header set (Set-call order), before the
    * UA merge — the reference Apply bodies as data.
    */
  val siteHeaders: Map[String, Seq[(String, String)]] = Map(
    "npr" -> nprHeaders, "reddit" -> redditHeaders, "tiktok" -> tiktokHeaders,
    "ts_status" -> tsStatusHeaders, "ts_accounts" -> tsAccountsHeaders,
    "default" -> Nil)

  /** Final header list for a URL: configured UA, then the matched
    * preprocessor's Set calls folded over it (last Set of a name wins —
    * http.Header.Set semantics).
    */
  def headersFor(url: String, userAgent: String = DefaultUserAgent): Seq[(String, String)] = {
    val base = Seq("User-Agent" -> userAgent)
    siteHeaders(preprocessorFor(url)).foldLeft(base) { case (acc, (k, v)) =>
      if (acc.exists(_._1 == k)) acc.map { case (k0, v0) => if (k0 == k) (k0, v) else (k0, v0) }
      else acc :+ (k, v)
    }
  }
}
