package graft.extract

import scala.util.matching.Regex

/** E18: site-specific extractors, mirroring the reference's dispatch
  * surface:
  *
  *  - outlink extractor chain order (first Match wins):
  *    truthsocial account → truthsocial account-lookup → object-storage →
  *    sitemap → HTML → PDF → reddit post API
  *    (/root/reference/internal/pkg/postprocessor/outlinks.go:24-31)
  *  - asset extractor chain order: INA → truthsocial → M3U8 → JSON → XML →
  *    HTML → embedded CSS
  *    (/root/reference/internal/pkg/postprocessor/assets.go:28-98)
  *  - github raw-asset classifier feeding the JSON extractor's
  *    asset-vs-outlink split
  *    (/root/reference/internal/pkg/postprocessor/extractor/json.go:49,
  *     sitespecific/github/github.go:17-46)
  */
object SiteSpecific {

  // ---------- github (sitespecific/github/github.go:17-46) ----------
  object Github {
    // user avatars / temporary attachment links / frontend css+js
    private val assetsDomains: Regex =
      "(?i)^https://[a-z-]*\\.?(?:githubusercontent|githubassets)\\.com/".r
    // attachment links shown in the editor
    private val userAttachments: Regex =
      "(?i)^https://github\\.com/user-attachments/".r
    // permanent attachment links
    private val repoAssets: Regex =
      "(?i)https://github\\.com/[^/]+/[^/]+/assets/".r

    /** GitHub asset URLs often have no file extension — pattern-classify
      * them as assets for the JSON extractor's split.
      */
    def shouldConsiderAsAsset(u: String): Boolean =
      u != null && u.contains("github") &&
        (assetsDomains.findFirstIn(u).isDefined ||
          userAttachments.findFirstIn(u).isDefined ||
          repoAssets.findFirstIn(u).isDefined)
  }

  // ---------- reddit (sitespecific/reddit/api.go:185-230) ----------
  object Reddit {
    def isRedditUrl(u: String): Boolean = u != null && u.contains("reddit.com")

    /** Post-API listing (reddit.com/api/info.json?id=t3_…). */
    def isPostApiUrl(u: String): Boolean =
      u != null && u.contains("reddit.com/api/info.json?id=t3_")

    /** Outlinks = the post's permalink on www. and old.reddit.com.
      * Empty on parse failure / no children (the reference errors there).
      */
    def postApiOutlinks(body: String): Seq[String] =
      Json.parse(body).toSeq.flatMap { node =>
        val children = node.path("data").path("children")
        if (!children.isArray || children.size == 0) Nil
        else {
          val permalink = children.get(0).path("data").path("permalink").asText("")
          if (permalink.isEmpty) Nil
          else Seq(s"https://www.reddit.com$permalink", s"https://old.reddit.com$permalink")
        }
      }
  }

  // ---------- truthsocial (sitespecific/truthsocial/*.go) ----------
  object TruthSocial {
    private val postUrl: Regex = "^https?://truthsocial\\.com/@[A-Za-z0-9_]+/posts/".r
    private val postId: Regex = "^https?://truthsocial\\.com/@[A-Za-z0-9_]+/posts/(\\d+)".r
    private val username: Regex = "^https?://truthsocial\\.com/@([^/]+)".r
    private val statuses: Regex = "^https?://truthsocial\\.com/api/v1/statuses/\\d+$".r
    private val accountLookup: Regex =
      "^https?://truthsocial\\.com/api/v1/accounts/lookup\\?acct=[a-zA-Z0-9]+$".r

    def isPostUrl(u: String): Boolean = postUrl.findFirstIn(u).isDefined
    def isStatusesUrl(u: String): Boolean = statuses.findFirstIn(u).isDefined
    def isAccountUrl(u: String): Boolean = username.findFirstIn(u).isDefined
    def isAccountLookupUrl(u: String): Boolean = accountLookup.findFirstIn(u).isDefined
    def needAssetExtraction(u: String): Boolean = isStatusesUrl(u) || isPostUrl(u)

    /** statuses API → media_attachments external_video_id → video API
      * assets (status.go:118-140).
      */
    def statusVideoAssets(body: String): Seq[String] =
      Json.parse(body).toSeq.flatMap { node =>
        val media = node.path("media_attachments")
        if (!media.isArray) Nil
        else (0 until media.size).flatMap { i =>
          val vid = media.get(i).path("external_video_id").asText("")
          if (vid.isEmpty) None
          else Some(s"https://truthsocial.com/api/v1/truth/videos/$vid")
        }
      }

    /** @user/posts/ID page → statuses API asset (post.go:9-23). */
    def postAssets(u: String): Seq[String] =
      postId.findFirstMatchIn(u).map(m =>
        s"https://truthsocial.com/api/v1/statuses/${m.group(1)}").toSeq

    /** account JSON → the three statuses-listing API outlinks
      * (account.go:58-83). Empty when the body is not an account JSON —
      * the reference errors on parse failure and drops the page's
      * outlinks entirely; we mirror the observable result (no outlinks).
      */
    def accountOutlinks(body: String): Seq[String] =
      Json.parse(body).toSeq.flatMap { node =>
        val id = node.path("id").asText("")
        if (id.isEmpty) Nil
        else Seq(
          s"https://truthsocial.com/api/v1/accounts/$id/statuses?exclude_replies=true&only_replies=false&with_muted=true",
          s"https://truthsocial.com/api/v1/accounts/$id/statuses?pinned=true&only_replies=false&with_muted=true",
          s"https://truthsocial.com/api/v1/accounts/$id/statuses?with_muted=true&only_media=true")
      }

    /** Account-lookup extractor, quirk preserved: Match is the lookup API
      * URL but the username is (re-)extracted with the @-profile regex,
      * which a lookup URL never matches — so it yields nothing
      * (account.go:85-107; upstream behavior kept verbatim).
      */
    def accountLookupOutlinks(u: String): Seq[String] =
      username.findFirstMatchIn(u).map(m =>
        s"https://truthsocial.com/api/v1/accounts/lookup?acct=${m.group(1)}").toSeq
  }

  // ---------- INA (sitespecific/ina/ina.go:82-202) ----------
  object Ina {
    def isApiUrl(u: String): Boolean =
      u != null && u.contains("apipartner.ina.fr") && !u.contains("playerConfigurations.json")

    /** Media assets from the partner-API JSON: resourceUrl,
      * resourceThumbnail, player embed, uri (ina.go:179-202). The
      * network-dependent JWPlayer version probe (ina.go:109-168) is a live
      * HTTP fetch and stays out of scope like F10.
      */
    def apiMediaAssets(body: String): Seq[String] =
      Json.parse(body).toSeq.flatMap { node =>
        def s(field: String) = node.path(field).asText("")
        Seq(s("resourceUrl"), s("resourceThumbnail"),
          if (s("embedUrl").nonEmpty) "https://player.ina.fr" + s("embedUrl") else "",
          s("uri")).filter(_.nonEmpty)
      }
  }

  // ---------- facebook (sitespecific/facebook/facebook.go:11-22) ----------
  /** Facebook post → embed-URL child synthesis. Upstream this dispatch is
    * present but commented out pending a status bug
    * (postprocessor/item.go:57-69), so the wave gates it behind
    * `ZenoConf.facebookEmbeds` (default false = current reference
    * behavior); the synthesis itself is the reference's exactly.
    */
  object Facebook {
    def isPostUrl(u: String): Boolean =
      u != null && u.contains("www.facebook.com") && u.contains("/posts/") &&
        !u.contains("/plugins/post.php")

    /** plugins/post.php?href=<QueryEscape(url)>&show_text=true, hops
      * preserved (facebook.go:17-22).
      */
    def embedUrl(u: String): String =
      "https://www.facebook.com/plugins/post.php?href=" +
        graft.canon.Canon.queryEscape(u) + "&show_text=true"
  }
}

/** Request decoration (preprocessor sitespecific chain): the reference
  * mutates outgoing http.Requests with per-site headers/cookies; with no
  * live HTTP here the decoration is exposed as DATA — the first matching
  * site's header map — so a fetching integration can apply it verbatim.
  * The single source of truth for matcher order and header payloads is
  * [[RequestBuild]] (the full F10 projection, which also folds in the
  * configured UA); this view keeps cookies unfolded as pairs.
  * Reference: /root/reference/internal/pkg/preprocessor/sitespecific/
  * sitespecific.go:18-33 (matcher order: npr → reddit → tiktok →
  * truthsocial status → truthsocial accounts).
  */
object RequestPrep {

  final case class Prep(site: String, headers: Map[String, String],
                        cookies: Map[String, String] = Map.empty)

  private val siteName = Map(
    "ts_status" -> "truthsocial-status", "ts_accounts" -> "truthsocial-accounts")

  /** First matching site's decoration, or None (matcher order preserved). */
  def forUrl(u: String): Option[Prep] = RequestBuild.preprocessorFor(u) match {
    case "default" => None
    case "reddit" =>
      Some(Prep("reddit", Map.empty, RequestBuild.redditCookiePairs.toMap))
    case p =>
      Some(Prep(siteName.getOrElse(p, p), RequestBuild.siteHeaders(p).toMap))
  }
}
