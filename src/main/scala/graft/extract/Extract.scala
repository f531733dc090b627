package graft.extract

import graft.canon.Canon
import graft.conf.ZenoConf

/** One fetched page, as the extractors see it. In the Spark wave this is
  * assembled from the pages-corpus join (body = decoded `html` column)
  * plus the synthetic fetch_meta columns.
  */
final case class PageInput(
    url: String, // canonical URL of the page
    contentType: String, // e.g. "text/html"
    server: String = "", // Server response header
    linkHeader: String = "", // Link response header
    body: String = "",
    bodyBytes: Array[Byte] = null // raw bytes; when set, charset-decoded (E6)
)

final case class ExtractResult(
    outlinks: Seq[String],
    assets: Seq[String],
    atImports: Seq[String] // CSS @import chains — children with css_jump+1
)

/** Extractor dispatch — the reference's two extraction paths fused:
  *
  *  - outlink path (first-match: object-storage → sitemap → HTML → none,
  *    plus Link header, plus aggressive text scan for text content types):
  *    /root/reference/internal/pkg/postprocessor/outlinks.go:24-96
  *  - asset path (first-match: M3U8 → JSON → XML → HTML → embedded CSS):
  *    /root/reference/internal/pkg/postprocessor/assets.go:28-98
  *  - sanitization (drop self/nil, protocol filter, hop assignment done by
  *    the wave): assets.go:100-153
  */
object Extract {

  def isHtml(ct: String): Boolean = ct != null && ct.contains("html")
  def isJson(ct: String): Boolean = ct != null && ct.contains("json")
  def isXml(ct: String): Boolean =
    ct != null && ct.contains("xml") && !ct.contains("image/svg+xml")
  def isCss(ct: String): Boolean = ct != null && ct.contains("text/css")
  def isM3u8(ct: String): Boolean =
    ct != null && (ct.contains("application/vnd.apple.mpegurl") || ct.toLowerCase.contains("application/x-mpegurl"))

  def page(p0: PageInput, conf: ZenoConf = ZenoConf.default): ExtractResult = {
    val ct = if (p0.contentType == null) "" else p0.contentType
    // E6 charset transform — HTML only, like the reference (TransformDocument
    // runs in the HTML extractors; JSON/XML/CSS read raw bytes as UTF-8)
    val (p, docCharset) =
      if (p0.bodyBytes != null) {
        if (isHtml(ct)) {
          val (text, name) = Charsets.decodeBody(p0.bodyBytes, ct)
          (p0.copy(body = text), name)
        } else
          (p0.copy(body = new String(p0.bodyBytes, java.nio.charset.StandardCharsets.UTF_8)), "utf-8")
      } else (p0, "utf-8")
    val isSitemap = isXml(ct) && Xml.isSitemap(p.body)

    // lazily scan HTML once for both paths
    lazy val tags = HtmlScanner.scan(p.body)

    // --- outlink path (first-match chain, outlinks.go:24-31:
    //     truthsocial ×2 → object-storage → sitemap → HTML → PDF →
    //     reddit post API; errors are swallowed and the Link-header +
    //     text scans still run after, like the reference) ---
    var outlinks = Vector.empty[String]
    if (SiteSpecific.TruthSocial.isAccountUrl(p.url)) {
      outlinks ++= SiteSpecific.TruthSocial.accountOutlinks(p.body)
    } else if (SiteSpecific.TruthSocial.isAccountLookupUrl(p.url)) {
      outlinks ++= SiteSpecific.TruthSocial.accountLookupOutlinks(p.url)
    } else if (ObjectStorage.matches(p.server, ct)) {
      outlinks ++= ObjectStorage.extract(p.url, p.server, p.body)
    } else if (isSitemap) {
      outlinks ++= Xml.extractSitemap(p.body)
    } else if (isHtml(ct)) {
      outlinks ++= Html.outlinks(tags, p.url, conf)
    } else if (Pdf.isPdf(ct)) {
      outlinks ++= Pdf.outlinks(p.bodyBytes).getOrElse(Nil)
    } else if (SiteSpecific.Reddit.isPostApiUrl(p.url)) {
      outlinks ++= SiteSpecific.Reddit.postApiOutlinks(p.body)
    }
    if (p.linkHeader != null && p.linkHeader.nonEmpty)
      outlinks ++= LinkHeader.extract(p.linkHeader)
    if (ct.contains("text/"))
      outlinks ++= TextLinks.extract(p.body, conf.strictRegex)

    // --- asset path ---
    var assets = Vector.empty[String]
    var atImports = Vector.empty[String]
    if (!conf.disableAssetsCapture && !isSitemap && !ObjectStorage.matches(p.server, ct)) {
      if (SiteSpecific.Ina.isApiUrl(p.url)) {
        // INA partner API: media assets from the JSON + the page's HTML
        // assets (assets.go:35-48)
        assets ++= SiteSpecific.Ina.apiMediaAssets(p.body)
        val (a, ai) = Html.assets(tags, p.url, conf)
        assets ++= a
        atImports ++= ai
      } else if (SiteSpecific.TruthSocial.needAssetExtraction(p.url)) {
        // statuses API → video assets + JSON extraction; post page →
        // statuses-API asset + HTML assets (truthsocial.go:22-50)
        if (SiteSpecific.TruthSocial.isStatusesUrl(p.url)) {
          assets ++= SiteSpecific.TruthSocial.statusVideoAssets(p.body)
          Json.extract(p.body, conf.strictRegex).foreach { case (a, o) =>
            assets ++= a; outlinks ++= o
          }
        } else {
          assets ++= SiteSpecific.TruthSocial.postAssets(p.url)
          val (a, ai) = Html.assets(tags, p.url, conf)
          assets ++= a
          atImports ++= ai
        }
      } else if (isM3u8(ct)) {
        assets ++= M3u8.extract(p.body)
      } else if (isJson(ct)) {
        Json.extract(p.body, conf.strictRegex).foreach { case (a, o) =>
          assets ++= a; outlinks ++= o
        }
      } else if (isXml(ct)) {
        Xml.extract(p.body).foreach { case (a, o) => assets ++= a; outlinks ++= o }
      } else if (isHtml(ct)) {
        val (a, ai) = Html.assets(tags, p.url, conf)
        assets ++= a
        atImports ++= ai
      } else if (isCss(ct)) {
        val (links, ai) = Css.extract(p.body, inline = false)
        assets ++= links
        atImports ++= ai
      }
    }

    // E6: URLs extracted from a non-UTF-8 HTML doc get their query
    // re-encoded in the source charset (html.go:128, html_document.go:95)
    if (isHtml(ct) && !Charsets.isUtf8Name(docCharset)) {
      outlinks = Charsets.encodeNonUtf8QueryUrls(outlinks, docCharset).toVector
      assets = Charsets.encodeNonUtf8QueryUrls(assets, docCharset).toVector
    }

    // --- sanitize (assets.go:100-153 + protocol filter utils.go:9-30) ---
    val cleanAssets0 = assets
      .filter(a => a != null && a.nonEmpty && a != p.url)
    // Reddit URL-encoding quirk (assets.go:124-135): strip "amp;" and
    // query-unescape asset URLs on reddit pages; unescapable → kept as-is
    val cleanAssets = (if (SiteSpecific.Reddit.isRedditUrl(p.url))
      cleanAssets0.map { a =>
        val collapsed = a.replace("amp;", "")
        try java.net.URLDecoder.decode(collapsed, "UTF-8")
        catch { case _: Exception => a }
      }
    else cleanAssets0)
      .filterNot(Canon.hasBadProtocol)
    var cleanOutlinks = outlinks
      .filter(o => o != null && o.nonEmpty)
      .filterNot(Canon.hasBadProtocol)
    if (conf.maxOutlinks > 0 && cleanOutlinks.length > conf.maxOutlinks)
      cleanOutlinks = cleanOutlinks.take(conf.maxOutlinks)
    val cleanAtImports = atImports
      .filter(_.nonEmpty)
      .filterNot(Canon.hasBadProtocol)
    ExtractResult(cleanOutlinks, cleanAssets, cleanAtImports)
  }
}
