package graft.extract

import scala.collection.mutable.ArrayBuffer
import graft.canon.Canon

/** S3-compatible / Azure bucket-listing extractor with pagination
  * synthesis (the "next page" URL is itself an outlink).
  *
  * Reference: /root/reference/internal/pkg/postprocessor/extractor/
  * object_storage.go:18-43, object_storage_s3.go:11-138,
  * object_storage_azure.go.
  */
object ObjectStorage {

  val s3Servers = List("AmazonS3", "WasabiS3", "UploadServer", "AliyunOSS")
  val azureServers = List("Windows-Azure-Blob")

  def matches(serverHeader: String, contentType: String): Boolean =
    serverHeader != null && contentType != null &&
      (s3Servers ++ azureServers).exists(serverHeader.contains) &&
      contentType.contains("/xml")

  def extract(pageUrl: String, serverHeader: String, body: String): Seq[String] = {
    if (s3Servers.exists(serverHeader.contains)) s3(pageUrl, body)
    else if (azureServers.exists(serverHeader.contains)) azure(pageUrl, body)
    else Nil
  }

  // --- tiny DOM-ish helpers over the tolerant tokenizer ---

  /** Collect text content of every <name> element (flat, non-nested use). */
  private def textsOf(xml: String, names: Set[String]): Map[String, Seq[String]] = {
    val out = scala.collection.mutable.HashMap.empty[String, ArrayBuffer[String]]
    var current: String = null
    val sb = new StringBuilder
    var i = 0
    val n = xml.length
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = n }
      else {
        if (current != null) sb.append(xml.substring(i, lt))
        val gt = xml.indexOf('>', lt)
        if (gt < 0) { i = n }
        else {
          val tag = xml.substring(lt + 1, gt)
          if (tag.startsWith("/")) {
            val name = tag.substring(1).trim
            if (current == name) {
              out.getOrElseUpdate(name, ArrayBuffer.empty) +=
                HtmlScanner.htmlUnescape(sb.toString)
              current = null
            }
          } else {
            val name = tag.takeWhile(c => !c.isWhitespace && c != '/')
            if (names.contains(name)) { current = name; sb.clear() }
          }
          i = gt + 1
        }
      }
    }
    out.view.mapValues(_.toSeq).toMap
  }

  /** Go url.Values.Encode: keys sorted, QueryEscape components. */
  private def setQueryParam(pageUrl: String, key: String, value: String): String = {
    val u = Resolve.split(pageUrl)
    val pairs = scala.collection.mutable.LinkedHashMap.empty[String, ArrayBuffer[String]]
    u.query.getOrElse("").split("&").filter(_.nonEmpty).foreach { p =>
      val eq = p.indexOf('=')
      val (k, v) = if (eq >= 0) (p.substring(0, eq), p.substring(eq + 1)) else (p, "")
      pairs.getOrElseUpdate(Canon.percentDecode(k, plusIsSpace = true), ArrayBuffer.empty) +=
        Canon.percentDecode(v, plusIsSpace = true)
    }
    pairs(key) = ArrayBuffer(value)
    val enc = pairs.toSeq.sortBy(_._1).flatMap { case (k, vs) =>
      vs.map(v => Canon.queryEscape(k) + "=" + Canon.queryEscape(v))
    }.mkString("&")
    s"${u.scheme}://${u.authority}${u.path}?$enc"
  }

  private def rootUrl(pageUrl: String): String = {
    val u = Resolve.split(pageUrl)
    s"${u.scheme}://${u.authority}/"
  }

  private def s3(pageUrl: String, body: String): Seq[String] = {
    val t = textsOf(body, Set("Key", "Size", "IsTruncated", "NextContinuationToken", "Prefix"))
    val keys = t.getOrElse("Key", Nil)
    val sizes = t.getOrElse("Size", Nil)
    val listType2 = {
      val q = Resolve.split(pageUrl).query.getOrElse("")
      q.split("&").exists(_ == "list-type=2")
    }
    val out = ArrayBuffer.empty[String]
    val base = rootUrl(pageUrl)
    if (!listType2) {
      // legacy: marker pagination (object_storage_s3.go:42-66)
      if (keys.nonEmpty) out += setQueryParam(pageUrl, "marker", keys.last)
      keys.zipAll(sizes, "", "0").foreach { case (k, sz) =>
        if (k.nonEmpty && toLongSafe(sz) > 0) out += base + k.dropWhile(_ == '/')
      }
    } else {
      // v2: common prefixes → subfolder links, else files; continuation token
      // (object_storage_s3.go:70-104). <Prefix> appears both at top level
      // (request echo) and inside <CommonPrefixes>; only the latter counts.
      val commonPrefixes =
        """(?s)<CommonPrefixes>(.*?)</CommonPrefixes>""".r
          .findAllMatchIn(body)
          .flatMap(m => """<Prefix>(.*?)</Prefix>""".r.findAllMatchIn(m.group(1)).map(_.group(1)))
          .filter(_.nonEmpty)
          .toSeq
      if (commonPrefixes.nonEmpty) {
        commonPrefixes.foreach(p => out += setQueryParam(pageUrl, "prefix", p))
      } else {
        keys.zipAll(sizes, "", "0").foreach { case (k, sz) =>
          if (k.nonEmpty && toLongSafe(sz) > 0) out += base + k.dropWhile(_ == '/')
        }
      }
      val truncated = t.getOrElse("IsTruncated", Nil).exists(_.trim == "true")
      val token = t.getOrElse("NextContinuationToken", Nil).headOption.getOrElse("")
      if (truncated && token.nonEmpty) out += setQueryParam(pageUrl, "continuation-token", token)
    }
    out.toSeq
  }

  /** Azure blob listing: <Blob><Name>…</Name></Blob> + NextMarker paging.
    * Reference: /root/reference/internal/pkg/postprocessor/extractor/object_storage_azure.go.
    */
  private def azure(pageUrl: String, body: String): Seq[String] = {
    val t = textsOf(body, Set("Name", "NextMarker", "Url"))
    val out = ArrayBuffer.empty[String]
    val urls = t.getOrElse("Url", Nil).filter(_.nonEmpty)
    if (urls.nonEmpty) out ++= urls
    else {
      val base = rootUrl(pageUrl)
      val containerPath = Resolve.split(pageUrl).path.stripPrefix("/").stripSuffix("/")
      t.getOrElse("Name", Nil).filter(_.nonEmpty).foreach { name =>
        out += base + (if (containerPath.nonEmpty) containerPath + "/" else "") + name
      }
    }
    t.getOrElse("NextMarker", Nil).find(_.trim.nonEmpty).foreach { m =>
      out += setQueryParam(pageUrl, "marker", m.trim)
    }
    out.toSeq
  }

  private def toLongSafe(s: String): Long =
    try s.trim.toLong catch { case _: Exception => 0L }
}
