package graft.extract

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** JSON link extractor: recursively collect strings that look like URLs,
  * re-parse JSON-in-JSON strings, regex-scan free text; split asset vs
  * outlink by file extension.
  *
  * Reference: /root/reference/internal/pkg/postprocessor/extractor/json.go:17-117.
  */
object Json {
  private val mapper = new ObjectMapper()

  def parse(s: String): Option[JsonNode] =
    try Option(mapper.readTree(s))
    catch { case _: Exception => None }

  /** (assets, outlinks), or None if the body is not valid JSON. */
  def extract(body: String, strict: Boolean = false): Option[(Seq[String], Seq[String])] =
    parse(body).map { node =>
      val links = ArrayBuffer.empty[String]
      findUrls(node, links, strict)
      // asset = has a file extension OR matches a GitHub raw-asset pattern
      // (json.go:49 — github asset URLs often carry no extension)
      val (assets, outlinks) = links.partition(l =>
        Util.hasFileExtension(l) || SiteSpecific.Github.shouldConsiderAsAsset(l))
      (assets.toSeq, outlinks.toSeq)
    }

  /** Raw URL collection for data-item / script-JSON callers (html.go:157). */
  def urls(body: String, strict: Boolean = false): Option[Seq[String]] =
    extract(body, strict).map { case (a, o) => a ++ o }

  private def isLikelyJson(s: String): Boolean =
    s.length >= 5 &&
      ((s.head == '{' && s.last == '}') || (s.head == '[' && s.last == ']')) &&
      s.contains('"')

  /** Quick URL validity check mirroring fasturl semantics (json.go:108-117):
    * scheme+host, or host with a path/query.
    */
  def isValidUrl(s: String): Boolean = {
    if (s.isEmpty) return false
    val proto = s.indexOf("://")
    if (proto > 0) {
      // scheme + host — path may contain spaces (fasturl tolerates them)
      if (s.substring(0, proto).exists(c => !c.isLetterOrDigit && c != '+' && c != '-' && c != '.'))
        return false
      val rest = s.substring(proto + 3)
      val host = rest.takeWhile(c => c != '/' && c != '?' && c != '#')
      host.nonEmpty && !host.exists(_.isWhitespace)
    } else {
      if (s.startsWith("//") || s.contains(":")) return false
      val pathIdx = s.indexWhere(c => c == '/' || c == '?')
      if (pathIdx <= 0) return false
      val host = s.substring(0, pathIdx)
      host.contains(".") && !host.contains("..") && !host.exists(_.isWhitespace)
    }
  }

  private def findUrls(node: JsonNode, out: ArrayBuffer[String], strict: Boolean): Unit = {
    if (node == null) return
    if (node.isTextual) {
      val v = node.asText()
      if (isValidUrl(v)) { out += v; return }
      if (isLikelyJson(v)) {
        parse(v) match {
          case Some(inner) => findUrls(inner, out, strict); return
          case None => ()
        }
      }
      val re = if (strict) Util.LinkRegexStrict else Util.LinkRegex
      re.findAllIn(v).foreach { link => if (isValidUrl(link)) out += link }
    } else if (node.isArray) {
      node.elements().asScala.foreach(findUrls(_, out, strict))
    } else if (node.isObject) {
      node.properties().asScala.foreach(e => findUrls(e.getValue, out, strict))
    }
  }
}
