package graft.extract

import scala.util.matching.Regex

/** Shared regexes + helpers for the extractor family.
  *
  * Reference: /root/reference/internal/pkg/postprocessor/extractor/utils.go:12-66.
  */
object Util {
  /** Loose link regex (Heritrix-derived), byte-compatible with the Go
    * pattern `(?i)https?://[^<>'",\s/]+\.[^<>'",\s/]+(?:/[^<>'",\s]*)?`.
    */
  val LinkRegex: Regex = """(?i)https?://[^<>'",\s/]+\.[^<>'",\s/]+(?:/[^<>'",\s]*)?""".r

  /** Strict matcher (xurls.StrictMatchingScheme("https?://") equivalent):
    * scheme + host with optional port and path/query/fragment, stopping at
    * whitespace, quotes, brackets and pipes. Calibrated against the
    * reference's strict golden (433 links on the wikipedia fixture,
    * outlinks_test.go:67-76).
    */
  val LinkRegexStrict: Regex =
    """(?i)https?://[a-zA-Z0-9\-._~%]+(?::\d{1,5})?(?:[/?#][^\s<>"'|{}\)\]]*)?""".r

  val QuotedLinkRegex: Regex = """['"](https?://[^'"]+)['"]""".r

  val OnclickRegex: Regex = """window\.location(?:\.href)?\s*=\s*['"]([^'"]+)['"]""".r

  val ContentUrlRegex: Regex = """(?i)\burl\s*=\s*(\S+)""".r

  def quotedLinkFindAll(s: String): Seq[String] =
    QuotedLinkRegex.findAllMatchIn(s).map(_.group(1)).toSeq

  /** Does the URL look like a direct file (has an extension in its last
    * path segment)? Mirrors utils.go:42-66.
    */
  def hasFileExtension(sIn: String): Boolean = {
    var s = sIn
    val qi = s.indexWhere(c => c == '?' || c == '#')
    if (qi != -1) s = s.substring(0, qi)
    if ((s.startsWith("//") || s.contains("://")) && s.count(_ == '/') == 2)
      return false
    val slash = s.lastIndexOf('/')
    if (slash != -1) s = s.substring(slash + 1)
    val dot = s.lastIndexOf('.')
    dot != -1 && dot != s.length - 1
  }

  /** Order-preserving string dedupe (utils.DedupeStrings). */
  def dedupe(xs: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    xs.foreach(seen += _)
    seen.toSeq
  }

  /** Split a srcset attribute: comma-separated candidates, URL is the
    * first space-delimited token of each (html.go:220-227).
    */
  def splitSrcset(v: String): Seq[String] =
    v.split(",").toSeq.map(_.trim.split(" ")(0)).filter(_.nonEmpty)
}
