package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Tolerant XML link extractor + sitemap detector.
  *
  * Reference: /root/reference/internal/pkg/postprocessor/extractor/xml.go:23-194.
  * Any attribute value starting with "http" and any character-data run
  * starting with "http" is a link; other text is scanned with the strict
  * regex. A document is a sitemap when the marker string
  * "sitemaps.org/schemas/sitemap/" appears in any token.
  */
object Xml {

  val SitemapMarker = "sitemaps.org/schemas/sitemap/"

  sealed trait Ev
  final case class EStart(name: String, attrs: List[(String, String)]) extends Ev
  final case class EText(data: String) extends Ev
  final case class EMeta(data: String) extends Ev // comment / directive / procinst

  /** Single-pass tolerant tokenizer (no well-formedness checks). */
  def events(xml: String): Iterator[Ev] = new Iterator[Ev] {
    private var i = 0
    private val n = xml.length
    private var nextEv: Ev = _
    advance()

    private def advance(): Unit = {
      nextEv = null
      while (nextEv == null && i < n) {
        if (xml.charAt(i) == '<') {
          if (xml.startsWith("<!--", i)) {
            val end = xml.indexOf("-->", i + 4)
            val content = if (end < 0) xml.substring(i + 4) else xml.substring(i + 4, end)
            i = if (end < 0) n else end + 3
            nextEv = EMeta(content)
          } else if (xml.startsWith("<![CDATA[", i)) {
            val end = xml.indexOf("]]>", i + 9)
            val content = if (end < 0) xml.substring(i + 9) else xml.substring(i + 9, end)
            i = if (end < 0) n else end + 3
            nextEv = EText(content)
          } else if (i + 1 < n && (xml.charAt(i + 1) == '!' || xml.charAt(i + 1) == '?')) {
            val end = xml.indexOf('>', i)
            val content = if (end < 0) xml.substring(i + 2) else xml.substring(i + 2, end)
            i = if (end < 0) n else end + 1
            nextEv = EMeta(content)
          } else if (i + 1 < n && xml.charAt(i + 1) == '/') {
            val end = xml.indexOf('>', i)
            i = if (end < 0) n else end + 1
          } else {
            // start element
            var j = i + 1
            while (j < n && !xml.charAt(j).isWhitespace && xml.charAt(j) != '>' && xml.charAt(j) != '/') j += 1
            val name = xml.substring(i + 1, j)
            val attrs = ArrayBuffer.empty[(String, String)]
            var k = j
            var open = true
            while (open && k < n) {
              while (k < n && xml.charAt(k).isWhitespace) k += 1
              if (k >= n || xml.charAt(k) == '>') { open = false; k += 1 }
              else if (xml.charAt(k) == '/' ) { k += 1 }
              else {
                var a = k
                while (a < n && !xml.charAt(a).isWhitespace && xml.charAt(a) != '=' && xml.charAt(a) != '>' && xml.charAt(a) != '/') a += 1
                val aname = xml.substring(k, a)
                k = a
                while (k < n && xml.charAt(k).isWhitespace) k += 1
                var avalue = ""
                if (k < n && xml.charAt(k) == '=') {
                  k += 1
                  while (k < n && xml.charAt(k).isWhitespace) k += 1
                  if (k < n && (xml.charAt(k) == '"' || xml.charAt(k) == '\'')) {
                    val q = xml.charAt(k)
                    val close = xml.indexOf(q, k + 1)
                    if (close < 0) { avalue = xml.substring(k + 1); k = n }
                    else { avalue = xml.substring(k + 1, close); k = close + 1 }
                  } else {
                    var v = k
                    while (v < n && !xml.charAt(v).isWhitespace && xml.charAt(v) != '>') v += 1
                    avalue = xml.substring(k, v); k = v
                  }
                }
                if (aname.nonEmpty) attrs += ((aname, HtmlScanner.htmlUnescape(avalue)))
              }
            }
            i = k
            nextEv = EStart(name, attrs.toList)
          }
        } else {
          val lt = xml.indexOf('<', i)
          val end = if (lt < 0) n else lt
          val text = xml.substring(i, end)
          i = end
          if (text.nonEmpty) nextEv = EText(HtmlScanner.htmlUnescape(text))
        }
      }
    }
    def hasNext: Boolean = nextEv != null
    def next(): Ev = { val e = nextEv; advance(); e }
  }

  def isSitemap(xml: String): Boolean = {
    // fast substring probe first — equivalent to the token walk because the
    // marker is matched inside every token kind (xml.go:35-104)
    xml.contains(SitemapMarker)
  }

  /** (assets, outlinks) split by file extension. Returns None for a body
    * with no non-whitespace content (xml.go:118-126 errors on empty).
    */
  def extract(xml: String): Option[(Seq[String], Seq[String])] = {
    if (xml.trim.isEmpty) return None
    val raw = ArrayBuffer.empty[String]
    events(xml).foreach {
      case EStart(_, attrs) =>
        attrs.foreach { case (_, v) => if (v.startsWith("http")) raw += v }
      case EText(data) =>
        if (data.startsWith("http")) raw += data
        else raw ++= Util.dedupe(Util.LinkRegexStrict.findAllIn(data).toSeq)
      case EMeta(_) => ()
    }
    val (assets, outlinks) = raw.partition(Util.hasFileExtension)
    Some((assets.toSeq, outlinks.toSeq))
  }

  /** Sitemap mode: everything is an outlink (xml.go:184-194). */
  def extractSitemap(xml: String): Seq[String] =
    extract(xml).map { case (a, o) => o ++ a }.getOrElse(Nil)
}
