package graft.extract

import scala.collection.mutable.ArrayBuffer

/** A tolerant, single-pass HTML tag/attribute scanner.
  *
  * The reference walks a goquery (jsoup-like) DOM, but every selector it
  * uses is a flat tag/attribute lookup (`a`, `img`, `iframe[src]`, ...),
  * so a linear scan that yields tags in document order reproduces the
  * same results without a DOM — and streams, which matters when the scan
  * runs inside a Spark UDF over millions of pages.
  *
  * Semantics mirrored: goquery `.Attr` returns the FIRST occurrence of an
  * attribute; raw-text elements (script/style/textarea/title) swallow
  * their content until the matching close tag; comments and directives
  * are skipped.
  */
object HtmlScanner {

  final case class Tag(
      name: String,
      attrs: List[(String, String)], // lowercase names, first-wins
      text: String, // raw text content for script/style, "" otherwise
      outer: String // full outer HTML for script tags, "" otherwise
  ) {
    def attr(k: String): Option[String] = {
      // plain list walk — collectFirst allocated a partial function per
      // call on a per-tag hot path
      var rest = attrs
      while (rest.nonEmpty) {
        val h = rest.head
        if (h._1 == k) return Some(h._2)
        rest = rest.tail
      }
      None
    }
    def attrOr(k: String, d: String): String = {
      var rest = attrs
      while (rest.nonEmpty) {
        val h = rest.head
        if (h._1 == k) return h._2
        rest = rest.tail
      }
      d
    }
  }

  private val rawTextTags = Set("script", "style", "textarea", "title")

  def scan(html: String): IndexedSeq[Tag] = {
    val out = ArrayBuffer.empty[Tag]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return out.toIndexedSeq
      i = lt + 1
      if (i >= n) return out.toIndexedSeq
      val c = html.charAt(i)
      if (c == '!') {
        if (html.startsWith("!--", i)) {
          val end = html.indexOf("-->", i + 3)
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        }
      } else if (c == '?') {
        val end = html.indexOf('>', i)
        i = if (end < 0) n else end + 1
      } else if (c == '/') {
        val end = html.indexOf('>', i)
        i = if (end < 0) n else end + 1
      } else if (c.isLetter) {
        // tag name
        var j = i
        while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-' || html.charAt(j) == '_')) j += 1
        val name = html.substring(i, j).toLowerCase
        // attributes
        val attrs = ArrayBuffer.empty[(String, String)]
        var k = j
        var selfClosing = false
        var open = true
        while (open && k < n) {
          while (k < n && html.charAt(k).isWhitespace) k += 1
          if (k >= n) open = false
          else html.charAt(k) match {
            case '>' => open = false; k += 1
            case '/' =>
              if (k + 1 < n && html.charAt(k + 1) == '>') { selfClosing = true; open = false; k += 2 }
              else k += 1
            case _ =>
              // attribute name
              var a = k
              while (a < n && !html.charAt(a).isWhitespace &&
                     html.charAt(a) != '=' && html.charAt(a) != '>' && html.charAt(a) != '/') a += 1
              val aname = html.substring(k, a).toLowerCase
              k = a
              while (k < n && html.charAt(k).isWhitespace) k += 1
              var avalue = ""
              if (k < n && html.charAt(k) == '=') {
                k += 1
                while (k < n && html.charAt(k).isWhitespace) k += 1
                if (k < n && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
                  val quote = html.charAt(k)
                  val close = html.indexOf(quote, k + 1)
                  if (close < 0) { avalue = html.substring(k + 1); k = n }
                  else { avalue = html.substring(k + 1, close); k = close + 1 }
                } else {
                  var v = k
                  while (v < n && !html.charAt(v).isWhitespace && html.charAt(v) != '>') v += 1
                  avalue = html.substring(k, v)
                  k = v
                }
              }
              if (aname.nonEmpty) attrs += ((aname, htmlUnescape(avalue)))
          }
        }
        var text = ""
        var outerEnd = k
        if (!selfClosing && rawTextTags.contains(name)) {
          val closeIdx = indexOfIgnoreCase(html, "</" + name, k)
          if (closeIdx >= 0) {
            text = html.substring(k, closeIdx)
            val gt = html.indexOf('>', closeIdx)
            outerEnd = if (gt < 0) n else gt + 1
          } else {
            text = html.substring(k)
            outerEnd = n
          }
        }
        val outer = if (name == "script") html.substring(lt, outerEnd) else ""
        out += Tag(name, dedupeFirst(attrs.toList), text, outer)
        i = outerEnd
      } else {
        // stray '<' — literal text
        i += 1
      }
    }
    out.toIndexedSeq
  }

  private def dedupeFirst(attrs: List[(String, String)]): List[(String, String)] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    attrs.filter { case (k, _) => seen.add(k) }
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val nl = needle.length
    var i = from
    val limit = hay.length - nl
    while (i <= limit) {
      if (hay.regionMatches(true, i, needle, 0, nl)) return i
      i += 1
    }
    -1
  }

  /** Minimal entity decode for attribute values — the named entities that
    * matter for URLs plus numeric refs.
    */
  def htmlUnescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: Option[String] = ent match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" | "#39" | "#x27" => Some("'")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.drop(2), 16))))
              catch { case _: Exception => None }
            case e if e.startsWith("#") =>
              try Some(new String(Character.toChars(e.drop(1).toInt)))
              catch { case _: Exception => None }
            case _ => None
          }
          rep match {
            case Some(r) => sb.append(r); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
