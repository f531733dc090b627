package graft.extract

import scala.collection.mutable.ArrayBuffer

/** M3U8 playlist extractor — media playlists yield segment URIs, master
  * playlists yield variant + alternative URIs.
  * Reference: /root/reference/internal/pkg/postprocessor/extractor/m3u8.go:8-57.
  */
object M3u8 {
  private val uriAttr = """URI="([^"]+)"""".r

  def extract(body: String): Seq[String] = {
    val lines = body.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.isEmpty || !lines.head.startsWith("#EXTM3U")) return Nil
    val isMaster = lines.exists(_.startsWith("#EXT-X-STREAM-INF"))
    val out = ArrayBuffer.empty[String]
    if (isMaster) {
      var afterStreamInf = false
      lines.foreach { l =>
        if (l.startsWith("#EXT-X-STREAM-INF")) afterStreamInf = true
        else if (l.startsWith("#EXT-X-MEDIA")) uriAttr.findFirstMatchIn(l).foreach(out += _.group(1))
        else if (l.startsWith("#I-FRAME-STREAM-INF") || l.startsWith("#EXT-X-I-FRAME-STREAM-INF"))
          uriAttr.findFirstMatchIn(l).foreach(out += _.group(1))
        else if (!l.startsWith("#")) {
          if (afterStreamInf) { out += l; afterStreamInf = false }
        }
      }
    } else {
      lines.foreach { l => if (!l.startsWith("#")) out += l }
    }
    out.toSeq
  }
}

/** HTTP Link response-header extractor.
  * Reference: /root/reference/internal/pkg/postprocessor/extractor/link_header.go:26-78.
  */
object LinkHeader {
  def extract(header: String): Seq[String] = {
    if (header == null || header.isEmpty) return Nil
    header.split(", ").toSeq.flatMap { part =>
      val pieces = part.split(";")
      if (pieces.isEmpty) None
      else {
        val url = pieces(0).trim.stripPrefix("<").stripSuffix(">").trim
        if (url.isEmpty) None else Some(url)
      }
    }
  }
}

/** Aggressive text-link scan over any text-typed body (E15) — the operator
  * behind the byte-identical-extraction invariant.
  *
  * Reference: /root/reference/internal/pkg/postprocessor/outlinks.go:98-140.
  * Word-split (bufio.ScanWords ≙ split on Unicode whitespace), loose mode
  * skips tokens shorter than len("http://a.b") or without "://", then
  * regex-extracts; results are deduped preserving order.
  */
object TextLinks {
  private val minLinkLength = "http://a.b".length

  /** In-place `body.substring(i, j).contains("://")`. */
  private def containsSchemeSep(body: String, i: Int, j: Int): Boolean = {
    var k = i
    val last = j - 3
    while (k <= last) {
      if (body.charAt(k) == ':' && body.charAt(k + 1) == '/' &&
          body.charAt(k + 2) == '/') return true
      k += 1
    }
    false
  }

  def extract(body: String, strict: Boolean = false): Seq[String] = {
    val raw = ArrayBuffer.empty[String]
    val n = body.length
    if (!strict) {
      // loose mode processes exactly the whitespace-delimited tokens that
      // contain "://" — so drive the scan by indexOf("://") (an intrinsic
      // substring search) and expand each hit to its token boundaries,
      // instead of walking every character of every token: one fast pass
      // over link-free prose (which is most of every body). Token order,
      // boundaries and the min-length gate are unchanged, and skipping to
      // the token's end means a token with several "://" is still
      // processed exactly once — identical output to the token walk.
      var sep = body.indexOf("://")
      while (sep >= 0) {
        var i = sep
        while (i > 0 && !Character.isWhitespace(body.charAt(i - 1))) i -= 1
        var j = sep + 3
        while (j < n && !Character.isWhitespace(body.charAt(j))) j += 1
        if (j - i >= minLinkLength)
          Util.LinkRegex.findAllIn(body.substring(i, j)).foreach(raw += _)
        sep = if (j < n) body.indexOf("://", j) else -1
      }
    } else {
      var i = 0
      while (i < n) {
        while (i < n && Character.isWhitespace(body.charAt(i))) i += 1
        var j = i
        while (j < n && !Character.isWhitespace(body.charAt(j))) j += 1
        if (j > i)
          Util.LinkRegexStrict.findAllIn(body.substring(i, j)).foreach(raw += _)
        i = j
      }
    }
    Util.dedupe(raw.toSeq)
  }
}

/** Script-content JSON scraping: strip a leading `var x =` and
  * brace-count to the end of the first JSON object.
  * Reference: /root/reference/internal/pkg/postprocessor/extractor/script.go:8-47.
  */
object Script {
  def extractFromScriptContent(content: String): Seq[String] = {
    val idx = content.indexOf('=')
    if (idx < 0) return Nil
    val after = content.substring(idx + 1)
    var open = 0
    var closed = 0
    var endPos = 0
    var i = 0
    var found = false
    while (i < after.length && !found) {
      val c = after.charAt(i)
      if (c == '{') open += 1
      else if (c == '}') closed += 1
      if (open > 0 && open == closed) { endPos = i; found = true }
      i += 1
    }
    if (after.length > endPos)
      Json.urls(after.substring(0, endPos + 1)).getOrElse(Nil)
    else Nil
  }

  /** Go strconv.Unquote semantics for the quoted-URL escapes that appear in
    * script bodies (\uXXXX, \n, \t, \\, \/, \").
    */
  def unquote(s: String): Option[String] = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            try { sb.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 6), 16))); i += 6 }
            catch { case _: Exception => return None }
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\'' => sb.append('\''); i += 2
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    Some(sb.toString)
  }
}
