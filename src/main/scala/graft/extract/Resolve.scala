package graft.extract

/** Minimal RFC 3986 reference resolution for extracted links — the
  * extraction-time resolve is deliberately lighter than full
  * canonicalization (which happens later in the preprocessor stage),
  * mirroring the reference's use of net/url.ResolveReference:
  * /root/reference/internal/pkg/postprocessor/extractor/resolve.go:13-37.
  */
object Resolve {

  private val schemeRe = "^[A-Za-z][A-Za-z0-9+.\\-]*:".r

  final case class Uri(scheme: String, authority: String, path: String, query: Option[String])

  def split(u: String): Uri = {
    var s = u
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash) // fragments never survive crawling
    var scheme = ""
    schemeRe.findFirstIn(s).foreach { m =>
      scheme = m.dropRight(1)
      s = s.substring(m.length)
    }
    var authority = ""
    if (s.startsWith("//")) {
      s = s.substring(2)
      val end = s.indexWhere(c => c == '/' || c == '?')
      if (end == -1) { authority = s; s = "" }
      else { authority = s.substring(0, end); s = s.substring(end) }
    }
    val q = s.indexOf('?')
    val (path, query) =
      if (q >= 0) (s.substring(0, q), Some(s.substring(q + 1))) else (s, None)
    Uri(scheme, authority, path, query)
  }

  private def removeDots(path: String): String =
    graft.canon.Canon.removeDotSegments(path)

  private def mkString(u: Uri): String = {
    val sb = new StringBuilder
    if (u.scheme.nonEmpty) sb.append(u.scheme).append(':')
    if (u.authority.nonEmpty || u.scheme.nonEmpty) sb.append("//").append(u.authority)
    sb.append(u.path)
    u.query.foreach(q => sb.append('?').append(q))
    sb.toString
  }

  /** Resolve `raw` against `base`. Absolute inputs are returned untouched.
    * Returns None when base is unusable.
    */
  def apply(raw: String, base: String): Option[String] = {
    val r = raw.trim
    if (r.isEmpty) return None
    schemeRe.findFirstIn(r) match {
      case Some(m) =>
        // Go's url.URL.String() lowercases the scheme of absolute links —
        // observable in the reference's meta-refresh golden
        // (html_test.go:150 expects "http://UPPER.COM/PAGE2.HTML")
        return Some(m.toLowerCase + r.substring(m.length))
      case None => ()
    }
    val b = split(base)
    if (b.scheme.isEmpty || b.authority.isEmpty) return None
    val rel = split(r)
    val resolved =
      if (rel.authority.nonEmpty) // protocol-relative //host/x
        Uri(b.scheme, rel.authority, removeDots(rel.path), rel.query)
      else if (rel.path.isEmpty)
        Uri(b.scheme, b.authority, b.path, rel.query.orElse(b.query))
      else if (rel.path.startsWith("/"))
        Uri(b.scheme, b.authority, removeDots(rel.path), rel.query)
      else {
        val bp = if (b.path.isEmpty) "/" else b.path
        val dir = bp.substring(0, bp.lastIndexOf('/') + 1)
        Uri(b.scheme, b.authority, removeDots(dir + rel.path), rel.query)
      }
    Some(mkString(resolved))
  }
}
