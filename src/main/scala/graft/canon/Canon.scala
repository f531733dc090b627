package graft.canon

import graft.conf.ZenoConf

/** Result of canonicalization: the normalized href plus the pieces the
  * frontier needs as columns.
  */
final case class CanonUrl(
    href: String,
    scheme: String,
    host: String,
    port: Int, // -1 when default/absent
    path: String,
    query: String // "" when absent
)

/** URL canonicalization, re-expressing the reference's normalization
  * pipeline as a pure Scala function (no Spark dependency, so it can run
  * inside a codegen-friendly UDF and be unit-tested in milliseconds).
  *
  * Semantics mirrored from the reference:
  *  - quote trim + relative resolve + scheme default + fragment strip +
  *    scheme/host rejection + max length + path-loop:
  *    /root/reference/internal/pkg/preprocessor/url_cgofree.go:17-87
  *  - IDNA host + order-preserving query re-encode (+ Reddit signed-URL
  *    carve-out): /root/reference/pkg/models/url.go:169-230
  *  - path-loop trap: /root/reference/internal/pkg/preprocessor/pathloop.go:27-90
  */
object Canon {

  sealed trait Reject { def code: String }
  case object ParseError extends Reject { val code = "parse_error" }
  case object UnsupportedScheme extends Reject { val code = "unsupported_scheme" }
  case object UnsupportedHost extends Reject { val code = "unsupported_host" }
  case object TooLong extends Reject { val code = "too_long" }
  case object PathLoop extends Reject { val code = "path_loop" }
  case object NoParent extends Reject { val code = "no_parent" }

  /** Hosts whose query strings are signed and must not be re-encoded.
    * Reference: /root/reference/pkg/models/url.go:173-177
    */
  private val noReencodeHosts =
    Set("external-preview.redd.it", "styles.redditmedia.com", "preview.redd.it")

  private val schemeRe = "^[A-Za-z][A-Za-z0-9+.\\-]*:".r

  /** Hand-rolled `schemeRe` match (a regex engine run per candidate URL
    * was ~1% of wave CPU): letter, then [A-Za-z0-9+.-]*, then ':'.
    */
  private def hasSchemePrefix(s: String): Boolean = {
    if (s.isEmpty) return false
    val c0 = s.charAt(0)
    if (!((c0 >= 'A' && c0 <= 'Z') || (c0 >= 'a' && c0 <= 'z'))) return false
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return true
      if (!((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
            (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-')) return false
      i += 1
    }
    false
  }

  /** Last (parent, conf) → canonical base, per thread. In the wave the
    * candidate rows of one page are contiguous after the posexplode, so
    * every relative link of a page after the first hits this cache instead
    * of re-canonicalizing the identical parent string (the recursive call
    * below). Keyed on the parent string AND the caller's conf instance
    * (reference equality: a UDF closure holds one conf for the whole
    * task), so a different conf can never see a stale entry.
    */
  private val lastParentBase =
    new ThreadLocal[(String, ZenoConf, Either[Reject, CanonUrl])]

  final private case class Parts(
      scheme: String,
      userinfo: String, // "" if none
      host: String,
      port: Int, // -1 none
      path: String,
      query: Option[String]
  )

  /** Full normalization. Returns Left(reject reason) for URLs the crawler
    * must drop, Right(CanonUrl) otherwise.
    */
  def canonicalize(
      rawIn: String,
      parent: Option[String],
      conf: ZenoConf = ZenoConf.default
  ): Either[Reject, CanonUrl] = {
    if (rawIn == null) return Left(ParseError)
    // trim surrounding quotes (url_cgofree.go:20) then WHATWG input
    // cleanup: strip leading/trailing C0+space, remove tab/newline anywhere
    var raw = trimQuotes(rawIn)
    raw = stripWhatwg(raw)
    if (raw.isEmpty) return Left(ParseError)
    if (raw.startsWith("://")) return Left(ParseError)

    val hasScheme = hasSchemePrefix(raw)

    val partsE: Either[Reject, Parts] =
      if (hasScheme) parseAbsolute(raw)
      else {
        parent match {
          case None =>
            // scheme default: "www.google.com" -> "http://www.google.com/"
            // but a bare "/path" has no authority -> reject (NoParent),
            // matching url_cgofree.go:46-54 + ada's missing-host error
            if (raw.startsWith("/") || raw.startsWith("?") || raw.startsWith("#"))
              Left(NoParent)
            else parseAbsolute("http://" + raw)
          case Some(p) =>
            val hit = lastParentBase.get()
            val baseE =
              if (hit != null && (hit._2 eq conf) && hit._1 == p) hit._3
              else {
                val r = canonicalize(p, None, conf.copy(maxURLLength = Int.MaxValue))
                lastParentBase.set((p, conf, r))
                r
              }
            baseE match {
              case Left(_) => Left(ParseError)
              case Right(base) => resolveRelative(raw, base)
            }
        }
      }

    partsE.flatMap { p =>
      val scheme = p.scheme.toLowerCase
      if (scheme != "http" && scheme != "https") return Left(UnsupportedScheme)
      val hostE = canonHost(p.host)
      hostE.flatMap { host =>
        if (host == "localhost" || host == "127.0.0.1") Left(UnsupportedHost)
        else if (!host.contains(".") && !host.startsWith("[")) Left(UnsupportedHost)
        else {
          val defPort = if (scheme == "http") 80 else 443
          val port = if (p.port == defPort) -1 else p.port
          val path = encodePath(removeDotSegments(p.path))
          val query = p.query match {
            case None => ""
            case Some(q) =>
              if (noReencodeHosts.contains(host)) q else reencodeQuery(q)
          }
          val sb = new StringBuilder(scheme).append("://")
          if (p.userinfo.nonEmpty) sb.append(p.userinfo).append('@')
          sb.append(host)
          if (port >= 0) sb.append(':').append(port)
          sb.append(path)
          if (p.query.isDefined) sb.append('?').append(query)
          val href = sb.toString
          if (href.length > conf.maxURLLength) Left(TooLong)
          else if (hasPathLoop(path, query, conf)) Left(PathLoop)
          else Right(CanonUrl(href, scheme, host, port, path, query))
        }
      }
    }
  }

  /** Convenience: canonical href or None. */
  def canonHref(raw: String, parent: Option[String], conf: ZenoConf = ZenoConf.default): Option[String] =
    canonicalize(raw, parent, conf).toOption.map(_.href)

  // ---------- parsing ----------

  private def trimQuotes(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && (s.charAt(a) == '"' || s.charAt(a) == '\'')) a += 1
    while (b > a && (s.charAt(b - 1) == '"' || s.charAt(b - 1) == '\'')) b -= 1
    s.substring(a, b)
  }

  private def stripWhatwg(s: String): String = {
    // fast path: nothing to remove and nothing to trim (the overwhelming
    // majority of candidate URLs) — the filterNot + double reverse built
    // five intermediate strings per call on the wave's hottest path
    val n = s.length
    var clean = n == 0 || (s.charAt(0) > ' ' && s.charAt(n - 1) > ' ')
    var i = 0
    while (clean && i < n) {
      val c = s.charAt(i)
      if (c == '\t' || c == '\n' || c == '\r') clean = false
      i += 1
    }
    if (clean) return s
    val t = s.filterNot(c => c == '\t' || c == '\n' || c == '\r')
    t.dropWhile(_ <= ' ').reverse.dropWhile(_ <= ' ').reverse
  }

  private val specialSchemes = Set("http", "https", "ws", "wss", "ftp", "file")

  private def parseAbsolute(raw: String): Either[Reject, Parts] = {
    val colon = raw.indexOf(':')
    val scheme = raw.substring(0, colon)
    var rest = raw.substring(colon + 1)
    val special = specialSchemes
    if (!special.contains(scheme.toLowerCase) &&
        !rest.startsWith("//")) {
      // opaque non-special URL (mailto:, javascript:, data:) — carry the
      // scheme so the caller can reject it
      return Right(Parts(scheme, "", "", -1, rest, None))
    }
    // WHATWG: special schemes consume any run of / or \ before authority
    rest = rest.dropWhile(c => c == '/' || c == '\\')
    parseAfterScheme(scheme, rest)
  }

  private def parseAfterScheme(scheme: String, afterSlashes: String): Either[Reject, Parts] = {
    // authority ends at first / \ ? #
    var i = 0
    val n = afterSlashes.length
    while (i < n && {
      val c = afterSlashes.charAt(i)
      c != '/' && c != '\\' && c != '?' && c != '#'
    }) i += 1
    val auth = afterSlashes.substring(0, i)
    var tail = afterSlashes.substring(i)
    // fragment strip (SetHash(""): url_cgofree.go:57)
    val hashIdx = tail.indexOf('#')
    if (hashIdx >= 0) tail = tail.substring(0, hashIdx)
    val qIdx = tail.indexOf('?')
    val (rawPath, query) =
      if (qIdx >= 0) (tail.substring(0, qIdx), Some(tail.substring(qIdx + 1)))
      else (tail, None)
    parseAuthority(auth).map { case (ui, host, port) =>
      val path0 = rawPath.replace('\\', '/')
      val path = if (path0.isEmpty) "/" else path0
      Parts(scheme, ui, host, port, path, query)
    }
  }

  private def parseAuthority(auth: String): Either[Reject, (String, String, Int)] = {
    if (auth.isEmpty) return Left(UnsupportedHost)
    val at = auth.lastIndexOf('@')
    val (ui, hostPort) =
      if (at >= 0) (auth.substring(0, at), auth.substring(at + 1)) else ("", auth)
    if (hostPort.isEmpty) return Left(UnsupportedHost)
    if (hostPort.startsWith("[")) {
      val close = hostPort.indexOf(']')
      if (close < 0) return Left(ParseError)
      val host = hostPort.substring(0, close + 1)
      val after = hostPort.substring(close + 1)
      if (after.isEmpty) Right((ui, host, -1))
      else if (after.startsWith(":")) parsePort(after.substring(1)).map(p => (ui, host, p))
      else Left(ParseError)
    } else {
      val c = hostPort.lastIndexOf(':')
      if (c < 0) Right((ui, hostPort, -1))
      else parsePort(hostPort.substring(c + 1)).map(p => (ui, hostPort.substring(0, c), p))
    }
  }

  private def parsePort(s: String): Either[Reject, Int] =
    if (s.isEmpty) Right(-1)
    else if (s.forall(_.isDigit) && s.length <= 5) Right(s.toInt)
    else Left(ParseError)

  private def resolveRelative(raw: String, base: CanonUrl): Either[Reject, Parts] = {
    if (raw.startsWith("//")) {
      // protocol-relative
      parseAfterScheme(base.scheme, raw.drop(2).dropWhile(c => c == '/' || c == '\\'))
    } else {
      var r = raw
      val hashIdx = r.indexOf('#')
      if (hashIdx >= 0) r = r.substring(0, hashIdx)
      val qIdx = r.indexOf('?')
      val (pathPart, query) =
        if (qIdx >= 0) (r.substring(0, qIdx), Some(r.substring(qIdx + 1)))
        else (r, None)
      val mergedPath =
        if (pathPart.isEmpty) {
          // "?q" or "#f" alone: keep base path
          base.path
        } else if (pathPart.startsWith("/")) pathPart.replace('\\', '/')
        else {
          // merge: drop last segment of base path (RFC 3986 §5.3)
          val bp = base.path
          val slash = bp.lastIndexOf('/')
          val dir = if (slash >= 0) bp.substring(0, slash + 1) else "/"
          dir + pathPart.replace('\\', '/')
        }
      val q = if (pathPart.isEmpty && query.isEmpty) {
        if (base.query.nonEmpty) Some(base.query) else None
      } else query
      Right(Parts(base.scheme, "", hostPortOf(base), portOf(base), mergedPath, q))
    }
  }

  private def hostPortOf(c: CanonUrl): String = c.host
  private def portOf(c: CanonUrl): Int = c.port

  // ---------- host ----------

  private def canonHost(hostIn: String): Either[Reject, String] = {
    if (hostIn.isEmpty) return Left(UnsupportedHost)
    if (hostIn.startsWith("[")) return Right(hostIn.toLowerCase) // IPv6 literal
    // percent-decode then IDNA (WHATWG host parser)
    val dec = percentDecode(hostIn, plusIsSpace = false)
    val lower = dec.toLowerCase
    if (lower.exists(c => c == ' ' || c == '<' || c == '>' || c == '#' || c == '/' || c == '?' || c == '@')) return Left(ParseError)
    if (lower.forall(_ < 128)) Right(lower)
    else
      try Right(java.net.IDN.toASCII(lower, java.net.IDN.ALLOW_UNASSIGNED).toLowerCase)
      catch { case _: Exception => Left(UnsupportedHost) }
  }

  // ---------- path ----------

  /** RFC 3986 §5.2.4 remove_dot_segments, WHATWG-equivalent. */
  def removeDotSegments(pathIn: String): String = {
    val path = if (pathIn.startsWith("/")) pathIn else "/" + pathIn
    // fast path: every dot segment (".", "..", and the %2e forms) contains
    // "/." or "%2" — without either, split + rejoin is the identity
    if (path.indexOf("/.") < 0 && path.indexOf("%2") < 0) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val segs = path.split("/", -1)
    var i = 1 // skip leading ""
    var trailingSlash = false
    while (i < segs.length) {
      val s = segs(i)
      s match {
        case "." | "%2e" | "%2E" =>
          trailingSlash = true
        case ".." | "%2e." | ".%2e" | "%2e%2e" | "%2E%2E" =>
          if (out.nonEmpty) out.remove(out.length - 1)
          trailingSlash = true
        case seg =>
          out += seg
          trailingSlash = false
      }
      i += 1
    }
    val joined = "/" + out.mkString("/")
    if (trailingSlash && !joined.endsWith("/")) joined + "/" else joined
  }

  /** WHATWG path percent-encode set: controls, space, `"<>`{}`, backtick,
    * and non-ASCII get encoded; existing escapes are preserved.
    */
  private def pathByteSafe(b: Int): Boolean = {
    val c = b.toChar
    !(b <= 0x20 || b >= 0x7f || c == '"' || c == '<' || c == '>' || c == '`' ||
      c == '{' || c == '}' || c == '^' || c == '|')
  }

  def encodePath(path: String): String = {
    // fast path: all chars are safe ASCII (no UTF-8 expansion, no escaping
    // needed) — return the input untouched instead of re-building it
    var i = 0
    val n = path.length
    while (i < n && { val c = path.charAt(i); c < 0x7f && pathByteSafe(c) }) i += 1
    if (i == n) return path
    val sb = new StringBuilder(path.length)
    val bytes = path.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (pathByteSafe(b)) sb.append(b.toChar)
      else sb.append('%').append(hexUpper(b))
      i += 1
    }
    sb.toString
  }

  private val hexUpper: Array[String] =
    Array.tabulate(256)(b => f"$b%02X")

  // ---------- query ----------

  /** Order-preserving re-encode of the query string with Go
    * net/url QueryEscape byte semantics (space→'+', unreserved kept).
    * Mirrors /root/reference/pkg/models/url.go:203-230, which deliberately
    * diverges from net/url by NOT sorting keys; we additionally keep the
    * original pair order deterministic (the reference iterates a Go map).
    */
  def reencodeQuery(q: String): String = {
    if (q.isEmpty) return ""
    q.split("&", -1).iterator.filter(_.nonEmpty).map { pair =>
      val eq = pair.indexOf('=')
      val (k, v) = if (eq >= 0) (pair.substring(0, eq), pair.substring(eq + 1)) else (pair, "")
      queryEscape(percentDecode(k, plusIsSpace = true)) + "=" +
        queryEscape(percentDecode(v, plusIsSpace = true))
    }.mkString("&")
  }

  /** Go url.QueryEscape: keep [A-Za-z0-9-_.~], space→'+', else %XX. */
  private def queryByteUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '_' || c == '.' || c == '~'

  def queryEscape(s: String): String = {
    // fast path: all-unreserved input escapes to itself
    var i = 0
    val n = s.length
    while (i < n && queryByteUnreserved(s.charAt(i))) i += 1
    if (i == n) return s
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length)
    i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val c = b.toChar
      if (queryByteUnreserved(c)) sb.append(c)
      else if (c == ' ') sb.append('+')
      else sb.append('%').append(hexUpper(b))
      i += 1
    }
    sb.toString
  }

  def percentDecode(s: String, plusIsSpace: Boolean): String = {
    // fast path: nothing to decode
    if (s.indexOf('%') < 0 && (!plusIsSpace || s.indexOf('+') < 0)) return s
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write((hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2)))
        i += 3
      } else if (c == '+' && plusIsSpace) {
        out.write(' '); i += 1
      } else if (c < 0x80) {
        out.write(c); i += 1 // single-byte UTF-8, no per-char String round-trip
      } else {
        val bs = c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.write(bs, 0, bs.length); i += 1
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10

  private def countChar(s: String, c: Char): Int = {
    var n = 0; var i = 0
    while (i < s.length) { if (s.charAt(i) == c) n += 1; i += 1 }
    n
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  // ---------- path-loop trap ----------

  /** Crawler-trap detector.
    * Reference: /root/reference/internal/pkg/preprocessor/pathloop.go:27-90.
    */
  def hasPathLoop(path: String, query: String, conf: ZenoConf = ZenoConf.default): Boolean = {
    val maxRep = if (conf.maxSegmentRepetition <= 0) 3 else conf.maxSegmentRepetition
    val threshold =
      if (conf.maxSegmentRepetitionThreshold <= 0) 2 else conf.maxSegmentRepetitionThreshold
    // fast pre-check without any allocation: a repeated path segment needs
    // > maxRep non-empty segments (≤ '/'-count + 1), a repeated query pair
    // needs > maxRep pairs (≤ '&'-count + 1) — short URLs (almost all of
    // them) can never trip the trap, so skip the split + hash maps
    if (countChar(path, '/') < maxRep && countChar(query, '&') < maxRep)
      return false
    val segs = path.split("/", -1)
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    var nonEmpty = 0
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      if (s.nonEmpty) {
        nonEmpty += 1
        val c = counts.getOrElse(s, 0) + 1
        counts(s) = c
        if (c > maxRep) return true
      }
      i += 1
    }
    if (nonEmpty >= 10) {
      var atThreshold = 0
      counts.valuesIterator.foreach { c =>
        if (c >= maxRep) {
          atThreshold += 1
          if (atThreshold >= threshold) return true
        }
      }
    }
    val q = if (query.startsWith("?")) query.substring(1) else query
    if (q.nonEmpty) {
      val pc = scala.collection.mutable.HashMap.empty[String, Int]
      q.split("&", -1).foreach { p =>
        if (p.nonEmpty) {
          val c = pc.getOrElse(p, 0) + 1
          pc(p) = c
          if (c > maxRep) return true
        }
      }
    }
    false
  }

  // ---------- hashes / SURT ----------

  /** FNV-1a 64-bit, byte-identical to Go's hash/fnv New64a — the seen-set
    * key. Reference: /root/reference/internal/pkg/preprocessor/seencheck/seencheck.go:76-89.
    */
  def fnv64a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SURT-style host reversal: www.google.com → com.google.www.
    * Splits host:port first (including [::1]:443), lowercases, trims a
    * trailing dot, leaves IP literals (v4/v6) unchanged, reverses labels,
    * then re-appends the port.
    * Reference: /root/reference/internal/pkg/postprocessor/domainscrawl/reversehost.go:11-55.
    */
  def reverseHost(hostport: String): String = {
    val (host, port) = splitHostPort(hostport)
    val trimmed = {
      val lc = host.toLowerCase
      if (lc.endsWith(".")) lc.dropRight(1) else lc
    }
    if (isIpLiteral(trimmed)) {
      // keep original host casing/brackets, re-join the port
      if (port.isEmpty) host
      else if (host.indexOf(':') >= 0) s"[$host]:$port"
      else s"$host:$port"
    } else {
      val rev = trimmed.split('.').reverseIterator.mkString(".")
      if (port.isEmpty) rev else s"$rev:$port"
    }
  }

  /** net.SplitHostPort-style split; on "error" (no port / bare IPv6 /
    * malformed brackets) the whole input is the host.
    */
  private def splitHostPort(s: String): (String, String) = {
    if (s.startsWith("[")) {
      val close = s.indexOf(']')
      if (close > 0 && close + 1 < s.length && s.charAt(close + 1) == ':')
        (s.substring(1, close), s.substring(close + 2))
      else (s, "")
    } else {
      val first = s.indexOf(':')
      if (first < 0 || s.indexOf(':', first + 1) >= 0) (s, "") // zero or 2+ colons
      else (s.substring(0, first), s.substring(first + 1))
    }
  }

  private def isIpLiteral(host: String): Boolean = {
    if (host.indexOf(':') >= 0) {
      // IPv6-shaped: hex/colon/dot chars only AND ("::" present or the
      // full 8-group form) — a host like a:b:c.example.com is NOT an IP
      // (net.ParseIP rejects it) and must go through label reversal
      val hexy = host.forall(c =>
        c.isDigit || (c >= 'a' && c <= 'f') || c == ':' || c == '.')
      return hexy && (host.contains("::") || host.count(_ == ':') == 7)
    }
    val parts = host.split('.')
    parts.length == 4 && parts.forall { p =>
      p.nonEmpty && p.length <= 3 && p.forall(_.isDigit) && p.toInt <= 255
    }
  }

  /** Protocol filter for extracted links (post-extraction drop).
    * Reference: /root/reference/internal/pkg/postprocessor/utils.go:9-30.
    */
  private val badProtos =
    Array("data:", "file:", "javascript:", "mailto:", "sms:", "tel:", "vbscript:", "about:")
  def hasBadProtocol(link: String): Boolean = {
    val l = link.trim.toLowerCase
    badProtos.exists(l.startsWith)
  }
}
