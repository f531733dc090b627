package graft.extract

import java.nio.charset.{Charset, StandardCharsets}
import graft.canon.Canon

/** Charset detection + non-UTF-8 query re-encoding (E6).
  *
  * Mirrors the reference's use of golang.org/x/net/html/charset:
  * precedence BOM → Content-Type charset param → <meta> prescan of the
  * first 1024 bytes → windows-1252 default
  * (/root/reference/internal/pkg/postprocessor/extractor/html_document.go:25-57),
  * and encodeNonUTF8QueryURLs (html_document.go:95-147): query keys/values
  * of URLs extracted from a non-UTF-8 document are re-encoded in the
  * document's charset (sorted-key url.Values.Encode semantics).
  */
object Charsets {

  private val metaCharsetRe =
    """(?i)<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-.:]+)""".r
  private val ctCharsetRe = """(?i)charset\s*=\s*["']?\s*([a-zA-Z0-9_\-.:]+)""".r

  /** WHATWG alias quirks that differ from java.nio defaults. */
  private val aliases = Map(
    "iso-8859-1" -> "windows-1252", // WHATWG maps latin1 → windows-1252
    "us-ascii" -> "windows-1252",
    "latin1" -> "windows-1252",
    "gb2312" -> "GBK",
    "x-sjis" -> "Shift_JIS")

  def resolve(name: String): Option[Charset] = {
    val n = name.trim.toLowerCase
    val mapped = aliases.getOrElse(n, n)
    try Some(Charset.forName(mapped)) catch { case _: Exception => None }
  }

  /** Detect (charsetName, certain). */
  def detect(preview: Array[Byte], contentType: String): (String, Boolean) = {
    if (preview == null) return ("windows-1252", false)
    // BOM
    if (preview.length >= 3 && preview(0) == 0xef.toByte && preview(1) == 0xbb.toByte &&
        preview(2) == 0xbf.toByte) return ("utf-8", true)
    if (preview.length >= 2 && preview(0) == 0xfe.toByte && preview(1) == 0xff.toByte)
      return ("utf-16be", true)
    if (preview.length >= 2 && preview(0) == 0xff.toByte && preview(1) == 0xfe.toByte)
      return ("utf-16le", true)
    // Content-Type param
    if (contentType != null) {
      ctCharsetRe.findFirstMatchIn(contentType).foreach { m =>
        if (resolve(m.group(1)).isDefined) return (m.group(1).toLowerCase, true)
      }
    }
    // meta prescan over the first 1024 bytes (ASCII-compatible scan)
    val head = new String(preview, 0, math.min(1024, preview.length),
      StandardCharsets.ISO_8859_1)
    metaCharsetRe.findFirstMatchIn(head).foreach { m =>
      if (resolve(m.group(1)).isDefined) return (m.group(1).toLowerCase, false)
    }
    ("windows-1252", false)
  }

  def isUtf8Name(name: String): Boolean = {
    val n = name.toLowerCase
    n == "utf-8" || n == "utf8"
  }

  /** Decode a body per detection; (text, charsetName). */
  def decodeBody(bytes: Array[Byte], contentType: String): (String, String) = {
    if (bytes == null) return ("", "utf-8")
    val (name, _) = detect(bytes.take(1024), contentType)
    val cs = resolve(name).getOrElse(StandardCharsets.UTF_8)
    (new String(bytes, cs), name)
  }

  /** Percent-decode at BYTE level ('+' → space) — needed because an
    * already-charset-encoded query decodes to non-UTF-8 bytes that must
    * round-trip untouched (Go keeps invalid-UTF-8 keys/values verbatim:
    * html_document.go:117-131).
    */
  private def decodeToBytes(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else if (c == '+') { out.write(' '); i += 1 }
      else {
        val bs = c.toString.getBytes(StandardCharsets.UTF_8)
        out.write(bs, 0, bs.length); i += 1
      }
    }
    out.toByteArray
  }
  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def isValidUtf8(bytes: Array[Byte]): Boolean = {
    val dec = StandardCharsets.UTF_8.newDecoder()
    try { dec.decode(java.nio.ByteBuffer.wrap(bytes)); true }
    catch { case _: Exception => false }
  }

  private def queryEscapeBytes(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length)
    bytes.foreach { b =>
      val c = (b & 0xff).toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
          c == '-' || c == '_' || c == '.' || c == '~') sb.append(c)
      else if (c == ' ') sb.append('+')
      else sb.append('%').append(f"${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Go url.Values.Encode over pairs: keys sorted, QueryEscape of the
    * charset-encoded bytes; invalid-UTF-8 components pass through verbatim.
    */
  def encodeQueryInCharset(query: String, cs: Charset): String = {
    val pairs = query.split("&").filter(_.nonEmpty).map { p =>
      val eq = p.indexOf('=')
      val (k, v) = if (eq >= 0) (p.substring(0, eq), p.substring(eq + 1)) else (p, "")
      (decodeToBytes(k), decodeToBytes(v))
    }
    def enc(bytes: Array[Byte]): Array[Byte] = {
      if (!isValidUtf8(bytes)) bytes // may already be charset-encoded
      else {
        val s = new String(bytes, StandardCharsets.UTF_8)
        val encoder = cs.newEncoder() // REPORT on unmappable, like Go's encoder.String
        try {
          val bb = encoder.encode(java.nio.CharBuffer.wrap(s))
          val arr = new Array[Byte](bb.remaining())
          bb.get(arr)
          arr
        } catch { case _: Exception => bytes } // keep original on failure
      }
    }
    pairs.map { case (k, v) => (enc(k), enc(v)) }
      .sortBy { case (k, _) => new String(k, StandardCharsets.ISO_8859_1) }
      .map { case (k, v) => queryEscapeBytes(k) + "=" + queryEscapeBytes(v) }
      .mkString("&")
  }

  /** encodeNonUTF8QueryURLs: rewrite the query of each URL in the source
    * charset; URLs without a query pass through.
    */
  def encodeNonUtf8QueryUrls(urls: Seq[String], charsetName: String): Seq[String] = {
    if (isUtf8Name(charsetName)) return urls
    resolve(charsetName) match {
      case None => urls
      case Some(cs) =>
        urls.map { u =>
          val q = u.indexOf('?')
          if (q < 0 || q == u.length - 1) u
          else u.substring(0, q + 1) + encodeQueryInCharset(u.substring(q + 1), cs)
        }
    }
  }
}
