package graft.extract

import java.util.zip.Inflater

/** E12: PDF outlink extraction — the /URI strings of Link annotations.
  *
  * Reference: /root/reference/internal/pkg/postprocessor/extractor/pdf.go:26-50
  * (pdfcpu Annotations → AnnLink → LinkAnnotation.URI), goldens at
  * pdf_test.go:22-53 (19 outlinks from the developer-portal fixture;
  * corrupt file must error with 0 outlinks).
  *
  * Pure-JVM minimal reader: modern PDFs keep annotation dictionaries in
  * FlateDecode'd object streams, so every stream segment is inflated
  * (java.util.zip — no external deps) and scanned, together with the raw
  * object space, for `/URI (literal)` / `/URI <hex>` entries with PDF
  * string escape + balanced-paren rules. Corruption = missing %%EOF
  * trailer or startxref (the spec-required tail), mirroring pdfcpu's
  * parse failure on the truncated fixture.
  */
object Pdf {

  def isPdf(contentType: String): Boolean =
    contentType != null && contentType.toLowerCase.contains("application/pdf")

  /** Left(error) for non-PDF/corrupt input; Right(uris) otherwise
    * (duplicates kept — one entry per annotation, like the reference).
    */
  def outlinks(bytes: Array[Byte]): Either[String, Seq[String]] = {
    if (bytes == null || bytes.length < 16) return Left("not a pdf: too short")
    if (!startsWith(bytes, "%PDF-")) return Left("not a pdf: missing header")
    val tail = segment(bytes, math.max(0, bytes.length - 2048), bytes.length)
    if (!tail.contains("%%EOF") || !tail.contains("startxref"))
      return Left("corrupt pdf: missing xref trailer")
    val raw = segment(bytes, 0, bytes.length)
    val texts = raw +: inflatedStreams(bytes, raw)
    Right(texts.flatMap(scanUris))
  }

  private val ISO = java.nio.charset.StandardCharsets.ISO_8859_1
  private def segment(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, ISO)
  private def startsWith(b: Array[Byte], p: String): Boolean =
    b.length >= p.length && p.indices.forall(i => b(i) == p.charAt(i))

  /** Inflate every `stream…endstream` segment that is FlateDecode-able
    * (object streams, xref streams, content). Non-deflate streams are
    * skipped silently.
    */
  private def inflatedStreams(bytes: Array[Byte], raw: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var i = raw.indexOf("stream")
    while (i >= 0) {
      // skip the "stream" inside "endstream"
      if (i >= 3 && raw.regionMatches(i - 3, "endstream", 0, 9)) {
        i = raw.indexOf("stream", i + 6)
      } else {
      var start = i + "stream".length
      if (start < raw.length && raw.charAt(start) == '\r') start += 1
      if (start < raw.length && raw.charAt(start) == '\n') start += 1
      val end = raw.indexOf("endstream", start)
      if (end > start) {
        val inf = new Inflater()
        inf.setInput(bytes, start, end - start)
        val buf = new Array[Byte](8192)
        val acc = new java.io.ByteArrayOutputStream()
        try {
          var n = inf.inflate(buf)
          while (n > 0) {
            acc.write(buf, 0, n)
            n = if (inf.finished()) 0 else inf.inflate(buf)
          }
          if (acc.size() > 0) out += acc.toString("ISO-8859-1")
        } catch { case _: Exception => () } // not deflate — skip
        finally inf.end()
        i = raw.indexOf("stream", end + "endstream".length)
      } else i = -1
      }
    }
    out.result()
  }

  /** All `/URI (...)` / `/URI <hex>` values in a decoded object space. */
  private[extract] def scanUris(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var i = s.indexOf("/URI")
    while (i >= 0) {
      var j = i + 4
      // must be a complete name token: next char is a delimiter
      val boundary = j >= s.length || " \t\r\n(</[".contains(s.charAt(j))
      while (j < s.length && " \t\r\n".contains(s.charAt(j))) j += 1
      if (boundary && j < s.length && s.charAt(j) == '(') {
        parseLiteral(s, j) match {
          case Some((v, _)) if v.nonEmpty => out += v
          case _ => ()
        }
      } else if (boundary && j < s.length && s.charAt(j) == '<' &&
        (j + 1 >= s.length || s.charAt(j + 1) != '<')) {
        val close = s.indexOf('>', j)
        if (close > j) {
          val hex = s.substring(j + 1, close).filterNot(_.isWhitespace)
          val v = hex.grouped(2).filter(_.length == 2)
            .map(h => Integer.parseInt(h, 16).toChar).mkString
          if (v.nonEmpty) out += v
        }
      }
      i = s.indexOf("/URI", i + 4)
    }
    out.result()
  }

  /** PDF literal string at s(open)=='(': balanced parens + escapes
    * (\n \r \t \b \f \( \) \\ \ooo, line continuations). Returns
    * (value, indexAfterClose).
    */
  private def parseLiteral(s: String, open: Int): Option[(String, Int)] = {
    val sb = new StringBuilder
    var depth = 1
    var i = open + 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'b' => sb += '\b'; i += 2
          case 'f' => sb += '\f'; i += 2
          case '(' | ')' | '\\' => sb += e; i += 2
          case '\r' => i += (if (i + 2 < s.length && s.charAt(i + 2) == '\n') 3 else 2)
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var oct = 0
            var k = i + 1
            while (k < s.length && k < i + 4 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
              oct = oct * 8 + (s.charAt(k) - '0')
              k += 1
            }
            sb += oct.toChar
            i = k
          case other => sb += other; i += 2
        }
      } else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        if (depth > 0) sb += c
        i += 1
      }
    }
    if (depth == 0) Some((sb.toString, i)) else None
  }
}
