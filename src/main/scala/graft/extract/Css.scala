package graft.extract

import scala.collection.mutable.ArrayBuffer

/** CSS link extractor: url() tokens, strings inside url(), and @import
  * targets with the reference's placement-validity state machine.
  *
  * Reference: /root/reference/internal/pkg/postprocessor/extractor/css.go:16-185
  * (token loop + atRuleStateManager) and css_embedded.go:10-102 (inline
  * mode disables @import).
  */
object Css {

  sealed trait Tok
  final case class TFunction(name: String) extends Tok
  final case class TAtKeyword(name: String) extends Tok
  final case class TString(value: String) extends Tok
  final case class TUrl(value: String) extends Tok
  case object TSemicolon extends Tok
  case object TLeftBrace extends Tok
  case object TRightParen extends Tok
  case object TOther extends Tok

  /** Tokenize enough of CSS syntax for link extraction. */
  def tokenize(css: String): Iterator[Tok] = new Iterator[Tok] {
    private var i = 0
    private val n = css.length
    private var nextTok: Tok = _
    advance()

    private def isIdentStart(c: Char) = c.isLetter || c == '_' || c == '-' || c == '\\' || c >= 128
    private def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '-' || c >= 128

    /** Consume a backslash escape at position i (pointing at '\\'):
      * hex escape (≤6 digits + optional single whitespace) or literal char.
      */
    private def readEscape(sb: StringBuilder): Unit = {
      i += 1 // skip backslash
      if (i >= n) return // EOF after backslash: drop
      val e = css.charAt(i)
      if (isHex(e)) {
        var hex = 0
        var cnt = 0
        while (i < n && cnt < 6 && isHex(css.charAt(i))) {
          hex = hex * 16 + Integer.parseInt(css.charAt(i).toString, 16); i += 1; cnt += 1
        }
        if (i < n && css.charAt(i).isWhitespace) i += 1
        sb.appendAll(Character.toChars(hex))
      } else if (e == '\n') { i += 1 }
      else { sb.append(e); i += 1 }
    }

    private def readIdent(): String = {
      val sb = new StringBuilder
      var more = true
      while (more && i < n) {
        val c = css.charAt(i)
        if (c == '\\') readEscape(sb)
        else if (isIdentChar(c)) { sb.append(c); i += 1 }
        else more = false
      }
      sb.toString
    }

    /** Unquoted url(...) body: raw chars + escapes, until an unescaped ')'. */
    private def readUnquotedUrl(): String = {
      // trim raw leading whitespace
      while (i < n && css.charAt(i).isWhitespace) i += 1
      val sb = new StringBuilder
      var open = true
      var trailingWs = 0
      while (open && i < n) {
        val c = css.charAt(i)
        if (c == ')') { open = false; i += 1 }
        else if (c == '\\') { readEscape(sb); trailingWs = 0 }
        else {
          if (c.isWhitespace) trailingWs += 1 else trailingWs = 0
          sb.append(c); i += 1
        }
      }
      sb.toString.substring(0, sb.length - trailingWs)
    }

    private def readString(quote: Char): String = {
      val sb = new StringBuilder
      while (i < n && css.charAt(i) != quote) {
        val c = css.charAt(i)
        if (c == '\\') {
          readEscape(sb)
        } else if (c == '\n') {
          // unterminated string: bail
          return sb.toString
        } else { sb.append(c); i += 1 }
      }
      if (i < n) i += 1 // closing quote
      sb.toString
    }
    private def isHex(c: Char) =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

    private def advance(): Unit = {
      nextTok = null
      while (nextTok == null && i < n) {
        val c = css.charAt(i)
        if (c.isWhitespace) i += 1
        else if (c == '/' && i + 1 < n && css.charAt(i + 1) == '*') {
          val end = css.indexOf("*/", i + 2)
          i = if (end < 0) n else end + 2
        } else if (c == '"' || c == '\'') {
          i += 1
          nextTok = TString(readString(c))
        } else if (c == '@' && i + 1 < n && isIdentStart(css.charAt(i + 1))) {
          var j = i + 1
          while (j < n && isIdentChar(css.charAt(j))) j += 1
          nextTok = TAtKeyword(css.substring(i + 1, j).toLowerCase)
          i = j
        } else if (isIdentStart(c)) {
          val ident = readIdent()
          if (i < n && css.charAt(i) == '(') {
            i += 1 // consume '('
            if (ident.equalsIgnoreCase("url")) {
              // url( ... ) — either a string arg (handled as Function+String)
              // or an unquoted url-token
              var k = i
              while (k < n && css.charAt(k).isWhitespace) k += 1
              if (k < n && (css.charAt(k) == '"' || css.charAt(k) == '\'')) {
                nextTok = TFunction("url")
              } else {
                nextTok = TUrl(readUnquotedUrl())
              }
            } else {
              nextTok = TFunction(ident.toLowerCase)
            }
          } else {
            nextTok = TOther
          }
        } else {
          c match {
            case ';' => nextTok = TSemicolon
            case '{' => nextTok = TLeftBrace
            case ')' => nextTok = TRightParen
            case _   => nextTok = TOther
          }
          i += 1
        }
      }
    }

    def hasNext: Boolean = nextTok != null
    def next(): Tok = { val t = nextTok; advance(); t }
  }

  /** Extract (links, atImportLinks) with the reference's @import placement
    * rules: @import only collected while still in the "OK area" (before any
    * block-bearing at-rule); inline CSS disables @import entirely.
    */
  def extract(css: String, inline: Boolean): (Seq[String], Seq[String]) = {
    val links = ArrayBuffer.empty[String]
    val atImports = ArrayBuffer.empty[String]
    // atRuleStateManager (css.go:17-76)
    var inOKArea = !inline
    var inAt = false
    var inValidAtImport = false
    def done(): Unit = { inOKArea = false; inAt = false; inValidAtImport = false }
    // parser flags (css.go:79-150)
    var inUrlFunction = false
    var inAtImportRule = false

    val it = tokenize(css)
    while (it.hasNext) {
      val tok = it.next()
      // feed state manager
      if (!inOKArea) done()
      else {
        tok match {
          case TAtKeyword(v) =>
            inAt = true
            v match {
              case "charset" | "layer" => if (inValidAtImport) done()
              case "import" => inValidAtImport = true
              case _ => ()
            }
          case TLeftBrace if inAt => inOKArea = false
          case _ => ()
        }
      }
      // process token
      tok match {
        case TFunction(name) => if (name == "url") inUrlFunction = true
        case TAtKeyword(name) => if (name == "import") inAtImportRule = true
        case TSemicolon => inAtImportRule = false
        case TRightParen => inUrlFunction = false
        case TString(v) =>
          if (inAtImportRule) { if (inValidAtImport) atImports += v }
          else if (inUrlFunction) links += v
        case TUrl(v) =>
          if (inAtImportRule) { if (inValidAtImport) atImports += v }
          else links += v
        case _ => ()
      }
    }
    (links.toSeq, atImports.toSeq)
  }
}
