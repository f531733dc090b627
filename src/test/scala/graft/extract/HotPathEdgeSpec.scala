package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.canon.Canon
import graft.conf.ZenoConf

/** Round-6 optimization pins: the TextLinks loose scan was rewritten to
  * be indexOf("://")-driven and Canon gained identity fast paths —
  * these cases exercise exactly the new branch boundaries that the
  * reference-fixture goldens don't isolate.
  */
class HotPathEdgeSpec extends AnyFunSuite {

  // ---- TextLinks: indexOf-driven loose scan ----

  test("loose scan: token with several :// occurrences is processed once") {
    // the scan must skip to the TOKEN end after a hit, not to the next
    // "://", or the same token's links would be extracted twice
    val links = TextLinks.extract("pre http://a.com/x?u=https://b.com/y post")
    assert(links == Seq("http://a.com/x?u=https://b.com/y"))
  }

  test("loose scan: :// at body start and end, token boundary expansion") {
    assert(TextLinks.extract("http://start.com/a middle http://end.com/b") ==
      Seq("http://start.com/a", "http://end.com/b"))
    // "://x" alone: token shorter than the min length gate -> dropped
    assert(TextLinks.extract("x ://y z").isEmpty)
  }

  test("loose scan: min-length gate measures the whole token") {
    // token length >= len("http://a.b") exactly at the boundary
    assert(TextLinks.extract("http://a.b") == Seq("http://a.b"))
    assert(TextLinks.extract("s://a.b").isEmpty) // 7 chars < 10
  }

  test("loose scan: consecutive link tokens with no separator prose") {
    assert(TextLinks.extract("http://a.com/1\nhttp://a.com/2\thttp://a.com/3") ==
      Seq("http://a.com/1", "http://a.com/2", "http://a.com/3"))
  }

  // ---- Canon fast paths: the fast branch and the slow branch must agree ----

  test("stripWhatwg path: clean, padded and tab-ridden inputs") {
    def canon(s: String) = Canon.canonicalize(s, None, ZenoConf())
    assert(canon("http://ex.com/a") == canon("  http://ex.com/a  "))
    assert(canon("http://ex.com/a") == canon("http://ex\t.com/\na"))
  }

  test("percentDecode: fast path vs decode vs non-ASCII") {
    assert(Canon.percentDecode("plain", plusIsSpace = true) == "plain")
    assert(Canon.percentDecode("a%2Fb", plusIsSpace = false) == "a/b")
    assert(Canon.percentDecode("a+b", plusIsSpace = true) == "a b")
    assert(Canon.percentDecode("a+b", plusIsSpace = false) == "a+b")
    assert(Canon.percentDecode("caf\u00e9%20x", plusIsSpace = false) == "caf\u00e9 x")
    // truncated / non-hex escapes pass through unchanged
    assert(Canon.percentDecode("100%", plusIsSpace = false) == "100%")
    assert(Canon.percentDecode("%zz", plusIsSpace = false) == "%zz")
  }

  test("encodePath: identity fast path and escaping branch agree on mixed input") {
    assert(Canon.encodePath("/plain/path.html") == "/plain/path.html")
    assert(Canon.encodePath("/a b") == "/a%20b")
    assert(Canon.encodePath("/a\"b{c}") == "/a%22b%7Bc%7D")
    assert(Canon.encodePath("/caf\u00e9") == "/caf%C3%A9")
  }

  test("queryEscape: identity fast path and escaping branch") {
    assert(Canon.queryEscape("abc-_.~123") == "abc-_.~123")
    assert(Canon.queryEscape("a b&c") == "a+b%26c")
  }

  test("removeDotSegments: fast path keeps //, trailing slash; slow path folds dots") {
    assert(Canon.removeDotSegments("/a//b/") == "/a//b/")
    assert(Canon.removeDotSegments("/file.html") == "/file.html")
    assert(Canon.removeDotSegments("/a/./b/../c") == "/a/c")
    assert(Canon.removeDotSegments("/a/%2E%2E/b") == "/b")
  }

  test("hasPathLoop: pre-check boundary — exactly maxRep+1 repeats still trips") {
    val conf = ZenoConf() // maxRep default 3
    assert(Canon.hasPathLoop("/a/a/a/a", "", conf)) // 4 repeats > 3
    assert(!Canon.hasPathLoop("/a/a/a", "", conf)) // 3 repeats == maxRep -> ok
    // query-side trigger with a SHORT path (path pre-check alone must not
    // short-circuit the query check)
    assert(Canon.hasPathLoop("/p", "x=1&x=1&x=1&x=1", conf))
    assert(!Canon.hasPathLoop("/p", "x=1&x=1&x=1", conf))
  }

  test("scheme detection: hand-rolled prefix matcher mirrors the regex") {
    def canonOk(s: String) = Canon.canonicalize(s, None, ZenoConf()).isRight
    assert(canonOk("http://ex.com/"))
    assert(canonOk("ex.com")) // scheme default applies
    assert(!canonOk("mailto:a@b.com")) // opaque scheme -> rejected
    assert(!canonOk("1http://ex.com")) // digit first: not a scheme, host "1http" has no dot... default applies
  }
}
