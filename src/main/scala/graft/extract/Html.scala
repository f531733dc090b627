package graft.extract

import scala.collection.mutable.ArrayBuffer
import graft.conf.ZenoConf
import HtmlScanner.Tag

/** HTML outlink + asset extraction over the tolerant tag scanner.
  *
  * Reference: /root/reference/internal/pkg/postprocessor/extractor/html.go:35-421
  * (tag/attr families), base.go:18-53 (base tag), resolve.go:13-37
  * (relative resolution against base-or-self).
  */
object Html {

  final case class HtmlOut(outlinks: Seq[String], assets: Seq[String], atImports: Seq[String])

  private val aOutlinkAttrs = List("href", "data-href", "data-url", "data-link",
    "data-redirect-url", "ping", "onclick", "ondblclick", "router-link", "to")
  private val validAssetPath = List("static/", "assets/", "asset/", "images/", "image/", "img/")
  private val validAssetAttrs = List("href", "data-href", "data-src", "data-srcset",
    "data-lazy-src", "src", "srcset")

  /** First valid <base href>, resolved against the page URL (base.go:18-53). */
  def baseOf(tags: IndexedSeq[Tag], pageUrl: String): Option[String] = {
    tags.find(_.name == "base").flatMap(_.attr("href")).flatMap { raw =>
      val trimmed = raw.dropWhile(c => "\t\n\f\r ".contains(c))
        .reverse.dropWhile(c => "\t\n\f\r ".contains(c)).reverse
      if (trimmed.isEmpty) None
      else {
        val lower = trimmed.toLowerCase
        if (lower.startsWith("data:") || lower.startsWith("javascript:") || lower.startsWith("vbscript:"))
          None
        else Resolve(trimmed, pageUrl)
      }
    }
  }

  /** Resolve an extracted raw link against base-or-self; on failure keep
    * raw unless it equals base/self (html.go:105-127).
    */
  private def resolveOrKeep(raw: String, pageUrl: String, base: Option[String],
                            out: ArrayBuffer[String]): Unit = {
    Resolve(raw, base.getOrElse(pageUrl)) match {
      case Some(abs) if abs.nonEmpty => out += abs
      case _ =>
        if (base.contains(raw) || raw == pageUrl) () // discard
        else out += raw
    }
  }

  def outlinks(tags: IndexedSeq[Tag], pageUrl: String, conf: ZenoConf): Seq[String] = {
    val raw = ArrayBuffer.empty[String]
    val base = baseOf(tags, pageUrl)
    tags.foreach { t =>
      t.name match {
        case "a" =>
          aOutlinkAttrs.foreach { key =>
            t.attr(key).filter(_.nonEmpty).foreach { v =>
              if (key == "onclick" || key == "ondblclick")
                Util.OnclickRegex.findFirstMatchIn(v).foreach(raw += _.group(1))
              else raw += v
            }
          }
        case "iframe" => t.attr("src").filter(_.nonEmpty).foreach(raw += _)
        case "area" => t.attr("href").filter(_.nonEmpty).foreach(raw += _)
        case _ => ()
      }
    }
    val out = ArrayBuffer.empty[String]
    raw.foreach(resolveOrKeep(_, pageUrl, base, out))
    out.toSeq
  }

  def assets(tags: IndexedSeq[Tag], pageUrl: String, conf: ZenoConf): (Seq[String], Seq[String]) = {
    val raw = ArrayBuffer.empty[String]
    val atImports = ArrayBuffer.empty[String]
    val base = baseOf(tags, pageUrl)

    // 1. [data-item], [style], [data-preview] on any element (html.go:150-178)
    tags.foreach { t =>
      t.attr("data-item").foreach { di =>
        Json.urls(di).foreach(raw ++= _)
      }
      t.attr("style").foreach { st =>
        val (links, _) = Css.extract(st, inline = true)
        raw ++= links
      }
      t.attr("data-preview").foreach { dp =>
        if (dp.startsWith("http")) raw += dp
      }
    }
    // 2. <a> asset-ish attributes filtered by path heuristic (html.go:181-211)
    tags.foreach { t =>
      if (t.name == "a") {
        validAssetAttrs.foreach { attr =>
          t.attr(attr).foreach { link =>
            if (validAssetPath.exists(link.contains)) raw += link
          }
        }
      }
    }
    // 3. <img> (html.go:214-233)
    tags.foreach { t =>
      if (t.name == "img") {
        List("src", "data-src", "data-lazy-src").foreach(a => t.attr(a).foreach(raw += _))
        List("srcset", "data-srcset").foreach(a =>
          t.attr(a).foreach(v => raw ++= Util.splitSrcset(v)))
      }
    }
    // 4. video/audio/embed[src] (html.go:236-253)
    tags.foreach { t =>
      if ((t.name == "video" || t.name == "audio" || t.name == "embed") && t.attr("src").isDefined)
        raw += t.attr("src").get
    }
    // 5. <style> bodies (html.go:256-274)
    tags.foreach { t =>
      if (t.name == "style") {
        val (links, ai) = Css.extract(t.text, inline = false)
        atImports ++= ai
        links.foreach { link0 =>
          var link = link0
          if (!link.contains("http")) link = link.replace("//", "http://")
          if (!link.startsWith("#wp-")) raw += link
        }
      }
    }
    // 6. <script> (html.go:277-330)
    tags.foreach { t =>
      if (t.name == "script") {
        t.attr("src").foreach(raw += _)
        t.attr("type").foreach { st =>
          if (st.contains("json")) Json.urls(t.text).foreach(raw ++= _)
        }
        val scriptLinks =
          if (!conf.strictRegex) Util.dedupe(Util.quotedLinkFindAll(t.outer))
          else Util.dedupe(Util.LinkRegexStrict.findAllIn(t.outer).toSeq)
        scriptLinks.foreach { sl =>
          if (sl.startsWith("http")) Script.unquote(sl).foreach(raw += _)
        }
        if (!t.text.startsWith("{"))
          raw ++= Script.extractFromScriptContent(t.text)
      }
    }
    // 7. <link href> (html.go:333-345) — rel=alternate skipped
    tags.foreach { t =>
      if (t.name == "link" && t.attr("href").isDefined) {
        if (t.attrOr("rel", "") != "alternate") raw += t.attr("href").get
      }
    }
    // 8. <meta href|content> (html.go:348-363, 423-435)
    tags.foreach { t =>
      if (t.name == "meta" && (t.attr("href").isDefined || t.attr("content").isDefined)) {
        t.attr("href").foreach(raw += _)
        t.attr("content").foreach { content =>
          extractUrlFromContent(content).foreach(raw += _)
        }
      }
    }
    // 9. <source> (html.go:366-382)
    tags.foreach { t =>
      if (t.name == "source") {
        t.attr("src").foreach(raw += _)
        List("srcset", "data-srcset").foreach(a =>
          t.attr(a).foreach(v => raw ++= Util.splitSrcset(v)))
      }
    }
    // 10. div[data-src|data-srcset] (html.go:385-397)
    tags.foreach { t =>
      if (t.name == "div") {
        t.attr("data-src").filter(_.nonEmpty).foreach(raw += _)
        t.attr("data-srcset").filter(_.nonEmpty).foreach(v => raw ++= Util.splitSrcset(v))
      }
    }
    // 11. replay-web-page[source] (html.go:400-407)
    tags.foreach { t =>
      if (t.name == "replay-web-page") t.attr("source").foreach(raw += _)
    }

    val out = ArrayBuffer.empty[String]
    raw.foreach(resolveOrKeep(_, pageUrl, base, out))
    val atOut = ArrayBuffer.empty[String]
    atImports.foreach(resolveOrKeep(_, pageUrl, base, atOut))
    (out.toSeq, atOut.toSeq)
  }

  /** meta content="0; url=https://..." or a strict-regex match
    * (html.go:423-435).
    */
  def extractUrlFromContent(content: String): Option[String] = {
    Util.ContentUrlRegex.findFirstMatchIn(content) match {
      case Some(m) => Some(m.group(1).replaceAll("^['\"]+|['\"]+$", ""))
      case None =>
        if (Util.LinkRegexStrict.findFirstIn(content).isDefined) Some(content) else None
    }
  }
}
