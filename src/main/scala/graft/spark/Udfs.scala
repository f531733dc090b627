package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import graft.canon.{Canon, Filters, DomainsMatcher}
import graft.conf.ZenoConf
import graft.extract.{Extract, PageInput}

/** Catalyst-friendly UDF surface. All functions are pure, null-safe and
  * deterministic (asNondeterministic is never needed), so Catalyst can
  * push filters around them and cache results.
  *
  * The canonicalizer/extractors themselves live in graft.canon /
  * graft.extract with zero Spark deps — these wrappers only adapt them to
  * Column-land.
  */
final case class CanonResult(href: String, host: String, reject: String)
final case class ExtractedLink(link: String, kind: String)
final case class RequestHeader(header_name: String, header_value: String)

object Udfs {

  /** fnv64a over the canonical URL — the seen-set key (must match Go
    * hash/fnv: seencheck.go:76-89). Native Catalyst expression with
    * codegen (graft.spark.Fnv64a), not a UDF — stays inside whole-stage
    * codegen and hashes UTF8String bytes without allocation.
    */
  def fnv64(c: Column): Column = Fnv64a(c)

  /** Full normalization F1+F2+F3: returns (href, host, reject) where
    * exactly one of href/reject is set.
    */
  def canonicalizer(conf: ZenoConf) =
    udf((raw: String, parent: String) =>
      Canon.canonicalize(raw, Option(parent), conf) match {
        case Right(c) => CanonResult(c.href, c.host, null)
        case Left(r) => CanonResult(null, null, r.code)
      })

  /** F10 request build: first-matching preprocessor name + final header
    * list (preprocessor.go:303-318; sitespecific.go:27-33).
    */
  val reqPreproc = udf((u: String) => graft.extract.RequestBuild.preprocessorFor(u))
  val reqHeaders = udf((u: String) =>
    graft.extract.RequestBuild.headersFor(u).map { case (k, v) => RequestHeader(k, v) })

  /** E18 facebook post detection / embed-URL synthesis (facebook.go:11-22). */
  val fbIsPost = udf((u: String) => graft.extract.SiteSpecific.Facebook.isPostUrl(u))
  val fbEmbed = udf((u: String) => graft.extract.SiteSpecific.Facebook.embedUrl(u))

  /** Include/exclude filter (F4/F5): true = keep. Native codegen
    * expression (graft.spark.FilterTest) — the former scalar UDF paid a
    * UTF8String→String conversion per argument per candidate row for
    * what is a byte-level contains scan (regex exclusions, when
    * configured, still run on the decoded string — identical results;
    * parity pinned in WaveExprsSpec against Filters.test).
    */
  def filterTest(conf: ZenoConf): (Column, Column) => Column =
    (href, host) => org.apache.spark.sql.zenospark.Bridge.column(
      FilterTest(
        org.apache.spark.sql.zenospark.Bridge.expression(href),
        org.apache.spark.sql.zenospark.Bridge.expression(host),
        conf.includeHosts, conf.includeStrings,
        conf.excludeHosts ++ conf.defaultExcludedHosts, conf.excludeStrings,
        conf.exclusionRegexes))

  /** Domains-crawl match (J6): hop reset on match. With no configured
    * patterns the matcher is constant-false (DomainsMatcher.matches
    * returns false for every input), so the common no-domains-crawl case
    * short-circuits to a foldable literal and the per-candidate UDF
    * disappears from the plan entirely.
    */
  def domainsMatch(conf: ZenoConf): (Column, Column) => Column = {
    if (conf.domainsCrawl.isEmpty)
      (_, _) => org.apache.spark.sql.functions.lit(false)
    else {
      val m = new DomainsMatcher(conf.domainsCrawl)
      val u = udf((href: String, host: String) =>
        href != null && host != null && m.matches(href, host))
      (href, host) => u(href, host)
    }
  }

  /** Extractor dispatch (E1-E17). kind ∈ outlink | asset | atimport.
    * doAssets/doOutlinks mirror the reference's pre-extraction gates
    * (postprocessor/item.go:72-89, outlinks.go:151-163) — they skip the
    * work entirely, not just the results.
    */
  def extractor(conf: ZenoConf) =
    udf((url: String, html: Array[Byte], text: String, contentType: String,
         server: String, linkHeader: String, doAssets: Boolean, doOutlinks: Boolean) => {
      if (url == null || (!doAssets && !doOutlinks)) Seq.empty[ExtractedLink]
      else {
        val c = conf.copy(disableAssetsCapture = conf.disableAssetsCapture || !doAssets)
        val r = Extract.page(PageInput(url,
          Option(contentType).getOrElse(""), Option(server).getOrElse(""),
          Option(linkHeader).getOrElse(""), Option(text).getOrElse(""),
          bodyBytes = html), c)
        val out = scala.collection.mutable.ArrayBuffer.empty[ExtractedLink]
        if (doOutlinks) r.outlinks.foreach(l => out += ExtractedLink(l, "outlink"))
        if (doAssets) {
          r.assets.foreach(l => out += ExtractedLink(l, "asset"))
          r.atImports.foreach(l => out += ExtractedLink(l, "atimport"))
        }
        out.toSeq
      }
    })

  /** Robots check: longest-prefix rule match, allow-all default (the
    * reference crawls without robots — J7 in SURVEY.md §2.3).
    * Native codegen expression (graft.spark.RobotsAllow): single-pass
    * longest-prefix scan over byte prefixes, allow beats disallow on
    * equal length — the former scalar UDF converted host+path to
    * Strings per candidate row. Rules ride the codegen references array
    * (small by construction).
    */
  def robotsAllow(rules: Map[String, Seq[(String, Boolean)]]): (Column, Column) => Column =
    (host, path) => org.apache.spark.sql.zenospark.Bridge.column(
      RobotsAllow(
        org.apache.spark.sql.zenospark.Bridge.expression(host),
        org.apache.spark.sql.zenospark.Bridge.expression(path), rules))

  /** Path of a canonical URL (F6 false-positive-asset check + the robots
    * argument). Native codegen byte scan (graft.spark.PathOf) — was a
    * scalar UDF doing indexOf/substring on a decoded String per
    * candidate row. null href → "" (the UDF's contract), identical
    * slicing (ASCII delimiters never split UTF-8 sequences).
    */
  def pathOf(href: Column): Column = PathOf.col(href)
}
