package graft.canon

import graft.conf.ZenoConf
import scala.util.matching.Regex

/** Include/exclude filter engine (preprocessor stage F4/F5).
  *
  * Reference semantics:
  *  - include: host contains any include-host substring OR url contains any
  *    include-string, else dropped
  *    (/root/reference/internal/pkg/preprocessor/preprocessor.go:194-211)
  *  - exclude: host-substring OR url-substring OR regex match
  *    (/root/reference/internal/pkg/preprocessor/preprocessor.go:213-229,
  *     exclusion.go:9-17); archive.org/archive-it.org always excluded
  *    (/root/reference/internal/pkg/config/config.go:329).
  *
  * The filter is built once on the driver and broadcast; `test` is a pure
  * function usable inside a UDF.
  */
final class Filters(conf: ZenoConf) extends Serializable {
  private val includeHosts = conf.includeHosts.toArray
  private val includeStrings = conf.includeStrings.toArray
  private val excludeHosts = (conf.excludeHosts ++ conf.defaultExcludedHosts).toArray
  private val excludeStrings = conf.excludeStrings.toArray
  private val regexes: Array[Regex] = conf.exclusionRegexes.map(_.r).toArray

  private def containsAny(s: String, subs: Array[String]): Boolean = {
    var i = 0
    while (i < subs.length) {
      if (s.contains(subs(i))) return true
      i += 1
    }
    false
  }

  /** true = keep; false = excluded. Applied to the canonical href + host. */
  def test(href: String, host: String): Boolean = {
    if (includeHosts.nonEmpty || includeStrings.nonEmpty) {
      if (!containsAny(host, includeHosts) && !containsAny(href, includeStrings))
        return false
    }
    if (containsAny(host, excludeHosts)) return false
    if (containsAny(href, excludeStrings)) return false
    var i = 0
    while (i < regexes.length) {
      if (regexes(i).findFirstIn(href).isDefined) return false
      i += 1
    }
    true
  }
}

/** Domains-crawl matcher (J6): outlinks matching the configured domain
  * patterns have their hop count reset to 0 (treated as in-scope seeds).
  *
  * Pattern kinds, mirroring
  * /root/reference/internal/pkg/postprocessor/domainscrawl/domainscrawl.go:137-171:
  *  - naive domain ("example.com")  → exact host or subdomain match
  *    (the reference's reversed-host adaptive radix tree,
  *     reversehost.go:11-55 + tree.go:31-80, is a prefix lookup over
  *     `com.example.` — here a sorted-array prefix probe over SURT hosts)
  *  - full URL ("https://a.com/x")  → exact canonical URL match
  *  - regex ("...*...")             → regex over the full URL
  */
final class DomainsMatcher(patterns: Seq[String]) extends Serializable {

  // ---- classification, in the reference's order (domainscrawl.go:108-129):
  // full URL (scheme + host) → naive domain ('.' present, no space, no
  // scheme/path/query/fragment) → regex (compile errors fail fast) ----
  private def hasSchemeAndHost(p: String): Boolean = {
    val i = p.indexOf("://")
    if (i <= 0) return false
    val scheme = p.substring(0, i)
    if (!scheme.head.isLetter ||
      !scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      return false
    val rest = p.substring(i + 3)
    val host = rest.takeWhile(c => c != '/' && c != '?' && c != '#')
    host.nonEmpty
  }
  private def isNaiveDomain(p: String): Boolean =
    !p.contains("://") && !p.exists(c => c == '/' || c == '?' || c == '#') &&
      p.contains('.') && !p.contains(' ')

  private val (urlPats, rest0) = patterns.partition(hasSchemeAndHost)
  private val (domainPats, regexPats) = rest0.partition(isNaiveDomain)

  private val exactHosts: Set[String] = domainPats.map(_.toLowerCase).toSet
  // SURT prefixes: matching any subdomain of d ⇔ reversed host starts with
  // reverse(d) + "." at a label boundary — kept as a set probed once per
  // label of the candidate (exact, O(labels); a sorted-array binary search
  // can skip a matching parent when sibling subdomain patterns surround it)
  private val surtPrefixSet: Set[String] =
    domainPats.map(d => Canon.reverseHost(d.toLowerCase) + ".").toSet
  // full URLs: exact string match; patterns with NO path/query/fragment
  // greedily match the (sub)domain of their host (domainscrawl.go:152-160)
  private val exactUrls: Set[String] = urlPats.toSet
  private val greedyUrlHosts: Array[String] = urlPats.flatMap { p =>
    val rest = p.substring(p.indexOf("://") + 3)
    val host = rest.takeWhile(c => c != '/' && c != '?' && c != '#')
    if (rest == host) Some(host.toLowerCase) else None
  }.toArray
  private val regexes: Array[Regex] = regexPats.map(_.r).toArray

  def isEmpty: Boolean = patterns.isEmpty

  private def isSubdomainOf(host: String, domain: String): Boolean =
    host == domain || host.endsWith("." + domain)

  def matches(href: String, host: String): Boolean = {
    if (patterns.isEmpty) return false
    val h = host.toLowerCase
    if (exactHosts.contains(h)) return true
    if (surtPrefixSet.nonEmpty) {
      // ancestor check: every '.' boundary of the reversed host is a
      // potential parent-domain pattern (tree.go prefix-lookup semantics)
      val surt = Canon.reverseHost(h) + "."
      var i = surt.indexOf('.')
      while (i >= 0) {
        if (surtPrefixSet.contains(surt.substring(0, i + 1))) return true
        i = surt.indexOf('.', i + 1)
      }
    }
    if (exactUrls.contains(href)) return true
    var g = 0
    while (g < greedyUrlHosts.length) {
      if (isSubdomainOf(h, greedyUrlHosts(g))) return true
      g += 1
    }
    var i = 0
    while (i < regexes.length) {
      if (regexes(i).findFirstIn(href).isDefined) return true
      i += 1
    }
    false
  }
}
