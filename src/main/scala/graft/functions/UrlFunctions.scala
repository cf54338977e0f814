package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and domain extraction — the layer between a
  * crawl source ([[graft.sources.WarcIngest]] emits WARC-Target-URIs)
  * and URL-level dedup / domain-level corpus mixing. C4 and RefinedWeb
  * both dedup by canonical URL and filter/mix by registered domain;
  * without canonicalization, `HTTP://Example.com/a?utm_source=x#top`
  * and `http://example.com/a` count as different pages and domain
  * statistics fragment.
  *
  * Everything here is pure codegen'd Column arithmetic (regex parts +
  * array ops) in the Java-regex ∩ RE2 subset — zero shuffle, zero UDF,
  * DuckDB-oracle-checkable, safe as the first projection over a crawl.
  */
object UrlFunctions {

  /** Tracking parameters every crawl pipeline strips (the standard
    * analytics/click-id junk that splits identical URLs). */
  val TrackingParamRegex = "^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** `host[:port]` with the port and any leading `www.` stripped,
    * lowercased. Empty when the input has no `scheme://` part. */
  def urlHost(url: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(trim(url), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)),
        ":(80|443)$", ""),
      "^www\\.", "")

  private def pathOf(url: Column): Column =
    regexp_replace(
      regexp_extract(trim(url), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")

  /** The query string with tracking params dropped and the remaining
    * `k=v` pairs sorted (parameter order is presentation, not
    * identity). Empty when nothing survives. */
  private def canonQuery(url: Column): Column = {
    val raw = regexp_extract(trim(url), "\\?([^#]*)", 1)
    val kept = filter(split(raw, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParamRegex))
    array_join(array_sort(kept), "&")
  }

  /** Canonical form: lowercased scheme + host (www./default-port
    * stripped), path without trailing slashes, fragment dropped,
    * tracking params dropped, surviving query params sorted. Path case
    * is preserved (URL paths are case-sensitive). Inputs without a
    * scheme canonicalize to empty — filter on it to drop junk URIs. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = schemeOf(trim(url))
    val q = canonQuery(url)
    when(length(scheme) === 0, lit(""))
      .otherwise(concat(
        scheme, lit("://"), urlHost(url), pathOf(url),
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** Multi-label public suffixes a small built-in list covers (the
    * common ccTLD second-level registries; a full public-suffix list is
    * a data file, not an algorithm change). */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "or.jp", "ne.jp",
    "com.au", "net.au", "org.au", "co.nz", "co.in", "com.br", "com.cn",
    "com.mx", "co.za", "com.sg", "com.tr")

  /** Registered (pay-level) domain of a host: the last two labels, or
    * the last three when the last two form a listed multi-label suffix
    * (`bbc.co.uk` → `bbc.co.uk`, `sub.a.example.com` → `example.com`).
    * Hosts with fewer labels (e.g. `localhost`) pass through. */
  def registeredDomain(host: Column): Column = {
    // A host may still carry a non-default port (urlHost strips only
    // :80/:443) — drop any :<digits> suffix so `example.com:8080`
    // doesn't fragment domain statistics away from `example.com`.
    val bare = regexp_replace(host, ":[0-9]+$", "")
    val labels = split(bare, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(n <= 1, bare)
      .when(n >= 3 && lastTwo.isin(TwoLevelSuffixes: _*), lastThree)
      .otherwise(lastTwo)
  }

  /** Registered domain straight from a URL. */
  def urlDomain(url: Column): Column = registeredDomain(urlHost(url))
}
