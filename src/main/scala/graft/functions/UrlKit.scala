package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL hygiene kit for crawl-corpus pipelines: canonicalization, registered-
 * domain extraction, and domain blocklisting — the C4/RefinedWeb-style steps
 * that run before URL-level dedup (the cheapest dedup there is: two crawls
 * of the same page differ in tracking params and fragments, so raw-URL
 * dedup misses most re-fetches).
 *
 * All pure `Column` regexp/concat expressions (whole-stage-codegen'd, zero
 * shuffle — free riders on the scan at 100 TB). The regex subset used
 * (char classes, alternation, non-capturing groups, anchors) is portable
 * across Java regex and RE2, so an external SQL engine reproduces the
 * canonical form byte-for-byte.
 */
object UrlKit {

  /** Query params that identify a tracking/attribution system rather than
    * content: stripping them maps re-fetches of one page to one URL.
    */
  val trackingParams: String =
    "utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|igshid"

  /**
   * Canonical form of an absolute http(s) URL:
   *   - fragment dropped;
   *   - tracking params ([[trackingParams]]) dropped, `?`/`&` chains
   *     repaired, empty query dropped;
   *   - scheme and host lowercased (path/query case is significant and
   *     preserved);
   *   - default ports (`:80`, `:443`) and a leading `www.` dropped;
   *   - a single trailing `/` of the path dropped, whether the path ends the
   *     URL or a query follows (`https://a.com/` = `https://a.com`,
   *     `/p/?q` = `/p?q`).
   *
   * Malformed input (no `scheme://host`) canonicalizes to null — route it
   * to a quarantine sink rather than silently keeping a junk key.
   */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    // "?" -> "?&" turns every param into an "&"-prefixed one, so a single
    // strip pattern covers first and later positions; then repair "?&" and
    // a dangling "?"/"&" left when every param was tracking
    val amp = regexp_replace(noFrag, "\\?", "?&")
    val stripped = regexp_replace(amp, "&(" + trackingParams + ")=[^&]*", "")
    val repaired =
      regexp_replace(regexp_replace(stripped, "\\?&", "?"), "[?&]$", "")
    val scheme = lower(regexp_extract(repaired, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(repaired, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val hostClean = regexp_replace(
      regexp_replace(host, ":(80|443)$", ""), "^www\\.", "")
    val rest = regexp_replace(repaired, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    // "/(?=\?)" would need lookahead, which RE2 (and so the SQL oracle
    // twin) lacks — capture the boundary and re-emit it instead
    val restClean = regexp_replace(rest, "/(\\?|$)", "$1")
    when(scheme === "" || hostClean === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), hostClean, restClean))
  }

  /** Multi-label public suffixes recognized by [[registeredDomain]] beyond
    * the generic last-two-labels rule. A deliberately small, explicit set —
    * a production deployment swaps in the full public-suffix list as a
    * broadcast lookup; the operator shape is identical.
    */
  val multiPartSuffixes: String = "(?:co|com|org|net|gov|ac)\\.(?:uk|au|jp|br|in|nz)"

  /**
   * Registered (pay-level) domain of a lowercase host: the label directly
   * below the public suffix plus the suffix — `shop.example.co.uk` →
   * `example.co.uk`, `a.b.example.com` → `example.com`. Hosts with fewer
   * than two labels (or empty) yield null. Domain-level aggregation — spam
   * blocklists, per-site quotas, domain mixing weights — keys on this, not
   * on the raw host.
   */
  def registeredDomain(host: Column): Column = {
    val threeLabel =
      regexp_extract(host, "([^.]+\\." + multiPartSuffixes + ")$", 1)
    val twoLabel = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(threeLabel =!= "", threeLabel)
      .when(twoLabel =!= "", twoLabel)
      .otherwise(lit(null).cast("string"))
  }

  /** Host part of a canonical URL (see [[canonicalizeUrl]]). */
  def hostOf(url: Column): Column = {
    val h = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    when(h === "", lit(null).cast("string")).otherwise(h)
  }
}
