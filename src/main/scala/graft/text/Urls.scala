package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and domain extraction — the crawl-hygiene
  * pass every web-scale corpus runs before URL-level dedup and
  * per-domain quotas (C4 arXiv:1910.10683 dedupes by URL; RefinedWeb
  * arXiv:2306.01116 caps per-domain contribution). Raw crawl URLs are
  * noisy: mixed-case schemes/hosts, default ports, tracking params,
  * fragments, trailing slashes — all denote the same resource, and
  * un-canonicalized they defeat exact URL dedup and skew domain
  * statistics.
  *
  * Everything is codegen'd built-ins (`regexp_extract` /
  * `regexp_replace` / `concat`) except the tracking-param filter,
  * which is a higher-order `filter` over the split query string —
  * interpreted, but over a handful of params per row, and the
  * surrounding projection stays in whole-stage codegen. All rules are
  * deliberately expressible in ANSI SQL so the DuckDB oracle runs the
  * same spec from first principles.
  *
  * Canonical form (RFC 3986 §6 normalizations that are safe without
  * touching the server):
  *  - scheme and host lowercased (case-insensitive per spec);
  *  - default ports dropped (`:80` for http, `:443` for https);
  *  - fragment dropped (never sent to the server);
  *  - tracking params removed (`utm_*`, `fbclid`, `gclid`), other
  *    params kept IN ORDER (sorting would merge semantically distinct
  *    `?a=1&b=2` vs `?b=2&a=1` only if the server treats them equally
  *    — not assumable);
  *  - trailing slashes trimmed (`/path/` ≡ `/path`, `/` ≡ empty).
  */
object Urls {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid)="

  /** Canonicalize an absolute `scheme://host[:port][path][?q][#f]`
    * URL per the rules above. Non-URL strings (no `scheme://`) pass
    * through unchanged (crawl manifests carry occasional garbage —
    * a canonicalizer that nulls them silently drops the row's key). */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = lower(regexp_extract(hostport, "^([^:]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    val path = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val pathPart = regexp_replace(path, "/+$", "")
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val keptQuery = array_join(
      filter(split(query, "&"), p => !p.rlike(TrackingParam)), "&")
    val queryPart =
      when(keptQuery === "", "").otherwise(concat(lit("?"), keptQuery))
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), host, portPart, pathPart, queryPart))
  }

  /** Registered domain as the last two host labels (`a.b.c.com` →
    * `c.com`) — the per-site quota key. A production system consults
    * the public-suffix list (`.co.uk` has three-label registrations);
    * the two-label heuristic is the documented approximation here,
    * exact for generic TLDs. */
  def registeredDomain(u: Column): Column = {
    val host = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }
}
