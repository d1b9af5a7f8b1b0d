package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Crawl-policy engine — the allow/deny rule evaluation every crawl
    * curation pass runs before fetching or keeping a URL (robots-file
    * policies, licensing deny-lists, partner allow-lists). Rules are
    * a CONFIG table (rule_id, action ∈ allow|deny, domain_suffix,
    * path_prefix): a rule matches when the host ends at a LABEL
    * boundary with `domain_suffix` (empty = every host — "evil.com"
    * must not match "notevil.com", hence the boundary) and the path
    * starts with `path_prefix` (empty = every path). The winner is
    * the MOST SPECIFIC match — longest suffix+prefix, ties to the
    * lowest rule_id — so a domain-wide deny with a path carve-out
    * allow behaves like every firewall admin expects; unmatched URLs
    * fall to `defaultAllow`.
    *
    * Determinism: winner via ONE `max(struct(specificity, −rule_id,
    * …))` aggregate (the applyCdc struct-max discipline — pure
    * function of the match set under any partitioning). Scale shape:
    * rules are config-sized and BROADCAST; the join is a broadcast
    * nested loop by construction (suffix match isn't an equi-key —
    * stated), so cost is rows × rules with zero shuffle of the URL
    * side; the verdict aggregate groups on the caller's key. */
  def urlPolicy(urls: DataFrame, rules: DataFrame, idCol: String = "doc_id",
                urlCol: String = "url",
                defaultAllow: Boolean = true): DataFrame = {
    val host = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))
    val path = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val u = urls.select(col(idCol), col(urlCol))
      .withColumn("__host", host).withColumn("__path", path)
    val cond =
      (col("domain_suffix") === "" || col("__host") === col("domain_suffix") ||
        col("__host").endsWith(concat(lit("."), col("domain_suffix")))) &&
      (col("path_prefix") === "" ||
        col("__path").startsWith(col("path_prefix")))
    val win = max(when(col("rule_id").isNotNull, struct(
      (length(col("domain_suffix")) + length(col("path_prefix"))).as("spec"),
      (-col("rule_id")).as("nid"),
      col("rule_id").as("rid"), col("action").as("act")))).as("__w")
    u.join(broadcast(rules), cond, "left")
      .groupBy(col(idCol), col(urlCol))
      .agg(win)
      .select(col(idCol), col(urlCol),
        col("__w.rid").as("rule_id"), col("__w.act").as("action"),
        when(col("__w").isNull, lit(defaultAllow))
          .otherwise(col("__w.act") === "allow").as("kept"))
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

  /** Politeness-constrained crawl schedule — the frontier ordering
    * every crawler needs between [[urlPolicy]] (what MAY be fetched)
    * and the fetcher (what IS fetched, when): fetches against one
    * registered domain are serialized `delayMs` apart in priority
    * order, and each domain is capped at `maxPerDomain` URLs per
    * scheduling cycle (the crawl-quota fairness knob — one giant host
    * cannot monopolize a cycle no matter how many high-priority URLs
    * it holds).
    *
    * Emits (id, url, domain, queue_pos, fetch_offset_ms): queue_pos
    * is the 1-based position in the domain's serialized queue under
    * the total order (priority DESC, id) — ties cannot reorder across
    * runs or engines — and fetch_offset_ms = (queue_pos−1)·delayMs is
    * the earliest start relative to the cycle open. Scale shape: one
    * shuffle on the domain key plus a per-domain window; a pathological
    * hot domain funnels its URLs to one task, but the cap means only
    * the top `maxPerDomain` survive — pre-ranking with a per-partition
    * partial top-k (the E44 quota-sample trick) bounds that task's
    * input when a single domain dominates the frontier; at the default
    * cap the window state is trivially small. */
  def politenessSchedule(urls: DataFrame, priorityCol: String,
                         delayMs: Long, maxPerDomain: Int = 50,
                         idCol: String = "doc_id",
                         urlCol: String = "url"): DataFrame = {
    require(delayMs >= 0, s"delayMs must be nonnegative, got $delayMs")
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1, got $maxPerDomain")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(col(priorityCol).desc, col(idCol))
    urls
      .withColumn("domain", registeredDomain(col(urlCol)))
      .withColumn("queue_pos", row_number().over(w).cast("long"))
      .filter(col("queue_pos") <= maxPerDomain)
      .withColumn("fetch_offset_ms", (col("queue_pos") - 1) * delayMs)
      .select(col(idCol), col(urlCol), col("domain"), col("queue_pos"),
        col("fetch_offset_ms"))
  }
}
