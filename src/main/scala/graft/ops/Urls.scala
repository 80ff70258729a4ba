package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain extraction — the crawl-curation pass
  * that runs before URL-keyed dedup and per-domain caps (a raw crawl
  * holds the same page under `HTTP://Example.com/a/?utm_source=x#top`
  * and `http://example.com/a`; dedup keys must not see them as
  * different).
  *
  * Rules (applied by [[canonicalize]]):
  *  - scheme and host lowercase (path/query case is significant);
  *  - userinfo stripped (`http://user:pw@host/` and `http://host/`
  *    are the same page for dedup purposes);
  *  - default ports stripped (`:80` for http, `:443` for https;
  *    non-default ports kept);
  *  - fragment dropped;
  *  - tracking parameters dropped (`utm_*`, `ref`, `fbclid`, `gclid`),
  *    surviving parameters keep their original order;
  *  - trailing slashes trimmed from the path.
  *
  * Everything is regex + string Column ops (no UDF, whole-stage
  * codegen) and every rule is replayable in another engine's SQL —
  * the oracle runs the same regexes in DuckDB.
  */
object Urls {

  /** Parameters dropped by [[canonicalize]]: `utm_*`, `ref`, `fbclid`,
    * `gclid` — case-insensitive, with or without a value (`?ref` and
    * `?UTM_SOURCE=x` are both tracking noise); `refresh=1` does NOT
    * match (the name must END at `=` or end-of-param). `\z`, not `$`:
    * Java's `$` matches BEFORE a trailing line terminator while RE2's
    * (the oracle's engine) matches end-of-text only — a param ending
    * in a stray newline would canonicalize differently per engine. */
  val TrackingParamRe = "(?i)^(utm_[^=]*|ref|fbclid|gclid)(=|\\z)"

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  // anchored from the start with '#' excluded BEFORE the '?': a '?'
  // that first appears inside the fragment (`/app#/search?q=1`, the
  // SPA hash-route pattern) is fragment content, not a query string —
  // the unanchored `\?([^#]*)` would leak it into the canonical form
  private val QueryRe = "^[^#?]*\\?([^#]*)"

  def scheme(u: Column): Column = lower(regexp_extract(u, SchemeRe, 1))

  /** Lowercased host with the port still attached (if any). Userinfo
    * is stripped (`http://user:pw@Host/` → `host`): the authority's
    * `[^/?#]*` capture includes any `user@` prefix, and leaving it in
    * would mis-bucket userinfo URLs under URL-keyed dedup and
    * per-domain caps (`user@example.com` ≠ `example.com`). Greedy
    * `^.*@` cuts at the LAST `@` — the host itself can't contain one. */
  def hostPort(u: Column): Column =
    regexp_replace(lower(regexp_extract(u, HostPortRe, 1)), "^.*@", "")

  /** Lowercased host, any port stripped. */
  def host(u: Column): Column = regexp_replace(hostPort(u), ":[0-9]+$", "")

  /** Host with default port stripped, non-default ports kept. */
  def hostCanonical(u: Column): Column = {
    val hp = hostPort(u)
    when(scheme(u) === "http", regexp_replace(hp, ":80$", ""))
      .when(scheme(u) === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
  }

  /** Path with trailing slashes trimmed (root collapses to empty). */
  def pathCanonical(u: Column): Column =
    regexp_replace(regexp_extract(u, PathRe, 1), "/+$", "")

  /** Query string with tracking parameters removed, order preserved;
    * empty when nothing survives. */
  def queryCanonical(u: Column): Column =
    array_join(
      filter(split(regexp_extract(u, QueryRe, 1), "&"),
        p => !(p.rlike(TrackingParamRe) || p === "")),
      "&")

  /** The full canonical form (see object scaladoc for the rules).
    * Scheme-less input (`example.com/a`, protocol-relative `//cdn…`)
    * passes through UNCHANGED: the parsers all anchor on `scheme://`,
    * and silently emitting a shared degenerate key (`://`) for every
    * such row would collapse them into one survivor under URL-keyed
    * dedup — identity is the safe behavior, normalize upstream. */
  def canonicalize(u: Column): Column = {
    val q = queryCanonical(u)
    when(scheme(u) === "", u).otherwise(
      concat(scheme(u), lit("://"), hostCanonical(u), pathCanonical(u),
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** Registered domain: the last two host labels (`a.b.c.com` →
    * `c.com`); single-label hosts pass through. (A production system
    * substitutes the public-suffix list here — `co.uk` needs three
    * labels; the list is data, the expression shape is this one.) */
  def registeredDomain(u: Column): Column = {
    val parts = split(host(u), "\\.")
    when(size(parts) >= 2,
      concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
      .otherwise(host(u))
  }
}
