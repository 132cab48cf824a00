package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-frontier normalization that decides
  * whether two fetches are "the same page": without it, URL-level dedup
  * and per-domain statistics fracture across case, tracking params, and
  * fragments. Pure codegen'd built-ins over the Java∩RE2 regex subset
  * (no UDF, no java.net.URI — its parser throws on crawl-dirty input and
  * would drag exception control flow into the scan).
  *
  * Canonical form (fixed order, each step engine-replayable):
  *  1. drop the fragment (`#...` never reaches the server),
  *  2. drop `utm_*` tracking params (mid-query, leading, and sole,
  *     re-gluing `?`/`&` so the query stays well-formed),
  *  3. lowercase scheme and host ONLY (paths are case-sensitive),
  *  4. strip a leading `www.` host label,
  *  5. strip default ports (`:80` for http, `:443` for https).
  * Scheme-less strings pass through steps 1–2 unchanged by 3–5.
  */
object Url {

  private val SchemeHostRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val noMidUtm = regexp_replace(noFrag, "&utm_[^&]*", "")
    val noLeadUtm = regexp_replace(noMidUtm, "\\?utm_[^&]*&", "?")
    val noUtm = regexp_replace(noLeadUtm, "\\?utm_[^&]*$", "")
    val schemeHost = regexp_extract(noUtm, SchemeHostRe, 0)
    val rest = noUtm.substr(length(schemeHost) + 1, length(noUtm))
    val low = lower(schemeHost)
    val noWww = regexp_replace(low, "://www\\.", "://")
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(http://[^/:]*):80$", "$1"),
      "^(https://[^/:]*):443$", "$1")
    concat(noPort, rest)
  }

  /** Host of a CANONICAL url ("" when scheme-less). */
  def host(canonical: Column): Column =
    regexp_extract(canonical, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1)

  /** Last two dot-labels of the host — the per-site aggregation key.
    * (A public-suffix list would refine co.uk-style hosts; that table
    * is a broadcast-join refinement, not a different plan shape.) */
  def registeredDomain(canonical: Column): Column =
    regexp_extract(host(canonical), "([^.]+\\.[^.]+)$", 1)
}
