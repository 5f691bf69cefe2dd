package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/domain curation operators — the source-mix surface a crawl-scale
  * pipeline runs before weighting: extract and canonicalize the host of
  * every document URL, roll hosts up to an apex domain, and feed the
  * result to the weighted heavy-hitter / mixture machinery ("which
  * domains dominate my token budget?" is asked of DOMAINS, not raw URL
  * strings, which differ per-document in scheme, case, ports, paths and
  * fragments).
  *
  * All pure Catalyst expressions (`parse_url`, `lower`, `regexp_replace`,
  * `split`) — per-row, codegen-friendly, zero exchanges; the rollup after
  * them is one hash aggregation on the canonical key.
  */
object UrlOps {

  /** Canonical host of a URL: `parse_url(..., 'HOST')` (drops scheme,
    * port, path, query, fragment), lowercased, with one leading `www.`
    * label stripped — the standard crawl canonicalization so
    * `HTTP://WWW.A.COM:80/x` and `https://a.com/y#f` count as one host.
    * Unparseable URL → NULL (parse_url's own contract).
    */
  def canonicalHost(url: Column): Column =
    regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")

  /** Naive apex (registrable) domain of a host: its last two dot-labels
    * (`cdn.a.example.com` → `example.com`); hosts with fewer than two
    * labels pass through. A production pipeline substitutes the public
    * suffix list here — the ROLLUP shape (host → apex → weighted
    * aggregation) is what the engine provides.
    */
  def apexDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    when(size(parts) >= 2,
      concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
      .otherwise(host)
  }
}
