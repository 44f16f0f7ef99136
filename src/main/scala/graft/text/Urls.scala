package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL curation — the provenance-keyed half of a web-scale corpus
  * build (the C4/RefinedWeb recipe): canonicalize crawl URLs so the
  * same page fetched through tracking-parameter variants collapses to
  * one key, extract the registrable domain as the stratum curation
  * decisions act on, and cap per-domain volume so no single site
  * dominates the training mix.
  *
  * Everything is built from codegen'd Spark built-ins (regexp /
  * array HOFs) — no UDF — and every rule is mirrored exactly by the
  * DuckDB oracles (qt26/qt27), so the canonical key is engine-portable
  * the way every other fingerprint in this repo is.
  */
object Urls {

  /** Query parameters dropped at canonicalization: tracking params
    * carry no content identity (the same page arrives once per
    * campaign otherwise).
    */
  val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid)(=|$)"

  /** Labels that act as second-level registries under a short ccTLD
    * (site5.co.uk registers under co.uk, not uk). A heuristic subset
    * of the public-suffix list — a production deployment swaps in the
    * full list as a broadcast lookup; the EXTRACTION shape (label
    * arithmetic riding the scan) is what this operator pins.
    */
  val SecondLevelLabels: Seq[String] =
    Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** Canonical form of a crawl URL:
    *   - scheme and host lowercased (path/query stay case-sensitive)
    *   - fragment dropped
    *   - leading `www.` dropped
    *   - default port dropped (`:443` for https, `:80` for http —
    *     non-default ports are identity and stay)
    *   - tracking params ([[TrackingParamRe]]) dropped, remaining
    *     params sorted bytewise (param order is transport noise)
    *   - trailing slash dropped (empty path becomes `/`)
    * One pass of regexp extracts + an array HOF over the query — all
    * codegen, no UDF, rides the scan.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport =
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val path =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val noWww = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
    val cpath = when(path === "", lit("/"))
      .when(length(path) > 1, regexp_replace(path, "/$", ""))
      .otherwise(path)
    val cquery = concat_ws("&", array_sort(filter(split(query, "&"),
      q => q =!= "" && not(q.rlike(TrackingParamRe)))))
    concat(scheme, lit("://"), host, cpath,
      when(cquery === "", lit("")).otherwise(concat(lit("?"), cquery)))
  }

  /** The registrable domain of a URL — the curation stratum: strip
    * `www.` and any port, then take the last two host labels, or the
    * last three when the second-to-last is a [[SecondLevelLabels]]
    * registry under a short (≤3 chars) TLD.
    */
  def registrableDomain(url: Column): Column = {
    val hostport =
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = regexp_replace(
      regexp_replace(hostport, "^www\\.", ""), ":[0-9]+$", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    // functions.get is 0-based: second-to-last label is index n-2
    val sld = get(labels, n - 2)
    val tld = get(labels, n - 1)
    when(n >= 3 && sld.isin(SecondLevelLabels: _*) && length(tld) <= 3,
      concat_ws(".", slice(labels, n - 2, lit(3))))
      .otherwise(concat_ws(".", slice(labels, greatest(n - 1, lit(1)), lit(2))))
  }

  /** Exact per-domain volume cap: keep at most `cap` docs per domain,
    * chosen by salted deterministic hash order (ties by id) — no RNG,
    * reproducible across runs and engines, and decorrelated from the
    * split/sampling hashes by the salt. Emits every row with a `keep`
    * flag (the [[TextOps.stratifiedKeep]] convention).
    *
    * Scale note: the exact-cap semantic needs a per-domain rank — one
    * shuffle on the domain key, task state bounded by the largest
    * domain. That is the honest cost of "at most N", and the
    * domain-keyed shuffle is the same exchange the downstream
    * per-domain statistics pay anyway; when an EXPECTED rate per
    * domain suffices, [[TextOps.stratifiedKeep]]'s map-only hash
    * threshold is the cheaper tool.
    */
  def domainCap(docs: DataFrame, idCol: String, domainCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(col(domainCol)).orderBy(
      TextOps.hash60(concat(lit("domcap:"), col(idCol).cast("string"))),
      col(idCol))
    docs.withColumn("__domcap_rk", row_number().over(w))
      .withColumn("keep", col("__domcap_rk") <= cap)
      .drop("__domcap_rk")
  }
}
