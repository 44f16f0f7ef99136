package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation — the provenance-keyed half of a web-scale corpus
  * build (the C4/RefinedWeb recipe): canonicalize crawl URLs so the
  * same page fetched through tracking-parameter variants collapses to
  * one key, extract the registrable domain as the stratum curation
  * decisions act on, and cap per-domain volume so no single site
  * dominates the training mix.
  *
  * Everything is built from codegen'd Spark built-ins (regexp /
  * array HOFs) — no UDF; the one join is the KB-sized public-suffix
  * broadcast lookup — and every rule (plus the PSL table itself) is
  * mirrored exactly by the DuckDB oracles (qt26-qt31, qx10/qx11), so
  * the canonical key is engine-portable the way every other
  * fingerprint in this repo is.
  */
object Urls {

  /** Query parameters dropped at canonicalization: tracking params
    * carry no content identity (the same page arrives once per
    * campaign otherwise).
    */
  val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid)(=|$)"

  /** Labels that act as second-level registries under a short ccTLD
    * (site5.co.uk registers under co.uk, not uk). The label-arithmetic
    * FALLBACK for suffixes absent from [[PslSubset]] — production
    * keeps the full public-suffix list in the table and this rule
    * catches only unlisted TLD combinations.
    */
  val SecondLevelLabels: Seq[String] =
    Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** Bundled public-suffix table — a genuine subset of the public
    * suffix list (publicsuffix.org): common ccTLD second-level
    * registries plus the high-volume shared-hosting suffixes every
    * real crawl hits (github.io et al — under these, each USER SITE is
    * its own registrable domain; collapsing them to the suffix would
    * let one hosting provider eat the whole per-domain cap). 2-label
    * entries only, lowercase. Production swaps in the full list
    * through the same `(suffix)` table — the lookup shape
    * ([[registrableDomains]]' broadcast join) is what this pins;
    * [[SecondLevelLabels]] stays as the fallback for unlisted TLDs.
    */
  val PslSubset: Seq[String] = Seq(
    "ac.jp", "ac.nz", "ac.uk", "appspot.com", "co.id", "co.il", "co.in",
    "co.jp", "co.kr", "co.nz", "co.th", "co.uk", "co.za", "com.ar",
    "com.au", "com.br", "com.cn", "com.eg", "com.hk", "com.mx", "com.my",
    "com.ph", "com.sa", "com.sg", "com.tr", "com.tw", "com.vn", "edu.au",
    "github.io", "gitlab.io", "go.jp", "gob.mx", "gov.au", "gov.br",
    "gov.cn", "gov.uk", "govt.nz", "herokuapp.com", "me.uk", "ne.jp",
    "net.au", "net.br", "net.cn", "net.in", "net.nz", "net.uk",
    "netlify.app", "or.jp", "or.kr", "org.au", "org.br", "org.cn",
    "org.il", "org.in", "org.mx", "org.nz", "org.uk", "org.za",
    "pages.dev", "vercel.app", "web.app", "workers.dev")

  /** The authority (host[:port]) of `url` with transport noise gone:
    * userinfo (`user:pw@` — anything up to the last `@`; a host can't
    * contain one) stripped, and a fully-qualified trailing host dot
    * (which may sit BEFORE the port) stripped. Case preserved —
    * callers lower() where their rule demands it.
    */
  private def authority(url: Column): Column =
    regexp_replace(regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1),
      "^.*@", ""), "\\.(:[0-9]+)?$", "$1")

  /** Canonical form of a crawl URL:
    *   - scheme and host lowercased (path/query stay case-sensitive)
    *   - fragment dropped
    *   - userinfo (`user:pw@`) and a trailing host dot dropped
    *     (transport noise — left in place they break the www./port
    *     rules and split one page across keys)
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
    val hostport = lower(authority(url))
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

  /** The bare host of a URL: [[authority]] lowercased, `www.` and any
    * port stripped — the input of both domain extractors.
    */
  private def bareHost(url: Column): Column =
    regexp_replace(regexp_replace(lower(authority(url)),
      "^www\\.", ""), ":[0-9]+$", "")

  /** The registrable domain of a URL by LABEL ARITHMETIC alone — the
    * heuristic form: last two host labels, or last three when the
    * second-to-last is a [[SecondLevelLabels]] registry under a short
    * (≤3 chars) TLD. Kept as the documented fallback (and for
    * list-free callers); [[registrableDomains]] is the production
    * form — the heuristic cannot know that e.g. github.io is a
    * registry suffix, so it collapses every *.github.io user site
    * into one domain.
    */
  def registrableDomain(url: Column): Column = {
    val labels = split(bareHost(url), "\\.")
    val n = size(labels)
    // functions.get is 0-based: second-to-last label is index n-2
    val sld = get(labels, n - 2)
    val tld = get(labels, n - 1)
    when(n >= 3 && sld.isin(SecondLevelLabels: _*) && length(tld) <= 3,
      concat_ws(".", slice(labels, n - 2, lit(3))))
      .otherwise(concat_ws(".", slice(labels, greatest(n - 1, lit(1)), lit(2))))
  }

  /** [[PslSubset]] as the one-column `(suffix)` lookup table
    * [[registrableDomains]] joins — swap in the full public-suffix
    * list here and nothing else changes.
    */
  def pslTable(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    PslSubset.toDF("suffix")
  }

  /** The registrable domain via the PUBLIC-SUFFIX TABLE — the
    * production form: the host's last-two-label suffix is looked up
    * in `psl` through a broadcast left join (the list is KBs full-
    * size — a map-side hash probe per row, no shuffle of the corpus);
    * on a hit the registrable domain is the last THREE labels (one
    * label under the registry suffix), otherwise the
    * [[registrableDomain]] label-arithmetic fallback decides. Adds
    * `outCol` to `df`; every other column passes through.
    */
  def registrableDomains(df: DataFrame, urlCol: String, outCol: String,
      psl: DataFrame): DataFrame = {
    val labels = split(bareHost(col(urlCol)), "\\.")
    val n = size(labels)
    val sfx2 = concat_ws(".", slice(labels, greatest(n - 1, lit(1)), lit(2)))
    val lookup = psl.select(col("suffix").as("__psl_sfx"),
      lit(true).as("__psl_hit"))
    df.withColumn("__psl_probe", when(size(labels) >= 3, sfx2))
      .join(broadcast(lookup),
        col("__psl_probe") === col("__psl_sfx"), "left")
      .withColumn(outCol,
        when(col("__psl_hit"),
          concat_ws(".", slice(labels, n - 2, lit(3))))
          .otherwise(registrableDomain(col(urlCol))))
      .drop("__psl_probe", "__psl_sfx", "__psl_hit")
  }

  /** Exact per-domain volume cap: keep at most `cap` docs per domain,
    * chosen by salted deterministic hash order (ties by id) — no RNG,
    * reproducible across runs and engines, and decorrelated from the
    * split/sampling hashes by the salt. Emits every row with a `keep`
    * flag (the [[TextOps.stratifiedKeep]] convention).
    *
    * Scale shape — the THRESHOLD-AGGREGATE form, not a rank window.
    * Registrable domain is the most skewed key a web corpus has (a
    * head domain can hold 1% of the whole crawl), and a per-domain
    * `row_number` window is exactly the shape [[graft.ops.Skew
    * .capBuckets]]'s doc forbids: ranking inside the hot bucket pins
    * the head domain's every row on ONE task's sort. Instead: (1) a
    * bounded top-`cap` aggregate ([[graft.ops.TopK]]) finds each
    * domain's cap-th smallest (salted hash, id) pair — map-side
    * combine folds every task to ≤ cap entries per domain before the
    * one exchange, so the hot domain arrives as P tiny buffers, never
    * as its rows; (2) the domain-cardinality-sized threshold table
    * (24 B/row — AQE broadcasts it while it fits; past that the
    * equi-join's hot side is split by AQE skew handling, each row one
    * hash probe, no sort) joins back; (3) keep = one scalar compare
    * riding the scan. Semantics identical to ranking: (h, id) is a
    * total order, so `(h, id) <= cap-th smallest` IS `rank <= cap`
    * (UrlsSpec pins window-equivalence, and that the plan has no
    * Window). When an EXPECTED rate per domain suffices,
    * [[TextOps.stratifiedKeep]]'s map-only hash threshold remains the
    * cheaper tool.
    */
  def domainCap(docs: DataFrame, idCol: String, domainCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val withH = docs.withColumn("__domcap_h",
      TextOps.hash60(concat(lit("domcap:"), col(idCol).cast("string"))))
    val tk = graft.ops.TopK.topK(cap)
    val thr = withH.groupBy(col(domainCol).as("__domcap_dom"))
      .agg(tk(lit(0.0), col("__domcap_h"), col(idCol).cast("long"),
        typedLit(Seq.empty[Int])).as("__tk"))
      .select(col("__domcap_dom"), size(col("__tk")).as("__domcap_n"),
        element_at(col("__tk"), size(col("__tk"))).as("__domcap_kth"))
    withH.join(thr, col(domainCol) <=> col("__domcap_dom"))
      .withColumn("keep",
        col("__domcap_n") < cap ||
        col("__domcap_h") < col("__domcap_kth.w") ||
        (col("__domcap_h") === col("__domcap_kth.w") &&
          col(idCol).cast("long") <= col("__domcap_kth.id")))
      .drop("__domcap_h", "__domcap_dom", "__domcap_n", "__domcap_kth")
  }
}
