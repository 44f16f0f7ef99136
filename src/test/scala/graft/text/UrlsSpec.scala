package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UrlsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: (Long, String)*): Map[Long, (String, String)] =
    urls.toSeq.toDF("id", "url")
      .select($"id", Urls.canonicalizeUrl($"url").as("c"),
        Urls.registrableDomain($"url").as("d"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("canonicalizeUrl: every rule on hand-picked URLs") {
    val out = canon(
      // case + www + default port + fragment + tracking + param sort
      1L -> "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1#frag",
      // http default port stripped; https port on http scheme KEPT
      2L -> "http://example.com:80/x",
      3L -> "http://example.com:443/x",
      // non-default port kept; path/query case preserved
      4L -> "https://Example.com:8443/CaseSensitive?Z=1&gclid=abc",
      // empty path becomes /; root slash survives
      5L -> "https://example.com",
      6L -> "https://example.com/",
      // all params tracking -> query dropped entirely
      7L -> "https://example.com/p?utm_a=1&utm_b=2&fbclid=z",
      // bare utm param without '=' is still tracking
      8L -> "https://example.com/p?utm_nocheck&a=1")
    assert(out(1L)._1 === "https://example.com/A/b?a=1&b=2")
    assert(out(2L)._1 === "http://example.com/x")
    assert(out(3L)._1 === "http://example.com:443/x",
      ":443 is NOT the default port for http")
    assert(out(4L)._1 === "https://example.com:8443/CaseSensitive?Z=1")
    assert(out(5L)._1 === "https://example.com/")
    assert(out(6L)._1 === "https://example.com/")
    assert(out(7L)._1 === "https://example.com/p")
    assert(out(8L)._1 === "https://example.com/p?a=1")
  }

  test("registrableDomain: plain TLD, second-level registry, ports, subdomains") {
    val out = canon(
      1L -> "https://a.b.news.site.com/x",
      2L -> "https://news.site.co.uk/x",
      3L -> "https://WWW.site.ORG:8080/x",
      4L -> "https://site.io/x",
      // 'company.co' is a real co TLD domain: only 2 labels -> itself
      5L -> "https://company.co/x",
      // long TLD after a registry label: NOT a second-level split
      6L -> "https://site.co.example/x")
    assert(out(1L)._2 === "site.com")
    assert(out(2L)._2 === "site.co.uk")
    assert(out(3L)._2 === "site.org")
    assert(out(4L)._2 === "site.io")
    assert(out(5L)._2 === "company.co")
    assert(out(6L)._2 === "co.example", "len(tld) > 3 must not trigger the registry split")
  }

  test("canonicalizeUrl/registrableDomain are total on junk input") {
    // lake URL columns carry whatever the crawler scraped — both
    // expressions must stay null-safe-total (no throw, deterministic)
    // on arbitrary strings; same seeded-fuzz convention as the media
    // ParserFuzzSpec
    val rnd = new scala.util.Random(90210L)
    val junk = (1 to 200).map { i =>
      val n = rnd.nextInt(40)
      (i.toLong, new String(Array.fill(n)((rnd.nextInt(94) + 33).toChar)))
    } ++ Seq(
      (900L, ""), (901L, "://"), (902L, "https://"), (903L, "nohost"),
      (904L, "https://:443"), (905L, "ftp://x.y/#?#"), (906L, "https://a"),
      (907L, "https://..//?&&&#"), (908L, "http://[::1]:80/p"))
    val df = junk.toDF("id", "url")
      .select($"id", Urls.canonicalizeUrl($"url").as("c"),
        Urls.registrableDomain($"url").as("d"))
    val once = df.collect()
    val twice = df.collect()
    assert(once.length === junk.length)
    assert(once.map(_.toString).toSeq === twice.map(_.toString).toSeq,
      "junk canonicalization must be deterministic")
  }

  test("domainCap: exactly min(cap, n) keeps per domain, deterministic") {
    val docs = (0L until 30L).map(i => (i, s"dom${i % 3}.com"))
      .toDF("doc_id", "domain")
    val out = Urls.domainCap(docs, "doc_id", "domain", cap = 4)
    val keeps = out.filter($"keep").groupBy($"domain").count()
      .as[(String, Long)].collect().toMap
    assert(keeps.values.toSet === Set(4L), "every 10-doc domain keeps exactly cap")
    assert(out.count() === 30L, "every row is emitted with a flag")
    // determinism: a second run keeps the same ids
    val ids1 = out.filter($"keep").select($"doc_id").as[Long].collect().toSet
    val ids2 = Urls.domainCap(docs, "doc_id", "domain", cap = 4)
      .filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(ids1 === ids2)
    // a small domain is untouched
    val small = Urls.domainCap(Seq((1L, "one.com")).toDF("doc_id", "domain"),
      "doc_id", "domain", cap = 4)
    assert(small.filter($"keep").count() === 1L)
  }
}
