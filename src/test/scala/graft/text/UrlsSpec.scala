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
      8L -> "https://example.com/p?utm_nocheck&a=1",
      // a '?' INSIDE the fragment is not a query separator: the whole
      // fragment drops, and the page must share its canonical key with
      // the fragment-free crawl of the same URL
      9L -> "https://example.com/page#sec?x=1",
      10L -> "https://example.com/page")
    assert(out(1L)._1 === "https://example.com/A/b?a=1&b=2")
    assert(out(2L)._1 === "http://example.com/x")
    assert(out(3L)._1 === "http://example.com:443/x",
      ":443 is NOT the default port for http")
    assert(out(4L)._1 === "https://example.com:8443/CaseSensitive?Z=1")
    assert(out(5L)._1 === "https://example.com/")
    assert(out(6L)._1 === "https://example.com/")
    assert(out(7L)._1 === "https://example.com/p")
    assert(out(8L)._1 === "https://example.com/p?a=1")
    assert(out(9L)._1 === "https://example.com/page",
      "a '?' inside the fragment must not be read as a query")
    assert(out(9L)._1 === out(10L)._1)
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

  test("registrableDomains is total on junk input") {
    // the join form must be as junk-proof as the column form: no
    // scheme, empty host, bare dots, userinfo only, giant ports —
    // every row comes back exactly once with SOME domain, never a
    // throw and never a dropped or duplicated row
    val junk = Seq((1L, ""), (2L, "not a url"), (3L, "https://"),
      (4L, "https://..."), (5L, "ftp://u@:9/x"), (6L, "https://@"),
      (7L, "http://:80"), (8L, "https://a..b..c/x#f#g"),
      (9L, "https://x.github.io:99999999/p?"))
      .toDF("id", "url")
    val out = Urls.registrableDomains(junk, "url", "domain",
        Urls.pslTable(spark))
      .select($"id", $"domain").as[(Long, String)].collect()
    assert(out.length === 9, "one output row per input row, always")
    assert(out.map(_._1).toSet === (1L to 9L).toSet)
    val m = out.toMap
    assert(m(9L) === "x.github.io", "PSL hit must survive a junk port")
  }

  test("userinfo and trailing host dot are transport noise") {
    val out = canon(
      // userinfo stripped before the www./port rules so they apply
      1L -> "https://user:pw@WWW.Example.com:443/x",
      2L -> "http://bob@site.co.uk/y",
      // fully-qualified trailing dot stripped — also when it sits
      // before the port
      3L -> "https://example.com./x",
      4L -> "http://Site7.io.:443/z",
      5L -> "https://u:p@www.news.site.co.uk.:8443/a")
    assert(out(1L)._1 === "https://example.com/x")
    assert(out(1L)._2 === "example.com")
    assert(out(2L)._1 === "http://site.co.uk/y")
    assert(out(2L)._2 === "site.co.uk")
    assert(out(3L)._1 === "https://example.com/x")
    assert(out(3L)._2 === "example.com")
    assert(out(4L)._1 === "http://site7.io:443/z",
      ":443 stays for http; the dot before it goes")
    assert(out(4L)._2 === "site7.io")
    assert(out(5L)._1 === "https://news.site.co.uk:8443/a")
    assert(out(5L)._2 === "site.co.uk")
  }

  test("registrableDomains: PSL hits beat the label heuristic, fallback otherwise") {
    val df = Seq(
      (1L, "https://alice.github.io/p"),          // PSL: user site IS the domain
      (2L, "https://www.news.bob.github.io/p"),   // subdomained user site
      (3L, "https://news.site.co.uk/p"),          // ccTLD registry via PSL
      (4L, "https://a.b.site.com/p"),             // plain TLD -> last 2
      (5L, "https://site.ac.zz/p"),               // unlisted registry-ish -> heuristic last 3
      (6L, "https://github.io/p"))                // bare suffix (n=2) -> fallback
      .toDF("id", "url")
    val out = Urls.registrableDomains(df, "url", "domain",
        Urls.pslTable(spark))
      .select($"id", $"domain").as[(Long, String)].collect().toMap
    assert(out(1L) === "alice.github.io")
    assert(out(2L) === "bob.github.io")
    assert(out(3L) === "site.co.uk")
    assert(out(4L) === "site.com")
    assert(out(5L) === "site.ac.zz", "unlisted ac.zz takes the 7-label fallback")
    assert(out(6L) === "github.io")
    // the heuristic alone gets the shared-hosting cases WRONG — the
    // measured difference that motivates the table
    val heur = df.select($"id",
        Urls.registrableDomain($"url").as("d"))
      .as[(Long, String)].collect().toMap
    assert(heur(1L) === "github.io" && heur(2L) === "github.io",
      "fallback collapses all user sites into the suffix — the PSL fixes this")
  }

  test("registrableDomains: lookup is a broadcast join, no corpus shuffle") {
    val df = (0L until 50L).map(i => (i, s"https://s$i.github.io/x"))
      .toDF("id", "url")
    val plan = Urls.registrableDomains(df, "url", "domain",
        Urls.pslTable(spark))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"PSL lookup must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"PSL lookup must not shuffle the corpus:\n$plan")
  }

  test("registrableDomainsPsl: full algorithm — wildcards, exceptions, 3-label rules") {
    val df = Seq(
      (1L, "https://alice.github.io/p"),          // private-section 2-label rule
      (2L, "https://www.news.bob.github.io/p"),   // subdomained user site
      (3L, "https://news.site.co.uk/p"),          // ccTLD registry rule
      (4L, "https://a.b.site.com/p"),             // plain TLD -> last 2
      (5L, "https://school.k12.ak.us/p"),         // 3-label plain rule
      (6L, "https://www.shop.example.ck/p"),      // *.ck wildcard: example.ck is the suffix
      (7L, "https://www.ck/p"),                   // !www.ck exception: registrable = www.ck
      (8L, "https://sub.www.ck/p"),               // under the exception domain
      (9L, "https://ward.city.kawasaki.jp/p"),    // !city.kawasaki.jp exception
      (10L, "https://hospital.ward.kawasaki.jp/p"), // *.kawasaki.jp wildcard
      (11L, "https://example.ck/p"),              // host IS a (wildcard) public suffix
      (12L, "https://site.zz/p"))                 // unlisted TLD -> implicit *
      .toDF("id", "url")
    val out = Urls.registrableDomainsPsl(df, "url", "domain")
      .select($"id", $"domain").as[(Long, String)].collect().toMap
    assert(out(1L) === "alice.github.io")
    assert(out(2L) === "bob.github.io")
    assert(out(3L) === "site.co.uk")
    assert(out(4L) === "site.com")
    assert(out(5L) === "school.k12.ak.us")
    assert(out(6L) === "shop.example.ck",
      "the wildcard consumes one label: example.ck is the public suffix")
    assert(out(7L) === "www.ck", "the exception rule carves www.ck back out")
    assert(out(8L) === "www.ck")
    assert(out(9L) === "city.kawasaki.jp")
    assert(out(10L) === "hospital.ward.kawasaki.jp",
      "wildcard suffix = ward.kawasaki.jp; registrable adds one label")
    assert(out(11L) === "example.ck",
      "a host that IS a public suffix maps to itself (total, non-null)")
    assert(out(12L) === "site.zz", "implicit * rule: unlisted TLD is the suffix")
  }

  test("registrableDomainsPsl: total on junk, broadcast-only plan") {
    val junk = Seq((1L, ""), (2L, "not a url"), (3L, "https://"),
      (4L, "https://..."), (5L, "ftp://u@:9/x"), (6L, "https://@"),
      (7L, "http://:80"), (8L, "https://a..b..c/x#f#g"),
      (9L, "https://x.github.io:99999999/p?"))
      .toDF("id", "url")
    val out = Urls.registrableDomainsPsl(junk, "url", "domain")
      .select($"id", $"domain").as[(Long, String)].collect()
    assert(out.length === 9, "one output row per input row, always")
    assert(out.toMap.apply(9L) === "x.github.io")
    val plan = Urls.registrableDomainsPsl(
        (0L until 50L).map(i => (i, s"https://s$i.github.io/x")).toDF("id", "url"),
        "url", "domain")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"PSL lookup must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"PSL lookup must not shuffle the corpus:\n$plan")
  }

  test("parsePsl: real-format parsing (comments, wildcards, exceptions, pivot)") {
    val rules = Urls.parsePsl(Iterator(
      "// comment", "", "com", "co.uk", "*.ck", "!www.ck", "CO.JP"))
    val m = rules.map(r => r.key -> r).toMap
    assert(m("com").hasPlain && !m("com").hasWild && !m("com").hasExc)
    assert(m("ck").hasWild && !m("ck").hasPlain)
    assert(m("www.ck").hasExc)
    assert(m("co.jp").hasPlain, "keys are lowercased")
    assert(Urls.bundledPsl.size > 800, "the bundled subset is the big table")
    assert(Urls.bundledPsl.exists(_.hasWild) && Urls.bundledPsl.exists(_.hasExc))
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

  test("domainCap: threshold form keeps EXACTLY the window-rank keep set") {
    // the keep semantics are defined as rank <= cap under
    // (salted hash asc, id asc) — the threshold-aggregate rewrite may
    // never change which rows survive, including hash ties (forced
    // here by duplicate ids across domains sharing the salt input —
    // same id => same hash, distinct domains)
    import org.apache.spark.sql.expressions.Window
    val docs = (0L until 200L).map(i => (i % 67, s"dom${i % 5}.com"))
      .toDF("doc_id", "domain").repartition(7)
    val got = Urls.domainCap(docs, "doc_id", "domain", cap = 8)
      .select($"doc_id", $"domain", $"keep")
      .as[(Long, String, Boolean)].collect().sorted.toSeq
    val w = Window.partitionBy($"domain").orderBy(
      TextOps.hash60(concat(lit("domcap:"), $"doc_id".cast("string"))),
      $"doc_id")
    val want = docs.withColumn("rk", row_number().over(w))
      .select($"doc_id", $"domain", ($"rk" <= 8).as("keep"))
      .as[(Long, String, Boolean)].collect().sorted.toSeq
    assert(got === want)
  }

  test("domainCap: plans as a bounded aggregate, never a domain window") {
    // registrable domain is the most skewed key in a web corpus; a
    // per-domain rank window would pin the head domain's full sort on
    // one task (the Skew.capBuckets standard). The plan must carry the
    // bounded top-cap ObjectHashAggregate and no Window node
    val docs = (0L until 50L).map(i => (i, s"dom${i % 3}.com"))
      .toDF("doc_id", "domain")
    val plan = Urls.domainCap(docs, "doc_id", "domain", cap = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the bounded top-cap aggregate in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
  }
}
