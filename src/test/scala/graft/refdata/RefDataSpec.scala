package graft.refdata

import java.sql.Date

import graft.SparkTestBase

class RefDataSpec extends SparkTestBase {
  import spark.implicits._

  /** Canned transport: maps URL substrings to JSON-lines payloads. */
  private class FakeHttp(routes: Map[String, String],
      failFirst: Int = 0) extends RefData.HttpFetch {
    var calls = 0
    def get(url: String): String = {
      calls += 1
      if (calls <= failFirst) throw new RuntimeException("503")
      routes.collectFirst { case (k, v) if url.contains(k) => v }
        .getOrElse(throw new RuntimeException(s"404 $url"))
    }
  }

  test("splits puller parses payloads and derives the zero-guarded ratio") {
    val http = new FakeHttp(Map("splits?ticker=AAPL" ->
      """{"ticker":"AAPL","execution_date":"2024-06-10","split_from":1.0,"split_to":10.0}
        |{"ticker":"AAPL","execution_date":"2020-08-31","split_from":0.0,"split_to":4.0}""".stripMargin))
    val out = RefData.pullSplits(spark, http, "http://x", Seq("AAPL"))
      .select($"execution_date", $"ratio").as[(Date, Option[Double])].collect().toMap
    assert(out(Date.valueOf("2024-06-10")).contains(10.0))
    assert(out(Date.valueOf("2020-08-31")).isEmpty) // zero split_from -> null
  }

  test("retry wrapper retries transient failures with backoff") {
    val http = new FakeHttp(
      Map("dividends?ticker=MSFT" ->
        """{"ticker":"MSFT","ex_dividend_date":"2024-02-14","pay_date":"2024-03-14","cash_amount":0.75,"frequency":4}"""),
      failFirst = 2)
    val out = RefData.pullDividends(spark, http, "http://x", Seq("MSFT"))
    assert(out.count() == 1)
    assert(http.calls == 3) // 2 failures + 1 success
  }

  test("symbol preflight probes spelling variants in order") {
    val http = new FakeHttp(Map("tickers/BRK-B" -> "{}", "tickers/AAPL" -> "{}"))
    val resolved = RefData.resolveSymbols(http, "http://x",
      Seq("brk/b", "aapl", "zzzz")).toMap
    assert(resolved("brk/b").contains("BRK-B")) // BRK.B fails -> dash variant hits
    assert(resolved("aapl").contains("AAPL"))
    assert(resolved("zzzz").isEmpty)
  }

  test("preflight report artifacts: normalization map csv + missing list") {
    val http = new FakeHttp(Map("tickers/BRK-B" -> "{}", "tickers/AAPL" -> "{}"))
    val rows = RefData.preflight(http, "http://x", Seq("brk/b", "aapl", "zz,zz"))
    val dir = java.nio.file.Files.createTempDirectory("preflight").toString
    RefData.writePreflightReport(rows, dir)
    // leading-underscore files are Spark-hidden by convention (like the
    // reference's pandas-written reports) — reread with plain file IO
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "_ticker_normalization_map.csv"))
    assert(lines.get(0) ==
      "original,normalized_guess,resolved,status,tried_variants")
    assert(lines.contains("brk/b,BRK.B,BRK-B,OK,BRK.B|BRK-B|BRKB|BRK"))
    assert(lines.contains("aapl,AAPL,AAPL,OK,AAPL"))
    // comma in the raw symbol is csv-quoted
    assert(lines.stream.anyMatch(l =>
      l.startsWith("\"zz,zz\"") && l.contains("MISSING")))
    val missing = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_missing_tickers.txt")).trim
    assert(missing == "zz,zz")
    // no-probe identity path: everything ASSUMED, missing list empty
    val dir2 = java.nio.file.Files.createTempDirectory("preflight2").toString
    RefData.writePreflightReport(
      RefData.preflight(http, "http://x", Seq("brk/b"), probe = false), dir2)
    val assumed = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir2, "_ticker_normalization_map.csv")).get(1)
    assert(assumed == "brk/b,BRK.B,BRK.B,ASSUMED,BRK.B")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir2, "_missing_tickers.txt")).isEmpty)
  }

  test("ticker-events placeholder has the contract schema and zero rows") {
    val e = RefData.emptyTickerEvents(spark)
    assert(e.count() == 0)
    assert(e.columns.toSeq ==
      Seq("ticker", "event_type", "date", "old_value", "new_value"))
  }
}
