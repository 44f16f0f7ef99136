package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

class RefdataStreamSpec extends SparkTestBase {

  private def readFeed(total: Long, perBatch: Long) =
    spark.readStream.format("graft-refdata")
      .option("tickers", "AAPL,MSFT,NVDA")
      .option("totalRecords", total)
      .option("recordsPerBatch", perBatch)
      .option("numPartitions", 3)
      .load()

  test("micro-batch source drains the feed exactly once, in cursor order") {
    val ckpt = Files.createTempDirectory("refdata-ckpt").toString
    val q = readFeed(total = 250, perBatch = 100)
      .writeStream.format("memory").queryName("refdata_all")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("refdata_all")
    assert(got.count() === 250)
    // no cursor duplicated or skipped
    assert(got.agg(countDistinct(col("cursor"))).head().getLong(0) === 250)
    assert(got.agg(min(col("cursor")), max(col("cursor"))).head() ===
      org.apache.spark.sql.Row(0L, 249L))
    // deterministic content: cursor k -> tickers[k % 3], dates advance
    val r7 = got.filter(col("cursor") === 7).head()
    assert(r7.getAs[String]("ticker") === "MSFT")
    assert(r7.getAs[java.sql.Date]("ex_date").toString === "2024-01-03")
    assert(math.abs(r7.getAs[Double]("cash_amount") - 0.12) < 1e-12)
  }

  test("checkpoint restart resumes from the committed cursor, no re-pull") {
    val ckpt = Files.createTempDirectory("refdata-ckpt2").toString
    val out = Files.createTempDirectory("refdata-out").toString
    def run(total: Long): Unit = {
      val q = readFeed(total = total, perBatch = 50)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    run(total = 100) // first run drains cursors [0, 100)
    run(total = 200) // feed grew; restart must resume at 100, not 0
    val got = spark.read.parquet(out)
    assert(got.count() === 200)
    assert(got.agg(countDistinct(col("cursor"))).head().getLong(0) === 200)
  }

  // ---- in-JVM localhost fixture for the real-socket path ----
  // Serves the same deterministic records as the stub generator, as
  // JSON lines keyed by the requested cursor range; records every
  // range it served and can inject 429s ahead of the next success, so
  // specs can assert the retry genuinely crossed the socket.
  private class FeedServer {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val served = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val rejectNext = new java.util.concurrent.atomic.AtomicInteger(0)
    val truncateNext = new java.util.concurrent.atomic.AtomicInteger(0)
    val n429 = new java.util.concurrent.atomic.AtomicInteger(0)
    private val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v3/reference/dividends", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (rejectNext.getAndUpdate(i => math.max(0, i - 1)) > 0) {
          n429.incrementAndGet()
          ex.sendResponseHeaders(429, -1)
          ex.close()
          return
        }
        val q = ex.getRequestURI.getRawQuery.split("&")
          .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
        val lo = q("cursor.gte").toLong
        val hi = q("cursor.lt").toLong
        served.add((lo, hi))
        // truncation mode: drop the range's last record — the silent
        // data-loss shape the reader's coverage check must catch
        val upper =
          if (truncateNext.getAndUpdate(i => math.max(0, i - 1)) > 0) hi - 1
          else hi
        val tickers = Array("AAPL", "MSFT", "NVDA")
        val body = (lo until upper).map { k =>
          val t = tickers((k % 3).toInt)
          val d = java.time.LocalDate.ofEpochDay(19723L + k / 3)
          val cash = 0.05 + (k % 40) * 0.01
          s"""{"cursor":$k,"ticker":"$t","ex_date":"$d","cash_amount":$cash}"""
        }.mkString("\n").getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def readHttpFeed(baseUrl: String, total: Long, perBatch: Long) =
    spark.readStream.format("graft-refdata")
      .option("tickers", "AAPL,MSFT,NVDA")
      .option("totalRecords", total)
      .option("recordsPerBatch", perBatch)
      .option("numPartitions", 2)
      .option("baseUrl", baseUrl)
      .option("retryBaseMs", 10)
      .load()

  test("real-socket path: paginated GETs through withRetry survive a 429 " +
      "and match the stub generator record-for-record") {
    import scala.jdk.CollectionConverters._
    val srv = new FeedServer
    try {
      srv.rejectNext.set(1) // first request 429s; withRetry must re-pull
      val ckpt = Files.createTempDirectory("refdata-ckpt4").toString
      val q = readHttpFeed(srv.url, total = 90, perBatch = 30)
        .writeStream.format("memory").queryName("refdata_http")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val got = spark.table("refdata_http")
      assert(got.count() === 90)
      assert(got.agg(countDistinct(col("cursor"))).head().getLong(0) === 90)
      // the 429 genuinely crossed the socket and was retried, not fatal
      assert(srv.n429.get() === 1)
      // socket rows ≡ the stub generator's contract, field for field
      val r7 = got.filter(col("cursor") === 7).head()
      assert(r7.getAs[String]("ticker") === "MSFT")
      assert(r7.getAs[java.sql.Date]("ex_date").toString === "2024-01-03")
      assert(math.abs(r7.getAs[Double]("cash_amount") - 0.12) < 1e-12)
      // pagination was real: the served ranges jointly cover [0, 90)
      // exactly once (the 429'd attempt recorded nothing)
      val ranges = srv.served.asScala.toSeq
      assert(ranges.map(r => r._2 - r._1).sum === 90, ranges.toString)
    } finally srv.stop()
  }

  test("page-line parse handles scientific-notation amounts") {
    val r = RefdataStream.parsePageLine(
      """{"cursor":7,"ticker":"AAPL","ex_date":"2024-01-03","cash_amount":5e-05}""")
    assert(r.getLong(0) === 7L)
    assert(r.getUTF8String(1).toString === "AAPL")
    assert(math.abs(r.getDouble(3) - 5e-05) < 1e-18)
  }

  test("a truncated page fails the query loudly instead of committing " +
      "a cursor gap") {
    val srv = new FeedServer
    try {
      srv.truncateNext.set(1) // next successful page drops its last record
      val ckpt = Files.createTempDirectory("refdata-ckpt6").toString
      val q = readHttpFeed(srv.url, total = 20, perBatch = 20)
        .writeStream.format("memory").queryName("refdata_trunc")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination()
      }
      // the reader's coverage check is the failure, not a parse fluke
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("records")), chain(e).toString)
    } finally srv.stop()
  }

  test("real-socket checkpoint resume re-pulls nothing below the " +
      "committed cursor") {
    import scala.jdk.CollectionConverters._
    val srv = new FeedServer
    try {
      val ckpt = Files.createTempDirectory("refdata-ckpt5").toString
      val out = Files.createTempDirectory("refdata-out2").toString
      def run(total: Long): Unit = {
        val q = readHttpFeed(srv.url, total = total, perBatch = 20)
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination(60000)
      }
      run(total = 40) // drains [0, 40) over the socket
      val before = srv.served.asScala.size
      run(total = 80) // feed grew; the restart must resume at 40
      val after = srv.served.asScala.toSeq.drop(before)
      assert(after.nonEmpty && after.forall(_._1 >= 40), after.toString)
      val got = spark.read.parquet(out)
      assert(got.count() === 80)
      assert(got.agg(countDistinct(col("cursor"))).head().getLong(0) === 80)
    } finally srv.stop()
  }

  test("streamed feed aggregates like its batch twin") {
    val ckpt = Files.createTempDirectory("refdata-ckpt3").toString
    val q = readFeed(total = 300, perBatch = 120)
      .groupBy(col("ticker"))
      .agg(count(lit(1)).as("n"), sum(col("cash_amount")).as("cash"))
      .writeStream.format("memory").queryName("refdata_agg")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val agg = spark.table("refdata_agg").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg === Map("AAPL" -> 100L, "MSFT" -> 100L, "NVDA" -> 100L))
  }
}
