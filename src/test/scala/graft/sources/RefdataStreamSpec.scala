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
