package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IngestStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("file-drop stream lands normalized bars in the lake (AvailableNow)") {
    val tmp = Files.createTempDirectory("graft_stream").toString
    val watch = s"$tmp/in"; new java.io.File(watch).mkdirs()
    def epochMs(day: String) = java.sql.Timestamp.valueOf(s"$day 21:00:00").getTime
    Files.writeString(java.nio.file.Paths.get(s"$watch/d1.csv"),
      "ticker,window_start,open,high,low,close,volume,transactions,vwap\n" +
        s"aapl,${epochMs("2024-01-02")},1,2,0.5,1.5,100,5,1.2\n" +
        s"msft,${epochMs("2024-02-01")},5,6,4.5,5.5,300,7,5.2\n")
    val q = IngestStream.start(spark, watch, s"$tmp/lake", s"$tmp/ckpt",
      availableNow = true)
    q.awaitTermination(120000)
    val lake = spark.read.parquet(s"$tmp/lake")
    assert(lake.count() == 2)
    assert(lake.filter($"ticker" === "AAPL").select($"close").as[Float].head() == 1.5f)
    // idempotent re-run: no new files -> no duplicate rows
    val q2 = IngestStream.start(spark, watch, s"$tmp/lake", s"$tmp/ckpt",
      availableNow = true)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$tmp/lake").count() == 2)
  }

  test("hourly rollup aggregates minute bars with event-time windows") {
    val bars = Seq(
      ("2024-01-02 14:30:00", "AAPL", 10.0f, 11.0f, 9.0f, 10.5f, 100L),
      ("2024-01-02 14:45:00", "AAPL", 10.5f, 12.0f, 10.0f, 11.5f, 200L),
      ("2024-01-02 15:10:00", "AAPL", 11.5f, 13.0f, 11.0f, 12.5f, 300L))
      .toDF("dt", "ticker", "open", "high", "low", "close", "volume")
      .select(to_timestamp($"dt").as("datetime"), $"ticker", $"open", $"high",
        $"low", $"close", $"volume")
    val out = IngestStream.hourlyRollup(bars)
      .orderBy($"datetime")
      .select(date_format($"datetime", "HH:mm").as("h"), $"open", $"high",
        $"low", $"close", $"volume")
      .as[(String, Float, Float, Float, Float, Long)].collect()
    assert(out.toSeq == Seq(
      ("14:00", 10.0f, 12.0f, 9.0f, 11.5f, 300L),
      ("15:00", 11.5f, 13.0f, 11.0f, 12.5f, 300L)))
  }
}
