package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CompactSpec extends SparkTestBase {
  import spark.implicits._

  test("compaction: fragmented partitions to one file, data intact") {
    val root = Files.createTempDirectory("compact").toString + "/lake"
    // 6 drip-fed appends -> 6 files in the same (ticker, year, month)
    (1 to 6).foreach { d =>
      Seq(("AAPL", java.sql.Timestamp.valueOf(s"2024-01-0$d 10:00:00"), d * 1.0))
        .toDF("ticker", "datetime", "close")
        .withColumn("year", year($"datetime"))
        .withColumn("month", month($"datetime"))
        .write.mode(SaveMode.Append)
        .partitionBy("ticker", "year", "month").parquet(root)
    }
    // plus one partition that is already fine
    Seq(("MSFT", java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 9.0))
      .toDF("ticker", "datetime", "close")
      .withColumn("year", year($"datetime"))
      .withColumn("month", month($"datetime"))
      .write.mode(SaveMode.Append)
      .partitionBy("ticker", "year", "month").parquet(root)

    val before = spark.read.parquet(root).orderBy($"ticker", $"datetime").collect()
    val work = Compact.fragmented(spark, root, maxFiles = 4)
    assert(work === Seq(s"$root/ticker=AAPL/year=2024/month=1"))
    val rewritten = Compact.partitions(spark, root, work)
    assert(rewritten === 6L)

    val after = spark.read.parquet(root)
    assert(after.orderBy($"ticker", $"datetime").collect() === before)
    val filesPer = after.withColumn("__file", input_file_name())
      .groupBy($"ticker").agg(countDistinct($"__file").as("f"))
      .as[(String, Long)].collect().toMap
    assert(filesPer("AAPL") === 1L) // compacted
    assert(filesPer("MSFT") === 1L) // untouched
    assert(Compact.fragmented(spark, root, maxFiles = 4).isEmpty)
  }
}
