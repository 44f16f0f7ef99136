package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class StreamDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("duplicates within the watermark horizon are dropped; state evicts after it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamDedup.exactDedupStream(
      mem.toDS().toDF("doc_id", "ts", "text"), "text", "ts",
      watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: same normalized content three times + one distinct doc
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), "The  quick brown fox"),
        (2L, ts("2024-01-01 10:05:00"), "the quick brown fox"),
        (3L, ts("2024-01-01 10:10:00"), "something else entirely"),
        (4L, ts("2024-01-01 10:20:00"), "THE QUICK BROWN FOX"))
      q.processAllAvailable()
      val b1 = spark.table("dedup_out").select($"doc_id").as[Long].collect().toSet
      assert(b1 == Set(1L, 3L), s"first occurrence wins: $b1")

      // batch 2: far-future row pushes the watermark hours past batch 1,
      // evicting its fingerprint state
      mem.addData((5L, ts("2024-01-01 15:00:00"), "watermark advancer"))
      q.processAllAvailable()
      // batch 3: the same content re-arrives AFTER the horizon — it is a
      // legitimate new snapshot and must be accepted again
      mem.addData((6L, ts("2024-01-01 15:10:00"), "the quick brown fox"))
      q.processAllAvailable()
      val all = spark.table("dedup_out").select($"doc_id").as[Long].collect().toSet
      assert(all.contains(6L), s"state must evict past the horizon: $all")
      assert(!all.contains(2L) && !all.contains(4L), s"dups stay dropped: $all")
    } finally q.stop()
  }
}
