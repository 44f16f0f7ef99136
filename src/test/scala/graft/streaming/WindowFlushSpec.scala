package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Out-of-order replay arms for the Spark-native windowed-aggregate +
  * far-future-sentinel-flush device the streaming query rows rest on
  * (qst3/qst19's windowed histogram, qst22's per-cell count,
  * qst8/qst9's per-doc counts). The SessionizeSpec two-half replay
  * pattern applied to the BUILT-IN aggregate: the rows' correctness
  * argument assumes (a) a late-but-inside-watermark arrival MERGES
  * into the same (window, key) state an earlier micro-batch opened,
  * (b) each window flushes EXACTLY ONCE with the merged counts when
  * the sentinel advances the watermark past its end, and (c) the
  * sentinel's own far-future window never flushes. Those assumptions
  * had only ever been exercised with each group's rows delivered in
  * one micro-batch; this spec delivers them split and out of order.
  */
class WindowFlushSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(t: String) = Timestamp.valueOf(t)

  test("windowed count merges late-but-in-watermark arrivals across " +
      "micro-batches and flushes each window exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, Timestamp)]
    val counts = mem.toDS().toDF("cell", "ts")
      .withWatermark("ts", "4 hours")
      .groupBy(window(col("ts"), "1 hour"), col("cell"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("cell"), col("n"))
    val q = counts.writeStream.format("memory").queryName("wflush")
      .outputMode("append").start()
    try {
      // micro-batch 1: window A [10:00,11:00) partially, window B
      // [11:00,12:00) fully — watermark advances to 07:30
      mem.addData((0, ts("2024-01-01 10:05:00")),
        (1, ts("2024-01-01 10:05:00")), (0, ts("2024-01-01 11:30:00")))
      q.processAllAvailable()
      // micro-batch 2: LATE window-A rows (10:15 < the max seen, but
      // inside the 4h watermark) for BOTH an already-open group
      // (cell 0) and a new group (cell 2) — batch semantics say they
      // merge into window A's state, not open a duplicate window
      mem.addData((0, ts("2024-01-01 10:15:00")),
        (2, ts("2024-01-01 10:15:00")))
      q.processAllAvailable()
      // sentinel: far future, flushes every real window; its own
      // window must never appear in the sink
      mem.addData((-1, ts("2100-01-01 00:00:00")))
      q.processAllAvailable()
      val got = spark.table("wflush")
        .as[(Timestamp, Int, Long)].collect().toSet
      spark.catalog.dropTempView("wflush")
      val wA = ts("2024-01-01 10:00:00")
      val wB = ts("2024-01-01 11:00:00")
      // exactly the batch groupBy over the union of both deliveries,
      // each (window, cell) emitted once, sentinel absent
      assert(got === Set((wA, 0, 2L), (wA, 1, 1L), (wA, 2, 1L),
        (wB, 0, 1L)))
    } finally q.stop()
  }

  test("a row OLDER than the watermark is dropped, not resurrected as " +
      "a duplicate window emission") {
    // the other half of the sentinel-flush contract: once the
    // watermark passes a window's end and it flushes, a straggler for
    // that window must be discarded — append mode never re-emits a
    // finalized window, so admitting it would silently lose the row
    // into state that never flushes (or worse, double-emit)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, Timestamp)]
    val counts = mem.toDS().toDF("cell", "ts")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("cell"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("cell"), col("n"))
    val q = counts.writeStream.format("memory").queryName("wdrop")
      .outputMode("append").start()
    try {
      mem.addData((0, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // advance watermark past window A's end (12:00 - 1h = 11:00 >=
      // 11:00): window A flushes with n=1
      mem.addData((1, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // straggler for the already-flushed window A — beyond watermark
      mem.addData((0, ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      mem.addData((-1, ts("2100-01-01 00:00:00")))
      q.processAllAvailable()
      val got = spark.table("wdrop")
        .as[(Timestamp, Int, Long)].collect().toSet
      spark.catalog.dropTempView("wdrop")
      val wA = ts("2024-01-01 10:00:00")
      val wB = ts("2024-01-01 12:00:00")
      // window A appears ONCE with the pre-flush count only
      assert(got === Set((wA, 0, 1L), (wB, 1, 1L)))
    } finally q.stop()
  }
}
