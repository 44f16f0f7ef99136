package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.streaming.Sessionize.{Event, Session}

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(user: Long, t: String) =
    Event(user, Timestamp.valueOf(t), 1.0)

  test("bounded sessionization splits on the gap") {
    val events = Seq(
      ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:10:00"),
      ev(1, "2024-01-01 11:30:00"), // > 30 min gap -> new session
      ev(2, "2024-01-01 09:00:00"))
    val out = Sessionize.sessionsBounded(spark, events.toDS(), gapSeconds = 1800)
      .sortBy(s => (s.user_id, s.start_us))
    assert(out.map(s => (s.user_id, s.n_events)) == Seq((1L, 2), (1L, 1), (2L, 1)))
  }

  test("streaming sessionization closes sessions via watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.sessionsStream(mem.toDS(), gapSeconds = 1800,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two events in one session
      mem.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:10:00"))
      q.processAllAvailable()
      // batch 2: far-future event advances the watermark past the gap
      // horizon -> user 1's session times out and emits
      mem.addData(ev(2, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      mem.addData(ev(2, "2024-01-01 16:00:00"))
      q.processAllAvailable()
      val got = spark.table("sess_out").as[Session].collect()
        .sortBy(s => (s.user_id, s.start_us))
      assert(got.exists(s => s.user_id == 1L && s.n_events == 2),
        got.mkString(","))
    } finally q.stop()
  }

  test("streaming result matches the batch formulation on the same data") {
    val events = Seq(
      ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:20:00"),
      ev(1, "2024-01-01 12:00:00"), ev(3, "2024-01-01 10:05:00"))
    val batch = Sessionize.sessionsBounded(spark, events.toDS(), 1800)
      .map(s => (s.user_id, s.start_us, s.end_us, s.n_events)).toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.sessionsStream(mem.toDS(), 1800, "5 minutes")
      .writeStream.format("memory").queryName("sess_cmp")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      // watermark flush: one far-future event per... use a sentinel user
      mem.addData(ev(99, "2024-01-02 00:00:00"))
      q.processAllAvailable()
      val streamed = spark.table("sess_cmp").as[Session].collect()
        .filter(_.user_id != 99L)
        .map(s => (s.user_id, s.start_us, s.end_us, s.n_events)).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }
}
