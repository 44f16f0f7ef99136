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

  test("late-but-in-watermark events match batch: backward extension and " +
      "backward gap split across micro-batches") {
    // The killer for the old single-open-session fold: after batch 1 the
    // open session is [10:00, 10:10]. Batch 2 delivers two LATE events
    // still inside the 4h watermark: 08:00 (more than a gap BEFORE the
    // open start — batch semantics give it its OWN session) and 09:45
    // (within the gap before the start — batch semantics extend start_us
    // BACKWARD). The old fold merged both forward (us - lastUs < 0 ≤ gap)
    // and never moved start_us, emitting one session [10:00,10:10] n=4.
    val events = Seq(
      ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:10:00"),
      ev(1, "2024-01-01 08:00:00"), ev(1, "2024-01-01 09:45:00"))
    val batch = Sessionize.sessionsBounded(spark, events.toDS(), 1800)
      .map(s => (s.user_id, s.start_us, s.end_us, s.n_events)).toSet
    // batch oracle: {[08:00,08:00] n=1, [09:45,10:10] n=3}
    assert(batch.map(_._4) == Set(1, 3))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.sessionsStream(mem.toDS(), 1800, "4 hours")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events(0), events(1)) // in-order prefix
      q.processAllAvailable()           // watermark -> 06:10
      mem.addData(events(2), events(3)) // late, admitted by watermark
      q.processAllAvailable()
      mem.addData(ev(99, "2024-01-03 00:00:00")) // flush all horizons
      q.processAllAvailable()
      val streamed = spark.table("sess_late").as[Session].collect()
        .filter(_.user_id != 99L)
        .map(s => (s.user_id, s.start_us, s.end_us, s.n_events)).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("the bounded and stream folds are one function: foldSorted + " +
      "mergeSessions reproduce the batch fold on a split delivery") {
    val gapUs = 1800L * 1000000L
    val all = Seq(100L, 200L, 5000000000L, 5000000100L).sorted
    val whole = Sessionize.foldSorted(all.map(_ * 1000000L), gapUs)
    // deliver in two out-of-order halves and merge
    val h1 = Sessionize.foldSorted(
      Seq(5000000000L, 5000000100L).map(_ * 1000000L), gapUs)
    val h2 = Sessionize.foldSorted(Seq(100L, 200L).map(_ * 1000000L), gapUs)
    assert(Sessionize.mergeSessions(h1, h2, gapUs) == whole)
  }
}
