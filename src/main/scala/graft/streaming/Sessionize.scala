package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based session windows over an event stream via
  * `flatMapGroupsWithState` — the stateful Structured Streaming twin of
  * the batch formulation in query q30_sessionize (cumulative sum of
  * gap breaks). State per user is one open session; a session closes
  * when an event arrives past the gap, or when the event-time timeout
  * fires after the watermark passes sessionStart + gap.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(startUs: Long, lastUs: Long, n: Int)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  /** Exact epoch-µs of a Timestamp. `getTime * 1000` would truncate to
    * ms — the testdata events are µs-precision, and the batch twin
    * (q30) compares `unix_micros`, so the sub-ms part is load-bearing.
    */
  private def usOf(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def sessionsStream(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    events
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.startUs, s.lastUs, s.n))
          } else {
            val sorted = rows.map(e => usOf(e.ts)).toSeq.sorted
            var closed = List.empty[Session]
            var open = state.getOption
            sorted.foreach { us =>
              open match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  open = Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(user, s.startUs, s.lastUs, s.n)
                  open = Some(OpenSession(us, us, 1))
                case None =>
                  open = Some(OpenSession(us, us, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close once the watermark passes the session's gap horizon
              state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Run the stream over a bounded source and collect all sessions —
    * drives the same code path with AvailableNow-style semantics for
    * tests and backfills.
    */
  def sessionsBounded(
      spark: SparkSession,
      events: Dataset[Event],
      gapSeconds: Long = 1800): Seq[Session] = {
    import spark.implicits._
    // batch path: same fold, executed per user via groupByKey
    events.groupByKey(_.user_id).flatMapGroups { (user, rows) =>
      val sorted = rows.map(e => usOf(e.ts)).toSeq.sorted
      val gapUs = gapSeconds * 1000000L
      val out = scala.collection.mutable.ListBuffer.empty[Session]
      var open: Option[OpenSession] = None
      sorted.foreach { us =>
        open match {
          case Some(s) if us - s.lastUs <= gapUs =>
            open = Some(s.copy(lastUs = us, n = s.n + 1))
          case Some(s) =>
            out += Session(user, s.startUs, s.lastUs, s.n)
            open = Some(OpenSession(us, us, 1))
          case None => open = Some(OpenSession(us, us, 1))
        }
      }
      open.foreach(s => out += Session(user, s.startUs, s.lastUs, s.n))
      out.iterator
    }.collect().toSeq
  }
}
