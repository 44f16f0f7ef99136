package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based session windows over an event stream via
  * `flatMapGroupsWithState` — the stateful Structured Streaming twin of
  * the batch formulation in query q30_sessionize (cumulative sum of
  * gap breaks over the time-sorted event sequence).
  *
  * Semantics contract: after every in-watermark event has been folded,
  * the emitted session set is EXACTLY the batch set — including for
  * out-of-order delivery. That forces two things the naive
  * single-open-session fold gets wrong:
  *
  *   1. a late event can extend a session BACKWARD
  *      (`start_us = min(start_us, us)`), and
  *   2. a late event more than a gap before an open session's start is
  *      its own (earlier) session, not a member of the open one.
  *
  * So state per user is a LIST of open sessions — pairwise separated
  * by more than the gap, hence mergeable as intervals — and each
  * micro-batch folds its (sorted) events into proto-sessions, merges
  * interval-wise with the state, and closes exactly those sessions the
  * watermark can no longer legally extend (`watermark > end + gap`).
  * The list is bounded by the watermark horizon: only sessions whose
  * gap horizon is still above the watermark stay open, so state size
  * is O(events within one watermark delay / gap), not O(history).
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(startUs: Long, lastUs: Long, n: Int)
  /** Stream state: open sessions ascending by start, pairwise > gap apart. */
  case class OpenSessions(sessions: List[OpenSession])
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  /** Exact epoch-µs of a Timestamp. `getTime * 1000` would truncate to
    * ms — the testdata events are µs-precision, and the batch twin
    * (q30) compares `unix_micros`, so the sub-ms part is load-bearing.
    */
  private def usOf(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** THE fold: ascending event times → gap-delimited sessions, ascending
    * by start. Shared verbatim by the bounded path and (per micro-batch)
    * the stream path, so the two cannot drift.
    */
  private[streaming] def foldSorted(
      sortedUs: Seq[Long], gapUs: Long): List[OpenSession] = {
    val out = scala.collection.mutable.ListBuffer.empty[OpenSession]
    var open: Option[OpenSession] = None
    sortedUs.foreach { us =>
      open match {
        case Some(s) if us - s.lastUs <= gapUs =>
          open = Some(OpenSession(s.startUs, us, s.n + 1))
        case Some(s) =>
          out += s
          open = Some(OpenSession(us, us, 1))
        case None =>
          open = Some(OpenSession(us, us, 1))
      }
    }
    open.foreach(out += _)
    out.toList
  }

  /** Merge two session lists interval-wise: any two sessions within the
    * gap of each other (overlapping, or separated by ≤ gap on either
    * side) coalesce into one with `start = min`, `end = max`, counts
    * summed. Both inputs are internally gap-chained, so coalescing on
    * the ≤-gap adjacency over the start-sorted union reproduces exactly
    * the batch fold over the merged sorted event sequence.
    */
  private[streaming] def mergeSessions(
      a: List[OpenSession], b: List[OpenSession],
      gapUs: Long): List[OpenSession] = {
    val sorted = (a ++ b).sortBy(s => (s.startUs, s.lastUs))
    val out = scala.collection.mutable.ListBuffer.empty[OpenSession]
    var cur: Option[OpenSession] = None
    sorted.foreach { s =>
      cur match {
        case Some(c) if s.startUs - c.lastUs <= gapUs =>
          cur = Some(OpenSession(c.startUs,
            math.max(c.lastUs, s.lastUs), c.n + s.n))
        case Some(c) =>
          out += c
          cur = Some(s)
        case None =>
          cur = Some(s)
      }
    }
    cur.foreach(out += _)
    out.toList
  }

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
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[OpenSessions]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // a session is final once no admissible (≥ watermark) event can
          // land within its gap horizon
          def isClosed(s: OpenSession): Boolean = wmUs > s.lastUs + gapUs

          val prior = state.getOption.map(_.sessions).getOrElse(Nil)
          val merged =
            if (state.hasTimedOut) prior
            else mergeSessions(prior,
              foldSorted(rows.map(e => usOf(e.ts)).toSeq.sorted, gapUs), gapUs)
          val (closed, open) = merged.partition(isClosed)

          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open))
            // wake once the watermark passes the earliest open horizon;
            // must be strictly above the current watermark to be legal
            val horizonMs = open.map(s => (s.lastUs + gapUs) / 1000L).min + 1L
            state.setTimeoutTimestamp(
              math.max(horizonMs, state.getCurrentWatermarkMs() + 1L))
          }
          closed.iterator.map(s => Session(user, s.startUs, s.lastUs, s.n))
      }
  }

  /** Run the same fold over a bounded source and collect all sessions —
    * drives the identical `foldSorted` code path for tests and backfills.
    */
  def sessionsBounded(
      spark: SparkSession,
      events: Dataset[Event],
      gapSeconds: Long = 1800): Seq[Session] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events.groupByKey(_.user_id).flatMapGroups { (user, rows) =>
      foldSorted(rows.map(e => usOf(e.ts)).toSeq.sorted, gapUs)
        .iterator.map(s => Session(user, s.startUs, s.lastUs, s.n))
    }.collect().toSeq
  }
}
