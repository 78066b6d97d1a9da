package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful stream sessionization via flatMapGroupsWithState — the
  * streaming twin of declared query q55_sessionize (batch lag/cumsum form).
  * SURVEY.md §2.10 notes stateful ops have no direct reference grounding;
  * this is the extension-tier stream-state surface the builder prompt asks
  * for (`KeyValueGroupedDataset.flatMapGroupsWithState`).
  *
  * State per user: (current session id, last event epoch-sec). An event
  * more than `gapSec` after the previous one opens a new session. Emits one
  * row per closed-or-updated session per batch.
  *
  * State is BOUNDED (round 3; ADVICE r01): the query watermarks event time
  * and the handler arms an event-time timeout at lastSec + GapSec — once
  * the watermark passes a user's gap horizon their state is dropped. A
  * quiet user costs nothing forever; without this, state grows with the
  * all-time user count on a long-running stream. Dropping state at the
  * gap horizon cannot change results: any later event for that user is
  * > GapSec after lastSec, so it would have opened a new session anyway —
  * which is exactly what a fresh state does (sessionNo restarts per
  * state's lifetime; session ids are unique per (user, state epoch), the
  * same contract the per-batch fragment emission already has).
  */
object Sessionize {

  case class Event(user_id: Long, event_id: Long, sec: Long)
  case class EventT(user_id: Long, event_id: Long, sec: Long,
      ts: java.sql.Timestamp)
  case class SessionState(sessionNo: Long, lastSec: Long)
  case class SessionOut(user_id: Long, session_no: Long, n_events: Long,
      start_sec: Long, end_sec: Long)

  val GapSec = 1800L

  /** Per-batch group handler: folds sorted events into gap-separated
    * sessions, carrying (sessionNo, lastSec) across batches; re-arms the
    * event-time timeout after every batch and clears state when the
    * timeout fires (all the user's sessions were already emitted).
    */
  def handle(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      // watermark passed lastSec + GapSec: no in-flight session fragment
      // can continue; everything was emitted in prior batches
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toSeq.sortBy(e => (e.sec, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var (sessNo, lastSec) = state.getOption
      .map(s => (s.sessionNo, s.lastSec)).getOrElse((0L, Long.MinValue))
    val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
    var curStart = -1L
    var curCount = 0L
    var curEnd = -1L
    sorted.foreach { e =>
      if (lastSec == Long.MinValue || e.sec - lastSec > GapSec) {
        if (curCount > 0)
          out += SessionOut(userId, sessNo, curCount, curStart, curEnd)
        sessNo += 1
        curStart = e.sec; curCount = 0
      } else if (curCount == 0) {
        // continuation fragment of a session opened in a prior batch
        curStart = e.sec
      }
      curCount += 1; curEnd = e.sec; lastSec = e.sec
    }
    if (curCount > 0)
      out += SessionOut(userId, sessNo, curCount, curStart, curEnd)
    state.update(SessionState(sessNo, lastSec))
    // event-time expiry: fire once the watermark passes the gap horizon
    // (clamped above the current watermark, as Spark requires)
    state.setTimeoutTimestamp(
      math.max((lastSec + GapSec) * 1000L, state.getCurrentWatermarkMs() + 1))
    out.iterator
  }

  private def handleT(
      userId: Long,
      events: Iterator[EventT],
      state: GroupState[SessionState]): Iterator[SessionOut] =
    handle(userId, events.map(e => Event(e.user_id, e.event_id, e.sec)), state)

  /** Wire a streaming Dataset[Event] through the stateful handler with a
    * GapSec watermark + event-time state timeout (bounded state).
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", col("sec").cast("timestamp"))
      .withWatermark("ts", s"$GapSec seconds")
      .as[EventT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(handleT)
  }
}
