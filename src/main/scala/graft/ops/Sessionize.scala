package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
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
  */
object Sessionize {

  case class Event(user_id: Long, event_id: Long, sec: Long)
  case class SessionState(sessionNo: Long, lastSec: Long)
  case class SessionOut(user_id: Long, session_no: Long, n_events: Long,
      start_sec: Long, end_sec: Long)

  val GapSec = 1800L

  /** Per-batch group handler: folds sorted events into gap-separated
    * sessions, carrying (sessionNo, lastSec) across batches.
    */
  def handle(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
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
    out.iterator
  }

  /** Wire a streaming Dataset[Event] through the stateful handler. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(handle)
  }
}
