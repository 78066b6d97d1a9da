package graft

import java.nio.file.{Files, Paths}

import graft.ops.Sessionize
import graft.ops.Sessionize.{Event, SessionOut}

/** Stateful stream sessionization: state carries across micro-batches, and
  * the session split agrees with the batch q55 lag/cumsum semantics.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("handle() splits on gap and carries state across batches") {
    val state = new TestGroupState[Sessionize.SessionState]
    // batch 1: two events 10s apart → one open session
    val out1 = Sessionize.handle(7L,
      Iterator(Event(7, 1, 1000), Event(7, 2, 1010)), state).toSeq
    assert(out1 == Seq(SessionOut(7, 1, 2, 1000, 1010)))
    // batch 2: continuation (within gap) then a far jump → session 2
    val out2 = Sessionize.handle(7L,
      Iterator(Event(7, 3, 1020), Event(7, 4, 9999)), state).toSeq
    assert(out2 == Seq(
      SessionOut(7, 1, 1, 1020, 1020),   // continuation of session 1
      SessionOut(7, 2, 1, 9999, 9999)))
    assert(state.get.sessionNo == 2L)
  }

  test("state arms an event-time timeout and expires at the gap horizon") {
    val state = new TestGroupState[Sessionize.SessionState]
    Sessionize.handle(9L, Iterator(Event(9, 1, 5000)), state).toSeq
    // timeout armed at lastSec + GapSec (ms): state cannot outlive the gap
    assert(state.timeoutTs == (5000L + Sessionize.GapSec) * 1000L)
    // watermark passes the horizon -> Spark invokes with hasTimedOut=true:
    // state must be dropped and nothing (re-)emitted
    state.timedOut = true
    val out = Sessionize.handle(9L, Iterator.empty, state).toSeq
    assert(out.isEmpty && !state.exists)
    // a later event after expiry starts a fresh session (same split the
    // retained state would have produced for a > gap jump)
    state.timedOut = false
    val out2 = Sessionize.handle(9L, Iterator(Event(9, 2, 99999)), state).toSeq
    assert(out2 == Seq(SessionOut(9, 1, 1, 99999, 99999)))
  }

  test("armed timeout is clamped above the current watermark") {
    val state = new TestGroupState[Sessionize.SessionState]
    state.watermarkMs = (5000L + Sessionize.GapSec) * 1000L + 7777L
    Sessionize.handle(9L, Iterator(Event(9, 1, 5000)), state).toSeq
    assert(state.timeoutTs == state.watermarkMs + 1)
  }

  test("streaming sessionize matches q55 session boundaries on a fixture") {
    val dir = Files.createTempDirectory("sessjson").toString
    // user 1: 3 events, gap between #2 and #3; user 2: single event
    Files.write(Paths.get(dir, "e.json"), Seq(
      """{"user_id": 1, "event_id": 1, "sec": 100}""",
      """{"user_id": 1, "event_id": 2, "sec": 200}""",
      """{"user_id": 1, "event_id": 3, "sec": 99999}""",
      """{"user_id": 2, "event_id": 4, "sec": 500}""").mkString("\n").getBytes)
    val schema = org.apache.spark.sql.Encoders.product[Event].schema
    val stream = spark.readStream.schema(schema).json(dir).as[Event]
    val q = Sessionize.sessionize(stream).writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("sessckpt").toString)
      .format("memory").queryName("sessions")
      .outputMode("append")
      .start()
    q.awaitTermination(60000)
    val got = spark.table("sessions").as[SessionOut].collect()
      .sortBy(s => (s.user_id, s.session_no)).toSeq
    assert(got == Seq(
      SessionOut(1, 1, 2, 100, 200),
      SessionOut(1, 2, 1, 99999, 99999),
      SessionOut(2, 1, 1, 500, 500)))
  }
}

/** Minimal in-memory GroupState for driving handle() directly; records the
  * armed timeout timestamp and lets tests flip the timed-out flag.
  */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  private var value: Option[S] = None
  var timedOut: Boolean = false
  var timeoutTs: Long = -1L
  var watermarkMs: Long = 0L
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(s: S): Unit = { value = Some(s) }
  override def remove(): Unit = { value = None }
  override def hasTimedOut: Boolean = timedOut
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = { timeoutTs = t }
  override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = watermarkMs
  override def getCurrentProcessingTimeMs(): Long = 0L
}
