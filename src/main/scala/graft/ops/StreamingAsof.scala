package graft.ops

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of join — the stateful twin of
  * [[AsofJoin.backward]] (declared q95), completing the batch/streaming
  * twin pattern (q39/q100/q55 each have one; the as-of pair didn't).
  *
  * Both sides arrive as ONE keyed stream (side 0 = reference rows, side 1
  * = probe rows), grouped by key through `flatMapGroupsWithState`. State
  * per key is an ordered buffer: the reference rows seen so far plus the
  * probe rows whose results are not yet safe to emit. A probe at time t
  * may only be matched once the WATERMARK passes t — before that, an
  * out-of-order reference row ≤ t could still arrive and change "latest
  * at-or-before" — so emission is watermark-gated, which makes the
  * result equal to the batch operator's regardless of arrival order
  * (parity-proven in `StreamingSpec` against the same fixture q95 reads).
  *
  * State is BOUNDED on both components:
  *  - pending probes drain at the watermark (arrival lag, not history);
  *  - reference rows older than the newest one at-or-below the watermark
  *    are SHADOWED for every future probe (any future probe has t >
  *    watermark ≥ that newest row's time, which therefore beats every
  *    older row) and are pruned each invocation. Steady-state per key:
  *    one shadow row + the in-flight watermark window.
  *
  * Late rows below the watermark are dropped by the engine before the
  * handler runs — the standard streaming-latency contract, same as every
  * watermarked op in this repo. Tie semantics match the batch op: a
  * reference row at exactly the probe's time is visible (inclusive ≥).
  * The reference side keeps the batch op's uniqueness contract (unique
  * per (key, time) — pre-aggregate ties upstream).
  */
object StreamingAsof {

  /** side 0 = reference (carried) row, side 1 = probe row; `t` is the
    * event time in µs and `ts` its timestamp rendering (watermark column).
    */
  case class In(user_id: Long, side: Int, t: Long, ev_id: Long,
      value: Double, ts: java.sql.Timestamp)
  case class Ref(t: Long, value: Double)
  case class Probe(t: Long, ev_id: Long)
  case class Buf(refs: Seq[Ref], pending: Seq[Probe])
  case class Match(user_id: Long, ev_id: Long, t: Long,
      m_t: Option[Long], m_value: Option[Double])

  def handle(key: Long, rows: Iterator[In],
      state: GroupState[Buf]): Iterator[Match] = {
    val prev = state.getOption.getOrElse(Buf(Nil, Nil))
    val batch = rows.toSeq
    val refs = (prev.refs ++
      batch.filter(_.side == 0).map(r => Ref(r.t, r.value))).sortBy(_.t)
    val pending = prev.pending ++
      batch.filter(_.side == 1).map(p => Probe(p.t, p.ev_id))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (ready, waiting) = pending.partition(_.t <= wmUs)
    val out = ready.sortBy(p => (p.t, p.ev_id)).map { p =>
      val m = refs.takeWhile(_.t <= p.t).lastOption
      Match(key, p.ev_id, p.t, m.map(_.t), m.map(_.value))
    }
    // prune refs shadowed for every future probe: all but the newest
    // at-or-below the watermark
    val newestCovered = refs.lastIndexWhere(_.t <= wmUs)
    val kept = if (newestCovered <= 0) refs else refs.drop(newestCovered)
    if (waiting.isEmpty && kept.isEmpty) state.remove()
    else {
      state.update(Buf(kept, waiting))
      // flush guarantee when no further rows arrive for this key: fire
      // once the watermark passes the oldest pending probe
      if (waiting.nonEmpty)
        state.setTimeoutTimestamp(math.max(waiting.map(_.t).min / 1000L,
          state.getCurrentWatermarkMs() + 1))
    }
    out.iterator
  }

  /** Wire a streaming `Dataset[In]` through the handler with the given
    * watermark delay (e.g. "1 second"); Append-mode output.
    */
  def asof(in: Dataset[In], delay: String): Dataset[Match] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(handle)
  }
}
