package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Per-user running state of the T34 deltaSum streaming twin: the last
  * seen cents value under the (ts, event_id) total order, the
  * positive-delta sum, the reset count, and the row count. Constant-size
  * per key — the state store never holds a sequence.
  */
case class DeltaSumState(lastC: Long, posSum: Long, resets: Long, n: Long,
    lastOrd: String)

/** Output row shape — matches q205's batch rollup exactly. */
case class DeltaSumRow(user_id: Long, n_events: Long,
    delta_sum_cents: Long, n_resets: Long, last_cents: Long)

/** Streaming twin of q205 (T34s): deltaSum is NOT an unordered-associative
  * aggregate (the batch twins' complete-mode count folds are), so the
  * incremental form keeps ORDER-AWARE per-user state via
  * mapGroupsWithState: within a micro-batch the group's rows sort by the
  * ord key in memory (a per-user, per-batch bounded sort); across batches
  * the source must deliver ord-monotone batches per user — the replay
  * contract of a log-structured event store (files cut by ord range,
  * AvailableNow, maxFilesPerTrigger=1). ClickHouse's deltaSum state makes
  * the same monotone assumption when merging parts; the out-of-order-safe
  * variant is its deltaSumTimestamp, which discards late segments rather
  * than reordering them. The contract is SELF-ENFORCING here, not
  * conventional: state carries the last applied ord and a cross-batch row
  * arriving at or below it is DISCARDED (the deltaSumTimestamp behavior)
  * instead of silently corrupting posSum/resets — `StreamingSpec` T34s
  * pins streamed == batch under monotone replay, and the late-segment
  * case pins the discard. The per-batch in-memory sort buffers one
  * user's slice of ONE micro-batch (bounded by the trigger's file cut,
  * maxFilesPerTrigger=1), never the full history.
  */
object DeltaSumStream {

  /** Fold a (possibly streaming) frame of (user_id, o, c) rows — the
    * q205 `deltaEvents` projection — into per-user deltaSum rows. Each
    * batch emits the UPDATED users' current totals (update output mode);
    * the final row per user equals the batch q205 answer.
    */
  def fold(ev: DataFrame): Dataset[DeltaSumRow] = {
    val s = ev.sparkSession
    import s.implicits._
    ev.selectExpr("user_id", "o", "c").as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[DeltaSumState, DeltaSumRow](
        GroupStateTimeout.NoTimeout) { case (uid, rows, gs) =>
        var st = gs.getOption.getOrElse(DeltaSumState(0L, 0L, 0L, 0L, ""))
        rows.toSeq.sortBy(_._2).foreach { case (_, o, c) =>
          // Late cross-batch segment (ord not past the last applied ord):
          // discard, like ClickHouse deltaSumTimestamp — never fold it
          // into posSum/resets out of order. Ords are unique per user
          // (the key embeds event_id), so `<=` only drops true replays
          // and late arrivals, never fresh in-order rows.
          if (st.n == 0L || o > st.lastOrd) {
            if (st.n > 0L) {
              val d = c - st.lastC
              if (d > 0L) st = st.copy(posSum = st.posSum + d)
              else if (d < 0L) st = st.copy(resets = st.resets + 1L)
            }
            st = st.copy(lastC = c, n = st.n + 1L, lastOrd = o)
          }
        }
        gs.update(st)
        DeltaSumRow(uid, st.n, st.posSum, st.resets, st.lastC)
      }
  }
}
