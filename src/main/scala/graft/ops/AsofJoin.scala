package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Backward as-of join — for each left row, the latest right row whose time
  * is ≤ the left row's time within the same key group (the quote-for-trade /
  * dimension-version-at-event-time operator; the reference's date-grained
  * rank facts joined to "state as of that date" imply exactly this shape,
  * e.g. `s3_rankings_collector.py:36` pins a collection date and
  * `rankings_generator.py:120` a fixed `ts` anchor).
  *
  * Spark has no asof join; the classic compositions are (a) a theta range
  * join (left.ts ≥ right.ts) + per-left-row argmax — quadratic candidate
  * blowup per key, and (b) the MERGE form used here: tag both sides, union,
  * one hash shuffle on the key, one per-partition time sort, and a running
  * `last(_, ignoreNulls)` window that carries the most recent right row
  * forward into each left row. No join node at all: cost is
  * O(shuffle(L+R) + sort) — at 100 TB both sides shuffle once on the key
  * and never pair up, the same plan a hand-written cluster merge would use.
  * Left rows with no prior right row surface with null payload (LEFT asof).
  *
  * The matched right row travels as ONE struct, so all carried columns come
  * from the same right row even if individual payload fields are null.
  *
  * Contract: the right side must be unique per (keys, time) — pre-aggregate
  * ties (e.g. `max_by` on a unique id) or the carried row would be
  * sort-tie-dependent. Ties BETWEEN sides at equal time are inclusive: a
  * right row at exactly left.time is visible to that left row (`__side`
  * orders right before left within a timestamp, matching DuckDB
  * `ASOF JOIN ... ON l.t >= r.t` semantics).
  */
object AsofJoin {

  /** @param left     probe side; all its columns pass through
    * @param right    build side, unique per (keys, time)
    * @param keys     equi-join key columns (present on both sides)
    * @param time     event-time column name (present on both sides; any
    *                 ordered type — here LongType epoch-nanos, never double)
    * @param timeOut  output column holding the matched right row's time
    * @param payload  right columns to carry, as (rightCol, outputCol)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      time: String,
      timeOut: String,
      payload: Seq[(String, String)]): DataFrame =
    merge(left, right, keys, time, timeOut, payload, forward = false)

  /** Forward as-of join — for each left row, the EARLIEST right row whose
    * time is ≥ the left row's time within the same key group (next-touch
    * attribution / next-state-change). Identical merge form with the
    * traversal reversed: ordering by time DESC makes "latest right seen so
    * far" mean "smallest right time at-or-after me". Equal-time right rows
    * remain visible (inclusive, matching DuckDB `ASOF ... ON l.t <= r.t`).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      time: String,
      timeOut: String,
      payload: Seq[(String, String)]): DataFrame =
    merge(left, right, keys, time, timeOut, payload, forward = true)

  private def merge(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      time: String,
      timeOut: String,
      payload: Seq[(String, String)],
      forward: Boolean): DataFrame = {
    val matchType = StructType(
      StructField(timeOut, left.schema(time).dataType) +:
        payload.map { case (rc, out) => StructField(out, right.schema(rc).dataType) })
    val l = left.withColumn("__side", lit(1))
      .withColumn("__asof", lit(null).cast(matchType))
    val r = right.select(
      (keys :+ time).map(col) :+
        struct(col(time).as(timeOut) +:
          payload.map { case (rc, out) => col(rc).as(out) }: _*).as("__asof"): _*)
      .withColumn("__side", lit(0))
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == time)
    val rAligned = leftOnly.foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = l.columns.toSeq // fix one column order for the union
    val unioned = l.select(cols.map(col): _*)
      .unionByName(rAligned.select(cols.map(col): _*))
    // Running frame, right rows before left rows within a timestamp: each
    // left row sees the latest right row at-or-before its time (backward)
    // or, traversing time descending, the earliest at-or-after (forward).
    // The window is keyed — partition-parallel, never a single global sort.
    val timeOrd = if (forward) col(time).desc else col(time).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        (timeOut +: payload.map(_._2)).map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Convenience: asof against a single-payload right side. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      timeOut: String,
      payloadCol: String,
      payloadOut: String): DataFrame =
    backward(left, right, Seq(key), time, timeOut,
      Seq(payloadCol -> payloadOut))

  /** Convenience: forward asof against a single-payload right side. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      timeOut: String,
      payloadCol: String,
      payloadOut: String): DataFrame =
    forward(left, right, Seq(key), time, timeOut,
      Seq(payloadCol -> payloadOut))
}
