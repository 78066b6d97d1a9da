package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the time-series tier (QueriesTime) that the
  * hash-oracle cannot express: gap-fill completeness, funnel monotonicity,
  * retention boundedness.
  */
class TimeOpsSpec extends SparkSpec {

  test("q76 date spine is continuous and gap-fills missing days with zero") {
    val rows = Queries.byName("q76_date_spine").build(spark, sf).collect()
    assert(rows.length === 36, "Jan 1 .. Feb 5 inclusive")
    val days = rows.map(_.getDate(0).toLocalDate)
    assert(days.zip(days.tail).forall { case (a, b) => a.plusDays(1) == b },
      "spine has a gap")
    // events end Jan 30 — the Feb tail must be gap-filled zeros
    assert(rows.takeRight(5).forall(_.getLong(1) == 0L))
    assert(rows.map(_.getLong(1)).sum ==
      Tables.events(spark, sf).count(), "gap-fill lost or invented events")
  }

  test("q79 funnel counts are monotone: converted <= purchasers") {
    val r = Queries.byName("q79_event_funnel").build(spark, sf).collect()(0)
    val (nS, nP, nC) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nC <= nP && nC <= nS)
    assert(nS > 0 && nP > 0, "fixture has signups and purchases")
  }

  test("q204 OHLC: open/close equal the window-derived first/last value " +
      "per bucket (independent derivation), low <= open/close <= high, " +
      "and n_events partitions the stream") {
    import org.apache.spark.sql.expressions.Window
    val got = Queries.byName("q204_ohlc_downsample").build(spark, sf)
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", graft.ops.Scalars.longDiv("ts", 1000L))
      .withColumn("day", expr("ts_us DIV 86400000000"))
    val w = Window.partitionBy("event_type", "day")
      .orderBy(col("ts_us"), col("event_id"))
    val wd = Window.partitionBy("event_type", "day")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val expected = ev
      .withColumn("ra", row_number().over(w))
      .withColumn("rd", row_number().over(wd))
      .groupBy("event_type", "day")
      .agg(max(when(col("ra") === 1, col("value"))).as("open_w"),
        max(when(col("rd") === 1, col("value"))).as("close_w"))
    val joined = got.join(expected, Seq("event_type", "day")).cache()
    assert(joined.count() == got.count())
    assert(joined.filter(col("open") =!= col("open_w") ||
      col("close") =!= col("close_w")).count() == 0,
      "argmin/argmax open/close disagree with the window derivation")
    assert(joined.filter(col("low") > col("open") ||
      col("low") > col("close") || col("high") < col("open") ||
      col("high") < col("close")).count() == 0)
    val total = got.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == ev.count(), "buckets do not partition the stream")
  }

  test("q78 retention never exceeds the day's active-user count") {
    val du = Tables.events(spark, sf)
      .select(col("user_id"),
        graft.ops.Scalars.longDiv("ts", 86400000000000L).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("active"))
    val ret = Queries.byName("q78_retention").build(spark, sf)
    val bad = ret.join(du, Seq("day"))
      .filter(col("retained") > col("active")).count()
    assert(bad === 0L)
  }
}
