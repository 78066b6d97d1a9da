package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.AggPipeline

/** X97 maintained aggregate state: the per-batch fold must be
  * BIT-IDENTICAL to the from-scratch aggregation whatever the batch split
  * (every partial is associative with constant state — the
  * AggregatingMergeTree contract), rollup consumers derived from the
  * state must equal the declared from-raw queries (q204/q197/q199), and
  * coarser grains must compose exactly (monthly-from-weekly ==
  * monthly-from-daily).
  */
class AggPipelineSpec extends SparkSpec {

  private def ev = Tables.events(spark, sf)

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toString).sorted.toIndexedSeq
  }

  test("fold-vs-scratch bit-identity: a 3-batch fold equals the one-shot " +
      "aggregation row for row, column for column") {
    val folded = AggPipeline.foldBatches(ev, 3)
    val scratch = AggPipeline.merge(AggPipeline.dayPartials(ev))
    assert(folded.schema == scratch.schema,
      s"fold changed the state schema:\n${folded.schema}\n${scratch.schema}")
    val f = canon(folded)
    val s = canon(scratch)
    assert(f.nonEmpty && f == s,
      s"fold diverged from scratch: ${f.diff(s).take(3)}")
  }

  test("fold is split-invariant: 2-batch and 5-batch folds agree") {
    assert(canon(AggPipeline.foldBatches(ev, 2)) ==
      canon(AggPipeline.foldBatches(ev, 5)))
  }

  test("q204 parity: the OHLC rollup derived from the maintained state " +
      "equals the declared from-raw query") {
    val st = AggPipeline.merge(AggPipeline.dayPartials(ev))
    val derived = AggPipeline.ohlc(st).orderBy("event_type", "day")
      .collect().map(_.toString).toSeq
    val declared = Queries.byName("q204_ohlc_downsample").build(spark, sf)
      .collect().map(_.toString).toSeq
    assert(derived.nonEmpty && derived == declared)
  }

  test("q197 parity: weekday seasonality derived from the maintained " +
      "state equals the declared from-raw query") {
    val st = AggPipeline.merge(AggPipeline.dayPartials(ev))
    val derived = QueriesTime.seasonalityFromDaily(
        AggPipeline.dailyCounts(st))
      .collect().map(_.toString).toSeq
    val declared = Queries.byName("q197_weekday_seasonality")
      .build(spark, sf).collect().map(_.toString).toSeq
    assert(derived.nonEmpty && derived == declared)
  }

  test("q199 parity: burstiness Fano derived from the maintained state " +
      "equals the declared from-raw query") {
    val st = AggPipeline.merge(AggPipeline.dayPartials(ev))
    val derived = QueriesTime.fanoFromDaily(AggPipeline.dailyCounts(st))
      .collect().map(_.toString).toSeq
    val declared = Queries.byName("q199_burstiness_fano").build(spark, sf)
      .collect().map(_.toString).toSeq
    assert(derived.nonEmpty && derived == declared)
  }

  test("grains compose exactly: monthly-from-weekly equals " +
      "monthly-from-daily (28-day buckets)") {
    val st = AggPipeline.merge(AggPipeline.dayPartials(ev))
    val viaWeekly = AggPipeline.regrain(AggPipeline.regrain(st, 7), 4)
    val direct = AggPipeline.regrain(st, 28)
    assert(canon(viaWeekly) == canon(direct))
  }

  test("cached state serves the declared q213 weekly rollup equal to a " +
      "fresh from-raw weekly aggregation") {
    val declared = Queries.byName("q213_agg_mv").build(spark, sf)
      .collect().map(_.toString).toSeq
    val scratch = AggPipeline.ohlc(AggPipeline.regrain(
        AggPipeline.merge(AggPipeline.dayPartials(ev)), 7))
      .withColumnRenamed("day", "week")
      .orderBy("event_type", "week")
      .collect().map(_.toString).toSeq
    assert(declared.nonEmpty && declared == scratch)
  }
}
