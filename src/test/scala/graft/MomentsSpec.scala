package graft

import org.apache.spark.sql.functions._

import graft.ops.Moments

/** A30 skewPop/kurtPop (ops/Moments) + T38 intervalLengthSum
  * (QueriesTime.intervalCover): hand-derived values, symmetry and
  * degenerate-group behavior, and partition invariance of the exact
  * power sums.
  */
class MomentsSpec extends SparkSpec {
  import spark.implicits._

  test("moments hand-derived: a symmetric two-point group has skew 0 " +
      "and kurtosis exactly 1") {
    val df = Seq(("g", 1L), ("g", 3L)).toDF("k", "x")
    val r = Moments.skewKurt(df, Seq("k"), "x")
      .as[(String, Long, Double, Double)].head()
    // mu=2, m2=1, m3=0, m4=1 — all exact in double
    assert(r == (("g", 2L, 0.0, 1.0)), r)
  }

  test("moments hand-derived: a right-skewed group matches the closed " +
      "form computed from the same power sums") {
    val xs = Seq(1L, 1L, 1L, 2L, 10L)
    val df = xs.map(("g", _)).toDF("k", "x")
    val r = Moments.skewKurt(df, Seq("k"), "x")
      .as[(String, Long, Double, Double)].head()
    val n = xs.size.toDouble
    val mu = xs.sum / n
    val m2 = xs.map(x => x * x).sum / n - mu * mu
    val m3 = xs.map(x => x * x * x).sum / n -
      3.0 * mu * (xs.map(x => x * x).sum / n) + 2.0 * mu * mu * mu
    val m4 = xs.map(x => x.toDouble * x * x * x).sum / n -
      4.0 * mu * (xs.map(x => x * x * x).sum / n) +
      6.0 * mu * mu * (xs.map(x => x * x).sum / n) -
      3.0 * mu * mu * mu * mu
    assert(math.abs(r._3 - m3 / (math.sqrt(m2) * m2)) < 1e-12, r)
    assert(math.abs(r._4 - m4 / (m2 * m2)) < 1e-12, r)
    assert(r._3 > 1.0, "right-skewed fixture must read positive skew")
  }

  test("degenerate groups are filtered: n < 2 and zero variance") {
    val df = Seq(("single", 5L), ("flat", 7L), ("flat", 7L), ("flat", 7L),
      ("ok", 1L), ("ok", 2L)).toDF("k", "x")
    val ks = Moments.skewKurt(df, Seq("k"), "x")
      .select("k").as[String].collect().toSeq
    assert(ks == Seq("ok"), ks)
  }

  test("partition invariance: 1-way and 8-way agree bit-for-bit " +
      "(decimal power sums merge exactly)") {
    val rows = (0 until 3000).map(i => (s"k${i % 3}", 50L + (i * 7 % 97)))
    def run(parts: Int) = Moments.skewKurt(
        rows.toDF("k", "x").repartition(parts), Seq("k"), "x")
      .orderBy("k").collect().map(_.toString).toSeq
    assert(run(1) == run(8) && run(1).size == 3)
  }

  test("interval cover hand-derived: events at 0, 30min, 5h with a 1h " +
      "window cover exactly 2.5h of a 6h span") {
    val h = 3600L * 1000000000L
    val ev = Seq(("g", 0L, 1L), ("g", h / 2, 2L), ("g", 5 * h, 3L))
      .toDF("event_type", "ts", "event_id")
    val r = QueriesTime.intervalCover(ev, h)
      .as[(String, Long, Long, Long, Double)].head()
    assert(r._1 == "g" && r._2 == 3)
    assert(r._3 == h * 5 / 2, r)     // 1h + 30min + 1h
    assert(r._4 == 6 * h, r)
    assert(r._5 == (h * 5 / 2).toDouble / (6 * h), r)
  }

  test("interval cover: duplicate timestamps add zero and a fully " +
      "overlapping burst covers exactly one window") {
    val h = 3600L * 1000000000L
    val ev = (1L to 10L).map(i => ("b", 1000L, i))
      .toDF("event_type", "ts", "event_id")
    val r = QueriesTime.intervalCover(ev, h)
      .as[(String, Long, Long, Long, Double)].head()
    assert(r._3 == h && r._4 == h && r._5 == 1.0, r)
  }

  test("max intersections hand-derived: stacked windows peak at the " +
      "deepest overlap, earliest peak position reported") {
    // 1h windows opening at 0, 30min, 45min, 3h: at t = 45min three are
    // open ([0,1h), [30m,90m), [45m,105m)) — peak 3 at exactly 45min
    val h = 3600L * 1000000000L
    val ev = Seq(("g", 0L), ("g", h / 2), ("g", h * 3 / 4), ("g", 3 * h))
      .toDF("event_type", "ts")
    val r = QueriesTime.maxIntersections(ev, h)
      .as[(String, Long, Long)].head()
    assert(r == (("g", 3L, h * 3 / 4)), r)
  }

  test("max intersections: half-open close-before-open (a window ending " +
      "exactly when another opens does not overlap it) and duplicate " +
      "bursts count full depth") {
    val h = 3600L * 1000000000L
    // [0, 1h) and [1h, 2h): never simultaneously open — peak 1 at t=0
    val abut = Seq(("a", 0L), ("a", h)).toDF("event_type", "ts")
    val ra = QueriesTime.maxIntersections(abut, h)
      .as[(String, Long, Long)].head()
    assert(ra == (("a", 1L, 0L)), ra)
    // 10 events at one timestamp: all 10 windows open together
    val burst = (1 to 10).map(_ => ("b", 1000L)).toDF("event_type", "ts")
    val rb = QueriesTime.maxIntersections(burst, h)
      .as[(String, Long, Long)].head()
    assert(rb == (("b", 10L, 1000L)), rb)
  }

  test("ema hand-derived: halflife-1-day power-of-two weights, 40-day " +
      "truncation — counts (4, 2, 1) on consecutive days average to " +
      "exactly 3.0, an ancient day contributes nothing") {
    val daily = Seq(("g", 100L, 4L), ("g", 99L, 2L), ("g", 98L, 1L),
      ("g", 30L, 1000000L)) // age 70 > 40: truncated out
      .toDF("event_type", "day", "n")
    val r = QueriesTime.emaFromDaily(daily)
      .as[(String, Long, Long, Long, Double)].head()
    // num = 4*2^40 + 2*2^39 + 1*2^38, den = 2^40 + 2^39 + 2^38
    assert(r._2 == 3 && r._3 == (4L << 40) + (2L << 39) + (1L << 38), r)
    assert(r._4 == (1L << 40) + (1L << 39) + (1L << 38), r)
    assert(r._5 == 3.0, r) // (16+4+1)/(4+2+1) = 21/7 exactly
  }

  test("ema: a single-day history degenerates to that day's count and " +
      "a gap-y history weights recent days geometrically more") {
    val one = Seq(("s", 7L, 42L)).toDF("event_type", "day", "n")
    val r1 = QueriesTime.emaFromDaily(one)
      .as[(String, Long, Long, Long, Double)].head()
    assert(r1._2 == 1 && r1._5 == 42.0, r1)
    // days d_max and d_max-10: weights 2^40 and 2^30 — the newer count
    // dominates 1024:1
    val gap = Seq(("t", 20L, 100L), ("t", 10L, 100000L))
      .toDF("event_type", "day", "n")
    val r2 = QueriesTime.emaFromDaily(gap)
      .as[(String, Long, Long, Long, Double)].head()
    val expected = (100.0 * 1024 + 100000.0) / (1024 + 1)
    assert(math.abs(r2._5 - expected) < 1e-9, r2)
  }

  test("declared q229/q230: one row per event_type, finite, in range") {
    val cover = Queries.byName("q229_interval_cover").build(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(cover.nonEmpty)
    cover.foreach { case (et, n, cov, span, ratio) =>
      assert(cov > 0 && cov <= span && ratio > 0 && ratio <= 1,
        s"$et: $cov/$span")
    }
    val mom = Queries.byName("q230_moments").build(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(mom.nonEmpty)
    mom.foreach { case (et, n, sk, ku) =>
      assert(!sk.isNaN && !ku.isNaN && ku > 0, s"$et: $sk $ku")
    }
  }
}
