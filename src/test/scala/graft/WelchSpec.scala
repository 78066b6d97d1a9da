package graft

import org.apache.spark.sql.functions._

import graft.ops.Welch

/** A24 Welch t-test (ops/Welch): hand-derived statistic, the two
  * invariances a drift gate must have (same distribution → |t| small and
  * unflagged; planted mean shift → |t| large and flagged), sub-minimum
  * sample filtering, and partition invariance of the exact partials.
  */
class WelchSpec extends SparkSpec {
  import spark.implicits._

  private def rows(xs: Seq[(String, Int, Long)]) =
    xs.toDF("k", "grp", "x")

  test("hand-derived: textbook two-sample case matches the closed form") {
    // A = {1,2,3,4,5} (n=5, mean 3, var 2.5); B = {2,4,6} (n=3, mean 4,
    // var 4). se = 2.5/5 + 4/3; t = (3-4)/sqrt(se) = -0.7385...
    val df = rows(
      Seq(1L, 2L, 3L, 4L, 5L).map(("g", 0, _)) ++
        Seq(2L, 6L, 4L).map(("g", 1, _)))
    val r = Welch.tTest(df, Seq("k"), "grp", "x")
      .select("n_a", "n_b", "t_stat", "df_w", "shifted")
      .as[(Long, Long, Double, Double, Int)].head()
    assert(r._1 == 5 && r._2 == 3)
    val se = 2.5 / 5 + 4.0 / 3
    assert(math.abs(r._3 - (3.0 - 4.0) / math.sqrt(se)) < 1e-12, r)
    val dfExp = se * se / ((0.5 * 0.5) / 4 + (4.0 / 3) * (4.0 / 3) / 2)
    assert(math.abs(r._4 - dfExp) < 1e-9, r)
    assert(r._5 == 0)
  }

  test("same distribution in both samples: |t| small, not flagged; " +
      "planted shift: |t| large, flagged") {
    // identical multisets in both samples (every x emitted to A and B)
    // -> mean difference exactly 0 -> t exactly 0; the shifted key adds
    // +500 to sample B only
    val base = (0 until 1000).flatMap { i =>
      val x = 100L + (i * 37 % 100)
      Seq(("same", 0, x), ("same", 1, x),
        ("shift", 0, x), ("shift", 1, x + 500))
    }
    val byK = Welch.tTest(rows(base), Seq("k"), "grp", "x")
      .select("k", "t_stat", "shifted")
      .as[(String, Double, Int)].collect().map(r => r._1 -> r).toMap
    assert(byK("same")._2 == 0.0 && byK("same")._3 == 0, byK)
    assert(math.abs(byK("shift")._2) > 10 && byK("shift")._3 == 1, byK)
  }

  test("keys where either sample has < 2 rows are dropped") {
    val df = rows(Seq(("a", 0, 1L), ("a", 0, 2L), ("a", 1, 3L),
      ("b", 0, 1L), ("b", 0, 2L), ("b", 1, 3L), ("b", 1, 4L)))
    val keys = Welch.tTest(df, Seq("k"), "grp", "x")
      .select("k").as[String].collect().toSeq
    assert(keys == Seq("b"))
  }

  test("zero-variance keys (both samples constant) are dropped, not NaN " +
      "— in both the Welch and the pooled Student form") {
    // key "c": both samples all-constant -> va + vb = 0 (and sp2 = 0)
    // -> t/df would be NaN without the gate; key "b" is the live control
    val df = rows(Seq(("c", 0, 5L), ("c", 0, 5L), ("c", 1, 9L),
      ("c", 1, 9L),
      ("b", 0, 1L), ("b", 0, 2L), ("b", 1, 3L), ("b", 1, 4L)))
    val welch = Welch.tTest(df, Seq("k"), "grp", "x")
      .select("k").as[String].collect().toSeq
    assert(welch == Seq("b"), welch)
    val student = Welch.studentTTest(df, Seq("k"), "grp", "x")
      .select("k").as[String].collect().toSeq
    assert(student == Seq("b"), student)
  }

  test("meanZTest hand-derived: known variances give the exact normal " +
      "statistic, riding the same partials") {
    // A = {10, 20} (mean 15), B = {40, 60} (mean 50), sigma^2 = 100 both:
    // z = (15 - 50) / sqrt(100/2 + 100/2) = -3.5 -> flagged
    val df = rows(Seq(("g", 0, 10L), ("g", 0, 20L),
      ("g", 1, 40L), ("g", 1, 60L)))
    val r = Welch.meanZTest(df, Seq("k"), "grp", "x", "100.0", "100.0")
      .select("n_a", "n_b", "z_stat", "shifted")
      .as[(Long, Long, Double, Int)].head()
    assert(r._1 == 2 && r._2 == 2)
    assert(r._3 == -3.5 && r._4 == 1, r)
  }

  test("partition invariance: 1-way and 8-way runs agree bit-for-bit " +
      "(exact integer/decimal partials, identical IEEE tail)") {
    val base = rows((0 until 999).map(i =>
      (s"k${i % 3}", i % 2, 50L + (i * 13 % 77))))
    def run(parts: Int) =
      Welch.tTest(base.repartition(parts), Seq("k"), "grp", "x")
        .orderBy("k").collect().map(_.toString).toSeq
    assert(run(1) == run(8) && run(1).size == 3)
  }

  test("declared q222 rows: one per event_type with finite statistics") {
    val df = Queries.byName("q222_welch_ttest").build(spark, sf)
    val got = df.select("event_type", "t_stat", "df_w")
      .as[(String, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (et, t, dfw) =>
      assert(!t.isNaN && !t.isInfinite && dfw > 1, s"$et: t=$t df=$dfw")
    }
  }
}
