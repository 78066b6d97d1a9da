package graft

import org.apache.spark.sql.functions._

import graft.ops.RankTests

/** A27 Mann–Whitney U / A28 Kolmogorov–Smirnov (ops/RankTests):
  * hand-derived rank algebra and ECDF gaps, the identity/shift
  * invariances a drift gate needs, and partition invariance of the
  * exact integer statistics.
  */
class RankTestsSpec extends SparkSpec {
  import spark.implicits._

  private def hist(xs: Seq[(String, Int, Long)]) =
    RankTests.histogram(xs.toDF("k", "grp", "x"), Seq("k"), "grp", "x")

  test("MWU hand-derived with ties: A={1,2,2} B={2,3,4} gives 2U_a=2 " +
      "and the tie-corrected z") {
    val df = hist(Seq(("g", 0, 1L), ("g", 0, 2L), ("g", 0, 2L),
      ("g", 1, 2L), ("g", 1, 3L), ("g", 1, 4L)))
    val r = RankTests.mannWhitney(df, Seq("k"))
      .select("n_a", "n_b", "u2_a", "z_stat", "shifted")
      .as[(Long, Long, Long, Double, Int)].head()
    assert(r._1 == 3 && r._2 == 3)
    // 2R_a = 2 + 6 + 6 = 14 (ranks 1, 3, 3 averaged over the tie);
    // 2U_a = 14 - 3*4 = 2; tie_sum = 3^3-3 = 24;
    // sigma2 = (9/12)*(7 - 24/30) = 4.65; z = (2-9)/(2*sqrt(4.65))
    assert(r._3 == 2L)
    val z = (2.0 - 9.0) / (2.0 * math.sqrt((9.0 / 12.0) * (7.0 - 24.0 / 30.0)))
    assert(math.abs(r._4 - z) < 1e-12, r)
    assert(r._5 == 0)
  }

  test("MWU identity: identical sample multisets give z exactly 0; a " +
      "disjoint shift flags") {
    val same = (1 to 200).flatMap(i =>
      Seq(("same", 0, i.toLong), ("same", 1, i.toLong)))
    val shift = (1 to 200).flatMap(i =>
      Seq(("shift", 0, i.toLong), ("shift", 1, i + 10000L)))
    val got = RankTests.mannWhitney(hist(same ++ shift), Seq("k"))
      .select("k", "z_stat", "shifted")
      .as[(String, Double, Int)].collect().map(r => r._1 -> r).toMap
    assert(got("same")._2 == 0.0 && got("same")._3 == 0, got)
    assert(math.abs(got("shift")._2) > 10 && got("shift")._3 == 1, got)
  }

  test("KS hand-derived: A={1,2,3} B={3,4,5} gives d_num=6 of 9 " +
      "(D = 2/3), below the alpha=0.05 critical value at n=3") {
    val df = hist(Seq(("g", 0, 1L), ("g", 0, 2L), ("g", 0, 3L),
      ("g", 1, 3L), ("g", 1, 4L), ("g", 1, 5L)))
    val r = RankTests.ksTest(df, Seq("k"))
      .select("n_a", "n_b", "d_num", "d_ppm", "drifted")
      .as[(Long, Long, Long, Long, Int)].head()
    assert(r == ((3L, 3L, 6L, 666666L, 0)), r)
  }

  test("KS identity: identical samples give D = 0; disjoint samples " +
      "give D = 1 and flag") {
    val same = (1 to 200).flatMap(i =>
      Seq(("same", 0, i.toLong), ("same", 1, i.toLong)))
    val shift = (1 to 200).flatMap(i =>
      Seq(("shift", 0, i.toLong), ("shift", 1, i + 10000L)))
    val got = RankTests.ksTest(hist(same ++ shift), Seq("k"))
      .select("k", "d_num", "n_a", "n_b", "drifted")
      .as[(String, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("same")._2 == 0L && got("same")._5 == 0, got)
    assert(got("shift")._2 == got("shift")._3 * got("shift")._4 &&
      got("shift")._5 == 1, got)
  }

  test("partition invariance: 1-way and 8-way runs agree bit-for-bit " +
      "on both tests (exact integer statistics, identical IEEE tails)") {
    val rows = (0 until 2000).map(i =>
      (s"k${i % 3}", i % 2, 50L + (i * 13 % 77) + (i % 2) * (i % 5)))
    def run(parts: Int) = {
      val h = RankTests.histogram(
        rows.toDF("k", "grp", "x").repartition(parts),
        Seq("k"), "grp", "x")
      (RankTests.mannWhitney(h, Seq("k")).orderBy("k")
        .collect().map(_.toString).toSeq,
        RankTests.ksTest(h, Seq("k")).orderBy("k")
          .collect().map(_.toString).toSeq)
    }
    val got = run(1)
    assert(run(8) == got && got._1.size == 3 && got._2.size == 3)
  }

  test("student t: pooled form matches the closed form on the textbook " +
      "case and df is the exact integer n_a+n_b-2") {
    val df = Seq(1L, 2L, 3L, 4L, 5L).map(("g", 0, _)) ++
      Seq(2L, 6L, 4L).map(("g", 1, _))
    val r = graft.ops.Welch.studentTTest(
        df.toDF("k", "grp", "x"), Seq("k"), "grp", "x")
      .select("n_a", "n_b", "t_stat", "df_s", "shifted")
      .as[(Long, Long, Double, Long, Int)].head()
    // sp2 = (4*2.5 + 2*4)/6 = 3; t = -1/sqrt(3*(1/5+1/3))
    assert(r._1 == 5 && r._2 == 3 && r._4 == 6)
    val t = -1.0 / math.sqrt(3.0 * (1.0 / 5.0 + 1.0 / 3.0))
    assert(math.abs(r._3 - t) < 1e-12, r)
    assert(r._5 == 0)
  }

  test("declared q225/q226/q227 rows: one per event_type, finite stats") {
    for ((q, statCol) <- Seq(("q225_student_ttest", "t_stat"),
        ("q226_mannwhitney_u", "z_stat"))) {
      val got = Queries.byName(q).build(spark, sf)
        .select(col("event_type"), col(statCol).cast("double"))
        .as[(String, Double)].collect()
      assert(got.nonEmpty, q)
      got.foreach { case (et, v) =>
        assert(!v.isNaN && !v.isInfinite, s"$q $et: $v")
      }
    }
    val ks = Queries.byName("q227_ks_test").build(spark, sf)
      .select("event_type", "d_num", "n_a", "n_b")
      .as[(String, Long, Long, Long)].collect()
    assert(ks.nonEmpty)
    ks.foreach { case (et, d, na, nb) =>
      assert(d >= 0 && d <= na * nb, s"$et: $d vs ${na * nb}")
    }
  }
}
