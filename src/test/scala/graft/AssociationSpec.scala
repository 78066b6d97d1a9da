package graft

import graft.ops.Association

/** A29 cramersV/contingency (ops/Association): the two boundary cases
  * every association coefficient must pin (perfect association → V = 1,
  * independence → V ≈ 0), a hand-derived mid case, and partition
  * invariance of the fixed-point χ² core.
  */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("perfect association: a bijective pairing gives V = 1 exactly") {
    // 2×2, a determines b completely; χ² = n·(min-1) → V = 1
    val pairs = (Seq.fill(40)(("x", "p")) ++ Seq.fill(60)(("y", "q")))
      .toDF("a", "b")
    val r = Association.cramers(pairs, "a", "b")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(r._1 == 100 && r._2 == 2 && r._3 == 2)
    // sum_term: cells (x,p,40): 1e6*1600/(40*40)=1e6; (y,q,60): 1e6 →
    // sum 2e6; chi2_ppm = 100*(2e6-1e6) = 1e8 → chi2 = 100 = n*(k=1)
    assert(r._4 == 100000000L, r)
    assert(r._5 == 1.0 && r._6 > 0.7, r) // C = sqrt(100/200) ≈ 0.707
  }

  test("independence: a uniform product distribution gives V = 0") {
    val pairs = (for { a <- Seq("x", "y"); b <- Seq("p", "q", "r");
      _ <- 1 to 10 } yield (a, b)).toDF("a", "b")
    val r = Association.cramers(pairs, "a", "b")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    // exact independence: every cell term is exactly
    // 1e6·o²/(r·c) = 1e6·100/(30·20) — floor(1e6/6)·6 < 1e6, so the
    // clamp pins chi2_ppm (and V) to 0
    assert(r._4 == 0L && r._5 == 0.0 && r._6 == 0.0, r)
  }

  test("hand-derived mid case replays the fixed-point definition") {
    // cells: (x,p)=30 (x,q)=10 (y,p)=10 (y,q)=30; r=c=40,40; n=80
    val pairs = (Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))).toDF("a", "b")
    val r = Association.cramers(pairs, "a", "b")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    // term(30) = floor(1e6·900/1600) = 562500, term(10) = 62500;
    // sum = 2·562500 + 2·62500 = 1250000; chi2_ppm = 80·250000 = 2e7
    assert(r._4 == 20000000L, r)
    val v = math.sqrt((2e7 / 1e6) / (80.0 * 1.0))
    assert(math.abs(r._5 - v) < 1e-12, r) // = 0.5
  }

  test("partition invariance: 1-way and 8-way agree bit-for-bit") {
    val pairs = (0 until 3000).map(i => (s"a${i % 4}", s"b${i % 7}"))
    def run(parts: Int) = Association.cramers(
        pairs.toDF("a", "b").repartition(parts), "a", "b")
      .collect().map(_.toString).toSeq
    assert(run(1) == run(8) && run(1).size == 1)
  }

  test("bias-corrected V: perfect association stays ~1, independence " +
      "clamps to 0 exactly, mid case replays the Bergsma closed form") {
    // perfect 2x2 (n = 100): phi2c = 1 - 1/99, min(r~,c~) - 1 = 1 - 1/99
    // -> V+ = 1 up to the one rounding between (2 - q) - 1 and 1 - q
    val perfect = (Seq.fill(40)(("x", "p")) ++ Seq.fill(60)(("y", "q")))
      .toDF("a", "b")
    val rp = Association.cramersCorrected(perfect, "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(math.abs(rp._5 - 1.0) < 1e-12, rp)
    // exact independence: chi2_ppm = 0 -> phi2c = max(0 - eps, 0) = 0
    // -> V+ = 0 exactly
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q", "r");
      _ <- 1 to 10 } yield (a, b)).toDF("a", "b")
    val ri = Association.cramersCorrected(indep, "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(ri._4 == 0L && ri._5 == 0.0, ri)
    // mid case (the q228 hand-derived cells): chi2_ppm = 2e7, n = 80,
    // R = C = 2 -> V+ = sqrt((0.25 - 1/79) / (1 - 1/79))
    val mid = (Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))).toDF("a", "b")
    val rm = Association.cramersCorrected(mid, "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    val expected = math.sqrt((0.25 - 1.0 / 79) / (1.0 - 1.0 / 79))
    assert(rm._4 == 20000000L && math.abs(rm._5 - expected) < 1e-12, rm)
    // corrected < plain on the same cells (the direction of the bias)
    val plain = Association.cramers(mid, "a", "b")
      .as[(Long, Long, Long, Long, Double, Double)].head()._5
    assert(rm._5 < plain, (rm._5, plain))
  }

  test("bias-corrected V partition invariance: 1-way and 8-way agree " +
      "bit-for-bit") {
    val pairs = (0 until 3000).map(i => (s"a${i % 4}", s"b${i % 7}"))
    def run(parts: Int) = Association.cramersCorrected(
        pairs.toDF("a", "b").repartition(parts), "a", "b")
      .collect().map(_.toString).toSeq
    assert(run(1) == run(8) && run(1).size == 1)
  }

  test("declared q228: one row, coefficients inside [0, 1]") {
    val r = Queries.byName("q228_cramers_v").build(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(r.length == 1)
    val (n, na, nb, chi, v, c) = r.head
    assert(n > 0 && na > 1 && nb == 7 && chi >= 0)
    assert(v >= 0 && v <= 1 && c >= 0 && c < 1, r.head)
  }
}
