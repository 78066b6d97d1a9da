package graft

import org.apache.spark.sql.functions._

/** Round-16 parity additions — hand-derived cases:
  * T41 sequenceCounts (ClickHouse `sequenceCount`),
  * A33 boundingRatio (`boundingRatio`),
  * A34 minSampleSizes (`minSampleSizeConversion/Continuous`),
  * A35 sparkbar16 (`sparkbar`),
  * A36 bitmapAudience (`groupBitmapAnd/Or/Xor`).
  */
class ParitySpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "ts", "event_id", "event_type")

  test("sequenceCount hand-derived: greedy non-overlapping matching — " +
      "svpsp has 1 adjacent and 2 eventual, sspp has 1 eventual " +
      "(extra s and p do not re-fire), ps has none") {
    val df = ev(
      // user 1: s v p s p
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "view"),
      (1L, 30L, 3L, "purchase"), (1L, 40L, 4L, "signup"),
      (1L, 50L, 5L, "purchase"),
      // user 2: p s
      (2L, 10L, 6L, "purchase"), (2L, 20L, 7L, "signup"),
      // user 3: s s p p
      (3L, 10L, 8L, "signup"), (3L, 20L, 9L, "signup"),
      (3L, 30L, 10L, "purchase"), (3L, 40L, 11L, "purchase"))
    val r = QueriesTime.sequenceCounts(df)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("adjacent", 2L, 2L, 1L, 3L),
      ("eventual", 3L, 2L, 2L, 3L)), r)
  }

  test("sequenceCount ordering: same-ts events break ties by event_id " +
      "(the q190 total order) — p-then-s at one ts is NOT a match") {
    val df = ev(
      (1L, 10L, 2L, "signup"), (1L, 10L, 1L, "purchase"))
    val r = QueriesTime.sequenceCounts(df)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r.forall(_._2 == 0L), r)
  }

  test("boundingRatio hand-derived: packed tie rule takes MIN cents at " +
      "the first ts and MAX cents at the last; a 1-day span of +600 " +
      "cents reads slope exactly 6.0 dollars/day") {
    val df = Seq(
      ("g", 100L, 500L), ("g", 100L, 300L),
      ("g", 86400000000100L, 700L), ("g", 86400000000100L, 900L))
      .toDF("event_type", "ts", "cents")
    val r = QueriesTime.boundingRatio(df)
      .as[(String, Long, Long, Long, Long, Double)].head()
    assert(r == (("g", 4L, 300L, 900L, 86400000000000L, 6.0)), r)
  }

  test("boundingRatio degenerates: single-point and single-timestamp " +
      "types are filtered (slope undefined)") {
    val df = Seq(("one", 5L, 100L), ("same", 7L, 100L), ("same", 7L, 200L),
      ("ok", 0L, 100L), ("ok", 86400000000000L, 200L))
      .toDF("event_type", "ts", "cents")
    val ks = QueriesTime.boundingRatio(df)
      .select("event_type").as[String].collect().toSeq
    assert(ks == Seq("ok"), ks)
  }

  test("sparkbar hand-derived: 16-day span maps day k to bucket k; the " +
      "max day renders a full block, half renders ▄, 1-of-8 renders ▁, " +
      "empty buckets render dots; the bar is exactly 16 glyphs") {
    val daily = Seq(("a", 0L, 8L), ("a", 8L, 4L), ("a", 15L, 1L))
      .toDF("event_type", "day", "n")
    val r = QueriesTime.sparkbar16(daily)
      .as[(String, Long, String)].head()
    assert(r._2 == 8L, r)
    assert(r._3 == "█.......▄......▁", r)
    assert(r._3.length == 16, r)
  }

  test("sparkbar single-day degeneracy: one occupied day lands in " +
      "bucket 0 as a full block over 15 dots") {
    val daily = Seq(("b", 5L, 3L)).toDF("event_type", "day", "n")
    val r = QueriesTime.sparkbar16(daily)
      .as[(String, Long, String)].head()
    assert(r == (("b", 3L, "█" + "." * 15)), r)
  }

  test("sparkbar per-type normalization: each type's own max fills its " +
      "bar — a type 10x smaller still renders a full block") {
    val daily = Seq(("big", 0L, 1000L), ("big", 15L, 500L),
      ("small", 0L, 100L), ("small", 15L, 25L))
      .toDF("event_type", "day", "n")
    val r = QueriesTime.sparkbar16(daily).orderBy("event_type")
      .as[(String, Long, String)].collect().toSeq
    assert(r.map(_._2) == Seq(1000L, 100L), r)
    assert(r.forall(_._3.startsWith("█")), r)
    // 500/1000 -> h=4 (▄); 25/100 -> h=2 (▂)
    assert(r.head._3.last == '▄' && r.last._3.last == '▂', r)
  }

  test("bitmapAudience hand-derived: {1,2,3}x{2,3,4} reads inter 2 / " +
      "union 4 / xor 2 / jaccard 500000 ppm; duplicate events do not " +
      "inflate; empty intersections are absent") {
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 2L),
      ("B", 2L), ("B", 3L), ("B", 4L), ("C", 9L))
      .toDF("event_type", "user_id")
    val r = QueriesTime.bitmapAudience(df)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(r == Seq(("A", "B", 3L, 3L, 2L, 4L, 2L, 500000L)), r)
  }

  test("minSampleSize hand-derived: the closed forms replay exactly " +
      "from (n, k, sx, sxx) in the same IEEE order") {
    val df = Seq(("g", 100L), ("g", 200L), ("g", 20000L))
      .toDF("event_type", "x")
    val r = QueriesCuration.minSampleSizes(df)
      .as[(String, Long, Long, Double, Double, Double, Double)].head()
    val n = 3L; val k = 1L; val sx = 20300L; val sxx = 400050000.0
    val mean = sx.toDouble / n.toDouble
    val s2 = (sxx - sx.toDouble * mean) / (n - 1).toDouble
    val p1 = k.toDouble / n.toDouble
    val zs = 1.9599639845400545 + 0.8416212335729143
    // 0.05 * 0.05 rides the engines' DECIMAL-exact product (then one
    // correctly-rounded double conversion) — mirror with the 0.0025
    // literal, NOT a double product (which can differ by an ulp)
    val conv = (zs * zs) *
      (p1 * (1.0 - p1) + (p1 + 0.05) * (1.0 - (p1 + 0.05))) / 0.0025
    val cont = 2.0 * (zs * zs) * s2 / 250000.0
    assert(r == (("g", n, k, p1, conv, s2, cont)), r)
    // sizing sanity: a ~1/3 baseline needs ~1.4k per arm for a 5-point
    // lift; the heavy-tailed cents variance needs thousands for $5
    assert(conv > 1000 && conv < 20000, conv)
    assert(cont > 5000, cont)
  }

  test("minSampleSize degenerates: n < 2 and zero-variance types are " +
      "filtered (the Welch va+vb > 0 discipline)") {
    val df = Seq(("one", 5L), ("flat", 7L), ("flat", 7L),
      ("ok", 100L), ("ok", 200L)).toDF("event_type", "x")
    val ks = QueriesCuration.minSampleSizes(df)
      .select("event_type").as[String].collect().toSeq
    assert(ks == Seq("ok"), ks)
  }

  test("nextNode hand-derived: s→view reads 'v', signup-as-last reads " +
      "'(end)', a user without signup is excluded; shares are exact " +
      "thirds in ppm") {
    val df = ev(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "view"),
      (2L, 10L, 3L, "click"), (2L, 20L, 4L, "signup"),
      (3L, 10L, 5L, "purchase"), (3L, 20L, 6L, "view"),
      (4L, 10L, 7L, "signup"), (4L, 20L, 8L, "purchase"))
    val r = QueriesTime.nextNodeDist(df)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("(end)", 1L, 3L, 333333L),
      ("p", 1L, 3L, 333333L),
      ("v", 1L, 3L, 333333L)), r)
  }

  test("nextNode takes the FIRST signup (head semantics), not a later " +
      "one") {
    val df = ev(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "view"))
    val r = QueriesTime.nextNodeDist(df)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("c", 1L, 1L, 1000000L)), r)
  }

  test("anova hand-derived: groups {1,3} vs {5,7} read SSB 16 / SSW 4 " +
      "/ F exactly 8 on integer-exact doubles, flagged") {
    val df = Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 7L))
      .toDF("event_type", "x")
    val r = QueriesOlap.anova(df)
      .as[(Long, Long, Long, Long, Double, Double, Double, Int)].head()
    assert(r == ((2L, 4L, 1L, 2L, 16.0, 4.0, 8.0, 1)), r)
  }

  test("anova degenerates: a single group and an all-within-constant " +
      "board (SSW = 0) both produce no row") {
    import org.apache.spark.sql.DataFrame
    def run(df: DataFrame) = QueriesOlap.anova(df).count()
    assert(run(Seq(("a", 1L), ("a", 5L)).toDF("event_type", "x")) == 0L)
    assert(run(Seq(("a", 2L), ("a", 2L), ("b", 9L), ("b", 9L))
      .toDF("event_type", "x")) == 0L)
  }

  test("corrMatrix hand-derived: perfectly collinear measures read " +
      "corr ±1 (to the shared IEEE tree) and the exact sample " +
      "covariances; all 6 pairs emitted from one pass") {
    // q = 1,2,3; p = 100q; dd = q; tt = 3 - q (anti-correlated)
    val df = Seq((1L, 100L, 1L, 2L), (2L, 200L, 2L, 1L),
      (3L, 300L, 3L, 0L)).toDF("q", "p", "dd", "tt")
    val r = QueriesOlap.corrMatrix(df)
      .as[(String, Double, Double, Long)].collect().toSeq
    assert(r.map(_._1) == Seq("disc_tax", "price_disc", "price_tax",
      "qty_disc", "qty_price", "qty_tax"), r)
    val byPair = r.map(x => x._1 -> x).toMap
    // covar_samp(q, p) = (1400 - 1200)/2 = 100 exactly; covar(q, dd)=1
    assert(byPair("qty_price")._3 == 100.0, r)
    assert(byPair("qty_disc")._3 == 1.0 && byPair("qty_tax")._3 == -1.0)
    // corr via the same IEEE ops: (n*sxy - sx*sy)/(sqrt(..)*sqrt(..))
    def tree(n: Double, sx: Double, sy: Double, sxx: Double,
        syy: Double, sxy: Double) =
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(byPair("qty_price")._2 ==
      tree(3, 6, 600, 14, 140000, 1400), r)
    assert(byPair("qty_tax")._2 == tree(3, 6, 3, 14, 5, 4), r)
    assert(math.abs(byPair("qty_price")._2 - 1.0) < 1e-12)
    assert(math.abs(byPair("qty_tax")._2 + 1.0) < 1e-12)
    assert(r.forall(_._4 == 3L), r)
  }
}
