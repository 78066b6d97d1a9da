package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Algebraic invariants of the round-9 closing trio (q168 decay score,
  * q169 Gini concentration, q170 triangle census) on handcrafted shapes
  * and independent recomputation — the cross-row consistency the value
  * oracle only exercises on the fixed testdata distribution.
  */
class GraphDecayGiniInvariantSpec extends SparkSpec {
  import spark.implicits._

  /** The q168 integer decay table, rebuilt independently. */
  private val decay: Vector[Long] =
    Iterator.iterate(1000000L)(v => v * 9L / 10L).take(28).toVector

  test("q168 decay recurrence is the exact integer curve: d(0)=1e6, " +
      "d(k)=d(k-1)*9 DIV 10, strictly decreasing, positive at the " +
      "28-day horizon") {
    assert(decay.head == 1000000L && decay.length == 28)
    decay.sliding(2).foreach { case Vector(a, b) =>
      assert(b == a * 9L / 10L && b < a && b > 0,
        s"recurrence broken at $a -> $b")
    }
  }

  test("q168 on handcrafted days: max-day activity scores at full " +
      "weight, age-1 at 900000 ppm, age-27 at d(27), age>=28 excluded " +
      "entirely (row-level horizon, not a score floor)") {
    val dir = Files.createTempDirectory("decay").toString
    def ev(id: Long, day: Long, user: Long) =
      (id, day * 86400L, user, "view", 1.0, "{}")
    Seq(
      // user 7: 3 events on the global max day (1000) -> age 0
      ev(1, 1000, 7), ev(2, 1000, 7), ev(3, 1000, 7),
      // user 8: 2 at age 1, 1 at age 27 (last inside), 1 at age 28 (out)
      ev(4, 999, 8), ev(5, 999, 8), ev(6, 973, 8), ev(7, 972, 8),
      // user 9: only age-50 activity -> no output row at all
      ev(8, 950, 9))
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.byName("q168_decay_score").build(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_recent"), r.getAs[Long]("days_active"),
          r.getAs[Long]("score_ppm")))
      .toMap
    assert(out.keySet == Set(7L, 8L), s"horizon filter leaked: $out")
    assert(out(7L) == ((3L, 1L, 3000000L)), s"user 7: ${out(7L)}")
    assert(out(8L) == ((3L, 2L, 2L * decay(1) + decay(27))),
      s"user 8: ${out(8L)} != (3, 2, ${2L * decay(1) + decay(27)})")
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("gini").toString
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q169 Gini hits the exact poles: uniform lengths -> 0 ppm; a " +
      "{1,1,1,97}-token source -> the hand-derived 720000 ppm") {
    val dir = writeDocs(Seq(
      (1L, "u", "a b c"), (2L, "u", "d e f"),
      (3L, "u", "g h i"), (4L, "u", "j k l"),
      (5L, "x", "a"), (6L, "x", "b"), (7L, "x", "c"),
      // 97 tokens: sum=100, sum(r*x)=1+2+3+4*97=394 ->
      // (2e6*394 - 1e6*5*100) DIV (4*100) = 720000
      (8L, "x", Seq.fill(97)("w").mkString(" "))))
    val out = Queries.byName("q169_gini_length").build(spark, dir)
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Long]("tok_sum"),
          r.getAs[Long]("gini_ppm")))
      .toMap
    assert(out("u") == ((4L, 12L, 0L)), s"uniform source: ${out("u")}")
    assert(out("x") == ((4L, 100L, 720000L)), s"extreme source: ${out("x")}")
  }

  test("q169 is swap-invariant under tied token counts: permuting " +
      "doc_ids inside a tie group (which flips the tiebreak rank order) " +
      "leaves every output row identical") {
    val texts = Seq("a b c d e", "f g h i j", "k l m n o",
      Seq.fill(9)("z").mkString(" "))
    def rows(ids: Seq[Long]) =
      ids.zip(texts).map { case (id, t) => (id, "s", t) }
    val a = Queries.byName("q169_gini_length")
      .build(spark, writeDocs(rows(Seq(1L, 2L, 3L, 4L)))).collect()
    val b = Queries.byName("q169_gini_length")
      .build(spark, writeDocs(rows(Seq(3L, 1L, 2L, 4L)))).collect()
    assert(a.toSeq == b.toSeq, s"tie order leaked into the result:\n" +
      s"  a=${a.toSeq}\n  b=${b.toSeq}")
    assert(a.head.getAs[Long]("gini_ppm") > 0, "degenerate tie fixture")
  }

  test("q170 agrees with a driver-side naive triangle census of the " +
      "same contracted graph, and every row satisfies the closure " +
      "identities (tri <= C(deg,2), closure_ppm = 2e6*tri DIV " +
      "(deg*(deg-1)) in [0, 1e6])") {
    val d = "/root/testdata/sf0.01"
    val pairs = QueriesText.contractedPairs(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture lost its band collisions")
    val adj = scala.collection.mutable.Map
      .empty[Long, Set[Long]].withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    // per-node triangle count = closed neighbor pairs; handshake: the
    // per-node counts over a triangle's 3 vertices each see it once
    val naiveTri = adj.map { case (n, ns) =>
      n -> ns.toSeq.combinations(2)
        .count { case Seq(u, v) => adj(u).contains(v) }.toLong
    }
    assert(naiveTri.values.sum % 3 == 0, "handshake: sum(tri) % 3 != 0")
    val degOf = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    val expectedTop = degOf.keys.toSeq
      .map(n => (n, degOf(n), naiveTri.getOrElse(n, 0L)))
      .sortBy { case (n, _, t) => (-t, n) }.take(20)
      .map { case (n, dg, t) =>
        val cl = if (dg >= 2) 2000000L * t / (dg * (dg - 1)) else 0L
        (n, dg, t, cl)
      }
    val got = Queries.byName("q170_triangle_census").build(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("deg"),
        r.getAs[Long]("tri"), r.getAs[Long]("closure_ppm")))
    assert(got.toSeq == expectedTop,
      s"census mismatch:\n  got=${got.toSeq}\n  exp=$expectedTop")
    got.foreach { case (n, dg, t, cl) =>
      assert(t <= dg * (dg - 1) / 2, s"node $n: tri $t > C($dg,2)")
      assert(cl >= 0 && cl <= 1000000L, s"node $n: closure_ppm $cl")
    }
  }
}
