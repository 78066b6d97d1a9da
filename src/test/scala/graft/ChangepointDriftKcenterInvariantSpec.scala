package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for the round-13 additions: q205 (deltaSum
  * counter-reset parity — hand-derived deltas, monotone-counter identity),
  * q206 (binary-segmentation changepoint — hand-derived argmax, flat-series
  * null, earliest-day tie rule, single-day dropout), q207 (probe-vocab χ²
  * drift — single-source zero, disjoint-vocabulary separation), and q208
  * (greedy k-center — orthogonal-basis fixed point, separation
  * monotonicity, replication invariance).
  */
class ChangepointDriftKcenterInvariantSpec extends SparkSpec {
  import spark.implicits._

  // ---- q205 deltaSum -------------------------------------------------

  private def writeValEvents(rows: Seq[(Long, Long, Long, Double)]): String = {
    // (event_id, epoch-sec, user_id, value)
    val dir = Files.createTempDirectory("dsev").toString
    rows.map { case (id, sec, u, v) => (id, sec, u, "t", v, "{}") }
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q205 hand-derived: positive deltas sum, resets counted not " +
      "summed, last value follows the (ts, event_id) total order") {
    // user 1: 10.00 -> 12.50 -> 11.00 -> 14.00: deltas +250, -150, +300
    val dir = writeValEvents(Seq(
      (1L, 100L, 1L, 10.0), (2L, 200L, 1L, 12.5),
      (3L, 300L, 1L, 11.0), (4L, 400L, 1L, 14.0),
      // user 2: monotone counter 1.00 -> 2.00 -> 7.25: sum = last - first
      (5L, 100L, 2L, 1.0), (6L, 200L, 2L, 2.0), (7L, 300L, 2L, 7.25)))
    val got = Queries.byName("q205_delta_sum").build(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((4L, 550L, 1L, 1400L)), s"u1: ${got(1L)}")
    assert(got(2L) == ((3L, 625L, 0L, 725L)), s"u2: ${got(2L)}")
  }

  test("q205 same-timestamp ties order by event_id (the zero-padded key)") {
    val dir = writeValEvents(Seq(
      (2L, 100L, 1L, 5.0), (1L, 100L, 1L, 9.0))) // id 1 first: 9 -> 5
    val r = Queries.byName("q205_delta_sum").build(spark, dir).collect()(0)
    // event_id order: 9.00 then 5.00 -> one reset, no increase, last 5.00
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((0L, 1L, 500L)),
      s"reset + last should follow event_id order: $r")
  }

  test("q205 on the real corpus: sums non-negative, resets < n_events") {
    val got = Queries.byName("q205_delta_sum").build(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) >= 0 &&
        r.getLong(3) < r.getLong(1), s"bounds: $r")
    }
  }

  // ---- q206 changepoint ----------------------------------------------

  private def writeDayEvents(rows: Seq[(Long, Long, String)]): String = {
    // (event_id, epoch-day, event_type)
    val dir = Files.createTempDirectory("cpev").toString
    rows.map { case (id, day, typ) =>
      (id, day * 86400L + id % 1000, 1L, typ, 1.0, "{}") }
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def mkCounts(typ: String, perDay: Seq[Int], id0: Long)
      : Seq[(Long, Long, String)] = {
    var id = id0
    perDay.zipWithIndex.flatMap { case (k, day) =>
      (1 to k).map { _ => id += 1; (id, day.toLong, typ) } }
  }

  test("q206 hand-derived: level shift [2,2,2,10,10,10] localizes at the " +
      "boundary with g=576; a flat series reads g=0 unshifted") {
    // shift: n=6, T=36; g_k = (S_k*6 - k*36)^2 / (k*(6-k)):
    //   k=1:115, k=2:288, k=3:576 (<- argmax, day 2), k=4:288, k=5:115
    // ratio = 576e6 DIV 36 = 16e6 >= 10e6 -> shifted
    val dir = writeDayEvents(
      mkCounts("shift", Seq(2, 2, 2, 10, 10, 10), 0L) ++
        mkCounts("flat", Seq(5, 5, 5, 5), 1000L))
    val got = Queries.byName("q206_changepoint").build(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getInt(6)))).toMap
    assert(got("shift") == ((6L, 36L, 2L, 576L, 16000000L, 1)),
      s"shift: ${got("shift")}")
    assert(got("flat") == ((4L, 20L, 0L, 0L, 0L, 0)),
      s"flat: ${got("flat")}")
  }

  test("q206 g_max ties resolve to the EARLIEST day; single-active-day " +
      "types have no valid split and drop out") {
    // [1,2,1]: k=1 g=(3-4)^2/2=0, k=2 g=(9-8)^2/2=0 -> tie, cp=day 0
    val dir = writeDayEvents(
      mkCounts("tie", Seq(1, 2, 1), 0L) ++ mkCounts("one", Seq(3), 100L))
    val got = Queries.byName("q206_changepoint").build(spark, dir).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("tie"), s"rows: ${got.toSeq}")
    assert(got(0).getLong(3) == 0L, s"tie cp_day: ${got(0)}")
  }

  test("q206 on the real corpus: every type present (all have >=2 active " +
      "days), g_max >= 0, the flag matches the documented 10x-null rule") {
    val got = Queries.byName("q206_changepoint").build(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (t, g, shifted) = (r.getLong(2), r.getLong(4), r.getInt(6))
      assert(g >= 0 && shifted == (if (g >= 10 * t) 1 else 0), s"flag: $r")
    }
  }

  // ---- q207 chi2 drift -----------------------------------------------

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("chidocs").toString
    rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q207 single source: its distribution IS the corpus distribution " +
      "-> chi2 exactly 0, undrifted") {
    val dir = writeDocs(Seq((1L, "a b c a b a", "s1"), (2L, "d e a", "s1")))
    val r = Queries.byName("q207_chi2_drift").build(spark, dir).collect()
    assert(r.length == 1 && r(0).getLong(2) == 0L && r(0).getInt(4) == 0,
      s"single-source chi2: ${r.toSeq}")
  }

  test("q207 disjoint vocabularies drift hard; shared vocabulary at " +
      "identical proportions reads 0") {
    val dir = writeDocs(Seq(
      (1L, "aa aa aa bb bb cc", "s1"), (2L, "xx xx xx yy yy zz", "s2")))
    val got = Queries.byName("q207_chi2_drift").build(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // each source holds half the corpus mass of a symmetric vocabulary:
    // p(probe in own source) = 2q for its own tokens, 0 for the other's
    assert(got("s1") > 500000L && got("s1") == got("s2"),
      s"disjoint: $got")
    val same = writeDocs(Seq(
      (1L, "aa bb aa bb", "s1"), (2L, "aa bb aa bb", "s2")))
    val g2 = Queries.byName("q207_chi2_drift").build(spark, same)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(g2("s1") == 0L && g2("s2") == 0L, s"identical: $g2")
  }

  test("q207 on the real corpus: probe hits <= 30, chi2 >= 0, flag " +
      "matches the 50000 gate") {
    val got = Queries.byName("q207_chi2_drift").build(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (chi, hits, fl) = (r.getLong(2), r.getLong(3), r.getInt(4))
      assert(chi >= 0 && hits <= 30 &&
        fl == (if (chi >= 50000L) 1 else 0), s"bounds: $r")
    }
  }

  // ---- q208 k-center -------------------------------------------------

  private def writeEmb(rows: Seq[(Long, Array[Float])]): String = {
    val dir = Files.createTempDirectory("kcemb").toString
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def basis(i: Int): Array[Float] = {
    val v = Array.fill(64)(0.0f); v(i) = 1.0f; v
  }

  test("q208 orthogonal basis: all pairwise distances 1, so picks walk " +
      "rep_id ascending with sep exactly 1.0") {
    val dir = writeEmb((0 until 12).map(i => (10L + i, basis(i))))
    val got = Queries.byName("q208_kcenter_diverse").build(spark, dir)
      .collect()
    assert(got.map(_.getLong(1)).toSeq == (10L to 18L).toSeq,
      s"pick order: ${got.toSeq}")
    assert(got.drop(1).forall(_.getDouble(3) == 1.0), s"seps: ${got.toSeq}")
  }

  test("q208 separation is non-increasing from round 1 (farthest-point " +
      "monotonicity) and rep_ids are distinct on the real corpus") {
    val got = Queries.byName("q208_kcenter_diverse").build(spark, sf)
      .collect()
    assert(got.length == 9)
    assert(got.map(_.getLong(1)).distinct.length == 9, "repeated center")
    val seps = got.drop(1).map(_.getDouble(3)).toSeq
    assert(seps.zip(seps.tail).forall { case (a, b) => a >= b },
      s"non-monotone: $seps")
    assert(got(0).getLong(1) ==
      Tables.embeddings(spark, sf).agg(min("vec_id")).head.getLong(0),
      "seed is not the min vec_id")
  }

  test("q208 is replication-invariant: verbatim copies with shifted ids " +
      "change only n_dup (the distinct-content contraction)") {
    val base = (0 until 12).map(i => (10L + i, basis(i)))
    val once = writeEmb(base)
    val twice = writeEmb(base ++ base.map { case (id, v) => (id + 100, v) })
    val a = Queries.byName("q208_kcenter_diverse").build(spark, once)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    val b = Queries.byName("q208_kcenter_diverse").build(spark, twice)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(a.toSeq == b.toSeq, s"replication moved the selection:\n$a\n$b")
    val dups = Queries.byName("q208_kcenter_diverse").build(spark, twice)
      .collect().map(_.getLong(2)).toSeq
    assert(dups.forall(_ == 2L), s"n_dup under 2x replication: $dups")
  }
}
