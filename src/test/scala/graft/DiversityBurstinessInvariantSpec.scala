package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for the round-12 additions: q198 (Gini–Simpson
  * token diversity — hand-derived fixed points, permutation invariance,
  * the 0.5-gate boundary) and q199 (Fano burstiness — zero-variance,
  * hand-derived bursty/steady fixed points, overflow guard silent on
  * real data).
  */
class DiversityBurstinessInvariantSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("gsdocs").toString
    rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q198 hand-derived: gs=0 for degenerate docs, 750000 for 4 " +
      "distinct tokens, the 0.5 gate is exclusive, means are exact") {
    // doc1 'a a a a': n=4 sq=16 -> gs = 0 (low)
    // doc2 'p q r s': n=4 sq=4  -> gs = 750000
    // doc3 'a a b b': n=4 sq=8  -> gs = 500000 (boundary: NOT low)
    // doc4 'x':       n=1 sq=1  -> gs = 0 (low)
    val dir = writeDocs(Seq(
      (1L, "a a a a", "s1"), (2L, "p q r s", "s1"),
      (3L, "a a b b", "s2"), (4L, "x", "s2")))
    val got = Queries.byName("q198_token_diversity").build(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("s1") == ((2L, 375000L, 1L)), s"s1: ${got("s1")}")
    assert(got("s2") == ((2L, 250000L, 1L)), s"s2: ${got("s2")}")
  }

  test("q198 is permutation-invariant: token order cannot move the index") {
    val a = Queries.byName("q198_token_diversity")
      .build(spark, writeDocs(Seq((1L, "a a b b c", "s")))).collect()
    val b = Queries.byName("q198_token_diversity")
      .build(spark, writeDocs(Seq((1L, "b a c a b", "s")))).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("q198 on the real corpus: gs in [0, 1e6), counts consistent") {
    val got = Queries.byName("q198_token_diversity").build(spark, sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, mean, low) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0 && mean >= 0 && mean < 1000000L && low >= 0 && low <= n,
        s"bounds: $r")
    }
  }

  private def writeEvents(rows: Seq[(Long, Long, String)]): String = {
    // (event_id, epoch-day, event_type) -> events parquet
    val dir = Files.createTempDirectory("fanoev").toString
    rows.map { case (id, day, typ) =>
      (id, day * 86400L + id % 1000, 1L, typ, 1.0, "{}") }
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q199 hand-derived: zero variance -> fano 0; [1,9] days -> " +
      "3200000 bursty; [2,3] -> 100000 steady") {
    var id = 0L
    def mk(typ: String, perDay: Seq[Int]): Seq[(Long, Long, String)] =
      perDay.zipWithIndex.flatMap { case (k, day) =>
        (1 to k).map { _ => id += 1; (id, day.toLong, typ) } }
    val dir = writeEvents(
      mk("metronome", Seq(5, 5, 5)) ++ mk("burst", Seq(1, 9)) ++
        mk("poissonish", Seq(2, 3)))
    val got = Queries.byName("q199_burstiness_fano").build(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    // metronome: n=3 S=15 Q=75 -> var_num = 225-225 = 0
    assert(got("metronome") == ((3L, 15L, 0L, 0)), s"${got("metronome")}")
    // burst: n=2 S=10 Q=82 -> var_num 64 -> 64e6 DIV 20 = 3200000
    assert(got("burst") == ((2L, 10L, 3200000L, 1)), s"${got("burst")}")
    // poissonish: n=2 S=5 Q=13 -> var_num 1 -> 1e6 DIV 10 = 100000
    assert(got("poissonish") == ((2L, 5L, 100000L, 0)),
      s"${got("poissonish")}")
  }

  test("q199 on the real corpus: guard silent, fano >= 0, flags " +
      "consistent with the 2e6 threshold") {
    val got = Queries.byName("q199_burstiness_fano").build(spark, sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (fano, bursty) = (r.getLong(3), r.getInt(4))
      assert(fano >= 0, s"negative fano: $r")
      assert((bursty == 1) == (fano >= 2000000L), s"flag mismatch: $r")
    }
  }
}
