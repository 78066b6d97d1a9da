package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Algebraic invariants of the round-9 closing operators (q155/q157/q158)
  * on adversarial shapes and cross-row consistency the value-level oracle
  * exercises only on the fixed testdata distribution.
  */
class ClosingOpsInvariantSpec extends SparkSpec {
  import spark.implicits._

  test("q155 interpolation on handcrafted gap shapes: exact lerp values " +
      "on interior hours, single-observation spine degenerates to one " +
      "row, same-hour events average in integer cents") {
    val dir = Files.createTempDirectory("interp").toString
    def ev(id: Long, hour: Long, offSec: Long, typ: String, v: Double) =
      (id, hour * 3600L + offSec, 7L, typ, v, "{}")
    Seq(
      // type a: observed at hours 100 and 110 only — pure 10-hour gap
      ev(1, 100, 0, "a", 100.00), ev(2, 110, 0, "a", 200.00),
      // type b: a single observed hour — spine must be exactly one row
      ev(3, 50, 0, "b", 7.77),
      // type c: two events in hour 200 (mean = 301 DIV 2 cents), one in
      // 202 — the lone gap hour 201 lerps between 150 and 300
      ev(4, 200, 10, "c", 1.00), ev(5, 200, 20, "c", 2.01),
      ev(6, 202, 0, "c", 3.00))
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.byName("q155_interpolate").build(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("epoch_hour"))
        -> (r.getAs[Long]("value_cents"), r.getAs[Int]("interpolated")))
      .toMap
    // type a: 11 spine rows, endpoints observed, interior exact lerp
    (100L to 110L).foreach { h =>
      val exp = 10000L + 1000L * (h - 100)
      val interp = if (h == 100L || h == 110L) 0 else 1
      assert(out(("a", h)) == ((exp, interp)),
        s"a/$h: ${out(("a", h))} != ($exp, $interp)")
    }
    // type b: exactly one row, no interpolation anywhere
    assert(out.keys.count(_._1 == "b") == 1 && out(("b", 50L)) == ((777L, 0)),
      s"b spine: ${out.filter(_._1._1 == "b")}")
    // type c: integer-cents mean on the shared hour, lerp on the gap
    assert(out(("c", 200L)) == ((150L, 0)), s"c/200: ${out(("c", 200L))}")
    assert(out(("c", 201L)) == ((225L, 1)), s"c/201: ${out(("c", 201L))}")
    assert(out(("c", 202L)) == ((300L, 0)), s"c/202: ${out(("c", 202L))}")
    assert(out.size == 11 + 1 + 3, s"unexpected spine rows: ${out.size}")
  }

  test("q157 funnel chain is internally consistent: stage k's n_in is " +
      "stage k-1's n_out, removed = in - out, survival monotone and " +
      "recomputable from stage 1's population") {
    val rows = Queries.byName("q157_filter_funnel").build(spark, sf)
      .collect().sortBy(_.getAs[Int]("stage"))
    assert(rows.length == 5)
    val n0 = rows.head.getAs[Long]("n_in")
    assert(n0 == Tables.documents(spark, sf).count(),
      "stage 1 population is not the corpus")
    var prevOut = n0
    var prevSurv = 1000000L
    rows.foreach { r =>
      val (nin, nrem, nout) = (r.getAs[Long]("n_in"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("n_out"))
      assert(nin == prevOut, s"stage ${r.getAs[Int]("stage")}: n_in $nin " +
        s"!= previous n_out $prevOut")
      assert(nrem == nin - nout && nrem >= 0)
      val surv = r.getAs[Long]("survive_ppm")
      assert(surv == 1000000L * nout / n0,
        s"survive_ppm $surv not recomputable from n0=$n0, n_out=$nout")
      assert(surv <= prevSurv, "survival increased down the cascade")
      prevOut = nout; prevSurv = surv
    }
  }

  test("q160 spearman hits the exact poles on handcrafted sources: " +
      "monotone-agreeing signals give +1e6 ppm, a tiebreak-forced " +
      "reversal gives -1e6 with sum_d2 = n(n^2-1)/3") {
    val dir = Files.createTempDirectory("spear").toString
    // mono: both signals strictly decrease in k (quality composite via
    // shrinking length+alpha mix; diversity via 1/k repeated words) —
    // identical rank permutations, rho must be exactly +1e6.
    val mono = (1 to 4).map(k =>
      (k.toLong, Seq.fill(k)("x").mkString(" "), "en", "mono"))
    // rev: quality is CONSTANT (same length, same alpha ratio), so rank
    // a falls back to the doc_id tiebreak; diversity strictly INCREASES
    // as doc_id decreases — a perfect reversal, rho exactly -1e6.
    val letters = "abcdefgh".split("")
    val rev = (1 to 4).map { k =>
      val words = (0 until 8).map(i => letters(i % k))
      ((5 - k).toLong, words.mkString(" "), "en", "rev")
    }
    (mono ++ rev).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.byName("q160_spearman_agreement").build(spark, dir)
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_d2"),
          r.getAs[Long]("rho_ppm"))).toMap
    assert(out("mono") == ((4L, 0L, 1000000L)), s"mono pole: $out")
    // n(n^2-1)/3 for n=4 is 20
    assert(out("rev") == ((4L, 20L, -1000000L)), s"rev pole: $out")
  }

  test("q162 spike gate on handcrafted series: a 10x burst day fires, " +
      "warm-up days (<7 baseline days) never fire, and a day after a " +
      "long gap has an EMPTY range baseline — no verdict") {
    val dir = Files.createTempDirectory("spike").toString
    var id = 0L
    def ev(user: Long, day: Long, n: Int) = (0 until n).map { _ =>
      id += 1; (id, day * 86400L + 60L, user, "c", 1.0, "{}")
    }
    // user 1: one event/day for days 0..27, then a 10-event burst on 28
    val u1 = (0L to 27L).flatMap(d => ev(1, d, 1)) ++ ev(1, 28, 10)
    // user 2: 7 active days then silence; day 100's baseline frame
    // [73, 99] is empty — RANGE (not ROWS) keeps the gap honest
    val u2 = (0L to 6L).flatMap(d => ev(2, d, 1)) ++ ev(2, 100, 50)
    (u1 ++ u2)
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.byName("q162_spike_gate").build(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("base_n"), r.getAs[Long]("base_days"),
          r.getAs[Int]("spike"))).toMap
    // burst day: 27 baseline days of 1 event -> 10*27 >= 3*27 fires
    assert(out((1L, 28L)) == ((27L, 27L, 1)), s"burst: ${out((1L, 28L))}")
    // steady days past warm-up never fire; warm-up days never fire
    (1L to 27L).foreach { d =>
      assert(out((1L, d))._3 == 0, s"steady/warm-up day $d fired")
    }
    // a ROWS frame would see user 2's 7 old days here; RANGE sees none
    assert(out((2L, 100L)) == ((0L, 0L, 0)),
      s"gap day baseline not empty: ${out((2L, 100L))}")
  }

  test("q165 PIT lookup on a handcrafted span: facts split exactly at " +
      "the version boundary (days [d0, mid) to v1, [mid, d1] to v2), " +
      "and a single-day user degenerates to one version") {
    val dir = Files.createTempDirectory("pit").toString
    var id = 0L
    def ev(user: Long, day: Long) = { id += 1
      (id, day * 86400L + 60L, user, "c", 1.0, "{}") }
    // user 1: days 0..9 -> d0=0, d1=9, mid=(0+9) DIV 2 + 1 = 5:
    // v1 (tier 1) owns days 0..4, v2 (tier 11) owns days 5..9
    // user 3: a single active day -> v2 never exists
    val rows = (0L to 9L).map(d => ev(1, d)) :+ ev(3, 7)
    rows.toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.byName("q165_pit_features").build(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version")) ->
        (r.getAs[Long]("tier"), r.getAs[Long]("n_days"),
          r.getAs[Long]("n_events"))).toMap
    assert(out((1L, 1L)) == ((1L, 5L, 5L)), s"v1 window: $out")
    assert(out((1L, 2L)) == ((11L, 5L, 5L)), s"v2 window: $out")
    assert(out((3L, 1L)) == ((0L, 1L, 1L)) && !out.contains((3L, 2L)),
      s"single-day user: $out")
    assert(out.size == 3, s"unexpected rows: $out")
  }

  test("q166 bootstrap CI collapses to a point on a constant column: " +
      "every Poisson-weighted replicate mean of a constant is the " +
      "constant, so ci_lo = mean = ci_hi exactly") {
    val dir = Files.createTempDirectory("boot").toString
    (1L to 40L).map(i => (i, "a b c", "en", "const"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.byName("q166_bootstrap_ci").build(spark, dir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("mean_fp") == 300L &&
      row.getAs[Long]("ci_lo_fp") == 300L &&
      row.getAs[Long]("ci_hi_fp") == 300L,
      s"constant-column CI not degenerate: $row")
  }

  test("q158 keep policies agree on the cluster count and best-quality " +
      "keeping dominates on mean kept quality") {
    val rows = Queries.byName("q158_keep_policy").build(spark, sf)
      .collect()
      .map(r => r.getAs[String]("policy") ->
        (r.getAs[Long]("kept_docs"), r.getAs[Long]("kept_tok"),
          r.getAs[Long]("mean_q_fp"))).toMap
    assert(rows.keySet == Set("a_longest", "b_best_quality", "c_min_id"))
    val counts = rows.values.map(_._1).toSet
    assert(counts.size == 1 && counts.head > 0,
      s"policies disagree on cluster count: $rows")
    val bq = rows("b_best_quality")._3
    assert(bq >= rows("a_longest")._3 && bq >= rows("c_min_id")._3,
      s"best-quality policy not dominant on mean quality: $rows")
  }
}
