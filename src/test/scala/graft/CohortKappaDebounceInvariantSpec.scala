package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for q180 (cohort retention triangle), q181
  * (inter-filter Cohen's kappa), q182 (event debounce) on handcrafted
  * shapes plus identity checks the value oracle only exercises on the
  * fixed distribution.
  */
class CohortKappaDebounceInvariantSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = Files.createTempDirectory("ev").toString
    rows.map { case (id, sec, user, typ) => (id, sec, user, typ, 1.0, "{}") }
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q180 on handcrafted cohorts: offset-0 cell is the full cohort " +
      "(1e6 ppm), gaps leave missing cells, returning users count once " +
      "per week regardless of event volume") {
    val wk = 604800L
    val dir = writeEvents(Seq(
      // cohort week 100: users 1, 2; user 1 returns weeks 101 and 103
      // (twice in 101 — still one row), user 2 never returns
      (1L, 100 * wk, 1L, "a"), (2L, 100 * wk + 5, 2L, "a"),
      (3L, 101 * wk, 1L, "a"), (4L, 101 * wk + 9, 1L, "a"),
      (5L, 103 * wk, 1L, "a"),
      // cohort week 102: user 3 only
      (6L, 102 * wk, 3L, "a")))
    val out = Queries.byName("q180_cohort_retention").build(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      (100L, 0L) -> ((2L, 1000000L)),
      (100L, 1L) -> ((1L, 500000L)),
      (100L, 3L) -> ((1L, 500000L)),
      (102L, 0L) -> ((1L, 1000000L))), s"got $out")
  }

  test("q181 kappa and po recompute exactly from the reported 2x2 " +
      "table, and the table's marginals equal the standalone q120/q89 " +
      "filter verdict counts on testdata") {
    // fixture with one clearly repetitive pair (fails f2: a single
    // token holds all mass) and one diverse pair (passes f2: 30 equal
    // tokens); f1 verdicts fall wherever the hash weights land — the
    // check is the INTERNAL consistency of table -> po/kappa, which
    // must hold for any verdict pattern.
    val passDoc = (1 to 30).map(i => s"tok$i").mkString(" ") // diverse
    val failDoc = Seq.fill(30)("same").mkString(" ")         // repetitive
    val dir = Files.createTempDirectory("kappa").toString
    Seq((1L, passDoc), (2L, failDoc), (3L, passDoc + " extra"),
      (4L, failDoc + " same"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.byName("q181_filter_kappa").build(spark, dir)
      .collect().head
    val (n11, n10, n01, n00) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))
    assert(n11 + n10 + n01 + n00 == 4)
    // recompute kappa from the table independently and compare
    val n = 4L
    val agree = n11 + n00
    val pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    val (num, den) = (n * agree - pe, n * n - pe)
    val expKappa =
      if (den == 0) { if (agree == n) 1000000L else 0L }
      else if (num >= 0) 1000000L * num / den
      else -(1000000L * -num / den)
    assert(r.getLong(5) == expKappa,
      s"kappa ${r.getLong(5)} != recomputed $expKappa (table " +
        s"$n11/$n10/$n01/$n00)")
    assert(r.getLong(4) == 1000000L * agree / n, "po mismatch")
    // testdata: marginals of the 2x2 table must match the standalone
    // filter queries' verdict counts
    val real = Queries.byName("q181_filter_kappa").build(spark, sf)
      .collect().head
    val keepF1 = Queries.byName("q120_quality_classifier").build(spark, sf)
      .filter(col("keep")).count()
    val keptF2 = Queries.byName("q89_repetition_filter").build(spark, sf)
      .agg(sum("kept_docs")).collect().head.getLong(0)
    assert(real.getLong(0) + real.getLong(1) == keepF1,
      "f1 marginal != q120 keep count")
    assert(real.getLong(0) + real.getLong(2) == keptF2,
      "f2 marginal != q89 kept count")
  }

  test("q182 debounce on handcrafted bursts: first event of each burst " +
      "kept, 60 s boundary is inclusive-keep, types and users isolate") {
    val dir = writeEvents(Seq(
      // user 1 type a: burst of 3 within 60 s, then a 4th at exactly
      // +60 s from the 3rd (kept — boundary), then one far later (kept)
      (1L, 1000L, 1L, "a"), (2L, 1030L, 1L, "a"), (3L, 1059L, 1L, "a"),
      (4L, 1119L, 1L, "a"), (5L, 9999L, 1L, "a"),
      // user 2 same type, inside user 1's burst window: independent
      (6L, 1001L, 2L, "a"),
      // user 1 other type at the same seconds: independent
      (7L, 1000L, 1L, "b"), (8L, 1001L, 1L, "b")))
    val out = Queries.byName("q182_event_debounce").build(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // type a: 6 raw (5 + user2's 1), kept = 3 (ids 1, 4, 5) + 1 (id 6)
    assert(out("a") == ((6L, 4L, 1000000L * 2 / 6)), s"a: ${out("a")}")
    // type b: 2 raw, 1 kept (id 8 is 1 s after id 7)
    assert(out("b") == ((2L, 1L, 500000L)), s"b: ${out("b")}")
  }
}
