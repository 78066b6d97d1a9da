package graft

import org.apache.spark.sql.functions._

import graft.ops.{SpaceSaving, SpaceSavingAggregator}

/** X99 SpaceSaving topK: the Metwally bounds (exact ∈ [est − err, est]),
  * guaranteed-membership soundness, partition invariance of the CLAIMS
  * (contents may vary with fold order — the documented reason the op is
  * bounds-gated), and exactness when the vocabulary fits the capacity.
  */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(toks: Seq[String], cap: Int, parts: Int)
      : Seq[SpaceSaving.Entry] =
    spark.createDataset(toks).repartition(parts)
      .select(new SpaceSavingAggregator(cap).toColumn).head()

  private def exact(toks: Seq[String]): Map[String, Long] =
    toks.groupBy(identity).map { case (t, g) => t -> g.size.toLong }

  // Zipf-ish deterministic stream: token i appears ~N/i times
  private val stream: Seq[String] = (1 to 40).flatMap { i =>
    Seq.fill(400 / i)(s"tok$i")
  } ++ (1 to 500).map(i => s"rare$i")

  test("bounds hold for every reported entry under any partitioning") {
    val truth = exact(stream)
    for (parts <- Seq(1, 3, 8)) {
      val sum = summarize(stream, cap = 16, parts = parts)
      assert(sum.nonEmpty && sum.size <= 16)
      sum.foreach { en =>
        val t = truth.getOrElse(en.tok, 0L)
        assert(t <= en.c && en.c - en.e <= t,
          s"parts=$parts ${en.tok}: exact $t outside [${en.c - en.e}, ${en.c}]")
      }
    }
  }

  test("guaranteed members are in every true top-k, under any " +
      "partitioning, and the head hitter is always claimed") {
    val truth = exact(stream)
    val k = 5
    for (parts <- Seq(1, 3, 8)) {
      val sum = summarize(stream, cap = 16, parts = parts)
      val thresh = if (sum.size > k) sum(k).c else 0L
      val claimed = sum.take(k).filter(en => en.c - en.e > thresh)
      assert(claimed.nonEmpty, s"parts=$parts: no guarantee fired")
      claimed.foreach { en =>
        val beat = truth.valuesIterator.count(_ > truth(en.tok))
        assert(beat < k,
          s"parts=$parts ${en.tok} guaranteed but $beat tokens out-count it")
      }
      // tok1 (400 occurrences, 2x the runner-up) must always be claimed
      assert(claimed.exists(_.tok == "tok1"),
        s"parts=$parts: dominant tok1 not guaranteed")
    }
  }

  test("exact when the vocabulary fits the capacity: every count exact, " +
      "every error zero, any split") {
    val small = (1 to 12).flatMap(i => Seq.fill(i * 3)(s"w$i"))
    val truth = exact(small)
    for (parts <- Seq(1, 4)) {
      val sum = summarize(small, cap = 64, parts = parts)
      assert(sum.size == truth.size)
      sum.foreach { en =>
        assert(en.c == truth(en.tok) && en.e == 0L,
          s"parts=$parts ${en.tok}: (${en.c}, ${en.e}) vs ${truth(en.tok)}")
      }
    }
  }

  test("report order is the deterministic (count DESC, token ASC) total " +
      "order and ranks are stable within one fold") {
    val sum = summarize(stream, cap = 16, parts = 1)
    val resorted = sum.sortBy(en => (-en.c, en.tok))
    assert(sum == resorted)
  }

  private def summarizeW(rows: Seq[(String, Long)], cap: Int, parts: Int)
      : Seq[SpaceSaving.Entry] =
    spark.createDataset(rows).repartition(parts)
      .select(new graft.ops.WeightedSpaceSavingAggregator(cap).toColumn)
      .head()

  test("weighted: bounds and guarantees hold on weight mass under any " +
      "partitioning; weight-1 input equals the unweighted fold's claims") {
    val wrows = (1 to 40).map(i => s"u$i" -> (1000L / i)) ++
      (1 to 300).map(i => s"r$i" -> 2L)
    val truth = wrows.groupBy(_._1)
      .map { case (t, g) => t -> g.map(_._2).sum }
    for (parts <- Seq(1, 5)) {
      val sum = summarizeW(wrows, cap = 16, parts = parts)
      sum.foreach { en =>
        val t = truth.getOrElse(en.tok, 0L)
        assert(t <= en.c && en.c - en.e <= t,
          s"parts=$parts ${en.tok}: mass $t outside [${en.c - en.e}, ${en.c}]")
      }
      val thresh = if (sum.size > 5) sum(5).c else 0L
      val claimed = sum.take(5).filter(en => en.c - en.e > thresh)
      assert(claimed.exists(_.tok == "u1"),
        s"parts=$parts: dominant u1 not guaranteed")
      claimed.foreach { en =>
        assert(truth.valuesIterator.count(_ > truth(en.tok)) < 5,
          s"parts=$parts ${en.tok} guaranteed but not true top-5")
      }
    }
    // weight 1 everywhere ≡ the unweighted occurrence fold (same stream
    // order through the Summary API directly — deterministic equality)
    val su = new SpaceSaving.Summary(16)
    val sw = new SpaceSaving.Summary(16)
    stream.foreach { t => su.add(t); sw.add(t, 1L) }
    assert(su.entries == sw.entries)
  }

  test("declared q217 reports 10 ranked users whose claims replay " +
      "against exact cents mass") {
    val df = Queries.byName("q217_topk_weighted").build(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val truth = Tables.events(spark, sf)
      .groupBy(col("user_id").cast("string").as("u"))
      .agg(sum(graft.ops.Scalars.cents(col("value"))).as("w"))
      .as[(String, Long)].collect().toMap
    rows.foreach { r =>
      val (uid, est, err, thresh, guar) = (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))
      val t = truth.getOrElse(uid, 0L)
      assert(t <= est && est - err <= t, s"user $uid: $t outside bounds")
      assert(guar == (est - err > thresh), s"user $uid: inconsistent flag")
      if (guar)
        assert(truth.valuesIterator.count(_ > t) < 10,
          s"user $uid guaranteed but not in the true top-10 by mass")
    }
    // threshold soundness: every user outside the reported top-10 sits
    // at or below the dumped certification threshold
    val thresh0 = rows.head.getLong(4)
    val reported = rows.map(_.getString(1)).toSet
    val worst = truth.collect {
      case (u, w) if !reported(u) => w
    }.foldLeft(0L)(math.max)
    assert(worst <= thresh0,
      s"unreported mass $worst exceeds threshold $thresh0")
  }

  test("declared q214 runs, reports 10 ranked rows, and its claims " +
      "replay against the exact corpus counts") {
    val df = Queries.byName("q214_topk_spacesaving").build(spark, sf)
    val rows = df.collect()
    assert(rows.length == 10 && rows.map(_.getInt(0)).toSeq == (1 to 10))
    val truth = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    rows.foreach { r =>
      val (tok, est, err, guar) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      val t = truth.getOrElse(tok, 0L)
      assert(t <= est && est - err <= t, s"$tok: $t outside bounds")
      if (guar)
        assert(truth.valuesIterator.count(_ > t) < 10,
          s"$tok guaranteed but not in the true top-10")
    }
  }
}
