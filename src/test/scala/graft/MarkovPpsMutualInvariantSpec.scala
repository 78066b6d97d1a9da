package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for q177 (transition matrix), q178 (systematic
  * PPS sampling — telescoping pick-count identity), q179 (mutual NN —
  * full driver-side recompute within sign buckets).
  */
class MarkovPpsMutualInvariantSpec extends SparkSpec {
  import spark.implicits._

  test("q177 on a handcrafted stream: exact transition counts, same-ts " +
      "ties broken by event_id, single-event users contribute nothing, " +
      "rows are row-stochastic up to floor loss") {
    val dir = Files.createTempDirectory("markov").toString
    def ev(id: Long, sec: Long, user: Long, typ: String) =
      (id, sec, user, typ, 1.0, "{}")
    Seq(
      ev(1, 10, 1, "A"), ev(2, 20, 1, "B"), ev(3, 30, 1, "A"),
      ev(4, 10, 2, "B"), ev(5, 20, 2, "A"),
      // user 3: two same-second events — event_id 6 then 7 orders C->D
      ev(6, 50, 3, "C"), ev(7, 50, 3, "D"),
      ev(8, 99, 4, "E")) // single event: no transition
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Queries.byName("q177_transition_matrix").build(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("A", "B", 1L, 1000000L), ("B", "A", 2L, 1000000L),
      ("C", "D", 1L, 1000000L)), s"got $got")
    // real data: per-from row sums telescope to ~1e6 (floor loss < rows)
    val real = Queries.byName("q177_transition_matrix").build(spark, sf)
      .collect().groupBy(_.getString(0))
    real.foreach { case (from, rows) =>
      val p = rows.map(_.getLong(3)).sum
      assert(p <= 1000000L && p > 1000000L - rows.length,
        s"$from: sum(p_ppm)=$p over ${rows.length} rows")
    }
  }

  test("q178 pick counts telescope to total DIV step, every doc wider " +
      "than the step is picked, and the hand case matches") {
    val dir = Files.createTempDirectory("pps").toString
    // ntok: 50, 150, 1, 599, 200  -> total 1000, step 10
    val toks = Seq(1L -> 50, 2L -> 150, 3L -> 1, 4L -> 599, 5L -> 200)
    toks.map { case (id, n) =>
      (id, Seq.fill(n)("w").mkString(" "), "en", "s", n.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.byName("q178_pps_sample").build(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // replay: step = 10, cum walk in doc_id order
    var cum = 0L
    val exp = toks.flatMap { case (id, n) =>
      val picks = (cum + n) / 10 - cum / 10
      cum += n
      if (picks > 0) Some((id, n.toLong, picks)) else None
    }
    assert(got == exp, s"got $got\nexpected $exp")
    assert(got.map(_._3).sum == 100L, "picks do not telescope to k")
    // real data: telescoping identity + wide-doc guarantee
    val real = Queries.byName("q178_pps_sample").build(spark, sf).collect()
    val totalNtok = Tables.documents(spark, sf)
      .select(sum(greatest(size(split(col("text"), " ")).cast("long"),
        lit(1L)))).collect().head.getLong(0)
    val step = math.max(totalNtok / 100, 1L)
    assert(real.map(_.getLong(2)).sum == totalNtok / step,
      "sum(n_picks) != total DIV step")
    real.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) / step + 1,
        s"doc ${r.getLong(0)}: implausible pick count")
    }
  }

  test("q179 equals a driver-side brute-force mutual-top-1 within sign " +
      "buckets, and every reported pair is symmetric by construction") {
    val d = sf
    // mirror the query's distinct-vector contraction (min-id rep)
    val vecs = Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .groupBy(_._2.toSeq).map { case (_, g) => g.minBy(_._1) }.toMap
    def bucket(v: Array[Float]): Int =
      (0 until 8).map(j => if (v(j) > 0f) 1 << j else 0).sum
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val byBucket = vecs.keys.groupBy(id => bucket(vecs(id)))
    val top1 = byBucket.values.flatMap { ids =>
      val s = ids.toSeq
      s.flatMap { i =>
        val cands = s.filter(_ != i)
          .map(j => (j, cos(vecs(i), vecs(j))))
        if (cands.isEmpty) None
        else Some(i -> cands.minBy { case (j, c) => (-c, j) }._1)
      }
    }.toMap
    val expected = top1.toSeq.collect {
      case (i, j) if i < j && top1.get(j).contains(i) => (i, j)
    }.sorted
    val got = Queries.byName("q179_mutual_nn").build(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.nonEmpty, "no mutual pair — degenerate fixture")
    got.foreach { case (a, b) => assert(a < b) }
  }
}
