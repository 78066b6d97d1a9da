package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for q174 (prefix-filter exact set-similarity
  * join — brute-force completeness/threshold-boundary check), q175
  * (quantile normalization — identity and hand-derived mapping), and
  * q176 (label propagation — full independent driver-side recompute).
  */
class SetSimNormalizeInvariantSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("setsim").toString
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Independent shingle + Jaccard reimplementation (the query's spec). */
  private def shingleSet(text: String): Set[String] = {
    val w = text.split(" ")
    if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
    else Set(text)
  }

  test("q174 equals brute-force all-pairs Jaccard over distinct texts — " +
      "prefix filtering loses nothing, verification admits nothing, and " +
      "the J = 0.6 boundary is inclusive") {
    val docs = Seq(
      (1L, "a b c d e f"),   // vs doc 2: I=3, na=nb=4 -> J=0.6 exactly
      (2L, "a b c d e g"),
      (3L, "a b c d e f"),   // verbatim copy of 1 -> contracted away
      (4L, "a b c d e f x"), // vs 1: I=4, na=4, nb=5 -> J=0.8
      (5L, "p q r s t u"),   // disjoint island
      (6L, "p q r s t u v w x y z"), // vs 5: I=4,na=4,nb=9 -> J=4/9 OUT
      (7L, "m n o"))         // single-shingle doc
    val dir = writeDocs(docs)
    // brute force over distinct texts, min-id representative
    val reps = docs.groupBy(_._2).map { case (t, g) =>
      (g.map(_._1).min, shingleSet(t)) }.toSeq
    val expected = (for {
      (ai, sa) <- reps; (bi, sb) <- reps if ai < bi
      i = (sa & sb).size
      ppm = 1000000L * i / (sa.size + sb.size - i)
      if ppm >= 600000L
    } yield (ai, bi, ppm)).sortBy(p => (p._1, p._2))
    val got = Queries.byName("q174_setsim_prefix").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(expected.exists(_._3 == 600000L),
      "fixture lost its exact-boundary pair")
    assert(got.exists { case (a, b, _) => a == 1L && b == 2L },
      "J=0.6 boundary pair missing (threshold must be inclusive)")
    assert(!got.exists { case (a, b, _) => a == 5L && b == 6L },
      "sub-threshold pair leaked in")
  }

  private def writeSrcDocs(rows: Seq[(Long, String, Int)]): String = {
    val dir = Files.createTempDirectory("qnorm").toString
    rows.map { case (id, src, ntok) =>
      (id, Seq.fill(ntok)("w").mkString(" "), "en", src,
        (2 * ntok - 1).toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q175 on a single-source corpus is the identity map, and the " +
      "two-source hand case maps ranks to the derived global values") {
    val one = writeSrcDocs(Seq((1L, "a", 5), (2L, "a", 9), (3L, "a", 2)))
    Queries.byName("q175_quantile_normalize").build(spark, one)
      .collect().foreach { r =>
        assert(r.getAs[Long]("norm_tok") == r.getAs[Long]("ntok"),
          s"identity violated: $r")
      }
    // A: ntok {10,20,30} (n_s=3), B: {1,2,3,4,5} (n_s=5), N=8
    // global sorted: 1,2,3,4,5,10,20,30
    // A targets t=r*7/2 -> 0,3,7 -> 1,4,30; B t=r*7/4 -> 0,1,3,5,7
    val two = writeSrcDocs(Seq(
      (1L, "A", 10), (2L, "A", 20), (3L, "A", 30),
      (4L, "B", 1), (5L, "B", 2), (6L, "B", 3), (7L, "B", 4),
      (8L, "B", 5)))
    val out = Queries.byName("q175_quantile_normalize").build(spark, two)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("norm_tok"))
      .toMap
    val exp = Map(1L -> 1L, 2L -> 4L, 3L -> 30L,
      4L -> 1L, 5L -> 2L, 6L -> 4L, 7L -> 10L, 8L -> 30L)
    assert(out == exp, s"got $out\nexpected $exp")
  }

  test("q176 equals a full driver-side synchronous 2-round label " +
      "propagation over the same contracted graph") {
    val d = "/root/testdata/sf0.01"
    val pairs = QueriesText.contractedPairs(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val adj = scala.collection.mutable.Map
      .empty[Long, List[Long]].withDefaultValue(Nil)
    pairs.foreach { case (a, b) =>
      adj(a) = b :: adj(a); adj(b) = a :: adj(b)
    }
    val srcOf = Tables.documents(spark, d)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val init = adj.keys.map(n => n -> srcOf(n)).toMap
    def step(cur: Map[Long, String]): Map[Long, String] =
      adj.keys.map { n =>
        val counts = adj(n).groupBy(cur).map { case (l, xs) =>
          (l, xs.size) }
        // (count DESC, label ASC)
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    val fin = step(step(init))
    val expected = fin.groupBy(_._2).map { case (l, m) =>
      (l, m.size.toLong,
        m.keys.count(n => init(n) != l).toLong)
    }.toSeq.sortBy(_._1)
    val got = Queries.byName("q176_label_propagation").build(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.map(_._2).sum == adj.size.toLong)
  }
}
