package graft

import org.apache.spark.sql.functions._

/** Extension-tier invariants (SURVEY.md §2.11): dedup, minhash/LSH,
  * similarity — checked on small controlled fixtures plus sf0.001.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps exactly one doc per distinct text (min doc_id)") {
    val df = Seq(
      (1L, "same text here"), (2L, "same text here"),
      (3L, "other text"), (4L, "same text here")).toDF("doc_id", "text")
    df.createOrReplaceTempView("dedup_fixture")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col("text"), 256)).orderBy("doc_id")
    val kept = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }

  test("identical texts share minhash signatures; q53 flags them as candidates") {
    // near-identical docs: one word changed out of 30
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val variant = base.replace("w15", "xx")
    val docs = Seq((0L, base), (1L, base), (2L, variant), (3L, "completely different words entirely"))
      .toDF("doc_id", "text")
    // exact-duplicate docs must produce identical signatures
    val qsig = Queries.byName("q47_minhash_sig")
    // run the same sig pipeline through a temp parquet dir
    val tmp = java.nio.file.Files.createTempDirectory("graftdocs").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val sigs = qsig.build(spark, tmp).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
    val pairs = Queries.byName("q53_minhash_band_pairs").build(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))           // exact dup always a candidate
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((1L, 3L)))
  }

  test("cosine top-k: identical vector ranks first with similarity 1") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)), (3L, Array(0.7f, 0.7f, 0.0f)))
      .toDF("vec_id", "embedding")
    val dot = (a: String, b: String) => aggregate(
      zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val q = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot("embedding", "q_emb") /
        (sqrt(dot("embedding", "embedding")) * sqrt(dot("q_emb", "q_emb"))))
      .orderBy(col("cos").desc, col("vec_id"))
      .select("vec_id", "cos").collect()
    assert(scored.head.getLong(0) == 1L)
    assert(math.abs(scored.head.getDouble(1) - 1.0) < 1e-12)
  }

  test("jaccard is 1 for identical sets, 0 for disjoint, symmetric bounds") {
    val df = Seq(
      ("a b c", "a b c"), ("a b c", "x y z"), ("a b c d", "c d e f"))
      .toDF("t1", "t2")
      .select(
        array_distinct(split(col("t1"), " ")).as("w1"),
        array_distinct(split(col("t2"), " ")).as("w2"))
      .select((size(array_intersect(col("w1"), col("w2"))).cast("double") /
        (size(col("w1")) + size(col("w2")) -
          size(array_intersect(col("w1"), col("w2"))))).as("j"))
    val js = df.collect().map(_.getDouble(0))
    assert(js(0) == 1.0 && js(1) == 0.0)
    assert(js(2) > 0 && js(2) < 1)
  }

  test("simhash of identical docs equal; differing docs differ (on sf0.001)") {
    val sims = Queries.byName("q49_simhash").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sims.nonEmpty)
    assert(sims.forall { case (_, s) => s >= 0 && s < (1L << 16) })
  }

  test("q97 span dedup: controlled corpus — shared spans drop everywhere " +
    "but first occurrence; fully-duplicate docs disappear") {
    // spans are 16-token windows; build docs from labeled 16-token spans
    def span(tag: String): String = (1 to 16).map(i => s"$tag$i").mkString(" ")
    val (a, b, c, d) = (span("a"), span("b"), span("c"), span("d"))
    val tail = "t1 t2 t3" // a final sub-width span, also deduped by text
    val fix = Seq(
      (1L, s"$a $b"),        // keeps A, B (first occurrences)
      (2L, s"$b $c"),        // B is doc 1's → keeps C only
      (3L, a),               // entirely duplicate → disappears
      (4L, s"$d $tail"),     // unique span + short tail survive whole
      (5L, s"$c $tail")      // C and tail both already seen → disappears
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("q97fix").toString
    fix.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.byName("q97_span_dedup").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, s"$a $b", 2L),
      (2L, c, 1L),
      (4L, s"$d $tail", 2L)))
  }

  test("q97 span dedup is the identity on a duplicate-free corpus") {
    def words(doc: Int, n: Int): String =
      (1 to n).map(i => s"w${doc}_$i").mkString(" ")
    // lengths cross span boundaries: exact multiple, off-by-one, sub-width
    val fix = Seq(
      (1L, words(1, 32)), (2L, words(2, 33)), (3L, words(3, 7)),
      (4L, words(4, 16)), (5L, words(5, 48))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("q97id").toString
    fix.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.byName("q97_span_dedup").build(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = fix.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === expected, "dedup of a duplicate-free corpus must be identity")
  }

  test("declared text queries produce rows at sf0.001") {
    Seq("q40_text_dedup", "q41_cosine_topk", "q42_text_stats", "q43_lang_id",
      "q44_quality_score", "q45_token_count", "q46_fingerprint",
      "q51_ann_lsh", "q52_binary_meta").foreach { name =>
      assert(Queries.byName(name).build(spark, sf).count() > 0, name)
    }
  }
}
