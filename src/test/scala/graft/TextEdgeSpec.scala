package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Adversarial corpus shapes the fixed testdata never produces: empty
  * text, single-token docs, a doc that is one token repeated, and a
  * whitespace-only doc. The declared text queries must stay total
  * (no crash) and internally consistent on them.
  */
class TextEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("textedge").toString
    Seq(
      (0L, "", "en", "src0", 0L),
      (1L, "solo", "en", "src0", 4L),
      (2L, "rep rep rep rep rep rep rep rep", "en", "src1", 31L),
      (3L, "a normal looking document with several words", "de",
        "src1", 44L),
      (4L, "   ", "de", "src2", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q103 tf-idf: every doc gets exactly one top term; empty docs " +
    "contribute their split artifact, not a crash") {
    val out = Queries.byName("q103_tfidf_topterms").build(spark, dir)
      .collect()
    // n_docs across (lang, term) rows must reconcile to the corpus size
    // (split("") yields [""], so even the empty doc carries one "term")
    assert(out.map(_.getLong(2)).sum == 5L)
  }

  test("q89 repetition filter: kept + dropped reconciles; the all-same-" +
    "token doc is dropped") {
    val out = Queries.byName("q89_repetition_filter").build(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.map(x => x._2 + x._3).sum == 5L)
    val en = out.find(_._1 == "en").get
    // doc 2 is 100% one token -> dropped; docs 0 (single "" token) and
    // 1 (single token) are also max-fraction 1.0 -> dropped
    assert(en._3 >= 3L, s"repetition filter kept degenerate docs: $out")
  }

  test("q45 token count and q42 text stats stay total on empty text") {
    val tc = Queries.byName("q45_token_count").build(spark, dir).collect()
    assert(tc.nonEmpty)
    val ts = Queries.byName("q42_text_stats").build(spark, dir).collect()
    assert(ts.nonEmpty)
  }

  test("q97 span dedup: docs shorter than the span window survive intact") {
    val out = Queries.byName("q97_span_dedup").build(spark, dir).collect()
    // all 5 docs are shorter than the 16-token span window -> no span is
    // ever extracted, every doc must come through unchanged
    assert(out.length == 5)
  }

  test("q40 exact dedup keeps all docs (no two texts equal)") {
    val out = Queries.byName("q40_text_dedup").build(spark, dir).collect()
    assert(out.nonEmpty)
  }
}
