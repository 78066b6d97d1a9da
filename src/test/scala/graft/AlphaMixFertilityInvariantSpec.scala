package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for q209 (α=0.5 temperature mixture — hand-derived
  * shares, uniform-corpus identity, share-sum bounds) and q210 (BPE
  * fertility — hand-derived priority-dependent encoding, cross-query token
  * conservation against q201's compression curve).
  */
class AlphaMixFertilityInvariantSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    // (doc_id, text, lang)
    val dir = Files.createTempDirectory("amfdocs").toString
    rows.map { case (id, text, lang) =>
      (id, text, lang, "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q209 hand-derived: 4-vs-1 docs -> head share 666666 (boost " +
      "833332), tail share 333333 (boost 1666665)") {
    val dir = writeDocs(
      (1 to 4).map(i => (i.toLong, "x", "en")) :+ ((5L, "x", "fr")))
    val got = Queries.byName("q209_alpha_mix").build(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("en") == ((800000L, 666666L, 833332L)), s"en: ${got("en")}")
    assert(got("fr") == ((200000L, 333333L, 1666665L)), s"fr: ${got("fr")}")
  }

  test("q209 uniform corpus: alpha shares equal natural shares, boost " +
      "exactly 1e6") {
    val dir = writeDocs(Seq((1L, "x", "en"), (2L, "x", "en"),
      (3L, "x", "fr"), (4L, "x", "fr")))
    val got = Queries.byName("q209_alpha_mix").build(spark, dir).collect()
    got.foreach { r =>
      assert(r.getLong(2) == r.getLong(3) && r.getLong(4) == 1000000L,
        s"uniform: $r")
    }
  }

  test("q209 on the real corpus: alpha shares sum to ~1e6, the tail is " +
      "up-weighted and the head down-weighted (monotone boost)") {
    val got = Queries.byName("q209_alpha_mix").build(spark, sf).collect()
    assert(got.nonEmpty)
    val aSum = got.map(_.getLong(3)).sum
    assert(aSum <= 1000000L && aSum > 1000000L - got.length,
      s"alpha share sum: $aSum")
    // boost must be anti-monotone in n_docs: bigger language, smaller boost
    val byN = got.sortBy(_.getLong(1)).map(_.getLong(4)).toSeq
    assert(byN.zip(byN.tail).forall { case (a, b) => a >= b },
      s"boost not anti-monotone in size: ${got.toSeq}")
  }

  test("q210 hand-derived: merge priority shapes fertility — 'ab' fully " +
      "merges (1 token), 'xyz' takes the xy merge and blocks yz") {
    // words: ab freq 3 (en), xyz freq 1 (de); mined pairs by (count DESC,
    // pair ASC): ab(3), xy(1), yz(1). Round 2 merges xy -> [xy, z];
    // round 3's yz no longer finds an adjacency (y consumed) — priority
    // semantics, the BpeEncodeInvariantSpec property read through the
    // fertility lens.
    val dir = writeDocs(Seq((1L, "ab ab ab", "en"), (2L, "xyz", "de")))
    val got = Queries.byName("q210_bpe_fertility").build(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got("en") == ((3L, 6L, 3L, 2000L, 1000L)), s"en: ${got("en")}")
    assert(got("de") == ((1L, 3L, 2L, 1500L, 2000L)), s"de: ${got("de")}")
  }

  test("q210 token conservation: per-language tokens sum to q201's " +
      "round-8 corpus total (the two views of one tokenizer agree)") {
    val fert = Queries.byName("q210_bpe_fertility").build(spark, sf)
      .agg(sum("n_tokens")).head.getLong(0)
    val curve = Queries.byName("q201_bpe_encode").build(spark, sf)
      .filter(col("round") === 8).head.getLong(2)
    assert(fert == curve, s"fertility total $fert != q201 round-8 $curve")
  }

  test("q210 on the real corpus: every token covers >=1 char, every word " +
      ">=1 token (milli ratios bounded below by 1000)") {
    val got = Queries.byName("q210_bpe_fertility").build(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(4) >= 1000L && r.getLong(5) >= 1000L, s"bounds: $r")
    }
  }
}
