package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for q201 (BPE-encode apply): hand-derived
  * encodings under known merge tables, the priority semantics the op
  * exists for (round r consumes symbols before round r+1 sees them),
  * greedy-non-overlap on distinct-char pairs, the sentinel identity for
  * absent ranks, and the telescoping compression curve
  * tokens_r = tokens_{r-1} − merge_occ_r on the full query.
  */
class BpeEncodeInvariantSpec extends SparkSpec {
  import spark.implicits._

  private def symsOf(words: Seq[(String, Long)]) =
    words.toDF("word", "freq")
      .select(col("word"), col("freq"),
        posexplode(expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
      .toDF("word", "freq", "pos", "sym")

  private def mergesOf(pairs: Seq[String]) =
    pairs.zipWithIndex.map { case (p, i) => (p, i + 1) }.toDF("pair", "rk")

  /** Apply the full merge list in priority order; final symbol sequence
    * per word. */
  private def encode(
      words: Seq[(String, Long)],
      pairs: Seq[String]): Map[String, Seq[String]] = {
    var syms = symsOf(words)
    val merges = mergesOf(pairs)
    for (r <- 1 to pairs.length)
      syms = QueriesTextAnalysis.bpeRound(
        syms, QueriesTextAnalysis.bpeMergeRow(merges, r))
    syms.orderBy("word", "pos").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(3)).toSeq).toMap
  }

  test("q201 hand-derived: merges [th, he] encode 'there'->[th,e,r,e], " +
      "'the'->[th,e] (th has priority, so he never fires)") {
    val got = encode(Seq(("there", 1L), ("the", 1L)), Seq("th", "he"))
    assert(got("there") == Seq("th", "e", "r", "e"), got("there"))
    assert(got("the") == Seq("th", "e"), got("the"))
  }

  test("q201 priority is load-bearing: [he, th] encodes 'the'->[t,he]") {
    val got = encode(Seq(("the", 1L)), Seq("he", "th"))
    assert(got("the") == Seq("t", "he"), got("the"))
  }

  test("q201 greedy left-to-right, matches disjoint by construction: " +
      "ab on 'ababab'->[ab,ab,ab], 'aab'->[a,ab]") {
    val got = encode(Seq(("ababab", 1L), ("aab", 1L)), Seq("ab"))
    assert(got("ababab") == Seq("ab", "ab", "ab"), got("ababab"))
    assert(got("aab") == Seq("a", "ab"), got("aab"))
  }

  test("q201 merged symbols never rematch a later single-char pair: " +
      "[xy, yx] on 'xyx' stops at [xy, x]") {
    val got = encode(Seq(("xyx", 1L)), Seq("xy", "yx"))
    assert(got("xyx") == Seq("xy", "x"), got("xyx"))
  }

  test("q201 absent merge rank degrades to identity via the sentinel row") {
    var syms = symsOf(Seq(("ab", 1L)))
    syms = QueriesTextAnalysis.bpeRound(
      syms, QueriesTextAnalysis.bpeMergeRow(mergesOf(Seq("ab")), 2))
    val got = syms.orderBy("pos").collect().map(_.getString(3)).toSeq
    assert(got == Seq("a", "b"), got)
  }

  test("q201 merge mining: same-char pairs excluded, rank by " +
      "(weighted count DESC, pair ASC), top-k cut") {
    // 'aab' x3 contributes aa(excluded), ab(3); 'cdcd' x2: cd(4), dc(2)
    val words = Seq(("aab", 3L), ("cdcd", 2L)).toDF("word", "freq")
    val got = QueriesTextAnalysis.bpeMineMerges(words, 2)
      .orderBy("rk").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("cd", 1), ("ab", 2)), got)
  }

  test("q201 compression curve telescopes: tokens_r = tokens_{r-1} - occ_r " +
      "and round 0 equals total corpus chars") {
    val dir = Files.createTempDirectory("bpedocs").toString
    val texts = Seq(
      (1L, "the cat sat on the mat and the rat ate there"),
      (2L, "the thin hen then heard the other weather"),
      (3L, "banana bandana cabana the the the"))
    texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Queries.byName("q201_bpe_encode").build(spark, dir)
      .collect()
    assert(rows.length == 9)
    assert(rows.head.getInt(0) == 0 && rows.head.getString(1) == "")
    val totalChars = texts.map(_._2.split(" ").map(_.length).sum).sum
    assert(rows.head.getLong(2) == totalChars.toLong,
      s"round-0 tokens ${rows.head.getLong(2)} != corpus chars $totalChars")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) - b.getLong(3),
        s"round ${b.getInt(0)}: ${b.getLong(2)} != " +
          s"${a.getLong(2)} - ${b.getLong(3)}")
    }
    assert(rows.map(_.getLong(3)).sum > 0, "no merge ever fired")
  }

  test("q201 one-pass stats equal the literal per-round replay (r17 " +
      "restructure: merged symbols are inert, so counting mtok_r in the " +
      "FINAL table reproduces every round's corpus_tokens/merge_occ)") {
    val dir = Files.createTempDirectory("bpedocs2").toString
    val texts = Seq(
      (1L, "the cat sat on the mat and the rat ate there"),
      (2L, "the thin hen then heard the other weather zz zz zz"),
      (3L, "banana bandana cabana the the the on on on on"))
    texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // literal replay: the pre-r17 shape — checkpoint each round, compute
    // (corpus_tokens, merge_occ) with a per-round aggregate
    val words = graft.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)
    val merges = QueriesTextAnalysis.bpeMineMerges(words, 8)
      .localCheckpoint(true)
    var syms = words
      .select(col("word"), col("freq"),
        posexplode(expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
      .toDF("word", "freq", "pos", "sym")
      .localCheckpoint(true)
    val replay = Seq.newBuilder[(Int, String, Long, Long)]
    replay += ((0, "",
      syms.agg(sum("freq")).head().getLong(0), 0L))
    for (r <- 1 to 8) {
      val m = QueriesTextAnalysis.bpeMergeRow(merges, r)
      syms = QueriesTextAnalysis.bpeRound(syms, m).localCheckpoint(true)
      val row = syms.crossJoin(broadcast(m))
        .agg(sum("freq"),
          sum(when(col("sym") === col("mtok"), col("freq"))
            .otherwise(lit(0L))),
          first("mtok")).head()
      replay += ((r, row.getString(2), row.getLong(0), row.getLong(1)))
    }
    val got = Queries.byName("q201_bpe_encode").build(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == replay.result(), s"one-pass stats diverge:\n" +
      s"got    $got\nreplay ${replay.result()}")
  }
}
