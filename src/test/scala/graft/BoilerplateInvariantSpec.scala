package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Copy-invariance of the boilerplate family (VERDICT r11 #1): q150's
  * mining report and q195's boiler SET must df-count DISTINCT CONTENT,
  * so verbatim replication — the sf1 generator's exact copies, mirrored
  * shards in a real corpus — carries zero boilerplate evidence.
  *
  * Fixture: three distinct contents share the 5-gram "h1 … h5"
  * (df = 3 contents → boilerplate at the ≥ 3 gate); one content is
  * unique. Plants: (a) one verbatim copy of every doc, (b) five copies
  * of the unique doc — the exact abuse the old doc_id df-count fell to
  * (5 copies would have promoted the unique doc's grams).
  */
class BoilerplateInvariantSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "h1 h2 h3 h4 h5 a1 a2 a3", "sa"),
    (2L, "h1 h2 h3 h4 h5 b1 b2 b3", "sa"),
    (3L, "h1 h2 h3 h4 h5 c1 c2 c3", "sb"),
    (4L, "u1 u2 u3 u4 u5 u6", "sb"))

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("boiler").toString
    rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def copies(rows: Seq[(Long, String, String)], n: Int,
      stride: Long): Seq[(Long, String, String)] =
    (1 to n).flatMap(k => rows.map { case (id, t, s) =>
      (id + k * stride, t, s) })

  test("q150 report is IDENTICAL under verbatim replication, and 5 " +
      "copies of a unique doc cannot promote its grams") {
    val q = Queries.byName("q150_boilerplate_ngrams")
    def run(dir: String): Seq[(String, Long, Long)] =
      q.build(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    val baseline = run(writeDocs(base))
    assert(baseline.exists(_._1 == "h1 h2 h3 h4 h5"),
      s"fixture lost its boilerplate gram: $baseline")
    assert(baseline.forall { case (_, nOcc, nContents) =>
      nOcc == 3 && nContents == 3 },
      s"h-gram should occur once per distinct content: $baseline")

    // (a) every doc copied once + (b) the unique doc copied 5× more
    val planted = base ++ copies(base, 1, 100L) ++
      copies(Seq(base.last), 5, 1000L)
    assert(run(writeDocs(planted)) == baseline,
      "q150 report moved under verbatim replication")
    assert(!baseline.exists(_._1.startsWith("u1")),
      "unique doc's gram leaked into the boilerplate report")
  }

  test("q195 under full duplication: removal_ppm unchanged; tokens, " +
      "removed, touched exactly 2x; copied unique doc still untouched") {
    val q = Queries.byName("q195_boilerplate_strip")
    def run(dir: String): Map[String, (Long, Long, Long, Long)] =
      q.build(spark, dir).collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val before = run(writeDocs(base))
    // sa: docs 1,2 → 16 tokens, positions 0-4 covered in each
    assert(before("sa") == (16L, 10L, 625000L, 2L), s"sa base: $before")
    // sb: doc 3 covered (5 of 8), doc 4 (6 tokens) untouched
    assert(before("sb") == (14L, 5L, 357142L, 1L), s"sb base: $before")

    val after = run(writeDocs(base ++ copies(base, 1, 100L)))
    for (src <- Seq("sa", "sb")) {
      val (t0, r0, ppm0, d0) = before(src)
      val (t1, r1, ppm1, d1) = after(src)
      assert(t1 == 2 * t0 && r1 == 2 * r0 && d1 == 2 * d0,
        s"$src not exactly doubled: $before -> $after")
      assert(ppm1 == ppm0, s"$src removal_ppm moved: $ppm0 -> $ppm1")
    }

    // 5 extra copies of the unique doc: its grams stay df = 1 content,
    // so sb gains untouched tokens only and its ppm strictly drops
    val uniq = run(writeDocs(base ++ copies(Seq(base.last), 5, 1000L)))
    assert(uniq("sa") == before("sa"), "sa moved on an sb-only plant")
    val (t, r, ppm, d) = uniq("sb")
    assert(t == 14L + 5 * 6L && r == 5L && d == 1L,
      s"unique-doc copies were stripped: $uniq")
    assert(ppm < before("sb")._3)
  }
}
