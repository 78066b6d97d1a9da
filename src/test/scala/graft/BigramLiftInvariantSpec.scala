package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for q200 (bigram lift): hand-derived exact
  * lifts, and the property the op exists for — lift is COPY-INVARIANT
  * (replication scales c_ab, both marginals, and N by the same factor,
  * which cancels as k²/k²), unlike q72's raw counts.
  */
class BigramLiftInvariantSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("liftdocs").toString
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String) =
    Queries.byName("q200_bigram_lift").build(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

  // 'x y' ×6 alternating: bigrams (x,y)=6, (y,x)=5, N=11;
  // marginals ca(x)=6 ca(y)=5 cb(y)=6 cb(x)=5
  private val base = "x y x y x y x y x y x y"

  test("q200 hand-derived: lift(y,x) = 2 200 000 ranks above " +
      "lift(x,y) = 1 833 333; min-support admits both") {
    val got = run(writeDocs(Seq((1L, base))))
    assert(got.toSeq == Seq(
      ("y x", 5L, 5L, 5L, 2200000L),
      ("x y", 6L, 6L, 6L, 1833333L)), s"got ${got.toSeq}")
  }

  test("q200 lift values are invariant under verbatim replication; " +
      "counts scale exactly 2x") {
    val before = run(writeDocs(Seq((1L, base))))
    val after = run(writeDocs(Seq((1L, base), (101L, base))))
    assert(after.map(r => (r._1, r._5)).toSeq ==
      before.map(r => (r._1, r._5)).toSeq,
      s"lift moved under replication:\n$before\n$after")
    assert(after.map(r => (r._2, r._3, r._4)).toSeq ==
      before.map(r => (2 * r._2, 2 * r._3, 2 * r._4)).toSeq,
      "counts did not scale exactly 2x")
  }

  test("q200 min-support gate is count-based BY DESIGN: a sub-support " +
      "gram (c_ab=3) is absent alone but crosses the gate at 2x " +
      "replication (c_ab=6) with its lift unchanged from 1x math") {
    // 'p q' ×3: c_ab(p,q)=3 < 5 → gated out. Doc 2 supplies an
    // above-support control ('x y' family) so the 1x report is
    // non-empty either way.
    val sub = "p q p q p q"
    val one = run(writeDocs(Seq((1L, sub), (2L, base))))
    assert(!one.exists(_._1 == "p q"),
      s"sub-support gram leaked into the 1x report: ${one.toSeq}")
    val two = run(writeDocs(Seq((1L, sub), (2L, base),
      (101L, sub), (102L, base))))
    val pq = two.filter(_._1 == "p q")
    assert(pq.length == 1 && pq.head._2 == 6L,
      s"replicated sub-support gram should enter at c_ab=6: ${two.toSeq}")
    // And the grams that were already above support keep their lift
    // values exactly (copy-invariance of the VALUE, not the gate).
    val commonOne = one.map(r => (r._1, r._5)).toMap
    two.filter(r => commonOne.contains(r._1)).foreach { r =>
      assert(commonOne(r._1) == r._5,
        s"lift moved under replication for ${r._1}")
    }
  }

  test("q200 on the real corpus: lift > 0, support >= 5, report " +
      "totally ordered") {
    val got = run(sf)
    assert(got.nonEmpty)
    got.foreach { case (_, cab, ca, cb, lift) =>
      assert(cab >= 5 && ca >= cab && cb >= cab && lift > 0)
    }
    val key = got.map(r => (-r._5, r._1)).toSeq
    assert(key == key.sorted, "report not in (lift DESC, gram) order")
  }
}
