package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for q183 (HHI concentration poles), q184
  * (conversion-latency percentiles on handcrafted latencies, incl. the
  * pre-signup-purchase exclusion), q185 (novelty curve on handcrafted
  * batches).
  */
class HhiLatencyNoveltyInvariantSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("docs").toString
    rows.map { case (id, t) => (id, t, "en", s"src${id % 4}",
      t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q183 HHI poles: a single source reads 1e6 ppm / 1 effective " +
      "source; four equal sources read 250000 ppm / 4") {
    val one = writeDocs(Seq((4L, "a b c d"), (8L, "e f g h")))
    val r1 = Queries.byName("q183_hhi_concentration").build(spark, one)
      .collect().head
    assert((r1.getLong(0), r1.getLong(2), r1.getLong(3)) ==
      ((1L, 1000000L, 1L)), s"single source: $r1")
    // ids 0..3 -> sources src0..src3, 5 tokens each
    val four = writeDocs((0L to 3L).map(i => (i, "a b c d e")))
    val r4 = Queries.byName("q183_hhi_concentration").build(spark, four)
      .collect().head
    assert((r4.getLong(0), r4.getLong(1), r4.getLong(2), r4.getLong(3)) ==
      ((4L, 20L, 250000L, 4L)), s"equal sources: $r4")
  }

  test("q184 on handcrafted latencies {100, 200, 300}: exact lerp " +
      "p50/p90/p99; pre-signup purchases and non-converters excluded") {
    val dir = Files.createTempDirectory("lat").toString
    def ev(id: Long, sec: Long, user: Long, typ: String) =
      (id, sec, user, typ, 1.0, "{}")
    Seq(
      ev(1, 1000, 1, "signup"), ev(2, 1100, 1, "purchase"),   // 100
      ev(3, 2000, 2, "signup"), ev(4, 2200, 2, "purchase"),   // 200
      ev(5, 3000, 3, "signup"), ev(6, 3300, 3, "purchase"),   // 300
      ev(7, 3400, 3, "purchase"),              // later purchase ignored
      ev(8, 500, 4, "purchase"), ev(9, 900, 4, "signup"),     // pre-signup
      ev(10, 5000, 5, "signup"))               // never converts
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.byName("q184_conversion_latency").build(spark, dir)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // replicate the engine's lerp arithmetic bit-for-bit (q·(n−1) with
    // q = 0.9 is NOT exactly 1.8 in IEEE — hardcoding 280.0 would be
    // asserting the wrong number)
    def lerp(q: Double): Double = {
      val pos = q * 2.0
      val (lo, hi) = (math.floor(pos), math.ceil(pos))
      val vals = Array(100.0, 200.0, 300.0)
      if (lo == hi) vals(lo.toInt)
      else (hi - pos) * vals(lo.toInt) + (pos - lo) * vals(hi.toInt)
    }
    assert(out == Map(0.5 -> lerp(0.5), 0.9 -> lerp(0.9),
      0.99 -> lerp(0.99)), s"got $out expected ${Seq(0.5, 0.9, 0.99)
        .map(q => q -> lerp(q))}")
  }

  test("q185 novelty: first batch is all-new (1e6), a verbatim re-crawl " +
      "contributes zero novelty, and partial overlap counts distinct " +
      "shingles exactly") {
    // batch = doc_id % 3
    val dir = writeDocs(Seq(
      (3L, "a b c d e"),   // b0: shingles {abc, bcd, cde} -> all new
      (4L, "a b c d e"),   // b1: verbatim re-crawl -> 0 new
      (7L, "x y z w"),     // b1: {xyz, yzw} -> new
      (5L, "a b c x y z")))// b2: {abc, bcx, cxy, xyz} -> 2 new of 4
    val out = Queries.byName("q185_novelty_curve").build(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out(0L) == ((3L, 3L, 1000000L)), s"b0: ${out(0L)}")
    assert(out(1L) == ((5L, 2L, 400000L)), s"b1: ${out(1L)}")
    assert(out(2L) == ((4L, 2L, 500000L)), s"b2: ${out(2L)}")
  }
}
