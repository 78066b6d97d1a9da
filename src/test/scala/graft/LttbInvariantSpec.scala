package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for q211 (parallel LTTB downsample): endpoint
  * pinning, a hand-derived interior-bucket area argmax, the missing-anchor
  * degrade path, and real-corpus structure.
  */
class LttbInvariantSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, Long, Double)]): String = {
    // (event_id, epoch-sec, value), one event type
    val dir = Files.createTempDirectory("lttbev").toString
    rows.map { case (id, sec, v) => (id, sec, 1L, "t", v, "{}") }
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q211 hand-derived: endpoints pinned, interior argmax by exact " +
      "integer area, empty-neighbor bucket degrades to min-ord at -1") {
    // t0 = 0 s, t1 = 1599 s -> W = 1 599 000 001 us; buckets:
    //   pt1 (0 s,   0.50) -> b0 (first, pinned)
    //   pt2 (110 s, 100.00) -> b1; pt3 (150 s, 0.50) -> b1
    //   pt4 (250 s, 0.50) -> b2 (b1's next anchor: mean = (250000, 50))
    //   pt5 (1599 s, 0.50) -> b15 (last, pinned)
    // b1 prev anchor = exact first point (0 ms, 50):
    //   pt2: |(0-250000)(10000-50) - (0-110000)(50-50)| = 2 487 500 000
    //   pt3: 0  -> pt2 wins
    // b2's next neighbor (b3) is empty -> every candidate scores -1,
    // earliest ord wins.
    val dir = writeEvents(Seq((1L, 0L, 0.5), (2L, 110L, 100.0),
      (3L, 150L, 0.5), (4L, 250L, 0.5), (5L, 1599L, 0.5)))
    val got = Queries.byName("q211_lttb_downsample").build(spark, dir)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 15L), s"buckets: ${got.keySet}")
    assert(got(0L) == ((0L, 50L, 1L, 0L)), s"b0: ${got(0L)}")
    assert(got(1L) == ((110000000L, 10000L, 2L, 2487500000L)),
      s"b1: ${got(1L)}")
    assert(got(2L) == ((250000000L, 50L, 1L, -1L)), s"b2: ${got(2L)}")
    assert(got(15L) == ((1599000000L, 50L, 1L, 0L)), s"b15: ${got(15L)}")
  }

  test("q211 on the real corpus: per type, bucket-0/15 rows carry the " +
      "true first/last events, winners sit in 1..14 with score >= -1") {
    val got = Queries.byName("q211_lttb_downsample").build(spark, sf)
      .collect()
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .withColumn("x", graft.ops.Scalars.longDiv("ts", 1000L))
      .groupBy("event_type").agg(min("x").as("mn"), max("x").as("mx"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    got.groupBy(_.getString(0)).foreach { case (t, rows) =>
      val byB = rows.map(r => r.getLong(1) -> r).toMap
      assert(byB.contains(0L) && byB.contains(15L), s"$t endpoints")
      assert(byB(0L).getLong(2) == ev(t)._1, s"$t first ts")
      assert(byB(15L).getLong(2) == ev(t)._2, s"$t last ts")
      assert(byB(0L).getLong(5) == 0L && byB(15L).getLong(5) == 0L)
      rows.filter(r => r.getLong(1) >= 1 && r.getLong(1) <= 14).foreach {
        r => assert(r.getLong(5) >= -1L && r.getLong(4) >= 1L, s"win: $r")
      }
    }
  }

  test("q211 output is a downsample: at most 16 rows per type, every " +
      "chosen point is a real event of its type") {
    val got = Queries.byName("q211_lttb_downsample").build(spark, sf)
    val perType = got.groupBy("event_type").count().collect()
    perType.foreach(r => assert(r.getLong(1) <= 16L, s"rows: $r"))
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", graft.ops.Scalars.longDiv("ts", 1000L))
      .withColumn("y_cents", graft.ops.Scalars.cents(col("value")))
      .select("event_type", "ts_us", "y_cents")
    assert(got.select("event_type", "ts_us", "y_cents")
      .except(ev).count() == 0, "a chosen point is not a real event")
  }
}
