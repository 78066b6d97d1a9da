package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for q186 (null-skew-safe outer join — split
  * equivalence vs the naive join) and q187 (last-touch attribution —
  * handcrafted horizon/tiebreak shapes).
  */
class NullSkewAttributionInvariantSpec extends SparkSpec {
  import spark.implicits._

  test("q186 equals the naive unsplit LEFT JOIN on testdata (the " +
      "rewrite must be invisible), and the handcrafted fixture routes " +
      "guest checkouts and dangling keys to '(none)'") {
    val d = "/root/testdata/sf0.01"
    val got = Queries.byName("q186_null_skew_join").build(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val o = Tables.orders(spark, d).select(col("o_totalprice"),
      when(col("o_custkey") % 7 === 0, lit(null))
        .otherwise(col("o_custkey")).as("cust_k"))
    val naive = o.join(Tables.customer(spark, d),
        col("cust_k") === col("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("(none)")).as("segment"))
      .agg(count(lit(1)).as("n"),
        graft.ops.Scalars.moneySum(col("o_totalprice")).as("rev"))
      .orderBy("segment")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == naive, s"split join diverged from naive:\n$got\n$naive")
    assert(got.exists(_._1 == "(none)"), "no null-key bucket on testdata")
    // handcrafted: custkey 7 -> null key; 999 dangles; 1 matches
    val dir = Files.createTempDirectory("nsj").toString
    Seq((10L, 7L, 100.0), (11L, 1L, 50.0), (12L, 999L, 25.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "SEG_A", "c1"), (2L, "SEG_B", "c2"))
      .toDF("c_custkey", "c_mktsegment", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val hc = Queries.byName("q186_null_skew_join").build(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(hc == Map("(none)" -> ((2L, 125.0)), "SEG_A" -> ((1L, 50.0))),
      s"got $hc")
  }

  test("q187 attribution on handcrafted journeys: 7-day horizon is " +
      "inclusive, same-instant click attributes, later clicks do not, " +
      "and the last click (not the first) is the touch") {
    val day = 86400L
    val dir = Files.createTempDirectory("attr").toString
    def ev(id: Long, sec: Long, user: Long, typ: String) =
      (id, sec, user, typ, 1.0, "{}")
    Seq(
      // user 1: click 2 d before purchase -> attributed (day 100)
      ev(1, 98 * day, 1, "click"), ev(2, 100 * day, 1, "purchase"),
      // user 2: click exactly 7 d before -> attributed (inclusive)
      ev(3, 93 * day, 2, "click"), ev(4, 100 * day, 2, "purchase"),
      // user 3: click 8 d before -> NOT attributed
      ev(5, 92 * day, 3, "click"), ev(6, 100 * day, 3, "purchase"),
      // user 4: same-instant click + purchase -> attributed (tiebreak
      // sorts the click first)
      ev(7, 100 * day, 4, "click"), ev(8, 100 * day, 4, "purchase"),
      // user 5: click only AFTER the purchase -> NOT attributed
      ev(9, 100 * day, 5, "purchase"), ev(10, 100 * day + 5, 5, "click"),
      // user 6: old click (30 d) then fresh click 1 d before -> the
      // LAST touch governs: attributed (day 101)
      ev(11, 71 * day, 6, "click"), ev(12, 100 * day, 6, "click"),
      ev(13, 101 * day, 6, "purchase"))
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.byName("q187_last_touch_attribution")
      .build(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // day 100: purchases of users 1-5 -> 5 total, attributed: 1, 2, 4
    assert(out(100L) == ((5L, 3L, 600000L)), s"day 100: ${out(100L)}")
    // day 101: user 6 attributed via the fresh (last) click
    assert(out(101L) == ((1L, 1L, 1000000L)), s"day 101: ${out(101L)}")
    assert(out.size == 2)
  }
}
