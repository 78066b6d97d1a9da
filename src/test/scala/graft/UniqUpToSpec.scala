package graft

import org.apache.spark.sql.functions._

import graft.ops.UniqUpToAggregator

/** A25 uniqUpTo(N) (ops/UniqUpTo): exact below the cap, saturated at N+1
  * above it, bounded state, and partition invariance (associative
  * sorted-merge — a pass is deterministic, unlike the sketch tier).
  */
class UniqUpToSpec extends SparkSpec {
  import spark.implicits._

  test("hand-derived: exact below cap, N+1 at and past saturation") {
    val agg = udaf(new UniqUpToAggregator(3))
    val df = Seq(
      ("lo", 1L), ("lo", 2L), ("lo", 1L),            // 2 distinct
      ("at", 1L), ("at", 2L), ("at", 3L),            // exactly N
      ("hi", 1L), ("hi", 2L), ("hi", 3L), ("hi", 4L),// N+1 -> saturated
      ("xx", 1L), ("xx", 2L), ("xx", 3L), ("xx", 4L),
      ("xx", 5L), ("xx", 6L))                        // far past: still N+1
      .toDF("g", "v")
    val got = df.groupBy("g").agg(agg(col("v")).as("u"))
      .orderBy("g").as[(String, Long)].collect().toSeq
    assert(got == Seq("at" -> 3L, "hi" -> 4L, "lo" -> 2L, "xx" -> 4L))
  }

  test("partition invariance: 1-way and 9-way folds agree exactly on " +
      "mixed below/above-cap groups") {
    val agg = udaf(new UniqUpToAggregator(16))
    // group g carries exactly g+1 distinct values: crosses the cap at
    // g >= 17 (u = min(g+1, 17))
    val rows = (0 until 40).flatMap { g =>
      (0 until 60).map(j => (g.toLong, (j % (g + 1)).toLong))
    }
    def run(parts: Int) =
      rows.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(agg(col("v")).as("u"))
        .orderBy("g").as[(Long, Long)].collect().toSeq
    val got = run(1)
    assert(run(9) == got)
    // both regimes present and correct: min(g+1, 17)
    got.foreach { case (g, u) =>
      assert(u == math.min(g + 1, 17L), s"g=$g u=$u")
    }
  }

  test("declared q224 equals least(countDistinct, N+1) on the same events") {
    val declared = Queries.byName("q224_uniq_upto").build(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        graft.ops.Scalars.longDiv("ts", 86400000000000L).as("day"))
      .agg(least(countDistinct(col("user_id")), lit(17L)).as("u16"))
      .orderBy("event_type", "day")
      .as[(String, Long, Long)].collect().toSeq
    assert(declared.nonEmpty && declared == exact)
  }
}
