package graft

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

/** Semantic contract of the merge-form backward as-of join (ops/AsofJoin):
  * latest-at-or-before matching, inclusive equal-time ties, left rows with
  * no prior right row, key isolation, atomic multi-column payload, and
  * equivalence with the naive (quadratic) range-join + argmax form on real
  * data — the cross-check the hash oracle already does against DuckDB's
  * native ASOF JOIN, replayed here in-engine.
  */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def leftDf = Seq(
    // (key, t, tag)
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 30L, "l3"),
    ("b", 15L, "l4"), // b has no right rows at all
    ("c", 5L, "l5")   // before c's only right row
  ).toDF("k", "t", "tag")

  private def rightDf = Seq(
    // (key, t, v)
    ("a", 10L, 1.0), // equal-time: visible to l1 (inclusive)
    ("a", 25L, 2.0), // latest for l3
    ("c", 6L, 9.0)   // after l5 — no match
  ).toDF("k", "t", "v")

  test("backward asof: latest at-or-before per key, inclusive, left-outer") {
    val out = AsofJoin.backward(leftDf, rightDf, "k", "t", "m_t", "v", "m_v")
      .orderBy("k", "t")
      .select("tag", "m_t", "m_v").as[(String, Option[Long], Option[Double])]
      .collect()
    assert(out === Array(
      ("l1", Some(10L), Some(1.0)), // equal time matches (>= semantics)
      ("l2", Some(10L), Some(1.0)), // carries forward past 10
      ("l3", Some(25L), Some(2.0)), // switches to the newer right row
      ("l4", None, None),           // key with no right rows
      ("l5", None, None)            // right row exists only in the future
    ))
  }

  test("forward asof: earliest at-or-after per key, inclusive, left-outer") {
    val out = AsofJoin.forward(leftDf, rightDf, "k", "t", "m_t", "v", "m_v")
      .orderBy("k", "t")
      .select("tag", "m_t", "m_v").as[(String, Option[Long], Option[Double])]
      .collect()
    assert(out === Array(
      ("l1", Some(10L), Some(1.0)), // equal time matches (<= semantics)
      ("l2", Some(25L), Some(2.0)), // next right row after 20
      ("l3", None, None),           // nothing at-or-after 30
      ("l4", None, None),           // key with no right rows
      ("l5", Some(6L), Some(9.0)))) // c's row IS at-or-after 5
  }

  test("matched payload columns come from one right row atomically") {
    val right = Seq(
      ("a", 10L, Option(1.0), Option("x")),
      ("a", 20L, Option.empty[Double], Option("y")) // null v in latest row
    ).toDF("k", "t", "v", "s")
    val out = AsofJoin.backward(
      Seq(("a", 30L)).toDF("k", "t"), right,
      Seq("k"), "t", "m_t", Seq("v" -> "m_v", "s" -> "m_s"))
      .select("m_t", "m_v", "m_s")
      .as[(Option[Long], Option[Double], Option[String])].collect()
    // the t=20 row wins as a whole: its null v must NOT be backfilled from
    // the t=10 row (which a per-column last(ignoreNulls) carry would do)
    assert(out === Array((Some(20L), None, Some("y"))))
  }

  test("q95's merge form equals the naive range-join + argmax form") {
    val ev = Tables.events(spark, sf)
      .withColumn("ts", graft.ops.Scalars.longDiv("ts", 1000L))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max_by(col("value"), col("event_id")).as("value"))
    val naive = p.as("p")
      .join(v.as("v"),
        col("p.user_id") === col("v.user_id") && col("p.ts") >= col("v.ts"),
        "left")
      .groupBy(col("p.user_id").as("user_id"), col("p_id"),
        col("p.ts").as("p_ts"))
      .agg(max(col("v.ts")).as("v_ts"),
        max_by(col("v.value"), col("v.ts")).as("v_value"))
    val merge = Queries.byName("q95_asof_join").build(spark, sf)
    assert(merge.exceptAll(naive).isEmpty && naive.exceptAll(merge).isEmpty,
      "merge-form asof diverges from the naive range-join form")
    val matched = merge.filter(col("v_ts").isNotNull).count()
    assert(matched > 0 && merge.count() > matched,
      "fixture should exercise both matched and unmatched purchases")
  }
}
