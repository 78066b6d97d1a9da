package graft

import org.apache.spark.sql.functions._

import graft.ops.SumMap

/** A20 sumMap: elementwise map sum with rows carrying DIFFERENT key sets,
  * deterministic key-sorted output, and partition invariance (exact long
  * sums — no fold-order sensitivity).
  */
class SumMapSpec extends SparkSpec {
  import spark.implicits._

  test("hand-derived: disjoint and overlapping key sets sum elementwise; " +
      "output entries are key-sorted") {
    val df = Seq(
      (1L, Map("a" -> 1L, "b" -> 10L)),
      (1L, Map("b" -> 5L, "c" -> 2L)),
      (1L, Map("a" -> 4L)),
      (2L, Map("z" -> 7L))).toDF("g", "m")
    val got = SumMap.sumMap(df, Seq("g"), "m")
      .orderBy("g").as[(Long, Map[String, Long])].collect().toSeq
    assert(got == Seq(
      1L -> Map("a" -> 5L, "b" -> 15L, "c" -> 2L),
      2L -> Map("z" -> 7L)))
    // key order inside the physical map is the sorted entry list
    val keys = SumMap.sumMap(df, Seq("g"), "m")
      .filter(col("g") === 1L)
      .select(map_keys(col("m"))).as[Seq[String]].head()
    assert(keys == Seq("a", "b", "c"))
  }

  test("partition invariance: 1-way and 7-way folds agree exactly") {
    val rows = (1 to 500).map { i =>
      (i % 5).toLong -> Map(s"k${i % 11}" -> i.toLong, "all" -> 1L)
    }
    def run(parts: Int) =
      SumMap.sumMap(rows.toDF("g", "m").repartition(parts), Seq("g"), "m")
        .orderBy("g").as[(Long, Map[String, Long])].collect().toSeq
    assert(run(1) == run(7) && run(1).nonEmpty)
  }

  test("minMaxMap: elementwise min and max over occurring keys only, " +
      "one pass, partition-invariant") {
    val df = Seq(
      (1L, Map("a" -> 5L, "b" -> 10L)),
      (1L, Map("b" -> 3L, "c" -> 2L)),
      (1L, Map("a" -> 8L))).toDF("g", "m")
    def run(parts: Int) = SumMap.minMaxMap(df.repartition(parts), Seq("g"), "m")
      .as[(Long, Map[String, Long], Map[String, Long])].collect().toSeq
    val got = run(1)
    assert(got == Seq((1L,
      Map("a" -> 5L, "b" -> 3L, "c" -> 2L),
      Map("a" -> 8L, "b" -> 10L, "c" -> 2L))))
    assert(run(4) == got)
  }

  test("avgMap: fixed-point per-key mean over occurring keys only, " +
      "partition-invariant") {
    val df = Seq(
      (1L, Map("a" -> 5L, "b" -> 10L)),
      (1L, Map("b" -> 3L, "c" -> 2L)),
      (1L, Map("a" -> 8L))).toDF("g", "m")
    def run(parts: Int) = SumMap.avgMap(df.repartition(parts), Seq("g"), "m")
      .as[(Long, Map[String, Long])].collect().toSeq
    val got = run(1)
    // micro-units: a = (13*1e6) DIV 2, b = (13*1e6) DIV 2, c = 2e6
    assert(got == Seq((1L, Map(
      "a" -> 6500000L, "b" -> 6500000L, "c" -> 2000000L))))
    assert(run(4) == got)
  }

  test("renderEntries: key-sorted k=v,... VARCHAR (the driver-comparable " +
      "declared shape — pandas cannot sort raw MAP columns)") {
    val df = Seq((1L, Map("b" -> 2L, "a" -> 1L))).toDF("g", "m")
    val s = SumMap.sumMap(df, Seq("g"), "m")
      .select(SumMap.renderEntries(col("m"))).as[String].head()
    assert(s == "a=1,b=2")
  }

  test("declared q215 equals the explode-group replay on the same events") {
    val declared = Queries.byName("q215_summap").build(spark, sf)
      .as[(Long, String)].collect().toSeq
    val e = Tables.events(spark, sf)
    val replay = e.select(pmod(col("user_id"), lit(100L)).as("cohort"),
        concat(lit("cnt_"), col("event_type")).as("k"), lit(1L).as("v"))
      .unionAll(e.select(pmod(col("user_id"), lit(100L)).as("cohort"),
        concat(lit("cents_"), col("event_type")).as("k"),
        graft.ops.Scalars.cents(col("value")).as("v")))
      .groupBy("cohort", "k").agg(sum("v").as("v"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).map { case (g, xs) =>
        g -> xs.map(x => x._2 -> x._3).toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(",")
      }.toSeq.sortBy(_._1)
    assert(declared.nonEmpty && declared == replay)
  }
}
