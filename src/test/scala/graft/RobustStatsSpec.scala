package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q107's histogram-median machinery vs a brute-force reference, on group
  * shapes the fixed testdata can't guarantee to cover: single-row groups,
  * all-equal values, odd/even counts, ties exactly at the middle, and
  * randomized corpora. (The DuckDB oracle pins the three sf dirs; this
  * pins the ALGORITHM.)
  */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def refMedian(xs: Seq[Long]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2).toDouble
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def refRow(lang: String, xs: Seq[Long])
      : (String, Double, Double, Long, Long) = {
    val med = refMedian(xs)
    val devs = xs.map(x => math.abs(x - med))
    // dev is k.0/k.5-valued; refMedian over scaled-by-2 longs stays exact
    val mad = refMedian(devs.map(d => (d * 2).toLong)) / 2.0
    val outliers = xs.count(x => math.abs(x - med) > 3 * mad)
    (lang, med, mad, xs.length.toLong, outliers.toLong)
  }

  private def run(groups: Map[String, Seq[Long]])
      : Seq[(String, Double, Double, Long, Long)] = {
    val dir = Files.createTempDirectory("madspec").toString
    val rows = groups.toSeq.flatMap { case (lang, xs) =>
      xs.zipWithIndex.map { case (x, i) => (lang + "_" + i, lang, x) }
    }
    rows.toDF("doc_key", "lang", "n_chars")
      .withColumn("doc_id", monotonically_increasing_id())
      .select("doc_id", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Queries.byName("q107_mad_outliers").build(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
  }

  test("edge shapes: single row, all-equal, odd/even, middle ties") {
    val groups = Map(
      "single" -> Seq(42L),
      "equal" -> Seq(7L, 7L, 7L, 7L),
      "odd" -> Seq(1L, 100L, 3L),
      "even" -> Seq(10L, 20L, 30L, 40L),
      "midtie" -> Seq(5L, 5L, 5L, 9L, 9L, 9L), // median between two ties
      "outlier" -> Seq(10L, 11L, 12L, 13L, 500L))
    val expected = groups.toSeq.map { case (l, xs) => refRow(l, xs) }
      .sortBy(_._1)
    assert(run(groups) == expected)
  }

  test("randomized corpora match the brute-force reference") {
    val rnd = new scala.util.Random(1234)
    (1 to 5).foreach { trial =>
      val groups = (0 until 4).map { g =>
        val n = 1 + rnd.nextInt(40)
        s"g$g" -> Seq.fill(n)(rnd.nextInt(200).toLong)
      }.toMap
      val expected = groups.toSeq.map { case (l, xs) => refRow(l, xs) }
        .sortBy(_._1)
      assert(run(groups) == expected, s"trial $trial: $groups")
    }
  }
}
