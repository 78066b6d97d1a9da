package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GlobalRank

/** Distributed per-group ranking / exact percentiles must be value-
  * identical to the single-reducer forms they replace (window row_number;
  * TypedImperative percentile()) — including odd/even group sizes,
  * single-element groups, and duplicate values.
  */
class GlobalRankSpec extends SparkSpec {

  private def sample = {
    import spark.implicits._
    // deterministic pseudo-random doubles, several group sizes incl. n=1,
    // plus exact duplicates inside group "b"
    val rows =
      (1 to 101).map(i => ("a", (i * 37 % 101) + 0.25)) ++
        (1 to 40).map(i => ("b", (i % 7).toDouble)) ++
        Seq(("c", 42.0))
    rows.toDF("g", "v").repartition(7)
  }

  test("perGroupRank equals window row_number - 1 on every group") {
    val ranked = GlobalRank.perGroupRank(sample, col("g"), col("v"))
    val expected = sample
      .withColumn("rank",
        row_number().over(Window.partitionBy("g").orderBy("v")) - 1)
      .select(col("g"), col("v").cast("double").as("v"),
        col("rank").cast("long").as("rank"))
    // ties may be ordered either way between the two forms; compare the
    // (g, v, rank) multiset — equal values swapping ranks is still equal
    assert(ranked.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(ranked).count() == 0)
  }

  test("prefixSum equals the window cumulative sum on any partitioning") {
    import spark.implicits._
    val rows = (1 to 257).map(i => (i.toLong * 3 + 1, (i * 17 % 23).toLong))
    val df = rows.toDF("k", "v").repartition(11)
    val got = GlobalRank.prefixSum(df, col("k"), col("v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var run = 0L
    val exp = rows.sortBy(_._1).map { case (k, v) =>
      val r = (k, v, run); run += v; r
    }
    assert(got.toSeq == exp)
  }

  test("exactPercentiles matches Spark's percentile() bit-for-bit") {
    val got = GlobalRank.exactPercentiles(
      sample, col("g"), col("v"), Seq(0.25, 0.5, 0.75, 0.99))
      .orderBy("g", "q")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val exp = sample.groupBy("g")
      .agg(expr("percentile(v, array(0.25, 0.5, 0.75, 0.99))").as("ps"))
      .orderBy("g")
      .collect().flatMap { r =>
        val g = r.getString(0)
        r.getSeq[Double](1).zip(Seq(0.25, 0.5, 0.75, 0.99))
          .map { case (p, q) => (g, q, p) }
      }
    assert(got.toSeq == exp.toSeq.sortBy(t => (t._1, t._2)))
  }
}
