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

  private val levels = Seq(500000, 900000, 990000)

  /** Reference semantics in plain Scala: smallest v whose inclusive
    * cumulative weight reaches ceil-free q_ppm·W / 1e6. */
  private def bruteWq(rows: Seq[(String, Double, Long)]) =
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.map(t => (t._2, t._3)).sortBy(_._1)
      val total = sorted.map(_._2).sum
      levels.map { q =>
        var cum = 0L
        val v = sorted.find { case (_, w) =>
          cum += w; BigInt(cum) * 1000000 >= BigInt(q) * total
        }.get._1
        (g, q, v)
      }
    }.toSeq.sortBy(t => (t._1, t._2))

  test("weightedQuantiles matches the brute-force cumulative definition " +
      "on mixed weights, duplicates, and a single-row group") {
    import spark.implicits._
    val rows =
      (1 to 60).map(i => ("a", ((i * 29) % 31).toDouble, (i % 5 + 1).toLong)) ++
        (1 to 25).map(i => ("b", (i % 4).toDouble, (i * 13 % 7 + 1).toLong)) ++
        Seq(("c", 7.5, 3L))
    val got = GlobalRank.weightedQuantiles(
      rows.toDF("g", "v", "w").repartition(7),
      col("g"), col("v"), col("w"), levels)
      .orderBy("g", "q_ppm").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq == bruteWq(rows), s"got ${got.toSeq}")
  }

  test("weightedQuantiles: weight k behaves exactly like k repeated rows") {
    import spark.implicits._
    val weighted = Seq(("g", 1.0, 3L), ("g", 2.0, 1L), ("g", 5.0, 6L))
    val exploded = weighted.flatMap { case (g, v, w) =>
      Seq.fill(w.toInt)((g, v, 1L))
    }
    val a = GlobalRank.weightedQuantiles(weighted.toDF("g", "v", "w"),
      col("g"), col("v"), col("w"), levels)
      .orderBy("q_ppm").collect().map(r => (r.getInt(1), r.getDouble(2)))
    val b = GlobalRank.weightedQuantiles(exploded.toDF("g", "v", "w"),
      col("g"), col("v"), col("w"), levels)
      .orderBy("q_ppm").collect().map(r => (r.getInt(1), r.getDouble(2)))
    assert(a.toSeq == b.toSeq, s"weighted ${a.toSeq} != exploded ${b.toSeq}")
  }

  test("weightedQuantiles boundary: exact threshold equality is included " +
      "(cumW·1e6 == q_ppm·W selects the crossing value, not the next)") {
    import spark.implicits._
    // W = 10; at q = 0.5: v=1 carries cum 5, 5e6 >= 5e6 → median is 1
    val rows = Seq(("g", 1.0, 5L), ("g", 9.0, 5L))
    val got = GlobalRank.weightedQuantiles(rows.toDF("g", "v", "w"),
      col("g"), col("v"), col("w"), Seq(500000))
      .collect().map(r => r.getDouble(2))
    assert(got.toSeq == Seq(1.0), got.toSeq)
  }
}
