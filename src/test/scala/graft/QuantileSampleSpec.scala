package graft

import org.apache.spark.sql.functions._

import graft.ops.{QsBuf, QuantileSample, QuantileSampleAggregator, Scalars}

/** Bottom-k-by-hash quantile sample properties beyond q126's full value
  * oracle: merge mechanics (incl. the deterministic collision rule),
  * partition invariance, exactness below K, empirical rank accuracy on a
  * cardinality the fixture can't reach, and the streaming twin.
  */
class QuantileSampleSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Tables.events(spark, sf)
    .select(Scalars.tokenHash(col("event_id").cast("string")).as("h"),
      col("value"))
    .as[(Long, Double)]

  test("sketch is invariant to partitioning (associative merge)") {
    val agg = new QuantileSampleAggregator()
    val s1 = pairs.repartition(1).select(agg.toColumn).head()
    val s13 = pairs.repartition(13).select(agg.toColumn).head()
    assert(s1.h.sameElements(s13.h) && s1.v.sameElements(s13.v))
  }

  test("reduce/merge mechanics: hash collision keeps the MIN value (the " +
      "order-independent rule), saturation evicts the max hash, merge " +
      "dedups equal heads") {
    val agg = new QuantileSampleAggregator(4)
    // collision: larger value ignored, smaller value wins
    val a = Seq((5L, 50.0), (3L, 30.0), (5L, 99.0), (5L, 10.0))
      .foldLeft(agg.zero)(agg.reduce)
    assert(a.h.toSeq == Seq(3L, 5L) && a.v.toSeq == Seq(30.0, 10.0))
    // saturate at k=4, then: above-max ignored, below-max evicts
    val b = Seq((5L, 5.0), (3L, 3.0), (9L, 9.0), (7L, 7.0), (11L, 11.0),
      (4L, 4.0)).foldLeft(agg.zero)(agg.reduce)
    assert(b.h.toSeq == Seq(3L, 4L, 5L, 7L))
    assert(b.v.toSeq == Seq(3.0, 4.0, 5.0, 7.0))
    // merge: sorted merge, equal heads dedup to min value, trim to k
    val m = agg.merge(
      QsBuf(Array(1L, 3L, 5L, 7L), Array(1.0, 3.0, 5.0, 7.0)),
      QsBuf(Array(1L, 2L, 3L, 8L), Array(0.5, 2.0, 9.0, 8.0)))
    assert(m.h.toSeq == Seq(1L, 2L, 3L, 5L))
    assert(m.v.toSeq == Seq(0.5, 2.0, 3.0, 5.0))
  }

  test("below K the sample IS the whole input — order statistics are " +
      "exact, not estimates") {
    val sub = Tables.events(spark, sf)
      .filter(col("event_id") % 7 === 0)
    val sk = sub
      .select(Scalars.tokenHash(col("event_id").cast("string")).as("h"),
        col("value"))
      .as[(Long, Double)]
      .select(new QuantileSampleAggregator().toColumn).head()
    val n = sub.count()
    assert(n < QuantileSample.K, s"fixture subset grew past K ($n)")
    assert(sk.h.length == n)
    val exactMedian = {
      val vs = sub.select(col("value")).as[Double].collect().sorted
      vs(((n - 1) / 2).toInt)
    }
    assert(sk.v.sorted.apply(((n - 1) / 2).toInt) == exactMedian)
  }

  test("sampled order statistics land within DKW rank error of the true " +
      "quantiles on 20x-K uniform data") {
    val k = QuantileSample.K
    val n = 20 * k
    // value == rank (0..n-1): the estimated value directly reads off its
    // own true rank, so the gate needs no second pass over the data
    val ds = spark.range(n).select(
      Scalars.tokenHash(concat(lit("qs:"), col("id").cast("string")))
        .as("h"),
      col("id").cast("double").as("v")).as[(Long, Double)]
    val sk = ds.repartition(7)
      .select(new QuantileSampleAggregator(k).toColumn).head()
    assert(sk.h.length == k)
    val vals = sk.v.sorted
    // DKW sup-norm at 95%: sqrt(ln(2/0.05) / (2*256)) = 0.085
    Seq(0.5 -> (k - 1) / 2, 0.95 -> 19 * (k - 1) / 20,
      0.99 -> 99 * (k - 1) / 100).foreach { case (p, idx) =>
      val rankOfEst = vals(idx) / n
      assert(math.abs(rankOfEst - p) <= 0.09,
        s"p=$p estimated-value rank $rankOfEst off by " +
          s"${math.abs(rankOfEst - p)}")
    }
  }

  test("streaming twin: micro-batch sketches folded through foreachBatch " +
      "equal the one-shot sketch (the X27/X29 pattern for the quantile " +
      "tier)") {
    val agg = new QuantileSampleAggregator()
    val src = Tables.events(spark, sf).select("event_id", "value")
    val dir = java.nio.file.Files.createTempDirectory("qs_stream")
    (0 until 3).foreach { i =>
      src.filter(col("event_id") % 3 === i)
        .write.mode("overwrite").parquet(dir.resolve(s"b$i").toString)
    }
    var running: QsBuf = agg.zero
    val q = spark.readStream
      .schema(src.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("qs_ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sk = batch
          .select(
            Scalars.tokenHash(col("event_id").cast("string")).as("h"),
            col("value"))
          .as[(Long, Double)].select(agg.toColumn).head()
        running = agg.merge(running, sk) // commutative: batch order moot
        ()
      }.start()
    q.awaitTermination(60000)
    val direct = pairs.select(agg.toColumn).head()
    assert(running.h.sameElements(direct.h) &&
      running.v.sameElements(direct.v),
      s"incremental sketch (${running.h.length}) != one-shot " +
        s"(${direct.h.length})")
  }
}
