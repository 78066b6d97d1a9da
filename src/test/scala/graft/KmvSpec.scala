package graft

import org.apache.spark.sql.functions._

import graft.ops.{KmvAggregator, KmvSketch, Scalars}

/** KMV sketch properties beyond q122's full hash oracle (the md5 family is
  * cross-engine, so the declared query already compares sketch content and
  * estimates value-exact against DuckDB): merge mechanics under adversarial
  * partitionings, exactness below K, bounded state, and empirical accuracy
  * of the saturated estimator on a cardinality the fixture can't reach.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def hashes = Tables.events(spark, sf)
    .select(Scalars.tokenHash(col("user_id").cast("string")).as("h"))
    .as[Long]

  test("sketch is invariant to partitioning (associative merge)") {
    val s1 = hashes.repartition(1)
      .select(new KmvAggregator().toColumn).head()
    val s7 = hashes.repartition(7)
      .select(new KmvAggregator().toColumn).head()
    assert(s1.sameElements(s7))
  }

  test("below K the sketch IS the sorted distinct hash set (exact mode)") {
    val sk = hashes.select(new KmvAggregator().toColumn).head()
    val exact = hashes.distinct().collect().sorted
    if (exact.length <= KmvSketch.K)
      assert(sk.sameElements(exact))
    else
      assert(sk.sameElements(exact.take(KmvSketch.K)))
  }

  test("state never exceeds K, stays sorted and distinct, and reduce " +
      "handles duplicates and post-saturation inserts") {
    val agg = new KmvAggregator(4)
    // duplicates never double-insert
    val a = Seq(5L, 3L, 5L, 9L, 3L).foldLeft(agg.zero)(agg.reduce)
    assert(a.toSeq == Seq(3L, 5L, 9L))
    // saturate, then: a value above the max is ignored, below evicts it
    val b = Seq(5L, 3L, 9L, 7L, 11L, 4L).foldLeft(agg.zero)(agg.reduce)
    assert(b.toSeq == Seq(3L, 4L, 5L, 7L))
    // merge trims to k and dedups equal heads
    val m = agg.merge(Array(1L, 3L, 5L, 7L), Array(1L, 2L, 3L, 8L))
    assert(m.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("streaming twin: micro-batch sketches folded through foreachBatch " +
      "equal the one-shot sketch (X27/X29-pattern for the KMV tier)") {
    val agg = new KmvAggregator()
    val users = Tables.events(spark, sf).select(col("user_id"))
    val dir = java.nio.file.Files.createTempDirectory("kmv_stream")
    (0 until 3).foreach { i =>
      users.filter(col("user_id") % 3 === i)
        .write.mode("overwrite").parquet(dir.resolve(s"b$i").toString)
    }
    var running: Array[Long] = agg.zero
    val q = spark.readStream
      .schema(users.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("kmv_ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sk = batch
          .select(Scalars.tokenHash(col("user_id").cast("string")).as("h"))
          .as[Long].select(agg.toColumn).head()
        running = agg.merge(running, sk) // commutative: batch order is moot
        ()
      }.start()
    q.awaitTermination(60000)
    val direct = hashes.select(agg.toColumn).head()
    assert(running.sameElements(direct),
      s"incremental sketch (${running.length}) != one-shot (${direct.length})")
  }

  test("saturated estimator lands within 10% of the true distinct count " +
      "on a 20x-K synthetic cardinality") {
    val k = KmvSketch.K
    val n = 20 * k
    // deterministic "user ids" far above the fixture's — hash via the same
    // cross-engine family the declared query uses
    val ds = spark.range(n).select(
      Scalars.tokenHash(concat(lit("kmv:"), col("id").cast("string")))
        .as("h")).as[Long]
    val sk = ds.repartition(7).select(new KmvAggregator(k).toColumn).head()
    assert(sk.length == k)
    val est = (k - 1).toDouble * KmvSketch.M / sk.last.toDouble
    assert(math.abs(est - n) / n < 0.10,
      s"estimate $est vs true $n off by ${math.abs(est - n) / n}")
  }
}
