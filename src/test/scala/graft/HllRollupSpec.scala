package graft

import org.apache.spark.sql.functions._

import graft.ops.Scalars

/** Oracle stand-in for q108 (no-oracle by design — Datasketches images are
  * engine-specific): the properties that make sketch pre-aggregation
  * trustworthy are (1) merging daily sketches gives the SAME estimate as
  * sketching the raw stream directly, (2) estimates track exact counts.
  */
class HllRollupSpec extends SparkSpec {

  private val NsPerDay = 86400000000000L

  private def ev = Tables.events(spark, sf)
    .select(Scalars.longDiv("ts", NsPerDay).as("day"), col("user_id"))

  test("union of daily sketches equals the direct all-data sketch") {
    val merged = ev.groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getLong(0)
    val direct = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().head.getLong(0)
    assert(merged == direct,
      s"re-aggregated estimate $merged != direct $direct")
  }

  test("streaming twin: per-batch HLL sketches unioned incrementally " +
    "give the same estimate as one batch sketch (incremental uniques)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hll_stream")
    val users = ev.select("user_id")
    (0 until 3).foreach { i =>
      users.filter(col("user_id") % 3 === i)
        .write.mode("overwrite").parquet(dir.resolve(s"b$i").toString)
    }
    // running state = ONE binary sketch column, merged per micro-batch
    var running: Array[Byte] = null
    val q = spark.readStream
      .schema(users.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("hll_ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sk = batch.agg(hll_sketch_agg(col("user_id")).as("sk"))
          .collect().head.getAs[Array[Byte]](0)
        running = if (running == null) sk
        else {
          val both = Seq(running, sk).toDF("sk")
          both.agg(hll_union_agg(col("sk")).as("sk"))
            .collect().head.getAs[Array[Byte]](0)
        }
      }.start()
    q.awaitTermination(60000)
    val streamed = Seq(running).toDF("sk")
      .select(hll_sketch_estimate(col("sk"))).collect().head.getLong(0)
    val direct = users
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .collect().head.getLong(0)
    assert(streamed == direct,
      s"incremental estimate $streamed != batch $direct")
  }

  test("declared q108 estimates track exact counts (<=2% relative error)") {
    val rows = Queries.byName("q108_hll_rollup").build(spark, sf).collect()
    assert(rows.length >= 2) // at least one day + the total row
    rows.foreach { r =>
      val est = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(est - exact) <= math.max(1.0, 0.02 * exact),
        s"day ${r.getLong(0)}: est $est vs exact $exact")
    }
    // total row present and last (day sorted, -1 first actually)
    assert(rows.head.getLong(0) == -1L, "merged-total row missing")
  }
}
