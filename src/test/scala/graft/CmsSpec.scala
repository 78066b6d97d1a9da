package graft

import org.apache.spark.sql.functions._

import graft.ops.{CountMin, CountMinAggregator}

/** Count-Min sketch engine-side invariants: one-sided error, the ε·N
  * ceiling, partition invariance of the merged sketch, and the streaming
  * incremental-merge twin. Since r13 q106 ALSO has a full DuckDB hash
  * oracle (the buckets use the md5-tokenHash affine family, which the
  * oracle replays relationally — ops/CountMin.AB); these properties stay
  * because they gate the sketch SEMANTICS (what the guarantee is), not
  * just the value (that both engines compute the same thing).
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def tokens = Tables.documents(spark, sf)
    .select(explode(split(col("text"), " ")).as("value")).as[String]

  test("estimate is never below the exact count, and within eps*N") {
    val toks = tokens.cache()
    val n = toks.count()
    val sketch = toks
      .select(new CountMinAggregator().toColumn).head()
    val exact = toks.groupBy("value").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    assert(exact.nonEmpty)
    val eps = math.E / CountMin.Width // classic CM bound, ~0.13%
    exact.foreach { case (tok, c) =>
      val est = CountMin.estimate(sketch, tok)
      assert(est >= c, s"under-count for '$tok': est=$est exact=$c")
      assert(est <= c + math.ceil(eps * n).toLong,
        s"over-count beyond eps*N for '$tok': est=$est exact=$c n=$n")
    }
    toks.unpersist()
    ()
  }

  test("merged sketch is invariant to partitioning (associative merge)") {
    val agg = new CountMinAggregator
    val s1 = tokens.repartition(1).select(agg.toColumn).head()
    val s7 = tokens.repartition(7).select(agg.toColumn).head()
    assert(s1.sameElements(s7))
  }

  test("sketch total mass equals Depth * token count") {
    val toks = tokens
    val n = toks.count()
    val sketch = toks
      .select(new CountMinAggregator().toColumn).head()
    assert(sketch.sum == CountMin.Depth * n)
  }

  test("streaming twin: per-batch sketches merged incrementally equal " +
    "the batch sketch (incremental heavy hitters)") {
    // the mergeable state is the whole point of the sketch: a stream can
    // maintain corpus-wide token frequencies by elementwise-adding each
    // micro-batch's sketch — state stays O(depth·width) forever, and the
    // running sketch is bit-equal to a from-scratch batch aggregation.
    val dir = java.nio.file.Files.createTempDirectory("cms_stream")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // three shards arriving as separate micro-batches
    (0 until 3).foreach { i =>
      val shard = docs.filter(col("doc_id") % 3 === i)
        .select(to_json(struct(col("text"))).as("j")).as[String]
        .collect().mkString("\n")
      java.nio.file.Files.write(dir.resolve(s"shard$i.json"),
        shard.getBytes)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val running = new CountMinAggregator().zero
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir.toString)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cms_ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val bs = batch
          .select(explode(split(col("text"), " ")).as("value")).as[String]
          .select(new CountMinAggregator().toColumn).head()
        running.synchronized {
          new CountMinAggregator().merge(running, bs); ()
        }
      }.start()
    q.awaitTermination(60000)
    val batchSketch = tokens
      .select(new CountMinAggregator().toColumn).head()
    assert(running.sameElements(batchSketch))
  }

  test("declared q106 ranks by estimate with exact counts attached") {
    val out = Queries.byName("q106_cms_heavy_hitters")
      .build(spark, sf).collect()
    assert(out.length == 20)
    // estimates dominate exacts and arrive in (est desc, tok asc) order
    out.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
    val keys = out.map(r => (-r.getLong(2), r.getString(0))).toSeq
    assert(keys == keys.sorted)
  }
}
