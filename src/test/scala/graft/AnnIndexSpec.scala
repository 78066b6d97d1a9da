package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._

import graft.pipelines.AnnIndexPipeline
import graft.pipelines.AnnIndexPipeline.AnnIndex

/** X29 incremental ANN-index maintenance (q117): the 3-batch fold must be
  * bit-identical to the one-shot build, appends must leave existing index
  * rows untouched, and the per-batch assignment plan must never read the
  * existing index (that read is exactly the O(corpus)-per-day trap the
  * pipeline exists to avoid).
  */
class AnnIndexSpec extends SparkSpec {

  private lazy val e = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))
  private lazy val cents = AnnIndexPipeline.centroids(e)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("3-batch fold builds the same index as the one-shot assignment") {
    val oneShot = rows(AnnIndexPipeline.assign(e, cents))
    val folded = rows(AnnIndexPipeline.foldBatches(e, 3).assigned)
    assert(folded == oneShot)
    assert(folded.nonEmpty)
  }

  test("fold search equals one-shot search row-for-row (q117 == q54)") {
    val oneShot = AnnIndexPipeline.search(
      AnnIndex(AnnIndexPipeline.assign(e, cents)), col("vec_id") < 3, 3)
    val folded = AnnIndexPipeline.search(
      AnnIndexPipeline.foldBatches(e, 3), col("vec_id") < 3, 3)
    assert(folded.collect().toSeq == oneShot.collect().toSeq)
  }

  test("addBatch is append-only: pre-existing index rows pass through " +
      "untouched and batch cost does not re-assign them") {
    val b0 = e.filter(pmod(col("vec_id"), lit(2)) === 0)
    val b1 = e.filter(pmod(col("vec_id"), lit(2)) === 1)
    val ix0 = AnnIndexPipeline.addBatch(
      AnnIndex(AnnIndexPipeline.assign(e.limit(0), cents)), b0, cents)
    val before = rows(ix0.assigned)
    val ix1 = AnnIndexPipeline.addBatch(ix0, b1, cents)
    val after = rows(ix1.assigned)
    assert(before.subsetOf(after))
    assert((after -- before) ==
      rows(AnnIndexPipeline.assign(b1, cents)))
  }

  test("streaming twin: embedding micro-batches folded through " +
      "foreachBatch equal the one-shot index (daily ANN ingest as a stream)") {
    val dir = java.nio.file.Files.createTempDirectory("ann_stream")
    (0 until 3).foreach { i =>
      e.filter(pmod(col("vec_id"), lit(3)) === i).coalesce(1)
        .write.mode("overwrite").parquet(dir.resolve(s"b$i").toString)
    }
    // centroids fixed up front (the versioned-offline-artifact contract);
    // fold order doesn't matter — assignment is per-vector independent,
    // which is exactly what lets the same addBatch serve a streaming sink
    var index = AnnIndex(AnnIndexPipeline.assign(e.limit(0), cents))
    val q = spark.readStream
      .schema(e.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ann_ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        index = AnnIndexPipeline.addBatch(index, batch, cents)
      }.start()
    assert(q.awaitTermination(180000), "stream did not finish")
    assert(rows(index.assigned) == rows(AnnIndexPipeline.assign(e, cents)))
    // and the maintained index serves search with no corpus re-assignment
    val hits = AnnIndexPipeline.search(index, col("vec_id") < 3, 3)
    assert(hits.count() > 0)
  }

  test("assignment plan broadcasts the centroids and never joins or " +
      "scans the existing index") {
    val plan: QueryExecution =
      AnnIndexPipeline.assign(e, cents).queryExecution
    val phys = plan.executedPlan.toString
    assert(phys.contains("BroadcastNestedLoopJoin"),
      s"centroid scoring must ride a broadcast, got:\n$phys")
    assert(!phys.contains("SortMergeJoin"),
      "assignment must not shuffle-join anything")
    // assign() sees only the batch and the centroid set — two scans of the
    // embeddings source (batch + centroid slice), nothing else to read.
    assert(!phys.contains("Exchange hashpartitioning(cell"),
      "assignment must not partition by cell (that is the writer's job)")
  }
}
