package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Multimodal plumbing (north-star extension): binary columns + typed
  * metadata through the per-partition decode seam. The decode itself is a
  * documented deterministic stub.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeMeta carries schema and deterministic stub values") {
    val blobs = Seq(
      (1L, "hello world"), (2L, ""), (3L, "xyz")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val meta = Multimodal.decodeMeta(blobs)
    assert(meta.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "format"))
    val rows = meta.collect().map(m => m.doc_id -> m).toMap
    assert(rows(1L).n_bytes == 11 && rows(1L).width == 11)
    assert(rows(2L).n_bytes == 0 && rows(2L).format == "empty")
    // determinism across runs
    assert(Multimodal.decodeMeta(blobs).collect().toSet == meta.collect().toSet)
  }

  test("decodeMeta runs on the documents table end-to-end") {
    val blobs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val meta = Multimodal.decodeMeta(blobs)
    assert(meta.count() == Tables.documents(spark, sf).count())
    assert(meta.filter(col("n_bytes") <= 0).count() == 0)
  }

  test("sampleFrames produces ceil(n/k) frames per blob") {
    val blobs = Seq((1L, "0123456789")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").as("blob"))
    val frames = Multimodal.sampleFrames(blobs, 3).collect()
    // offsets 0,3,6,9
    assert(frames.map(_.getInt(2)).toSeq == Seq(0, 3, 6, 9))
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
  }
}
