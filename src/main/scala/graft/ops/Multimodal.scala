package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing — north-star extension (BASELINE.json): treat
  * image/audio/video as opaque `binary` columns with typed metadata, with
  * the decode step behind a per-partition seam.
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * libraries): `decodeStub` derives deterministic fake dimensions from the
  * bytes. The Spark-side plumbing — schema, partition-batched execution,
  * decoder reuse per partition — is real and unit-tested, and is exactly
  * where a JNI/av-library decoder would plug in.
  *
  * Scale notes: mapPartitions (not a per-row UDF) so a real decoder is
  * initialized once per task, the analog of per-partition client reuse in
  * the reference's async fan-out (`s3_rankings_collector.py:94`, T3).
  * Binary payloads never enter a shuffle here — decode emits narrow typed
  * metadata and drops the blob as early as possible (at 100 TB, shuffling
  * decoded features instead of raw media is the difference between a job
  * that runs and one that doesn't).
  */
object Multimodal {

  /** Decoded-media metadata record. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      format: String)

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** The decoder seam: bytes → metadata. Deterministic stub; a real
    * implementation would parse the container header / decode a frame.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    // fake "header sniff": first byte selects a format bucket
    val formats = Array("png", "jpeg", "webp", "wav")
    val fmt =
      if (n == 0) "empty"
      else formats(java.lang.Byte.toUnsignedInt(bytes(0)) % 4)
    MediaMeta(id, n, n % 640, (n * 7) % 480, fmt)
  }

  /** (id, blob) DataFrame → typed metadata via one decoder per partition. */
  def decodeMeta(blobs: DataFrame): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real decoders initialize here, once per task
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Frame-sample stub: pick every k-th byte as a "frame" payload — stands
    * in for video frame sampling; demonstrates one-blob→N-rows with narrow
    * output (explode shape R1).
    */
  def sampleFrames(blobs: DataFrame, everyK: Int): DataFrame =
    blobs.select(col("doc_id"), col("blob").cast("binary").as("b"))
      .select(col("doc_id"),
        posexplode(sequence(lit(0),
          greatest(length(col("b")) - 1, lit(0)), lit(everyK)))
          .as(Seq("frame_no", "offset")))
      .select(col("doc_id"), col("frame_no"), col("offset"))

  /** Resized-media metadata: aspect-preserving fit into (maxW, maxH). The
    * arithmetic is the real resize contract (scale = min of the per-axis
    * ratios, never upscale); only the pixel transform a real library would
    * do is absent. Runs on decoded metadata, not blobs — by the time
    * dimensions exist the payload is already dropped.
    */
  case class ResizedMeta(
      doc_id: Long,
      width: Int,
      height: Int,
      scale: Double)

  def resizeMeta(meta: Dataset[MediaMeta], maxW: Int, maxH: Int)
      : Dataset[ResizedMeta] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.map { m =>
      val w = math.max(m.width, 1)
      val h = math.max(m.height, 1)
      val s = math.min(1.0,
        math.min(maxW.toDouble / w, maxH.toDouble / h))
      ResizedMeta(m.doc_id,
        math.max(1, math.floor(w * s).toInt),
        math.max(1, math.floor(h * s).toInt), s)
    }
  }

  /** Feature extraction: 16-bin byte histogram, L1-normalized to a
    * fixed-dim Array[Float]. Unlike the decode this is NOT a stub — a byte
    * histogram is a real (if simple) content feature, and its output plugs
    * straight into the similarity tier (cosine top-k / LSH buckets over
    * Array[Float], QueriesText). Batched per partition: the iterator is
    * consumed in `batchSize` groups, the shape a vectorized extractor
    * (BLAS, ONNX session) needs — one native call per batch, not per row.
    */
  def extractFeatures(blobs: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real extractor binds its native session here, once per task,
        // then feeds fixed-size batches
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val hist = new Array[Float](16)
            var i = 0
            while (i < bytes.length) {
              hist(java.lang.Byte.toUnsignedInt(bytes(i)) / 16) += 1f
              i += 1
            }
            val n = math.max(bytes.length, 1).toFloat
            var j = 0
            while (j < 16) { hist(j) /= n; j += 1 }
            (id, hist)
          }
        }
      }
      .toDF("doc_id", "features")
  }
}
