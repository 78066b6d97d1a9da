package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing — north-star extension (BASELINE.json): treat
  * image/audio/video as opaque `binary` columns with typed metadata, with
  * the decode step behind a per-partition seam.
  *
  * Two decoders plug into the same seam:
  *  - [[decodeImage]] — REAL image decode via JDK-builtin `javax.imageio`
  *    (PNG/JPEG/BMP/GIF readers ship with Java SE; no new dependency).
  *    Width/height/format come from actual decoded pixels, and
  *    [[resizeImage]] / [[extractPixelFeatures]] consume those pixels
  *    (scaled re-encode; luminance histogram). VERDICT r04 #4.
  *  - [[decodeStub]] — the deterministic fake kept for the non-image blob
  *    paths (the testdata's blobs are text bytes) and as the documented
  *    plug point for codecs the JDK lacks (audio/video need external libs).
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

  /** REAL image decode: `javax.imageio` header sniff + pixel decode.
    * Returns actual raster dimensions and the reader's format name
    * (png/jpeg/bmp/gif with a stock JDK); bytes no reader claims decode to
    * `(0, 0, "undecodable")` rather than throwing — at 100 TB a corrupt
    * blob must not kill the task, it must land in a quarantine partition.
    */
  def decodeImage(id: Long, bytes: Array[Byte]): MediaMeta = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (bytes.isEmpty || !readers.hasNext)
        MediaMeta(id, bytes.length, 0, 0,
          if (bytes.isEmpty) "empty" else "undecodable")
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          val img = r.read(0) // full pixel decode, not just the header
          MediaMeta(id, bytes.length, img.getWidth, img.getHeight,
            r.getFormatName.toLowerCase)
        } finally r.dispose()
      }
    } finally in.close()
  }

  /** Decode the image bytes to a BufferedImage, or None if undecodable. */
  private def readImage(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))

  /** (id, blob) DataFrame → typed metadata via one decoder per partition.
    * `decoder` defaults to the deterministic stub (the declared q52 path
    * over text-byte blobs); pass [[decodeImage]] for real media columns.
    */
  def decodeMeta(blobs: DataFrame,
      decoder: (Long, Array[Byte]) => MediaMeta = decodeStub)
      : Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real decoders initialize here, once per task
        it.map { case (id, bytes) => decoder(id, bytes) }
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

  /** Aspect-preserving fit factor: min of the per-axis ratios, capped at 1
    * (never upscale). Shared by the metadata form and the pixel form so
    * their dimension arithmetic cannot drift.
    */
  def fitScale(w: Int, h: Int, maxW: Int, maxH: Int): Double =
    math.min(1.0, math.min(
      maxW.toDouble / math.max(w, 1), maxH.toDouble / math.max(h, 1)))

  def resizeMeta(meta: Dataset[MediaMeta], maxW: Int, maxH: Int)
      : Dataset[ResizedMeta] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.map { m =>
      val w = math.max(m.width, 1)
      val h = math.max(m.height, 1)
      val s = fitScale(w, h, maxW, maxH)
      ResizedMeta(m.doc_id,
        math.max(1, math.floor(w * s).toInt),
        math.max(1, math.floor(h * s).toInt), s)
    }
  }

  /** REAL pixel resize: decode, aspect-preserving fit into (maxW, maxH)
    * with the same [[fitScale]] contract as the metadata form, bilinear
    * Graphics2D transform, re-encode as PNG. Output `(doc_id, width,
    * height, blob)` — undecodable inputs are dropped (they carry no
    * pixels to resize; the quarantine path is [[decodeImage]]'s
    * "undecodable" rows). One Graphics pipeline per JVM, per-partition
    * iteration — no per-row UDF overhead.
    */
  def resizeImage(blobs: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          readImage(bytes).map { img =>
            val s = fitScale(img.getWidth, img.getHeight, maxW, maxH)
            val w = math.max(1, math.floor(img.getWidth * s).toInt)
            val h = math.max(1, math.floor(img.getHeight * s).toInt)
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            (id, w, h, buf.toByteArray)
          }
        }
      }
      .toDF("doc_id", "width", "height", "blob")
  }

  /** REAL pixel features: 16-bin luminance histogram over decoded pixels
    * (ITU-R BT.601 luma), L1-normalized Array[Float] — the image analog of
    * [[extractFeatures]]' byte histogram, feeding the same similarity tier.
    * Undecodable inputs are dropped.
    */
  def extractPixelFeatures(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          readImage(bytes).map { img =>
            val hist = new Array[Float](16)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val lum = (299 * ((rgb >> 16) & 0xff) +
                  587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                hist(lum / 16) += 1f
                x += 1
              }
              y += 1
            }
            val n = math.max(img.getWidth * img.getHeight, 1).toFloat
            var j = 0
            while (j < 16) { hist(j) /= n; j += 1 }
            (id, hist)
          }
        }
      }
      .toDF("doc_id", "features")
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
