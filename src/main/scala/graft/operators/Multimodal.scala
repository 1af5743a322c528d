package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in partition
  * batches.
  *
  * Two decode paths:
  *  - [[decodePngStats]] is a REAL image decode — `javax.imageio`
  *    ships PNG/JPEG codecs in every stock JDK, so no external media
  *    libraries are needed: [[pngMedia]] renders one genuine PNG blob
  *    per document (deterministic planted pixel values), and the
  *    decoder reads the bytes back through the actual codec and
  *    aggregates per-channel pixel sums. PNG is lossless 8-bit RGB, so
  *    the decoded stats equal the planted formula exactly — which is
  *    what makes a REAL decode oracle-checkable in SQL.
  *  - [[stubDecode]] keeps the text-payload feature extractor for the
  *    audio/video half of the media table, where the container has no
  *    codec (declared stand-in; same partition-batched shape).
  *
  * The surrounding plumbing is the real pattern for 100 TB media
  * pipelines either way:
  *  - binary payload + metadata travel in one row (columnar parquet
  *    stores the blob column contiguously; column pruning means metadata
  *    queries never read the bytes — MultimodalSpec asserts ReadSchema);
  *  - decode runs via mapPartitions so a heavy decoder context is
  *    initialized ONCE per partition (JNI/codec contexts are expensive),
  *    then streamed over the iterator — the Scala analogue of a
  *    pandas/Arrow batch UDF;
  *  - output is a typed Dataset with a stable schema the optimizer can
  *    prune and push through.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      checksum: Long, fake_width: Int, fake_height: Int)

  /** Build a media table from documents (payload = UTF-8 bytes of text —
    * a deterministic stand-in for real image/audio blobs). */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit("image")).otherwise(lit("audio"))
        .as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: deterministic fake feature extraction. A real
    * implementation would replace the body with a codec call; the
    * partition-batched shape, schema, and typed output stay the same. */
  def stubDecode(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real decoder init would happen HERE, once per partition
      rows.map { r =>
        val bytes = r.payload
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum = (sum * 31 + (bytes(i) & 0xff)) & 0xffffff; i += 1 }
        val w = if (bytes.length > 0) (bytes(0) & 0xff) + 1 else 1
        val h = if (bytes.length > 1) (bytes(1) & 0xff) + 1 else 1
        MediaFeatures(r.doc_id, r.media_type, bytes.length.toLong, sum, w, h)
      }
    }
  }

  /** Metadata-only query over the media table — demonstrates that blob
    * columns are pruned (the scan reads doc_id/media_type/payload-length
    * only through builtins; oracle-checkable). */
  def mediaMeta(docs: DataFrame): DataFrame =
    mediaFromDocs(docs)
      .select(col("doc_id"), col("media_type"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .orderBy("doc_id")

  /** Frame size (chars) and sampling stride for frameSample. */
  val FrameChars = 128
  val SampleEvery = 2

  /** Frame sampling: the payload is treated as fixed-size frames and
    * every SampleEvery-th frame is selected and summarized (offset +
    * md5 signature). This is the byte-range arithmetic a real video
    * sampler performs before handing ranges to a decoder; frames are in
    * CHARACTER units of the source text so the md5 signatures are
    * oracle-checkable (DuckDB 1.0 has no md5 over BLOB). Pure builtins,
    * one map stage — no shuffle until the final presentation sort. */
  def frameSample(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) >= FrameChars)
      .select(col("doc_id"),
        explode(expr(
          s"sequence(0, (length(text) - $FrameChars) div $FrameChars, $SampleEvery)"))
          .as("frame_idx"),
        col("text"))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * FrameChars + 1).cast("long").as("offset"),
        md5(expr(s"substring(text, frame_idx * $FrameChars + 1, $FrameChars)"))
          .as("frame_sig"))
      .orderBy("doc_id", "frame_idx")

  /** Full stub pipeline as a DataFrame (rows-only driver check). */
  def mediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    stubDecode(spark, mediaFromDocs(docs)).toDF().orderBy("doc_id")

  // ---- real image decode (JDK ImageIO, no external codecs) ----------

  /** Deterministic planted-pixel geometry: small per-document images
    * (4–8 × 3–6) whose channel values are integer formulas of
    * (doc_id, x, y) — the known ground truth the DECODED stats are
    * oracle-checked against. */
  def pngWidth(id: Long): Int = (4 + id % 5).toInt
  def pngHeight(id: Long): Int = (3 + id % 4).toInt
  def pngR(id: Long, x: Int, y: Int): Int = ((7 * id + 13 * x + 31 * y) % 256).toInt
  def pngG(id: Long, x: Int, y: Int): Int = ((11 * id + 17 * x + 5 * y) % 256).toInt
  def pngB(id: Long, x: Int, y: Int): Int = ((3 * id + 23 * x + 29 * y) % 256).toInt

  /** Render one REAL PNG for a document id — a genuine compressed
    * image-format blob (PNG signature, IDAT chunks, CRCs), not a byte
    * stand-in. Runs on executors inside [[pngMedia]]. */
  def encodePng(id: Long): Array[Byte] = {
    val w = pngWidth(id); val h = pngHeight(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pngR(id, x, y) << 16) | (pngG(id, x, y) << 8) | pngB(id, x, y))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  case class PngStats(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Image media table with REAL PNG payloads (one blob per document,
    * rendered on executors — a 100 TB deployment reads blobs from
    * object storage instead, same schema). */
  def pngMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      // per-partition decoder init: ImageIO's default stream cache is a
      // DISK-backed temp file per image — pure syscall overhead for
      // blobs this small (review finding); keep it in memory
      javax.imageio.ImageIO.setUseCache(false)
      ids.map(id => MediaRow(id, "image", encodePng(id)))
    }.toDF()
  }

  /** REAL decode: `javax.imageio.ImageIO.read` parses each PNG blob
    * through the JDK's actual codec (inflate + unfilter + CRC) and the
    * per-channel pixel sums are aggregated — the feature-extraction
    * stage of an image pipeline. PNG round-trips 8-bit RGB losslessly,
    * so the sums equal the planted formula exactly (hash-gated by the
    * media_decode_stats oracle). mapPartitions keeps the
    * decoder-per-partition shape; ImageIO needs no display (headless). */
  def decodePngStats(spark: SparkSession, media: DataFrame): Dataset[PngStats] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory stream cache
      rows.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"undecodable blob for doc ${m.doc_id}")
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        PngStats(m.doc_id, img.getWidth, img.getHeight, sr, sg, sb)
      }
    }
  }

  /** encode → REAL decode → per-image stats, as a registry entry. */
  def mediaDecodeStats(spark: SparkSession, docs: DataFrame): DataFrame =
    decodePngStats(spark, pngMedia(spark, docs)).toDF().orderBy("doc_id")
}
