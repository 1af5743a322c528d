package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in partition
  * batches.
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs,
  * so `stubDecode` computes deterministic fake features (byte length,
  * rolling checksum, fake dims derived from the first bytes). Everything
  * around it is the real pattern for 100 TB media pipelines:
  *  - binary payload + metadata travel in one row (columnar parquet
  *    stores the blob column contiguously; column pruning means metadata
  *    queries never read the bytes);
  *  - decode runs via mapPartitions so a real decoder would be
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
}
