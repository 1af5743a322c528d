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
  *  - [[decodeWavStats]] is a REAL audio decode — `javax.sound.sampled`
  *    ships a RIFF/WAVE PCM codec in every stock JDK: [[wavMedia]]
  *    renders one genuine WAV clip per document (deterministic planted
  *    16-bit samples) and the decoder parses the container back and
  *    aggregates amplitude stats. PCM is lossless, so this too is
  *    oracle-checkable in SQL.
  *  - [[stubDecode]] keeps the ORIGINAL text-payload stand-in table
  *    ([[mediaFromDocs]]'s image/audio labels over UTF-8 bytes) as the
  *    declared fake-decoder shape — retained because its oracle pins
  *    the mapPartitions plumbing independently of any codec. With PNG
  *    and WAV decoded for real above, VIDEO is the one modality with
  *    no real decode anywhere (the JDK ships no video codec).
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
    // the encode/decode stage is CPU-bound per ROW over 8-byte input
    // rows, so its parallelism must come from the task count, not the
    // scan's byte-based splits: a 250 MB documents file maps to ~2 input
    // partitions and ran the sf10 decode nearly serially (cpu/wall 1.15,
    // measured). Repartition the ids to the cluster's parallelism — at
    // 100 TB the media table arrives as many objects anyway.
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { ids =>
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

  // ---- real audio decode (JDK javax.sound.sampled, no ext codecs) ---

  /** Deterministic planted-PCM geometry: short 16-bit mono clips whose
    * sample values are an integer formula of (doc_id, i) — the known
    * ground truth the DECODED stats are oracle-checked against. The
    * formula spans negative and positive amplitudes so the decoder's
    * signed little-endian handling is exercised, not just byte sums. */
  def wavSamples(id: Long): Int = (16 + id % 17).toInt
  def wavSample(id: Long, i: Int): Int = ((13 * id + 7 * i) % 4001).toInt - 2000

  /** 16-bit signed little-endian mono PCM — the one clip format. */
  private val PcmFormat =
    new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)

  /** The JDK's RIFF/WAVE codec providers, obtained ONCE per JVM via
    * ServiceLoader and called directly. Two measured reasons not to go
    * through the `AudioSystem` facade on a per-row decode path:
    *  - the facade funnels every call through a synchronized provider
    *    registry (JDK13Services) — a global lock per clip;
    *  - its reader chain tries providers in registration order, and
    *    `SoftMidiAudioFileReader` (before WaveFileReader in a stock
    *    JDK) routes each attempt through the synchronized MidiSystem —
    *    the 16-thread micro-bench measured 43k clips/s through the
    *    chain vs 1.29M clips/s WAVE-reader-first (30×, perfect
    *    scaling). Same codec classes, no global lock per row.
    * Writer selection is FORMAT-aware (`getAudioFileTypes(stream)`),
    * not just container-aware: `WaveFloatFileWriter` also claims WAVE
    * but rejects integer PCM — `isFileTypeSupported(Type)` alone picks
    * it under unlucky provider order. Readers are probe-ordered: the
    * provider that accepts one [[encodeWav]] clip is tried first, the
    * rest kept as the standard fallback chain. */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    val probe = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](32)), PcmFormat, 16L)
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala.find(_.getAudioFileTypes(probe)
        .contains(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no integer-PCM WAVE writer in this JDK"))
  }
  private lazy val wavReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toSeq
    val probe = encodeWav(0L)
    val (accepts, rest) = all.partition { r =>
      try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)); true }
      catch { case _: Exception => false }
    }
    accepts ++ rest
  }

  /** Render one REAL WAV for a document id — a genuine RIFF/WAVE
    * container (fmt + data chunks, 16-bit signed little-endian PCM)
    * written by the JDK's own `javax.sound.sampled` codec (provider
    * called directly — see [[wavWriter]]). Runs on executors inside
    * [[wavMedia]]. */
  def encodeWav(id: Long): Array[Byte] = {
    val n = wavSamples(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = wavSample(id, i)
      pcm(2 * i) = (s & 0xff).toByte // little-endian 16-bit signed
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), PcmFormat, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Parse a WAV blob through the JDK codec, provider-direct (the
    * standard AudioFileReader contract: a non-matching provider throws
    * UnsupportedAudioFileException and the next is tried — exactly what
    * `AudioSystem.getAudioInputStream` does behind its global lock). */
  private def readWav(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val it = wavReaders.iterator
    var lastIo: java.io.IOException = null
    while (it.hasNext) {
      val r = it.next()
      try return r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException =>
        // the AudioFileReader contract permits IOException on malformed
        // input too — a non-matching provider must not abort the chain
        // (advisor r10); rethrown only if NO provider accepts the blob
        case io: java.io.IOException => lastIo = io
      }
    }
    if (lastIo != null) throw lastIo
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no provider accepted the blob")
  }

  case class WavStats(doc_id: Long, n_samples: Long, sum_amp: Long,
      sum_abs: Long, peak: Int)

  /** Audio media table with REAL WAV payloads (one clip per document,
    * rendered on executors — at 100 TB the blobs come from object
    * storage instead, same schema). */
  def wavMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // same task-count repartition as [[pngMedia]] — the decode is
    // CPU-bound per row and must not inherit byte-based scan splits
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { ids =>
      ids.map(id => MediaRow(id, "audio", encodeWav(id)))
    }.toDF()
  }

  /** REAL decode: each WAV blob is parsed through the JDK's actual
    * RIFF/WAVE reader (chunk walk, format negotiation) — the same
    * `WaveFileReader` codec `AudioSystem` would dispatch to, called
    * provider-direct via [[readWav]] to skip the facade's global lock
    * (see [[wavWriter]]) — and the PCM samples are re-signed and
    * aggregated —
    * the feature-extraction stage of an audio pipeline (amplitude sum,
    * absolute energy, peak). PCM is lossless, so the stats equal the
    * planted formula exactly (hash-gated by the audio_decode_stats
    * oracle). Only video remains a declared stand-in — the JDK ships no
    * video codec. */
  def decodeWavStats(spark: SparkSession, media: DataFrame): Dataset[WavStats] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val ais = readWav(m.payload)
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian && fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"unexpected WAV format for doc ${m.doc_id}: $fmt")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var sum = 0L; var sabs = 0L; var peak = 0
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
          sum += s; val a = math.abs(s)
          sabs += a; if (a > peak) peak = a
          i += 1
        }
        WavStats(m.doc_id, n.toLong, sum, sabs, peak)
      }
    }
  }

  /** encode → REAL decode → per-clip stats, as a registry entry. */
  def audioDecodeStats(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeWavStats(spark, wavMedia(spark, docs)).toDF().orderBy("doc_id")
}
