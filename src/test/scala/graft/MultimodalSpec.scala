package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Real-image decode (JDK ImageIO PNG) + blob-column pruning.
  *
  * The decode is gated three ways: hand-computed pixels here, a
  * Scala-side recomputation of the stats, and the media_decode_stats
  * DuckDB oracle (the driver gate). The pruning test pins the 100 TB
  * claim that metadata queries over a media table never read the
  * payload bytes. */
class MultimodalSpec extends SparkSpec {

  test("encodePng produces a genuine PNG that ImageIO round-trips losslessly") {
    val bytes = Multimodal.encodePng(42L)
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G', "payload is not a real PNG")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    // doc 42: width 4 + 42%5 = 6, height 3 + 42%4 = 5
    assert(img.getWidth == 6 && img.getHeight == 5)
    // hand-computed planted pixels (formulas: r=(7id+13x+31y)%256,
    // g=(11id+17x+5y)%256, b=(3id+23x+29y)%256):
    //  (0,0): r = 294%256 = 38,  g = 462%256 = 206, b = 126
    val p00 = img.getRGB(0, 0)
    assert(((p00 >> 16) & 0xff) == 38 && ((p00 >> 8) & 0xff) == 206 &&
      (p00 & 0xff) == 126, f"pixel(0,0) = 0x$p00%06x")
    //  (3,2): r = (294+39+62)%256 = 139, g = (462+51+10)%256 = 11,
    //         b = (126+69+58)%256 = 253
    val p32 = img.getRGB(3, 2)
    assert(((p32 >> 16) & 0xff) == 139 && ((p32 >> 8) & 0xff) == 11 &&
      (p32 & 0xff) == 253, f"pixel(3,2) = 0x$p32%06x")
  }

  test("decodePngStats equals the planted formula for every document") {
    val docs = Tables.documents(spark, sf0001).select("doc_id")
    val got = Multimodal.mediaDecodeStats(spark, docs).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.nonEmpty)
    // independent Scala recomputation from the formulas, never ImageIO
    got.foreach { case (id, (w, h, sr, sg, sb)) =>
      assert(w == Multimodal.pngWidth(id) && h == Multimodal.pngHeight(id))
      val grid = for (y <- 0 until h; x <- 0 until w) yield (x, y)
      assert(sr == grid.map { case (x, y) => Multimodal.pngR(id, x, y).toLong }.sum)
      assert(sg == grid.map { case (x, y) => Multimodal.pngG(id, x, y).toLong }.sum)
      assert(sb == grid.map { case (x, y) => Multimodal.pngB(id, x, y).toLong }.sum)
    }
  }

  test("encodeWav produces a genuine RIFF/WAVE container the JDK parses back") {
    val bytes = Multimodal.encodeWav(42L)
    assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E', "payload is not a real WAV")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian)
    val pcm = ais.readAllBytes()
    // doc 42: n = 16 + 42%17 = 24 samples; s(i) = (546 + 7i) % 4001 - 2000
    assert(pcm.length == 48)
    def sampleAt(i: Int): Int =
      ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
    assert(sampleAt(0) == -1454, s"s(0) = ${sampleAt(0)}") // 546 - 2000
    assert(sampleAt(23) == -1293, s"s(23) = ${sampleAt(23)}") // 707 - 2000
    // a doc whose formula wraps past the modulus (signed round-trip both
    // sides of zero): doc 300, s(0) = 3900-2000 = 1900, s(15) = 4005%4001
    // - 2000 = -1996
    val pcm300 = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(Multimodal.encodeWav(300L))).readAllBytes()
    def s300(i: Int): Int =
      ((pcm300(2 * i) & 0xff) | (pcm300(2 * i + 1) << 8)).toShort.toInt
    assert(s300(0) == 1900 && s300(15) == -1996)
  }

  test("decodeWavStats equals the planted formula for every document") {
    val docs = Tables.documents(spark, sf0001).select("doc_id")
    val got = Multimodal.audioDecodeStats(spark, docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(got.nonEmpty)
    // independent Scala recomputation from the formulas, never AudioSystem
    got.foreach { case (id, (n, sum, sabs, peak)) =>
      val ss = (0 until Multimodal.wavSamples(id)).map(Multimodal.wavSample(id, _))
      assert(n == ss.size.toLong)
      assert(sum == ss.map(_.toLong).sum, s"sum_amp mismatch for doc $id")
      assert(sabs == ss.map(s => math.abs(s).toLong).sum)
      assert(peak == ss.map(math.abs).max)
    }
  }

  test("metadata queries over a parquet media table never read the payload bytes") {
    // write a real media table (binary payload column), then scan only
    // the metadata columns: the parquet ReadSchema must exclude payload
    // — the columnar-pruning contract that makes metadata queries cheap
    // at 100 TB of blobs
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    Multimodal.pngMedia(spark, Tables.documents(spark, sf0001).limit(50))
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).groupBy("media_type")
      .agg(count(lit(1)).as("n"))
    val scan = q.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val readSchema = scan.metadata("ReadSchema")
    assert(!readSchema.contains("payload"),
      s"metadata query reads the blob column: $readSchema")
    assert(q.collect().map(_.getLong(1)).sum == 50L)
  }
}
