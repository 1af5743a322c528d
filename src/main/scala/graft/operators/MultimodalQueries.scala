package graft.operators

import graft.{QueryDef, Tables}

/** Driver-contract wiring for multimodal plumbing. The stub decoder's
  * deterministic features are reproduced in SQL (the corpus is pure
  * ASCII, so byte iteration == char iteration; list_reduce folds the
  * same (sum*31+byte) & 0xffffff rolling checksum), making even the
  * mapPartitions path hash-gated. media_decode_stats goes further: the
  * payloads are REAL PNGs and the decode is the JDK's actual codec —
  * the oracle recomputes the per-channel sums from the planted pixel
  * formula, so a hash-green result proves a lossless real decode. */
object MultimodalQueries {

  /** Σ over the w×h grid of a per-pixel channel formula, in DuckDB
    * list arithmetic (the corpus's images are ≤ 8×6, so the per-row
    * list stays tiny). */
  private def chanSumSql(a: Int, bx: Int, cy: Int): String =
    s"""CAST(list_sum(flatten(list_transform(range(0, 3 + doc_id % 4), y ->
       |  list_transform(range(0, 4 + doc_id % 5), x ->
       |    ($a * doc_id + $bx * x + $cy * y) % 256)))) AS BIGINT)""".stripMargin

  private val checksumSql =
    """CAST(list_reduce(list_prepend(0,
      |  list_transform(range(1, length(text) + 1),
      |    i -> ascii(substr(text, CAST(i AS INTEGER), 1)))),
      |  (a, b) -> (a * 31 + b) % 16777216) AS BIGINT)""".stripMargin
  val defs: Seq[QueryDef] = Seq(
    QueryDef("media_meta",
      (s, d) => Multimodal.mediaMeta(Tables.documents(s, d)), Some(
        """SELECT doc_id,
          |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
          |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("media_frame_sample",
      (s, d) => Multimodal.frameSample(Tables.documents(s, d)), Some(
        s"""WITH f AS (
           |  SELECT doc_id, text,
           |         unnest(range(0, ((length(text) - ${Multimodal.FrameChars})
           |                // ${Multimodal.FrameChars}) + 1, ${Multimodal.SampleEvery})) AS frame_idx
           |  FROM documents WHERE length(text) >= ${Multimodal.FrameChars})
           |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           |  CAST(frame_idx * ${Multimodal.FrameChars} + 1 AS BIGINT) AS offset,
           |  md5(substr(text, CAST(frame_idx * ${Multimodal.FrameChars} + 1 AS INTEGER),
           |      ${Multimodal.FrameChars})) AS frame_sig
           |FROM f ORDER BY doc_id, frame_idx""".stripMargin)),
    QueryDef("media_features",
      (s, d) => Multimodal.mediaFeatures(s, Tables.documents(s, d)), Some(
        s"""SELECT doc_id,
           |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
           |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |  $checksumSql AS checksum,
           |  CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) + 1 ELSE 1 END AS fake_width,
           |  CASE WHEN length(text) > 1 THEN ascii(substr(text, 2, 1)) + 1 ELSE 1 END AS fake_height
           |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("audio_decode_stats",
      (s, d) => Multimodal.audioDecodeStats(s, Tables.documents(s, d)), Some(
        """SELECT doc_id,
          |  CAST(16 + doc_id % 17 AS BIGINT) AS n_samples,
          |  CAST(list_sum(list_transform(range(0, 16 + doc_id % 17),
          |    i -> (13 * doc_id + 7 * i) % 4001 - 2000)) AS BIGINT) AS sum_amp,
          |  CAST(list_sum(list_transform(range(0, 16 + doc_id % 17),
          |    i -> abs((13 * doc_id + 7 * i) % 4001 - 2000))) AS BIGINT) AS sum_abs,
          |  CAST(list_max(list_transform(range(0, 16 + doc_id % 17),
          |    i -> abs((13 * doc_id + 7 * i) % 4001 - 2000))) AS INT) AS peak
          |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("media_decode_stats",
      (s, d) => Multimodal.mediaDecodeStats(s, Tables.documents(s, d)), Some(
        s"""SELECT doc_id,
           |  CAST(4 + doc_id % 5 AS INT) AS width,
           |  CAST(3 + doc_id % 4 AS INT) AS height,
           |  ${chanSumSql(7, 13, 31)} AS sum_r,
           |  ${chanSumSql(11, 17, 5)} AS sum_g,
           |  ${chanSumSql(3, 23, 29)} AS sum_b
           |FROM documents ORDER BY doc_id""".stripMargin)),
  )
}
