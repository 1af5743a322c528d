package graft.operators

import graft.{QueryDef, Tables}

/** Driver-contract wiring for multimodal plumbing. `media_features` has
  * no SQL oracle (the stub decoder is imperative) → rows-only check. */
object MultimodalQueries {
  val defs: Seq[QueryDef] = Seq(
    QueryDef("media_meta",
      (s, d) => Multimodal.mediaMeta(Tables.documents(s, d)), Some(
        """SELECT doc_id,
          |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
          |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("media_features",
      (s, d) => Multimodal.mediaFeatures(s, Tables.documents(s, d)), None),
  )
}
