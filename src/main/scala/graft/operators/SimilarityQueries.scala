package graft.operators

import graft.{QueryDef, Tables}

/** Driver-contract wiring for similarity search. Oracle SQL mirrors the
  * Spark plans with generated left-associated 64-term chains — the same
  * IEEE operation sequence, hence bit-identical cosines. */
object SimilarityQueries {

  private val Dim = Similarity.Dim

  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)").mkString(" + ")

  private def norm2Sql(a: String): String =
    (1 to Dim).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($a[$i] AS DOUBLE)").mkString(" + ")

  private[operators] def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / (sqrt(${norm2Sql(a)}) * sqrt(${norm2Sql(b)}))"

  private def projSql(e: String, j: Int): String =
    (1 to Dim).map { i =>
      val t = s"(${Similarity.lshSigns(j)(i - 1)}.0 * CAST($e[$i] AS DOUBLE))"
      t
    }.mkString(" + ")

  private def bucketSql(e: String): String =
    (0 until Similarity.LshPlanes)
      .map(j => s"(CASE WHEN (${projSql(e, j)}) > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")

  private val annTopkSql =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
       |p AS (SELECT query_id, cand_id, round(${cosSql("qe", "ce")}, 6) AS cos_sim
       |      FROM c JOIN q ON cand_id != query_id),
       |r AS (SELECT query_id, cand_id, cos_sim,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rnk
       |      FROM p)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, cand_id, cos_sim FROM r
       |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  private val annLshSql =
    s"""WITH s AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket AS qbucket FROM s WHERE vec_id < 16),
       |p AS (SELECT query_id, s.vec_id AS cand_id,
       |        round(${cosSql("qe", "s.embedding")}, 6) AS cos_sim
       |      FROM s JOIN q ON s.bucket = qbucket AND s.vec_id != query_id),
       |r AS (SELECT query_id, cand_id, cos_sim,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rnk
       |      FROM p)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, cand_id, cos_sim FROM r
       |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin

  private val nearDupEmbSql =
    s"""WITH s0 AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
       |s AS (
       |  SELECT vec_id, embedding, bucket FROM (
       |    SELECT *, count(*) OVER (PARTITION BY bucket) AS bn FROM s0)
       |  WHERE bn <= ${Similarity.MaxLshBucket})
       |SELECT vec_a, vec_b, cos_sim FROM (
       |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       |         round(${cosSql("x.embedding", "y.embedding")}, 6) AS cos_sim
       |  FROM s x JOIN s y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
       |WHERE cos_sim >= 0.35 ORDER BY vec_a, vec_b""".stripMargin

  private val annIvfSql =
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id < 8),
       |sc AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id,
       |         round(${cosSql("e.embedding", "c.ce")}, 6) AS ccos
       |  FROM embeddings e CROSS JOIN cents c),
       |asg AS (
       |  SELECT vec_id, embedding, cent_id AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |             ORDER BY ccos DESC, cent_id ASC) AS rn FROM sc)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, cell AS qcell
       |      FROM asg WHERE vec_id < 16),
       |p AS (SELECT query_id, a.vec_id AS cand_id,
       |        round(${cosSql("qe", "a.embedding")}, 6) AS cos_sim
       |      FROM asg a JOIN q ON a.cell = qcell AND a.vec_id != query_id),
       |r AS (SELECT query_id, cand_id, cos_sim,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rnk
       |      FROM p)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, cand_id, cos_sim FROM r
       |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin

  /** Multiprobe IVF (nprobe=2): same ranked-centroid CTE; queries take
    * probe cells rn <= 2, candidates keep their rn = 1 home cell. */
  private val annIvfMultiprobeSql =
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id < 8),
       |sc AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id,
       |         round(${cosSql("e.embedding", "c.ce")}, 6) AS ccos
       |  FROM embeddings e CROSS JOIN cents c),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |           ORDER BY ccos DESC, cent_id ASC) AS rn FROM sc),
       |asg AS (
       |  SELECT vec_id, embedding, cent_id AS cell FROM ranked WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, embedding AS qe, cent_id AS qcell
       |  FROM ranked WHERE vec_id < 16 AND rn <= 2),
       |p AS (SELECT query_id, a.vec_id AS cand_id,
       |        round(${cosSql("qe", "a.embedding")}, 6) AS cos_sim
       |      FROM asg a JOIN probes ON a.cell = qcell AND a.vec_id != query_id),
       |r AS (SELECT query_id, cand_id, cos_sim,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rnk
       |      FROM p)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, cand_id, cos_sim FROM r
       |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin

  /** Quantized dot/norm chains over the DuckDB-side quantized list `qv`
    * (same left-associated order as the Spark reduce). */
  private def qdotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"$a[$i]*$b[$i]").mkString(" + ")

  private def qnorm2Sql(a: String): String =
    (1 to Dim).map(i => s"$a[$i]*$a[$i]").mkString(" + ")

  private val annQuantizedSql =
    s"""WITH m AS (
       |  SELECT vec_id,
       |    list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) AS max_abs,
       |    embedding
       |  FROM embeddings),
       |b AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> floor(CAST(x AS DOUBLE) * (127.0 / max_abs) + 0.5)) AS qv
       |  FROM m WHERE max_abs > 0),
       |q AS (SELECT vec_id AS query_id, qv AS qa FROM b WHERE vec_id < 8),
       |p AS (SELECT query_id, b.vec_id AS cand_id,
       |        round((${qdotSql("qa", "qv")})
       |          / (sqrt(${qnorm2Sql("qa")}) * sqrt(${qnorm2Sql("qv")})), 6) AS qcos
       |      FROM b JOIN q ON b.vec_id != query_id),
       |r AS (SELECT query_id, cand_id, qcos,
       |        row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, cand_id) AS rnk
       |      FROM p)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, cand_id, qcos FROM r
       |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  private val embStatsSql =
    s"""SELECT label, count(*) AS n_vectors,
       |  CAST(sum(CAST(round(sqrt(${norm2Sql("embedding")}), 6) AS DECIMAL(18,6))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS avg_norm
       |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ann_topk",
      (s, d) => Similarity.bruteForceTopK(Tables.embeddings(s, d), 8, 5),
      Some(annTopkSql)),
    QueryDef("ann_lsh_topk",
      (s, d) => Similarity.lshTopK(Tables.embeddings(s, d), 16, 3),
      Some(annLshSql)),
    QueryDef("ann_ivf_topk",
      (s, d) => Similarity.ivfTopK(Tables.embeddings(s, d), 8, 16, 3),
      Some(annIvfSql)),
    QueryDef("ann_ivf_multiprobe",
      (s, d) => Similarity.ivfTopKProbed(Tables.embeddings(s, d), 8, 16, 3, 2),
      Some(annIvfMultiprobeSql)),
    QueryDef("ann_quantized_topk",
      (s, d) => Similarity.quantizedTopK(Tables.embeddings(s, d), 8, 5),
      Some(annQuantizedSql)),
    QueryDef("near_dup_embedding",
      (s, d) => Similarity.embeddingNearDup(Tables.embeddings(s, d), 0.35),
      Some(nearDupEmbSql)),
    QueryDef("embedding_stats",
      (s, d) => Similarity.embeddingStats(Tables.embeddings(s, d)),
      Some(embStatsSql)),
  )
}
