package graft.operators

import graft.QueryDef

/** Driver-contract wiring for the exact set-similarity joins.
  *
  * The oracle SQL here is deliberately the NAIVE formulation — the full
  * gram equi-join with no prefix filter, no length filter, no candidate
  * stage — so a hash-green result proves the Spark side's AllPairs
  * pruning is lossless, not merely self-consistent. */
object SimJoinQueries {

  /** Shared naive-exact CTE prelude over the word-3-gram shingle sets:
    * e = exploded distinct grams, sz = per-doc set sizes. */
  private val exactPrelude =
    s"""${DedupQueries.wordShinglesCte},
       |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
       |sz AS (SELECT doc_id, len(sh) AS n FROM s)""".stripMargin

  private[operators] val jaccardSql =
    s"""WITH $exactPrelude,
       |i AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
       |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT doc_a, doc_b,
       |    CAST(ni AS DOUBLE) / CAST(na.n + nb.n - ni AS DOUBLE) AS jac
       |  FROM i
       |  JOIN sz na ON na.doc_id = doc_a
       |  JOIN sz nb ON nb.doc_id = doc_b)
       |SELECT doc_a, doc_b, round(jac, 6) AS jaccard FROM j
       |WHERE jac >= 0.7 ORDER BY doc_a, doc_b""".stripMargin

  private val containmentSql =
    s"""WITH $exactPrelude,
       |i AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
       |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2),
       |c AS (
       |  SELECT doc_a, doc_b,
       |    CAST(ni AS DOUBLE) / CAST(na.n AS DOUBLE) AS ct
       |  FROM i JOIN sz na ON na.doc_id = doc_a)
       |SELECT doc_a, doc_b, round(ct, 6) AS containment FROM c
       |WHERE ct >= 0.8 ORDER BY doc_a, doc_b""".stripMargin

  private val cosineSql =
    s"""WITH $exactPrelude,
       |i AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
       |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |c AS (
       |  SELECT doc_a, doc_b, ni, na.n AS na, nb.n AS nb
       |  FROM i
       |  JOIN sz na ON na.doc_id = doc_a
       |  JOIN sz nb ON nb.doc_id = doc_b)
       |SELECT doc_a, doc_b,
       |  round(CAST(ni AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE)), 6) AS cosine
       |FROM c WHERE ni * ni * 100 >= na * nb * 49
       |ORDER BY doc_a, doc_b""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // τ = 0.7 — the SAME published threshold as near_dup_minhash, so
    // this entry doubles as the LSH operator's exact-recall audit: its
    // result is the complete ground-truth pair set the approximate
    // operator is allowed to miss from
    QueryDef("ssjoin_exact",
      (s, d) => SimJoin.jaccardJoinFromIndex(
        SharedIntermediates.wordGramIndex(s, d), 7, 10),
      Some(jaccardSql)),

    QueryDef("containment_pairs",
      (s, d) => SimJoin.containmentJoinFromIndex(
        SharedIntermediates.wordGramIndex(s, d), 4, 5),
      Some(containmentSql)),

    // binary cosine at the same τ=0.7 — always ≥ jaccard on the same
    // pair, so this result is a SUPERSET of ssjoin_exact's (spec-pinned);
    // all pruning bounds squared into pure integer arithmetic
    QueryDef("ssjoin_cosine",
      (s, d) => SimJoin.cosineJoinFromIndex(
        SharedIntermediates.wordGramIndex(s, d), 7, 10),
      Some(cosineSql)),
  )
}
