package graft.operators

import graft.QueryDef

/** Driver-contract wiring for the inverted-index search family. All
  * three entries probe the SHARED durable postings index
  * ([[SharedIntermediates.postings]]); the oracles recompute from the
  * raw documents table, so hash-green results prove the index serves
  * exactly what a fresh corpus scan would. */
object SearchQueries {

  /** Tokenized documents as a positional list — the DuckDB twin of the
    * postings index (1-based list positions; the Spark side reports
    * 1-based positions for parity). */
  private val tokCte =
    """t AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z'']+') AS w
      |  FROM documents)""".stripMargin

  private val phraseSql =
    s"""WITH $tokCte,
       |g AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
       |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gg
       |  FROM t WHERE len(w) >= 3),
       |top AS (
       |  SELECT gg AS phrase FROM g GROUP BY gg
       |  ORDER BY count(*) DESC, gg ASC LIMIT 1),
       |o AS (
       |  SELECT doc_id, phrase, unnest(list_filter(range(1, len(w) - 1),
       |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] = phrase)) AS pos
       |  FROM t, top WHERE len(w) >= 3)
       |SELECT doc_id, phrase, count(*) AS n_occurrences,
       |       min(pos) AS first_pos, max(pos) AS last_pos
       |FROM o GROUP BY doc_id, phrase ORDER BY doc_id""".stripMargin

  /** tf CTEs over a filtered document set — `where` = TRUE is the full
    * corpus; the tombstone oracle passes the post-delete predicate so
    * the driver gate itself pins serve-time deletes against a full
    * rebuild on the post-delete corpus. */
  private def tfCtesOver(where: String) =
    s"""tok AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS term
       |  FROM documents WHERE $where),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2)""".stripMargin

  private val tfCtes = tfCtesOver("TRUE")

  private val keywordSql =
    s"""WITH $tfCtes,
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |q AS (SELECT term, df FROM dft ORDER BY df DESC, term ASC LIMIT 3 OFFSET 9),
       |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
       |wt AS (
       |  SELECT term,
       |    CAST(floor((1000000.0 * (n_docs - df + 0.5)) / (df + 0.5)) AS BIGINT) AS w
       |  FROM q, n),
       |sc AS (
       |  SELECT doc_id, CAST(sum(tf * w) AS BIGINT) AS score_micro,
       |         count(*) AS n_terms_matched, CAST(sum(tf) AS BIGINT) AS total_tf
       |  FROM tf JOIN wt USING (term) GROUP BY doc_id)
       |SELECT doc_id, score_micro, n_terms_matched, total_tf
       |FROM sc ORDER BY score_micro DESC, doc_id ASC LIMIT 20""".stripMargin

  private val bm25Sql =
    s"""WITH $tfCtes,
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |q AS (SELECT term, df FROM dft ORDER BY df DESC, term ASC LIMIT 3 OFFSET 9),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |w AS (
       |  SELECT t.doc_id, t.tf,
       |    CAST(floor((1000000.0 * ln(((st.n_docs - q.df + 0.5) / (q.df + 0.5)) + 1.0)) *
       |         ((t.tf * 2.2) / (t.tf + (1.2 * (0.25 + (0.75 * (d.dl / st.avgdl))))))) AS BIGINT) AS w
       |  FROM tf t JOIN q USING (term) JOIN dl d ON d.doc_id = t.doc_id
       |  CROSS JOIN st),
       |sc AS (
       |  SELECT doc_id, CAST(sum(w) AS BIGINT) AS score_micro,
       |         count(*) AS n_terms_matched, CAST(sum(tf) AS BIGINT) AS total_tf
       |  FROM w GROUP BY doc_id)
       |SELECT doc_id, score_micro, n_terms_matched, total_tf
       |FROM sc ORDER BY score_micro DESC, doc_id ASC LIMIT 20""".stripMargin

  /** Explicit-query twins (round 9): the same scorers over a CALLER
    * query — three in-vocabulary terms plus one OOV term, pinning the
    * graceful-degradation semantics (OOV contributes nothing) in the
    * oracle, not just the spec. */
  private val explicitTerms = "('data', 'query', 'spark', 'nosuchword')"

  private val keywordExplicitSql =
    s"""WITH $tfCtes,
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |q AS (SELECT term, df FROM dft WHERE term IN $explicitTerms),
       |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
       |wt AS (
       |  SELECT term,
       |    CAST(floor((1000000.0 * (n_docs - df + 0.5)) / (df + 0.5)) AS BIGINT) AS w
       |  FROM q, n),
       |sc AS (
       |  SELECT doc_id, CAST(sum(tf * w) AS BIGINT) AS score_micro,
       |         count(*) AS n_terms_matched, CAST(sum(tf) AS BIGINT) AS total_tf
       |  FROM tf JOIN wt USING (term) GROUP BY doc_id)
       |SELECT doc_id, score_micro, n_terms_matched, total_tf
       |FROM sc ORDER BY score_micro DESC, doc_id ASC LIMIT 20""".stripMargin

  /** BM25 over an explicit IN-list of terms (shared by the explicit
    * probe and the NDCG evaluation oracle). */
  private def bm25SqlFor(termsIn: String): String =
    bm25SqlOver(termsIn, "TRUE")

  private def bm25SqlOver(termsIn: String, docsWhere: String): String =
    s"""WITH ${tfCtesOver(docsWhere)},
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |q AS (SELECT term, df FROM dft WHERE term IN $termsIn),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |w AS (
       |  SELECT t.doc_id, t.tf,
       |    CAST(floor((1000000.0 * ln(((st.n_docs - q.df + 0.5) / (q.df + 0.5)) + 1.0)) *
       |         ((t.tf * 2.2) / (t.tf + (1.2 * (0.25 + (0.75 * (d.dl / st.avgdl))))))) AS BIGINT) AS w
       |  FROM tf t JOIN q USING (term) JOIN dl d ON d.doc_id = t.doc_id
       |  CROSS JOIN st),
       |sc AS (
       |  SELECT doc_id, CAST(sum(w) AS BIGINT) AS score_micro,
       |         count(*) AS n_terms_matched, CAST(sum(tf) AS BIGINT) AS total_tf
       |  FROM w GROUP BY doc_id)
       |SELECT doc_id, score_micro, n_terms_matched, total_tf
       |FROM sc ORDER BY score_micro DESC, doc_id ASC LIMIT 20""".stripMargin

  private val bm25ExplicitSql = bm25SqlFor(explicitTerms)

  /** Diversified-search oracle: the explicit-query BM25 score table
    * collapsed to one row per near-dup cluster (the recursive-closure
    * clusters of the dedup family — CTE names are disjoint from the
    * tf/scoring chain by construction). */
  private val bm25DedupSql =
    s"""WITH RECURSIVE ${DedupQueries.clustersCtes},
       |$tfCtes,
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |q AS (SELECT term, df FROM dft WHERE term IN $explicitTerms),
       |dlx AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlx),
       |w AS (
       |  SELECT t.doc_id, t.tf,
       |    CAST(floor((1000000.0 * ln(((st.n_docs - q.df + 0.5) / (q.df + 0.5)) + 1.0)) *
       |         ((t.tf * 2.2) / (t.tf + (1.2 * (0.25 + (0.75 * (d.dl / st.avgdl))))))) AS BIGINT) AS w
       |  FROM tf t JOIN q USING (term) JOIN dlx d ON d.doc_id = t.doc_id
       |  CROSS JOIN st),
       |sc AS (
       |  SELECT doc_id, CAST(sum(w) AS BIGINT) AS score_micro,
       |         count(*) AS n_terms_matched, CAST(sum(tf) AS BIGINT) AS total_tf
       |  FROM w GROUP BY doc_id),
       |scc AS (
       |  SELECT sc.doc_id, coalesce(lab.cluster_id, sc.doc_id) AS cluster_id,
       |         sc.score_micro, sc.n_terms_matched, sc.total_tf
       |  FROM sc LEFT JOIN lab ON lab.doc_id = sc.doc_id),
       |rk AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY score_micro DESC, doc_id ASC) AS rn,
       |    count(*) OVER (PARTITION BY cluster_id) AS n_collapsed
       |  FROM scc)
       |SELECT doc_id, cluster_id, score_micro, n_terms_matched, total_tf,
       |       n_collapsed
       |FROM rk WHERE rn = 1
       |ORDER BY score_micro DESC, doc_id ASC LIMIT 20""".stripMargin

  /** MMR oracle: the explicit-query BM25 chain feeds a rank-linear
    * relevance table; candidate-pair word-3-gram Jaccard in ppm; the
    * kSel greedy rounds unroll as MATERIALIZED CTEs (round r reads
    * every earlier round — the pcaPowerSql unrolled-loop rule).
    * λ, the rank step, and the candidate cut interpolate the
    * operator's [[Search.MmrLambdaPermille]]/[[Search.MmrRankStepPpm]]/
    * [[Search.MmrKCand]] constants (advisor r12: hardcoded 500/50000/20
    * literals would silently diverge plan from oracle if the query were
    * ever registered with non-default arguments). */
  private def mmrSql(kSel: Int = 5): String = {
    val lam = Search.MmrLambdaPermille
    val lamC = 1000L - lam
    val step = Search.MmrRankStepPpm
    val kCand = Search.MmrKCand
    val rounds = (2 to kSel).map { r =>
      val selUnion = (1 until r)
        .map(i => s"SELECT doc_id FROM s$i").mkString(" UNION ALL ")
      s"""s$r AS MATERIALIZED (
         |  SELECT CAST($r AS BIGINT) AS pick, c.doc_id, c.rank, c.rel_ppm,
         |    CAST(coalesce(mx.ms, 0) AS BIGINT) AS maxsim_ppm,
         |    CAST($lam * c.rel_ppm - $lamC * coalesce(mx.ms, 0) AS BIGINT) AS mmr
         |  FROM r0 c
         |  LEFT JOIN (SELECT sm.da AS doc_id, CAST(max(sm.sim_ppm) AS BIGINT) AS ms
         |             FROM sm JOIN ($selUnion) sel ON sel.doc_id = sm.db
         |             GROUP BY 1) mx ON mx.doc_id = c.doc_id
         |  WHERE c.doc_id NOT IN ($selUnion)
         |  ORDER BY mmr DESC, c.doc_id ASC LIMIT 1),""".stripMargin
    }.mkString("\n")
    val allRounds = (1 to kSel)
      .map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH $tfCtes,
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |q AS (SELECT term, df FROM dft WHERE term IN $explicitTerms),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |w AS (
       |  SELECT t.doc_id, t.tf,
       |    CAST(floor((1000000.0 * ln(((st.n_docs - q.df + 0.5) / (q.df + 0.5)) + 1.0)) *
       |         ((t.tf * 2.2) / (t.tf + (1.2 * (0.25 + (0.75 * (d.dl / st.avgdl))))))) AS BIGINT) AS w
       |  FROM tf t JOIN q USING (term) JOIN dl d ON d.doc_id = t.doc_id
       |  CROSS JOIN st),
       |sc AS (
       |  SELECT doc_id, CAST(sum(w) AS BIGINT) AS score_micro,
       |         count(*) AS n_terms_matched, CAST(sum(tf) AS BIGINT) AS total_tf
       |  FROM w GROUP BY doc_id),
       |cnd AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC)
       |         AS BIGINT) AS rank
       |  FROM sc QUALIFY rank <= $kCand),
       |r0 AS (SELECT doc_id, rank,
       |         CAST(1000000 - (rank - 1) * $step AS BIGINT) AS rel_ppm
       |       FROM cnd),
       |tw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z'']+') AS w2
       |       FROM documents WHERE doc_id IN (SELECT doc_id FROM cnd)),
       |cg AS (SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(1, len(w2) - 1),
       |           i -> w2[i] || ' ' || w2[i+1] || ' ' || w2[i+2])) AS g2
       |       FROM tw WHERE len(w2) >= 3),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS szz FROM cg GROUP BY 1),
       |ps AS (SELECT x.doc_id AS da, y.doc_id AS db, CAST(count(*) AS BIGINT) AS ni
       |       FROM cg x JOIN cg y ON x.g2 = y.g2 AND x.doc_id <> y.doc_id
       |       GROUP BY 1, 2),
       |sm AS (SELECT da, db, (ni * 1000000) // (sa.szz + sb.szz - ni) AS sim_ppm
       |       FROM ps JOIN sz sa ON sa.doc_id = ps.da
       |               JOIN sz sb ON sb.doc_id = ps.db),
       |s1 AS MATERIALIZED (
       |  SELECT CAST(1 AS BIGINT) AS pick, doc_id, rank, rel_ppm,
       |    CAST(0 AS BIGINT) AS maxsim_ppm,
       |    CAST($lam * rel_ppm AS BIGINT) AS mmr
       |  FROM r0 ORDER BY mmr DESC, doc_id ASC LIMIT 1),
       |$rounds
       |fin AS ($allRounds)
       |SELECT pick, doc_id, rank, rel_ppm, maxsim_ppm, mmr
       |FROM fin ORDER BY pick""".stripMargin
  }

  /** NDCG@20 oracle: same literal gain table as the plan (generated
    * from the one Scala source [[Search.ndcgGains]]), relevance = docs
    * containing ALL three terms, ranking = the BM25 leg above. */
  private val ndcgSql: String = {
    val gainRows = Search.ndcgGains(20).zipWithIndex
      .map { case (g, i) => s"(${i + 1}, $g)" }.mkString(", ")
    s"""WITH ranked AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS pos
       |  FROM (${bm25SqlFor("('dup', 'vector', 'key')")})),
       |$tfCtes,
       |rel AS (
       |  SELECT doc_id FROM tf WHERE term IN ('dup', 'vector', 'key')
       |  GROUP BY doc_id HAVING count(DISTINCT term) = 3),
       |gains(pos, g) AS (VALUES $gainRows),
       |nrel AS (SELECT CAST(count(*) AS BIGINT) AS n_relevant FROM rel),
       |dcg AS (
       |  SELECT CAST(coalesce(sum(g), 0) AS BIGINT) AS dcg_micro,
       |         CAST(count(*) AS BIGINT) AS n_retrieved_relevant
       |  FROM ranked JOIN rel USING (doc_id) JOIN gains ON gains.pos = ranked.pos),
       |idcg AS (
       |  SELECT CAST(sum(g) AS BIGINT) AS idcg_micro
       |  FROM gains, nrel WHERE pos <= least(20, greatest(n_relevant, 1)))
       |SELECT n_relevant, n_retrieved_relevant, dcg_micro, idcg_micro,
       |       dcg_micro * 1000 // idcg_micro AS ndcg_permille
       |FROM dcg, idcg, nrel""".stripMargin
  }

  /** 2-token explicit phrase — exercises the generalized posting-leg
    * fold at n=2 (the corpus-derived probe covers n=3). */
  private val phraseExplicitSql =
    s"""WITH $tokCte,
       |o AS (
       |  SELECT doc_id, unnest(list_filter(range(1, len(w)),
       |         i -> w[i] = 'data' AND w[i+1] = 'stream')) AS pos
       |  FROM t WHERE len(w) >= 2)
       |SELECT doc_id, 'data stream' AS phrase, count(*) AS n_occurrences,
       |       min(pos) AS first_pos, max(pos) AS last_pos
       |FROM o GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val indexStatsSql =
    s"""WITH $tfCtes,
       |st AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf FROM tf GROUP BY term)
       |SELECT term, df, total_tf FROM st
       |ORDER BY df DESC, term ASC LIMIT 20""".stripMargin

  /** RRF fusion of the two ranked legs — each leg's full oracle nests
    * as a subquery (its own WITH scope), ranks from the identical
    * deterministic (score DESC, doc_id ASC) order, contributions in
    * pure integer division. */
  private val hybridSql =
    s"""WITH ka AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS r
       |  FROM ($keywordSql)),
       |kb AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS r
       |  FROM ($bm25Sql)),
       |u AS (
       |  SELECT doc_id, r, 'kw' AS leg FROM ka
       |  UNION ALL
       |  SELECT doc_id, r, 'bm25' AS leg FROM kb)
       |SELECT doc_id,
       |  CAST(sum(1000000 // (60 + r)) AS BIGINT) AS rrf_micro,
       |  count(*) AS n_legs,
       |  CAST(coalesce(min(CASE WHEN leg = 'kw' THEN r END), 999) AS BIGINT) AS kw_rank,
       |  CAST(coalesce(min(CASE WHEN leg = 'bm25' THEN r END), 999) AS BIGINT) AS bm25_rank
       |FROM u GROUP BY doc_id
       |ORDER BY rrf_micro DESC, doc_id ASC LIMIT 20""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("phrase_search",
      (s, d) => Search.phraseSearch(SharedIntermediates.postings(s, d)),
      Some(phraseSql)),

    QueryDef("keyword_search",
      (s, d) => Search.keywordSearch(SharedIntermediates.postings(s, d)),
      Some(keywordSql)),

    QueryDef("bm25_search",
      (s, d) => Search.bm25Search(SharedIntermediates.postings(s, d),
        dl = Some(SharedIntermediates.postingsDocLengths(s, d))),
      Some(bm25Sql)),

    QueryDef("keyword_search_explicit",
      (s, d) => Search.keywordSearchFor(SharedIntermediates.postings(s, d),
        Seq("data", "query", "spark", "nosuchword"),
        dl = Some(SharedIntermediates.postingsDocLengths(s, d))),
      Some(keywordExplicitSql)),

    QueryDef("bm25_search_explicit",
      (s, d) => Search.bm25SearchFor(SharedIntermediates.postings(s, d),
        Seq("data", "query", "spark", "nosuchword"),
        dl = Some(SharedIntermediates.postingsDocLengths(s, d))),
      Some(bm25ExplicitSql)),

    // graded diversification: MMR greedy rerank of the explicit-query
    // top-20 (λ·rank-relevance − (1−λ)·max word-3-gram Jaccard to the
    // already-picked set), 5 unrolled integer rounds on both engines
    QueryDef("mmr_rerank",
      (s, d) => Search.mmrRerank(graft.Tables.documents(s, d),
        SharedIntermediates.postings(s, d),
        Seq("data", "query", "spark", "nosuchword"),
        dl = Some(SharedIntermediates.postingsDocLengths(s, d))),
      Some(mmrSql())),

    // diversified search: the same explicit-query ranking collapsed to
    // one result per near-dup cluster (cluster map = the dedup
    // family's shared recursive-closure clusters) BEFORE the top-k cut
    QueryDef("bm25_search_dedup",
      (s, d) => Search.bm25SearchDedupFor(SharedIntermediates.postings(s, d),
        Seq("data", "query", "spark", "nosuchword"),
        SharedIntermediates.textClusters(s, d),
        dl = Some(SharedIntermediates.postingsDocLengths(s, d))),
      Some(bm25DedupSql)),

    // probe over base+delta union vs a FULL-CORPUS rebuild oracle: the
    // driver gate itself proves the incremental-maintenance identity
    // (dl deliberately recomputed from the served view — the fresh-delta
    // path where the precomputed table hasn't been compacted in yet)
    QueryDef("bm25_search_incremental",
      (s, d) => Search.bm25SearchFor(
        SharedIntermediates.postingsIncremental(s, d),
        Seq("data", "stream", "key")),
      Some(bm25SqlFor("('data', 'stream', 'key')"))),

    // the PRODUCTION incremental serving shape: durable base + durable
    // base doc-lengths, delta-only build per serve — the bench measures
    // maintenance cost, not rebuild cost (the _incremental twin above
    // deliberately benches the rebuild path; r10 verdict item 3)
    QueryDef("bm25_search_served",
      (s, d) => {
        val (idx, dl) = SharedIntermediates.postingsIncrementalServed(s, d)
        Search.bm25SearchFor(idx, Seq("vector", "window", "merge"),
          dl = Some(dl))
      },
      Some(bm25SqlFor("('vector', 'window', 'merge')"))),

    // serve-time DELETES: base postings + base dl anti-joined against a
    // deterministic tombstone batch (base docs with doc_id ≡ 3 mod 7),
    // newest delta unaffected (LSM semantics). The oracle is the full
    // rebuild on the post-delete corpus — hash equality IS the delete
    // identity. Same query terms as _incremental, so the two results
    // directly show the deletions re-ranking the corpus.
    QueryDef("bm25_search_tombstoned",
      (s, d) => {
        val (idx, dl) = SharedIntermediates.postingsTombstoned(s, d)
        Search.bm25SearchFor(idx, Seq("data", "stream", "key"),
          dl = Some(dl))
      },
      Some(bm25SqlOver("('data', 'stream', 'key')",
        "NOT (doc_id % 10 < 9 AND doc_id % 7 = 3)"))),

    QueryDef("phrase_search_explicit",
      (s, d) => Search.phraseSearchFor(SharedIntermediates.postings(s, d),
        "data stream"),
      Some(phraseExplicitSql)),

    QueryDef("search_eval_ndcg",
      (s, d) => Search.searchEvalNdcg(SharedIntermediates.postings(s, d),
        // 'dup' is the rare discriminative term (df 25 of 500 at
        // sf0.01): relevance does not saturate the top-20, so the
        // metric measures ranking quality, not term ubiquity
        Seq("dup", "vector", "key"),
        dl = Some(SharedIntermediates.postingsDocLengths(s, d))),
      Some(ndcgSql)),

    QueryDef("inverted_index_stats",
      (s, d) => Search.indexStats(SharedIntermediates.postings(s, d)),
      Some(indexStatsSql)),

    QueryDef("hybrid_search_rrf",
      (s, d) => Search.hybridSearchRrf(SharedIntermediates.postings(s, d),
        dl = Some(SharedIntermediates.postingsDocLengths(s, d))),
      Some(hybridSql)),
  )
}
