package graft.operators

import graft.{QueryDef, Tables}

/** Driver-contract wiring for the pipeline suite (chunking, vocab
  * pruning, novelty, gap-fill, rolling windows). DuckDB list slicing is
  * 1-based and end-inclusive: `w[i : i+k-1]` ≡ Spark `slice(w, i, k)`. */
object PipelineQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("doc_chunks",
      (s, d) => Pipeline.docChunks(Tables.documents(s, d)), Some(
        """WITH t AS (
          |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z'']+') AS w
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, CAST((i - 1) / 24 AS BIGINT) AS chunk_id,
          |         w[i : i + 31] AS ck
          |  FROM t, unnest(generate_series(1, len(w), 24)) AS gs(i)
          |  WHERE len(w) > 0)
          |SELECT doc_id, chunk_id,
          |  CAST(len(ck) AS BIGINT) AS n_chunk_tokens,
          |  array_to_string(ck, ' ') AS chunk
          |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    QueryDef("vocab_prune",
      (s, d) => Pipeline.vocabPrune(Tables.documents(s, d)), Some(
        """WITH per_doc AS (
          |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS token
          |  FROM documents),
          |df AS (SELECT token, count(*) AS doc_freq FROM per_doc GROUP BY token)
          |SELECT token, doc_freq FROM df
          |WHERE doc_freq >= 2
          |  AND CAST(doc_freq AS DOUBLE) <=
          |      CAST((SELECT count(*) FROM documents) AS DOUBLE) * 0.5
          |ORDER BY token""".stripMargin)),

    QueryDef("bigram_novelty",
      (s, d) => Pipeline.bigramNovelty(Tables.documents(s, d)), Some(
        """WITH t AS (
          |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z'']+') AS w
          |  FROM documents),
          |g AS (
          |  SELECT DISTINCT doc_id,
          |    array_to_string(w[i : i + 1], ' ') AS g
          |  FROM t, unnest(generate_series(1, len(w) - 1, 1)) AS gs(i)
          |  WHERE len(w) >= 2),
          |df AS (SELECT g, count(*) AS gram_df FROM g GROUP BY g)
          |SELECT doc_id, count(*) AS n_bigrams,
          |  CAST(sum(CASE WHEN gram_df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
          |  round(CAST(sum(CASE WHEN gram_df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
          |        / CAST(count(*) AS DOUBLE), 6) AS novelty
          |FROM g JOIN df USING (g)
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    QueryDef("gap_fill_counts",
      (s, d) => Pipeline.gapFillCounts(Tables.events(s, d)), Some(
        """WITH b AS (
          |  SELECT event_type,
          |    to_timestamp(CAST(floor(epoch_ms(ts) / 900000.0) AS BIGINT) * 900) AS bucket
          |  FROM events),
          |counts AS (
          |  SELECT event_type, bucket, count(*) AS n FROM b GROUP BY 1, 2),
          |bounds AS (SELECT min(bucket) AS b_min, max(bucket) AS b_max FROM b),
          |axis AS (
          |  SELECT t.event_type, unnest(generate_series(b_min, b_max, INTERVAL 900 SECOND)) AS bucket
          |  FROM bounds, (SELECT DISTINCT event_type FROM events) t)
          |SELECT a.event_type, CAST(a.bucket AS TIMESTAMP) AS bucket,
          |  CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
          |FROM axis a LEFT JOIN counts c
          |  ON a.event_type = c.event_type AND a.bucket = c.bucket
          |ORDER BY 1, 2""".stripMargin)),

    QueryDef("rolling_hour",
      (s, d) => Pipeline.rollingHour(Tables.events(s, d)), Some(
        """SELECT event_id, user_id,
          |  CAST(count(*) OVER w AS BIGINT) AS n_in_hour,
          |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_val_hour
          |FROM (SELECT event_id, user_id, value, epoch_ms(ts) AS ms FROM events)
          |WINDOW w AS (PARTITION BY user_id ORDER BY ms
          |             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)),

    QueryDef("knn_classify",
      (s, d) => Pipeline.knnClassify(Tables.embeddings(s, d)), Some(
        s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS true_label
           |           FROM embeddings WHERE vec_id < 32),
           |c AS (SELECT vec_id AS cand_id, embedding AS ce, label AS cand_label
           |      FROM embeddings WHERE vec_id >= 32),
           |p AS (SELECT query_id, true_label, cand_id, cand_label,
           |        round(${SimilarityQueries.cosSql("qe", "ce")}, 6) AS cos_sim
           |      FROM c CROSS JOIN q),
           |r AS (SELECT query_id, true_label, cand_label,
           |        row_number() OVER (PARTITION BY query_id
           |                           ORDER BY cos_sim DESC, cand_id) AS rnk
           |      FROM p),
           |v AS (SELECT query_id, true_label, cand_label, count(*) AS n_votes
           |      FROM r WHERE rnk <= 5 GROUP BY 1, 2, 3),
           |w AS (SELECT query_id, true_label, cand_label AS pred_label, n_votes,
           |        row_number() OVER (PARTITION BY query_id
           |                           ORDER BY n_votes DESC, cand_label) AS vr
           |      FROM v)
           |SELECT query_id, true_label, pred_label, n_votes
           |FROM w WHERE vr = 1 ORDER BY query_id""".stripMargin)),

    QueryDef("scd2_history",
      (s, d) => Pipeline.scd2History(Tables.events(s, d)), Some(
        """WITH o AS (
          |  SELECT user_id, ts, event_id, event_type,
          |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          |  FROM events),
          |f AS (
          |  SELECT user_id, ts, event_type,
          |    CAST(sum(CASE WHEN prev_type IS NULL OR prev_type <> event_type
          |                  THEN 1 ELSE 0 END)
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS period_id
          |  FROM o),
          |p AS (
          |  SELECT user_id, period_id, min(event_type) AS event_type,
          |    min(ts) AS valid_from, count(*) AS n_events
          |  FROM f GROUP BY user_id, period_id)
          |SELECT user_id, period_id, event_type, valid_from,
          |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY period_id) AS valid_to,
          |  n_events
          |FROM p ORDER BY user_id, period_id""".stripMargin)),

    QueryDef("corr_price_items",
      (s, d) => Pipeline.priceItemsCorr(s, d), Some(
        """WITH items AS (
          |  SELECT l_orderkey, count(*) AS x FROM lineitem GROUP BY l_orderkey),
          |j AS (
          |  SELECT x, CAST(o_totalprice AS DECIMAL(18,2)) AS y
          |  FROM orders JOIN items ON o_orderkey = l_orderkey),
          |sums AS (
          |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
          |    sum(x * y) AS sxy, sum(x * x) AS sx2, sum(y * y) AS sy2
          |  FROM j)
          |SELECT n AS n_orders,
          |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |    / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
          |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |       * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
          |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_r,
          |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |    / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
          |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope
          |FROM sums""".stripMargin)),

    QueryDef("revenue_share",
      (s, d) => Pipeline.revenueShare(s, d), Some(
        """WITH rev AS (
          |  SELECT n_name,
          |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
          |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS revenue_dec
          |  FROM lineitem
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN nation ON c_nationkey = n_nationkey
          |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          |    AND o_orderdate < TIMESTAMP '1998-01-01'
          |  GROUP BY n_name)
          |SELECT n_name, CAST(revenue_dec AS DOUBLE) AS revenue,
          |  round(CAST(revenue_dec AS DOUBLE)
          |        / (SELECT CAST(sum(revenue_dec) AS DOUBLE) FROM rev), 6) AS share
          |FROM rev ORDER BY share DESC, n_name""".stripMargin)),

    QueryDef("cumulative_users",
      (s, d) => Pipeline.cumulativeUsers(Tables.events(s, d)), Some(
        """WITH fs AS (
          |  SELECT user_id, min(date_trunc('day', ts)) AS first_day
          |  FROM events GROUP BY user_id),
          |nd AS (SELECT first_day, count(*) AS new_users FROM fs GROUP BY first_day)
          |SELECT first_day AS day, new_users,
          |  CAST(sum(new_users) OVER (ORDER BY first_day
          |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
          |FROM nd ORDER BY day""".stripMargin)),

    QueryDef("fuzzy_name_pairs",
      (s, d) => Pipeline.fuzzyNamePairs(s, d), Some(
        """SELECT a.p_brand, count(*) AS n_pairs,
          |  CAST(min(levenshtein(a.p_name, b.p_name)) AS INT) AS min_dist
          |FROM part a JOIN part b
          |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
          |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
          |GROUP BY a.p_brand ORDER BY a.p_brand""".stripMargin)),

    QueryDef("retention_cohorts",
      (s, d) => Pipeline.retentionCohorts(Tables.events(s, d)), Some(
        """WITH fs AS (
          |  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
          |  FROM events GROUP BY user_id)
          |SELECT cohort_day,
          |  CAST(date_diff('day', cohort_day, date_trunc('day', ts)) AS BIGINT) AS day_offset,
          |  count(DISTINCT e.user_id) AS n_active
          |FROM events e JOIN fs ON e.user_id = fs.user_id
          |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin)),

    QueryDef("set_ops_all",
      (s, d) => Pipeline.setOpsAll(s, d), Some(
        """WITH y97 AS (SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1997),
          |y98 AS (SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1998),
          |tagged AS (
          |  SELECT 'intersect_all' AS op, o_orderpriority
          |  FROM (SELECT * FROM y97 INTERSECT ALL SELECT * FROM y98)
          |  UNION ALL
          |  SELECT 'except_all' AS op, o_orderpriority
          |  FROM (SELECT * FROM y97 EXCEPT ALL SELECT * FROM y98))
          |SELECT op, o_orderpriority, count(*) AS n
          |FROM tagged GROUP BY 1, 2 ORDER BY op, o_orderpriority""".stripMargin)),

    QueryDef("null_funcs",
      (s, d) => Pipeline.nullFuncs(s, d), Some(
        """SELECT l_returnflag, count(*) AS n_rows,
          |  CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc,
          |  CAST(sum(CASE WHEN coalesce(nullif(l_discount, 0.0), -1.0) = -1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_coalesced,
          |  CAST(sum(CASE WHEN l_discount IS NOT DISTINCT FROM l_tax THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef("lateral_top2_orders",
      (s, d) => Pipeline.lateralTop2Orders(s, d), Some(
        """SELECT c_custkey, t.o_orderkey, t.o_totalprice
          |FROM customer,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
          |         WHERE o_custkey = c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)),

    // robust twin of daily_anomalies: exact order-statistic median/MAD
    // per type over the (bounded) day grain, NULL on MAD=0 degenerates
    QueryDef("mad_anomalies",
      (s, d) => Pipeline.madAnomalies(Tables.events(s, d)), Some(
        """WITH daily AS (
          |  SELECT event_type, date_trunc('day', ts) AS day,
          |         CAST(count(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |med AS (
          |  SELECT event_type, ls[CAST((len(ls) + 1) // 2 AS INT)] AS med
          |  FROM (SELECT event_type, list_sort(list(n)) AS ls
          |        FROM daily GROUP BY 1) t),
          |dev AS (
          |  SELECT d.event_type, d.day, d.n, m.med, abs(d.n - m.med) AS ad
          |  FROM daily d JOIN med m USING (event_type)),
          |mad AS (
          |  SELECT event_type, ls[CAST((len(ls) + 1) // 2 AS INT)] AS mad
          |  FROM (SELECT event_type, list_sort(list(ad)) AS ls
          |        FROM dev GROUP BY 1) t)
          |SELECT d.event_type, d.day, d.n, d.med, a.mad,
          |  CASE WHEN a.mad = 0 THEN CAST(NULL AS BIGINT)
          |       ELSE (1000 * d.ad) // a.mad END AS mad_score_permille,
          |  CASE WHEN a.mad = 0 THEN CAST(NULL AS BOOLEAN)
          |       ELSE d.ad > 3 * a.mad END AS is_outlier
          |FROM dev d JOIN mad a USING (event_type)
          |ORDER BY d.event_type, d.day""".stripMargin)),

    QueryDef("daily_anomalies",
      (s, d) => Pipeline.dailyAnomalies(Tables.events(s, d)), Some(
        """WITH daily AS (
          |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |stats AS (
          |  SELECT event_type, mean_n, sqrt(var_n) AS std_n FROM (
          |    SELECT event_type,
          |      CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_n,
          |      (CAST(sum(n * n) AS DOUBLE) - CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)
          |       / CAST(count(*) AS DOUBLE)) / (CAST(count(*) AS DOUBLE) - 1.0) AS var_n
          |    FROM daily GROUP BY event_type HAVING count(*) > 1)
          |  WHERE var_n > 0)
          |SELECT d.event_type, d.day, d.n,
          |  round((CAST(d.n AS DOUBLE) - s.mean_n) / s.std_n, 6) AS z
          |FROM daily d JOIN stats s ON d.event_type = s.event_type
          |WHERE abs((CAST(d.n AS DOUBLE) - s.mean_n) / s.std_n) > 2.0
          |ORDER BY d.event_type, d.day""".stripMargin)),

    QueryDef("token_cooccurrence",
      (s, d) => Pipeline.tokenCooccurrence(Tables.documents(s, d)), Some(
        """WITH toks AS (
          |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS token
          |  FROM documents),
          |freq AS (
          |  SELECT token FROM toks GROUP BY token
          |  ORDER BY count(*) DESC, token LIMIT 20),
          |ft AS (SELECT doc_id, token FROM toks WHERE token IN (SELECT token FROM freq))
          |SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS n_docs
          |FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.token < b.token
          |GROUP BY 1, 2
          |ORDER BY n_docs DESC, tok_a, tok_b LIMIT 30""".stripMargin)),

    QueryDef("token_pmi",
      (s, d) => Pipeline.tokenPmi(Tables.documents(s, d)), Some(
        """WITH toks AS (
          |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS token
          |  FROM documents),
          |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM documents),
          |freq AS (
          |  SELECT token, CAST(count(*) AS BIGINT) AS df FROM toks
          |  GROUP BY token ORDER BY df DESC, token LIMIT 20),
          |ft AS (SELECT doc_id, token FROM toks
          |       WHERE token IN (SELECT token FROM freq)),
          |pr AS (
          |  SELECT a.token AS tok_a, b.token AS tok_b,
          |         CAST(count(*) AS BIGINT) AS n_ab
          |  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.token < b.token
          |  GROUP BY 1, 2)
          |SELECT tok_a, tok_b, n_ab, fa.df AS df_a, fb.df AS df_b,
          |  100 * (CAST(floor(ln(CAST(n_ab AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)
          |    + CAST(floor(ln(CAST(n_corpus AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)
          |    - CAST(floor(ln(CAST(fa.df AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)
          |    - CAST(floor(ln(CAST(fb.df AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT))
          |    AS pmi_micro
          |FROM pr JOIN freq fa ON fa.token = pr.tok_a
          |        JOIN freq fb ON fb.token = pr.tok_b
          |        CROSS JOIN nn
          |ORDER BY tok_a, tok_b""".stripMargin)),

    QueryDef("point_in_time_signup",
      (s, d) => Pipeline.pointInTimeSignup(Tables.events(s, d)), Some(
        """WITH ev AS (
          |  SELECT user_id, ts, event_type, event_id,
          |    CASE WHEN event_type = 'signup' THEN ts END AS sig_ts
          |  FROM events WHERE event_type IN ('signup', 'purchase')),
          |wd AS (
          |  SELECT user_id, ts, event_type, event_id,
          |    max(sig_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup
          |  FROM ev)
          |SELECT user_id, event_id, ts AS purchase_ts,
          |  CASE WHEN epoch_ms(ts) - epoch_ms(last_signup) <= 604800000
          |       THEN last_signup END AS feature_signup,
          |  CASE WHEN epoch_ms(ts) - epoch_ms(last_signup) <= 604800000
          |       THEN CAST(epoch_ms(ts) - epoch_ms(last_signup) AS BIGINT) END AS feature_age_ms
          |FROM wd WHERE event_type = 'purchase'
          |ORDER BY user_id, event_id""".stripMargin)),

    QueryDef("first_touch_attribution",
      (s, d) => Pipeline.firstTouchAttribution(Tables.events(s, d)), Some(
        """WITH o AS (
          |  SELECT user_id, ts, event_id, event_type,
          |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          |  FROM events),
          |f AS (
          |  SELECT user_id, ts, event_id, event_type,
          |    CAST(sum(CASE WHEN prev_ts IS NULL
          |                  OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
          |                  THEN 1 ELSE 0 END)
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          |  FROM o),
          |ft AS (
          |  SELECT user_id, ts, event_id, event_type,
          |    first_value(event_type) OVER (PARTITION BY user_id, session_id
          |      ORDER BY ts, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch
          |  FROM f)
          |SELECT first_touch, count(*) AS n_purchases
          |FROM ft WHERE event_type = 'purchase'
          |GROUP BY first_touch
          |ORDER BY n_purchases DESC, first_touch""".stripMargin)),

    QueryDef("user_state_diff",
      (s, d) => Pipeline.userStateDiff(Tables.events(s, d)), Some(
        """WITH b AS (
          |  SELECT user_id,
          |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_before,
          |    count(*) AS n_before
          |  FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
          |  GROUP BY user_id),
          |a AS (
          |  SELECT user_id,
          |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_after,
          |    count(*) AS n_after
          |  FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
          |  GROUP BY user_id)
          |SELECT coalesce(b.user_id, a.user_id) AS user_id,
          |  CAST(coalesce(b.n_before, 0) AS BIGINT) AS n_before,
          |  CAST(coalesce(a.n_after, 0) AS BIGINT) AS n_after,
          |  CASE WHEN b.user_id IS NULL THEN 'inserted'
          |       WHEN a.user_id IS NULL THEN 'deleted'
          |       ELSE 'updated' END AS change
          |FROM b FULL OUTER JOIN a ON b.user_id = a.user_id
          |WHERE b.user_id IS NULL OR a.user_id IS NULL
          |   OR b.n_before <> a.n_after OR b.total_before <> a.total_after
          |ORDER BY user_id""".stripMargin)),

    QueryDef("merge_upsert_state",
      (s, d) => Pipeline.mergeUpsertState(Tables.events(s, d)), Some(
        """WITH tgt AS (
          |  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS t_tgt,
          |         count(*) AS n_tgt
          |  FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
          |  GROUP BY user_id),
          |src AS (
          |  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS t_src,
          |         count(*) AS n_src
          |  FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
          |  GROUP BY user_id)
          |SELECT coalesce(tgt.user_id, src.user_id) AS user_id,
          |  CAST(coalesce(n_tgt, 0) + coalesce(n_src, 0) AS BIGINT) AS n_events,
          |  CAST(coalesce(t_tgt, CAST(0 AS DECIMAL(18,2)))
          |       + coalesce(t_src, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
          |  CASE WHEN tgt.user_id IS NULL THEN 'inserted'
          |       WHEN src.user_id IS NULL THEN 'kept'
          |       ELSE 'updated' END AS status
          |FROM tgt FULL OUTER JOIN src ON tgt.user_id = src.user_id
          |ORDER BY user_id""".stripMargin)),

    QueryDef("value_histogram",
      (s, d) => Pipeline.valueHistogram(Tables.events(s, d)), Some(
        """WITH h AS (
          |  SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS n
          |  FROM events GROUP BY 1)
          |SELECT bin, CAST(bin AS DOUBLE) * 5.0 AS bin_lo, n,
          |  CAST(sum(n) OVER (ORDER BY bin
          |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
          |  round(CAST(sum(n) OVER (ORDER BY bin
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          |        / CAST(sum(n) OVER () AS DOUBLE), 6) AS cdf
          |FROM h ORDER BY bin""".stripMargin)),

    QueryDef("ks_drift",
      (s, d) => Pipeline.ksDrift(Tables.events(s, d)), Some(
        """WITH counts AS (
          |  SELECT CAST(floor(value / 1.0) AS BIGINT) AS bin, event_type,
          |         CAST(count(*) AS BIGINT) AS cnt
          |  FROM events GROUP BY 1, 2),
          |grid AS (
          |  SELECT b.bin, t.event_type
          |  FROM (SELECT DISTINCT bin FROM counts) b
          |  CROSS JOIN (SELECT DISTINCT event_type FROM counts) t),
          |cum AS (
          |  SELECT g.bin, g.event_type,
          |    CAST(sum(coalesce(c.cnt, 0)) OVER (PARTITION BY g.event_type
          |         ORDER BY g.bin
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          |    CAST(sum(coalesce(c.cnt, 0)) OVER (PARTITION BY g.event_type)
          |         AS BIGINT) AS n
          |  FROM grid g LEFT JOIN counts c USING (bin, event_type)),
          |d AS (
          |  SELECT x.event_type, x.bin, x.n, r.n_ref,
          |    abs(x.cum * r.n_ref - r.cum_ref * x.n) AS dnum
          |  FROM (SELECT * FROM cum WHERE event_type <> 'view') x
          |  JOIN (SELECT bin, cum AS cum_ref, n AS n_ref FROM cum
          |        WHERE event_type = 'view') r
          |    USING (bin)),
          |rk AS (
          |  SELECT *, row_number() OVER (PARTITION BY event_type
          |            ORDER BY dnum DESC, bin) AS rn
          |  FROM d)
          |SELECT event_type, n, n_ref,
          |  CAST((1000000 * CAST(dnum AS HUGEINT)) // (n * n_ref) AS BIGINT)
          |    AS ks_micro,
          |  bin AS ks_bin
          |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    QueryDef("grouped_percentiles",
      (s, d) => Pipeline.groupedPercentiles(Tables.events(s, d)), Some(
        """WITH c AS (
          |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
          |  FROM events),
          |r AS (
          |  SELECT event_type, cents,
          |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents)
          |         AS BIGINT) AS rn,
          |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
          |  FROM c)
          |SELECT event_type, max(n) AS n,
          |  max(CASE WHEN rn = 1 + (n - 1) // 10 THEN cents END) AS p10_cent,
          |  max(CASE WHEN rn = 1 + (n - 1) // 2 THEN cents END) AS p50_cent,
          |  max(CASE WHEN rn = 1 + (9 * (n - 1)) // 10 THEN cents END)
          |    AS p90_cent
          |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef("psi_drift",
      (s, d) => Pipeline.psiDrift(Tables.events(s, d)), Some(
        """WITH counts AS (
          |  SELECT CAST(floor(value / 1.0) AS BIGINT) AS bin, event_type,
          |         CAST(count(*) AS BIGINT) AS cnt
          |  FROM events GROUP BY 1, 2),
          |ct AS (
          |  SELECT *, CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT)
          |         AS n
          |  FROM counts),
          |rf AS (SELECT bin, cnt AS q, n AS n_ref FROM ct
          |       WHERE event_type = 'view'),
          |j AS (
          |  SELECT x.event_type, x.n, rf.n_ref,
          |    rf.q IS NOT NULL AS used,
          |    CASE WHEN rf.q IS NOT NULL
          |         THEN x.cnt * rf.n_ref - rf.q * x.n ELSE 0 END AS dm,
          |    CASE WHEN rf.q IS NOT NULL THEN
          |      CAST(floor(ln(CAST(x.cnt AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)
          |      + CAST(floor(ln(CAST(rf.n_ref AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)
          |      - CAST(floor(ln(CAST(rf.q AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)
          |      - CAST(floor(ln(CAST(x.n AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)
          |      ELSE 0 END AS t4
          |  FROM (SELECT * FROM ct WHERE event_type <> 'view') x
          |  LEFT JOIN rf USING (bin)),
          |a AS (
          |  SELECT event_type, n, max(n_ref) AS n_ref,
          |    CAST(sum(CASE WHEN used THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_bins_used,
          |    CAST(sum(CASE WHEN used THEN 0 ELSE 1 END) AS BIGINT)
          |      AS n_bins_skipped,
          |    sum(CAST(dm AS HUGEINT) * t4) AS s
          |  FROM j GROUP BY 1, 2)
          |SELECT event_type, n, n_ref, n_bins_used, n_bins_skipped,
          |  CAST(CASE WHEN s < 0 THEN -1 ELSE 1 END *
          |       ((100 * abs(s)) // (n * n_ref)) AS BIGINT) AS psi_micro
          |FROM a ORDER BY event_type""".stripMargin)),

    QueryDef("benford_value_audit",
      (s, d) => Pipeline.benfordAudit(Tables.events(s, d)), Some {
        val vals = Pipeline.benfordPermille.zipWithIndex
          .map { case (p, i) => s"(${i + 1}, ${p})" }.mkString(", ")
        s"""WITH c AS (
           |  SELECT CAST(round(value * 100) AS BIGINT) AS cents
           |  FROM events WHERE CAST(round(value * 100) AS BIGINT) > 0),
           |dg AS (
           |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
           |           AS digit,
           |         CAST(count(*) AS BIGINT) AS n
           |  FROM c GROUP BY 1),
           |e(digit, exp_permille) AS (VALUES $vals),
           |ob AS (
           |  SELECT digit, n,
           |    CAST((1000 * n) // sum(n) OVER () AS BIGINT) AS obs_permille
           |  FROM dg)
           |SELECT ob.digit, ob.n, ob.obs_permille,
           |  CAST(e.exp_permille AS BIGINT) AS exp_permille,
           |  CAST(ob.obs_permille - e.exp_permille AS BIGINT) AS dev_permille
           |FROM ob JOIN e ON e.digit = ob.digit
           |ORDER BY ob.digit""".stripMargin
      }),

    QueryDef("window_first_last",
      (s, d) => Pipeline.firstLastOrders(s, d), Some(
        """SELECT o_custkey,
          |  first_value(o_orderdate) OVER w AS first_date,
          |  last_value(o_orderdate) OVER w AS last_date,
          |  nth_value(o_orderkey, 2) OVER w AS second_key,
          |  CAST(count(*) OVER w AS BIGINT) AS n_orders
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |QUALIFY row_number() OVER (PARTITION BY o_custkey
          |                           ORDER BY o_orderdate, o_orderkey) = 1
          |ORDER BY o_custkey""".stripMargin)),

    QueryDef("mode_quantity",
      (s, d) => Pipeline.modeQuantity(s, d), Some(
        """WITH c AS (
          |  SELECT l_returnflag, l_quantity, count(*) AS cnt
          |  FROM lineitem GROUP BY 1, 2),
          |r AS (
          |  SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count,
          |    row_number() OVER (PARTITION BY l_returnflag
          |                       ORDER BY cnt DESC, l_quantity) AS rn
          |  FROM c)
          |SELECT l_returnflag, mode_qty, mode_count
          |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin)),

    // the distributed zipWithIndex: bucket-partitioned ranks + 256-row
    // offset cumsum ≡ the oracle's single global row_number
    QueryDef("md5_global_rank",
      (s, d) => Pipeline.md5GlobalRank(Tables.documents(s, d)), Some(
        """SELECT doc_id,
          |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
          |       AS BIGINT) AS rank
          |FROM documents ORDER BY rank""".stripMargin)),

    QueryDef("sequence_packing",
      (s, d) => Pipeline.packedSequences(Tables.documents(s, d)),
      Some(
        s"""WITH lens AS (
           |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
           |    CAST(greatest(coalesce(len(regexp_extract_all(lower(text), '[a-z'']+')), 0), 0)
           |         + 1 AS BIGINT) AS n
           |  FROM documents),
           |o AS (
           |  SELECT doc_id, n,
           |    CAST(coalesce(sum(n) OVER (ORDER BY h, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
           |  FROM lens),
           |sp AS (
           |  SELECT doc_id, off, n,
           |    unnest(generate_series(off // 256, (off + n - 1) // 256)) AS seq_id
           |  FROM o)
           |SELECT seq_id, count(*) AS n_docs,
           |  CAST(sum(least(off + n, (seq_id + 1) * 256)
           |           - greatest(off, seq_id * 256)) AS BIGINT) AS n_tokens,
           |  arg_min(doc_id, off) AS first_doc, arg_max(doc_id, off) AS last_doc
           |FROM sp GROUP BY seq_id ORDER BY seq_id""".stripMargin)),

    QueryDef("negative_samples",
      (s, d) => Pipeline.negativeSamples(
        Tables.documents(s, d), SharedIntermediates.textClusters(s, d)),
      Some(
        s"""WITH RECURSIVE ${DedupQueries.clustersCtes},
           |cl AS (SELECT doc_id, cluster_id FROM lab),
           |rk AS (SELECT doc_id,
           |         CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           |              AS BIGINT) AS rank
           |       FROM documents),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM rk),
           |pr AS (SELECT cl.doc_id, cl.cluster_id, rk.rank, n_corpus
           |       FROM cl JOIN rk USING (doc_id), nn),
           |sl AS (SELECT doc_id, cluster_id, rank, n_corpus,
           |         CAST(unnest([0, 1, 2]) AS BIGINT) AS slot
           |       FROM pr),
           |st AS (SELECT *, slot * ((n_corpus - 1) // 3) + 1 AS stride FROM sl),
           |nr AS (SELECT doc_id, cluster_id, slot,
           |         ((rank - 1 + stride) % n_corpus) + 1 AS neg_rank
           |       FROM st),
           |j AS (SELECT nr.doc_id, nr.slot, rk2.doc_id AS neg_id, nr.cluster_id
           |      FROM nr JOIN rk rk2 ON rk2.rank = nr.neg_rank)
           |SELECT j.doc_id, j.slot, j.neg_id,
           |  coalesce(c2.cluster_id = j.cluster_id, false) AS same_cluster
           |FROM j LEFT JOIN cl c2 ON c2.doc_id = j.neg_id
           |ORDER BY j.doc_id, j.slot""".stripMargin)),

    // single-pass column profiler: typed extrema (numeric as exact
    // BIGINT, strings lexical) so no double->string format crosses
    QueryDef("column_profile",
      (s, d) => Pipeline.columnProfile(Tables.events(s, d)), Some {
        def num(c: String) =
          s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_nulls,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(min($c) AS BIGINT) AS min_num,
             |  CAST(max($c) AS BIGINT) AS max_num,
             |  CAST(NULL AS VARCHAR) AS min_str,
             |  CAST(NULL AS VARCHAR) AS max_str
             |FROM p""".stripMargin
        def str(c: String) =
          s"""SELECT '$c', CAST(count(*) AS BIGINT),
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(count(DISTINCT $c) AS BIGINT),
             |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             |  min($c), max($c)
             |FROM p""".stripMargin
        s"""WITH p AS (
           |  SELECT event_id, user_id, event_type,
           |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS value_milli,
           |    epoch_us(ts) AS ts_us
           |  FROM events)
           |SELECT * FROM (
           |${num("event_id")}
           |UNION ALL
           |${num("user_id")}
           |UNION ALL
           |${str("event_type")}
           |UNION ALL
           |${num("value_milli")}
           |UNION ALL
           |${num("ts_us")}) u
           |ORDER BY "column"""".stripMargin
      }),
  )
}
