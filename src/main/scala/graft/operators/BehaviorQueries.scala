package graft.operators

import graft.{QueryDef, Tables}

/** Driver-contract wiring for the behavioral-analytics suite
  * ([[Behavior]]). */
object BehaviorQueries {

  val defs: Seq[QueryDef] = Seq(

    // market-basket association rules: top-20 part pairs with exact
    // integer support/confidence/lift
    QueryDef("basket_lift",
      (s, d) => Behavior.basketLiftFrom(SharedIntermediates.basketItems(s, d),
        SharedIntermediates.coPurchasePairs(s, d)), Some(
        s"""WITH items AS (
          |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS p
          |  FROM lineitem),
          |no AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders
          |       FROM items),
          |pn AS (SELECT p, CAST(count(*) AS BIGINT) AS np
          |       FROM items GROUP BY 1),
          |pr AS (
          |  SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS n12
          |  FROM items a JOIN items b ON a.okey = b.okey AND a.p < b.p
          |  GROUP BY 1, 2),
          |top AS (SELECT * FROM pr ORDER BY n12 DESC, p1, p2
          |        LIMIT ${Behavior.BasketTopK})
          |SELECT t.p1, t.p2, t.n12, a.np AS n1, b.np AS n2,
          |  (1000000 * t.n12) // n_orders AS support_ppm,
          |  (1000000 * t.n12) // a.np AS conf_p1_to_p2_ppm,
          |  CAST((1000 * CAST(n_orders AS HUGEINT) * t.n12)
          |       // (a.np * b.np) AS BIGINT) AS lift_milli
          |FROM top t JOIN pn a ON a.p = t.p1 JOIN pn b ON b.p = t.p2, no
          |ORDER BY t.n12 DESC, t.p1, t.p2""".stripMargin)),

    // co-purchase triangle census: thresholded oriented edges, exact
    // triangle/wedge counts + global clustering coefficient
    QueryDef("triangle_copurchase",
      (s, d) => Behavior.trianglesFrom(
        SharedIntermediates.coPurchasePairs(s, d)), Some(
        s"""WITH items AS (
          |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS p
          |  FROM lineitem),
          |e AS (
          |  SELECT x.p AS a, y.p AS b
          |  FROM items x JOIN items y ON x.okey = y.okey AND x.p < y.p
          |  GROUP BY 1, 2 HAVING count(*) >= ${Behavior.TriangleMinCo}),
          |tri AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
          |  FROM e e1 JOIN e e2 ON e2.a = e1.b
          |       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
          |deg AS (
          |  SELECT v, CAST(count(*) AS BIGINT) AS d
          |  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
          |  GROUP BY 1),
          |st AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
          |    CAST(coalesce(sum(d), 0) // 2 AS BIGINT) AS n_edges,
          |    CAST(coalesce(sum(d * (d - 1)), 0) // 2 AS BIGINT) AS n_wedges
          |  FROM deg)
          |SELECT n_nodes, n_edges, n_triangles,
          |  n_wedges - 3 * n_triangles AS n_open_wedges,
          |  CAST(CASE WHEN n_wedges > 0 THEN
          |    (1000 * 3 * n_triangles) // n_wedges END AS BIGINT)
          |    AS closure_permille
          |FROM st, tri""".stripMargin)),

    // RFM segmentation: exact quartile-of-rank codes (Spark orders
    // with asc_nulls_first; DuckDB needs the explicit NULLS FIRST)
    QueryDef("rfm_segments",
      (s, d) => Behavior.rfmSegments(s, d), Some(
        """WITH pc AS (
          |  SELECT c.c_custkey, o.last_day,
          |    coalesce(o.freq, 0) AS freq, coalesce(o.cents, 0) AS cents
          |  FROM customer c LEFT JOIN (
          |    SELECT o_custkey, CAST(max(CAST(o_orderdate AS DATE)) AS DATE)
          |        AS last_day,
          |      CAST(count(*) AS BIGINT) AS freq,
          |      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
          |        AS BIGINT) AS cents
          |    FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey),
          |r AS (
          |  SELECT *,
          |    CAST(row_number() OVER (ORDER BY last_day ASC NULLS FIRST,
          |      c_custkey) AS BIGINT) AS r_rank,
          |    CAST(row_number() OVER (ORDER BY freq, c_custkey) AS BIGINT)
          |      AS f_rank,
          |    CAST(row_number() OVER (ORDER BY cents, c_custkey) AS BIGINT)
          |      AS m_rank,
          |    CAST(count(*) OVER () AS BIGINT) AS nc
          |  FROM pc)
          |SELECT (r_rank * 4 + nc - 1) // nc AS r_code,
          |  (f_rank * 4 + nc - 1) // nc AS f_code,
          |  (m_rank * 4 + nc - 1) // nc AS m_code,
          |  CAST(count(*) AS BIGINT) AS n_custs,
          |  CAST(sum(cents) AS BIGINT) AS total_cents,
          |  CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
          |FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // frequent event-type trigrams: user-ordered sliding 3-grams,
    // top-20 with exact share ppm
    QueryDef("event_trigrams",
      (s, d) => Behavior.eventTrigrams(Tables.events(s, d)), Some(
        """WITH g0 AS (
          |  SELECT event_type AS t3,
          |    lag(event_type, 1) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS t2,
          |    lag(event_type, 2) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS t1
          |  FROM events),
          |g AS (
          |  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
          |  FROM g0 WHERE t1 IS NOT NULL GROUP BY 1, 2, 3),
          |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
          |SELECT t1, t2, t3, n, (1000000 * n) // total AS share_ppm
          |FROM g, tot ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin)))
}
