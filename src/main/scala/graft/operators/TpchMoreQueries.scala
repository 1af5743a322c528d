package graft.operators

import graft.QueryDef

/** Driver-contract wiring for the extended TPC-H battery. Every oracle
  * mirrors the Spark side's exact-decimal arithmetic and deterministic
  * ordering (the driver hash-compare is type- and order-sensitive). */
object TpchMoreQueries {

  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q7_volume_shipping", TpchMore.volumeShipping, Some(
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_regionkey <> n2.n_regionkey
         |  AND l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1999-01-01'
         |GROUP BY 1, 2, 3
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    QueryDef("q8_market_share", TpchMore.marketShare, Some(
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(CASE WHEN n1.n_name = 'NATION_5' THEN $discPriceSql
         |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |    / CAST(sum($discPriceSql) AS DOUBLE) AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |JOIN region ON n2.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1 ORDER BY o_year""".stripMargin)),

    QueryDef("q10_returned_items", TpchMore.returnedItems, Some(
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1998-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-04-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    QueryDef("q12_priority_shipping", TpchMore.priorityShipping, Some(
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY l_year""".stripMargin)),

    QueryDef("q13_customer_distribution", TpchMore.customerDistribution, Some(
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer
        |      LEFT JOIN (SELECT * FROM orders
        |                 WHERE o_orderpriority <> '1-URGENT') o
        |        ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    QueryDef("q14_promo_revenue", TpchMore.promoRevenue, Some(
      s"""SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN $discPriceSql
         |                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |    / CAST(sum($discPriceSql) AS DOUBLE) AS promo_revenue
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
         |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin)),

    QueryDef("q15_top_supplier", TpchMore.topSupplier, Some(
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    CAST(sum($discPriceSql) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-10-01'
         |    AND l_shipdate < TIMESTAMP '1998-01-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin)),

    QueryDef("q17_small_qty_revenue", TpchMore.smallQtyRevenue, Some(
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < 0.5 * (
        |    SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |         / CAST(count(l2.l_quantity) AS DOUBLE)
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)),

    QueryDef("q19_disjunctive_revenue", TpchMore.disjunctiveRevenue, Some(
      s"""SELECT count(*) AS n_items,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    QueryDef("q21_waiting_suppliers", TpchMore.waitingSuppliers, Some(
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND o3.o_orderstatus = 'F'
        |                    AND l3.l_shipdate >= o3.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    QueryDef("q22_dormant_balances", TpchMore.dormantBalances, Some(
      """SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
        |  count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         / CAST(count(c_acctbal) AS DOUBLE)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY cntrycode""".stripMargin)),

    QueryDef("q2_min_bal_supplier", TpchMore.minBalanceSupplier, Some(
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |j AS (SELECT p_partkey, p_name, s_name, s_acctbal,
        |        min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
        |      FROM ps
        |      JOIN part ON l_partkey = p_partkey
        |      JOIN supplier ON l_suppkey = s_suppkey
        |      WHERE p_type = 'LARGE' AND p_size <= 10)
        |SELECT p_partkey, p_name, s_name, s_acctbal
        |FROM j WHERE s_acctbal = min_bal
        |ORDER BY p_partkey, s_name""".stripMargin)),

    QueryDef("q9_product_profit", TpchMore.productProfit, Some(
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%gear%'
         |GROUP BY 1, 2
         |ORDER BY nation, o_year DESC""".stripMargin)),

    QueryDef("q11_important_parts", (s, d) => TpchMore.importantParts(s, d), Some(
      """WITH v AS (
        |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
        |  FROM lineitem GROUP BY l_partkey),
        |t AS (SELECT CAST(sum(value_dec) AS DOUBLE) AS total_d,
        |             CAST(count(*) AS DOUBLE) AS n_parts FROM v)
        |SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS part_value
        |FROM v, t
        |WHERE CAST(value_dec AS DOUBLE) > total_d / n_parts * 1.2
        |ORDER BY part_value DESC, p_partkey""".stripMargin)),

    QueryDef("q16_supplier_part_counts", TpchMore.supplierPartCounts, Some(
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ok AS (SELECT * FROM ps WHERE l_suppkey NOT IN
        |         (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ok JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    QueryDef("q20_promotion_suppliers", (s, d) => TpchMore.promotionSuppliers(s, d), Some(
      """SELECT s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'blue%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_suppkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150.0)
        |ORDER BY s_name, n_name""".stripMargin))
  )
}
