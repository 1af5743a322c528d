package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The rest of the TPC-H-shaped relational battery, adapted to the driver
  * schema (no partsupp table; lineitem lacks shipmode/commitdate/
  * receiptdate; customer lacks phone — each query keeps the original's
  * PLAN SHAPE on the columns that exist).
  *
  * Scale design notes (100 TB / 1000 executors):
  *  - every dimension (part, supplier, nation, region, scalar aggregates)
  *    is broadcast — the lineitem/orders fact tables shuffle at most once
  *    per query, on their join or grouping key;
  *  - correlated subqueries (Q17's per-part average, Q21's exists/not
  *    exists pair, Q22's scalar average) are expressed so Catalyst
  *    decorrelates them into joins — no per-row re-execution;
  *  - all money arithmetic goes through [[graft.functions.Exact]] so the
  *    result is accumulation-order-independent (hash-stable vs DuckDB).
  */
object TpchMore {

  /** TPC-H Q7-style volume shipping: cross-region trade volume between
    * supplier and customer nations by ship year. Two broadcast joins
    * against the same nation dim under different roles; the fact side
    * shuffles once (orders⋈lineitem on the order key). */
  def volumeShipping(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"),
        col("n_regionkey").as("s_rk"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"),
        col("n_regionkey").as("c_rk"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("s_rk") =!= col("c_rk"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sumExpr(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8-style market share: the share of NATION_5-supplied revenue
    * within ASIA-customer ECONOMY-part volume, by order year. Ratio of
    * two exact decimal sums per group. */
  def marketShare(s: SparkSession, d: String): DataFrame = {
    val suppNation = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val custNation = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val vol = discPrice(col("l_extendedprice"), col("l_discount"))
    val zero = lit(0).cast(DecimalType(18, 2))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("c_rk") === col("r_regionkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_5", vol).otherwise(zero)).cast("double") /
          sum(vol).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q10-style returned-item report: top 20 customers by revenue
    * lost to returns in 1998Q1, with nation enrichment. */
  def returnedItems(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-04-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sumExpr(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)

  /** TPC-H Q12-style priority shipping: late lines (shipped ≥30 days
    * after order) by ship year, split urgent/high vs rest. CASE-sum
    * pivot over one fact-fact join. */
  def priorityShipping(s: SparkSession, d: String): DataFrame = {
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 30 DAY"))
      .groupBy(year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(
        sum(when(urgent, 1).otherwise(0)).cast("long").as("high_line_count"),
        sum(when(urgent, 0).otherwise(1)).cast("long").as("low_line_count"))
      .orderBy("l_year")
  }

  /** TPC-H Q13-style customer distribution: histogram of per-customer
    * order counts (left join preserving order-less customers), excluding
    * 1-URGENT orders. */
  def customerDistribution(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q14-style promo revenue: PROMO-part share of September-1997
    * revenue, as a percentage. part is broadcast; one scan of lineitem. */
  def promoRevenue(s: SparkSession, d: String): DataFrame = {
    val vol = discPrice(col("l_extendedprice"), col("l_discount"))
    val zero = lit(0).cast(DecimalType(18, 2))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", vol).otherwise(zero)).cast("double") /
          sum(vol).cast("double")).as("promo_revenue"))
  }

  /** TPC-H Q15-style top supplier: suppliers achieving the maximum
    * 1997Q4 revenue. The revenue aggregate is computed once, its max is
    * broadcast back as a scalar — no second scan of lineitem. */
  def topSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-10-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sumExpr(discPrice(col("l_extendedprice"), col("l_discount"))).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.join(broadcast(mx), col("total_revenue") === col("max_revenue"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17-style small-quantity revenue: average yearly revenue from
    * Brand#23 lineitems whose quantity is below half the part's average.
    * The correlated per-part average becomes a window over the
    * brand-filtered join — one shuffle on the part key, no re-scan. */
  def smallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#23")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty",
        sum(dec2(col("l_quantity"))).over(w).cast("double") /
          count(col("l_quantity")).over(w).cast("double"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((sumD(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q19-style disjunctive-predicate revenue: three (brand, size
    * band, quantity band) alternatives OR-ed over the part join. The
    * brand IN-list prunes the broadcast side before the join; the OR
    * residual is evaluated post-join inside codegen. */
  def disjunctiveRevenue(s: SparkSession, d: String): DataFrame = {
    val alt1 = col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 11)
    val alt2 = col("p_brand") === "Brand#19" && col("p_size").between(1, 25) &&
      col("l_quantity").between(10, 20)
    val alt3 = col("p_brand") === "Brand#23" && col("p_size").between(1, 35) &&
      col("l_quantity").between(20, 30)
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#11", "Brand#19", "Brand#23"))),
        col("l_partkey") === col("p_partkey"))
      .filter(alt1 || alt2 || alt3)
      .agg(
        count(lit(1)).as("n_items"),
        sumExpr(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
  }

  /** TPC-H Q21-style waiting suppliers: suppliers that shipped ≥60 days
    * late on a finished multi-supplier order where every OTHER supplier
    * shipped on time. EXISTS → semi join on the order key; NOT EXISTS →
    * anti join against the late-line set (both with a supplier-inequality
    * residual) — Catalyst never re-executes a per-row subquery. */
  def waitingSuppliers(s: SparkSession, d: String): DataFrame = {
    val lateDays = expr("INTERVAL 60 DAY")
    val li = Tables.lineitem(s, d)
    val late = li
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") + lateDays)
      .select(col("l_orderkey"), col("l_suppkey"), col("o_orderdate"))
    val others = li.select(col("l_orderkey").as("o2_ok"), col("l_suppkey").as("o2_sk"))
    val lateOthers = late.select(col("l_orderkey").as("o3_ok"), col("l_suppkey").as("o3_sk"))
    late
      .join(others,
        col("l_orderkey") === col("o2_ok") && col("l_suppkey") =!= col("o2_sk"),
        "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("o3_ok") && col("l_suppkey") =!= col("o3_sk"),
        "left_anti")
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(20)
  }

  /** TPC-H Q22-style dormant balances: customers above the positive-
    * balance average with no order since 1999, bucketed by a nation-key
    * country code. The scalar average is a broadcast single-row join. */
  def dormantBalances(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val avgPos = cust.filter(col("c_acctbal") > 0)
      .agg(avgD(col("c_acctbal")).as("avg_bal"))
    cust
      .crossJoin(broadcast(avgPos))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_nationkey") % 10).cast("long").as("cntrycode"))
      .agg(
        count(lit(1)).as("numcust"),
        sumD(col("c_acctbal")).as("totacctbal"))
      .orderBy("cntrycode")
  }

  /** TPC-H Q2-style minimum-cost supplier (no partsupp table, so the
    * part↔supplier relation is the DISTINCT pairs observed in lineitem):
    * for each small LARGE-type part, the supplier(s) with the minimum
    * account balance among those that shipped it. The correlated MIN is
    * a window over the pair join. */
  def minBalanceSupplier(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val w = Window.partitionBy(col("p_partkey"))
    pairs
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_type") === "LARGE" && col("p_size") <= 10)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .withColumn("min_bal", min(col("s_acctbal")).over(w))
      .filter(col("s_acctbal") === col("min_bal"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("s_acctbal"))
      .orderBy("p_partkey", "s_name")
  }

  /** TPC-H Q9-style product-type profit: per-nation per-year profit on
    * the target part family ('%gear%' ≈ the original's '%green%'). The
    * driver schema has no ps_supplycost, so profit reduces to discounted
    * revenue; the PLAN SHAPE is the original's: a 5-way join with every
    * dimension broadcast, the fact side shuffled once on the grouping
    * key. */
  def productProfit(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%gear%"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sumExpr(discPrice(col("l_extendedprice"), col("l_discount"))).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q11-style important inventory: per-part value with a HAVING
    * against a multiple of the MEAN part value (the original's
    * fraction-of-total at a fixed part count; a constant fraction would
    * silently empty out as the part universe grows, so the threshold is
    * expressed per-part and scales with the catalog). partsupp's
    * supplycost×availqty becomes the part's shipped extended-price total
    * over lineitem; the scalar global aggregate stays a one-row
    * broadcast (the original's scalar subquery, decorrelated). Both
    * sides of the test are the same fixed double-op sequence over exact
    * decimal sums. */
  def importantParts(s: SparkSession, d: String,
      meanMultiple: Double = 1.2): DataFrame = {
    val v = Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg(sum(dec2(col("l_extendedprice"))).as("value_dec"))
    val tot = v.agg(sum(col("value_dec")).as("total_dec"),
      count(lit(1)).as("n_parts"))
    v.crossJoin(broadcast(tot))
      .filter(col("value_dec").cast("double") >
        col("total_dec").cast("double") / col("n_parts").cast("double") * meanMultiple)
      .select(col("l_partkey").as("p_partkey"),
        col("value_dec").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  /** TPC-H Q16-style supplier-relationship counts: distinct suppliers
    * per (brand, type, size) for non-excluded parts, with deficit
    * suppliers removed first (the original's NOT-IN complaint-supplier
    * subquery → an anti join; the part↔supplier relation is the
    * DISTINCT lineitem pair set, as in [[minBalanceSupplier]]). */
  def supplierPartCounts(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val excluded = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    pairs
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(Tables.part(s, d).filter(
        col("p_brand") =!= "Brand#13" && !col("p_type").like("PROMO%") &&
          col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q20-style promotion-candidate suppliers: suppliers that moved
    * more than `minQty` units of the target part family ('blue%') in
    * 1997. The original's half-of-availqty stock test (partsupp) becomes
    * a shipped-volume threshold; the inner grouped subquery decorrelates
    * to one aggregation + a semi join — no per-supplier re-scan. */
  def promotionSuppliers(s: SparkSession, d: String,
      minQty: Double = 150.0): DataFrame = {
    val qualifying = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("blue%"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec2(col("l_quantity"))).as("qty_dec"))
      .filter(col("qty_dec").cast("double") > minQty)
      .select(col("l_suppkey"))
    Tables.supplier(s, d)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"))
      .orderBy("s_name", "n_name")
  }
}
