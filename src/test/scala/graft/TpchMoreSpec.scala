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
