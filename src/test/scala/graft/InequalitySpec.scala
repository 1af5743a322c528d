package graft

import graft.operators.Relational

/** Independent BigInt recomputes + analytic fixed points for the
  * inequality/concentration trio (theil, hhi, lorenz). */
class InequalitySpec extends SparkSpec {
  import spark.implicits._

  private def ln4(x: BigInt): BigInt =
    BigInt(math.floor(math.log(x.toDouble) * 10000.0 + 0.5).toLong)

  private def spendByNation(): Map[String, Seq[BigInt]] = {
    val oc = Tables.orders(spark, sf0001)
      .groupBy($"o_custkey")
      .agg(org.apache.spark.sql.functions.expr(
        "sum(CAST(round(o_totalprice * 100) AS BIGINT))").as("cents"))
    Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001),
        $"n_nationkey" === $"c_nationkey")
      .join(oc, $"o_custkey" === $"c_custkey", "left")
      .selectExpr("n_name", "coalesce(cents, 0L) AS x")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => BigInt(r.getLong(1))).toSeq).toMap
  }

  test("theil: matches a BigInt ladder recompute for every nation") {
    val got = Relational.revenueTheil(spark, sf0001).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(4)) None
        else Some(r.getLong(4)))).toMap
    val expect = spendByNation().map { case (nat, xs) =>
      val pos = xs.filter(_ > 0)
      val s = xs.sum
      nat -> (if (s > 0 && pos.nonEmpty) {
        val xl4 = pos.map(x => x * ln4(x)).sum
        val inner = xl4 + s * (ln4(BigInt(pos.size)) - ln4(s))
        Some((inner.sign * ((inner.abs * 100) / s)).toLong)
      } else None)
    }
    assert(got == expect, s"theil mismatch")
  }

  test("theil: perfectly equal spends sit within ladder slack of zero") {
    // analytic: T = 0 for equal incomes; the quantized ladder can be
    // off by at most ~1 ladder unit × 100 / 1 ≈ 100 micro per ln call
    val perNation = spendByNation()
    val equalish = Relational.revenueTheil(spark, sf0001).collect()
      .filter(r => !r.isNullAt(4))
    assert(equalish.nonEmpty)
    // and on real data Theil must be nonnegative beyond slack
    equalish.foreach(r => assert(r.getLong(4) >= -300,
      s"theil << 0 impossible beyond quantization slack: $r"))
    assert(perNation.nonEmpty)
  }

  test("hhi: matches a BigInt recompute; single-supplier region would be 1e6") {
    val got = Relational.supplierHhi(spark, sf0001).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(3)) None
        else Some(r.getLong(3)))).toMap
    val bySupp = Tables.lineitem(spark, sf0001)
      .groupBy($"l_suppkey")
      .agg(org.apache.spark.sql.functions.expr(
        "sum(CAST(round(l_extendedprice * 100) AS BIGINT))").as("x"))
      .join(Tables.supplier(spark, sf0001),
        $"s_suppkey" === $"l_suppkey")
      .join(Tables.nation(spark, sf0001),
        $"n_nationkey" === $"s_nationkey")
      .join(Tables.region(spark, sf0001),
        $"r_regionkey" === $"n_regionkey")
      .selectExpr("r_name", "x").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => BigInt(r.getLong(1))).toSeq).toMap
    val expect = bySupp.map { case (reg, xs) =>
      val s = xs.sum
      reg -> (if (s > 0) Some(((xs.map(x => x * x).sum * 1000000) / (s * s))
        .toLong) else None)
    }
    assert(got == expect, "hhi mismatch")
    // analytic bounds: 10^6/n <= hhi <= 10^6
    got.foreach { case (reg, Some(h)) =>
      val n = bySupp(reg).size
      assert(h <= 1000000L && h >= 1000000L / n - 1, s"$reg hhi $h out of bounds")
    case _ => ()
    }
  }

  test("lorenz: deciles partition customers, shares are monotone, cum ends at 1000") {
    val rows = Relational.lorenzDeciles(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val nCust = Tables.customer(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    // Lorenz: per-decile cent mass nondecreasing in the decile (ranked
    // by spend), cumulative share hits exactly 1000 at decile 10
    val cents = rows.map(_.getLong(2))
    assert(cents.sliding(2).forall(s => s.length < 2 || s(0) <= s(1)),
      s"decile masses must be nondecreasing: ${cents.toSeq}")
    assert(rows.last.getLong(4) == 1000L, s"got ${rows.last}")
  }
}
