package graft

import graft.operators.Stats
import org.apache.spark.sql.Row

/** Hand-computed analytic fixed points for the classical-statistics
  * operators — every expected value below is derivable on paper
  * (ladder values via floor(ln(x)·10⁴ + 0.5)). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def li(rows: Seq[(String, Double, Double)]) =
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")

  private def ev(rows: Seq[(String, Double)]) =
    rows.toDF("event_type", "value")

  test("spearman: perfect monotone orders give ln rho^2 = 0 with the right sign") {
    val up = li((1 to 5).map(i => ("A", i.toDouble, i.toDouble * 10)))
    val r1 = Stats.spearmanQuantityPrice(up).collect()
    assert(r1.toSeq == Seq(Row("A", 5L, 1L, 0L)),
      s"rho=+1 must emit sign 1, ln rho^2 = 0: ${r1.toSeq}")
    val down = li((1 to 5).map(i => ("A", i.toDouble, (6 - i).toDouble * 10)))
    val r2 = Stats.spearmanQuantityPrice(down).collect()
    assert(r2.toSeq == Seq(Row("A", 5L, -1L, 0L)),
      s"rho=-1 must emit sign -1, ln rho^2 = 0: ${r2.toSeq}")
  }

  test("spearman: tie fixture matches the hand-computed double-rank reduction") {
    // q = (1,1,2): double-ranks a = (3,3,6); price distinct: b = (2,4,6)
    // num = 3·54 − 12·12 = 18, dx = 18, dy = 24 → rho = 18/√(18·24) ≈ .866
    // ladder: 100·(2·ln4(18) − ln4(18) − ln4(24)) = 100·(28904 − 31781)
    val f = li(Seq(("A", 1.0, 0.10), ("A", 1.0, 0.20), ("A", 2.0, 0.30)))
    val r = Stats.spearmanQuantityPrice(f).collect()
    assert(r.toSeq == Seq(Row("A", 3L, 1L, -287700L)), s"got ${r.toSeq}")
  }

  test("spearman: constant column degenerates to NULL ladder, sign 0") {
    val f = li(Seq(("A", 2.0, 0.10), ("A", 2.0, 0.20), ("A", 2.0, 0.30)))
    val r = Stats.spearmanQuantityPrice(f).collect()
    assert(r.length == 1 && r(0).getLong(1) == 3L && r(0).getLong(2) == 0L
      && r(0).isNullAt(3), s"got ${r.toSeq}")
  }

  test("chi2: an exactly independent table scores 0; perfect association scores N") {
    val indep = (Seq.fill(4)(("en", "s0")) ++ Seq.fill(4)(("en", "s1")) ++
      Seq.fill(2)(("de", "s0")) ++ Seq.fill(2)(("de", "s1")))
      .toDF("lang", "source")
    val r1 = Stats.chi2LangSource(indep).collect()
    assert(r1.toSeq == Seq(Row(12L, 2L, 2L, 1L, 0L)), s"got ${r1.toSeq}")
    val assoc = (Seq.fill(3)(("en", "s0")) ++ Seq.fill(3)(("de", "s1")))
      .toDF("lang", "source")
    val r2 = Stats.chi2LangSource(assoc).collect()
    // 2x2 diagonal: chi2 = N = 6 → 6000 milli, dof = 1
    assert(r2.toSeq == Seq(Row(6L, 2L, 2L, 1L, 6000L)), s"got ${r2.toSeq}")
  }

  test("welch: hand fixture t^2 = 0.8 lands on the ladder; identical groups are NULL") {
    // view {1.0, 3.0} purchase {2.0, 6.0} (milli: S1=4000 Q1=1e7,
    // S2=8000 Q2=4e7): num = |S1·n2 − S2·n1| = 8000, den = 8e7,
    // t^2 = 8000²/8e7 = 0.8; ladder = 100·(2·89872 + 0 − 181975)
    // (ln 8000 = 8.98720, ln 8e7 = 18.19754; ln 0.8 ≈ −0.22310)
    val f = ev(Seq(("view", 1.0), ("view", 3.0),
      ("purchase", 2.0), ("purchase", 6.0)))
    val r = Stats.welchTtest(f).collect()
    assert(r.toSeq == Seq(Row(2L, 2L, 2000L, 4000L, 1L, -223100L)),
      s"got ${r.toSeq}")
    val same = ev(Seq(("view", 1.0), ("view", 3.0),
      ("purchase", 1.0), ("purchase", 3.0)))
    val r2 = Stats.welchTtest(same).collect()
    assert(r2(0).getLong(4) == 0L && r2(0).isNullAt(5),
      s"equal scaled means must yield sign 0 + NULL ladder: ${r2.toSeq}")
  }

  test("welch: negative sums publish sign-split means (never engine-divergent floor-div)") {
    // view {-1.0, -2.001} → S1 = -3001 milli: sign-split gives
    // -(3001 div 2) = -1500 on BOTH engines; a bare floor-div would be
    // -1501 in DuckDB vs -1500 in Spark's truncating div — the exact
    // divergence the advisor flagged
    val f = ev(Seq(("view", -1.0), ("view", -2.001),
      ("purchase", 2.0), ("purchase", 6.0)))
    val r = Stats.welchTtest(f).collect()
    assert(r(0).getLong(2) == -1500L && r(0).getLong(3) == 4000L,
      s"got ${r.toSeq}")
  }

  test("mannwhitney: out-of-domain values fail the bounded-cell-table contract loudly") {
    // the <= 599,001-cell bound is a CONTRACT with Tables.MaxEventValue
    // (the generator clamp); data past it must error, not silently
    // grow the global-window table
    val bad = ev(Seq(("view", Tables.MaxEventValue + 1.0), ("purchase", 1.0)))
    val e = intercept[Exception] { Stats.mannWhitney(bad).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bounded cell-table contract")),
      s"expected the domain-guard error, got: $e")
    // the cap itself (and 0) pass
    val ok = ev(Seq(("view", Tables.MaxEventValue), ("purchase", 0.0)))
    assert(Stats.mannWhitney(ok).collect().length == 1)
  }

  test("mannwhitney: exact 2*U1 under separation and under ties") {
    // disjoint: view {1,2} < purchase {3,4} → U1 = 0, z_sign = -1
    val sep = ev(Seq(("view", 0.001), ("view", 0.002),
      ("purchase", 0.003), ("purchase", 0.004)))
    val r1 = Stats.mannWhitney(sep).collect()
    assert(r1(0).getLong(0) == 2L && r1(0).getLong(1) == 2L
      && r1(0).getLong(2) == 0L && r1(0).getLong(3) == -1L,
      s"got ${r1.toSeq}")
    // tie across groups: view {1,2}, purchase {2,3} → U1 = 0.5 → 2U1 = 1
    val tie = ev(Seq(("view", 0.001), ("view", 0.002),
      ("purchase", 0.002), ("purchase", 0.003)))
    val r2 = Stats.mannWhitney(tie).collect()
    assert(r2(0).getLong(2) == 1L, s"2U1 must be 1 under the tie: ${r2.toSeq}")
  }

  test("gini split: pure separation scores 1e6*n, maximal impurity scores half") {
    // q=1 -> {A,A}, q=2 -> {B,B}: split s=1 is PURE — per side
    // 1e6*c^2 div n_side = 1e6*n_side, total 1e6*4. s=2 has an empty
    // right side and must be filtered out.
    val pure = li(Seq(("A", 1.0, 1.0), ("A", 1.0, 2.0),
      ("B", 2.0, 3.0), ("B", 2.0, 4.0)))
    val r1 = Stats.giniSplitQuantity(pure).collect()
    assert(r1.toSeq == Seq(Row(1L, 2L, 2L, 4000000L)), s"got ${r1.toSeq}")
    // q=1 -> {A,B}, q=2 -> {A,B}: the split carries NO signal — each
    // side sums 1e6*(1+1) div 2 = 1e6, total 2e6 = half the pure score
    val flat = li(Seq(("A", 1.0, 1.0), ("B", 1.0, 2.0),
      ("A", 2.0, 3.0), ("B", 2.0, 4.0)))
    val r2 = Stats.giniSplitQuantity(flat).collect()
    assert(r2.toSeq == Seq(Row(1L, 2L, 2L, 2000000L)), s"got ${r2.toSeq}")
  }

  private def tsOf(day: Int, i: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:${i / 60}%02d:${i % 60}%02d")

  test("autocorr: alternating daily series gives r1 = -(n-1)/n, r2 = (n-2)/n, empty lag NULL") {
    // days 1..6 with counts 5,1,5,1,5,1: deviations alternate ±2n, so
    // lag-1 products are all -4n², lag-2 all +4n²; den = 4n²·n →
    // r1 = -⌊1000·5/6⌋ = -833, r2 = ⌊1000·4/6⌋ = 666; lag-7 has no
    // pairs → NULL
    val rows = for {
      d <- 1 to 6
      i <- 0 until (if (d % 2 == 1) 5 else 1)
    } yield Tuple1(tsOf(d, i))
    val r = Stats.autocorrDaily(rows.toDF("ts")).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(2),
      if (x.isNullAt(3)) None else Some(x.getLong(3)))).toSeq ==
      Seq((1L, 5L, Some(-833L)), (2L, 4L, Some(666L)), (7L, 0L, None)),
      s"got ${r.toSeq}")
  }

  test("cusum: step series peaks at the shift point with the exact integer peak") {
    // counts 1,1,1,5,5,5 (n=6, S=18): n·S_t = -12,-24,-36,-24,-12,0 →
    // peak at day 3, value -36, permille -⌊36000/108⌋ = -333
    val rows = for {
      d <- 1 to 6
      i <- 0 until (if (d <= 3) 1 else 5)
    } yield Tuple1(tsOf(d, i))
    val r = Stats.cusumDaily(rows.toDF("ts")).collect()
    assert(r.length == 1 && r(0).getLong(0) == 6L && r(0).getLong(1) == 18L
      && r(0).getTimestamp(2).toString.startsWith("2024-01-03")
      && r(0).getLong(3) == -36L && r(0).getLong(4) == -333L,
      s"got ${r.toSeq}")
  }

  test("interarrival: hand fixture CV^2 and mean; Poisson-free exactness") {
    // one user, events at 0s/10s/30s: gaps 10, 20 → mean 15,
    // CV² = 2·(2·500 − 900)/(1·900) = 2/9 → milli ⌊200000/900⌋ = 222
    val rows = Seq((1L, tsOf(1, 0), 1L), (1L, tsOf(1, 10), 2L),
      (1L, tsOf(1, 30), 3L))
    val r = Stats.interarrivalBurstiness(
      rows.toDF("user_id", "ts", "event_id")).collect()
    assert(r.toSeq == Seq(Row(2L, 15L, 222L)), s"got ${r.toSeq}")
  }

  test("ols trend: slope matches a plain-Scala recompute on sf0.001") {
    val got = Stats.olsTrendNation(spark, sf0001).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(3)) None
        else Some(r.getLong(3)))).toMap
    // independent recompute: collect (nation, month, cents) and run the
    // textbook formula in BigInt
    val monthly = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001)
        .selectExpr("c_custkey", "c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, sf0001)
        .selectExpr("n_nationkey AS c_nationkey", "n_name"), "c_nationkey")
      .selectExpr("n_name",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS LONG) AS x",
        "CAST(round(o_totalprice * 100) AS LONG) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = monthly.groupBy(_._1).map { case (nat, rs) =>
      val ym = rs.groupBy(_._2).map { case (x, g) =>
        (BigInt(x), BigInt(g.map(_._3).sum)) }.toSeq
      val n = BigInt(ym.size)
      val (sx, sy) = (ym.map(_._1).sum, ym.map(_._2).sum)
      val sxx = ym.map(p => p._1 * p._1).sum
      val sxy = ym.map(p => p._1 * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      nat -> (if (den > 0) Some((num.sign * ((num.abs * 1000000) / den)).toLong)
        else None)
    }
    assert(got == expect, s"mismatch: ${got.toSeq.sorted.take(3)} vs " +
      s"${expect.toSeq.sorted.take(3)}")
  }

  private def liQd(rows: Seq[(Double, Double)]) =
    rows.toDF("l_quantity", "l_discount")

  test("kendall: perfect concordance/discordance and the hand tie fixture") {
    val up = liQd(Seq((1.0, 0.01), (2.0, 0.02), (3.0, 0.03)))
    val r1 = Stats.kendallTauQuantityDiscount(up).collect()(0)
    assert(r1.getLong(4) == 1L && r1.getLong(5) == 0L,
      s"tau=+1 must emit sign 1, ln tau^2 = 0: $r1")
    val down = liQd(Seq((1.0, 0.03), (2.0, 0.02), (3.0, 0.01)))
    val r2 = Stats.kendallTauQuantityDiscount(down).collect()(0)
    assert(r2.getLong(4) == -1L && r2.getLong(5) == 0L, s"got $r2")
    // q = (1,1,2), disc = (1,2,3): C=2, D=0, n0=3, n1=1 (the q tie),
    // n2=0 → tau_b² = 4/6 → ladder 100·(2·6931 − 6931 − 10986) = −405500
    val tie = liQd(Seq((1.0, 0.01), (1.0, 0.02), (2.0, 0.03)))
    val r3 = Stats.kendallTauQuantityDiscount(tie).collect()(0)
    assert(r3.getLong(2) == 2L && r3.getLong(3) == 0L
      && r3.getLong(4) == 1L && r3.getLong(5) == -405500L, s"got $r3")
    // degenerate: all identical → zero pairs either way, NULL ladder
    val const = liQd(Seq((1.0, 0.01), (1.0, 0.01)))
    val r4 = Stats.kendallTauQuantityDiscount(const).collect()(0)
    assert(r4.getLong(2) == 0L && r4.getLong(3) == 0L
      && r4.getLong(4) == 0L && r4.isNullAt(5), s"got $r4")
  }

  test("page-hinkley: upward step peaks at the series end with the exact gap") {
    // counts 1,1,1,5,5,5: nS_t = -12,-24,-36,-24,-12,0; running min
    // -36 from day 3 → PH = 0,0,0,12,24,36 peaks at day 6 = 36;
    // permille = 36000 // 108 = 333
    val rows = for {
      d <- 1 to 6
      i <- 0 until (if (d <= 3) 1 else 5)
    } yield Tuple1(tsOf(d, i))
    val r = Stats.pageHinkleyDaily(rows.toDF("ts")).collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 18L
      && r.getTimestamp(2).toString.startsWith("2024-01-06")
      && r.getLong(3) == 36L && r.getLong(4) == 333L, s"got $r")
  }

  test("column profile: hand fixture counts, typed extrema, null accounting") {
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val f = Seq((1L, t1, 7L, "view", 1.5), (2L, t2, 7L, "purchase", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.operators.Pipeline.columnProfile(f).collect()
      .map(x => x.getString(0) -> x).toMap
    val et = r("event_type")
    assert(et.getLong(1) == 2L && et.getLong(2) == 0L && et.getLong(3) == 2L
      && et.getString(6) == "purchase" && et.getString(7) == "view", s"$et")
    val vm = r("value_milli")
    assert(vm.getLong(4) == 1500L && vm.getLong(5) == 2000L, s"$vm")
    val uid = r("user_id")
    assert(uid.getLong(3) == 1L && uid.getLong(4) == 7L, s"$uid")
  }

  test("mannwhitney: all values tied degenerates to NULL ladder") {
    val allTied = ev(Seq(("view", 0.001), ("view", 0.001),
      ("purchase", 0.001), ("purchase", 0.001)))
    val r = Stats.mannWhitney(allTied).collect()
    // R1d = 2·(2·0 + 4 + 1)/... per-cell avg double-rank = 5, c1 = 2 →
    // r1d = 10, u1_x2 = 10 − 6 = 4 = n1·n2 → z undefined
    assert(r(0).getLong(2) == 4L && r(0).getLong(3) == 0L && r(0).isNullAt(4),
      s"got ${r.toSeq}")
  }
}
