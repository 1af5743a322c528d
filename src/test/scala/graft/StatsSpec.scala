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
