package graft

import graft.operators.{Temporal, TextAnalysis}
import org.apache.spark.sql.Row

/** Hand-computed fixtures for the round-13 text/survival additions. */
class TextSurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("nelson-aalen: hand fixture and risk-set agreement with KM") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t25h = java.sql.Timestamp.valueOf("2024-01-02 01:00:00")
    // u1 signs up at t0 and purchases 25h later (day 1); u2 signs up
    // at t0 and is censored at the horizon (= the purchase ts, also
    // day 1): day 1 has d=1, c=1, n_risk=2 → H = ⌊10⁶/2⌋ = 500000
    val ev = Seq((1L, t0, 1L, "signup"), (1L, t25h, 2L, "purchase"),
      (2L, t0, 3L, "signup"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val na = Temporal.nelsonAalen(ev).collect()
    assert(na.toSeq == Seq(Row(1L, 2L, 1L, 1L, 500000L)), s"got ${na.toSeq}")
    // on real data: same day/risk/event columns as KM (shared day
    // table), H nondecreasing, and H ≤ −ln S wherever S is defined
    // (−ln(1−x) ≥ x termwise)
    val evR = Tables.events(spark, sf0001)
    val kmR = Temporal.survivalKm(evR).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val naR = Temporal.nelsonAalen(evR).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(kmR.map(t => (t._1, t._2, t._3, t._4)).toSeq ==
      naR.map(t => (t._1, t._2, t._3, t._4)).toSeq,
      "KM and NA must agree on the day/risk-set table")
    assert(naR.map(_._5).sliding(2).forall(s => s.length < 2 || s(0) <= s(1)),
      "cumulative hazard must be nondecreasing")
    kmR.zip(naR).foreach { case (km, na2) =>
      km._5.foreach(lnS => assert(na2._5 <= -lnS + 300,
        s"H must be <= -ln S (+ladder slack) at day ${km._1}"))
    }
  }

  test("logrank: hand fixture O/E/V terms, sign, and ladder") {
    // variants by user_id % 2: u0,u2 → 0; u1,u3 → 1. All sign up at
    // t0; u0 and u1 convert on day 1, u2 on day 2, u3 censored day 3.
    // Day 1: n=4, n1=2, d=2, d1=1 → e1 = (10⁶·2·2) div 4 = 1,000,000,
    //   v = (10⁶·2·2·2·2) div (16·3) = 333,333.
    // Day 2: n=2, n1=1, d=1, d1=0 → e1 = 500,000, v = 250,000.
    // O1 = 1 → 10⁶·O1 − E1 = −500,000 (sign −1);
    // ln z² = 100·(2·ln4(5·10⁵) − ln4(583333) − ln4(10⁶))
    //       = 100·(2·131224 − 132765 − 138155) = −847,200.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (0L, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (1L, ts("2024-01-01 00:00:00"), 2L, "signup"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "signup"),
      (3L, ts("2024-01-01 00:00:00"), 4L, "signup"),
      (0L, ts("2024-01-02 01:00:00"), 5L, "purchase"),
      (1L, ts("2024-01-02 02:00:00"), 6L, "purchase"),
      (2L, ts("2024-01-03 01:00:00"), 7L, "purchase"),
      (3L, ts("2024-01-04 00:30:00"), 8L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Temporal.logrankConversion(ev).collect()
    assert(r.toSeq == Seq(Row(4L, 2L, 1L, 1500000L, 583333L, -1L, -847200L)),
      s"got ${r.toSeq}")
  }

  test("cohort retention: two-week fixture with exact permille floor-divs") {
    // X = 2024-01-04 is epoch day 19726 = 7·2818, so cohorts split
    // cleanly: A,B sign up in week 2818, C in week 2819. A purchases
    // at offset 1 (day X+8), C at offset 1 (day X+15); signups
    // themselves are offset-0 activity.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val base = java.time.LocalDate.of(2024, 1, 4).toEpochDay / 7
    val ev = Seq(
      (10L, ts("2024-01-04 08:00:00"), 1L, "signup"),
      (11L, ts("2024-01-04 09:00:00"), 2L, "signup"),
      (12L, ts("2024-01-11 08:00:00"), 3L, "signup"),
      (10L, ts("2024-01-12 10:00:00"), 4L, "purchase"),
      (12L, ts("2024-01-19 10:00:00"), 5L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Temporal.cohortRetention(ev).collect()
    assert(r.toSeq == Seq(
      Row(base, 0L, 2L, 2L, 1000L), Row(base, 1L, 2L, 1L, 500L),
      Row(base + 1, 0L, 1L, 1L, 1000L), Row(base + 1, 1L, 1L, 1L, 1000L)),
      s"got ${r.toSeq} (base $base)")
  }

  test("conversion windows: hand cohort converts at exactly one of three horizons") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t30m = java.sql.Timestamp.valueOf("2024-01-01 00:30:00")
    val t3d = java.sql.Timestamp.valueOf("2024-01-04 00:00:00")
    // u1 converts in 30 min (all three windows); u2 converts in 3 days
    // (only the 168 h window); u3 never converts
    val ev = Seq((1L, t0, 1L, "signup"), (1L, t30m, 2L, "purchase"),
      (2L, t0, 3L, "signup"), (2L, t3d, 4L, "purchase"),
      (3L, t0, 5L, "signup"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Temporal.conversionWindows(ev).collect().map(_.toSeq)
    assert(r.toSeq == Seq(
      Seq(1L, 3L, 1L, 333333L), Seq(24L, 3L, 1L, 333333L),
      Seq(168L, 3L, 2L, 666666L)), s"got ${r.toSeq}")
  }

  test("entropy rate: a deterministic alternating chain has zero conditional entropy") {
    val ts = (i: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    // a,b,a,b: transitions a→b (x2), b→a (x1) — every from-state fully
    // determines the next → H(next|prev) = 0 exactly; H(next) =
    // ln3 − (2/3)ln2 → ladder (100·(3·10986 − 2·6931)) // 3 = 636533
    val ev = Seq((1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"),
      (1L, ts(3), 3L, "a"), (1L, ts(4), 4L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Temporal.entropyRate(ev).collect()(0)
    assert(r.toSeq == Seq(3L, 2L, 0L, 636533L), s"got $r")
  }

  test("keyness: an exclusive token scores the exact 12·ln2 G² with sign +1") {
    // s0 = 'zzz zzz zzz', s1 = 'aaa aaa aaa': for (zzz, s0) the 2x2 is
    // diagonal (3,0,0,3) → G² = 12·ln2; ladder: f(3)=3·10986,
    // f(6)=6·17918 → 200·(2f(3) − 4f(3) + f(6)) = 8318400
    val docs = Seq((1L, "zzz zzz zzz", "en", "s0"),
      (2L, "aaa aaa aaa", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    // the 2×2 is symmetric, so the DEPLETED token ('aaa' absent from
    // s0) scores the identical G² — both rows carry 8318400, ranked
    // by the token tie-break, with opposite signs
    val r = TextAnalysis.tokenKeynessG2(docs, kCand = 50, kSel = 2).collect()
    val s0 = r.filter(_.getString(0) == "s0").map(_.toSeq).toSet
    assert(s0 == Set(Seq("s0", 1L, "aaa", 0L, 3L, -1L, 8318400L),
      Seq("s0", 2L, "zzz", 3L, 3L, 1L, 8318400L)), s"got $s0")
    val s1 = r.filter(_.getString(0) == "s1").map(_.toSeq).toSet
    assert(s1 == Set(Seq("s1", 1L, "aaa", 3L, 3L, 1L, 8318400L),
      Seq("s1", 2L, "zzz", 0L, 3L, -1L, 8318400L)), s"got $s1")
  }

  test("readability: hand fixture totals and quantized Flesch composition") {
    // 'the cat. the dog!': W=4 tokens, S = 2 terminator runs + 1 = 3,
    // Y = 4 vowel groups → wps=1333, spw=1000,
    // fre = 206835 − ⌊1015·1333/1000⌋=1352 − 84600 = 120883
    val docs = Seq((1L, "the cat. the dog!", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.readabilityScores(docs).collect()
    assert(r.toSeq == Seq(Row("en", 1L, 4L, 3L, 4L, 1333L, 1000L, 120883L)),
      s"got ${r.toSeq}")
  }

  test("vocab growth: unique-token-per-doc corpus climbs one decile at a time") {
    // docs 0..9, doc i contributes shared 'xx' plus the unique token
    // 't'·(i+1) (digits are NOT tokens under [A-Za-z']+): decile i+1
    // gains exactly one token, decile 1 gains two
    val docs = (0 until 10).map(i => (i.toLong, s"xx ${"t" * (i + 1)}",
        "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.vocabGrowth(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val expect = (1 to 10).map(k =>
      (k.toLong, if (k == 1) 2L else 1L, (k + 1).toLong))
    assert(r.toSeq == expect, s"got ${r.toSeq}")
  }
}
