package graft

import graft.operators.{Pipeline, TextAnalysis}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pipeline-suite invariants: chunk coverage, vocab band limits,
  * novelty bounds, gap-fill density, and rolling-frame self-inclusion. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pii_redact counts and scrubs every pattern class exactly") {
    val df = Seq(
      (1L, "write to alice.smith@example.org or call 555-0134 from 192.168.1.10"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val rows = TextAnalysis.redactPii(df)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(rows(0) == ((1L, 1L, 1L, 1L,
      "write to <EMAIL> or call <PHONE> from <IP>")), s"got ${rows(0)}")
    assert(rows(1) == ((2L, 0L, 0L, 0L, "no pii here at all")), s"got ${rows(1)}")
  }

  test("seedPii plants every pattern class on its deterministic subset") {
    val seeded = TextAnalysis.redactPii(
      TextAnalysis.seedPii(Tables.documents(spark, sf0001)))
    val n = Tables.documents(spark, sf0001).count()
    val got = seeded.agg(
      sum(when($"n_email" > 0, 1L).otherwise(0L)),
      sum(when($"n_phone" > 0, 1L).otherwise(0L)),
      sum(when($"n_ip" > 0, 1L).otherwise(0L)))
      .as[(Long, Long, Long)].head()
    // ids are 0..n-1, so ceil(n/5) etc. multiples carry each class
    assert(got == (((n + 4) / 5, (n + 6) / 7, (n + 10) / 11)), s"got $got for n=$n")
  }

  test("blocklist_gate flags exactly the blocklisted token mass") {
    val df = Seq(
      (1L, "customer merge table"),
      (2L, "table scan only")).toDF("doc_id", "text")
    val rows = TextAnalysis.blocklistGate(df)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(rows(0) == ((1L, 3L, 2L, 0.666667, false)), s"got ${rows(0)}")
    assert(rows(1) == ((2L, 3L, 0L, 0.0, true)), s"got ${rows(1)}")
  }

  test("boilerplate_coverage marks grams shared by >= minDocs docs") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon one"),
      (2L, "alpha beta gamma delta epsilon two"),
      (3L, "alpha beta gamma delta epsilon three"),
      (4L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val rows = TextAnalysis.boilerplateCoverage(df)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // docs 1-3: 2 grams each, the shared one ("alpha..epsilon") in 3 docs
    (0 to 2).foreach(i =>
      assert(rows(i) == ((i + 1L, 2L, 1L, 0.5)), s"got ${rows(i)}"))
    assert(rows(3) == ((4L, 1L, 0L, 0.0)), s"got ${rows(3)}")
  }

  test("count-min sketch never underestimates; exact on a collision-free corpus") {
    val top = TextAnalysis.cmsTokenCounts(Tables.documents(spark, sf0001))
      .as[(String, Long, Long, Boolean)].collect()
    // the synthetic vocabulary is ~31 tokens — top-50 returns all of them
    assert(top.nonEmpty && top.length <= 50)
    assert(top.forall(_._4), "CMS must never underestimate")
    // tiny corpus, 2 tokens, 4×4096 cells: md5 buckets are deterministic
    // and (verified) collision-free here, so min-over-rows is exact
    val small = Seq((1L, "aaa aaa aaa bbb")).toDF("doc_id", "text")
    val rows = TextAnalysis.cmsTokenCounts(small)
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("aaa", 3L, 3L, true), ("bbb", 1L, 1L, true)),
      s"got ${rows.toSeq}")
  }

  test("bigram_lm_score matches hand-computed smoothed log-probs") {
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val rows = TextAnalysis.bigramLmScore(df)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // c2(a b)=2, c2(a c)=1, c1(a)=3, V=3 (micro-units since r12):
    //   docs 1,2: ln(3/6)  = -0.6931472 -> lp4 -6931 -> -693100
    //   doc 3:    ln(2/6)  = -1.0986123 -> lp4 -10986 -> -1098600
    assert(rows(0) == ((1L, 1L, -693100L)), s"got ${rows(0)}")
    assert(rows(1) == ((2L, 1L, -693100L)), s"got ${rows(1)}")
    assert(rows(2) == ((3L, 1L, -1098600L)), s"got ${rows(2)}")
  }

  test("doc_chunks covers every document with ceil(n/stride) chunks") {
    val docs = Tables.documents(spark, sf0001)
    val chunks = Pipeline.docChunks(docs)
    val perDoc = chunks.groupBy($"doc_id").agg(count(lit(1)).as("n_chunks"))
    val expected = docs
      .select($"doc_id",
        size(regexp_extract_all(lower($"text"), lit("[a-z']+"), lit(0))).as("n"))
      .filter($"n" > 0)
      .select($"doc_id", ceil($"n".cast("double") / 24.0).cast("long").as("exp"))
    val mismatches = perDoc.join(expected, "doc_id")
      .filter($"n_chunks" =!= $"exp").count()
    assert(mismatches == 0)
  }

  test("doc_chunks first chunk is the document's first 32 tokens") {
    val docs = Tables.documents(spark, sf0001)
    val first = Pipeline.docChunks(docs).filter($"chunk_id" === 0)
      .select($"doc_id", $"chunk")
    val expected = docs
      .select($"doc_id",
        concat_ws(" ", slice(
          regexp_extract_all(lower($"text"), lit("[a-z']+"), lit(0)), 1, 32)).as("exp"))
    assert(first.join(expected, "doc_id").filter($"chunk" =!= $"exp").count() == 0)
  }

  test("vocab_prune keeps only tokens within the df band") {
    val nDocs = Tables.documents(spark, sf0001).count()
    val kept = Pipeline.vocabPrune(Tables.documents(spark, sf0001))
      .as[(String, Long)].collect()
    kept.foreach { case (_, df) =>
      assert(df >= 2 && df <= nDocs / 2)
    }
  }

  test("bigram_novelty is a proper fraction and unique ≤ total") {
    val bad = Pipeline.bigramNovelty(Tables.documents(spark, sf0001))
      .filter($"novelty" < 0.0 || $"novelty" > 1.0 || $"n_unique" > $"n_bigrams")
      .count()
    assert(bad == 0)
  }

  test("gap_fill emits a dense grid and preserves the total event count") {
    val events = Tables.events(spark, sf0001)
    val filled = Pipeline.gapFillCounts(events)
    val nTypes = events.select($"event_type").distinct().count()
    val buckets = filled.select($"bucket").distinct().count()
    assert(filled.count() == nTypes * buckets, "grid must be dense (type × bucket)")
    val total = filled.agg(sum($"n_events")).as[Long].head()
    assert(total == events.count(), "zero-fill must not change the total")
  }

  test("rolling_hour frame always includes the event itself") {
    val res = Pipeline.rollingHour(Tables.events(spark, sf0001))
    assert(res.filter($"n_in_hour" < 1).count() == 0)
  }

  test("knn_classify votes are bounded by k and labels come from the corpus") {
    val emb = Tables.embeddings(spark, sf0001)
    val labels = emb.select($"label").distinct().as[Int].collect().toSet
    val res = Pipeline.knnClassify(emb).as[(Long, Int, Int, Long)].collect()
    assert(res.length == 32)
    res.foreach { case (_, _, pred, votes) =>
      assert(votes >= 1 && votes <= 5)
      assert(labels.contains(pred))
    }
  }

  test("scd2 periods tile each user's timeline with alternating types") {
    val events = Tables.events(spark, sf0001)
    val hist = Pipeline.scd2History(events)
    assert(hist.agg(sum($"n_events")).as[Long].head() == events.count())
    // valid_to must equal the next period's valid_from (half-open tiling)
    val broken = hist
      .withColumn("next_from",
        lead($"valid_from", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"period_id")))
      .filter($"valid_to".isNotNull && $"valid_to" =!= $"next_from")
      .count()
    assert(broken == 0)
    // adjacent periods never share a type (else they'd be one period)
    val merged = hist
      .withColumn("prev_type",
        lag($"event_type", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"period_id")))
      .filter($"prev_type".isNotNull && $"prev_type" === $"event_type")
      .count()
    assert(merged == 0)
  }

  test("corr_price_items yields a valid correlation and positive slope") {
    val (n, r, slope) = Pipeline.priceItemsCorr(spark, sf0001)
      .as[(Long, Double, Double)].head()
    assert(n > 0)
    assert(r >= -1.0 && r <= 1.0)
    assert(!slope.isNaN && !slope.isInfinite)
  }

  test("unpivot inverts the daily pivot (dense grid, totals preserved)") {
    val events = Tables.events(spark, sf0001)
    val long = graft.operators.Temporal.dailyTypeUnpivot(events)
    val days = events.select(date_trunc("day", $"ts")).distinct().count()
    assert(long.count() == days * 5, "unpivot must keep zero-count cells")
    assert(long.agg(sum($"n_events")).as[Long].head() == events.count())
  }

  test("value_histogram CDF is monotone and ends at 1.0") {
    val rows = Pipeline.valueHistogram(Tables.events(spark, sf0001))
      .select($"cdf").as[Double].collect()
    assert(rows.last == 1.0)
    assert(rows.sameElements(rows.sorted))
  }

  test("window_first_last: bounds ordered, second_key null iff single order") {
    val res = Pipeline.firstLastOrders(spark, sf0001)
    assert(res.filter($"first_date" > $"last_date").count() == 0)
    assert(res.filter($"n_orders" === 1 && $"second_key".isNotNull).count() == 0)
    assert(res.filter($"n_orders" > 1 && $"second_key".isNull).count() == 0)
  }

  test("mode_quantity is the arg-max of the per-flag count table") {
    val counts = Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag", $"l_quantity").agg(count(lit(1)).as("cnt"))
    val maxCnt = counts.groupBy($"l_returnflag").agg(max($"cnt").as("max_cnt"))
    val modes = Pipeline.modeQuantity(spark, sf0001)
    val bad = modes.join(maxCnt, "l_returnflag")
      .filter($"mode_count" =!= $"max_cnt").count()
    assert(bad == 0)
  }

  test("revenue_share shares sum to 1 within rounding") {
    val shares = Pipeline.revenueShare(spark, sf0001)
      .select($"share").as[Double].collect()
    assert(math.abs(shares.sum - 1.0) < 1e-4)
  }

  test("cumulative_users ends at the distinct user count") {
    val events = Tables.events(spark, sf0001)
    val last = Pipeline.cumulativeUsers(events)
      .orderBy($"day".desc).select($"cum_users").as[Long].head()
    assert(last == events.select($"user_id").distinct().count())
  }

  test("fuzzy_name_pairs only reports within-brand pairs with dist in [1,3]") {
    val pairs = Pipeline.fuzzyNamePairs(spark, sf0001)
      .as[(String, Long, Int)].collect()
    pairs.foreach { case (_, n, minDist) =>
      assert(n > 0)
      assert(minDist >= 1 && minDist <= 3)
    }
  }

  test("retention cohorts: offset-0 cell equals the cohort size") {
    val events = Tables.events(spark, sf0001)
    val cohorts = Pipeline.retentionCohorts(events)
    // every user is active on their own first-seen day, so the
    // day_offset=0 diagonal must count the whole cohort
    val sizes = events
      .select($"user_id", date_trunc("day", $"ts").as("day"))
      .groupBy($"user_id").agg(min($"day").as("cohort_day"))
      .groupBy($"cohort_day").agg(count(lit(1)).as("cohort_size"))
    val bad = cohorts.filter($"day_offset" === 0)
      .join(sizes, "cohort_day")
      .filter($"n_active" =!= $"cohort_size").count()
    assert(bad == 0)
    assert(cohorts.filter($"day_offset" < 0).count() == 0)
  }

  test("set_ops_all matches multiset min / difference arithmetic") {
    val orders = Tables.orders(spark, sf0001)
    def counts(yr: Int) = orders.filter(year($"o_orderdate") === yr)
      .groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    val c97 = counts(1997)
    val c98 = counts(1998)
    val got = Pipeline.setOpsAll(spark, sf0001)
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (op, rows) =>
        op -> rows.map(r => r._2 -> r._3).toMap }
    val keys = (c97.keySet ++ c98.keySet)
    keys.foreach { k =>
      val inter = math.min(c97.getOrElse(k, 0L), c98.getOrElse(k, 0L))
      val diff = math.max(0L, c97.getOrElse(k, 0L) - c98.getOrElse(k, 0L))
      assert(got.getOrElse("intersect_all", Map.empty).getOrElse(k, 0L) == inter,
        s"intersect_all wrong for $k")
      assert(got.getOrElse("except_all", Map.empty).getOrElse(k, 0L) == diff,
        s"except_all wrong for $k")
    }
  }

  test("null_funcs: NULLIF and COALESCE paths agree") {
    val bad = Pipeline.nullFuncs(spark, sf0001)
      .filter($"n_zero_disc" =!= $"n_coalesced").count()
    assert(bad == 0)
  }

  test("lateral top-2 equals the window row_number formulation") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val windowed = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"o_custkey".as("c_custkey"), $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSet
    val lateral = Pipeline.lateralTop2Orders(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSet
    // lateral runs over customer (outer), so customers with zero orders
    // drop on both sides (inner lateral join ≡ window over orders)
    assert(lateral == windowed,
      s"lateral != window: ${(windowed -- lateral).take(3)} ${(lateral -- windowed).take(3)}")
  }

  test("quality_weighted_sample keeps a quality-bounded subset per language") {
    val rows = graft.operators.TextAnalysis
      .qualityWeightedSample(Tables.documents(spark, sf0001))
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, total, kept, qMicro) =>
      assert(kept >= 0 && kept <= total)
      // micro-quality sum of kept docs is bounded by kept * max quality (1.0)
      assert(qMicro >= 0 && qMicro <= kept * 1000000L)
    }
    // weighting must actually drop something and keep something overall
    val (t, k) = (rows.map(_._2).sum, rows.map(_._3).sum)
    assert(k > 0 && k < t)
  }

  test("source_mix_rebalance caps overrepresented sources at the equal-share target") {
    val docs = Tables.documents(spark, sf0001)
    val rows = graft.operators.TextAnalysis.sourceMixRebalance(docs)
      .as[(String, Long, Double, Long)].collect()
    assert(rows.map(_._1).toSet ==
      docs.select($"source").distinct().as[String].collect().toSet,
      "every source gets an audit row")
    val total = rows.map(_._2).sum.toDouble
    val target = total / rows.length
    rows.foreach { case (src, nDocs, rate, kept) =>
      assert(kept >= 0 && kept <= nDocs)
      assert(rate > 0.0 && rate <= 1.0, s"$src rate $rate out of range")
      // underrepresented sources are kept whole (rate 1); overrepresented
      // ones are rated at target/n so their EXPECTED kept count is the
      // equal share
      if (nDocs <= target) assert(rate == 1.0, s"$src under target but rate $rate")
      else assert(math.abs(rate * nDocs - target) < 1e-6, s"$src expected-kept off target")
    }
  }

  test("merge-upsert conserves event counts and exact value totals") {
    val events = Tables.events(spark, sf0001)
    val merged = Pipeline.mergeUpsertState(events)
    assert(merged.select($"user_id").distinct().count() == merged.count())
    assert(merged.agg(sum($"n_events")).as[Long].head() == events.count())
    val totalMerged = merged.agg(
      sum(graft.functions.Exact.dec2($"total_value"))).as[java.math.BigDecimal].head()
    val totalRaw = events.agg(
      sum(graft.functions.Exact.dec2($"value"))).as[java.math.BigDecimal].head()
    assert(totalMerged.compareTo(totalRaw) == 0,
      s"merged total $totalMerged != raw total $totalRaw")
  }

  test("heavy hitters: MG candidates bound the scan, result equals exact") {
    val docs = Tables.documents(spark, sf0001)
    val k = 32
    val got = graft.operators.TextAnalysis.heavyHitterTokens(docs, k)
      .as[(String, Long)].collect().toSeq
    assert(got.nonEmpty, "corpus should have some heavy tokens at k=32")
    // ground truth: plain exact count with the same integer threshold
    val tokens = docs.select(
      explode(regexp_extract_all(lower($"text"), lit("[a-z']+"), lit(0))).as("token"))
    val n = tokens.count()
    val exact = tokens.groupBy($"token").agg(count(lit(1)).as("freq"))
      .filter($"freq" * k > n)
      .orderBy($"freq".desc, $"token".asc)
      .as[(String, Long)].collect().toSeq
    assert(got == exact, "two-pass MG result must equal the exact heavy-hitter set")
  }

  test("char-ngram confusion matrix accounts for every classifiable doc") {
    val docs = Tables.documents(spark, sf0001)
    val conf = graft.operators.TextAnalysis.charNgramLangConfusion(docs)
    val classified = conf.agg(sum($"n_docs")).as[Long].head()
    // every doc with >= 3 chars produces trigrams, and the top-30
    // profiles cover the shared vocabulary, so all docs classify
    assert(classified == docs.filter(length(lower($"text")) >= 3).count())
    assert(conf.filter($"n_docs" <= 0).count() == 0)
  }

  test("daily_anomalies only flags days beyond 2 sigma") {
    val res = Pipeline.dailyAnomalies(Tables.events(spark, sf0001))
    assert(res.filter(abs($"z") <= 2.0).count() == 0)
  }

  test("token_cooccurrence pairs are ordered, bounded by corpus size") {
    val nDocs = Tables.documents(spark, sf0001).count()
    val rows = Pipeline.tokenCooccurrence(Tables.documents(spark, sf0001))
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { case (a, b, n) =>
      assert(a < b, "pair must be canonically ordered")
      assert(n >= 1 && n <= nDocs)
    }
    val counts = rows.map(_._3)
    assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)))
  }

  test("point-in-time join never serves a stale or future feature") {
    val events = Tables.events(spark, sf0001)
    val res = Pipeline.pointInTimeSignup(events)
    assert(res.count() ==
      events.filter($"event_type" === "purchase").count(),
      "every purchase must appear exactly once")
    val bad = res.filter($"feature_signup".isNotNull &&
      ($"feature_signup" > $"purchase_ts" || $"feature_age_ms" > 7L * 86400000))
      .count()
    assert(bad == 0)
  }

  test("first-touch attribution accounts for every purchase") {
    val events = Tables.events(spark, sf0001)
    val total = Pipeline.firstTouchAttribution(events)
      .agg(sum($"n_purchases")).as[Long].head()
    assert(total == events.filter($"event_type" === "purchase").count())
  }

  test("user_state_diff emits exactly the users whose state changed") {
    val events = Tables.events(spark, sf0001)
    val diff = Pipeline.userStateDiff(events)
    assert(diff.filter($"change" === "inserted" && $"n_before" =!= 0).count() == 0)
    assert(diff.filter($"change" === "deleted" && $"n_after" =!= 0).count() == 0)
    assert(diff.filter($"change" === "updated" &&
      ($"n_before" === 0 || $"n_after" === 0)).count() == 0)
    // an emitted 'updated' user really changed (count differs — totals
    // are a superset trigger), and every non-emitted user is identical
    // across the snapshots on BOTH count and total
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    val b = events.filter($"ts" < cut).groupBy($"user_id")
      .agg(count(lit(1)).as("nb"), sum(graft.functions.Exact.dec2($"value")).as("tb"))
    val a = events.filter($"ts" >= cut).groupBy($"user_id")
      .agg(count(lit(1)).as("na"), sum(graft.functions.Exact.dec2($"value")).as("ta"))
    val unchanged = b.join(a, "user_id")
      .filter($"nb" === $"na" && $"tb" === $"ta")
      .select($"user_id")
    assert(diff.join(unchanged, "user_id").count() == 0)
    val expected = events.select($"user_id").distinct().count() - unchanged.count()
    assert(diff.count() == expected)
  }

  test("temperature mix flattens the source distribution (alpha = 0.5)") {
    // skewed sources: per-doc keep threshold must DECREASE with source
    // size (sub-linear sampling), and per-source kept <= n_docs
    val docs = (0 until 129).map { i =>
      val src = if (i < 100) "big" else if (i < 125) "mid" else "tiny"
      (i.toLong, s"doc number $i content", src)
    }.toDF("doc_id", "text", "source")
    val rows = TextAnalysis.temperatureMix(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nB, tB, kB) = rows("big")
    val (nM, tM, kM) = rows("mid")
    val (nT, tT, kT) = rows("tiny")
    assert(nB == 100 && nM == 25 && nT == 4)
    assert(tB < tM && tM < tT, s"thresholds not monotone: $tB $tM $tT")
    assert(kB <= nB && kM <= nM && kT <= nT)
    // alpha=0.5 keeps the big source's EXPECTED share sub-proportional:
    // threshold ratio big/tiny = sqrt(tiny/big) = 1/5
    assert(math.abs(tB.toDouble / tT - math.sqrt(4.0 / 100)) < 0.01)
  }

  test("heaps exponent: a linear vocabulary corpus fits alpha = 1 exactly; real data sublinear") {
    // 10 docs (ids 0..9, one per decile), each contributing exactly 2
    // NEW tokens and 2 occurrences: V_i = N_i at every decile, so
    // every (x, y) point is on y = x and the integer-Cramer slope is
    // exactly 1e6 micro
    val docs = (0 until 10).map { i =>
      val c = ('a' + i).toChar
      (i.toLong, s"${c}a ${c}b")
    }.toDF("doc_id", "text")
    val r = TextAnalysis.heapsExponent(docs).collect()
    assert(r.toSeq == Seq(Row(10L, 20L, 20L, 1000000L)), s"got ${r.toSeq}")
    // the real fixture corpus: 10 points, alpha in [0, 1e6]. The
    // driver's documents use a FIXED 31-word vocabulary, so V
    // saturates inside decile 1 and the exact slope is 0 — the
    // flattened-curve readout is the correct answer here (a growing
    // vocabulary is the GenSf vocabN lever, exercised in the
    // similarity-join scaling experiments)
    val real = TextAnalysis.heapsExponent(Tables.documents(spark, sf0001))
      .collect()(0)
    assert(real.getLong(0) == 10L && real.getLong(3) >= 0L
      && real.getLong(3) <= 1000000L, s"got $real")
  }

  test("weighted A-ES sample matches a plain-Scala recompute of the exact keys") {
    val d = Tables.documents(spark, sf0001)
    val got = TextAnalysis.weightedSampleAes(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.size == TextAnalysis.AesSampleK)
    // independent recompute: md5 20-bit u, ladder penalty, floor-div
    // key, 64 smallest (key, doc_id)
    def md5hex(s: String) = {
      val m = java.security.MessageDigest.getInstance("MD5")
      m.digest(s.getBytes).map("%02x".format(_)).mkString
    }
    val tok = "[a-z']+".r
    val all = d.select("doc_id", "text").collect().flatMap { r =>
      val w = tok.findAllIn(r.getString(1).toLowerCase).length.toLong
      if (w == 0) None else {
        val u20 = md5hex(r.getLong(0).toString).take(5)
          .foldLeft(0L)((a, c) => a * 16 + Integer.parseInt(c.toString, 16))
        val pen = TextAnalysis.AesLnMax -
          math.floor(math.log((u20 + 1).toDouble) * 10000.0 + 0.5).toLong
        Some((r.getLong(0), w, (1000000L * pen) / w))
      }
    }
    val expect = all.sortBy(t => (t._3, t._1)).take(TextAnalysis.AesSampleK)
      .sortBy(_._1).toSeq
    assert(got == expect, s"sample disagrees with the recompute")
    // stability under repartitioning (TakeOrdered, not partition luck)
    val again = TextAnalysis.weightedSampleAes(d.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again == got)
  }

  test("neyman sampler: hand-computed weights, Hamilton extras, caps, realization") {
    // arithmetic 3-progressions make S_h EXACT: token counts {a-d, a,
    // a+d} give v = 6d^2 and v/(n(n-1)) = d^2, so w = 3*d*2^20 on
    // paper. Strata: A=(en,s0) counts {1,3,5} -> w = 6291456;
    // C=(en,s1) counts {1,2,3} -> w = 3145728; B=(de,s0) counts {2,2}
    // (zero variance) -> w = 0. W = 9437184. K=5 Hamilton:
    // A: 31457280 // W = 3 rem 3145728; C: 15728640 // W = 1 rem
    // 6291456; B: 0. fl_sum = 4, one extra -> C (larger remainder).
    // k_alloc = A 3 (== n, all sampled), C 2, B 0.
    def words(n: Int) = (1 to n).map(i => "w" + i).mkString(" ")
    val docs = Seq(
      (1L, "en", "s0", words(1)), (2L, "en", "s0", words(3)),
      (3L, "en", "s0", words(5)),
      (4L, "en", "s1", words(1)), (5L, "en", "s1", words(2)),
      (6L, "en", "s1", words(3)),
      (7L, "de", "s0", words(2)), (8L, "de", "s0", words(2))
    ).toDF("doc_id", "lang", "source", "text")
    val got = TextAnalysis.stratifiedNeyman(docs, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6))).toMap
    assert(got(("en", "s0")) == ((3L, 6291456L, 3L, 3L, 1L)), s"$got")
    assert(got(("en", "s1"))._1 == 3L && got(("en", "s1"))._2 == 3145728L
      && got(("en", "s1"))._3 == 2L && got(("en", "s1"))._4 == 2L, s"$got")
    assert(got(("de", "s0")) == ((2L, 0L, 0L, 0L, -1L)), s"$got")
    // budget conserved: total realized == min(K, reachable)
    assert(got.values.map(_._4).sum == 5L)
  }

  test("token KL drift: non-negative up to quantization, totals conserved") {
    val rows = TextAnalysis.tokenKlDrift(Tables.documents(spark, sf0001)).collect()
    assert(rows.map(_.getString(0)).toSet === Set("train", "val", "test"))
    // true KL >= 0; the 1e-4 log quantization can dip a hair below
    // (kl_micro is exact 1e-6 units since r12)
    rows.foreach(r => assert(r.getLong(3) >= -100L, r.toString))
    val totalToks = rows.map(_.getLong(1)).sum
    val direct = Tables.documents(spark, sf0001)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z'']+', 0)")))
      .count()
    assert(totalToks === direct)
  }

  test("fixed-size sample is exactly k, stable under repartitioning") {
    val d = Tables.documents(spark, sf0001)
    val a = TextAnalysis.fixedSizeSample(d, 64).collect().map(_.getLong(0)).toSeq
    val b = TextAnalysis.fixedSizeSample(d.repartition(13), 64)
      .collect().map(_.getLong(0)).toSeq
    assert(a.size == 64 && a == b)
    // and it is the true hash-order prefix: every sampled id's md5 is
    // <= every unsampled id's md5 (plain-Scala recompute)
    def h(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes).map("%02x".format(_)).mkString
    }
    val all = d.select("doc_id").collect().map(_.getLong(0))
    val maxIn = a.map(h).max
    assert(all.filterNot(a.contains(_)).forall(h(_) >= maxIn))
  }

  test("recursive EMA equals a plain-Scala fold over quarterly revenue") {
    val got = operators.Relational.recursiveQuarterlyEma(spark, sf0001).collect()
    val monthly = got.map(r => r.getLong(2)) // revenue_cents, ordered by idx
    val ema = monthly.tail.scanLeft(monthly.head) { (e, rev) =>
      Math.floorDiv(e * 9 + rev, 10)
    }
    assert(got.map(_.getLong(3)).toSeq === ema.toSeq)
    assert(got.length >= 12) // multiple years of quarters — real recursion depth
    // depth-bound pin: the operator relies on Spark's DEFAULT
    // cteRecursionLevelLimit (it deliberately leaves the session conf
    // untouched); the quarter count must stay far under it, and the
    // default must not have been lowered somewhere
    val limit = spark.conf.get("spark.sql.cteRecursionLevelLimit").toInt
    assert(got.length + 1 <= limit,
      s"recursion depth ${got.length} would exceed limit $limit")
  }

  test("equi-depth histogram: buckets balanced, boundaries ordered") {
    val rows = operators.Relational.equidepthHistogram(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    val n = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val share = r.getLong(1).toDouble / n
      assert(share > 0.2 && share < 0.3, s"bucket ${r.getLong(0)} share $share")
    }
    // contiguous: each bucket's hi <= next bucket's lo
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2))
    }
  }

  test("bucketed global rank equals a single-sort mirror") {
    val d = Tables.documents(spark, sf0001)
    val got = Pipeline.md5GlobalRank(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def h(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes).map("%02x".format(_)).mkString
    }
    val expected = d.select("doc_id").collect().map(_.getLong(0))
      .sortBy(id => (h(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got === expected)
  }

  test("negative samples: k per probe, never the probe itself, flags exact") {
    val d = Tables.documents(spark, sf0001)
    val clusters = operators.SharedIntermediates.textClusters(spark, sf0001)
    val clusterOf = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Pipeline.negativeSamples(d, clusters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val perProbe = rows.groupBy(_._1)
    assert(perProbe.keySet === clusterOf.keySet)
    perProbe.foreach { case (doc, ss) =>
      assert(ss.length == 3 && ss.map(_._2).sorted.sameElements(Seq(0L, 1L, 2L)))
      assert(ss.forall(_._3 != doc), s"doc $doc sampled itself")
      assert(ss.map(_._3).distinct.length == 3, s"doc $doc repeated a negative")
    }
    rows.foreach { case (doc, _, neg, flag) =>
      val same = clusterOf.get(neg).contains(clusterOf(doc))
      assert(flag == same, s"flag wrong for ($doc, $neg)")
    }
  }

  test("negative samples: distinct negatives on every degenerate corpus n in 4..12") {
    // The stride construction (j·((n−1) DIV k) + 1) must yield k
    // pairwise-distinct non-self negatives for ALL n > k — including
    // the tiny corpora where the previous formula's residues could
    // coincide mod n (review finding: n=4, k=3 duplicated a negative).
    import spark.implicits._
    for (n <- 4 to 12) {
      val d = (1L to n).toDF("doc_id")
        .withColumn("text", concat(lit("doc "), col("doc_id")))
      val clusters = (1L to n).map(i => (i, i % 2)).toDF("doc_id", "cluster_id")
      val rows = Pipeline.negativeSamples(d, clusters).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      rows.groupBy(_._1).foreach { case (doc, ss) =>
        val negs = ss.map(_._2)
        assert(negs.distinct.length == 3, s"n=$n doc $doc repeated: ${negs.toList}")
        assert(!negs.contains(doc), s"n=$n doc $doc sampled itself")
      }
    }
  }

  test("sequence packing: token conservation, full sequences, dense ids") {
    val d = Tables.documents(spark, sf0001)
    val rows = Pipeline.packedSequences(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val cap = 256L
    // dense sequence ids 0..max (no empty windows in a packed stream)
    assert(rows.map(_._1).toSeq === (0L until rows.length).toSeq)
    // every sequence except the tail is exactly full; tail is partial
    rows.init.foreach { case (sid, _, nt, _, _) =>
      assert(nt == cap, s"seq $sid not full: $nt") }
    assert(rows.last._3 <= cap && rows.last._3 > 0)
    // conservation: packed tokens = corpus tokens + one separator/doc
    val totalToks = d.select(
        (size(regexp_extract_all(lower(col("text")),
          lit(operators.WordCount.TokenPattern), lit(0))) + 1).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(rows.map(_._3).sum == totalToks, "token conservation")
    // doc containment: sum of per-seq doc memberships counts each doc
    // once per spanned window; a doc spans ceil over its offset range,
    // so memberships >= nDocs with equality iff nothing ever splits
    val nDocs = d.count()
    assert(rows.map(_._2).sum >= nDocs)
    // boundary-splitting really happens on this corpus (non-vacuous)
    assert(rows.map(_._2).sum > nDocs, "expected at least one split doc")
  }

  test("source-overlap MinHash estimator tracks the exact Jaccard (MAE + identity)") {
    val d = Tables.documents(spark, sf0001)
    val est = TextAnalysis.sourceOverlapMinhash(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val exact = TextAnalysis.sourceOverlapExact(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(est.keySet === exact.keySet)
    assert(est.nonEmpty)
    // k = 32 hashes → std error ≈ √(J(1−J)/32) ≤ 0.09; mean absolute
    // error across the 190 pairs must sit well inside a few σ
    val mae = est.keys.map(p =>
      math.abs(est(p) - exact(p)) / 1e6).sum / est.size
    assert(mae < 0.12, s"estimator MAE $mae too high vs exact")
    // identity control: duplicating a source's docs as a new source
    // must estimate ≈ 1.0 (every min-hash matches on identical sets)
    import spark.implicits._
    val twin = d.filter(col("source") === "src0")
      .withColumn("source", lit("zsrc_twin"))
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val withTwin = d.unionByName(twin)
    val self = TextAnalysis.sourceOverlapMinhash(withTwin).collect()
      .find(r => r.getString(0) == "src0" && r.getString(1) == "zsrc_twin")
    assert(self.exists(_.getLong(3) == 1000000L),
      s"identical source pair must estimate exactly 1.0: ${self.map(_.toString)}")
  }

  test("doc_chunks plan stays shuffle-free up to the final sort") {
    // One exchange may come from Tables.spread (input layout) and one
    // from the deterministic orderBy; the chunking itself must not add
    // a hash shuffle of the exploded rows.
    val plan = Pipeline.docChunks(Tables.documents(spark, sf0001))
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges <= 1, s"unexpected shuffle in chunking plan:\n$plan")
  }

  test("MAD anomalies: a planted spike is the only outlier; medians are exact order stats") {
    import org.apache.spark.sql.functions.col
    // 9 ordinary days (counts 8-12) + one 1000-event spike day
    val counts = Seq(8, 9, 10, 11, 12, 8, 9, 10, 11, 1000)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((f"2024-01-${i + 1}%02d 00:00:00", "x"))
    }
    val ev = rows.toDF("tss", "event_type")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"))
    val out = operators.Pipeline.madAnomalies(ev).collect()
    assert(out.length == 10)
    // exact order statistics: med = rank-5 of sorted counts = 10, mad = 1
    out.foreach { r => assert(r.getLong(3) == 10L && r.getLong(4) == 1L) }
    val outliers = out.filter(r => !r.isNullAt(6) && r.getBoolean(6))
    assert(outliers.map(_.getLong(2)).toSeq == Seq(1000L),
      "exactly the spike day must flag")
    // degenerate MAD=0 group: identical days => NULL score and flag
    val flat = Seq.fill(4)(("2024-02-01 00:00:00", "y")) ++
      Seq.fill(4)(("2024-02-02 00:00:00", "y"))
    val flatOut = operators.Pipeline.madAnomalies(
      flat.toDF("tss", "event_type")
        .select(col("event_type"), col("tss").cast("timestamp").as("ts")))
      .collect()
    assert(flatOut.forall(r => r.isNullAt(5) && r.isNullAt(6)))
  }

  test("ks_drift: identical distributions read 0, disjoint read 1, shift localizes") {
    def ev(rows: Seq[(String, Double)]) =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // same values for both types -> every cross-multiplied CDF gap is 0
    val same = ev((1 to 40).flatMap(i =>
      Seq(("view", i.toDouble), ("click", i.toDouble))))
    val r0 = Pipeline.ksDrift(same).collect()
    assert(r0.length == 1 && r0(0).getLong(3) == 0L, s"got ${r0.toSeq}")
    // disjoint supports -> D = 1 (ks_micro = 1000000) at the last bin of
    // the low distribution
    val disj = ev((1 to 20).map(i => ("view", i.toDouble)) ++
      (1 to 20).map(i => ("click", 100.0 + i)))
    val r1 = Pipeline.ksDrift(disj).collect()
    assert(r1(0).getLong(3) == 1000000L && r1(0).getLong(4) == 20L,
      s"got ${r1.toSeq}")
    // half the mass shifted up by 50: D = 1/2, the gap growing through
    // the unshifted run and first maximal at the reference's top bin
    val shift = ev((1 to 20).map(i => ("view", i.toDouble)) ++
      ((1 to 10).map(i => ("click", i.toDouble)) ++
        (11 to 20).map(i => ("click", 50.0 + i))))
    val r2 = Pipeline.ksDrift(shift).collect()
    assert(r2(0).getLong(3) == 500000L && r2(0).getLong(4) == 20L,
      s"got ${r2.toSeq}")
  }

  test("psi_drift: identical distributions read ~0, known shift reproduces hand arithmetic") {
    def ev(rows: Seq[(String, Double)]) =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // identical mass in every bin -> every dm is exactly 0
    val same = ev((1 to 40).flatMap(i =>
      Seq(("view", i.toDouble), ("click", i.toDouble))))
    val r0 = Pipeline.psiDrift(same).collect()
    assert(r0.length == 1 && r0(0).getAs[Long]("psi_micro") == 0L &&
      r0(0).getAs[Long]("n_bins_skipped") == 0L, s"got ${r0.toSeq}")
    // 2-bin hand case: ref 10/10, compared 15/5 (n = n_ref = 20).
    // dm1 = 15*20-10*20 = 100, t4_1 = ln4(15)-ln4(10) = 27081-23026 =
    // 4055; dm2 = -100, t4_2 = ln4(5)-ln4(10) = 16094-23026 = -6932.
    // s = 405500 + 693200 = 1098700; psi = (100*s) div 400 = 274675
    // (true PSI 0.25·ln3 + ... = 0.27465 — inside a quantum)
    val shift = ev(
      (1 to 10).map(_ => ("view", 0.5)) ++ (1 to 10).map(_ => ("view", 1.5)) ++
      (1 to 15).map(_ => ("click", 0.5)) ++ (1 to 5).map(_ => ("click", 1.5)))
    val r1 = Pipeline.psiDrift(shift).collect()
    assert(r1.length == 1 && r1(0).getAs[Long]("psi_micro") == 274675L &&
      r1(0).getAs[Long]("n_bins_used") == 2L, s"got ${r1.toSeq}")
    // a compared-only bin is skipped, not summed
    val skewed = ev(Seq(("view", 0.5), ("view", 0.5), ("click", 0.5),
      ("click", 99.5)))
    val r2 = Pipeline.psiDrift(skewed).collect()
    assert(r2(0).getAs[Long]("n_bins_skipped") == 1L &&
      r2(0).getAs[Long]("n_bins_used") == 1L, s"got ${r2.toSeq}")
  }

  test("grouped_percentiles: order statistics hit the exact ranks") {
    def ev(rows: Seq[(String, Double)]) =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // values 1..100: lower order statistics at ranks 10/50/90
    val df = ev((1 to 100).map(i => ("a", i.toDouble)) ++ Seq(("b", 7.25)))
    val out = Pipeline.groupedPercentiles(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) ==
      ((100L, 1000L, 5000L, 9000L)), s"a: $a")
    // singleton group: every rank formula resolves to row 1
    val b = out("b")
    assert((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4)) ==
      ((1L, 725L, 725L, 725L)), s"b: $b")
  }

  test("token_pmi: perfect collocation reads ln(N/df), independence reads ~0") {
    def docs(texts: Seq[String]) =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
    // "alpha beta" always together in 2 of 8 docs; "gamma delta"
    // independent (each in 4 docs, together in 2 = expected)
    val df = docs(Seq(
      "alpha beta gamma delta", "alpha beta gamma delta",
      "gamma filler one", "gamma filler two",
      "delta filler three", "delta filler four",
      "filler five six", "filler seven eight"))
    val out = operators.Pipeline.tokenPmi(df, topK = 20).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // alpha+beta: n_ab=2, df=2 each, N=8 → PMI = ln(2·8/4) = ln 4
    val ab = out(("alpha", "beta"))
    assert(ab.getLong(2) == 2L && ab.getLong(5) == 100L * 13863L,
      s"collocation: $ab")
    // gamma+delta: n_ab=2, df=4 each → true PMI = ln(16/16) = 0; the
    // quantized ladder leaves at most one 1e-4 quantum of residue
    val gd = out(("delta", "gamma"))
    assert(math.abs(gd.getLong(5)) <= 100L, s"independent pair: $gd")
  }

  test("source_lang_entropy: pure source reads 0, uniform mix reads ln k") {
    def docs(rows: Seq[(String, String)]) =
      rows.zipWithIndex.map { case ((l, s), i) => (i.toLong, l, s) }
        .toDF("doc_id", "lang", "source")
    val df = docs(
      Seq.fill(8)(("en", "pure")) ++
      Seq("en", "de", "fr", "es").flatMap(l => Seq.fill(3)((l, "mixed"))))
    val out = TextAnalysis.sourceLangEntropy(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val p = out("pure")
    assert(p.getLong(1) == 8L && p.getLong(2) == 1L &&
      p.getString(3) == "en" && p.getLong(4) == 1000L &&
      p.getLong(5) == 0L, s"pure: $p")
    val m = out("mixed")
    // uniform over 4 langs: H = ln 4 = 1386300 micro on the ladder
    // (12·ln4(12) − 4·3·ln4(3) = 12·(24849 − 10986) → ·100/12)
    assert(m.getLong(2) == 4L && m.getLong(4) == 250L &&
      m.getLong(5) == 100L * (24849L - 10986L), s"mixed: $m")
    assert(m.getString(3) == "de", "tie must break to the smallest lang")
  }

  test("benford_value_audit: exact digit extraction and permille arithmetic") {
    // one value per digit 1..9, plus power-of-ten boundary cases that
    // a log10-based digit would get wrong at float precision
    val vals = (1 to 9).map(_.toDouble) ++ Seq(100.00, 99.99, 0.01)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "view", v) }
      .toDF("event_id", "event_type", "value")
    val out = Pipeline.benfordAudit(df).collect()
    val byDigit = out.map(r => r.getLong(0) -> r).toMap
    // 12 values: digit 1 gets {1.0, 100.00, 0.01} = 3, digit 9 gets
    // {9.0, 99.99} = 2, digits 2..8 one each
    assert(byDigit(1L).getLong(1) == 3L && byDigit(9L).getLong(1) == 2L,
      s"boundary digits wrong: ${out.toSeq}")
    (2 to 8).foreach(d => assert(byDigit(d.toLong).getLong(1) == 1L))
    out.foreach { r =>
      assert(r.getLong(2) == 1000L * r.getLong(1) / 12 &&
        r.getLong(4) == r.getLong(2) - r.getLong(3), s"arithmetic: $r")
    }
    // the interpolated Benford table itself: permilles sum to 1000
    assert(Pipeline.benfordPermille.sum == 1000L &&
      Pipeline.benfordPermille.head == 301L)
  }

  test("lang_source_mi: MI is 0 under independence and H under determinism") {
    def docs(rows: Seq[(String, String)]) =
      rows.zipWithIndex.map { case ((l, s), i) => (i.toLong, l, s) }
        .toDF("doc_id", "lang", "source")
    // independent uniform 2x2: true MI is 0; the quantized-ln ladder
    // leaves at most one 1e-4 quantum (=100 micro-nats) of residue
    val ind = docs(for { l <- Seq("en", "de"); s <- Seq("a", "b");
      _ <- 1 to 5 } yield (l, s))
    val ri = TextAnalysis.langSourceMi(ind).collect()(0)
    assert(math.abs(ri.getLong(5)) <= 100L,
      s"independent MI must be ~0, got $ri")
    // lang determined by source: MI = H_lang = H_source = ln 2
    // (693147 micro-nats exactly under the 1e-4 ln quantization)
    val det = docs(Seq.fill(5)(("en", "a")) ++ Seq.fill(5)(("de", "b")))
    val rd = TextAnalysis.langSourceMi(det).collect()(0)
    assert(rd.getLong(3) == rd.getLong(5) && rd.getLong(4) == rd.getLong(5),
      s"deterministic MI must equal both marginal entropies, got $rd")
    assert(math.abs(rd.getLong(5) - 693147L) <= 60,
      s"MI must read ~ln 2 micro-nats, got ${rd.getLong(5)}")
  }
}
