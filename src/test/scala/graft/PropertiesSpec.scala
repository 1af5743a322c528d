package graft

import graft.operators.{Skew, WordCount}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2) using seeded ScalaCheck
  * generators: tokenization concat-invariance under line splits,
  * partitioning mass preservation, salted-aggregation equivalence,
  * round-robin split balance (reference O4). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val wordGen = Gen.nonEmptyListOf(
    Gen.oneOf("the", "don't", "a", "spark", "MERGE", "abc123def", "émigré"))
  private val corpusGen = Gen.listOfN(8, wordGen.map(_.mkString(" ")))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("tokenization is invariant under line-aligned splitting (reference O3)") {
    for (lines <- samples(corpusGen, 10) if lines.nonEmpty) {
      val joined = WordCount.tokenCounts(Seq(lines.mkString("\n")).toDF("text"))
        .orderBy("word").as[(String, Long)].collect().toSeq
      val split = WordCount.tokenCounts(lines.toDF("text"))
        .orderBy("word").as[(String, Long)].collect().toSeq
      assert(joined == split)
    }
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sf0001)
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity", "l_orderkey")
      .as[(String, Double, Long)].collect().toSeq
    val direct = li.groupBy($"l_returnflag")
      .agg(graft.functions.Exact.sumD($"l_quantity").as("sum_value"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
      .as[(String, Double, Long)].collect().toSeq
    assert(salted == direct)
  }

  test("salted join equals the plain join") {
    val li = Tables.lineitem(spark, sf0001)
    val ord = Tables.orders(spark, sf0001)
    val salted = operators.Skew.saltedJoinRevenue(li, ord)
      .as[(String, Long, Double)].collect().toSet
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(graft.functions.Exact.discPrice($"l_extendedprice", $"l_discount"))
          .cast("double").as("revenue"))
      .as[(String, Long, Double)].collect().toSet
    assert(salted == plain, s"salted join diverged: ${plain -- salted}")
  }

  test("round-robin repartition balances rows (reference O4 line-interleave)") {
    val li = Tables.lineitem(spark, sf0001) // 6000 rows
    val n = 7
    val sizes = li.repartition(n)
      .mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.length == n)
    assert(sizes.max - sizes.min <= 1,
      s"round-robin should balance within 1 row, got ${sizes.toSeq}")
  }

  test("hash-partition bucket counts are stable across shuffle widths") {
    val docs = Tables.documents(spark, sf0001)
    val base = WordCount.partitionCounts(docs)
      .as[(String, Long, Long)].collect().toSeq
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "3")
    val alt = WordCount.partitionCounts(Tables.documents(s2, sf0001))
      .as[(String, Long, Long)].collect().toSeq
    assert(base == alt)
  }

  test("null and empty text flow through the text pipelines without errors") {
    val d = Seq((1L, "the quick brown fox jumps"), (2L, null), (3L, ""), (4L, "ab"))
      .toDF("doc_id", "text")
    // null/empty/short docs simply contribute no rows — no NPEs anywhere
    assert(operators.Dedup.wordGrams(d).count() == 3)   // 5 tokens → 3 grams
    assert(operators.Dedup.charGrams(d).count() == 14)  // 25 chars → 14 grams
    assert(operators.TextAnalysis.docFingerprint(d).count() == 1)
    assert(operators.Dedup.exactDedup(d).count() == 4)  // null hashes to null group
  }

  test("repetition ratio and contamination flags behave on planted docs") {
    import operators.TextAnalysis
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  // eval doc
      (30L, "alpha beta gamma delta epsilon zeta eta theta iota kappa plus trailing words"),
      (31L, "completely unrelated text with enough unique words to pass the length gate here"),
      (32L, Seq.fill(30)("spam ham").mkString(" "))) // highly repetitive
      .toDF("doc_id", "text")
    val cont = TextAnalysis.contamination(d)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(cont(30L), "doc sharing an 8-gram with the eval set must be flagged")
    assert(!cont(31L) && !cont(32L), s"clean docs flagged: $cont")
    val rep = TextAnalysis.repetitionStats(d)
      .select("doc_id", "rep_ratio").as[(Long, Double)].collect().toMap
    assert(rep(32L) > 0.9, s"repetitive doc scored ${rep(32L)}")
    assert(rep(1L) == 0.0, s"all-distinct doc scored ${rep(1L)}")
  }

  test("doc entropy hand-computed on planted distributions") {
    import operators.TextAnalysis
    val d = Seq(
      (1L, "aa aa aa aa"),                      // one type: H = 0 exactly
      (2L, "aa bb cc dd"),                      // uniform distinct: H = ln(4)
      (3L, "aa aa aa bb"))                      // 3/4, 1/4 split
      .toDF("doc_id", "text")
    val r = TextAnalysis.docEntropy(d)
      .select("doc_id", "n_tokens", "n_types", "ttr_permille",
        "top_frac_permille", "entropy_micro")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L) == (1L, 4L, 1L, 250L, 1000L, 0L))
    // H(uniform over 4) = ln 4 in 1e-6 units; quantization error ≤ 1e-4
    assert(math.abs(r(2L)._6 - math.log(4) * 1e6) < 200, s"got ${r(2L)._6}")
    assert(r(2L)._4 == 1000L && r(2L)._5 == 250L)
    // H = ln 4 − (3 ln 3)/4
    val h3 = (math.log(4) - 3 * math.log(3) / 4) * 1e6
    assert(math.abs(r(3L)._6 - h3) < 200, s"got ${r(3L)._6}")
    assert(r(3L)._5 == 750L)
  }

  test("train/val/test split is a deterministic partition with ~8/1/1 mass") {
    val docs = Tables.documents(spark, sf0001)
    val s1 = operators.TextAnalysis.trainValTestSplit(docs)
    // partition: every doc assigned exactly once, stable across runs
    assert(s1.count() == docs.count())
    assert(s1.groupBy("doc_id").count().filter($"count" > 1).count() == 0)
    val bys = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = docs.count().toDouble
    assert(bys("train") / n > 0.7 && bys("train") / n < 0.9, s"train share off: $bys")
    assert(bys.keySet == Set("train", "val", "test"), s"got $bys")
    val s2 = operators.TextAnalysis.trainValTestSplit(docs)
      .as[(String, String)].collect().toSet
    assert(s2 == s1.as[(String, String)].collect().toSet, "split not deterministic")
  }

  test("context packing conserves documents and token mass per shard") {
    val docs = Tables.documents(spark, sf0001)
    val packed = operators.TextAnalysis.packContexts(docs, nShards = 4, budget = 2048)
    assert(packed.agg(sum("n_docs")).as[Long].head() == docs.count())
    // bins are contiguous per shard: 0..max with none skipped
    val gaps = packed.groupBy("shard")
      .agg(max("bin").as("mx"), count(lit(1)).as("n"))
      .filter($"mx" =!= $"n" - 1).count()
    assert(gaps == 0, "bin ids must be contiguous per shard")
    // each bin's token mass stays within budget + one straddling doc
    val budgetBreak = packed.filter($"n_docs" > 1 && $"bin_tokens" > 2048 * 2).count()
    assert(budgetBreak == 0, "a multi-doc bin overflowed far past the budget")
  }

  test("stratified sample is deterministic with ~20% mass per stratum") {
    val docs = Tables.documents(spark, sf0001)
    val s1 = operators.TextAnalysis.stratifiedSample(docs)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    // strata partition the corpus; each samples at roughly 51/256
    assert(s1.map(_._2).sum == docs.count())
    val (tot, samp) = (s1.map(_._2).sum.toDouble, s1.map(_._3).sum.toDouble)
    assert(samp / tot > 0.12 && samp / tot < 0.28, s"sample share ${samp / tot}")
    s1.foreach { case (lang, n, k, _, _) =>
      assert(k <= n, s"$lang sampled more than its stratum") }
    val s2 = operators.TextAnalysis.stratifiedSample(docs)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(s1.sameElements(s2), "sample not deterministic")
  }

  test("length gate keeps the p05-p95 band per language") {
    val docs = Tables.documents(spark, sf0001)
    val g = operators.TextAnalysis.lengthQualityGate(docs)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(g.map(_._2).sum == docs.count())
    g.foreach { case (lang, n, kept, p05, p95, avg) =>
      assert(p05 <= p95, s"$lang: p05 > p95")
      // exact percentile gate keeps ~90% (±band for small strata)
      val share = kept.toDouble / n
      assert(share > 0.75 && share <= 1.0, s"$lang kept share $share")
      assert(avg >= p05 && avg <= p95, s"$lang kept average outside the band")
    }
  }

  test("tfidf top terms: ranks are 1..k, scores non-increasing, df consistent") {
    val docs = Tables.documents(spark, sf0001)
    val t = operators.TextAnalysis.tfidfTopTerms(docs, k = 3)
      .as[(Long, Long, String, Long, Long, Double)].collect()
    val n = docs.count()
    val byDoc = t.groupBy(_._1)
    byDoc.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, "ranks not 1..k")
      // scores non-increasing in rank; ties broken by term ascending
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 > b._6 || (a._6 == b._6 && a._3 < b._3),
            s"rank order violated in doc ${a._1}")
        case _ =>
      }
    }
    t.foreach { case (_, _, _, tf, df, score) =>
      assert(df >= 1 && df <= n && tf >= 1, "tf/df out of range")
      assert(score >= 0.0, "odds-ratio idf is non-negative for df <= N")
    }
  }

  test("distributed closed-form OLS equals a naive driver-side fit") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    val got = TextAnalysis.qualityRegression(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == Set("letter_a", "letter_e", "words"))
    // naive recompute: collect the raw text, fit each feature with plain
    // BigInt arithmetic (the same sign-split truncating quantization)
    val texts = docs.select("text").collect().map(_.getString(0))
    def fit(f: String => Long): (Long, Long, Long, Long) = {
      val xs = texts.map(t => BigInt(f(t)))
      val ys = texts.map(t => BigInt(t.length.toLong))
      val n = BigInt(texts.length)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val syy = ys.map(y => y * y).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val deny = n * syy - sy * sy
      def q(v: BigInt, d: BigInt, scale: Int) =
        (v.signum * ((BigInt(scale) * v.abs) / d)).toLong
      (n.toLong, q(num, den, 1000000),
        q(sy * den - num * sx, n * den, 1000000),
        ((BigInt(1000) * num * num) / (den * deny)).toLong)
    }
    def countChar(c: Char)(t: String): Long = t.count(_ == c).toLong
    assert(got("words") == fit(countChar(' ')))
    assert(got("letter_e") == fit(countChar('e')))
    assert(got("letter_a") == fit(countChar('a')))
    // non-vacuous: space count tracks length almost perfectly on this
    // corpus (fixed-width words), letters correlate but weaker
    assert(got("words")._2 > 0 && got("words")._4 > 900,
      s"words fit should be near-perfect: ${got("words")}")
    assert(got("letter_e")._4 > 0 && got("letter_e")._4 < got("words")._4)
  }

  test("DSIR importance weights equal a naive driver-side recompute") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    val got = TextAnalysis.importanceResampling(docs, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // naive recompute, no Spark: tokenize, md5-prefix bucket, add-1
    // smoothed llr per bucket quantized like the operator, per-doc sums
    val raw = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(tok: String): String =
      md.digest(tok.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
    val tokRe = "[a-z']+".r
    val perDoc = raw.map { case (id, lang, text) =>
      (id, lang == "en",
        tokRe.findAllIn(text.toLowerCase).map(bucket).toSeq
          .groupBy(identity).map { case (b, g) => b -> g.size.toLong })
    }
    val cr = perDoc.flatMap(_._3).groupBy(_._1).map { case (b, g) => b -> g.map(_._2).sum }
    val ct = perDoc.filter(_._2).flatMap(_._3).groupBy(_._1)
      .map { case (b, g) => b -> g.map(_._2).sum }
    val nr = cr.values.sum.toDouble; val nt = ct.values.sum.toDouble
    def llr4(b: String): Long = math.floor(math.log(
      (ct.getOrElse(b, 0L) + 1.0) * (nr + 256.0) /
      ((cr(b) + 1.0) * (nt + 256.0))) * 10000.0 + 0.5).toLong
    val naive = perDoc.map { case (id, _, bs) =>
      (id, bs.values.sum, bs.map { case (b, c) => c * llr4(b) }.sum)
    }.sortBy(t => (-t._3, t._1)).take(50)
    assert(got.toSeq == naive.toSeq)
    // non-vacuous: weights are not all equal and the winner is positive
    assert(got.map(_._3).distinct.length > 10 && got.head._3 > 0)

    // token-less documents are RANKED at weight 0, not dropped (a
    // 0-weight doc outranks negative-weight docs): a tiny corpus where
    // doc 2 has no [a-z'] tokens and only k=3 slots exist
    import spark.implicits._
    val tiny = Seq(
      (0L, "aa bb aa", "en"), (1L, "cc dd", "de"),
      (2L, "123 456 !!!", "de"), (3L, "aa bb", "en"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.importanceResampling(tiny, k = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.length == 4, s"token-less doc dropped: ${r.toSeq}")
    val d2 = r.find(_._1 == 2L).get
    assert(d2._2 == 0L && d2._3 == 0L)
    val negWeights = r.filter(t => t._1 == 1L)
    // the de-only vocab scores negative under the en target, so doc 2's
    // zero must rank ABOVE doc 1 — position check, not just presence
    assert(negWeights.head._3 < 0, s"expected negative weight: ${r.toSeq}")
    assert(r.indexWhere(_._1 == 2L) < r.indexWhere(_._1 == 1L))
  }

  test("stratified fixed-k sample takes an exact quota per stratum") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    val got = TextAnalysis.stratifiedFixedK(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exact quota: min(5, stratum size) per lang, ranks 1..quota
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = got.groupBy(_._2)
    assert(byLang.keySet == sizes.keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(5L, sizes(lang)).toInt)
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    // membership equals a naive per-stratum md5 rank (never the window)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val naive = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
        ds.sortBy(d => (h(d._1), d._1)).take(5).zipWithIndex
          .map { case ((id, _), i) => (id, lang, i + 1L) }
      }.toSet
    assert(got.toSet == naive)
  }

  test("Cohen's kappa matches a hand-computed 2x2 case and is chance-discounted") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // planted 2x2: actual en = docs {0,1,2}; the heuristic predicts en
    // iff the text carries stopwords ('the and' ratio > 0.03)
    // doc: (id, text, lang)  -> (a, p): 0:(1,1) 1:(1,1) 2:(1,0) 3:(0,0) 4:(0,1) 5:(0,0)
    val tiny = Seq(
      (0L, "the and cat", "en"), (1L, "the dog and", "en"),
      (2L, "gato perro casa", "en"), (3L, "haus hund", "de"),
      (4L, "the la", "fr"), (5L, "xyz abc", "zh"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.labelAgreementKappa(tiny).head()
    // n=6, n11=2, n00=2, agree=4, ra=3, rp=3 -> po=4/6, pe=(9+9)/36=1/2
    // kappa = (6*4 - 18) / (36 - 18) = 6/18 = 1/3
    assert(r.getLong(0) == 6L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 666666L) // (1e6*4) div 6
    assert(r.getLong(3) == 500000L)
    assert(r.getLong(4) == 333333L) // (1e6*6) div 18
    // chance-discounting: a degenerate all-'other' corpus has accuracy
    // = majority share but kappa NULL (pe = 1 -> undefined)
    val degen = Seq((0L, "xx yy", "de"), (1L, "zz ww", "de"))
      .toDF("doc_id", "text", "lang")
    val d = TextAnalysis.labelAgreementKappa(degen).head()
    assert(d.isNullAt(4), "kappa must be NULL when pe = 1")
  }

  test("multi-class kappa matches a hand-computed 3x3 (and 4-class asymmetric) case") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    def pairsDf(rows: Seq[(String, String)]) =
      rows.zipWithIndex.map { case ((a, p), i) => (i.toLong, a, p) }
        .toDF("doc_id", "a", "p")
    // 3x3 contingency: xx*5 xy*1 yy*4 yz*2 zz*3 zx*1 -> N=16, agree=12,
    // row marginals (6,6,4), col marginals (6,5,5), chance=36+30+20=86
    val base = Seq.fill(5)(("x", "x")) ++ Seq(("x", "y")) ++
      Seq.fill(4)(("y", "y")) ++ Seq.fill(2)(("y", "z")) ++
      Seq.fill(3)(("z", "z")) ++ Seq(("z", "x"))
    val r = TextAnalysis.kappaFromPairs(pairsDf(base)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((16L, 3L, 12L)))
    assert(r.getLong(3) == 750000L) // po = 12/16
    assert(r.getLong(4) == 335937L) // pe = 86/256 (truncating div)
    assert(r.getLong(5) == 623529L) // (16*12-86)/(256-86) = 106/170
    // a class that appears ONLY as a prediction joins the class set but
    // contributes 0 to chance (its row marginal is 0)
    val r4 = TextAnalysis.kappaFromPairs(pairsDf(base :+ (("x", "w")))).head()
    assert((r4.getLong(0), r4.getLong(1), r4.getLong(2)) == ((17L, 4L, 12L)))
    assert(r4.getLong(4) == 318339L) // chance = 7*6+6*5+4*5 = 92
    assert(r4.getLong(5) == 568527L) // (17*12-92)/(289-92) = 112/197
  }

  test("token concentration equals a naive recompute; uniform corpus pins HHI = 1/V") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val r = TextAnalysis.tokenConcentration(docs).head()
    val toks = docs.select("text").collect().flatMap(row =>
      "[a-z']+".r.findAllIn(row.getString(0).toLowerCase))
    val counts = toks.groupBy(identity).map(_._2.size.toLong)
    val n = BigInt(counts.sum); val c2 = counts.map(c => BigInt(c) * c).sum
    assert(r.getLong(0) == counts.sum && r.getLong(1) == counts.size.toLong)
    assert(r.getLong(2) == ((BigInt(1000000000) * c2) / (n * n)).toLong)
    assert(r.getLong(3) == ((BigInt(1000000) * counts.max) / n).toLong)
    // property: a perfectly uniform vocabulary has HHI = 1e9 / V exactly
    val uni = Seq((0L, "aa bb"), (1L, "cc dd")).toDF("doc_id", "text")
    val u = TextAnalysis.tokenConcentration(uni).head()
    assert(u.getLong(2) == 250000000L && u.getLong(3) == 250000L)
  }

  test("Zipf fit equals a naive recompute; a perfect 1/rank corpus pins alpha = 1") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val r = TextAnalysis.zipfAlpha(docs).head()
    // naive: same tokenize, same rank order, same ln quantization, BigInt OLS
    val counts = docs.select("text").collect()
      .flatMap(row => "[a-z']+".r.findAllIn(row.getString(0).toLowerCase))
      .groupBy(identity).map { case (t, g) => (t, g.size.toLong) }.toSeq
      .sortBy { case (t, c) => (-c, t) }
    def q(v: Double) = BigInt(math.floor(math.log(v) * 10000.0 + 0.5).toLong)
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (q(i + 1.0), q(c.toDouble)) }
    val n = BigInt(pts.size)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
    val alpha = (if (num > 0) -1 else 1) * ((BigInt(1000000) * num.abs) / den)
    assert(r.getLong(0) == pts.size.toLong)
    assert(r.getLong(1) == alpha.toLong)
    // planted perfect Zipf (counts = 12/rank): slope −1 → alpha ≈ 1e6,
    // fit near-perfect (quantization leaves ±~1 micro-unit wiggle)
    val zipf = Seq((0L, (("a " * 12) + ("b " * 6) + ("c " * 4) + ("d " * 3)).trim))
      .toDF("doc_id", "text")
    val z = TextAnalysis.zipfAlpha(zipf).head()
    assert(math.abs(z.getLong(1) - 1000000L) < 200,
      s"perfect-Zipf alpha off: ${z.getLong(1)}")
    assert(z.getLong(3) >= 999L, s"perfect-Zipf r2: ${z.getLong(3)}")
  }

  test("vocab coverage: naive-oracle equality, monotone in k, saturates at n_types") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    val r = TextAnalysis.vocabCoverage(docs).head()
    // naive single-node twin: same tokenize, same (c desc, t asc) rank
    val counts = docs.select("text").collect()
      .flatMap(row => "[a-z']+".r.findAllIn(row.getString(0).toLowerCase))
      .groupBy(identity).map { case (t, g) => (t, g.size.toLong) }.toSeq
      .sortBy { case (t, c) => (-c, t) }
    val total = counts.map(_._2).sum
    assert(r.getLong(0) == total && r.getLong(1) == counts.size.toLong)
    val cov = Seq(16, 64, 256, 1024).map(k =>
      1000L * counts.take(k).map(_._2).sum / total)
    assert((2 to 5).map(r.getLong) == cov, s"coverage mismatch: $cov")
    assert(cov == cov.sorted, "coverage must be monotone in k")
    if (counts.size <= 1024) assert(r.getLong(5) == 1000L)
  }

  test("stratified quotas hold across k; samples are prefix-nested in k") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the md5-rank sample has the reservoir prefix property: the k=3
    // sample must be exactly the rank<=3 prefix of the k=9 sample —
    // growing a quota never reshuffles already-selected members
    val at9 = TextAnalysis.stratifiedFixedK(docs, k = 9).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    for (k <- Seq(1, 3, 9)) {
      val got = TextAnalysis.stratifiedFixedK(docs, k).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      got.groupBy(_._2).foreach { case (lang, rows) =>
        assert(rows.length == math.min(k.toLong, sizes(lang)).toInt) }
      assert(got.toSet == at9.filter(_._3 <= k).toSet,
        s"k=$k sample is not the rank-prefix of the k=9 sample")
    }
  }

  test("kappa is symmetric in the two annotators (transpose invariance)") {
    // Cohen's kappa must not care which labeling is 'gold': transposing
    // the 2x2 table (swap ra<->rp, n11/n00 fixed) leaves it unchanged.
    // Verify on the integer formula with a skewed table: n=10, n11=3,
    // n00=2, ra=6, rp=4 -> po=1/2, chance=6*4+4*6=48, nsq=100,
    // kappa=(10*5-48)/(100-48)=2/52; transpose ra=4, rp=6 -> identical.
    def kappaMicro(n: Long, n11: Long, n00: Long, ra: Long, rp: Long): Long = {
      val agree = n11 + n00
      val chance = ra * rp + (n - ra) * (n - rp)
      val num = n * agree - chance; val den = n * n - chance
      (if (num < 0) -1 else 1) * ((1000000L * math.abs(num)) / den)
    }
    assert(kappaMicro(10, 3, 2, 6, 4) == kappaMicro(10, 3, 2, 4, 6))
    assert(kappaMicro(10, 3, 2, 6, 4) == 38461L) // (1e6*2) div 52
    // perfect agreement pins kappa = 1 regardless of marginals
    assert(kappaMicro(10, 7, 3, 7, 7) == 1000000L)
    // agreement exactly at chance pins kappa = 0: n=4, both marginals
    // 2/2, agree=2 -> chance=8, num=4*2-8=0
    assert(kappaMicro(4, 1, 1, 2, 2) == 0L)
  }

  test("bruteForceTopK plan shapes agree across (nQueries, k) combinations") {
    import graft.operators.Similarity
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf0001)
    for ((nq, k) <- Seq((3, 1), (5, 12))) {
      val a = Similarity.bruteForceTopK(emb, nq, k, corpusCount = Some(1L))
        .as[(Long, Long, Long, Double)].collect().toSeq
      val b = Similarity.bruteForceTopK(emb, nq, k,
          corpusCount = Some(Similarity.BruteBucketMin))
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(a == b, s"shape divergence at nQueries=$nq k=$k")
      assert(a.nonEmpty)
    }
  }

  test("a failed task attempt is retried and the job completes (reference O16)") {
    // the reference re-queues a chunk when its worker misses the 20 s
    // deadline (coordinator/coordinator.py timeout loop); Spark's analogue
    // is task retry under spark.task.maxFailures (local[4, 2] in tests).
    // Inject one first-attempt failure; the retry must finish the job.
    val rdd = spark.sparkContext.parallelize(1 to 100, 4).mapPartitions { it =>
      val ctx = org.apache.spark.TaskContext.get()
      if (ctx.partitionId() == 2 && ctx.attemptNumber() == 0)
        throw new RuntimeException("injected first-attempt failure")
      it
    }
    assert(rdd.sum() == 5050.0)
  }
}
