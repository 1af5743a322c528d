package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._
import scala.collection.mutable

/** BPE trainer: the distributed greedy merge loop must match an
  * independent plain-Scala implementation (same tie-breaks, same greedy
  * left-to-right merge), including the consecutive-occurrence case the
  * wrapped-symbol encoding exists for. */
class TokenizerSpec extends SparkSpec {

  private def docsDF(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  /** Plain-Scala BPE mirror: word-freq dict, greedy merges, engine
    * tie-break (weight desc, then WRAPPED pair string asc). */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : (List[(String, String, Long)], Map[String, List[String]]) = {
    var syms: Map[String, List[String]] =
      words.map { case (w, _) => w -> w.toList.map(_.toString) }
    def wrap(p: (String, String)) = s"(${p._1})(${p._2})"
    val merges = mutable.ListBuffer[(String, String, Long)]()
    for (_ <- 1 to rounds) {
      val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((w, f) <- words; s = syms(w); i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) += f
      val (pair, weight) = counts.toSeq.minBy { case (p, c) => (-c, wrap(p)) }
      merges += ((wrap(pair), pair._1 + pair._2, weight))
      syms = syms.map { case (w, s) =>
        val out = mutable.ListBuffer[String]()
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == pair._1 && s(i + 1) == pair._2) {
            out += pair._1 + pair._2; i += 2
          } else { out += s(i); i += 1 }
        }
        w -> out.toList
      }
    }
    (merges.toList, syms)
  }

  private def wordFreqs(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(t => "[a-z']+".r.findAllIn(t.toLowerCase))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("learned merges and final vocabulary match the plain-Scala mirror") {
    val texts = Seq(
      "the theme there then the other lather",
      "banana bandana ban banana and sand hand",
      "low lower lowest slow slower slowly",
      "it's don't it's can't it's")
    val d = docsDF(texts.zipWithIndex.map { case (t, i) => i.toLong -> t }: _*)
    val st = Tokenizer.learnBpe(d, rounds = 8)
    val gotMerges = st.merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toList
    val (expMerges, expSyms) = refBpe(wordFreqs(texts), 8)
    // engine merged symbol is wrapped: '(ab)' — unwrap for compare
    assert(gotMerges.map { case (p, m, c) =>
      (p, m.stripPrefix("(").stripSuffix(")"), c) } === expMerges)
    val gotSyms = st.vocab.collect().map { r =>
      r.getString(0) ->
        "\\(([^)]*)\\)".r.findAllMatchIn(r.getString(2)).map(_.group(1)).toList
    }.toMap
    assert(gotSyms === expSyms)
  }

  test("consecutive identical pairs merge greedily left-to-right") {
    // 'aaaa' must become (aa)(aa) after merging (a)(a) — the case where
    // a space-separated encoding silently misses the second occurrence
    val d = docsDF(0L -> "aaaa aaa aaaa")
    val st = Tokenizer.learnBpe(d, rounds = 2)
    val merges = st.merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toList
    assert(merges.head === ("(a)(a)", "(aa)"))
    // round 2's top pair must be ((aa),(aa)) — i.e. both occurrences in
    // 'aaaa' merged in round 1
    assert(merges(1) === ("(aa)(aa)", "(aaaa)"))
    val syms = st.vocab.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(syms("aaaa") === "(aaaa)")
    assert(syms("aaa") === "(aa)(a)")
  }

  test("merge loop stops early when the vocabulary fully collapses") {
    // one word type: 'aa' merges to a single symbol in round 1; round 2
    // has NO pairs — the loop must stop with the vocab intact, not
    // annihilate the word table via a crossJoin with an empty argmax
    val st = Tokenizer.learnBpe(docsDF(0L -> "aa aa aa"), rounds = 5)
    val merges = st.merges.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1))).toList
    assert(merges === List((1L, "(a)(a)")))
    val vocab = st.vocab.collect().map(r => r.getString(0) -> r.getString(2))
    assert(vocab.toSeq === Seq("aa" -> "(aa)"))
  }

  test("encode stats are consistent with the learned vocabulary") {
    val d = Tables.documents(spark, sf0001)
    val st = Tokenizer.learnBpe(d, rounds = 4)
    val nsym = st.vocab.collect().map { r =>
      r.getString(0) -> "\\([^)]*\\)".r.findAllIn(r.getString(2)).size.toLong
    }.toMap
    // every corpus word type must be in the vocab, and symbols per word
    // strictly between 1 merge floor and the char count
    val words = d.collect().flatMap(r =>
      "[a-z']+".r.findAllIn(r.getAs[String]("text").toLowerCase))
    words.foreach { w =>
      val n = nsym(w)
      assert(n >= 1 && n <= w.length, s"word $w")
    }
  }

  test("per-lang fertility is the lang-grain rollup of the per-doc encode stats") {
    import spark.implicits._
    val enc = Tokenizer.bpeEncodeStats(spark, sf0001)
      .select("doc_id", "n_tokens", "n_symbols")
      .as[(Long, Long, Long)].collect()
    val langOf = Tables.documents(spark, sf0001)
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val expect = enc.groupBy(t => langOf(t._1)).view.mapValues(ts =>
      (ts.length.toLong, ts.map(_._2).sum, ts.map(_._3).sum)).toMap
    val got = Tokenizer.bpeFertility(spark, sf0001)
      .select("lang", "n_docs", "n_tokens", "n_symbols", "fertility")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == expect.keySet)
    got.foreach { case (lang, nd, nt, ns, f) =>
      assert((nd, nt, ns) == expect(lang), s"lang $lang rollup mismatch")
      assert(f >= 1.0, s"fertility below one symbol per word: $f")
      assert(math.abs(f - ns.toDouble / nt) < 1e-6)
    }
  }
}
