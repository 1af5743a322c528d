package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Substring-span dedup (Lee et al. ExactSubstr shape) and the
  * Bloom-prefiltered contamination path. */
class SubstringContaminationSpec extends SparkSpec {

  import spark.implicits._

  private val passage =
    "the quick brown fox jumps over the lazy dog while seven wizards brew strong coffee at dawn"

  test("substring_dedup finds a planted shared passage and merges its windows into one maximal span") {
    // docs 1 and 2 share a 17-token passage at different offsets inside
    // otherwise-unique text; doc 3 is fully unique
    val docs = Seq(
      (1L, s"alpha beta gamma delta $passage epsilon zeta"),
      (2L, s"one two $passage three four five six seven"),
      (3L, "completely unique words nothing repeated here at all today maybe")
    ).toDF("doc_id", "text")
    val spans = TextAnalysis.substringDedup(docs, k = 8).collect()
    assert(spans.map(_.getLong(0)).toSet == Set(1L, 2L), s"got ${spans.mkString(",")}")
    val byDoc = spans.groupBy(_.getLong(0))
    // one maximal span per doc covering exactly the 17 passage tokens:
    // doc 1 prefix is 4 tokens → passage at tokens 5..21; doc 2 prefix 2 → 3..19
    assert(byDoc(1L).length == 1 && byDoc(2L).length == 1)
    val s1 = byDoc(1L).head; val s2 = byDoc(2L).head
    assert(s1.getLong(1) == 5L && s1.getLong(2) == 21L && s1.getLong(3) == 17L)
    assert(s2.getLong(1) == 3L && s2.getLong(2) == 19L && s2.getLong(3) == 17L)
    // contiguous duplicated windows: n_windows = span_tokens - k + 1
    assert(s1.getLong(4) == 17L - 8L + 1L)
  }

  test("substring_dedup counts within-doc repeats and keeps non-touching spans separate") {
    // the 8-token phrase repeats INSIDE one doc, separated by a >k gap of
    // unique tokens — two spans, not one
    val phrase = "red orange yellow green blue indigo violet white"
    val filler = "qq ww ee rr tt yy uu ii oo pp"  // 10 unique tokens > k
    val docs = Seq(
      (7L, s"$phrase $filler $phrase")
    ).toDF("doc_id", "text")
    val spans = TextAnalysis.substringDedup(docs, k = 8)
      .orderBy("span_start").collect()
    assert(spans.length == 2, s"got ${spans.mkString(",")}")
    assert(spans(0).getLong(1) == 1L && spans(0).getLong(2) == 8L)
    assert(spans(1).getLong(1) == 19L && spans(1).getLong(2) == 26L)
  }

  test("substring_dedup_clean keeps the globally-first occurrence and counts redundant tokens") {
    // doc 1 holds the canonical passage (first occurrence); doc 2's copy
    // is fully redundant; doc 3 is untouched
    val docs = Seq(
      (1L, s"$passage alpha beta gamma"),
      (2L, s"one two three $passage"),
      (3L, "unique words only nothing shared here at all today maybe ok")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.substringDedupClean(docs, k = 8)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == (20L, 0L), s"canonical doc must lose nothing: ${r(1L)}")
    assert(r(2L) == (20L, 17L), s"copy must lose the 17 passage tokens: ${r(2L)}")
    assert(r(3L)._2 == 0L)
    // within-doc repeat: first occurrence kept, second redundant
    val solo = Seq((7L,
      s"$passage zz ww qq rr tt yy uu ii oo pp $passage")).toDF("doc_id", "text")
    val s = TextAnalysis.substringDedupClean(solo, k = 8).collect().head
    assert(s.getLong(1) == 44L && s.getLong(2) == 17L, s"got $s")
  }

  test("hashed-window production path matches the exact string-key path on sf0.001") {
    val docs = Tables.documents(spark, sf0001)
    val str = TextAnalysis.substringDedup(docs).collect().toSeq
    val hashed = TextAnalysis.substringDedup(docs, hashWindows = true).collect().toSeq
    assert(hashed == str)
    assert(str.nonEmpty, "fixture should contain duplicated spans")
  }

  test("contamination_bloom equals exact contamination on sf0.001") {
    val docs = Tables.documents(spark, sf0001)
    val exact = TextAnalysis.contamination(docs).collect().toSeq
    val bloom = TextAnalysis.contaminationBloom(spark, docs).collect().toSeq
    assert(bloom == exact)
    assert(exact.exists(_.getLong(1) > 0), "fixture should contain real hits")
  }

  test("contamination_bloom is exact under a saturated 64-bit filter (FP-independence)") {
    // 64 bits for thousands of grams → the Bloom passes ~everything;
    // the exact verify join must still produce the identical answer —
    // the filter can only affect COST, never the result
    val docs = Tables.documents(spark, sf0001)
    val exact = TextAnalysis.contamination(docs).collect().toSeq
    val tiny = TextAnalysis.contaminationBloom(spark, docs,
      bloomItems = 8L, bloomBits = 64L).collect().toSeq
    assert(tiny == exact)
  }

  test("bloom probe is plan-native: scalar-subquery build + might_contain, no UDF") {
    val docs = Tables.documents(spark, sf0001)
    val df = TextAnalysis.contaminationBloom(spark, docs)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom probe in:\n$plan")
    assert(plan.contains("scalar-subquery") || plan.contains("Subquery"),
      s"expected the bloom build as a scalar subquery in:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("UDF("),
      "bloom path must not fall back to a UDF")
  }
}
