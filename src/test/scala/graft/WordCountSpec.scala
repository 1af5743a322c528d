package graft

import graft.operators.WordCount
import org.apache.spark.sql.DataFrame

/** Reference-semantics unit tests for the word-count family:
  * token alphabet `[A-Za-z']+` lowercased, deterministic top-k tie-break
  * (count DESC, length DESC, word ASC), and the shuffle invariants the
  * reference establishes operationally (SURVEY.md §5.2).
  */
class WordCountSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(lines: String*): DataFrame =
    lines.toSeq.toDF("text")

  test("tokenizer: apostrophes kept, digits split, non-ASCII dropped, case folded") {
    val toks = WordCount.tokens(corpus("Don't STOP abc123def émigré", "", "  "))
      .as[String].collect().toSeq
    // é is non-ASCII → excluded from [a-z']+; "migr" remains from émigré
    assert(toks == Seq("don't", "stop", "abc", "def", "migr"))
  }

  test("top-20 tie-break is (cnt DESC, length DESC, word ASC)") {
    val df = corpus("bb aa aa bb cc ddd")
    val got = WordCount.top20(df).as[(String, Long)].collect().toSeq
    // aa/bb tie at cnt=2 → word ASC; cc/ddd tie at cnt=1 → longer first
    assert(got == Seq(("aa", 2L), ("bb", 2L), ("ddd", 1L), ("cc", 1L)))
  }

  test("word-count result is shuffle-partition invariant (reference worker-count invariance)") {
    val docs = Tables.documents(spark, sf0001)
    val base = WordCount.tokenCounts(docs).orderBy("word")
      .as[(String, Long)].collect().toSeq
    for (p <- Seq("1", "7")) {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", p)
      val got = WordCount.tokenCounts(Tables.documents(s2, sf0001))
        .orderBy("word").as[(String, Long)].collect().toSeq
      assert(got == base, s"shuffle.partitions=$p changed the result")
    }
  }

  test("partition counts preserve total mass (reference O8/O9 invariant)") {
    val docs = Tables.documents(spark, sf0001)
    val total = WordCount.tokens(docs).count()
    val partSum = WordCount.partitionCounts(docs)
      .agg(org.apache.spark.sql.functions.sum("total_cnt")).as[Long].head()
    assert(partSum == total)
  }

  test("doc_stats row per document, chars consistent") {
    val docs = Tables.documents(spark, sf0001)
    val stats = WordCount.docStats(docs)
    assert(stats.count() == docs.count())
    // n_chars matches the table's own text length
    val joined = stats.select($"doc_id", $"n_chars".as("stat_chars"))
      .join(docs, "doc_id")
      .where($"stat_chars" =!= org.apache.spark.sql.functions.length($"text"))
    assert(joined.count() == 0)
  }
}
