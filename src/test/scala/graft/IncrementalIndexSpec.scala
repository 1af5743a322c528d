package graft

import graft.operators.{Dedup, Search}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained band index is mergeable: corpus ∪ increment raw band
  * tables + one recap ≡ the index rebuilt from scratch — so daily
  * increments never re-run the old corpus's gram/minhash pipeline.
  * Likewise the positional postings index: per-batch deltas union into
  * a serving view identical to a full rebuild. */
class IncrementalIndexSpec extends SparkSpec {

  import spark.implicits._

  private def rowSet(df: DataFrame): Set[(Long, String)] =
    df.select(col("doc_id").cast("long"), col("band").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("merge(B(S), B(Δ)) + recap equals the index rebuilt from S ∪ Δ") {
    val all = Tables.documents(spark, sf0001)
    val split = 300L
    val corpus = all.filter(col("doc_id") < split)
    val inc = all.filter(col("doc_id") >= split)
    val merged = Dedup.mergeCappedBands(
      Dedup.bandTable(Dedup.wordGrams(corpus)),
      Dedup.bandTable(Dedup.wordGrams(inc)))
    val full = Dedup.cappedBandsPlan(
      Dedup.bandTable(Dedup.wordGrams(all)), Dedup.MaxBandBucket)
    assert(rowSet(merged) == rowSet(full))
    assert(rowSet(merged).nonEmpty)
  }

  test("a band crossing the cap only after the merge is dropped, old rows included") {
    // 40 copies of one text in the corpus (bands under the 64 cap, all
    // kept), 30 more arrive in the increment → 70 > 64: the merged
    // index must drop the band's OLD rows too, exactly like a rebuild
    val mk = (ids: Seq[Long]) => ids.map(i =>
      (i, "the same boilerplate sentence repeated in every copy exactly"))
      .toDF("doc_id", "text")
    val corpus = mk(0L until 40L)
    val inc = mk(40L until 70L)
    val rawC = Dedup.bandTable(Dedup.wordGrams(corpus))
    // corpus-only index keeps all 40 docs' bands (40 ≤ 64)
    assert(Dedup.cappedBandsPlan(rawC, Dedup.MaxBandBucket).count() == 40L * 4)
    val merged = Dedup.mergeCappedBands(rawC, Dedup.bandTable(Dedup.wordGrams(inc)))
    assert(merged.count() == 0L, "the now-viral band must drop entirely")
    val full = Dedup.cappedBandsPlan(
      Dedup.bandTable(Dedup.wordGrams(corpus.union(inc))), Dedup.MaxBandBucket)
    assert(rowSet(merged) == rowSet(full))
  }

  test("near-dup pairs from the merged index equal pairs from the rebuilt index") {
    val all = Tables.documents(spark, sf0001)
    val split = 300L
    val merged = Dedup.mergeCappedBands(
      Dedup.bandTable(Dedup.wordGrams(all.filter(col("doc_id") < split))),
      Dedup.bandTable(Dedup.wordGrams(all.filter(col("doc_id") >= split))))
    val viaMerged = Dedup.nearDupPairsFromBands(all, merged, Dedup.wordGrams, 0.7)
      .collect().toSeq
    val viaFull = Dedup.nearDupPairs(all, Dedup.wordGrams(all), Dedup.wordGrams, 0.7)
      .collect().toSeq
    assert(viaMerged == viaFull)
    assert(viaFull.nonEmpty, "fixture should contain near-dup pairs")
  }

  // ---- incremental postings (Search.postingsDelta) ------------------

  private def postingSet(df: DataFrame): Set[(String, Long, Int)] =
    df.select(col("tok"), col("doc_id"), col("pos").cast("int"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet

  test("postings(A ∪ B) = postings(A) ∪ postings(B) — the maintenance identity, on real data") {
    val all = Tables.documents(spark, sf0001)
    val split = 300L
    val base = Search.postings(all.filter(col("doc_id") < split))
    val delta = Search.postingsDelta(all.filter(col("doc_id") >= split))
    val served = Search.servePostings(base, delta)
    assert(postingSet(served) == postingSet(Search.postings(all)))
    assert(postingSet(delta).nonEmpty && postingSet(base).nonEmpty)
    // the delta indexed ONLY the new docs — never the old corpus
    assert(postingSet(delta).forall(_._2 >= split))
  }

  test("every probe over base+delta equals the same probe over a full rebuild") {
    val all = Tables.documents(spark, sf0001)
    val split = 300L
    val served = Search.servePostings(
      Search.postings(all.filter(col("doc_id") < split)),
      Search.postingsDelta(all.filter(col("doc_id") >= split)))
    val full = Search.postings(all)
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSeq
    assert(rows(Search.bm25SearchFor(served, Seq("data", "stream", "key"))) ==
      rows(Search.bm25SearchFor(full, Seq("data", "stream", "key"))))
    assert(rows(Search.keywordSearchFor(served, Seq("data", "query", "spark"))) ==
      rows(Search.keywordSearchFor(full, Seq("data", "query", "spark"))))
    assert(rows(Search.phraseSearchFor(served, "data stream")) ==
      rows(Search.phraseSearchFor(full, "data stream")))
    assert(Search.bm25SearchFor(full, Seq("data", "stream", "key")).count() > 0)
  }

  test("compaction rewrite carries every generation (multi-delta)") {
    val all = Tables.documents(spark, sf0001)
    val g0 = all.filter(col("doc_id") < 200L)
    val g1 = all.filter(col("doc_id") >= 200L && col("doc_id") < 400L)
    val g2 = all.filter(col("doc_id") >= 400L)
    val compacted = Search.compactPostings(Search.postings(g0),
      Search.postingsDelta(g1), Search.postingsDelta(g2))
    assert(postingSet(compacted) == postingSet(Search.postings(all)))
  }
}
