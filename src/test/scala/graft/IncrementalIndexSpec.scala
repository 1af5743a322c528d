package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained band index is mergeable: corpus ∪ increment raw band
  * tables + one recap ≡ the index rebuilt from scratch — so daily
  * increments never re-run the old corpus's gram/minhash pipeline. */
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
}
