package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._

/** Pipeline-suite invariants: chunk coverage, vocab band limits,
  * novelty bounds, gap-fill density, and rolling-frame self-inclusion. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

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

  test("doc_chunks plan stays shuffle-free up to the final sort") {
    // One exchange may come from Tables.spread (input layout) and one
    // from the deterministic orderBy; the chunking itself must not add
    // a hash shuffle of the exploded rows.
    val plan = Pipeline.docChunks(Tables.documents(spark, sf0001))
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges <= 1, s"unexpected shuffle in chunking plan:\n$plan")
  }
}
