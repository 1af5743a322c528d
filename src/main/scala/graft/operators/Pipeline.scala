package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact._

/** Training-data pipeline operators beyond filtering/dedup: chunking
  * documents into fixed token windows, document-frequency vocabulary
  * pruning, corpus-novelty scoring, and dense time-series repair
  * (gap-fill, range-frame rolling aggregates).
  *
  * Scale design notes (100 TB / 1000 executors):
  *  - chunking, and every per-document array transform, is shuffle-free
  *    (one map stage; output explodes rows but never re-partitions);
  *  - document-frequency and novelty shuffle once on the token/gram key
  *    with partial aggregation — the classic wordcount shape;
  *  - gap-fill generates the dense time axis from a single-row scalar
  *    aggregate broadcast against the (tiny) bucket×type grid, then
  *    joins counts on the bucket key — the fact side shuffles once;
  *  - rolling windows use a RANGE frame over per-user time — one
  *    shuffle on user_id, sorted once per partition.
  */
object Pipeline {

  private def toks: Column =
    regexp_extract_all(lower(col("text")), lit(WordCount.TokenPattern), lit(0))

  /** Fixed-size token-window chunking with overlap (size 32, stride 24):
    * the standard long-document → training-example splitter. Chunks
    * start every `stride` tokens; the final chunk may be short. */
  def docChunks(docs: DataFrame, size: Int = 32, stride: Int = 24): DataFrame =
    docs.select(col("doc_id"), toks.as("w"))
      .filter(expr("size(w) > 0"))
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(1, size(w), $stride), i -> slice(w, i, $size))"))
          .as(Seq("chunk_id", "c")))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        expr("size(c)").cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("c")).as("chunk"))
      .orderBy("doc_id", "chunk_id")

  /** Document-frequency vocabulary pruning: tokens kept when they appear
    * in at least `minDf` documents but at most half the corpus (too-rare
    * and too-common trimmed — the classic tokenizer-vocab/stopword
    * gate). Per-doc distinct before the explode keeps the shuffled
    * volume at O(distinct tokens per doc). */
  def vocabPrune(docs: DataFrame, minDf: Long = 2): DataFrame = {
    val perDoc = docs.select(col("doc_id"), explode(array_distinct(toks)).as("token"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    perDoc.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
      .crossJoin(broadcast(nDocs))
      .filter(col("doc_freq") >= minDf &&
        col("doc_freq").cast("double") <= col("n_docs").cast("double") * 0.5)
      .select(col("token"), col("doc_freq"))
      .orderBy("token")
  }

  /** Corpus-novelty scoring: the fraction of a document's distinct
    * bigrams that occur in no other document. Low novelty = templated /
    * near-duplicated content; a cheap dedup-adjacent quality signal.
    * Gram df counts shuffle once on the gram string. */
  def bigramNovelty(docs: DataFrame): DataFrame = {
    val grams = docs.select(col("doc_id"), toks.as("w"))
      .filter(expr("size(w) >= 2"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, size(w) - 1), i -> concat_ws(' ', slice(w, i, 2))))"))
        .as("g"))
    val df = grams.groupBy(col("g")).agg(count(lit(1)).as("gram_df"))
    grams.join(df, "g")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("gram_df") === 1, 1).otherwise(0)).cast("long").as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_bigrams").cast("double"), 6))
      .orderBy("doc_id")
  }

  /** Dense time-series repair: event counts per (event_type, 15-minute
    * bucket) with explicit zero rows for empty buckets. The bucket axis
    * is generated from the observed min/max (one scalar aggregate) and
    * cross-joined with the distinct types — both broadcast-tiny next to
    * the fact counts they left-join. */
  def gapFillCounts(events: DataFrame, bucketSec: Long = 900): DataFrame = {
    val bucket = expr(s"timestamp_seconds((unix_millis(ts) div ${bucketSec * 1000}) * $bucketSec)")
    val counts = events
      .groupBy(col("event_type"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val bounds = events.agg(
      min(bucket).as("b_min"), max(bucket).as("b_max"))
    val axis = bounds
      .select(explode(expr(s"sequence(b_min, b_max, interval $bucketSec second)")).as("bucket"))
      .crossJoin(events.select(col("event_type")).distinct())
    axis.join(counts, Seq("event_type", "bucket"), "left_outer")
      .select(col("event_type"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy("event_type", "bucket")
  }

  /** Range-frame rolling aggregate: for every event, the count and exact
    * sum of the same user's events in the trailing hour (RANGE frame
    * over epoch millis — peers with equal timestamps are included on
    * both engines). */
  def rollingHour(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
      .rangeBetween(-3600000L, 0L)
    events.select(col("event_id"), col("user_id"), col("value"),
        expr("unix_millis(ts)").as("ms"))
      .withColumn("n_in_hour", count(lit(1)).over(w))
      .withColumn("sum_val_hour", sum(dec2(col("value"))).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("n_in_hour"), col("sum_val_hour"))
      .orderBy("event_id")
  }
}
