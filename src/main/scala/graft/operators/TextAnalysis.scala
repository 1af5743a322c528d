package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language-ID
  * heuristic, quality scoring, token counting (whitespace + BPE-ish
  * regex), and rolling-hash document fingerprinting (winnowing-style).
  * All computed with codegen-friendly builtins; ratios use integer
  * numerators/denominators so double division is engine-portable.
  */
object TextAnalysis {

  /** English stopword sample present in the corpus vocabulary. */
  val EnStopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** GPT2-ish token pattern (no lookarounds → portable to RE2). */
  val BpePattern = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"

  private def toks: Column =
    regexp_extract_all(lower(col("text")), lit(WordCount.TokenPattern), lit(0))

  /** N-gram-heuristic language ID: stopword hit ratio → {en, other}. */
  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), toks.as("w"))
      .filter(size(col("w")) > 0)
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(filter(col("w"), x => x.isin(EnStopwords: _*))).cast("long").as("en_hits"))
      .withColumn("en_ratio",
        round(col("en_hits").cast("double") / col("n_tokens").cast("double"), 6))
      .withColumn("pred_lang",
        when(col("en_ratio") > 0.03, lit("en")).otherwise(lit("other")))
      .orderBy("doc_id")

  /** Quality scoring: type/token ratio, mean token length, and a
    * deterministic composite score. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"), toks.as("w"))
      .filter(size(col("w")) > 0)
      .select(
        col("doc_id"), col("n_chars"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_types"),
        aggregate(transform(col("w"), x => length(x)), lit(0), (acc, x) => acc + x)
          .cast("long").as("sum_token_len"))
    val ttrRaw = col("n_types").cast("double") / col("n_tokens").cast("double")
    val lenTerm = least(col("n_tokens"), lit(100L)).cast("double") / lit(100.0)
    base.select(
      col("doc_id"), col("n_chars"), col("n_tokens"), col("n_types"),
      round(ttrRaw, 6).as("ttr"),
      round(col("sum_token_len").cast("double") / col("n_tokens").cast("double"), 6)
        .as("avg_token_len"),
      round((lit(0.5) * ttrRaw) + (lit(0.5) * lenTerm), 6).as("quality"))
      .orderBy("doc_id")
  }

  /** Token counting per source: whitespace tokens vs BPE-ish regex
    * tokens, aggregated per source. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
        col("source"),
        size(filter(split(col("text"), "\\s+"), x => x =!= "")).cast("long").as("ws"),
        size(regexp_extract_all(lower(col("text")), lit(BpePattern), lit(0))).cast("long").as("bpe"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"))
      .withColumn("avg_bpe_per_doc",
        round(col("bpe_tokens").cast("double") / col("n_docs").cast("double"), 6))
      .orderBy("source")

  /** Winnowing-style fingerprints: md5 of char-5-grams, window-min over
    * 4 consecutive positions, per-doc distinct fingerprint stats. */
  def docFingerprint(docs: DataFrame): DataFrame = {
    // positions exploded directly (no intermediate gram array): substring
    // + md5 stay inside whole-stage codegen, and the text column is
    // projected away within the same stage
    // filter + positions both index the LOWERED string: for chars whose
    // lowercase form changes string length the two would otherwise desync
    val grams = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 5)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), length(col("t")) - 4)).as("pos"))
      .select(col("doc_id"), col("pos"),
        substring(md5(expr("substring(t, pos, 5)")), 1, 8).as("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(0, 3)
    grams.select(col("doc_id"), min(col("h")).over(w).as("wmin"))
      .groupBy("doc_id")
      .agg(
        countDistinct(col("wmin")).as("n_fp"),
        min(col("wmin")).as("fp_min"),
        max(col("wmin")).as("fp_max"))
      .orderBy("doc_id")
  }
}
