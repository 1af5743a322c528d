package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as an entry in
  * `queries` (Spark plan) with, where SQL-expressible, a DuckDB-equivalent
  * oracle in `oracleSql`. Column names and ordering are deterministic and
  * identical on both sides (the driver hash-compares values after sorting
  * columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one real query: word-count + Top-20
    * (reference coordinator/coordinator.py:135-244,251). */
  def entry(spark: SparkSession): DataFrame =
    WordCount.top20(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- M1/M2: reference surface (word-count family) ----
    "wordcount_top20" -> ((s, d) => WordCount.top20(Tables.documents(s, d))),
    "token_counts" -> ((s, d) =>
      WordCount.tokenCounts(Tables.documents(s, d)).orderBy("word")),
    "word_partition_counts" -> ((s, d) =>
      WordCount.partitionCounts(Tables.documents(s, d))),
    "doc_stats" -> ((s, d) => WordCount.docStats(Tables.documents(s, d))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "wordcount_top20" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS word
        |  FROM documents)
        |SELECT word, count(*) AS cnt FROM w GROUP BY word
        |ORDER BY cnt DESC, length(word) DESC, word ASC LIMIT 20""".stripMargin,
    "token_counts" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS word
        |  FROM documents)
        |SELECT word, count(*) AS cnt FROM w GROUP BY word ORDER BY word""".stripMargin,
    "word_partition_counts" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS word
        |  FROM documents),
        |wc AS (SELECT word, count(*) AS cnt FROM w GROUP BY word)
        |SELECT substring(md5(word), 1, 1) AS part,
        |       count(*) AS n_words, sum(cnt) AS total_cnt
        |FROM wc GROUP BY 1 ORDER BY part""".stripMargin,
    "doc_stats" ->
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(len(regexp_extract_all(lower(text), '[a-z'']+')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z'']+'))) AS BIGINT) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
