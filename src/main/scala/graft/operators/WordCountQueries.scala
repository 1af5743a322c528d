package graft.operators

import graft.{QueryDef, Tables}

/** Driver-contract wiring for the reference-surface word-count family. */
object WordCountQueries {

  private val tokensCte =
    """WITH w AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS word
      |  FROM documents)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("wordcount_top20",
      (s, d) => WordCount.top20(Tables.documents(s, d)), Some(
        s"""$tokensCte
           |SELECT word, count(*) AS cnt FROM w GROUP BY word
           |ORDER BY cnt DESC, length(word) DESC, word ASC LIMIT 20""".stripMargin)),

    QueryDef("token_counts",
      (s, d) => WordCount.tokenCounts(Tables.documents(s, d)).orderBy("word"), Some(
        s"""$tokensCte
           |SELECT word, count(*) AS cnt FROM w GROUP BY word ORDER BY word""".stripMargin)),

    QueryDef("word_partition_counts",
      (s, d) => WordCount.partitionCounts(Tables.documents(s, d)), Some(
        s"""$tokensCte,
           |wc AS (SELECT word, count(*) AS cnt FROM w GROUP BY word)
           |SELECT substring(md5(word), 1, 1) AS part,
           |       count(*) AS n_words, CAST(sum(cnt) AS BIGINT) AS total_cnt
           |FROM wc GROUP BY 1 ORDER BY part""".stripMargin)),

    QueryDef("doc_stats",
      (s, d) => WordCount.docStats(Tables.documents(s, d)), Some(
        """SELECT doc_id,
          |       CAST(length(text) AS BIGINT) AS n_chars,
          |       CAST(len(regexp_extract_all(lower(text), '[a-z'']+')) AS BIGINT) AS n_tokens,
          |       CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z'']+'))) AS BIGINT) AS n_distinct
          |FROM documents ORDER BY doc_id""".stripMargin)),
  )
}
