package graft.operators

import graft.QueryDef

/** Driver-contract wiring for BPE tokenizer training/encoding.
  *
  * The oracle unrolls the identical ten greedy merge rounds as a CTE
  * chain (the pagerank_neardup technique — DuckDB has no iterative
  * UPDATE, and its recursive CTEs forbid aggregates in the recursive
  * term, so the loop is written out round by round). Every round's
  * argmax tie-break (weight DESC, pair ASC) and the wrapped-symbol
  * `replace` merge are mirrored exactly; both engines' `replace` is
  * left-to-right non-overlapping, which the '(a)(b)' wrapping turns
  * into the same greedy merge (see Tokenizer's scaladoc). */
object TokenizerQueries {

  /** CTE chain w0/s0, then p{r}/b{r}/s{r} for r = 1..rounds. */
  private def bpeChain(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++=
      """w0 AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS word
        |    FROM documents)
        |  GROUP BY word),
        |s0 AS (SELECT word, freq, regexp_replace(word, '(.)', '(\1)', 'g') AS sym FROM w0)""".stripMargin
    for (r <- 1 to rounds) {
      val prev = s"s${r - 1}"
      sb ++= s""",
        |p$r AS MATERIALIZED (
        |  SELECT pair, CAST(sum(freq) AS BIGINT) AS weight FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(ss)),
        |             i -> ss[i] || ss[i + 1])) AS pair
        |    FROM (SELECT freq, regexp_extract_all(sym, '\\([^)]*\\)') AS ss FROM $prev))
        |  GROUP BY pair),
        |b$r AS MATERIALIZED (SELECT CAST($r AS BIGINT) AS rank, pair,
        |          replace(pair, ')(', '') AS merged, weight
        |        FROM p$r ORDER BY weight DESC, pair ASC LIMIT 1),
        |s$r AS MATERIALIZED (SELECT word, freq,
        |          replace(sym, (SELECT pair FROM b$r), (SELECT merged FROM b$r)) AS sym
        |        FROM $prev)""".stripMargin
    }
    sb.result()
  }

  private val vocabSql = {
    val union = (1 to Tokenizer.Rounds).map(r => s"SELECT * FROM b$r")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH ${bpeChain(Tokenizer.Rounds)}
       |SELECT rank, pair, merged, weight FROM (
       |  $union)
       |ORDER BY rank""".stripMargin
  }

  private val encodeSql =
    s"""WITH ${bpeChain(Tokenizer.Rounds)},
       |v AS (SELECT word,
       |        CAST(len(regexp_extract_all(sym, '\\([^)]*\\)')) AS BIGINT) AS n_sym
       |      FROM s${Tokenizer.Rounds}),
       |t AS (SELECT doc_id,
       |        unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS word
       |      FROM documents)
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(n_sym) AS BIGINT) AS n_symbols,
       |  round(CAST(sum(n_sym) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS syms_per_token
       |FROM t JOIN v USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val fertilitySql =
    s"""WITH ${bpeChain(Tokenizer.Rounds)},
       |v AS (SELECT word,
       |        CAST(len(regexp_extract_all(sym, '\\([^)]*\\)')) AS BIGINT) AS n_sym
       |      FROM s${Tokenizer.Rounds}),
       |t AS (SELECT lang, doc_id,
       |        unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS word
       |      FROM documents)
       |SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_tokens,
       |  CAST(sum(n_sym) AS BIGINT) AS n_symbols,
       |  round(CAST(sum(n_sym) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS fertility
       |FROM t JOIN v USING (word)
       |GROUP BY lang ORDER BY lang""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("bpe_vocab", Tokenizer.bpeVocabQuery, Some(vocabSql)),
    QueryDef("bpe_encode_stats", Tokenizer.bpeEncodeStats, Some(encodeSql)),
    QueryDef("bpe_fertility", Tokenizer.bpeFertility, Some(fertilitySql)),
  )
}
