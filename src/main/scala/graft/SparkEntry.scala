package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a QueryDef
  * (Spark plan + DuckDB oracle SQL where expressible); modules register
  * their defs here. Column names and ordering are deterministic and
  * identical on both sides (the driver hash-compares values after sorting
  * columns by name).
  */
object SparkEntry {

  /** All registered query definitions, in module order. */
  val registry: Seq[QueryDef] =
    WordCountQueries.defs ++
    RelationalQueries.defs ++
    TpchMoreQueries.defs ++
    DedupQueries.defs ++
    SimJoinQueries.defs ++
    SearchQueries.defs ++
    SimilarityQueries.defs ++
    TextAnalysisQueries.defs ++
    TokenizerQueries.defs ++
    PipelineQueries.defs ++
    TemporalQueries.defs ++
    MultimodalQueries.defs ++
    StatsQueries.defs ++
    BehaviorQueries.defs ++
    MlEvalQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one real query: word-count + Top-20
    * (reference coordinator/coordinator.py:135-244,251). */
  def entry(spark: SparkSession): DataFrame =
    WordCount.top20(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
