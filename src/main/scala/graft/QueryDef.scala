package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan builder plus, when the
  * semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle SQL
  * (same column names, same deterministic ordering — the driver
  * hash-compares values after sorting columns by name). `oracle = None`
  * downgrades the driver's check to rows-only. */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
