package graft

import org.apache.spark.sql.SparkSession

/** Scratch feature probe — NOT part of the engine; removed before commit. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    try {
      val r = spark.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n < 5) SELECT sum(n) AS s FROM t")
      println("RECURSIVE OK: " + r.collect().mkString(","))
    } catch { case e: Throwable => println("RECURSIVE FAIL: " + e.toString.take(300)) }
    try {
      val r = spark.sql(
        "SELECT cast(variant_get(parse_json('{\"a\": 7, \"b\": [1,2]}'), '$.a') AS long) AS a, cast(variant_get(parse_json('{\"a\": 7, \"b\": [1,2]}'), '$.b[1]') AS long) AS b1")
      println("VARIANT OK: " + r.collect().mkString(","))
    } catch { case e: Throwable => println("VARIANT FAIL: " + e.toString.take(300)) }
    try {
      val r = spark.sql("SELECT replace(' a a a ', ' a a ', ' aa ') AS x")
      println("REPLACE: [" + r.collect()(0).getString(0) + "]")
    } catch { case e: Throwable => println("REPLACE FAIL: " + e.toString.take(300)) }
    try {
      val r = spark.sql(
        "WITH RECURSIVE t(n, acc) AS (SELECT 1, 100 UNION ALL SELECT n+1, floor(acc * 95 / 100) + n FROM t WHERE n < 10) SELECT * FROM t ORDER BY n")
      println("RECUR2 OK: " + r.collect().mkString(","))
    } catch { case e: Throwable => println("RECUR2 FAIL: " + e.toString.take(300)) }
    spark.stop()
  }
}
