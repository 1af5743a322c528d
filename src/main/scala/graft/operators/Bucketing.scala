package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed co-located joins: pay a table's shuffle ONCE at write time,
  * then every subsequent join on the bucket key is exchange-free.
  *
  * At 100 TB this is the difference between re-shuffling two fact tables
  * for every recurring join (orders ⋈ lineitem runs daily in any
  * warehouse) and never shuffling them again: both sides are written
  * `bucketBy(n, key).sortBy(key)`, so SortMergeJoin's clustering +
  * ordering requirements are satisfied straight off the scan.
  * BucketingSpec asserts the resulting plan contains no Exchange.
  *
  * The reference's one join-free pipeline has no analogue operator; this
  * generalizes its hash-partition step (SURVEY.md O8) from "partition
  * once per run" to "partition once, period".
  */
object Bucketing {

  /** Write df as a bucketed+sorted managed parquet table (bucketBy
    * requires saveAsTable; the warehouse dir is session-configured). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a previous JVM's managed-table files survive the in-memory catalog;
    // an orphaned location fails CREATE TABLE AS even in overwrite mode
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      table.toLowerCase)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    if (loc.exists()) rm(loc)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. With matching bucket
    * counts this plans as SortMergeJoin over the bucketed scans — zero
    * Exchange, zero Sort beyond the scan's own order. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      col(leftKey) === col(rightKey))
}
