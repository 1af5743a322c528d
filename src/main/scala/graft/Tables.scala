package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * table parquet from there. Filters/projections applied downstream are
  * pushed into the parquet scan by Catalyst (verify via
  * `.explain("formatted")` → PushedFilters / ReadSchema).
  */
object Tables {
  /** Data-model cap on `events.value` — the generator clamps its
    * exponential tail here (GenSf events: `least(..., MaxEventValue)`;
    * the driver's testdata observes the same bound). Operators whose
    * scale argument rests on a bounded milli-value grid (mannWhitney's
    * ≤ MaxEventValue·1000 + 1 cell table) guard against this ONE
    * constant, so the documented bound cannot drift from the data
    * (advisor r13: the comment claimed 100 while the generator wrote
    * 599). */
  val MaxEventValue = 599.0

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Unsplittable-source spreader. Parquet's split unit is the ROW
    * GROUP: a table written as one row group scans as ONE task no matter
    * what maxPartitionBytes says (all the testdata tables are single-row-
    * group files — jstack during stalls showed 31 of 32 executor threads
    * parked while one ground through a codegen'd explode/agg). When the
    * scan has pathologically few partitions vs the session's parallelism,
    * redistribute once right after the scan, hash-partitioned on the
    * table's downstream key so the exchange can double as the shuffle a
    * window/groupBy on that key would need anyway (hash repartition also
    * avoids round-robin's sort-before-repartition pass). At real scale —
    * many row groups / many files — the condition is false and this is a
    * no-op, so nothing extra shuffles on a 100 TB scan. */
  /** The spread decision depends only on (file layout, parallelism), so
    * memoize it per table path. The partition count is ESTIMATED from
    * the file listing with the same maxSplitBytes arithmetic the file
    * scan uses — a pure metadata read. (Through round 7 this called
    * `df.rdd.getNumPartitions`, which forces physical planning of the
    * scan on every first load even when the spread is a no-op — pure
    * driver overhead, and planner work a 100 TB catalog would never
    * spend on a load-time heuristic.) */
  private val spreadCache = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  private def spread(df: DataFrame, key: String, path: String): DataFrame = {
    // Cluster kill-switch: a real deployment (many files / row groups per
    // table) never needs the spreader — set
    // spark.graft.spread.enabled=false and the scan plan is PROVABLY
    // untouched (no injected repartition; asserted by PlanShapeSpec).
    val spark = df.sparkSession
    if (!spark.conf.get("spark.graft.spread.enabled", "true").toBoolean)
      return df
    val p = spark.sparkContext.defaultParallelism
    val need = spreadCache.computeIfAbsent(s"$path#$p", { _ =>
      import org.apache.spark.network.util.JavaUtils.byteStringAsBytes
      val maxPB = byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
      val openCost = byteStringAsBytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4MB"))
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val sizes = fs.listStatus(hp).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .map(_.getLen)
      // FilePartition.maxSplitBytes: min(maxPartitionBytes,
      // max(openCost, (totalBytes incl. open costs) / parallelism))
      val total = sizes.map(_ + openCost).sum
      val maxSplit = math.min(maxPB, math.max(openCost, total / math.max(1, p)))
      val est = sizes.map(sz => math.max(1L, (sz + maxSplit - 1) / maxSplit)).sum
      est * 2 < p
    })
    if (need) df.repartition(p, org.apache.spark.sql.functions.col(key))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    =
    spread(table(s, d, "orders"), "o_orderkey", s"$d/orders.parquet")
  def lineitem(s: SparkSession, d: String): DataFrame  =
    spread(table(s, d, "lineitem"), "l_orderkey", s"$d/lineitem.parquet")
  /** events.ts normalization seam. The driver's fixture generator has
    * shipped the column in two physical layouts over time:
    *  - INT64 TIMESTAMP(NANOS): Spark 4 reads it only under
    *    spark.sql.legacy.parquet.nanosAsLong=true (set in all session
    *    builders) and surfaces it as LongType nanos → convert to a µs
    *    timestamp (the data is µs-aligned, so exact).
    *  - TIMESTAMP(isAdjustedToUTC=false, µs): Spark 4's default
    *    inferTimestampNTZ reads it as TIMESTAMP_NTZ, which every
    *    unix_millis()/window() downstream rejects → cast to TIMESTAMP.
    *    The session timezone is pinned UTC in every builder, so the
    *    cast is exact and matches DuckDB's naive-epoch epoch_ms.
    * Every consumer goes through this loader, so downstream code can
    * assume a plain UTC TimestampType `ts` regardless of fixture vintage. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    val typed = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", raw("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
    // user_id: sessionize/window queries cluster on it next
    spread(typed, "user_id", s"$d/events.parquet")
  }
  def documents(s: SparkSession, d: String): DataFrame =
    spread(table(s, d, "documents"), "doc_id", s"$d/documents.parquet")
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(table(s, d, "embeddings"), "vec_id", s"$d/embeddings.parquet")

  /** Memoized table row count — the catalog statistic scale-adaptive
    * operators (LSH plane count, IVF centroid count) derive their
    * parameters from. Counted once per (path) on the RAW scan (no
    * spread repartition in the plan — a count needs no shuffle), then
    * served from the cache exactly like a catalog's rowCount stat; a
    * real deployment reads this from table metadata without any job. */
  private val countCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def rowCount(s: SparkSession, d: String, name: String): Long =
    countCache.computeIfAbsent(s"$d/$name", _ => table(s, d, name).count())
}
