package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) data layout — the multi-dimensional clustering
  * trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the
  * bits of two sort keys places rows that are close in BOTH dimensions
  * into the same parquet row groups, so min/max statistics prune a
  * 2-D box predicate down to a few row groups where a lexicographic
  * (x, y) sort only prunes on the leading column.
  *
  * At 100 TB this is a WRITE-side operator: one range-partitioned sort
  * by the z-key at layout time buys every subsequent selective scan a
  * row-group skip (the same scan-efficiency class as partition pruning
  * — BucketingSpec covers the join side, this covers the predicate
  * side). ZorderSpec measures the effect directly: the same box
  * predicate decodes an order of magnitude fewer rows from a z-ordered
  * file than from an id-ordered one, purely from pushed-down parquet
  * row-group stats.
  *
  * The key is pure integer bit arithmetic (shift/mask/or over the low
  * `bits` of each dimension — a codegen-friendly expression tree, no
  * UDF), which also makes it oracle-checkable: DuckDB mirrors each
  * extracted bit as (x // 2^i) % 2 scaled to 4^i / 2·4^i. */
object Zorder {

  /** Morton interleave of the low `bits` bits of x (even positions) and
    * y (odd positions). 16+16 bits fits comfortably in a BIGINT. */
  def zkey(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_.bitwiseOR(_)).cast("long")

  /** Layout pass: range-partition + sort by the z-key of (xCol, yCol) —
    * the write-side clustering step. `numFiles` range partitions give
    * file-level locality; row-group stats give intra-file skipping. */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int): DataFrame = {
    val z = zkey(col(xCol), col(yCol))
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Registry surface: per-z-octant row counts and key bounds over
    * lineitem's (partkey, suppkey) plane — exercises the full 32-bit
    * interleave with an exact integer oracle. The octant grouping keeps
    * the output bounded (8 rows) while every underlying z-key feeds the
    * min/max/sum columns, so a single bit error anywhere flips the
    * hash. */
  def zorderCurve(docs: DataFrame): DataFrame = {
    // multiplicative spread (Lehmer constants) so the plane is occupied
    // across all 16 bits at every sf — raw sf0.01 keys are ≤ 11 bits
    // and would leave the high interleave bits structurally zero
    val z = zkey(pmod(col("l_partkey") * lit(48271L), lit(65536L)),
      pmod(col("l_suppkey") * lit(16807L), lit(65536L)))
    docs
      .select(z.as("zkey"))
      .withColumn("octant", shiftright(col("zkey"), 29))
      .groupBy("octant")
      .agg(count(lit(1)).as("n"),
        min(col("zkey")).as("z_min"),
        max(col("zkey")).as("z_max"),
        sum(col("zkey")).as("z_sum"))
      .orderBy("octant")
  }
}
