package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling pattern: salted two-phase aggregation.
  *
  * At 100 TB a handful of hot keys (one returnflag, one boilerplate doc
  * hash) can pin a single reducer. Salting splits each hot key across
  * `saltBuckets` partial groups — shuffle 1 distributes uniformly over
  * (key, salt), shuffle 2 merges the tiny per-salt partials. Results are
  * identical to the direct aggregation (sums/counts are associative);
  * the equivalence is asserted in tests.
  *
  * With AQE on a real cluster, `spark.sql.adaptive.skewJoin` handles the
  * join-side automatically; explicit salting remains the tool for
  * aggregation skew and for engines/pipelines where AQE is unavailable.
  */
object Skew {

  /** Σ value per key, salted: groupBy(key, salt) partial → groupBy(key)
    * final. `salt = pmod(hash-ish of a uniform column, buckets)` — here a
    * deterministic spread from the row's unique id so the oracle could
    * reproduce it (any uniform column works; randomness is NOT needed). */
  def saltedSum(df: DataFrame, key: String, value: String, id: String,
      saltBuckets: Int = 16): DataFrame = {
    import graft.functions.Exact.dec2
    df.select(col(key), dec2(col(value)).as("v"), pmod(col(id), lit(saltBuckets)).as("salt"))
      .groupBy(col(key), col("salt"))
      .agg(sum(col("v")).as("partial"), count(lit(1)).as("n"))
      .groupBy(col(key))
      .agg(sum(col("partial")).cast("double").as("sum_value"), sum(col("n")).as("n_rows"))
      .orderBy(key)
  }

  /** Salted JOIN — the join-side skew treatment: a hot fact key that
    * would pin one reducer is split across `saltBuckets` sub-keys, and
    * the (small but not broadcast-small) build side is replicated once
    * per salt, so the shuffle distributes over (key, salt) uniformly.
    * Deterministic salt from a uniform fact column (no randomness), so
    * results — and the oracle — are exactly the plain join's. This is
    * what AQE's skew-join split does adaptively; the explicit form is
    * the tool when AQE is off or the skew is known ahead of time. */
  def saltedJoinRevenue(fact: DataFrame, dim: DataFrame,
      saltBuckets: Int = 8): DataFrame = {
    import graft.functions.Exact.discPrice
    val f = fact.select(
      col("l_orderkey"),
      discPrice(col("l_extendedprice"), col("l_discount")).as("rev"),
      pmod(col("l_linenumber"), lit(saltBuckets)).as("salt"))
    val d = dim.select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(array((0 until saltBuckets).map(lit(_)): _*)))
    f.join(d, f("l_orderkey") === d("o_orderkey") && f("salt") === d("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("rev")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }
}
