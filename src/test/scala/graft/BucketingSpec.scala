package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located join: shuffle paid at write time, joins
  * exchange-free afterward. */
class BucketingSpec extends SparkSpec {

  test("bucketed orders ⋈ lineitem joins with zero Exchange") {
    val orders = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 4)
    // sf0.001 fits under the broadcast threshold; disable it so the plan
    // is the one two FACT tables would get (broadcast is not an option at
    // real scale — co-location is)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark,
        "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin in:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // same answer as the plain shuffle join over the raw tables
      val expected = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("date-partitioned write enables partition pruning on read") {
    import spark.implicits._
    val events = Tables.events(spark, sf0001)
      .withColumn("day", to_date(col("ts")))
    val dir = "/tmp/graft-events-by-day"
    events.write.mode("overwrite").partitionBy("day").parquet(dir)
    val firstDay = events.agg(min(col("day"))).as[java.sql.Date].head()
    val pruned = spark.read.parquet(dir).filter(col("day") === lit(firstDay))
    val plan = pruned.queryExecution.executedPlan.toString
    // the day predicate must prune directories, not filter rows post-scan
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"expected partition pruning in:\n$plan")
    assert(pruned.count() == events.filter(col("day") === lit(firstDay)).count())
  }
}
