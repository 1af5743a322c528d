package graft

import org.apache.spark.sql.functions._

/** Runtime-adaptivity evidence for the 100 TB story: the two Spark
  * mechanisms that repair a plan AT RUNTIME when static planning guesses
  * wrong — AQE skew-join splitting (a hot key cannot wedge one reducer)
  * and runtime bloom-filter injection (a selective dim filter prunes the
  * fact scan's shuffle before the join). Both are config-on behaviors;
  * these specs pin that the shipped configs actually trigger them, with
  * thresholds scaled down to test-data sizes.
  */
class ScaleFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // one viral key holds ~80% of the left side's bytes; the other
      // keys spread thin — the static plan sends the viral key to ONE
      // reducer, AQE must split it after seeing map output sizes
      val left = spark.range(0, 60000).select(
        when($"id" < 50000, lit(0L)).otherwise($"id").as("k"),
        lpad($"id".cast("string"), 96, "x").as("pad"))
      val right = spark.range(0, 2000).select($"id".as("k"), lit(1L).as("w"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length($"pad")).as("bytes"))
      val Array(row) = joined.collect()
      // correctness first: only the viral key 0 matches (left ids >= 50000
      // keep their own id as key, all beyond the right side's 0..1999)
      assert(row.getLong(0) == 50000, s"wrong join cardinality: $row")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "AQE did not finalize the plan")
      assert(plan.contains("skew=true") || plan.toLowerCase.contains("skewed"),
        s"skewed partition was not split:\n$plan")
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // selective filter on the dim side → Spark builds a bloom filter
      // over the surviving join keys and applies it to the fact side
      // BEFORE the shuffle, cutting shuffled bytes by the selectivity
      // plain scans (no spread repartition): InjectRuntimeFilter only
      // fires when the creation side is a selective Filter directly over
      // a scan — exactly the shape a real cluster read has
      val fact = Tables.table(spark, sf0001, "lineitem")
      val dim = Tables.table(spark, sf0001, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      val j = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // and the result is unaffected by the filter's false positives
      val n = j.collect().head.getLong(1)
      val expected = fact.join(dim.select("o_orderkey"), $"l_orderkey" === $"o_orderkey").count()
      assert(n == expected, s"bloom-filtered join changed the result: $n vs $expected")
    }
  }
}
