package graft

import graft.operators.Behavior
import org.apache.spark.sql.Row

/** Hand-computed fixtures + full independent recomputes for the
  * behavioral-analytics operators. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def li(rows: Seq[(Long, Long)]) =
    rows.toDF("l_orderkey", "l_partkey")

  test("basket lift: hand fixture support/confidence/lift") {
    // o1 {1,2,3}, o2 {1,2}, o3 {1,2}, o4 {3}: N=4, n1=n2=3, n3=2,
    // n12(1,2)=3, (1,3)=(2,3)=1 → top pair (1,2): support 750000,
    // conf 1000000, lift 1000·4·3/9 = 1333
    val f = li(Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (4L, 3L)))
    val r = Behavior.basketLift(f).collect()
    assert(r.length == 3)
    assert(r(0).toSeq == Seq(1L, 2L, 3L, 3L, 3L, 750000L, 1000000L, 1333L),
      s"got ${r(0)}")
    // (1,3): n12=1, n1=3, n3=2 → lift = 1000·4/6 = 666
    assert(r(1).toSeq == Seq(1L, 3L, 1L, 3L, 2L, 250000L, 333333L, 666L),
      s"got ${r(1)}")
  }

  test("triangle census: one planted triangle with full closure") {
    // two identical baskets {1,2,3}: all 3 edges reach co=2 → 3 nodes,
    // 3 edges, 1 triangle, 3 wedges, closure = 1000
    val f = li(Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (4L, 3L), (5L, 1L), (5L, 2L), (5L, 3L)))
    val r = Behavior.trianglesCoPurchase(f).collect()
    assert(r.toSeq == Seq(Row(3L, 3L, 1L, 0L, 1000L)), s"got ${r.toSeq}")
  }

  test("triangle census: below-threshold edges drop (no triangle from single co-purchases)") {
    val f = li(Seq((1L, 1L), (1L, 2L), (1L, 3L)))
    val r = Behavior.trianglesCoPurchase(f).collect()
    assert(r.toSeq == Seq(Row(0L, 0L, 0L, 0L, null)), s"got ${r.toSeq}")
  }

  test("rfm: codes match a plain-Scala quartile recompute on sf0.001") {
    val got = Behavior.rfmSegments(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val perCust = Tables.customer(spark, sf0001).select($"c_custkey")
      .join(Tables.orders(spark, sf0001)
        .groupBy($"o_custkey")
        .agg(org.apache.spark.sql.functions.expr(
            "max(CAST(o_orderdate AS DATE))").as("last_day"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("freq"),
          org.apache.spark.sql.functions.expr(
            "sum(CAST(round(o_totalprice * 100) AS BIGINT))").as("cents")),
        $"o_custkey" === $"c_custkey", "left")
      .selectExpr("c_custkey", "CAST(last_day AS STRING) AS last_day",
        "coalesce(freq, 0L) AS freq", "coalesce(cents, 0L) AS cents")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        r.getLong(3)))
    val n = perCust.length.toLong
    def codes(ranked: Seq[Long]): Map[Long, Long] =
      ranked.zipWithIndex.map { case (ck, i) =>
        ck -> ((i + 1).toLong * 4 + n - 1) / n }.toMap
    // None (no orders) sorts first — matches asc_nulls_first
    val rC = codes(perCust.sortBy(c => (c._2.isDefined, c._2.getOrElse(""),
      c._1)).map(_._1))
    val fC = codes(perCust.sortBy(c => (c._3, c._1)).map(_._1))
    val mC = codes(perCust.sortBy(c => (c._4, c._1)).map(_._1))
    val expect = perCust.groupBy(c => (rC(c._1), fC(c._1), mC(c._1)))
      .map { case (k, cs) =>
        val tot = cs.map(_._4).sum
        k -> ((cs.length.toLong, tot, tot / cs.length)) }
    assert(got == expect,
      s"rfm mismatch; got ${got.size} cells vs ${expect.size}")
    assert(got.values.map(_._1).sum == n, "cells must partition customers")
  }

  test("event trigrams: one user's ordered stream yields its sliding 3-grams") {
    val ts = (i: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    val f = Seq((1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"),
      (1L, ts(3), 3L, "c"), (1L, ts(4), 4L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Behavior.eventTrigrams(f).collect()
    assert(r.map(_.toSeq).toSet == Set(
      Seq("a", "b", "c", 1L, 500000L), Seq("b", "c", "b", 1L, 500000L)),
      s"got ${r.toSeq}")
  }
}
