package graft

import graft.operators.{Relational, Temporal}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source-format breadth (CSV/JSON round-trips — the reference reads only
  * txt/zip, SURVEY §2.2) and sketch-accuracy bounds. */
class FormatsAndSketchesSpec extends SparkSpec {
  import spark.implicits._

  test("CSV round-trip preserves the customer table") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/c"
    val cust = Tables.customer(spark, sf0001)
    cust.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(cust.schema).csv(dir)
    assert(back.count() == cust.count())
    assert(back.exceptAll(cust).count() == 0)
  }

  test("ORC round-trip preserves the orders table") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/o"
    val orders = Tables.orders(spark, sf0001)
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).count() == 0)
  }

  test("parquet schema evolution: mergeSchema unions columns across file generations") {
    // corpora evolve: generation 1 lacks the column generation 2 adds.
    // mergeSchema must read both, null-filling the missing column.
    val dir = Files.createTempDirectory("graft-evolve").toString + "/t"
    val docs = Tables.documents(spark, sf0001)
    docs.select($"doc_id", $"lang").limit(100)
      .write.mode("overwrite").parquet(s"$dir/gen=1")
    docs.select($"doc_id", $"lang", $"n_chars").limit(50)
      .write.mode("overwrite").parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars", "gen"))
    assert(merged.count() == 150)
    assert(merged.filter($"gen" === 1 && $"n_chars".isNotNull).count() == 0)
    assert(merged.filter($"gen" === 2 && $"n_chars".isNull).count() == 0)
  }

  test("parquet zstd codec round-trips the lineitem table") {
    val dir = Files.createTempDirectory("graft-zstd").toString + "/l"
    val li = Tables.lineitem(spark, sf0001)
    li.write.mode("overwrite").option("compression", "zstd").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).count() == 0)
  }

  test("JSON round-trip preserves word counts (reference O11 shape, JSON-lines)") {
    val dir = Files.createTempDirectory("graft-json").toString + "/w"
    val counts = graft.operators.WordCount.tokenCounts(Tables.documents(spark, sf0001))
    graft.sources.JsonSink.writeJsonLines(counts, dir)
    val back = spark.read.json(dir)
    assert(back.count() == counts.count())
    val diff = back.select($"word", $"cnt".cast("long").as("cnt"))
      .exceptAll(counts).count()
    assert(diff == 0)
  }

  test("approx_count_distinct satisfies the HLL relative-error bound vs exact") {
    // HLL++ at relative standard deviation `rsd` estimates with standard
    // error rsd·n; hold every group's observed error to 3σ = 3·rsd
    // (p(exceed) ≈ 0.3% per group under the estimator's near-normality)
    // against the EXACT distinct query — the sketch analogue of the GK
    // rank-bound check below. Both sketched columns are bounded.
    val rsd = Relational.HllRsd
    val r = Relational.approxDistinct(spark, sf0001)
      .join(Relational.exactDistinct(spark, sf0001), "l_returnflag")
      .select("l_returnflag", "exact_parts", "approx_parts",
        "exact_orders", "approx_orders")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (flag, exactP, approxP, exactO, approxO) =>
      Seq(("parts", exactP, approxP), ("orders", exactO, approxO)).foreach {
        case (what, exact, approx) =>
          assert(math.abs(approx - exact).toDouble / exact <= 3 * rsd,
            s"$flag $what: approx $approx vs exact $exact exceeds 3*rsd=${3 * rsd}")
      }
    }
  }

  test("approx_percentile satisfies the rank-error bound vs the data") {
    // GK sketch guarantee at accuracy A: the returned element's rank
    // interval [count(<v), count(<=v)] intersects target ± N/A. The
    // interval form is tie-robust (l_quantity repeats heavily).
    val li = Tables.lineitem(spark, sf0001)
      .select($"l_returnflag", $"l_quantity").cache()
    val ap = Relational.approxPercentilesByFlag(spark, sf0001)
      .select("l_returnflag", "ap50_qty", "ap90_qty")
      .as[(String, Double, Double)].collect()
    ap.foreach { case (flag, p50, p90) =>
      val vals = li.filter($"l_returnflag" === flag)
        .select("l_quantity").as[Double].collect().sorted
      val n = vals.length.toDouble
      val eps = n / 1000.0 + 1
      Seq((p50, 0.5), (p90, 0.9)).foreach { case (v, q) =>
        val below = vals.count(_ < v)
        val atOrBelow = vals.count(_ <= v)
        assert(below <= q * n + eps && atOrBelow >= q * n - eps,
          s"$flag p$q=$v rank [$below,$atOrBelow] outside ${q * n} ± $eps of n=$n")
      }
    }
    li.unpersist()
  }

  test("sketch audit twins: ok flags all pass and exact columns match a direct recount") {
    val da = Relational.approxDistinctAudit(spark, sf0001).collect()
    assert(da.nonEmpty)
    da.foreach { r =>
      assert(r.getAs[Long]("parts_ok") == 1L && r.getAs[Long]("orders_ok") == 1L,
        s"HLL bound violated for flag ${r.getString(0)}")
      assert(r.getAs[Long]("bound_permille") == 150L)
    }
    // exact column cross-check for one group
    val f = da.head.getString(0)
    val direct = Tables.lineitem(spark, sf0001)
      .filter($"l_returnflag" === f)
      .agg(countDistinct($"l_partkey")).head().getLong(0)
    assert(da.head.getAs[Long]("n_parts_exact") == direct)

    val pa = Relational.approxPercentileAudit(spark, sf0001).collect()
    assert(pa.map(_.getAs[Long]("q_permille")).toSeq == Seq(250L, 500L, 900L))
    pa.foreach { r =>
      assert(r.getAs[Long]("ok") == 1L,
        s"GK rank bound violated at q=${r.getAs[Long]("q_permille")}")
      assert(r.getAs[Long]("rank_lo_req") < r.getAs[Long]("rank_hi_req"))
    }
  }

  test("as-of join: every matched signup is at-or-before its purchase, and is the latest") {
    val events = Tables.events(spark, sf0001)
    val asof = Temporal.asofSignupPurchase(events)
    assert(asof.filter($"last_signup" > $"purchase_ts").count() == 0)
    // cross-check one user against a driver-side brute force
    val u = asof.filter($"last_signup".isNotNull)
      .select("user_id").as[Long].head()
    val signups = events.filter($"event_type" === "signup" && $"user_id" === u)
      .select("ts").as[java.sql.Timestamp].collect().map(_.getTime).sorted
    val purchases = asof.filter($"user_id" === u)
      .select($"purchase_ts", $"last_signup")
      .as[(java.sql.Timestamp, Option[java.sql.Timestamp])].collect()
    purchases.foreach { case (p, ls) =>
      val expect = signups.filter(_ <= p.getTime).lastOption
      assert(ls.map(_.getTime) == expect, s"user $u purchase $p")
    }
  }

  test("cube contains rollup plus the (ALL, status) slices") {
    val cube = Relational.cubeRevenue(spark, sf0001)
    val rollup = Relational.rollupRevenue(spark, sf0001)
    assert(cube.count() > rollup.count())
    assert(rollup.exceptAll(cube).count() == 0, "rollup rows must all appear in cube")
  }
}
