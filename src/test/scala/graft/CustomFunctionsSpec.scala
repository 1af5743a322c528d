package graft

import graft.functions.{GraftFunctions, ScoredId, TopKAggregator}
import graft.operators.{Relational, Similarity}
import org.apache.spark.sql.functions._

/** Custom Catalyst surface: native cosine expression (codegen) and the
  * typed top-k aggregator, checked against their composed-builtin
  * equivalents. */
class CustomFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine_sim is bit-identical to the composed 64-term chain") {
    val emb = Tables.embeddings(spark, sf0001)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea")).filter($"ia" < 30)
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb")).filter($"ib" >= 30 && $"ib" < 60)
    val both = a.crossJoin(b).select(
      GraftFunctions.cosine_sim(spark, $"ea", $"eb").as("native"),
      Similarity.cosineCol($"ea", $"eb").as("chain"))
    // exact equality, not tolerance: same IEEE operation order
    assert(both.filter($"native" =!= $"chain").count() == 0)
  }

  test("cosine_sim is callable from SQL after registration") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf0001).limit(5).createOrReplaceTempView("emb_test")
    val r = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_test")
      .as[Double].collect()
    assert(r.length == 5 && r.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("cosine_sim rejects non-float-array inputs at analysis time") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf0001).limit(1).createOrReplaceTempView("doc_test")
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(text, text) FROM doc_test").collect()
    }
    assert(e.getMessage.contains("cosine_sim"))
  }

  test("native lsh_bucket matches the composed sign-projection chain") {
    import org.apache.spark.sql.Column
    // rebuild the ±1 chain form the expression replaced, and require
    // exact bucket equality (same IEEE sum order by construction)
    def projChain(e: Column, j: Int): Column =
      (1 to Similarity.Dim).map { i =>
        val el = element_at(e, i).cast("double")
        if (Similarity.lshSigns(j)(i - 1) > 0) el else -el
      }.reduce(_ + _)
    def chainBucket(e: Column): Column =
      (0 until Similarity.LshPlanes).map(j =>
        when(projChain(e, j) > 0, lit(1 << j)).otherwise(lit(0))).reduce(_ + _)
    val emb = Tables.embeddings(spark, sf0001)
    val both = emb.select(
      GraftFunctions.lsh_bucket(spark, $"embedding", Similarity.LshPlanes).as("native"),
      chainBucket($"embedding").as("chain"))
    assert(both.filter($"native" =!= $"chain").count() == 0)
  }

  test("lsh_bucket interpreted eval agrees with codegen") {
    val e = graft.functions.LshBucket(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array.fill(64)(0.25f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      6)
    val interpreted = e.eval(null).asInstanceOf[Int]
    val viaQuery = Tables.embeddings(spark, sf0001).limit(1)
      .select(GraftFunctions.lsh_bucket(spark,
        array_repeat(lit(0.25f), 64), 6).as("b"))
      .as[Int].head()
    assert(interpreted == viaQuery)
  }

  test("lsh_bucket rejects non-float-array inputs at analysis time") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf0001).limit(1).createOrReplaceTempView("doc_lsh")
    val e = intercept[Exception] {
      spark.sql("SELECT lsh_bucket(text) FROM doc_lsh").collect()
    }
    assert(e.getMessage.contains("lsh_bucket"))
  }

  test("nfc_normalize composes decomposed sequences and canonical singletons") {
    val df = Seq(
      (1L, "café"),          // e + combining acute -> é
      (2L, "Ångström"), // ring + diaeresis -> Å, ö
      (3L, "Ω ohm"),          // OHM SIGN -> GREEK CAPITAL OMEGA
      (4L, "plain ascii"),
      (5L, null)).toDF("id", "s")
    val got = df.select($"id",
        graft.functions.GraftFunctions.nfc_normalize(spark, $"s").as("n"))
      .as[(Long, Option[String])].collect().sortBy(_._1)
    assert(got(0)._2.get == "caf\u00e9")
    assert(got(1)._2.get == "\u00c5ngstr\u00f6m")
    assert(got(2)._2.get == "\u03a9 ohm")
    assert(got(3)._2.get == "plain ascii", "ASCII must pass through unchanged")
    assert(got(4)._2.isEmpty, "null in, null out")
    // idempotence: normalizing twice equals normalizing once
    val twice = df.filter($"s".isNotNull).select(
      graft.functions.GraftFunctions.nfc_normalize(spark,
        graft.functions.GraftFunctions.nfc_normalize(spark, $"s")).as("n2"))
      .as[String].collect().sorted
    val once = df.filter($"s".isNotNull).select(
      graft.functions.GraftFunctions.nfc_normalize(spark, $"s").as("n1"))
      .as[String].collect().sorted
    assert(twice.sameElements(once))
    // callable from SQL (extension-injected surface)
    df.filter($"s".isNotNull).createOrReplaceTempView("nfc_in")
    val viaSql = spark.sql("SELECT nfc_normalize(s) FROM nfc_in WHERE id = 1")
      .as[String].head()
    assert(viaSql == "caf\u00e9")
  }

  test("TopKAggregator matches Window+row_number top-3 per customer") {
    val orders = Tables.orders(spark, sf0001)
    val viaAgg = orders
      .select($"o_custkey", $"o_totalprice".as("score"), $"o_orderkey".as("id"))
      .as[(Long, Double, Long)]
      .map { case (ck, s, id) => (ck, ScoredId(s, id)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopKAggregator(3).toColumn)
      .flatMap { case (ck, top) =>
        top.zipWithIndex.map { case (s, i) => (ck, (i + 1).toLong, s.id, s.score) }
      }
      .toDF("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val viaWindow = Relational.top3OrdersPerCustomer(spark, sf0001)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(viaAgg == viaWindow)
  }
}
