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
