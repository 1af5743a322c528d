package graft

import graft.operators.{Dedup, Materialize, Search, SharedIntermediates, SimJoin, Similarity}
import org.apache.spark.sql.functions.col

/** The durable (cluster-survivable) index path: with
  * `spark.graft.index.dir` set, index builds write content-keyed
  * parquet once and every later consumer — including a brand-new
  * session, modeling a restarted driver — reads the files back without
  * re-running ANY of the build pipeline. */
class DurabilitySpec extends SparkSpec {

  private def withIndexDir[T](f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-index").toString
    spark.conf.set(Materialize.DirConf, dir)
    try f(dir)
    finally {
      spark.conf.unset(Materialize.DirConf)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("Materialize.table builds once and never re-evaluates the builder") {
    withIndexDir { dir =>
      val built = Materialize.table(spark, "spec:roundtrip") {
        spark.range(100).select(col("id"), (col("id") * 2).as("v"))
      }
      assert(built.count() == 100)
      assert(new java.io.File(s"$dir/spec_roundtrip/_SUCCESS").exists(),
        "durable build must leave a committed parquet table")
      // same key, poisoned builder: must serve the files, not rebuild
      val reused = Materialize.table(spark, "spec:roundtrip") {
        throw new AssertionError("builder re-evaluated despite durable table")
      }
      assert(reused.count() == 100)
      assert(reused.select(org.apache.spark.sql.functions.sum(col("v")))
        .first().getLong(0) == 9900)
    }
  }

  test("a new session reuses the durable band index without rebuilding") {
    withIndexDir { dir =>
      // builder session is FRESH too: the suite's shared session may
      // already hold a memoized in-memory build from another spec,
      // which would bypass the durable write entirely
      val s1 = spark.newSession()
      s1.conf.set(Materialize.DirConf, dir)
      val baseline = SharedIntermediates.textPairs(s1, sf0001)
        .collect().map(_.toString).sorted
      assert(new java.io.File(s"$dir/textBands_${sf0001.replaceAll("[^A-Za-z0-9._-]", "_")}/_SUCCESS").exists()
        || new java.io.File(dir).listFiles().exists(_.getName.startsWith("textBands")),
        "band index not written durably")
      // fresh session = restarted driver: in-memory memo and checkpoint
      // blocks are gone; only the parquet index survives
      val s2 = spark.newSession()
      s2.conf.set(Materialize.DirConf, dir)
      val bands2 = SharedIntermediates.textBands(s2, sf0001)
      // reuse proof is STRUCTURAL: the served table must be a bare scan
      // of the index files — no aggregate, no anti-join, no gram explode
      // anywhere in its plan (a rebuild would carry all three)
      val plan = bands2.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Aggregate") && !plan.contains("Generate") &&
        !plan.contains("Join"),
        s"expected a pure index-file scan, got a rebuild:\n$plan")
      // and the results served from disk are identical
      val pairs2 = Dedup.nearDupPairsFromBands(Tables.documents(s2, sf0001),
        bands2, Dedup.wordGrams, 0.7).collect().map(_.toString).sorted
      assert(pairs2.sameElements(baseline),
        "durable-index pairs differ from the in-session build")
    }
  }

  test("connected components checkpoint reliably in cluster mode") {
    // spark.graft.checkpoint.reliable + a context checkpoint dir =
    // cluster mode: each CC round's edge set goes to RELIABLE storage
    // (survives executor loss) instead of localCheckpoint blocks.
    // Results must be identical and the checkpoint dir actually used.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Materialize.ReliableConf, "true")
    val s = spark; import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 20L)).toDF("doc_a", "doc_b")
    try {
      val reliable = Dedup.nearDupClusters(pairs).collect().map(_.toString).sorted
      def rdds(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(rdds).sum
        else if (f.getName.startsWith("part-")) 1 else 0
      assert(rdds(new java.io.File(dir)) > 0,
        "reliable mode did not write to the checkpoint dir")
      spark.conf.set(Materialize.ReliableConf, "false")
      val default = Dedup.nearDupClusters(pairs).collect().map(_.toString).sorted
      assert(reliable.sameElements(default),
        "cluster-mode checkpointing changed CC results")
    } finally {
      spark.conf.unset(Materialize.ReliableConf)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("similarity-join gram index and postings index survive a new session") {
    withIndexDir { dir =>
      val s1 = spark.newSession()
      s1.conf.set(Materialize.DirConf, dir)
      val basePairs = SimJoin.jaccardJoinFromIndex(
        SharedIntermediates.wordGramIndex(s1, sf0001), 7, 10)
        .collect().map(_.toString).sorted
      val basePhrase = Search.phraseSearch(SharedIntermediates.postings(s1, sf0001))
        .collect().map(_.toString).sorted
      // restarted driver: only the parquet indexes survive
      val s2 = spark.newSession()
      s2.conf.set(Materialize.DirConf, dir)
      val idx2 = SharedIntermediates.wordGramIndex(s2, sf0001)
      val idxPlan = idx2.queryExecution.optimizedPlan.toString
      assert(!idxPlan.contains("Aggregate") && !idxPlan.contains("Generate") &&
        !idxPlan.contains("Join") && !idxPlan.contains("Window"),
        s"expected a pure gram-index scan, got a rebuild:\n$idxPlan")
      val post2 = SharedIntermediates.postings(s2, sf0001)
      val postPlan = post2.queryExecution.optimizedPlan.toString
      assert(!postPlan.contains("Generate") && !postPlan.contains("Aggregate"),
        s"expected a pure postings scan, got a rebuild:\n$postPlan")
      val pairs2 = SimJoin.jaccardJoinFromIndex(idx2, 7, 10)
        .collect().map(_.toString).sorted
      assert(pairs2.sameElements(basePairs),
        "exact-join pairs differ when served from the durable gram index")
      val phrase2 = Search.phraseSearch(post2).collect().map(_.toString).sorted
      assert(phrase2.sameElements(basePhrase),
        "phrase search differs when served from the durable postings index")
      val names = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(names.exists(_.startsWith("wordGramIndex")), s"no gram index in $names")
      assert(names.exists(_.startsWith("postings")), s"no postings index in $names")
    }
  }

  test("embedding bucket index and IVF centroids survive a new session") {
    withIndexDir { dir =>
      val s1 = spark.newSession()
      s1.conf.set(Materialize.DirConf, dir)
      val emb = Tables.embeddings(s1, sf0001)
      val n = Tables.rowCount(s1, sf0001, "embeddings")
      val baselinePairs = SharedIntermediates.embPairs(s1, sf0001)
        .collect().map(_.toString).sorted
      val baselineAnn = Similarity.ivfTopK(emb, 8, 4, 5, Some(n))
        .collect().map(_.toString).sorted
      val s2 = spark.newSession()
      s2.conf.set(Materialize.DirConf, dir)
      val pairs2 = SharedIntermediates.embPairs(s2, sf0001)
        .collect().map(_.toString).sorted
      assert(pairs2.sameElements(baselinePairs),
        "embedding near-dup pairs differ when served from the durable index")
      val ann2 = Similarity.ivfTopK(Tables.embeddings(s2, sf0001), 8, 4, 5, Some(n))
        .collect().map(_.toString).sorted
      assert(ann2.sameElements(baselineAnn),
        "IVF top-k differs when centroids are served from the durable index")
      // the index dir now holds the durable structures
      val names = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(names.exists(_.startsWith("embBuckets")), s"no bucket index in $names")
      assert(names.exists(_.startsWith("ivfCentroids")), s"no centroid table in $names")
    }
  }

  test("trained BPE artifacts survive a new session without retraining") {
    withIndexDir { dir =>
      val s1 = spark.newSession()
      s1.conf.set(Materialize.DirConf, dir)
      val baseMerges = operators.Tokenizer.bpeVocabQuery(s1, sf0001)
        .collect().map(_.toString)
      val baseStats = operators.Tokenizer.bpeEncodeStats(s1, sf0001)
        .collect().map(_.toString).sorted
      // restarted driver: the in-JVM trained-state memo is keyed by
      // session, so s2 must resolve purely from the parquet artifacts
      val s2 = spark.newSession()
      s2.conf.set(Materialize.DirConf, dir)
      val merges2Df = operators.Tokenizer.trained(s2, sf0001).merges
      val mergesPlan = merges2Df.queryExecution.optimizedPlan.toString
      assert(!mergesPlan.contains("Aggregate") && !mergesPlan.contains("Union") &&
        !mergesPlan.contains("Generate"),
        s"expected a bare merge-table scan, got a retrain:\n$mergesPlan")
      val vocabPlan = operators.Tokenizer.trained(s2, sf0001).vocab
        .queryExecution.optimizedPlan.toString
      assert(!vocabPlan.contains("Aggregate") && !vocabPlan.contains("Join"),
        s"expected a bare vocab scan, got a retrain:\n$vocabPlan")
      assert(operators.Tokenizer.bpeVocabQuery(s2, sf0001)
        .collect().map(_.toString).sameElements(baseMerges),
        "merge list differs when served from the durable artifact")
      assert(operators.Tokenizer.bpeEncodeStats(s2, sf0001)
        .collect().map(_.toString).sorted.sameElements(baseStats),
        "encode stats differ when served from the durable vocabulary")
      val names = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(names.exists(_.startsWith("bpeMerges")), s"no merge table in $names")
      assert(names.exists(_.startsWith("bpeVocab")), s"no vocab table in $names")
    }
  }
}
