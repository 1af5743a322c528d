package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Decontamination flagship at ~1 GB: exact [[TextAnalysis.contamination]]
  * vs the Bloom-prefiltered [[TextAnalysis.contaminationBloom]] on the
  * [[SubstrFlagship]] corpus (500k docs, ~196M word-8-gram occurrences),
  * eval slice = the first 1% of docs. The sf0.01 oracle proves the two
  * operators return identical rows; this measures WHY the Bloom shape
  * exists — the shuffle the exact operator pays to find the ~1% of
  * corpus grams that hit the eval set, and the equality of the two
  * outputs re-verified at 500k docs (not just sf0.01).
  *
  * Results recorded in SUBSTR_1GB.md (shared corpus section). Usage:
  *   scripts/run.sh graft.BloomFlagship [nDocs] [workDir]
  * (generates the corpus if the SubstrFlagship run has not already)
  */
object BloomFlagship {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(500000L)
    val work = if (args.length > 1) args(1) else "/tmp/graft_substr1g"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bloom-flagship")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpusDir = s"$work/corpus"
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$corpusDir/_SUCCESS")),
      s"run graft.SubstrFlagship first to generate $corpusDir")
    val docs = spark.read.parquet(corpusDir)
    val bytes = docs.agg(sum("n_chars")).head().getLong(0)
    // 1% eval slice, +10 so the threshold SPLITS one planted passage
    // pair (pairs are (20m, 20m+10): a cut at ≡10 mod 20 straddles
    // exactly one) — the true-positive path executes at scale, not just
    // in the sf0.01 oracle where hits are plentiful
    val evalMax = nDocs / 100 + 10

    val sc = spark.sparkContext
    val shuf = new java.util.concurrent.atomic.AtomicLong()
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          shuf.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
          cpu.addAndGet(te.taskMetrics.executorCpuTime)
        }
    })
    def drainListeners(): Unit = try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      try bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      catch { case _: NoSuchMethodException =>
        bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
          .invoke(bus, java.lang.Long.valueOf(10000L))
      }
    } catch { case _: Throwable => Thread.sleep(100) }

    def run(label: String)(mk: => org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      drainListeners()
      val shuf0 = shuf.get(); val cpu0 = cpu.get()
      val t0 = System.nanoTime()
      val out = mk.localCheckpoint()
      val n = out.count()
      val flagged = out.filter(col("contaminated")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      drainListeners()
      println(f"""{"metric":"decontam_1gb_$label","docs":$nDocs,"bytes":$bytes,"eval_docs":$evalMax,"rows":$n,"flagged":$flagged,"sec":${f"$dt%.1f"},"shuffle_gb":${(shuf.get() - shuf0) / 1e9}%.2f,"cpu_sec":${f"${(cpu.get() - cpu0) / 1e9}%.1f"},"cpus":$cpus}""")
      out
    }

    val exact = run("exact")(TextAnalysis.contamination(docs, evalMaxId = evalMax))
    val bloom = run("bloom")(TextAnalysis.contaminationBloom(spark, docs, evalMaxId = evalMax))
    // row-level equality at scale, both directions
    val diff = exact.exceptAll(bloom).count() + bloom.exceptAll(exact).count()
    println(s"""{"metric":"decontam_1gb_equal","diff_rows":$diff}""")
    require(diff == 0, s"bloom path diverged from exact: $diff rows")
    spark.stop()
  }
}
