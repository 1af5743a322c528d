package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialization policy for index builds / shared intermediates —
  * the band tables, LSH signature tables, IVF centroid tables, and
  * near-dup pair tables that are BUILT ONCE and served to every
  * downstream consumer.
  *
  * Two backends, selected by `spark.graft.index.dir`:
  *
  *  - DURABLE (conf set, cluster mode): the built table is written
  *    once as parquet under a content-keyed subdirectory and read
  *    back; later builds with the same key — including from a brand
  *    new session or a restarted driver — reuse the files without
  *    recomputing. Parquet on shared storage survives executor loss,
  *    which localCheckpoint blocks do not: this is the path a 100 TB
  *    deployment runs on (the reference likewise persists its shuffle
  *    intermediates on disk — reference worker/worker.py:34-36,
  *    coordinator/coordinator.py:57-89). A directory missing its
  *    `_SUCCESS` marker (crashed writer) is rebuilt, and the
  *    `overwrite` write makes the retry idempotent.
  *  - IN-MEMORY (default, single-JVM): eager `localCheckpoint` — RDD
  *    storage, intentionally OUTSIDE the SQL cache so per-query
  *    `clearCache()` hygiene in Bench/Verify cannot evict an index
  *    build.
  *
  * Keys must identify the build CONTENT (source table path + operator
  * parameters), never session identity — the durable path is shared
  * across sessions by design. DurabilitySpec exercises the full
  * build → new-session → reuse-without-rebuild cycle.
  */
object Materialize {
  val DirConf = "spark.graft.index.dir"

  /** Wall-clock seconds spent building each index this JVM — the
    * amortized-away cost the bench's warm pass would otherwise hide.
    * Bench reports the snapshot as "index_build" so the one-time build
    * price is visible next to the steady-state query times. */
  private val buildSecs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def timedBuild[T](key: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    buildSecs.put(key, (System.nanoTime() - t0) / 1e9)
    r
  }

  def buildTimes: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildSecs.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
  }

  private def fsPath(spark: SparkSession, p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp, hp.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  /** Materialize `df` under `key`, once. The builder argument is
    * by-name: when the durable table already exists it is never
    * evaluated (no plan construction, no upstream jobs). */
  def table(spark: SparkSession, key: String)(df: => DataFrame): DataFrame = {
    val dir = spark.conf.get(DirConf, "")
    if (dir.isEmpty) df.localCheckpoint()
    else {
      val safe = key.replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"$dir/$safe"
      val (_, fs) = fsPath(spark, path)
      val ok = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      if (!fs.exists(ok)) df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
  }

  val ReliableConf = "spark.graft.checkpoint.reliable"

  /** Stage a multi-consumer intermediate with lineage truncation — the
    * iterative-algorithm counterpart of [[table]] (connected-components
    * round edges, the graph-stats edge/orientation tables). Default is
    * localCheckpoint (single-JVM: fast, dies with an executor); with
    * `spark.graft.checkpoint.reliable=true` AND a context checkpoint
    * dir set, it becomes a RELIABLE `checkpoint()` to shared storage —
    * the cluster mode where a lost executor must not kill a 30-round
    * CC fixpoint loop. `eager = false` preserves the CC loop's
    * one-action-per-round contract (the convergence check both
    * materializes the round and decides the fixpoint). */
  def stage(df: DataFrame, eager: Boolean = true): DataFrame = {
    val s = df.sparkSession
    val reliable = s.conf.get(ReliableConf, "false").toBoolean &&
      s.sparkContext.getCheckpointDir.isDefined
    if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
  }

  /** Stable per-session identity for in-JVM memo keys: the session
    * UUID (unique per session, never reused — unlike identityHashCode,
    * which is neither). `sessionUUID` is bytecode-public but
    * Scala-`private[sql]`, so it is read reflectively; any session
    * without it falls back to identity hash. */
  def sessionKey(s: SparkSession): String =
    try s.getClass.getMethod("sessionUUID").invoke(s).toString
    catch { case _: ReflectiveOperationException =>
      s"idhash-${System.identityHashCode(s)}"
    }
}
