package graft

import org.apache.spark.sql.SparkSession

/** Multi-process execution support: `GRAFT_MASTER=local-cluster[2,8,4096]`
  * turns any of this repo's mains (Verify, Bench, ClusterCheck) into a
  * REAL multi-executor run — a standalone master + workers in the driver
  * JVM, executors as SEPARATE FORKED JVMs, shuffle and broadcast over
  * the block-transfer service instead of in-process references. This is
  * the execution model the reference ships as its headline (1
  * coordinator + N worker containers — reference
  * `coordinator/coordinator.py:92-101`, `docker-compose.yml`), and the
  * mode every scale claim in this repo is ultimately about: closure
  * serialization, cross-process shuffle, and durable-index reuse are
  * all unobservable under plain `local[N]`.
  *
  * Requirements wired here rather than documented-and-forgotten:
  *  - executor JVMs get the driver's classpath (this repo's classes are
  *    not in SPARK_HOME/jars, and local-cluster executors build their
  *    classpath from SPARK_HOME + `spark.executor.extraClassPath`);
  *  - executor JVMs get the same JDK17 `--add-opens` set the driver
  *    needs (build.sbt injects them for the driver; forked executors
  *    need their own copy);
  *  - `SPARK_HOME` must point at a Spark distribution (the standalone
  *    Worker refuses to fork executors without it) — run.sh exports it,
  *    and we fail fast with an actionable message otherwise.
  */
object Cluster {
  val MasterEnv = "GRAFT_MASTER"

  /** JDK17 --add-opens for forked executor JVMs (the driver gets its
    * copy from build.sbt / run.sh; executors need their own). */
  val execOpts: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  def isCluster(master: String): Boolean = master.startsWith("local-cluster")

  /** Apply `master` (default: GRAFT_MASTER env, else `local[cpus]`) plus
    * the executor-side wiring a multi-process master needs. */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder = {
    val master = sys.env.getOrElse(MasterEnv, s"local[$cpus]")
    val withMaster = b.master(master)
    if (!isCluster(master)) withMaster
    else {
      require(sys.env.contains("SPARK_HOME"),
        s"$MasterEnv=$master needs SPARK_HOME (e.g. /opt/spark) so the " +
          "standalone worker can fork executor JVMs")
      withMaster
        .config("spark.executor.extraClassPath",
          System.getProperty("java.class.path"))
        .config("spark.executor.extraJavaOptions", execOpts)
        // executor loss must surface as retried tasks, not a dead app:
        // the resilience checks kill executors on purpose
        .config("spark.task.maxFailures", "8")
        .config("spark.stage.maxConsecutiveAttempts", "8")
    }
  }
}
