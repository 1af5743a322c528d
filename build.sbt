ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "distributedmapreduceindockerrpycspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The graded bench artifact is the TAIL of an `sbt "runMain graft.Bench"`
// invocation: the forked JVM's last stdout line must be the last line of
// the whole sbt process. Two settings make that hold — no "[success]
// Total time ..." footer after the run, and raw pass-through of the
// forked JVM's stdout (no "[info] " logger prefix on the JSON line).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: round 1's driver-side bench (8g) died of heartbeat
  // starvation at sf0.1/local[32] — GC pressure with 32 concurrent tasks'
  // sort/join buffers is the prime suspect; the host has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // The default 240 MB JIT code cache fills up under this workload's many
  // large generated methods (whole-stage codegen + 64-term vector chains);
  // once full, compilation stops and random queries run interpreted with
  // nondeterministic 10-100x stalls. 1 GB removes the cliff entirely.
  "-XX:ReservedCodeCacheSize=1g",
  // 32-core host: more JIT compiler threads drain the C2 queue faster
  // when 40 queries' generated methods all arrive at once
  "-XX:CICompilerCount=12",
)
