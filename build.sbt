ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nelspark"
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
// Forked-run stdout must reach the real stdout UNPREFIXED: the default
// LoggedOutput strategy prepends "[info] " to every line, which broke the
// driver's parse of Bench's single JSON line in round 1 (BENCH_r01.json
// "parsed": null). StdoutOutput passes the child's stdout through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Heap policy (round-2 post-mortem, VERDICT.md): -Xms=<max> plus
// -XX:+AlwaysPreTouch commits the FULL heap at JVM startup. With the
// driver's large SPARK_DRIVER_MEM (~90g) that pre-touch OOM-killed the
// driver's Verify/Bench forks on a busy 125 GiB box — both complete fine
// in <8 GB with a lazily-committed heap. So: pre-touch + eager Xms are
// OPT-IN (NELSPARK_BENCH_JVM=1, set only by scripts/scaling_pair.sh for
// timed scaling legs where page-fault storms would pollute the timings);
// everything else (sbt test, driver-run Verify/Bench) gets a lazy heap.
val benchJvm = sys.env.get("NELSPARK_BENCH_JVM").contains("1")
val heapOpts =
  if (benchJvm) Seq(
    s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
    s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
    "-XX:+AlwaysPreTouch",
  )
  else Seq(s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}")
javaOptions ++= jdk17AddOpens ++ heapOpts ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // batch-throughput GC (cheap regardless of heap-commit policy)
  "-XX:+UseParallelGC",
  "-Xlog:gc:file=/tmp/gc-%p.log",
)
