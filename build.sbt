ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataingestionpocspark"
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
// Pass the forked program's stdout through RAW. sbt's default
// LoggedOutput prefixes every line with "[info] ", so the bench
// contract line `{"metric":...}` never starts with '{' and the
// driver's JSON parse fails (BENCH_r01-r03: "parsed": null even when
// the full line fit in the captured tail).
run / outputStrategy := Some(StdoutOutput)
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
  // Fixed-size heap + ParallelGC (round 4): this guest kernel
  // (deferred_init=lazy + free-page-reporting) makes the FIRST touch
  // of every page cost 50-230us of kernel time behind a global lock,
  // so heap pages must be faulted once and then reused forever. G1 is
  // the worst case for that — it cycles eden through ever-new regions
  // until the whole Xmx has been touched, and uncommits idle regions
  // (which page-reporting hands back to the host, re-billing the next
  // touch). ParallelGC keeps eden/survivor at fixed addresses and
  // Xms=Xmx prevents uncommit, so the page-init bill is paid once,
  // early, and bounded by the heap size. 12g fits the full 125-query
  // suite (measured old-gen peak ~4g) with headroom.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:+UseParallelGC",
  // ~118 queries' worth of whole-stage-codegen classes JIT-compile in
  // one JVM; the 240m default code cache is marginal for that volume,
  // and a full cache silently disables the JIT mid-suite (CPU-dense
  // queries then run interpreted at 10-20x). Headroom is cheap.
  "-XX:ReservedCodeCacheSize=512m",
)
