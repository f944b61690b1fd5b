ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "azuremedicinedataengineeringspark"
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
// Emit the forked process's stdout verbatim (no "[info] " prefix) so the
// driver can parse Bench's single JSON result line.
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
// In local mode the one JVM is driver AND all executor slots; 8g
// GC-thrashed a 327-query bench pass (A/B on the 60 heaviest:
// 84.2s -> 79.3s, 49/60 queries faster — OPTIMIZATION_r12.md), and 32g
// fixed it on the 128 GiB bench box. A hard 32g default OOM-kills
// smaller hosts (ADVICE r12), so the default is derived: a quarter of
// physical memory, clamped to [2g, 32g]; SPARK_DRIVER_MEM still
// overrides exactly.
val defaultHeapGb: Long = {
  val physGb =
    try {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      os.getTotalMemorySize / (1024L * 1024L * 1024L)
    } catch { case _: Throwable => 8L }
  math.max(2L, math.min(32L, physGb / 4))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
)
