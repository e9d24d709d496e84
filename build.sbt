ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hybriddatalakehouselabspark"
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
// Forked run output normally goes through sbt's logger, which prefixes
// every line with "[info] " — that would corrupt Bench's one-line JSON
// contract with the driver. Inherit stdout/stderr instead.
run / connectInput := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The driver parses the LAST ~2000 chars of `sbt runMain` output for
// Bench's one-line JSON; sbt's trailing "[success] Total time" banner
// eats into that window, so suppress it.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // Pin the JVM default zone too: java.sql.Timestamp/LocalDateTime
  // conversions outside Spark's session-zone machinery stay UTC-stable
  // regardless of the host's /etc/localtime.
  "-Duser.timezone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A heap OOM on a non-main thread (r12: the dispatcher event loop,
  // during an under-provisioned 100x soak) leaves the scheduler dead
  // and the JVM WEDGED — the bench then hangs forever instead of
  // honoring its "fatal JVM errors abort the run" contract. Exit hard
  // so the harness sees a dead process, not a silent stall.
  "-XX:+ExitOnOutOfMemoryError",
)
