ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "realtimedatawarehousespark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The 100+-query suite generates far more whole-stage-codegen classes
  // than the JVM's default 240 MB code cache holds; when it fills, the
  // JIT shuts off mid-suite and whichever query is running goes
  // interpreted (observed as a random query spiking 20-25x in exactly
  // one of two back-to-back runs). Size the cache for the suite and
  // allow flushing so a full cache degrades gracefully.
  // 512m sufficed at ~130 queries; at 185 the cache flushes mid-suite
  // again (observed round 6: d8 consistently 2-3x slower, but only when
  // the full d-family's generated classes precede it — the flushed
  // methods re-JIT inside the timed query); at 201 the same signature
  // reappeared on g6 (consistent 1.1-1.35x across a triple). Scale
  // with the suite.
  "-XX:ReservedCodeCacheSize=1536m",
  "-XX:+UseCodeCacheFlushing",
)
