ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "iatlascbioportalexportspark"
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
// Pass the forked JVM's stdout through RAW instead of via sbt's logger:
// the logger prefixes every line with "[info] ", which breaks any caller
// that greps/parses Bench's single JSON output line.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Bench protocol pinning, Compile/run scope only (Bench/Verify go
// through the default `runMain`): a FIXED heap (-Xms == -Xmx, no
// adaptive resizing mid-run), an explicitly chosen GC with a fixed G1
// region size, and pre-touched pages. Session-to-session bench spread
// was 10-15% with the JVM free to grow the heap and pick
// ergonomics-driven settings per machine state; pinning removes those
// variables from every timed fork (BENCH_NOTES "Bench protocol"
// records the measured effect). Scoped to Compile/run deliberately:
// a bare `run / javaOptions` is also what `Test/runMain` delegates to,
// and test-scope forks (including the scratch mains) should keep the
// lazy heap so they start fast and run on small machines.
Compile / run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+UseG1GC",
  "-XX:G1HeapRegionSize=16m",
  "-XX:+AlwaysPreTouch",
)
// Test extends Compile in sbt's configuration delegation, so without
// this explicit override Test/runMain would inherit the pinned flags
// anyway — pin Test/run back to the plain (lazy-heap) options.
Test / run / javaOptions := (Test / javaOptions).value
