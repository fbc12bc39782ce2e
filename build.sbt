ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ppackspark"
scalacOptions += "-deprecation"
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
// Pass the forked JVM's stdout through RAW (no "[info] " logger
// prefix): the driver parses Bench's JSON line from the output tail,
// and sbt's default LoggedOutput decoration makes every line
// non-JSON. (Plausibly why every BENCH_r*.json so far has
// parsed: null even when the line itself fit the tail window.)
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
  // 48g of the VM's 128g: the round-4 bench JVM died mid-run with
  // executor exit 56 (heartbeat failure — a GC death spiral under the
  // old 16g heap with 32 shuffle-heavy threads). Headroom is cheaper
  // than a lost bench round; -Xmx is a cap, not a reservation.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Whole-stage codegen emits one class per stage; a many-query run
  // (Bench/Verify) overflows the 240m default JIT code cache and the
  // JVM silently stops compiling — late queries then run interpreted
  // at 10-30x cost. Size it for the full query suite.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
) ++ sys.env.get("GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" ").toSeq)
