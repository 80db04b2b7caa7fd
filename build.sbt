ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "luceneplusplusspark"
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
// log4j2.properties quiets the Bench/Verify/Demo mains on the run
// classpath, but must NOT ship inside the library jar: log4j2 loads the
// first config on the classpath, so a bundled one would silently override
// every downstream consumer's logging setup.
Compile / packageBin / mappings ~= (_.filterNot(_._2 == "log4j2.properties"))
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
  // Catalyst codegen accumulates compiled classes across SparkSessions in
  // one JVM; the default 240m code cache fills and turns off the JIT
  // (observed as 10-20x slowdowns in later sessions). Benchmarks need room.
  "-XX:ReservedCodeCacheSize=1g",
  // Fixed-size, pre-touched heap: with a growing heap the JVM faults in new
  // pages during G1 young collections, which showed up as multi-second GC
  // pauses (56s of GC in one 240k-doc build). Committing once at startup
  // makes build times stable run-to-run.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
)
