ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduceserverdevelopmentspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Style gate (the analog of the reference's tests/test_style.py tier —
// scalafmt artifacts are not in the offline cache, so the compiler's lint +
// unused analysis promoted to errors IS the gate: `sbt compile` fails on a
// style regression the way the reference's pylint gate fails its suite).
ThisBuild / scalacOptions ++= Seq(
  "-Xlint",
  "-Wunused:imports,privates,locals",
  "-deprecation",
  "-feature",
  "-Werror"
)
Test / fork := true
// suites share (and sometimes restart) one SparkSession — keep them serial
Test / parallelExecution := false
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
  // 32 local executor threads share this heap; 8g causes GC-bound
  // run-to-run variance on the 128 GiB bench machine
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // ad-hoc knobs for oversized one-off runs (the 100x spot gates pass
  // longer heartbeat/network timeouts so a long GC pause on a stuffed
  // heap degrades to a slow run instead of killing the in-process
  // executor); space-separated -D/-X flags
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
