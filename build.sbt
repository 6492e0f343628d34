ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pdf_parse_vector_dbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkContext (getOrCreate in the forked JVM):
// concurrent suites make block-manager-count assertions (checkpoint
// leak gates) racy. Serial execution keeps those gates exact.
Test / parallelExecution := false
run / fork := true
// The bench/verify drivers parse the forked program's FINAL stdout
// line as JSON. sbt's default LoggedOutput wraps every line in
// "[info] " and appends a "[success] Total time" trailer — both have
// made the bench line unparseable every round. Route forked output
// raw and drop the success banner.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not a task — the
// unused-key lint can't see that
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
  // local[32] keeps 32 task threads' shuffle/agg state live at once;
  // 8g forced multi-second GC pauses with run-to-run bench variance of
  // ±2x on the heavier queries. The harness box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-Xms4g",
)
