ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tlmcetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one SparkContext and a few (synchronized, narrow)
// mutations of JVM-global session slots — keep the forked runner
// sequential explicitly rather than by sbt default
Test / testForkedParallel := false
run / fork := true
// Forked run output goes STRAIGHT to stdout, not through sbt's logger:
// the logger prefixes every line with "[info] ", which is exactly what
// made the driver's JSON parse of Bench's compact line fail all 13
// rounds (BENCH_r13.json tail: the complete compact object sits in the
// captured window but behind "[info] ", so json.loads rejects the line
// and `parsed` stays null). StdoutOutput emits the child's lines raw.
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
  "-Dfile.encoding=UTF-8",
  "-Dderby.stream.error.file=/tmp/derby.log", // keep the repo clean

  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
// CJK file paths are load-bearing (SURVEY §7 hard-list e). The
// container locale is POSIX, which makes sun.jnu.encoding ANSI and
// breaks java.nio on non-ASCII paths; -D flags cannot override it,
// only the process locale can.
run / envVars += "LANG" -> "C.UTF-8"
Test / envVars += "LANG" -> "C.UTF-8"
