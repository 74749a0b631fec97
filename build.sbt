ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graderetlspark"
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
)

// Default `sbt test` excludes @org.scalatest.tags.Slow suites — the
// scale/cluster/bench-grade and durability-soak audits (ScaleSpec,
// LocalClusterSpec, BenchSplitSpec, CodegenHealthSpec,
// EndToEndPipelineSpec, CompactionPolicySpec, CatalogConcurrencySpec,
// DurableRootSpec, SemanticPropertySpec) — so the per-change correctness
// suite finishes inside the driver's test budget (r19: full suite 31 min
// on an idle host, default subset ~15 min; the excluded suites stayed
// green when run this round). Run EVERYTHING with
//   sbt -Dgraft.slow.tests=true test
// or just the slow set with
//   sbt -Dgraft.slow.tests=true "testOnly graft.ScaleSpec ..." etc.
Test / testOptions ++= (
  if (sys.props.get("graft.slow.tests").contains("true")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "org.scalatest.tags.Slow")))
