ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etl_covid19spark"
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
// forked run output goes straight to the console, NOT through sbt's
// logger: the logger prefixes every line with "[info] ", which breaks any
// harness that tail-parses a JSON line from the bench/verify mains (the
// driver's per-round bench capture recorded "parsed": null every round
// because the summary line arrived as "[info] {...}").
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
// Heap must scale with task-thread count: at local[N] every core holds live
// operator state (hash maps, sort buffers, codegen'd row batches) at once, so
// a fixed 8g that is fine at local[4] collapses into GC thrash at local[32]
// (measured: identical bench 131.6s at 8g vs ~42s at 32g). Default to 1 GiB
// per SPARK_GRAFT_CPUS core with an 8g floor; SPARK_DRIVER_MEM still wins.
val graftHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val cpus = sys.env.get("SPARK_GRAFT_CPUS")
    .flatMap(c => scala.util.Try(c.trim.toInt).toOption).getOrElse(4)
  s"${math.max(8, cpus)}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap",
  // embedded Derby boots once per JVM and caches its log target at first
  // boot — a spec-level System.setProperty is ignored if another Derby
  // suite runs first, so pin it JVM-wide to keep derby.log out of cwd
  s"-Dderby.stream.error.file=${sys.props("java.io.tmpdir")}/graft-derby.log",
)
