ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "binancedatapipelinespark"
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
// The driver parses the LAST ~2000 chars of `sbt "runMain graft.Bench"`
// stdout for one JSON line. sbt's default LoggedOutput strategy prefixes
// every forked-process line with "[info] " / "[error] ", which made the
// bench line unparseable in rounds 1-7 (BENCH_r*.json "parsed": null).
// StdoutOutput passes the forked process's streams through verbatim.
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
  // The harness is a 128 GiB box (local[32] single-JVM); the old 8g
  // default left the largest intermediates (pr2's wedge exchange, the
  // dedup chains) spill- and GC-bound — the bench ledger's heap_max_mb
  // field exposed it. 32g removes that wall while leaving the OS,
  // parquet off-heap buffers, RocksDB state stores, and the driver's
  // concurrent tooling real native headroom: the r6 48g setting put
  // heap + unbounded RocksDB native within bad_alloc range of the box
  // (BENCH_r06 exit 134).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
