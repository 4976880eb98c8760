ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "neynar_parquet_importerspark"
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
// Forked stdout passes through un-decorated: Bench's one-line JSON result
// must reach the harness without sbt's "[info] " prefix.
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
// Fixed-size heap: with -Xms << -Xmx, G1 keeps the committed heap small, so
// every humongous-allocation concurrent cycle decides free memory is scarce
// and clears SoftReferences — including Jackson's thread-local buffer
// recycler, degrading per-row JSON parsing by ~70× (measured). Pinning the
// heap (plus bigger regions so fewer allocations count as humongous) keeps
// the soft-ref threshold high and the pauses out of the benchmark.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:G1HeapRegionSize=32m",
  "-XX:SoftRefLRUPolicyMSPerMB=2500",
  // a multi-pass 29-query suite JIT-compiles thousands of Janino classes;
  // the default 240m code cache then sweeps/flushes hot methods and whole
  // queries fall back to interpreted execution late in the run
  "-XX:ReservedCodeCacheSize=1g",
  // Shuffle/spill files live on tmpfs: the container's disk throttles in
  // multi-second bursts (observed: single task blocked in file read for 30s
  // on megabytes of shuffle data), which randomly poisons shuffle-heavy
  // queries. On a real cluster this is local NVMe; RAM stands in here.
  "-Dspark.local.dir=/dev/shm/spark-local",
) ++ sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc:file=$f").toSeq
