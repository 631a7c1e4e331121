ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdata_hitsspark"
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
// Pass the forked main's stdout/stderr through UNDECORATED instead of
// routing them via sbt's logger: the logger prefixes every line with
// `[info] `/`[error] `, which is exactly what kept the driver-side
// bench parser from reading Bench's machine-readable JSON line four
// rounds running (BENCH_r11-r14 all shipped "parsed": null with the
// complete line sitting in the tail behind an `[info] ` prefix).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop sbt's `[success] Total time: …` epilogue, so the bench's
// machine-readable line is the LAST stdout line of `sbt runMain
// graft.Bench`, not the second-to-last.
showSuccess := false
// showSuccess is consumed by sbt's command engine, not by other
// settings — exempt it from the unused-key lint so the warning itself
// doesn't pollute the captured stdout it exists to clean.
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
  // local[32] runs everything (driver + 32 task threads + persisted
  // graph caches) in one JVM. 16g fits the sf0.1 working set with
  // headroom; bigger heaps actively hurt: G1 on a 48g heap degraded
  // the iterative kernels 5-20x over a long run (multi-MB cached /
  // localCheckpoint blocks become humongous regions; the concurrent
  // cycles stall allocation while dead blocks pile up).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Throughput collector: this is a batch workload with no latency
  // SLO. Parallel full GCs compact the block churn in ~1s, and the
  // ContextCleaner's periodic System.gc() (Bench/Verify set
  // spark.cleaner.periodicGC.interval) reclaims dead shuffle and
  // checkpoint blocks promptly. Measured on the kernel sequence
  // hits_base/hits_topic/salsa_iterative: 10-13s per kernel, no
  // degradation, vs 65-277s under the 48g G1 setup.
  "-XX:+UseParallelGC",
)
// Ad-hoc profiling/tuning knob: extra -D/-XX flags for the forked
// mains without editing the build (e.g. event-log capture).
javaOptions ++= sys.env.get("SPARK_EXTRA_JAVA_OPTS")
  .toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty).toSeq)
