ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "storagetapperspark"
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
// Pass the forked process's stdout straight through instead of logging
// it line-by-line: sbt's "[info] " prefix on Bench's JSON line defeated
// the driver's line parser every round (BENCH_r*.json parsed:null).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JNI-critical sections (snappy-java page decompression) hold the
  // GCLocker while 32 concurrent tasks allocate MB-scale buffers; the
  // JDK default of 2 retry attempts turns that contention into spurious
  // OOMs with most of the heap free (observed: sf100 scans,
  // "Retried waiting for GCLocker too often allocating 1048576 words").
  "-XX:+UnlockDiagnosticVMOptions", "-XX:GCLockerRetryAllocationCount=64",
  // r17 pagerank sf100 probe knobs, promoted to defaults (r17 verdict
  // task 4) so a first-time scale run needs no hand-set shape. Both are
  // SparkConf-level (read at context/shuffle-registration time, not
  // settable via spark.conf.set), hence system properties here:
  // - bypassMergeThreshold 200→300: auto-sized graph widths land at 256
  //   for billion-edge graphs; the Unsafe shuffle writer at that width
  //   thrashed 64 MB pages on an 8 GB heap, while the streaming bypass
  //   writer (what width-32 always used) is flat. ≤300 open files/map
  //   task stays modest.
  // - parquet vectored IO off: VectorIoBridge allocates every
  //   column-chunk range as a heap ByteBuffer up front; 32 concurrent
  //   scan tasks over 168 MB row groups blew the 8 GB heap at sf100.
  //   Local-disk scans lose nothing measurable (the win is for
  //   high-latency object stores).
  "-Dspark.shuffle.sort.bypassMergeThreshold=300",
  "-Dspark.hadoop.parquet.hadoop.vectored.io.enabled=false",
  // r19: let AQE re-plan the output partitioning of cached plans
  // (default false). The r19 duplicated-subtree fixes pin shared
  // intermediates with persist(); without this flag every pinned
  // aggregate materializes at the static session shuffle width (32
  // tasks for a vocabulary-sized table) because cache materialization
  // bypasses AQE coalescing — measured +0.4-0.6 s per small pin at
  // sf0.1. Partitioning of a cache never affects results (all catalog
  // outputs are order-insensitive and hash-gated); at scale the flag
  // sizes cache-build stages from data like every other stage.
  "-Dspark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true",
)
