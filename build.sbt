ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkparameterserverspark"
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
// The driver captures `sbt "runMain graft.Bench"` stdout and json-parses
// the tail. sbt's default LoggedOutput prefixes every forked-process
// line with "[info] ", which breaks json.loads on the per-query and
// total lines; StdoutOutput passes the child's stdout through verbatim.
run / outputStrategy := Some(StdoutOutput)
// ...and keep sbt's own "[success] Total time: ..." line from landing
// after (and masking) the JSON total line in a tail capture.
Global / showSuccess := false
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
// SPARK_DRIVER_MEM parsed to bytes with Bench.parseMemBytes's grammar
// (suffix k/m/g/t or a plain byte count; malformed → the 8g default).
val driverMemBytes: Long = {
  val raw = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  val default = 8L << 30
  try {
    if (raw.isEmpty) default
    else raw.last match {
      case 'k' => raw.init.trim.toLong << 10
      case 'm' => raw.init.trim.toLong << 20
      case 'g' => raw.init.trim.toLong << 30
      case 't' => raw.init.trim.toLong << 40
      case _   => raw.toLong
    }
  } catch { case _: Throwable => default }
}
val youngCapBytes: Long = math.min(driverMemBytes / 3, (8L << 30) / 3)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Pre-size the heap and use the throughput collector: at the 8g
  // default the G1 + growing-heap JVM pays a measured +24% wall /
  // +23% process CPU across the whole bench suite versus a 100g heap
  // (GC pressure, not weather — certified-quiet A/B sweeps, flat
  // calibration probes). -Xms=-Xmx removes the heap-growth stalls
  // (109.5 s -> 97.6 s) and ParallelGC removes G1's concurrent
  // marking/refinement overhead, which a 32-thread batch workload
  // with no pause-time requirement never needed (97.6 s -> 89.7 s =
  // the 100g figure, cpu_total 522 vs 521). Full ladder in
  // docs/TODO_r10.md §13.
  // Portability note (r10 ADVICE): pre-committing -Xms for EVERY
  // forked JVM (tests included) assumes the host can commit
  // SPARK_DRIVER_MEM (default 8g) up front — true of the 128-GiB
  // driver/bench hosts this build targets. On a smaller box or under
  // strict overcommit (vm.overcommit_memory=2), export a smaller
  // SPARK_DRIVER_MEM rather than dropping the pin: -Xms != -Xmx is
  // the measured +12%-wall regression the pin exists to prevent.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+UseParallelGC",
  // Pin the young generation to the PROVEN 8g-regime geometry
  // (young = min(heap/3, 8g/3)) for every forked JVM, mirroring
  // Bench.youngCapBytes. Without the pin, a large exported
  // SPARK_DRIVER_MEM (the driver host exports ~88g) gives ParallelGC
  // a ~22g default eden whose minor GCs burst for seconds (r11
  // verdict, measured) — Bench re-execs itself to fix that at
  // runtime, but the TEST JVM ran uncapped and BenchRegimeSpec's
  // geometry asserts failed on the driver host (VERIFY_r13
  // tests_ok=false). With the pin, tests and the graded runMain path
  // are regime-clean at any SPARK_DRIVER_MEM, no re-exec needed. At
  // the 8g default this is exactly ParallelGC's own NewRatio=2
  // young size — a no-op.
  s"-XX:MaxNewSize=${youngCapBytes}",
)
