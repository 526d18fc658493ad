ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datawarehouseflinkspark"
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
// Forked run output goes straight to stdout/stderr (no "[info] " log
// prefix) so the driver can parse Bench's one-line JSON from stdout.
run / outputStrategy := Some(StdoutOutput)
// Suppress the trailing "[success] Total time: ..." line after runMain:
// it lands on stdout AFTER Bench's JSON line and broke the driver's
// parse two rounds running (BENCH_r01/r02 "parsed": null).
Global / showSuccess := false
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
  // local[32] shares one heap across all executor threads: 8g causes
  // GC thrash + agg spills on the wide dedup/vector queries. The
  // container has 128 GiB; default high, env-overridable.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
) ++ (
  // Measurement JVMs (decade/century sweeps) set SPARK_GRAFT_PRETOUCH=1:
  // -Xms=-Xmx + AlwaysPreTouch faults the whole heap in at STARTUP,
  // outside any timed query. Without it the first multi-GB allocation
  // ramp lands in task CPU as kernel fault time on this overcommitted
  // host — the r12 century sweep measured minhash_index_build@sf100 at
  // 12,120 executor-CPU s first-pass vs 692 s on an in-JVM retry, a
  // 17x one-time heap-growth artifact, not compute. Off by default:
  // pre-touching 48-96 GiB adds ~30-60 s to every forked run.
  if (sys.env.get("SPARK_GRAFT_PRETOUCH").contains("1"))
    Seq(s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
      "-XX:+AlwaysPreTouch")
  else Seq.empty
) ++ Seq(
  // Whole-stage codegen emits one Janino class per stage; a 45-query
  // run overflows the default ~240m code cache, after which the JIT
  // stops compiling and hot loops run interpreted (shows up as 3-10x
  // run-to-run swings on the late queries).
  "-XX:ReservedCodeCacheSize=1g",
)
