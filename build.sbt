ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mydatasyncerspark"
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
// The bench/verify harness parses the forked program's stdout (one JSON
// line); sbt's default LoggedOutput would prefix every line with
// "[info] " and break that parse.
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
) ++ {
  // Shuffle files, spills, and broadcast blocks go to tmpfs: the
  // block device in this environment writes at ~4 MB/s (measured with
  // dd conv=fsync), which turns every tiny shuffle write into seconds
  // of idle wait. RAM is 128 GiB, so tmpfs comfortably holds local[32]
  // shuffle data at the benched scale factors. Overridable via
  // SPARK_LOCAL_DIR, and only applied when the target has real
  // capacity — Docker's default /dev/shm is 64 MB, where shuffle
  // spills would fail with no-space errors.
  val localDir = sys.env.getOrElse("SPARK_LOCAL_DIR", "/dev/shm/spark-local")
  val parent = new java.io.File(localDir).getParentFile
  if (parent != null && parent.isDirectory
      && parent.getUsableSpace > 4L * 1024 * 1024 * 1024)
    Seq(s"-Dspark.local.dir=$localDir")
  else Seq.empty
} ++ Seq(
  // NEVER -XX:+UseTransparentHugePages here (round 11; it sat in this
  // block for rounds and was the recurring "degraded VM" in disguise):
  // THP defrag mode on this kernel is [madvise], so a madvise'd heap
  // pays SYNCHRONOUS compaction per 2 MiB fault — measured directly,
  // `java -Xms16g -XX:+AlwaysPreTouch -XX:+UseTransparentHugePages
  // -version` burns 2m13s wall / 47min SYS vs 6.7s without the flag.
  // Under load the stalls land whenever RSS grows (GC region growth,
  // shuffle buffers), so long runs "mysteriously" degraded 10-40x
  // minutes in while short probes read healthy. A fixed-size,
  // PRE-TOUCHED heap keeps the first-touch fault cost (~20-85us per
  // 4 KiB page on this VM) out of measured work instead.
  "-XX:+AlwaysPreTouch",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
