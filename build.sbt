ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ftpblueprintsspark"
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
// The grader parses the LAST line of the bench command's stdout as
// JSON. Two pieces of sbt decoration have defeated that three rounds
// running: the logger's "[info] " prefix on forwarded child output,
// and the trailing "[success] Total time" footer printed AFTER the
// JSON. Forward forked-run output straight to stdout (no logger
// decoration) and drop the success footer.
run / outputStrategy := Some(StdoutOutput)
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
// local[N] pushes N concurrent task threads through shuffle +
// localCheckpoint block storage — an undersized heap turns the bench
// into a GC lottery (observed 3.8s → 24.5s swings on q35 at 8g).
// Size the default from the machine (40% of physical RAM, clamped to
// [8g, 48g]) instead of pinning this box's 48g; SPARK_DRIVER_MEM
// still overrides explicitly.
val defaultHeapGb: Long = {
  val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]
  val physGb = bean.getTotalMemorySize / (1L << 30)
  // floor at 8g but never above physical-minus-margin: a hard 8g
  // floor with pinned Xms would commit the whole RAM of an 8 GB box
  val floor = math.max(2L, math.min(8L, physGb - 2))
  math.min(48L, math.max(floor, (physGb * 2) / 5))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
  // pin the committed heap — G1 heap-resize cycles showed up as
  // multi-second jitter on the allocation-heavy text pipelines
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
  // 107 queries × warmup + timed runs push thousands of Janino classes
  // through the JIT; when code-cache flushing evicts hot compiled
  // methods the evicted query replays in the interpreter until
  // re-JIT'd — observed as nondeterministic 12× CPU "storms" (q31:
  // 80 s stage CPU vs 6.5 s steady, zero GC). 1g absorbed it at 100
  // queries; at 107 (the q100–q107 composed-pipeline block sorts
  // right before q11–q13) trivial queries regressed 6–25× at
  // byte-identical shuffle — the same signature, so double it.
  // NOTE: 2g is the HotSpot MAXIMUM for this flag (a 3g attempt fails
  // JVM startup) — storms past this ceiling can only be addressed by
  // shrinking codegen class volume, not more cache.
  "-XX:ReservedCodeCacheSize=2g",
) ++
  // ad-hoc JVM flags for JIT/GC probes (e.g. -XX:-TieredCompilation,
  // -XX:+PrintCompilation) without editing the build
  sys.env.get("SPARK_GRAFT_JVM_FLAGS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
