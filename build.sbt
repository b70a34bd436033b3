ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rdfxspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // G1 treats Tungsten's default 64MB task pages as humongous allocations;
  // with 32 concurrent tasks that degenerates into a GC death spiral
  // (observed: 231s GC / 339s cpu / 2700s blocked in one join stage).
  // ParallelGC + a bounded Tungsten page size keeps allocation regular.
  // SPARK_JVM_GC overrides for experiments (e.g. "UseG1GC" — viable again
  // now that spark.buffer.pageSize=4m removed the humongous allocations).
  s"-XX:+${sys.env.getOrElse("SPARK_JVM_GC", "UseParallelGC")}",
  "-Dspark.buffer.pageSize=4m",
) ++ sys.env.get("SPARK_JVM_XMN").map(n =>
  // optional young-gen override for GC experiments (ScalingBench): the
  // fused extraction is an allocation-streaming workload — almost nothing
  // survives a minor collection — so a larger eden trades pause frequency
  // directly against promotion pressure
  s"-Xmn$n").toSeq ++ sys.env.get("SPARK_JVM_CPUS").map(n =>
  // Two-cluster-size proxy fairness (ScalingBench): local[N] only limits
  // TASK slots — GC/JIT/netty pools still size from the host's 32 cores,
  // so the small "cluster" silently borrows the whole box. This makes the
  // entire JVM believe it has N cores, like a real N-core executor.
  s"-XX:ActiveProcessorCount=$n").toSeq
