package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Smoke test for `local-cluster` master mode in this sandbox: verifies that
 * the in-process standalone Master/Worker can fork real executor JVMs (the
 * multi-heap proxy ScalingBench needs for the north-rule 8->32 measurement).
 * Run: SPARK_HOME=/opt/spark sbt "runMain graft.tools.ClusterSmoke"
 */
object ClusterSmoke {
  /** JDK17 module opens the forked executor JVMs need (mirrors build.sbt). */
  val executorJavaOptions: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  def main(args: Array[String]): Unit = {
    val cp = System.getProperty("java.class.path")
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .appName("graft-cluster-smoke")
      .config("spark.executor.memory", "1g")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", executorJavaOptions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // a graft lambda must run ON the executors (classpath check) and the
    // result must come back through a real shuffle
    val n = spark.range(0, 1000000, 1, 8).map(_ * 2L)
      .groupByKey(_ % 7).count().collect().sortBy(_._1).toSeq
    val execs = spark.sparkContext.getExecutorMemoryStatus.keys.toSeq.sorted
    println(s"SMOKE groups=$n")
    println(s"SMOKE executors=${execs.size} -> $execs")
    spark.stop()
  }
}
