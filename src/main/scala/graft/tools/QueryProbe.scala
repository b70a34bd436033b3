package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Per-job/stage timing probe for one named SparkEntry query:
 *   runMain graft.tools.QueryProbe <query> [sfDir] [cpus] [explain]
 * Prints each Spark job's wall time and each stage's task-time split, then
 * the formatted physical plan on request — the feedback loop for "is this
 * the plan I'd want at 100 TB".
 */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val doExplain = args.length > 3 && args(3) == "explain"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart(js.jobId) = System.nanoTime()
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.get(je.jobId).foreach { t0 =>
          println(f"[job] id=${je.jobId} wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
          f"run=${m.executorRunTime / 1000.0}%.1f s cpu=${m.executorCpuTime / 1e9}%.1f s " +
          f"gc=${m.jvmGCTime / 1000.0}%.1f s " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.1f MB  ${si.name}")
      }
    })

    val fn = SparkEntry.queries(name)
    // cold + warm, like Bench's warmup-then-measure
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name pass$pass: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    if (doExplain) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
