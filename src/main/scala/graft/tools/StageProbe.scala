package graft.tools

import graft.model._
import graft.pipeline._
import graft.ScalingBench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage timing probe for the scaling investigation: StageProbe <cpus> [repl]. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 8
    val repl = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val turns = ScalingBench.amplifiedTurns(spark, "/root/testdata/sf0.1", repl)
      .repartition(cpus * 2, col("conv_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    time("materialize turns")(turns.count())
    val m = Extraction.mentions(spark, turns.as[Turn])
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    time("mentions")(m.count())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
          f"runtime=${si.taskMetrics.executorRunTime / 1000.0}%.1f s " +
          f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%.1f s " +
          f"gc=${si.taskMetrics.jvmGCTime / 1000.0}%.1f s " +
          f"deser=${si.taskMetrics.executorDeserializeTime / 1000.0}%.1f s " +
          f"shufFetchWait=${si.taskMetrics.shuffleReadMetrics.fetchWaitTime / 1000.0}%.1f s " +
          f"shufW=${si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6}%.0f MB")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val edges = time("edges")(Extraction.linkEdgesFused(spark, turns.as[Turn]).localCheckpoint())
    time("edges count")(edges.count())
    val canonical = time("cc")(
      Canonicalize.connectedComponents(spark, edges,
        m.toDF().select(col("entity_id")).distinct()).localCheckpoint())
    val triples = Extraction.triples(m, canonical, turns.toDF())
    time("triples write")(triples.write.mode("overwrite")
      .parquet(s"/tmp/graft-probe-$cpus"))
    spark.stop()
  }
}
