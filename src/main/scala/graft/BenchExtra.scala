package graft
import org.apache.spark.sql.SparkSession

/**
 * Round-7 optimization harness (guide §1): per-query plan capture and
 * noop-sink isolated timing. NOT the driver bench — `graft.Bench` stays
 * frozen; this main exists so `.explain("formatted")` dumps and
 * noop-isolated numbers can be produced without touching the measured
 * harness.
 *
 * Usage: runMain graft.BenchExtra <explain|time> <outDir> [query ...]
 *   explain — write <outDir>/<query>.txt with the formatted physical plan
 *   time    — run each query N times (default 3) against the noop sink,
 *             print per-rep seconds as one JSON line per query
 * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS (time mode).
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val outDir = args(1)
    val names: Seq[String] =
      if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    mode match {
      case "explain" =>
        names.foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
          println(s"[explain] $name -> $outDir/$name.txt")
        }
      case "time" =>
        // same warmup chain as the frozen bench so memoized stage artifacts
        // are built outside the timed region
        Seq("q_transcripts", "q_kg_triples", "q_graph_merge", "q_ann_topk",
          "q_minhash_sig", "q_lsh_pairs", "q_ngram_jaccard", "q_ann_lsh",
          "q_dedup_pipeline", "q_simhash_dups", "q_ann_ivf",
          "q_ann_ivf_indexed", "q_embed_dups_lsh").foreach { n =>
          try SparkEntry.queries.get(n).foreach(_(spark, sfDir).count())
          catch { case _: Throwable => () }
        }
        val sb = new StringBuilder
        names.foreach { name =>
          spark.sparkContext.setJobDescription(s"bench-extra: $name")
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          val line = s"""{"query":"$name","noop_secs":[${times.map(t => f"$t%.3f").mkString(",")}]}"""
          println(line)
          sb.append(line).append('\n')
        }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/noop_times.json"), sb.toString)
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
