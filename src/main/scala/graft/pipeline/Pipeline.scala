package graft.pipeline

import graft.catalog.ParquetSnapshotCatalog
import graft.model._
import graft.rdf.{DistributedRdf, RdfFormat}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * End-to-end KG-construction pipeline (BASELINE.json north_star T1-T7):
 *
 *   transcripts → mentions (T1+T2) → link edges → canonical entities (T4)
 *   → triples (T3) → materialized graph tables (T5) → serializations (T6)
 *   → metrics (T7)
 *
 * Exactly-once resume (SURVEY §4/§7): every stage commits its output to
 * `<workDir>/<stage>/vN` parquet + an atomically-renamed `_COMMIT.json`
 * manifest. A rerun skips any stage whose manifest exists (validated by row
 * count), so a job killed after stage N restarts at stage N+1 and produces
 * byte-identical output. On an Iceberg-equipped cluster the same structure
 * maps to table snapshots — the commit protocol, not the file layout, is
 * the contract.
 *
 * Per-stage lineage + throughput metrics land in `<workDir>/metrics` as a
 * table (stage, rows, partitions, seconds, rows_per_sec, input_stages).
 */
object Pipeline {

  final case class StageMetric(
      stage: String, rows: Long, partitions: Int, seconds: Double,
      rows_per_sec: Double, input_stages: String)

  final class Runner(spark: SparkSession, workDir: String) {
    private val metrics = scala.collection.mutable.ArrayBuffer.empty[StageMetric]

    private def stageDir(name: String) = Paths.get(workDir, name)
    private def manifest(name: String) = stageDir(name).resolve("_COMMIT.json")

    def isDone(name: String): Boolean = Files.exists(manifest(name))

    /** Run (or resume) a stage: compute, commit, return the committed data. */
    def stage(name: String, inputs: Seq[String])(compute: => DataFrame): DataFrame = {
      val dataPath = stageDir(name).resolve("data").toString
      if (isDone(name)) {
        val df = spark.read.parquet(dataPath)
        metrics += StageMetric(name, -1L, df.rdd.getNumPartitions, 0.0, 0.0,
          inputs.mkString(",") + " [resumed]")
        return df
      }
      val t0 = System.nanoTime()
      val df = compute
      df.write.mode("overwrite").parquet(dataPath)
      val out = spark.read.parquet(dataPath)
      val rows = out.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val m = s"""{"stage": "$name", "rows": $rows, "seconds": $secs}"""
      val tmp = stageDir(name).resolve("._COMMIT.tmp")
      Files.write(tmp, m.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, manifest(name), StandardCopyOption.ATOMIC_MOVE)
      metrics += StageMetric(name, rows, out.rdd.getNumPartitions, secs,
        if (secs > 0) rows / secs else 0.0, inputs.mkString(","))
      out
    }

    def writeMetrics(): Unit = {
      import spark.implicits._
      metrics.toSeq.toDF().write.mode("append").parquet(s"$workDir/metrics")
    }

    def collectedMetrics: Seq[StageMetric] = metrics.toSeq
  }

  /**
   * Full run. Returns the triple DataFrame for downstream use.
   * @param sfDir      testdata scale-factor dir (documents.parquet source)
   * @param workDir    pipeline working/output directory
   * @param dedupFirst when true, the composed dedup pipeline
   *                   ([[graft.ops.DedupPipeline]]) runs as a resumable
   *                   pre-stage and only `keep` documents enter the KG
   *                   dataflow — the production corpus-hygiene composition
   *                   (dedup feeds extraction), off by default so the
   *                   oracle-pinned outputs are unchanged
   */
  /** Stage manifests are keyed by name only, so a workDir is bound to ONE
    * pipeline configuration: resuming with a different `dedupFirst` would
    * silently reuse the other configuration's committed t0 output. The
    * config manifest makes that an error instead. */
  private def checkConfig(workDir: String, dedupFirst: Boolean): Unit = {
    val p = Paths.get(workDir, "_CONFIG.json")
    val cfg = s"""{"dedup_first": $dedupFirst}"""
    if (Files.exists(p)) {
      val prev = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      if (prev != cfg)
        throw new IllegalArgumentException(
          s"workDir $workDir was created with config $prev; rerun with the same " +
            s"configuration or use a fresh workDir (requested $cfg)")
    } else {
      Files.createDirectories(Paths.get(workDir))
      Files.write(p, cfg.getBytes(StandardCharsets.UTF_8))
    }
  }

  def run(spark: SparkSession, sfDir: String, workDir: String,
          dedupFirst: Boolean = false): DataFrame = {
    import spark.implicits._
    checkConfig(workDir, dedupFirst)
    val runner = new Runner(spark, workDir)

    val docs =
      if (!dedupFirst) Transcripts.documents(spark, sfDir)
      else {
        val verdicts = runner.stage("t0a_dedup", Seq("documents")) {
          graft.ops.DedupPipeline.run(spark, Transcripts.documents(spark, sfDir))
        }
        Transcripts.documents(spark, sfDir)
          .join(verdicts.where(col("keep")).select("doc_id"), Seq("doc_id"), "leftsemi")
      }

    val transcripts = runner.stage("t0_transcripts", Seq("documents")) {
      // repartition by conv_id: the extraction stage's unit of parallelism
      Transcripts.fromDocuments(docs).repartition(col("conv_id"))
    }

    val mentions = runner.stage("t1_mentions", Seq("t0_transcripts")) {
      Extraction.mentions(spark, transcripts.as[Turn]).toDF()
    }

    val edges = runner.stage("t2_link_edges", Seq("t1_mentions")) {
      Extraction.linkEdges(mentions.as[Mention])
    }

    val canonical = runner.stage("t4_canonical", Seq("t2_link_edges", "t1_mentions")) {
      Canonicalize.connectedComponents(spark, edges,
        mentions.select(col("entity_id")).distinct())
    }

    val triples = runner.stage("t3_triples", Seq("t1_mentions", "t4_canonical", "t0_transcripts")) {
      Extraction.triples(mentions.as[Mention], canonical, transcripts)
    }

    // T5: materialize as a named graph in the catalog (partitioned, snapshotted)
    if (!runner.isDone("t5_materialize")) {
      val catalog = new ParquetSnapshotCatalog(spark, s"$workDir/catalog")
      val asTripleRows = triples.select(
        col("s"), lit(TermKind.Iri).as("s_kind"), col("p"),
        col("o"), col("o_kind"),
        lit(null).cast("string").as("o_dtype"),
        lit(null).cast("string").as("o_lang"))
      catalog.write("urn:graft:conversation-graph", asTripleRows)
      val marker = Paths.get(workDir, "t5_materialize")
      Files.createDirectories(marker)
      Files.write(marker.resolve("_COMMIT.json"), "{}".getBytes(StandardCharsets.UTF_8))
    }

    // T6: rdfx-compatible serialization of the (deduplicated) graph as NT shards
    if (!runner.isDone("t6_serialize")) {
      val distinctTriples = triples.select(
        col("s"), lit(TermKind.Iri).as("s_kind"), col("p"),
        col("o"), col("o_kind"),
        lit(null).cast("string").as("o_dtype"),
        lit(null).cast("string").as("o_lang"))
        .dropDuplicates("s", "p", "o", "o_kind")
      DistributedRdf.writeNt(distinctTriples, s"$workDir/t6_serialize/nt")
      Files.write(Paths.get(workDir, "t6_serialize", "_COMMIT.json"),
        "{}".getBytes(StandardCharsets.UTF_8))
    }

    runner.writeMetrics()
    triples
  }
}

/** spark-submit entry point: RunPipeline <sfDir> <workDir> [cpus] */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val workDir = if (args.length > 1) args(1) else "/tmp/graft-pipeline"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-kg-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val triples = Pipeline.run(spark, sfDir, workDir)
    val n = triples.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"triples": $n, "seconds": $secs%.2f, "triples_per_sec": ${n / secs}%.0f}""")
    spark.stop()
  }
}
