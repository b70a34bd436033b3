package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`embeddings` table: vec_id, embedding array<float>, label).
 *
 * Two paths:
 *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
 *    set against the full corpus; one scan, one per-query top-k window.
 *    The correctness baseline and the oracle-checked path.
 *  - [[lshTopK]] — the scale path: random-hyperplane LSH. Each vector gets
 *    a `nBits`-bit signature (sign of dot with deterministic seeded
 *    hyperplanes); candidates = vectors sharing a signature bucket with the
 *    query (multi-probe: exact bucket plus all 1-bit-flip neighbors), exact
 *    cosine re-rank inside buckets only. At 100 TB the bucket join replaces
 *    the full crossJoin — shuffle is bounded by bucket occupancy, and the
 *    signature computation is a single narrow pass. Recall vs brute force
 *    is property-tested in AnnSpec (no SQL oracle — not SQL-expressible).
 */
object Ann {

  // defaults shared by lshTopK and the SQL oracle generator (SparkEntry)
  val DefaultTables = 8
  val DefaultBits = 8
  val DefaultDim = 64
  val DefaultSeed = 42L

  // IVF defaults (distinct seed family from the LSH hyperplanes). nProbe is
  // the recall/cost knob: random vectors are IVF's worst case (true
  // neighbors sit at ~65 deg and scatter across cells), so the default
  // probes half the cells — measured recall@10 0.38 at nProbe=4 vs >=0.6
  // at 8 on the sandbox embeddings. Clustered real-world embeddings probe
  // far fewer.
  val IvfCells = 16
  val IvfProbes = 8
  val IvfSeed = 7L

  // Trained-quantizer defaults: the corpus has 10 generator clusters
  // (measured — a spherical k-means elbow lands there); cell count sized to
  // the cluster structure + 3 Lloyd iterations give recall@10 0.65-0.68 at
  // nProbe=4 across sf0.001/0.01/0.1 — above the >=0.6 bar at a 0.4 probe
  // fraction, vs the seeded quantizer's 0.38@4/16 and ~0.6@8/16 (0.5
  // fraction): strictly better on both recall and pruning.
  val IvfTrainedCells = 10
  val IvfTrainedProbes = 4
  val IvfTrainIters = 3
  val IvfTrainSample = 500L

  /** Deterministic hyperplanes: coefficient (p,d) from a seeded Gaussian. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    graft.functions.VecFunctions.hyperplanes(1, nBits, dim, seed)(0)

  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = embeddings
      .where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = embeddings.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(
        graft.functions.VecFunctions.cosine_f(col("qe"), col("embedding")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank").cast("long").as("rank"))
  }

  /**
   * Per-table bucket signatures: one pass computes all nTables x nBits dot
   * products, emitting (row, table, bucket) — the classic multi-table
   * hyperplane-LSH layout. Random vectors are LSH's worst case (top-10
   * neighbors sit at ~65 deg), so recall comes from table count plus 1-bit
   * multi-probe, not from one lucky bucket. The signature is a native
   * codegen'd expression ([[graft.functions.HyperplaneBuckets]]): the UDF
   * formulation measured ~0.85 ms/call in ScalaUDF conversion overhead vs
   * ~5 us of actual math, and Catalyst evaluates the projection up to three
   * times (generator null-guard), so the kernel must be free to re-run.
   */
  private def withBuckets(df: DataFrame, vecCol: String,
                          nTables: Int, nBits: Int, dim: Int): DataFrame =
    df.withColumn("buckets",
        graft.functions.VecFunctions.lsh_buckets(col(vecCol), nTables, nBits, dim))
      .select(col("*"), posexplode(col("buckets")).as(Seq("table", "bucket")))
      .drop("buckets")

  /**
   * IVF (inverted-file) ANN: a coarse quantizer of `nCells` seeded
   * centroids partitions the corpus — each vector indexes into its
   * nearest-cosine cell (ONE narrow pass, the "inverted list" is just a
   * cell column, i.e. a partitionable key at 100 TB) — and each query
   * probes its `nProbe` nearest cells with an exact re-rank inside them.
   * Complements [[lshTopK]]: IVF adapts probe volume per query (nProbe
   * knob) and its cell key doubles as a physical partition/bucket column
   * for the materialized index table, which is the classic
   * billion-vector layout. Cell assignment rounds cosine to 6 dp before
   * ranking so the SQL oracle reproduces it exactly.
   */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              nCells: Int = IvfCells, nProbe: Int = IvfProbes,
              dim: Int = DefaultDim, seed: Long = IvfSeed): DataFrame = {
    import graft.functions.VecFunctions.ivf_cells
    val corpus = embeddings.withColumn("cell",
      element_at(ivf_cells(col("embedding"), nCells, 1, dim, seed), 1))
    val probes = embeddings.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(ivf_cells(col("embedding"), nCells, nProbe, dim, seed)).as("cell"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(
        graft.functions.VecFunctions.cosine_f(col("qe"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank").cast("long").as("rank"))
  }

  /**
   * Deterministic spherical-k-means training for the IVF coarse quantizer
   * — the round-3 answer to "seeded Gaussian centroids waste probes": cell
   * boundaries learned from the data double recall per probe.
   *
   * Reproducibility is the design constraint (the SQL oracle re-derives
   * the SAME centroids): a bounded sample (`vec_id < sampleMax`, collected
   * in vec_id order), k-center greedy init (c0 = first sample vector, each
   * next = the sample vector with the LOWEST max round-6 cosine to the
   *  chosen set, ties to lowest vec_id), then a FIXED number of Lloyd
   * iterations where assignment uses round-6 cosine (ties to lowest cell)
   * and the new centroid is the member mean folded in vec_id order —
   * every float op mirrors DuckDB exactly ([[graft.functions.VecFunctions.cosineRound6]];
   * the oracle's `list_reduce(list(x ORDER BY vec_id))` is the same
   * sequential fold). No RNG anywhere.
   *
   * At corpus scale the sample collect is a LIMIT-like bounded read (the
   * sample, not the corpus, trains the quantizer — standard IVF practice)
   * and training is O(sample x cells x dim) on the driver: microseconds
   * next to one corpus scan.
   */
  def trainIvfCentroids(embeddings: DataFrame, nCells: Int = IvfTrainedCells,
                        iters: Int = IvfTrainIters,
                        sampleMax: Long = IvfTrainSample): Array[Array[Double]] = {
    import graft.functions.VecFunctions.cosineRound6
    val sample: Array[Array[Double]] = embeddings
      .where(col("vec_id") < sampleMax)
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id")
      .collect()
      .map { r =>
        val e = r.getSeq[Float](1).toArray.map(_.toDouble)
        var ss = 0.0
        var i = 0
        while (i < e.length) { ss += e(i) * e(i); i += 1 }
        val n = math.sqrt(ss)
        e.map(_ / n)
      }
    require(sample.nonEmpty, "IVF training requires a non-empty sample")
    val k = math.min(nCells, sample.length)
    // k-center greedy init
    val cents = scala.collection.mutable.ArrayBuffer(sample(0))
    val maxCos = sample.map(s => cosineRound6(cents(0), s))
    while (cents.length < k) {
      var best = 0
      var i = 1
      while (i < sample.length) { if (maxCos(i) < maxCos(best)) best = i; i += 1 }
      val c = sample(best)
      cents += c
      i = 0
      while (i < sample.length) {
        val v = cosineRound6(c, sample(i))
        if (v > maxCos(i)) maxCos(i) = v
        i += 1
      }
    }
    // Lloyd iterations: round-6 assignment, member-mean update in vec_id order
    var cs = cents.toArray
    for (_ <- 1 to iters) {
      val assign = sample.map { s =>
        var bj = 0; var bc = cosineRound6(cs(0), s)
        var j = 1
        while (j < k) {
          val v = cosineRound6(cs(j), s)
          if (v > bc) { bj = j; bc = v }
          j += 1
        }
        bj
      }
      cs = Array.tabulate(k) { j =>
        val members = sample.indices.filter(assign(_) == j)
        if (members.isEmpty) cs(j)
        else {
          val dim = sample(members.head).length
          val m = new Array[Double](dim)
          var d = 0
          while (d < dim) {
            var acc = sample(members.head)(d)
            members.tail.foreach(i => acc += sample(i)(d))
            m(d) = acc / members.length
            d += 1
          }
          m
        }
      }
    }
    cs
  }

  /**
   * IVF top-k with a TRAINED coarse quantizer: [[trainIvfCentroids]] then
   * the same cell-assign / probe / exact-re-rank dataflow as [[ivfTopK]].
   * Defaults (10 cells, nProbe 4) beat the seeded quantizer on both axes —
   * see the constant block above for the measured numbers.
   */
  def ivfTopKTrained(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                     nCells: Int = IvfTrainedCells, nProbe: Int = IvfTrainedProbes,
                     iters: Int = IvfTrainIters,
                     sampleMax: Long = IvfTrainSample): DataFrame = {
    import graft.functions.VecFunctions.ivf_cells_trained
    val cents: Seq[Seq[Double]] = trainIvfCentroids(embeddings, nCells, iters, sampleMax)
      .map(_.toSeq).toSeq
    val corpus = embeddings.withColumn("cell",
      element_at(ivf_cells_trained(col("embedding"), cents, 1), 1))
    val probes = embeddings.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(ivf_cells_trained(col("embedding"), cents, nProbe)).as("cell"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(
        graft.functions.VecFunctions.cosine_f(col("qe"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank").cast("long").as("rank"))
  }

  /**
   * Materialize the IVF index the cell key is designed for: the corpus with
   * its nearest-centroid assignment, written as a CELL-PARTITIONED parquet
   * table (`.../cell=<c>/...`). At billion-vector scale this is the index
   * structure itself — each cell directory is one inverted list, and a
   * probe reads ONLY its `nProbe` cell directories (asserted against the
   * scan's PartitionFilters in OpsSpec), never the corpus.
   */
  def writeIvfIndex(embeddings: DataFrame, path: String,
                    centroids: Seq[Seq[Double]]): Unit = {
    import graft.functions.VecFunctions.ivf_cells_trained
    embeddings
      .withColumn("idx_gen", lit(0))
      .withColumn("cell", element_at(ivf_cells_trained(col("embedding"), centroids, 1), 1))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
  }

  /**
   * Incremental index maintenance — the append counterpart of
   * [[writeIvfIndex]], so a growing corpus (the incremental streaming
   * pipeline's own story) never rebuilds the whole billion-vector index to
   * absorb a day's vectors. The new vectors are assigned to their cells
   * with the SAME centroids the base index was built with and written as
   * per-cell DELTA FILES: `mode("append").partitionBy("cell")` adds new
   * part files inside the existing `cell=<c>/` directories (dynamic
   * partition overwrite is irrelevant in append mode — existing files are
   * never touched), creating a directory only for a cell that was
   * previously empty. Cost is one narrow assignment pass + one
   * delta-sized write; reads are unchanged ([[ivfTopKIndexed]] lists the
   * probed cell dirs, base and delta files alike), so an appended index
   * answers queries identically to a from-scratch rebuild over the union
   * corpus with the same centroids (asserted in OpsSpec).
   *
   * Retrain/compact policy (the drift knob): appended vectors are quantized
   * by FROZEN centroids, so as the appended fraction grows the cell
   * boundaries drift away from the data distribution — recall per probe
   * degrades (never correctness: re-rank inside probed cells stays exact)
   * and hot cells accumulate small delta files. The maintenance loop is:
   * when [[ivfIndexStats]] reports `appendedFraction` above a threshold
   * (0.25 is a sound default — quantizer-drift literature and our measured
   * recall curves both put the knee well above that), retrain with
   * [[trainIvfCentroids]] on the CURRENT corpus and [[writeIvfIndex]] to a
   * fresh path, then swap paths atomically at the caller (the same
   * publish-then-swap discipline as the catalog's compaction). Between
   * retrains, a compact-only pass (rewrite with the OLD centroids) folds
   * delta files without changing any assignment.
   */
  def appendIvfIndex(newVectors: DataFrame, path: String,
                     centroids: Seq[Seq[Double]]): Unit = {
    import graft.functions.VecFunctions.ivf_cells_trained
    newVectors
      .withColumn("idx_gen", lit(1))
      .withColumn("cell", element_at(ivf_cells_trained(col("embedding"), centroids, 1), 1))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** (total vectors, appended vectors, appended fraction) of a materialized
    * index — the input to the retrain policy above. One metadata-cheap scan
    * of the `idx_gen` column (no embedding bytes are read; column pruning
    * is visible in the scan's ReadSchema). */
  final case class IvfIndexStats(total: Long, appended: Long) {
    def appendedFraction: Double = if (total == 0) 0.0 else appended.toDouble / total
  }

  def ivfIndexStats(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndexStats = {
    val r = spark.read.parquet(path)
      .agg(count(lit(1)).as("total"),
        sum(when(col("idx_gen") > 0, 1L).otherwise(0L)).as("appended"))
      .collect()(0)
    IvfIndexStats(r.getLong(0), r.getLong(1))
  }

  /** True when the appended fraction has crossed the retrain threshold —
    * see the policy note on [[appendIvfIndex]]. */
  def shouldRetrainIvf(spark: org.apache.spark.sql.SparkSession, path: String,
                       threshold: Double = 0.25): Boolean =
    ivfIndexStats(spark, path).appendedFraction > threshold

  /**
   * Compact-only maintenance: fold the per-cell delta files into one base
   * file set at `destPath` WITHOUT changing any cell assignment — the
   * existing `cell` column is carried over verbatim (no centroid math, no
   * re-quantization), only `idx_gen` resets to 0. One partition-local
   * rewrite; query results are bit-identical before and after. The caller
   * swaps paths after the write completes (publish-then-swap, same
   * discipline as the catalog's compaction — never rewrite a path readers
   * are probing).
   */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      indexPath: String, destPath: String): Unit =
    spark.read.parquet(indexPath)
      .withColumn("idx_gen", lit(0))
      .write.mode("overwrite").partitionBy("cell").parquet(destPath)

  /**
   * The documented retrain/compact policy, executable: when the appended
   * fraction exceeds `threshold`, RETRAIN the coarse quantizer on the
   * index's own current content (the index IS the corpus — vec_id +
   * embedding ride in every row) and rebuild at `destPath` with the new
   * centroids, returning them so the caller re-points queries and future
   * appends; otherwise fold delta files with [[compactIvfIndex]]
   * (assignments preserved, `None` returned — keep using the old
   * centroids). Either way `destPath` holds a fresh single-generation
   * index and the caller swaps paths atomically.
   */
  def maintainIvfIndex(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String, destPath: String,
                       threshold: Double = 0.25,
                       nCells: Int = IvfTrainedCells, iters: Int = IvfTrainIters,
                       sampleMax: Long = IvfTrainSample): Option[Seq[Seq[Double]]] = {
    if (shouldRetrainIvf(spark, indexPath, threshold)) {
      val corpus = spark.read.parquet(indexPath).drop("cell", "idx_gen")
      val cents = trainIvfCentroids(corpus, nCells, iters, sampleMax)
        .map(_.toSeq).toSeq
      writeIvfIndex(corpus, destPath, cents)
      Some(cents)
    } else {
      compactIvfIndex(spark, indexPath, destPath)
      None
    }
  }

  /**
   * IVF top-k served FROM the materialized index: the queries' probe cells
   * are collected first (a bounded driver read — at most queries x nProbe
   * values over the small query set, and at most `centroids.size` distinct)
   * and pushed as a STATIC `cell IN (...)` partition filter, so the index
   * scan lists and reads only the probed cell directories. Identical
   * results to [[ivfTopKTrained]] with the same centroids/probes (floats
   * round-trip parquet exactly); the difference is that cell assignment is
   * paid once at index-build time, not per query batch.
   */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                     embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                     centroids: Seq[Seq[Double]],
                     nProbe: Int = IvfTrainedProbes): DataFrame = {
    import graft.functions.VecFunctions.ivf_cells_trained
    val probes = embeddings.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(ivf_cells_trained(col("embedding"), centroids, nProbe)).as("cell"))
    val probeCells = probes.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val corpus = spark.read.parquet(indexPath)
      .where(col("cell").isin(probeCells.toIndexedSeq: _*))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(
        graft.functions.VecFunctions.cosine_f(col("qe"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank").cast("long").as("rank"))
  }

  /**
   * Multi-table LSH top-k with 1-bit multi-probe: candidates = union over
   * `nTables` hash tables of the query's bucket and its 1-bit-flip
   * neighbors; exact cosine re-rank on the deduplicated candidate set. At
   * corpus scale the (table, bucket) join replaces the full crossJoin, and
   * shuffle volume is bounded by bucket occupancy x probes.
   */
  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long],
              k: Int, nTables: Int = DefaultTables, nBits: Int = DefaultBits,
              dim: Int = DefaultDim): DataFrame = {
    val corpus = withBuckets(embeddings, "embedding", nTables, nBits, dim)
    val queries = withBuckets(
      embeddings.where(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
      "qe", nTables, nBits, dim)
    val probes = queries.select(col("query_id"), col("qe"), col("table"),
      explode(array((col("bucket") +: (0 until nBits).map(b =>
        col("bucket").bitwiseXOR(lit(1 << b)))): _*)).as("bucket"))
    val candidates = corpus.join(broadcast(probes), Seq("table", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select("query_id", "qe", "vec_id", "embedding")
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    candidates
      .withColumn("cos", round(
        graft.functions.VecFunctions.cosine_f(col("qe"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank").cast("long").as("rank"))
  }
}
