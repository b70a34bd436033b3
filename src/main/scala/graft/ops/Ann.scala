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
