package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Deterministic hyperplanes: coefficient (p,d) from a seeded xorshift. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = embeddings
      .where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = embeddings.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(Dedup.cosine(
        col("qe").cast("array<double>"), col("embedding").cast("array<double>")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank").cast("long").as("rank"))
  }

  /** Signature column: nBits-bit bucket id from hyperplane signs. */
  private def signature(spark: SparkSession, df: DataFrame, planes: Array[Array[Double]],
                        vecCol: String): DataFrame = {
    val bc = spark.sparkContext.broadcast(planes)
    val sigUdf = udf { (v: Seq[Float]) =>
      val ps = bc.value
      var sig = 0
      var b = 0
      while (b < ps.length) {
        var d = 0.0
        val p = ps(b)
        var i = 0
        while (i < p.length && i < v.length) { d += p(i) * v(i); i += 1 }
        if (d >= 0) sig |= (1 << b)
        b += 1
      }
      sig
    }
    df.withColumn("bucket", sigUdf(col(vecCol)))
  }

  /**
   * LSH top-k with 1-bit multi-probe. `nBits` trades recall for bucket size:
   * 2^nBits buckets; probing nBits+1 of them.
   */
  def lshTopK(spark: SparkSession, embeddings: DataFrame, queryIds: Seq[Long],
              k: Int, nBits: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val corpus = signature(spark, embeddings, planes, "embedding")
    val queries = signature(spark,
      embeddings.where(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
      planes, "qe")
    // multi-probe: query bucket + every 1-bit flip
    val probes = queries.select(col("query_id"), col("qe"),
      explode(array((col("bucket") +: (0 until nBits).map(b =>
        col("bucket").bitwiseXOR(lit(1 << b)))): _*)).as("bucket"))
    val candidates = corpus.join(broadcast(probes), "bucket")
      .where(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    candidates
      .withColumn("cos", round(Dedup.cosine(
        col("qe").cast("array<double>"), col("embedding").cast("array<double>")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank").cast("long").as("rank"))
  }
}
