package graft.ops

import graft.pipeline.Canonicalize
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The composed training-data deduplication dataflow — what a 100 TB corpus
 * actually runs, end to end:
 *
 *   1. exact dedup (one hash-agg shuffle) → representative per content hash;
 *   2. MinHash signatures over the representatives only;
 *   3. LSH banding → candidate pairs (bucket-size-guarded, never all-pairs);
 *   4. bigram-Jaccard verification of candidates (semi-joined to members);
 *   5. connected components over verified pairs → near-dup clusters
 *      (canonical = min doc_id per cluster);
 *   6. verdict per ORIGINAL document: keep iff it is its own cluster
 *      canonical, with the subsuming document and the reason recorded.
 *
 * Every stage shuffles on a key (hash / band bucket / doc id) — nothing is
 * quadratic in the corpus, and each intermediate is a materializable stage
 * artifact (the SparkEntry memo does exactly that for the shared pieces).
 */
object DedupPipeline {

  /** Zero-padded doc-id key: lexicographic min == numeric min, so the CC
    * canonical (min string) is the min doc_id. 20 digits covers the full
    * non-negative Long range (max is 19 digits) — a narrower pad would
    * break the ordering once ids cross it. */
  private def key(c: Column): Column = format_string("d%020d", c)
  private def unkey(c: Column): Column = substring(c, 2, 20).cast("long")

  /**
   * @return one row per input document:
   *         (doc_id, canonical_doc_id, keep, reason) with reason in
   *         ('kept', 'exact_dup', 'near_dup')
   */
  def run(spark: SparkSession, docs: DataFrame,
          jaccardThreshold: Double = 0.8,
          scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val exact = Dedup.exactDedup(docs) // (content_hash, keep_doc_id, n_docs)
    val withRep = docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .join(exact.select(col("content_hash"), col("keep_doc_id").as("exact_rep")),
        "content_hash")
      .select("doc_id", "exact_rep")
    // reps feed FOUR consumers (signatures, member shingles x3 refs via the
    // Jaccard plan, CC nodes) — persist the intermediate like a production
    // run materializes it between stages
    val reps = scope.persist(docs.join(
      withRep.where(col("doc_id") === col("exact_rep")).select("doc_id"),
      Seq("doc_id"), "leftsemi"))

    val pairs = Dedup.lshCandidatePairs(Dedup.minhashSignatures(reps), scope = scope)
    val memberShingles = scope.persist(Dedup.bigramShingles(
      reps.join(Dedup.pairMembers(pairs), Seq("doc_id"), "leftsemi")))
    val verified = Dedup.ngramJaccardFromShingles(memberShingles, pairs)
      .where(col("jaccard") >= jaccardThreshold)

    val clusters = Canonicalize.connectedComponents(spark,
      verified.select(key(col("doc_a")).as("entity_a"), key(col("doc_b")).as("entity_b")),
      reps.select(key(col("doc_id")).as("entity_id")))
      .select(unkey(col("entity_id")).as("rep_doc"),
        unkey(col("canonical_id")).as("cluster_canonical"))

    withRep.join(clusters, withRep("exact_rep") === clusters("rep_doc"))
      .select(col("doc_id"),
        col("cluster_canonical").as("canonical_doc_id"),
        (col("doc_id") === col("cluster_canonical")).as("keep"),
        when(col("doc_id") =!= col("exact_rep"), "exact_dup")
          .when(col("cluster_canonical") =!= col("doc_id"), "near_dup")
          .otherwise("kept").as("reason"))
  }

  /**
   * [[run]] with an explicit completion point: the verdict table is
   * materialized to `outPath` inside a [[CacheScope]], every persisted
   * intermediate (exact-dedup reps, banded LSH projections, member
   * shingles) is unpersisted once the write commits, and the returned
   * frame reads the materialized table — nothing in its plan references
   * the released caches. This is the shape a long-lived session
   * interleaving many dedup runs should use; the lazy [[run]] stays for
   * callers that memoize the verdict frame for the session (SparkEntry).
   */
  def runTo(spark: SparkSession, docs: DataFrame, outPath: String,
            jaccardThreshold: Double = 0.8): DataFrame = {
    CacheScope.withScope { scope =>
      run(spark, docs, jaccardThreshold, scope)
        .write.mode("overwrite").parquet(outPath)
    }
    spark.read.parquet(outPath)
  }
}
