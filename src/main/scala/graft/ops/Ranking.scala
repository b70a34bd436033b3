package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Lexical relevance ranking over the `documents` table — the retrieval
 * side of a training-data pipeline (data selection by query relevance,
 * nearest-text mining, corpus search): Okapi BM25 scoring against a term
 * query, and per-document TF-IDF keyword extraction.
 *
 * Scale shape (100 TB):
 *  - both operators tokenize with the corpus-wide `split(text, ' ')`
 *    convention as a NARROW projection; nothing shuffles until the keyed
 *    aggregates.
 *  - BM25 filters the exploded token stream to the query terms BEFORE any
 *    shuffle — the aggregate carries |terms| × matching docs rows, not the
 *    corpus token count; document-frequency and corpus stats ride the plan
 *    as broadcast aggregates (df is ≤ |terms| rows, stats is 1 row).
 *  - TF-IDF aggregates (doc, term) then term — two hash aggregates with
 *    map-side combine (Zipf-hot terms collapse per-partition before the
 *    exchange); the per-doc top-k uses a rank window that Spark rewrites
 *    to WindowGroupLimit (top-k heap per partition, no full sort).
 *
 * Determinism (oracle-exact): integer counts throughout; `ln` on
 * identical doubles; the per-document BM25 sum folds term contributions
 * in TERM ORDER (float addition is order-sensitive); TF-IDF ranks by the
 * ROUNDED score with a term-name tiebreak so rank boundaries cannot
 * depend on sub-6dp float residue; results round to 6 dp.
 */
object Ranking {

  /**
   * Okapi BM25: for every document matching ≥1 query term,
   * score = Σ_t IDF(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
   * IDF(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
   */
  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val withDl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"),
      split(col("text"), " ").as("toks"))
    val stats = withDl.agg(
      count(lit(1)).cast("double").as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = withDl
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      // referenced twice (df + the contribution join): pin the ≤|terms|×|docs|
      // frame lazily so the corpus tokenize+explode runs once, not twice
      .localCheckpoint(false)
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val contrib = tf
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        (log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
          .as("c"))
    contrib.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_terms_matched"),
        round(aggregate(
          array_sort(collect_list(struct(col("term"), col("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")), 6).as("bm25"))
  }

  /**
   * Per-document k-nearest-neighbor text graph from scored candidate
   * pairs (LSH candidates + verified Jaccard — the [[Dedup]] machinery):
   * symmetrize the undirected pairs, keep positive similarities, rank
   * per document. The rank window rewrites to WindowGroupLimit (per-
   * partition top-k heaps, no full sort); candidate generation is already
   * bucketed upstream, so nothing here is all-pairs. Ties on the rounded
   * score break by neighbor id — rank boundaries are deterministic.
   */
  def knnFromPairs(scoredIn: DataFrame, k: Int = 3): DataFrame = {
    // the symmetrize union references the scored-pairs frame twice;
    // pin it (candidate-pairs-sized) so an expensive upstream scorer
    // (LSH candidates + Jaccard verify) runs once, not twice
    val scored = scoredIn.localCheckpoint(false)
    val sym = scored
      .select(col("doc_a").as("doc_id"), col("doc_b").as("neighbor"), col("jaccard"))
      .unionByName(scored
        .select(col("doc_b").as("doc_id"), col("doc_a").as("neighbor"), col("jaccard")))
      .where(col("jaccard") > 0)
    sym
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("jaccard").desc, col("neighbor"))))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("neighbor"), col("jaccard"))
  }

  /** Per-document top-`k` terms by TF-IDF (tf · ln(N/df)), rank ties
    * broken by term name. Returns (doc_id, rk, term, tf, tfidf). */
  def tfIdfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val tfc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // referenced twice (df + the scored join): pin the postings-sized
      // frame lazily so the corpus tokenize+explode runs once, not twice
      .localCheckpoint(false)
    val df = tfc.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val scored = tfc.join(df, Seq("term")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf").cast("double") * log(col("n") / col("df")), 6).as("tfidf"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("term"), col("tf"), col("tfidf"))
  }

  /**
   * Distinctive terms per SOURCE — [[tfIdfTopTerms]] lifted from documents
   * to the source/domain grain: term frequency within the source, inverse
   * SOURCE frequency across the corpus. The "what is this domain about"
   * signal a curation dashboard shows next to [[TextAnalysis.sourceReport]].
   *
   * Shape at 100 TB: the (source, term) aggregate collapses map-side to
   * each source's vocabulary; the source-frequency dimension is
   * vocabulary-sized and joins on the term key; the per-source top-k is a
   * WindowGroupLimit (map-side k-heaps, never a full sort of the scored
   * frame). |sources| ≪ |docs| makes every frame after the first
   * aggregate small.
   *
   * Determinism: integer counts, one ln() per row over identical doubles,
   * (score DESC, term) tiebreak.
   */
  def sourceTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val tfc = docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
      // referenced twice (sf + the scored join): pin so the corpus
      // tokenize+explode runs once, not twice
      .localCheckpoint(false)
    val sf = tfc.groupBy("term").agg(count(lit(1)).cast("double").as("sf"))
    val n = docs.select(col("source")).distinct()
      .agg(count(lit(1)).cast("double").as("n"))
    val scored = tfc.join(sf, Seq("term")).crossJoin(broadcast(n))
      .select(col("source"), col("term"), col("tf"),
        round(col("tf").cast("double") * log(col("n") / col("sf")), 6).as("score"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("score").desc, col("term"))))
      .where(col("rk") <= k)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("term"), col("tf"), col("score"))
  }
}
