package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus-selection operators for training-data pipelines:
 * stratified sampling and per-group top-k. Both are pure narrow/window
 * dataflow — no RNG (reproducible across engines and reruns), no driver
 * state, shuffle only where the semantics demand one (the per-group
 * window).
 */
object Sampling {

  /**
   * Hash bucket 0..15 from the first hex nibble of md5(key) — deterministic
   * and ENGINE-PORTABLE (the DuckDB oracle computes the identical bucket,
   * unlike xxhash64 which only Spark has). One nibble = 1/16 rate
   * granularity, which is what corpus-level sampling needs; finer rates
   * chain a second nibble.
   */
  def hashBucket16(key: Column): Column =
    (instr(lit("0123456789abcdef"), substring(md5(key.cast("string")), 1, 1)) - 1)
      .cast("int")

  /**
   * Stratified deterministic sample: within each stratum (e.g. lang,
   * source), keep documents whose hash bucket falls below the stratum's
   * quota of 16ths. Rows from strata without a quota are dropped. A narrow
   * filter — NO shuffle, NO RNG: the same doc is kept in every run and on
   * every engine, which is what makes ablation corpora comparable.
   *
   * @param quotas stratum value -> kept buckets out of 16 (e.g. "en" -> 4
   *               keeps ~25% of English docs)
   */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
                       quotas: Map[String, Int], keyCol: String = "doc_id"): DataFrame = {
    val quota = quotas.foldLeft(lit(0)) { case (acc, (v, q)) =>
      when(col(stratumCol) === v, q).otherwise(acc)
    }
    docs.where(hashBucket16(col(keyCol)) < quota)
  }

  /**
   * Top-k rows per group by a score column (ties broken by the key for
   * determinism): the "best N documents per domain/language" selection.
   * One shuffle on the group key; the rank prunes inside the window — at
   * scale prefer a pre-aggregated candidate cut if k << group size.
   */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   k: Int, keyCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(scoreCol).desc, col(keyCol))
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .withColumn("rank", col("rank").cast("long"))
  }

  /**
   * Sequence packing for context-window assembly: within each stratum,
   * documents in stable key order are assigned to consecutive bins by the
   * running token count — `bin = floor((cumsum(tokens) - tokens) /
   * capacity)` (i.e. the bin the document STARTS in). One window shuffle
   * per stratum, deterministic, no driver loop — the distributed
   * approximation of greedy sequence packing (bins may straddle capacity
   * by at most one document, the standard streaming-packing relaxation).
   */
  def packSequences(docs: DataFrame, stratumCol: String, tokenCol: String,
                    capacity: Int, keyCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(keyCol), col(stratumCol), col(tokenCol))
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w).cast("long"))
      .withColumn("bin",
        floor((col("cum_tokens") - col(tokenCol)) / capacity).cast("long"))
  }

  /**
   * Text scrubbing: redact emails and URLs (the baseline PII/noise pass a
   * training corpus runs before tokenization). Pure codegen'd
   * regexp_replace projection — narrow, no UDF; extend the pattern list
   * for phone numbers / ids as policy requires.
   */
  private val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val UrlRe = "https?://[^\\s]+"

  def scrubText(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("scrubbed",
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"), UrlRe, "<URL>"))
      // counted on the INPUT, not the output: a pre-existing literal
      // '<EMAIL>' in the text is not a redaction, and an email inside a URL
      // is two pattern hits even though the URL replace swallows its token
      .withColumn("n_redactions",
        (regexp_count(col(textCol), lit(EmailRe)) +
          regexp_count(col(textCol), lit(UrlRe))).cast("long"))
}
